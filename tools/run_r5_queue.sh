#!/bin/bash
# Round-5 evidence queue: runs the TPU-dependent captures sequentially
# (one TPU user at a time). Invoked after the 15B big-model run frees
# the chip.
set -x
cd /root/repo

# 1. AAV fine-tune task artifact (VERDICT #5a)
timeout 1800 python benchmarks/tasks.py aav --synthetic --model esm2_8m \
  2>&1 | grep -vE "WARNING|^\[2m|axon|Source|libtpu" \
  > results/task_aav__esm2_8m.txt

# 2. Positional-extension workflow (VERDICT #5b)
timeout 3000 python benchmarks/extend_positions.py \
  2>&1 | grep -vE "WARNING|^\[2m|axon|Source|libtpu" \
  > results/extend_positions__esm1b.txt

# 3. Segment-aligned packing A/B (VERDICT #9)
timeout 2400 python tools/aligned_packing_ab.py \
  2>&1 | grep -vE "WARNING|^\[2m|axon|Source|libtpu" \
  > results/aligned_packing_ab.txt

# 4. Memory-suite breadth (VERDICT #4): 8M + 150M
for m in esm2_8m esm2_150m; do
  timeout 1800 python benchmarks/inference_memory.py --model $m \
    --min-bucket 500 --max-bucket 3500 --step 750 \
    2>&1 | grep -vE "WARNING|^\[2m|axon|Source|libtpu" \
    > results/inference_memory__${m}.csv
  {
    echo "# REGIME: random-init weights, synthetic sequences; memory = XLA"
    echo "# buffer assignment (reference analogue: workflow/utils/memory.py)."
    echo "mode,length,batch,loss,temp_gb,total_gb"
  } > results/train_memory__${m}.csv
  for mode in none checkpointing lora 8bit; do
    timeout 1800 python benchmarks/train_memory.py --model $m \
      --mode $mode --min-bucket 500 --max-bucket 3500 --step 1500 \
      2>&1 \
      | sed -n "/^[0-9]/s/^/${mode},/p" \
      >> results/train_memory__${m}.csv
  done
done
# 4b. Whole-proteome throughput refresh (round-5 kernels + chunked tails)
python tools/make_synthetic_fasta.py /tmp/proteome_r5.fa --n 2000 --max-len 3500
timeout 1800 python benchmarks/inference_on_proteome.py \
  --fasta /tmp/proteome_r5.fa --model esm2_650m \
  2>&1 | grep -vE "WARNING|^\[2m|axon|Source|libtpu" \
  > results/proteome__esm2_650m.txt

# 5. Gate retune at the 10k operating point (fused bwd changes the math)
timeout 3000 python tools/gate_retune.py \
  2>&1 | grep -vE "WARNING|^\[2m|axon|Source|libtpu" \
  > results/gate_retune_r5.txt

echo QUEUE-DONE
