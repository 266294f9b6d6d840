#!/bin/bash
# Capture one honest artifact for every quality suite (VERDICT r3 §4):
# pseudo-perplexity, whole-proteome throughput, DMS spearman
# (synthetic self-consistency), and the fine-tune task smokes.
# No-egress environment: models are random-init at the real
# architectures, data is synthetic — each capture validates the full
# pipeline end-to-end and records real chip timings; quality numbers
# with pretrained weights require the upstream downloads.
set -x
cd "$(dirname "$0")/.."
FA=/tmp/synth_proteome.fa
[ -f $FA ] || python tools/make_synthetic_fasta.py $FA --n 2000

strip() { grep -vE "WARNING|^\[2m|^===|^learning"; }

timeout 2700 stdbuf -oL python benchmarks/perplexity.py \
    --fasta $FA --model esm2_150m --k-sample 24 --max-len 512 \
    2>&1 | strip > results/perplexity__esm2_150m.csv

timeout 2700 stdbuf -oL python benchmarks/inference_on_proteome.py \
    --fasta $FA --model esm2_650m --token-per-batch 50000 \
    2>&1 | strip > results/proteome__esm2_650m.txt

timeout 2700 stdbuf -oL python benchmarks/dms_eval.py \
    --model esm2_150m --synthetic \
    2>&1 | strip > results/dms_eval__esm2_150m.txt

timeout 2700 stdbuf -oL python benchmarks/tasks.py meltome --synthetic \
    --model esm2_8m 2>&1 | strip > results/task_meltome__esm2_8m.txt

timeout 2700 stdbuf -oL python benchmarks/tasks.py gb1 --synthetic \
    --model esm2_8m 2>&1 | strip > results/task_gb1__esm2_8m.txt

timeout 2700 stdbuf -oL python benchmarks/tasks.py tf --synthetic \
    --model esm2_8m 2>&1 | strip > results/task_tf__esm2_8m.txt

tail -2 results/perplexity__esm2_150m.csv results/proteome__esm2_650m.txt \
    results/dms_eval__esm2_150m.txt results/task_*__esm2_8m.txt
