"""Masked-LM train-step runtime over packed batches.

Mirrors the reference train-runtime harness (fwd+bwd+optimizer step on
token-budget batches, reference: workflow/train/runtime.py:42-52 and
runtime_lightning.py:35-39): reports steps/sec, train tokens/sec, and
an MFU estimate. Supports activation checkpointing, LoRA-only training,
grad accumulation, and quantized bases (QLoRA). Writes CSV to stdout.

Usage:
  python benchmarks/train_runtime.py --model esm2_150m \
      --token-per-batch 50000 --checkpointing --steps 10
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='esm2_8m',
                    help='name (random init at that size) or .safetensors')
    ap.add_argument('--fasta', default=None,
                    help='FASTA to train on (default: synthetic)')
    ap.add_argument('--token-per-batch', type=int, default=50_000)
    ap.add_argument('--max-len', type=int, default=2000)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--checkpointing', action='store_true')
    ap.add_argument('--lora-rank', type=int, default=0,
                    help='>0 trains LoRA adapters only')
    ap.add_argument('--quantization', default='none',
                    choices=['none', '8bit', '4bit'])
    ap.add_argument('--grad-accum', type=int, default=1)
    ap.add_argument('--learning-rate', type=float, default=1e-4)
    args = ap.parse_args()

    import os
    import jax
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from esme_tpu.data import MaskedFastaTokenDataset, PackedBatch
    from esme_tpu.alphabet import mask_tokens
    from esme_tpu.models.config import config_for
    from esme_tpu.models.esm import ESM, _class_for
    from esme_tpu.profiling import peak_memory_gb
    from esme_tpu.train import MaskedPLM

    if os.path.isfile(args.model):
        model = ESM.from_pretrained(
            args.model, checkpointing=args.checkpointing,
            quantization=None if args.quantization == 'none'
            else args.quantization)
    else:
        cfg = config_for(args.model)
        model = _class_for(cfg.family)(config=cfg, rng=0,
                                       checkpointing=args.checkpointing)
        if args.quantization != 'none':
            model.quantize(args.quantization)
    if args.lora_rank:
        model.add_lora(rank=args.lora_rank, alpha=args.lora_rank)

    if args.fasta:
        ds = MaskedFastaTokenDataset(
            args.fasta, token_per_batch=args.token_per_batch,
            max_len=args.max_len, shuffle=True, random_state=0,
            alphabet=model.alphabet)
        batches = list(ds)[:max(args.steps, 1)]
    else:
        # synthetic packed batch: 250-aa proteins filling the budget
        # (the reference's max-batch protein, workflow/inference/
        # max_batch_size.py:23)
        rng = np.random.default_rng(0)
        alpha = model.alphabet
        seq_tokens = 252
        n = args.token_per_batch // seq_tokens
        toks = np.full((args.token_per_batch,), alpha.padding_idx, np.int32)
        cu = np.zeros(n + 1, np.int32)
        for i in range(n):
            lo = i * seq_tokens
            toks[lo] = alpha.cls_idx
            toks[lo + 1:lo + seq_tokens - 1] = rng.integers(
                4, 24, seq_tokens - 2)
            toks[lo + seq_tokens - 1] = alpha.eos_idx
            cu[i + 1] = lo + seq_tokens
        mtoks, mask = mask_tokens(toks[:cu[-1]], alphabet=alpha,
                                  rng=np.random.default_rng(1))
        pad = len(toks) - cu[-1]
        batches = [PackedBatch(
            tokens=toks, cu_lens=cu, max_len=seq_tokens,
            masked_tokens=np.pad(mtoks, (0, pad),
                                 constant_values=alpha.padding_idx),
            mask=np.pad(mask, (0, pad), constant_values=False))]

    trainer = MaskedPLM(model, learning_rate=args.learning_rate,
                        grad_accum=args.grad_accum,
                        lora_only=bool(args.lora_rank) or None)

    try:
        trainer.training_step(batches[0])        # compile
    except Exception as e:
        print('config,token_per_batch,steps,sec_per_step,'
              'train_tokens_per_sec,peak_gb')
        print(f'oom,{args.token_per_batch},0,-1,-1,-1  '
              f'# {type(e).__name__}')
        return

    # Compile-time XLA buffer assignment = the TPU-native peak-memory
    # figure (runtime memory stats are absent on the tunneled backend;
    # reference records max_memory_allocated, workflow/utils/memory.py)
    peak_gb = -1.0
    try:
        from esme_tpu.profiling import memory_analysis_gb
        from esme_tpu.models.esm import packed_meta
        import jax.numpy as jnp
        b = batches[0]
        cu_lens = jnp.asarray(b.cu_lens, jnp.int32)
        seg_ids, pos_ids = packed_meta(cu_lens, b.tokens.shape[0])
        # class-level _step: the jitted method's bound wrapper loses
        # the binding on .lower(), so pass self explicitly (static)
        ana = memory_analysis_gb(
            type(trainer)._step, trainer, trainer.state,
            jnp.asarray(b.masked_tokens, jnp.int32), seg_ids, pos_ids,
            jnp.asarray(b.tokens, jnp.int32), jnp.asarray(b.mask),
            int(b.max_len))
        if ana:
            peak_gb = ana['total_gb']
    except Exception:
        pass

    t0 = time.time()
    total_tokens = 0
    for i in range(args.steps):
        b = batches[i % len(batches)]
        trainer.training_step(b)   # float(loss) is a true host sync
        total_tokens += int(b.cu_lens[-1])
    dt = time.time() - t0

    name = 'ckpt' if args.checkpointing else 'nockpt'
    if args.lora_rank:
        name += f'+lora{args.lora_rank}'
    if args.quantization != 'none':
        name += f'+{args.quantization}'
    print('config,token_per_batch,steps,sec_per_step,'
          'train_tokens_per_sec,peak_gb')
    print(f'{name},{args.token_per_batch},{args.steps},'
          f'{dt / args.steps:.4f},{total_tokens / dt:.0f},'
          f'{peak_gb:.2f}', flush=True)


if __name__ == '__main__':
    main()
