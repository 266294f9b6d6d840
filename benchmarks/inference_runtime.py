"""Inference runtime over length buckets.

Mirrors the reference benchmark grid: sequence lengths 100→3500 step
100, batch 16, mean of 10 timed reps
(reference: workflow/inference/inference_runtime.py:36-52,
workflow/inference/extract_uniprotkb.py:13-22). Writes CSV to stdout.

Usage:
  python benchmarks/inference_runtime.py --model esm2_150m \
      --quantization none --max-bucket 1000
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='esm2_8m',
                    help='name (random init at that size) or .safetensors')
    ap.add_argument('--quantization', default='none',
                    choices=['none', '8bit', '4bit'])
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--min-bucket', type=int, default=100)
    ap.add_argument('--max-bucket', type=int, default=3500)
    ap.add_argument('--step', type=int, default=100)
    ap.add_argument('--reps', type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import os
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from esme_tpu.alphabet import Alphabet
    from esme_tpu.models.config import config_for
    from esme_tpu.models.esm import ESM, _class_for
    from esme_tpu.profiling import benchmark

    if os.path.isfile(args.model):
        model = ESM.from_pretrained(
            args.model,
            quantization=None if args.quantization == 'none'
            else args.quantization)
    else:
        cfg = config_for(args.model)
        model = _class_for(cfg.family)(config=cfg, rng=0)
        if args.quantization != 'none':
            model.quantize(args.quantization)

    # params must be an ARGUMENT of the jitted fn (constants would blow
    # up compile); one AOT-compiled executable per bucket gives both
    # the timed object and XLA's exact buffer-assignment memory.
    def _fwd(params, t):
        saved = model.params
        model.params = params
        try:
            return model.forward(t)
        finally:
            model.params = saved

    fwd = jax.jit(_fwd)
    model_params = model.params

    rng = np.random.default_rng(0)
    print('length,batch,sec_per_fwd,tokens_per_sec,peak_gb')
    for length in range(args.min_bucket, args.max_bucket + 1, args.step):
        tokens = np.full((args.batch, length + 2), Alphabet.padding_idx,
                         np.int32)
        tokens[:, 0] = Alphabet.cls_idx
        tokens[:, 1:-1] = rng.integers(4, 24, (args.batch, length))
        tokens[:, -1] = Alphabet.eos_idx
        t = jnp.asarray(tokens)

        try:
            compiled = fwd.lower(model_params, t).compile()
            ana = compiled.memory_analysis()
            peak_gb = -1.0
            if ana is not None:
                peak_gb = (ana.argument_size_in_bytes
                           + ana.output_size_in_bytes
                           + ana.temp_size_in_bytes
                           + ana.generated_code_size_in_bytes
                           - ana.alias_size_in_bytes) / 2 ** 30
            dt = benchmark(lambda: compiled(model_params, t),
                           reps=args.reps)
        except Exception as e:     # OOM -> -1, like the reference
            print(f'{length},{args.batch},-1,-1,-1  # {type(e).__name__}')
            continue
        total = args.batch * (length + 2)
        print(f'{length},{args.batch},{dt:.4f},{total / dt:.0f},'
              f'{peak_gb:.3f}', flush=True)


if __name__ == '__main__':
    main()
