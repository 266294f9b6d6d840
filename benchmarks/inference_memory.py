"""Inference peak memory over length buckets.

Mirrors the reference memory grid: per length bucket, run one forward
at batch 16 and record peak device memory; OOM is recorded as -1 and
the sweep stops (reference: workflow/inference/inference_memory.py:33-46,
workflow/utils/memory.py:4-16). Writes CSV to stdout.

Usage:
  python benchmarks/inference_memory.py --model esm2_150m \
      --quantization 8bit --max-bucket 2000
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
    args = ap.parse_args()

    import os
    import jax
    import jax.numpy as jnp
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from esme_tpu.alphabet import Alphabet
    from esme_tpu.models.config import config_for
    from esme_tpu.models.esm import ESM, _class_for
    from esme_tpu.profiling import device_memory_stats, memory_analysis_gb

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

    # params must be an ARGUMENT of the jitted fn: closing over them
    # embeds gigabytes of weights as HLO constants and the compile
    # never finishes on big models
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
    print('length,batch,temp_gb,total_gb,peak_runtime_gb')
    for length in range(args.min_bucket, args.max_bucket + 1, args.step):
        tokens = np.full((args.batch, length + 2), Alphabet.padding_idx,
                         np.int32)
        tokens[:, 0] = Alphabet.cls_idx
        tokens[:, 1:-1] = rng.integers(4, 24, (args.batch, length))
        tokens[:, -1] = Alphabet.eos_idx

        try:
            t = jnp.asarray(tokens)
            # XLA's buffer assignment: exact activation (temp) + total
            # footprint, available even without runtime memory stats.
            # Compile once AOT and execute the same executable.
            compiled = fwd.lower(model_params, t).compile()
            ana = compiled.memory_analysis()
            g = float(2 ** 30)
            ma = {'temp_gb': ana.temp_size_in_bytes / g,
                  'total_gb': (ana.argument_size_in_bytes
                               + ana.output_size_in_bytes
                               + ana.temp_size_in_bytes
                               + ana.generated_code_size_in_bytes
                               - ana.alias_size_in_bytes) / g} \
                if ana is not None else {}
            out = compiled(model_params, t)
            jax.block_until_ready(out)
            del out
        except Exception as e:      # OOM -> -1, stop like the reference
            print(f'{length},{args.batch},-1,-1,-1  # {type(e).__name__}',
                  flush=True)
            break
        peak = device_memory_stats().get('peak_bytes_in_use')
        peak_gb = peak / 2 ** 30 if peak is not None else -1
        print(f'{length},{args.batch},{ma.get("temp_gb", -1):.3f},'
              f'{ma.get("total_gb", -1):.3f},{peak_gb:.3f}', flush=True)


if __name__ == '__main__':
    main()
