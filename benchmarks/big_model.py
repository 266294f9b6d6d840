"""BASELINE config 4: big-model capacity demo.

ESM2-3B weights are written straight to a reference-schema safetensors
file on the host (random-init at the real architecture — no egress in
this environment), then loaded with streaming 4-bit quantization (the
bf16 model never materializes on device) + activation checkpointing,
and a ``predict_mask_margin`` sweep runs on the chip
(reference: esme/esm.py:434-446 Linear4bit load; BASELINE.md config 4).
Records runtime and XLA buffer-assignment memory. ``--model esm2_15b``
runs the same flow at 15B (stretch: 4-bit weights ~ 7.4GB).

Usage:
  python benchmarks/big_model.py --model esm2_3b [--keep FILE]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def write_random_checkpoint(path, cfg, name, seed=0):
    """Random-init safetensors in the reference key schema, written
    tensor-by-tensor on the host. Shapes come from
    ``jax.eval_shape(init_params)`` (no tracing-time compute); values
    are plain numpy normals — a jax-jit host init of a 3B pytree took
    >25 min (threefry on CPU + giant init graph), numpy takes seconds,
    and for a random-weight capacity demo the RNG stream is
    irrelevant."""
    from esme_tpu.models.init import init_params
    from esme_tpu.models.io import params_to_flat
    import jax
    import ml_dtypes

    shapes = jax.eval_shape(lambda k: init_params(cfg, k),
                            jax.ShapeDtypeStruct((2,), np.uint32))
    rng = np.random.default_rng(seed)

    def fill(leaf):
        # fp32 draw cast to the leaf dtype; scale matches the 0.02
        # init std (exact stream irrelevant for a random-weight demo)
        arr = (rng.standard_normal(leaf.shape, dtype=np.float32) * 0.02)
        return arr.astype(ml_dtypes.bfloat16
                          if leaf.dtype == jax.numpy.bfloat16
                          else leaf.dtype)

    params = jax.tree.map(fill, shapes)
    flat = params_to_flat(params, cfg)
    import safetensors.numpy
    flat = {k: np.asarray(v) for k, v in flat.items()}
    metadata = {'name': name, 'num_layers': str(cfg.num_layers),
                'embed_dim': str(cfg.embed_dim),
                'attention_heads': str(cfg.attention_heads),
                'format': 'pt'}
    safetensors.numpy.save_file(flat, path, metadata=metadata)
    return os.path.getsize(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='esm2_3b')
    ap.add_argument('--quantization', default='4bit')
    ap.add_argument('--seq-len', type=int, default=256,
                    help='protein length for the mask-margin sweep')
    ap.add_argument('--keep', default=None,
                    help='reuse/keep the checkpoint at this path')
    args = ap.parse_args()

    import jax
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from esme_tpu.models.config import config_for
    from esme_tpu.models.esm import ESM
    from esme_tpu.profiling import device_memory_stats
    from esme_tpu.variant import predict_mask_margin

    cfg = config_for(args.model)
    n_params = cfg.num_layers * (
        4 * cfg.embed_dim ** 2 + 2 * cfg.embed_dim * 4 * cfg.embed_dim)
    print(f'# {args.model}: {cfg.num_layers}L/{cfg.embed_dim}d, '
          f'~{n_params/1e9:.1f}B linear params, '
          f'bf16 {2*n_params/2**30:.1f} GiB '
          f'(> HBM: streaming quantized load required)', flush=True)

    path = args.keep or os.path.join(tempfile.gettempdir(),
                                     f'{args.model}_random.safetensors')
    if not os.path.exists(path):
        t0 = time.time()
        size = write_random_checkpoint(path, cfg, args.model)
        print(f'checkpoint written: {size/2**30:.2f} GiB in '
              f'{time.time()-t0:.0f}s', flush=True)

    t0 = time.time()
    model = ESM.from_pretrained(path, quantization=args.quantization,
                                checkpointing=True)
    qbytes = sum(np.dtype(x.dtype).itemsize * x.size
                 for x in jax.tree.leaves(model.params))
    print(f'loaded {args.quantization} in {time.time()-t0:.0f}s; '
          f'device params {qbytes/2**30:.2f} GiB', flush=True)

    seq = ''.join(np.random.default_rng(0).choice(
        list('LAGVSERTIDPKQNFYMHWC'), args.seq_len))
    t0 = time.time()
    df = predict_mask_margin(model, seq)
    dt = time.time() - t0
    stats = device_memory_stats()
    peak = stats.get('peak_bytes_in_use')
    if peak:
        peak_gb = peak / 2 ** 30
    else:
        # tunneled backends expose no runtime memory stats; use XLA's
        # buffer assignment for the sweep's forward program instead
        # (params + activations + temps — the capacity proof,
        # reference peak-memory analogue: workflow/utils/memory.py:4-16)
        import jax.numpy as jnp
        from esme_tpu.models.esm import _repack_padded, forward_flat
        from esme_tpu.profiling import memory_analysis_gb

        L = args.seq_len + 2

        def probe(params, tok2d):
            flat, seg, pos, _, _ = _repack_padded(
                tok2d, model.config.padding_idx)
            return forward_flat(params, model.config, flat, seg, pos,
                                with_head=True, log_prob=True,
                                checkpointing=True, max_seqlen=L)

        import jax as _jax
        m = memory_analysis_gb(_jax.jit(probe), model.params,
                               jnp.zeros((32, L), jnp.int32))
        peak_gb = m.get('total_gb', -1)
    print('model,quant,seq_len,n_variants,mask_margin_sec,peak_gb')
    print(f'{args.model},{args.quantization},{args.seq_len},{len(df)},'
          f'{dt:.1f},{peak_gb:.2f}', flush=True)
    print(f'# sample margins: {df["score"].head(3).tolist()}'
          if 'score' in df.columns else f'# columns: {list(df.columns)}')
    if not args.keep:
        os.unlink(path)


if __name__ == '__main__':
    main()
