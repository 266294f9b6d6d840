"""On-chip A/B of the segment-flash fwd paths at the headline shape
(ESM2-650M attention: H=20, D=64, T=50176 packed 100-1000aa): v1
(static span sweep) vs v2 (dynamic actual-span emit_pipeline,
ops/flash_v2.py), both through the fused split+RoPE+flash+merge
boundary the model actually runs. Also checks on-chip numerics of v2
against v1. Env knobs: ESME_V2_BK, ESME_V2_HB."""

import os
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from esme_tpu.profiling import benchmark
from esme_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    from esme_tpu.ops.flash import ALIGN, DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q
    from esme_tpu.ops.fused_attn import fused_rotary_flash
    from esme_tpu.ops.rotary import rotary_cos_sin

    H, D = 20, 64
    HD = H * D * 20 // 20
    rng = np.random.default_rng(0)
    T = ((50_000 + ALIGN - 1) // ALIGN) * ALIGN
    lens, tot = [], 0
    while tot < T - 1024:
        n = int(rng.integers(100, 1000)) + 2
        lens.append(n)
        tot += n
    lens.append(T - tot)
    seg = jnp.asarray(np.repeat(np.arange(len(lens), dtype=np.int32),
                                lens))
    max_len = max(lens[:-1])
    pos = jnp.asarray(
        np.concatenate([np.arange(n, dtype=np.int32) for n in lens]))
    cos, sin = rotary_cos_sin(pos, D, dtype=jnp.bfloat16)
    q2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.bfloat16)
    v2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.bfloat16)

    sol_ms = 4 * sum(l * l for l in lens) * H * D / 197e12 * 1e3
    print(f'attention speed-of-light: {sol_ms:.2f} ms/layer', flush=True)

    def run(tag, reps=20):
        @jax.jit
        def f(q2, k2, v2):
            return fused_rotary_flash(q2, k2, v2, cos, sin, seg, H,
                                      DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                                      max_len, False)
        try:
            dt = benchmark(f, q2, k2, v2, reps=reps)
            out = f(q2, k2, v2)
            print(f'{tag:28s} {dt*1e3:7.2f} ms/layer '
                  f'({dt*1e3/sol_ms:4.1f}x SoL)', flush=True)
            return np.asarray(out[:, :64], np.float32)
        except Exception as e:
            print(f'{tag:28s} FAIL {type(e).__name__}: {str(e)[:150]}',
                  flush=True)
            return None

    os.environ.pop('ESME_FLASH_IMPL', None)
    ref = run('v1 (static span)')

    os.environ['ESME_FLASH_IMPL'] = 'v2'
    for bk, hb in [(1024, 4), (1024, 10), (1024, 20), (512, 10),
                   (512, 20), (256, 20)]:
        os.environ['ESME_V2_BK'] = str(bk)
        os.environ['ESME_V2_HB'] = str(hb)
        out = run(f'v2 bk={bk} hb={hb}')
        if out is not None and ref is not None:
            err = float(np.abs(out - ref).max())
            if err > 0.05:
                print(f'   !! numerics mismatch vs v1: {err}')
    os.environ.pop('ESME_FLASH_IMPL', None)


if __name__ == '__main__':
    main()
