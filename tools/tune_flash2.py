"""Honest (true-sync) sweep of the segment-flash kernel at the headline
shape (ESM2-650M: H=20, D=64, 50k packed tokens of 100-1000aa
proteins): (head_block, block_q, block_k, vmem_limit) -> fwd / fwd+bwd
ms. Round 2's sweep used block_until_ready, which is a no-op on the
tunneled runtime, so its timings (and the chosen config) were invalid.
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

import esme_tpu.ops.flash as flash
from esme_tpu.profiling import benchmark
from esme_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def make_inputs(T=50176, H=20, D=64, seed=0):
    rng = np.random.default_rng(seed)
    lens, total = [], 0
    while total < T - 1024:
        n = int(rng.integers(100, 1000)) + 2
        lens.append(n)
        total += n
    lens.append(T - total)
    seg = np.repeat(np.arange(len(lens), dtype=np.int32), lens)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    sol_ms = 4 * sum(l * l for l in lens) * H * D / 197e12 * 1e3
    return q, k, v, jnp.asarray(seg), 1002, sol_ms


def main():
    q, k, v, seg, max_len, sol_ms = make_inputs()
    print(f'attention speed-of-light (exact segments): {sol_ms:.2f} ms',
          flush=True)

    def run(hb, bq, bk, vmem_mb):
        flash._head_block = lambda *a, **kw: hb
        flash._MAX_HEAD_BLOCK = hb
        flash._VMEM_LIMIT_BYTES = vmem_mb * 1024 * 1024 if vmem_mb else None

        @jax.jit
        def fwd(q, k, v):
            return flash.flash_segment_attention(
                q, k, v, seg, block_q=bq, block_k=bk, max_seqlen=max_len)

        @jax.jit
        def fb(q, k, v):
            def loss(q, k, v):
                return flash.flash_segment_attention(
                    q, k, v, seg, block_q=bq, block_k=bk,
                    max_seqlen=max_len).astype(jnp.float32).sum()
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        tag = f'hb={hb:3d} bq={bq:4d} bk={bk:4d} vmem={vmem_mb or 16:3d}MB'
        try:
            tf = benchmark(fwd, q, k, v, reps=10)
        except Exception as e:
            print(f'{tag}  fwd FAIL ({type(e).__name__}: '
                  f'{str(e)[:80]})', flush=True)
            return
        try:
            tb = benchmark(fb, q, k, v, reps=5)
            msg = f'fwd {tf*1e3:7.2f} ms   fwd+bwd {tb*1e3:7.2f} ms'
        except Exception as e:
            msg = f'fwd {tf*1e3:7.2f} ms   bwd FAIL ({type(e).__name__})'
        print(f'{tag}  {msg}', flush=True)

    grid = [
        # current default
        (2, 256, 1024, None), (4, 256, 1024, None), (5, 256, 1024, None),
        (4, 256, 1024, 64), (5, 256, 1024, 64), (10, 256, 1024, 100),
        (4, 512, 1024, 64), (5, 512, 1024, 100), (2, 512, 1024, None),
        (5, 256, 512, None), (10, 256, 512, 64), (20, 256, 512, 100),
        (5, 512, 512, 64), (10, 512, 512, 100),
        (10, 128, 1024, 64), (20, 128, 1024, 100),
        (4, 256, 2048, 64), (2, 256, 2048, None),
        (20, 256, 256, 64), (10, 256, 256, None),
    ]
    for hb, bq, bk, vm in grid:
        run(hb, bq, bk, vm)


if __name__ == '__main__':
    main()
