"""Sweep (head_block, block_q, block_k) for the segment-flash kernel on
the real chip; report compile-or-OOM and steady-state time for fwd and
fwd+bwd at the headline benchmark shape (ESM2-650M: H=20, D=64,
token_per_batch=50k of ~500aa proteins)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import esme_tpu.ops.flash as flash


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
    return q, k, v, jnp.asarray(seg), 1002


def timeit(fn, *args, reps=20):
    # true-sync timing: block_until_ready is a NO-OP on the tunneled
    # runtime (round-2 sweep timings were invalid because of this)
    import sys
    sys.path.insert(0, '/root/repo')
    from esme_tpu.profiling import benchmark
    return benchmark(fn, *args, reps=reps)


def main():
    q, k, v, seg, max_len = make_inputs()

    def run(hb, bq, bk):
        flash._head_block = lambda *a, **kw: hb

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

        try:
            tf = timeit(fwd, q, k, v)
        except Exception as e:
            print(f'hb={hb:3d} bq={bq:4d} bk={bk:4d}  fwd OOM '
                  f'({type(e).__name__})', flush=True)
            return
        try:
            tb = timeit(fb, q, k, v, reps=10)
            msg = f'fwd {tf*1e3:7.3f} ms   fwd+bwd {tb*1e3:7.3f} ms'
        except Exception as e:
            msg = f'fwd {tf*1e3:7.3f} ms   bwd OOM ({type(e).__name__})'
        print(f'hb={hb:3d} bq={bq:4d} bk={bk:4d}  {msg}', flush=True)

    for bq, bk in [(512, 512), (512, 256), (256, 256), (1024, 512),
                   (256, 512)]:
        for hb in [1, 2, 4, 5, 10, 20]:
            run(hb, bq, bk)


if __name__ == '__main__':
    main()
