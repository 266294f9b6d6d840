"""Time the pieces of the fused attention complex separately on chip:
split(+RoPE, token-minor) / flash fwd / merge, at the 650M bench shape.
Identifies whether the relayout kernels or the flash kernel bound the
complex after the round-4 token-minor rewrite."""
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from esme_tpu.profiling import benchmark
from esme_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    import esme_tpu.ops.flash as flash
    from esme_tpu.ops.headsplit import (_merge_call, _split_call,
                                        _split_call_t, _split_one_call_t)
    from esme_tpu.ops.rotary import rotary_cos_sin

    H, D = 20, 64
    rng = np.random.default_rng(0)
    T = ((50_000 + 255) // 256) * 256
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

    @jax.jit
    def split_t(q2):
        return _split_call_t(q2, q2, q2, cos, sin, H, False)

    @jax.jit
    def split_plain(q2):
        return _split_call(q2, q2, q2, cos, sin, H, False, False)

    @jax.jit
    def split_one_t(q2):
        return _split_one_call_t(q2, H, False)

    dt = benchmark(split_t, q2, reps=20)
    print(f'split_t   (3x in, q htd + k/v token-minor): {dt*1e3:7.2f} ms',
          flush=True)
    dt = benchmark(split_plain, q2, reps=20)
    print(f'split     (3x in, all head-major htd):      {dt*1e3:7.2f} ms',
          flush=True)
    dt = benchmark(split_one_t, q2, reps=20)
    print(f'split_one_t (1x in, token-minor):           {dt*1e3:7.2f} ms',
          flush=True)

    qh, kT, vT = split_t(q2)

    @jax.jit
    def merge(o):
        return _merge_call(o, None, None, False, False, False)

    dt = benchmark(merge, qh, reps=20)
    print(f'merge     (htd -> T,HD):                    {dt*1e3:7.2f} ms',
          flush=True)

    seg2d = seg.reshape(T, 1)
    segT = seg.reshape(1, T)

    for bq, bk, hb in [(256, 256, 20), (256, 256, 10), (256, 512, 10),
                       (256, 512, 20), (256, 1024, 5), (256, 1024, 10),
                       (256, 2048, 5)]:
        if T % bk:
            continue
        kstart, kend, _, _ = flash.block_spans(seg, bq, bk)
        ms = flash._span_cap(T, bq, bk, max_len)

        @jax.jit
        def f(qh, kT, vT):
            return flash._fwd(qh, kT, vT, seg2d, segT, kstart, kend,
                              block_q=bq, block_k=bk, head_block=hb,
                              max_span=ms, scale=0.125,
                              interpret=False)[0]
        try:
            dt = benchmark(f, qh, kT, vT, reps=20)
            print(f'flash fwd bq={bq} bk={bk:4d} hb={hb:2d} span={ms:2d}: '
                  f'{dt*1e3:7.2f} ms', flush=True)
        except Exception as e:
            print(f'flash fwd bq={bq} bk={bk:4d} hb={hb:2d}: FAIL '
                  f'{str(e)[:120]}', flush=True)


if __name__ == '__main__':
    main()
