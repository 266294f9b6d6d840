"""On-chip sweep of the token-minor segment-flash kernel (round 4) at
the headline shape (ESM2-650M attention: H=20, D=64, T=50176 packed
100-1000aa): forward and backward across (bq, bk, score-budget), via
the fused split+RoPE+flash+merge boundary the model actually runs.
Verifies numerics against the pre-rewrite path recorded in
results/flash_ab_v2.txt (v1 13.1 ms/layer fwd)."""

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
    from esme_tpu.ops.fused_attn import fused_rotary_flash
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
    k2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.bfloat16)
    v2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.bfloat16)

    sol_ms = 4 * sum(l * l for l in lens) * H * D / 197e12 * 1e3
    print(f'attention speed-of-light: {sol_ms:.2f} ms/layer (fwd)',
          flush=True)

    ref_out = None

    def run(bq, bk, fwd_budget, bwd_budget, reps=20):
        nonlocal ref_out
        flash._FWD_SCORE_BUDGET = fwd_budget
        flash._BWD_SCORE_BUDGET = bwd_budget
        hb_f = flash._head_block(H, bq, bk, fwd_budget)
        hb_b = flash._head_block(H, bq, bk, bwd_budget)

        @jax.jit
        def f(q2, k2, v2):
            return fused_rotary_flash(q2, k2, v2, cos, sin, seg, H,
                                      bq, bk, max_len, False)

        @jax.jit
        def g(q2, k2, v2):
            def loss(q2, k2, v2):
                return jnp.sum(
                    fused_rotary_flash(q2, k2, v2, cos, sin, seg, H,
                                       bq, bk, max_len,
                                       False).astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1, 2))(q2, k2, v2)

        tag = f'bq={bq:4d} bk={bk:4d} hbf={hb_f:2d} hbb={hb_b:2d}'
        try:
            dt_f = benchmark(f, q2, k2, v2, reps=reps)
            out = np.asarray(f(q2, k2, v2)[:, :64], np.float32)
        except Exception as e:
            print(f'{tag} fwd FAIL {type(e).__name__}: {str(e)[:140]}',
                  flush=True)
            return
        try:
            dt_b = benchmark(g, q2, k2, v2, reps=max(reps // 2, 5))
            bwd_ms = f'{dt_b*1e3:7.2f}'
        except Exception as e:
            bwd_ms = f'FAIL {type(e).__name__}: {str(e)[:90]}'
        err = ''
        if ref_out is None:
            ref_out = out
        else:
            err = f' err={np.abs(out - ref_out).max():.4f}'
        print(f'{tag} fwd {dt_f*1e3:7.2f} ms ({dt_f*1e3/sol_ms:4.1f}x '
              f'SoL)  fwd+bwd {bwd_ms} ms{err}', flush=True)

    M = 1024 * 1024
    for bq, bk, fb, bb in [
        (256, 256, 6 * M, 6 * M),      # hb 20 / 20
        (256, 256, 6 * M, 3 * M),      # bwd hb 10
        (512, 256, 11 * M, 11 * M),    # hb 20
        (256, 512, 11 * M, 11 * M),    # hb 20
        (256, 256, 3 * M, 3 * M),      # hb 10
    ]:
        run(bq, bk, fb, bb)


if __name__ == '__main__' and (len(sys.argv) < 2 or sys.argv[1] != 'jobs'):
    main()


def ab_jobs():
    """A/B the dynamic-span job mode vs the static span sweep through
    the fused boundary at the bench shape."""
    import math
    import esme_tpu.ops.flash as flash
    from esme_tpu.ops.fused_attn import fused_rotary_flash
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
    seg_np = np.repeat(np.arange(len(lens), dtype=np.int32), lens)
    seg = jnp.asarray(seg_np)
    max_len = max(lens[:-1])
    pos = jnp.asarray(
        np.concatenate([np.arange(n, dtype=np.int32) for n in lens]))
    cos, sin = rotary_cos_sin(pos, D, dtype=jnp.bfloat16)
    q2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.bfloat16)
    v2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.bfloat16)
    sol_ms = 4 * sum(l * l for l in lens) * H * D / 197e12 * 1e3

    nj = flash.host_num_jobs(seg_np, 256, 256)
    print(f'num_jobs={nj} vs static '
          f'{(T//256)*flash._span_cap(T, 256, 256, max_len)}', flush=True)

    ref = None
    for tag, njobs in [('static', None), ('jobs', nj)]:
        @jax.jit
        def f(q2, k2, v2):
            return fused_rotary_flash(q2, k2, v2, cos, sin, seg, H,
                                      256, 256, max_len, False, njobs)
        dt = benchmark(f, q2, k2, v2, reps=20)
        out = np.asarray(f(q2, k2, v2)[:, :64], np.float32)
        err = ''
        if ref is None:
            ref = out
        else:
            err = f'  err={np.abs(out - ref).max():.5f}'
        print(f'fused fwd {tag:7s} {dt*1e3:7.2f} ms '
              f'({dt*1e3/sol_ms:4.1f}x SoL){err}', flush=True)


if __name__ == '__main__' and len(sys.argv) > 1 and sys.argv[1] == 'jobs':
    ab_jobs()
