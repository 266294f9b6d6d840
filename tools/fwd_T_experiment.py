"""Experimental transposed-score flash forward: scores live as
(hb, bk, bq) so the softmax max/sum reduce over bk happens on the
SUBLANE dim (the lane-dim max-reduce costs ~3 ms/layer at the bench
shape, results/flash_variants_r4.txt). All operands and the output are
token-minor (H, D, T). Numerics-checked against the production kernel,
then timed on chip."""
import functools
import math
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _bdot(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(a, b, dimension_numbers=(contract, batch),
                               preferred_element_type=jnp.float32)


def _fwd_kernel_T(kstart_ref, kend_ref,
                  qT_ref, segq_ref, k_ref, v_ref, segk_ref,
                  oT_ref, lse_ref,
                  m_scr, l_scr, acc_scr,
                  *, scale: float):
    i = pl.program_id(1)
    jj = pl.program_id(2)
    n_span = pl.num_programs(2)

    @pl.when(jj == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(jj < kend_ref[i] - kstart_ref[i])
    def _():
        qb = qT_ref[:]                                   # (hb, d, bq)
        # transposed scores: (hb, bk, bq)
        s = _bdot(k_ref[:], qb, ((1,), (1,))) * scale
        mask = (segk_ref[:] == segq_ref[:])[None]        # (1, bk, bq)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]                                # (hb, 1, bq)
        m_new = jnp.maximum(m_prev,
                            jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                           # (hb, bk, bq)
        l_scr[:] = l_scr[:] * alpha + \
            jnp.sum(p, axis=1, keepdims=True)
        # pv token-minor: (hb, d, bq)
        pv = _bdot(v_ref[:], p.astype(v_ref.dtype), ((2,), (1,)))
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    @pl.when(jj == n_span - 1)
    def _():
        l = l_scr[:]
        l_safe = jnp.where(l == 0, 1.0, l)
        oT_ref[:] = (acc_scr[:] / l_safe).astype(oT_ref.dtype)
        lse_ref[:] = m_scr[:] + jnp.log(l_safe)


def fwd_T(qT, kT, vT, segq_row, segk_col, kstart, kend, *, block_q,
          block_k, head_block, max_span, scale, interpret,
          vmem_limit=100 * 1024 * 1024):
    """qT/kT/vT: (H, D, T) token-minor; segq_row (1, Tq);
    segk_col (Tk, 1). Returns oT (H, D, Tq), lse (H, 1, Tq) f32."""
    H, D, Tq = qT.shape
    nqb = Tq // block_q
    hb = head_block

    def kv_index(g, i, jj, kstart_ref, kend_ref):
        j = jnp.minimum(kstart_ref[i] + jj, kend_ref[i] - 1)
        return (g, 0, j)

    def segk_index(g, i, jj, kstart_ref, kend_ref):
        j = jnp.minimum(kstart_ref[i] + jj, kend_ref[i] - 1)
        return (j, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(H // hb, nqb, max_span),
        in_specs=[
            pl.BlockSpec((hb, D, block_q), lambda g, i, jj, *_: (g, 0, i),
                         memory_space=pltpu.VMEM),        # qT
            pl.BlockSpec((1, block_q), lambda g, i, jj, *_: (0, i),
                         memory_space=pltpu.VMEM),        # segq (1,Tq)
            pl.BlockSpec((hb, D, block_k), kv_index,
                         memory_space=pltpu.VMEM),        # kT
            pl.BlockSpec((hb, D, block_k), kv_index,
                         memory_space=pltpu.VMEM),        # vT
            pl.BlockSpec((block_k, 1), segk_index,
                         memory_space=pltpu.VMEM),        # segk (Tk,1)
        ],
        out_specs=[
            pl.BlockSpec((hb, D, block_q), lambda g, i, jj, *_: (g, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, 1, block_q), lambda g, i, jj, *_: (g, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb, 1, block_q), jnp.float32),
            pltpu.VMEM((hb, 1, block_q), jnp.float32),
            pltpu.VMEM((hb, D, block_q), jnp.float32),
        ],
    )

    return pl.pallas_call(
        functools.partial(_fwd_kernel_T, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, D, Tq), qT.dtype),
            jax.ShapeDtypeStruct((H, 1, Tq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary', 'arbitrary'),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(kstart, kend, qT, segq_row, kT, vT, segk_col)


def main():
    import esme_tpu.ops.flash as flash
    from esme_tpu.profiling import benchmark
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    on_tpu = jax.default_backend() == 'tpu'
    H, D = 20, 64
    rng = np.random.default_rng(0)
    T = ((50_000 + 255) // 256) * 256 if on_tpu else 2048
    lens, tot = [], 0
    while tot < T - 1024:
        n = int(rng.integers(100, 1000 if on_tpu else 400)) + 2
        lens.append(n)
        tot += n
    lens.append(T - tot)
    seg = jnp.asarray(np.repeat(np.arange(len(lens), dtype=np.int32),
                                lens))
    max_len = max(lens[:-1])
    dt_ = jnp.bfloat16 if on_tpu else jnp.float32
    q = jnp.asarray(rng.standard_normal((H, T, D)), dt_)
    k = jnp.asarray(rng.standard_normal((H, T, D)), dt_)
    v = jnp.asarray(rng.standard_normal((H, T, D)), dt_)
    qT = jnp.swapaxes(q, 1, 2)
    kT = jnp.swapaxes(k, 1, 2)
    vT = jnp.swapaxes(v, 1, 2)
    seg2d = seg.reshape(T, 1)
    segT = seg.reshape(1, T)

    for bq, bk, hb in ([(256, 256, 20), (256, 512, 10), (256, 512, 20),
                        (512, 256, 20), (512, 512, 10), (256, 1024, 10)]
                       if on_tpu else [(256, 256, 4)]):
        kstart, kend, _, _ = flash.block_spans(seg, bq, bk)
        ms = flash._span_cap(T, bq, bk, max_len)

        @jax.jit
        def fT(qT, kT, vT):
            return fwd_T(qT, kT, vT, segT, seg2d, kstart, kend,
                         block_q=bq, block_k=bk, head_block=hb,
                         max_span=ms, scale=1 / math.sqrt(D),
                         interpret=not on_tpu)[0]

        try:
            if on_tpu:
                dt = benchmark(fT, qT, kT, vT, reps=20)
                print(f'fwd_T bq={bq} bk={bk:4d} hb={hb:2d} span={ms:2d}: '
                      f'{dt*1e3:7.2f} ms', flush=True)
            oT = fT(qT, kT, vT)
        except Exception as e:
            print(f'fwd_T bq={bq} bk={bk:4d} hb={hb:2d}: FAIL '
                  f'{str(e)[:160]}', flush=True)
            continue

        # numerics vs production kernel
        ks, ke, _, _ = flash.block_spans(seg, 256, 256)
        o_ref, _ = flash._fwd(q, kT, vT, seg2d, segT, ks, ke,
                              block_q=256, block_k=256, head_block=H,
                              max_span=flash._span_cap(T, 256, 256, max_len),
                              scale=1 / math.sqrt(D),
                              interpret=not on_tpu)
        err = float(jnp.max(jnp.abs(
            jnp.swapaxes(oT, 1, 2).astype(jnp.float32)
            - o_ref.astype(jnp.float32))))
        print(f'   err vs production: {err:.5f}', flush=True)


if __name__ == '__main__':
    main()
