"""Segment-flash attention v2: dynamic actual-span inner pipeline.

Round-3 finding (tools/flash_variants.py): the v1 kernel's cost is
insensitive to every compute ablation (mask/max/exp removed: ~12ms
either way at the 650M bench shape) and tracks ``max_span x block_k``
across tilings — i.e. it is bound by the DMA of the *static* span
sweep. The BlockSpec index-map clamp ("repeated index skips the copy")
does not actually skip on this toolchain: every grid step fetches its
k/v tile, so tiles beyond a q block's real span are fetched and thrown
away (~40% of traffic at the bench shape, far more for short-segment
batches).

v2 restructures: the outer grid is (H/hb, num_q_blocks) — one fat step
per (head-group, q-block) — and each step runs a ``pltpu.emit_pipeline``
whose grid length is the block's REAL span ``kend[i]-kstart[i]`` (a
dynamic value: emit_pipeline accepts jax.Array grid sizes). k/v/seg_k
stay in HBM (``memory_space=ANY``) and the inner pipeline
double-buffers exactly the overlapping tiles. DMA traffic drops to the
actual block-diagonal coverage; grid-step overhead drops by the span
factor.

Numerics identical to v1 (same online-softmax update, fp32 state).

HISTORICAL (round 4): the on-chip A/B (results/flash_ab_v2.txt)
showed this design's win over the head-minor v1 was marginal
(13.1 -> 12.0 ms/layer) because the binding resource was DMA
*bandwidth* (layout), not wasted tiles. The production kernel
(ops/flash.py) is now fully token-minor with transposed scores and an
optional flat job grid, measuring 5.3 ms/layer at the same shape; this
module is kept for the ESME_FLASH_IMPL=v2 A/B path only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash import NEG_INF, _bdot


def _fwd_kernel_v2(kstart_ref, kend_ref,
                   q_ref, segq_ref,
                   k_hbm, v_hbm, segk_hbm,
                   o_ref, lse_ref,
                   m_scr, l_scr, acc_scr,
                   *, scale: float, block_k: int, head_block: int):
    g = pl.program_id(0)
    i = pl.program_id(1)
    hb = head_block
    bk = block_k
    D = q_ref.shape[-1]

    j0 = kstart_ref[i]
    span = kend_ref[i] - j0

    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    qb = q_ref[:]                                    # (hb, bq, d)
    sq = segq_ref[:]                                 # (bq, 1)

    def tile(k_ref, v_ref, sk_ref):
        # k/v tiles arrive in (hb, D, bk) layout: the minor dim is bk
        # (tile-aligned HBM slices — a (bk, 64) block of a lane-padded
        # (T, 64) array cannot be sliced) and QK^T becomes the natural
        # lhs-minor x rhs-major MXU contraction.
        s = _bdot(qb, k_ref[:], ((2,), (1,))) * scale    # (hb, bq, bk)
        mask = (sq == sk_ref[:])[None]                   # (1, bq, bk)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=2, keepdims=True)
        pv = _bdot(p.astype(v_ref.dtype), v_ref[:], ((2,), (2,)))
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    pipeline = pltpu.emit_pipeline(
        tile,
        grid=(span,),
        in_specs=[
            pl.BlockSpec((hb, D, bk), lambda jj: (g, 0, j0 + jj)),
            pl.BlockSpec((hb, D, bk), lambda jj: (g, 0, j0 + jj)),
            pl.BlockSpec((1, bk), lambda jj: (0, j0 + jj)),
        ],
    )
    pipeline(k_hbm, v_hbm, segk_hbm)

    l = l_scr[:]
    l_safe = jnp.where(l == 0, 1.0, l)
    o_ref[:] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
    lse_ref[:] = m_scr[:] + jnp.log(l_safe)


def fwd_v2(q, k, v, seg2d, segT, kstart, kend, *, block_q, block_k,
           head_block, scale, interpret, vmem_limit=None):
    """q: (H, T, D); k/v: (H, D, T) — token-minor so HBM tile slices
    are aligned. Returns o (H, T, D), lse (H, T, 1) fp32."""
    H, T, D = q.shape
    nqb = T // block_q
    hb = head_block

    kw = dict(dimension_semantics=('parallel', 'arbitrary'))
    if vmem_limit:
        kw['vmem_limit_bytes'] = vmem_limit

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(H // hb, nqb),
        in_specs=[
            pl.BlockSpec((hb, block_q, D), lambda g, i, *_: (g, i, 0),
                         memory_space=pltpu.VMEM),       # q
            pl.BlockSpec((block_q, 1), lambda g, i, *_: (i, 0),
                         memory_space=pltpu.VMEM),       # seg_q (T, 1)
            pl.BlockSpec(memory_space=pl.ANY),        # k (stays HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # v (stays HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # seg_k (1, Tk)
        ],
        out_specs=[
            pl.BlockSpec((hb, block_q, D), lambda g, i, *_: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, block_q, 1), lambda g, i, *_: (g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb, block_q, 1), jnp.float32),   # m
            pltpu.VMEM((hb, block_q, 1), jnp.float32),   # l
            pltpu.VMEM((hb, block_q, D), jnp.float32),   # acc
        ],
    )

    return pl.pallas_call(
        functools.partial(_fwd_kernel_v2, scale=scale, block_k=block_k,
                          head_block=hb),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, T, D), q.dtype),
            jax.ShapeDtypeStruct((H, T, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(**kw),
        interpret=interpret,
    )(kstart, kend, q, seg2d, k, v, segT)
