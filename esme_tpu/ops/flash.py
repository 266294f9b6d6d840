"""Pallas segment-flash attention for packed (varlen) batches.

The TPU-native replacement for flash-attn's varlen CUDA kernel
(reference: esme/attention.py:115-123). Non-causal self-attention over
a flat token stream where token *t* may attend token *s* iff
``seg_ids[t] == seg_ids[s]``.

Design (SURVEY.md §7 deviation 2):

* online-softmax tiling (flash attention) → O(T·D) memory;
* **cross-segment block skipping**: packed batches make attention
  block-diagonal. For every q block the contiguous span of overlapping
  k blocks is precomputed in XLA and scalar-prefetched; the grid's
  inner dimension walks ``max_span`` tiles whose k/v BlockSpec index
  maps clamp into the span. Pallas's automatic pipelining then
  double-buffers every tile load behind compute — beyond-span steps
  clamp to a repeated block index, which skips the copy, and their
  compute is predicated off. For a 50k-token batch of ~500-aa proteins
  this skips ~98% of tiles — flash-attn-varlen asymptotics;
* **head grouping**: TPU grid steps have a fixed ~6µs scheduling cost
  that dwarfs the (bq,64)×(64,bk) matmuls of a single 64-dim head, so
  each grid step processes ``head_block`` heads at once via batched
  ``dot_general`` — 10-20× fewer grid steps for the same FLOPs. The
  group size is chosen so the fp32 (hb, bq, bk) score tensor and the
  double-buffered tiles stay inside ~16MB of VMEM;
* ``max_span`` is static: derived from the data plane's ``max_len``
  (the longest packed sequence) as ceil((bq + 2·max_len)/bk) + 1;
* fp32 online-softmax state and fp32 MXU accumulation; bf16 operands;
* segment ids travel in ``(T, 1)`` and ``(1, T)`` orientations so both
  mask orientations broadcast without in-kernel transposes.

Backward is the standard two-kernel flash decomposition (dq by q-block,
dk/dv by k-block) re-using the same span + head-group machinery via
``jax.custom_vjp``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Default tile sizes (v5e sweep, tools/tune_flash.py — larger k tiles
# amortize per-grid-step cost; the q tile stays small to keep spans
# tight). ALIGN is the packed-length multiple at which the kernel runs
# zero-copy: callers that pre-pad T to ALIGN (forward_flat does) skip
# the per-call pad/slice entirely.
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 1024
ALIGN = math.lcm(DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)

# Budgets for the fp32 (hb, bq, bk) score tensor of one grid step,
# calibrated on v5e against the 16MB scoped-VMEM limit (the compiler
# keeps ~3 score-sized temporaries live in the fwd kernel and ~5 in the
# bwd kernels, plus double-buffered tiles): tools/tune_flash.py sweep.
_FWD_SCORE_BUDGET = 4 * 1024 * 1024
_BWD_SCORE_BUDGET = int(2.5 * 1024 * 1024)
# Beyond ~5 grouped heads register/retiling pressure OOMs even when the
# score tensor is small (hb=10 at bq=bk=256 fails with 2.5MB of scores).
_MAX_HEAD_BLOCK = 5

# Raised VMEM ceiling for the kernels (Mosaic's default scoped limit).
# The per-grid-step scheduling latency (~2-3us) dominates this kernel
# when head groups are small, so fitting a larger (hb, bq, bk) score
# tensor — and thus fewer, fatter grid steps — is worth more than any
# in-step optimization; tools/tune_flash.py sweeps this.
_VMEM_LIMIT_BYTES: int | None = None


def _compiler_params():
    kw = dict(dimension_semantics=('parallel', 'arbitrary', 'arbitrary'))
    if _VMEM_LIMIT_BYTES is not None:
        kw['vmem_limit_bytes'] = _VMEM_LIMIT_BYTES
    return pltpu.CompilerParams(**kw)


def block_spans(seg_ids: jnp.ndarray, block_q: int, block_k: int,
                seg_k: jnp.ndarray | None = None):
    """Per-q-block ``[start, end)`` span of overlapping k blocks and the
    transposed spans for the backward pass.

    Correct for non-monotonic segment ids too (padded-view layout): the
    span is min..max overlapping block; interior non-overlapping blocks
    are killed by the in-kernel mask — wasted FLOPs only, never wrong
    results. For packed layouts seg ids are sorted and spans are exact.

    ``seg_k``: separate key-side segment ids for rectangular attention
    (context parallelism: local queries over gathered global keys);
    defaults to ``seg_ids`` (self-attention).
    """
    seg_kk = seg_ids if seg_k is None else seg_k
    nqb = seg_ids.shape[0] // block_q
    nkb = seg_kk.shape[0] // block_k
    qs = seg_ids.reshape(nqb, block_q)
    ks = seg_kk.reshape(nkb, block_k)
    qmin, qmax = qs.min(1), qs.max(1)
    kmin, kmax = ks.min(1), ks.max(1)

    overlap = (kmin[None, :] <= qmax[:, None]) & \
        (kmax[None, :] >= qmin[:, None])          # (nqb, nkb)

    def spans(ov):
        n = ov.shape[1]
        idx = jnp.arange(n, dtype=jnp.int32)
        start = jnp.min(jnp.where(ov, idx, n), axis=1)
        end = jnp.max(jnp.where(ov, idx + 1, 0), axis=1)
        return start.astype(jnp.int32), end.astype(jnp.int32)

    kstart, kend = spans(overlap)          # per q block
    qstart, qend = spans(overlap.T)        # per k block
    return kstart, kend, qstart, qend


def _bdot(a, b, contract, batch=((0,), (0,))):
    """Batched matmul over the head-group dim with fp32 accumulation."""
    return jax.lax.dot_general(a, b, dimension_numbers=(contract, batch),
                               preferred_element_type=jnp.float32)


def _span_cap(T, block_q, block_k, max_seqlen):
    """Static upper bound on a q block's k-span width (in k blocks)."""
    nkb = -(-T // block_k)
    if max_seqlen is None:
        return nkb
    cap = -(-(block_q + 2 * max_seqlen) // block_k) + 1
    return min(nkb, cap)


def _head_block(H, block_q, block_k, budget):
    """Largest divisor of H (≤ _MAX_HEAD_BLOCK) whose fp32 score tensor
    fits ``budget`` bytes."""
    per_head = block_q * block_k * 4
    best = 1
    for hb in range(1, min(H, _MAX_HEAD_BLOCK) + 1):
        if H % hb == 0 and hb * per_head <= budget:
            best = hb
    return best


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(kstart_ref, kend_ref,
                q_ref, segq_ref, k_ref, v_ref, segk_ref,
                o_ref, lse_ref,
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
        qb = q_ref[:]                                # (hb, bq, d)
        s = _bdot(qb, k_ref[:], ((2,), (2,))) * scale  # (hb, bq, bk)
        mask = (segq_ref[:] == segk_ref[:])[None]    # (1, bq, bk)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]                            # (hb, bq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=2, keepdims=True)
        pv = _bdot(p.astype(v_ref.dtype), v_ref[:], ((2,), (1,)))
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    @pl.when(jj == n_span - 1)
    def _():
        l = l_scr[:]
        # fully-masked rows cannot happen for real tokens (every token
        # overlaps its own block); keep padding rows finite anyway
        l_safe = jnp.where(l == 0, 1.0, l)
        o_ref[:] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse_ref[:] = m_scr[:] + jnp.log(l_safe)


def _fwd(q, k, v, seg2d, segT, kstart, kend, *, block_q, block_k,
         head_block, max_span, scale, interpret):
    """q/k/v: (H, T, D). Returns o (H,T,D), lse (H,T,1) fp32."""
    H, T, D = q.shape
    nqb = T // block_q
    hb = head_block

    def kv_index(g, i, jj, kstart_ref, kend_ref):
        j = jnp.minimum(kstart_ref[i] + jj, kend_ref[i] - 1)
        return (g, j, 0)

    def segk_index(g, i, jj, kstart_ref, kend_ref):
        j = jnp.minimum(kstart_ref[i] + jj, kend_ref[i] - 1)
        return (0, j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(H // hb, nqb, max_span),
        in_specs=[
            pl.BlockSpec((hb, block_q, D), lambda g, i, jj, *_: (g, i, 0),
                         memory_space=pltpu.VMEM),        # q
            pl.BlockSpec((block_q, 1), lambda g, i, jj, *_: (i, 0),
                         memory_space=pltpu.VMEM),        # seg_q (T,1)
            pl.BlockSpec((hb, block_k, D), kv_index,
                         memory_space=pltpu.VMEM),        # k
            pl.BlockSpec((hb, block_k, D), kv_index,
                         memory_space=pltpu.VMEM),        # v
            pl.BlockSpec((1, block_k), segk_index,
                         memory_space=pltpu.VMEM),        # seg_k (1,T)
        ],
        out_specs=[
            pl.BlockSpec((hb, block_q, D), lambda g, i, jj, *_: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, block_q, 1), lambda g, i, jj, *_: (g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb, block_q, 1), jnp.float32),
            pltpu.VMEM((hb, block_q, 1), jnp.float32),
            pltpu.VMEM((hb, block_q, D), jnp.float32),
        ],
    )

    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, T, D), q.dtype),
            jax.ShapeDtypeStruct((H, T, 1), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(kstart, kend, q, seg2d, k, v, segT)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _dq_kernel(kstart_ref, kend_ref,
               q_ref, do_ref, lse_ref, delta_ref, segq_ref,
               k_ref, v_ref, segk_ref,
               dq_ref,
               dq_scr,
               *, scale: float):
    i = pl.program_id(1)
    jj = pl.program_id(2)
    n_span = pl.num_programs(2)

    @pl.when(jj == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(jj < kend_ref[i] - kstart_ref[i])
    def _():
        qb = q_ref[:]                                # (hb, bq, d)
        dob = do_ref[:]
        lse = lse_ref[:]                             # (hb, bq, 1)
        delta = delta_ref[:]                         # (hb, bq, 1)

        s = _bdot(qb, k_ref[:], ((2,), (2,))) * scale  # (hb, bq, bk)
        mask = (segq_ref[:] == segk_ref[:])[None]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)

        dp = _bdot(dob, v_ref[:], ((2,), (2,)))        # (hb, bq, bk)
        ds = p * (dp - delta) * scale
        dq_scr[:] = dq_scr[:] + _bdot(ds.astype(k_ref.dtype), k_ref[:],
                                      ((2,), (1,)))

    @pl.when(jj == n_span - 1)
    def _():
        dq_ref[:] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(qstart_ref, qend_ref,
                k_ref, v_ref, segk_ref,
                q_ref, do_ref, lse_ref, delta_ref, segq_ref,
                dk_ref, dv_ref,
                dk_scr, dv_scr,
                *, scale: float):
    j = pl.program_id(1)
    ii = pl.program_id(2)
    n_span = pl.num_programs(2)

    @pl.when(ii == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(ii < qend_ref[j] - qstart_ref[j])
    def _():
        kb = k_ref[:]                                # (hb, bk, d)
        vb = v_ref[:]
        qb = q_ref[:]                                # (hb, bq, d)
        dob = do_ref[:]
        lse = lse_ref[:]                             # (hb, bq, 1)
        delta = delta_ref[:]                         # (hb, bq, 1)

        s = _bdot(qb, kb, ((2,), (2,))) * scale      # (hb, bq, bk)
        mask = (segq_ref[:] == segk_ref[:])[None]    # (1, bq, bk)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)

        # dv (hb, bk, d) = p^T @ do : contract over bq
        dv_scr[:] = dv_scr[:] + _bdot(p.astype(dob.dtype), dob,
                                      ((1,), (1,)))
        dp = _bdot(dob, vb, ((2,), (2,)))            # (hb, bq, bk)
        ds = p * (dp - delta) * scale
        # dk (hb, bk, d) = ds^T @ q : contract over bq
        dk_scr[:] = dk_scr[:] + _bdot(ds.astype(qb.dtype), qb,
                                      ((1,), (1,)))

    @pl.when(ii == n_span - 1)
    def _():
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype)


def _bwd(q, k, v, seg2d, segT, o, lse, do, kstart, kend, qstart, qend, *,
         block_q, block_k, max_span_q, max_span_k, scale, interpret):
    H, T, D = q.shape
    nqb = T // block_q
    nkb = k.shape[1] // block_k       # may differ from T (rect/CP)
    hb = _head_block(H, block_q, block_k, _BWD_SCORE_BUDGET)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)          # (H, T, 1)

    def kv_index(g, i, jj, kstart_ref, kend_ref):
        j = jnp.minimum(kstart_ref[i] + jj, kend_ref[i] - 1)
        return (g, j, 0)

    def segk_index(g, i, jj, kstart_ref, kend_ref):
        j = jnp.minimum(kstart_ref[i] + jj, kend_ref[i] - 1)
        return (0, j)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H // hb, nqb, max_span_k),
            in_specs=[
                pl.BlockSpec((hb, block_q, D),
                             lambda g, i, jj, *_: (g, i, 0),
                             memory_space=pltpu.VMEM),   # q
                pl.BlockSpec((hb, block_q, D),
                             lambda g, i, jj, *_: (g, i, 0),
                             memory_space=pltpu.VMEM),   # do
                pl.BlockSpec((hb, block_q, 1),
                             lambda g, i, jj, *_: (g, i, 0),
                             memory_space=pltpu.VMEM),   # lse
                pl.BlockSpec((hb, block_q, 1),
                             lambda g, i, jj, *_: (g, i, 0),
                             memory_space=pltpu.VMEM),   # delta
                pl.BlockSpec((block_q, 1),
                             lambda g, i, jj, *_: (i, 0),
                             memory_space=pltpu.VMEM),   # seg_q (T,1)
                pl.BlockSpec((hb, block_k, D), kv_index,
                             memory_space=pltpu.VMEM),   # k
                pl.BlockSpec((hb, block_k, D), kv_index,
                             memory_space=pltpu.VMEM),   # v
                pl.BlockSpec((1, block_k), segk_index,
                             memory_space=pltpu.VMEM),   # seg_k (1,T)
            ],
            out_specs=pl.BlockSpec((hb, block_q, D),
                                   lambda g, i, jj, *_: (g, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((hb, block_q, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((H, T, D), q.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(kstart, kend, q, do, lse, delta, seg2d, k, v, segT)

    def q_index(g, j, ii, qstart_ref, qend_ref):
        i = jnp.minimum(qstart_ref[j] + ii, qend_ref[j] - 1)
        return (g, i, 0)

    def segq_index(g, j, ii, qstart_ref, qend_ref):
        i = jnp.minimum(qstart_ref[j] + ii, qend_ref[j] - 1)
        return (i, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H // hb, nkb, max_span_q),
            in_specs=[
                pl.BlockSpec((hb, block_k, D),
                             lambda g, j, ii, *_: (g, j, 0),
                             memory_space=pltpu.VMEM),   # k
                pl.BlockSpec((hb, block_k, D),
                             lambda g, j, ii, *_: (g, j, 0),
                             memory_space=pltpu.VMEM),   # v
                pl.BlockSpec((1, block_k),
                             lambda g, j, ii, *_: (0, j),
                             memory_space=pltpu.VMEM),   # seg_k (1,T)
                pl.BlockSpec((hb, block_q, D), q_index,
                             memory_space=pltpu.VMEM),   # q
                pl.BlockSpec((hb, block_q, D), q_index,
                             memory_space=pltpu.VMEM),   # do
                pl.BlockSpec((hb, block_q, 1), q_index,
                             memory_space=pltpu.VMEM),   # lse
                pl.BlockSpec((hb, block_q, 1), q_index,
                             memory_space=pltpu.VMEM),   # delta
                pl.BlockSpec((block_q, 1), segq_index,
                             memory_space=pltpu.VMEM),   # seg_q (T,1)
            ],
            out_specs=[
                pl.BlockSpec((hb, block_k, D),
                             lambda g, j, ii, *_: (g, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, block_k, D),
                             lambda g, j, ii, *_: (g, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb, block_k, D), jnp.float32),
                pltpu.VMEM((hb, block_k, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(qstart, qend, k, v, segT, q, do, lse, delta, seg2d)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry: custom-vjp wrapper over the (T, H, D) layout
# ---------------------------------------------------------------------------

def _pad_to(x, t_pad, axis, fill=0):
    if t_pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, t_pad)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_core(q, k, v, seg_q, seg_k, block_q, block_k, max_seqlen,
                interpret):
    o, _ = _flash_fwd_vjp(q, k, v, seg_q, seg_k, block_q, block_k,
                          max_seqlen, interpret)
    return o


def _flash_fwd_vjp(q, k, v, seg_q, seg_k, block_q, block_k, max_seqlen,
                   interpret):
    """q: (H, Tq, D); k, v: (H, Tk, D). Self-attention passes
    ``seg_k is seg_q``; rectangular (context-parallel local-q /
    gathered-global-kv) passes distinct per-side segment ids."""
    H, Tq, D = q.shape
    Tk = k.shape[1]
    scale = 1.0 / math.sqrt(D)
    seg2d = seg_q.reshape(Tq, 1)
    segT = seg_k.reshape(1, Tk)
    kstart, kend, _, _ = block_spans(seg_q, block_q, block_k, seg_k)
    max_span = _span_cap(Tk, block_q, block_k, max_seqlen)
    hb = _head_block(H, block_q, block_k, _FWD_SCORE_BUDGET)
    o, lse = _fwd(q, k, v, seg2d, segT, kstart, kend, block_q=block_q,
                  block_k=block_k, head_block=hb, max_span=max_span,
                  scale=scale, interpret=interpret)
    return o, (q, k, v, seg_q, seg_k, o, lse)


def _flash_bwd_vjp(block_q, block_k, max_seqlen, interpret, res, do):
    q, k, v, seg_q, seg_k, o, lse = res
    Tq = q.shape[1]
    Tk = k.shape[1]
    scale = 1.0 / math.sqrt(q.shape[2])
    seg2d = seg_q.reshape(Tq, 1)
    segT = seg_k.reshape(1, Tk)
    kstart, kend, qstart, qend = block_spans(seg_q, block_q, block_k,
                                             seg_k)
    dq, dk, dv = _bwd(
        q, k, v, seg2d, segT, o, lse, do, kstart, kend, qstart, qend,
        block_q=block_q, block_k=block_k,
        max_span_q=_span_cap(Tq, block_k, block_q, max_seqlen),
        max_span_k=_span_cap(Tk, block_q, block_k, max_seqlen),
        scale=scale, interpret=interpret)
    return dq, dk, dv, None, None


_flash_core.defvjp(_flash_fwd_vjp, _flash_bwd_vjp)


def flash_segment_attention(q, k, v, seg_ids, *,
                            block_q: int = DEFAULT_BLOCK_Q,
                            block_k: int = DEFAULT_BLOCK_K,
                            max_seqlen: int | None = None,
                            interpret: bool | None = None,
                            layout: str = 'thd') -> jnp.ndarray:
    """Segment-masked flash attention over packed layouts.

    Drop-in replacement for
    :func:`esme_tpu.ops.attention.attention_reference` with linear
    memory and block-diagonal tile skipping. ``max_seqlen`` (the
    longest packed segment, the data plane's ``max_len``) statically
    caps the per-q-block tile span; None means no cap (full sweep,
    still mask-correct, just more skipped grid steps).

    ``layout='thd'`` takes/returns ``(T, H, D)`` (transposing
    internally); ``layout='htd'`` takes/returns the kernel-native
    ``(H, T, D)`` — use it when the caller already produces head-major
    tensors (the :mod:`esme_tpu.ops.headsplit` fused path) to skip the
    relayout entirely.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    if layout == 'thd':
        T, H, D = q.shape
    else:
        H, T, D = q.shape
    t128 = ((T + 127) // 128) * 128
    if t128 < block_q or t128 < block_k:
        # tiny input: one q tile × one k tile
        block_q = block_k = t128
    t_pad = (-T) % math.lcm(block_q, block_k)
    seg_fill = _pad_to(seg_ids.astype(jnp.int32), t_pad, 0)
    if t_pad:
        # padded rows get a dedicated fake segment past every real id
        seg_fill = seg_fill.at[T:].set(jnp.max(seg_ids) + 1)

    if layout == 'thd':
        qt = _pad_to(jnp.swapaxes(q, 0, 1), t_pad, 1)   # (H, T', D)
        kt = _pad_to(jnp.swapaxes(k, 0, 1), t_pad, 1)
        vt = _pad_to(jnp.swapaxes(v, 0, 1), t_pad, 1)
    else:
        qt = _pad_to(q, t_pad, 1)
        kt = _pad_to(k, t_pad, 1)
        vt = _pad_to(v, t_pad, 1)

    # seg_ids are attention structure, not data: block gradients
    seg_fill = jax.lax.stop_gradient(seg_fill)

    o = _flash_core(qt, kt, vt, seg_fill, seg_fill, block_q, block_k,
                    max_seqlen, interpret)
    if layout == 'thd':
        o = jnp.swapaxes(o, 0, 1)[:T]
    else:
        o = o[:, :T]
    return o.astype(q.dtype)


def flash_rect_attention(q, k, v, seg_q, seg_k, *,
                         block_q: int = DEFAULT_BLOCK_Q,
                         block_k: int = DEFAULT_BLOCK_K,
                         max_seqlen: int | None = None,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Rectangular segment-flash attention: local queries over a
    different (e.g. globally all-gathered) key/value stream.

    The context-parallelism hot path (esme_tpu.parallel.context): the
    Pallas replacement for the XLA-scan ``attention_rect``. ``q``:
    ``(Tq, H, D)``; ``k``/``v``: ``(Tk, H, D)``; per-side segment ids.
    Same block-span skipping as the self-attention kernel — with
    contiguous token sharding the local q span covers only its own
    ±max_seqlen neighborhood of the global k stream, so each chip does
    ~1/N of the tile work. No reference analogue (the reference has no
    sequence parallelism, SURVEY.md §2.4).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    Tq, H, D = q.shape
    Tk = k.shape[0]
    bq = min(block_q, ((Tq + 127) // 128) * 128)
    bk = min(block_k, ((Tk + 127) // 128) * 128)
    qpad = (-Tq) % bq
    kpad = (-Tk) % bk

    fake = jnp.maximum(jnp.max(seg_q), jnp.max(seg_k)) + 1
    sq = _pad_to(seg_q.astype(jnp.int32), qpad, 0)
    if qpad:
        sq = sq.at[Tq:].set(fake + 1)      # q pads match nothing
    sk = _pad_to(seg_k.astype(jnp.int32), kpad, 0)
    if kpad:
        sk = sk.at[Tk:].set(fake)          # k pads match nothing real

    qt = _pad_to(jnp.swapaxes(q, 0, 1), qpad, 1)     # (H, Tq', D)
    kt = _pad_to(jnp.swapaxes(k, 0, 1), kpad, 1)
    vt = _pad_to(jnp.swapaxes(v, 0, 1), kpad, 1)

    sq = jax.lax.stop_gradient(sq)
    sk = jax.lax.stop_gradient(sk)
    o = _flash_core(qt, kt, vt, sq, sk, bq, bk, max_seqlen, interpret)
    return jnp.swapaxes(o, 0, 1)[:Tq].astype(q.dtype)
