"""Pallas segment-flash attention for packed (varlen) batches.

The TPU-native replacement for flash-attn's varlen CUDA kernel
(reference: esme/attention.py:115-123). Non-causal self-attention over
a flat token stream where token *t* may attend token *s* iff
``seg_ids[t] == seg_ids[s]``.

Design (SURVEY.md §7 deviation 2), as measured on v5e
(tools/profile_attn.py, tools/flash_variants.py,
tools/fwd_T_experiment.py; artifacts in results/flash_*.txt):

* online-softmax tiling (flash attention) → O(T·D) memory;
* **cross-segment block skipping**: packed batches make attention
  block-diagonal. For every q block the contiguous span of overlapping
  k blocks is precomputed in XLA and scalar-prefetched; the grid's
  inner dimension walks ``max_span`` tiles whose k/v BlockSpec index
  maps clamp into the span, with beyond-span compute predicated off.
  NB the clamp does NOT skip the tile DMA on this toolchain (measured),
  so the static span cap directly prices HBM traffic — hence small
  default tiles;
* **token-minor everything**: all operands and outputs are
  ``(H, D, T)``. Head-minor ``(hb, bk, 64)`` bf16 tiles of an
  ``(H, T, 64)`` array are 128-byte strided rows and move at
  ~285 GB/s; token-minor tiles are contiguous and move at ~700 GB/s —
  a 2.4x DMA lever on a kernel whose streams would otherwise bind;
* **transposed scores**: scores live as ``(hb, bk, bq)`` — k on
  sublanes, q on lanes — so the online-softmax max/sum reduce over k
  happens on the SUBLANE dimension. The lane-dim max-reduce of the
  natural orientation cost ~3 ms/layer at the 650M bench shape (~27%
  of the kernel; Mosaic lowers lane-dim *sums* through the MXU but not
  maxes); the transposed kernel measures 5.3 ms/layer vs 11.2
  (results/flash_fwdT.txt);
* **head grouping**: each grid step processes ``head_block`` heads at
  once via batched ``dot_general`` — per-step k/v DMA is shared across
  the group and the ~1µs per-step scheduling cost amortizes;
* ``max_span`` is static: derived from the data plane's ``max_len``
  (the longest packed sequence) as ceil((bq + 2·max_len)/bk) + 1;
* fp32 online-softmax state and fp32 MXU accumulation; bf16 operands.

Backward is the standard two-kernel flash decomposition (dq by q-block,
dk/dv by k-block) in the same transposed token-minor formulation; it
has no max-reduce (it replays the saved LSE), so its win is layout.
LSE travels as ``(H, 1, T)`` — lane-aligned rows of the q axis.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Default tile sizes (v5e sweeps, results/flash_fwdT.txt). Small k
# tiles minimize the static-span DMA sweep; per-step overhead is
# amortized by large head groups instead. ALIGN is the packed-length
# multiple at which the kernel runs zero-copy: callers that pre-pad T
# to ALIGN (forward_flat does) skip the per-call pad/slice entirely.
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
ALIGN = math.lcm(DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)

# Budgets for the fp32 (hb, bk, bq) score tensor of one grid step. v5e
# has 128MB of VMEM (the 16MB figure is Mosaic's default scoped limit,
# raised via vmem_limit_bytes below); the budget prices the score
# tensor + compiler temporaries + double-buffered tiles, measured on
# chip. hb=20 at 256x256 tiles (5MB of scores) is the 650M sweet spot.
_FWD_SCORE_BUDGET = 6 * 1024 * 1024
_BWD_SCORE_BUDGET = 6 * 1024 * 1024
_MAX_HEAD_BLOCK = 32

# Raised VMEM ceiling for the kernels (Mosaic's default scoped limit is
# 16MB; v5e has 128MB physical).
_VMEM_LIMIT_BYTES: int | None = 100 * 1024 * 1024


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
# Dynamic-span job mode: the static max_span sweep fetches ~2.1x the
# real block-diagonal coverage at the bench shape (beyond-span DMA is
# not skipped). When the caller knows the batch's total span count
# (``host_num_jobs`` — the data plane holds cu_lens on the host), the
# grid becomes a flat list of REAL (q-block, k-tile) jobs and the
# sweep fetches exactly the coverage.
# ---------------------------------------------------------------------------

def host_num_jobs(seg_ids_np, block_q: int, block_k: int,
                  bucket: int = 256) -> int:
    """Host-side total job count (sum of per-q-block spans) for a
    packed segment layout, rounded up to ``bucket`` to bound jit
    recompiles. MUST be >= the traced sum for the same segments —
    computed by the same min/max-overlap rule as :func:`block_spans`,
    so equality holds; the bucket rounds up."""
    import numpy as np
    seg = np.asarray(seg_ids_np)
    nqb = seg.shape[0] // block_q
    nkb = seg.shape[0] // block_k
    qs = seg.reshape(nqb, block_q)
    ks = seg.reshape(nkb, block_k)
    ov = (ks.min(1)[None, :] <= qs.max(1)[:, None]) & \
        (ks.max(1)[None, :] >= qs.min(1)[:, None])
    idx = np.arange(nkb)
    start = np.where(ov, idx, nkb).min(1)
    end = np.where(ov, idx + 1, 0).max(1)
    total = int((end - start).sum())
    return -(-total // bucket) * bucket


# Measured on v5e (round 4, re-checked round 5 with the fused bwd —
# results/gate_retune_r5.txt): at a 10k-token budget (~200 jobs) job
# mode LOSES on the train step (the short data-dependent job grid
# pipelines worse than the static sweep); at 50k (~930 jobs) it wins.
# Below this threshold callers fall back to the static span sweep.
JOB_MODE_MIN_JOBS = 768


def host_num_jobs_from_cu(cu_lens, total: int, block_q: int | None = None,
                          block_k: int | None = None) -> int | None:
    """Job budget for a packed batch described by host cu_lens:
    mirrors ``packed_meta`` segment construction + ``forward_flat``'s
    ALIGN tail padding, then counts spans. Returns a bucketed upper
    bound suitable as the static ``num_jobs`` argument."""
    import numpy as np
    bq = block_q or DEFAULT_BLOCK_Q
    bk = block_k or DEFAULT_BLOCK_K
    from .segment import TAIL_CHUNK
    cu = np.asarray(cu_lens)
    t = np.arange(total)
    seg = np.searchsorted(cu[1:], t, side='right')
    # chunked fake tail — must mirror segment_ids_from_cu_lens exactly
    tail = t >= cu[-1]
    seg = np.where(tail, seg + (t - cu[-1]) // TAIL_CHUNK, seg)
    t_pad = (-total) % ALIGN
    if t_pad:
        seg = np.concatenate([seg, np.full(t_pad, seg.max() + 1,
                                           seg.dtype)])
    nj = host_num_jobs(seg, bq, bk)
    if nj < JOB_MODE_MIN_JOBS:
        return None
    return nj



def job_arrays(kstart, kend, num_jobs: int):
    """Flatten per-q-block spans into job arrays of static length:
    ``qi[j]`` (q block), ``kj[j]`` (k tile), ``first/last[j]`` (state
    init / output finalize flags), and the traced real job ``total``.
    Jobs beyond the real total clamp to the last block with flags off
    (their DMA repeats the final tile; compute is predicated off).

    INVARIANT: ``num_jobs >= total`` or outputs silently miss whole
    q blocks (the tail jobs simply never run). Callers must derive
    ``num_jobs`` from :func:`host_num_jobs`/:func:`host_num_jobs_from_cu`
    over the SAME segment layout and block sizes; the kernel wrappers
    additionally poison their outputs with NaN when the invariant is
    violated (see :func:`_overflow_poison`) so truncation can never
    pass as a valid result."""
    nqb = kstart.shape[0]
    spans = kend - kstart
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(spans, dtype=jnp.int32)])
    j = jnp.arange(num_jobs, dtype=jnp.int32)
    i = jnp.clip(jnp.searchsorted(cum, j, side='right') - 1, 0, nqb - 1)
    i = i.astype(jnp.int32)
    valid = j < cum[-1]
    kj = jnp.minimum(kstart[i] + (j - cum[i]), kend[i] - 1)
    first = (valid & (j == cum[i])).astype(jnp.int32)
    last = (valid & (j == cum[i + 1] - 1)).astype(jnp.int32)
    return i, kj, first, last, cum[-1]


def _overflow_poison(out, total, num_jobs: int):
    """Loud-failure guard for the job-mode budget invariant
    (``total <= num_jobs``): on violation, poison token 0 of the output
    (always a real token — packed layouts start with ``<cls>``) with
    NaN so the wrong result propagates to any loss/logit consumer
    instead of silently truncating attention. Cost when the invariant
    holds: one (H, D) elementwise select."""
    bad = total > num_jobs
    poison = jnp.where(bad, jnp.float32(jnp.nan), jnp.float32(1.0))
    return out.at[:, :, 0].multiply(poison.astype(out.dtype))


def _fwd_jobs_kernel(qi_ref, kj_ref, first_ref, last_ref,
                     qT_ref, segq_ref, k_ref, v_ref, segk_ref,
                     oT_ref, lse_ref,
                     m_scr, l_scr, acc_scr,
                     *, scale: float):
    j = pl.program_id(1)

    @pl.when(first_ref[j] == 1)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # every job computes — padded clamp-jobs come strictly after the
    # final real job of the last q block, whose 'last' write already
    # finalized the output buffer; their scratch pollution is discarded
    qb = qT_ref[:]
    s = _bdot(k_ref[:], qb, ((1,), (1,))) * scale
    mask = (segk_ref[:] == segq_ref[:])[None]
    s = jnp.where(mask, s, NEG_INF)
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = _bdot(v_ref[:], p.astype(v_ref.dtype), ((2,), (1,)))
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = m_new

    @pl.when(last_ref[j] == 1)
    def _():
        l = l_scr[:]
        l_safe = jnp.where(l == 0, 1.0, l)
        oT_ref[:] = (acc_scr[:] / l_safe).astype(oT_ref.dtype)
        lse_ref[:] = m_scr[:] + jnp.log(l_safe)


def _fwd_jobs(qT, kT, vT, segq_row, segk_col, kstart, kend, *, block_q,
              block_k, head_block, num_jobs, scale, interpret):
    """Job-list forward: grid (H//hb, num_jobs); same math as
    :func:`_fwd` but only the real block-diagonal tiles are swept.
    ``num_jobs`` MUST be >= the batch's total span count
    (:func:`host_num_jobs`); excess jobs are no-op clamps."""
    H, D, Tq = qT.shape
    hb = head_block

    # invariant: num_jobs >= traced span total (see job_arrays); the
    # host mirror host_num_jobs* computes the same min/max-overlap rule
    qi, kj, first, last, total = job_arrays(kstart, kend, num_jobs)

    def q_index(g, j, qi_ref, kj_ref, first_ref, last_ref):
        return (g, 0, qi_ref[j])

    def segq_index(g, j, qi_ref, kj_ref, first_ref, last_ref):
        return (0, qi_ref[j])

    def kv_index(g, j, qi_ref, kj_ref, first_ref, last_ref):
        return (g, 0, kj_ref[j])

    def segk_index(g, j, qi_ref, kj_ref, first_ref, last_ref):
        return (kj_ref[j], 0)

    def out_index(g, j, qi_ref, kj_ref, first_ref, last_ref):
        return (g, 0, qi_ref[j])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(H // hb, num_jobs),
        in_specs=[
            pl.BlockSpec((hb, D, block_q), q_index,
                         memory_space=pltpu.VMEM),        # qT
            pl.BlockSpec((1, block_q), segq_index,
                         memory_space=pltpu.VMEM),        # segq (1,Tq)
            pl.BlockSpec((hb, D, block_k), kv_index,
                         memory_space=pltpu.VMEM),        # kT
            pl.BlockSpec((hb, D, block_k), kv_index,
                         memory_space=pltpu.VMEM),        # vT
            pl.BlockSpec((block_k, 1), segk_index,
                         memory_space=pltpu.VMEM),        # segk (Tk,1)
        ],
        out_specs=[
            pl.BlockSpec((hb, D, block_q), out_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, 1, block_q), out_index,
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb, 1, block_q), jnp.float32),
            pltpu.VMEM((hb, 1, block_q), jnp.float32),
            pltpu.VMEM((hb, D, block_q), jnp.float32),
        ],
    )

    kw = dict(dimension_semantics=('parallel', 'arbitrary'))
    if _VMEM_LIMIT_BYTES is not None:
        kw['vmem_limit_bytes'] = _VMEM_LIMIT_BYTES
    oT, lse = pl.pallas_call(
        functools.partial(_fwd_jobs_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, D, Tq), qT.dtype),
            jax.ShapeDtypeStruct((H, 1, Tq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(**kw),
        interpret=interpret,
    )(qi, kj, first, last, qT, segq_row, kT, vT, segk_col)
    return _overflow_poison(oT, total, num_jobs), lse


# ---------------------------------------------------------------------------
# Forward kernel — all operands token-minor (H, D, T); scores (hb, bk, bq)
# ---------------------------------------------------------------------------

def _fwd_kernel(kstart_ref, kend_ref,
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
        # transposed scores: k on sublanes, q on lanes
        s = _bdot(k_ref[:], qb, ((1,), (1,))) * scale    # (hb, bk, bq)
        mask = (segk_ref[:] == segq_ref[:])[None]        # (1, bk, bq)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]                                # (hb, 1, bq)
        # sublane-dim reduce: the lane-dim max of the natural score
        # orientation cost ~3 ms/layer (results/flash_variants_r4.txt)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                           # (hb, bk, bq)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        # pv token-minor: (hb, d, bq)
        pv = _bdot(v_ref[:], p.astype(v_ref.dtype), ((2,), (1,)))
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    @pl.when(jj == n_span - 1)
    def _():
        l = l_scr[:]
        # fully-masked rows cannot happen for real tokens (every token
        # overlaps its own block); keep padding rows finite anyway
        l_safe = jnp.where(l == 0, 1.0, l)
        oT_ref[:] = (acc_scr[:] / l_safe).astype(oT_ref.dtype)
        lse_ref[:] = m_scr[:] + jnp.log(l_safe)


def _fwd(qT, kT, vT, segq_row, segk_col, kstart, kend, *, block_q,
         block_k, head_block, max_span, scale, interpret):
    """qT/kT/vT: token-minor (H, D, T); segq_row (1, Tq);
    segk_col (Tk, 1). Returns oT (H, D, Tq), lse (H, 1, Tq) fp32."""
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
        functools.partial(_fwd_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, D, Tq), qT.dtype),
            jax.ShapeDtypeStruct((H, 1, Tq), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(kstart, kend, qT, segq_row, kT, vT, segk_col)


# ---------------------------------------------------------------------------
# Backward kernels — same transposed token-minor formulation
# ---------------------------------------------------------------------------

def _dq_kernel(kstart_ref, kend_ref,
               qT_ref, doT_ref, lse_ref, delta_ref, segq_ref,
               k_ref, v_ref, segk_ref,
               dqT_ref,
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
        qb = qT_ref[:]                                   # (hb, d, bq)
        dob = doT_ref[:]                                 # (hb, d, bq)
        lse = lse_ref[:]                                 # (hb, 1, bq)
        delta = delta_ref[:]                             # (hb, 1, bq)

        s = _bdot(k_ref[:], qb, ((1,), (1,))) * scale    # (hb, bk, bq)
        mask = (segk_ref[:] == segq_ref[:])[None]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)

        dp = _bdot(v_ref[:], dob, ((1,), (1,)))          # (hb, bk, bq)
        ds = p * (dp - delta) * scale
        # dqT (hb, d, bq) += k^T ds : contract over bk
        dq_scr[:] = dq_scr[:] + _bdot(k_ref[:], ds.astype(k_ref.dtype),
                                      ((2,), (1,)))

    @pl.when(jj == n_span - 1)
    def _():
        dqT_ref[:] = dq_scr[:].astype(dqT_ref.dtype)


def _dkv_kernel(qstart_ref, qend_ref,
                k_ref, v_ref, segk_ref,
                qT_ref, doT_ref, lse_ref, delta_ref, segq_ref,
                dkT_ref, dvT_ref,
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
        qb = qT_ref[:]                                   # (hb, d, bq)
        dob = doT_ref[:]                                 # (hb, d, bq)
        lse = lse_ref[:]                                 # (hb, 1, bq)
        delta = delta_ref[:]                             # (hb, 1, bq)

        s = _bdot(k_ref[:], qb, ((1,), (1,))) * scale    # (hb, bk, bq)
        mask = (segk_ref[:] == segq_ref[:])[None]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)

        # dvT (hb, d, bk) += do p^T : contract over bq
        dv_scr[:] = dv_scr[:] + _bdot(dob, p.astype(dob.dtype),
                                      ((2,), (2,)))
        dp = _bdot(v_ref[:], dob, ((1,), (1,)))          # (hb, bk, bq)
        ds = p * (dp - delta) * scale
        # dkT (hb, d, bk) += q ds^T : contract over bq
        dk_scr[:] = dk_scr[:] + _bdot(qb, ds.astype(qb.dtype),
                                      ((2,), (2,)))

    @pl.when(ii == n_span - 1)
    def _():
        dkT_ref[:] = dk_scr[:].astype(dkT_ref.dtype)
        dvT_ref[:] = dv_scr[:].astype(dvT_ref.dtype)


def _dq_jobs_kernel(qi_ref, kj_ref, first_ref, last_ref,
                    qT_ref, doT_ref, lse_ref, delta_ref, segq_ref,
                    k_ref, v_ref, segk_ref,
                    dqT_ref,
                    dq_scr,
                    *, scale: float):
    j = pl.program_id(1)

    @pl.when(first_ref[j] == 1)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qb = qT_ref[:]
    dob = doT_ref[:]
    lse = lse_ref[:]
    delta = delta_ref[:]
    s = _bdot(k_ref[:], qb, ((1,), (1,))) * scale
    mask = (segk_ref[:] == segq_ref[:])[None]
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    dp = _bdot(v_ref[:], dob, ((1,), (1,)))
    ds = p * (dp - delta) * scale
    dq_scr[:] = dq_scr[:] + _bdot(k_ref[:], ds.astype(k_ref.dtype),
                                  ((2,), (1,)))

    @pl.when(last_ref[j] == 1)
    def _():
        dqT_ref[:] = dq_scr[:].astype(dqT_ref.dtype)


def _dkv_jobs_kernel(ki_ref, qj_ref, first_ref, last_ref,
                     k_ref, v_ref, segk_ref,
                     qT_ref, doT_ref, lse_ref, delta_ref, segq_ref,
                     dkT_ref, dvT_ref,
                     dk_scr, dv_scr,
                     *, scale: float):
    j = pl.program_id(1)

    @pl.when(first_ref[j] == 1)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qb = qT_ref[:]
    dob = doT_ref[:]
    lse = lse_ref[:]
    delta = delta_ref[:]
    s = _bdot(k_ref[:], qb, ((1,), (1,))) * scale
    mask = (segk_ref[:] == segq_ref[:])[None]
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    dv_scr[:] = dv_scr[:] + _bdot(dob, p.astype(dob.dtype),
                                  ((2,), (2,)))
    dp = _bdot(v_ref[:], dob, ((1,), (1,)))
    ds = p * (dp - delta) * scale
    dk_scr[:] = dk_scr[:] + _bdot(qb, ds.astype(qb.dtype),
                                  ((2,), (2,)))

    @pl.when(last_ref[j] == 1)
    def _():
        dkT_ref[:] = dk_scr[:].astype(dkT_ref.dtype)
        dvT_ref[:] = dv_scr[:].astype(dvT_ref.dtype)


# Fused job-mode backward: one kernel computes dk/dv AND per-pair dq
# partials, so the score recompute (s) and dp happen ONCE instead of
# twice — the round-5 bwd decomposition (results/decompose_bwd_r5.txt)
# measured the two-kernel split recomputing ~4.7 ms/layer of matmuls at
# the 650M bench shape. dq partials land in a banded HBM buffer
# (span_cap, H, D, Tq) indexed (band, q_block) — each (q-block, k-tile)
# pair owns exactly one slot (no accumulation, so bf16 writes are one
# rounding, like the old kernel's final cast) — and XLA reduces over
# the band axis with fp32 accumulation. Requires MONOTONIC segment ids
# (the job-mode contract): only then is every valid (band, q-block)
# slot covered by a k-direction job.
_FUSED_BWD_JOBS = True


def _dkvq_jobs_kernel(ki_ref, qj_ref, first_ref, last_ref, band_ref,
                      k_ref, v_ref, segk_ref,
                      qT_ref, doT_ref, lse_ref, delta_ref, segq_ref,
                      dkT_ref, dvT_ref, dqp_ref,
                      dk_scr, dv_scr,
                      *, scale: float):
    j = pl.program_id(1)

    @pl.when(first_ref[j] == 1)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qb = qT_ref[:]
    dob = doT_ref[:]
    lse = lse_ref[:]
    delta = delta_ref[:]
    s = _bdot(k_ref[:], qb, ((1,), (1,))) * scale
    mask = (segk_ref[:] == segq_ref[:])[None]
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    dv_scr[:] = dv_scr[:] + _bdot(dob, p.astype(dob.dtype),
                                  ((2,), (2,)))
    dp = _bdot(v_ref[:], dob, ((1,), (1,)))
    ds = p * (dp - delta) * scale
    dsb = ds.astype(qb.dtype)
    dk_scr[:] = dk_scr[:] + _bdot(qb, dsb, ((2,), (2,)))
    # dq partial for THIS pair: (hb, d, bq) += k^T ds, written to its
    # banded slot (clamp jobs rewrite the final real job's slot with
    # the same value — benign)
    dqp_ref[:] = _bdot(k_ref[:], dsb, ((2,), (1,))).astype(
        dqp_ref.dtype)

    @pl.when(last_ref[j] == 1)
    def _():
        dkT_ref[:] = dk_scr[:].astype(dkT_ref.dtype)
        dvT_ref[:] = dv_scr[:].astype(dvT_ref.dtype)


def _bwd_fused_jobs(qT, kT, vT, segq_row, segk_col, lse, delta, doT,
                    kstart, kend, qstart, qend, *, block_q, block_k,
                    hb, num_jobs, span_cap, scale, interpret):
    """One-kernel job-mode backward (see _FUSED_BWD_JOBS note)."""
    H, D, Tq = qT.shape
    Tk = kT.shape[2]
    nqb = Tq // block_q
    dtype = qT.dtype

    ki, qj, first, last, total_k = job_arrays(qstart, qend, num_jobs)
    # band slot of each job's dq partial: its k-tile's offset within
    # the q block's own span. For monotonic layouts (the job-mode
    # contract) 0 <= band < span_cap by construction; the clip is
    # defensive — a contract violation then corrupts a slot (caught by
    # the parity suites) instead of writing out of bounds.
    band = jnp.clip(ki - kstart[qj], 0, span_cap - 1)

    def k_side(g, j, ki_ref, *_):
        return (g, 0, ki_ref[j])

    def k_col(g, j, ki_ref, *_):
        return (ki_ref[j], 0)

    def q_side(g, j, ki_ref, qj_ref, *_):
        return (g, 0, qj_ref[j])

    def q_row(g, j, ki_ref, qj_ref, *_):
        return (0, qj_ref[j])

    def dqp_index(g, j, ki_ref, qj_ref, first_ref, last_ref, band_ref):
        return (band_ref[j], g, 0, qj_ref[j])

    kw = dict(dimension_semantics=('parallel', 'arbitrary'))
    if _VMEM_LIMIT_BYTES is not None:
        kw['vmem_limit_bytes'] = _VMEM_LIMIT_BYTES

    dkT, dvT, dqp = pl.pallas_call(
        functools.partial(_dkvq_jobs_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(H // hb, num_jobs),
            in_specs=[
                pl.BlockSpec((hb, D, block_k), k_side,
                             memory_space=pltpu.VMEM),   # kT
                pl.BlockSpec((hb, D, block_k), k_side,
                             memory_space=pltpu.VMEM),   # vT
                pl.BlockSpec((block_k, 1), k_col,
                             memory_space=pltpu.VMEM),   # segk (Tk,1)
                pl.BlockSpec((hb, D, block_q), q_side,
                             memory_space=pltpu.VMEM),   # qT
                pl.BlockSpec((hb, D, block_q), q_side,
                             memory_space=pltpu.VMEM),   # doT
                pl.BlockSpec((hb, 1, block_q), q_side,
                             memory_space=pltpu.VMEM),   # lse
                pl.BlockSpec((hb, 1, block_q), q_side,
                             memory_space=pltpu.VMEM),   # delta
                pl.BlockSpec((1, block_q), q_row,
                             memory_space=pltpu.VMEM),   # segq (1,Tq)
            ],
            out_specs=[
                pl.BlockSpec((hb, D, block_k), k_side,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, D, block_k), k_side,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, hb, D, block_q), dqp_index,
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb, D, block_k), jnp.float32),
                pltpu.VMEM((hb, D, block_k), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, D, Tk), dtype),
            jax.ShapeDtypeStruct((H, D, Tk), dtype),
            jax.ShapeDtypeStruct((span_cap, H, D, Tq), dtype),
        ],
        compiler_params=pltpu.CompilerParams(**kw),
        interpret=interpret,
    )(ki, qj, first, last, band, kT, vT, segk_col, qT, doT, lse, delta,
      segq_row)

    dkT = _overflow_poison(dkT, total_k, num_jobs)
    dvT = _overflow_poison(dvT, total_k, num_jobs)

    # band-axis reduction with fp32 accumulation; slots beyond a q
    # block's real span were never written (garbage) and are masked
    spans = (kend - kstart).astype(jnp.int32)             # (nqb,)
    valid = jnp.arange(span_cap, dtype=jnp.int32)[:, None] \
        < spans[None, :]                                   # (S, nqb)
    valid_t = jnp.repeat(valid, block_q, axis=1)           # (S, Tq)
    dqT = jnp.sum(jnp.where(valid_t[:, None, None, :],
                            dqp.astype(jnp.float32), 0.0),
                  axis=0).astype(dtype)
    return dqT, dkT, dvT


def _bwd(qT, kT, vT, segq_row, segk_col, lse, delta, doT,
         kstart, kend, qstart, qend, *,
         block_q, block_k, max_span_q, max_span_k, scale, interpret,
         num_jobs=None):
    """All operands token-minor (H, D, T); lse/delta (H, 1, Tq) fp32.
    Returns dqT (H,D,Tq), dkT/dvT (H,D,Tk). ``num_jobs``: dynamic-span
    job mode for both kernels (the overlap-pair count is direction-
    symmetric, so one budget serves dq and dk/dv)."""
    H, D, Tq = qT.shape
    Tk = kT.shape[2]
    nqb = Tq // block_q
    nkb = Tk // block_k
    hb = _head_block(H, block_q, block_k, _BWD_SCORE_BUDGET)
    dtype = qT.dtype

    if num_jobs is not None:
        # one budget serves both grid directions only when q and k
        # tiles partition T identically (see _bwd_jobs); non-square
        # tiles would need a per-direction host budget
        assert block_q == block_k, \
            'job mode requires block_q == block_k (shared span budget)'
        # fused kernel needs the banded dq-partial buffer
        # (span_cap, H, D, Tq) — only worth it when the span cap is a
        # small band (max_seqlen known), not the full tile range
        if _FUSED_BWD_JOBS and max_span_k < max(nkb, 2):
            return _bwd_fused_jobs(
                qT, kT, vT, segq_row, segk_col, lse, delta, doT,
                kstart, kend, qstart, qend, block_q=block_q,
                block_k=block_k, hb=hb, num_jobs=num_jobs,
                span_cap=max_span_k, scale=scale, interpret=interpret)
        return _bwd_jobs(qT, kT, vT, segq_row, segk_col, lse, delta,
                         doT, kstart, kend, qstart, qend,
                         block_q=block_q, block_k=block_k, hb=hb,
                         num_jobs=num_jobs, scale=scale,
                         interpret=interpret)

    def kv_index(g, i, jj, kstart_ref, kend_ref):
        j = jnp.minimum(kstart_ref[i] + jj, kend_ref[i] - 1)
        return (g, 0, j)

    def segk_index(g, i, jj, kstart_ref, kend_ref):
        j = jnp.minimum(kstart_ref[i] + jj, kend_ref[i] - 1)
        return (j, 0)

    dqT = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H // hb, nqb, max_span_k),
            in_specs=[
                pl.BlockSpec((hb, D, block_q),
                             lambda g, i, jj, *_: (g, 0, i),
                             memory_space=pltpu.VMEM),   # qT
                pl.BlockSpec((hb, D, block_q),
                             lambda g, i, jj, *_: (g, 0, i),
                             memory_space=pltpu.VMEM),   # doT
                pl.BlockSpec((hb, 1, block_q),
                             lambda g, i, jj, *_: (g, 0, i),
                             memory_space=pltpu.VMEM),   # lse (H,1,Tq)
                pl.BlockSpec((hb, 1, block_q),
                             lambda g, i, jj, *_: (g, 0, i),
                             memory_space=pltpu.VMEM),   # delta
                pl.BlockSpec((1, block_q),
                             lambda g, i, jj, *_: (0, i),
                             memory_space=pltpu.VMEM),   # segq (1,Tq)
                pl.BlockSpec((hb, D, block_k), kv_index,
                             memory_space=pltpu.VMEM),   # kT
                pl.BlockSpec((hb, D, block_k), kv_index,
                             memory_space=pltpu.VMEM),   # vT
                pl.BlockSpec((block_k, 1), segk_index,
                             memory_space=pltpu.VMEM),   # segk (Tk,1)
            ],
            out_specs=pl.BlockSpec((hb, D, block_q),
                                   lambda g, i, jj, *_: (g, 0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((hb, D, block_q), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((H, D, Tq), dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(kstart, kend, qT, doT, lse, delta, segq_row, kT, vT, segk_col)

    def q_index(g, j, ii, qstart_ref, qend_ref):
        i = jnp.minimum(qstart_ref[j] + ii, qend_ref[j] - 1)
        return (g, 0, i)

    def segq_index(g, j, ii, qstart_ref, qend_ref):
        i = jnp.minimum(qstart_ref[j] + ii, qend_ref[j] - 1)
        return (0, i)

    dkT, dvT = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H // hb, nkb, max_span_q),
            in_specs=[
                pl.BlockSpec((hb, D, block_k),
                             lambda g, j, ii, *_: (g, 0, j),
                             memory_space=pltpu.VMEM),   # kT
                pl.BlockSpec((hb, D, block_k),
                             lambda g, j, ii, *_: (g, 0, j),
                             memory_space=pltpu.VMEM),   # vT
                pl.BlockSpec((block_k, 1),
                             lambda g, j, ii, *_: (j, 0),
                             memory_space=pltpu.VMEM),   # segk (Tk,1)
                pl.BlockSpec((hb, D, block_q), q_index,
                             memory_space=pltpu.VMEM),   # qT
                pl.BlockSpec((hb, D, block_q), q_index,
                             memory_space=pltpu.VMEM),   # doT
                pl.BlockSpec((hb, 1, block_q), q_index,
                             memory_space=pltpu.VMEM),   # lse
                pl.BlockSpec((hb, 1, block_q), q_index,
                             memory_space=pltpu.VMEM),   # delta
                pl.BlockSpec((1, block_q), segq_index,
                             memory_space=pltpu.VMEM),   # segq (1,Tq)
            ],
            out_specs=[
                pl.BlockSpec((hb, D, block_k),
                             lambda g, j, ii, *_: (g, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, D, block_k),
                             lambda g, j, ii, *_: (g, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb, D, block_k), jnp.float32),
                pltpu.VMEM((hb, D, block_k), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, D, Tk), dtype),
            jax.ShapeDtypeStruct((H, D, Tk), dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(qstart, qend, kT, vT, segk_col, qT, doT, lse, delta, segq_row)

    return dqT, dkT, dvT


def _bwd_jobs(qT, kT, vT, segq_row, segk_col, lse, delta, doT,
              kstart, kend, qstart, qend, *, block_q, block_k, hb,
              num_jobs, scale, interpret):
    H, D, Tq = qT.shape
    Tk = kT.shape[2]
    dtype = qT.dtype

    kw = dict(dimension_semantics=('parallel', 'arbitrary'))
    if _VMEM_LIMIT_BYTES is not None:
        kw['vmem_limit_bytes'] = _VMEM_LIMIT_BYTES
    cparams = pltpu.CompilerParams(**kw)

    # ---- dq: jobs walk (q block, k tile) pairs -------------------------
    # invariant: num_jobs >= span total (job_arrays docstring); host
    # mirror computes the identical rule, poison guard below backstops
    qi, kj, first, last, total_q = job_arrays(kstart, kend, num_jobs)

    def q_side(g, j, qi_ref, *_):
        return (g, 0, qi_ref[j])

    def q_row(g, j, qi_ref, *_):
        return (0, qi_ref[j])

    def kv_side(g, j, qi_ref, kj_ref, *_):
        return (g, 0, kj_ref[j])

    def k_col(g, j, qi_ref, kj_ref, *_):
        return (kj_ref[j], 0)

    dqT = pl.pallas_call(
        functools.partial(_dq_jobs_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(H // hb, num_jobs),
            in_specs=[
                pl.BlockSpec((hb, D, block_q), q_side,
                             memory_space=pltpu.VMEM),   # qT
                pl.BlockSpec((hb, D, block_q), q_side,
                             memory_space=pltpu.VMEM),   # doT
                pl.BlockSpec((hb, 1, block_q), q_side,
                             memory_space=pltpu.VMEM),   # lse
                pl.BlockSpec((hb, 1, block_q), q_side,
                             memory_space=pltpu.VMEM),   # delta
                pl.BlockSpec((1, block_q), q_row,
                             memory_space=pltpu.VMEM),   # segq (1,Tq)
                pl.BlockSpec((hb, D, block_k), kv_side,
                             memory_space=pltpu.VMEM),   # kT
                pl.BlockSpec((hb, D, block_k), kv_side,
                             memory_space=pltpu.VMEM),   # vT
                pl.BlockSpec((block_k, 1), k_col,
                             memory_space=pltpu.VMEM),   # segk (Tk,1)
            ],
            out_specs=pl.BlockSpec((hb, D, block_q), q_side,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((hb, D, block_q), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((H, D, Tq), dtype),
        compiler_params=cparams,
        interpret=interpret,
    )(qi, kj, first, last, qT, doT, lse, delta, segq_row, kT, vT,
      segk_col)
    dqT = _overflow_poison(dqT, total_q, num_jobs)

    # ---- dk/dv: jobs walk (k block, q tile) pairs ----------------------
    # The q-direction job budget is reused here; row- and column-span
    # totals agree for monotonic packed segment ids with equal block
    # sizes (asserted in _bwd) — and the poison below catches any
    # layout where the k-direction total exceeds it.
    ki, qj, first2, last2, total_k = job_arrays(qstart, qend, num_jobs)

    def k_side(g, j, ki_ref, *_):
        return (g, 0, ki_ref[j])

    def k_col2(g, j, ki_ref, *_):
        return (ki_ref[j], 0)

    def q_side2(g, j, ki_ref, qj_ref, *_):
        return (g, 0, qj_ref[j])

    def q_row2(g, j, ki_ref, qj_ref, *_):
        return (0, qj_ref[j])

    dkT, dvT = pl.pallas_call(
        functools.partial(_dkv_jobs_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(H // hb, num_jobs),
            in_specs=[
                pl.BlockSpec((hb, D, block_k), k_side,
                             memory_space=pltpu.VMEM),   # kT
                pl.BlockSpec((hb, D, block_k), k_side,
                             memory_space=pltpu.VMEM),   # vT
                pl.BlockSpec((block_k, 1), k_col2,
                             memory_space=pltpu.VMEM),   # segk (Tk,1)
                pl.BlockSpec((hb, D, block_q), q_side2,
                             memory_space=pltpu.VMEM),   # qT
                pl.BlockSpec((hb, D, block_q), q_side2,
                             memory_space=pltpu.VMEM),   # doT
                pl.BlockSpec((hb, 1, block_q), q_side2,
                             memory_space=pltpu.VMEM),   # lse
                pl.BlockSpec((hb, 1, block_q), q_side2,
                             memory_space=pltpu.VMEM),   # delta
                pl.BlockSpec((1, block_q), q_row2,
                             memory_space=pltpu.VMEM),   # segq (1,Tq)
            ],
            out_specs=[
                pl.BlockSpec((hb, D, block_k), k_side,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, D, block_k), k_side,
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb, D, block_k), jnp.float32),
                pltpu.VMEM((hb, D, block_k), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, D, Tk), dtype),
            jax.ShapeDtypeStruct((H, D, Tk), dtype),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )(ki, qj, first2, last2, kT, vT, segk_col, qT, doT, lse, delta,
      segq_row)
    dkT = _overflow_poison(dkT, total_k, num_jobs)
    dvT = _overflow_poison(dvT, total_k, num_jobs)

    return dqT, dkT, dvT


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
    segq_row = seg_q.reshape(1, Tq)
    segk_col = seg_k.reshape(Tk, 1)
    kstart, kend, _, _ = block_spans(seg_q, block_q, block_k, seg_k)
    max_span = _span_cap(Tk, block_q, block_k, max_seqlen)
    hb = _head_block(H, block_q, block_k, _FWD_SCORE_BUDGET)
    qT = jnp.swapaxes(q, 1, 2)
    kT = jnp.swapaxes(k, 1, 2)
    vT = jnp.swapaxes(v, 1, 2)
    oT, lse = _fwd(qT, kT, vT, segq_row, segk_col, kstart, kend,
                   block_q=block_q, block_k=block_k, head_block=hb,
                   max_span=max_span, scale=scale, interpret=interpret)
    from jax.ad_checkpoint import checkpoint_name
    oT = checkpoint_name(oT, 'flash_out')
    lse = checkpoint_name(lse, 'flash_lse')
    o = jnp.swapaxes(oT, 1, 2)
    return o, (qT, kT, vT, seg_q, seg_k, oT, lse)


def _flash_bwd_vjp(block_q, block_k, max_seqlen, interpret, res, do):
    qT, kT, vT, seg_q, seg_k, oT, lse = res
    H, D, Tq = qT.shape
    Tk = kT.shape[2]
    scale = 1.0 / math.sqrt(D)
    segq_row = seg_q.reshape(1, Tq)
    segk_col = seg_k.reshape(Tk, 1)
    kstart, kend, qstart, qend = block_spans(seg_q, block_q, block_k,
                                             seg_k)
    doT = jnp.swapaxes(do, 1, 2)
    delta = jnp.sum(doT.astype(jnp.float32) * oT.astype(jnp.float32),
                    axis=1, keepdims=True)           # (H, 1, Tq)
    dqT, dkT, dvT = _bwd(
        qT, kT, vT, segq_row, segk_col, lse, delta, doT,
        kstart, kend, qstart, qend,
        block_q=block_q, block_k=block_k,
        max_span_q=_span_cap(Tq, block_k, block_q, max_seqlen),
        max_span_k=_span_cap(Tk, block_q, block_k, max_seqlen),
        scale=scale, interpret=interpret)
    return (jnp.swapaxes(dqT, 1, 2), jnp.swapaxes(dkT, 1, 2),
            jnp.swapaxes(dvT, 1, 2), None, None)


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
    internally); ``layout='htd'`` takes/returns ``(H, T, D)``.
    The kernels themselves run fully token-minor ``(H, D, T)``; the
    fused model path (esme_tpu.ops.fused_attn) produces that layout
    directly and skips these transposes.
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


# ---------------------------------------------------------------------------
# Token-minor public entry: q/k/v already (H, D, T) — the token-minor
# residual-stream model path (models/modules.py) calls this directly;
# no relayout of any kind happens. Residuals are dense (T on the lane
# dim), so unlike the old head-major fused boundary there is no
# lane-padding waste to engineer around.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_tm(qT, kT, vT, seg_ids, block_q: int, block_k: int,
             max_seqlen, interpret: bool, num_jobs=None):
    """Segment flash attention over token-minor ``(H, D, T)`` q/k/v
    (RoPE already applied by the caller). Returns oT ``(H, D, T)``.
    T must be a multiple of ``lcm(block_q, block_k)``."""
    o, _ = _flash_tm_fwd(qT, kT, vT, seg_ids, block_q, block_k,
                         max_seqlen, interpret, num_jobs)
    return o


def _flash_tm_fwd(qT, kT, vT, seg_ids, block_q, block_k, max_seqlen,
                  interpret, num_jobs):
    H, D, T = qT.shape
    seg_ids = jax.lax.stop_gradient(seg_ids.astype(jnp.int32))
    segq_row = seg_ids.reshape(1, T)
    segk_col = seg_ids.reshape(T, 1)
    kstart, kend, _, _ = block_spans(seg_ids, block_q, block_k)
    hb = _head_block(H, block_q, block_k, _FWD_SCORE_BUDGET)
    scale = 1.0 / math.sqrt(D)
    if num_jobs is not None:
        oT, lse = _fwd_jobs(qT, kT, vT, segq_row, segk_col, kstart,
                            kend, block_q=block_q, block_k=block_k,
                            head_block=hb, num_jobs=num_jobs,
                            scale=scale, interpret=interpret)
    else:
        oT, lse = _fwd(qT, kT, vT, segq_row, segk_col, kstart, kend,
                       block_q=block_q, block_k=block_k, head_block=hb,
                       max_span=_span_cap(T, block_q, block_k,
                                          max_seqlen),
                       scale=scale, interpret=interpret)
    # names for selective remat: with policy save_only_these_names
    # ('flash_out', 'flash_lse') the activation-checkpointed backward
    # keeps the kernel outputs and DCEs the forward kernel out of the
    # recompute — the single most expensive op in the remat
    # (~5.5 ms/layer at the 650M bench shape). See models/modules.py
    # layer_stack_tm(remat='attn').
    from jax.ad_checkpoint import checkpoint_name
    oT = checkpoint_name(oT, 'flash_out')
    lse = checkpoint_name(lse, 'flash_lse')
    return oT, (qT, kT, vT, seg_ids, oT, lse)


def _flash_tm_bwd(block_q, block_k, max_seqlen, interpret, num_jobs,
                  res, doT):
    qT, kT, vT, seg_ids, oT, lse = res
    H, D, T = qT.shape
    segq_row = seg_ids.reshape(1, T)
    segk_col = seg_ids.reshape(T, 1)
    kstart, kend, qstart, qend = block_spans(seg_ids, block_q, block_k)
    doT = doT.astype(qT.dtype)
    delta = jnp.sum(doT.astype(jnp.float32) * oT.astype(jnp.float32),
                    axis=1, keepdims=True)           # (H, 1, T)
    dqT, dkT, dvT = _bwd(
        qT, kT, vT, segq_row, segk_col, lse, delta, doT,
        kstart, kend, qstart, qend,
        block_q=block_q, block_k=block_k,
        max_span_q=_span_cap(T, block_k, block_q, max_seqlen),
        max_span_k=_span_cap(T, block_q, block_k, max_seqlen),
        scale=1.0 / math.sqrt(D), interpret=interpret,
        num_jobs=num_jobs)
    return dqT, dkT, dvT, None


flash_tm.defvjp(_flash_tm_fwd, _flash_tm_bwd)
