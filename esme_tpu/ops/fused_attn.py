"""Fused rotary + segment-flash attention with a memory-lean VJP.

One custom-VJP boundary around the whole attention complex
``(T, H·D) projections -> split+RoPE -> flash -> merge -> (T, H·D)``
(the TPU replacement for flash-attn varlen + rotary,
reference: esme/attention.py:112-132, esme/rotary.py:22-63).

Why fuse the AD boundary and not just the kernels: with separate
custom VJPs, the flash kernel saves its q/k/v/o operands in the
kernel-native ``(H, T, 64)`` layout, whose 64-wide lane dimension pads
to 128 under TPU tiling — 2x HBM for every saved tensor, stacked per
layer by the scan (4 x ``(L, H, T, 64)`` = ~6.4GB at a 10k-token
ESM2-650M batch). This boundary saves the pre-split ``(T, H·D)``
projections (dense lane dim, zero padding) plus the merged output and
fp32 LSE, and recomputes the bandwidth-only split+rotary relayout in
backward (~1ms/layer vs ~100MB/layer saved).

The flash kernels stream k/v (and, in backward, q/do) as token-minor
``(H, D, T)`` arrays — the layout that reaches full HBM bandwidth
(ops/flash.py docstring) — so the split kernels emit that layout
directly; no XLA transpose ever materializes.

Requires T to be a multiple of the flash alignment (the model forward
pre-pads once per call, models/esm.py).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

from .flash import (_FWD_SCORE_BUDGET, _bwd, _fwd, _fwd_jobs,
                    _head_block, _span_cap, block_spans)
from .headsplit import (_merge_call, _merge_call_t, _pick_interpret,
                        _split_call_t, _split_one_call_t)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_rotary_flash(q2, k2, v2, cos, sin, seg_ids, num_heads: int,
                       block_q: int, block_k: int,
                       max_seqlen: int | None, interpret: bool,
                       num_jobs: int | None = None):
    """Split heads + RoPE + segment-flash + merge, as one AD boundary.

    Args:
        q2, k2, v2: ``(T, H·D)`` projection outputs; T must be a
            multiple of ``lcm(block_q, block_k)``.
        cos, sin: ``(T, D)`` RoPE tables (identity tables for
            non-rotary models).
        seg_ids: ``(T,)`` int32 segment ids.
    Returns:
        ``(T, H·D)`` merged attention output.
    """
    o_m, _ = _fused_fwd(q2, k2, v2, cos, sin, seg_ids, num_heads,
                        block_q, block_k, max_seqlen, interpret,
                        num_jobs)
    return o_m


def _run_fwd(q2, k2, v2, cos, sin, seg_ids, H, block_q, block_k,
             max_seqlen, interpret, num_jobs=None):
    T = q2.shape[0]
    D = q2.shape[1] // H
    segq_row = seg_ids.reshape(1, T)
    segk_col = seg_ids.reshape(T, 1)
    if os.environ.get('ESME_FLASH_IMPL') == 'v2' and not interpret:
        # round-3 experiment (ops/flash_v2.py): dynamic-span inner
        # emit_pipeline. Kept for A/B only — the on-chip measurement
        # (results/flash_ab_v2.txt) showed its win over the old
        # head-minor v1 was marginal (13.1 -> 12.0 ms/layer) because
        # the binding resource was DMA *bandwidth* (layout), not
        # wasted tiles; the token-minor static-span kernel below beats
        # both.
        from .flash_v2 import fwd_v2
        bk = int(os.environ.get('ESME_V2_BK', max(block_k, 1024)))
        hb = int(os.environ.get('ESME_V2_HB', 4))
        while H % hb:
            hb -= 1
        vmem = int(os.environ.get('ESME_V2_VMEM_MB', 100)) * 1024 * 1024
        qh, kT, vT = _split_call_t(q2, k2, v2, cos, sin, H, interpret)
        kstart, kend, _, _ = block_spans(seg_ids, block_q, bk)
        o, lse3 = fwd_v2(qh, kT, vT, segk_col, segq_row.reshape(1, T),
                         kstart, kend,
                         block_q=block_q, block_k=bk, head_block=hb,
                         scale=1.0 / math.sqrt(D), interpret=interpret,
                         vmem_limit=vmem)
        o_m = _merge_call(o, None, None, False, False, interpret)
        return o_m, jnp.swapaxes(lse3, 1, 2)
    qT, kT, vT = _split_call_t(q2, k2, v2, cos, sin, H, interpret,
                               q_minor=True)
    kstart, kend, _, _ = block_spans(seg_ids, block_q, block_k)
    hb = _head_block(H, block_q, block_k, _FWD_SCORE_BUDGET)
    if num_jobs is not None:
        # dynamic-span job list: sweeps exactly the real coverage
        # (~2.1x less DMA + grid steps than the static span cap at the
        # bench shape); the caller guarantees num_jobs >= the real
        # span total (host_num_jobs_from_cu)
        oT, lse = _fwd_jobs(qT, kT, vT, segq_row, segk_col, kstart,
                            kend, block_q=block_q, block_k=block_k,
                            head_block=hb, num_jobs=num_jobs,
                            scale=1.0 / math.sqrt(D),
                            interpret=interpret)
    else:
        oT, lse = _fwd(qT, kT, vT, segq_row, segk_col, kstart, kend,
                       block_q=block_q, block_k=block_k, head_block=hb,
                       max_span=_span_cap(T, block_q, block_k,
                                          max_seqlen),
                       scale=1.0 / math.sqrt(D), interpret=interpret)
    o_m = _merge_call_t(oT, None, None, False, False, interpret)
    return o_m, lse


def _fused_fwd(q2, k2, v2, cos, sin, seg_ids, H, block_q, block_k,
               max_seqlen, interpret, num_jobs=None):
    interpret = _pick_interpret(interpret)
    cos = jax.lax.stop_gradient(cos)
    sin = jax.lax.stop_gradient(sin)
    seg_ids = jax.lax.stop_gradient(seg_ids.astype(jnp.int32))
    o_m, lse = _run_fwd(q2, k2, v2, cos, sin, seg_ids, H, block_q,
                        block_k, max_seqlen, interpret, num_jobs)
    # selective-remat names (see ops/flash.py _flash_tm_fwd): saving
    # these two lets the checkpointed backward skip the flash forward
    from jax.ad_checkpoint import checkpoint_name
    o_m = checkpoint_name(o_m, 'flash_out')
    lse = checkpoint_name(lse, 'flash_lse')
    return o_m, (q2, k2, v2, cos, sin, seg_ids, o_m, lse)


def _fused_bwd(H, block_q, block_k, max_seqlen, interpret, num_jobs,
               res, do_m):
    q2, k2, v2, cos, sin, seg_ids, o_m, lse = res
    interpret = _pick_interpret(interpret)
    T = q2.shape[0]
    D = q2.shape[1] // H

    # recompute the bandwidth-only relayouts instead of saving the
    # (H, T, 64) tensors (2x tiling waste per saved buffer); all
    # streamed operands re-emitted token-minor for the bwd kernels
    do_m = do_m.astype(o_m.dtype)
    qT, kT, vT = _split_call_t(q2, k2, v2, cos, sin, H, interpret,
                               q_minor=True)
    doT = _split_one_call_t(do_m, H, interpret)

    # delta = rowwise(do·o), computed in the dense (T, H·D) layout and
    # transposed to (H, 1, T) — 4MB, XLA handles it
    delta2 = jnp.swapaxes(
        jnp.sum((do_m.astype(jnp.float32) * o_m.astype(jnp.float32))
                .reshape(T, H, D), axis=-1), 0, 1)[:, None, :]

    segq_row = seg_ids.reshape(1, T)
    segk_col = seg_ids.reshape(T, 1)
    kstart, kend, qstart, qend = block_spans(seg_ids, block_q, block_k)
    dqT, dkT, dvT = _bwd(
        qT, kT, vT, segq_row, segk_col, lse, delta2, doT,
        kstart, kend, qstart, qend,
        block_q=block_q, block_k=block_k,
        max_span_q=_span_cap(T, block_k, block_q, max_seqlen),
        max_span_k=_span_cap(T, block_q, block_k, max_seqlen),
        scale=1.0 / math.sqrt(D), interpret=interpret,
        num_jobs=num_jobs)

    # RoPE is orthogonal: d(R x) = R^T dy = counter-rotation
    dq2 = _merge_call_t(dqT, cos, sin, True, True, interpret)
    dk2 = _merge_call_t(dkT, cos, sin, True, True, interpret)
    dv2 = _merge_call_t(dvT, None, None, False, False, interpret)
    return dq2, dk2, dv2, None, None, None


fused_rotary_flash.defvjp(_fused_fwd, _fused_bwd)
