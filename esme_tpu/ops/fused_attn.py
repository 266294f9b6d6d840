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

Requires T to be a multiple of the flash alignment (the model forward
pre-pads once per call, models/esm.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .flash import (_FWD_SCORE_BUDGET, _bwd, _fwd, _head_block, _span_cap,
                    block_spans)
from .headsplit import _merge_call, _pick_bt, _pick_interpret, _split_call
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_one_call(x2, H, interpret):
    """(T, H·D) -> (H, T, D) relayout without rotation."""
    from .headsplit import _split_one_kernel
    T, HD = x2.shape
    D = HD // H
    bt = _pick_bt(T, HD, x2.dtype.itemsize, buffers=4)
    assert T % bt == 0
    return pl.pallas_call(
        functools.partial(_split_one_kernel, H=H, D=D),
        grid=(T // bt,),
        in_specs=[pl.BlockSpec((bt, HD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, bt, D), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, T, D), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(x2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_rotary_flash(q2, k2, v2, cos, sin, seg_ids, num_heads: int,
                       block_q: int, block_k: int,
                       max_seqlen: int | None, interpret: bool):
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
                        block_q, block_k, max_seqlen, interpret)
    return o_m


def _run_fwd(q2, k2, v2, cos, sin, seg_ids, H, block_q, block_k,
             max_seqlen, interpret):
    import os
    T = q2.shape[0]
    D = q2.shape[1] // H
    seg2d = seg_ids.reshape(T, 1)
    segT = seg_ids.reshape(1, T)
    if os.environ.get('ESME_FLASH_IMPL') == 'v2' and not interpret:
        # dynamic-span inner pipeline (ops/flash_v2.py): DMA traffic
        # drops to the actual block-diagonal coverage
        from .flash_v2 import fwd_v2
        from .headsplit import _split_call_t
        bk = int(os.environ.get('ESME_V2_BK', block_k))
        hb = int(os.environ.get('ESME_V2_HB', 4))
        while H % hb:
            hb -= 1
        vmem = int(os.environ.get('ESME_V2_VMEM_MB', 100)) * 1024 * 1024
        qh, kT, vT = _split_call_t(q2, k2, v2, cos, sin, H, interpret)
        kstart, kend, _, _ = block_spans(seg_ids, block_q, bk)
        o, lse = fwd_v2(qh, kT, vT, seg2d, segT, kstart, kend,
                        block_q=block_q, block_k=bk, head_block=hb,
                        scale=1.0 / math.sqrt(D), interpret=interpret,
                        vmem_limit=vmem)
        o_m = _merge_call(o, None, None, False, False, interpret)
        return o_m, lse
    qh, kh, vh = _split_call(q2, k2, v2, cos, sin, H, False, interpret)
    kstart, kend, _, _ = block_spans(seg_ids, block_q, block_k)
    hb = _head_block(H, block_q, block_k, _FWD_SCORE_BUDGET)
    o, lse = _fwd(qh, kh, vh, seg2d, segT, kstart, kend,
                  block_q=block_q, block_k=block_k, head_block=hb,
                  max_span=_span_cap(T, block_q, block_k, max_seqlen),
                  scale=1.0 / math.sqrt(D), interpret=interpret)
    o_m = _merge_call(o, None, None, False, False, interpret)
    return o_m, lse


def _fused_fwd(q2, k2, v2, cos, sin, seg_ids, H, block_q, block_k,
               max_seqlen, interpret):
    interpret = _pick_interpret(interpret)
    cos = jax.lax.stop_gradient(cos)
    sin = jax.lax.stop_gradient(sin)
    seg_ids = jax.lax.stop_gradient(seg_ids.astype(jnp.int32))
    o_m, lse = _run_fwd(q2, k2, v2, cos, sin, seg_ids, H, block_q,
                        block_k, max_seqlen, interpret)
    return o_m, (q2, k2, v2, cos, sin, seg_ids, o_m, lse)


def _fused_bwd(H, block_q, block_k, max_seqlen, interpret, res, do_m):
    q2, k2, v2, cos, sin, seg_ids, o_m, lse = res
    interpret = _pick_interpret(interpret)
    T = q2.shape[0]
    D = q2.shape[1] // H

    # recompute the bandwidth-only relayouts instead of saving the
    # (H, T, 64) tensors (2x tiling waste per saved buffer)
    qh, kh, vh = _split_call(q2, k2, v2, cos, sin, H, False, interpret)
    oh = _split_one_call(o_m, H, interpret)
    doh = _split_one_call(do_m.astype(o_m.dtype), H, interpret)

    seg2d = seg_ids.reshape(T, 1)
    segT = seg_ids.reshape(1, T)
    kstart, kend, qstart, qend = block_spans(seg_ids, block_q, block_k)
    dqh, dkh, dvh = _bwd(
        qh, kh, vh, seg2d, segT, oh, lse, doh, kstart, kend, qstart, qend,
        block_q=block_q, block_k=block_k,
        max_span_q=_span_cap(T, block_k, block_q, max_seqlen),
        max_span_k=_span_cap(T, block_q, block_k, max_seqlen),
        scale=1.0 / math.sqrt(D), interpret=interpret)

    # RoPE is orthogonal: d(R x) = R^T dy = counter-rotation
    dq2 = _merge_call(dqh, cos, sin, True, True, interpret)
    dk2 = _merge_call(dkh, cos, sin, True, True, interpret)
    dv2 = _merge_call(dvh, None, None, False, False, interpret)
    return dq2, dk2, dv2, None, None, None


fused_rotary_flash.defvjp(_fused_fwd, _fused_bwd)
