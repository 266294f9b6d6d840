"""Segment-masked multi-head attention over packed token layouts.

This is the TPU-native replacement for flash-attn's varlen kernel
(reference: esme/attention.py:112-124): non-causal self-attention over a
flat ``(T, H, D)`` layout where tokens may only attend within their own
segment. Two interchangeable implementations:

* :func:`attention_reference` — plain einsum + mask, O(T^2) memory,
  fully XLA-fused; the numerics oracle and small-input path.
* the Pallas segment-flash kernel in :mod:`esme_tpu.ops.flash` —
  online-softmax tiles with cross-segment block skipping, linear memory.

Dispatch via :func:`segment_attention`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        seg_ids: jnp.ndarray,
                        scale: float | None = None) -> jnp.ndarray:
    """Masked softmax attention, fp32 accumulation.

    Args:
        q, k, v: ``(T, H, D)``.
        seg_ids: ``(T,)`` int32 — attention allowed iff equal.
        scale: softmax scale; defaults to ``1/sqrt(D)`` (flash-attn's
            default, reference: esme/attention.py:115-123).
    Returns:
        ``(T, H, D)`` in the dtype of ``q``.
    """
    head_dim = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (head_dim ** 0.5)

    from .linear import mxu_precision
    prec = mxu_precision(q, k)
    # scores in fp32 on the MXU (bf16 inputs, fp32 accumulate)
    scores = jnp.einsum('thd,shd->hts', q, k,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    mask = seg_ids[:, None] == seg_ids[None, :]
    scores = jnp.where(mask[None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum('hts,shd->thd', probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.astype(q.dtype)


def attention_rect(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   seg_q: jnp.ndarray, seg_k: jnp.ndarray,
                   block_k: int = 1024,
                   scale: float | None = None) -> jnp.ndarray:
    """Rectangular segment-masked attention with online softmax.

    The context-parallel building block: local queries ``q``
    ``(Tq, H, D)`` attend over globally gathered keys/values
    ``(Tk, H, D)`` with per-side segment ids. A ``lax.scan`` over
    k-tiles keeps memory at ``O(Tq x block_k)`` per step (flash-style)
    without a dedicated kernel; XLA fuses the mask/softmax updates into
    the tile matmuls. No reference analogue — the reference has no
    sequence parallelism (SURVEY.md §2.4).
    """
    Tq, H, D = q.shape
    Tk = k.shape[0]
    scale = scale if scale is not None else 1.0 / (D ** 0.5)

    from .linear import mxu_precision
    prec = mxu_precision(q, k)

    pad = (-Tk) % block_k
    if pad:
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        # padded keys get a segment id no query carries
        seg_k = jnp.concatenate(
            [seg_k, jnp.full((pad,), jnp.max(seg_q) + jnp.max(seg_k) + 1,
                             seg_k.dtype)])
    n_blocks = (Tk + pad) // block_k

    kb = k.reshape(n_blocks, block_k, H, D)
    vb = v.reshape(n_blocks, block_k, H, D)
    sb = seg_k.reshape(n_blocks, block_k)

    def body(carry, tile):
        m, l, acc = carry                  # (H,Tq) (H,Tq) (H,Tq,D)
        kt, vt, st = tile
        s = jnp.einsum('thd,shd->hts', q, kt,
                       preferred_element_type=jnp.float32,
                       precision=prec) * scale
        mask = seg_q[:, None] == st[None, :]
        s = jnp.where(mask[None], s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            'hts,shd->htd', p.astype(q.dtype), vt,
            preferred_element_type=jnp.float32, precision=prec)
        return (m_new, l, acc), None

    m0 = jnp.full((H, Tq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((H, Tq), jnp.float32)
    acc0 = jnp.zeros((H, Tq, D), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), (kb, vb, sb))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return jnp.swapaxes(out, 0, 1).astype(q.dtype)


def segment_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      seg_ids: jnp.ndarray, *, impl: str = 'auto',
                      block_q: int | None = None, block_k: int | None = None,
                      max_seqlen: int | None = None,
                      layout: str = 'thd') -> jnp.ndarray:
    """Dispatch between the einsum reference path and the Pallas
    segment-flash kernel.

    ``impl='auto'`` picks Pallas on TPU for inputs large enough to tile,
    otherwise the reference path (CPU tests, tiny inputs).
    ``max_seqlen`` (longest packed segment; static) caps the flash
    kernel's per-block tile span.
    """
    from .flash import DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, \
        flash_segment_attention
    block_q = DEFAULT_BLOCK_Q if block_q is None else block_q
    block_k = DEFAULT_BLOCK_K if block_k is None else block_k

    if impl == 'auto':
        on_tpu = jax.default_backend() == 'tpu'
        impl = 'flash' if (on_tpu and q.shape[0] >= block_q) else 'reference'

    if impl == 'reference':
        if layout == 'htd':
            q, k, v = (jnp.swapaxes(t, 0, 1) for t in (q, k, v))
            return jnp.swapaxes(attention_reference(q, k, v, seg_ids), 0, 1)
        return attention_reference(q, k, v, seg_ids)
    if impl == 'flash':
        return flash_segment_attention(q, k, v, seg_ids,
                                       block_q=block_q, block_k=block_k,
                                       max_seqlen=max_seqlen, layout=layout)
    raise ValueError(f'unknown attention impl: {impl}')
