"""Segment pooling over packed layouts.

TPU-native equivalents of the reference pooling layers
(reference: esme/pooling.py:8-228): partition mean pooling via
``segment_sum`` instead of ``index_add_``, and cls-query attention
pooling via segment-softmax instead of a varlen flash call with
``max_seqlen_q=1`` (reference: esme/pooling.py:126-134). All shapes are
static given ``num_segments``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linear import linear

NEG_INF = -1e30


def partition_mean_pool(x: jnp.ndarray, seg_ids: jnp.ndarray,
                        num_segments: int) -> jnp.ndarray:
    """Mean of ``x`` (T, D) within each segment → (S, D)
    (reference: esme/pooling.py:44-69). Tokens whose seg id >=
    num_segments (static-shape padding tail) are dropped."""
    sums = jax.ops.segment_sum(x.astype(jnp.float32), seg_ids,
                               num_segments=num_segments)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32),
                                 seg_ids, num_segments=num_segments)
    counts = jnp.maximum(counts, 1.0)
    return (sums / counts[:, None]).astype(x.dtype)


def attention_pool(cls_q: jnp.ndarray, x: jnp.ndarray, k_params: dict,
                   seg_ids: jnp.ndarray, num_segments: int,
                   num_heads: int) -> jnp.ndarray:
    """Cross-attention pooling: per segment, ``num_cls`` learned queries
    attend that segment's tokens (reference: esme/pooling.py:72-136 —
    there via a q_len-1 varlen flash call; here via segment softmax).

    Args:
        cls_q: (C, D) query tokens.
        x: (T, D) token embeddings (keys are ``k_params`` projections of
           x; values are x itself, matching the reference where only
           ``k`` is a learned projection, esme/pooling.py:79,109-118).
    Returns:
        (S, C, D) pooled embeddings.
    """
    T, D = x.shape
    C = cls_q.shape[0]
    Dh = D // num_heads
    scale = 1.0 / (Dh ** 0.5)

    k = linear(x, k_params).reshape(T, num_heads, Dh)
    q = cls_q.reshape(C, num_heads, Dh)
    v = x.reshape(T, num_heads, Dh)

    # per-token score against every cls query: (T, C, H)
    from .linear import mxu_precision
    s = jnp.einsum('thd,chd->tch', k, q,
                   preferred_element_type=jnp.float32,
                   precision=mxu_precision(k, q)) * scale

    # segment softmax over t
    m = jax.ops.segment_max(s, seg_ids, num_segments=num_segments)
    m = jnp.where(jnp.isfinite(m), m, 0.0)           # empty segments
    p = jnp.exp(s - m[seg_ids])
    z = jax.ops.segment_sum(p, seg_ids, num_segments=num_segments)
    z = jnp.maximum(z, 1e-30)

    # weighted value sums: (S, C, H, Dh)
    pv = jax.ops.segment_sum(
        p[:, :, :, None] * v[:, None, :, :].astype(jnp.float32),
        seg_ids, num_segments=num_segments)
    out = pv / z[:, :, :, None]
    return out.reshape(num_segments, C, D).astype(x.dtype)
