"""Prediction heads over pooled segment representations.

Param-dict + apply-function versions of the reference head modules
(reference: esme/head.py:30-68 ClsHead, esme/pooling.py:139-228
LearnedAttentionPool / LearnedAggregation / BinaryLearnedAggregation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.linear import linear
from ..ops.pooling import attention_pool, partition_mean_pool


def _linear_init(key, d_in, d_out, dtype, bias=True):
    std = d_in ** -0.5
    p = {'kernel': (jax.random.truncated_normal(key, -2, 2, (d_in, d_out),
                                                jnp.float32) * std
                    ).astype(dtype)}
    if bias:
        p['bias'] = jnp.zeros((d_out,), dtype)
    return p


def init_cls_head(rng, embed_dim, num_cls=1, hidden_dim=4096,
                  dtype=jnp.bfloat16):
    """(reference: esme/head.py:57-65)"""
    k1, k2 = jax.random.split(jax.random.key(rng) if isinstance(rng, int)
                              else rng)
    return {
        'fc1': _linear_init(k1, embed_dim, hidden_dim, dtype),
        'fc2': _linear_init(k2, hidden_dim, num_cls, dtype),
    }


def apply_cls_head(params, x, seg_ids, num_segments):
    """Mean-pool then 2-layer ReLU MLP → (S, num_cls) squeezed
    (reference: esme/head.py:67-68)."""
    pooled = partition_mean_pool(x, seg_ids, num_segments)
    h = jax.nn.relu(linear(pooled, params['fc1']))
    out = linear(h, params['fc2'])
    return out.squeeze(-1) if out.shape[-1] == 1 else out


def init_learned_aggregation(rng, embed_dim, num_cls=1, attention_heads=4,
                             dtype=jnp.bfloat16):
    """(reference: esme/pooling.py:139-218): learned cls queries
    (ones-init like the reference, esme/pooling.py:164), a key
    projection, and a 2-layer ReLU head to one output per cls."""
    key = jax.random.key(rng) if isinstance(rng, int) else rng
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        'cls': jnp.ones((num_cls, embed_dim), dtype),
        'k': _linear_init(k1, embed_dim, embed_dim, dtype),
        'linear': _linear_init(k2, embed_dim, embed_dim, dtype),
        'final': _linear_init(k3, embed_dim, 1, dtype),
    }


def apply_learned_attention_pool(params, x, seg_ids, num_segments,
                                 attention_heads):
    """(S, C, D) pooled embeddings (reference: esme/pooling.py:166-179)."""
    return attention_pool(params['cls'], x, params['k'], seg_ids,
                          num_segments, attention_heads)


def apply_learned_aggregation(params, x, seg_ids, num_segments,
                              attention_heads):
    """(S, C) scores; squeeze C=1 for the binary variant
    (reference: esme/pooling.py:215-228)."""
    pooled = apply_learned_attention_pool(params, x, seg_ids, num_segments,
                                          attention_heads)
    h = jax.nn.relu(linear(pooled, params['linear']))
    out = linear(h, params['final'])[..., 0]        # (S, C)
    return out[..., 0] if out.shape[-1] == 1 else out


def init_feed_forward(rng, embed_dim, hidden_dim, out_dim=None,
                      dtype=jnp.bfloat16):
    """Plain ReLU MLP utility (reference: esme/layer.py:1-23)."""
    out_dim = out_dim or embed_dim
    k1, k2 = jax.random.split(jax.random.key(rng) if isinstance(rng, int)
                              else rng)
    return {'fc1': _linear_init(k1, embed_dim, hidden_dim, dtype),
            'fc2': _linear_init(k2, hidden_dim, out_dim, dtype)}


def apply_feed_forward(params, x):
    """(reference: esme/layer.py:14-23)"""
    return linear(jax.nn.relu(linear(x, params['fc1'])), params['fc2'])
