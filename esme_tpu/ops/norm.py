"""LayerNorm with fp32 statistics.

The reference relies on torch's LayerNorm over bf16 activations, which
accumulates mean/var in fp32 (reference: esme/attention.py:75,
esme/esm.py:172). We make the fp32 compute explicit and cast back to
the activation dtype so TPU bf16 forward matches GPU numerics.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray,
               bias: jnp.ndarray | None = None,
               eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def apply_norm(x: jnp.ndarray, params: dict, eps: float = 1e-5) -> jnp.ndarray:
    """Apply a ``{'scale': ..., 'bias'?: ...}`` LayerNorm param dict."""
    return layer_norm(x, params['scale'], params.get('bias'), eps=eps)
