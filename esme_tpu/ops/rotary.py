"""Rotary position embeddings over packed (varlen) layouts.

TPU-native RoPE (reference: esme/rotary.py:5-165). Instead of a
dynamically-grown host-side cos/sin cache gathered by flat-token index
(reference: esme/rotary.py:116-149), we compute angles directly from the
per-token within-sequence positions with fp32 position indices — the
same values (``table[pos] == cos(pos * inv_freq)``) with no dynamic
cache, no gather, and full XLA fusion into the surrounding matmuls.

Note: the reference's custom autograd re-applies the *forward* rotation
in backward instead of the transpose (reference: esme/rotary.py:46-63, a
latent bug flagged in SURVEY.md). We use true JAX autodiff, which
differentiates the rotation correctly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotary_inv_freq(dim: int, base: float = 10000.0) -> jnp.ndarray:
    """``1 / base^(2i/dim)`` in fp32 (reference: esme/rotary.py:110-114)."""
    return 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))


def rotary_cos_sin(pos_ids: jnp.ndarray, dim: int, base: float = 10000.0,
                   dtype=jnp.bfloat16):
    """Per-token cos/sin of shape ``(T, dim)``.

    Positions are fp32 (reference: esme/rotary.py:131-149 insists on fp32
    position indices for precision) and the result is cast to the
    activation dtype, matching the reference's cache dtype semantics.
    """
    inv_freq = rotary_inv_freq(dim, base)
    freqs = pos_ids.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """(reference: esme/rotary.py:17-19)"""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate ``x`` of shape ``(T, H, D)`` with per-token cos/sin
    ``(T, D)`` (reference: esme/rotary.py:22-43)."""
    cos = cos[:, None, :]
    sin = sin[:, None, :]
    return x * cos + rotate_half(x) * sin


def apply_rotary_qk(q: jnp.ndarray, k: jnp.ndarray, pos_ids: jnp.ndarray,
                    base: float = 10000.0):
    """Apply RoPE to q and k ``(T, H, D)`` using packed per-token
    positions (reference: esme/rotary.py:151-165)."""
    head_dim = q.shape[-1]
    cos, sin = rotary_cos_sin(pos_ids, head_dim, base, dtype=q.dtype)
    return apply_rotary(q, cos, sin), apply_rotary(k, cos, sin)
