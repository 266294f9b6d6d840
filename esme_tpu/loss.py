"""Losses over masked positions (reference: esme/loss.py:5-54).

Static-shape versions: instead of boolean-gathering the masked
positions (dynamic shapes retrigger XLA compilation), losses weight
every position by the mask and normalize by the mask count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy over positions where ``mask`` is True
    (reference: esme/loss.py:31-54). ``logits`` (T, V), ``targets``
    (T,), ``mask`` (T,) bool."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[:, None].astype(jnp.int32),
                             axis=-1)[:, 0]
    w = mask.astype(jnp.float32)
    return -(ll * w).sum() / jnp.maximum(w.sum(), 1.0)


def nll_loss(log_probs: jnp.ndarray, targets: jnp.ndarray,
             mask: jnp.ndarray) -> jnp.ndarray:
    """Mean NLL over masked positions given precomputed log-probs
    (reference: esme/loss.py:5-28)."""
    ll = jnp.take_along_axis(log_probs.astype(jnp.float32),
                             targets[:, None].astype(jnp.int32),
                             axis=-1)[:, 0]
    w = mask.astype(jnp.float32)
    return -(ll * w).sum() / jnp.maximum(w.sum(), 1.0)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
             weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """MSE with optional per-element weights (for padded segments)."""
    d = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if weight is None:
        return d.mean()
    w = weight.astype(jnp.float32)
    return (d * w).sum() / jnp.maximum(w.sum(), 1.0)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Binary cross-entropy on logits (TF-classification fine-tune,
    reference: workflow/tf/finetune.py)."""
    z = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    per = jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
    if weight is None:
        return per.mean()
    w = weight.astype(jnp.float32)
    return (per * w).sum() / jnp.maximum(w.sum(), 1.0)
