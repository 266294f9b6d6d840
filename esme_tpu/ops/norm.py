"""LayerNorm with fp32 statistics and a memory-lean backward.

The reference relies on torch's LayerNorm over bf16 activations, which
accumulates mean/var in fp32 (reference: esme/attention.py:75,
esme/esm.py:172). We make the fp32 compute explicit and cast back to
the activation dtype so TPU bf16 forward matches GPU numerics.

The backward is a custom VJP that saves only the (bf16) input — the
residual stream, which neighboring ops save anyway, so XLA dedups it —
and recomputes mean/rstd/x̂ from it. Plain autodiff through the fp32
upcast saves multiple fp32 copies of the activation per call; inside
the layer scan those stack to ``(L, T, D)`` fp32 buffers that dominated
the un-checkpointed training footprint (2 LayerNorms x 33 layers of
fp32 x̂ = ~13GB at a 10k-token ESM2-650M batch — more than the chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ln_stats(x32: jnp.ndarray, eps: float):
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))
    return mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x: jnp.ndarray, scale: jnp.ndarray,
               bias: jnp.ndarray | None = None,
               eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean, rstd = _ln_stats(x32, eps)
    y = (x32 - mean) * rstd * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def _ln_fwd(x, scale, bias, eps):
    return layer_norm(x, scale, bias, eps), (x, scale, bias is not None)


def _ln_bwd(eps, res, dy):
    x, scale, has_bias = res
    x32 = x.astype(jnp.float32)
    mean, rstd = _ln_stats(x32, eps)          # recomputed, not saved
    xhat = (x32 - mean) * rstd
    dy32 = dy.astype(jnp.float32)

    reduce_axes = tuple(range(x.ndim - 1))
    dscale = jnp.sum(dy32 * xhat, axis=reduce_axes).astype(scale.dtype)
    dbias = jnp.sum(dy32, axis=reduce_axes).astype(scale.dtype) \
        if has_bias else None

    dxhat = dy32 * scale.astype(jnp.float32)
    dx = rstd * (dxhat
                 - dxhat.mean(axis=-1, keepdims=True)
                 - xhat * (dxhat * xhat).mean(axis=-1, keepdims=True))
    return dx.astype(x.dtype), dscale, dbias


layer_norm.defvjp(_ln_fwd, _ln_bwd)


def apply_norm(x: jnp.ndarray, params: dict, eps: float = 1e-5) -> jnp.ndarray:
    """Apply a ``{'scale': ..., 'bias'?: ...}`` LayerNorm param dict."""
    return layer_norm(x, params['scale'], params.get('bias'), eps)


# ---------------------------------------------------------------------------
# Token-minor (feature-major) variant: x (C, T), stats over the
# feature axis 0. The token-minor residual stream keeps every layer
# operand in the flash kernels' native layout so no relayout kernels
# run at all (see esme_tpu/models/modules.py token-minor path).
# ---------------------------------------------------------------------------

def _ln_stats_t(x32: jnp.ndarray, eps: float):
    mean = x32.mean(axis=0, keepdims=True)
    var = x32.var(axis=0, keepdims=True)
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))
    return mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_t(x: jnp.ndarray, scale: jnp.ndarray,
                 bias: jnp.ndarray | None = None,
                 eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over axis 0 of a ``(C, T)`` stream; numerics
    identical to :func:`layer_norm` on the transposed input."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean, rstd = _ln_stats_t(x32, eps)
    y = (x32 - mean) * rstd * scale.astype(jnp.float32)[:, None]
    if bias is not None:
        y = y + bias.astype(jnp.float32)[:, None]
    return y.astype(dtype)


def _ln_t_fwd(x, scale, bias, eps):
    return layer_norm_t(x, scale, bias, eps), (x, scale, bias is not None)


def _ln_t_bwd(eps, res, dy):
    x, scale, has_bias = res
    x32 = x.astype(jnp.float32)
    mean, rstd = _ln_stats_t(x32, eps)        # recomputed, not saved
    xhat = (x32 - mean) * rstd
    dy32 = dy.astype(jnp.float32)

    dscale = jnp.sum(dy32 * xhat, axis=1).astype(scale.dtype)
    dbias = jnp.sum(dy32, axis=1).astype(scale.dtype) if has_bias \
        else None

    dxhat = dy32 * scale.astype(jnp.float32)[:, None]
    dx = rstd * (dxhat
                 - dxhat.mean(axis=0, keepdims=True)
                 - xhat * (dxhat * xhat).mean(axis=0, keepdims=True))
    return dx.astype(x.dtype), dscale, dbias


layer_norm_t.defvjp(_ln_t_fwd, _ln_t_bwd)


def apply_norm_t(x: jnp.ndarray, params: dict,
                 eps: float = 1e-5) -> jnp.ndarray:
    """Token-minor twin of :func:`apply_norm`."""
    return layer_norm_t(x, params['scale'], params.get('bias'), eps)
