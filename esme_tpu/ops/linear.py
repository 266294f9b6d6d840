"""Linear apply with quantization- and LoRA-aware dispatch.

One entry point, :func:`linear`, covers the reference's three layer
flavors behind a single param-dict contract (reference:
esme/attention.py:76-79 plain Linear, esme/quantization.py:87-110 int8,
esme/lora.py:73-91 multi-adapter LoRA):

* dense:     ``{'kernel': (in, out) bf16, 'bias'?: (out,)}``
* quantized: ``{'qvalue': int8/packed-int4, 'scale': ..., 'bias'?}``
  — see :mod:`esme_tpu.quant` for the exact layouts
* either may carry
  ``{'lora': {name: {'a': (in, r), 'b': (r, out), 'scale': ()}}}``
  applied as ``y + Σ_name (x @ a) @ b * scale`` with
  ``scale = alpha / r`` (reference: esme/lora.py:66,88-91); the scale
  leaf is stop-gradiented — it is metadata, not a trainable weight.

All matmuls request fp32 accumulation on the MXU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def mxu_precision(*operands) -> jax.lax.Precision | None:
    """Matmul precision for the given operands: fp32 inputs request
    ``HIGHEST`` (full fp32 on the MXU via multi-pass bf16) so the fp32
    oracle path stays a real oracle on TPU, where the default precision
    rounds fp32 operands to one bf16 pass (~1e-2 relative error). bf16
    operands — the production path — keep the fast default."""
    if all(o.dtype == jnp.float32 for o in operands):
        return jax.lax.Precision.HIGHEST
    return None


def matmul(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, kernel, preferred_element_type=jnp.float32,
                   precision=mxu_precision(x, kernel)).astype(x.dtype)


def linear(x: jnp.ndarray, params: dict,
           lora_names: Optional[Sequence[str]] = None,
           lora_dropout: float = 0.0,
           dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Apply a linear layer param dict (dense or quantized), plus any
    selected LoRA adapters.

    ``lora_dropout``/``dropout_rng``: training-time inverted dropout on
    each adapter's output contribution (the reference drops the adapter
    output, not the input: esme/lora.py:84-88). No rng ⇒ eval mode."""
    if 'qvalue' in params:
        from ..quant import quantized_matmul
        y = quantized_matmul(x, params)
    else:
        y = matmul(x, params['kernel'])

    if 'bias' in params and params['bias'] is not None:
        y = y + params['bias']

    lora = params.get('lora')
    if lora:
        names = lora_names if lora_names is not None else sorted(lora.keys())
        for j, name in enumerate(names):
            adapter = lora[name]
            scale = jax.lax.stop_gradient(adapter['scale']).astype(x.dtype)
            contrib = matmul(matmul(x, adapter['a']), adapter['b']) * scale
            if dropout_rng is not None and lora_dropout > 0.0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, j),
                    1.0 - lora_dropout, contrib.shape)
                contrib = jnp.where(keep,
                                    contrib / (1.0 - lora_dropout),
                                    0.0).astype(contrib.dtype)
            y = y + contrib

    return y


def matmul_t(kernel: jnp.ndarray, xT: jnp.ndarray) -> jnp.ndarray:
    """``(out, T) = kernel^T @ xT`` for a ``(C_in, T)`` token-minor
    stream and the standard ``(in, out)`` kernel layout — the same MXU
    contraction as :func:`matmul`, transposed."""
    return jax.lax.dot_general(
        kernel, xT, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision(kernel, xT)).astype(xT.dtype)


def linear_t(xT: jnp.ndarray, params: dict,
             lora_names: Optional[Sequence[str]] = None,
             lora_dropout: float = 0.0,
             dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Token-minor twin of :func:`linear`: ``xT (C_in, T)`` ->
    ``(C_out, T)``. Same param-dict contract."""
    if 'qvalue' in params:
        from ..quant import dequantize
        w = dequantize(params, dtype=xT.dtype)
        y = matmul_t(w, xT)
    else:
        y = matmul_t(params['kernel'], xT)

    if 'bias' in params and params['bias'] is not None:
        y = y + params['bias'][:, None]

    lora = params.get('lora')
    if lora:
        names = lora_names if lora_names is not None else sorted(lora.keys())
        for j, name in enumerate(names):
            adapter = lora[name]
            scale = jax.lax.stop_gradient(adapter['scale']).astype(xT.dtype)
            contrib = matmul_t(adapter['b'],
                               matmul_t(adapter['a'], xT)) * scale
            if dropout_rng is not None and lora_dropout > 0.0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, j),
                    1.0 - lora_dropout, contrib.shape)
                contrib = jnp.where(keep,
                                    contrib / (1.0 - lora_dropout),
                                    0.0).astype(contrib.dtype)
            y = y + contrib

    return y
