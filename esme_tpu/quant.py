"""Weight-only quantization: per-channel int8 and blockwise NF4 4-bit.

TPU-native replacement for the reference's two quantization paths —
bitsandbytes ``Linear8bitLt``/``Linear4bit`` at load time
(reference: esme/esm.py:420-446) and the in-repo experimental row-wise
absmax int8 (reference: esme/quantization.py:20-110). One unified
scheme instead of two:

* **int8**: per-output-channel absmax scales over the input dim —
  the same granularity as the reference's row-wise scheme on the
  ``(out, in)`` torch weight (reference: esme/quantization.py:20-26).
* **4bit**: NF4 (normal-float) codebook with blockwise absmax along
  the input dim, two nibbles packed per byte — the layout family of
  bitsandbytes ``Linear4bit`` — plus **outlier-row decomposition**
  beyond the reference: the ``_NF4_OUTLIER_ROWS`` largest-absmax input
  rows of each kernel are stored exactly in the source dtype and
  scattered back at dequant time. Trained transformers concentrate
  large weights in a few feature rows (the LLM.int8 phenomenon the
  reference handles only for int8, esme/quantization.py:37-84); one
  poisoned row inflates every 64-block absmax it touches, and the
  measured NF4 cos_min in a synthetic 20x-outlier regime was 0.985
  (below the 0.99 contract) without decomposition vs ~0.997 with it
  (results/quant_accuracy__esm2_650m.csv). Fixed K keeps every leaf
  shape static across the stacked layer scan.

Dequantization happens at matmul time inside the jit; under the
layer-``scan`` only ONE layer's weights are ever materialized in bf16
at a time, so model memory is dominated by the quantized storage
(the capacity win that lets 15B fit one device, reference motivation).
Quantized layers remain LoRA-wrappable — adapters ride alongside in
the same param dict (reference: esme/lora.py:51-52).

Embeddings, norms, and the LM head stay in bf16, exactly like the
reference's quantized loaders (reference: esme/esm.py:448-472).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# QLoRA NF4 codebook (public constant)
NF4_CODE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], dtype=np.float32)
_NF4_BOUNDARIES = (NF4_CODE[1:] + NF4_CODE[:-1]) / 2

# Input rows kept exact per kernel in the 4-bit scheme (see module
# docstring). 16 rows x d_out bf16 is ~0.1% of a 650M layer.
_NF4_OUTLIER_ROWS = 16


def quantize_int8(kernel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-output-channel absmax int8 over ``(..., in, out)`` kernels."""
    w = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {'qvalue': q, 'scale': scale}


def quantize_int8_np(kernel: np.ndarray) -> Dict[str, np.ndarray]:
    """Host (numpy) twin of :func:`quantize_int8`, bit-identical output.
    Used by the streaming loader so full-precision weights never touch
    the device (reference streams per-layer too, esme/esm.py:448-472)."""
    w = np.asarray(kernel, np.float32)
    scale = np.abs(w).max(axis=-2, keepdims=True) / 127.0
    scale[scale == 0] = 1.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {'qvalue': q, 'scale': scale.astype(np.float32)}


def _outlier_rows_np(w, k):
    """Indices of the ``k`` largest-absmax input rows, per lead slice.
    w: (*lead, d_in, d_out) fp32. Returns idx (*lead, k) int32 and the
    exact rows (*lead, k, d_out)."""
    row_absmax = np.abs(w).max(axis=-1)                # (*lead, d_in)
    idx = np.argsort(-row_absmax, axis=-1)[..., :k].astype(np.int32)
    rows = np.take_along_axis(w, idx[..., None], axis=-2)
    return idx, rows


def quantize_nf4_np(kernel: np.ndarray, block: int = 64
                    ) -> Dict[str, np.ndarray]:
    """Host (numpy) twin of :func:`quantize_nf4`, bit-identical output."""
    *lead, d_in, d_out = kernel.shape
    assert d_in % block == 0, f'in dim {d_in} not divisible by {block}'
    w = np.asarray(kernel, np.float32)
    k = min(_NF4_OUTLIER_ROWS, d_in)
    oidx, orows = _outlier_rows_np(w, k)
    # zero the outlier rows before quantizing so they don't poison the
    # blockwise absmax scales; dequant scatters the exact rows back
    wq = w.copy()
    np.put_along_axis(wq, oidx[..., None],
                      np.zeros_like(orows), axis=-2)
    wq = wq.reshape(*lead, d_in // block, block, d_out)
    absmax = np.abs(wq).max(axis=-2, keepdims=True)
    absmax[absmax == 0] = 1.0
    norm = wq / absmax
    # exact equivalent of np.searchsorted(B, x, side='left') =
    # #{B_i < x} as 15 vectorized compares — numpy's binary search was
    # 97% of the host quantize cost (1.9s vs 0.1s everything else per
    # 100MB block on this 2-CPU host; the 15B streaming load spent ~9
    # of its 24 minutes in it)
    idx = np.zeros(norm.shape, np.uint8)
    for b in _NF4_BOUNDARIES:
        idx += norm > b
    idx = idx.reshape(*lead, d_in // block, block // 2, 2, d_out)
    packed = (idx[..., 0, :] | (idx[..., 1, :] << 4)).astype(np.uint8)
    dt = kernel.dtype if kernel.dtype.kind == 'f' else np.float32
    return {
        'qvalue': packed.reshape(*lead, d_in // 2, d_out),
        'scale': absmax.reshape(*lead, d_in // block, 1,
                                d_out).astype(np.float32),
        'outlier_idx': oidx,
        'outlier_rows': orows.astype(dt),
    }


def quantize_kernel_np(kernel: np.ndarray, mode: str) -> Dict[str, np.ndarray]:
    fn = {'8bit': quantize_int8_np, '4bit': quantize_nf4_np,
          '8bitexperimental': quantize_int8_np}[mode]
    return fn(kernel)


def quantize_nf4(kernel: jnp.ndarray, block: int = 64
                 ) -> Dict[str, jnp.ndarray]:
    """Blockwise NF4 over the input dim of ``(..., in, out)`` kernels,
    with the top-``_NF4_OUTLIER_ROWS`` input rows kept exact (see
    module docstring)."""
    *lead, d_in, d_out = kernel.shape
    assert d_in % block == 0, f'in dim {d_in} not divisible by {block}'
    w = kernel.astype(jnp.float32)
    k = min(_NF4_OUTLIER_ROWS, d_in)
    row_absmax = jnp.max(jnp.abs(w), axis=-1)          # (*lead, d_in)
    _, oidx = jax.lax.top_k(row_absmax, k)
    oidx = oidx.astype(jnp.int32)
    orows = jnp.take_along_axis(w, oidx[..., None], axis=-2)
    keep = jnp.ones(w.shape[:-1], bool)
    keep = jnp.put_along_axis(keep, oidx, False, axis=-1,
                              inplace=False)
    w0 = jnp.where(keep[..., None], w, 0.0)
    w0 = w0.reshape(*lead, d_in // block, block, d_out)
    absmax = jnp.max(jnp.abs(w0), axis=-2, keepdims=True)
    absmax = jnp.where(absmax == 0, 1.0, absmax)
    normed = w0 / absmax
    idx = jnp.searchsorted(jnp.asarray(_NF4_BOUNDARIES),
                           normed, side='left').astype(jnp.uint8)
    # pack two nibbles per byte along the block dim
    idx = idx.reshape(*lead, d_in // block, block // 2, 2, d_out)
    packed = (idx[..., 0, :] | (idx[..., 1, :] << 4)).astype(jnp.uint8)
    return {
        'qvalue': packed.reshape(*lead, d_in // 2, d_out),
        'scale': absmax.reshape(*lead, d_in // block, 1, d_out),
        'outlier_idx': oidx,
        'outlier_rows': orows.astype(kernel.dtype),
    }


def _nf4_decode(idx: jnp.ndarray) -> jnp.ndarray:
    """Codebook decode as a binary select tree (4 compares + 15
    selects, pure VPU, fuses into the dequant loop). ``jnp.take``'s
    elementwise gather is catastrophically slow on TPU — it made 4-bit
    inference ~70x slower than bf16 at 650M; the tree is
    bandwidth-bound like the rest of the dequant."""
    def tree(lo, hi, bit):
        if hi - lo == 1:
            return jnp.float32(NF4_CODE[lo])
        mid = (lo + hi) // 2
        return jnp.where((idx & (1 << bit)) != 0,
                         tree(mid, hi, bit - 1), tree(lo, mid, bit - 1))
    return tree(0, 16, 3)


def dequantize(params: Dict[str, jnp.ndarray],
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """Back to a dense ``(..., in, out)`` kernel. The scheme is
    inferred from the storage dtype: int8 = per-channel, uint8 = packed
    NF4 (keeps the param pytree free of non-array leaves for jit)."""
    if params['qvalue'].dtype == jnp.int8:
        return (params['qvalue'].astype(jnp.float32)
                * params['scale']).astype(dtype)
    if params['qvalue'].dtype == jnp.uint8:
        packed = params['qvalue']
        *lead, half_in, d_out = packed.shape
        scale = params['scale']
        nblocks = scale.shape[-3]
        block = (half_in * 2) // nblocks
        lo = (packed & 0x0F).astype(jnp.int32)
        hi = (packed >> 4).astype(jnp.int32)
        idx = jnp.stack([lo, hi], axis=-2)      # (..., half_in, 2, out)
        idx = idx.reshape(*lead, nblocks, block, d_out)
        w = _nf4_decode(idx) * scale
        w = w.reshape(*lead, half_in * 2, d_out)
        if 'outlier_idx' in params:
            # scatter the exactly-stored outlier rows back (their
            # quantized slots were zeroed at quantize time)
            oidx = params['outlier_idx']
            orows = params['outlier_rows'].astype(w.dtype)
            if oidx.ndim == 1:
                w = w.at[oidx].set(orows)
            else:
                idx_full = jnp.broadcast_to(oidx[..., None], orows.shape)
                w = jnp.put_along_axis(w, idx_full, orows,
                                       axis=-2, inplace=False)
        return w.astype(dtype)
    raise ValueError(f'unknown quant dtype {params["qvalue"].dtype}')


def quantized_matmul(x: jnp.ndarray,
                     params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """``x @ dequant(params)`` with fp32 MXU accumulation. Under the
    layer scan only one layer's dense kernel is live at a time."""
    w = dequantize(params, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


NON_TRAINABLE_QUANT_LEAVES = ('qvalue', 'scale', 'outlier_idx',
                              'outlier_rows')


def quantize_params(linear_params: dict, mode: str) -> dict:
    """Quantize one linear param dict, keeping bias/lora leaves."""
    if 'qvalue' in linear_params:
        return linear_params
    fn = {'8bit': quantize_int8, '4bit': quantize_nf4,
          '8bitexperimental': quantize_int8}[mode]
    out = {k: v for k, v in linear_params.items() if k != 'kernel'}
    out.update(fn(linear_params['kernel']))
    return out


def quantize_model_params(params: dict, cfg, mode: str = '8bit') -> dict:
    """Quantize attention + MLP linears (reference walks the same set:
    q/k/v/out + the two/three MLP linears, esme/esm.py:448-472)."""
    assert mode in {'8bit', '4bit', '8bitexperimental'}, mode
    params = dict(params)
    layers = {k: dict(v) for k, v in params['layers'].items()}

    for name in ('q', 'k', 'v', 'out'):
        layers['attn'] = dict(layers['attn'])
        layers['attn'][name] = quantize_params(layers['attn'][name], mode)
    mlp_linears = ('gate', 'up', 'down') if cfg.mlp == 'swiglu' \
        else ('fc1', 'fc2')
    layers['mlp'] = dict(layers['mlp'])
    for name in mlp_linears:
        layers['mlp'][name] = quantize_params(layers['mlp'][name], mode)

    params['layers'] = layers
    return params
