"""Fused head-split + rotary + layout-change Pallas kernels.

The flash kernel wants ``(H, T, D)``; projections produce ``(T, H·D)``.
Doing the relayout with XLA costs a strided transpose (~176GB/s on
v5e) plus separate rotary passes and per-layer restaging of the cos/sin
tables — ~9ms/layer on ESM2-650M at a 50k-token batch, nearly as much
as attention itself. These kernels do the whole complex in one
bandwidth-bound pass each way:

* :func:`split_heads_rotary` — ``(T, H·D)`` q/k/v ``->`` ``(H, T, D)``
  with RoPE applied to q and k in-flight. The "transpose" is free: the
  head loop reads a 64-lane slice of the input tile and DMAs it to the
  ``h``-th output block — block indexing does the relayout, no vector
  transpose is ever materialized (reference rotary semantics:
  esme/rotary.py:22-43, bf16 multiplies against a cast table).
* :func:`merge_heads` — the inverse relayout for the attention output.

Backward passes reuse the opposite kernel: d(split) = merge with the
*counter*-rotation (RoPE is orthogonal, so the VJP of ``R·x`` is
``R^T·dy`` — unlike the reference, which re-applies the forward
rotation in backward, a latent bug flagged in SURVEY.md), and
d(merge) = split without rotation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_T = 256

# Per-grid-step VMEM budget. The split kernel keeps 3 input rows
# (bt, H·D), 3 output blocks (H, bt, D) — same bytes — all
# double-buffered: ~12·bt·H·D·itemsize. At ESM2-3B width (H·D=2560)
# bt=256 busts the 16MB scoped limit, so bt halves until it fits.
_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_bt(T: int, HD: int, itemsize: int, buffers: int) -> int:
    bt = min(_BLOCK_T, T)
    while bt > 16 and buffers * bt * HD * itemsize > _VMEM_BUDGET:
        bt //= 2
    while T % bt:
        bt //= 2
    return bt


def _split_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref,
                  qo_ref, ko_ref, vo_ref, *, H, D, inverse_rotation):
    h2 = D // 2
    c = cos_ref[:, :h2]
    s = sin_ref[:, :h2]
    if inverse_rotation:
        s = -s
    for h in range(H):
        lo, mid, hi = h * D, h * D + h2, (h + 1) * D
        q1, q2 = q_ref[:, lo:mid], q_ref[:, mid:hi]
        qo_ref[h, :, :h2] = q1 * c - q2 * s
        qo_ref[h, :, h2:] = q2 * c + q1 * s
        k1, k2 = k_ref[:, lo:mid], k_ref[:, mid:hi]
        ko_ref[h, :, :h2] = k1 * c - k2 * s
        ko_ref[h, :, h2:] = k2 * c + k1 * s
        vo_ref[h] = v_ref[:, lo:hi]


def _split_one_kernel(x_ref, o_ref, *, H, D):
    for h in range(H):
        o_ref[h] = x_ref[:, h * D:(h + 1) * D]


def _split_kernel_t(q_ref, k_ref, v_ref, cos_ref, sin_ref,
                    qo_ref, ko_ref, vo_ref, *, H, D, q_minor):
    """Like :func:`_split_kernel` but emits k/v token-minor
    ``(H, D, bt)``: the in-VMEM transpose makes the HBM layout
    ``(H, D, T)`` whose minor dim is T — so the flash kernels can DMA
    contiguous ``(hb, D, bk)`` tiles straight from HBM at full
    bandwidth (a ``(bk, 64)`` tile of a lane-padded ``(T, 64)`` array
    is 128-byte-strided and measures ~285 GB/s vs ~700 GB/s
    token-minor; tools/profile_attn.py). ``q_minor`` emits q
    token-minor too (the backward kernels stream q/do)."""
    h2 = D // 2
    c = cos_ref[:, :h2]
    s = sin_ref[:, :h2]
    # one (bt, D) -> (D, bt) transpose per head per tensor, with the
    # rotation applied post-transpose on sublane halves: Mosaic's
    # compile time (and the kernel itself) scales with the number of
    # in-VMEM transposes, and the per-half form (2 transposes per
    # tensor) hung the compiler at H=20 x 3 tensors.
    cT = c.T                                     # (h2, bt)
    sT = s.T
    for h in range(H):
        lo, hi = h * D, (h + 1) * D
        qh = q_ref[:, lo:hi].T                   # (D, bt)
        q1, q2 = qh[:h2, :], qh[h2:, :]
        if q_minor:
            qo_ref[h, :h2, :] = q1 * cT - q2 * sT
            qo_ref[h, h2:, :] = q2 * cT + q1 * sT
        else:
            qo_ref[h, :, :h2] = (q_ref[:, lo:lo + h2] * c
                                 - q_ref[:, lo + h2:hi] * s)
            qo_ref[h, :, h2:] = (q_ref[:, lo + h2:hi] * c
                                 + q_ref[:, lo:lo + h2] * s)
        kh = k_ref[:, lo:hi].T
        k1, k2 = kh[:h2, :], kh[h2:, :]
        ko_ref[h, :h2, :] = k1 * cT - k2 * sT
        ko_ref[h, h2:, :] = k2 * cT + k1 * sT
        vo_ref[h] = v_ref[:, lo:hi].T


def _split_one_kernel_t(x_ref, o_ref, *, H, D):
    for h in range(H):
        o_ref[h] = x_ref[:, h * D:(h + 1) * D].T


def _rot_one_kernel_t(x_ref, cos_ref, sin_ref, o_ref, *, H, D,
                      inverse_rotation):
    """(bt, H·D) -> (H, D, bt) token-minor with RoPE."""
    h2 = D // 2
    c = cos_ref[:, :h2]
    s = sin_ref[:, :h2]
    if inverse_rotation:
        s = -s
    cT = c.T
    sT = s.T
    for h in range(H):
        lo, hi = h * D, (h + 1) * D
        xh = x_ref[:, lo:hi].T                   # (D, bt)
        x1, x2 = xh[:h2, :], xh[h2:, :]
        o_ref[h, :h2, :] = x1 * cT - x2 * sT
        o_ref[h, h2:, :] = x2 * cT + x1 * sT


def _rot_one_call_t(x2, cos, sin, H, interpret, inverse_rotation=False):
    T, HD = x2.shape
    D = HD // H
    bt = _pick_bt(T, HD, x2.dtype.itemsize, buffers=6)
    assert T % bt == 0
    return pl.pallas_call(
        functools.partial(_rot_one_kernel_t, H=H, D=D,
                          inverse_rotation=inverse_rotation),
        grid=(T // bt,),
        in_specs=[pl.BlockSpec((bt, HD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, D, bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, D, T), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(x2, cos, sin)


def _split_call_t(q2, k2, v2, cos, sin, H, interpret, q_minor=False):
    """(T, H·D) q/k/v -> q (H, T, D) (or (H, D, T) with ``q_minor``);
    k/v (H, D, T); RoPE applied to q/k."""
    T, HD = q2.shape
    D = HD // H
    bt = _pick_bt(T, HD, q2.dtype.itemsize, buffers=12)
    assert T % bt == 0, f'T={T} must be a multiple of {bt}'
    row = pl.BlockSpec((bt, HD), lambda i: (i, 0), memory_space=pltpu.VMEM)
    trig = pl.BlockSpec((bt, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_q = pl.BlockSpec((H, bt, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    out_t = pl.BlockSpec((H, D, bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    if q_minor:
        # three lighter kernels: the single combined q-minor kernel
        # (60 in-VMEM transposes per step at H=20) hangs the Mosaic
        # compiler; 20-transpose kernels compile in seconds
        qT = _rot_one_call_t(q2, cos, sin, H, interpret)
        kT = _rot_one_call_t(k2, cos, sin, H, interpret)
        vT = _split_one_call_t(v2, H, interpret)
        return qT, kT, vT
    return pl.pallas_call(
        functools.partial(_split_kernel_t, H=H, D=D, q_minor=False),
        grid=(T // bt,),
        in_specs=[row, row, row, trig, trig],
        out_specs=[out_q, out_t, out_t],
        out_shape=[jax.ShapeDtypeStruct((H, T, D), q2.dtype),
                   jax.ShapeDtypeStruct((H, D, T), k2.dtype),
                   jax.ShapeDtypeStruct((H, D, T), v2.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(q2, k2, v2, cos, sin)


def _split_one_call_t(x2, H, interpret):
    """(T, H·D) -> token-minor (H, D, T), no rotation."""
    T, HD = x2.shape
    D = HD // H
    bt = _pick_bt(T, HD, x2.dtype.itemsize, buffers=4)
    assert T % bt == 0
    return pl.pallas_call(
        functools.partial(_split_one_kernel_t, H=H, D=D),
        grid=(T // bt,),
        in_specs=[pl.BlockSpec((bt, HD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, D, bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, D, T), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(x2)


def _merge_kernel(x_ref, cos_ref, sin_ref, o_ref, *, H, D, rotate,
                  inverse_rotation):
    h2 = D // 2
    if rotate:
        c = cos_ref[:, :h2]
        s = sin_ref[:, :h2]
        if inverse_rotation:
            s = -s
    for h in range(H):
        lo, mid, hi = h * D, h * D + h2, (h + 1) * D
        x1, x2 = x_ref[h, :, :h2], x_ref[h, :, h2:]
        if rotate:
            o_ref[:, lo:mid] = x1 * c - x2 * s
            o_ref[:, mid:hi] = x2 * c + x1 * s
        else:
            o_ref[:, lo:mid] = x1
            o_ref[:, mid:hi] = x2


def _merge_kernel_t(x_ref, cos_ref, sin_ref, o_ref, *, H, D, rotate,
                    inverse_rotation):
    """Token-minor merge: (H, D, bt) -> (bt, H·D), optional
    (counter-)rotation — the inverse of :func:`_split_kernel_t`."""
    h2 = D // 2
    if rotate:
        c = cos_ref[:, :h2]
        s = sin_ref[:, :h2]
        if inverse_rotation:
            s = -s
    for h in range(H):
        lo, mid, hi = h * D, h * D + h2, (h + 1) * D
        xh = x_ref[h].T                          # one transpose/head
        x1, x2 = xh[:, :h2], xh[:, h2:]
        if rotate:
            o_ref[:, lo:mid] = x1 * c - x2 * s
            o_ref[:, mid:hi] = x2 * c + x1 * s
        else:
            o_ref[:, lo:mid] = x1
            o_ref[:, mid:hi] = x2


def _merge_call_t(x, cos, sin, rotate, inverse_rotation, interpret):
    """(H, D, T) token-minor -> (T, H·D)."""
    H, D, T = x.shape
    bt = _pick_bt(T, H * D, x.dtype.itemsize, buffers=6)
    assert T % bt == 0, f'T={T} must be a multiple of {bt}'
    if cos is None:
        cos = jnp.zeros((T, D), x.dtype)
        sin = cos
    return pl.pallas_call(
        functools.partial(_merge_kernel_t, H=H, D=D, rotate=rotate,
                          inverse_rotation=inverse_rotation),
        grid=(T // bt,),
        in_specs=[
            pl.BlockSpec((H, D, bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, H * D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H * D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(x, cos, sin)


def _pick_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != 'tpu'
    return interpret


def _split_call(q2, k2, v2, cos, sin, H, inverse_rotation, interpret):
    T, HD = q2.shape
    D = HD // H
    bt = _pick_bt(T, HD, q2.dtype.itemsize, buffers=12)
    assert T % bt == 0, f'T={T} must be a multiple of {bt}'
    row = pl.BlockSpec((bt, HD), lambda i: (i, 0), memory_space=pltpu.VMEM)
    trig = pl.BlockSpec((bt, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((H, bt, D), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_split_kernel, H=H, D=D,
                          inverse_rotation=inverse_rotation),
        grid=(T // bt,),
        in_specs=[row, row, row, trig, trig],
        out_specs=[out, out, out],
        out_shape=[jax.ShapeDtypeStruct((H, T, D), q2.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(q2, k2, v2, cos, sin)


def _merge_call(x, cos, sin, rotate, inverse_rotation, interpret):
    H, T, D = x.shape
    bt = _pick_bt(T, H * D, x.dtype.itemsize, buffers=6)
    assert T % bt == 0, f'T={T} must be a multiple of {bt}'
    if cos is None:
        cos = jnp.zeros((T, D), x.dtype)
        sin = cos
    return pl.pallas_call(
        functools.partial(_merge_kernel, H=H, D=D, rotate=rotate,
                          inverse_rotation=inverse_rotation),
        grid=(T // bt,),
        in_specs=[
            pl.BlockSpec((H, bt, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, H * D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H * D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(x, cos, sin)


# ---------------------------------------------------------------------------
# split_heads_rotary: (T, H·D) q/k/v + (T, D) cos/sin -> 3 × (H, T, D)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def split_heads_rotary(q2, k2, v2, cos, sin, num_heads: int,
                       interpret: bool | None = None):
    """Split ``(T, H·D)`` projections into ``(H, T, D)`` head-major
    layout, applying RoPE to q and k in the same pass. ``cos``/``sin``
    are per-token ``(T, D)`` tables (halves repeated, as produced by
    :func:`esme_tpu.ops.rotary.rotary_cos_sin`)."""
    out, _ = _split_fwd(q2, k2, v2, cos, sin, num_heads, interpret)
    return out


def _split_fwd(q2, k2, v2, cos, sin, num_heads, interpret):
    cos = jax.lax.stop_gradient(cos)
    sin = jax.lax.stop_gradient(sin)
    out = _split_call(q2, k2, v2, cos, sin, num_heads, False,
                      _pick_interpret(interpret))
    return tuple(out), (cos, sin)


def _split_bwd(num_heads, interpret, res, grads):
    cos, sin = res
    dq, dk, dv = grads
    interpret = _pick_interpret(interpret)
    # R is orthogonal: dx = R^T dy = rotation by -theta
    dq2 = _merge_call(dq, cos, sin, True, True, interpret)
    dk2 = _merge_call(dk, cos, sin, True, True, interpret)
    dv2 = _merge_call(dv, None, None, False, False, interpret)
    return dq2, dk2, dv2, None, None


split_heads_rotary.defvjp(_split_fwd, _split_bwd)


# ---------------------------------------------------------------------------
# merge_heads: (H, T, D) -> (T, H·D)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def merge_heads(x, interpret: bool | None = None):
    """Inverse relayout of :func:`split_heads_rotary` (no rotation)."""
    return _merge_call(x, None, None, False, False,
                       _pick_interpret(interpret))


def _merge_fwd(x, interpret):
    return merge_heads(x, interpret), x.shape[0]


def _merge_bwd(interpret, H, dy):
    interpret = _pick_interpret(interpret)
    T, HD = dy.shape
    D = HD // H
    bt = _pick_bt(T, HD, dy.dtype.itemsize, buffers=6)
    assert T % bt == 0
    dx = pl.pallas_call(
        functools.partial(_split_one_kernel, H=H, D=D),
        grid=(T // bt,),
        in_specs=[pl.BlockSpec((bt, HD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, bt, D), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, T, D), dy.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(dy)
    return (dx,)


merge_heads.defvjp(_merge_fwd, _merge_bwd)
