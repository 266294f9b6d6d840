"""Fused head-split/rotary/merge kernels vs the plain jnp ops.

The fused path must be numerically identical to reshape+swapaxes+
apply_rotary (reference rotary semantics: esme/rotary.py:22-43), and
its custom VJPs must match JAX autodiff of that reference composition.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esme_tpu.ops.headsplit import merge_heads, split_heads_rotary
from esme_tpu.ops.rotary import apply_rotary, rotary_cos_sin


def _inputs(T=512, H=4, D=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q2 = jnp.asarray(rng.standard_normal((T, H * D)), dtype)
    k2 = jnp.asarray(rng.standard_normal((T, H * D)), dtype)
    v2 = jnp.asarray(rng.standard_normal((T, H * D)), dtype)
    pos = jnp.asarray(rng.integers(0, 900, T), jnp.int32)
    cos, sin = rotary_cos_sin(pos, D, dtype=dtype)
    return q2, k2, v2, cos, sin


def _reference_split(q2, k2, v2, cos, sin, H):
    T = q2.shape[0]
    D = q2.shape[1] // H
    q = jnp.swapaxes(apply_rotary(q2.reshape(T, H, D), cos, sin), 0, 1)
    k = jnp.swapaxes(apply_rotary(k2.reshape(T, H, D), cos, sin), 0, 1)
    v = jnp.swapaxes(v2.reshape(T, H, D), 0, 1)
    return q, k, v


def test_split_heads_rotary_matches_reference():
    q2, k2, v2, cos, sin = _inputs()
    q, k, v = split_heads_rotary(q2, k2, v2, cos, sin, 4)
    qr, kr, vr = _reference_split(q2, k2, v2, cos, sin, 4)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(k), np.asarray(kr), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vr))


def test_merge_heads_inverts_split():
    q2, k2, v2, cos, sin = _inputs()
    _, _, v = split_heads_rotary(q2, k2, v2, cos, sin, 4)
    np.testing.assert_array_equal(np.asarray(merge_heads(v)),
                                  np.asarray(v2))


def test_split_rotary_grads_match_autodiff():
    q2, k2, v2, cos, sin = _inputs(T=256, H=2)

    def fused(q2, k2, v2):
        q, k, v = split_heads_rotary(q2, k2, v2, cos, sin, 2)
        return jnp.sum(q ** 2 + 2.0 * k ** 2 + 3.0 * v ** 2)

    def ref(q2, k2, v2):
        q, k, v = _reference_split(q2, k2, v2, cos, sin, 2)
        return jnp.sum(q ** 2 + 2.0 * k ** 2 + 3.0 * v ** 2)

    gf = jax.grad(fused, argnums=(0, 1, 2))(q2, k2, v2)
    gr = jax.grad(ref, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_merge_grads_match_autodiff():
    q2, k2, v2, cos, sin = _inputs(T=256, H=2)
    _, _, v = split_heads_rotary(q2, k2, v2, cos, sin, 2)

    g = jax.grad(lambda x: jnp.sum(merge_heads(x) ** 3))(v)
    gr = jax.grad(lambda x: jnp.sum(
        jnp.swapaxes(x, 0, 1).reshape(256, -1) ** 3))(v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('dim', [16, 128])
def test_split_heads_other_head_dims(dim):
    q2, k2, v2, cos, sin = _inputs(T=256, H=2, D=dim)
    q, k, v = split_heads_rotary(q2, k2, v2, cos, sin, 2)
    qr, kr, vr = _reference_split(q2, k2, v2, cos, sin, 2)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(k), np.asarray(kr), atol=1e-6)
