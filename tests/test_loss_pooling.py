"""Loss + pooling + head tests (reference strategy: tests/test_loss.py,
tests/test_pooling.py, tests/test_head.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from esme_tpu.loss import bce_with_logits, cross_entropy, mse_loss, nll_loss
from esme_tpu.models.heads import (apply_cls_head, apply_learned_aggregation,
                                   init_cls_head, init_learned_aggregation)
from esme_tpu.ops.pooling import attention_pool, partition_mean_pool
from esme_tpu.ops.segment import segment_ids_from_cu_lens


def test_cross_entropy_masked_only():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((6, 5)),
                         jnp.float32)
    targets = jnp.asarray([0, 1, 2, 3, 4, 0])
    mask = jnp.asarray([True, True, False, False, False, False])
    got = float(cross_entropy(logits, targets, mask))
    lp = np.asarray(jax.nn.log_softmax(logits, -1))
    want = -(lp[0, 0] + lp[1, 1]) / 2
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # changing unmasked logits does not change the loss
    logits2 = logits.at[3].add(10.0)
    assert np.isclose(float(cross_entropy(logits2, targets, mask)), got)


def test_nll_matches_cross_entropy():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((8, 33)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 33, 8))
    mask = jnp.asarray(rng.random(8) < 0.5)
    lp = jax.nn.log_softmax(logits, -1)
    np.testing.assert_allclose(float(nll_loss(lp, targets, mask)),
                               float(cross_entropy(logits, targets, mask)),
                               rtol=1e-6)


def test_mse_weighted():
    pred = jnp.asarray([1.0, 2.0, 100.0])
    tgt = jnp.asarray([1.5, 2.5, 0.0])
    w = jnp.asarray([1.0, 1.0, 0.0])
    np.testing.assert_allclose(float(mse_loss(pred, tgt, w)), 0.25)


def test_bce_matches_manual():
    z = jnp.asarray([0.0, 2.0, -3.0])
    t = jnp.asarray([0.0, 1.0, 0.0])
    got = float(bce_with_logits(z, t))
    p = 1 / (1 + np.exp(-np.asarray(z)))
    want = -np.mean(np.asarray(t) * np.log(p)
                    + (1 - np.asarray(t)) * np.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_partition_mean_pool_exact():
    # the reference docstring example (reference: esme/pooling.py:44-69)
    embed = jnp.arange(1, 22, dtype=jnp.float32).reshape(7, 3)
    cu = jnp.asarray([0, 3, 5, 7], jnp.int32)
    seg = segment_ids_from_cu_lens(cu, 7)
    out = partition_mean_pool(embed, seg, 3)
    np.testing.assert_allclose(np.asarray(out), [
        [4, 5, 6], [11.5, 12.5, 13.5], [17.5, 18.5, 19.5]])


def test_partition_mean_pool_ignores_tail():
    x = jnp.ones((10, 4), jnp.float32)
    seg = jnp.asarray([0] * 6 + [5] * 4)    # tail segment id beyond S
    out = partition_mean_pool(x, seg, 2)
    np.testing.assert_allclose(np.asarray(out)[0], 1.0)
    np.testing.assert_allclose(np.asarray(out)[1], 0.0)  # empty seg


def test_attention_pool_single_segment_is_weighted_mean():
    rng = np.random.default_rng(0)
    D, H = 32, 4
    x = jnp.asarray(rng.standard_normal((12, D)), jnp.float32)
    seg = jnp.zeros(12, jnp.int32)
    cls = jnp.asarray(rng.standard_normal((1, D)), jnp.float32)
    k_params = {'kernel': jnp.asarray(rng.standard_normal((D, D)),
                                      jnp.float32) * 0.1}
    out = attention_pool(cls, x, k_params, seg, 1, H)
    assert out.shape == (1, 1, D)
    # output of each head lies in the convex hull of values: bounded
    assert np.abs(np.asarray(out)).max() <= np.abs(np.asarray(x)).max() + 1e-5


def test_attention_pool_segment_independence():
    rng = np.random.default_rng(1)
    D, H = 32, 4
    x = jnp.asarray(rng.standard_normal((20, D)), jnp.float32)
    seg = jnp.asarray([0] * 10 + [1] * 10)
    cls = jnp.asarray(rng.standard_normal((2, D)), jnp.float32)
    k_params = {'kernel': jnp.asarray(rng.standard_normal((D, D)),
                                      jnp.float32) * 0.1}
    out1 = attention_pool(cls, x, k_params, seg, 2, H)
    x2 = x.at[10:].add(5.0)
    out2 = attention_pool(cls, x2, k_params, seg, 2, H)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               atol=1e-5)
    assert np.abs(np.asarray(out1[1]) - np.asarray(out2[1])).max() > 0.1


def test_cls_head_shapes():
    params = init_cls_head(0, embed_dim=32, hidden_dim=64,
                           dtype=jnp.float32)
    x = jnp.ones((10, 32), jnp.float32)
    seg = jnp.asarray([0] * 4 + [1] * 6)
    out = apply_cls_head(params, x, seg, 2)
    assert out.shape == (2,)


def test_learned_aggregation_shapes():
    params = init_learned_aggregation(0, embed_dim=32, num_cls=1,
                                      attention_heads=4, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((10, 32)),
                    jnp.float32)
    seg = jnp.asarray([0] * 4 + [1] * 6)
    out = apply_learned_aggregation(params, x, seg, 2, 4)
    assert out.shape == (2,)
    assert np.isfinite(np.asarray(out)).all()
