"""8-bit blockwise Adam (esme_tpu.train.optim.adam8bit) — the
TPU-native equivalent of the bitsandbytes 8-bit optimizers the
reference's ecosystem uses for optimizer memory (reference solves the
same problem with DeepSpeed CPU offload, esme/deepspeed.py:18-21)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from esme_tpu.train.optim import (Adam8BitState, _deq, _q, adam8bit)


def test_quantize_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((37, 53)), jnp.float32) * 0.01
    bound = float(jnp.abs(x).max())
    q = _q(x, bound)
    assert q.q.dtype == jnp.float8_e5m2
    xd = _deq(q)
    # e5m2 codes: bounded RELATIVE error per coordinate (~12.5%)
    nz = np.abs(np.asarray(x)) > 1e-6 * bound
    rel = float(np.max(np.abs(np.asarray(xd - x))[nz]
                       / np.abs(np.asarray(x))[nz]))
    assert rel < 0.13, rel
    # squared values (the nu regime) survive via the sqrt storage:
    # sqrt halves the exponent range the code must span
    x2 = x * x
    qs = _q(jnp.sqrt(x2), bound)
    x2d = _deq(qs) ** 2
    rel2 = float(np.max(np.abs(np.asarray(x2d - x2))[nz]
                        / np.asarray(x2)[nz]))
    assert rel2 < 0.3, rel2


def test_single_step_matches_optax_adam():
    """First steps agree with optax.adam to int8-rounding tolerance."""
    rng = np.random.default_rng(1)
    params = {'w': jnp.asarray(rng.standard_normal((64, 300)),
                               jnp.float32)}
    tx8, tx = adam8bit(1e-2), optax.adam(1e-2)
    s8, s = tx8.init(params), tx.init(params)
    g = jax.tree.map(lambda x: jnp.asarray(
        rng.standard_normal(x.shape) * 0.1, jnp.float32), params)
    for _ in range(3):
        u8, s8 = tx8.update(g, s8, params)
        u, s = tx.update(g, s, params)
        rel = float(jnp.abs(u8['w'] - u['w']).max()
                    / jnp.abs(u['w']).max())
        # f8 state: update error bounded by the mu relative
        # precision (~12.5%) plus nu's through the sqrt
        assert rel < 0.3, rel


def test_converges_on_quadratic():
    """Both optimizers drive a quadratic to its minimum."""
    target = jnp.asarray(np.random.default_rng(2)
                         .standard_normal((128,)), jnp.float32)

    def loss(p):
        return jnp.sum((p - target) ** 2)

    p = jnp.zeros((128,), jnp.float32)
    tx = adam8bit(0.1)
    s = tx.init(p)
    step = jax.jit(lambda p, s: (lambda g: tx.update(g, s, p))(
        jax.grad(loss)(p)))
    for _ in range(200):
        u, s = step(p, s)
        p = optax.apply_updates(p, u)
    assert float(loss(p)) < 1e-3


def test_state_is_f8_and_small():
    params = {'w': jnp.zeros((1000, 100), jnp.bfloat16)}
    s = adam8bit(1e-3).init(params)
    mu = s.mu['w']
    assert mu.q.dtype == jnp.float8_e5m2
    bytes_state = mu.q.size + mu.scale.size * 4
    assert bytes_state < 1000 * 100 * 1.1  # ~1 byte/param/moment


def test_composes_with_multisteps_and_bf16_params():
    params = (jnp.ones((300,), jnp.bfloat16),)
    tx = optax.MultiSteps(adam8bit(1e-2), 2)
    s = tx.init(params)
    g = (jnp.full((300,), 0.5, jnp.bfloat16),)
    u1, s = tx.update(g, s, params)
    assert float(jnp.abs(u1[0]).max()) == 0.0   # accumulating
    u2, s = tx.update(g, s, params)
    assert float(jnp.abs(u2[0]).max()) > 0.0    # applied
    assert u2[0].dtype == jnp.bfloat16


def test_trains_tiny_model_end_to_end():
    """MaskedPLM with adam8bit reduces loss on a tiny model."""
    from esme_tpu import ESM2
    from esme_tpu.alphabet import Alphabet, mask_tokens
    from esme_tpu.train.trainer import MaskedPLM

    model = ESM2(num_layers=2, embed_dim=64, attention_heads=4, rng=0,
                 dtype='float32')
    rng = np.random.default_rng(0)
    T = 256
    tokens = np.full(T, Alphabet.padding_idx, np.int32)
    cu = np.asarray([0, 120, 250], np.int32)
    tokens[:250] = rng.integers(4, 24, 250)
    masked, mask = mask_tokens(tokens[None], alphabet=Alphabet,
                               rng=np.random.default_rng(1))

    class _B:
        pass
    b = _B()
    b.tokens = tokens
    b.masked_tokens = masked[0]
    b.mask = mask[0]
    b.mask[250:] = False
    b.cu_lens = cu
    b.max_len = 130

    plm = MaskedPLM(model, optimizer=adam8bit(1e-3))
    losses = [plm.training_step(b) for _ in range(8)]
    assert losses[-1] < losses[0]


def test_adam8bit_under_fsdp():
    """adam8bit composes with the sharded trainer (state inherits
    param shardings through jit propagation like any optax state)."""
    from esme_tpu import ESM2
    from esme_tpu.alphabet import Alphabet, mask_tokens
    from esme_tpu.data import PackedBatch
    from esme_tpu.parallel.mesh import make_mesh
    from esme_tpu.train.distributed import ShardedMaskedPLM

    model = ESM2(num_layers=2, embed_dim=64, attention_heads=4, rng=0,
                 dtype='float32')
    mesh = make_mesh(data=2, fsdp=4)
    rng = np.random.default_rng(0)
    batches = []
    for r in range(2):
        T = 512
        toks = np.full(T, Alphabet.padding_idx, np.int32)
        cu = np.asarray([0, 250, 500], np.int32)
        toks[:500] = rng.integers(4, 24, 500)
        masked, mask = mask_tokens(toks[None], alphabet=Alphabet,
                                   rng=np.random.default_rng(r))
        masked, mask = masked[0], mask[0]
        mask[500:] = False
        batches.append(PackedBatch(tokens=toks, cu_lens=cu, max_len=250,
                                   masked_tokens=masked, mask=mask))

    plm = ShardedMaskedPLM(model, mesh, optimizer=adam8bit(1e-3))
    l0 = plm.training_step(batches)
    l1 = plm.training_step(batches)
    assert np.isfinite(l0) and np.isfinite(l1)
    mu_leaf = jax.tree.leaves(plm.state.opt_state.mu)[0]
    assert mu_leaf.dtype == jnp.float8_e5m2


def test_adam8bit_state_checkpoint_roundtrip(tmp_path):
    """float8 optimizer state survives the orbax checkpoint manager
    (resume parity: the restored state continues training
    identically)."""
    from esme_tpu import ESM2
    from esme_tpu.train.checkpoint import CheckpointManager
    from esme_tpu.train.trainer import MaskedPLM, TrainState

    model = ESM2(num_layers=2, embed_dim=64, attention_heads=4, rng=0,
                 dtype='float32')
    plm = MaskedPLM(model, optimizer=adam8bit(1e-3))

    # one step so the state is non-trivial
    from esme_tpu.alphabet import Alphabet, mask_tokens
    rng = np.random.default_rng(0)
    toks = np.full(256, Alphabet.padding_idx, np.int32)
    cu = np.asarray([0, 120, 250], np.int32)
    toks[:250] = rng.integers(4, 24, 250)
    masked, mask = mask_tokens(toks[None], alphabet=Alphabet,
                               rng=np.random.default_rng(1))

    class _B:
        pass
    b = _B()
    b.tokens = toks
    b.masked_tokens = masked[0]
    b.mask = mask[0]
    b.mask[250:] = False
    b.cu_lens = cu
    b.max_len = 130
    plm.training_step(b)

    mgr = CheckpointManager(str(tmp_path / 'ck'))
    mgr.save(1, plm.state)
    restored = mgr.restore(plm.state)
    jax.tree.map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(c)),
        plm.state, restored)
    mu = jax.tree.leaves(restored.opt_state.mu)[0]
    assert mu.dtype == jnp.float8_e5m2
