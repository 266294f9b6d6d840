"""Context (sequence) parallelism tests: the token axis shards over a
mesh axis and attention gathers k/v. No reference analogue (the
reference has no SP/CP, SURVEY.md §2.4); the contract is exact
agreement with the single-device forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from esme_tpu import ESM2, tokenize_unpad
from esme_tpu.models.config import esm2_config
from esme_tpu.models.esm import forward_flat, packed_meta
from esme_tpu.ops.attention import attention_rect, attention_reference
from esme_tpu.parallel.context import (context_parallel_log_prob,
                                       forward_flat_cp)

SEQS = ['MAGVLKEPVTQ' * 4, 'LKEMPVAP' * 3, 'MKT' * 10, 'WWCHM' * 7]


def seq_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ('seq',))


def tiny():
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    return ESM2(config=cfg, rng=0)


def test_attention_rect_matches_reference(rng):
    T, H, D = 96, 4, 16
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    seg = jnp.asarray(np.repeat([0, 1, 2], 32), jnp.int32)
    ref = attention_reference(q, k, v, seg)
    # square case through the rectangular path, small k blocks
    out = attention_rect(q, k, v, seg, seg, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # rectangular: second half of queries only
    out_half = attention_rect(q[48:], k, v, seg[48:], seg, block_k=32)
    np.testing.assert_allclose(np.asarray(out_half), np.asarray(ref)[48:],
                               rtol=2e-5, atol=2e-5)


def test_forward_flat_cp_matches_single_device():
    model = tiny()
    tokens, _, cu, ml = tokenize_unpad(SEQS, alphabet=model.alphabet)
    n = 8
    pad = (-len(tokens)) % n
    tokens = np.pad(tokens, (0, pad),
                    constant_values=model.alphabet.padding_idx)
    tokens = jnp.asarray(tokens, jnp.int32)
    cu = jnp.asarray(cu, jnp.int32)
    seg_ids, pos_ids = packed_meta(cu, tokens.shape[0])

    ref = forward_flat(model.params, model.config, tokens, seg_ids,
                       pos_ids, attn_impl='reference')
    out = forward_flat_cp(model.params, model.config, tokens, seg_ids,
                          pos_ids, mesh=seq_mesh(n))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_context_parallel_log_prob_api():
    model = tiny()
    tokens, _, cu, ml = tokenize_unpad(SEQS, alphabet=model.alphabet)
    ref = np.asarray(model.predict_log_prob(tokens, pad_args=(cu, ml)))
    out = np.asarray(context_parallel_log_prob(
        model, tokens, (cu, ml), seq_mesh(8)))[:len(tokens)]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_cp_forward_is_differentiable():
    """The all-gather transposes to reduce-scatter: grads flow."""
    model = tiny()
    tokens, _, cu, ml = tokenize_unpad(SEQS, alphabet=model.alphabet)
    n = 8
    pad = (-len(tokens)) % n
    tokens = jnp.asarray(
        np.pad(tokens, (0, pad),
               constant_values=model.alphabet.padding_idx), jnp.int32)
    seg_ids, pos_ids = packed_meta(jnp.asarray(cu, jnp.int32),
                                   tokens.shape[0])
    mesh = seq_mesh(n)

    def loss(params):
        out = forward_flat_cp(params, model.config, tokens, seg_ids,
                              pos_ids, mesh=mesh, with_head=True)
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(model.params)
    gmax = max(float(jnp.abs(l).max())
               for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gmax) and gmax > 0


def test_flash_rect_matches_reference(rng):
    from esme_tpu.ops.flash import flash_rect_attention
    T, H, D = 512, 4, 16
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    seg = jnp.asarray(np.repeat(np.arange(4), 128), jnp.int32)
    ref = attention_reference(q, k, v, seg)
    # square through the rect kernel (interpret mode on CPU)
    out = flash_rect_attention(q, k, v, seg, seg, block_q=128,
                               block_k=128, max_seqlen=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # rectangular: local quarter of queries over global k/v
    out_q = flash_rect_attention(q[128:256], k, v, seg[128:256], seg,
                                 block_q=128, block_k=128,
                                 max_seqlen=128)
    np.testing.assert_allclose(np.asarray(out_q),
                               np.asarray(ref)[128:256],
                               rtol=2e-5, atol=2e-5)


def test_flash_rect_grads_match_reference(rng):
    from esme_tpu.ops.flash import flash_rect_attention
    T, H, D = 256, 2, 16
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    seg = jnp.asarray(np.repeat(np.arange(2), 128), jnp.int32)

    def loss_flash(q, k, v):
        return flash_rect_attention(q, k, v, seg, seg, block_q=128,
                                    block_k=128,
                                    max_seqlen=128).sum()

    def loss_ref(q, k, v):
        return attention_reference(q, k, v, seg).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_cp_training_step_matches_single_device(fasta_path):
    """VERDICT r2 item 7: a long packed batch TRAINS across chips with
    the token axis sharded (data=2 x fsdp=2 x seq=2)."""
    from jax.sharding import Mesh
    from esme_tpu import MaskedFastaTokenDataset
    from esme_tpu.train import MaskedPLM
    from esme_tpu.train.distributed import ShardedMaskedPLM

    cfg = esm2_config(num_layers=2, embed_dim=128, attention_heads=4,
                      dtype='float32')
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    batches = [ds[i % len(ds)] for i in range(2)]

    single = MaskedPLM(ESM2(config=cfg, rng=0), learning_rate=1e-3)
    losses = [single.validation_step(b) for b in batches]
    counts = [b.mask.sum() for b in batches]
    want = float(np.average(losses, weights=counts))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ('data', 'fsdp', 'seq'))
    trainer = ShardedMaskedPLM(ESM2(config=cfg, rng=0), mesh,
                               learning_rate=1e-3, seq_axis='seq')
    got = trainer.training_step(batches)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # and a second step runs (optimizer update applied)
    got2 = trainer.training_step(batches)
    assert np.isfinite(got2) and got2 != got
