"""Positional-extension tests (reference:
workflow/positional_emb/train_positional.py:42-56)."""

import numpy as np
import pytest
from dataclasses import replace

from esme_tpu import ESM1b, MaskedFastaTokenDataset, tokenize_unpad
from esme_tpu.extend import extend_positions, positions_only_mask
from esme_tpu.models.config import esm1b_config
from esme_tpu.train import MaskedPLM


def tiny_1b():
    cfg = replace(esm1b_config(dtype='float32'), num_layers=2,
                  embed_dim=64, attention_heads=4, learned_positions=64)
    return ESM1b(config=cfg, rng=0)


def test_extend_preserves_short_seq_outputs():
    m = tiny_1b()
    tok, _, cu, ml = tokenize_unpad(['MAGVLKE', 'LKE'], alphabet=m.alphabet)
    before = np.asarray(m.forward(tok, pad_args=(cu, ml)))
    extend_positions(m, 128)
    assert m.params['embed_positions'].shape[0] == 130
    assert m.config.learned_positions == 128
    after = np.asarray(m.forward(tok, pad_args=(cu, ml)))
    np.testing.assert_allclose(after, before, atol=1e-6)


def test_extend_rejects_shrink():
    m = tiny_1b()
    with pytest.raises(ValueError):
        extend_positions(m, 32)


def test_positions_only_training(fasta_path):
    m = tiny_1b()
    extend_positions(m, 512)
    mask = positions_only_mask(m.params)
    assert mask['embed_positions'] is True
    assert mask['embed_tokens'] is False

    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    batch = ds[0]
    before_embed = np.asarray(m.params['embed_tokens']).copy()
    before_pos = np.asarray(m.params['embed_positions']).copy()
    trainer = MaskedPLM(m, learning_rate=1e-2, trainable_mask=mask)
    for _ in range(2):
        trainer.training_step(batch)
    after = trainer.state.params
    np.testing.assert_array_equal(np.asarray(after['embed_tokens']),
                                  before_embed)
    assert np.abs(np.asarray(after['embed_positions'])
                  - before_pos).max() > 0
