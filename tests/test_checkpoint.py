"""Checkpoint/resume round-trip tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esme_tpu import ESM2, MaskedFastaTokenDataset
from esme_tpu.models.config import esm2_config
from esme_tpu.train import MaskedPLM
from esme_tpu.train.checkpoint import CheckpointManager


def tiny():
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    return ESM2(config=cfg, rng=0)


def test_checkpoint_roundtrip(tmp_path, fasta_path):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    batch = ds[0]   # materialize once: __getitem__ re-masks each call
    trainer = MaskedPLM(tiny(), learning_rate=1e-3)
    trainer.training_step(batch)
    trainer.training_step(batch)

    mgr = CheckpointManager(str(tmp_path / 'ckpts'), monitor='val_loss')
    mgr.save(2, trainer.state, {'val_loss': 1.5})
    assert mgr.latest_step() == 2

    # a fresh trainer restores the exact state
    t2 = MaskedPLM(tiny(), learning_rate=1e-3)
    restored = mgr.restore(t2.state)
    np.testing.assert_array_equal(
        np.asarray(restored.params['embed_tokens']),
        np.asarray(trainer.state.params['embed_tokens']))
    assert int(restored.step) == 2

    # resumed training continues deterministically
    t2.state = restored
    l_resumed = t2.training_step(batch)
    l_orig = trainer.training_step(batch)
    np.testing.assert_allclose(l_resumed, l_orig, rtol=1e-5)


def test_checkpoint_best_policy(tmp_path, fasta_path):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    trainer = MaskedPLM(tiny(), learning_rate=1e-3)
    mgr = CheckpointManager(str(tmp_path / 'c2'), max_to_keep=2,
                            monitor='val_loss', mode='min')
    for step, vl in [(1, 3.0), (2, 1.0), (3, 2.0)]:
        trainer.training_step(ds[0])
        mgr.save(step, trainer.state, {'val_loss': vl})
    assert mgr.best_step() == 2
