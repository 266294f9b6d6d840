"""Training-loop tests: loss decreases, LoRA-only updates, regression
fine-tune (reference strategy: MaskedPLM/RegressionTrainer usage in
workflow/train + workflow/meltome)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esme_tpu import ESM2, MaskedFastaTokenDataset
from esme_tpu.data import LabeledDataset
from esme_tpu.models.config import esm2_config
from esme_tpu.models.heads import init_learned_aggregation
from esme_tpu.train import ClassificationTrainer, MaskedPLM, RegressionTrainer


def tiny(checkpointing=False):
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    return ESM2(config=cfg, rng=0, checkpointing=checkpointing)


def test_masked_plm_loss_decreases(fasta_path):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    trainer = MaskedPLM(tiny(), learning_rate=1e-3)
    batch = ds[0]
    first = trainer.training_step(batch)
    for _ in range(10):
        last = trainer.training_step(batch)
    assert last < first


def test_masked_plm_checkpointing_matches(fasta_path):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    batch = ds[0]
    t1 = MaskedPLM(tiny(False), learning_rate=1e-3)
    t2 = MaskedPLM(tiny(True), learning_rate=1e-3)
    l1 = t1.training_step(batch)
    l2 = t2.training_step(batch)
    np.testing.assert_allclose(l1, l2, rtol=1e-4)


def test_masked_plm_lora_only_updates(fasta_path):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    model = tiny()
    model.add_lora(rank=4, alpha=8)
    before_embed = np.asarray(model.params['embed_tokens']).copy()
    before_kernel = np.asarray(
        model.params['layers']['attn']['q']['kernel']).copy()
    trainer = MaskedPLM(model, learning_rate=1e-2)
    for _ in range(3):
        trainer.training_step(ds[0])
    after = trainer.state.params
    np.testing.assert_array_equal(np.asarray(after['embed_tokens']),
                                  before_embed)
    np.testing.assert_array_equal(
        np.asarray(after['layers']['attn']['q']['kernel']), before_kernel)
    # but the adapters moved
    b = np.asarray(after['layers']['attn']['q']['lora']['default']['b'])
    assert np.abs(b).max() > 0


def test_masked_plm_grad_accum(fasta_path):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    model = tiny()
    before = np.asarray(model.params['embed_tokens']).copy()
    trainer = MaskedPLM(model, learning_rate=1e-3, grad_accum=2)
    trainer.training_step(ds[0])
    # after 1 microstep, params unchanged (accumulating)
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params['embed_tokens']), before)
    trainer.training_step(ds[0])
    assert np.abs(np.asarray(trainer.state.params['embed_tokens'])
                  - before).max() > 0


def test_regression_trainer_learns():
    rng = np.random.default_rng(0)
    # target = sequence length (easily learnable from pooling)
    seqs = ['M' * int(n) for n in rng.integers(5, 40, 24)]
    labels = [len(s) / 40.0 for s in seqs]
    ds = LabeledDataset(seqs, labels, token_per_batch=512, shuffle=False)

    model = tiny()
    head = init_learned_aggregation(0, embed_dim=64, num_cls=1,
                                    attention_heads=4, dtype=jnp.float32)
    trainer = RegressionTrainer(model, head, head_lr=5e-3, lr=1e-4)
    losses = []
    for _ in range(15):
        for batch in ds:
            losses.append(trainer.training_step(batch))
    assert losses[-1] < losses[0]
    metrics = trainer.validation_metrics(ds)
    assert 'val_spearman' in metrics
    assert metrics['val_spearman'] > 0.5


def test_classification_trainer_learns():
    """BCE fine-tune separates a synthetic binary task (VERDICT next-9;
    reference task: workflow/tf/finetune.py)."""
    rng = np.random.default_rng(1)
    # positives are long sequences: linearly separable from pooling
    seqs, labels = [], []
    for _ in range(12):
        seqs.append('M' * int(rng.integers(25, 40)))
        labels.append(1.0)
        seqs.append('M' * int(rng.integers(5, 15)))
        labels.append(0.0)
    ds = LabeledDataset(seqs, labels, token_per_batch=512, shuffle=False)

    model = tiny()
    head = init_learned_aggregation(0, embed_dim=64, num_cls=1,
                                    attention_heads=4, dtype=jnp.float32)
    trainer = ClassificationTrainer(model, head, head_lr=5e-3, lr=1e-4)
    losses = []
    for _ in range(15):
        for batch in ds:
            losses.append(trainer.training_step(batch))
    assert losses[-1] < losses[0]
    metrics = trainer.validation_metrics(ds)
    assert metrics['val_auroc'] > 0.9
    assert metrics['val_auprc'] > 0.9


def test_balance_binary():
    from esme_tpu.data import balance_binary
    seqs = ['A'] * 3 + ['B'] * 9
    labels = [1.0] * 3 + [0.0] * 9
    s, y = balance_binary(seqs, labels, 'upsample')
    assert sum(y) == 9 and len(y) == 18   # 3 positives * (9//3)
    s, y = balance_binary(seqs, labels, 'downsample',
                          rng=np.random.default_rng(0))
    assert sum(y) == 3 and len(y) == 6
    s, y = balance_binary(seqs, labels, None)
    assert (s, y) == (seqs, labels)


def test_metrics_against_known_values():
    """AUROC/AUPRC/Spearman sanity against hand-computed values."""
    from esme_tpu.metrics import auprc, auroc, spearman
    y = [0, 0, 1, 1]
    s = [0.1, 0.4, 0.35, 0.8]
    # sklearn roc_auc_score(y, s) == 0.75, average_precision == 0.8333...
    assert abs(auroc(y, s) - 0.75) < 1e-9
    assert abs(auprc(y, s) - (1.0 + 2 / 3) / 2) < 1e-9
    assert abs(spearman([1, 2, 3, 4], [1, 2, 3, 4]) - 1.0) < 1e-12
    assert abs(spearman([1, 2, 3, 4], [4, 3, 2, 1]) + 1.0) < 1e-12
    # ties are rank-averaged like scipy
    assert abs(spearman([1, 1, 2], [1, 2, 3])
               - 0.8660254037844387) < 1e-9


def test_offload_optimizer_parity(fasta_path):
    """Host-offloaded optimizer (DeepSpeed CPU-offload equivalent,
    reference: esme/deepspeed.py:18-21) matches the on-device path
    exactly for an fp32 model."""
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    batch = ds[0]
    t_dev = MaskedPLM(tiny(), learning_rate=1e-3)
    t_off = MaskedPLM(tiny(), learning_rate=1e-3, offload_optimizer=True)
    # optimizer state lives on the host CPU device
    leaf = jax.tree_util.tree_leaves(t_off.state.opt_state)[0]
    assert all(d.platform == 'cpu' for d in leaf.devices())
    for _ in range(3):
        l_dev = t_dev.training_step(batch)
        l_off = t_off.training_step(batch)
        np.testing.assert_allclose(l_dev, l_off, rtol=1e-5)
    a = jax.tree_util.tree_leaves(t_dev.state.params)
    b = jax.tree_util.tree_leaves(t_off.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_offload_optimizer_lora(fasta_path):
    """Offload composes with LoRA-only training: trunk frozen, adapter
    master copies on host."""
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    model = tiny()
    model.add_lora(rank=4, alpha=8)
    before = np.asarray(model.params['embed_tokens']).copy()
    tr = MaskedPLM(model, learning_rate=1e-2, offload_optimizer=True)
    for _ in range(3):
        loss = tr.training_step(ds[0])
    assert np.isfinite(loss)
    np.testing.assert_array_equal(
        np.asarray(tr.state.params['embed_tokens']), before)
    b = np.asarray(
        tr.state.params['layers']['attn']['q']['lora']['default']['b'])
    assert np.abs(b).max() > 0


def test_regression_trainer_with_lora():
    """Regression trainer over a LoRA-equipped trunk: frozen trunk
    leaves get zero updates, adapters and head move (this combination
    hit a nested-multi_transform label mismatch before)."""
    model = tiny()
    model.add_lora(rank=4, alpha=8)
    before_kernel = np.asarray(
        model.params['layers']['attn']['q']['kernel']).copy()
    head = init_learned_aggregation(0, embed_dim=64, num_cls=1,
                                    attention_heads=4, dtype=jnp.float32)
    seqs = ['M' * n for n in (8, 16, 24, 32)]
    ds = LabeledDataset(seqs, [0.2, 0.4, 0.6, 0.8], token_per_batch=256,
                        shuffle=False)
    trainer = RegressionTrainer(model, head, head_lr=5e-3, lr=1e-3)
    for _ in range(3):
        for b in ds:
            loss = trainer.training_step(b)
    assert np.isfinite(loss)
    after = trainer.state.params['plm']
    np.testing.assert_array_equal(
        np.asarray(after['layers']['attn']['q']['kernel']), before_kernel)
    b_ad = np.asarray(after['layers']['attn']['q']['lora']['default']['b'])
    assert np.abs(b_ad).max() > 0
