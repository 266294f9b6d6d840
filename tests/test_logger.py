"""Structured-logging tests (aux subsystem: metrics/logging —
reference analogue: Lightning self.log + W&B, esme/trainer.py:34,41)."""

import numpy as np

from esme_tpu import MetricLogger, read_log


def test_metric_logger_jsonl_roundtrip(tmp_path):
    path = str(tmp_path / 'run.jsonl')
    with MetricLogger(path, run='test-run') as logger:
        logger.log({'loss': 3.5}, step=1)
        logger.log({'loss': 2.5, 'lr': 1e-4}, step=2)
        logger.track_best({'loss': 3.5})
        logger.track_best({'loss': 2.5})
        assert logger.best('loss', 'min') == 2.5
        assert logger.summary['loss'] == 2.5
    recs = read_log(path)
    assert len(recs) == 2
    assert recs[0]['run'] == 'test-run'
    assert recs[0]['step'] == 1 and recs[0]['loss'] == 3.5
    assert recs[1]['lr'] == 1e-4
    assert all('t' in r for r in recs)


def test_trainer_fit_logs(tmp_path, fasta_path):
    from esme_tpu import ESM2, MaskedFastaTokenDataset
    from esme_tpu.models.config import esm2_config
    from esme_tpu.train import MaskedPLM

    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    model = ESM2(config=cfg, rng=0)
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    batches = [ds[0]]
    path = str(tmp_path / 'fit.jsonl')
    with MetricLogger(path) as logger:
        trainer = MaskedPLM(model, learning_rate=1e-3)
        trainer.fit(batches, epochs=2, val_dataset=batches, log_every=1,
                    logger=logger)
        assert logger.best('val_loss', 'min') is not None
    recs = read_log(path)
    train_recs = [r for r in recs if 'train_loss' in r]
    val_recs = [r for r in recs if 'val_loss' in r]
    assert len(train_recs) == 2 and len(val_recs) == 2
    assert all(np.isfinite(r['train_loss']) for r in train_recs)


def test_regression_fit_logs(tmp_path):
    import jax.numpy as jnp
    from esme_tpu import ESM2
    from esme_tpu.data import LabeledDataset
    from esme_tpu.models.config import esm2_config
    from esme_tpu.models.heads import init_learned_aggregation
    from esme_tpu.train import RegressionTrainer

    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    model = ESM2(config=cfg, rng=0)
    rng = np.random.default_rng(0)
    seqs = ['M' * int(n) for n in rng.integers(5, 30, 12)]
    labels = [len(s) / 30.0 for s in seqs]
    ds = LabeledDataset(seqs, labels, token_per_batch=256, shuffle=False)
    head = init_learned_aggregation(0, 64, num_cls=1, attention_heads=4,
                                    dtype=jnp.float32)
    trainer = RegressionTrainer(model, head, head_lr=5e-3, lr=1e-4)
    path = str(tmp_path / 'reg.jsonl')
    with MetricLogger(path) as logger:
        hist = trainer.fit(ds, epochs=2, val_dataset=ds, logger=logger)
    assert len(hist) == 2
    recs = read_log(path)
    assert len(recs) == 2
    assert 'val_spearman' in recs[0] and 'val_mse' in recs[0]
