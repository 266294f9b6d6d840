"""Multi-device tests on the 8-way virtual CPU mesh: FSDP sharding
specs, sharded train step vs single-device parity, dryrun entry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from esme_tpu import ESM2, MaskedFastaTokenDataset
from esme_tpu.models.config import esm2_config
from esme_tpu.parallel import (fsdp_partition_specs, make_mesh,
                               shard_params)
from esme_tpu.train import MaskedPLM
from esme_tpu.train.distributed import ShardedMaskedPLM

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def tiny(checkpointing=False):
    cfg = esm2_config(num_layers=2, embed_dim=128, attention_heads=4,
                      dtype='float32')
    return ESM2(config=cfg, rng=0, checkpointing=checkpointing)


def test_mesh_shapes():
    mesh = make_mesh(data=2)
    assert mesh.shape == {'data': 2, 'fsdp': 4}
    mesh = make_mesh(data=1, fsdp=8)
    assert mesh.shape == {'data': 1, 'fsdp': 8}
    with pytest.raises(AssertionError):
        make_mesh(data=3)


def test_fsdp_specs_shard_large_leaves():
    model = tiny()
    mesh = make_mesh(data=2)
    specs = fsdp_partition_specs(model.params, mesh)
    # big stacked kernels sharded on a dim, biases replicated
    assert 'fsdp' in tuple(specs['layers']['attn']['q']['kernel'])
    assert tuple(specs['layers']['attn']['q']['bias']) == ()
    placed, _ = shard_params(model.params, mesh, specs)
    k = placed['layers']['attn']['q']['kernel']
    # sharded 4-way over fsdp: each shard holds 1/4 of the sharded dim
    shard_shape = k.addressable_shards[0].data.shape
    full = k.shape
    assert np.prod(shard_shape) == np.prod(full) // 4


@pytest.mark.parametrize('data,fsdp', [(1, 8), (2, 4), (8, 1)])
def test_sharded_step_matches_single_device(fasta_path, data, fsdp):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    batches = [ds[i % len(ds)] for i in range(data)]

    # single-device oracle: same global loss = masked mean over the
    # union of the replica batches
    single = MaskedPLM(tiny(), learning_rate=1e-3)
    losses, counts = [], []
    for b in batches:
        losses.append(single.validation_step(b))
        counts.append(b.mask.sum())
    want = float(np.average(losses, weights=counts))

    mesh = make_mesh(data=data, fsdp=fsdp)
    trainer = ShardedMaskedPLM(tiny(), mesh, learning_rate=1e-3)
    got = trainer.training_step(batches)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sharded_step_with_checkpointing(fasta_path):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    mesh = make_mesh(data=2)
    trainer = ShardedMaskedPLM(tiny(checkpointing=True), mesh,
                               learning_rate=1e-3)
    batches = [ds[0], ds[1 % len(ds)]]
    l1 = trainer.training_step(batches)
    l2 = trainer.training_step(batches)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1  # repeated batch -> loss drops


def test_sharded_loss_decreases(fasta_path):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    mesh = make_mesh(data=2)
    trainer = ShardedMaskedPLM(tiny(), mesh, learning_rate=1e-3)
    batches = [ds[0], ds[0]]
    first = trainer.training_step(batches)
    for _ in range(5):
        last = trainer.training_step(batches)
    assert last < first


def test_sharded_lora_training(fasta_path):
    """LoRA under FSDP (VERDICT r1 item 4): only adapter leaves update,
    loss parity with the single-device LoRA trainer."""
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    batches = [ds[0], ds[1 % len(ds)]]

    def lora_model():
        m = tiny()
        m.add_lora(rank=4, alpha=8.0, adapter_names=['a'], rng=3)
        return m

    single = MaskedPLM(lora_model(), learning_rate=1e-3)
    losses, counts = [], []
    for b in batches:
        losses.append(single.validation_step(b))
        counts.append(b.mask.sum())
    want = float(np.average(losses, weights=counts))

    mesh = make_mesh(data=2)
    trainer = ShardedMaskedPLM(lora_model(), mesh, learning_rate=1e-3)
    before = jax.device_get(trainer.state.params)
    got = trainer.training_step(batches)
    np.testing.assert_allclose(got, want, rtol=1e-4)

    after = jax.device_get(trainer.state.params)
    # trunk frozen, adapters moved
    np.testing.assert_array_equal(
        before['layers']['attn']['q']['kernel'],
        after['layers']['attn']['q']['kernel'])
    assert np.abs(after['layers']['attn']['q']['lora']['a']['b']
                  - before['layers']['attn']['q']['lora']['a']['b']).max() > 0

    # several steps reduce the loss through adapters alone
    first = trainer.training_step(batches)
    for _ in range(5):
        last = trainer.training_step(batches)
    assert last < first


def test_sharded_lora_over_quantized(fasta_path):
    """QLoRA under FSDP: int8 base + trainable adapters."""
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    m = tiny().quantize('8bit')
    m.add_lora(rank=4, alpha=8.0, adapter_names=['a'], rng=3)
    mesh = make_mesh(data=2)
    trainer = ShardedMaskedPLM(m, mesh, learning_rate=1e-3)
    batches = [ds[0], ds[0]]
    first = trainer.training_step(batches)
    for _ in range(5):
        last = trainer.training_step(batches)
    assert np.isfinite(first) and last < first
    q = jax.device_get(trainer.state.params)['layers']['attn']['q']
    assert q['qvalue'].dtype == np.int8


def test_sharded_grad_accum(fasta_path):
    """optax.MultiSteps under FSDP: params move only every k-th step."""
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    mesh = make_mesh(data=2)
    trainer = ShardedMaskedPLM(tiny(), mesh, learning_rate=1e-3,
                               grad_accum=2)
    batches = [ds[0], ds[1 % len(ds)]]
    p0 = jax.device_get(trainer.state.params['embed_tokens'])
    trainer.training_step(batches)
    p1 = jax.device_get(trainer.state.params['embed_tokens'])
    np.testing.assert_array_equal(p0, p1)      # accumulating, no update
    trainer.training_step(batches)
    p2 = jax.device_get(trainer.state.params['embed_tokens'])
    assert np.abs(p2 - p1).max() > 0           # applied at step 2


def test_sharded_validation_step(fasta_path):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    mesh = make_mesh(data=2)
    trainer = ShardedMaskedPLM(tiny(), mesh, learning_rate=1e-3)
    batches = [ds[0], ds[1 % len(ds)]]
    v1 = trainer.validation_step(batches)
    p0 = jax.device_get(trainer.state.params['embed_tokens'])
    v2 = trainer.validation_step(batches)
    assert v1 == v2                            # no state change
    np.testing.assert_array_equal(
        p0, jax.device_get(trainer.state.params['embed_tokens']))
    t = trainer.training_step(batches)
    np.testing.assert_allclose(t, v1, rtol=1e-4)


def test_sharded_checkpoint_restore(fasta_path, tmp_path):
    """Orbax save from a sharded trainer restores into a fresh sharded
    trainer with identical shardings and bit-identical params."""
    from esme_tpu.train.checkpoint import CheckpointManager
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    mesh = make_mesh(data=2)
    trainer = ShardedMaskedPLM(tiny(), mesh, learning_rate=1e-3)
    batches = [ds[0], ds[1 % len(ds)]]
    trainer.training_step(batches)
    mgr = CheckpointManager(str(tmp_path / 'ckpt'))
    mgr.save(1, trainer.state, metrics={'val_loss': 1.0})

    fresh = ShardedMaskedPLM(tiny(), mesh, learning_rate=1e-3)
    restored = mgr.restore(fresh.state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(trainer.state.params),
        jax.device_get(restored.params))
    # restored arrays keep the fsdp sharding of the template
    k = restored.params['layers']['attn']['q']['kernel']
    assert len(k.addressable_shards) == 8
    fresh.state = restored
    loss = fresh.training_step(batches)
    assert np.isfinite(loss)


def test_graft_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'graft_entry', '/root/repo/__graft_entry__.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    mod.dryrun_multichip(4)
