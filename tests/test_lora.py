"""LoRA tests (reference strategy: tests/test_lora.py — zero-init
identity, save/load round-trip incl. metadata, multi-adapter)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esme_tpu import ESM2, tokenize_unpad
from esme_tpu.lora import (add_lora_params, lora_state_dict, trainable_mask)
from esme_tpu.models.config import esm2_config

SEQS = ['MAGVLKE', 'LKEMPVAP']


def tiny():
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    return ESM2(config=cfg, rng=0)


def test_lora_zero_init_identity():
    m = tiny()
    tok, _, cu, ml = tokenize_unpad(SEQS, alphabet=m.alphabet)
    base = np.asarray(m.forward(tok, pad_args=(cu, ml)))
    m.add_lora(rank=8, alpha=16)
    out = np.asarray(m.forward(tok, pad_args=(cu, ml)))
    np.testing.assert_allclose(out, base, atol=1e-6)


def test_lora_affects_output_after_b_update():
    m = tiny()
    tok, _, cu, ml = tokenize_unpad(SEQS, alphabet=m.alphabet)
    base = np.asarray(m.forward(tok, pad_args=(cu, ml)))
    m.add_lora(rank=8, alpha=16)
    lora = m.params['layers']['attn']['q']['lora']['default']
    lora['b'] = lora['b'] + 0.1
    out = np.asarray(m.forward(tok, pad_args=(cu, ml)))
    assert np.abs(out - base).max() > 1e-3


def test_lora_named_adapters_selectable():
    m = tiny()
    tok, _, cu, ml = tokenize_unpad(SEQS, alphabet=m.alphabet)
    m.add_lora(rank=4, alpha=4, adapter_names=['a', 'b'])
    # perturb only adapter 'b'
    for t in ('q', 'v', 'out'):
        ad = m.params['layers']['attn'][t]['lora']['b']
        ad['b'] = ad['b'] + 0.2
    out_a = np.asarray(m.forward(tok, pad_args=(cu, ml),
                                 lora_names=('a',)))
    out_b = np.asarray(m.forward(tok, pad_args=(cu, ml),
                                 lora_names=('b',)))
    out_none_listed = np.asarray(m.forward(tok, pad_args=(cu, ml)))
    assert np.abs(out_a - out_b).max() > 1e-3
    # default (no names) applies all adapters
    assert np.abs(out_none_listed - out_a).max() > 1e-3


def test_lora_layer_targets():
    m = tiny()
    m.add_lora(rank=4, layers=('query', 'key'))
    attn = m.params['layers']['attn']
    assert 'lora' in attn['q'] and 'lora' in attn['k']
    assert 'lora' not in attn['v'] and 'lora' not in attn['out']
    with pytest.raises(ValueError):
        tiny().add_lora(layers=('bogus',))


def test_lora_state_dict_torch_layout():
    m = tiny()
    m.add_lora(rank=4, alpha=8)
    sd = m.lora_state_dict()
    assert 'layers.0.self_attn.q.lora_A.default' in sd
    assert sd['layers.0.self_attn.q.lora_A.default'].shape == (4, 64)
    assert sd['layers.0.self_attn.q.lora_B.default'].shape == (64, 4)


def test_lora_save_load_roundtrip(tmp_path):
    m = tiny()
    m.add_lora(rank=4, alpha=8, adapter_names=['x'])
    ad = m.params['layers']['attn']['q']['lora']['x']
    ad['b'] = ad['b'] + 0.05
    path = str(tmp_path / 'lora.safetensors')
    m.save_lora(path)

    tok, _, cu, ml = tokenize_unpad(SEQS, alphabet=m.alphabet)
    want = np.asarray(m.forward(tok, pad_args=(cu, ml)))

    m2 = tiny()
    m2.load_lora(path)
    assert m2.lora_kwargs['rank'] == 4
    assert m2.lora_kwargs['names'] == ['x']
    got = np.asarray(m2.forward(tok, pad_args=(cu, ml)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_trainable_mask_lora_only():
    m = tiny()
    m.add_lora(rank=4)
    mask = trainable_mask(m.params)
    # lora a/b trainable, scale not, base weights not
    attn_q = mask['layers']['attn']['q']
    assert attn_q['lora']['default']['a'] is True
    assert attn_q['lora']['default']['b'] is True
    assert attn_q['lora']['default']['scale'] is False
    assert attn_q['kernel'] is False
    assert mask['embed_tokens'] is False


def test_trainable_mask_full_without_lora():
    m = tiny()
    mask = trainable_mask(m.params)
    assert mask['embed_tokens'] is True
    assert mask['layers']['attn']['q']['kernel'] is True


def test_lora_over_quantized_base():
    m = tiny()
    m.quantize('8bit')
    m.add_lora(rank=4)
    tok, _, cu, ml = tokenize_unpad(SEQS, alphabet=m.alphabet)
    out = np.asarray(m.forward(tok, pad_args=(cu, ml)))
    assert np.isfinite(out).all()


def test_lora_dropout_training_only():
    """Dropout perturbs adapter contributions only when a dropout rng
    is supplied (training steps); eval forward is deterministic
    (reference: esme/lora.py:84-88 drops the adapter output)."""
    from esme_tpu.models.esm import forward_flat, packed_meta

    m = tiny()
    m.add_lora(rank=8, alpha=16, dropout_p=0.5)
    assert m.lora_kwargs['dropout_p'] == 0.5
    lora = m.params['layers']['attn']['q']['lora']['default']
    lora['b'] = lora['b'] + 0.1     # make contributions nonzero

    tok, _, cu, ml = tokenize_unpad(SEQS, alphabet=m.alphabet)
    tok = jnp.asarray(tok, jnp.int32)
    seg_ids, pos_ids = packed_meta(jnp.asarray(cu, jnp.int32), tok.shape[0])

    def run(rate, rng):
        return np.asarray(forward_flat(
            m.params, m.config, tok, seg_ids, pos_ids,
            max_seqlen=int(ml), lora_dropout=rate, dropout_rng=rng))

    eval_out = run(0.0, None)
    k = jax.random.key(7)
    train_out = run(0.5, k)
    assert np.abs(train_out - eval_out).max() > 1e-4
    # same rng => deterministic
    np.testing.assert_array_equal(train_out, run(0.5, k))
    # different rng => different mask
    assert np.abs(run(0.5, jax.random.key(8)) - train_out).max() > 1e-5
    # rate 0 with an rng is still identity
    np.testing.assert_allclose(run(0.0, k), eval_out, atol=1e-6)


def test_lora_dropout_through_trainer():
    """MaskedPLM picks up dropout_p from lora_kwargs; steps run and the
    loss stays finite; validation (eval mode) is deterministic."""
    from esme_tpu.train import MaskedPLM
    from esme_tpu.data import MaskedFastaTokenDataset
    import tempfile, os
    from esme_tpu.fasta import write_fai

    m = tiny()
    m.add_lora(rank=4, alpha=8, dropout_p=0.25)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 't.fa')
        with open(path, 'w') as f:
            for i, s in enumerate([SEQS[0] * 6, SEQS[1] * 8, SEQS[0] * 3]):
                f.write(f'>s{i}\n{s}\n')
        write_fai(path)
        ds = MaskedFastaTokenDataset(path, token_per_batch=256,
                                     shuffle=False, random_state=0)
        tr = MaskedPLM(m, learning_rate=1e-3)
        assert tr._lora_dropout == 0.25
        batch = ds[0]            # ds[i] re-masks every call
        l1 = tr.training_step(batch)
        l2 = tr.training_step(batch)
        assert np.isfinite(l1) and np.isfinite(l2)
        v1 = tr.validation_step(batch)
        v2 = tr.validation_step(batch)
        assert v1 == v2
