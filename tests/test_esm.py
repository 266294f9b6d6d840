"""Model-layer tests: padded-vs-packed parity, differential testing
against an independent torch oracle, safetensors round-trip, metadata
dispatch (reference test strategy: tests/test_esm.py)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from esme_tpu import ESM, ESM1b, ESM1v, ESM2, ESMC, tokenize, tokenize_unpad
from esme_tpu.alphabet import pack_tokens
from esme_tpu.models.config import (esm1b_config, esm1v_config, esm2_config,
                                    esmc_config)
from esme_tpu.models.io import params_to_flat

from torch_oracle import forward_oracle

SEQS = ['MAGVLKE', 'LK', 'MPVAPLKEMAGVHWC', 'KNFYMHW']


def tiny_cfg(family):
    if family == 'esm2':
        return esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                           dtype='float32')
    if family == 'esmc':
        return esmc_config(num_layers=3, embed_dim=48, attention_heads=4,
                           dtype='float32')
    raise ValueError(family)


def tiny_model(family):
    if family == 'esm2':
        return ESM2(config=tiny_cfg('esm2'), rng=0)
    if family == 'esmc':
        return ESMC(config=tiny_cfg('esmc'), rng=1)
    from dataclasses import replace
    if family == 'esm1b':
        cfg = replace(esm1b_config(dtype='float32'), num_layers=2,
                      embed_dim=64, attention_heads=4, learned_positions=128)
        return ESM1b(config=cfg, rng=2)
    if family == 'esm1v':
        cfg = replace(esm1v_config(dtype='float32'), num_layers=2,
                      embed_dim=64, attention_heads=4, learned_positions=128)
        return ESM1v(config=cfg, rng=3)
    raise ValueError(family)


FAMILIES = ['esm2', 'esmc', 'esm1b', 'esm1v']


@pytest.mark.parametrize('family', FAMILIES)
def test_padded_vs_packed(family):
    model = tiny_model(family)
    alpha = model.alphabet
    padded_tok = tokenize(SEQS, alphabet=alpha)
    lp_pad = np.asarray(model.predict_log_prob(padded_tok))

    tok, idx, cu, ml = tokenize_unpad(SEQS, alphabet=alpha)
    lp_packed = np.asarray(
        model.predict_log_prob(tok, pad_args=(cu, ml), pad_output=True))

    valid = padded_tok != alpha.padding_idx
    np.testing.assert_allclose(lp_pad[valid], lp_packed[valid],
                               atol=1e-5, rtol=1e-5)
    # pad positions carry log_softmax(lm_head(0)) — the reference
    # applies the head after pad_input's zero-fill (esme/esm.py:255,281)
    from esme_tpu.models.esm import _pad_head_row
    pad_row = np.asarray(_pad_head_row(model.params, model.config, True))
    np.testing.assert_allclose(
        lp_pad[~valid], np.broadcast_to(pad_row, lp_pad[~valid].shape),
        atol=1e-6)


@pytest.mark.parametrize('family', FAMILIES)
def test_vs_torch_oracle(family):
    """Differential test against an independent torch implementation."""
    model = tiny_model(family)
    flat = {k: torch.tensor(np.asarray(v, dtype=np.float32))
            for k, v in params_to_flat(model.params, model.config).items()}

    tok, idx, cu, ml = tokenize_unpad(SEQS, alphabet=model.alphabet)
    logits = np.asarray(model.forward(tok, pad_args=(cu, ml)))

    for s in range(len(SEQS)):
        seq_tok = tok[cu[s]:cu[s + 1]]
        want = forward_oracle(flat, model.config, seq_tok).numpy()
        got = logits[cu[s]:cu[s + 1]]
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_static_packed_batch_unaffected_by_tail():
    """The static-shape padding tail must not change real logits."""
    model = tiny_model('esm2')
    tok, idx, cu, ml = tokenize_unpad(SEQS, alphabet=model.alphabet)
    base = np.asarray(model.forward(tok, pad_args=(cu, ml)))

    ptok, pidx, pcu, pml = pack_tokens(SEQS, token_budget=128,
                                       max_segments=8,
                                       alphabet=model.alphabet)
    out = np.asarray(model.forward(ptok, pad_args=(pcu, pml)))
    np.testing.assert_allclose(out[:tok.shape[0]], base,
                               atol=1e-5, rtol=1e-5)


def test_mask_token_embedding_zeroed():
    model = tiny_model('esm2')
    # logits at non-mask positions must be identical whether another
    # *unattended* sequence contains masks or not — but within one
    # sequence, a mask token influences others only via attention.
    t1, _, cu1, ml1 = tokenize_unpad(['MAGV<mask>KE'],
                                     alphabet=model.alphabet)
    out = np.asarray(model.forward(t1, pad_args=(cu1, ml1)))
    assert np.isfinite(out).all()


def test_forward_representation_and_intermediates():
    model = tiny_model('esm2')
    tok, _, cu, ml = tokenize_unpad(SEQS, alphabet=model.alphabet)
    rep = model.forward_representation(tok, pad_args=(cu, ml))
    assert rep.shape == (tok.shape[0], model.config.embed_dim)
    rep2 = model.forward_representation(tok, pad_args=(cu, ml),
                                        layers=[0])
    assert rep2.shape == (tok.shape[0], model.config.embed_dim * 2)
    # final-layer block of the concat matches the plain call
    np.testing.assert_allclose(np.asarray(rep2[:, :model.config.embed_dim]),
                               np.asarray(rep), atol=1e-6)


def test_predict_prob_sums_to_one():
    model = tiny_model('esm2')
    tok, _, cu, ml = tokenize_unpad(SEQS[:2], alphabet=model.alphabet)
    p = np.asarray(model.predict_prob(tok, pad_args=(cu, ml)))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)


def test_save_load_roundtrip(tmp_path):
    model = tiny_model('esm2')
    path = str(tmp_path / 'tiny.safetensors')
    model.save_pretrained(path, name='esm2_tiny')

    loaded = ESM.from_pretrained(path, dtype='float32')
    assert isinstance(loaded, ESM2)
    assert loaded.config.num_layers == 2

    tok, _, cu, ml = tokenize_unpad(SEQS[:2], alphabet=model.alphabet)
    a = np.asarray(model.forward(tok, pad_args=(cu, ml)))
    b = np.asarray(loaded.forward(tok, pad_args=(cu, ml)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_metadata_dispatch(tmp_path):
    model = tiny_model('esmc')
    path = str(tmp_path / 'tinyc.safetensors')
    model.save_pretrained(path, name='esmc_tiny')
    loaded = ESM.from_pretrained(path, dtype='float32')
    assert isinstance(loaded, ESMC)
    assert loaded.config.vocab_size == 64


def test_bf16_default_dtype():
    model = ESM2(num_layers=1, embed_dim=64, attention_heads=4)
    assert model.params['embed_tokens'].dtype == jnp.bfloat16
    tok, _, cu, ml = tokenize_unpad(['MAGV'], alphabet=model.alphabet)
    lp = model.predict_log_prob(tok, pad_args=(cu, ml))
    assert lp.dtype == jnp.float32  # log-probs promoted for stability
