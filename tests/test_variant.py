"""Variant-effect prediction tests (reference strategy:
tests/test_variant.py — dataset shape, score frame format,
perplexity)."""

import numpy as np
import pandas as pd
import pytest

from esme_tpu import ESM2
from esme_tpu.alphabet import Alphabet
from esme_tpu.models.config import esm2_config
from esme_tpu.variant import (MaskMarginDataset, predict_mask_margin,
                              predict_pseudoperplexity,
                              predict_pseudoperplexity_margin)

SEQ = 'MPEAAPPVAPAPAAP'


def tiny():
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    return ESM2(config=cfg, rng=0)


def test_mask_margin_dataset():
    ds = MaskMarginDataset(SEQ, alphabet=Alphabet)
    assert len(ds) == len(SEQ)
    item = ds[0]
    assert item['pos'] == 1
    assert item['wt'] == 'M'
    assert item['token'][1] == Alphabet.mask_idx
    assert item['token'][0] == Alphabet.cls_idx
    # other positions untouched
    assert item['token'][2] == Alphabet.token_to_idx['P']


def test_mask_margin_dataset_window():
    long_seq = 'M' * 50 + 'W' + 'K' * 50
    ds = MaskMarginDataset(long_seq, max_len=32, alphabet=Alphabet)
    item = ds[50]   # the W
    assert item['token'].shape[0] == 32
    assert item['token'][item['local_pos']] == Alphabet.mask_idx
    assert item['pos'] == 51


def test_predict_mask_margin_frame():
    model = tiny()
    df = predict_mask_margin(model, SEQ, batch_size=8)
    assert len(df) == len(SEQ) * 20
    assert 'M1A' in df.index and f'P{len(SEQ)}Y' in df.index
    # wt-vs-wt margin is exactly zero
    assert df.loc['M1M', 'score'] == 0.0
    assert np.isfinite(df['score']).all()


def test_predict_mask_margin_batch_tail():
    # length not divisible by batch_size exercises the padded tail
    model = tiny()
    df1 = predict_mask_margin(model, SEQ, batch_size=4)
    df2 = predict_mask_margin(model, SEQ, batch_size=len(SEQ))
    assert (df1.index == df2.index).all()
    np.testing.assert_allclose(df1['score'].values, df2['score'].values,
                               atol=1e-5)


def test_pseudoperplexity_positive_and_sane():
    model = tiny()
    ppl = predict_pseudoperplexity(model, SEQ, batch_size=8)
    assert 1.0 < ppl < 40.0   # vocab 33; random model ~ uniform


def test_pseudoperplexity_margin_frame():
    model = tiny()
    df = predict_pseudoperplexity_margin(model, SEQ[:4], batch_size=16)
    # 4 positions x 20 mutations, mean over mask positions
    assert len(df) == 4 * 20
    assert np.isfinite(df['score']).all()
