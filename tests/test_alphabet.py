"""Tokenizer tests (reference test strategy: tests/test_alphabet.py —
golden token ids + unpad consistency)."""

import numpy as np
import pytest

from esme_tpu.alphabet import (Alphabet, Alphabet3, mask_tokens, pad_tokens,
                               padding_mask, split_alphabet, token_to_str,
                               tokenize, tokenize_unpad)


def test_vocab_layout():
    # The published ESM vocab contract (reference: esme/alphabet.py:9-31).
    assert Alphabet.cls_idx == 0
    assert Alphabet.padding_idx == 1
    assert Alphabet.eos_idx == 2
    assert Alphabet.unk_idx == 3
    assert Alphabet.mask_idx == 32
    assert len(Alphabet.alphabet) == 33
    assert Alphabet.token_to_idx['L'] == 4
    assert Alphabet.token_to_idx['M'] == 20
    assert Alphabet.amino_acids == list('LAGVSERTIDPKQNFYMHWC')

    assert Alphabet3.token_to_idx['|'] == 31
    assert Alphabet3.mask_idx == 32


def test_split_alphabet():
    assert split_alphabet('MPV<mask>AP') == ['M', 'P', 'V', '<mask>', 'A', 'P']
    assert split_alphabet(['MA', 'M<cls>']) == [['M', 'A'], ['M', '<cls>']]


def test_tokenize_golden():
    # hand-derived from the vocab table: M=20 P=14 V=7 A=5
    tokens = tokenize('MPV<mask>AP', alphabet=Alphabet)
    np.testing.assert_array_equal(
        tokens, [[0, 20, 14, 7, 32, 5, 14, 2]])
    assert tokens.dtype == np.int32


def test_tokenize_pads_batch():
    tokens = tokenize(['MA', 'MAGV'], alphabet=Alphabet)
    np.testing.assert_array_equal(tokens, [
        [0, 20, 5, 2, 1, 1],
        [0, 20, 5, 6, 7, 2],
    ])


def test_tokenize_unk():
    tokens = tokenize('M*', alphabet=Alphabet)
    assert tokens[0, 2] == Alphabet.unk_idx


def test_tokenize_unpad_contract(sequences):
    tokens, indices, cu_lens, max_len = tokenize_unpad(
        sequences, alphabet=Alphabet)
    lens = np.array([len(s) + 2 for s in sequences])
    assert tokens.shape[0] == lens.sum()
    np.testing.assert_array_equal(cu_lens, np.cumsum([0, *lens]))
    assert max_len == lens.max()
    assert cu_lens.dtype == np.int32

    # scatter-back through `indices` reproduces the padded layout
    padded = tokenize(sequences, alphabet=Alphabet)
    flat = np.full(padded.size, Alphabet.padding_idx, dtype=np.int32)
    flat[indices] = tokens
    np.testing.assert_array_equal(flat.reshape(padded.shape), padded)


def test_token_to_str_roundtrip():
    seqs = ['MAGV', 'LKE']
    tokens = tokenize(seqs, alphabet=Alphabet)
    strs = token_to_str(tokens, alphabet=Alphabet)
    assert strs[0] == '<cls>MAGV<eos>'
    assert strs[1].startswith('<cls>LKE<eos>')


def test_pad_tokens_1d():
    out = pad_tokens([np.array([0, 5, 2]), np.array([0, 2])],
                     alphabet=Alphabet)
    np.testing.assert_array_equal(out, [[0, 5, 2], [0, 2, 1]])


def test_mask_tokens_invariants(sequences, rng):
    tokens = tokenize(sequences, alphabet=Alphabet)
    masked, mask = mask_tokens(tokens, freq=0.15, alphabet=Alphabet, rng=rng)
    # never masks special tokens
    special = ((tokens == Alphabet.cls_idx) | (tokens == Alphabet.eos_idx)
               | (tokens == Alphabet.padding_idx))
    assert not (mask & special).any()
    # >= 1 mask per row
    assert (mask.sum(axis=-1) >= 1).all()
    # unmasked positions unchanged
    np.testing.assert_array_equal(masked[~mask], tokens[~mask])
    # masked positions are mostly <mask>
    assert (masked[mask] == Alphabet.mask_idx).mean() > 0.5


def test_mask_tokens_1d(rng):
    tokens = tokenize('MAGVLKE', alphabet=Alphabet)[0]
    masked, mask = mask_tokens(tokens, freq=0.01, alphabet=Alphabet, rng=rng)
    assert mask.sum() >= 1


def test_padding_mask():
    cu_lens = np.array([0, 3, 5])
    mask = padding_mask(cu_lens, 4)
    np.testing.assert_array_equal(
        mask, [[True, True, True, False], [True, True, False, False]])
