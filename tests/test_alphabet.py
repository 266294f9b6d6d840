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


# Human p53 (reference: tests/conftest.py:55)
P53_HUMAN = (
    'MEEPQSDPSVEPPLSQETFSDLWKLLPENNVLSPLPSQAMDDLMLSPDDIEQWFTEDPGPDEAP'
    'RMPEAAPPVAPAPAAPTPAAPAPAPSWPLSSSVPSQKTYQGSYGFRLGFLHSGTAKSVTCTYSP'
    'ALNKMFCQLAKTCPVQLWVDSTPPPGTRVRAMAIYKQSQHMTEVVRRCPHHERCSDSDGLAPPQ'
    'HLIRVEGNLRVEYLDDRNTFRHSVVVPYEPPEVGSDCTTIHYNYMCNSSCMGGMNRRPILTIIT'
    'LEDSSGNLLGRNSFEVRVCACPGRDRRTEEENLRKKGEPHHELPPGSTKRALPNNTSSSPQPKK'
    'KPLDGEYFTLQIRGRERFEMFRELNEALELKDAQAGKEPGGSRAHSSHLKSKKGQSTSRHKKLM'
    'FKTEGPDSD')

# Golden token ids for p53, the reference's own pinned test vector
# (reference: tests/test_alphabet.py:8-33) — real external ground
# truth for the published ESM vocabulary contract.
P53_GOLDEN = [
    0, 20,  9,  9, 14, 16,  8, 13, 14,  8,  7,  9, 14, 14,  4,  8, 16,  9,
    11, 18,  8, 13,  4, 22, 15,  4,  4, 14,  9, 17, 17,  7,  4,  8, 14,  4,
    14,  8, 16,  5, 20, 13, 13,  4, 20,  4,  8, 14, 13, 13, 12,  9, 16, 22,
    18, 11,  9, 13, 14,  6, 14, 13,  9,  5, 14, 10, 20, 14,  9,  5,  5, 14,
    14,  7,  5, 14,  5, 14,  5,  5, 14, 11, 14,  5,  5, 14,  5, 14,  5, 14,
    8, 22, 14,  4,  8,  8,  8,  7, 14,  8, 16, 15, 11, 19, 16,  6,  8, 19,
    6, 18, 10,  4,  6, 18,  4, 21,  8,  6, 11,  5, 15,  8,  7, 11, 23, 11,
    19,  8, 14,  5,  4, 17, 15, 20, 18, 23, 16,  4,  5, 15, 11, 23, 14,  7,
    16,  4, 22,  7, 13,  8, 11, 14, 14, 14,  6, 11, 10,  7, 10,  5, 20,  5,
    12, 19, 15, 16,  8, 16, 21, 20, 11,  9,  7,  7, 10, 10, 23, 14, 21, 21,
    9, 10, 23,  8, 13,  8, 13,  6,  4,  5, 14, 14, 16, 21,  4, 12, 10,  7,
    9,  6, 17,  4, 10,  7,  9, 19,  4, 13, 13, 10, 17, 11, 18, 10, 21,  8,
    7,  7,  7, 14, 19,  9, 14, 14,  9,  7,  6,  8, 13, 23, 11, 11, 12, 21,
    19, 17, 19, 20, 23, 17,  8,  8, 23, 20,  6,  6, 20, 17, 10, 10, 14, 12,
    4, 11, 12, 12, 11,  4,  9, 13,  8,  8,  6, 17,  4,  4,  6, 10, 17,  8,
    18,  9,  7, 10,  7, 23,  5, 23, 14,  6, 10, 13, 10, 10, 11,  9,  9,  9,
    17,  4, 10, 15, 15,  6,  9, 14, 21, 21, 9,  4, 14, 14,  6,  8, 11, 15,
    10,  5,  4, 14, 17, 17, 11,  8,  8,  8, 14, 16, 14, 15, 15, 15, 14,  4,
    13,  6,  9, 19, 18, 11,  4, 16, 12, 10,  6, 10,  9, 10, 18,  9, 20, 18,
    10,  9,  4, 17,  9,  5,  4,  9,  4, 15, 13,  5, 16,  5,  6, 15,  9, 14,
    6,  6,  8, 10,  5, 21,  8,  8, 21,  4, 15,  8, 15, 15,  6, 16,  8, 11,
    8, 10, 21, 15, 15,  4, 20, 18, 15, 11,  9,  6, 14, 13,  8, 13,  2]


def test_tokenize_p53_golden():
    """The reference's pinned full-protein golden vector
    (reference: tests/test_alphabet.py:8-33)."""
    tokens = tokenize(P53_HUMAN, alphabet=Alphabet)
    np.testing.assert_array_equal(tokens, [P53_GOLDEN])
    # ESM1/2 and ESMC alphabets agree on all amino-acid codes
    np.testing.assert_array_equal(
        tokenize(P53_HUMAN, alphabet=Alphabet3), [P53_GOLDEN])


def test_tokenize_unpad_p53_golden():
    """Packed-layout invariants pinned by the reference on p53
    (reference: tests/test_alphabet.py:52-63)."""
    n = len(P53_HUMAN)
    tokens, indices, cu_lens, max_len = tokenize_unpad(
        [P53_HUMAN, P53_HUMAN + P53_HUMAN], alphabet=Alphabet)
    assert tokens.shape[0] == n * 3 + 4
    np.testing.assert_array_equal(indices, np.concatenate([
        np.arange(0, n + 2),
        np.arange(n * 2 + 2, n * 4 + 4),
    ]))
    assert cu_lens.tolist() == [0, n + 2, n * 3 + 4]
    assert max_len == n * 2 + 2


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
