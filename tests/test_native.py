"""Native C++ FASTA reader/tokenizer vs the numpy reference path."""

import numpy as np
import pytest

from esme_tpu.alphabet import Alphabet, tokenize_unpad
from esme_tpu.data import FastaTokenDataset
from esme_tpu.fasta import Fasta, read_fai

native = pytest.importorskip('esme_tpu.native')


@pytest.fixture(scope='module')
def nf(request):
    fasta_path = request.getfixturevalue('fasta_path')
    rows = read_fai(fasta_path + '.fai')
    try:
        return native.NativeFasta(fasta_path, rows, Alphabet)
    except (RuntimeError, OSError) as e:
        pytest.skip(f'native lib unavailable: {e}')


def test_native_read_seq(nf, fasta_path):
    fa = Fasta(fasta_path)
    for i in (0, 3, 15):
        assert nf.read_seq(i) == fa[i]


def test_native_tokenize_pack_matches_numpy(nf, fasta_path):
    fa = Fasta(fasta_path)
    idxs = [2, 0, 7]
    budget = 1024
    tokens, cu, ml = nf.tokenize_pack(idxs, budget)

    want_tok, _, want_cu, want_ml = tokenize_unpad(
        [fa[i] for i in idxs], alphabet=Alphabet)
    assert ml == want_ml
    np.testing.assert_array_equal(cu, want_cu)
    np.testing.assert_array_equal(tokens[:want_tok.shape[0]], want_tok)
    assert (tokens[want_tok.shape[0]:] == Alphabet.padding_idx).all()


def test_native_budget_overflow(nf):
    with pytest.raises(ValueError):
        nf.tokenize_pack(list(range(16)), 64)


def test_dataset_native_path_matches(fasta_path):
    kw = dict(token_per_batch=1024, shuffle=False, alphabet=Alphabet)
    ds_native = FastaTokenDataset(fasta_path, use_native=True, **kw)
    ds_numpy = FastaTokenDataset(fasta_path, use_native=False, **kw)
    assert ds_native._native is not None
    for a, b in zip(ds_native, ds_numpy):
        np.testing.assert_array_equal(a.tokens, b.tokens)
        np.testing.assert_array_equal(a.cu_lens, b.cu_lens)
        assert a.max_len == b.max_len
