import numpy as np
import pytest

from esme_tpu.fasta import Fasta, read_fai, write_fai


def test_read_fai(fasta_path):
    rows = read_fai(fasta_path + '.fai')
    assert len(rows) == 16
    assert rows[0]['id'] == 'PROT0000'
    assert rows[0]['length'] == 60


def test_fasta_by_index_and_id(fasta_path):
    fa = Fasta(fasta_path)
    assert len(fa) == 16
    seq = fa[1]
    assert len(seq) == 256
    assert fa['PROT0001'] == seq
    assert set(seq) <= set('LAGVSERTIDPKQNFYMHWC')


def test_fasta_max_len(fasta_path):
    fa = Fasta(fasta_path, max_len=200)
    assert all(l <= 200 for l in fa.lengths())
    assert len(fa) < 16


def test_fasta_k_sample(fasta_path):
    fa = Fasta(fasta_path, k_sample=5, rng=np.random.default_rng(0))
    assert len(fa) == 5


def test_fasta_missing_index(tmp_path):
    p = tmp_path / 'x.fa'
    p.write_text('>a\nMAGV\n')
    with pytest.raises(FileNotFoundError):
        Fasta(p)


def test_write_fai_matches_lengths(tmp_path):
    p = tmp_path / 'y.fa'
    p.write_text('>a desc\nMAGVLKE\nMAGV\n>b\nLK\n')
    write_fai(p)
    fa = Fasta(p)
    assert fa['a'] == 'MAGVLKEMAGV'
    assert fa['b'] == 'LK'
