import numpy as np

from esme_tpu.alphabet import Alphabet
from esme_tpu.data import (FastaTokenDataset, LabeledDataset,
                           MaskedFastaTokenDataset,
                           MaskedFastaTokenDataModule, Prefetcher,
                           TokenSizeBatchSampler)


def test_token_size_batch_sampler_budget():
    sizes = [10, 20, 30, 40, 50]
    sampler = TokenSizeBatchSampler(sizes, token_per_batch=64, shuffle=False)
    for batch in sampler:
        assert sum(sizes[i] + 2 for i in batch) <= 64
    covered = sorted(i for b in sampler for i in b)
    assert covered == list(range(5))


def test_token_size_batch_sampler_exact():
    # greedy assignment is deterministic without shuffling
    sampler = TokenSizeBatchSampler([8, 8, 8, 8], token_per_batch=20,
                                    shuffle=False)
    assert list(sampler) == [[0, 1], [2, 3]]


def test_token_size_batch_sampler_shuffle_seeded():
    a = TokenSizeBatchSampler(range(100), 64, shuffle=True, random_state=3)
    b = TokenSizeBatchSampler(range(100), 64, shuffle=True, random_state=3)
    c = TokenSizeBatchSampler(range(100), 64, shuffle=True, random_state=4)
    assert list(a) == list(b)
    assert list(a) != list(c)


def test_fasta_token_dataset_static_shapes(fasta_path):
    ds = FastaTokenDataset(fasta_path, token_per_batch=1024, shuffle=False)
    shapes = {batch.tokens.shape for batch in ds}
    assert shapes == {(1024,)}
    seg_shapes = {batch.cu_lens.shape for batch in ds}
    assert len(seg_shapes) == 1
    for batch in ds:
        total = batch.num_tokens
        assert (batch.tokens[total:] == Alphabet.padding_idx).all()
        # cu_lens tail repeats the final value
        assert batch.cu_lens[-1] == total


def test_masked_fasta_token_dataset(fasta_path):
    ds = MaskedFastaTokenDataset(fasta_path, token_per_batch=1024,
                                 shuffle=False, random_state=0)
    batch = ds[0]
    assert batch.masked_tokens.shape == batch.tokens.shape
    assert batch.mask.dtype == bool
    total = batch.num_tokens
    assert not batch.mask[total:].any()
    changed = batch.masked_tokens != batch.tokens
    assert changed[batch.mask].mean() > 0.5
    assert not changed[~batch.mask].any()


def test_datamodule_epoch_reshuffle(fasta_path):
    dm = MaskedFastaTokenDataModule(fasta_path, val_fasta=fasta_path,
                                    token_per_batch=1024)
    first = [b.cu_lens.tolist() for b in dm.train_dataloader()]
    dm.set_epoch(1)
    second = [b.cu_lens.tolist() for b in dm.train_dataloader()]
    assert first != second  # reshuffled
    val1 = [b.cu_lens.tolist() for b in dm.val_dataloader()]
    val2 = [b.cu_lens.tolist() for b in dm.val_dataloader()]
    assert val1 == val2  # val not shuffled


def test_labeled_dataset_truncate():
    seqs = ['M' * 50, 'K' * 10, 'L' * 30]
    labels = [1.0, 2.0, 3.0]
    ds = LabeledDataset(seqs, labels, token_per_batch=128, shuffle=False,
                        truncate_len=20)
    batch = ds[0]
    lens = np.diff(batch.cu_lens)
    assert lens.max() <= 22  # truncate_len + cls/eos
    assert batch.labels is not None


def test_prefetcher(fasta_path):
    ds = FastaTokenDataset(fasta_path, token_per_batch=1024, shuffle=False)
    direct = [b.tokens for b in ds]
    fetched = [b.tokens for b in Prefetcher(ds, depth=2)]
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a, b)


def test_prefetcher_multiworker(fasta_path):
    from esme_tpu import FastaTokenDataset
    ds = FastaTokenDataset(fasta_path, token_per_batch=1024, shuffle=False)
    direct = [np.asarray(ds[i].tokens) for i in range(len(ds))]
    fetched = [np.asarray(b.tokens)
               for b in Prefetcher(ds, depth=2, num_workers=4)]
    assert len(fetched) == len(direct)
    for a, b in zip(direct, fetched):     # strict order preservation
        np.testing.assert_array_equal(a, b)


def test_prefetcher_multiworker_requires_indexable():
    import pytest as _pytest
    gen = (i for i in range(3))
    with _pytest.raises(TypeError):
        Prefetcher(gen, num_workers=2)


def test_masked_fasta_padded_batches(fasta_path):
    from esme_tpu import MaskedFastaDataset
    ds = MaskedFastaDataset(fasta_path, rng=np.random.default_rng(0))
    n_total = 0
    for tokens, mtokens, mask in ds.batches(4):
        assert tokens.shape == mtokens.shape == mask.shape
        assert tokens.ndim == 2 and tokens.shape[0] <= 4
        # masked positions were altered or kept per 80/10/10; unmasked
        # positions are identical
        np.testing.assert_array_equal(tokens[~mask], mtokens[~mask])
        assert mask.any(axis=1).all()     # >=1 mask per row
        n_total += tokens.shape[0]
    assert n_total == len(ds)


def test_masked_fasta_datamodule(fasta_path):
    from esme_tpu import MaskedFastaDataModule
    dm = MaskedFastaDataModule(fasta_path, val_fasta=fasta_path,
                               batch_size=4)
    train = list(dm.train_dataloader())
    val = list(dm.val_dataloader())
    assert len(train) == len(val) == 4     # 16 seqs / bs 4
    dm.set_epoch(1)
    train2 = list(dm.train_dataloader())
    # reshuffled between epochs: first batch differs in shape or content
    same = all(a[0].shape == b[0].shape and (a[0] == b[0]).all()
               for a, b in zip(train, train2))
    assert not same
