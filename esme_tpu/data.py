"""Token-budget batching and FASTA dataset pipeline.

TPU-native data plane (reference: esme/data.py:12-453). Design deltas
from the reference, per SURVEY.md §7:

* No torch ``DataLoader``: datasets are indexable + iterable and a small
  thread-based :class:`Prefetcher` provides background host-side
  tokenization with double buffering into device memory.
* Packed batches are padded to a static ``(token_per_batch,
  max_segments)`` shape so XLA compiles the train/infer step exactly
  once (reference ragged batches recompile per shape on TPU).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

import numpy as np

from .alphabet import (Alphabet3, mask_tokens, pad_tokens, tokenize,
                       tokenize_unpad)
from .fasta import Fasta


class TokenSizeBatchSampler:
    """Greedy token-budget batching (reference: esme/data.py:12-60).

    Groups dataset indices so that the summed tokenized length
    (sequence length + 2 for cls/eos, reference: esme/data.py:43) stays
    under ``token_per_batch``. Shuffling is seeded by ``random_state``
    (the reference uses ``sklearn.utils.shuffle``; we use a numpy
    permutation with the same per-epoch reseeding contract).
    """

    def __init__(self, token_sizes, token_per_batch, drop_last=False,
                 shuffle=True, random_state=None):
        self.token_sizes = list(token_sizes)
        self.token_per_batch = token_per_batch
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.random_state = random_state
        self._batches = list(self.batches())

    def batches(self):
        indices = list(range(len(self.token_sizes)))

        if self.shuffle:
            rng = np.random.default_rng(self.random_state)
            indices = [int(i) for i in rng.permutation(len(indices))]

        batch: List[int] = []
        total = 0

        for idx in indices:
            token_len = self.token_sizes[idx] + 2  # +2 for cls/eos

            if total + token_len > self.token_per_batch:
                if batch:
                    yield batch
                total = token_len
                batch = [idx]
            else:
                total += token_len
                batch.append(idx)

        if len(batch) > 0 and not self.drop_last:
            yield batch

    def __iter__(self):
        return iter(self._batches)

    def __getitem__(self, idx):
        return self._batches[idx]

    def __len__(self):
        return len(self._batches)


@dataclass
class PackedBatch:
    """A packed varlen batch with static shapes.

    ``tokens`` is ``(token_budget,)`` int32 (tail = padding_idx past
    ``cu_lens[-1]``); ``cu_lens`` is ``(max_segments + 1,)`` int32 with
    the last real value repeated into the tail. ``max_len`` is the
    longest (cls/eos-inclusive) segment. ``indices`` locates each real
    flat token inside the row-major padded ``(num_seqs, max_len)``
    layout (reference: esme/alphabet.py:171-174).
    """
    tokens: np.ndarray
    cu_lens: np.ndarray
    max_len: int
    indices: Optional[np.ndarray] = None
    # masked-LM extras (None for inference batches)
    masked_tokens: Optional[np.ndarray] = None
    mask: Optional[np.ndarray] = None
    # regression/classification labels
    labels: Optional[np.ndarray] = None

    @property
    def pad_args(self):
        return self.cu_lens, self.max_len

    @property
    def num_tokens(self) -> int:
        return int(self.cu_lens[-1])


def _pad_packed(tokens, cu_lens, token_budget, max_segments, pad_idx):
    total = tokens.shape[0]
    nseg = cu_lens.shape[0] - 1
    if token_budget is not None:
        tokens = np.pad(tokens, (0, token_budget - total),
                        constant_values=pad_idx)
    if max_segments is not None:
        cu_lens = np.pad(cu_lens, (0, max_segments - nseg), mode='edge')
    return tokens, cu_lens


class BaseFastaDataset:
    """Shared FASTA plumbing (reference: esme/data.py:63-78)."""

    def __init__(self, fasta, fai=None, k_sample=None, max_len=None,
                 alphabet=Alphabet3, rng=None):
        self.max_len = max_len
        self.alphabet = alphabet
        self.fasta = Fasta(fasta, fai=fai, max_len=max_len,
                           k_sample=k_sample, rng=rng)

    def read_seq(self, idx):
        return self.fasta[idx]


class FastaDataset(BaseFastaDataset):
    """Padded ``(B, L)`` batches of tokenized sequences
    (reference: esme/data.py:81-112)."""

    def __len__(self):
        return len(self.fasta)

    def __getitem__(self, idx):
        return tokenize(self.read_seq(idx), alphabet=self.alphabet)

    def batches(self, batch_size, shuffle=False, random_state=None):
        order = np.arange(len(self))
        if shuffle:
            order = np.random.default_rng(random_state).permutation(order)
        for lo in range(0, len(order), batch_size):
            chunk = order[lo:lo + batch_size]
            yield pad_tokens([self[int(i)] for i in chunk],
                             alphabet=self.alphabet)


class FastaTokenDataset(BaseFastaDataset):
    """Packed varlen batches under a token budget
    (reference: esme/data.py:115-162).

    One item = one :class:`PackedBatch` whose flat length is padded to
    ``token_per_batch`` and segment count to the dataset-wide maximum,
    so every batch shares a single XLA-compiled shape.
    """

    def __init__(self, fasta, fai=None, token_per_batch=50_000, k_sample=None,
                 max_len=None, drop_last=False, shuffle=True,
                 random_state=None, alphabet=Alphabet3, pad_to_budget=True,
                 use_native=None):
        super().__init__(fasta, fai=fai, k_sample=k_sample, max_len=max_len,
                         alphabet=alphabet)
        self.token_per_batch = token_per_batch
        self.pad_to_budget = pad_to_budget

        # native (C++ mmap) read+tokenize path; None = auto
        self._native = None
        if use_native is not False and pad_to_budget:
            try:
                from .native import NativeFasta
                self._native = NativeFasta(self.fasta.fasta,
                                           self.fasta.fai, alphabet)
            except Exception:
                if use_native is True:
                    raise
                self._native = None

        lengths = self.fasta.lengths()
        longest = max(lengths, default=0) + 2
        if pad_to_budget and longest > token_per_batch:
            raise ValueError(
                f'longest sequence needs {longest} tokens (incl cls/eos) '
                f'but token_per_batch={token_per_batch}; filter with '
                f'max_len<={token_per_batch - 2} or raise the budget')
        self.sampler = list(TokenSizeBatchSampler(
            lengths, token_per_batch, drop_last=drop_last,
            shuffle=shuffle, random_state=random_state))
        self.max_segments = max(len(b) for b in self.sampler) \
            if self.sampler else 0

    def __len__(self):
        return len(self.sampler)

    def __getitem__(self, idx) -> PackedBatch:
        indices = self.sampler[idx]
        if self._native is not None:
            tokens, cu_lens, max_len = self._native.tokenize_pack(
                indices, self.token_per_batch)
            cu_lens = np.pad(cu_lens,
                             (0, self.max_segments - len(indices)),
                             mode='edge')
            return PackedBatch(tokens=tokens, cu_lens=cu_lens,
                               max_len=max_len)
        tokens, tok_indices, cu_lens, max_len = tokenize_unpad(
            [self.read_seq(i) for i in indices], alphabet=self.alphabet)
        if self.pad_to_budget:
            tokens, cu_lens = _pad_packed(
                tokens, cu_lens, self.token_per_batch, self.max_segments,
                self.alphabet.padding_idx)
        return PackedBatch(tokens=tokens, cu_lens=cu_lens, max_len=max_len,
                           indices=tok_indices)

    def __iter__(self) -> Iterator[PackedBatch]:
        for i in range(len(self)):
            yield self[i]


class MaskedFastaDataset(FastaDataset):
    """Padded batches with BERT masking (reference: esme/data.py:165-205)."""

    def __init__(self, fasta, fai=None, max_len=None, k_sample=None,
                 mask_freq=.15, alter_freq=.1, alphabet=Alphabet3, rng=None):
        super().__init__(fasta, fai=fai, k_sample=k_sample, max_len=max_len,
                         alphabet=alphabet)
        self.mask_freq = mask_freq
        self.alter_freq = alter_freq
        self.rng = rng or np.random.default_rng()

    def __getitem__(self, idx):
        token = super().__getitem__(idx)
        mtokens, mask = mask_tokens(token, self.mask_freq, self.alter_freq,
                                    alphabet=self.alphabet, rng=self.rng)
        return token, mtokens, mask

    def batches(self, batch_size, shuffle=False, random_state=None):
        """Padded ``(B, L)`` masked batches — the reference's padded
        DataLoader collate (reference: esme/data.py:190-205)."""
        order = np.arange(len(self))
        if shuffle:
            order = np.random.default_rng(random_state).permutation(order)
        pad = self.alphabet.padding_idx
        for lo in range(0, len(order), batch_size):
            items = [self[int(i)] for i in order[lo:lo + batch_size]]
            L = max(t.shape[1] for t, _, _ in items)

            def pad_to(a, fill):
                return np.pad(a, ((0, 0), (0, L - a.shape[1])),
                              constant_values=fill)
            tokens = np.concatenate([pad_to(t, pad) for t, _, _ in items])
            mtokens = np.concatenate([pad_to(m, pad) for _, m, _ in items])
            mask = np.concatenate([pad_to(k, False) for _, _, k in items])
            yield tokens, mtokens, mask


class MaskedFastaDataModule:
    """Padded-batch train/val/test masked-LM loaders — the reference's
    non-packed DataModule (reference: esme/data.py:247-300). Prefer
    :class:`MaskedFastaTokenDataModule` (packed) on TPU; this exists
    for baseline comparisons and API parity."""

    def __init__(self, train_fasta, val_fasta=None, test_fasta=None,
                 train_fai=None, val_fai=None, test_fai=None,
                 batch_size: int = 8, mask_freq=.15, alter_freq=.1,
                 max_len=None, alphabet=Alphabet3):
        self.train_fasta, self.train_fai = train_fasta, train_fai
        self.val_fasta, self.val_fai = val_fasta, val_fai
        self.test_fasta, self.test_fai = test_fasta, test_fai
        self.batch_size = batch_size
        self.mask_freq = mask_freq
        self.alter_freq = alter_freq
        self.max_len = max_len
        self.alphabet = alphabet
        self.current_epoch = 0

    def _loader(self, fasta, fai, shuffle):
        ds = MaskedFastaDataset(
            fasta, fai=fai, max_len=self.max_len,
            mask_freq=self.mask_freq, alter_freq=self.alter_freq,
            alphabet=self.alphabet,
            rng=np.random.default_rng(self.current_epoch))
        return ds.batches(self.batch_size, shuffle=shuffle,
                          random_state=self.current_epoch)

    def train_dataloader(self):
        return self._loader(self.train_fasta, self.train_fai, shuffle=True)

    def val_dataloader(self):
        return self._loader(self.val_fasta, self.val_fai, shuffle=False)

    def test_dataloader(self):
        return self._loader(self.test_fasta, self.test_fai, shuffle=False)

    def set_epoch(self, epoch):
        self.current_epoch = epoch


class MaskedFastaTokenDataset(FastaTokenDataset):
    """Packed varlen batches with BERT masking for masked-LM training
    (reference: esme/data.py:208-244). Yields :class:`PackedBatch` with
    ``masked_tokens`` (model input) and ``mask`` (loss positions)."""

    def __init__(self, fasta, fai=None, token_per_batch=50_000, k_sample=None,
                 max_len=None, mask_freq=.15, alter_freq=.1, drop_last=False,
                 shuffle=True, random_state=None, alphabet=Alphabet3,
                 pad_to_budget=True):
        super().__init__(fasta, fai=fai, token_per_batch=token_per_batch,
                         k_sample=k_sample, max_len=max_len,
                         drop_last=drop_last, shuffle=shuffle,
                         random_state=random_state, alphabet=alphabet,
                         pad_to_budget=pad_to_budget)
        self.mask_freq = mask_freq
        self.alter_freq = alter_freq
        self.rng = np.random.default_rng(random_state)

    def __getitem__(self, idx) -> PackedBatch:
        batch = super().__getitem__(idx)
        total = batch.num_tokens
        real = batch.tokens[:total]
        mtokens, mask = mask_tokens(real, self.mask_freq, self.alter_freq,
                                    alphabet=self.alphabet, rng=self.rng)
        pad = batch.tokens.shape[0] - total
        batch.masked_tokens = np.pad(mtokens, (0, pad),
                                     constant_values=self.alphabet.padding_idx)
        batch.mask = np.pad(mask, (0, pad), constant_values=False)
        return batch


class MaskedFastaTokenDataModule:
    """Per-epoch reshuffled train/val/test packed masked-LM loaders
    (reference: esme/data.py:303-364 minus the Lightning base class).

    ``set_epoch`` reseeds the shuffle like the reference's
    ``SetEpochCallback`` (reference: esme/data.py:367-374).
    """

    def __init__(self, train_fasta, val_fasta=None, test_fasta=None,
                 train_fai=None, val_fai=None, test_fai=None,
                 token_per_batch=100_000, mask_freq=.15, alter_freq=.1,
                 max_len=None, alphabet=Alphabet3):
        self.train_fasta, self.train_fai = train_fasta, train_fai
        self.val_fasta, self.val_fai = val_fasta, val_fai
        self.test_fasta, self.test_fai = test_fasta, test_fai
        self.token_per_batch = token_per_batch
        self.mask_freq = mask_freq
        self.alter_freq = alter_freq
        self.max_len = max_len
        self.alphabet = alphabet
        self.current_epoch = 0

    def _dataset(self, fasta, fai, shuffle):
        return MaskedFastaTokenDataset(
            fasta, fai=fai, token_per_batch=self.token_per_batch,
            max_len=self.max_len, mask_freq=self.mask_freq,
            alter_freq=self.alter_freq, shuffle=shuffle,
            random_state=self.current_epoch, alphabet=self.alphabet)

    def train_dataloader(self):
        return self._dataset(self.train_fasta, self.train_fai, shuffle=True)

    def val_dataloader(self):
        return self._dataset(self.val_fasta, self.val_fai, shuffle=False)

    def test_dataloader(self):
        return self._dataset(self.test_fasta, self.test_fai, shuffle=False)

    def set_epoch(self, epoch):
        self.current_epoch = epoch


class LabeledDataset:
    """Packed batches of (sequence, label) pairs for fine-tuning
    (reference: esme/data.py:377-415), with ``truncate_len`` support."""

    def __init__(self, seqs, labels, token_per_batch, shuffle=True,
                 random_state=None, truncate_len=None, alphabet=Alphabet3,
                 pad_to_budget=True):
        self.seqs = list(seqs)
        self.labels = list(labels)
        self.truncate_len = truncate_len
        self.alphabet = alphabet
        self.token_per_batch = token_per_batch
        self.pad_to_budget = pad_to_budget

        self.sampler = list(TokenSizeBatchSampler(
            [min(len(s), truncate_len or len(s)) for s in self.seqs],
            token_per_batch, shuffle=shuffle, random_state=random_state))
        self.max_segments = max(len(b) for b in self.sampler) \
            if self.sampler else 0

    def truncate(self, seq):
        if self.truncate_len is not None and len(seq) > self.truncate_len:
            return seq[:self.truncate_len]
        return seq

    def __len__(self):
        return len(self.sampler)

    def __getitem__(self, idx) -> PackedBatch:
        indices = self.sampler[idx]
        tokens, tok_indices, cu_lens, max_len = tokenize_unpad(
            [self.truncate(self.seqs[i]) for i in indices],
            alphabet=self.alphabet)
        labels = np.asarray([self.labels[i] for i in indices],
                            dtype=np.float32)
        if self.pad_to_budget:
            tokens, cu_lens = _pad_packed(
                tokens, cu_lens, self.token_per_batch, self.max_segments,
                self.alphabet.padding_idx)
            labels = np.pad(labels, (0, self.max_segments - len(indices)))
        return PackedBatch(tokens=tokens, cu_lens=cu_lens, max_len=max_len,
                           indices=tok_indices, labels=labels)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def balance_binary(seqs, labels, balance: Optional[str] = 'upsample',
                   rng=None):
    """Class-balance a binary (sequence, label) set by repeating the
    positive class (``'upsample'``) or subsampling the negative class
    (``'downsample'``) — the reference TF dataset's balancing
    (reference: workflow/tf/finetune.py:21-56)."""
    assert balance in (None, 'upsample', 'downsample')
    if balance is None:
        return list(seqs), list(labels)
    seqs, labels = list(seqs), list(labels)
    pos = [s for s, y in zip(seqs, labels) if y]
    neg = [s for s, y in zip(seqs, labels) if not y]
    if balance == 'upsample':
        imbalance = max(len(neg) // max(len(pos), 1), 1)
        pos = pos * imbalance
    else:
        rng = rng or np.random.default_rng()
        idx = rng.permutation(len(neg))[:max(len(pos), 1)]
        neg = [neg[i] for i in idx]
    return pos + neg, [1.0] * len(pos) + [0.0] * len(neg)


class Prefetcher:
    """Background prefetch of host batches (the multi-worker DataLoader
    equivalent, reference: esme/data.py:109-112). Tokenisation/masking
    runs in ``num_workers`` threads while the device computes the
    previous step; batches are yielded strictly in dataset order.

    With ``num_workers > 1`` the dataset must be indexable
    (``__getitem__``/``__len__``) so items can be built concurrently —
    numpy tokenization and the native mmap FASTA reader both release
    the GIL, so threads give real parallelism without process-fork
    cost. ``depth`` bounds in-flight batches (host-memory cap)."""

    def __init__(self, dataset, depth: int = 2, device_put=None,
                 num_workers: int = 1):
        self.dataset = dataset
        self.depth = max(int(depth), 1)
        self.device_put = device_put
        self.num_workers = max(int(num_workers), 1)
        if self.num_workers > 1 and not hasattr(dataset, '__getitem__'):
            raise TypeError(
                'num_workers > 1 requires an indexable dataset')

    def _iter_pool(self):
        from concurrent.futures import ThreadPoolExecutor
        n = len(self.dataset)
        window = self.depth + self.num_workers

        def build(i):
            item = self.dataset[i]
            if self.device_put is not None:
                item = self.device_put(item)
            return item

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = {i: pool.submit(build, i)
                       for i in range(min(window, n))}
            for i in range(n):
                item = futures.pop(i).result()
                nxt = i + window
                if nxt < n:
                    futures[nxt] = pool.submit(build, nxt)
                yield item

    def __iter__(self):
        if self.num_workers > 1:
            yield from self._iter_pool()
            return

        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = object()

        def worker():
            try:
                for item in self.dataset:
                    if self.device_put is not None:
                        item = self.device_put(item)
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()

    def __len__(self):
        return len(self.dataset)
