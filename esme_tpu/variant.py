"""Variant-effect prediction by mask-margin scoring and
pseudo-perplexity (reference: esme/variant.py:10-246).

Same outputs as the reference (pandas DataFrames indexed
``{wt}{pos}{aa}``; perplexity = exp(mean NLL)), TPU-shaped execution:
the per-position masked copies of a sequence all share one static
``(batch_size, L)`` shape, so every chunk reuses a single compiled
forward; the tail chunk is padded with repeated rows and dropped.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

from .alphabet import Alphabet3, tokenize


class MaskMarginDataset:
    """One item per sequence position, that position masked; optional
    window truncation centered on the variant
    (reference: esme/variant.py:10-70)."""

    def __init__(self, seq: str, max_len: Optional[int] = None,
                 alphabet=Alphabet3):
        self.seq = seq
        self.max_len = max_len
        self.alphabet = alphabet
        self.token = tokenize([seq], alphabet=alphabet)[0]

    def __len__(self):
        return len(self.seq)

    def __getitem__(self, idx):
        token = self.token.copy()
        wt = self.seq[idx]
        idx += 1
        token[idx] = self.alphabet.mask_idx

        if self.max_len is not None and token.shape[0] > self.max_len:
            start = max(0, idx - self.max_len // 2)
            start = min(token.shape[0] - self.max_len, start)
            end = min(token.shape[0], start + self.max_len)
            token = token[start:end]
            pos = idx - start
        else:
            pos = idx

        return {
            'token': token,
            'local_pos': pos,
            'pos': idx,
            'wt': wt,
            'wt_token': self.alphabet.token_to_idx[wt],
        }


def _batched_items(ds, batch_size):
    """Yield fixed-size batches (tail padded by repeating the last item
    so shapes stay static; `n_real` marks the real rows)."""
    n = len(ds)
    for lo in range(0, n, batch_size):
        idxs = list(range(lo, min(lo + batch_size, n)))
        n_real = len(idxs)
        while len(idxs) < batch_size and n > 0:
            idxs.append(idxs[-1])
        items = [ds[i] for i in idxs]
        yield items, n_real


def predict_mask_margin(model, seq, batch_size: int = 32,
                        max_len: Optional[int] = None,
                        alphabet=None) -> pd.DataFrame:
    """Mask-margin scores for every single-aa substitution
    (reference: esme/variant.py:110-165). Returns a DataFrame indexed
    ``'{wt}{pos}{aa}'`` with a ``score`` column, where
    ``score = logP(aa) − logP(wt)`` at the masked position."""
    alphabet = alphabet or model.alphabet
    ds = seq if isinstance(seq, MaskMarginDataset) else \
        MaskMarginDataset(seq, max_len=max_len, alphabet=alphabet)

    rows = []
    for items, n_real in _batched_items(ds, batch_size):
        tokens = np.stack([it['token'] for it in items])
        probs = np.asarray(model.predict_log_prob(tokens))   # (B, L, V)
        for b in range(n_real):
            it = items[b]
            lp = probs[b, it['local_pos']]
            margin = lp - lp[it['wt_token']]
            for aa in alphabet.amino_acids:
                rows.append({
                    'variant': f"{it['wt']}{it['pos']}{aa}",
                    'score': float(margin[alphabet.token_to_idx[aa]]),
                })
    return pd.DataFrame(rows).set_index('variant')


def predict_pseudoperplexity(model, seq, batch_size: int = 32,
                             max_len: Optional[int] = None,
                             alphabet=None) -> float:
    """exp(mean NLL of the wild-type residue at each masked position)
    (reference: esme/variant.py:168-216; torchmetrics Perplexity is
    exactly exp of the average NLL)."""
    alphabet = alphabet or model.alphabet
    ds = seq if isinstance(seq, MaskMarginDataset) else \
        MaskMarginDataset(seq, max_len=max_len, alphabet=alphabet)

    total_nll = 0.0
    count = 0
    for items, n_real in _batched_items(ds, batch_size):
        tokens = np.stack([it['token'] for it in items])
        logp = np.asarray(model.predict_log_prob(tokens))
        for b in range(n_real):
            it = items[b]
            total_nll -= float(logp[b, it['local_pos'], it['wt_token']])
            count += 1
    return float(np.exp(total_nll / max(count, 1)))


class PseudoPerplexitiesMarginDataset:
    """All (variant, mask-position) pairs
    (reference: esme/variant.py:73-107)."""

    def __init__(self, seq: str, alphabet=Alphabet3):
        self.seq = seq
        self.alphabet = alphabet
        self.token = tokenize([seq], alphabet=alphabet)[0]
        self.variants = [
            (wt, pos + 1, mt, mask_pos + 1, mask_aa)
            for pos, wt in enumerate(seq)
            for mt in alphabet.amino_acids
            for mask_pos, mask_aa in enumerate(seq)
        ]

    def __len__(self):
        return len(self.variants)

    def __getitem__(self, idx):
        wt, pos, mt, mask_pos, mask_aa = self.variants[idx]
        token = self.token.copy()
        token[pos] = self.alphabet.token_to_idx[mt]
        token[mask_pos] = self.alphabet.mask_idx
        return {
            'token': token,
            'wt': wt,
            'pos': pos,
            'mt': mt,
            'wt_mask_idx': self.alphabet.token_to_idx[mask_aa],
            'mask_pos': mask_pos,
        }


def predict_pseudoperplexity_margin(model, seq, batch_size: int = 32,
                                    alphabet=None) -> pd.DataFrame:
    """Mean per-variant log-prob of wild-type residues under each
    mutated background (reference: esme/variant.py:219-246)."""
    alphabet = alphabet or model.alphabet
    ds = PseudoPerplexitiesMarginDataset(seq, alphabet=alphabet)

    frames = []
    for items, n_real in _batched_items(ds, batch_size):
        tokens = np.stack([it['token'] for it in items])
        logp = np.asarray(model.predict_log_prob(tokens))
        scores = [
            float(logp[b, items[b]['mask_pos'], items[b]['wt_mask_idx']])
            for b in range(n_real)
        ]
        frames.append(pd.DataFrame({
            'variant': [
                f"{items[b]['wt']}{items[b]['pos']}{items[b]['mt']}"
                for b in range(n_real)
            ],
            'score': scores,
        }))
    return pd.concat(frames).groupby('variant').mean()
