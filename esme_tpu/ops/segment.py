"""Packed-layout helpers: segment ids and positions from ``cu_lens``.

The whole framework computes over flat token vectors. Instead of the
varlen CUDA kernels of the reference (flash_attn_varlen_func,
reference: esme/attention.py:115-123), every op takes per-token
``segment ids`` — attention masks cross-segment pairs, pooling reduces
per segment. These helpers derive that metadata from the reference's
``(cu_lens, max_len)`` contract (reference: esme/alphabet.py:148-183)
with static shapes only.
"""

from __future__ import annotations

import jax.numpy as jnp


# Fake-tail segments are CHUNKED to one attention tile: a single fake
# segment spanning a long padding tail makes every tail q-block's span
# cover the whole tail (a 30k-token tail = 117-block spans), inflating
# both the wasted tile sweep and the job-budget bucket — measured as
# 1792/2048-job outlier buckets (full-program recompiles) for the
# leftover batch of each epoch (results/job_buckets_r5.txt). With
# 256-token fake chunks, tail spans are <= 2 blocks like real short
# sequences. Mirrored EXACTLY by flash.host_num_jobs_from_cu.
TAIL_CHUNK = 256


def segment_ids_from_cu_lens(cu_lens: jnp.ndarray, total: int) -> jnp.ndarray:
    """Per-token segment index ``(total,)`` from cumulative lengths.

    Token ``t`` in ``[cu_lens[i], cu_lens[i+1])`` gets id ``i``. Tokens
    past ``cu_lens[-1]`` (the static-shape padding tail) get ids past
    every real segment, advancing every :data:`TAIL_CHUNK` tokens (see
    note above), so they form fake segments that never attend real
    tokens. This replaces the reference's ``culen_indices``
    repeat_interleave (reference: esme/rotary.py:5-14) with a
    searchsorted that is O(T log S), static shaped, and jit-safe even
    when ``cu_lens`` has repeated (padded) tail values.
    """
    t = jnp.arange(total, dtype=cu_lens.dtype)
    seg = jnp.searchsorted(cu_lens[1:], t, side='right').astype(jnp.int32)
    tail = t >= cu_lens[-1]
    chunk = ((t - cu_lens[-1]) // TAIL_CHUNK).astype(jnp.int32)
    return jnp.where(tail, seg + chunk, seg)


def positions_from_cu_lens(cu_lens: jnp.ndarray, total: int,
                           seg_ids: jnp.ndarray | None = None) -> jnp.ndarray:
    """Within-sequence position of each flat token (reference:
    esme/rotary.py:5-14 computes the same via repeat_interleave)."""
    if seg_ids is None:
        seg_ids = segment_ids_from_cu_lens(cu_lens, total)
    starts = jnp.take(cu_lens, jnp.minimum(seg_ids, cu_lens.shape[0] - 1))
    t = jnp.arange(total, dtype=cu_lens.dtype)
    return (t - starts).astype(jnp.int32)


def padded_to_flat_meta(batch: int, seq_len: int, valid: jnp.ndarray):
    """Segment/position metadata for a padded ``(B, L)`` batch viewed as
    a flat ``(B*L,)`` packed vector.

    Valid tokens of row ``b`` form segment ``b``; pad positions get the
    fake segment id ``B``. This is the static-shape TPU equivalent of
    flash-attn's ``unpad_input`` gather (reference: esme/esm.py:238) —
    no gather at all: pad rows just never win the segment-mask.
    """
    row = jnp.repeat(jnp.arange(batch, dtype=jnp.int32), seq_len)
    col = jnp.tile(jnp.arange(seq_len, dtype=jnp.int32), batch)
    valid = valid.reshape(-1)
    seg_ids = jnp.where(valid, row, jnp.int32(batch))
    return seg_ids, col


def unpad_gather_meta(valid: jnp.ndarray):
    """Repack metadata for a padded ``(B, L)`` batch: valid tokens move
    to the front in row-major order, pads to the tail — the static-shape
    XLA analogue of flash-attn's ``unpad_input`` gather (reference:
    esme/esm.py:238). Total length stays ``B*L`` (shapes are static) but
    segment ids become *monotonic*, so the flash kernel's per-block
    spans are tight (≤ max_seqlen) instead of full-range.

    Each pad token gets its own fake segment id (``B + k``) so the
    repacked pad tail never attends within itself — its attention cost
    is one diagonal tile sweep, not O(P²).

    Returns ``(src, dst, seg_ids, pos_ids)``: ``src[j]`` is the flat
    source index feeding packed slot ``j`` (gather with ``take(·, src)``)
    and ``dst[i]`` the packed slot of flat token ``i`` (scatter back
    with ``take(out, dst)``).
    """
    B, L = valid.shape
    flat = valid.reshape(-1)
    n = flat.shape[0]
    nvalid = jnp.sum(flat)
    cum_v = jnp.cumsum(flat)
    cum_p = jnp.cumsum(~flat)
    dst = jnp.where(flat, cum_v - 1, nvalid + cum_p - 1).astype(jnp.int32)
    src = jnp.zeros(n, jnp.int32).at[dst].set(
        jnp.arange(n, dtype=jnp.int32))
    slot = jnp.arange(n, dtype=jnp.int32)
    row = src // jnp.int32(L)
    seg_ids = jnp.where(slot < nvalid, row,
                        jnp.int32(B) + (slot - nvalid)).astype(jnp.int32)
    # within-sequence position = rank among the row's valid tokens
    # (cumsum semantics like the reference, esme/embedding.py:36-52 —
    # exact column index when rows are left-aligned, which tokenize
    # guarantees)
    pos_flat = (jnp.cumsum(valid, axis=1) - 1).reshape(-1)
    pos_ids = jnp.where(slot < nvalid, jnp.take(pos_flat, src),
                        0).astype(jnp.int32)
    return src, dst, seg_ids, pos_ids


def segment_lengths(cu_lens: jnp.ndarray) -> jnp.ndarray:
    return cu_lens[1:] - cu_lens[:-1]
