"""Context (sequence) parallelism over a mesh axis.

No reference analogue — the reference handles long context by packing,
positional-table extension, and window truncation only (SURVEY.md §5);
its parallelism inventory has SP/CP = "No" (SURVEY.md §2.4). Here the
packed token axis is sharded over a mesh axis: embeddings, LayerNorms,
MLPs, and the LM head are token-local so they run on the shard
untouched, and attention gathers keys/values across the axis
(``all_gather``) while queries stay local — per-chip activation memory
drops by the axis size, enabling packed batches (or single sequences)
whose activations exceed one chip's HBM. The all-gather's autodiff
transpose reduce-scatters the k/v gradients, so the same wrapper
trains.

Composable with data parallelism (distinct mesh axes). Layout contract:
the global flat token vector is split contiguously across the axis, so
``all_gather(..., tiled=True)`` reconstructs the global order.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

import warnings

with warnings.catch_warnings():
    warnings.simplefilter('ignore', DeprecationWarning)
    from jax.experimental.shard_map import shard_map


def make_kv_gather(axis: str):
    """The attention hook: gather local (T_loc, H, D) keys/values and
    segment ids into global (T, H, D) / (T,) along ``axis``."""
    def kv_gather(k, v, seg_ids):
        k_full = jax.lax.all_gather(k, axis, axis=0, tiled=True)
        v_full = jax.lax.all_gather(v, axis, axis=0, tiled=True)
        seg_full = jax.lax.all_gather(seg_ids, axis, axis=0, tiled=True)
        return k_full, v_full, seg_full
    return kv_gather


@partial(jax.jit, static_argnames=('cfg', 'mesh', 'axis', 'with_head',
                                   'log_prob', 'attn_impl',
                                   'checkpointing', 'max_seqlen'))
def forward_flat_cp(params, cfg, tokens, seg_ids, pos_ids, *,
                    mesh, axis: str = 'seq', with_head: bool = True,
                    log_prob: bool = False, attn_impl: str = 'auto',
                    checkpointing: bool = False,
                    max_seqlen: Optional[int] = None):
    """Context-parallel :func:`esme_tpu.models.esm.forward_flat`:
    tokens/seg_ids/pos_ids shard over ``axis``, params replicate,
    output returns sharded over ``axis`` (token-local logits).

    ``tokens.shape[0]`` must be divisible by the axis size (pad the
    packed batch to a budget divisible by it — the data plane's
    ``token_per_batch`` contract makes this free).
    """
    from ..models.esm import forward_flat

    n = mesh.shape[axis]
    T = tokens.shape[0]
    if T % n:
        raise ValueError(f'token count {T} not divisible by '
                         f'{axis} axis size {n}')

    kv_gather = make_kv_gather(axis)
    if attn_impl == 'auto':
        # Pallas rect kernel on TPU; XLA-scan rect attention elsewhere
        attn_impl = 'flash' if jax.default_backend() == 'tpu' \
            else 'reference'

    def local(params, tokens, seg_ids, pos_ids):
        return forward_flat(
            params, cfg, tokens, seg_ids, pos_ids,
            with_head=with_head, log_prob=log_prob, attn_impl=attn_impl,
            checkpointing=checkpointing, kv_gather=kv_gather,
            max_seqlen=max_seqlen)

    tok_spec = P(axis)
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), tok_spec, tok_spec, tok_spec),
        out_specs=tok_spec,
        check_rep=False,
    )(params, tokens, seg_ids, pos_ids)


def context_parallel_log_prob(model, tokens, pad_args, mesh,
                              axis: str = 'seq'):
    """Convenience: packed ``predict_log_prob`` under context
    parallelism. Pads the flat tokens to the axis size before
    sharding; the pad forms one fake trailing segment."""
    from ..models.esm import packed_meta

    cu_lens, max_len = pad_args
    tokens = jnp.asarray(tokens, jnp.int32)
    n = mesh.shape[axis]
    pad = (-tokens.shape[0]) % n
    if pad:
        fill = model.config.padding_idx or 0
        tokens = jnp.pad(tokens, (0, pad), constant_values=fill)
    seg_ids, pos_ids = packed_meta(jnp.asarray(cu_lens, jnp.int32),
                                   tokens.shape[0])
    out = forward_flat_cp(model.params, model.config, tokens, seg_ids,
                          pos_ids, mesh=mesh, axis=axis, log_prob=True,
                          checkpointing=model.checkpointing,
                          max_seqlen=int(max_len))
    return out[:tokens.shape[0] - pad] if pad else out
