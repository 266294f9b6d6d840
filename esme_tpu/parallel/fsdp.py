"""FSDP parameter sharding: partition specs + gather hooks.

ZeRO-3-style sharding (superset of the reference's DeepSpeed ZeRO-2,
reference: esme/deepspeed.py:12-30), the TPU way:

* every large param leaf is sharded on one dimension over the ``fsdp``
  mesh axis (:func:`fsdp_partition_specs`);
* inside the training step (a ``shard_map`` over the mesh) each scan
  iteration all-gathers just its layer's shards
  (:func:`make_layer_gather`) — so peak memory is one layer's full
  weights plus all layers' shards;
* the gradient reduce-scatter is *free*: it is the autodiff transpose
  of ``lax.all_gather``;
* with ``jax.checkpoint`` around the scan body the gather re-runs in
  the backward pass instead of being saved — ZeRO-3 semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, n_shards: int, axis: str, min_size: int) -> P:
    if leaf.size < min_size:
        return P()
    dims = [None] * leaf.ndim
    # prefer the trailing dims (stacked layer leaves are (L, in, out))
    for d in reversed(range(leaf.ndim)):
        if leaf.shape[d] % n_shards == 0 and leaf.shape[d] >= n_shards:
            dims[d] = axis
            return P(*dims)
    return P()


def fsdp_partition_specs(params: dict, mesh: Mesh, axis: str = 'fsdp',
                         min_size: int = 2 ** 15) -> dict:
    """PartitionSpec pytree matching ``params``: each large leaf sharded
    on one divisible dim over ``axis``; small leaves replicated."""
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda l: _leaf_spec(l, n, axis, min_size), params)


def shard_params(params: dict, mesh: Mesh, specs: Optional[dict] = None,
                 axis: str = 'fsdp') -> tuple[dict, dict]:
    """Place ``params`` on the mesh according to (possibly computed)
    specs. Returns ``(sharded_params, specs)``."""
    specs = specs if specs is not None else \
        fsdp_partition_specs(params, mesh, axis)
    placed = jax.tree.map(
        lambda l, s: jax.device_put(l, NamedSharding(mesh, s)),
        params, specs)
    return placed, specs


def _gather_leaf(x, spec: P, axis: str, drop_leading: bool):
    """all_gather a shard_map-local leaf back to full size."""
    spec_dims = tuple(spec) if spec is not None else ()
    if drop_leading:
        spec_dims = spec_dims[1:] if spec_dims else ()
    for d, name in enumerate(spec_dims):
        if name == axis:
            return jax.lax.all_gather(x, axis, axis=d, tiled=True)
    return x


def make_layer_gather(layer_specs: dict, axis: str = 'fsdp'):
    """Gather hook for the layer scan: ``layer_specs`` are the specs of
    the *stacked* (L, ...) leaves; inside the scan body the leading L
    dim is gone, so spec dims shift left by one."""
    def gather(layer_params):
        return jax.tree.map(
            lambda x, s: _gather_leaf(x, s, axis, drop_leading=True),
            layer_params, layer_specs)
    return gather


def make_outer_gather(specs: dict, axis: str = 'fsdp'):
    """Gather hook for non-layer params (embeddings, norms, lm head)."""
    def gather(params):
        return jax.tree.map(
            lambda x, s: _gather_leaf(x, s, axis, drop_leading=False),
            params, specs)
    return gather
