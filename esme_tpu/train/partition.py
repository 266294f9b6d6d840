"""Split param pytrees into trainable / frozen leaf tuples.

The functional counterpart of the reference's
``mark_only_lora_as_trainable`` (reference: esme/lora.py:97-108):
instead of masking optimizer updates (which still computes and stores
full-size gradients for frozen weights, and breaks outright on
integer-quantized leaves), the trainers differentiate ONLY the
trainable leaves — frozen leaves flow through the loss as plain
arguments. LoRA fine-tunes therefore never materialize trunk-sized
gradients, and QLoRA-style training over int8/NF4 bases just works.
"""

from __future__ import annotations

from typing import Tuple

import jax


def split_by_mask(tree, mask) -> Tuple[tuple, tuple, object, tuple]:
    """Split ``tree`` into ``(train_leaves, frozen_leaves, treedef,
    flags)`` by a same-structure boolean ``mask``."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    flags = tuple(jax.tree_util.tree_leaves(mask))
    assert len(flags) == len(leaves), \
        'trainable mask structure does not match params'
    train = tuple(l for l, f in zip(leaves, flags) if f)
    frozen = tuple(l for l, f in zip(leaves, flags) if not f)
    return train, frozen, treedef, flags


def merge_leaves(train, frozen, treedef, flags):
    """Inverse of :func:`split_by_mask`."""
    it_t, it_f = iter(train), iter(frozen)
    return jax.tree_util.tree_unflatten(
        treedef, [next(it_t) if f else next(it_f) for f in flags])
