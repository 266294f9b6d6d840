"""Long-context extension for learned-position models (ESM1b/1v).

The reference extends ESM1b/1v from 1024 to 4096 positions by copying
the old 1026-row table into a larger one and training *only*
``embed_positions.weight``
(reference: workflow/positional_emb/train_positional.py:42-56). Rotary
models need nothing — unbounded by construction.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp


def extend_positions(model, new_max_positions: int, rng: int = 0,
                     std: float = 0.02):
    """Grow the learned position table in place; returns the model.

    Old rows are copied; new rows are random-normal like fresh init
    (reference copies rows then trains only this tensor)."""
    cfg = model.config
    assert cfg.learned_positions is not None, \
        'extend_positions only applies to learned-position models'
    old = model.params['embed_positions']
    new_rows = new_max_positions + 2
    if new_rows <= old.shape[0]:
        raise ValueError(f'{new_max_positions} <= current '
                         f'{cfg.learned_positions}')
    key = jax.random.key(rng) if isinstance(rng, int) else rng
    table = (jax.random.normal(key, (new_rows, old.shape[1]), jnp.float32)
             * std).astype(old.dtype)
    table = table.at[:old.shape[0]].set(old)
    model.params = {**model.params, 'embed_positions': table}
    model.config = replace(cfg, learned_positions=new_max_positions)
    return model


def positions_only_mask(params: dict) -> dict:
    """Trainable mask selecting only ``embed_positions``
    (reference: workflow/positional_emb/train_positional.py:42-56)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: bool(path and getattr(path[0], 'key', None)
                             == 'embed_positions'),
        params)
