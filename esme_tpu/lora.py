"""Named multi-adapter LoRA over param pytrees.

TPU-native equivalent of the reference's LoRA module wrapper
(reference: esme/lora.py:8-124). Instead of wrapping layer objects,
adapters live *inside* the linear param dicts as
``params['layers']['attn'][target]['lora'][name] =
{'a': (L, in, r), 'b': (L, r, out), 'scale': ()}``
and are applied at matmul time by :func:`esme_tpu.ops.linear.linear`
(``y + Σ (x@a)@b * scale``, scale = alpha/rank,
reference: esme/lora.py:43,77-91). Works over quantized base layers
unchanged — the base matmul dispatches on its own params
(reference: esme/lora.py:51-52 upcasts int8 similarly).

Init matches the reference: A ~ kaiming-uniform(a=√5) ⇒
U(±1/√in_features), B = 0, so adding adapters leaves the model output
unchanged (reference: esme/lora.py:68-71).

Save format: safetensors with torch-layout keys
``layers.{i}.self_attn.{q|k|v|out}.lora_A.{name}`` (rank, in) /
``lora_B.{name}`` (out, rank) and metadata
``{rank, alpha, dropout_p, layers, names}``
(reference: esme/esm.py:564-607) — adapters saved here load into the
reference and vice versa.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from safetensors import flax as stf

from .models.config import ESMConfig

_LAYER_TO_TARGET = {'query': 'q', 'key': 'k', 'value': 'v', 'output': 'out'}
_TARGET_TO_LAYER = {v: k for k, v in _LAYER_TO_TARGET.items()}


def _targets(layers: Sequence[str]) -> List[str]:
    extra = set(layers) - set(_LAYER_TO_TARGET)
    if extra:
        raise ValueError(
            f'layers must be a subset of {set(_LAYER_TO_TARGET)}, got {extra}')
    return [_LAYER_TO_TARGET[l] for l in layers]


def add_lora_params(params: dict, cfg: ESMConfig, rank: int = 16,
                    alpha: float = 16, layers=('query', 'value', 'output'),
                    adapter_names: Optional[Sequence[str]] = None,
                    dropout_p: float = 0.0,
                    rng: int | jax.Array = 0) -> Tuple[dict, dict]:
    """Attach named LoRA adapters to the attention projections
    (reference: esme/esm.py:495-543). Returns ``(params, lora_kwargs)``."""
    if isinstance(rng, int):
        rng = jax.random.key(rng)
    names = list(adapter_names) if adapter_names else ['default']
    targets = _targets(layers)
    dtype = cfg.jnp_dtype
    L, D = cfg.num_layers, cfg.embed_dim

    params = dict(params)
    params['layers'] = copy.deepcopy(params['layers'])
    attn = params['layers']['attn']

    for t in targets:
        adapters = dict(attn[t].get('lora', {}))
        for name in names:
            rng, key = jax.random.split(rng)
            bound = D ** -0.5
            adapters[name] = {
                'a': jax.random.uniform(key, (L, D, rank), jnp.float32,
                                        -bound, bound).astype(dtype),
                'b': jnp.zeros((L, rank, D), dtype),
                # per-layer stacked scalar (scans with the layer stack);
                # fresh array per adapter so buffer donation stays 1:1
                'scale': jnp.full((L,), alpha / rank, jnp.float32),
            }
        attn[t] = {**attn[t], 'lora': adapters}

    lora_kwargs = {'rank': rank, 'alpha': alpha, 'dropout_p': dropout_p,
                   'layers': sorted(set(layers)), 'names': names}
    return params, lora_kwargs


def lora_state_dict(params: dict, adapter_names=None
                    ) -> Dict[str, jnp.ndarray]:
    """Flat torch-layout LoRA tensors (reference: esme/lora.py:111-124)."""
    out: Dict[str, jnp.ndarray] = {}
    attn = params['layers']['attn']
    for t, p in attn.items():
        lora = p.get('lora') if isinstance(p, dict) else None
        if not lora:
            continue
        for name, ad in lora.items():
            if adapter_names and name not in adapter_names:
                continue
            L = ad['a'].shape[0]
            for i in range(L):
                out[f'layers.{i}.self_attn.{t}.lora_A.{name}'] = \
                    ad['a'][i].T      # (rank, in)
                out[f'layers.{i}.self_attn.{t}.lora_B.{name}'] = \
                    ad['b'][i].T      # (out, rank)
    return out


def save_lora(path: str, params: dict, lora_kwargs: dict,
              adapter_names=None):
    """(reference: esme/esm.py:564-585)"""
    state = lora_state_dict(params, adapter_names)
    assert state, 'No LoRA adapters found to save'
    metadata = {
        'rank': str(lora_kwargs['rank']),
        'alpha': str(lora_kwargs['alpha']),
        'dropout_p': str(lora_kwargs['dropout_p']),
        'layers': ','.join(lora_kwargs['layers']),
        'names': ','.join(adapter_names or lora_kwargs['names']),
        'format': 'pt',
    }
    stf.save_file(state, path, metadata)


def load_lora(path: str, params: dict, names=None,
              cfg: Optional[ESMConfig] = None) -> Tuple[dict, dict]:
    """Attach adapters described by the file's metadata and fill their
    weights (reference: esme/esm.py:587-607)."""
    from .models.io import read_metadata
    metadata = read_metadata(path)
    adapter_names = (names or metadata['names']).split(',') \
        if isinstance(names or metadata['names'], str) else list(names)

    flat = stf.load_file(path)

    # infer structure from the params tree
    if cfg is None:
        first = params['layers']['attn']['q']
        kernel = first.get('kernel')
        num_layers = (kernel if kernel is not None
                      else first['qvalue']).shape[0]
    else:
        num_layers = cfg.num_layers

    rank = int(metadata['rank'])
    alpha = float(metadata['alpha'])
    layer_names = metadata['layers'].split(',')

    params = dict(params)
    params['layers'] = copy.deepcopy(params['layers'])
    attn = params['layers']['attn']

    for lname in layer_names:
        t = _LAYER_TO_TARGET[lname]
        adapters = dict(attn[t].get('lora', {}))
        base_dtype = jnp.bfloat16
        if 'kernel' in attn[t]:
            base_dtype = attn[t]['kernel'].dtype
        for name in adapter_names:
            a = jnp.stack([
                jnp.asarray(
                    flat[f'layers.{i}.self_attn.{t}.lora_A.{name}']).T
                for i in range(num_layers)]).astype(base_dtype)
            b = jnp.stack([
                jnp.asarray(
                    flat[f'layers.{i}.self_attn.{t}.lora_B.{name}']).T
                for i in range(num_layers)]).astype(base_dtype)
            adapters[name] = {
                'a': a, 'b': b,
                'scale': jnp.full((num_layers,), alpha / rank, jnp.float32)}
        attn[t] = {**attn[t], 'lora': adapters}

    lora_kwargs = {'rank': rank, 'alpha': alpha,
                   'dropout_p': float(metadata['dropout_p']),
                   'layers': layer_names, 'names': adapter_names}
    return params, lora_kwargs


def trainable_mask(params: dict, lora_only=None,
                   train_lmhead: bool = False) -> dict:
    """Boolean pytree for optax masking — the functional equivalent of
    ``mark_only_lora_as_trainable`` + ``mark_lmhead``
    (reference: esme/lora.py:97-108, esme/esm.py:609-615).

    ``lora_only``: None → train LoRA adapters only iff any exist,
    otherwise everything; True/list-of-names → only (those) adapters;
    False → full fine-tune.
    """
    has_lora = bool(lora_state_dict(params))
    if lora_only is None:
        lora_only = has_lora
    allowed_names = None
    if isinstance(lora_only, (list, tuple, set)):
        allowed_names = set(lora_only)
        lora_only = True

    _linears = {'q', 'k', 'v', 'out', 'fc1', 'fc2', 'gate', 'up', 'down',
                'dense', 'final'}

    from .quant import NON_TRAINABLE_QUANT_LEAVES

    def mark(path, leaf):
        keys = [getattr(p, 'key', None) for p in path]
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return False      # int8/NF4 quantized storage
        if keys[-1] in NON_TRAINABLE_QUANT_LEAVES and len(keys) >= 2 \
                and keys[-2] in _linears:
            return False      # quantization storage, never trained
        if 'scale' in keys and 'lora' in keys:
            return False      # adapter metadata, never trained
        if not lora_only:
            return True
        if 'lora' in keys:
            if allowed_names is None:
                return True
            # path: ... 'lora' name 'a'/'b'
            name = keys[keys.index('lora') + 1]
            return name in allowed_names
        if train_lmhead and keys and keys[0] == 'lm_head':
            return True
        return False

    return jax.tree_util.tree_map_with_path(mark, params)
