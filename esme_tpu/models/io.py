"""Safetensors weight IO in the reference's exact key schema.

Files written here are loadable by the reference implementation and
vice-versa: keys are ``embed_tokens.weight``,
``layers.{i}.self_attn.{norm,q,k,v,out,layernorm_q,layernorm_k}.*``,
``layers.{i}.final.{0,1,3}.*`` (ESM2 GELU) or
``layers.{i}.final.{0,1.activation,1.fc,2}.*`` (ESMC SwiGLU),
``emb_layer_norm_after.*``, ``lm_head.{dense,layer_norm,final}.*``
(reference: esme/esm.py:376-411, workflow/common/safetensor.py:29-64,
workflow/common/safetensor_c.py:19-49), with metadata
``{name, num_layers, embed_dim, attention_heads}``
(reference: esme/esm.py:328-339).

Torch stores linear weights ``(out, in)``; our kernels are ``(in, out)``
and per-layer tensors are stacked on a leading axis for ``lax.scan`` —
both transforms happen here at the file boundary.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from safetensors import safe_open
from safetensors import numpy as stn

from .config import ESMConfig, esm1b_config, esm1v_config, esm2_config, \
    esmc_config

_NP_DTYPES = {'bfloat16': ml_dtypes.bfloat16, 'float32': np.float32,
              'float16': np.float16}


def read_metadata(path: str) -> Dict[str, str]:
    """Read the safetensors header metadata without loading tensors."""
    with open(path, 'rb') as f:
        header_len = struct.unpack('<Q', f.read(8))[0]
        header = json.loads(f.read(header_len))
    return header.get('__metadata__', {}) or {}


def config_from_metadata(metadata: Dict[str, str],
                         dtype='bfloat16') -> Tuple[ESMConfig, str]:
    """Dispatch on the metadata ``name`` like the reference's
    ``ESM.from_pretrained`` (reference: esme/esm.py:50-68)."""
    name = metadata['name']
    family = name.split('_')[0]
    if family == 'esm2':
        cfg = esm2_config(num_layers=int(metadata['num_layers']),
                          embed_dim=int(metadata['embed_dim']),
                          attention_heads=int(metadata['attention_heads']),
                          dtype=dtype)
    elif family == 'esmc':
        cfg = esmc_config(num_layers=int(metadata['num_layers']),
                          embed_dim=int(metadata['embed_dim']),
                          attention_heads=int(metadata['attention_heads']),
                          dtype=dtype)
    elif family == 'esm1b':
        cfg = esm1b_config(dtype=dtype)
    elif family == 'esm1v':
        cfg = esm1v_config(dtype=dtype)
    else:
        raise ValueError(f'unknown model family in metadata: {name}')
    return cfg, name


def _maybe(flat, out, file_key, value):
    if value is not None:
        out[file_key] = value
    return out


def params_to_flat(params: dict, cfg: ESMConfig) -> Dict[str, np.ndarray]:
    """Flatten the stacked param pytree into the reference key schema.

    Device arrays are fetched to host ONCE as whole stacked leaves (a
    handful of large transfers), then sliced per layer in numpy — per
    -layer device slicing would cost hundreds of round-trips on a
    remote/tunneled backend."""
    params = jax.tree.map(np.asarray, params)
    flat: Dict[str, np.ndarray] = {}
    flat['embed_tokens.weight'] = params['embed_tokens']

    if cfg.learned_positions is not None:
        flat['embed_positions.weight'] = params['embed_positions']
    if cfg.emb_layer_norm_before:
        flat['emb_layer_norm_before.weight'] = params['emb_norm_before']['scale']
        flat['emb_layer_norm_before.bias'] = params['emb_norm_before']['bias']

    def put_norm(prefix, p):
        flat[f'{prefix}.weight'] = p['scale']
        if 'bias' in p:
            flat[f'{prefix}.bias'] = p['bias']

    def put_linear(prefix, p):
        if 'qvalue' in p:
            # our quantized extension of the schema: storage stays in
            # the kernel-native (in, out) layout (the reference cannot
            # save quantized models at all — bitsandbytes limitation)
            flat[f'{prefix}.qweight'] = p['qvalue']
            flat[f'{prefix}.qscale'] = p['scale']
            if 'outlier_idx' in p:
                flat[f'{prefix}.qoutlier_idx'] = p['outlier_idx']
                flat[f'{prefix}.qoutlier_rows'] = p['outlier_rows']
        else:
            flat[f'{prefix}.weight'] = np.ascontiguousarray(
                np.swapaxes(p['kernel'], -1, -2))
        if 'bias' in p:
            flat[f'{prefix}.bias'] = p['bias']

    L = cfg.num_layers
    layers = params['layers']
    for i in range(L):
        sub = jax.tree.map(lambda x: x[i], layers)
        attn, mlp = sub['attn'], sub['mlp']
        put_norm(f'layers.{i}.self_attn.norm', attn['norm'])
        for j in ('q', 'k', 'v', 'out'):
            put_linear(f'layers.{i}.self_attn.{j}', attn[j])
        if cfg.qk_layernorm:
            put_norm(f'layers.{i}.self_attn.layernorm_q', attn['ln_q'])
            put_norm(f'layers.{i}.self_attn.layernorm_k', attn['ln_k'])
        put_norm(f'layers.{i}.final.0', mlp['norm'])
        if cfg.mlp == 'swiglu':
            put_linear(f'layers.{i}.final.1.activation', mlp['gate'])
            put_linear(f'layers.{i}.final.1.fc', mlp['up'])
            put_linear(f'layers.{i}.final.2', mlp['down'])
        else:
            put_linear(f'layers.{i}.final.1', mlp['fc1'])
            put_linear(f'layers.{i}.final.3', mlp['fc2'])

    put_norm('emb_layer_norm_after', params['emb_norm_after'])
    put_linear('lm_head.dense', params['lm_head']['dense'])
    put_norm('lm_head.layer_norm', params['lm_head']['norm'])
    final = params['lm_head']['final']
    if 'kernel' in final:
        put_linear('lm_head.final', final)
    else:
        # tied head: materialize the reference schema's duplicate tensor
        flat['lm_head.final.weight'] = params['embed_tokens']
        if 'bias' in final:
            flat['lm_head.final.bias'] = final['bias']
    return flat


def flat_to_params(flat, cfg: ESMConfig, quantization: Optional[str] = None
                   ) -> dict:
    """Rebuild the stacked param pytree from reference-schema tensors.

    ``flat`` is any mapping ``key -> array`` supporting ``in`` — a plain
    dict or the lazy safetensors reader from :func:`load_pretrained`.
    The whole build runs on HOST numpy (per-layer reads, per-layer
    quantization, host-side stacking); leaves transfer to device once at
    the end, so the full-precision model never materializes on device —
    the streaming behavior of the reference's per-layer quantized
    loaders (reference: esme/esm.py:448-472).

    ``quantization`` in {None, '8bit', '4bit'} quantizes each attention
    and MLP linear as it is read (reference walks the same set,
    esme/esm.py:448-472); embeddings, norms, and the LM head stay in
    ``cfg.dtype`` like the reference's loaders.
    """
    from ..quant import quantize_kernel_np
    dt = _NP_DTYPES[cfg.dtype]

    def get(key):
        return np.asarray(flat[key]).astype(dt)

    def norm(prefix):
        p = {'scale': get(f'{prefix}.weight')}
        if f'{prefix}.bias' in flat:
            p['bias'] = get(f'{prefix}.bias')
        return p

    def lin(prefix, quant=None):
        if f'{prefix}.qweight' in flat:
            # pre-quantized checkpoint (our schema extension)
            p = {'qvalue': np.asarray(flat[f'{prefix}.qweight']),
                 'scale': np.asarray(flat[f'{prefix}.qscale'])}
            if f'{prefix}.qoutlier_idx' in flat:
                p['outlier_idx'] = np.asarray(
                    flat[f'{prefix}.qoutlier_idx'])
                p['outlier_rows'] = np.asarray(
                    flat[f'{prefix}.qoutlier_rows']).astype(dt)
        elif quant is not None:
            kernel = np.swapaxes(
                np.asarray(flat[f'{prefix}.weight']).astype(np.float32),
                -1, -2)
            p = quantize_kernel_np(np.ascontiguousarray(kernel), quant)
        else:
            p = {'kernel': np.ascontiguousarray(
                np.swapaxes(get(f'{prefix}.weight'), -1, -2))}
        if f'{prefix}.bias' in flat:
            p['bias'] = get(f'{prefix}.bias')
        return p

    def stack(fn, pattern, **kw):
        per_layer = [fn(pattern.format(i=i), **kw)
                     for i in range(cfg.num_layers)]
        return jax.tree.map(lambda *xs: np.stack(xs), *per_layer)

    params = {'embed_tokens': get('embed_tokens.weight')}
    if cfg.learned_positions is not None:
        params['embed_positions'] = get('embed_positions.weight')
    if cfg.emb_layer_norm_before:
        params['emb_norm_before'] = norm('emb_layer_norm_before')

    q = quantization
    attn = {
        'norm': stack(norm, 'layers.{i}.self_attn.norm'),
        'q': stack(lin, 'layers.{i}.self_attn.q', quant=q),
        'k': stack(lin, 'layers.{i}.self_attn.k', quant=q),
        'v': stack(lin, 'layers.{i}.self_attn.v', quant=q),
        'out': stack(lin, 'layers.{i}.self_attn.out', quant=q),
    }
    if cfg.qk_layernorm:
        attn['ln_q'] = stack(norm, 'layers.{i}.self_attn.layernorm_q')
        attn['ln_k'] = stack(norm, 'layers.{i}.self_attn.layernorm_k')

    if cfg.mlp == 'swiglu':
        mlp = {
            'norm': stack(norm, 'layers.{i}.final.0'),
            'gate': stack(lin, 'layers.{i}.final.1.activation', quant=q),
            'up': stack(lin, 'layers.{i}.final.1.fc', quant=q),
            'down': stack(lin, 'layers.{i}.final.2', quant=q),
        }
    else:
        mlp = {
            'norm': stack(norm, 'layers.{i}.final.0'),
            'fc1': stack(lin, 'layers.{i}.final.1', quant=q),
            'fc2': stack(lin, 'layers.{i}.final.3', quant=q),
        }

    params['layers'] = {'attn': attn, 'mlp': mlp}
    params['emb_norm_after'] = norm('emb_layer_norm_after')
    if cfg.tie_lm_head:
        final = {}
        if 'lm_head.final.bias' in flat:
            final['bias'] = get('lm_head.final.bias')
    else:
        final = lin('lm_head.final')
    params['lm_head'] = {
        'dense': lin('lm_head.dense'),
        'norm': norm('lm_head.layer_norm'),
        'final': final,
    }
    # one transfer per stacked leaf; device never sees full precision
    return jax.tree.map(jnp.asarray, params)


class _LazyFlat:
    """Mapping view over an open safetensors file: tensors are read
    from disk (mmap) only when accessed, then freed with the caller."""

    def __init__(self, f):
        self._f = f
        self._keys = frozenset(f.keys())

    def __contains__(self, key):
        return key in self._keys

    def __getitem__(self, key):
        return self._f.get_tensor(key)

    def keys(self):
        return self._keys


def save_pretrained(path: str, params: dict, cfg: ESMConfig, name: str):
    """Write a reference-compatible safetensors checkpoint. Quantized
    params save too (``.qweight``/``.qscale`` keys + ``quantization``
    metadata — our extension; the reference cannot save quantized)."""
    flat = params_to_flat(params, cfg)
    metadata = {
        'name': name,
        'num_layers': str(cfg.num_layers),
        'embed_dim': str(cfg.embed_dim),
        'attention_heads': str(cfg.attention_heads),
        'format': 'pt',
    }
    qdtypes = {np.dtype(np.int8): '8bit', np.dtype(np.uint8): '4bit'}
    arrays = {}
    for k, v in flat.items():
        a = np.asarray(v)
        arrays[k] = a
        if k.endswith('.qweight'):
            metadata['quantization'] = qdtypes[a.dtype]
        if k.endswith('.qoutlier_idx'):
            # schema marker: qweight rows at qoutlier_idx are stored
            # zeroed with exact values in qoutlier_rows. Readers that
            # ignore those keys would silently reconstruct weights with
            # zeroed hot rows — load_pretrained fails loudly when this
            # marker is present but the keys are missing.
            metadata['qscheme'] = 'outlier-rows-v1'
    stn.save_file(arrays, path, metadata)


def load_pretrained(path: str, dtype='bfloat16',
                    quantization: Optional[str] = None
                    ) -> Tuple[ESMConfig, dict, str]:
    """Stream a reference-schema safetensors checkpoint into
    ``(config, params, name)``.

    Tensors are read lazily per layer on host; with ``quantization``
    set, each linear is quantized before the next layer is read and
    only the quantized bytes ever reach the device (reference loader
    walk: esme/esm.py:448-472). Also detects lm_head↔embedding weight
    tying (the contract the reference asserts for its pretrained
    checkpoints, reference: tests/test_esm.py:110,126,143) and realizes
    it: the tied head projects through ``embed_tokens`` so fine-tuning
    gradients accumulate into one tensor, like the reference's shared
    Parameter."""
    from dataclasses import replace
    metadata = read_metadata(path)
    cfg, name = config_from_metadata(metadata, dtype=dtype)
    if 'quantization' in metadata and quantization is None:
        quantization = metadata['quantization']
    with safe_open(path, framework='numpy') as f:
        flat = _LazyFlat(f)
        if metadata.get('qscheme') == 'outlier-rows-v1':
            # outlier-decomposed checkpoints store the hottest rows of
            # qweight zeroed; loading without the qoutlier_* side keys
            # silently reconstructs wrong weights — refuse instead.
            missing = [k for k in sorted(flat.keys())
                       if k.endswith('.qweight')
                       and k[:-len('.qweight')] + '.qoutlier_idx'
                       not in flat]
            if missing:
                raise ValueError(
                    'checkpoint metadata declares qscheme='
                    f'outlier-rows-v1 but {len(missing)} qweight '
                    'tensors lack qoutlier_idx/qoutlier_rows keys '
                    f'(first: {missing[0]}); the quantized weights '
                    'cannot be reconstructed without them')
        if 'lm_head.final.weight' in flat:
            head = flat['lm_head.final.weight']
            emb = flat['embed_tokens.weight']
            if head.shape == emb.shape and bool((head == emb).all()):
                cfg = replace(cfg, tie_lm_head=True)
            del head, emb
        params = flat_to_params(flat, cfg, quantization=quantization)
    return cfg, params, name
