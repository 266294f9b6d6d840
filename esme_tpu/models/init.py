"""Random parameter initialization for the ESM family.

Builds the stacked-per-layer param pytree consumed by
:mod:`esme_tpu.models.modules`. Init follows standard transformer
practice (truncated-normal kernels scaled by fan-in, ones/zeros norms);
the reference relies on torch layer defaults (reference:
esme/esm.py:154-174) — exact init parity is not required because
pretrained weights are always loaded for evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ESMConfig


def _dense(key, shape, dtype, fan_in):
    std = fan_in ** -0.5
    return (jax.random.truncated_normal(key, -2, 2, shape, jnp.float32)
            * std).astype(dtype)


def _norm(cfg, dim, bias=True, stacked=None):
    shape = (dim,) if stacked is None else (stacked, dim)
    p = {'scale': jnp.ones(shape, cfg.jnp_dtype)}
    if bias:
        p['bias'] = jnp.zeros(shape, cfg.jnp_dtype)
    return p


def _linear(key, cfg, d_in, d_out, bias, stacked=None):
    shape = (d_in, d_out) if stacked is None else (stacked, d_in, d_out)
    p = {'kernel': _dense(key, shape, cfg.jnp_dtype, d_in)}
    if bias:
        bshape = (d_out,) if stacked is None else (stacked, d_out)
        p['bias'] = jnp.zeros(bshape, cfg.jnp_dtype)
    return p


def init_params(cfg: ESMConfig, rng: jax.Array) -> dict:
    """Create a randomly-initialized param pytree for ``cfg``."""
    D, F, L, V = cfg.embed_dim, cfg.ffn_dim, cfg.num_layers, cfg.vocab_size
    keys = iter(jax.random.split(rng, 16))

    params = {
        'embed_tokens': (jax.random.normal(next(keys), (V, D), jnp.float32)
                         * 0.02).astype(cfg.jnp_dtype),
    }
    # padding row is zero, like nn.Embedding(padding_idx=…)
    params['embed_tokens'] = params['embed_tokens'].at[cfg.padding_idx].set(0)

    if cfg.learned_positions is not None:
        # +2 rows like the reference table (reference: esme/embedding.py:31)
        params['embed_positions'] = (
            jax.random.normal(next(keys), (cfg.learned_positions + 2, D),
                              jnp.float32) * 0.02
        ).astype(cfg.jnp_dtype).at[cfg.padding_idx].set(0)

    if cfg.emb_layer_norm_before:
        params['emb_norm_before'] = _norm(cfg, D)

    attn = {
        'norm': _norm(cfg, D, bias=cfg.norm_bias, stacked=L),
        'q': _linear(next(keys), cfg, D, D, cfg.bias, stacked=L),
        'k': _linear(next(keys), cfg, D, D, cfg.bias, stacked=L),
        'v': _linear(next(keys), cfg, D, D, cfg.bias, stacked=L),
        'out': _linear(next(keys), cfg, D, D, cfg.bias, stacked=L),
    }
    if cfg.qk_layernorm:
        attn['ln_q'] = _norm(cfg, D, bias=cfg.bias, stacked=L)
        attn['ln_k'] = _norm(cfg, D, bias=cfg.bias, stacked=L)

    if cfg.mlp == 'swiglu':
        mlp = {
            'norm': _norm(cfg, D, bias=cfg.norm_bias, stacked=L),
            'gate': _linear(next(keys), cfg, D, F, cfg.bias, stacked=L),
            'up': _linear(next(keys), cfg, D, F, cfg.bias, stacked=L),
            'down': _linear(next(keys), cfg, F, D, cfg.bias, stacked=L),
        }
    else:
        mlp = {
            'norm': _norm(cfg, D, bias=cfg.norm_bias, stacked=L),
            'fc1': _linear(next(keys), cfg, D, F, cfg.bias, stacked=L),
            'fc2': _linear(next(keys), cfg, F, D, cfg.bias, stacked=L),
        }

    params['layers'] = {'attn': attn, 'mlp': mlp}
    params['emb_norm_after'] = _norm(cfg, D, bias=cfg.final_ln_bias)
    params['lm_head'] = {
        'dense': _linear(next(keys), cfg, D, D, True),
        'norm': _norm(cfg, D),
        'final': _linear(next(keys), cfg, D, V, True),
    }
    return params
