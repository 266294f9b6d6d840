"""Model architecture configs for the ESM family.

One frozen dataclass drives every family member; the per-family
constants mirror the reference's class constructors
(reference: esme/esm.py:132-174 ESM2, 618-679 ESM1b, 682-735 ESM1v,
798-850 ESMC).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Optional

import jax.numpy as jnp


@dataclass(frozen=True)
class ESMConfig:
    family: str                      # 'esm2' | 'esm1b' | 'esm1v' | 'esmc'
    num_layers: int
    embed_dim: int
    attention_heads: int
    vocab_size: int = 33
    rotary: bool = True
    # ESMC-style per-projection q/k LayerNorm (reference: esme/attention.py:86-89)
    qk_layernorm: bool = False
    bias: bool = True                # linear/LN biases
    mlp: str = 'gelu'                # 'gelu' | 'swiglu'
    expand: float = 4.0
    residue_scaling: float = 1.0     # reference: esme/esm.py:839
    # learned positions (ESM1b/1v): table size (reference: esme/esm.py:632-634)
    learned_positions: Optional[int] = None
    emb_layer_norm_before: bool = False  # ESM1b only
    final_ln_bias: bool = True           # ESMC's last LN has no bias
    # pre-attn/pre-mlp LayerNorms keep biases even when linears drop
    # theirs (ESMC: layernorm_qkv.0 and ffn.0 have biases,
    # reference: workflow/common/safetensor_c.py:31-43)
    norm_bias: bool = True
    # zero <mask> embeddings (ESM2/1b/1v but not ESMC,
    # reference: esme/esm.py:189 vs esm.py:876)
    zero_mask_embedding: bool = True
    # lm_head.final.weight tied to embed_tokens.weight — detected at
    # load time; pretrained ESM2 checkpoints carry the tie (reference
    # asserts it: tests/test_esm.py:110,126,143). When True the head
    # projects through the embedding matrix so fine-tuning gradients
    # flow to one tensor, like the reference's shared Parameter.
    tie_lm_head: bool = False
    padding_idx: int = 1
    mask_idx: int = 32
    dtype: str = 'bfloat16'

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.attention_heads

    @property
    def ffn_dim(self) -> int:
        if self.mlp == 'swiglu':
            # round (8/3 d) up to a multiple of 256
            # (reference: esme/attention.py:217-219)
            return int((self.expand * self.embed_dim + 255) // 256 * 256)
        return int(self.embed_dim * self.expand)

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    def with_dtype(self, dtype) -> 'ESMConfig':
        return replace(self, dtype=jnp.dtype(dtype).name)


def esm2_config(num_layers=33, embed_dim=1280, attention_heads=20,
                dtype='bfloat16') -> ESMConfig:
    """(reference: esme/esm.py:132-174)"""
    return ESMConfig(family='esm2', num_layers=num_layers,
                     embed_dim=embed_dim, attention_heads=attention_heads,
                     vocab_size=33, rotary=True, qk_layernorm=False,
                     bias=True, mlp='gelu', expand=4.0, dtype=dtype)


def esm1b_config(dtype='bfloat16') -> ESMConfig:
    """(reference: esme/esm.py:627-634): fixed 33L/1280d/20h, learned
    positions (4096), pre-embedding LayerNorm."""
    return ESMConfig(family='esm1b', num_layers=33, embed_dim=1280,
                     attention_heads=20, vocab_size=33, rotary=False,
                     bias=True, mlp='gelu', expand=4.0,
                     learned_positions=4096, emb_layer_norm_before=True,
                     dtype=dtype)


def esm1v_config(dtype='bfloat16') -> ESMConfig:
    """(reference: esme/esm.py:691-696): ESM1b minus emb_layer_norm_before."""
    return ESMConfig(family='esm1v', num_layers=33, embed_dim=1280,
                     attention_heads=20, vocab_size=33, rotary=False,
                     bias=True, mlp='gelu', expand=4.0,
                     learned_positions=4096, emb_layer_norm_before=False,
                     dtype=dtype)


def esmc_config(num_layers=30, embed_dim=960, attention_heads=15,
                dtype='bfloat16') -> ESMConfig:
    """(reference: esme/esm.py:798-850): vocab 64, SwiGLU, q/k LayerNorm,
    no biases, residue scaling sqrt(L/36). 600M variant = 36L/1152d/18h
    (reference: workflow/common/safetensor_c.py:8-13)."""
    return ESMConfig(family='esmc', num_layers=num_layers,
                     embed_dim=embed_dim, attention_heads=attention_heads,
                     vocab_size=64, rotary=True, qk_layernorm=True,
                     bias=False, mlp='swiglu', expand=8 / 3,
                     residue_scaling=math.sqrt(num_layers / 36),
                     final_ln_bias=False, zero_mask_embedding=False,
                     dtype=dtype)


# Published ESM2 sizes (reference: esme/download.py:4-22 model registry)
ESM2_SIZES = {
    'esm2_8m': dict(num_layers=6, embed_dim=320, attention_heads=20),
    'esm2_35m': dict(num_layers=12, embed_dim=480, attention_heads=20),
    'esm2_150m': dict(num_layers=30, embed_dim=640, attention_heads=20),
    'esm2_650m': dict(num_layers=33, embed_dim=1280, attention_heads=20),
    'esm2_3b': dict(num_layers=36, embed_dim=2560, attention_heads=40),
    'esm2_15b': dict(num_layers=48, embed_dim=5120, attention_heads=40),
}

ESMC_SIZES = {
    'esmc_300m': dict(num_layers=30, embed_dim=960, attention_heads=15),
    'esmc_600m': dict(num_layers=36, embed_dim=1152, attention_heads=18),
}


def config_for(name: str, dtype='bfloat16') -> ESMConfig:
    """Resolve a model name (e.g. 'esm2_650m') to a config."""
    name = name.lower()
    if name in ESM2_SIZES:
        return esm2_config(**ESM2_SIZES[name], dtype=dtype)
    if name in ESMC_SIZES:
        return esmc_config(**ESMC_SIZES[name], dtype=dtype)
    if name == 'esm2':
        return esm2_config(**ESM2_SIZES['esm2_650m'], dtype=dtype)
    if name == 'esmc':
        return esmc_config(**ESMC_SIZES['esmc_300m'], dtype=dtype)
    if name == 'esm1b':
        return esm1b_config(dtype=dtype)
    if name.startswith('esm1v'):
        return esm1v_config(dtype=dtype)
    raise ValueError(f'unknown model name: {name}')
