"""Independent torch oracle for differential testing.

A from-the-spec reimplementation of the ESM architectures in plain
torch (fp32, per-sequence full attention, no packing). It consumes the
reference safetensors key schema produced by
``esme_tpu.models.io.params_to_flat``, so any disagreement with the JAX
model exposes a real bug in either the math or the weight IO —
mirroring the reference's golden-model strategy of testing against
upstream fair-esm (reference: tests/conftest.py:92-210).

This is test-only code and intentionally naive/slow.
"""

import math

import torch
import torch.nn.functional as F


def _lin(flat, prefix, x):
    w = flat[f'{prefix}.weight']
    y = x @ w.T
    if f'{prefix}.bias' in flat:
        y = y + flat[f'{prefix}.bias']
    return y


def _ln(flat, prefix, x, eps=1e-5):
    w = flat[f'{prefix}.weight']
    b = flat.get(f'{prefix}.bias')
    mean = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    y = (x - mean) / torch.sqrt(var + eps) * w
    if b is not None:
        y = y + b
    return y


def _rope(x, positions, base=10000.0):
    # half-split convention: rotate_half = cat(-x2, x1)
    d = x.shape[-1]
    inv_freq = 1.0 / (base ** (torch.arange(0, d, 2).float() / d))
    freqs = positions.float()[:, None] * inv_freq[None, :]
    emb = torch.cat([freqs, freqs], dim=-1)          # (n, d)
    cos, sin = emb.cos(), emb.sin()
    cos = cos[:, None, :]
    sin = sin[:, None, :]
    x1, x2 = x.chunk(2, dim=-1)
    rotated = torch.cat([-x2, x1], dim=-1)
    return x * cos + rotated * sin


def forward_oracle(flat, cfg, tokens):
    """Forward one unpadded 1D token sequence -> (n, vocab) logits.

    ``flat``: dict of torch fp32 tensors in the reference key schema.
    ``cfg``: esme_tpu ESMConfig.
    """
    tokens = torch.as_tensor(tokens, dtype=torch.long)
    n = tokens.shape[0]
    H = cfg.attention_heads
    Dh = cfg.head_dim

    x = flat['embed_tokens.weight'][tokens]
    if cfg.zero_mask_embedding:
        x = x.masked_fill((tokens == cfg.mask_idx)[:, None], 0.0)

    if cfg.learned_positions is not None:
        rows = torch.arange(n) + 1 + cfg.padding_idx
        x = x + flat['embed_positions.weight'][rows]
    if cfg.emb_layer_norm_before:
        x = _ln(flat, 'emb_layer_norm_before', x)

    positions = torch.arange(n)

    for i in range(cfg.num_layers):
        p = f'layers.{i}'
        # attention block
        h = _ln(flat, f'{p}.self_attn.norm', x)
        q = _lin(flat, f'{p}.self_attn.q', h)
        k = _lin(flat, f'{p}.self_attn.k', h)
        v = _lin(flat, f'{p}.self_attn.v', h)
        if cfg.qk_layernorm:
            q = _ln(flat, f'{p}.self_attn.layernorm_q', q)
            k = _ln(flat, f'{p}.self_attn.layernorm_k', k)
        q = q.view(n, H, Dh)
        k = k.view(n, H, Dh)
        v = v.view(n, H, Dh)
        if cfg.rotary:
            q = _rope(q, positions)
            k = _rope(k, positions)
        scores = torch.einsum('thd,shd->hts', q, k) / math.sqrt(Dh)
        probs = torch.softmax(scores, dim=-1)
        o = torch.einsum('hts,shd->thd', probs, v).reshape(n, H * Dh)
        o = _lin(flat, f'{p}.self_attn.out', o)
        x = x + o / cfg.residue_scaling

        # mlp block
        h = _ln(flat, f'{p}.final.0', x)
        if cfg.mlp == 'swiglu':
            gate = _lin(flat, f'{p}.final.1.activation', h)
            up = _lin(flat, f'{p}.final.1.fc', h)
            h = _lin(flat, f'{p}.final.2', F.silu(gate) * up)
        else:
            h = _lin(flat, f'{p}.final.1', h)
            h = F.gelu(h)          # exact erf gelu
            h = _lin(flat, f'{p}.final.3', h)
        x = x + h / cfg.residue_scaling

    x = _ln(flat, 'emb_layer_norm_after', x)
    h = F.gelu(_lin(flat, 'lm_head.dense', x))
    h = _ln(flat, 'lm_head.layer_norm', h)
    return _lin(flat, 'lm_head.final', h)
