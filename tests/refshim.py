"""Load the reference implementation (/root/reference) as a test oracle.

The environment has no network (recorded: huggingface.co unreachable, no
cached checkpoints anywhere on disk), so the reference's own test
strategy — differential testing against downloaded pretrained weights
(reference: tests/conftest.py:17-46) — cannot be reproduced verbatim.
The strongest available substitute is to run the reference's *actual
model code* on CPU as the golden oracle: every architectural fact
(layer order, norm placement, residue scaling, GELU flavor, rotary
convention, embedding zeroing, weight layout) then comes from the
reference itself rather than from a re-implementation that could share
a misconception with the code under test.

The only reference dependency missing in this image is ``flash_attn``
(CUDA-only). This module registers a pure-torch shim for the two
entry points the reference uses before importing it:

* ``flash_attn.flash_attn_varlen_func`` — naive per-segment softmax
  attention (reference call sites: esme/attention.py:115-123,
  esme/pooling.py:126-134). O(L^2) and slow, which is fine for tests.
* ``flash_attn.bert_padding.unpad_input`` / ``pad_input``
  (reference call sites: esme/esm.py:238,255).

The shim is original code written from the public flash-attn API
contract; nothing is copied from the reference.
"""

import sys
import types

import numpy as np
import torch

REFERENCE_PATH = '/root/reference'


def _naive_varlen_attention(q, k, v, cu_seqlens_q=None, cu_seqlens_k=None,
                            max_seqlen_q=None, max_seqlen_k=None,
                            dropout_p=0.0, softmax_scale=None,
                            causal=False, **_ignored):
    """Per-segment softmax attention over packed (total, heads, dim)."""
    assert not causal
    scale = softmax_scale or q.shape[-1] ** -0.5
    cu_q = cu_seqlens_q.tolist()
    cu_k = cu_seqlens_k.tolist()
    out = torch.empty_like(q)
    for i in range(len(cu_q) - 1):
        qs, qe = cu_q[i], cu_q[i + 1]
        ks, ke = cu_k[i], cu_k[i + 1]
        qi = q[qs:qe].float()                     # (lq, h, d)
        ki = k[ks:ke].float()
        vi = v[ks:ke].float()
        att = torch.einsum('qhd,khd->hqk', qi, ki) * scale
        att = torch.softmax(att, dim=-1)
        oi = torch.einsum('hqk,khd->qhd', att, vi)
        out[qs:qe] = oi.to(q.dtype)
    return out


def _unpad_input(hidden_states, attention_mask, *args, **kwargs):
    """(B, L, ...) + bool mask -> packed (total, ...), indices, cu, max."""
    mask = attention_mask.bool()
    lens = mask.sum(dim=-1, dtype=torch.int32)
    indices = torch.nonzero(mask.reshape(-1), as_tuple=False).flatten()
    cu = torch.nn.functional.pad(
        torch.cumsum(lens, 0, dtype=torch.int32), (1, 0))
    flat = hidden_states.reshape(-1, *hidden_states.shape[2:])
    return flat[indices], indices, cu, int(lens.max()), lens


def _pad_input(hidden_states, indices, batch, seqlen):
    out = torch.zeros(batch * seqlen, *hidden_states.shape[1:],
                      dtype=hidden_states.dtype,
                      device=hidden_states.device)
    out[indices] = hidden_states
    return out.reshape(batch, seqlen, *hidden_states.shape[1:])


class _Perplexity:
    """Minimal stand-in for ``torchmetrics.text.Perplexity``: softmax the
    logits, accumulate NLL at the targets, compute = exp(mean)."""

    def __init__(self, ignore_index=None):
        self.ignore_index = ignore_index
        self.total = 0.0
        self.count = 0

    def to(self, device):
        return self

    def update(self, preds, target):
        logp = torch.log_softmax(preds.float(), dim=-1)
        nll = -logp.gather(-1, target.long().unsqueeze(-1)).squeeze(-1)
        if self.ignore_index is not None:
            keep = target != self.ignore_index
            nll = nll[keep]
        self.total += float(nll.sum())
        self.count += nll.numel()

    def compute(self):
        return torch.tensor(np.exp(self.total / max(self.count, 1)))


def install_shim():
    if 'flash_attn' not in sys.modules:
        fa = types.ModuleType('flash_attn')
        fa.flash_attn_varlen_func = _naive_varlen_attention
        bp = types.ModuleType('flash_attn.bert_padding')
        bp.unpad_input = _unpad_input
        bp.pad_input = _pad_input
        fa.bert_padding = bp
        sys.modules['flash_attn'] = fa
        sys.modules['flash_attn.bert_padding'] = bp
    try:
        import torchmetrics.text  # noqa: F401
    except ImportError:
        tm = types.ModuleType('torchmetrics')
        tx = types.ModuleType('torchmetrics.text')
        tx.Perplexity = _Perplexity
        tm.text = tx
        sys.modules['torchmetrics'] = tm
        sys.modules['torchmetrics.text'] = tx


def import_reference():
    """Import the reference `esme` package with the shim installed.

    Returns the module dict {name: module} for the submodules tests use.
    Raises ImportError if the reference tree is unavailable (tests
    should skip in that case).
    """
    install_shim()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import esme.esm as ref_esm
    import esme.alphabet as ref_alphabet
    import esme.rotary as ref_rotary
    import esme.embedding as ref_embedding
    import esme.head as ref_head
    import esme.pooling as ref_pooling
    import esme.lora as ref_lora
    import esme.variant as ref_variant
    import esme.loss as ref_loss
    return {
        'esm': ref_esm,
        'alphabet': ref_alphabet,
        'rotary': ref_rotary,
        'embedding': ref_embedding,
        'head': ref_head,
        'pooling': ref_pooling,
        'lora': ref_lora,
        'variant': ref_variant,
        'loss': ref_loss,
    }


def state_dict_to_safetensors(model, path, name, num_layers, embed_dim,
                              attention_heads):
    """Save a reference model's state_dict as a reference-schema
    safetensors file (the model attribute names ARE the file schema,
    reference: esme/esm.py:376-411)."""
    import safetensors.torch as st
    sd = {k: v.detach().clone().contiguous()
          for k, v in model.state_dict().items()}
    st.save_file(sd, str(path), metadata={
        'name': name,
        'num_layers': str(num_layers),
        'embed_dim': str(embed_dim),
        'attention_heads': str(attention_heads),
        'format': 'pt',
    })


def seed_all(seed=0):
    torch.manual_seed(seed)
    np.random.seed(seed)
