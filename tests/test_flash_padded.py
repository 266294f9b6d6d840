"""Flash kernel over the padded-view (non-monotonic segment id) layout
must match the einsum oracle — regression test for span capping."""

import numpy as np

from esme_tpu import ESM2, tokenize
from esme_tpu.models.config import esm2_config
from esme_tpu.ops.attention import attention_reference
from esme_tpu.ops.flash import flash_segment_attention

import jax.numpy as jnp


def test_flash_nonmonotonic_segments():
    # padded-view ids: [0,0,0,pad, 1,1,1,1, 2,2,pad,pad] style
    rng = np.random.default_rng(0)
    seg = np.asarray([0, 0, 0, 9, 1, 1, 1, 1, 2, 2, 9, 9] * 24,
                     np.int32)     # 288 tokens, fake id 9 interleaved
    T = seg.shape[0]
    q = jnp.asarray(rng.standard_normal((T, 2, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, 2, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, 2, 32)), jnp.float32)
    segj = jnp.asarray(seg)
    ref = attention_reference(q, k, v, segj)
    # no max_seqlen: spans must become full-range and stay correct
    out = flash_segment_attention(q, k, v, segj, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_model_padded_flash_matches_reference_impl():
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    m = ESM2(config=cfg, rng=0)
    toks = tokenize(['MAGVLKE' * 20, 'LKE' * 10], alphabet=m.alphabet)
    a = np.asarray(m.forward(toks, attn_impl='reference'))
    b = np.asarray(m.forward(toks, attn_impl='flash'))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)
