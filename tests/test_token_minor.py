"""Token-minor residual-stream parity: the (C, T) feature-major path
(models/modules.py layer_stack_tm + ops/flash.py flash_tm) must match
the standard (T, C) path — forward and gradients — since it is pure
relayout, not different math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esme_tpu.alphabet import Alphabet, mask_tokens
from esme_tpu.loss import cross_entropy
from esme_tpu.models.config import ESMConfig
from esme_tpu.models.esm import ESM2, ESMC, forward_flat, packed_meta


def _packed(T, seed=0):
    rng = np.random.default_rng(seed)
    lens, tot = [], 0
    while tot + 80 <= T - 64:
        n = int(rng.integers(30, 80))
        lens.append(n)
        tot += n
    cu = np.cumsum([0, *lens]).astype(np.int32)
    toks = np.full(T, Alphabet.padding_idx, np.int32)
    toks[:cu[-1]] = rng.integers(4, 24, cu[-1])
    return toks, cu, max(lens)


@pytest.mark.parametrize('family', ['esm2', 'esmc'])
def test_tm_forward_matches_reference_impl(family):
    T = 512
    toks, cu, max_len = _packed(T)
    if family == 'esm2':
        model = ESM2(num_layers=2, embed_dim=128, attention_heads=2,
                     rng=0, dtype='float32')
    else:
        model = ESMC(num_layers=2, embed_dim=128, attention_heads=2,
                     rng=0, dtype='float32')
    seg, pos = packed_meta(jnp.asarray(cu), T)
    tj = jnp.asarray(toks)

    # attn_impl='flash' + T % ALIGN == 0 -> token-minor stream
    out_tm = forward_flat(model.params, model.config, tj, seg, pos,
                          with_head=True, attn_impl='flash',
                          max_seqlen=max_len)
    out_ref = forward_flat(model.params, model.config, tj, seg, pos,
                           with_head=True, attn_impl='reference',
                           max_seqlen=max_len)
    n = int(cu[-1])
    np.testing.assert_allclose(np.asarray(out_tm[:n]),
                               np.asarray(out_ref[:n]),
                               atol=2e-4, rtol=2e-4)


def test_tm_grads_match_reference_impl():
    T = 512
    toks, cu, max_len = _packed(T, seed=1)
    model = ESM2(num_layers=2, embed_dim=128, attention_heads=2,
                 rng=0, dtype='float32')
    seg, pos = packed_meta(jnp.asarray(cu), T)
    masked, mask = mask_tokens(toks, alphabet=Alphabet,
                               rng=np.random.default_rng(2))
    mask[int(cu[-1]):] = False
    mj, tj = jnp.asarray(masked), jnp.asarray(toks)
    mk = jnp.asarray(mask)

    def loss(params, impl):
        logits = forward_flat(params, model.config, mj, seg, pos,
                              with_head=True, attn_impl=impl,
                              max_seqlen=max_len)
        return cross_entropy(logits, tj, mk)

    l_tm, g_tm = jax.value_and_grad(loss)(model.params, 'flash')
    l_rf, g_rf = jax.value_and_grad(loss)(model.params, 'reference')
    np.testing.assert_allclose(float(l_tm), float(l_rf), rtol=1e-5)
    flat_tm = jax.tree_util.tree_leaves_with_path(g_tm)
    flat_rf = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_rf)}
    for k, v in flat_tm:
        ref = flat_rf[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), atol=5e-3, rtol=5e-3,
            err_msg=jax.tree_util.keystr(k))


def test_tm_lora_and_quant_paths():
    """LoRA adapters and a quantized base run through the token-minor
    linears identically to the standard path."""
    T = 512
    toks, cu, max_len = _packed(T, seed=3)
    model = ESM2(num_layers=2, embed_dim=128, attention_heads=2,
                 rng=0, dtype='float32')
    model.add_lora(rank=4, alpha=4, adapter_names=['t'])
    seg, pos = packed_meta(jnp.asarray(cu), T)
    tj = jnp.asarray(toks)
    a = forward_flat(model.params, model.config, tj, seg, pos,
                     with_head=True, attn_impl='flash',
                     max_seqlen=max_len, lora_names=('t',))
    b = forward_flat(model.params, model.config, tj, seg, pos,
                     with_head=True, attn_impl='reference',
                     max_seqlen=max_len, lora_names=('t',))
    n = int(cu[-1])
    np.testing.assert_allclose(np.asarray(a[:n]), np.asarray(b[:n]),
                               atol=2e-4, rtol=2e-4)

    model.quantize('8bit')
    a = forward_flat(model.params, model.config, tj, seg, pos,
                     with_head=True, attn_impl='flash',
                     max_seqlen=max_len)
    b = forward_flat(model.params, model.config, tj, seg, pos,
                     with_head=True, attn_impl='reference',
                     max_seqlen=max_len)
    np.testing.assert_allclose(np.asarray(a[:n]), np.asarray(b[:n]),
                               atol=2e-4, rtol=2e-4)


def test_tm_under_fsdp_gather():
    """Token-minor stack + FSDP layer gather inside shard_map matches
    the single-device standard path (the sharded trainer resolves to
    the tm path on TPU; force it with attn_impl='flash' here)."""
    from esme_tpu.data import PackedBatch
    from esme_tpu.parallel.mesh import make_mesh
    from esme_tpu.train.distributed import ShardedMaskedPLM
    from esme_tpu.train.trainer import MaskedPLM

    T = 512
    toks, cu, max_len = _packed(T, seed=5)
    masked, mask = mask_tokens(toks, alphabet=Alphabet,
                               rng=np.random.default_rng(6))
    mask[int(cu[-1]):] = False
    batch = PackedBatch(tokens=toks, cu_lens=cu, max_len=max_len,
                        masked_tokens=masked, mask=mask)

    def mk():
        return ESM2(num_layers=2, embed_dim=128, attention_heads=2,
                    rng=0, dtype='float32')

    loss_single = MaskedPLM(mk(), attn_impl='flash',
                            learning_rate=1e-4).training_step(batch)

    mesh = make_mesh(data=2, fsdp=4)
    splm = ShardedMaskedPLM(mk(), mesh, attn_impl='flash',
                            learning_rate=1e-4)
    loss_sharded = splm.training_step([batch, batch])
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-5)


def test_tm_odd_head_dim():
    """head_dim=24 (the ESM2-35M shape — not a multiple of the bf16
    sublane tile) runs through the token-minor flash path and matches
    the reference implementation."""
    from esme_tpu.models.config import config_for
    from esme_tpu.models.esm import _class_for, forward_flat

    cfg = config_for('esm2_35m', dtype='float32')
    cfg = cfg.replace(num_layers=2) if hasattr(cfg, 'replace') else cfg
    model = _class_for(cfg.family)(config=cfg, rng=0)
    T = 512
    toks, cu, max_len = _packed(T, seed=9)
    seg, pos = packed_meta(jnp.asarray(cu), T)
    tj = jnp.asarray(toks)
    a = forward_flat(model.params, model.config, tj, seg, pos,
                     with_head=True, attn_impl='flash',
                     max_seqlen=max_len)
    b = forward_flat(model.params, model.config, tj, seg, pos,
                     with_head=True, attn_impl='reference',
                     max_seqlen=max_len)
    n = int(cu[-1])
    np.testing.assert_allclose(np.asarray(a[:n]), np.asarray(b[:n]),
                               atol=5e-4, rtol=5e-4)


def test_swiglu_linear_memory_lean_vjp_parity():
    """The fused SwiGLU VJPs (both layouts) match plain autodiff
    through the unfused path in value and all gradients."""
    import jax
    import jax.numpy as jnp
    from esme_tpu.models.modules import _swiglu_linear_t, swiglu_linear

    rng = np.random.default_rng(0)
    T, C, Hd = 96, 32, 88
    h = jnp.asarray(rng.standard_normal((T, C)), jnp.float32)
    gk = jnp.asarray(rng.standard_normal((C, Hd)) * 0.1, jnp.float32)
    uk = jnp.asarray(rng.standard_normal((C, Hd)) * 0.1, jnp.float32)
    dk = jnp.asarray(rng.standard_normal((Hd, C)) * 0.1, jnp.float32)

    def plain(h, gk, uk, dk):
        return jnp.sum(
            (jax.nn.silu(h @ gk) * (h @ uk)) @ dk) ** 2

    def fused(h, gk, uk, dk):
        return jnp.sum(swiglu_linear(h, gk, uk, dk)) ** 2

    def fused_t(h, gk, uk, dk):
        return jnp.sum(_swiglu_linear_t(h.T, gk, uk, dk)) ** 2

    v0, g0 = jax.value_and_grad(plain, argnums=(0, 1, 2, 3))(
        h, gk, uk, dk)
    for fn in (fused, fused_t):
        v, g = jax.value_and_grad(fn, argnums=(0, 1, 2, 3))(
            h, gk, uk, dk)
        np.testing.assert_allclose(float(v), float(v0), rtol=1e-4)
        for a, b in zip(g, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


def test_esmc_fused_swiglu_in_model():
    """ESMC forward/gradients unchanged by the fused SwiGLU path (it
    engages automatically for plain bias-free kernels)."""
    import jax
    import jax.numpy as jnp
    import esme_tpu.models.modules as modules
    from esme_tpu import ESMC, tokenize_unpad
    from esme_tpu.loss import cross_entropy
    from esme_tpu.models.esm import forward_flat, packed_meta

    m = ESMC(num_layers=2, embed_dim=64, attention_heads=4, rng=0,
             dtype='float32')
    assert modules._plain_swiglu_params(
        jax.tree.map(lambda x: x[0], m.params['layers'])['mlp'])
    seqs = ['MAGVLKE' * 10, 'LKE' * 25]
    tok, _, cu, ml = tokenize_unpad(seqs, alphabet=m.alphabet)
    T = int(tok.shape[0])
    seg, pos = packed_meta(jnp.asarray(np.asarray(cu)), T)
    targets = jnp.asarray(np.asarray(tok), jnp.int32)
    mask = jnp.asarray(np.ones(T, bool))

    def loss(params, use_fused):
        orig = modules._plain_swiglu_params
        if not use_fused:
            modules._plain_swiglu_params = lambda p: False
        try:
            logits = forward_flat(params, m.config,
                                  jnp.asarray(np.asarray(tok), jnp.int32),
                                  seg, pos, with_head=True,
                                  attn_impl='reference',
                                  max_seqlen=int(ml))
        finally:
            modules._plain_swiglu_params = orig
        return cross_entropy(logits, targets, mask)

    v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(m.params)
    # different static closure -> force retrace by perturbing a kwarg:
    jax.clear_caches()
    v2, g2 = jax.value_and_grad(lambda p: loss(p, False))(m.params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4), g1, g2)
