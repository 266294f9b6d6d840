"""Transformer layer, embedding, and head apply functions.

Pure functions over param pytrees: the TPU-native equivalent of the
reference's nn.Modules (reference: esme/attention.py:10-281 attention +
layer, esme/head.py:8-27 RobertaLMHead, esme/embedding.py:7-107 learned
positions). Per-layer parameters are stacked on a leading axis and the
layer stack runs under ``lax.scan`` so XLA compiles one layer body
regardless of depth; ``jax.checkpoint`` wraps the body for activation
checkpointing (reference: esme/esm.py:19-25,244-245).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.attention import segment_attention
from ..ops.headsplit import _BLOCK_T, merge_heads, split_heads_rotary
from ..ops.linear import linear, mxu_precision
from ..ops.norm import apply_norm
from ..ops.rotary import apply_rotary, apply_rotary_qk, rotary_cos_sin


_SQRT_2_OVER_PI = 0.7978845608028654
_TANH_COEF = 0.044715
_INV_SQRT_2PI = 0.3989422804014327


@jax.custom_vjp
def _gelu_recompute(x: jnp.ndarray) -> jnp.ndarray:
    """GELU whose backward saves ONLY the input and recomputes the
    derivative. Plain autodiff through the tanh/erf chain saves ~5
    activation-sized intermediates; inside the layer scan those stack
    per layer and dominated un-checkpointed training memory (6 stacked
    ``(L, T, 4D)`` bf16 buffers = ~19GB at a 10k-token ESM2-650M
    batch). Recomputing costs one extra tanh/erf on the VPU in bwd."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _gelu_fwd(x):
    return _gelu_recompute(x), x


def _gelu_bwd(x, g):
    if x.dtype == jnp.bfloat16:
        x3 = x * x * x
        u = _SQRT_2_OVER_PI * (x + _TANH_COEF * x3)
        t = jnp.tanh(u)
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _TANH_COEF * x * x)
        d = 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du
    else:
        cdf = 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))
        pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
        d = cdf + x * pdf
    return ((g * d).astype(x.dtype),)


_gelu_recompute.defvjp(_gelu_fwd, _gelu_bwd)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU matching torch's nn.GELU (exact erf) at the activation
    dtype's resolution.

    In fp32 the exact erf form is used (logits-parity oracle runs in
    fp32). In bf16 the tanh approximation is used: its error vs exact
    erf is < 0.003 absolute — below one bf16 ulp of gelu(x) for the
    range where they differ — while erf's long polynomial costs ~11% of
    the whole ESM2-650M forward on the VPU."""
    return _gelu_recompute(x)


def _gelu_deriv(x):
    if x.dtype == jnp.bfloat16:
        u = _SQRT_2_OVER_PI * (x + _TANH_COEF * x * x * x)
        t = jnp.tanh(u)
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _TANH_COEF * x * x)
        return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du
    cdf = 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
    return cdf + x * pdf


@jax.custom_vjp
def gelu_linear(x, kernel, bias):
    """``(gelu(x)) @ kernel + bias`` saving only ``x`` for backward —
    the GELU output (another ``(T, 4D)`` tensor per layer under the
    scan) is recomputed from ``x`` with one tanh. The same trade a
    fused matmul-with-GELU-epilogue kernel makes."""
    y = jnp.dot(gelu(x), kernel, preferred_element_type=jnp.float32,
                precision=mxu_precision(x, kernel)).astype(x.dtype)
    return y + bias if bias is not None else y


def _gelu_linear_fwd(x, kernel, bias):
    return gelu_linear(x, kernel, bias), (x, kernel, bias is not None)


def _gelu_linear_bwd(res, dy):
    x, kernel, has_bias = res
    g = gelu(x)
    prec = mxu_precision(x, kernel)
    lead = tuple(range(x.ndim - 1))
    dh = jnp.dot(dy, kernel.T, preferred_element_type=jnp.float32,
                 precision=prec).astype(x.dtype)
    dx = dh * _gelu_deriv(x).astype(x.dtype)
    dkernel = jnp.tensordot(g, dy, axes=(lead, lead)).astype(kernel.dtype)
    dbias = jnp.sum(dy, axis=lead) if has_bias else None
    return dx, dkernel, dbias


gelu_linear.defvjp(_gelu_linear_fwd, _gelu_linear_bwd)


def attention_block(x, params, cfg, seg_ids, pos_ids,
                    lora_names: Optional[Sequence[str]] = None,
                    attn_impl: str = 'auto',
                    max_seqlen: Optional[int] = None,
                    rope: Optional[tuple] = None,
                    lora_dropout: float = 0.0, dropout_rng=None,
                    kv_gather=None, num_jobs: Optional[int] = None):
    """Multi-head self-attention over the packed layout
    (reference: esme/attention.py:91-139).

    ``x``: (T, D). LayerNorm is folded into the block; q/k optionally
    re-normalized over the full embed dim (ESMC pre-layernorm,
    reference: esme/attention.py:104-105) before the head split.
    """
    h = apply_norm(x, params['norm'])
    rngs = [None] * 4
    if dropout_rng is not None and lora_dropout > 0.0:
        rngs = [jax.random.fold_in(dropout_rng, i) for i in range(4)]
    q = linear(h, params['q'], lora_names, lora_dropout, rngs[0])
    k = linear(h, params['k'], lora_names, lora_dropout, rngs[1])
    v = linear(h, params['v'], lora_names, lora_dropout, rngs[2])

    if cfg.qk_layernorm:
        q = apply_norm(q, params['ln_q'])
        k = apply_norm(k, params['ln_k'])

    T = x.shape[0]
    H, Dh = cfg.attention_heads, cfg.head_dim

    if kv_gather is not None:
        # context parallelism: local queries over globally gathered
        # keys/values (esme_tpu.parallel.context; no reference
        # analogue — the reference has no sequence parallelism)
        q = q.reshape(T, H, Dh)
        k = k.reshape(T, H, Dh)
        v = v.reshape(T, H, Dh)
        if cfg.rotary:
            if rope is not None:
                cos, sin = rope
                q = apply_rotary(q, cos, sin)
                k = apply_rotary(k, cos, sin)
            else:
                q, k = apply_rotary_qk(q, k, pos_ids)
        k_full, v_full, seg_k = kv_gather(k, v, seg_ids)
        if attn_impl in ('flash', 'auto'):
            # Pallas rect kernel: block-span skipping means each chip
            # touches only the ±max_seqlen neighborhood of its shard
            from ..ops.flash import flash_rect_attention
            o = flash_rect_attention(q, k_full, v_full, seg_ids, seg_k,
                                     max_seqlen=max_seqlen)
        else:
            from ..ops.attention import attention_rect
            o = attention_rect(q, k_full, v_full, seg_ids, seg_k)
        return linear(o.reshape(T, H * Dh), params['out'], lora_names,
                      lora_dropout, rngs[3])

    if attn_impl == 'auto':
        on_tpu = jax.default_backend() == 'tpu'
        attn_impl = 'flash' if (on_tpu and T >= 256) else 'reference'

    if attn_impl == 'skip':
        # profiling aid (tools/decompose_fwd.py): identity attention —
        # all projections/relayout-free, isolates the matmul+norm cost
        return linear(q, params['out'], lora_names, lora_dropout, rngs[3])

    if attn_impl == 'flash' and T % _BLOCK_T == 0:
        # fused path: one bandwidth pass does head-split + relayout to
        # the kernel-native (H, T, D) + RoPE; the inverse relayout
        # happens on the attention output. No XLA transposes, no
        # separate rotary passes.
        if cfg.rotary:
            cos, sin = (rope if rope is not None else
                        rotary_cos_sin(pos_ids, Dh, dtype=x.dtype))
        else:
            cos = jnp.ones((T, Dh), x.dtype)
            sin = jnp.zeros((T, Dh), x.dtype)
        from ..ops.flash import ALIGN, DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q
        if T % ALIGN == 0:
            # single AD boundary around split+RoPE+flash+merge: saves
            # the (T, H·D) projections instead of (H, T, 64) tensors
            # (2x lane-padding waste each) — see ops/fused_attn.py
            from ..ops.fused_attn import fused_rotary_flash
            o_m = fused_rotary_flash(q, k, v, cos, sin, seg_ids, H,
                                     DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                                     max_seqlen, None, num_jobs)
            return linear(o_m, params['out'], lora_names,
                          lora_dropout, rngs[3])
        qh, kh, vh = split_heads_rotary(q, k, v, cos, sin, H)
        o = segment_attention(qh, kh, vh, seg_ids, impl='flash',
                              max_seqlen=max_seqlen, layout='htd')
        return linear(merge_heads(o), params['out'], lora_names,
                      lora_dropout, rngs[3])

    q = q.reshape(T, H, Dh)
    k = k.reshape(T, H, Dh)
    v = v.reshape(T, H, Dh)

    if cfg.rotary:
        if rope is not None:           # precomputed once per forward
            cos, sin = rope
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
        else:
            q, k = apply_rotary_qk(q, k, pos_ids)

    o = segment_attention(q, k, v, seg_ids, impl=attn_impl,
                          max_seqlen=max_seqlen)
    o = o.reshape(T, H * Dh)
    return linear(o, params['out'], lora_names, lora_dropout, rngs[3])


def _silu_deriv(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


@jax.custom_vjp
def swiglu_linear(h, gk, uk, dk):
    """``(silu(h@gk) * (h@uk)) @ dk`` saving only ``h`` — the SwiGLU
    twin of :func:`gelu_linear`. Plain autodiff saves gate, up, AND
    the silu product (three ``(T, ~2.7C)`` tensors per layer under the
    scan — ESMC-300M could not run un-checkpointed at a 10k-token
    budget, results/train_runtime__esmc_300m_nockpt round-5 OOM);
    recomputing costs two matmuls + one silu in backward. Bias-free
    (ESMC's MLP has no biases, reference: esme/attention.py:217-227)."""
    prec = mxu_precision(h, gk)
    g = jnp.dot(h, gk, preferred_element_type=jnp.float32,
                precision=prec).astype(h.dtype)
    u = jnp.dot(h, uk, preferred_element_type=jnp.float32,
                precision=prec).astype(h.dtype)
    return jnp.dot(jax.nn.silu(g) * u, dk,
                   preferred_element_type=jnp.float32,
                   precision=prec).astype(h.dtype)


def _swiglu_linear_fwd(h, gk, uk, dk):
    return swiglu_linear(h, gk, uk, dk), (h, gk, uk, dk)


def _swiglu_linear_bwd(res, dy):
    h, gk, uk, dk = res
    prec = mxu_precision(h, gk)
    lead = tuple(range(h.ndim - 1))

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=prec).astype(h.dtype)

    g = mm(h, gk)
    u = mm(h, uk)
    sg = jax.nn.silu(g)
    dsu = mm(dy, dk.T)
    dg = (dsu * u * _silu_deriv(g).astype(h.dtype)).astype(h.dtype)
    du = (dsu * sg).astype(h.dtype)
    dh = mm(dg, gk.T) + mm(du, uk.T)
    dgk = jnp.tensordot(h, dg, axes=(lead, lead)).astype(gk.dtype)
    duk = jnp.tensordot(h, du, axes=(lead, lead)).astype(uk.dtype)
    ddk = jnp.tensordot(sg * u, dy, axes=(lead, lead)).astype(dk.dtype)
    return dh, dgk, duk, ddk


swiglu_linear.defvjp(_swiglu_linear_fwd, _swiglu_linear_bwd)


def _plain_swiglu_params(params):
    """True iff the SwiGLU triple is plain bias-free kernels (no LoRA,
    no quantization) — the memory-lean fused path's contract."""
    return all('kernel' in params[k] and not params[k].get('lora')
               and 'bias' not in params[k]
               for k in ('gate', 'up', 'down'))


def mlp_block(x, params, cfg):
    """Position-wise MLP: LN -> GELU MLP (ESM2,
    reference: esme/attention.py:228-236) or LN -> SwiGLU -> Linear
    (ESMC, reference: esme/attention.py:217-227,258-281)."""
    h = apply_norm(x, params['norm'])
    if cfg.mlp == 'swiglu':
        if _plain_swiglu_params(params):
            return swiglu_linear(h, params['gate']['kernel'],
                                 params['up']['kernel'],
                                 params['down']['kernel'])
        gate = linear(h, params['gate'])
        up = linear(h, params['up'])
        return linear(jax.nn.silu(gate) * up, params['down'])
    h = linear(h, params['fc1'])
    fc2 = params['fc2']
    if 'kernel' in fc2 and not fc2.get('lora'):
        return gelu_linear(h, fc2['kernel'], fc2.get('bias'))
    return linear(gelu(h), fc2)


def transformer_layer(x, params, cfg, seg_ids, pos_ids,
                      lora_names=None, attn_impl: str = 'auto',
                      max_seqlen: Optional[int] = None,
                      rope: Optional[tuple] = None,
                      lora_dropout: float = 0.0, dropout_rng=None,
                      kv_gather=None, num_jobs: Optional[int] = None):
    """Pre-norm residual block with residue scaling
    (reference: esme/attention.py:241-255)."""
    inv_scale = 1.0 / cfg.residue_scaling
    x = x + attention_block(x, params['attn'], cfg, seg_ids, pos_ids,
                            lora_names, attn_impl, max_seqlen, rope,
                            lora_dropout, dropout_rng,
                            kv_gather, num_jobs) * inv_scale
    x = x + mlp_block(x, params['mlp'], cfg) * inv_scale
    return x


def _remat_wrap(body, remat: str):
    """Wrap a scan body in ``jax.checkpoint``. ``remat='attn'`` keeps
    the flash kernel outputs (``flash_out``/``flash_lse`` names, see
    ops/flash.py) so the backward recompute skips the attention kernel
    — the single most expensive op of the remat (~5.5 ms/layer,
    results/decompose_train_r5.txt) — for ~130MB/layer of extra saved
    activations at the 50k-token 650M shape. ``remat='full'`` is the
    classic minimal-memory policy (recompute everything)."""
    if remat == 'attn':
        policy = jax.checkpoint_policies.save_only_these_names(
            'flash_out', 'flash_lse')
        return jax.checkpoint(body, policy=policy)
    return jax.checkpoint(body)


def layer_stack(x, stacked_params, cfg, seg_ids, pos_ids, lora_names=None,
                attn_impl: str = 'auto', checkpointing: bool = False,
                collect_layers: Optional[Sequence[int]] = None,
                max_seqlen: Optional[int] = None, gather_fn=None,
                rope: Optional[tuple] = None,
                lora_dropout: float = 0.0, dropout_rng=None,
                kv_gather=None, num_jobs: Optional[int] = None,
                remat: str = 'full'):
    """Run all layers via ``lax.scan`` over stacked per-layer params.

    ``gather_fn`` (FSDP hook) all-gathers one layer's param shards
    inside the body — with checkpointing it re-runs in backward, so
    full weights never persist (ZeRO-3 semantics).

    Returns ``(x, reps)`` where ``reps`` is a list of intermediate layer
    outputs for indices in ``collect_layers`` (reference:
    esme/esm.py:243-250 appends only the requested layers — likewise
    here each requested layer has its own carried accumulator written
    at its scan step, so memory is len(collect)×T×D, never L×T×D).
    """
    if collect_layers:
        L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
        collect_layers = tuple(i % L for i in collect_layers)

    def body(carry, xs):
        x, reps = carry
        layer_params, idx = xs
        if gather_fn is not None:
            layer_params = gather_fn(layer_params)
        layer_rng = None if dropout_rng is None \
            else jax.random.fold_in(dropout_rng, idx)
        out = transformer_layer(x, layer_params, cfg, seg_ids, pos_ids,
                                lora_names, attn_impl, max_seqlen, rope,
                                lora_dropout, layer_rng, kv_gather,
                                num_jobs)
        if collect_layers:
            reps = tuple(jnp.where(idx == ci, out, r)
                         for ci, r in zip(collect_layers, reps))
        return (out, reps), None

    if checkpointing:
        body = _remat_wrap(body, remat)

    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    reps0 = tuple(jnp.zeros_like(x) for _ in (collect_layers or ()))
    (x, reps), _ = jax.lax.scan(body, (x, reps0),
                                (stacked_params, jnp.arange(L)))
    return x, list(reps)


def embed_tokens(tokens, params, cfg):
    """Token embedding with the reference's mask/pad zeroing semantics
    (reference: esme/esm.py:176-199 ESM2, 876 ESMC no zeroing)."""
    x = jnp.take(params['embed_tokens'], tokens, axis=0)
    if cfg.zero_mask_embedding:
        x = jnp.where((tokens == cfg.mask_idx)[..., None],
                      jnp.zeros_like(x), x)
    return x


def learned_positions_flat(pos_ids, params, cfg):
    """Learned positional embedding over packed positions: within-seq
    index (0-based) maps to table row ``pos + 1 + padding_idx``
    (reference: esme/embedding.py:54-81 uses 1-based + padding_idx)."""
    rows = pos_ids + 1 + cfg.padding_idx
    rows = jnp.clip(rows, 0, params['embed_positions'].shape[0] - 1)
    return jnp.take(params['embed_positions'], rows, axis=0)


def roberta_lm_head(x, params, embed=None):
    """``final(layer_norm(gelu(dense(x))))`` (reference: esme/head.py:25-27).

    When the final projection is weight-tied to the token embedding
    (no ``kernel`` leaf; detected at load, see models/io.py), logits
    are computed through ``embed`` so the tie holds under autodiff.
    """
    h = linear(x, params['dense'])
    h = apply_norm(gelu(h), params['norm'])
    final = params['final']
    if 'kernel' in final:
        return linear(h, final)
    from ..ops.linear import mxu_precision
    logits = jnp.dot(h, embed.T.astype(h.dtype),
                     preferred_element_type=jnp.float32,
                     precision=mxu_precision(h)).astype(h.dtype)
    if 'bias' in final:
        logits = logits + final['bias']
    return logits


# ---------------------------------------------------------------------------
# Token-minor residual stream: x (C, T). The flash kernels are fully
# token-minor (ops/flash.py), so keeping the stream feature-major makes
# head split/merge FREE reshapes — the relayout Pallas kernels
# (ops/headsplit.py, ~1.6 ms/layer net at the 650M bench shape) vanish
# entirely. RoPE applies in XLA on (H, D, T) with transposed tables;
# its VJP saves only the loop-invariant tables.
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _gelu_linear_t(h, kernel, bias):
    """``kernel^T @ gelu(h) (+bias)`` over token-minor ``(C, T)``,
    saving only ``h`` — the twin of :func:`gelu_linear`."""
    y = jax.lax.dot_general(
        kernel, gelu(h), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision(h, kernel)).astype(h.dtype)
    return y + bias[:, None] if bias is not None else y


def _gelu_linear_t_fwd(h, kernel, bias):
    return _gelu_linear_t(h, kernel, bias), (h, kernel, bias is not None)


def _gelu_linear_t_bwd(res, dy):
    h, kernel, has_bias = res
    g = gelu(h)
    prec = mxu_precision(h, kernel)
    # dh = (kernel @ dy) * gelu'(h)
    dh = jax.lax.dot_general(
        kernel, dy, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(h.dtype)
    dh = dh * _gelu_deriv(h).astype(h.dtype)
    # dkernel (in, out) = g @ dy^T : contract over T
    dkernel = jax.lax.dot_general(
        g, dy, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(kernel.dtype)
    dbias = jnp.sum(dy, axis=1) if has_bias else None
    return dh, dkernel, dbias


_gelu_linear_t.defvjp(_gelu_linear_t_fwd, _gelu_linear_t_bwd)


def _rotate_tm(xT, cos_h, sin_h):
    """RoPE on token-minor heads ``(H, D, T)`` with half-tables
    ``(D/2, T)``."""
    h2 = xT.shape[1] // 2
    x1 = xT[:, :h2, :]
    x2 = xT[:, h2:, :]
    return jnp.concatenate([x1 * cos_h - x2 * sin_h,
                            x2 * cos_h + x1 * sin_h], axis=1)


def attention_block_tm(xT, params, cfg, seg_ids,
                       lora_names=None,
                       max_seqlen: Optional[int] = None,
                       rope_t: Optional[tuple] = None,
                       lora_dropout: float = 0.0, dropout_rng=None,
                       num_jobs: Optional[int] = None):
    """Token-minor attention block: all reshapes free, no relayouts."""
    from ..ops.flash import DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, flash_tm
    from ..ops.linear import linear_t
    from ..ops.norm import apply_norm_t

    C, T = xT.shape
    H, Dh = cfg.attention_heads, cfg.head_dim
    h = apply_norm_t(xT, params['norm'])
    rngs = [None] * 4
    if dropout_rng is not None and lora_dropout > 0.0:
        rngs = [jax.random.fold_in(dropout_rng, i) for i in range(4)]
    q = linear_t(h, params['q'], lora_names, lora_dropout, rngs[0])
    k = linear_t(h, params['k'], lora_names, lora_dropout, rngs[1])
    v = linear_t(h, params['v'], lora_names, lora_dropout, rngs[2])

    if cfg.qk_layernorm:
        q = apply_norm_t(q, params['ln_q'])
        k = apply_norm_t(k, params['ln_k'])

    q = q.reshape(H, Dh, T)
    k = k.reshape(H, Dh, T)
    v = v.reshape(H, Dh, T)
    if cfg.rotary:
        cos_h, sin_h = rope_t
        q = _rotate_tm(q, cos_h, sin_h)
        k = _rotate_tm(k, cos_h, sin_h)

    oT = flash_tm(q, k, v, seg_ids, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                  max_seqlen, _interpret_default(), num_jobs)
    return linear_t(oT.reshape(C, T), params['out'], lora_names,
                    lora_dropout, rngs[3])


def _interpret_default():
    return jax.default_backend() != 'tpu'


@jax.custom_vjp
def _swiglu_linear_t(h, gk, uk, dk):
    """Token-minor ``(C', T)`` twin of :func:`swiglu_linear`: kernels
    are ``(in, out)``, activations feature-major."""
    prec = mxu_precision(h, gk)

    def tmm(kernel, x):   # kernel^T @ x over (C, T)
        return jax.lax.dot_general(
            kernel, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(x.dtype)

    g = tmm(gk, h)
    u = tmm(uk, h)
    return tmm(dk, jax.nn.silu(g) * u)


def _swiglu_linear_t_fwd(h, gk, uk, dk):
    return _swiglu_linear_t(h, gk, uk, dk), (h, gk, uk, dk)


def _swiglu_linear_t_bwd(res, dy):
    h, gk, uk, dk = res
    prec = mxu_precision(h, gk)

    def tmm(kernel, x):
        return jax.lax.dot_general(
            kernel, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(x.dtype)

    def fmm(kernel, x):   # kernel @ x (transpose direction)
        return jax.lax.dot_general(
            kernel, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(x.dtype)

    def kgrad(a, b):      # (in, out) = a @ b^T over T
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)

    g = tmm(gk, h)
    u = tmm(uk, h)
    sg = jax.nn.silu(g)
    dsu = fmm(dk, dy)
    dg = (dsu * u * _silu_deriv(g).astype(h.dtype)).astype(h.dtype)
    du = (dsu * sg).astype(h.dtype)
    dh = fmm(gk, dg) + fmm(uk, du)
    dgk = kgrad(h, dg).astype(gk.dtype)
    duk = kgrad(h, du).astype(uk.dtype)
    ddk = kgrad(sg * u, dy).astype(dk.dtype)
    return dh, dgk, duk, ddk


_swiglu_linear_t.defvjp(_swiglu_linear_t_fwd, _swiglu_linear_t_bwd)


def mlp_block_tm(xT, params, cfg):
    from ..ops.linear import linear_t
    from ..ops.norm import apply_norm_t
    h = apply_norm_t(xT, params['norm'])
    if cfg.mlp == 'swiglu':
        if _plain_swiglu_params(params):
            return _swiglu_linear_t(h, params['gate']['kernel'],
                                    params['up']['kernel'],
                                    params['down']['kernel'])
        gate = linear_t(h, params['gate'])
        up = linear_t(h, params['up'])
        return linear_t(jax.nn.silu(gate) * up, params['down'])
    h = linear_t(h, params['fc1'])
    fc2 = params['fc2']
    if 'kernel' in fc2 and not fc2.get('lora'):
        return _gelu_linear_t(h, fc2['kernel'], fc2.get('bias'))
    from ..ops.linear import linear_t as _lt
    return _lt(gelu(h), fc2)


def transformer_layer_tm(xT, params, cfg, seg_ids, lora_names=None,
                         max_seqlen: Optional[int] = None,
                         rope_t: Optional[tuple] = None,
                         lora_dropout: float = 0.0, dropout_rng=None,
                         num_jobs: Optional[int] = None):
    inv_scale = 1.0 / cfg.residue_scaling
    xT = xT + attention_block_tm(xT, params['attn'], cfg, seg_ids,
                                 lora_names, max_seqlen, rope_t,
                                 lora_dropout, dropout_rng,
                                 num_jobs) * inv_scale
    xT = xT + mlp_block_tm(xT, params['mlp'], cfg) * inv_scale
    return xT


def layer_stack_tm(xT, stacked_params, cfg, seg_ids, lora_names=None,
                   checkpointing: bool = False,
                   max_seqlen: Optional[int] = None, gather_fn=None,
                   rope_t: Optional[tuple] = None,
                   lora_dropout: float = 0.0, dropout_rng=None,
                   num_jobs: Optional[int] = None, remat: str = 'full'):
    """Token-minor twin of :func:`layer_stack` (no collect_layers —
    callers needing intermediate reps use the standard path)."""
    def body(carry, xs):
        x, = carry
        layer_params, idx = xs
        if gather_fn is not None:
            layer_params = gather_fn(layer_params)
        layer_rng = None if dropout_rng is None \
            else jax.random.fold_in(dropout_rng, idx)
        out = transformer_layer_tm(x, layer_params, cfg, seg_ids,
                                   lora_names, max_seqlen, rope_t,
                                   lora_dropout, layer_rng, num_jobs)
        return (out,), None

    if checkpointing:
        body = _remat_wrap(body, remat)

    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    (xT,), _ = jax.lax.scan(body, (xT,),
                            (stacked_params, jnp.arange(L)))
    return xT
