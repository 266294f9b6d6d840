"""Pallas segment-flash attention vs the einsum oracle (interpret mode
on CPU; the same comparisons run on real TPU in bench/verification)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esme_tpu.ops.attention import attention_reference
from esme_tpu.ops.flash import block_spans, flash_segment_attention


def make(T, H, D, lens, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    seg = np.concatenate([np.full(l, i) for i, l in enumerate(lens)])
    assert seg.shape[0] == T
    q = jnp.asarray(rng.standard_normal((T, H, D)), dtype)
    k = jnp.asarray(rng.standard_normal((T, H, D)), dtype)
    v = jnp.asarray(rng.standard_normal((T, H, D)), dtype)
    return q, k, v, jnp.asarray(seg.astype(np.int32))


def test_block_spans_packed():
    seg = jnp.asarray(np.repeat([0, 1, 2], [100, 150, 134]).astype(np.int32))
    kstart, kend, qstart, qend = block_spans(seg, 128, 128)
    # block 0 holds segs {0,1} -> overlaps blocks 0..1 (seg1 ends @250)
    assert int(kstart[0]) == 0 and int(kend[0]) == 2
    # block 2 holds seg 2 only (tokens 256..383) -> blocks 1..2
    assert int(kstart[2]) == 1 and int(kend[2]) == 3
    np.testing.assert_array_equal(np.asarray(qstart), np.asarray(kstart))


@pytest.mark.parametrize('lens', [
    [100, 150, 134],           # uneven, crosses block boundaries
    [384],                     # single segment
    [1] * 384,                 # many tiny segments
])
def test_flash_fwd_matches_reference(lens):
    T = sum(lens)
    q, k, v, seg = make(T, 2, 64, lens)
    ref = attention_reference(q, k, v, seg)
    out = flash_segment_attention(q, k, v, seg, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_unaligned_total():
    # T not a multiple of the block: wrapper pads with a fake segment
    lens = [70, 45, 30]
    T = sum(lens)
    q, k, v, seg = make(T, 2, 32, lens)
    ref = attention_reference(q, k, v, seg)
    out = flash_segment_attention(q, k, v, seg, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_max_seqlen_cap():
    lens = [100, 150, 134]
    T = sum(lens)
    q, k, v, seg = make(T, 2, 64, lens)
    ref = attention_reference(q, k, v, seg)
    out = flash_segment_attention(q, k, v, seg, block_q=128, block_k=128,
                                  max_seqlen=150)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_grad_matches_reference():
    lens = [100, 150, 134]
    T = sum(lens)
    q, k, v, seg = make(T, 2, 64, lens)

    def loss_flash(q, k, v):
        return (flash_segment_attention(q, k, v, seg, block_q=128,
                                        block_k=128) ** 2).sum()

    def loss_ref(q, k, v):
        return (attention_reference(q, k, v, seg) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3)


def test_flash_no_cross_segment_leakage():
    # changing tokens of segment 1 must not affect segment 0's outputs
    lens = [128, 128]
    T = sum(lens)
    q, k, v, seg = make(T, 2, 64, lens)
    out1 = flash_segment_attention(q, k, v, seg, block_q=128, block_k=128)
    k2 = k.at[128:].add(3.0)
    v2 = v.at[128:].add(-1.0)
    out2 = flash_segment_attention(q, k2, v2, seg, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out1[:128]),
                               np.asarray(out2[:128]), atol=1e-6)
    assert np.abs(np.asarray(out1[128:]) -
                  np.asarray(out2[128:])).max() > 1e-3


def test_model_with_flash_impl_matches_einsum():
    from esme_tpu import ESM2, tokenize_unpad
    from esme_tpu.models.config import esm2_config
    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    m = ESM2(config=cfg, rng=0)
    seqs = ['MAGVLKE' * 10, 'LKE' * 25, 'MPVAP' * 30]
    tok, _, cu, ml = tokenize_unpad(seqs, alphabet=m.alphabet)
    a = np.asarray(m.forward(tok, pad_args=(cu, ml), attn_impl='reference'))
    b = np.asarray(m.forward(tok, pad_args=(cu, ml), attn_impl='flash'))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)


def test_fwd_jobs_matches_static():
    """Dynamic-span job mode produces identical output (and lse) to
    the static max_span sweep — same math, different grid."""
    import math
    import jax.numpy as jnp
    from esme_tpu.ops import flash
    from esme_tpu.ops.flash import (_fwd, _fwd_jobs, _head_block,
                                    _span_cap, block_spans, host_num_jobs)

    T, H, D, bq, bk = 2048, 4, 64, 256, 256
    rng = np.random.default_rng(0)
    lens, tot = [], 0
    while tot < T - 300:
        n = int(rng.integers(50, 400))
        lens.append(n)
        tot += n
    lens.append(T - tot)
    seg_np = np.repeat(np.arange(len(lens), dtype=np.int32), lens)
    seg = jnp.asarray(seg_np)
    qT = jnp.asarray(rng.standard_normal((H, D, T)), jnp.float32)
    kT = jnp.asarray(rng.standard_normal((H, D, T)), jnp.float32)
    vT = jnp.asarray(rng.standard_normal((H, D, T)), jnp.float32)
    segq_row = seg.reshape(1, T)
    segk_col = seg.reshape(T, 1)
    kstart, kend, _, _ = block_spans(seg, bq, bk)
    scale = 1.0 / math.sqrt(D)

    o_s, lse_s = _fwd(qT, kT, vT, segq_row, segk_col, kstart, kend,
                      block_q=bq, block_k=bk, head_block=2,
                      max_span=_span_cap(T, bq, bk, None), scale=scale,
                      interpret=True)
    nj = host_num_jobs(seg_np, bq, bk)
    assert nj >= int((kend - kstart).sum())
    o_j, lse_j = _fwd_jobs(qT, kT, vT, segq_row, segk_col, kstart, kend,
                           block_q=bq, block_k=bk, head_block=2,
                           num_jobs=nj, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(o_j), np.asarray(o_s),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lse_j), np.asarray(lse_s),
                               atol=1e-5, rtol=1e-5)


def test_fused_jobs_grad_matches_static():
    """Fused attention with the dynamic-span job grid matches the
    static sweep in both forward and gradients."""
    import jax
    import jax.numpy as jnp
    from esme_tpu.ops.flash import host_num_jobs
    from esme_tpu.ops.fused_attn import fused_rotary_flash
    from esme_tpu.ops.rotary import rotary_cos_sin

    T, H, D = 1024, 4, 64
    rng = np.random.default_rng(3)
    lens, tot = [], 0
    while tot < T - 300:
        n = int(rng.integers(50, 400))
        lens.append(n)
        tot += n
    lens.append(T - tot)
    seg_np = np.repeat(np.arange(len(lens), dtype=np.int32), lens)
    seg = jnp.asarray(seg_np)
    q2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((T, H * D)), jnp.float32)
    cos, sin = rotary_cos_sin(jnp.arange(T), D, dtype=jnp.float32)
    nj = host_num_jobs(seg_np, 256, 256)

    def run(njobs):
        def loss(q2, k2, v2):
            return jnp.sum(fused_rotary_flash(
                q2, k2, v2, cos, sin, seg, H, 256, 256, None, True,
                njobs) ** 2)
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            q2, k2, v2)
        return val, grads

    v_s, g_s = run(None)
    v_j, g_j = run(nj)
    np.testing.assert_allclose(float(v_j), float(v_s), rtol=1e-6)
    for a, b in zip(g_j, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_job_budget_overflow_poisons_output():
    """If num_jobs is smaller than the real span total, job mode must
    NOT silently truncate attention: outputs are NaN-poisoned at token
    0 so the violation propagates loudly (ADVICE r4 medium #2)."""
    import math
    import jax.numpy as jnp
    from esme_tpu.ops.flash import (_fwd_jobs, block_spans, host_num_jobs)

    T, H, D, bq, bk = 1024, 2, 64, 256, 256
    rng = np.random.default_rng(5)
    seg_np = np.repeat(np.arange(4, dtype=np.int32), 256)
    seg = jnp.asarray(seg_np)
    qT = jnp.asarray(rng.standard_normal((H, D, T)), jnp.float32)
    segq_row = seg.reshape(1, T)
    segk_col = seg.reshape(T, 1)
    kstart, kend, _, _ = block_spans(seg, bq, bk)
    total = int((kend - kstart).sum())
    scale = 1.0 / math.sqrt(D)

    # exact budget: clean output
    o_ok, _ = _fwd_jobs(qT, qT, qT, segq_row, segk_col, kstart, kend,
                        block_q=bq, block_k=bk, head_block=1,
                        num_jobs=total, scale=scale, interpret=True)
    assert np.isfinite(np.asarray(o_ok)).all()
    assert host_num_jobs(seg_np, bq, bk) >= total

    # one short: loud NaN, not a silent truncation
    o_bad, _ = _fwd_jobs(qT, qT, qT, segq_row, segk_col, kstart, kend,
                         block_q=bq, block_k=bk, head_block=1,
                         num_jobs=total - 1, scale=scale, interpret=True)
    assert np.isnan(np.asarray(o_bad)[:, :, 0]).all()


def test_host_budget_mirrors_traced_spans_with_chunked_tail():
    """host_num_jobs_from_cu must stay an upper bound of the traced
    span total for the SAME segment layout forward_flat builds —
    including the chunked fake-tail rule (ops/segment.py TAIL_CHUNK)
    and the ALIGN pad. If this drifts, job mode NaN-poisons (see
    _overflow_poison); this test pins the invariant over random
    batches."""
    import jax.numpy as jnp
    from esme_tpu.models.esm import packed_meta
    from esme_tpu.ops.flash import (ALIGN, block_spans,
                                    host_num_jobs_from_cu)

    rng = np.random.default_rng(7)
    for trial in range(6):
        budget = int(rng.integers(4, 40)) * 256
        lens, tot = [], 0
        while tot < budget - int(rng.integers(256, 2048)):
            n = int(rng.integers(10, 900)) + 2
            if tot + n > budget:
                break
            lens.append(n)
            tot += n
        if not lens:
            continue
        cu = np.cumsum([0, *lens]).astype(np.int32)
        nj = host_num_jobs_from_cu(cu, budget)

        # traced layout: packed_meta + forward_flat's ALIGN tail pad
        seg_ids, _ = packed_meta(jnp.asarray(cu), budget)
        t_pad = (-budget) % ALIGN
        if t_pad:
            seg_ids = jnp.concatenate(
                [seg_ids, jnp.full((t_pad,), jnp.max(seg_ids) + 1,
                                   seg_ids.dtype)])
        kstart, kend, qstart, qend = block_spans(seg_ids, 256, 256)
        total_q = int(np.asarray(kend - kstart).sum())
        total_k = int(np.asarray(qend - qstart).sum())
        if nj is None:
            assert max(total_q, total_k) < 768, \
                (trial, total_q, total_k)
        else:
            assert nj >= total_q and nj >= total_k, \
                (trial, nj, total_q, total_k)
