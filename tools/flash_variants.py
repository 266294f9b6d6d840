"""Isolate what bounds the segment-flash forward kernel: time variants
with individual VPU passes removed (mask select, max reduce, exp dtype,
exp itself). Numerics of the ablated variants are WRONG — this is a
cost model experiment only.

Round-3 finding (head-minor kernel): ~12 ms at the 650M bench shape
regardless of which compute pass was removed -> the kernel was
DMA-bound, later confirmed and root-caused by tools/profile_attn.py
(strided 128B rows at ~285 GB/s). Updated for the round-4 token-minor
kernel ((H, D, T) k/v streaming)."""
import functools
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import esme_tpu.ops.flash as flash
from esme_tpu.profiling import benchmark
from esme_tpu.utils import enable_compilation_cache
from tools.tune_flash2 import make_inputs

enable_compilation_cache()

NEG_INF = -1e30


def variant_kernel(kstart_ref, kend_ref, q_ref, segq_ref, k_ref, v_ref,
                   segk_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                   *, scale, mode):
    i = pl.program_id(1)
    jj = pl.program_id(2)
    n_span = pl.num_programs(2)

    @pl.when(jj == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(jj < kend_ref[i] - kstart_ref[i])
    def _():
        if mode == 'nothing':
            # touch every ref so DMA happens; no real compute
            acc_scr[:] = acc_scr[:] + (
                q_ref[:1, :1, :1].astype(jnp.float32)
                + k_ref[:1, :1, :1].astype(jnp.float32)
                + v_ref[:1, :1, :1].astype(jnp.float32)
                + segq_ref[:1, :1].astype(jnp.float32)[None]
                + segk_ref[:1, :1].astype(jnp.float32)[None])
            return
        qb = q_ref[:]
        if mode == 'noqk':
            s = (acc_scr[:, :, :1] + k_ref[:, :1, :].astype(jnp.float32)
                 )  # (hb, bq, bk) without the MXU pass
        else:
            s = flash._bdot(qb, k_ref[:], ((2,), (1,))) * scale
        if mode != 'nomask':
            mask = (segq_ref[:] == segk_ref[:])[None]
            s = jnp.where(mask, s, NEG_INF)
        if mode == 'noexp':
            p = s * 0.5 + 0.1          # same passes, no transcendental
            m_new = m_scr[:]
            alpha = 1.0
        elif mode == 'noalpha':
            # keep the lane-dim max reduce; skip the rescale chain
            m_prev = m_scr[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
            alpha = 1.0
            p = jnp.exp(s - m_new)
        elif mode == 'maxfree':
            # max via per-step constant: no reduce, no rescale
            m_new = m_scr[:]
            alpha = 1.0
            p = jnp.exp(s - 20.0)
        elif mode == 'sumfree':
            m_prev = m_scr[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
        elif mode == 'nomax':
            m_new = m_scr[:]
            alpha = 1.0
            p = jnp.exp(s)
        elif mode == 'bf16exp':
            m_prev = m_scr[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp((s - m_new).astype(jnp.bfloat16)).astype(
                jnp.float32)
        else:                          # baseline
            m_prev = m_scr[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
        if mode == 'sumfree':
            l_scr[:] = l_scr[:] * alpha + p[:, :, :1]
        else:
            l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=2, keepdims=True)
        if mode == 'nopv':
            pv = p[:, :, :64] * 1.0
        else:
            pv = flash._bdot(p.astype(v_ref.dtype), v_ref[:], ((2,), (2,)))
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    @pl.when(jj == n_span - 1)
    def _():
        l = l_scr[:]
        l_safe = jnp.where(l == 0, 1.0, l)
        o_ref[:] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse_ref[:] = m_scr[:] + jnp.log(l_safe)


def run(mode, hb=20, bq=256, bk=256, vmem_mb=100):
    q, k, v, seg, max_len, sol = make_inputs()
    qh = jnp.swapaxes(q, 0, 1)
    kh = jnp.transpose(k, (1, 2, 0))      # (H, D, T) token-minor
    vh = jnp.transpose(v, (1, 2, 0))
    T = qh.shape[1]
    seg2d = seg.reshape(T, 1)
    segT = seg.reshape(1, T)
    kstart, kend, _, _ = flash.block_spans(seg, bq, bk)
    max_span = flash._span_cap(T, bq, bk, max_len)
    flash._VMEM_LIMIT_BYTES = vmem_mb * 1024 * 1024

    fwd = flash._fwd   # reuse grid/BlockSpec plumbing via monkeypatch
    orig = flash._fwd_kernel
    flash._fwd_kernel = functools.partial(variant_kernel, mode=mode)
    try:
        @jax.jit
        def f(qh, kh, vh):
            return fwd(qh, kh, vh, seg2d, segT, kstart, kend,
                       block_q=bq, block_k=bk, head_block=hb,
                       max_span=max_span, scale=0.125,
                       interpret=False)[0]
        dt = benchmark(f, qh, kh, vh, reps=10)
        print(f'{mode:10s} {dt*1e3:7.2f} ms', flush=True)
    except Exception as e:
        print(f'{mode:10s} FAIL {type(e).__name__}: {str(e)[:100]}',
              flush=True)
    finally:
        flash._fwd_kernel = orig


if __name__ == '__main__':
    for mode in ('baseline', 'noalpha', 'maxfree', 'sumfree', 'nomax'):
        run(mode)
