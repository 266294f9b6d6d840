"""Decompose the segment-flash BACKWARD kernels (round 5): per-kernel
times for _dq and _dkv at the headline shape (ESM2-650M attention:
H=20, D=64, T=50176 packed 100-1000aa), static-span vs job mode, plus
compute-ablated variants (numerics intentionally WRONG — cost model
only) that remove one pass at a time:

  dma      touch every ref, no compute
  mm_only  the matmuls alone (mask/exp/softmax chain removed)
  no_s     skip the score recompute matmul
  no_dp    skip the dp = v.do matmul
  no_acc   skip the accumulating output matmul(s)
  no_exp   replace exp(s-lse) with affine
  no_mask  skip the segment-mask select

The forward work (results/flash_decompose.txt, flash_variants_r4.txt)
found DMA layout then the lane-dim max-reduce; the backward has no max
reduce, so the question is DMA vs matmul count vs pipeline quality.

Usage: python tools/decompose_bwd.py [hb_sweep]
"""
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

enable_compilation_cache()


def make_inputs(seed=0):
    H, D = 20, 64
    rng = np.random.default_rng(seed)
    T = ((50_000 + 255) // 256) * 256
    lens, tot = [], 0
    while tot < T - 1024:
        n = int(rng.integers(100, 1000)) + 2
        lens.append(n)
        tot += n
    lens.append(T - tot)
    seg_np = np.repeat(np.arange(len(lens), dtype=np.int32), lens)
    seg = jnp.asarray(seg_np)
    max_len = max(lens[:-1])
    qT = jnp.asarray(rng.standard_normal((H, D, T)), jnp.bfloat16)
    kT = jnp.asarray(rng.standard_normal((H, D, T)), jnp.bfloat16)
    vT = jnp.asarray(rng.standard_normal((H, D, T)), jnp.bfloat16)
    doT = jnp.asarray(rng.standard_normal((H, D, T)), jnp.bfloat16)
    sol_fwd_ms = 4 * sum(l * l for l in lens) * H * D / 197e12 * 1e3
    return dict(H=H, D=D, T=T, lens=lens, seg=seg, seg_np=seg_np,
                max_len=max_len, qT=qT, kT=kT, vT=vT, doT=doT,
                sol_fwd_ms=sol_fwd_ms)


# ---------------------------------------------------------------------------
# Ablated kernel variants (static-span grid, same specs as flash._bwd)
# ---------------------------------------------------------------------------

def dq_variant(kstart_ref, kend_ref, qT_ref, doT_ref, lse_ref,
               delta_ref, segq_ref, k_ref, v_ref, segk_ref, dqT_ref,
               dq_scr, *, scale, mode):
    i = pl.program_id(1)
    jj = pl.program_id(2)
    n_span = pl.num_programs(2)

    @pl.when(jj == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(jj < kend_ref[i] - kstart_ref[i])
    def _():
        if mode == 'dma':
            # touch the big streams with one VPU add each (seg refs are
            # ~1KB vs 640KB tiles; their DMA is negligible and skipped
            # because scalar extraction doesn't lower)
            z = (qT_ref[:, :, :].astype(jnp.float32)
                 + doT_ref[:, :, :].astype(jnp.float32)
                 + k_ref[:, :, :].astype(jnp.float32)
                 + v_ref[:, :, :].astype(jnp.float32))
            dq_scr[:] = dq_scr[:] + z + lse_ref[:] + delta_ref[:]
            return
        qb = qT_ref[:]
        dob = doT_ref[:]
        lse = lse_ref[:]
        delta = delta_ref[:]
        if mode == 'no_s':
            # (hb,1,bq) -> (hb,bk,bq): sublane-only broadcast
            s = jnp.broadcast_to(lse, (qb.shape[0], k_ref.shape[2],
                                       qb.shape[2]))
        else:
            s = flash._bdot(k_ref[:], qb, ((1,), (1,))) * scale
        if mode == 'mm_only':
            p = s
        elif mode == 'no_exp':
            p = s * 0.5 + 0.01
        elif mode == 'no_mask':
            p = jnp.exp(s - lse)
        else:
            mask = (segk_ref[:] == segq_ref[:])[None]
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        if mode == 'no_dp':
            ds = p * scale
        else:
            dp = flash._bdot(v_ref[:], dob, ((1,), (1,)))
            ds = (p * (dp - delta) * scale if mode != 'mm_only'
                  else p + dp)
        if mode == 'no_acc':
            dq_scr[:] = dq_scr[:] + jnp.max(ds, axis=1, keepdims=True)
        else:
            dq_scr[:] = dq_scr[:] + flash._bdot(
                k_ref[:], ds.astype(k_ref.dtype), ((2,), (1,)))

    @pl.when(jj == n_span - 1)
    def _():
        dqT_ref[:] = dq_scr[:].astype(dqT_ref.dtype)


def dkv_variant(qstart_ref, qend_ref, k_ref, v_ref, segk_ref, qT_ref,
                doT_ref, lse_ref, delta_ref, segq_ref, dkT_ref, dvT_ref,
                dk_scr, dv_scr, *, scale, mode):
    j = pl.program_id(1)
    ii = pl.program_id(2)
    n_span = pl.num_programs(2)

    @pl.when(ii == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(ii < qend_ref[j] - qstart_ref[j])
    def _():
        if mode == 'dma':
            z = (qT_ref[:, :, :].astype(jnp.float32)
                 + doT_ref[:, :, :].astype(jnp.float32)
                 + k_ref[:, :, :].astype(jnp.float32)
                 + v_ref[:, :, :].astype(jnp.float32))
            dk_scr[:] = dk_scr[:] + z
            dv_scr[:] = dv_scr[:] + lse_ref[:] + delta_ref[:]
            return
        qb = qT_ref[:]
        dob = doT_ref[:]
        lse = lse_ref[:]
        delta = delta_ref[:]
        if mode == 'no_s':
            s = jnp.broadcast_to(lse, (qb.shape[0], k_ref.shape[2],
                                       qb.shape[2]))
        else:
            s = flash._bdot(k_ref[:], qb, ((1,), (1,))) * scale
        if mode == 'mm_only':
            p = s
        elif mode == 'no_exp':
            p = s * 0.5 + 0.01
        elif mode == 'no_mask':
            p = jnp.exp(s - lse)
        else:
            mask = (segk_ref[:] == segq_ref[:])[None]
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        if mode != 'no_acc':
            dv_scr[:] = dv_scr[:] + flash._bdot(
                dob, p.astype(dob.dtype), ((2,), (2,)))
        if mode == 'no_dp':
            ds = p * scale
        else:
            dp = flash._bdot(v_ref[:], dob, ((1,), (1,)))
            ds = (p * (dp - delta) * scale if mode != 'mm_only'
                  else p + dp)
        if mode != 'no_acc':
            dk_scr[:] = dk_scr[:] + flash._bdot(
                qb, ds.astype(qb.dtype), ((2,), (2,)))
        else:
            dk_scr[:] = dk_scr[:] + jnp.max(ds, axis=1, keepdims=True)

    @pl.when(ii == n_span - 1)
    def _():
        dkT_ref[:] = dk_scr[:].astype(dkT_ref.dtype)
        dvT_ref[:] = dv_scr[:].astype(dvT_ref.dtype)


# ---------------------------------------------------------------------------
# Builders mirroring flash._bwd's grid/spec construction
# ---------------------------------------------------------------------------

def build_dq(kernel, inp, *, bq=256, bk=256, hb=20, scale=None):
    H, D, T = inp['H'], inp['D'], inp['T']
    scale = scale or 1.0 / np.sqrt(D)
    nqb = T // bq
    max_span = flash._span_cap(T, bq, bk, inp['max_len'])

    def kv_index(g, i, jj, kstart_ref, kend_ref):
        j = jnp.minimum(kstart_ref[i] + jj, kend_ref[i] - 1)
        return (g, 0, j)

    def segk_index(g, i, jj, kstart_ref, kend_ref):
        j = jnp.minimum(kstart_ref[i] + jj, kend_ref[i] - 1)
        return (j, 0)

    call = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H // hb, nqb, max_span),
            in_specs=[
                pl.BlockSpec((hb, D, bq), lambda g, i, jj, *_: (g, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, D, bq), lambda g, i, jj, *_: (g, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, 1, bq), lambda g, i, jj, *_: (g, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, 1, bq), lambda g, i, jj, *_: (g, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq), lambda g, i, jj, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, D, bk), kv_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, D, bk), kv_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, 1), segk_index,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((hb, D, bq),
                                   lambda g, i, jj, *_: (g, 0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((hb, D, bq), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((H, D, T), jnp.bfloat16),
        compiler_params=flash._compiler_params(),
    )
    return call


def build_dkv(kernel, inp, *, bq=256, bk=256, hb=20, scale=None):
    H, D, T = inp['H'], inp['D'], inp['T']
    scale = scale or 1.0 / np.sqrt(D)
    nkb = T // bk
    max_span = flash._span_cap(T, bk, bq, inp['max_len'])

    def q_index(g, j, ii, qstart_ref, qend_ref):
        i = jnp.minimum(qstart_ref[j] + ii, qend_ref[j] - 1)
        return (g, 0, i)

    def segq_index(g, j, ii, qstart_ref, qend_ref):
        i = jnp.minimum(qstart_ref[j] + ii, qend_ref[j] - 1)
        return (0, i)

    call = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H // hb, nkb, max_span),
            in_specs=[
                pl.BlockSpec((hb, D, bk), lambda g, j, ii, *_: (g, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, D, bk), lambda g, j, ii, *_: (g, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, 1), lambda g, j, ii, *_: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, D, bq), q_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, D, bq), q_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, 1, bq), q_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, 1, bq), q_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq), segq_index,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((hb, D, bk), lambda g, j, ii, *_: (g, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, D, bk), lambda g, j, ii, *_: (g, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((hb, D, bk), jnp.float32),
                            pltpu.VMEM((hb, D, bk), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((H, D, T), jnp.bfloat16),
                   jax.ShapeDtypeStruct((H, D, T), jnp.bfloat16)],
        compiler_params=flash._compiler_params(),
    )
    return call


def main():
    inp = make_inputs()
    H, D, T = inp['H'], inp['D'], inp['T']
    seg = inp['seg']
    qT, kT, vT, doT = inp['qT'], inp['kT'], inp['vT'], inp['doT']
    segq_row = seg.reshape(1, T)
    segk_col = seg.reshape(T, 1)
    kstart, kend, qstart, qend = flash.block_spans(seg, 256, 256)
    scale = 1.0 / np.sqrt(D)

    print(f'shape: H={H} D={D} T={T} max_len={inp["max_len"]} '
          f'sol_fwd={inp["sol_fwd_ms"]:.2f} ms '
          f'(bwd matmul SoL ~{inp["sol_fwd_ms"]*2.5:.2f} ms)', flush=True)

    # residuals from the real forward
    oT, lse = flash._fwd(qT, kT, vT, segq_row, segk_col, kstart, kend,
                         block_q=256, block_k=256, head_block=20,
                         max_span=flash._span_cap(T, 256, 256,
                                                  inp['max_len']),
                         scale=scale, interpret=False)
    delta = jnp.sum(doT.astype(jnp.float32) * oT.astype(jnp.float32),
                    axis=1, keepdims=True)
    jax.block_until_ready((oT, lse, delta))

    # ---- reference points --------------------------------------------------
    # NB all operands flow as arguments: closing over 128MB arrays
    # inlines them into the program and blows the remote-compile limit
    fwd = jax.jit(lambda q, k, v: flash._fwd(
        q, k, v, segq_row, segk_col, kstart, kend, block_q=256,
        block_k=256, head_block=20,
        max_span=flash._span_cap(T, 256, 256, inp['max_len']),
        scale=scale, interpret=False)[0])
    print(f'fwd static          '
          f'{benchmark(fwd, qT, kT, vT, reps=20)*1e3:7.2f} ms',
          flush=True)

    nj = flash.host_num_jobs(inp['seg_np'], 256, 256)
    print(f'num_jobs={nj}', flush=True)

    # full backward: static vs jobs
    for tag, njobs in [('static', None), ('jobs', nj)]:
        f = jax.jit(lambda q, k, v, do, lse, delta, njobs=njobs:
                    flash._bwd(
            q, k, v, segq_row, segk_col, lse, delta, do,
            kstart, kend, qstart, qend, block_q=256, block_k=256,
            max_span_q=flash._span_cap(T, 256, 256, inp['max_len']),
            max_span_k=flash._span_cap(T, 256, 256, inp['max_len']),
            scale=scale, interpret=False, num_jobs=njobs))
        dt = benchmark(f, qT, kT, vT, doT, lse, delta, reps=10)
        print(f'bwd both {tag:7s}    {dt*1e3:7.2f} ms', flush=True)

    # ---- per-kernel & ablations (static grid) -----------------------------
    from esme_tpu.ops.flash import _dq_kernel, _dkv_kernel

    def time_dq(kernel, hb, tag):
        call = build_dq(kernel, inp, hb=hb)
        f = jax.jit(lambda q, do, lse, delta, k, v: call(
            kstart, kend, q, do, lse, delta, segq_row, k, v, segk_col))
        dt = benchmark(f, qT, doT, lse, delta, kT, vT, reps=10)
        print(f'dq  {tag:12s} hb={hb:2d} {dt*1e3:7.2f} ms', flush=True)

    def time_dkv(kernel, hb, tag):
        call = build_dkv(kernel, inp, hb=hb)
        f = jax.jit(lambda k, v, q, do, lse, delta: call(
            qstart, qend, k, v, segk_col, q, do, lse, delta, segq_row))
        dt = benchmark(f, kT, vT, qT, doT, lse, delta, reps=10)
        print(f'dkv {tag:12s} hb={hb:2d} {dt*1e3:7.2f} ms', flush=True)

    time_dq(_dq_kernel, 20, 'real')
    time_dkv(_dkv_kernel, 20, 'real')

    for mode in ('dma', 'mm_only', 'no_s', 'no_dp', 'no_acc', 'no_exp',
                 'no_mask'):
        time_dq(functools.partial(dq_variant, mode=mode), 20, mode)
    for mode in ('dma', 'mm_only', 'no_s', 'no_dp', 'no_acc', 'no_exp',
                 'no_mask'):
        time_dkv(functools.partial(dkv_variant, mode=mode), 20, mode)

    if len(sys.argv) > 1 and sys.argv[1] == 'hb_sweep':
        for hb in (4, 5, 10):
            time_dq(_dq_kernel, hb, 'real')
            time_dkv(_dkv_kernel, hb, 'real')


if __name__ == '__main__':
    main()
