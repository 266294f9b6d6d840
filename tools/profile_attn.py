"""Capture a jax.profiler trace of the standalone fused attention at
the bench shape, plus targeted microbenchmarks that separate DMA,
VPU (softmax passes), MXU, and grid-step overhead contributions."""
import os
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from esme_tpu.profiling import benchmark
from esme_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def make_shape():
    from esme_tpu.ops.flash import ALIGN
    rng = np.random.default_rng(0)
    T = ((50_000 + ALIGN - 1) // ALIGN) * ALIGN
    lens, tot = [], 0
    while tot < T - 1024:
        n = int(rng.integers(100, 1000)) + 2
        lens.append(n)
        tot += n
    lens.append(T - tot)
    seg = jnp.asarray(np.repeat(np.arange(len(lens), dtype=np.int32),
                                lens))
    return T, lens, seg, rng


def main():
    from esme_tpu.ops import flash
    from esme_tpu.ops.flash import block_spans, _span_cap, _fwd

    H, D = 20, 64
    T, lens, seg, rng = make_shape()
    max_len = max(lens[:-1])
    qh = jnp.asarray(rng.standard_normal((H, T, D)), jnp.bfloat16)

    # ---- 1. v1 kernel timing across (bq, bk, hb, max_span) --------------
    def time_v1(bq, bk, hb, vmem_mb=100, span=None):
        seg2d = seg.reshape(T, 1)
        segT = seg.reshape(1, T)
        kstart, kend, _, _ = block_spans(seg, bq, bk)
        ms = span if span is not None else _span_cap(T, bq, bk, max_len)
        flash._VMEM_LIMIT_BYTES = vmem_mb * 1024 * 1024

        @jax.jit
        def f(q):
            return _fwd(q, q, q, seg2d, segT, kstart, kend, block_q=bq,
                        block_k=bk, head_block=hb, max_span=ms,
                        scale=0.125, interpret=False)[0]
        try:
            dt = benchmark(f, qh, reps=10)
            nsteps = (H // hb) * (T // bq) * ms
            print(f'v1 bq={bq:4d} bk={bk:4d} hb={hb:2d} span={ms} '
                  f'steps={nsteps:6d}: {dt*1e3:7.2f} ms '
                  f'({dt/nsteps*1e6:5.2f} us/step)', flush=True)
            return dt
        except Exception as e:
            print(f'v1 bq={bq} bk={bk} hb={hb}: FAIL {str(e)[:120]}',
                  flush=True)
            return None

    for bq, bk, hb in [(256, 1024, 4), (256, 1024, 5), (256, 512, 5),
                       (256, 256, 5), (512, 512, 5), (512, 1024, 2),
                       (1024, 1024, 1), (128, 1024, 5),]:
        time_v1(bq, bk, hb)

    # ---- 2. pure VPU cost: the softmax passes alone ---------------------
    # One pallas kernel sweeping the same score volume (no matmuls, no
    # k/v DMA): read a resident (hb,bq,bk) fp32 block, run
    # where/max/exp/sum, write (hb,bq,1).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools

    def vpu_kernel(s_ref, o_ref, *, passes):
        s = s_ref[:]
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        o_ref[:] = jnp.sum(p, axis=2, keepdims=True)

    def time_vpu(hb, bq, bk, nsteps):
        s = jnp.asarray(rng.standard_normal((hb, bq, bk)), jnp.float32)

        @jax.jit
        def f(s):
            return pl.pallas_call(
                functools.partial(vpu_kernel, passes=4),
                grid=(nsteps,),
                in_specs=[pl.BlockSpec((hb, bq, bk), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((hb, bq, 1), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((hb, bq, 1), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=('arbitrary',)),
            )(s)
        dt = benchmark(f, s, reps=10)
        elems = hb * bq * bk * nsteps
        print(f'VPU max+exp+sum ({hb},{bq},{bk})x{nsteps} '
              f'= {elems/1e9:.2f}G elems: {dt*1e3:7.2f} ms '
              f'({elems/dt/1e9:6.1f} G elem/s)', flush=True)

    # volume matching v1 bq=256 bk=1024 hb=4 real steps (~2450 over heads)
    time_vpu(4, 256, 1024, 612)
    time_vpu(5, 256, 1024, 490)
    time_vpu(5, 256, 256, 1960)

    # ---- 3. pure MXU cost at kernel shapes ------------------------------
    def mxu_kernel(q_ref, k_ref, v_ref, o_ref):
        s = jax.lax.dot_general(
            q_ref[:], k_ref[:], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            s.astype(jnp.bfloat16), v_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    def time_mxu(hb, bq, bk, nsteps):
        q = jnp.asarray(rng.standard_normal((hb, bq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((hb, bk, D)), jnp.bfloat16)

        @jax.jit
        def f(q, k):
            return pl.pallas_call(
                mxu_kernel,
                grid=(nsteps,),
                in_specs=[pl.BlockSpec((hb, bq, D), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((hb, bk, D), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((hb, bk, D), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((hb, bq, D), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((hb, bq, D), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=('arbitrary',)),
            )(q, k, k)
        dt = benchmark(f, q, k, reps=10)
        flops = 4 * hb * bq * bk * D * nsteps
        print(f'MXU qk+pv ({hb},{bq},{bk})x{nsteps}: {dt*1e3:7.2f} ms '
              f'({flops/dt/1e12:6.1f} TFLOP/s)', flush=True)

    time_mxu(4, 256, 1024, 612)
    time_mxu(5, 256, 256, 1960)

    # ---- 4. pure DMA + grid-step overhead -------------------------------
    # same grid as v1, k/v tiles streamed from HBM, near-zero compute
    def dma_kernel(q_ref, k_ref, v_ref, o_ref):
        t = (k_ref[:1, :1, :].astype(jnp.float32)
             + v_ref[:1, :1, :].astype(jnp.float32))
        o_ref[:] = q_ref[:] + jnp.sum(t).astype(q_ref.dtype)

    def time_dma(hb, bq, bk, span):
        nqb = T // bq
        kh = jnp.asarray(rng.standard_normal((H, T, D)), jnp.bfloat16)

        @jax.jit
        def f(q, k):
            return pl.pallas_call(
                dma_kernel,
                grid=(H // hb, nqb, span),
                in_specs=[
                    pl.BlockSpec((hb, bq, D), lambda g, i, j: (g, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((hb, bk, D),
                                 lambda g, i, j: (g, (i + j) % (T // bk), 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((hb, bk, D),
                                 lambda g, i, j: (g, (i + j) % (T // bk), 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((hb, bq, D),
                                       lambda g, i, j: (g, i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, T, D), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=('parallel', 'arbitrary',
                                         'arbitrary')),
            )(q, k, k)
        dt = benchmark(f, qh, kh, reps=10)
        nsteps = (H // hb) * nqb * span
        gbytes = nsteps * (2 * hb * bk * D * 2) / 2**30
        print(f'DMA-only ({hb},{bq},{bk}) span={span} steps={nsteps}: '
              f'{dt*1e3:7.2f} ms ({gbytes/dt:6.1f} GB/s k+v, '
              f'{dt/nsteps*1e6:5.2f} us/step)', flush=True)

    time_dma(4, 256, 1024, 4)
    time_dma(4, 256, 1024, 1)
    time_dma(5, 256, 256, 10)
    time_dma(5, 256, 256, 1)


if __name__ == '__main__':
    main()

# ---- 5. token-minor DMA: (hb, D, bk) tiles from (H, D, T) arrays ----
def extra(T, H, D, qh, rng):
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from esme_tpu.profiling import benchmark

    def dma_kernel(k_ref, v_ref, o_ref):
        t = (k_ref[:1, :, :1].astype(jnp.float32)
             + v_ref[:1, :, :1].astype(jnp.float32))
        o_ref[:] = o_ref[:] * 0 + jnp.sum(t).astype(o_ref.dtype)

    kT = jnp.asarray(np.random.default_rng(1).standard_normal((H, D, T)),
                     jnp.bfloat16)

    def time_dma_t(hb, bk, span, bq=256):
        nqb = T // bq
        nkb = T // bk

        @jax.jit
        def f(k):
            return pl.pallas_call(
                dma_kernel,
                grid=(H // hb, nqb, span),
                in_specs=[
                    pl.BlockSpec((hb, D, bk),
                                 lambda g, i, j: (g, 0, (i + j) % nkb),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((hb, D, bk),
                                 lambda g, i, j: (g, 0, (i + j) % nkb),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((hb, 8, 128),
                                       lambda g, i, j: (g, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, 8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=('parallel', 'arbitrary',
                                         'arbitrary'),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(k, k)
        try:
            dt = benchmark(f, kT, reps=10)
        except Exception as e:
            print(f'DMA-T (hb={hb},bk={bk}) span={span}: FAIL {str(e)[:90]}',
                  flush=True)
            return
        nsteps = (H // hb) * nqb * span
        gbytes = nsteps * (2 * hb * bk * D * 2) / 2**30
        print(f'DMA-T (hb={hb:2d},D,bk={bk:4d}) span={span:2d} '
              f'steps={nsteps:5d}: {dt*1e3:7.2f} ms ({gbytes/dt:6.1f} GB/s, '
              f'{dt/nsteps*1e6:5.2f} us/step)', flush=True)

    time_dma_t(4, 1024, 4)
    time_dma_t(20, 1024, 4)
    time_dma_t(20, 512, 6)
    time_dma_t(20, 256, 10)
    time_dma_t(10, 256, 10)
    time_dma_t(5, 256, 10)
    time_dma_t(20, 256, 5)
    time_dma_t(10, 512, 6)


if __name__ == '__main__':
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == 'extra':
        T, lens, seg, rng = make_shape()
        qh = None
        extra(T, 20, 64, qh, rng)
