"""Segment-aligned packing A/B (VERDICT r4 next #9 / PERF.md's own
next-lever analysis).

Hypothesis from round 4: padding every sequence to a tile multiple
(256) removes q-block straddling, so attention tile coverage drops
from ~2x Sum(l/256)^2 toward Sum(ceil(l/256))^2 — at the price of
~+24% tokens through the projections/MLP (which run at matmul
speed-of-light). This tool computes both coverage counts host-side AND
measures the real forward on chip for the same 87 real sequences.

REGIME: random-init weights, synthetic sequences; timings are real.

Usage: python tools/aligned_packing_ab.py
"""

import sys

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from esme_tpu import ESM2
    from esme_tpu.alphabet import Alphabet
    from esme_tpu.models.esm import forward_flat, packed_meta
    from esme_tpu.ops.flash import (ALIGN, host_num_jobs,
                                    host_num_jobs_from_cu)
    from esme_tpu.ops.segment import TAIL_CHUNK
    from esme_tpu.profiling import benchmark

    model = ESM2(num_layers=33, embed_dim=1280, attention_heads=20,
                 rng=0)
    cfg = model.config
    rng = np.random.default_rng(0)

    # the bench workload: 100-1000aa sequences to a 50k budget
    token_budget = 50_000
    lens, total = [], 0
    while total < token_budget - 1024:
        n = int(rng.integers(100, 1000))
        lens.append(n + 2)
        total += n + 2
    seqs = [rng.integers(4, 24, l).astype(np.int32) for l in lens]
    real_tokens = sum(lens)
    max_len = max(lens)

    def run(tag, tokens, cu, T):
        seg_ids, pos_ids = packed_meta(jnp.asarray(cu), T)
        nj = host_num_jobs_from_cu(cu, T)

        def f(t, s, p):
            return forward_flat(model.params, cfg, t, s, p,
                                with_head=True, attn_impl='flash',
                                max_seqlen=max_len, num_jobs=nj)
        dt = benchmark(f, jnp.asarray(tokens), seg_ids, pos_ids, reps=10)
        print(f'{tag},{T},{real_tokens},{nj},{dt*1e3:.1f},'
              f'{real_tokens/dt:.0f}', flush=True)
        return dt

    # A: standard dense packing
    cu_a = np.cumsum([0] + lens).astype(np.int32)
    T_a = token_budget
    tok_a = np.full(T_a, Alphabet.padding_idx, np.int32)
    tok_a[:cu_a[-1]] = np.concatenate(seqs)

    # B: tile-aligned packing — each sequence starts at a 256 boundary;
    # inter-sequence pads fall into chunked fake segments via the
    # chunked-tail rule applied per gap (we emit explicit zero-length
    # real segments none; pads inherit the NEXT fake chunk ids by
    # construction of cu: pad gap belongs to no [cu_i, cu_i+1) range
    # only if cu reflects padded starts — so build cu over the PADDED
    # layout with each segment's [start, start+len) and let the pads
    # between segments join the trailing fake region of... simplest
    # correct construction: give every sequence its padded slot as TWO
    # cu entries (real part, pad part) is not expressible with plain
    # cu_lens; instead extend each sequence's segment to cover its own
    # padding (pad tokens attend within their donor sequence — extra
    # coverage but aligned spans).
    starts = []
    off = 0
    for l in lens:
        starts.append(off)
        off += -(-l // 256) * 256
    T_b = -(-off // ALIGN) * ALIGN
    tok_b = np.full(T_b, Alphabet.padding_idx, np.int32)
    cu_b = [0]
    for s0, l, s in zip(starts, lens, seqs):
        tok_b[s0:s0 + l] = s
        cu_b.append(s0 + -(-l // 256) * 256)
    cu_b = np.asarray(cu_b, np.int32)

    # host-side coverage accounting (over the ALIGN-padded layout the
    # kernel actually sees)
    def coverage(cu, T):
        T = -(-T // 256) * 256
        seg = np.searchsorted(cu[1:], np.arange(T), side='right')
        tail = np.arange(T) >= cu[-1]
        seg = np.where(tail, seg + (np.arange(T) - cu[-1]) // TAIL_CHUNK,
                       seg)
        nb = T // 256
        s2 = seg.reshape(nb, 256)
        ov = (s2.min(1)[None, :] <= s2.max(1)[:, None]) & \
             (s2.max(1)[None, :] >= s2.min(1)[:, None])
        idx = np.arange(nb)
        start = np.where(ov, idx, nb).min(1)
        end = np.where(ov, idx + 1, 0).max(1)
        return int((end - start).sum())

    ideal = sum(int(-(-l // 256)) ** 2 for l in lens)
    print(f'# real_tokens={real_tokens} seqs={len(lens)} '
          f'ideal_tile_coverage={ideal}')
    print(f'# dense:   T={T_a} covered_tiles={coverage(cu_a, T_a)}')
    print(f'# aligned: T={T_b} covered_tiles={coverage(cu_b, T_b)} '
          f'(+{T_b - T_a} pad tokens = '
          f'{100 * (T_b - T_a) / T_a:.0f}% more MLP work)')
    print('layout,T,real_tokens,num_jobs,fwd_ms,real_tok_per_sec')
    dt_a = run('dense', tok_a, cu_a, T_a)
    dt_b = run('aligned', tok_b, cu_b, T_b)
    verdict = 'ADOPT' if dt_b < dt_a * 0.98 else 'REFUTE'
    print(f'# verdict: {verdict} — aligned is '
          f'{(dt_b / dt_a - 1) * 100:+.1f}% vs dense at equal real '
          f'tokens', flush=True)


if __name__ == '__main__':
    main()
