"""Decompose ESM2-650M packed-forward time on the real chip.

Variants are selected via the STATIC ``attn_impl`` jit argument (so
each one genuinely recompiles — monkey-patching module globals does
not invalidate jit caches):

* ``flash``  — production path (fused split+RoPE+flash+merge)
* ``skip``   — identity attention: isolates matmul+LN+GELU cost
* standalone kernel timings for the fused attention complex and the
  relayout-only part, at the same shape.
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from esme_tpu import ESM2
from esme_tpu.alphabet import Alphabet
from esme_tpu.models.esm import forward_flat, packed_meta
from esme_tpu.utils import enable_compilation_cache

enable_compilation_cache()

PEAK_BF16_FLOPS = 197e12


def timeit(fn, *args, reps=5):
    # true-sync timing (block_until_ready is a no-op on this runtime)
    from esme_tpu.profiling import benchmark
    return benchmark(fn, *args, reps=reps)


def main():
    model = ESM2(num_layers=33, embed_dim=1280, attention_heads=20, rng=0)
    cfg = model.config
    rng = np.random.default_rng(0)
    token_budget = 50_000
    lens, total = [], 0
    while total < token_budget - 1024:
        n = int(rng.integers(100, 1000))
        lens.append(n + 2)
        total += n + 2
    cu = np.cumsum([0, *lens]).astype(np.int32)
    tokens = np.full(token_budget, Alphabet.padding_idx, np.int32)
    tokens[:cu[-1]] = rng.integers(4, 24, cu[-1])
    max_len = int(max(lens))
    tokens_j = jnp.asarray(tokens)
    seg_ids, pos_ids = packed_meta(jnp.asarray(cu), token_budget)

    def run(with_head=True, attn='flash'):
        def f(t, s, p):
            return forward_flat(model.params, cfg, t, s, p,
                                with_head=with_head, attn_impl=attn,
                                max_seqlen=max_len)
        return timeit(f, tokens_j, seg_ids, pos_ids)

    n_params = sum(x.size for x in jax.tree.leaves(model.params))
    sol = 2 * n_params * int(cu[-1]) / PEAK_BF16_FLOPS
    t_full = run()
    print(f'full fwd (flash)     {t_full*1e3:8.1f} ms '
          f'(matmul speed-of-light {sol*1e3:.0f} ms)', flush=True)
    t_skip = run(attn='skip')
    print(f'identity attention   {t_skip*1e3:8.1f} ms', flush=True)
    t_nohead = run(with_head=False)
    print(f'no lm_head           {t_nohead*1e3:8.1f} ms', flush=True)
    print(f'attention complex    {(t_full-t_skip)*1e3:8.1f} ms '
          f'({(t_full-t_skip)/33*1e3:.2f} ms/layer)')
    print(f'lm_head share        {(t_full-t_nohead)*1e3:8.1f} ms')

    # standalone: fused attention complex at the model's exact shape
    from esme_tpu.ops.fused_attn import fused_rotary_flash
    from esme_tpu.ops.flash import ALIGN, DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q
    from esme_tpu.ops.rotary import rotary_cos_sin

    T = ((token_budget + ALIGN - 1) // ALIGN) * ALIGN
    seg_pad = jnp.concatenate([
        seg_ids, jnp.full((T - token_budget,), int(len(lens)) + 1,
                          jnp.int32)])
    pos_pad = jnp.pad(pos_ids, (0, T - token_budget))
    HD = cfg.embed_dim
    x = jnp.asarray(rng.standard_normal((T, HD)), jnp.bfloat16)
    cos, sin = rotary_cos_sin(pos_pad, cfg.head_dim, dtype=jnp.bfloat16)

    @jax.jit
    def attn_only(q, k, v):
        return fused_rotary_flash(q, k, v, cos, sin, seg_pad,
                                  cfg.attention_heads, DEFAULT_BLOCK_Q,
                                  DEFAULT_BLOCK_K, max_len, False)
    t_attn = timeit(attn_only, x, x, x, reps=20)
    print(f'fused attn standalone{t_attn*1e3:8.2f} ms/layer '
          f'(x33 = {t_attn*33*1e3:.0f} ms)')

    # relayout-only: split + merge without flash
    from esme_tpu.ops.headsplit import merge_heads, split_heads_rotary

    @jax.jit
    def relayout_only(q, k, v):
        qh, kh, vh = split_heads_rotary(q, k, v, cos, sin,
                                        cfg.attention_heads)
        return merge_heads(vh)
    t_rel = timeit(relayout_only, x, x, x, reps=20)
    print(f'relayout standalone  {t_rel*1e3:8.2f} ms/layer '
          f'(x33 = {t_rel*33*1e3:.0f} ms)')


if __name__ == '__main__':
    main()
