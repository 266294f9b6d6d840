"""Decompose ESM2-650M packed-forward time on the real chip: full
model, attention stubbed to identity, and no LM head — to locate the
non-speed-of-light time."""
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

import esme_tpu.models.modules as modules
from esme_tpu import ESM2
from esme_tpu.alphabet import Alphabet
from esme_tpu.models.esm import forward_flat, packed_meta
from esme_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, *args, reps=5):
    np.asarray(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        # scalar host copy forces completion without tunnel transfer cost
        np.asarray(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / reps


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

    t_full = run()
    print(f'full fwd             {t_full*1e3:8.1f} ms', flush=True)
    t_nohead = run(with_head=False)
    print(f'no lm_head           {t_nohead*1e3:8.1f} ms', flush=True)

    real_attn = modules.segment_attention
    modules.segment_attention = lambda q, k, v, s, **kw: v
    forward_flat.clear_cache()
    t_noattn = run()
    print(f'attention stubbed    {t_noattn*1e3:8.1f} ms', flush=True)
    modules.segment_attention = real_attn

    print(f'attention share      {(t_full-t_noattn)*1e3:8.1f} ms')
    print(f'lm_head share        {(t_full-t_nohead)*1e3:8.1f} ms')


if __name__ == '__main__':
    main()
