"""Decompose the ESM2-650M MLM train step at the bench operating point
(token_per_batch=50k packed 100-1000aa, activation checkpointing):
fwd-loss only, fwd+bwd (value_and_grad), full step (+adam), for
ckpt on/off — locating where the ~2.4s goes before optimizing
(round-5 method: measure, then change one thing).

Usage: python tools/decompose_train.py [budget]
"""
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from esme_tpu.profiling import benchmark
from esme_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def make_batch(budget, cfg):
    from esme_tpu.alphabet import Alphabet, mask_tokens
    blens, btotal = [], 0
    brng = np.random.default_rng(2)
    while btotal < budget - 1024:
        n = int(brng.integers(100, 1000))
        blens.append(n + 2)
        btotal += n + 2
    bcu = np.cumsum([0, *blens]).astype(np.int32)
    btk = np.full(budget, Alphabet.padding_idx, np.int32)
    btk[:bcu[-1]] = brng.integers(4, 24, bcu[-1])
    masked, msk = mask_tokens(btk[None], alphabet=Alphabet,
                              rng=np.random.default_rng(1))
    masked, msk = masked[0], msk[0]
    msk[bcu[-1]:] = False
    attn_flops = 4 * sum(l * l for l in blens) * cfg.embed_dim \
        * cfg.num_layers
    return dict(tokens=btk, masked=masked, mask=msk, cu=bcu,
                max_len=int(max(blens)), real=int(bcu[-1]),
                attn_flops=attn_flops, lens=blens)


def main():
    from esme_tpu import ESM2
    from esme_tpu.loss import cross_entropy
    from esme_tpu.models.esm import forward_flat, packed_meta
    from esme_tpu.ops.flash import host_num_jobs_from_cu

    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    model = ESM2(num_layers=33, embed_dim=1280, attention_heads=20, rng=0)
    cfg = model.config
    b = make_batch(budget, cfg)
    num_jobs = host_num_jobs_from_cu(b['cu'], budget)
    seg_ids, pos_ids = packed_meta(jnp.asarray(b['cu']), budget)
    masked = jnp.asarray(b['masked'], jnp.int32)
    targets = jnp.asarray(b['tokens'], jnp.int32)
    mask = jnp.asarray(b['mask'])
    n_params = sum(x.size for x in jax.tree.leaves(model.params))

    flops_mfu = 3 * 2 * n_params * b['real'] + 3.5 * b['attn_flops']
    print(f'budget={budget} real={b["real"]} num_jobs={num_jobs} '
          f'params={n_params/1e6:.0f}M mfu_flops={flops_mfu/1e12:.1f}T',
          flush=True)

    def loss_fn(params, ckpt):
        logits = forward_flat(params, cfg, masked, seg_ids, pos_ids,
                              with_head=True, attn_impl='flash',
                              checkpointing=ckpt,
                              max_seqlen=b['max_len'],
                              num_jobs=num_jobs)
        return cross_entropy(logits, targets, mask)

    import gc
    for ckpt in (True, False):
        tag = 'ckpt  ' if ckpt else 'nockpt'
        jax.clear_caches(); gc.collect()
        try:
            f = jax.jit(lambda p: loss_fn(p, ckpt))
            dt_f = benchmark(f, model.params, reps=5)
            print(f'{tag} fwd loss        {dt_f*1e3:8.2f} ms', flush=True)
        except Exception as e:
            print(f'{tag} fwd loss FAIL {type(e).__name__}: '
                  f'{str(e)[:120]}', flush=True)
            continue
        jax.clear_caches(); gc.collect()
        try:
            g = jax.jit(jax.value_and_grad(lambda p: loss_fn(p, ckpt)))
            dt_g = benchmark(g, model.params, reps=5)
            mfu = flops_mfu / dt_g / 197e12
            print(f'{tag} fwd+bwd         {dt_g*1e3:8.2f} ms  '
                  f'(grad-only MFU {mfu:.3f})', flush=True)
        except Exception as e:
            print(f'{tag} fwd+bwd FAIL {type(e).__name__}: '
                  f'{str(e)[:120]}', flush=True)
            continue
        jax.clear_caches(); gc.collect()
        # full step via the real trainer (adam update included)
        from esme_tpu.train.trainer import MaskedPLM

        class _B:
            pass
        bb = _B()
        bb.tokens = b['tokens']
        bb.masked_tokens = b['masked']
        bb.mask = b['mask']
        bb.cu_lens = b['cu']
        bb.max_len = b['max_len']
        model.checkpointing = ckpt
        plm = MaskedPLM(model, attn_impl='flash')
        try:
            plm.training_step(bb)
            import time
            t0 = time.time()
            for _ in range(5):
                plm.training_step(bb)
            dt_s = (time.time() - t0) / 5
            mfu = flops_mfu / dt_s / 197e12
            print(f'{tag} full step       {dt_s*1e3:8.2f} ms  '
                  f'(MFU {mfu:.3f})  adam+misc '
                  f'{(dt_s-dt_g)*1e3:+.2f} ms', flush=True)
        except Exception as e:
            print(f'{tag} full step FAIL {type(e).__name__}: '
                  f'{str(e)[:120]}', flush=True)
        del plm
        model.checkpointing = False
        jax.clear_caches(); gc.collect()


if __name__ == '__main__':
    main()
