"""Max packed-batch sweep: forward at token budgets 10k→100k of packed
250-aa proteins (reference: workflow/inference/max_batch_size.py:23-40).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='esm2_650m')
    ap.add_argument('--budgets', default='10000,25000,50000,75000,100000')
    ap.add_argument('--seq-len', type=int, default=250)
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    import jax.numpy as jnp
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from esme_tpu.alphabet import Alphabet
    from esme_tpu.models.config import config_for
    from esme_tpu.models.esm import _class_for, forward_flat, packed_meta
    from esme_tpu.profiling import benchmark

    cfg = config_for(args.model)
    model = _class_for(cfg.family)(config=cfg, rng=0)
    rng = np.random.default_rng(0)
    seq = args.seq_len + 2

    print('token_budget,sec_per_fwd,tokens_per_sec,peak_gb')
    for budget in (int(b) for b in args.budgets.split(',')):
        n = budget // seq
        cu = np.arange(0, (n + 1) * seq, seq, dtype=np.int32)
        tokens = np.full(budget, Alphabet.padding_idx, np.int32)
        tokens[:cu[-1]] = rng.integers(4, 24, cu[-1])
        tj = jnp.asarray(tokens)
        seg, pos = packed_meta(jnp.asarray(cu), budget)

        def fwd(t, s, p):
            return forward_flat(model.params, cfg, t, s, p,
                                with_head=True, max_seqlen=seq)

        try:
            # XLA buffer-assignment peak (runtime stats are absent on
            # the tunneled backend)
            peak_gb = -1.0
            try:
                from esme_tpu.profiling import memory_analysis_gb
                ana = memory_analysis_gb(
                    forward_flat, model.params, cfg, tj, seg, pos,
                    with_head=True, max_seqlen=seq)
                if ana:
                    peak_gb = ana['total_gb']
            except Exception:
                pass
            dt = benchmark(fwd, tj, seg, pos, reps=args.reps)
        except Exception as e:
            print(f'{budget},-1,-1,-1  # {type(e).__name__}')
            continue
        print(f'{budget},{dt:.4f},{cu[-1] / dt:.0f},'
              f'{peak_gb:.2f}', flush=True)


if __name__ == '__main__':
    main()
