"""Positional-extension workflow: extend ESM1b 1024 -> 4096 positions,
train ONLY ``embed_positions.weight`` on long synthetic sequences, then
benchmark the long-context buckets the stock table cannot reach
(reference: workflow/positional_emb/train_positional.py:42-56 trains
only the position table on UniRef50 sequences 1024<len<4096,
workflow/positional_emb/uniref50_long.py:9-11).

REGIME: random-init trunk + synthetic sequences (no egress) — the
capture proves the extend-then-train-then-serve pipeline end to end;
runtime numbers are real hardware measurements.

Usage: python benchmarks/extend_positions.py [--steps 6]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=6)
    ap.add_argument('--new-max', type=int, default=4096)
    ap.add_argument('--token-budget', type=int, default=8192)
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from dataclasses import replace
    from esme_tpu import ESM1b
    from esme_tpu.alphabet import Alphabet, mask_tokens
    from esme_tpu.extend import extend_positions, positions_only_mask
    from esme_tpu.models.config import esm1b_config
    from esme_tpu.profiling import benchmark
    from esme_tpu.train import MaskedPLM

    print('# REGIME: random-init trunk, synthetic long sequences — '
          'pipeline capture; runtimes are real measurements', flush=True)
    # start from the PRE-extension 1024-position table: the reference
    # repo ships ESM1b already extended to 4096 (esme/esm.py:632) —
    # the product of the very workflow this script mirrors, which
    # begins from fair-esm's original 1024 positions
    cfg1024 = replace(esm1b_config(), learned_positions=1024)
    model = ESM1b(config=cfg1024, rng=0)
    n_pos_before = int(model.params['embed_positions'].shape[0])

    # the stock table must REFUSE long input (parity with the
    # reference's 1024-position limit, esme/embedding.py:47-51)
    long_tok = np.full((1, 2000), 5, np.int32)
    try:
        model.forward(long_tok)
        raise AssertionError('expected position-table overflow')
    except ValueError as e:
        print(f'# stock table refuses len 2000 as expected: '
              f'{str(e)[:60]}', flush=True)

    extend_positions(model, args.new_max)
    print(f'extended positions: {n_pos_before} -> '
          f'{model.params["embed_positions"].shape[0]} rows', flush=True)

    # train only embed_positions on >1024-aa synthetic sequences
    # (reference data selection: 1024 < len < 4096)
    model.checkpointing = True
    mask = positions_only_mask(model.params)
    plm = MaskedPLM(model, learning_rate=1e-3, trainable_mask=mask)
    rng = np.random.default_rng(0)
    frozen_probe = np.asarray(
        jax.tree.leaves(model.params['layers'])[0]).copy()

    for step in range(args.steps):
        n = int(rng.integers(1100, args.token_budget - 2 - 2))
        budget = args.token_budget
        toks = np.full(budget, Alphabet.padding_idx, np.int32)
        toks[0] = Alphabet.cls_idx
        toks[1:n + 1] = rng.integers(4, 24, n)
        toks[n + 1] = Alphabet.eos_idx
        cu = np.asarray([0, n + 2], np.int32)
        masked, msk = mask_tokens(toks[None], alphabet=Alphabet,
                                  rng=np.random.default_rng(step))
        masked, msk = masked[0], msk[0]
        msk[n + 2:] = False

        class _B:
            pass
        b = _B()
        b.tokens = toks
        b.masked_tokens = masked
        b.mask = msk
        b.cu_lens = cu
        b.max_len = n + 2
        loss = plm.training_step(b)
        print(f'step={step} len={n} loss={loss:.4f}', flush=True)

    # only the position table may change
    frozen_after = np.asarray(jax.tree.leaves(model.params['layers'])[0])
    assert np.array_equal(frozen_probe, frozen_after), \
        'trunk weights changed — positions_only_mask violated'
    print('# trunk weights bit-identical after training (only '
          'embed_positions trained)', flush=True)

    # long-context inference buckets the stock table cannot serve
    # (fills the reference grid's 1875/3500 esm1b cells,
    # workflow/inference/extract_uniprotkb.py buckets)
    model.checkpointing = False
    print('model,seq_len,batch,sec_per_batch,tokens_per_sec', flush=True)
    for L in (1875, 3500):
        B = 4   # reference grid uses 16; 4 keeps the padded fwd in HBM
        toks = np.full((B, L + 2), 5, np.int32)
        toks[:, 0] = Alphabet.cls_idx
        toks[:, -1] = Alphabet.eos_idx

        def f(t):
            return model.forward(t)
        dt = benchmark(f, jnp.asarray(toks), reps=args.reps)
        print(f'esm1b_ext4096,{L},{B},{dt:.3f},'
              f'{B * (L + 2) / dt:.0f}', flush=True)


if __name__ == '__main__':
    main()
