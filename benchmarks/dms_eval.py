"""ProteinGym-style DMS evaluation: Spearman of mask-margin scores vs
experimental DMS scores, multi-mutants scored as sums of singles
(reference: workflow/variant/dms_results.py:86-142, multi-mutant sum at
:111-113).

Usage:
  python benchmarks/dms_eval.py --model esm2_650m.safetensors \
      --seq-file target.txt --dms study.csv
DMS csv columns: mutant (e.g. 'A42G' or 'A42G:K60R'), DMS_score.

``--synthetic`` (no-egress capture): random target sequence, DMS
scores fabricated as the model's own mask-margins + Gaussian noise
(incl. multi-mutants as sums) — the expected Spearman is then high
and positive, which validates score orientation, variant indexing,
and the multi-mutant summation end-to-end; a real-assay Spearman
still requires the ProteinGym download.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def spearman(a, b):
    def rank(x):
        order = np.argsort(x)
        r = np.empty_like(order, float)
        r[order] = np.arange(len(x))
        return r
    ra, rb = rank(np.asarray(a)), rank(np.asarray(b))
    ra -= ra.mean()
    rb -= rb.mean()
    d = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / d) if d else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', required=True)
    ap.add_argument('--seq-file', default=None,
                    help='file containing the wild-type sequence')
    ap.add_argument('--dms', default=None)
    ap.add_argument('--synthetic', action='store_true',
                    help='self-consistency capture (see docstring)')
    ap.add_argument('--seq-len', type=int, default=120)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--max-len', type=int, default=None,
                    help='window-truncate long targets (baselines use '
                         '1022, the packed model needs none)')
    args = ap.parse_args()

    import os
    import pandas as pd
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from esme_tpu.models.esm import ESM, _class_for
    from esme_tpu.variant import predict_mask_margin

    if not args.synthetic and not (args.seq_file and args.dms):
        ap.error('--seq-file/--dms required unless --synthetic')

    rng = np.random.default_rng(0)
    if args.synthetic:
        seq = ''.join(rng.choice(list('LAGVSERTIDPKQNFYMHWC'),
                                 args.seq_len))
    else:
        seq = open(args.seq_file).read().split()[-1].strip()
    if os.path.isfile(args.model):
        model = ESM.from_pretrained(args.model)
    else:
        from esme_tpu.models.config import config_for
        cfg = config_for(args.model)
        model = _class_for(cfg.family)(config=cfg, rng=0)
    scores = predict_mask_margin(model, seq, batch_size=args.batch_size,
                                 max_len=args.max_len)

    if args.synthetic:
        singles = list(scores.index)
        muts, truths = [], []
        for _ in range(400):
            k = 1 if rng.random() < 0.8 else 2
            picks = rng.choice(len(singles), size=k, replace=False)
            muts.append(':'.join(singles[i] for i in picks))
            truths.append(sum(float(scores.iloc[i]['score'])
                              for i in picks))
        truths = np.asarray(truths)
        truths = truths + rng.normal(0, 0.25 * truths.std(), len(truths))
        dms = pd.DataFrame({'mutant': muts, 'DMS_score': truths})
    else:
        dms = pd.read_csv(args.dms)
    preds = []
    for mut in dms['mutant']:
        # multi-mutants = sum of singles (reference: dms_results.py:111)
        total = 0.0
        for m in str(mut).split(':'):
            total += float(scores.loc[m, 'score'])
        preds.append(total)

    rho = spearman(preds, dms['DMS_score'].values)
    regime = 'synthetic-self-consistency' if args.dms is None \
        else 'external-dms'
    if regime != 'external-dms':
        print('# REGIME: synthetic — labels fabricated from the '
              'model\'s own noised mask-margins; measures plumbing, '
              'NOT real DMS correlation')
    print(f'regime={regime} n={len(dms)} spearman={rho:.4f}')


if __name__ == '__main__':
    main()
