"""ProteinGym-style DMS evaluation: Spearman of mask-margin scores vs
experimental DMS scores, multi-mutants scored as sums of singles
(reference: workflow/variant/dms_results.py:86-142, multi-mutant sum at
:111-113).

Usage:
  python benchmarks/dms_eval.py --model esm2_650m.safetensors \
      --seq-file target.txt --dms study.csv
DMS csv columns: mutant (e.g. 'A42G' or 'A42G:K60R'), DMS_score.
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
    ap.add_argument('--seq-file', required=True,
                    help='file containing the wild-type sequence')
    ap.add_argument('--dms', required=True)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--max-len', type=int, default=None,
                    help='window-truncate long targets (baselines use '
                         '1022, the packed model needs none)')
    args = ap.parse_args()

    import pandas as pd
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from esme_tpu.models.esm import ESM
    from esme_tpu.variant import predict_mask_margin

    seq = open(args.seq_file).read().split()[-1].strip()
    model = ESM.from_pretrained(args.model)
    scores = predict_mask_margin(model, seq, batch_size=args.batch_size,
                                 max_len=args.max_len)

    dms = pd.read_csv(args.dms)
    preds = []
    for mut in dms['mutant']:
        # multi-mutants = sum of singles (reference: dms_results.py:111)
        total = 0.0
        for m in str(mut).split(':'):
            total += float(scores.loc[m, 'score'])
        preds.append(total)

    rho = spearman(preds, dms['DMS_score'].values)
    print(f'n={len(dms)} spearman={rho:.4f}')


if __name__ == '__main__':
    main()
