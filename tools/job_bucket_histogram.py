"""Job-bucket recompile accounting over a real shuffled epoch
(VERDICT r4 weak #5 / next #7).

``num_jobs`` is a STATIC jit argument bucketed to 256
(ops/flash.py host_num_jobs), so every distinct bucket a dataset's
batches produce triggers one full-program compile of the 33-layer
step. This tool runs the actual data plane (token-budget sampler over
a synthetic proteome FASTA, per-epoch reshuffle) for several epochs
and histograms the buckets — host-side only, no device work.

Usage: python tools/job_bucket_histogram.py [--budget 50000] [--epochs 3]
"""

import argparse
import collections
import os
import sys
import tempfile

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--budget', type=int, default=50_000)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--n-seqs', type=int, default=2000)
    args = ap.parse_args()

    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    from esme_tpu.data import MaskedFastaTokenDataset
    from esme_tpu.fasta import write_fai
    from esme_tpu.ops.flash import host_num_jobs_from_cu

    # synthetic proteome, UniProt-ish length distribution
    rng = np.random.default_rng(0)
    lens = np.clip(rng.lognormal(5.9, 0.6, args.n_seqs).astype(int),
                   50, 1000)
    fa_path = os.path.join(tempfile.gettempdir(), 'job_hist.fa')
    with open(fa_path, 'w') as f:
        for i, n in enumerate(lens):
            seq = ''.join(rng.choice(list('LAGVSERTIDPKQNFYMHWC'),
                                     size=int(n)))
            f.write(f'>synth{i:05d}\n{seq}\n')
    write_fai(fa_path)

    buckets = collections.Counter()
    n_batches = 0
    for epoch in range(args.epochs):
        # per-epoch reshuffle = rebuild with random_state=epoch (what
        # the DataModule's set_epoch does, esme_tpu/data.py)
        ds = MaskedFastaTokenDataset(fa_path,
                                     token_per_batch=args.budget,
                                     random_state=epoch)
        for batch in ds:
            nj = host_num_jobs_from_cu(np.asarray(batch.cu_lens),
                                       int(batch.tokens.shape[0]))
            buckets[nj] += 1
            n_batches += 1

    print(f'# budget={args.budget} n_seqs={args.n_seqs} '
          f'epochs={args.epochs} batches={n_batches}')
    print('# num_jobs bucket -> batch count (None = below the 768-job '
          'gate, static-span sweep, no job-mode compile)')
    for nj, cnt in sorted(buckets.items(), key=lambda x: (x[0] is None,
                                                          x[0])):
        print(f'{nj},{cnt}')
    n_distinct = len([k for k in buckets if k is not None])
    print(f'# distinct job-mode buckets (= full-program compiles): '
          f'{n_distinct}')
    print(f'# verdict: {"OK — bucketing bounds recompiles" if n_distinct <= 3 else "recompile pressure — coarsen the bucket"}')


if __name__ == '__main__':
    main()
