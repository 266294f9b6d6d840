"""Generate a synthetic proteome FASTA + .fai index for benchmark
capture in the no-egress environment (reference benchmarks run on the
human UniProt proteome, workflow/inference/inference_on_human.py).
Length distribution: log-normal clipped to [50, max_len], roughly the
UniProt shape (median ~350 aa).

Usage: python tools/make_synthetic_fasta.py out.fa --n 2000
"""

import argparse

import numpy as np

AA = list('LAGVSERTIDPKQNFYMHWC')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('out')
    ap.add_argument('--n', type=int, default=2000)
    ap.add_argument('--max-len', type=int, default=3500)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    lens = np.clip(rng.lognormal(5.9, 0.6, args.n).astype(int),
                   50, args.max_len)
    with open(args.out, 'w') as f:
        for i, n in enumerate(lens):
            seq = ''.join(rng.choice(AA, size=int(n)))
            f.write(f'>synth{i:05d}\n')
            for j in range(0, len(seq), 60):
                f.write(seq[j:j + 60] + '\n')

    import sys
    sys.path.insert(0, __file__.rsplit('/', 2)[0])
    from esme_tpu.fasta import write_fai
    fai = write_fai(args.out)
    print(f'{args.out}: {args.n} seqs, {int(lens.sum())} aa total; '
          f'index {fai}')


if __name__ == '__main__':
    main()
