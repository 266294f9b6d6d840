"""Summarize the results/ CSV grid into results/README.md.

The recorded-numbers equivalent of the reference paper's supplementary
tables (reference: workflow/figures/sup_table.py). Run after
benchmarks/run_all.py:
  python benchmarks/summarize.py --results results/
"""

import argparse
import glob
import os


def read_csv(path):
    with open(path) as f:
        lines = [l.strip() for l in f
                 if l.strip() and not l.startswith('#')]
    if not lines:
        return []
    header = lines[0].split(',')
    rows = []
    for line in lines[1:]:
        body = line.split('#')[0].strip().rstrip(',')
        rows.append(dict(zip(header, body.split(','))))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--results', default='results')
    args = ap.parse_args()

    groups = {}
    for path in sorted(glob.glob(os.path.join(args.results, '*.csv'))):
        name = os.path.basename(path)[:-4]
        suite, _, cell = name.partition('__')
        groups.setdefault(suite, []).append((cell, read_csv(path)))

    out = ['# Recorded TPU benchmark results', '',
           'One real TPU v5e chip via the benchmark grid '
           '(`benchmarks/run_all.py`). The runtime/max-batch tables '
           'come from a single coherent capture (round 4, '
           'token-minor transposed-score kernels); auxiliary suites '
           '(memory, quality smokes, kernel ablations, the round-5 '
           'train/backward decompositions, config grids, and '
           'adopt/refute A/Bs) are captured by their own scripts — '
           'every file carries a REGIME header stating its data '
           'provenance. Round-5 additions: decompose_bwd_r5, '
           'decompose_train_r5, train_configs_r5, job_buckets_r5, '
           'gate_retune_r5, aligned_packing_ab, '
           'extend_positions__esm1b, task_aav__esm2_8m, big-model '
           'memory proofs. Re-generate with '
           '`python benchmarks/summarize.py`.', '']

    if 'inference_runtime' in groups:
        out += ['## Inference runtime (batch 16, true-sync timed reps; '
                'peak = XLA buffer assignment)', '',
                '| model/quant | length | sec/fwd | tokens/sec | '
                'peak GB |', '|---|---|---|---|---|']
        for cell, rows in groups['inference_runtime']:
            for r in rows:
                out.append(f'| {cell} | {r["length"]} | '
                           f'{r["sec_per_fwd"]} | {r["tokens_per_sec"]} |'
                           f' {r.get("peak_gb", "-1")} |')
        out.append('')

    if 'inference_memory' in groups:
        out += ['## Inference memory (XLA buffer assignment; '
                'temp = activations)', '',
                '| model/quant | length | temp GB | total GB |',
                '|---|---|---|---|']
        for cell, rows in groups['inference_memory']:
            for r in rows:
                out.append(f'| {cell} | {r["length"]} | {r["temp_gb"]} | '
                           f'{r["total_gb"]} |')
        out.append('')

    if 'train_runtime' in groups:
        out += ['## MLM train-step runtime (packed token budget)', '',
                '| model/config | tokens/batch | sec/step | '
                'train tokens/sec | peak GB |', '|---|---|---|---|---|']
        for cell, rows in groups['train_runtime']:
            for r in rows:
                out.append(f'| {cell} | {r["token_per_batch"]} | '
                           f'{r["sec_per_step"]} | '
                           f'{r["train_tokens_per_sec"]} | '
                           f'{r.get("peak_gb", "-1")} |')
        out.append('')

    for suite in groups:
        if suite not in ('inference_runtime', 'inference_memory',
                         'train_runtime'):
            out += [f'## {suite}', '']
            for cell, rows in groups[suite]:
                out.append(f'### {cell}')
                if rows:
                    keys = list(rows[0])
                    out.append('| ' + ' | '.join(keys) + ' |')
                    out.append('|' + '---|' * len(keys))
                    for r in rows:
                        out.append('| ' + ' | '.join(
                            r.get(k, '') for k in keys) + ' |')
                out.append('')

    path = os.path.join(args.results, 'README.md')
    with open(path, 'w') as f:
        f.write('\n'.join(out) + '\n')
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
