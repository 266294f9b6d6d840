"""Benchmark-grid orchestrator — the Snakemake-workflow equivalent
(reference: workflow/Snakefile:41-65, workflow/inference/Snakefile:39-92,
workflow/train/Snakefile:7-178).

Runs the benchmark scripts over a model × quantization grid, writing
one CSV per cell into an output directory. Existing non-empty outputs
are skipped, so an interrupted sweep resumes where it stopped (the
Snakemake re-run semantics).

Usage:
  python benchmarks/run_all.py --out results/ \
      --models esm2_8m,esm2_35m,esm2_150m --quant none,8bit,4bit \
      --suites inference_runtime,inference_memory,train_runtime
"""

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def cells(args):
    models = args.models.split(',')
    quants = args.quant.split(',')
    suites = args.suites.split(',')

    if 'inference_runtime' in suites:
        for m in models:
            for q in quants:
                yield (f'inference_runtime__{m}_{q}',
                       ['inference_runtime.py', '--model', m,
                        '--quantization', q, '--batch', str(args.batch),
                        '--min-bucket', str(args.min_bucket),
                        '--max-bucket', str(args.max_bucket),
                        '--step', str(args.bucket_step),
                        '--reps', str(args.reps)])
    if 'inference_memory' in suites:
        for m in models:
            for q in quants:
                yield (f'inference_memory__{m}_{q}',
                       ['inference_memory.py', '--model', m,
                        '--quantization', q, '--batch', str(args.batch),
                        '--min-bucket', str(args.min_bucket),
                        '--max-bucket', str(args.max_bucket),
                        '--step', str(args.bucket_step)])
    if 'max_batch_size' in suites:
        for m in models:
            yield (f'max_batch_size__{m}',
                   ['max_batch_size.py', '--model', m])
    if 'train_runtime' in suites:
        for m in models:
            for mode, extra in [
                    ('ckpt', ['--checkpointing']),
                    ('lora', ['--checkpointing', '--lora-rank', '16']),
                    ('nockpt', [])]:
                # nockpt runs at the reference's un-checkpointed
                # operating point (token_per_batch=10k, reference:
                # workflow/train/runtime_lightning.py:35-39); ckpt at
                # the DeepSpeed point (50k, runtime.py:28-30)
                tpb = (args.nockpt_token_per_batch if mode == 'nockpt'
                       else args.token_per_batch)
                yield (f'train_runtime__{m}_{mode}',
                       ['train_runtime.py', '--model', m,
                        '--token-per-batch', str(tpb),
                        '--steps', str(args.train_steps)] + extra)
    if 'train_memory' in suites:
        for m in models:
            for mode in ['none', 'checkpointing', 'lora', '8bit']:
                yield (f'train_memory__{m}_{mode}',
                       ['train_memory.py', '--model', m, '--mode', mode,
                        '--min-bucket', str(args.min_bucket),
                        '--max-bucket', str(args.max_bucket),
                        '--step', str(args.bucket_step)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='results')
    ap.add_argument('--models', default='esm2_8m,esm2_150m,esm2_650m')
    ap.add_argument('--quant', default='none,8bit,4bit')
    ap.add_argument('--suites',
                    default='inference_runtime,inference_memory,'
                            'train_runtime')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--min-bucket', type=int, default=250)
    ap.add_argument('--max-bucket', type=int, default=3500)
    ap.add_argument('--bucket-step', type=int, default=650)
    ap.add_argument('--reps', type=int, default=10)
    ap.add_argument('--token-per-batch', type=int, default=50_000)
    ap.add_argument('--nockpt-token-per-batch', type=int, default=10_000)
    ap.add_argument('--train-steps', type=int, default=8)
    ap.add_argument('--timeout', type=int, default=1800,
                    help='per-cell timeout in seconds')
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    results = []
    for name, cmd in cells(args):
        out_path = os.path.join(args.out, name + '.csv')
        if os.path.exists(out_path) and os.path.getsize(out_path) > 0:
            print(f'[skip] {name} (exists)', flush=True)
            results.append((name, 'cached'))
            continue
        script = os.path.join(HERE, cmd[0])
        full = [sys.executable, script] + cmd[1:]
        print(f'[run ] {name}: {" ".join(cmd)}', flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run(full, capture_output=True, text=True,
                                  timeout=args.timeout)
        except subprocess.TimeoutExpired:
            print(f'[fail] {name}: timeout after {args.timeout}s',
                  flush=True)
            results.append((name, 'timeout'))
            continue
        if proc.returncode != 0:
            print(f'[fail] {name}: rc={proc.returncode}\n'
                  f'{proc.stderr[-2000:]}', flush=True)
            results.append((name, f'rc={proc.returncode}'))
            continue
        with open(out_path + '.tmp', 'w') as f:
            f.write(proc.stdout)
        os.replace(out_path + '.tmp', out_path)
        dt = time.time() - t0
        print(f'[done] {name} in {dt:.0f}s -> {out_path}', flush=True)
        results.append((name, 'ok'))

    print('\n=== summary ===')
    for name, status in results:
        print(f'{status:>8}  {name}')
    failures = [n for n, s in results if s not in ('ok', 'cached')]
    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main()
