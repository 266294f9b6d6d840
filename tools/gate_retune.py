"""Re-measure the round-4 heuristic gates at the 10k nockpt operating
point now that job mode buys the FUSED backward (round 5): the
768-job gate (flash.JOB_MODE_MIN_JOBS) and the 16384-token
token-minor gate (esm.TM_MIN_TOKENS) were tuned when job mode only
changed the forward sweep.

Each (tm, jobs) cell runs in its own SUBPROCESS: an OOM on this
backend wedges the process allocator (even fresh scalar allocations
fail afterward), so in-process sweeps poison later cells.

REGIME: random-init weights, synthetic batches; real step timings.
Usage: python tools/gate_retune.py            # parent, sweeps cells
       python tools/gate_retune.py <tm> <jobs>  # one cell
"""

import gc
import subprocess
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def run_cell(tm: bool, jobs: bool):
    import jax
    from esme_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import esme_tpu.models.esm as esm_mod
    import esme_tpu.ops.flash as flash
    from esme_tpu import ESM2
    from esme_tpu.train.trainer import MaskedPLM
    sys.path.insert(0, '/root/repo/tools')
    from decompose_train import make_batch

    esm_mod.TM_MIN_TOKENS = 256 if tm else 16384
    flash.JOB_MODE_MIN_JOBS = 1 if jobs else 768

    model = ESM2(num_layers=33, embed_dim=1280, attention_heads=20,
                 rng=0)
    b = make_batch(10_000, model.config)

    class _B:
        pass
    bb = _B()
    bb.tokens = b['tokens']
    bb.masked_tokens = b['masked']
    bb.mask = b['mask']
    bb.cu_lens = b['cu']
    bb.max_len = b['max_len']
    mfu_flops = 3 * 2 * 651084833 * b['real'] + 3.5 * b['attn_flops']

    model.checkpointing = False
    plm = MaskedPLM(model, attn_impl='flash')
    try:
        plm.training_step(bb)
        t0 = time.time()
        for _ in range(10):
            plm.training_step(bb)
        dt = (time.time() - t0) / 10
        print(f'CELL {int(tm)},{int(jobs)},{dt*1e3:.2f},'
              f'{mfu_flops/dt/197e12:.4f}', flush=True)
    except Exception as e:
        print(f'CELL {int(tm)},{int(jobs)},FAIL {type(e).__name__}: '
              f'{str(e)[:60]},-1', flush=True)


def main():
    print('# 10k nockpt gate retune (fused bwd era); each cell a fresh '
          'process', flush=True)
    print('tm,jobs,step_ms,mfu', flush=True)
    for tm in (0, 1):
        for jobs in (0, 1):
            p = subprocess.run(
                [sys.executable, __file__, str(tm), str(jobs)],
                capture_output=True, text=True, timeout=1800)
            rows = [l for l in p.stdout.splitlines()
                    if l.startswith('CELL ')]
            if rows:
                print(rows[-1][5:], flush=True)
            else:
                print(f'{tm},{jobs},NO-OUTPUT rc={p.returncode},-1',
                      flush=True)


if __name__ == '__main__':
    if len(sys.argv) == 3:
        run_cell(bool(int(sys.argv[1])), bool(int(sys.argv[2])))
    else:
        main()
