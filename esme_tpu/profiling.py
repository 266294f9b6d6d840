"""Benchmarking and profiling helpers.

TPU equivalents of the reference's measurement tools
(reference: workflow/utils/memory.py:4-16 peak-memory helper,
workflow/inference/inference_runtime.py:36-52 timed reps):

* :func:`benchmark` — mean seconds over N reps after a warmup/compile
  call (the ``torch.utils.benchmark.Timer`` analogue);
* :func:`device_memory_stats` — per-device HBM usage (the
  ``max_memory_allocated`` analogue);
* :func:`trace` — context manager around ``jax.profiler`` for
  TensorBoard-viewable traces (no reference equivalent; SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


def sync(out) -> None:
    """TRUE device synchronization.

    On the tunneled TPU runtime ``block_until_ready`` (method and
    ``jax.block_until_ready`` alike) returns immediately without
    awaiting execution — it produced physically impossible timings
    (sub-ms 650M forwards, 194M tokens/s). The only operation that
    demonstrably awaits the device stream is a device->host transfer,
    so this reduces one output leaf to a scalar on device and fetches
    it. The TPU stream is FIFO: the fetch completing implies every
    previously enqueued program completed."""
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(_sum_leaf(leaf))


@jax.jit
def _sum_leaf(x):
    import jax.numpy as jnp
    return jnp.sum(x) if x.ndim else x


def benchmark(fn: Callable, *args, reps: int = 10,
              warmup: int = 1) -> float:
    """Mean wall-clock seconds per call, post-compile.

    Enqueues ``reps`` calls and drains the device queue with a real
    host transfer (see :func:`sync`); the measured idle-queue sync cost
    (~26ms through the tunnel) is subtracted once."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    sync(out)                      # queue now idle: pure sync overhead
    sync_cost = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return max(time.time() - t0 - sync_cost, 1e-9) / reps


def device_memory_stats(device=None) -> dict:
    """Bytes in use / peak / limit for a device (HBM). Returns {} when
    the backend doesn't expose stats (CPU)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return {}
    if not stats:
        return {}
    return {
        'bytes_in_use': stats.get('bytes_in_use'),
        'peak_bytes_in_use': stats.get('peak_bytes_in_use'),
        'bytes_limit': stats.get('bytes_limit'),
    }


def peak_memory_gb(device=None) -> Optional[float]:
    """(reference: workflow/utils/memory.py:4-16)"""
    stats = device_memory_stats(device)
    peak = stats.get('peak_bytes_in_use')
    return peak / 2 ** 30 if peak is not None else None


def memory_analysis_gb(jitted_fn, *args, **kwargs) -> dict:
    """Compile-time memory footprint of a jitted function via XLA's
    memory analysis — the TPU-native ``max_memory_allocated``: exact
    buffer assignment for arguments, outputs, and temporaries
    (activations/scratch), available even on backends that expose no
    runtime memory stats (the tunneled TPU returns none). Donated
    buffers are counted once (alias size subtracted)."""
    try:
        ma = jitted_fn.lower(*args, **kwargs).compile().memory_analysis()
        if ma is None:
            return {}
        g = float(2 ** 30)
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes
                 - ma.alias_size_in_bytes)
        return {
            'args_gb': ma.argument_size_in_bytes / g,
            'output_gb': ma.output_size_in_bytes / g,
            'temp_gb': ma.temp_size_in_bytes / g,
            'total_gb': total / g,
        }
    except Exception:
        return {}


@contextlib.contextmanager
def trace(logdir: str = '/tmp/esme_tpu_trace'):
    """``with trace('/tmp/t'):`` captures a profiler trace viewable in
    TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
