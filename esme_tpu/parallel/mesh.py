"""Device mesh construction and multi-host runtime init.

The distributed backend of the framework: where the reference reaches
for NCCL through Lightning DDP / DeepSpeed launchers
(reference: esme/deepspeed.py:12-30, workflow/train/Snakefile:133-138),
the TPU build uses ``jax.distributed.initialize`` + a
``jax.sharding.Mesh`` with named axes — collectives ride ICI/DCN and
are inserted by XLA (SURVEY.md §2.4).

Axes:
  * ``data`` — data parallelism: each slice of the mesh owns its own
    packed batch; gradients are psum'd across it.
  * ``fsdp`` — parameter/optimizer sharding (ZeRO-3-style): params
    live sharded, all-gathered per layer inside the scan, and the
    all-gather's autodiff transpose reduce-scatters the gradients.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (no-op on a single host unless args given)."""
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(data: int = 1, fsdp: Optional[int] = None,
              devices=None) -> Mesh:
    """Build a ``(data, fsdp)`` mesh over the available devices.

    ``fsdp=None`` uses all remaining devices on the fsdp axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if fsdp is None:
        assert n % data == 0, f'{n} devices not divisible by data={data}'
        fsdp = n // data
    assert data * fsdp == n, \
        f'mesh {data}x{fsdp} != {n} devices'
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, ('data', 'fsdp'))
