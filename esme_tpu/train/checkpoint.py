"""Training checkpoint / resume.

The reference has three mechanisms (SURVEY.md §5): Lightning
ModelCheckpoint + ``fit(ckpt_path=...)`` resume, safetensors export of
final artifacts, and metadata-driven model re-creation. Equivalents:

* :class:`CheckpointManager` — orbax-backed save/restore of the full
  ``TrainState`` (params + optimizer state + step), top-k on a monitored
  metric with newest-checkpoint resume (the reference finds the newest
  ckpt by ctime, reference: workflow/meltome/finetune_meltome.py:31-41);
* final artifacts remain safetensors via ``model.save_pretrained`` /
  ``model.save_lora`` (reference: esme/esm.py:564-585).

Works for sharded (multi-chip) states too — orbax records shardings
and restores onto the same mesh.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


class CheckpointManager:
    """Save/restore TrainStates with a best-metric policy."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 monitor: str = 'val_loss', mode: str = 'min'):
        import orbax.checkpoint as ocp
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self._mgr = ocp.CheckpointManager(
            self.directory.resolve(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=(lambda m: m.get(monitor, 0.0)) if monitor else None,
                best_mode=mode,
            ))

    def save(self, step: int, state, metrics: Optional[dict] = None):
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or {})
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the structure/shardings of ``state_template``
        (pass the freshly-initialized state)."""
        import jax
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

        # Match the template's placement exactly so a sharded trainer
        # resumes directly: mesh-sharded leaves re-pin to their
        # NamedSharding; single-device template leaves (e.g. optimizer
        # counters produced uncommitted by jit) come back as
        # uncommitted host arrays — orbax commits them to device 0,
        # which a multi-device jit then rejects.
        import numpy as np

        def _repin(t, r):
            sh = getattr(t, 'sharding', None)
            if sh is None:
                return r
            if isinstance(sh, jax.sharding.SingleDeviceSharding):
                return jax.numpy.asarray(np.asarray(r))
            return jax.device_put(r, sh)

        return jax.tree.map(_repin, state_template, restored)
