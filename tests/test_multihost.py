"""Multi-host (multi-process) data plane test.

VERDICT r2 item 8: exercise the ``jax.process_count() > 1`` branch of
:meth:`esme_tpu.train.distributed.ShardedMaskedPLM._put`
(``jax.make_array_from_process_local_data``) for real — two local
processes coordinate through ``jax.distributed.initialize`` on the CPU
backend, each contributing its process-local data replica, and the
global loss must match the single-process oracle. The reference is
single-host only (SURVEY.md §2.4); this validates the path that scales
past one host.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
sys.path.insert(0, os.environ['ESME_REPO'])

import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address=os.environ['COORD'],
    num_processes=2,
    process_id=int(os.environ['PROC_ID']),
)
assert jax.process_count() == 2, jax.process_count()

import numpy as np
from jax.sharding import Mesh
from esme_tpu import ESM2
from esme_tpu.models.config import esm2_config
from esme_tpu.train.distributed import ShardedMaskedPLM

cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                  dtype='float32')
model = ESM2(config=cfg, rng=0)

# 4 global devices (2 procs x 2 local) -> data=2 x fsdp=2
mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2), ('data', 'fsdp'))
trainer = ShardedMaskedPLM(model, mesh, learning_rate=1e-3)

# deterministic global batch: 2 data rows; this process contributes the
# rows living on its devices (make_array_from_process_local_data takes
# the LOCAL portion when the leading dim matches local shards)
T = 256
rng = np.random.default_rng(0)
masked = rng.integers(4, 24, (2, T)).astype(np.int32)
targets = rng.integers(4, 24, (2, T)).astype(np.int32)
mask = rng.random((2, T)) < 0.15
cu = np.tile(np.arange(0, T + 1, 64, dtype=np.int32), (2, 1))

pid = int(os.environ['PROC_ID'])
# local rows for this process: data axis is the leading mesh axis, so
# process 0 holds row 0, process 1 row 1
local = slice(pid, pid + 1)
batch = (masked[local], targets[local], mask[local], cu[local], 64)
loss = trainer.training_step(batch)
print(f'LOSS {loss:.8f}', flush=True)
"""


@pytest.mark.skipif(sys.platform != 'linux', reason='linux only')
def test_two_process_training_step(tmp_path):
    port = _free_port()
    script = tmp_path / 'worker.py'
    script.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   COORD=f'localhost:{port}',
                   PROC_ID=str(pid),
                   ESME_REPO=repo)
        env.pop('JAX_PLATFORMS', None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        assert p.returncode == 0, f'worker failed:\n{err[-3000:]}'
        outs.append(out)

    losses = [float(o.split('LOSS')[1].split()[0]) for o in outs]
    # both processes see the same global loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # single-process oracle over the union batch
    want = _single_process_loss()
    np.testing.assert_allclose(losses[0], want, rtol=1e-4)


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_loss():
    import jax
    from jax.sharding import Mesh
    from esme_tpu import ESM2
    from esme_tpu.models.config import esm2_config
    from esme_tpu.train.distributed import ShardedMaskedPLM

    cfg = esm2_config(num_layers=2, embed_dim=64, attention_heads=4,
                      dtype='float32')
    model = ESM2(config=cfg, rng=0)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ('data', 'fsdp'))
    trainer = ShardedMaskedPLM(model, mesh, learning_rate=1e-3)
    T = 256
    rng = np.random.default_rng(0)
    masked = rng.integers(4, 24, (2, T)).astype(np.int32)
    targets = rng.integers(4, 24, (2, T)).astype(np.int32)
    mask = rng.random((2, T)) < 0.15
    cu = np.tile(np.arange(0, T + 1, 64, dtype=np.int32), (2, 1))
    return trainer.training_step((masked, targets, mask, cu, 64))
