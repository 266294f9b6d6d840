"""Test harness: CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4 implication)."""

import os

# Must run before jax initializes its backends.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS from the
# environment; the config update is authoritative. Same for the
# compilation cache dir (env var is read before sitecustomize's early
# jax import).
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_test_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import numpy as np
import pytest

SEED = 41

AMINO_ACIDS = list('LAGVSERTIDPKQNFYMHWC')


def random_protein(rng, length):
    return ''.join(rng.choice(AMINO_ACIDS, size=length))


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(SEED)


@pytest.fixture(scope='session')
def sequences():
    """A fixed, diverse set of synthetic protein sequences."""
    r = np.random.default_rng(SEED)
    lengths = [12, 31, 64, 7, 128, 45, 99, 20]
    return [random_protein(r, n) for n in lengths]


@pytest.fixture(scope='session')
def fasta_path(tmp_path_factory):
    """Synthetic indexed FASTA with 16 sequences of varied length."""
    from esme_tpu.fasta import write_fai
    r = np.random.default_rng(SEED + 1)
    path = tmp_path_factory.mktemp('fasta') / 'test.fa'
    lengths = [60, 256, 320, 458, 156, 438, 75, 217, 204, 352,
               128, 447, 347, 948, 85, 137]
    with open(path, 'w') as f:
        for i, n in enumerate(lengths):
            seq = random_protein(r, n)
            f.write(f'>PROT{i:04d}\n')
            for lo in range(0, n, 60):
                f.write(seq[lo:lo + 60] + '\n')
    write_fai(path)
    return str(path)
