"""Small runtime utilities."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 0.5):
    """Enable jax's persistent compilation cache.

    Must go through ``jax.config.update`` — on environments where a
    sitecustomize imports jax at interpreter start, the
    ``JAX_COMPILATION_CACHE_DIR`` env var is read too early and
    silently ignored.
    """
    import jax
    path = path or os.path.expanduser('~/.cache/esme_tpu_compile_cache')
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      min_compile_secs)
