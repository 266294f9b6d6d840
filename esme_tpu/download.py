"""Pretrained weight distribution (reference: esme/download.py:4-52).

Same model registry and HuggingFace Hub repo as the reference
(``mhcelik/esm-efficient``) — checkpoints are safetensors in the exact
key schema this framework loads natively (esme_tpu/models/io.py).
Network access is optional: :func:`download_model` resolves local
paths / cache hits first.
"""

from __future__ import annotations

import os
from pathlib import Path

# (reference: esme/download.py:4-22)
MODELS = [
    'esm1b',
    *[f'esm1v_{i}' for i in range(1, 6)],
    'esm2_8m', 'esm2_35m', 'esm2_150m', 'esm2_650m', 'esm2_3b', 'esm2_15b',
    'esmc_300m', 'esmc_600m',
]

# aliases (reference: esme/download.py:41-46)
ALIASES = {
    'esm1v': 'esm1v_1',
    'esm2': 'esm2_650m',
    'esmc': 'esmc_300m',
}

model_names = MODELS + list(ALIASES)

HF_REPO = 'mhcelik/esm-efficient'


def resolve_name(name: str) -> str:
    name = ALIASES.get(name, name)
    if name not in MODELS:
        raise ValueError(
            f'Invalid model name: {name}. Must be one of {model_names}')
    return name


def download_model(name: str, cache_dir: str | None = None) -> str:
    """Resolve a model name to a local safetensors path, downloading
    from the HF hub if needed (reference: esme/download.py:25-52)."""
    if os.path.isfile(name):
        return name
    name = resolve_name(name)
    filename = f'{name}.safetensors'

    cache_dir = cache_dir or os.environ.get(
        'ESME_TPU_CACHE', os.path.expanduser('~/.cache/esme_tpu'))
    local = Path(cache_dir) / filename
    if local.exists():
        return str(local)

    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise RuntimeError(
            f'{filename} not found locally at {local} and huggingface_hub '
            f'is unavailable; place the file there manually') from e
    return hf_hub_download(HF_REPO, filename, cache_dir=cache_dir)
