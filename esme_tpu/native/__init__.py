"""ctypes bindings for the native FASTA reader/tokenizer.

Builds ``libesme_fasta.so`` from :file:`fasta_reader.cpp` on first use
(g++ -O3), caches it next to the source, and exposes
:class:`NativeFasta`. Import is safe without a toolchain —
``NATIVE_AVAILABLE`` is False and callers fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / 'fasta_reader.cpp'
_LIB_PATH = _DIR / 'libesme_fasta.so'

_lib = None
NATIVE_AVAILABLE = False


def _build() -> Optional[ctypes.CDLL]:
    if not _LIB_PATH.exists() or \
            _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        try:
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-o', str(_LIB_PATH),
                 str(_SRC)],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        return ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None


def _load():
    global _lib, NATIVE_AVAILABLE
    if _lib is not None:
        return _lib
    lib = _build()
    if lib is None:
        return None
    lib.esme_fasta_open.restype = ctypes.c_void_p
    lib.esme_fasta_open.argtypes = [ctypes.c_char_p]
    lib.esme_fasta_close.argtypes = [ctypes.c_void_p]
    lib.esme_read_seq.restype = ctypes.c_int64
    lib.esme_read_seq.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_char_p]
    lib.esme_tokenize_pack.restype = ctypes.c_int64
    lib.esme_tokenize_pack.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int8),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int64)]
    _lib = lib
    NATIVE_AVAILABLE = True
    return lib


def make_lut(alphabet) -> np.ndarray:
    """Byte -> token-id lookup table (unknown chars -> unk)."""
    lut = np.full(256, alphabet.unk_idx, np.int8)
    for tok, idx in alphabet.token_to_idx.items():
        if len(tok) == 1:
            lut[ord(tok)] = idx
    return lut


class NativeFasta:
    """mmap'd random-access FASTA with packed batch tokenization.

    Drop-in accelerator for :class:`esme_tpu.fasta.Fasta` +
    :func:`esme_tpu.alphabet.tokenize_unpad` on the hot training path.
    """

    def __init__(self, fasta_path, fai_rows, alphabet):
        lib = _load()
        if lib is None:
            raise RuntimeError('native library unavailable')
        self._lib = lib
        self._handle = lib.esme_fasta_open(str(fasta_path).encode())
        if not self._handle:
            raise OSError(f'cannot mmap {fasta_path}')
        self.lengths = np.asarray([r['length'] for r in fai_rows], np.int64)
        self.offsets = np.asarray([r['offset'] for r in fai_rows], np.int64)
        self.line_bases = np.asarray([r['line_bases'] for r in fai_rows],
                                     np.int64)
        self.line_widths = np.asarray([r['line_width'] for r in fai_rows],
                                      np.int64)
        self.lut = make_lut(alphabet)
        self.alphabet = alphabet

    def read_seq(self, idx: int) -> str:
        n = int(self.lengths[idx])
        buf = ctypes.create_string_buffer(n)
        got = self._lib.esme_read_seq(
            self._handle, int(self.offsets[idx]), n,
            int(self.line_bases[idx]), int(self.line_widths[idx]), buf)
        if got != n:
            raise IOError(f'short read for seq {idx}: {got} != {n}')
        return buf.raw.decode()

    def tokenize_pack(self, indices: Sequence[int], token_budget: int):
        """Packed tokens for the given sequence indices.

        Returns ``(tokens (budget,) int32, cu_lens (n+1,) int32,
        max_len int)`` — the reference tokenize_unpad contract plus
        static-budget tail padding (esme_tpu/alphabet.py pack_tokens).
        """
        idx = np.asarray(indices, np.int64)
        tokens = np.empty(token_budget, np.int32)
        cu_lens = np.empty(idx.shape[0] + 1, np.int32)
        max_len = np.zeros(1, np.int64)
        total = self._lib.esme_tokenize_pack(
            self._handle, self.offsets, self.lengths, self.line_bases,
            self.line_widths, idx, idx.shape[0], self.lut,
            self.alphabet.cls_idx, self.alphabet.eos_idx,
            self.alphabet.padding_idx, token_budget,
            tokens, cu_lens, max_len)
        if total < 0:
            raise ValueError(
                f'batch exceeds token_budget={token_budget}')
        return tokens, cu_lens, int(max_len[0])

    def __del__(self):
        if getattr(self, '_handle', None) and self._lib:
            self._lib.esme_fasta_close(self._handle)
            self._handle = None
