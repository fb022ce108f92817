"""Native host runtime (ctypes-bound C), compiled on first import.

The reference's host runtime is C (bseq/kalloc/kthread); this module keeps
the host-side hot loops native in the rebuild. Falls back to pure Python
transparently when no C compiler is available (``lib`` is None then).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import tempfile

import numpy as np

_SRC = pathlib.Path(__file__).parent / "gdiet_native.c"


def _build() -> ctypes.CDLL | None:
    try:
        src = _SRC.read_bytes()
    except OSError:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = pathlib.Path(
        os.environ.get("GDIET_NATIVE_CACHE", tempfile.gettempdir())
    ) / f"gdiet_native_{tag}.so"
    if not cache.exists():
        try:
            tmp = cache.with_suffix(f".{os.getpid()}.tmp")
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, cache)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(cache))
    except OSError:
        return None
    lib.encode_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rle_ops.restype = ctypes.c_int
    lib.rle_ops.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


lib = _build()


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def encode_batch(seqs: list[str], lmax: int) -> tuple[np.ndarray, np.ndarray]:
    """ASCII reads -> ([n, lmax] nt4 codes with 255 padding, [n] lengths)."""
    n = len(seqs)
    blob = "".join(seqs).encode()
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    out = np.full((n, lmax), 255, np.uint8)
    lens = np.zeros(n, np.int64)
    lib.encode_batch(
        blob, _ptr(offsets, ctypes.c_int64), n, lmax,
        _ptr(out, ctypes.c_uint8), _ptr(lens, ctypes.c_int64),
    )
    return out, lens


def rle_ops(
    ops: np.ndarray,  # [n, smax] uint8, contiguous
    fin_i: np.ndarray,
    fin_j: np.ndarray,
    lens: np.ndarray,
    max_runs: int = 256,
) -> list[list[tuple[int, int]]] | None:
    """cigars_from_ops in C; returns None on overflow (caller falls back)."""
    n, smax = ops.shape
    ops = np.ascontiguousarray(ops)
    fin_i = np.ascontiguousarray(fin_i, np.int32)
    fin_j = np.ascontiguousarray(fin_j, np.int32)
    lens64 = np.ascontiguousarray(lens, np.int64)
    out = np.zeros((n, max_runs), np.uint32)
    n_runs = np.zeros(n, np.int32)
    rc = lib.rle_ops(
        _ptr(ops, ctypes.c_uint8), n, smax,
        _ptr(fin_i, ctypes.c_int32), _ptr(fin_j, ctypes.c_int32),
        _ptr(lens64, ctypes.c_int64), _ptr(out, ctypes.c_uint32),
        max_runs, _ptr(n_runs, ctypes.c_int32),
    )
    if rc:
        return None
    return [
        [(int(v) >> 4, int(v) & 0xF) for v in out[r, : n_runs[r]]]
        for r in range(n)
    ]
