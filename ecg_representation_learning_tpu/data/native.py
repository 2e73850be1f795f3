"""ctypes bindings for the native ingest library (native/wfdb_native.cpp).

Loads ``libwfdb_native.so`` if built (``make -C native``); every entry point
has a pure-numpy fallback (data/readers.py), so the framework works without
the native build -- it's a throughput accelerator for the host data plane.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (os.path.join(here, 'native', 'libwfdb_native.so'),
                 os.environ.get('ECG_TPU_NATIVE_LIB', '')):
        if cand and os.path.exists(cand):
            return cand
    return None


def load_native():
    """The shared library handle, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')
    i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    f64p = np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS')
    for name in ('decode_fmt212', 'decode_fmt16', 'decode_fmt24', 'decode_fmt80'):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, ctypes.c_int64, i32p, ctypes.c_int64]
        fn.restype = None
    lib.dig2phys.argtypes = [i32p, ctypes.c_int64, ctypes.c_double, ctypes.c_int32,
                             ctypes.c_int32, ctypes.c_int32, f32p]
    lib.dig2phys.restype = None
    i64p = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
    lib.read_records_16.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        f64p, i32p, i64p, f32p, ctypes.c_int32]
    lib.read_records_16.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def decode_fmt(raw: bytes, fmt: int, n_values: int) -> Optional[np.ndarray]:
    """Native packed-format decode; None when the library isn't built."""
    lib = load_native()
    if lib is None:
        return None
    fn = {212: lib.decode_fmt212, 16: lib.decode_fmt16,
          24: lib.decode_fmt24, 80: lib.decode_fmt80}.get(fmt)
    if fn is None:
        return None
    buf = np.frombuffer(raw, np.uint8)
    out = np.empty(n_values, np.int32)
    fn(np.ascontiguousarray(buf), buf.size, out, n_values)
    return out


def read_records_16_batch(paths: Sequence[str], n_ch: int, n_samples: int,
                          gains: np.ndarray, baselines: np.ndarray,
                          offsets: Optional[np.ndarray] = None,
                          n_threads: int = 8) -> Optional[np.ndarray]:
    """Threaded batch read of same-shape fmt-16 records -> (N, C, L) float32.

    ``offsets``: optional per-record leading byte counts to skip (the CinC
    ``16+24`` .mat layout).  None when the native library isn't built (caller
    falls back to the Python thread-pool reader).
    """
    lib = load_native()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, n_ch, n_samples), np.float32)
    blob = b'\0'.join(p.encode() for p in paths) + b'\0'
    if offsets is None:
        offsets = np.zeros(n, np.int64)
    got = lib.read_records_16(
        blob, n, n_ch, n_samples,
        np.ascontiguousarray(gains, np.float64).reshape(n, n_ch),
        np.ascontiguousarray(baselines, np.int32).reshape(n, n_ch),
        np.ascontiguousarray(offsets, np.int64).reshape(n),
        out, n_threads)
    if got != n:
        return None
    return out
