"""Loader for the native trajectory-IO library (tfep_tpu/native/trajio.cpp).

Compiled lazily with the system C++ compiler and loaded through ctypes
(no pybind11 in this environment). Each format module guards on
:func:`native_available` and falls back to its pure-Python reader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

__all__ = ['native_lib', 'native_available']

_LIB = None
_TRIED = False

_I64P = ctypes.POINTER(ctypes.c_int64)
_F32P = ctypes.POINTER(ctypes.c_float)
_F64P = ctypes.POINTER(ctypes.c_double)

_SIGNATURES = {
    'dcd_read_header': [ctypes.c_char_p, _I64P],
    'dcd_read_frames': [ctypes.c_char_p, _I64P, ctypes.c_int64,
                        _F32P, _F64P],
    'xtc_scan': [ctypes.c_char_p, _I64P, ctypes.c_int64, _I64P],
    'xtc_read_frames': [ctypes.c_char_p, _I64P, ctypes.c_int64,
                        ctypes.c_int64, _F32P, _F32P, _F32P],
    'trr_scan': [ctypes.c_char_p, _I64P, ctypes.c_int64, _I64P],
    'trr_read_frames': [ctypes.c_char_p, _I64P, ctypes.c_int64,
                        ctypes.c_int64, _F32P, _F32P, _F32P],
}


def native_lib():
    """Compile (once) and load the native trajio library; None on failure."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True

    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'native', 'trajio.cpp')
    cache_dir = os.path.join(tempfile.gettempdir(), 'tfep_tpu_native')
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, '_trajio.so')

    try:
        if (not os.path.isfile(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            # Compile to a per-process path and publish atomically:
            # concurrent processes (e.g. pytest-xdist workers) must never
            # CDLL a half-written .so.
            tmp_path = f'{lib_path}.{os.getpid()}'
            try:
                subprocess.run(
                    ['g++', '-O3', '-shared', '-fPIC', '-o', tmp_path, src],
                    check=True, capture_output=True)
                os.replace(tmp_path, lib_path)
            finally:
                if os.path.exists(tmp_path):   # failed compile leftovers
                    os.unlink(tmp_path)
        lib = ctypes.CDLL(lib_path)
        for name, argtypes in _SIGNATURES.items():
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = ctypes.c_int
        _LIB = lib
    except (OSError, AttributeError, subprocess.CalledProcessError):
        _LIB = None
    return _LIB


def native_available() -> bool:
    return native_lib() is not None
