"""ctypes binding for the C++ async trace writer (cc/trace_writer.cc).

The sampling loop enqueues serialized chunks and returns to the device
immediately; a background C++ thread performs the atomic file writes
(replacing the reference's synchronous zarr chunk writes on the sampling
thread, backends/zarr.py).
"""

from __future__ import annotations

import atexit
import ctypes
import io
import logging
import os
import subprocess

import numpy as np

_log = logging.getLogger("pymc_tpu")

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "cc", "trace_writer.cc")
_SO = os.path.join(os.path.dirname(_SRC), "libtrace_writer.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC,
                 "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.tw_open.restype = ctypes.c_void_p
        lib.tw_write.restype = ctypes.c_long
        lib.tw_write.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
        ]
        lib.tw_flush.restype = ctypes.c_long
        lib.tw_flush.argtypes = [ctypes.c_void_p]
        lib.tw_errors.restype = ctypes.c_long
        lib.tw_errors.argtypes = [ctypes.c_void_p]
        lib.tw_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception as err:  # pragma: no cover
        _log.info(f"Native trace writer unavailable ({err}); using sync IO")
        _LIB = None
    return _LIB


class AsyncChunkWriter:
    """Enqueue npz-serialized chunks for background persistence."""

    def __init__(self):
        lib = _load()
        self._lib = lib
        self._handle = lib.tw_open() if lib is not None else None
        if self._handle is not None:
            atexit.register(self.close)

    @property
    def available(self):
        return self._handle is not None

    def write_npz(self, path, arrays):
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        self.write_bytes(path, buf.getvalue())

    def write_bytes(self, path, payload):
        """Enqueue a raw byte payload for atomic background persistence
        (used for both npz chunks and zarr v2 chunk files)."""
        if self._handle is not None:
            self._lib.tw_write(
                self._handle, path.encode(), payload, len(payload)
            )
        else:  # sync fallback — dot-prefixed temp so chunk scans never see it
            d, base = os.path.split(path)
            tmp = os.path.join(d, f".{base}.tmp")
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)

    def flush(self):
        if self._handle is not None:
            return int(self._lib.tw_flush(self._handle))
        return 0

    @property
    def errors(self):
        if self._handle is not None:
            return int(self._lib.tw_errors(self._handle))
        return 0

    def close(self):
        if self._handle is not None:
            self._lib.tw_close(self._handle)
            self._handle = None
