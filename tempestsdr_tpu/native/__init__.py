"""ctypes bindings for the native IO runtime (io_runtime.cpp).

Builds the shared library on first use with g++ (cached next to the source;
no pip/pybind dependency). Falls back gracefully — callers check
`available()` and use the pure-Python path if the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "io_runtime.cpp")
_SO = os.path.join(_DIR, "libtsdr_io.so")
_lock = threading.Lock()
_lib = None
_err = None


def _build() -> None:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load():
    """Return the loaded library, building it if needed."""
    global _lib, _err
    with _lock:
        if _lib is not None:
            return _lib
        if _err is not None:
            raise _err
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError) as e:
            _err = RuntimeError(f"native IO runtime unavailable: {e}")
            raise _err
        lib.tsdr_ring_create.restype = ctypes.c_void_p
        lib.tsdr_ring_create.argtypes = [ctypes.c_size_t]
        lib.tsdr_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.tsdr_ring_read.restype = ctypes.c_size_t
        lib.tsdr_ring_read.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
        ]
        lib.tsdr_ring_write.restype = ctypes.c_int
        lib.tsdr_ring_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        lib.tsdr_ring_write2.restype = ctypes.c_int
        lib.tsdr_ring_write2.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
        ]
        lib.tsdr_ring_note_dropped.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.tsdr_ring_take_dropped.restype = ctypes.c_uint64
        lib.tsdr_ring_take_dropped.argtypes = [ctypes.c_void_p]
        lib.tsdr_ring_close.argtypes = [ctypes.c_void_p]
        lib.tsdr_filepump_start.restype = ctypes.c_void_p
        lib.tsdr_filepump_start.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_void_p,
            ctypes.c_long,
        ]
        lib.tsdr_filepump_stop.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    try:
        load()
        return True
    except RuntimeError:
        return False


class Ring:
    """Bounded byte ring (native circbuff equivalent)."""

    def __init__(self, capacity_bytes: int):
        self._lib = load()
        self._h = self._lib.tsdr_ring_create(capacity_bytes)

    def read_into(self, buf_view, blocking: bool = True) -> int:
        n = len(buf_view)
        addr = (ctypes.c_uint8 * n).from_buffer(buf_view)
        return self._lib.tsdr_ring_read(self._h, addr, n, int(blocking))

    def write(self, data: bytes, blocking: bool = False) -> bool:
        """Push bytes. blocking=False drops the chunk whole when full
        (CB_FULL live semantics); blocking=True waits for space
        (backpressure into a paced producer)."""
        return self._lib.tsdr_ring_write2(self._h, data, len(data),
                                          int(blocking)) == 0

    def note_dropped(self, nbytes: int) -> None:
        """Record an externally-reported gap (hardware samples_dropped) at
        the current write position — it matures like an overflow drop."""
        self._lib.tsdr_ring_note_dropped(self._h, nbytes)

    def take_dropped(self) -> int:
        return self._lib.tsdr_ring_take_dropped(self._h)

    def close(self) -> None:
        self._lib.tsdr_ring_close(self._h)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.tsdr_ring_destroy(self._h)
                self._h = None
        except Exception:
            pass


class FilePump:
    """Background file reader feeding a Ring (native RawFile reader thread)."""

    def __init__(self, path: str, chunk_bytes: int, ring: Ring,
                 loop: bool = True, bytes_per_sec: float = 0.0,
                 start_offset: int = 0):
        self._lib = load()
        self._ring = ring
        self._h = self._lib.tsdr_filepump_start(
            path.encode(), chunk_bytes, int(loop), float(bytes_per_sec), ring._h,
            int(start_offset)
        )

    def stop(self) -> None:
        if self._h:
            self._lib.tsdr_filepump_stop(self._h)
            self._h = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass
