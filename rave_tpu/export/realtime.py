"""Realtime host: C++ lock-free ring buffers + model worker thread.

The nn~-analogue serving loop (reference ``README.md:184-219`` runs the
TorchScript export inside the C++ nn~ external).  Architecture here:

  audio producer (device-rate, wait-free)  --> in_ring (C++)
  model thread: pop block -> compiled streaming step -> out_ring (C++)
  audio consumer (wait-free)               <-- out_ring

The ring buffers are native (``native/ringbuffer.cpp``, built to
``libravert.so``); the compiled step is the jitted streaming forward from
:class:`rave_tpu.export.streaming.StreamingRAVE`.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
import time
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _NATIVE_DIR / "libravert.so"
    if not so.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(so))
    lib.rb_create.restype = ctypes.c_void_p
    lib.rb_create.argtypes = [ctypes.c_uint64]
    lib.rb_destroy.argtypes = [ctypes.c_void_p]
    for f in ("rb_readable", "rb_writable"):
        getattr(lib, f).restype = ctypes.c_uint64
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    for f in ("rb_write", "rb_read"):
        getattr(lib, f).restype = ctypes.c_uint64
        getattr(lib, f).argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_uint64]
    _LIB = lib
    return lib


class NativeRing:
    def __init__(self, capacity: int):
        self.lib = _load_lib()
        self.ptr = self.lib.rb_create(capacity)
        if not self.ptr:
            raise MemoryError("rb_create failed")

    def __del__(self):
        if getattr(self, "ptr", None):
            self.lib.rb_destroy(self.ptr)
            self.ptr = None

    def write(self, x: np.ndarray) -> int:
        x = np.ascontiguousarray(x, np.float32)
        return self.lib.rb_write(
            self.ptr, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(x))

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        got = self.lib.rb_read(
            self.ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        return out[:got]

    def readable(self) -> int:
        return self.lib.rb_readable(self.ptr)


class RealtimeHost:
    """Block streamer: feeds audio in, gets processed audio out, with the
    model running on its own thread at ``chunk`` granularity."""

    def __init__(self, streaming_model, chunk: int,
                 ring_seconds: float = 2.0, sr: int = 44100):
        self.model = streaming_model
        self.chunk = chunk
        cap = int(ring_seconds * sr)
        self.in_ring = NativeRing(cap)
        self.out_ring = NativeRing(cap)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.blocks_processed = 0
        self.underruns = 0

    def _worker(self):
        buf = np.zeros(self.chunk, np.float32)
        while not self._stop.is_set():
            if self.in_ring.readable() >= self.chunk:
                got = self.in_ring.read(self.chunk)
                buf[: len(got)] = got
                y = self.model.forward(buf.reshape(1, -1, 1))[0, :, 0]
                self.out_ring.write(y)
                self.blocks_processed += 1
            else:
                time.sleep(0.0005)

    def start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)

    # audio-callback-side API (wait-free)
    def push(self, samples: np.ndarray) -> int:
        return self.in_ring.write(samples)

    def pull(self, n: int) -> np.ndarray:
        out = self.out_ring.read(n)
        if len(out) < n:
            self.underruns += 1
            out = np.pad(out, (0, n - len(out)))
        return out
