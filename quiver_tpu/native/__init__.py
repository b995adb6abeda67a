"""Native runtime components (C++ via ctypes; no pybind11 in this image).

``NativeWalWriter`` is a drop-in for persistence.WalWriter backed by
libquiver_wal.so: CRC32C-framed records, a background group-commit thread
(one write + one fdatasync per drain shared across writers), and exact
torn-tail detection on read. Falls back cleanly when the library isn't
built (``make -C quiver_tpu/native``).
"""

from __future__ import annotations

import ctypes
import json
import os
import time
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libquiver_wal.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.qwal_open.restype = ctypes.c_void_p
        lib.qwal_open.argtypes = [ctypes.c_char_p]
        lib.qwal_append.restype = ctypes.c_uint64
        lib.qwal_append.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_uint32]
        lib.qwal_sync.restype = ctypes.c_int
        lib.qwal_sync.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.qwal_truncate.argtypes = [ctypes.c_void_p]
        lib.qwal_close.argtypes = [ctypes.c_void_p]
        lib.qwal_read_frames.restype = ctypes.c_uint64
        lib.qwal_read_frames.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_uint64]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class NativeWalWriter:
    """Framed group-commit WAL (same append API as persistence.WalWriter)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "libquiver_wal.so not built; run make -C quiver_tpu/native"
            )
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._h = lib.qwal_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open WAL at {path}")
        self._lib = lib

    @staticmethod
    def _entry_bytes(entry_type, vec_id, vector, metadata) -> bytes:
        entry = {"timestamp": time.time(), "type": entry_type,
                 "vector_id": vec_id}
        if vector is not None:
            entry["vector"] = np.asarray(vector, np.float32).tolist()
        if metadata is not None:
            entry["metadata"] = metadata
        return json.dumps(entry, separators=(",", ":")).encode()

    def append(self, entry_type: str, vec_id: str, vector=None,
               metadata: Optional[dict] = None) -> None:
        self.append_many([(entry_type, vec_id, vector, metadata)])

    def append_many(self, entries) -> None:
        seq = 0
        for e in entries:
            payload = self._entry_bytes(*e)
            seq = self._lib.qwal_append(self._h, payload, len(payload))
            if not seq:
                raise OSError(f"WAL {self.path} failed (disk error); "
                              "record not journaled")
        if seq and self._lib.qwal_sync(self._h, seq) != 0:
            # records were NOT made durable — surface it instead of
            # acknowledging a write the log cannot replay
            raise OSError(f"WAL {self.path} sync failed (disk error)")

    def truncate(self) -> None:
        """In-place log truncation (waits out any in-flight group commit).
        The persistence layer prefers segment rotation; kept for API
        completeness."""
        if self._h:
            self._lib.qwal_truncate(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.qwal_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC safety net
        try:
            self.close()
        except Exception:
            pass


def read_native_wal(path: str) -> list[dict]:
    """Read intact frames (CRC-verified; torn tails cut exactly)."""
    lib = _load()
    if lib is None or not os.path.exists(path):
        return []
    need = lib.qwal_read_frames(path.encode(), None, 0)
    if not need:
        return []
    buf = ctypes.create_string_buffer(int(need))
    got = lib.qwal_read_frames(path.encode(), buf, need)
    out = []
    for line in bytes(buf[: int(got)]).split(b"\n"):
        if line:
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:  # pragma: no cover
                break
    return out
