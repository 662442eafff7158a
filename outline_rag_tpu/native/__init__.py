"""Native (C++) components, loaded via ctypes.

``libortnative.so`` currently provides the ingestion chunker hot loop
(``chunker.cc``). The library auto-builds on first use when a toolchain is
available (``make`` in this directory); all callers fall back to the pure
Python implementations when the library is absent, so the framework has no
hard native dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

log = logging.getLogger(__name__)

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "build", "libortnative.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_HERE, check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_SO)
    except Exception as exc:
        log.info("native build unavailable (%s); using Python fallbacks", exc)
        return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.ort_chunk_text.restype = ctypes.c_int
            lib.ort_chunk_text.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            _lib = lib
        except OSError as exc:
            log.warning("failed to load native library: %s", exc)
        return _lib


def chunk_text_native(
    text: str, chunk_size: int, chunk_overlap: int
) -> list[str] | None:
    """Native split_text; None when the library is unavailable (caller
    falls back to Python)."""
    lib = load()
    if lib is None:
        return None
    data = text.encode("utf-32-le")
    n = len(data) // 4
    buf = (ctypes.c_uint32 * n).from_buffer_copy(data) if n else (ctypes.c_uint32 * 1)()
    max_chunks = max(16, 4 * (n // max(1, chunk_size - chunk_overlap)) + 16)
    out_off = (ctypes.c_int * max_chunks)()
    out_len = (ctypes.c_int * max_chunks)()
    count = lib.ort_chunk_text(
        buf, n, chunk_size, chunk_overlap, out_off, out_len, max_chunks
    )
    if count < 0:
        return None
    return [text[out_off[i] : out_off[i] + out_len[i]] for i in range(count)]
