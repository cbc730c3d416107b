"""ctypes loader for the native data-plane helpers (_fastpack.cpp).

Compiled on demand with g++ (cached next to the source); every entry point
has a pure-numpy fallback so the package works without a toolchain. The
C path releases the GIL, so loader threads overlap decode/collate work —
the piece Python's per-sample np.stack cannot parallelize.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_fastpack.cpp")
_LIB_PATH = os.path.join(_HERE, "libfastpack.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # build to a per-process temp path then atomically rename: concurrent
    # loader workers may race to build, and dlopen of a half-written .so
    # would silently demote that worker to the numpy path for the whole run
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.fp_gather.restype = ctypes.c_int
        lib.fp_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.fp_tar_index.restype = ctypes.c_int64
        lib.fp_tar_index.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def gather(arrays: list[np.ndarray], nthreads: Optional[int] = None) -> np.ndarray:
    """Stack equal-shape/dtype buffers into one batch array (np.stack
    equivalent) using the parallel C memcpy when available."""
    n = len(arrays)
    first = np.asarray(arrays[0])
    out = np.empty((n,) + first.shape, first.dtype)
    lib = get_lib()
    itemsize = first.nbytes
    contig = [np.ascontiguousarray(a) for a in arrays]
    for i, a in enumerate(contig):
        # np.stack would raise loudly here; the native memcpy would instead
        # read past a smaller source buffer, so validate up front
        if a.shape != first.shape or a.dtype != first.dtype:
            raise ValueError(
                f"gather: sample {i} has shape {a.shape} dtype {a.dtype}, "
                f"expected {first.shape} {first.dtype}"
            )
    if lib is None or itemsize < 4096:
        for i, a in enumerate(contig):
            out[i] = a
        return out
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in contig])
    nt = nthreads if nthreads is not None else min(os.cpu_count() or 1, 16)
    rc = lib.fp_gather(out.ctypes.data_as(ctypes.c_void_p), ptrs, n, itemsize, nt)
    if rc != 0:  # pragma: no cover - memcpy cannot fail; belt and braces
        for i, a in enumerate(contig):
            out[i] = a
    return out


def tar_index(buf) -> Optional[np.ndarray]:
    """[(header_off, data_off, size)] for regular-file members of a tar held
    in `buf` (bytes/memoryview/mmap); None when the C lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    view = np.frombuffer(buf, np.uint8)  # works on read-only buffers/mmaps
    n = view.size
    cap = max(n // 512, 16)
    out = np.empty((cap, 3), np.int64)
    got = lib.fp_tar_index(
        ctypes.cast(ctypes.c_void_p(view.ctypes.data), ctypes.c_char_p), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap,
    )
    if got < 0:
        return None
    return out[:got].copy()
