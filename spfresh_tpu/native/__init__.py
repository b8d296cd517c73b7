"""ctypes bindings for the native host runtime (libspfresh_native.so).

Builds on first use via the bundled Makefile (g++ is in the image; pybind11
is not, so the ABI is plain C + ctypes).  Every caller has a pure-Python
fallback — ``available()`` gates usage.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libspfresh_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_HERE, check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # pragma: no cover - toolchain missing
        log.warning("native build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first call; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        c = ctypes
        lib.spf_version.restype = c.c_char_p
        lib.spf_csr_open.restype = c.c_void_p
        lib.spf_csr_open.argtypes = [c.c_char_p]
        lib.spf_csr_close.argtypes = [c.c_void_p]
        lib.spf_csr_num_clusters.argtypes = [c.c_void_p]
        lib.spf_csr_num_clusters.restype = c.c_int32
        lib.spf_csr_num_points.argtypes = [c.c_void_p]
        lib.spf_csr_num_points.restype = c.c_int64
        lib.spf_csr_dim.argtypes = [c.c_void_p]
        lib.spf_csr_dim.restype = c.c_int32
        lib.spf_csr_cluster_ids.argtypes = [c.c_void_p]
        lib.spf_csr_cluster_ids.restype = c.POINTER(c.c_int64)
        lib.spf_csr_offsets.argtypes = [c.c_void_p]
        lib.spf_csr_offsets.restype = c.POINTER(c.c_int64)
        lib.spf_csr_posting.argtypes = [
            c.c_void_p, c.c_int32,
            c.POINTER(c.POINTER(c.c_int64)), c.POINTER(c.POINTER(c.c_float)),
        ]
        lib.spf_csr_posting.restype = c.c_int64
        lib.spf_csr_gather_padded.argtypes = [
            c.c_void_p, c.POINTER(c.c_int32), c.c_int32, c.c_int32,
            c.POINTER(c.c_float), c.POINTER(c.c_int64), c.POINTER(c.c_int32),
        ]
        lib.spf_csr_gather_padded.restype = c.c_int32
        lib.spf_vecs_shape.argtypes = [c.c_char_p, c.c_int32, c.POINTER(c.c_int32)]
        lib.spf_vecs_shape.restype = c.c_int64
        lib.spf_vecs_read.argtypes = [c.c_char_p, c.c_int32, c.c_void_p]
        lib.spf_vecs_read.restype = c.c_int32
        lib.spf_csr_gather_async.argtypes = [
            c.c_void_p, c.POINTER(c.c_int32), c.c_int32, c.c_int32,
            c.POINTER(c.c_float), c.POINTER(c.c_int64), c.POINTER(c.c_int32),
        ]
        lib.spf_csr_gather_async.restype = c.c_void_p
        lib.spf_csr_gather_join.argtypes = [c.c_void_p]
        lib.spf_csr_gather_join.restype = c.c_int32
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# High-level wrappers
# ---------------------------------------------------------------------------


class _MmapView(np.ndarray):
    """ndarray view into the reader's mmap that keeps the reader alive.

    ``np.ctypeslib.as_array`` alone would leave the view dangling if the
    ``NativeCsr`` were garbage-collected (``__del__`` munmaps); subclassing
    lets the view carry a strong reference.  An explicit ``close()`` still
    invalidates outstanding views — documented on :meth:`NativeCsr.posting`.
    """

    _keepalive = None


def _view_with_owner(arr: np.ndarray, owner) -> np.ndarray:
    v = arr.view(_MmapView)
    v._keepalive = owner
    return v


class NativeCsr:
    """mmap'd packed-postings reader (zero-copy per-posting views)."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.spf_csr_open(path.encode())
        if not self._h:
            raise ValueError(f"{path}: not a packed postings file")
        self.num_clusters = lib.spf_csr_num_clusters(self._h)
        self.num_points = lib.spf_csr_num_points(self._h)
        self.dim = lib.spf_csr_dim(self._h)

    def cluster_ids(self) -> np.ndarray:
        p = self._lib.spf_csr_cluster_ids(self._h)
        return np.ctypeslib.as_array(p, shape=(self.num_clusters,)).copy()

    def posting(self, index: int):
        """(ids, vectors) zero-copy views for posting at ``index``.

        The views hold a reference to this reader, so dropping the reader
        while views are alive is safe; an explicit ``close()`` invalidates
        them (copy first if the data must outlive the reader)."""
        ids_p = ctypes.POINTER(ctypes.c_int64)()
        vec_p = ctypes.POINTER(ctypes.c_float)()
        n = self._lib.spf_csr_posting(self._h, index, ctypes.byref(ids_p), ctypes.byref(vec_p))
        if n < 0:
            raise IndexError(index)
        ids = _view_with_owner(np.ctypeslib.as_array(ids_p, shape=(int(n),)), self)
        vecs = _view_with_owner(
            np.ctypeslib.as_array(vec_p, shape=(int(n), self.dim)), self
        )
        return ids, vecs

    def gather_padded(self, indices: np.ndarray, pad: int):
        """Stage selected postings into a fresh (m, pad, dim) slab."""
        indices = np.ascontiguousarray(indices, np.int32)
        m = len(indices)
        vecs = np.zeros((m, pad, self.dim), np.float32)
        ids = np.empty((m, pad), np.int64)
        lens = np.empty((m,), np.int32)
        rc = self._lib.spf_csr_gather_padded(
            self._h,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            m, pad,
            vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise IndexError("bad posting index in gather")
        return vecs, ids, lens

    def gather_padded_async(self, indices: np.ndarray, pad: int) -> "AsyncGather":
        """Start staging on a background native thread; overlap the copy
        with device compute and call .join() when the slabs are needed."""
        indices = np.ascontiguousarray(indices, np.int32)
        m = len(indices)
        vecs = np.zeros((m, pad, self.dim), np.float32)
        ids = np.empty((m, pad), np.int64)
        lens = np.empty((m,), np.int32)
        job = self._lib.spf_csr_gather_async(
            self._h,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            m, pad,
            vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return AsyncGather(self._lib, job, vecs, ids, lens)

    def close(self):
        if self._h:
            self._lib.spf_csr_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class AsyncGather:
    """Handle for an in-flight native staging job; owns the output buffers."""

    def __init__(self, lib, job, vecs, ids, lens):
        self._lib = lib
        self._job = job
        self._out = (vecs, ids, lens)

    def join(self):
        if self._job:
            rc = self._lib.spf_csr_gather_join(self._job)
            self._job = None
            if rc != 0:
                raise IndexError("bad posting index in async gather")
        return self._out

    def __del__(self):  # pragma: no cover - safety net
        try:
            self.join()
        except Exception:
            pass


_ELEM_SIZE = {"f": 4, "i": 4, "b": 1}
_DTYPE = {"f": np.float32, "i": np.int32, "b": np.uint8}


def read_vecs_native(path: str, kind: str = "f") -> Optional[np.ndarray]:
    """Native fvecs/ivecs/bvecs reader; None when the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    dim = ctypes.c_int32()
    n = lib.spf_vecs_shape(path.encode(), _ELEM_SIZE[kind], ctypes.byref(dim))
    if n < 0:
        raise ValueError(f"{path}: not a valid vecs file")
    out = np.empty((int(n), int(dim.value)), _DTYPE[kind])
    rc = lib.spf_vecs_read(path.encode(), _ELEM_SIZE[kind], out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"{path}: vecs read failed (rc={rc})")
    return out


