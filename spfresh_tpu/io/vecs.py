"""fvecs / ivecs / bvecs readers and writers (parity:
/root/reference/src/main.rs:10-70).

Format: little-endian records of ``[dim: i32][payload: dim * elem]``.  The
reference streams record-by-record; here a single ``np.fromfile`` + stride
trick reads the whole file in one shot (every record in a file has the same
dim, which the loop-based reference implicitly assumes too via its final
``from_shape_vec``).  The C++ native module provides an mmap'd variant for
datasets larger than RAM.
"""

from __future__ import annotations

import os

import numpy as np

_ELEM = {"f": ("<f4", 4), "i": ("<i4", 4), "b": ("<u1", 1)}


def _read_vecs(path: str, kind: str) -> np.ndarray:
    # Prefer the native mmap reader when the C++ runtime is built.
    try:
        from spfresh_tpu import native

        if native.available():
            out = native.read_vecs_native(path, kind)
            if out is not None:
                return out
    except Exception:
        pass  # fall through to the pure-numpy path
    dtype, esize = _ELEM[kind]
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        dim = int(np.fromfile(f, dtype="<i4", count=1)[0])
    if dim <= 0:
        raise ValueError(f"{path}: bad leading dimension {dim}")
    rec = 4 + dim * esize
    if size % rec != 0:
        raise ValueError(f"{path}: size {size} not a multiple of record size {rec}")
    n = size // rec
    raw = np.fromfile(path, dtype=np.uint8).reshape(n, rec)
    dims = raw[:, :4].view("<i4").ravel()
    if not (dims == dim).all():
        raise ValueError(f"{path}: inconsistent record dimensions")
    return np.ascontiguousarray(raw[:, 4:].view(dtype).reshape(n, dim))


def read_fvecs(path: str) -> np.ndarray:
    """read_fvecs_as_array parity (main.rs:10-41) -> (n, d) float32."""
    return _read_vecs(path, "f")


def read_ivecs(path: str) -> np.ndarray:
    """read_groundtruth parity (main.rs:44-70) -> (n, k) int32."""
    return _read_vecs(path, "i")


def read_bvecs(path: str) -> np.ndarray:
    """bvecs (SIFT1B-style uint8) -> (n, d) uint8."""
    return _read_vecs(path, "b")


def _write_vecs(path: str, arr: np.ndarray, dtype: str) -> None:
    arr = np.ascontiguousarray(arr)
    n, d = arr.shape
    out = np.empty((n, 4 + d * np.dtype(dtype).itemsize), np.uint8)
    out[:, :4] = np.full((n, 1), d, "<i4").view(np.uint8).reshape(n, 4)
    out[:, 4:] = arr.astype(dtype).view(np.uint8).reshape(n, -1)
    out.tofile(path)


def write_fvecs(path: str, arr: np.ndarray) -> None:
    _write_vecs(path, np.asarray(arr, np.float32), "<f4")


def write_ivecs(path: str, arr: np.ndarray) -> None:
    _write_vecs(path, np.asarray(arr, np.int32), "<i4")
