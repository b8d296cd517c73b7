"""Dtype policy for the TPU build.

The reference bounds usable scalars with a ``SpannFloat`` trait admitting f32/f64
(/root/reference/src/core/float.rs:9-25).  On TPU the analogous policy is:

* **storage dtype** — how vectors live in HBM / on disk.  ``float32`` by default;
  ``bfloat16`` halves HBM footprint and bandwidth for distance scans (the usual
  bottleneck) at a small recall cost.
* **accumulation dtype** — always ``float32``.  Every matmul on the MXU passes
  ``preferred_element_type=float32`` so bf16-stored vectors still accumulate
  exactly like the f32 reference within rounding.

float64 is deliberately unsupported on the hot path: TPUs have no f64 ALUs and
XLA emulates it at >10x cost.  Host-side (numpy) code may hold f64 and is cast
on transfer.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

# Canonical accumulation dtype for all distance/centroid math.
ACCUM_DTYPE = jnp.float32

_STORAGE_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    """Storage/accumulation dtype pair used across the framework."""

    storage: str = "float32"

    def __post_init__(self):
        if self.storage not in _STORAGE_DTYPES:
            raise ValueError(
                f"unsupported storage dtype {self.storage!r}; "
                f"expected one of {sorted(_STORAGE_DTYPES)}"
            )

    @property
    def storage_dtype(self):
        return _STORAGE_DTYPES[self.storage]

    @property
    def accum_dtype(self):
        return ACCUM_DTYPE

    @property
    def storage_itemsize(self) -> int:
        return jnp.dtype(self.storage_dtype).itemsize

    def to_storage(self, x):
        return jnp.asarray(x, dtype=self.storage_dtype)

    def to_accum(self, x):
        return jnp.asarray(x, dtype=self.accum_dtype)


DEFAULT_POLICY = DtypePolicy()


def as_f32_np(x) -> np.ndarray:
    """Host-side canonicalisation: contiguous float32 numpy array."""
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))
