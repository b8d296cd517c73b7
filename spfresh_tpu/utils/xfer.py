"""Host<->device transfer accounting + link calibration.

The official benchmark must tell the truth in any tunnel weather (VERDICT
r2): wall-clock alone cannot distinguish engine time from the axon link's
~20-40 MB/s H2D bandwidth and ~60 ms dispatch latency, which swing 50x
between weather windows.  Every GB-scale transfer in the build path routes
through these helpers so the bench can decompose

    build_wall_s   = what a stopwatch saw
    build_xfer_s   = measured seconds spent purely moving bytes over the link
    build_device_s = wall - xfer: device + host compute + dispatch latency —
                     the weather-robust number (remaining dispatch round-trips
                     are bounded and ``calibrate()`` reports their unit cost)

The reference's criterion harness (/root/reference/benches/
clustering_benchmark.rs:37-61) measures on direct-attached hardware where
transfers are free; this decomposition is what makes the same <60 s build
claim checkable through a tunnel.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import numpy as np


@dataclasses.dataclass
class TransferStats:
    """Accumulated transfer walls/bytes since the last ``reset()``."""

    h2d_bytes: int = 0
    h2d_s: float = 0.0
    n_h2d: int = 0
    d2h_bytes: int = 0
    d2h_s: float = 0.0
    n_d2h: int = 0

    @property
    def total_s(self) -> float:
        return self.h2d_s + self.d2h_s

    def reset(self) -> None:
        self.h2d_bytes = self.d2h_bytes = self.n_h2d = self.n_d2h = 0
        self.h2d_s = self.d2h_s = 0.0

    def account_h2d(self, nbytes: int, seconds: float) -> None:
        self.h2d_bytes += int(nbytes)
        self.h2d_s += seconds
        self.n_h2d += 1

    def account_d2h(self, nbytes: int, seconds: float) -> None:
        self.d2h_bytes += int(nbytes)
        self.d2h_s += seconds
        self.n_d2h += 1

    def as_dict(self) -> dict:
        return {
            "h2d_mb": round(self.h2d_bytes / 2**20, 1),
            "h2d_s": round(self.h2d_s, 2),
            "n_h2d": self.n_h2d,
            "d2h_mb": round(self.d2h_bytes / 2**20, 1),
            "d2h_s": round(self.d2h_s, 2),
            "n_d2h": self.n_d2h,
        }


#: Global accumulator — the bench resets it around the build and reads the
#: decomposition out; zero overhead for callers that never look at it.
STATS = TransferStats()


def timed_put(x, device=None) -> jax.Array:
    """``device_put`` + block, accounted as pure H2D wall.

    Blocking serializes the upload against the next dispatch (one ~60 ms
    round-trip per call) — the price of attributing GB-scale moves to the
    link instead of smearing them into whichever kernel happened to wait.
    """
    x = np.asarray(x)
    t0 = time.perf_counter()
    y = jax.device_put(x, device) if device is not None else jax.device_put(x)
    y.block_until_ready()
    STATS.account_h2d(x.nbytes, time.perf_counter() - t0)
    return y


def timed_pull(x) -> np.ndarray:
    """Device->host copy, accounted as pure D2H wall.

    Waits for the producing computation FIRST (that wall belongs to the
    kernel, and the caller's phase timer already holds it), then times only
    the byte movement.
    """
    x = jax.block_until_ready(x)
    t0 = time.perf_counter()
    out = np.asarray(x)
    STATS.account_d2h(out.nbytes, time.perf_counter() - t0)
    return out


def calibrate(
    device=None, mb: int = 32, repeats: int = 3, dispatch_reps: int = 10
) -> dict:
    """Measure the link's current weather: H2D/D2H bandwidth (median of
    ``repeats`` ``mb``-sized moves) and dispatch round-trip latency (median
    of ``dispatch_reps`` tiny warm jit calls).  ~5 s in good weather; the
    bench runs it before and after the timed region so every recorded
    number carries the conditions it was measured under."""
    dev = device if device is not None else jax.devices()[0]
    n = mb * (1 << 20) // 4
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    h2d, d2h = [], []
    y: Optional[jax.Array] = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        y = jax.device_put(x, dev)
        y.block_until_ready()
        h2d.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(y)
        d2h.append(time.perf_counter() - t0)
    f = jax.jit(lambda a: a + 1.0)
    small = jax.device_put(np.float32(1.0), dev)
    f(small).block_until_ready()  # compile outside the timed reps
    disp = []
    for _ in range(dispatch_reps):
        t0 = time.perf_counter()
        f(small).block_until_ready()
        disp.append(time.perf_counter() - t0)
    return {
        "h2d_mbps": round(mb / float(np.median(h2d)), 1),
        "d2h_mbps": round(mb / float(np.median(d2h)), 1),
        "dispatch_ms": round(float(np.median(disp)) * 1e3, 2),
    }
