"""Recall / precision evaluation harness (parity:
/root/reference/src/main.rs:73-115 — the reference's end-to-end SIFT-small
precision driver), batched for TPU.

The reference computes per-query precision = |result intersect gt| / k and
logs it (main.rs:73-77).  Here evaluation is vectorized over the whole query
set and also reports QPS, plus an nprobe sweep helper for the recall/QPS
curves in BASELINE.md.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import List, Optional, Sequence

import numpy as np

from spfresh_tpu.index.spann import SpannIndex, brute_force_search

log = logging.getLogger(__name__)


def recall_at_k(result_ids: np.ndarray, groundtruth: np.ndarray, k: Optional[int] = None) -> float:
    """Mean |result ∩ gt| / k over queries (compare_results, main.rs:73-77).

    result_ids (Q, >=k) with -1 padding; groundtruth (Q, >=k)."""
    if k is None:
        k = min(result_ids.shape[1], groundtruth.shape[1])
    hits = 0
    for r, g in zip(result_ids[:, :k], groundtruth[:, :k]):
        hits += len(set(int(x) for x in r if x >= 0) & set(int(x) for x in g))
    return hits / (len(result_ids) * k)


@dataclasses.dataclass
class EvalResult:
    recall: float
    qps: float
    k: int
    nprobe: int
    latency_ms_per_batch: float


def evaluate(
    index: SpannIndex,
    queries: np.ndarray,
    groundtruth: np.ndarray,
    k: int = 10,
    nprobe: Optional[int] = None,
    batch_size: Optional[int] = None,
    warmup: bool = True,
) -> EvalResult:
    """Timed recall evaluation.  ``groundtruth`` may come from an ivecs file
    or ``brute_force_search``."""
    queries = np.asarray(queries, np.float32)
    nprobe_eff = nprobe if nprobe is not None else (index.config.search.nprobe or k)
    if warmup:
        index.search(queries[:1], k, nprobe=nprobe)  # compile outside the clock
    t0 = time.perf_counter()
    ids, _ = index.search(queries, k, nprobe=nprobe, batch_size=batch_size)
    dt = time.perf_counter() - t0
    rec = recall_at_k(ids, np.asarray(groundtruth), k)
    nbatches = max(1, -(-len(queries) // (batch_size or index.config.search.query_batch_size)))
    res = EvalResult(
        recall=rec,
        qps=len(queries) / dt,
        k=k,
        nprobe=int(nprobe_eff),
        latency_ms_per_batch=1e3 * dt / nbatches,
    )
    log.info("eval: recall@%d=%.4f qps=%.0f nprobe=%s", k, rec, res.qps, nprobe_eff)
    return res


def nprobe_sweep(
    index: SpannIndex,
    queries: np.ndarray,
    groundtruth: np.ndarray,
    k: int = 10,
    nprobes: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128),
    batch_size: Optional[int] = None,
) -> List[EvalResult]:
    """Recall/QPS curve over nprobe (BASELINE.md config 3)."""
    out = []
    for np_ in nprobes:
        if np_ > index.num_clusters:
            break
        out.append(evaluate(index, queries, groundtruth, k, np_, batch_size))
    return out


def make_groundtruth(data: np.ndarray, queries: np.ndarray, k: int, metric: str = "Euclidean") -> np.ndarray:
    """Exact ground truth via on-device brute force."""
    _, gt = brute_force_search(data, queries, k, metric)
    return gt
