"""Disk-backed lazy search — the reference's memory model, TPU-streamed.

The reference keeps only the centroid tree + manifest resident and pages
posting lists from disk per query (SURVEY.md section 3.3 "Lazy design";
spann_index.rs:169).  This mode reproduces that memory footprint for corpora
larger than HBM/RAM:

  HBM:   centroid matrix only (the "memory" tier)
  disk:  packed CSR postings, mmap'd (native C++ reader when built)
  query: device centroid scan -> host stages the probed slabs -> device
         rerank + top-k on the staged batch

Batches are PIPELINED: while the device uploads + reranks batch i, the next
batch's slabs stage on a background native thread (spf_csr_gather_async;
Python thread fallback) — the disk -> host copy hides behind device compute
instead of serializing with it.

The staging buffer is shaped (Q * nprobe, pad, d) per batch — independent of
corpus size — so a DEEP-100M-scale index searches in O(centroids) device
memory (BASELINE.md config 5).
"""

from __future__ import annotations

import functools
import gzip
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spfresh_tpu.index.config import Config
from spfresh_tpu.index.posting_store import read_packed_postings
from spfresh_tpu.index.spann import (
    CENTROIDS_FILE,
    MANIFEST,
    PACKED_FILE,
    _ids_i32,
    _round_up,
)
from spfresh_tpu.ops.distances import canonical_metric, rowwise_distance
from spfresh_tpu.ops.topk import centroid_topk, smallest_k_unique


@functools.partial(jax.jit, static_argnames=("k", "metric", "max_dup"))
def _rerank_staged(queries, slab_vecs, slab_ids, slab_lens, cent_d, k: int,
                   metric: str = "Euclidean", max_dup: int = 8):
    """Rerank host-staged slabs: queries (Q, d); slab_vecs (Q, nprobe, pad, d);
    slab_ids (Q, nprobe, pad); slab_lens (Q, nprobe)."""
    Q, nprobe, pad, d = slab_vecs.shape
    qf = queries.astype(slab_vecs.dtype)
    dist = rowwise_distance(slab_vecs, qf[:, None, None, :], metric)
    ar = jnp.arange(pad, dtype=jnp.int32)
    valid = (ar < slab_lens[..., None]) & jnp.isfinite(cent_d)[..., None]
    dist = jnp.where(valid, dist, jnp.inf)
    ids = jnp.where(valid, slab_ids, -1)
    n_cand = nprobe * pad
    vals, out_ids = smallest_k_unique(
        dist.reshape(Q, n_cand), ids.reshape(Q, n_cand), k, max_dup=max_dup,
    )
    return jnp.where(jnp.isfinite(vals), out_ids, -1), vals


class LazySpannIndex:
    """Open a saved packed index without loading posting vectors into memory."""

    def __init__(self, directory: str, config: Optional[Config] = None, pad: Optional[int] = None,
                 prefetch_threads: int = 2):
        with open(os.path.join(directory, MANIFEST)) as f:
            manifest = json.load(f)
        if manifest["layout"] != "packed":
            raise ValueError("lazy mode requires the 'packed' save layout")
        self.config = config or Config.from_dict(manifest.get("config", {}))
        self.metric = canonical_metric(self.config.distance_metric)
        self.dim = int(manifest["dim"])
        with gzip.open(os.path.join(directory, CENTROIDS_FILE), "rb") as f:
            cent = np.load(f)
        self._centroids = jnp.asarray(cent, jnp.float32)  # HBM-resident tier
        path = os.path.join(directory, PACKED_FILE)
        self._native = None
        try:
            from spfresh_tpu import native

            if native.available():
                self._native = native.NativeCsr(path)
        except Exception:
            self._native = None
        # Python mmap fallback (also used for ids/offsets metadata).
        self._cids, self._offsets, self._ids, self._vectors = read_packed_postings(
            path, mmap=True
        )
        lens = np.asarray(self._offsets[1:]) - np.asarray(self._offsets[:-1])
        self._lens = lens.astype(np.int32)
        self.num_clusters = len(self._cids)
        self.pad = pad or max(8, _round_up(int(lens.max(initial=1)), 8))
        # Exact replica-multiplicity bound for dedup (one-time scan on open).
        from spfresh_tpu.index.spann import _max_multiplicity

        self.max_dup = _max_multiplicity(np.asarray(self._ids))
        # Pipelined staging: background-stage the next batch while the device
        # works on the current one.  prefetch_threads=0 disables the overlap.
        self._pipeline = prefetch_threads > 0
        self._executor = None  # lazy Python-thread fallback when no native lib

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("nprobe", "metric"))
    def _centroid_topk(qb, centroids, nprobe: int, metric: str):
        # Chunked past ~32k centroids (DEEP-scale cluster counts) — the
        # (Q, C) matrix + giant top_k is the wrong shape there.
        return centroid_topk(qb, centroids, None, nprobe, metric)

    # -- staging -----------------------------------------------------------

    def _stage_async(self, rows: np.ndarray):
        """Start staging on a background thread; returns an object with
        .join() -> (vecs, ids, lens).  Native C++ thread when the library is
        built; Python thread (the ctypes gather releases the GIL) otherwise;
        synchronous fallback when pipelining is disabled."""
        flat = rows.reshape(-1).astype(np.int32)
        if self._pipeline and self._native is not None:
            return self._native.gather_padded_async(flat, self.pad)
        if self._pipeline:
            from concurrent.futures import ThreadPoolExecutor

            if self._executor is None:
                self._executor = ThreadPoolExecutor(max_workers=1)
            fut = self._executor.submit(self._stage, rows)

            class _Join:
                def join(self, _fut=fut):
                    return _fut.result()

            return _Join()

        class _Sync:
            def __init__(self, outer, r):
                self._outer, self._r = outer, r

            def join(self):
                return self._outer._stage(self._r)

        return _Sync(self, rows)

    def _stage(self, rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host-gather probed postings into a (m, pad, d) slab batch."""
        flat = rows.reshape(-1)
        if self._native is not None:
            return self._native.gather_padded(flat.astype(np.int32), self.pad)
        m = len(flat)
        vecs = np.zeros((m, self.pad, self.dim), np.float32)
        ids = np.full((m, self.pad), -1, np.int64)
        lens = np.empty((m,), np.int32)
        offs = np.asarray(self._offsets)
        for i, r in enumerate(flat):
            s, e = int(offs[r]), int(offs[r + 1])
            ln = min(e - s, self.pad)
            lens[i] = ln
            vecs[i, :ln] = self._vectors[s : s + ln]
            ids[i, :ln] = self._ids[s : s + ln]
        return vecs, ids, lens

    # -- search ------------------------------------------------------------

    def search(self, queries, k: int, nprobe: Optional[int] = None,
               batch_size: int = 64) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[1] != self.dim:
            raise ValueError(f"query dim {queries.shape[1]} != index dim {self.dim}")
        nprobe = max(1, min(int(nprobe or self.config.search.nprobe or k), self.num_clusters))
        out_i, out_d = [], []

        def finish(qb, cent_d, job):
            vecs, ids, lens = job.join()
            Q = qb.shape[0]
            qi, qd = _rerank_staged(
                jnp.asarray(qb),
                jnp.asarray(vecs.reshape(Q, nprobe, self.pad, self.dim)),
                jnp.asarray(_ids_i32(ids).reshape(Q, nprobe, self.pad)),
                jnp.asarray(lens.reshape(Q, nprobe)),
                cent_d,
                k=int(k),
                metric=self.metric,
                max_dup=self.max_dup,
            )
            out_i.append(np.asarray(qi))
            out_d.append(np.asarray(qd))

        # Software pipeline: batch i+1 stages (disk -> host, background
        # thread) while batch i uploads + reranks on the device.
        pending = None
        for s in range(0, queries.shape[0], batch_size):
            qb = queries[s : s + batch_size]
            cent_d, rows = self._centroid_topk(
                jnp.asarray(qb), self._centroids, nprobe, self.metric
            )
            job = self._stage_async(np.asarray(rows))
            if pending is not None:
                finish(*pending)
            pending = (qb, cent_d, job)
        if pending is not None:
            finish(*pending)
        return np.concatenate(out_i).astype(np.int64), np.concatenate(out_d)

    def close(self):
        if self._native is not None:
            self._native.close()
            self._native = None
        if self._executor is not None:
            self._executor.shutdown(wait=True)
            self._executor = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
