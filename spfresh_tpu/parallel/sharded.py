"""Multi-chip SPANN search over a ``jax.sharding.Mesh``.

The reference is a single-process library whose only fan-out is rayon threads
(SURVEY.md section 2, "Parallelism strategies").  The TPU-native scale-out
axis is the vector corpus: posting lists and their centroids are sharded
across devices; every chip scans its centroid shard, reranks its local
posting lists, and the per-shard top-k results meet in an ``all_gather``
over ICI followed by a replicated merge (SURVEY.md section 5, "Distributed
communication backend").  No custom transport — XLA collectives ride ICI.

Layout: clusters are dealt to shards in size-balanced round-robin order; each
shard's CSR block is padded to the same static shape so one program serves
all shards under ``shard_map``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spfresh_tpu.index.spann import SpannIndex, _ids_i32, _max_multiplicity, _round_up
from spfresh_tpu.ops.distances import pairwise_distance, rowwise_distance
from spfresh_tpu.ops.topk import smallest_k, smallest_k_unique

_F32_EPS = float(np.finfo(np.float32).eps)


def default_mesh(axis: str = "shard", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


@dataclasses.dataclass
class ShardedView:
    """Per-shard padded CSR blocks, stacked on a leading shard axis."""

    centroids: jax.Array  # (S, Cs, d)
    cent_valid: jax.Array  # (S, Cs)
    offsets: jax.Array  # (S, Cs)
    lens: jax.Array  # (S, Cs)
    ids: jax.Array  # (S, Ps)
    vectors: jax.Array  # (S, Ps, d)
    pad: int
    num_shards: int
    max_dup: int = 8


class ShardedSpannIndex:
    """Data-sharded SPANN search: local scan + rerank per chip, collective
    top-k merge over the mesh axis."""

    def __init__(self, index: SpannIndex, mesh: Optional[Mesh] = None, axis: str = "shard"):
        self.index = index
        self.metric = index.metric
        self.mesh = mesh if mesh is not None else default_mesh(axis)
        self.axis = self.mesh.axis_names[0]
        self.num_shards = self.mesh.devices.size
        self._view: Optional[ShardedView] = None
        self._view_gen = -1  # index._gen at view build; stale views rebuild

    # -- sharded layout ----------------------------------------------------

    def _build_view(self) -> ShardedView:
        idx = self.index
        if not idx.postings:
            raise ValueError("index is empty")
        S = self.num_shards
        d = idx.dim
        # Size-balanced deal: biggest cluster to the currently-lightest shard.
        cids = sorted(idx.postings, key=lambda c: -len(idx.postings[c][0]))
        shard_of: Dict[int, int] = {}
        load = [0] * S
        per_shard: List[List[int]] = [[] for _ in range(S)]
        for c in cids:
            s = int(np.argmin(load))
            per_shard[s].append(c)
            load[s] += len(idx.postings[c][0])
            shard_of[c] = s
        Cs = max(8, _round_up(max(len(g) for g in per_shard), 8))
        max_len = max(len(idx.postings[c][0]) for c in cids)
        pad = max(8, _round_up(max(1, max_len), 8))
        Ps = max(8, _round_up(max(load), 8))
        cent = np.zeros((S, Cs, d), np.float32)
        valid = np.zeros((S, Cs), bool)
        offsets = np.zeros((S, Cs), np.int32)
        lens = np.zeros((S, Cs), np.int32)
        flat_ids = np.full((S, Ps), -1, np.int32)
        flat_vecs = np.zeros((S, Ps, d), np.float32)
        for s, group in enumerate(per_shard):
            pos = 0
            for row, c in enumerate(group):
                pids, pvecs = idx.postings[c]
                m = len(pids)
                cent[s, row] = idx.centroids[c]
                valid[s, row] = True
                offsets[s, row] = pos
                lens[s, row] = m
                flat_ids[s, pos : pos + m] = _ids_i32(pids)
                flat_vecs[s, pos : pos + m] = pvecs
                pos += m
        spec = NamedSharding(self.mesh, P(self.axis))
        # device_put straight from numpy: staging through jnp.asarray would
        # commit each array to the *default* backend first — wrong placement,
        # and a hard failure when virtualizing a CPU mesh over a broken TPU.
        sd = idx.policy.storage_dtype
        self._view = ShardedView(
            centroids=jax.device_put(cent.astype(sd), spec),
            cent_valid=jax.device_put(valid, spec),
            offsets=jax.device_put(offsets, spec),
            lens=jax.device_put(lens, spec),
            ids=jax.device_put(flat_ids, spec),
            vectors=jax.device_put(flat_vecs.astype(sd), spec),
            pad=pad,
            num_shards=S,
            max_dup=_max_multiplicity(
                np.concatenate([idx.postings[c][0] for c in cids])
            ),
        )
        self._view_gen = idx._gen
        return self._view

    def view(self) -> ShardedView:
        if self._view is None or self._view_gen != self.index._gen:
            self._build_view()
        return self._view

    # -- search ------------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "k", "nprobe", "prune"))
    def _sharded_search(self, queries, view_arrays, prune_factor, k: int,
                        nprobe: int, prune: bool = False):
        view = self.view()
        axis = self.axis
        metric, pad = self.metric, view.pad
        centroids, cent_valid, offsets, lens, ids, vectors = view_arrays

        def shard_fn(q, pf, cent, cvalid, offs, lns, pids, pvecs):
            # Drop the unit shard axis of each local block.
            cent, cvalid, offs, lns, pids, pvecs = (
                a[0] for a in (cent, cvalid, offs, lns, pids, pvecs)
            )
            raw_d, cand_ids, local_cd = _local_candidates(
                q, cent, cvalid, offs, lns, pids, pvecs,
                k=k, nprobe=nprobe, pad=pad, metric=metric,
            )
            if prune:
                # Reference-style dynamic pruning against the GLOBAL nearest
                # centroid distance: pmin over shards keeps the threshold
                # identical to the single-chip semantics.
                global_cd = jax.lax.pmin(local_cd, axis)  # (Q,)
                thr = pf.astype(raw_d.dtype) * (global_cd + _F32_EPS)
                raw_d = jnp.where(raw_d <= thr[:, None], raw_d, jnp.inf)
            # Local DISTINCT top-k: duplicates of one point (replicas in two
            # postings on the same shard) must not evict a true neighbor from
            # the shard's k slots — with dedup, any global top-k point living
            # on this shard provably survives into the local top-k.
            local_d, local_i = smallest_k_unique(
                raw_d, cand_ids, min(k, raw_d.shape[1]), max_dup=view.max_dup
            )
            # ICI collective: everyone sees every shard's local top-k.
            all_d = jax.lax.all_gather(local_d, axis)  # (S, Q, k)
            all_i = jax.lax.all_gather(local_i, axis)
            S = all_d.shape[0]
            Q = all_d.shape[1]
            merged_d = jnp.moveaxis(all_d, 0, 1).reshape(Q, S * k)
            merged_i = jnp.moveaxis(all_i, 0, 1).reshape(Q, S * k)
            # Replicas of one point can surface from several shards: dedup.
            vals, out_ids = smallest_k_unique(
                merged_d, merged_i, k, max_dup=view.max_dup
            )
            out_ids = jnp.where(jnp.isfinite(vals), out_ids, -1)
            return out_ids, vals

        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )(queries, prune_factor, centroids, cent_valid, offsets, lens, ids, vectors)

    def search(
        self, queries, k: int, nprobe: Optional[int] = None,
        prune_factor: Optional[float] = None, batch_size: int = 1024,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched multi-chip search.  ``nprobe`` is per shard (a safe
        superset of the single-chip semantics: S shards probe S*nprobe lists
        in total).  ``prune_factor`` enables reference-style dynamic pruning
        against the global nearest-centroid distance."""
        view = self.view()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if nprobe is None:
            nprobe = self.index.config.search.nprobe or k
        nprobe = max(1, min(int(nprobe), int(view.centroids.shape[1])))
        if prune_factor is None:
            prune_factor = self.index.config.search.prune_factor
        prune = prune_factor is not None
        arrays = (
            view.centroids, view.cent_valid, view.offsets,
            view.lens, view.ids, view.vectors,
        )
        qspec = NamedSharding(self.mesh, P())
        pf = jax.device_put(
            np.float32(prune_factor if prune else 0.0), qspec
        )
        out_i, out_d = [], []
        for s in range(0, queries.shape[0], batch_size):
            qi, qd = self._sharded_search(
                jax.device_put(queries[s : s + batch_size], qspec),
                arrays, pf, int(k), nprobe, prune,
            )
            out_i.append(np.asarray(qi))
            out_d.append(np.asarray(qd))
        return np.concatenate(out_i).astype(np.int64), np.concatenate(out_d)


def _local_candidates(q, cent, cvalid, offs, lns, pids, pvecs, *, k, nprobe, pad, metric):
    """Local (per-shard) probe/gather/rerank: returns the full candidate set
    (d (Q, n_cand), cand_ids (Q, n_cand)) plus the shard's nearest-centroid
    distance (Q,) for global pruning."""
    Q = q.shape[0]
    qf = q.astype(cent.dtype)
    Dc = pairwise_distance(qf, cent, metric)
    Dc = jnp.where(cvalid[None, :], Dc, jnp.inf)
    cent_d, cent_i = smallest_k(Dc, nprobe)
    base = offs[cent_i].astype(jnp.int32)
    ar = jnp.arange(pad, dtype=jnp.int32)
    pos = base[..., None] + ar
    valid = (ar < lns[cent_i][..., None]) & jnp.isfinite(cent_d)[..., None]
    pos = jnp.clip(pos, 0, pvecs.shape[0] - 1)
    cand_vecs = pvecs[pos]
    cand_ids = jnp.where(valid, pids[pos], -1)
    d = rowwise_distance(cand_vecs, qf[:, None, None, :], metric)
    d = jnp.where(valid, d, jnp.inf)
    n_cand = nprobe * pad
    d = d.reshape(Q, n_cand)
    cand_ids = cand_ids.reshape(Q, n_cand)
    if n_cand < k:
        padc = k - n_cand
        d = jnp.concatenate([d, jnp.full((Q, padc), jnp.inf, d.dtype)], axis=1)
        cand_ids = jnp.concatenate(
            [cand_ids, jnp.full((Q, padc), -1, cand_ids.dtype)], axis=1
        )
    return d, cand_ids, cent_d[:, 0]
