"""Model-based fuzz of the FULL live-update stack (round 4).

One level above tests/test_storage_model_fuzz.py: random interleavings of
insert / insert_batch / delete / delete_batch / search / flush / compact /
reopen run against ``LazySpFreshIndex`` (protocol + two-stage pipeline +
background Split/Merge/Reassign + packed storage + lazy search), while a
plain dict ``vid -> vector`` tracks the expected LIVE SET.  Background
maintenance moves vectors between postings and mints replicas, but the
live set is invariant — after ``flush()`` the union of storage entries
(collapsed by vid) must equal the model exactly, full-probe searches for
exact member vectors must return their vid at distance ~0, and deleted
vids must never reappear (including across compact and reopen)."""

import numpy as np
import os

_STEPS = int(os.environ.get("SPF_FUZZ_STEPS", "150"))  # idle grinds go deeper; CI default unchanged

import pytest

from spfresh_tpu.index import Config, SpannIndexBuilder
from spfresh_tpu.lire import LireConfig
from spfresh_tpu.lire.lazy_fresh import LazySpFreshIndex

DIM = 8


def _live_map(storage):
    out = {}
    for pid in storage.posting_ids():
        ids, vecs, _ = storage.get_posting(pid)
        for vid, vec in zip(ids, vecs):
            out[int(vid)] = np.asarray(vec, np.float32)
    return out


def _check(fresh, model, deleted, ctx, exact_dist=True):
    fresh.flush()
    live = _live_map(fresh.storage)
    assert set(live) == set(model), (
        f"{ctx}: live set mismatch (missing={set(model) - set(live)}, "
        f"extra={set(live) - set(model)})"
    )
    for vid, vec in list(model.items())[:8]:
        # Disk stays exact f32 under EVERY storage dtype (design contract).
        np.testing.assert_allclose(live[vid], vec, atol=1e-5, err_msg=ctx)
    assert not (set(live) & deleted), f"{ctx}: deleted vid resurrected"
    # Exact-member searches hit their own vid.  Under int8 staging the
    # serving slabs carry quantized residuals: top-1 identity must hold
    # (quantization error << inter-point distance at this geometry), but
    # the self-distance is only ~0 for exact slabs.
    probe = list(model.items())[:4]
    if probe:
        q = np.stack([v for _, v in probe])
        ids, d = fresh.search(q, 1, nprobe=fresh.num_clusters)
        for r, (vid, _) in enumerate(probe):
            assert int(ids[r, 0]) == vid, f"{ctx}: self-query missed"
            if exact_dist:
                assert float(d[r, 0]) < 1e-4, ctx


@pytest.mark.parametrize("sd", ["float32", "int8"])
@pytest.mark.parametrize("seed", [0, 1])
def test_lazy_fresh_model_fuzz(tmp_path, seed, sd):
    rng = np.random.default_rng(3000 + seed)
    n = 150
    data = 2.0 * rng.standard_normal((n, DIM)).astype(np.float32)
    cfg = Config.from_dict(
        {
            "storage_dtype": sd,
            "clustering_params": {
                "initial_k": 4,
                "desired_cluster_size": 30,
                "rng_seed": 42,
                "max_replicas": 2,
            },
            "output_path": str(tmp_path / f"fz{seed}"),
        }
    )
    SpannIndexBuilder(cfg).with_data(data).build(save=True)
    lire_cfg = LireConfig(max_partition_size=60, min_partition_size=2)

    fresh = LazySpFreshIndex(cfg.output_path, lire_config=lire_cfg)
    model = _live_map(fresh.storage)
    deleted: set = set()
    next_vid = 10_000
    try:
        for step in range(_STEPS):  # default 150: the depth that caught the same-posting duplicate (r4)
            op = rng.choice(
                ["insert", "insert_batch", "delete", "delete_batch",
                 "compact", "reopen"],
                p=[0.35, 0.2, 0.2, 0.1, 0.08, 0.07],
            )
            if op == "insert":
                v = 2.0 * rng.standard_normal(DIM).astype(np.float32)
                fresh.insert(v, next_vid)
                model[next_vid] = v
                next_vid += 1
            elif op == "insert_batch":
                kk = int(rng.integers(2, 12))
                vs = 2.0 * rng.standard_normal((kk, DIM)).astype(np.float32)
                vids = list(range(next_vid, next_vid + kk))
                fresh.insert_batch(vs, vids)
                for vid, v in zip(vids, vs):
                    model[vid] = v
                next_vid += kk
            elif op == "delete" and model:
                vid = int(rng.choice(sorted(model)))
                fresh.delete(vid)
                model.pop(vid)
                deleted.add(vid)
            elif op == "delete_batch" and model:
                vids = [int(v) for v in
                        rng.permutation(sorted(model))[:4]]
                fresh.delete_batch(vids)
                for vid in vids:
                    model.pop(vid)
                    deleted.add(vid)
            elif op == "compact":
                fresh.compact()
            elif op == "reopen":
                fresh.flush()
                fresh.close()
                fresh = LazySpFreshIndex(
                    cfg.output_path, lire_config=lire_cfg
                )
            if step % 12 == 11:
                _check(fresh, model, deleted, f"seed {seed} step {step}", exact_dist=sd != "int8")
        _check(fresh, model, deleted, f"seed {seed} final", exact_dist=sd != "int8")
        # End-to-end durability: everything survives one more reopen.
        fresh.close()
        fresh = LazySpFreshIndex(cfg.output_path, lire_config=lire_cfg)
        _check(fresh, model, deleted, f"seed {seed} post-final-reopen", exact_dist=sd != "int8")
    finally:
        fresh.close()
