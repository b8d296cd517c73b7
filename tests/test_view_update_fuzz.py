"""Fuzz the incremental device-view update paths (round 4).

Random mutation sequences (member appends, slab rewrites/shrinks, new
postings, removed postings, centroid moves) drive THREE views of one
mutating ``SpannIndex``:

  * the Pallas padded view — updates IN PLACE (append scatter / slab
    rewrite / free-row allocation),
  * the sharded padded view — same machinery under shard_map,
  * the XLA CSR view — rebuilt from scratch every generation (the oracle).

After every few mutations all three must return identical full-probe
result sets.  Parametrized over float32 and int8 storage — the int8 paths
additionally exercise per-posting scale reuse (appends) and rescale
(rewrites)."""

import numpy as np
import pytest

from spfresh_tpu.index import Config, SpannIndexBuilder
from spfresh_tpu.parallel import ShardedSpannIndex, default_mesh

DIM = 8


def _sets_equal(a, b, ctx):
    assert a[0].shape == b[0].shape, ctx
    for r in range(a[0].shape[0]):
        assert set(a[0][r].tolist()) == set(b[0][r].tolist()), (
            f"{ctx}: row {r} differs"
        )


@pytest.mark.parametrize("sd", ["float32", "int8"])
@pytest.mark.parametrize("seed", [0, 1, 3])  # seed 3 caught the int8 append-scale divergence (r4)
def test_view_update_fuzz(tmp_path, sd, seed):
    rng = np.random.default_rng(5000 + seed)
    centers = 3.0 * rng.standard_normal((6, DIM)).astype(np.float32)
    data = (
        centers[rng.integers(0, 6, 300)]
        + 0.2 * rng.standard_normal((300, DIM))
    ).astype(np.float32)
    cfg = Config.from_dict(
        {
            "clustering_params": {
                "initial_k": 4,
                "desired_cluster_size": 50,
                "rng_seed": 42,
            },
            "output_path": str(tmp_path / f"vf_{sd}_{seed}"),
            "storage_dtype": sd,
        }
    )
    index = SpannIndexBuilder(cfg).with_data(data).build(save=False)
    sharded = ShardedSpannIndex(index, default_mesh(), engine="pallas")
    queries = np.concatenate([data[:6], 3.0 * rng.standard_normal((4, DIM))
                              ]).astype(np.float32)
    next_vid = 50_000

    def check(ctx):
        k = 8
        npb = index.num_clusters
        ora = index.search(queries, k, nprobe=npb, engine="xla")
        pal = index.search(queries, k, nprobe=npb, engine="pallas")
        _sets_equal(pal, ora, f"{ctx} pallas-vs-xla")
        sh = sharded.search(queries, k, nprobe=npb, nprobe_mode="global")
        _sets_equal(sh, ora, f"{ctx} sharded-vs-xla")

    check("initial")
    for step in range(40):
        op = rng.choice(
            ["append", "rewrite", "shrink", "new", "remove", "centroid"],
            p=[0.3, 0.15, 0.2, 0.12, 0.08, 0.15],
        )
        cids = sorted(index.postings)
        if op == "append":
            c = int(rng.choice(cids))
            ids, vecs = index.postings[c]
            kk = int(rng.integers(1, 5))
            add = (index.centroids[c][None, :]
                   + 0.2 * rng.standard_normal((kk, DIM))).astype(np.float32)
            index.replace_posting(
                c, np.concatenate([ids, np.arange(next_vid, next_vid + kk)]),
                np.concatenate([np.asarray(vecs), add]),
                centroid=index.centroids[c],
            )
            next_vid += kk
        elif op == "rewrite":
            # Vector values are IMMUTABLE per id (the system contract the
            # append fast path's prefix-equality check relies on): a value
            # change ships as a fresh id, like the real delete+insert flow.
            c = int(rng.choice(cids))
            ids, vecs = index.postings[c]
            ids = np.asarray(ids).copy()
            vecs = np.asarray(vecs).copy()
            if len(ids):
                j = int(rng.integers(len(ids)))
                vecs[j] = vecs[j] + 0.05
                ids[j] = next_vid
                next_vid += 1
            index.replace_posting(c, ids, vecs)
        elif op == "shrink":
            c = int(rng.choice(cids))
            ids, vecs = index.postings[c]
            if len(ids) > 2:
                keep = len(ids) - int(rng.integers(1, min(4, len(ids) - 1)))
                index.replace_posting(c, ids[:keep], np.asarray(vecs)[:keep])
        elif op == "new":
            kk = int(rng.integers(2, 6))
            cent = 3.0 * rng.standard_normal(DIM).astype(np.float32)
            vs = (cent[None, :]
                  + 0.2 * rng.standard_normal((kk, DIM))).astype(np.float32)
            index.add_cluster(vs, np.arange(next_vid, next_vid + kk), cent)
            next_vid += kk
        elif op == "remove" and len(cids) > 3:
            index.remove_cluster(int(rng.choice(cids)))
        elif op == "centroid":
            c = int(rng.choice(cids))
            index.replace_posting(
                c, *index.postings[c],
                centroid=(index.centroids[c]
                          + 0.1 * rng.standard_normal(DIM)).astype(np.float32),
            )
        if step % 6 == 5:
            check(f"sd={sd} seed={seed} step={step}")
    check(f"sd={sd} seed={seed} final")
