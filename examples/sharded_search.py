"""Multi-chip walkthrough: build OVER a device mesh, search with per-shard
top-k + collective merge, land a live update in the sharded view in place.

The reference is single-process (SURVEY.md §2 parallelism: rayon threads
only); this is the TPU-native scale-out axis — corpus and centroids sharded
over a `jax.sharding.Mesh`, per-shard scan/rerank, `all_gather` merge.

Runs anywhere: with fewer than 8 real devices it re-execs itself onto a
virtual 8-device CPU mesh (`--xla_force_host_platform_device_count`), the
same mechanism the test suite and the driver's dryrun use.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = 8

if __name__ == "__main__" and os.environ.get("_SPF_SHARDED_EXAMPLE") != "1":
    import jax

    if jax.device_count() < N_DEV:
        import subprocess

        env = dict(
            os.environ,
            _SPF_SHARDED_EXAMPLE="1",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={N_DEV}"
            ),
        )
        raise SystemExit(subprocess.call([sys.executable, __file__], env=env))

import jax

if os.environ.get("_SPF_SHARDED_EXAMPLE") == "1":
    # The axon sitecustomize imports jax at interpreter start, capturing
    # JAX_PLATFORMS before this script runs — re-pin via config (the same
    # dance tests/conftest.py and the driver dryrun do).
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from spfresh_tpu.index import Config, SpannIndexBuilder
from spfresh_tpu.parallel import ShardedSpannIndex


def main():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((4000, 32)).astype(np.float32)
    print(f"devices: {jax.device_count()} x {jax.devices()[0].platform}")

    cfg = Config.from_dict(
        {
            "clustering_params": {
                "initial_k": 8,
                "desired_cluster_size": 250,
                "rng_seed": 42,
            },
            "output_path": "/tmp/spfresh_sharded_example",
        }
    )

    # Build WITH the mesh: assign/medoid, multi-way subdivision, and the
    # replica pass all run data-parallel over the devices (bit-identical to
    # the single-device build — the tests assert it).
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("shard",))
    builder = SpannIndexBuilder(cfg).with_data(data)
    with mesh:
        index = builder.build(save=False)

    sharded = ShardedSpannIndex(index, mesh=mesh, axis="shard")
    queries = data[:16] + 0.01 * rng.standard_normal((16, 32)).astype(np.float32)
    ids, dists = sharded.search(queries, k=5, nprobe=index.num_clusters)
    assert (ids[np.arange(16), 0] == np.arange(16)).all(), "self-NN failed"
    print(f"sharded full-probe search over {index.num_clusters} postings: "
          f"self-NN exact for all {len(queries)} queries")

    # Live update: append two vectors to one posting; the sharded padded
    # view scatters them in place (no rebuild) and search sees them.
    cid = sorted(index.postings)[0]
    pids, pvecs = index.postings[cid]
    new = rng.standard_normal((2, 32)).astype(np.float32)
    index.replace_posting(
        cid,
        np.concatenate([np.asarray(pids), [90_000, 90_001]]),
        np.concatenate([np.asarray(pvecs), new]),
    )
    ids2, _ = sharded.search(new[:1], k=1, nprobe=index.num_clusters)
    assert int(ids2[0, 0]) == 90_000
    print("live insert landed in the sharded view in place; search sees id 90000")


if __name__ == "__main__":
    main()
