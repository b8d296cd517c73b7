"""Coverage for utils (metrics/profiling), config Display, and sharded+bf16."""

import numpy as np

from spfresh_tpu.index import Config
from spfresh_tpu.utils import PhaseTimer, metrics
from spfresh_tpu.utils.metrics import Metrics


def test_metrics_counters_and_gauges():
    m = Metrics()
    m.inc("a")
    m.inc("a", 2)
    m.set_gauge("g", 7.5)
    snap = m.snapshot()
    assert snap["a"] == 3
    assert snap["g"] == 7.5
    m.reset()
    assert m.snapshot() == {}


def test_global_metrics_helpers():
    before = metrics.snapshot().get("test.counter", 0)
    metrics.inc("test.counter", 5)
    assert metrics.snapshot()["test.counter"] == before + 5


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    totals = {name: count for name, _, count in t.totals()}
    assert totals == {"a": 2, "b": 1}
    report = t.report()
    assert "a" in report and "b" in report


def test_config_display_roundtrip():
    cfg = Config.from_dict(
        {"clustering_params": {"initial_k": 7, "rng_seed": 3}, "output_path": "/tmp/x"}
    )
    text = str(cfg)  # Display parity (config.rs:21-48)
    assert "initial_k: 7" in text
    # Round-trips through the dict form.
    cfg2 = Config.from_dict(cfg.to_dict())
    assert cfg2.initial_k == 7 and cfg2.rng_seed == 3


def test_sharded_bf16(tmp_path, rng):
    from spfresh_tpu.index import Config as Cfg
    from spfresh_tpu.index import SpannIndexBuilder, brute_force_search
    from spfresh_tpu.parallel import ShardedSpannIndex

    data = rng.standard_normal((240, 8)).astype(np.float32)
    cfg = Cfg.from_dict(
        {
            "clustering_params": {"initial_k": 3, "desired_cluster_size": 40, "rng_seed": 1},
            "output_path": str(tmp_path / "i"),
            "storage_dtype": "bfloat16",
        }
    )
    index = SpannIndexBuilder(cfg).with_data(data).build(save=False)
    sharded = ShardedSpannIndex(index)
    q = rng.standard_normal((5, 8)).astype(np.float32)
    ids, dists = sharded.search(q, k=5, nprobe=index.num_clusters)
    _, gt = brute_force_search(data, q, k=5)
    recall = np.mean([len(set(ids[r]) & set(gt[r])) / 5 for r in range(5)])
    assert recall >= 0.8  # bf16 rounding may flip near-ties; must stay high


def test_budget_sort_matches_lexsort():
    """budget_sort must reproduce np.lexsort((d, cls))'s STABLE order exactly
    — including distance ties (point-order preserved), +/-0.0, and inf."""
    from spfresh_tpu.clustering.utils import budget_sort

    rng = np.random.default_rng(7)
    for trial in range(20):
        m = int(rng.integers(0, 5000))
        cls = rng.integers(0, 97, m).astype(np.int32)
        d = rng.random(m).astype(np.float32)
        # Force heavy ties: quantize half the distances to 3 values.
        ties = rng.random(m) < 0.5
        d[ties] = rng.choice(np.asarray([0.0, 0.25, 1.0], np.float32), ties.sum())
        # Sprinkle -0.0 and inf (inf shows up pre-mask in some callers).
        d[rng.random(m) < 0.05] = np.float32(-0.0)
        d[rng.random(m) < 0.05] = np.inf
        got = budget_sort(cls, d)
        want = np.lexsort((d, cls))
        assert np.array_equal(got, want), trial
    # int64 cluster ids (the out-of-core caller's dtype)
    cls = np.asarray([5, 0, 5, 0], np.int64)
    d = np.asarray([1.0, 2.0, 0.5, 2.0], np.float32)
    assert np.array_equal(budget_sort(cls, d), np.lexsort((d, cls)))
    # negative-distance fallback path stays correct
    d_neg = np.asarray([-1.0, 2.0, 0.5, 2.0], np.float32)
    assert np.array_equal(budget_sort(cls, d_neg), np.lexsort((d_neg, cls)))
    assert budget_sort(np.empty(0, np.int32), np.empty(0, np.float32)).size == 0
