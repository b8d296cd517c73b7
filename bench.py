"""Headline benchmark: QPS/chip at recall@10 >= 0.90 on SIFT1M-scale data.

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}
(vs_baseline is against the 10k QPS/chip target from BASELINE.md.)

Data model mirrors the reference's criterion bench — seeded Gaussian
f32 vectors at 128-d (/root/reference/benches/clustering_benchmark.rs:11-15)
— with exact on-device ground truth.  Build config follows BASELINE.md
config 3 (nprobe sweep to the 0.90 recall point).

Side metrics (build time, recall, sweep points) go to stderr.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np


_BENCH_SEED = 12345  # corpus seed; part of the GT cache key


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _last_good_run():
    """Most relevant successful bench JSON from this round's measurement
    session (benchmarks/r4_tpu_session.sh tees into /tmp/r4_tpu).  The
    tunnel dies for whole windows: if it is dead at the DRIVER's capture
    time but the session ran earlier, the error artifact should still
    carry the round's real device numbers — clearly labeled with their
    source and age, never substituted for the live result."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    dirs = os.environ.get(
        "SPF_BENCH_LASTGOOD_DIRS",
        ":".join(
            ["/tmp/r4_tpu", "/tmp/r3_tpu",
             os.path.join(here, "benchmarks", "r4_results")]
        ),
    ).split(":")
    prefer = ("bench_1m_fixed2.json", "bench_1m_fixed.json", "bench_1m.json",
              "bench_1m_int8.json", "bench_mr8.json", "bench_small.json")
    found = []
    for d in dirs:
        for p in glob.glob(os.path.join(d, "bench*.json")):
            try:
                with open(p) as f:
                    lines = [ln for ln in f.read().splitlines() if ln.strip()]
                j = json.loads(lines[-1])
            except Exception:  # noqa: BLE001 — partial/garbled file: skip
                continue
            if "error" in j or "value" not in j:
                continue
            name = os.path.basename(p)
            rank = prefer.index(name) if name in prefer else len(prefer)
            found.append((rank, -os.path.getmtime(p), p, j))
    if not found:
        return None
    _, neg_mtime, p, j = sorted(found)[0]
    keep = ("metric", "value", "unit", "vs_baseline", "recall", "nprobe",
            "qps_engine", "build_wall_s", "build_device_s", "build_xfer_s")
    return {
        "source": p,
        "age_s": round(time.time() + neg_mtime, 1),
        **{k: j[k] for k in keep if k in j},
    }


def _error_payload(kind, detail, t_waited):
    payload = {
        "metric": "bench_error",
        "value": 0.0,
        "unit": "qps",
        "vs_baseline": 0.0,
        "error": kind,
        "detail": str(detail)[:500],
        "backend_wait_s": round(t_waited, 1),
    }
    try:
        lg = _last_good_run()
    except Exception:  # noqa: BLE001 — enrichment must never mask the error
        lg = None
    if lg is not None:
        payload["last_good_run"] = lg
    return payload


def _emit_error(kind, detail, t_waited):
    """One structured JSON line on stdout (still rc!=0) so a dead backend
    yields an interpretable driver artifact instead of a traceback
    (VERDICT r3: BENCH_r03.json was a raw stack trace)."""
    print(json.dumps(_error_payload(kind, detail, t_waited)), flush=True)
    sys.exit(2)


def _hang_watchdog(budget_s):
    """Last-ditch guard for the dead-tunnel mode retry/backoff can't catch:
    backend init that HANGS instead of raising (observed live — a dead
    tunnel wedges `jax.devices()` indefinitely; the watcher's probes each
    burn their full 240 s timeout).  A daemon timer emits the structured
    error line and hard-exits, so the driver still gets an interpretable
    artifact instead of killing a silent process."""
    import threading

    def fire():
        print(
            json.dumps(_error_payload(
                "tpu_unavailable", "backend init hang (watchdog)", budget_s
            )),
            flush=True,
        )
        os._exit(2)

    t = threading.Timer(budget_s, fire)
    t.daemon = True
    t.start()
    return t


def _probe_backend_subprocess(timeout_s):
    """(ok, why): can a FRESH interpreter init the backend and run a real
    matmul within timeout_s?  Probing out of process means a hanging
    backend init costs this probe its timeout — not the bench its life —
    and the main process only touches the backend after a probe proves the
    tunnel is answering."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp; jax.devices(); "
        "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready(); "
        "print('BACKEND_OK')"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"backend init hang (probe > {timeout_s:.0f}s)"
    if r.returncode == 0 and "BACKEND_OK" in r.stdout:
        return True, ""
    tail = (r.stderr or r.stdout).strip().splitlines()
    return False, (tail[-1][:300] if tail else f"probe rc={r.returncode}")


def _await_backend(max_wait_s=None, hang_grace_s=120.0):
    """Bounded retry/backoff on backend init: the axon tunnel dies for
    whole windows, and a first-contact `jax.devices()` then raises OR
    wedges.  Each attempt is proven in a throwaway subprocess (hangs cost
    that probe its timeout); only then does the main process init the
    backend, under a watchdog that turns an in-process wedge into the same
    structured error.  Budget: SPF_BENCH_BACKEND_WAIT_S (default 900 s)."""
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("SPF_BENCH_BACKEND_WAIT_S", 900))
    t0 = time.monotonic()
    delay = 5.0
    attempt = 0
    watchdog = _hang_watchdog(max_wait_s + hang_grace_s)
    while True:
        attempt += 1
        remaining = max_wait_s - (time.monotonic() - t0)
        ok, why = _probe_backend_subprocess(max(min(240.0, remaining), 60.0))
        if ok:
            try:
                devs = jax.devices()
                import jax.numpy as jnp

                (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
                watchdog.cancel()
                return devs
            except Exception as e:  # noqa: BLE001 — init raises RuntimeError subclasses
                why = str(e)
                try:
                    # jax caches a failed backend init (_backend_errors);
                    # drop the cache or every retry re-raises it.  NB: a
                    # bare `import jax.extend.backend` here would rebind
                    # `jax` as a function-local and make the jax.devices()
                    # above raise UnboundLocalError on EVERY attempt.
                    import importlib

                    importlib.import_module(
                        "jax.extend.backend"
                    ).clear_backends()
                except Exception:
                    pass
        waited = time.monotonic() - t0
        log(f"backend init attempt {attempt} failed ({why}) "
            f"({waited:.0f}/{max_wait_s:.0f}s)")
        if waited >= max_wait_s:
            # The timer must never outlive this function into a live
            # process (it would os._exit a host importing us in-process).
            watchdog.cancel()
            _emit_error("tpu_unavailable", why, waited)
        log(f"retry in {delay:.0f}s")
        time.sleep(min(delay, max(max_wait_s - waited, 0.1)))
        delay = min(delay * 2, 120.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="smoke test scale")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--nq", type=int, default=16384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cluster-size", type=int, default=256)
    ap.add_argument("--initial-k", type=int, default=16)
    ap.add_argument("--target-recall", type=float, default=0.90)
    ap.add_argument("--batch", type=int, default=8192,
                    help="query batch per dispatch.  8192 is the measured "
                         "throughput optimum through the tunnel (r5 sweep, "
                         "same window: 13.9k/16.2k/32.7k/44.7k/37.5k QPS at "
                         "1024/2048/4096/8192/16384 — ~60 ms dispatch "
                         "amortizes up to 8k, then per-batch link time "
                         "dominates; benchmarks/r5_results/b8192.json)")
    ap.add_argument("--storage-dtype", default="bfloat16",
                    help="bfloat16 (default: half the HBM footprint, slab DMA, "
                         "and view-upload bytes; recall cost ~0.004) | float32 "
                         "| int8 (residual IVF-SQ8: quarter-of-f32 slabs, "
                         "per-posting scales; step tracks cluster radius)")
    ap.add_argument("--metric", default="Euclidean",
                    help="Euclidean | Manhattan | Chebyshev (GIST-style stress: --metric Manhattan --dim 960)")
    ap.add_argument("--spread", type=float, default=0.7,
                    help="cluster radius / unit center scale — the corpus "
                         "difficulty knob (hardness is logged per run). "
                         "0.35 = well-separated clusters (easy routing, "
                         "0.03%% of lists at 0.9 recall); 0.7 (default) = "
                         "moderate overlap; 1.0 = heavy overlap (1.9%% of "
                         "lists at 0.9 recall, beyond published SIFT1M IVF "
                         "probe fractions)")
    ap.add_argument("--mesh", default=None,
                    help="build over a device mesh: 'auto' (all local devices "
                         "when >1 real accelerator), an integer device count, "
                         "or omit for the single-chip build.  Results are "
                         "bit-identical to the single-device path (tested); "
                         "an S-chip mesh shards the build's hot-loop FLOPs "
                         "and dispatches S ways")
    ap.add_argument("--max-split-ways", type=int, default=None,
                    help="children per subdivision round (default: Config's "
                         "8; 16 halves the big-level count at 1M scale)")
    ap.add_argument("--max-replicas", type=int, default=None,
                    help="closure-replica cap per point (default: Config's)")
    ap.add_argument("--boundary-threshold", type=float, default=None,
                    help="replica admission d(p,c_j) < bt * d(p,c_base) "
                         "(default: Config's)")
    ap.add_argument("--soar-lambda", type=float, default=None,
                    help="SOAR replica ranking weight (Euclidean only).  "
                         "Default: Config's auto (0.5 on Euclidean since the "
                         "r5 same-window A/B measured +0.005 recall at equal "
                         "wall QPS for +1.6%% storage).  Pass 0 for the "
                         "reference's plain distance ranking")
    ap.add_argument("--replica-overflow", type=float, default=None,
                    help="posting replica headroom factor (default: Config's)")
    ap.add_argument("--query-wire", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"],
                    help="bfloat16 (default) ships query batches over the "
                         "link in bf16 (upcast on device) — halves the "
                         "per-batch query upload, the measured QPS "
                         "bottleneck through the tunnel; queries carry bf16 "
                         "rounding (measured recall cost 0.0006 at the 1M "
                         "operating point; the JSON reports the actual "
                         "recall).  float32 = exact wire")
    ap.add_argument("--latent-dim", type=int, default=None,
                    help="draw the corpus on an L-dimensional linear manifold "
                         "embedded in --dim (plus 1%% ambient noise).  Real "
                         "descriptor corpora are low-LID (SIFT ~10-13, GIST "
                         "~20-30); a full-rank 960-d Gaussian has LID ~275, a "
                         "routing pathology no real dataset exhibits.  Use "
                         "e.g. --dim 960 --latent-dim 32 for a GIST-like "
                         "bandwidth stress with realistic routing")
    args = ap.parse_args()

    n = args.n or (20_000 if args.small else 1_000_000)
    nq = min(args.nq, 200) if args.small else args.nq
    devs = _await_backend()
    from spfresh_tpu.eval import recall_at_k
    from spfresh_tpu.index import Config, SpannIndexBuilder, brute_force_search

    log(f"bench: n={n} dim={args.dim} nq={nq} device={devs[0]}")
    rng = np.random.default_rng(_BENCH_SEED)
    # SIFT-like data model: a mixture of Gaussians (real embedding corpora are
    # clustered; uniform Gaussian noise has no nearest-neighbor structure and
    # degenerates every IVF index to a full scan).  Queries are drawn from the
    # same mixture, like SIFT queries come from the same distribution.
    n_centers = max(64, n // 1000)
    spread = args.spread
    L = args.latent_dim
    if L is not None:
        # Low-LID manifold corpus: latent mixture -> fixed linear embedding
        # into the ambient dim + small ambient noise.  Distances still cost
        # the full --dim bandwidth; routing difficulty matches real data.
        proj = rng.standard_normal((L, args.dim)).astype(np.float32) / np.sqrt(L)
        centers = rng.standard_normal((n_centers, L)).astype(np.float32)

        def draw(m):
            a = rng.integers(0, n_centers, size=m)
            lat = centers[a] + spread * rng.standard_normal((m, L))
            amb = 0.01 * rng.standard_normal((m, args.dim))
            return (lat.astype(np.float32) @ proj + amb).astype(np.float32)

    else:
        centers = rng.standard_normal((n_centers, args.dim)).astype(np.float32)

        def draw(m):
            a = rng.integers(0, n_centers, size=m)
            return (
                centers[a] + spread * rng.standard_normal((m, args.dim))
            ).astype(np.float32)

    data = draw(n)
    queries = draw(nq)

    # Ground truth is a pure function of the corpus parameters — cache it so
    # repeat runs skip the ~10-minute exact scan (the cache key pins every
    # input that shapes data/queries/metric).
    gt_key = (f"gt_n{n}_d{args.dim}_nq{nq}_k{args.k}_{args.metric}"
              f"_s{spread}_lat{L}_seed{_BENCH_SEED}_v1")
    gt_path = os.path.join("/tmp/spann_bench_gt", gt_key + ".npz")
    if os.path.exists(gt_path):
        cached = np.load(gt_path)
        gt_d, gt_i = cached["gt_d"], cached["gt_i"]
        log(f"ground truth: cached ({gt_path})")
    else:
        t0 = time.perf_counter()
        gt_d, gt_i = brute_force_search(data, queries, args.k, metric=args.metric)
        log(f"ground truth: {time.perf_counter() - t0:.1f}s")
        os.makedirs(os.path.dirname(gt_path), exist_ok=True)
        np.savez(gt_path, gt_d=gt_d, gt_i=gt_i)
    # Corpus-hardness diagnostics (comparable to published SIFT1M values):
    # local intrinsic dimensionality (Levina-Bickel MLE over the kNN radii;
    # SIFT1M ~10-13) — high LID = neighbors hard to separate locally.
    d_sqrt = np.sqrt(np.maximum(gt_d, 0)) + 1e-12
    lid = 1.0 / np.maximum(
        np.mean(np.log(d_sqrt[:, -1:] / d_sqrt[:, :-1]), axis=1), 1e-9
    )
    log(f"corpus hardness: LID(median)={np.median(lid):.1f} spread={spread}")

    rep_knobs = {
        k: v
        for k, v in (
            ("max_replicas", args.max_replicas),
            ("boundary_threshold", args.boundary_threshold),
            ("replica_overflow", args.replica_overflow),
            ("max_split_ways", args.max_split_ways),
            ("soar_lambda", args.soar_lambda),
        )
        if v is not None
    }
    cfg = Config.from_dict(
        {
            "clustering_params": {
                "distance_metric": args.metric,
                "initialization_method": "KMeans++",
                "initial_k": args.initial_k,
                "desired_cluster_size": args.cluster_size,
                "rng_seed": 42,
                **rep_knobs,
            },
            "output_path": "/tmp/spann_bench_idx",
            "storage_dtype": args.storage_dtype,
            "search": {"query_batch_size": args.batch,
                       "query_wire": args.query_wire},
        }
    )
    # Link weather BEFORE the timed region: every recorded number carries
    # the conditions it was measured under (the axon tunnel swings 50x
    # between windows — VERDICT r2 flagged the r2 capture as
    # weather-dominated and uninterpretable).
    from spfresh_tpu.utils.xfer import STATS, calibrate

    cal_pre = calibrate()
    log(f"tunnel (pre-build): {cal_pre}")
    mesh = args.mesh
    if mesh is not None and mesh != "auto":
        mesh = int(mesh)
    builder = SpannIndexBuilder(cfg, mesh=mesh)
    if builder.mesh is not None:
        log(f"mesh build over {builder.mesh.devices.size} devices")
    STATS.reset()
    t0 = time.perf_counter()
    index = builder.with_data(data).build(save=False)
    t_pack = time.perf_counter()
    view = index.padded_view()  # materialize the search view inside the clock
    jax.block_until_ready((view.vectors3d, view.ids2d))
    build_s = time.perf_counter() - t0
    build_xfer = STATS.total_s
    build_dev = build_s - build_xfer
    xfer_stats = STATS.as_dict()
    phases = dict(getattr(index, "build_profile", {}))
    phases["view_pack"] = round(time.perf_counter() - t_pack, 3)
    log(
        f"build: wall={build_s:.1f}s = transfers {build_xfer:.1f}s "
        f"({xfer_stats['h2d_mb']:.0f} MB h2d @ "
        f"{xfer_stats['h2d_mb'] / max(xfer_stats['h2d_s'], 1e-9):.0f} MB/s, "
        f"{xfer_stats['d2h_mb']:.0f} MB d2h) "
        f"+ device/host {build_dev:.1f}s"
    )
    log(
        f"build: clusters={index.num_clusters} "
        f"stored={index.num_vectors} (x{index.num_vectors / n:.2f})  "
        f"vectors/sec={n / build_s:,.0f}"
    )
    for name, secs in sorted(phases.items(), key=lambda kv: -kv[1]):
        log(f"  phase {name:<28s} {secs:8.2f}s")

    if os.environ.get("SPF_DEBUG_LIVE"):
        import gc

        import jax.numpy as jnp

        gc.collect()
        las = jax.live_arrays()
        tot = sum(a.nbytes for a in las)
        log(f"live device arrays: {len(las)}  total {tot / 2**30:.2f} GiB")
        for a in sorted(las, key=lambda a: -a.nbytes)[:12]:
            log(f"  {a.shape} {a.dtype} {a.nbytes / 2**20:.1f} MiB")
        ok = 0
        for gb in (1, 2, 4, 6, 8):
            try:
                x = jnp.zeros((gb << 28,), jnp.float32)
                x.block_until_ready()
                del x
                ok = gb
            except Exception:
                break
        log(f"free-HBM probe: largest transient alloc OK = {ok} GiB")
        jax.clear_caches()
        gc.collect()
        ok = 0
        for gb in (1, 2, 4, 6, 8):
            try:
                x = jnp.zeros((gb << 28,), jnp.float32)
                x.block_until_ready()
                del x
                ok = gb
            except Exception:
                break
        log(f"after clear_caches: largest transient alloc OK = {ok} GiB")

    # nprobe sweep to the target-recall point; QPS measured on the best
    # (lowest-nprobe) config that clears the target.
    best = None
    last = None
    for nprobe in (2, 4, 8, 16, 24, 32, 48, 64, 96, 128, 192, 256):
        if nprobe > index.num_clusters:
            break
        ids, _ = index.search(queries, args.k, nprobe=nprobe)  # warm (compile)
        dt = min(
            _timed(lambda: index.search(queries, args.k, nprobe=nprobe))
            for _ in range(3)  # best-of-3: the device tunnel adds ±40% jitter
        )
        rec = recall_at_k(ids, gt_i, args.k)
        qps = nq / dt
        log(f"nprobe={nprobe:4d} recall@{args.k}={rec:.4f} qps={qps:,.0f}")
        last = (nprobe, rec, qps)
        if rec >= args.target_recall:
            best = last
            break
    if best is None:
        # Recall plateaued below target inside the sweep (a corpus-hardness
        # statement, not an engine failure — full-probe exactness is a tested
        # invariant at tractable sizes; at 1M a full-probe pass would gather
        # the entire corpus per query batch).  Report the deepest sweep point
        # honestly; vs_baseline scales by the recall shortfall below.
        nprobe, rec, qps = last
        log(f"TARGET RECALL NOT REACHED: deepest sweep point "
            f"nprobe={nprobe} recall={rec:.4f}")
    else:
        nprobe, rec, qps = best

    # Steady-state QPS: best of 3 on a warm cache (tunnel jitter).
    if qps > 0:
        qps = nq / min(
            _timed(lambda: index.search(queries, args.k, nprobe=nprobe))
            for _ in range(3)
        )
    cal_post = calibrate()
    log(f"tunnel (post-sweep): {cal_post}")
    # Engine QPS: the serving wall through the tunnel pays a per-batch query
    # upload + result pull that direct-attached hardware would not.  Subtract
    # the link seconds implied by the measured post-sweep bandwidth (bytes
    # are exact: wire dtype x nq x dim up, k ids + dists down) to get the
    # weather-robust engine throughput — same decomposition as the build.
    wire_itemsize = {"bfloat16": 2, "int8": 1}.get(args.query_wire, 4)
    q_mb = nq * args.dim * wire_itemsize / 2**20
    out_mb = nq * args.k * (8 + 4) / 2**20
    link_s = (
        q_mb / max(cal_post["h2d_mbps"], 1e-9)
        + out_mb / max(cal_post["d2h_mbps"], 1e-9)
    )
    engine_s = max(nq / max(qps, 1e-9) - link_s, 1e-9)
    qps_engine = nq / engine_s
    # link_s covers the WHOLE query set; report the per-batch figure by
    # dividing by the number of wire batches (ADVICE r3: with nq > batch the
    # old log overstated ms/batch by nq/batch).
    n_batches = max(1, -(-nq // args.batch))
    link_ms_batch = link_s / n_batches * 1e3
    log(f"engine qps (wall minus {link_ms_batch:.0f} ms/batch x {n_batches} "
        f"batches measured link): {qps_engine:,.0f}")
    log(
        f"RESULT nprobe={nprobe} ({nprobe / index.num_clusters:.3%} of lists) "
        f"recall={rec:.4f} qps={qps:,.0f} "
        f"build={build_s:.1f}s (device/host {build_dev:.1f}s + link {build_xfer:.1f}s)"
    )

    print(
        json.dumps(
            {
                "metric": (
                    f"qps_per_chip_at_recall@{args.k}>={args.target_recall}"
                    f"_gauss{n // 1000}k_{args.dim}d"
                    + (f"_lat{L}" if L is not None else "")
                    + f"_{args.metric.lower()}"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                # Below-target recall scales the score by the shortfall so a
                # plateaued sweep can't report full credit.
                "vs_baseline": round(
                    qps / 10_000.0 * min(1.0, rec / args.target_recall), 3
                ),
                # Build decomposition (VERDICT r2 item 1): wall splits into
                # measured link seconds (bytes / current tunnel bandwidth,
                # both reported) and device/host engine seconds — the
                # weather-robust number the <60 s target judges.
                "recall": round(float(rec), 4),
                # Disambiguates the int8/bf16/f32 artifacts: the metric name
                # encodes only the corpus, so side-by-side storage-tier runs
                # are otherwise identical payloads.
                "storage_dtype": args.storage_dtype,
                "query_wire": args.query_wire or "float32",
                "qps_engine": round(qps_engine, 1),
                "query_link_ms_per_batch": round(link_ms_batch, 1),
                "query_link_ms_total": round(link_s * 1e3, 1),
                "nprobe": int(nprobe),
                # Which closure-pass engine actually ran: the Pallas route
                # marks itself unavailable on a real-Mosaic failure and the
                # build silently falls back to XLA — the artifact must say
                # which engine produced build_phases['fit/replica_pass'].
                "replica_engine": ",".join(
                    sorted(
                        k.rsplit(".", 1)[1]
                        for k in __import__(
                            "spfresh_tpu.utils.metrics",
                            fromlist=["snapshot"],
                        ).snapshot()
                        if k.startswith("build.replica_engine.")
                    )
                ) or "none",
                "clusters": int(index.num_clusters),
                "stored_x": round(index.num_vectors / n, 2),
                "build_wall_s": round(build_s, 1),
                "build_xfer_s": round(build_xfer, 1),
                "build_device_s": round(build_dev, 1),
                "build_xfer": xfer_stats,
                "build_phases": {
                    k2: v for k2, v in sorted(
                        phases.items(), key=lambda kv: -kv[1]
                    )
                },
                "tunnel_pre": cal_pre,
                "tunnel_post": cal_post,
            }
        )
    )


def _run_weatherproof():
    """Mid-run device failures must also yield ONE structured JSON line:
    the r4 Manhattan session step died with a raw traceback when a
    too-long dispatch tripped the tunnel's RPC deadline mid-build
    (UNAVAILABLE) — the same interpretability hole VERDICT r3 flagged for
    init-time deaths.  Init-time paths exit via _emit_error themselves;
    anything else that escapes main() lands here."""
    t0 = time.monotonic()
    try:
        main()
    except SystemExit:
        raise
    except KeyboardInterrupt:
        raise
    except BaseException as e:  # noqa: BLE001 — one artifact, then rc=2
        import traceback

        traceback.print_exc(file=sys.stderr)
        kind = (
            "device_error"
            if "jax" in type(e).__module__ or "Runtime" in type(e).__name__
            else "bench_crash"
        )
        _emit_error(
            kind, f"{type(e).__name__}: {e}", time.monotonic() - t0
        )


if __name__ == "__main__":
    _run_weatherproof()
