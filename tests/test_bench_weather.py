"""bench.py must survive a dead TPU backend (VERDICT r3 weak-1).

Round 3's driver artifact was a raw traceback because `jax.devices()` had
no retry and no structured failure path.  These tests force a dead backend
in a subprocess and assert bench.py (a) retries with backoff, (b) emits
exactly one parseable JSON line on stdout with an `error` field, and
(c) still exits non-zero so the driver records the failure.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dead_bench(wait_s, lastgood_dirs=None):
    env = dict(os.environ)
    # Empty pool-IP list skips axon registration (a dead tunnel otherwise
    # hangs the interpreter at sitecustomize); JAX_PLATFORMS=tpu then makes
    # backend init raise RuntimeError on this CPU-only host.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "tpu"
    env["SPF_BENCH_BACKEND_WAIT_S"] = str(wait_s)
    if lastgood_dirs is not None:
        env["SPF_BENCH_LASTGOOD_DIRS"] = lastgood_dirs
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--small"],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=REPO,
    )


def test_dead_backend_emits_structured_error_and_nonzero_rc():
    res = _run_dead_bench(wait_s=12)
    assert res.returncode != 0
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {res.stdout!r}"
    payload = json.loads(lines[0])
    assert payload["error"] == "tpu_unavailable"
    assert payload["metric"] == "bench_error"
    assert payload["vs_baseline"] == 0.0
    assert payload["backend_wait_s"] >= 12
    # The retry loop must actually have run (>= 2 attempts inside 12 s) —
    # UNLESS a single probe attempt ate the whole budget, which happens on
    # this 1-core host whenever a TPU measurement session shares the core
    # (observed: attempt 1 alone took 17 s of the 12 s budget).  In that
    # case attempt 1's failure line carries "(elapsed/budget)" with
    # elapsed >= budget, and no retry is expected.
    assert "attempt 1 failed" in res.stderr
    if "attempt 2" not in res.stderr:
        import re

        m = re.search(r"\((\d+)/12s\)", res.stderr)
        assert m and int(m.group(1)) >= 12, (
            f"no retry AND attempt 1 finished inside the budget: "
            f"{res.stderr!r}"
        )
    else:
        assert "retry in" in res.stderr


def test_hung_backend_watchdog_emits_structured_error():
    """The OBSERVED dead-tunnel mode: backend init that HANGS instead of
    raising (a dead tunnel wedges `jax.devices()` indefinitely).  The
    in-process watchdog must turn that into the same one-line structured
    artifact + rc=2 instead of a silent process the driver has to kill."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        f"import sys, time; sys.path.insert(0, {REPO!r})\n"
        "import bench, jax\n"
        "bench._probe_backend_subprocess = lambda t: (True, '')\n"
        "jax.devices = lambda *a, **k: time.sleep(600)\n"
        "bench._await_backend(max_wait_s=4, hang_grace_s=4)\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    assert res.returncode == 2
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {res.stdout!r}"
    payload = json.loads(lines[0])
    assert payload["error"] == "tpu_unavailable"
    assert "hang" in payload["detail"]


def test_dead_backend_error_carries_last_good_session_run(tmp_path):
    """A tunnel dead at the DRIVER's capture time must not erase the
    round's evidence: when the measurement session produced a successful
    bench JSON earlier, the error payload embeds it (source + age kept,
    clearly separated from the live result)."""
    good = {
        "metric": "qps_per_chip_at_recall@10>=0.9_gauss1000k_128d_euclidean",
        "value": 25000.0, "unit": "qps", "vs_baseline": 2.5,
        "recall": 0.92, "nprobe": 8, "build_wall_s": 48.2,
        "build_device_s": 30.6,
    }
    (tmp_path / "bench_small.json").write_text(
        json.dumps({**good, "value": 1.0}) + "\n"
    )
    (tmp_path / "bench_1m.json").write_text(json.dumps(good) + "\n")
    (tmp_path / "bench_b2048.json").write_text("{ garbled")  # must be skipped
    res = _run_dead_bench(wait_s=8, lastgood_dirs=str(tmp_path))
    assert res.returncode != 0
    payload = json.loads(res.stdout.strip().splitlines()[-1])
    assert payload["error"] == "tpu_unavailable"
    lg = payload["last_good_run"]
    assert lg["source"].endswith("bench_1m.json")  # headline preferred
    assert lg["value"] == 25000.0 and lg["recall"] == 0.92
    assert lg["age_s"] >= 0
    # No session artifacts at all -> no last_good_run key (never fabricate).
    res2 = _run_dead_bench(wait_s=8, lastgood_dirs=str(tmp_path / "none"))
    payload2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert "last_good_run" not in payload2


def test_midrun_device_error_emits_structured_json():
    """Init-time deaths were weatherproofed in r4's first pass — then the
    session's Manhattan 1M step died MID-BUILD (a too-long dispatch
    tripped the tunnel's RPC deadline, UNAVAILABLE at readback) and left a
    raw traceback.  Any failure escaping main() must still produce the
    one-line structured artifact + rc=2."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import jax, bench\n"
        "import spfresh_tpu.utils.xfer as xfer\n"
        "def boom():\n"
        "    raise jax.errors.JaxRuntimeError(\n"
        "        'UNAVAILABLE: TPU device error')\n"
        "xfer.calibrate = boom\n"
        "sys.argv = ['bench.py', '--small', '--n', '512', '--nq', '16']\n"
        "bench._run_weatherproof()\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert res.returncode == 2, res.stderr[-1000:]
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {res.stdout!r}"
    payload = json.loads(lines[0])
    assert payload["error"] == "device_error"
    assert "UNAVAILABLE" in payload["detail"]
    # The full traceback still lands on stderr for the session log.
    assert "JaxRuntimeError" in res.stderr


def test_live_cpu_backend_passes_await(monkeypatch, capfd):
    # The retry helper returns immediately on a healthy backend.
    sys.path.insert(0, REPO)
    try:
        import bench

        # Budget must absorb one subprocess probe on a CONTENDED 1-core
        # host (jax import alone can take ~60 s there; with a fuzz
        # marathon + benchmarks sharing the core, one probe has been seen
        # to blow 240 s).  A healthy backend returns right after the first
        # probe regardless of the budget.
        devs = bench._await_backend(max_wait_s=600)
        assert len(devs) >= 1
        # ON THE FIRST ATTEMPT: a bare `import jax.extend.backend` in the
        # retry path once made `jax` function-local, so every attempt 1
        # raised UnboundLocalError, wasted a probe cycle, and ran
        # clear_backends() against a healthy (live-tunnel) backend.
        assert "attempt 1 failed" not in capfd.readouterr().err
    finally:
        sys.path.remove(REPO)
