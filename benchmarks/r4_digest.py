"""Digest /tmp/r4_tpu session artifacts into one comparison table.

Run any time; prints whatever has landed so far (the session's .ok markers
tell which steps completed cleanly).  Usage:
    python benchmarks/r4_digest.py [--dir /tmp/r4_tpu]
"""

import argparse
import glob
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/r4_tpu")
    args = ap.parse_args()
    d = args.dir
    oks = {os.path.basename(p)[:-3] for p in glob.glob(os.path.join(d, "*.ok"))}
    rows = []
    for p in sorted(glob.glob(os.path.join(d, "*.json"))):
        name = os.path.basename(p)[:-5]
        try:
            with open(p) as f:
                j = json.loads(f.read().strip().splitlines()[-1])
        except Exception as e:  # noqa: BLE001
            rows.append((name, f"UNPARSEABLE ({e})"))
            continue
        if "error" in j:
            rows.append((name, f"ERROR {j['error']}"))
            continue
        qps = j.get("value")
        rec = j.get("recall")
        b = j.get("build_wall_s")
        bd = j.get("build_device_s")
        npb = j.get("nprobe")
        summ = []
        if qps is not None:
            summ.append(f"qps={qps:,.0f}")
        if rec is not None:
            summ.append(f"recall={rec}")
        if npb is not None:
            summ.append(f"nprobe={npb}")
        if b is not None:
            summ.append(f"build={b}s (dev/host {bd}s)")
        for k in ("peak_rss_gib", "clusters", "stored_x", "qps_engine"):
            if k in j:
                summ.append(f"{k}={j[k]}")
        if "search" in j:  # out-of-core harness rows
            summ.append("search=" + "; ".join(
                f"np{r['nprobe']}:r{r['recall']}@{r['qps']}qps"
                for r in j["search"]
            ))
        mark = "ok " if name in oks else "?  "
        rows.append((name, mark + "  ".join(summ)))
    if not rows:
        print(f"no artifacts in {d}")
        return
    w = max(len(n) for n, _ in rows)
    for n, s in rows:
        print(f"{n:<{w}}  {s}")
    # phase profiles for the build pairs, if present
    for name in ("bench_1m", "bench_1m_noresident", "bench_1m_int8"):
        p = os.path.join(d, f"{name}.json")
        if os.path.exists(p):
            try:
                with open(p) as f:
                    j = json.loads(f.read().strip().splitlines()[-1])
                ph = j.get("build_phases") or {}
                top = sorted(ph.items(), key=lambda kv: -kv[1])[:6]
                print(f"\n{name} top phases: "
                      + ", ".join(f"{k}={v}s" for k, v in top))
            except Exception:  # noqa: BLE001
                pass


if __name__ == "__main__":
    main()
