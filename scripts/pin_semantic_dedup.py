"""Pin semantic_dedup at local[32] (VERDICT r12 #1).

BENCH_r12's official artifact carried a 23.249 s warm value for
semantic_dedup — 17% of the suite — while every secondary reading
(driver's own 8-core run 2.004 s, two committed 32-core runs 1.9-2.1 s,
fresh-JVM isolated budget 1.87 s, the gate's own ambient adjudication)
says ~2 s. This script collects >= N fresh-JVM repetitions on the
current HEAD at local[32]: each rep is its own subprocess (fresh JVM,
bench-identical warmups via scripts/isolate_bench.py --one), cold + 3
warm runs, sentinel recorded. Output committed to
docs/semantic_dedup_pin_r13.json.

If any rep reproduces >= 10 s the anomaly is real and must be bisected
(the eager assignment checkpoint at operators/similarity.py:388 and the
KMeans fit under oversubscription are the suspects); otherwise the 23 s
reading is pinned as a one-off host event.

Usage: python scripts/pin_semantic_dedup.py [n_reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    iso = os.path.join(REPO, "scripts", "isolate_bench.py")
    reps = []
    for i in range(n_reps):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, iso, "--one", "semantic_dedup", "--reps", "3"],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "SPARK_GRAFT_CPUS": "32"},
        )
        line = (p.stdout.strip().splitlines() or [""])[-1]
        try:
            rep = json.loads(line)
        except ValueError:
            rep = {"error": p.stderr[-500:]}
        rep["wall"] = round(time.time() - t0, 1)
        reps.append(rep)
        print(f"rep {i + 1}/{n_reps}: {rep.get('warm_runs', 'ERR')} "
              f"cold={rep.get('cold')} sentinel={rep.get('sentinel')}",
              file=sys.stderr)
    warms = [w for r in reps for w in r.get("warm_runs", [])]
    colds = [r["cold"] for r in reps if "cold" in r]
    out = {
        "query": "semantic_dedup",
        "cpus": 32,
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR",
                                 "/root/testdata/sf0.1"),
        "ts": int(time.time()),
        "n_jvms": n_reps,
        "reps": reps,
        "warm_all": sorted(warms),
        "warm_median": sorted(warms)[len(warms) // 2] if warms else None,
        "warm_max": max(warms) if warms else None,
        "cold_max": max(colds) if colds else None,
        "anomaly_reproduced": bool(warms) and max(warms) >= 10.0,
    }
    path = os.path.join(REPO, "docs", "semantic_dedup_pin_r13.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("warm_median", "warm_max", "cold_max",
                       "anomaly_reproduced")}))


if __name__ == "__main__":
    main()
