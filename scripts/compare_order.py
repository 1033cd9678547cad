"""Suite-order-tax analysis (round 11, VERDICT r10 #1): compare two
experiment-mode bench runs (SPARK_GRAFT_OUT=...) of the same tree, one
in registry order and one reversed, and report whether a query's warm
value depends on its POSITION in the 134-query single-JVM session
(codegen-cache growth, heap aging) rather than on its plan.

For each query: position_fwd, position_rev (134-1-position_fwd),
warm_fwd, warm_rev, ratio. If late position taxes queries, ratio
correlates with position: early-forward queries run SLOWER reversed
(they're late there) and vice versa. Reports the Pearson correlation
of log(warm_rev/warm_fwd) against (pos_rev - pos_fwd), plus the
per-decile mean ratio.

Usage: python scripts/compare_order.py fwd.json rev.json
"""

from __future__ import annotations

import json
import math
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from taar_gcp_etl_spark.queries import SPARK_QUERIES  # noqa: E402


def main() -> None:
    fwd = json.load(open(sys.argv[1]))
    rev = json.load(open(sys.argv[2]))
    names = list(SPARK_QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    n = len(names)
    rows = []
    for q in names:
        a, b = fwd["queries"].get(q), rev["queries"].get(q)
        if not a or not b or max(a, b) < 0.2:
            continue  # sub-200ms timings are scheduler noise
        dpos = (n - 1 - pos[q]) - pos[q]  # pos_rev - pos_fwd
        rows.append((q, pos[q], a, b, math.log(b / a), dpos))
    # Pearson r of log-ratio vs position delta
    xs = [r[5] for r in rows]
    ys = [r[4] for r in rows]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    vy = math.sqrt(sum((y - my) ** 2 for y in ys))
    r = cov / (vx * vy) if vx and vy else 0.0
    print(json.dumps({
        "n_compared": len(rows),
        "warm_fwd": fwd["value"], "warm_rev": rev["value"],
        "sentinel_fwd": fwd.get("sentinel"),
        "sentinel_rev": rev.get("sentinel"),
        "pearson_logratio_vs_dpos": round(r, 4),
    }))
    # per-position-decile mean ratio (reversed/forward)
    rows.sort(key=lambda t: t[1])
    dec = max(1, len(rows) // 10)
    for i in range(0, len(rows), dec):
        chunk = rows[i:i + dec]
        mean = sum(math.exp(c[4]) for c in chunk) / len(chunk)
        print(f"fwd-pos {chunk[0][1]:3}-{chunk[-1][1]:3}: "
              f"rev/fwd mean ratio {mean:0.3f}  "
              f"({', '.join(c[0] for c in chunk[:3])}...)")
    worst = sorted(rows, key=lambda t: -abs(t[4]))[:10]
    print("largest order-dependent swings:")
    for q, p, a, b, lr, _ in worst:
        print(f"  {q:24} fwd@{p:3} {a:7.2f}s  rev@{len(names)-1-p:3} "
              f"{b:7.2f}s  ratio {math.exp(lr):0.2f}")


if __name__ == "__main__":
    main()
