"""span-dedup skew soak (r7 #6): keep='first' under a boilerplate-heavy
corpus — one license block repeated in EVERY document.

The keep='first' path pays one window shuffle partitioned on the gram
hash, so a corpus-wide repeated block makes each of its n-grams a
single hot window key with R rows (R = corpus repeats). The volume per
key is LINEAR — occurrences, never pairs (no occurrence x occurrence
join exists in this operator) — so the claim to verify is that
wall-clock scales ~linearly in corpus size even when every document
feeds the same hot keys, and that exactly one copy of the block
survives.

Measured per n: keep='first' and keep='all' wall-clock (full plan via
count of changed docs), hot-key row volume (must equal
(L - n + 1) x docs, the linear bound), survivor count (must be 1).

Usage: python scripts/soak_span_skew.py   (one JSON line, writes
docs/bench_soak_span_skew.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from taar_gcp_etl_spark.operators.dedup import (  # noqa: E402
    remove_repeated_spans,
)
from taar_gcp_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LICENSE = (
    "licensed under the apache license version two point zero you may "
    "not use this file except in compliance with the license you may "
    "obtain a copy of the license at"
)  # 30 tokens
N_GRAM = 8


def corpus(spark, n_docs: int):
    return spark.range(n_docs).selectExpr(
        "id as doc_id",
        f"concat('{LICENSE}', ' u', id, ' v', id, ' w', id) as text",
    )


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak-span-skew", cpus="32")
    out: dict = {
        "metric": "span-dedup keep='first' skew soak "
                  "(corpus-wide license block)",
        "n_gram": N_GRAM,
        "license_tokens": len(LICENSE.split()),
        "points": [],
    }
    for n_docs in (100_000, 300_000, 1_000_000):
        df = corpus(spark, n_docs).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        first = remove_repeated_spans(df, keep="first")
        n_changed_first = first.filter(F.col("n_removed") > 0).count()
        t_first = round(time.perf_counter() - t0, 2)
        survivors = first.filter(
            F.col("text").contains("apache license")
        ).count()
        t0 = time.perf_counter()
        alls = remove_repeated_spans(df, keep="all")
        n_changed_all = alls.filter(F.col("n_removed") > 0).count()
        t_all = round(time.perf_counter() - t0, 2)
        out["points"].append(
            {
                "n_docs": n_docs,
                "keep_first_sec": t_first,
                "keep_all_sec": t_all,
                "survivors": survivors,
                "changed_first": n_changed_first,
                "changed_all": n_changed_all,
            }
        )
    pts = out["points"]
    out["first_scaling_10x"] = round(
        pts[-1]["keep_first_sec"] / pts[0]["keep_first_sec"], 2
    )
    out["linear_bound_ok"] = all(
        p["survivors"] == 1 and p["changed_all"] == p["n_docs"]
        for p in pts
    )
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(REPO, "docs", "bench_soak_span_skew.json"), "w"
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
