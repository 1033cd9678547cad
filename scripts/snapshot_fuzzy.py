"""Snapshot / verify fuzzy-join results for the r13 candidate-pipeline
restructure (VERDICT r12 #2).

`snapshot` materializes q_fuzzy_join and q_fuzzy_join_adaptive outputs
to parquet under /tmp/fuzzy_snap_<sfname>/ BEFORE the code change;
`check` re-runs both queries on the CURRENT code and proves exceptAll
parity both ways against the snapshot — the results-identical evidence
for the restructured candidate pipeline.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/snapshot_fuzzy.py snapshot
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/snapshot_fuzzy.py check
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["fuzzy_join", "fuzzy_join_adaptive"]


def main() -> None:
    mode = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"/tmp/fuzzy_snap_{tag}"
    from taar_gcp_etl_spark.queries import SPARK_QUERIES
    from taar_gcp_etl_spark.session import get_spark

    spark = get_spark(app_name=f"fuzzy-{mode}")
    out = {}
    for name in QUERIES:
        df = SPARK_QUERIES[name](spark, sf_dir)
        path = os.path.join(base, name)
        if mode == "snapshot":
            df.write.mode("overwrite").parquet(path)
            out[name] = spark.read.parquet(path).count()
        else:
            snap = spark.read.parquet(path)
            extra = df.exceptAll(snap).count()
            missing = snap.exceptAll(df).count()
            out[name] = {
                "rows_now": df.count(),
                "rows_snap": snap.count(),
                "extra_vs_snapshot": extra,
                "missing_vs_snapshot": missing,
                "identical": extra == 0 and missing == 0,
            }
    print(json.dumps({"mode": mode, "sf_dir": sf_dir, "result": out}))
    spark.stop()


if __name__ == "__main__":
    main()
