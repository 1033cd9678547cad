"""r12 scratch: run named queries and dump sorted results to JSON for
old-vs-new equivalence comparison. Usage:
    python scripts/r12_compare.py <out.json> <sf_dir> <query> [query...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taar_gcp_etl_spark.queries import SPARK_QUERIES  # noqa: E402
from taar_gcp_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = get_spark("r12_compare")
    out = {}
    for name in names:
        df = SPARK_QUERIES[name](spark, sf_dir)
        rows = sorted(
            tuple(None if v is None else v for v in r)
            for r in df.collect()
        )
        out[name] = {"schema": df.schema.simpleString(), "rows": rows}
        print(f"{name}: {len(rows)} rows", flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, default=str)
    spark.stop()


if __name__ == "__main__":
    main()
