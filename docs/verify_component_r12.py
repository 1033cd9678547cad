import sys, time
sys.path.insert(0, "/root/repo")
from taar_gcp_etl_spark.session import get_spark
from taar_gcp_etl_spark.queries import _wide
from pyspark.sql import functions as F
import taar_gcp_etl_spark.operators.joins as J

spark = get_spark("verify_component", cpus="32")
sf = "/root/repo/.soak/sf1"
cust = _wide(spark, sf, "customer")
d = 2
base, idx_keys, probe_keys = J._segment_base(
    cust, "c_name", "c_custkey", ["c_nationkey", "c_mktsegment"], True, d)
cand = J._even_candidates(base, idx_keys, probe_keys,
                          ["c_nationkey", "c_mktsegment"])
texts = base.select("_id", F.col("_orig").alias("_t"), "_len")
pairs = (cand
    .join(texts.select(F.col("_id").alias("id_a"), F.col("_t").alias("_t_a"),
                       F.col("_len").alias("_l_a")), "id_a")
    .join(texts.select(F.col("_id").alias("id_b"), F.col("_t").alias("_t_b"),
                       F.col("_len").alias("_l_b")), "id_b")
    .filter(F.abs(F.col("_l_a") - F.col("_l_b")) <= d)
).localCheckpoint()
n = pairs.count()
print("candidate pairs:", n)

old = F.levenshtein(F.col("_t_a"), F.col("_t_b"))
new = F.levenshtein(F.col("_t_a"), F.col("_t_b"), d)

def t(expr, pred, tag):
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        (pairs.filter(pred).select("id_a", "id_b", expr.cast("int").alias("dist"))
              .write.mode("overwrite").format("noop").save())
        runs.append(round(time.perf_counter() - t0, 3))
    print(tag, runs, "median", sorted(runs)[2])

for rnd in range(2):
    t(old, old <= d, f"r{rnd} OLD unbounded")
    t(new, new >= 0, f"r{rnd} NEW bounded  ")
# result equality on the full pair set
a = pairs.filter(old <= d).select("id_a","id_b",old.cast("int").alias("dist"))
b = pairs.filter(new >= 0).select("id_a","id_b",new.cast("int").alias("dist"))
print("exceptAll both ways empty:",
      a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0,
      "rows:", a.count())
