"""Weak-scaling probe for the two-pass range-partitioned global rank
vs the single-partition window it replaced.
Usage: python rank_scale.py <mult> <impl: twopass|single>
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".."))

mult, impl = int(sys.argv[1]), sys.argv[2]

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.plans.global_order import global_row_number  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("rank-scale")
sf = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "lineitem").select(
    (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
    F.col("l_extendedprice").alias("p"),
)
n0 = base.count()
rep = base
for i in range(1, mult):
    rep = rep.unionAll(
        base.select((F.col("k") + F.lit(i * 100_000_000)).alias("k"), "p")
    )
df = iter_materialize(rep)
n = df.count()
t1 = time.time()
if impl == "twopass":
    ranked = global_row_number(df, ["p", "k"], out="rn")
    agg = ranked.agg(F.sum(F.col("rn") * (F.col("k") % 997)).alias("s")).collect()[0]["s"]
else:
    w = Window.orderBy("p", "k")
    ranked = df.withColumn("rn", F.row_number().over(w))
    agg = ranked.agg(F.sum(F.col("rn") * (F.col("k") % 997)).alias("s")).collect()[0]["s"]
t2 = time.time()
print(
    json.dumps(
        {
            "impl": impl,
            "mult": mult,
            "rows": n,
            "checksum": int(agg),
            "rank_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
        }
    )
)
spark.stop()
