"""Weak-scaling probe for the registered join_feature_window (round-13
slate): replicate sf0.1 events into <mult> disjoint user populations
(per-user activity density preserved — join state per key constant,
keys grow with users) and run the EXACT registered bucketed band equi-join (activated round 13).
Usage: python featwin_scale.py <mult>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.relational import join_feature_window  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("featwin-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "events").select("event_id", "user_id", "ts", "event_type")
copies = spark.range(mult).select(F.col("id").alias("cp"))
ev = iter_materialize(
    base.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("cp") * 1_000_000_000).alias("event_id"),
        (F.col("user_id") + F.col("cp") * 10_000_000).alias("user_id"),
        "ts",
        "event_type",
    )
)
n = ev.count()
t1 = time.time()
out = join_feature_window(spark, sf, events=ev)
rows = out.count()
agg = out.agg(
    F.sum("n_views_24h").alias("sv"), F.sum("n_clicks_24h").alias("sc")
).collect()[0]
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "events": n,
            "purchases": rows,
            "sum_views": agg["sv"],
            "sum_clicks": agg["sc"],
            "op_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
        }
    )
)
spark.stop()
