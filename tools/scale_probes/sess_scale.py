"""Weak-scaling probe for per-user windowed sessionization: replicate
sf0.1 events into <mult> disjoint user populations and run the EXACT
registered ts_sessionize chain.  Usage: python sess_scale.py <mult>
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.timeseries import ts_sessionize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("sess-scale")
sf = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "events").select("user_id", "event_id", "ts")
copies = spark.range(mult).select(F.col("id").alias("cp"))
ev = iter_materialize(
    base.crossJoin(F.broadcast(copies)).select(
        (F.col("user_id") + F.col("cp") * 1_000_000).alias("user_id"),
        (F.col("event_id") + F.col("cp") * 1_000_000_000).alias("event_id"),
        "ts",
    )
)
n = ev.count()
t1 = time.time()
out = ts_sessionize(spark, sf, events=ev).count()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "events": n,
            "sessions": out,
            "op_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
        }
    )
)
spark.stop()
