"""Weak-scaling probe for the round-8 event operators: replicate the
fixture events into <mult> disjoint user populations (the sess_scale
replication — user/event ids offset per copy, timestamps unchanged so
the hour axis and per-user activity RATE are preserved) and run the
EXACT registered code paths.  Usage::

    python events_scale.py <mult> <op>

``op``: asof (join_asof_tolerance — bucketed bounded as-of) |
sliding (ts_sliding_distinct — hour-offset-explode distinct).
Fixture dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".."))

mult, op = int(sys.argv[1]), sys.argv[2]

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.relational import join_asof_tolerance  # noqa: E402
from tropology_spark.operators.timeseries import ts_sliding_distinct  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("events-scale")
sf = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "events").select("event_id", "user_id", "event_type", "ts")
copies = spark.range(mult).select(F.col("id").alias("cp"))
# The base fixture is one parquet file; without a repartition the
# replicated frame materializes as ONE multi-GiB block at 1000x.
ev = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("event_id") + F.col("cp") * 1_000_000_000).alias("event_id"),
        (F.col("user_id") + F.col("cp") * 1_000_000).alias("user_id"),
        "event_type",
        "ts",
    )
    .repartition(64)
)
n = ev.count()
t1 = time.time()
if op == "asof":
    out = join_asof_tolerance(spark, sf, events=ev).count()
else:
    out = ts_sliding_distinct(spark, sf, events=ev).count()
t2 = time.time()
print(
    json.dumps(
        {
            "op": op,
            "mult": mult,
            "events": n,
            "out_rows": out,
            "op_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
        }
    )
)
spark.stop()
