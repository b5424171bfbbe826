"""Weak-scaling probe for the streaming batch twins (VERDICT r10 item
6 — the last multi-second family without a measured ladder): replicate
sf0.1 events into <mult> structure-preserving copies and run the EXACT
registered code path.

Usage: python streaming_scale.py <mult> <topk|ssjoin>

* ``topk``  — stream_window_topk_1h (M124 twin).  Copies offset
  event_id only: the (window x type) state axis stays FIXED while
  per-group counts grow x mult — the streaming state-size story (state
  is bounded by windows x types, independent of event volume; only the
  map-side-combined partial counts grow).
* ``ssjoin`` — stream_interval_join (K8 twin).  Copies offset user_id
  AND event_id into disjoint user populations: per-user click/purchase
  density is preserved, so join state per key is constant and matched
  pairs grow exactly x mult — the stream-stream join contract (state
  per key bounded by lookback x rate, keys grow with users).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])
op = sys.argv[2]

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.streaming.jobs import (  # noqa: E402
    stream_interval_join,
    stream_window_topk_1h,
)
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("streaming-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "events").select("event_id", "user_id", "ts", "event_type")
copies = spark.range(mult).select(F.col("id").alias("cp"))
uid = (
    (F.col("user_id") + F.col("cp") * 10_000_000).alias("user_id")
    if op == "ssjoin"
    else F.col("user_id")
)
ev = iter_materialize(
    base.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("cp") * 1_000_000_000).alias("event_id"),
        uid,
        "ts",
        "event_type",
    )
)
n = ev.count()
t1 = time.time()
fn = stream_window_topk_1h if op == "topk" else stream_interval_join
out = fn(spark, sf, events=ev).count()
t2 = time.time()
print(
    json.dumps(
        {
            "op": op,
            "mult": mult,
            "events": n,
            "rows_out": out,
            "op_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
        }
    )
)
spark.stop()
