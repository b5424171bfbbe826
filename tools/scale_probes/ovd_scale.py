"""Weak-scaling probe for join_session_overlap_duration (M345):
replicate the event stream into <mult> copies and run the EXACT
registered code path in a fresh JVM.  Usage::

    python ovd_scale.py <mult> [disjoint|overlaid]

* ``disjoint`` (default): copy k shifts users by k * 10^9 AND time by
  k * 10 years — sessions, buckets and pairs all grow exactly x mult
  (structure-preserving weak scaling; the top-20 values are identical
  per copy, so the result set is bit-stable).
* ``overlaid``: copy k shifts only the USERS — every copy shares the
  time axis, so per-bucket concurrency grows x mult and the candidate
  pair mass grows ~x mult² (the stress case: the claim under test is
  that the 1-hour bucket equi-join + DISTINCT absorbs a quadratic
  pair blowup without a BNLJ, the M238/LSH-band discipline).

Fixture dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])
mode = sys.argv[2] if len(sys.argv) > 2 else "disjoint"

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.operators.relational import join_session_overlap_duration  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

TEN_YEARS_US = 10 * 365 * 24 * 3_600 * 1_000_000

t0 = time.time()
spark = get_spark("ovd-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "events")
copies = spark.range(mult).select(F.col("id").alias("cp"))
ts_col = (
    F.expr(f"timestamp_micros(unix_micros(ts) + cp * {TEN_YEARS_US})")
    if mode == "disjoint"
    else F.col("ts")
)
ev = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("event_id") + F.col("cp") * 1_000_000_000).alias("event_id"),
        (F.col("user_id") + F.col("cp") * 1_000_000_000).alias("user_id"),
        ts_col.alias("ts"),
        "event_type",
    )
    .repartition(64)
)
n = ev.count()
t1 = time.time()
rows = join_session_overlap_duration(spark, sf, events=ev).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "mode": mode,
            "n_events": n,
            "top1": {
                "user_a": rows[0]["user_a"],
                "user_b": rows[0]["user_b"],
                "n_overlaps": rows[0]["n_overlaps"],
                "total_ovl_us": rows[0]["total_ovl_us"],
            }
            if rows
            else None,
            "n_rows": len(rows),
            "build_sec": round(t1 - t0, 2),
            "op_sec": round(t2 - t1, 2),
        }
    )
)
