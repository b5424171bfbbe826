"""Span-bounded-cost probe for the staged Theil-Sen slope
(ts_theilsen_micro): OVERLAY the fixture events <mult> times within
the SAME time span and run the EXACT staged code path in a fresh JVM.
Usage::

    python theilsen_scale.py <mult>

Overlaying multiplies every hourly count by mult but leaves the hourly
SUPPORT unchanged, so the pairwise-slope join processes the SAME pair
count at every mult — the docstring's "bounded by the time span, not
the event count" claim, falsifiable here.  The slopes themselves scale
exactly ×mult (Δn ×mult at fixed Δh ⇒ micro-slope ×mult up to the
floor), a structural self-check the probe prints alongside the wall
time.

Fixture dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.timeseries import ts_theilsen_micro  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("theilsen-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "events").select("event_type", "ts")
copies = spark.range(mult).select(F.col("id").alias("cp"))
ev = iter_materialize(
    base.crossJoin(F.broadcast(copies)).drop("cp").repartition(64)
)
n = ev.count()
t1 = time.time()
out = sorted(
    (r["event_type"], r["n_pairs"], r["slope_micro"])
    for r in ts_theilsen_micro(spark, sf, events=ev).collect()
)
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "n_events": n,
            "build_sec": round(t1 - t0, 2),
            "slope_sec": round(t2 - t1, 2),
            "rows": out,
        }
    )
)
