"""Weak-scaling probe for ts_hurst_rs_terms (M300): overlay-replicate
the fixture events (<mult> copies, ids offset, timestamps UNCHANGED —
same hour axis, x mult per-hour counts) and run the EXACT registered
code path in a fresh JVM.  Usage::

    python hurst_scale.py <mult>

The claim under test is the docstring's scale discipline: events
collapse map-side to the bounded O(hours) table BEFORE the spine,
window cut and deviation windows, so 100x event density leaves the
wall flat (the domper/PAA span-bounded argument on the R/S family).
Structure self-check: overlay replication multiplies every x by mult,
so sum_x and sum_r_xw scale x mult exactly and sum_s2num x mult**2 —
printed for verification.  Fixture dir from $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.operators.timeseries import ts_hurst_rs_terms  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("hurst-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "events").select("event_id", "user_id", "event_type", "ts")
copies = spark.range(mult).select(F.col("id").alias("cp"))
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
rows = {r["w"]: r for r in ts_hurst_rs_terms(spark, sf, events=ev).collect()}
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "events": n,
            "w8": {
                "n_windows": rows[8]["n_windows"],
                "sum_x": rows[8]["sum_x"],
                "sum_r_xw": rows[8]["sum_r_xw"],
                "sum_s2num": rows[8]["sum_s2num"],
            },
            "build_sec": round(t1 - t0, 2),
            "op_sec": round(t2 - t1, 2),
        }
    )
)
