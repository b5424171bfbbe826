"""Weak-scaling probe for the STAGED ts_dominant_period (round-17
slate): overlay-replicate the fixture events <mult> times onto the
SAME hours and run the EXACT staged path in a fresh JVM.  Usage::

    python domper_scale.py <mult>

Overlay invariants (exact, checked here): every hourly count scales by
mult, so num, dh and dt each scale by mult² and the fixed-point score
10⁹·num²/(dh·dt) is BIT-IDENTICAL — best_lag, m and score_ppb must not
move.  What scales is the claim under test: the detector's cost is
bounded by the TIME SPAN (the types × hours rollup), not the event
count — the PAA-audit argument on the correlation family.

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
from tropology_spark.operators.timeseries import ts_dominant_period  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("domper-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "events").select("event_type", "ts")
copies = spark.range(mult).select(F.col("id").alias("cp"))
ev = iter_materialize(
    base.crossJoin(F.broadcast(copies)).drop("cp").repartition(64)
)
n = ev.count()
t1 = time.time()
rows = ts_dominant_period(spark, sf, events=ev).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "n_events": n,
            "build_sec": round(t1 - t0, 2),
            "detect_sec": round(t2 - t1, 2),
            "result": sorted(
                (r["event_type"], r["best_lag"], r["m"], r["score_ppb"])
                for r in rows
            ),
        }
    )
)
