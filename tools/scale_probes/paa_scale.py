"""Weak-scaling probe for the staged PAA lower-bound audit
(ts_paa_lb_audit): replicate the fixture events into <mult> copies in
one of two modes and run the EXACT staged code path in a fresh JVM.
Usage::

    python paa_scale.py <mult> [overlay|span]

- overlay (default): all copies land on the SAME days (event_id
  offsets only) — the day-pair set is CONSTANT while per-hour counts
  scale ×mult, so the audit's wall should stay ~flat: the claim under
  test is that cost is bounded by the TIME SPAN (types × days × 24),
  never the event count.
- span: copy cp shifts timestamps by cp·90 days — disjoint day
  ranges, so the pair set grows ×mult (weak scaling proper).

Fixture dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])
mode = sys.argv[2] if len(sys.argv) > 2 else "overlay"

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.timeseries import ts_paa_lb_audit  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("paa-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "events").select("event_id", "user_id", "ts", "event_type")
copies = spark.range(mult).select(F.col("id").alias("cp"))
shift = (
    F.expr("timestampadd(DAY, CAST(cp * 90 AS INT), ts)")
    if mode == "span"
    else F.col("ts")
)
ev = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("event_id") + F.col("cp") * 100_000_000).alias("event_id"),
        "user_id",
        shift.alias("ts"),
        "event_type",
    )
    .repartition(64)
)
n = ev.count()
t1 = time.time()
out = ts_paa_lb_audit(spark, sf, events=ev).collect()
t2 = time.time()
viol = sum(1 for r in out if r["lb3"] > r["true3"])
print(
    json.dumps(
        {
            "mult": mult,
            "mode": mode,
            "n_events": n,
            "n_pairs": len(out),
            "lb_violations": viol,
            "build_sec": round(t1 - t0, 2),
            "audit_sec": round(t2 - t1, 2),
        }
    )
)
