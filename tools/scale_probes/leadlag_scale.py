"""Weak-scaling probe for ts_leadlag_matrix (M338): replicate the
event stream into <mult> copies and run the EXACT registered code
path in a fresh JVM.  Usage::

    python leadlag_scale.py <mult> [overlaid|span]

* ``overlaid`` (default): copies share the time axis (event_id
  offsets only) — hourly counts grow x mult while the (types x
  hours) zero-filled table keeps its SIZE, so every co-moment scales
  by mult² and every score_ppb/best_lag is BIT-IDENTICAL to the 1x
  run (the cross-correlation is scale-free).  The claim under test
  is the histogram-collapse discipline: the lag join touches the
  O(types x hours) rollup, never the events.
* ``span``: copy k shifts time by k x the fixture span — the HOUR
  axis grows x mult (the lag join's table-size stress case; each
  copy repeats the same profile, so scores stay in [0, 10^9] and the
  wall measures the x mult spine).

Fixture dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])
mode = sys.argv[2] if len(sys.argv) > 2 else "overlaid"

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.operators.timeseries import ts_leadlag_matrix  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("leadlag-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "events")
span_us = base.agg(
    (F.max(F.expr("unix_micros(ts)")) - F.min(F.expr("unix_micros(ts)")) + 3_600_000_000)
).collect()[0][0]
copies = spark.range(mult).select(F.col("id").alias("cp"))
ts_col = (
    F.expr(f"timestamp_micros(unix_micros(ts) + cp * {span_us})")
    if mode == "span"
    else F.col("ts")
)
ev = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("event_id") + F.col("cp") * 1_000_000_000).alias("event_id"),
        "user_id",
        ts_col.alias("ts"),
        "event_type",
    )
    .repartition(64)
)
n = ev.count()
t1 = time.time()
rows = ts_leadlag_matrix(spark, sf, events=ev).collect()
t2 = time.time()
out = sorted(
    (r["type_x"], r["type_y"], r["best_lag"], r["score_ppb"]) for r in rows
)
print(
    json.dumps(
        {
            "mult": mult,
            "mode": mode,
            "n_events": n,
            "n_pairs": len(out),
            "first3": [list(r) for r in out[:3]],
            "build_sec": round(t1 - t0, 2),
            "op_sec": round(t2 - t1, 2),
        }
    )
)
