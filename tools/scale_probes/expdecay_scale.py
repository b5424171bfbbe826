"""Weak-scaling probe for agg_exp_decay_counts (M297): replicate the
fixture events into <mult> disjoint copies (event/user ids offset,
timestamps UNCHANGED so the day axis — and therefore every row's age
and dyadic weight — is preserved) and run the EXACT registered code
path in a fresh JVM.  Usage::

    python expdecay_scale.py <mult>

The claim under test: the decayed mass is a plain map-side-combinable
SUM over per-row weights (each row's weight depends only on its own
age), so per-unit wall should hold or FALL with scale — the property
that makes dyadic decay deployable where float exp() scores would
need a renormalization pass.  Fixture dir from $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.operators.aggregates import agg_exp_decay_counts  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("expdecay-scale")
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
rows = agg_exp_decay_counts(spark, sf, events=ev).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "events": n,
            "n_types": len(rows),
            "decayed_total": sum(r["decayed_x4096"] for r in rows),
            "build_sec": round(t1 - t0, 2),
            "op_sec": round(t2 - t1, 2),
        }
    )
)
