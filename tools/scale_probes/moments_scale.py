"""Weak-scaling probe for the REGISTERED agg_higher_moments_terms
(M327): replicate the fixture lineitem (returnflag, quantity) stream
into <mult> copies and run the EXACT registered one-pass power-sum
path in a fresh JVM.  Usage::

    python moments_scale.py <mult>

Replication invariants (exact, checked here): per return flag the
power sums n, s1..s4 scale by mult BIT-EXACTLY (replication adds
identical rows — the map-side-combinable mergeable-statistic claim),
and each central carrier drifts from mult x its base value by less
than mult (floor arithmetic: floor(mult*a/b) is within mult-1 of
mult*floor(a/b)).  What scales is the claim under test: the whole
operator is ONE map-side-combinable aggregate over a 2-column
projection, so per-unit cost must FALL with mult.

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
from tropology_spark.operators.aggregates import agg_higher_moments_terms  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("moments-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "lineitem").select("l_returnflag", "l_quantity")
base_rows = {
    r["l_returnflag"]: r
    for r in agg_higher_moments_terms(spark, sf).collect()
}
copies = spark.range(mult).select(F.col("id").alias("cp"))
li = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select("l_returnflag", "l_quantity")
    .repartition(64)
)
n = li.count()
t1 = time.time()
rows = agg_higher_moments_terms(spark, sf, li=li).collect()
t2 = time.time()
ok = True
for r in rows:
    b = base_rows[r["l_returnflag"]]
    for c in ("n", "s1", "s2", "s3", "s4"):
        if r[c] != mult * b[c]:
            ok = False
    for c in ("m2c", "m3c", "m4c"):
        if abs(r[c] - mult * b[c]) >= mult:
            ok = False
print(
    json.dumps(
        {
            "mult": mult,
            "rows_in": n,
            "build_sec": round(t1 - t0, 2),
            "moments_sec": round(t2 - t1, 2),
            "power_sums_exact_and_carriers_bounded": ok,
        }
    )
)
spark.stop()
