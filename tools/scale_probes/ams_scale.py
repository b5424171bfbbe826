"""Weak-scaling probe for the staged AMS F2 sketch audit
(agg_ams_f2): replicate the fixture lineitem key stream into <mult>
copies and run the EXACT staged code path in a fresh JVM.  Usage::

    python ams_scale.py <mult> [disjoint|overlaid]

disjoint (default): copy cp shifts l_partkey by cp*10_000_000 — weak
scaling proper (every copy is an independent key population; exact F2
and every counter grow additively, the map-side-combine claim under
test is the 8-partial-sums-per-partition merge).

overlaid: copies keep the SAME keys — each c_v multiplies by mult, so
exact F2 grows ×mult² and each counter ×mult (est ×mult²): the ppm
ratios are INVARIANT, a structural self-check the probe asserts.

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

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.aggregates import agg_ams_f2  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("ams-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "lineitem").select("l_partkey")
copies = spark.range(mult).select(F.col("id").alias("cp"))
shift = F.lit(0) if mode == "overlaid" else F.col("cp") * 10_000_000
li = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select((F.col("l_partkey") + shift).cast("bigint").alias("l_partkey"))
    .repartition(64)
)
n = li.count()
t1 = time.time()
out = sorted(
    (r["sketch_id"], r["counter"], r["est"], r["f2_exact"], r["ratio_ppm"])
    for r in agg_ams_f2(spark, sf, li=li).collect()
)
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "mode": mode,
            "n_rows": n,
            "build_sec": round(t1 - t0, 2),
            "sketch_sec": round(t2 - t1, 2),
            "rows": out,
        }
    )
)
