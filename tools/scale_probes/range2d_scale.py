"""Weak-scaling probe for the staged 2-D grid band join
(join_range_2d_parts): replicate the fixture part table into <mult>
copies and run the EXACT staged code path in a fresh JVM.  Usage::

    python range2d_scale.py <mult> [disjoint|overlaid]

Two replication modes, probing different claims:

* ``disjoint`` (default): each copy's sizes shift by cp*200, so
  copies occupy disjoint grid rows — qualifying pairs grow ~linearly
  (weak scaling proper: per-unit wall should hold or fall).
* ``overlaid``: copies keep IDENTICAL (cents, size), only keys shift —
  every cross-copy pair in a band qualifies, so the TRUE result grows
  ~mult² (the quadratic-stress case: does the grid equi-join absorb a
  pair blowup the way the LSH band join absorbed 578x, or does
  candidate generation collapse to all-pairs).

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
from tropology_spark.operators.relational import join_range_2d_parts  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("range2d-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "part").select("p_partkey", "p_retailprice", "p_size")
copies = spark.range(mult).select(F.col("id").alias("cp"))
size_shift = F.col("cp") * 200 if mode == "disjoint" else F.lit(0)
parts = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("p_partkey") + F.col("cp") * 10_000_000).alias("p_partkey"),
        "p_retailprice",
        (F.col("p_size") + size_shift).alias("p_size"),
    )
    .repartition(64)
)
n = parts.count()
t1 = time.time()
out = join_range_2d_parts(spark, sf, parts=parts)
agg = out.agg(
    F.count(F.lit(1)).alias("n_parts"),
    F.sum("n_neighbors").alias("n_pairs_directed"),
).collect()[0]
t2 = time.time()
print(
    json.dumps(
        {
            "mode": mode,
            "mult": mult,
            "parts": n,
            "out_parts": agg["n_parts"],
            "directed_pairs": agg["n_pairs_directed"],
            "op_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
        }
    )
)
