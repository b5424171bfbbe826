"""Weak-scaling probe for the staged Bloom FPR curve
(agg_bloom_fpr_curve): replicate the fixture member/probe key sets
into <mult> disjoint copies (id offsets — per-key hash independence
preserved, since the hash is md5 of the shifted key) and run the
EXACT staged code path in a fresh JVM.  Usage::

    python bloomfpr_scale.py <mult>

The claim under test is that Bloom FPR at fixed BITS-PER-KEY is
SCALE-FREE: the filter grows with the member set (m = bpk * n), so
fpr_ppm should stay in the same band from 1x to 100x while the bit
table and probe join grow linearly — the property that makes
bits-per-key the right sizing knob at 100 TB.

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
from tropology_spark.operators.aggregates import agg_bloom_fpr_curve  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("bloomfpr-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
copies = spark.range(mult).select(F.col("id").alias("cp"))
mem = iter_materialize(
    load(spark, sf, "orders")
    .select(F.col("o_custkey").alias("k"))
    .distinct()
    .crossJoin(F.broadcast(copies))
    .select((F.col("k") + F.col("cp") * 10_000_000).alias("k"))
    .repartition(64)
)
probes = iter_materialize(
    load(spark, sf, "customer")
    .select((F.col("c_custkey") + 1_000_000_000).alias("k"))
    .crossJoin(F.broadcast(copies))
    .select((F.col("k") + F.col("cp") * 10_000_000).alias("k"))
    .repartition(64)
)
n_m = mem.count()
n_p = probes.count()
t1 = time.time()
out = agg_bloom_fpr_curve(spark, sf, mem=mem, probes=probes).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "n_members": n_m,
            "n_probes": n_p,
            "build_sec": round(t1 - t0, 2),
            "curve_sec": round(t2 - t1, 2),
            "curve": [
                (r["bits_per_key"], r["n_fp"], r["fpr_ppm"]) for r in out
            ],
        }
    )
)
