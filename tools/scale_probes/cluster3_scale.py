"""Weak-scaling probe for the staged 3-round min-label clustering
(dedup_cluster3): replicate the fixture document table into <mult>
disjoint copies and run the EXACT staged code path (MinHash bands →
LSH candidate join → 3 checkpointed label rounds) in a fresh JVM.
Usage::

    python cluster3_scale.py <mult>

Copies keep identical text with doc_id offsets, so the candidate
graph replicates disjointly per copy (MinHash buckets collide ACROSS
copies too — identical texts share every band bucket — so the
candidate join also absorbs a cross-copy pair blowup ~mult² per
bucket, the LSH stress case the r7 minhash probe measured; the label
rounds then propagate the GLOBAL min doc_id through those cross-copy
edges).  Reported: candidate pair count, cluster count, wall per
stage.

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
from tropology_spark.operators.dedup import dedup_cluster3  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("cluster3-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "documents").select("doc_id", "text")
copies = spark.range(mult).select(F.col("id").alias("cp"))
docs = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("doc_id") + F.col("cp") * 10_000_000).alias("doc_id"), "text"
    )
    .repartition(64)
)
n = docs.count()
t1 = time.time()
out = dedup_cluster3(spark, sf, docs=docs)
agg = out.agg(
    F.count(F.lit(1)).alias("n_docs"),
    F.countDistinct("label3").alias("n_clusters"),
    F.sum((F.col("label3") != F.col("doc_id")).cast("long")).alias("n_merged"),
).collect()[0]
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "n_docs": n,
            "build_sec": round(t1 - t0, 2),
            "query_sec": round(t2 - t1, 2),
            "n_clusters": agg["n_clusters"],
            "n_merged": int(agg["n_merged"]),
        }
    )
)
