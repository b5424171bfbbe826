"""Weak-scaling probe for the registered sim_pq_distortion (round-13,
M294): replicate the fixture embedding table into <mult> copies with
vec_id offsets and run the EXACT registered self-ADC distortion path
in a fresh JVM.  Usage::

    python pqdist_scale.py <mult>

Copy 0 keeps the original vec_ids, so the codebook (vec_ids 1..8, the
_pq_cb rule) is IDENTICAL at every mult and every copy carries the
same per-vector distortion profile — the output invariant is exact:
n_vectors per bucket scales by mult, min/max_qerr are unchanged, and
min_vec_id stays copy 0's.  What scales is the claim under test: the
corpus-proportional encode (n x subspaces x 8 code distances) and the
two map-side rollups.

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
from tropology_spark.operators.similarity import sim_pq_distortion  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("pqdist-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "embeddings").select("vec_id", "embedding")
copies = spark.range(mult).select(F.col("id").alias("cp"))
emb = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("vec_id") + F.col("cp") * 10_000_000).alias("vec_id"),
        "embedding",
    )
    .repartition(64)
)
n = emb.count()
t1 = time.time()
rows = sim_pq_distortion(spark, sf, e=emb).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "n_vectors": n,
            "build_sec": round(t1 - t0, 2),
            "distortion_sec": round(t2 - t1, 2),
            "buckets": sorted(
                (r["bucket"], r["n_vectors"], r["min_qerr"], r["max_qerr"])
                for r in rows
            ),
        }
    )
)
