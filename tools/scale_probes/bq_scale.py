"""Weak-scaling probe for the staged binary-quantization retrieval
(sim_bq_hamming_topk): replicate the fixture embedding table into
<mult> copies and run the EXACT staged code path in a fresh JVM.
Usage::

    python bq_scale.py <mult>

Copy 0 keeps the original vec_ids (the query vector is preserved);
later copies shift vec_id by cp*10_000_000 and NEGATE the embedding.
The result is deterministic at every mult, and what scales is exactly
the claim under test: the XOR+popcount Hamming scan over the packed
signatures, corpus-linear with a 2-word working set per row.

Note a real BQ property the replicas surface: sign-bit quantization
maps -v to the complement signature, so a vector at Hamming d places
its negation at 64-d — a FAR original (d≈45) contributes a NEAR
replica (d≈19), and negated copies legitimately enter the candidate
set at higher mults (observed from 100×).  That is the magnitude
blindness that makes the exact-cosine rerank a required stage of the
BQ tier, not an optimization — the probe times the scan, not a fixed
answer set.

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
from tropology_spark.operators.similarity import sim_bq_hamming_topk  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("bq-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "embeddings").select("vec_id", "embedding")
copies = spark.range(mult).select(F.col("id").alias("cp"))
emb = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("vec_id") + F.col("cp") * 10_000_000).alias("vec_id"),
        F.expr(
            "CASE WHEN cp = 0 THEN embedding"
            " ELSE transform(embedding, v -> -v) END"
        ).alias("embedding"),
    )
    .repartition(64)
)
n = emb.count()
t1 = time.time()
out = sim_bq_hamming_topk(spark, sf, e=emb).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "n_vectors": n,
            "build_sec": round(t1 - t0, 2),
            "query_sec": round(t2 - t1, 2),
            "topk": [(r["vec_id"], r["hamming"]) for r in out],
        }
    )
)
