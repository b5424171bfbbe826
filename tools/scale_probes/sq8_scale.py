"""Weak-scaling probe for the staged SQ8 retrieval audit
(sim_sq8_recall): replicate the fixture embedding table into <mult>
copies and run the EXACT staged code path in a fresh JVM.  Usage::

    python sq8_scale.py <mult>

Copy 0 keeps the original vec_ids (the query vector is preserved);
later copies shift vec_id by cp*10_000_000 and NEGATE the embedding
(the BQ-probe replication).  Negated copies symmetrize each
dimension's [mn, mx] grid, so codes — and the top-10 — legitimately
change with mult; per the probe-replication rule the probe times the
SCAN (deterministic per mult), not a fixed answer set.  What scales is
exactly the claim under test: the per-dim min/max agg (map-side
combinable), the scan-local encode, and the broadcast-join ADC sum —
all corpus-linear with no pairwise stage.

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
from tropology_spark.operators.similarity import sim_sq8_recall  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("sq8-scale")
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
out = sim_sq8_recall(spark, sf, e=emb).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "n_vectors": n,
            "build_sec": round(t1 - t0, 2),
            "query_sec": round(t2 - t1, 2),
            "topk": [(r["vec_id"], r["adc_score"], r["hit"]) for r in out],
        }
    )
)
