"""Weak-scaling probe for the IVF+PQ composite saved index
(ivfpq_write_index / ivfpq_topk_from_index): replicate the fixture
embedding table into <mult> copies, build the index ONCE, then time
the from-index search.  Usage::

    python ivfpq_scale.py <mult>

Copy 0 keeps the original vec_ids and labels; later copies shift
vec_id by cp*10_000_000 and NEGATE the embedding (the BQ-probe
replication — labels are preserved so the coarse cell count stays
fixed at the label cardinality).  The walkthrough claim under test:
index BUILD is corpus-linear (two training passes), while the
from-index SEARCH reads n_probe of n_buckets buckets of 2-int codes —
its cost should grow far slower than the corpus.  Search results
legitimately change with mult (negated replicas shift centroids);
the probe times the scan, not a fixed answer set.

Fixture dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
import tropology_spark.operators.similarity as S  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("ivfpq-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "embeddings").select("vec_id", "label", "embedding")
copies = spark.range(mult).select(F.col("id").alias("cp"))
emb = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("vec_id") + F.col("cp") * 10_000_000).alias("vec_id"),
        "label",
        F.expr(
            "CASE WHEN cp = 0 THEN embedding"
            " ELSE transform(embedding, v -> -v) END"
        ).alias("embedding"),
    )
    .repartition(64)
)
n = emb.count()
t1 = time.time()
path = f"/tmp/ivfpq_scale_{mult}"
shutil.rmtree(path, ignore_errors=True)
S.ivfpq_write_index(spark, sf, "ivfpq_scale_idx", path=path, e=emb)
t2 = time.time()
s2 = spark.newSession()
s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
out = S.ivfpq_topk_from_index(s2, "ivfpq_scale_idx", sf, e=emb).collect()
t3 = time.time()
out2 = S.ivfpq_topk_from_index(s2, "ivfpq_scale_idx", sf, e=emb).collect()
t4 = time.time()
spark.sql("DROP TABLE IF EXISTS ivfpq_scale_idx")
spark.sql("DROP TABLE IF EXISTS ivfpq_scale_idx_centroids")
spark.sql("DROP TABLE IF EXISTS ivfpq_scale_idx_codebook")
print(
    json.dumps(
        {
            "mult": mult,
            "n_vectors": n,
            "replicate_sec": round(t1 - t0, 2),
            "index_write_sec": round(t2 - t1, 2),
            "search_sec_first": round(t3 - t2, 2),
            "search_sec_repeat": round(t4 - t3, 2),
            "topk": [(r["vec_id"], r["cell"]) for r in out][:5],
        }
    )
)
shutil.rmtree(path, ignore_errors=True)
