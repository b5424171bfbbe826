"""Weak-scaling probe for the MinHash-LSH dedup path: replicate the
sf0.1 documents into <mult> copies (doc_id offset, text unchanged —
worst case: every doc gains mult-1 exact dups, so bucket groups grow
mult x and candidate pairs ~mult^2).  Times the signature/banding pass
and the candidate join separately.  Usage: python minhash_scale.py <mult>
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.dedup import (  # noqa: E402
    minhash_bands_frame,
    minhash_candidate_pairs,
)
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("minhash-scale")
sf = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "documents").select("doc_id", "text")
n0 = base.count()
rep = base
for i in range(1, mult):
    rep = rep.unionAll(
        base.select((F.col("doc_id") + F.lit(i * n0)).alias("doc_id"), "text")
    )
docs = iter_materialize(rep)
n = docs.count()
t1 = time.time()
bands = iter_materialize(minhash_bands_frame(spark, sf, docs=docs))
n_bands = bands.count()
t2 = time.time()
# The registered J3 candidate join, verbatim (ADVICE r7).
pairs = minhash_candidate_pairs(bands).count()
t3 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "docs": n,
            "band_rows": n_bands,
            "pairs": pairs,
            "sig_sec": round(t2 - t1, 2),
            "join_sec": round(t3 - t2, 2),
            "total_sec": round(t3 - t0, 2),
        }
    )
)
spark.stop()
