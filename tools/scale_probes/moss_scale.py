"""Weak-scaling probe for the STAGED dedup_moss_pairs (round-19
slate): replicate the fixture document table into <mult> copies and
run the EXACT staged winnowing pair join in a fresh JVM.  Usage::

    python moss_scale.py <mult> [disjoint|overlaid]

Two replication modes, probing different claims:

* ``disjoint`` (default): every token is suffixed with the copy id,
  so each copy's fingerprint space is disjoint — the pair count
  scales ~×mult STATISTICALLY, not exactly (suffixed grams re-roll
  the md5 window minima, so each copy selects different fingerprints
  — the BQ-probe lesson: this probe times the scan, it does not
  claim an exact output invariant).
* ``overlaid``: copies keep IDENTICAL text, only doc_ids shift —
  every copy of a doc shares ALL its fingerprints with every other
  copy, so the candidate pair count blows up ~×mult² on the shared
  fingerprint keys (the LSH-band-economics stress: does the
  fingerprint-keyed equi-join absorb a quadratic candidate blowup
  the way the MinHash band join absorbed 578× at 1.9× wall).

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
from tropology_spark.operators.text import dedup_moss_pairs  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("moss-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "documents").select("doc_id", "text")
copies = spark.range(mult).select(F.col("id").alias("cp"))
text_col = (
    F.array_join(
        F.expr("transform(split(text, ' '), t -> concat(t, '_', cp))"), " "
    )
    if mode == "disjoint"
    else F.col("text")
)
docs = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("doc_id") + F.col("cp") * 10_000_000).alias("doc_id"),
        text_col.alias("text"),
    )
    .repartition(64)
)
n = docs.count()
t1 = time.time()
res = dedup_moss_pairs(spark, sf, docs=docs)
agg = res.agg(
    F.count(F.lit(1)).alias("n_pairs"),
    F.sum("n_shared").alias("sum_shared"),
    F.max("cont_ppm").alias("max_cont_ppm"),
).collect()[0]
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "mode": mode,
            "n_docs": n,
            "build_sec": round(t1 - t0, 2),
            "moss_sec": round(t2 - t1, 2),
            "n_pairs": agg["n_pairs"],
            "sum_shared": int(agg["sum_shared"] or 0),
            "max_cont_ppm": agg["max_cont_ppm"],
        }
    )
)
