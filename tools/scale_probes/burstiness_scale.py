"""Weak-scaling probe for text_burstiness_terms (M298): replicate the
fixture documents into <mult> copies and run the EXACT registered
code path in a fresh JVM.  Usage::

    python burstiness_scale.py <mult> [overlaid|disjoint]

* ``overlaid`` (default): copies keep IDENTICAL text, doc_ids shift —
  per-token totals grow x mult while the top-30 token SET is
  preserved, so the claim under test is the stated scale discipline:
  the tokenize pass and the broadcast-join input grow x mult but
  everything past the top-k cut stays bounded by 30 tokens x 29 days.
* ``disjoint``: every token is suffixed with the copy id — the vocab
  axis grows x mult with per-token counts preserved (the corpus-total
  rollup's stress case; the top-30 cut then picks ties across copies).

Fixture dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])
mode = sys.argv[2] if len(sys.argv) > 2 else "overlaid"

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.operators.text import text_burstiness_terms  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("burstiness-scale")
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
rows = text_burstiness_terms(spark, sf, docs=docs).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "mode": mode,
            "n_docs": n,
            "n_tokens_out": len(rows),
            "total_top": sum(r["total"] for r in rows),
            "build_sec": round(t1 - t0, 2),
            "op_sec": round(t2 - t1, 2),
        }
    )
)
