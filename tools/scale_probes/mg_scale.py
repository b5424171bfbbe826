"""Weak-scaling probe for agg_misra_gries_audit (M333): replicate the
fixture documents into <mult> copies and run the EXACT registered
code path in a fresh JVM.  Usage::

    python mg_scale.py <mult> [overlaid|disjoint]

* ``overlaid`` (default): copies keep IDENTICAL text; doc_id offsets
  are multiples of 4 so every copy PRESERVES its shard assignment
  (doc_id mod 4) — per-(shard, bigram) counts grow x mult while the
  bigram vocabulary, the per-shard top-8 summaries and the <= 32-row
  merge stay IDENTICAL in shape.  The claim under test is the MG
  scale story: the corpus collapses to the (shard, bigram) count
  table once, and everything past it is bounded by shards x k.
* ``disjoint``: every token is suffixed with the copy id — the
  (shard, bigram) table grows x mult with per-bigram counts
  preserved (the count-rollup and per-shard window stress case; the
  top-8 cut then ties across copies).

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

from tropology_spark.operators.aggregates import agg_misra_gries_audit  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("mg-scale")
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
# offset = cp * 4 * 10_000_000: a multiple of 4, so doc_id mod 4 (the
# shard key) is preserved per copy — structure-preserving replication.
docs = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("doc_id") + F.col("cp") * 40_000_000).alias("doc_id"),
        text_col.alias("text"),
    )
    .repartition(64)
)
n = docs.count()
t1 = time.time()
rows = agg_misra_gries_audit(spark, sf, docs=docs).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "mode": mode,
            "n_docs": n,
            "n_hitters_out": len(rows),
            "sum_exact": sum(r["exact"] for r in rows),
            "max_under": max((r["under"] for r in rows), default=0),
            "build_sec": round(t1 - t0, 2),
            "op_sec": round(t2 - t1, 2),
        }
    )
)
