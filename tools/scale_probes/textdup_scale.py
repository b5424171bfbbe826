"""Weak-scaling probe for the text/boilerplate family
(text_dup_span_frac, M125): replicate the fixture document table into
<mult> copies and run the EXACT registered code path in a fresh JVM.
Usage::

    python textdup_scale.py <mult> [disjoint|overlaid]

Two replication modes, probing different claims:

* ``disjoint`` (default): every token is suffixed with the copy id,
  so each copy's trigram vocabulary is isomorphic but disjoint — the
  gram axis grows ×mult while per-gram document frequency is
  PRESERVED (weak scaling proper: the boilerplate set and keep
  decisions replicate exactly; per-unit wall should hold or fall).
* ``overlaid``: copies keep IDENTICAL text, only doc_ids shift —
  per-gram df grows ×mult, so MORE grams cross the boilerplate
  threshold (the vocabulary-skew stress case: the df rollup
  concentrates on the same gram keys and the broadcast membership set
  grows; does the two-agg plan absorb it without the gram shuffle
  becoming the bottleneck).

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
from tropology_spark.operators.pipeline_ops import text_dup_span_frac  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("textdup-scale")
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
out = text_dup_span_frac(spark, sf, docs=docs)
agg = out.agg(
    F.count(F.lit(1)).alias("n_docs"),
    F.sum("n_grams").alias("n_grams"),
    F.sum("n_boiler").alias("n_boiler"),
    F.sum("is_kept").alias("n_kept"),
).collect()[0]
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "mode": mode,
            "n_docs": n,
            "build_sec": round(t1 - t0, 2),
            "query_sec": round(t2 - t1, 2),
            "n_out_docs": agg["n_docs"],
            "n_grams": int(agg["n_grams"]),
            "n_boiler": int(agg["n_boiler"]),
            "n_kept": int(agg["n_kept"]),
        }
    )
)
