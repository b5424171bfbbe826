"""Weak-scaling probe for text_source_tv_matrix (M340): replicate the
document corpus into <mult> copies and run the EXACT registered code
path in a fresh JVM.  Usage::

    python tvm_scale.py <mult> [overlaid|disjoint]

* ``overlaid`` (default): copies keep IDENTICAL text (doc_id offsets
  only) — per-(source, token) counts grow x mult while the vocab and
  source axes keep their SIZE, so every tv_ppm is BIT-IDENTICAL to
  the 1x run (TV is scale-free in the counts: c_a*N_b - c_b*N_a
  scales by mult² and the denominator does too).  The claim under
  test is the corpus-collapse discipline: the pair stage touches the
  (source, token) rollup, never the documents, so x mult corpus mass
  is absorbed map-side.
* ``disjoint``: copy k suffixes every token with _k — the VOCAB axis
  grows x mult (the |sources|² · |vocab| pair-stage bound's stress
  case; every pair's distributions become fully disjoint across
  copies, dragging tv_ppm toward the mixture value).

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

from tropology_spark.operators.text import text_source_tv_matrix  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("tvm-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "documents").select("doc_id", "source", "text")
copies = spark.range(mult).select(F.col("id").alias("cp"))
text_col = (
    F.expr("regexp_replace(text, '(\\\\S+)', concat('$1_', cp))")
    if mode == "disjoint"
    else F.col("text")
)
docs = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("doc_id") + F.col("cp") * 1_000_000_000).alias("doc_id"),
        "source",
        text_col.alias("text"),
    )
    .repartition(64)
)
n = docs.count()
t1 = time.time()
rows = text_source_tv_matrix(spark, sf, docs=docs).collect()
t2 = time.time()
out = sorted(
    (r["src_a"], r["src_b"], r["n_tokens_a"], r["n_tokens_b"], r["tv_ppm"])
    for r in rows
)
print(
    json.dumps(
        {
            "mult": mult,
            "mode": mode,
            "n_docs": n,
            "n_pairs": len(out),
            "tv_ppm_min": min(r[4] for r in out) if out else None,
            "tv_ppm_max": max(r[4] for r in out) if out else None,
            "first_pair": list(out[0]) if out else None,
            "build_sec": round(t1 - t0, 2),
            "op_sec": round(t2 - t1, 2),
        }
    )
)
