"""Weak-scaling probe for the registered mm_cdc_dedup_stats (round-13
slate): replicate sf0.1 documents <mult> times and run the EXACT
registered CDC chunk-dedup path.  Two modes:

* ``copy``    — verbatim copies (doc_id offset only): content x mult,
  unique chunks ~flat — measures the content-addressed ABSORPTION
  (saved_ppm -> (mult-1)/mult) and the rollup's weak scaling.
* ``perturb`` — each copy appends a per-copy token: CDC's defining
  property means only the TAIL chunk differs per copy (boundaries over
  the shared prefix re-align), so bytes_unique grows by roughly one
  chunk per copy while a fixed grid would recut nothing here but WOULD
  under prepends (see test_cdc_boundaries_shift_resistant).

Usage: python cdc_scale.py <mult> <copy|perturb>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])
mode = sys.argv[2]

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.multimodal import mm_cdc_dedup_stats  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("cdc-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "documents").select("doc_id", "source", "text")
copies = spark.range(mult).select(F.col("id").alias("cp"))
text = (
    F.col("text")
    if mode == "copy"
    else F.concat(F.col("text"), F.lit(" zz"), F.col("cp").cast("string"))
)
docs = iter_materialize(
    base.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("cp") * 1_000_000).alias("doc_id"),
        "source",
        text.alias("text"),
    )
)
n = docs.count()
t1 = time.time()
out = mm_cdc_dedup_stats(spark, sf, docs=docs)
rows = out.collect()
t2 = time.time()
tot = sum(r["bytes_total"] for r in rows)
uni = sum(r["bytes_unique"] for r in rows)
print(
    json.dumps(
        {
            "mode": mode,
            "mult": mult,
            "docs": n,
            "bytes_total": tot,
            "bytes_unique": uni,
            "saved_ppm": (1_000_000 * (tot - uni)) // tot,
            "op_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
        }
    )
)
spark.stop()
