"""Weak-scaling probe for mm_cdc_size_curve (M310): replicate the
fixture documents into <mult> DISJOINT copies (doc_id offsets, text
unchanged) and run the EXACT registered code path (the ``docs=``
probe kwarg) in a fresh JVM.  Usage::

    python cdcsize_scale.py <mult>

Structure preservation makes the self-check exact: every copy has
byte-identical text, so its window hashes and boundary set replicate
verbatim — n_docs / total_bytes / n_chunks must scale ×mult EXACTLY
at every modulus and mean_chunk_milli_bytes must be BIT-IDENTICAL to
the 1× run (computed in-process).  The claim under test: the
boundary scan is the M260 map-only pass and the per-mod rollup is
map-side combinable, so per-unit wall falls with scale.  Fixture dir
from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.operators.multimodal import mm_cdc_size_curve  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("cdcsize-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "documents").select("doc_id", "text")
copies = spark.range(mult).select(F.col("id").alias("cp"))
docs = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("doc_id") + F.col("cp") * 1_000_000_000).alias("doc_id"),
        "text",
    )
    .repartition(64)
)
n = docs.count()
t1 = time.time()
rows = mm_cdc_size_curve(spark, sf, docs=docs).collect()
t2 = time.time()
one = {
    int(r["mod"]): (r["n_docs"], r["total_bytes"], r["n_chunks"], r["mean_chunk_milli_bytes"])
    for r in mm_cdc_size_curve(spark, sf, docs=base).collect()
}
rep = {
    int(r["mod"]): (r["n_docs"], r["total_bytes"], r["n_chunks"], r["mean_chunk_milli_bytes"])
    for r in rows
}
exact = all(
    rep[m] == (one[m][0] * mult, one[m][1] * mult, one[m][2] * mult, one[m][3])
    for m in one
)
print(
    json.dumps(
        {
            "mult": mult,
            "docs": n,
            "build_sec": round(t1 - t0, 2),
            "op_sec": round(t2 - t1, 2),
            "curve": {m: {"n_chunks": v[2], "mean_milli": v[3]} for m, v in rep.items()},
            "xmult_exact_and_mean_identical": exact,
        }
    )
)
