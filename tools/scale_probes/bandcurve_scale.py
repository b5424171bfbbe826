"""Weak-scaling probe for the staged LSH band-tuning curve
(dedup_band_curve): replicate the fixture documents into <mult>
DISJOINT copies (every token suffixed with the copy id — the
textdup_scale idiom, so the shingle vocabulary grows ×mult while
per-copy structure including the J2 truth pairs is preserved) and run
the EXACT staged code path — J2 truth, ONE shared signature pass,
then all three (bands × rows) candidate joins — in a fresh JVM.
Usage::

    python bandcurve_scale.py <mult>

What scales is the claim under test: the shared signature pass is
scan-bound and map-side combinable; each configuration adds one
band-bucket equi-join whose candidate volume grows linearly under
disjoint replication (the r=2 config shuffles 8 bands/doc — twice
J3's band rows — and is the cost ceiling of the curve).  Note the
truth branch (J2 prefix-blocked Jaccard) dominates at higher mults —
that is the audit's documented nature: the exact pipeline is the
part that cannot run at 100 TB, which is why the tuning table is
computed at oracle scale per corpus snapshot.

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
from tropology_spark.operators.dedup import dedup_band_curve  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("bandcurve-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "documents").select("doc_id", "text")
copies = spark.range(mult).select(F.col("id").alias("cp"))
docs = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("doc_id") + F.col("cp") * 10_000_000).alias("doc_id"),
        F.array_join(
            F.expr("transform(split(text, ' '), t -> concat(t, '_', cp))"), " "
        ).alias("text"),
    )
    .repartition(64)
)
n = docs.count()
t1 = time.time()
rows = dedup_band_curve(spark, sf, docs=docs).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "n_docs": n,
            "build_sec": round(t1 - t0, 2),
            "curve_sec": round(t2 - t1, 2),
            "curve": {
                int(r["band_rows"]): {
                    "n_true": r["n_true"],
                    "n_candidates": r["n_candidates"],
                    "n_hit": r["n_hit"],
                }
                for r in rows
            },
        }
    )
)
