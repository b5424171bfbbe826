"""Weak-scaling probe for the registered IVF probe curve
(sim_ivf_probe_curve): replicate the fixture embedding table into
<mult> copies and run the EXACT registered code path (single
ivf_candidates build at max n_probe + one scored pass + three
rank-filtered curve points — the round-12 rewrite) in a fresh JVM.
Usage::

    python probecurve_scale.py <mult>

Copy 0 keeps the original vec_ids (the query vector AND the label
seeding are preserved); later copies shift vec_id by cp*10_000_000 and
keep the label column (cells grow in occupancy, not count — exactly
the inverted-file density axis an IVF deployment scales along).  The
truth side stays the fixture J8 top-10, so recall numbers against a
replicated corpus are NOT meaningful — per the probe-replication rule
the probe times the BUILD + SCAN (one Lloyd round over n·mult vectors,
one cosine pass over the probed cells), which is the claim under test:
the rewrite's cost is ONE retrieval regardless of |probes|.

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
from tropology_spark.operators.similarity import sim_ivf_probe_curve  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("probecurve-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "embeddings").select("vec_id", "label", "embedding")
copies = spark.range(mult).select(F.col("id").alias("cp"))
emb = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("vec_id") + F.col("cp") * 10_000_000).alias("vec_id"),
        "label",
        "embedding",
    )
    .repartition(64)
)
n = emb.count()
t1 = time.time()
out = sim_ivf_probe_curve(spark, sf, e=emb).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "n_vectors": n,
            "build_sec": round(t1 - t0, 2),
            "curve_sec": round(t2 - t1, 2),
            "curve": [
                (r["n_probe"], r["n_hits"], r["recall_ppm"]) for r in out
            ],
        }
    )
)
