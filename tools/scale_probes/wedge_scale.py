"""Weak-scaling probe for the REGISTERED graph_wedge_sample_closure
(M323): replicate the sf0.1 capped co-purchase projection into <mult>
DISJOINT copies (node-id offsets preserve every wedge and every
closure inside its copy) and run the EXACT registered path via the
``proj=`` probe kwarg in a fresh JVM.  Usage::

    python wedge_scale.py <mult>

Replication invariants (checked here): at s = 1 the wedge and closed
counts scale by mult BIT-EXACTLY and closure_ppm is bit-identical
(disjoint copies add no cross-copy wedges — a wedge needs a shared
center).  The sampled rows (s = 4/16) move with the md5 keys of the
offset ids — reported, not pinned; their closure_ppm should stay
near the full truth (that is the operator's whole claim).  What
scales is the cost story: wedge enumeration is Theta(sum C(d,2)) —
linear in mult under disjoint replication — so per-unit cost must
not grow.

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
from tropology_spark.operators.graph_motifs import (  # noqa: E402
    _HUB_CAP,
    copurchase_projection,
    graph_wedge_sample_closure,
)

t0 = time.time()
spark = get_spark("wedge-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = copurchase_projection(spark, sf, hub_cap=_HUB_CAP)
base_rows = {
    r["s"]: r for r in graph_wedge_sample_closure(spark, sf).collect()
}
OFF = 100_000_000
copies = spark.range(mult).select(F.col("id").alias("cp"))
proj = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("u") + F.col("cp") * OFF).alias("u"),
        (F.col("v") + F.col("cp") * OFF).alias("v"),
    )
    .repartition(64)
)
n_edges = proj.count()
t1 = time.time()
rows = {
    r["s"]: r
    for r in graph_wedge_sample_closure(spark, sf, proj=proj).collect()
}
t2 = time.time()
b1, g1 = base_rows[1], rows[1]
full_exact = (
    g1["n_wedges"] == mult * b1["n_wedges"]
    and g1["n_closed"] == mult * b1["n_closed"]
    and g1["closure_ppm"] == b1["closure_ppm"]
)
print(
    json.dumps(
        {
            "mult": mult,
            "edges_in": n_edges,
            "build_sec": round(t1 - t0, 2),
            "wedge_sec": round(t2 - t1, 2),
            "n_wedges_s1": g1["n_wedges"],
            "closure_ppm_s1": g1["closure_ppm"],
            "s1_scales_exactly_and_ppm_bit_identical": full_exact,
            "sampled": {
                int(s): {
                    "n_wedges": rows[s]["n_wedges"],
                    "closure_ppm": rows[s]["closure_ppm"],
                    "dev_ppm": rows[s]["dev_ppm"],
                }
                for s in rows
                if s != 1
            },
        }
    )
)
spark.stop()
