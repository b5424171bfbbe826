"""Weak-scaling probe for the hub-capped co-purchase projection (the
dominant stage of the capped motif family): replicate the sf0.1
bipartite edge set into <mult> disjoint copies and run the EXACT
production _projection_build on the replicated frame.
Usage: python proj_scale.py <mult>
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.graph_motifs import _HUB_CAP, _projection_build  # noqa: E402
from tropology_spark.sources.tables import edges_materialized  # noqa: E402

t0 = time.time()
spark = get_spark("proj-scale")
sf = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = edges_materialized(spark, sf)
coff, poff = 10_000_000, 10_000_000
parts = [base]
for i in range(1, mult):
    parts.append(
        base.select(
            (F.col("src") + F.lit(i * coff)).alias("src"),
            (F.col("dst") + F.lit(i * poff)).alias("dst"),
        )
    )
e = parts[0]
for p in parts[1:]:
    e = e.unionByName(p)
e = iter_materialize(e)
n_edges = e.count()
t1 = time.time()
proj = _projection_build(spark, sf, _HUB_CAP, e=e)
n_proj = proj.count()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "edges": n_edges,
            "proj_rows": n_proj,
            "build_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
        }
    )
)
spark.stop()
