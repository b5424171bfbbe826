"""Weak-scaling probe for the iterative graph ops (SCALE.md evidence):
replicate the fixture bipartite edge set into <mult> disjoint copies
(node-id suffix per copy) and time connected_components / pagerank in
a fresh JVM.  Usage::

    python graph_scale.py <mult> <op> [union|crossjoin]

``op``: cc | pagerank.  Replication mode (ADVICE r7 — formerly two
near-identical scripts): ``crossjoin`` (default) broadcasts a <mult>-row
copy table onto the edges — one job at any mult; ``union`` chains
<mult> unionByName branches — linear plan, only sensible for small
mults, kept so the two modes can cross-check each other's copies.
Fixture dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".."))

mult, op = int(sys.argv[1]), sys.argv[2]
mode = sys.argv[3] if len(sys.argv) > 3 else "crossjoin"

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.graph import connected_components, pagerank  # noqa: E402
from tropology_spark.sources.tables import edges_materialized  # noqa: E402

t0 = time.time()
spark = get_spark("graph-scale")
sf = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
e = edges_materialized(spark, sf)
c_node = F.concat(F.lit("c:"), F.col("src").cast("string"))
p_node = F.concat(F.lit("p:"), F.col("dst").cast("string"))
bi1 = e.select(c_node.alias("u"), p_node.alias("v")).unionByName(
    e.select(p_node.alias("u"), c_node.alias("v"))
)
if mode == "union":
    parts = [bi1]
    for i in range(1, mult):
        sfx = F.lit(f"#{i}")
        parts.append(
            bi1.select(
                F.concat(F.col("u"), sfx).alias("u"),
                F.concat(F.col("v"), sfx).alias("v"),
            )
        )
    bi = parts[0]
    for p in parts[1:]:
        bi = bi.unionByName(p)
else:
    copies = spark.range(mult).select(F.col("id").cast("string").alias("cp"))
    bi = bi1.crossJoin(F.broadcast(copies)).select(
        F.concat(F.col("u"), F.lit("#"), F.col("cp")).alias("u"),
        F.concat(F.col("v"), F.lit("#"), F.col("cp")).alias("v"),
    )
bi = iter_materialize(bi)
n_edges = bi.count()
t1 = time.time()
out = connected_components(bi) if op == "cc" else pagerank(bi)
n = out.count()
t2 = time.time()
print(
    json.dumps(
        {
            "op": op,
            "mult": mult,
            "mode": mode,
            "bi_edges": n_edges,
            "out_rows": n,
            "op_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
        }
    )
)
spark.stop()
