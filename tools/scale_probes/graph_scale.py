"""Weak-scaling probe for the iterative graph ops (SCALE.md evidence):
replicate the sf0.1 bipartite edge set into <mult> disjoint copies
(node-id suffix per copy) and time connected_components / pagerank in
a fresh JVM.  Usage: python /tmp/graph_scale.py <mult> <op>.
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".."))

mult, op = int(sys.argv[1]), sys.argv[2]

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.operators.graph import connected_components, pagerank  # noqa: E402
from tropology_spark.sources.tables import edges_materialized  # noqa: E402

t0 = time.time()
spark = get_spark("graph-scale")
sf = "/root/testdata/sf0.1"
e = edges_materialized(spark, sf)
c_node = F.concat(F.lit("c:"), F.col("src").cast("string"))
p_node = F.concat(F.lit("p:"), F.col("dst").cast("string"))
bi1 = e.select(c_node.alias("u"), p_node.alias("v")).unionByName(
    e.select(p_node.alias("u"), c_node.alias("v"))
)
parts = [bi1]
for i in range(1, mult):
    sfx = F.lit(f"#{i}")
    parts.append(
        bi1.select(
            F.concat(F.col("u"), sfx).alias("u"), F.concat(F.col("v"), sfx).alias("v")
        )
    )
bi = parts[0]
for p in parts[1:]:
    bi = bi.unionByName(p)
bi = iter_materialize(bi)
n_edges = bi.count()
t1 = time.time()
if op == "cc":
    out = connected_components(bi)
else:
    out = pagerank(bi)
n = out.count()
t2 = time.time()
print(
    json.dumps(
        {
            "op": op,
            "mult": mult,
            "bi_edges": n_edges,
            "out_rows": n,
            "op_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
        }
    )
)
spark.stop()
