"""graph weak-scaling, crossJoin replication variant for large mults."""
import json, sys, time
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".."))
mult, op = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from tropology_spark.session import get_spark, iter_materialize
from tropology_spark.operators.graph import connected_components, pagerank
from tropology_spark.sources.tables import edges_materialized

t0 = time.time()
spark = get_spark("graph-scale2")
sf = "/root/testdata/sf0.1"
e = edges_materialized(spark, sf)
c_node = F.concat(F.lit("c:"), F.col("src").cast("string"))
p_node = F.concat(F.lit("p:"), F.col("dst").cast("string"))
bi1 = e.select(c_node.alias("u"), p_node.alias("v")).unionByName(
    e.select(p_node.alias("u"), c_node.alias("v"))
)
copies = spark.range(mult).select(F.col("id").cast("string").alias("cp"))
bi = iter_materialize(
    bi1.crossJoin(F.broadcast(copies)).select(
        F.concat(F.col("u"), F.lit("#"), F.col("cp")).alias("u"),
        F.concat(F.col("v"), F.lit("#"), F.col("cp")).alias("v"),
    )
)
n_edges = bi.count()
t1 = time.time()
out = connected_components(bi) if op == "cc" else pagerank(bi)
n = out.count()
t2 = time.time()
print(json.dumps({"op": op, "mult": mult, "bi_edges": n_edges, "out_rows": n,
                  "op_sec": round(t2 - t1, 2), "total_sec": round(t2 - t0, 2)}))
spark.stop()
