"""Fresh-JVM timing of the sim_knn_join Lloyd assignment chain at a
replicated scale (VERDICT r6 item 4: demonstrate that the iters=3
overhead vs iters=1 is fixed cold-JIT/job-scheduling cost, not
data-proportional work).

Usage: python knn_scale.py <mult> <iters> [artifact]
Prints one JSON line {mult, iters, n, k, lloyd_sec, total_sec}.  With
the optional ``artifact`` arg, also writes the trained assignment as a
parquet artifact and times an independent reload — the
TROPOLOGY_QUANT_INDEX_DIR posture: train cost grows with n while
reload cost stays scan-bound, so the saved-index benefit WIDENS with
scale (adds write_sec / reload_sec to the JSON).
"""
import json
import math
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".."))

mult, iters = int(sys.argv[1]), int(sys.argv[2])

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.session import get_spark  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402
from tropology_spark.operators.similarity import (  # noqa: E402
    _LLOYD_TRAIN_MOD,
    as_double,
    dot,
    iter_materialize,
    lloyd_rounds,
    norm,
)

t0 = time.time()
spark = get_spark("knn-scale")
sf = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "embeddings").select(
    "vec_id", as_double(F.col("embedding")).alias("emb")
)
n0 = base.count()
# Replicate with vec_id offsets that are multiples of the train mod so
# sample membership (vec_id % 5 == 0) is scale-invariant.
assert (n0 * 1) % _LLOYD_TRAIN_MOD == 0
rep = base
for i in range(1, mult):
    rep = rep.unionAll(
        base.select((F.col("vec_id") + F.lit(i * n0)).alias("vec_id"), "emb")
    )
e = iter_materialize(rep.withColumn("nv", norm(F.col("emb"))))
n = e.count()
k = math.ceil(math.sqrt(n))
assign0 = e.filter(F.pmod(F.col("vec_id"), F.lit(_LLOYD_TRAIN_MOD)) == 0).select(
    "vec_id", F.pmod(F.col("vec_id") * F.lit(1000003), F.lit(k)).alias("cell")
)
t1 = time.time()
_, assign = lloyd_rounds(e, assign0, iters, train_mod=_LLOYD_TRAIN_MOD, pin="assign")
assign.count()
t2 = time.time()
out = {
    "mult": mult,
    "iters": iters,
    "n": n,
    "k": k,
    "lloyd_sec": round(t2 - t1, 2),
    "total_sec": round(t2 - t0, 2),
}
if len(sys.argv) > 3 and sys.argv[3] == "artifact":
    import tempfile

    p = tempfile.mkdtemp() + "/assign"
    t3 = time.time()
    assign.write.mode("overwrite").parquet(p)
    t4 = time.time()
    assert spark.read.parquet(p).count() == n
    t5 = time.time()
    out["write_sec"] = round(t4 - t3, 2)
    out["reload_sec"] = round(t5 - t4, 2)
print(json.dumps(out))
spark.stop()
