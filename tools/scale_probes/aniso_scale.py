"""Weak-scaling probe for the REGISTERED sim_anisotropy_terms (M318):
replicate the fixture embedding table into <mult> copies with vec_id
offsets and run the EXACT registered one-pass Gram-identity path in
a fresh JVM.  Usage::

    python aniso_scale.py <mult>

Replication invariants (exact, checked here): n_vectors and
sum_norm2_u2 scale by mult; mean_norm2_u2 is bit-identical.  The
pairwise terms legitimately MOVE — replication adds cross-copy pairs,
so mean_pair_dot_u2 / ani_ppm drift from the base values toward the
gram/n**2 limit — they are reported, not pinned.  What scales is the
claim under test: the whole operator is ONE corpus scan + a 64-row
rollup (no pairs ever materialize), so per-unit cost must FALL with
mult.

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
from tropology_spark.operators.similarity import sim_anisotropy_terms  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("aniso-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "embeddings").select("vec_id", "embedding")
copies = spark.range(mult).select(F.col("id").alias("cp"))
emb = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(
        (F.col("vec_id") + F.col("cp") * 10_000_000).alias("vec_id"),
        "embedding",
    )
    .repartition(64)
)
n = emb.count()
t1 = time.time()
[r] = sim_anisotropy_terms(spark, sf, e=emb).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "n_vectors_in": n,
            "build_sec": round(t1 - t0, 2),
            "aniso_sec": round(t2 - t1, 2),
            "n_vectors": r["n_vectors"],
            "sum_norm2_u2": r["sum_norm2_u2"],
            "mean_norm2_u2": r["mean_norm2_u2"],
            "mean_pair_dot_u2": r["mean_pair_dot_u2"],
            "ani_ppm": r["ani_ppm"],
        }
    )
)
