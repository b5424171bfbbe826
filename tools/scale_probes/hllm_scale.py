"""Weak-scaling probe for agg_hll_m_curve (M309): replicate the
fixture orders into <mult> copies in one of two modes and run the
EXACT registered code path (the ``o=`` probe kwarg) in a fresh JVM.
Usage::

    python hllm_scale.py <mult> [disjoint|overlay]

- disjoint (default): copy cp offsets o_custkey by cp·10⁹ — the
  distinct-key universe grows ×mult, so the probe measures register
  SATURATION (v_empty falls toward 0) and whether the dyadic-carrier
  estimate tracks the growing truth at every m.  The claim under
  test: the register table stays ≤ 336 rows no matter the corpus —
  the map-side max-merge IS the 100 TB story.
- overlay: rows ×mult with keys UNCHANGED — register max-merge must
  be IDEMPOTENT under duplication, so s_carrier / v_empty / hll_est
  are pinned BIT-IDENTICAL to the 1× run (computed in-process as the
  self-check) while the hash pass scans ×mult rows.

Fixture dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])
mode = sys.argv[2] if len(sys.argv) > 2 else "disjoint"

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.operators.aggregates import agg_hll_m_curve  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("hllm-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "orders").select("o_custkey")
copies = spark.range(mult).select(F.col("id").alias("cp"))
shift = (
    (F.col("o_custkey") + F.col("cp") * 1_000_000_000)
    if mode == "disjoint"
    else F.col("o_custkey")
)
o = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(shift.alias("o_custkey"))
    .repartition(64)
)
n = o.count()
t1 = time.time()
rows = agg_hll_m_curve(spark, sf, o=o).collect()
t2 = time.time()
out = {
    "mult": mult,
    "mode": mode,
    "rows": n,
    "build_sec": round(t1 - t0, 2),
    "op_sec": round(t2 - t1, 2),
    "curve": {
        int(r["m"]): {
            "n_exact": r["n_exact"],
            "v_empty": r["v_empty"],
            "hll_est": r["hll_est"],
            "ratio_ppm": r["ratio_ppm"],
        }
        for r in rows
    },
}
if mode == "overlay":
    one = {
        int(r["m"]): (r["v_empty"], r["s_carrier"], r["hll_est"])
        for r in agg_hll_m_curve(spark, sf, o=base).collect()
    }
    dup = {
        int(r["m"]): (r["v_empty"], r["s_carrier"], r["hll_est"]) for r in rows
    }
    out["registers_idempotent"] = one == dup
print(json.dumps(out))
