"""Weak-scaling probe for join_bloom_prefilter_audit (M334):
replicate the probe side (lineitem keys) into <mult> copies and run
the EXACT registered code path in a fresh JVM.  Usage::

    python jbf_scale.py <mult> [overlaid|disjoint]

* ``overlaid`` (default): copies keep IDENTICAL keys — probe ROW mass
  grows x mult while the distinct-key histogram keeps its SIZE
  (counts x mult).  The claim under test is the collapse discipline:
  the filter is evaluated once per DISTINCT key, so x mult probe mass
  is absorbed by the map-side kc rollup and the wall stays flat.
* ``disjoint``: copy k gets keys offset by k * 10^9 — the key
  HISTOGRAM grows x mult (the per-key hash/membership stage's stress
  case; the offset keys are non-members, so n_true is preserved and
  the false-pass mass scales with the new key space).

Fixture dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

mult = int(sys.argv[1])
mode = sys.argv[2] if len(sys.argv) > 2 else "overlaid"

from pyspark.sql import functions as F  # noqa: E402

from tropology_spark.operators.relational import join_bloom_prefilter_audit  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load  # noqa: E402

t0 = time.time()
spark = get_spark("jbf-scale")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
base = load(spark, sf, "lineitem").select("l_partkey")
copies = spark.range(mult).select(F.col("id").alias("cp"))
key_col = (
    F.col("l_partkey") + F.col("cp") * 1_000_000_000
    if mode == "disjoint"
    else F.col("l_partkey")
)
li = iter_materialize(
    base.crossJoin(F.broadcast(copies))
    .select(key_col.alias("l_partkey"))
    .repartition(64)
)
n = li.count()
t1 = time.time()
rows = join_bloom_prefilter_audit(spark, sf, li=li).collect()
t2 = time.time()
print(
    json.dumps(
        {
            "mult": mult,
            "mode": mode,
            "n_probe_rows": n,
            "per_bpk": {
                int(r["bits_per_key"]): {
                    "n_probe": r["n_probe"],
                    "n_true": r["n_true"],
                    "n_pass": r["n_pass"],
                    "reduction_ppm": r["reduction_ppm"],
                }
                for r in rows
            },
            "build_sec": round(t1 - t0, 2),
            "op_sec": round(t2 - t1, 2),
        }
    )
)
