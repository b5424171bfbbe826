"""Targeted parity check for round-19 optimization changes.

Usage: python tools/opt_parity.py <sf_dir> q1 q2 ...
Runs each named query under a FOREIGN default session (the driver
posture: fresh session, shuffle.partitions=7) and compares against its
DuckDB oracle via the tests/parity replica.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

sf_dir = sys.argv[1]
names = sys.argv[2:]

from pyspark.sql import SparkSession  # noqa: E402

from tropology_spark import ORACLES, QUERIES  # noqa: E402
from tests.conftest import make_duckdb  # noqa: E402
from tests.parity import compare  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .appName("opt-parity")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
con = make_duckdb(sf_dir)

bad = 0
for name in names:
    try:
        compare(name, spark, con.cursor(), QUERIES[name], ORACLES[name], sf_dir)
        print(f"OK   {name}")
    except Exception as exc:  # noqa: BLE001
        bad += 1
        print(f"FAIL {name}: {exc}")
print(f"done: {len(names) - bad}/{len(names)} green at {sf_dir}")
sys.exit(1 if bad else 0)
