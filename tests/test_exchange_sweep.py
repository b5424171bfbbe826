"""Exchange-count regression sweep (VERDICT r5 item 3, round-6).

Round 5 found four DOUBLE-REFERENCE explosions by running
``explainString().count("Exchange")`` by hand (label_prop3 37→0,
related_tropes 54→2, ann_recall 46→4, lsh_recall 25→8).  This test
freezes that sweep: every registered query's physical plan at sf0.001
is checked against the recorded ceiling table
(tests/data/exchange_ceilings.json — measured count + 2 headroom for
AQE variation).  Any future mirror/union re-derivation fails CI here
instead of waiting for a judge bench read.

Regenerate the table after INTENTIONAL plan changes::

    python -c "
    import json
    from tropology_spark.session import get_spark
    from tropology_spark import QUERIES
    spark = get_spark('sweep')
    c = {}
    for n, fn in QUERIES.items():
        df = fn(spark, '/root/testdata/sf0.001')
        s = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('simple'))
        c[n] = s.count('Exchange') + 2
    json.dump(dict(sorted(c.items())),
              open('tests/data/exchange_ceilings.json', 'w'), indent=1)
    "

A MISSING entry is a failure by design: every new query must record
its ceiling before the driver samples it (the M168 lockstep playbook).
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from tropology_spark import QUERIES

SF_SWEEP = "/root/testdata/sf0.001"


def test_exchange_counts_within_recorded_ceilings(spark):
    ceilings = json.loads(
        (Path(__file__).parent / "data" / "exchange_ceilings.json").read_text()
    )
    missing = sorted(set(QUERIES) - set(ceilings))
    assert not missing, f"queries with no recorded Exchange ceiling: {missing}"

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    over: dict[str, str] = {}

    def sweep(name: str) -> None:
        try:
            df = QUERIES[name](spark, SF_SWEEP)
            n = df._jdf.queryExecution().explainString(mode).count("Exchange")
        except Exception as exc:  # noqa: BLE001 — report, don't abort the pool
            over[name] = f"sweep error: {type(exc).__name__}: {exc}"[:200]
            return
        if n > ceilings[name]:
            over[name] = f"{n} exchanges > ceiling {ceilings[name]}"

    with ThreadPoolExecutor(max_workers=6) as pool:
        list(pool.map(sweep, sorted(QUERIES)))
    assert not over, (
        f"{len(over)} queries exceed their Exchange ceiling "
        f"(double-reference re-derivation smell):\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(over.items()))
    )
