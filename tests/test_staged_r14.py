"""Driver-replica parity for the STAGED round-14 operators
(tropology_spark/operators/staged_r14.py) — the staging pattern's
sixth application: the full compare at both verification scales,
pure-Python twins for every formula-bearing op, a hypothesis property
suite on the exact staged path, and the partitioning-invariance +
plan sweeps.  Activation in round 14 is then a mechanical
move-and-register.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE, SF_UNIT, make_duckdb
from tropology_spark.operators.staged_r14 import STAGED


def test_staged_module_registers_nothing():
    from tropology_spark import QUERIES

    assert not (set(STAGED) & set(QUERIES))


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_parity_both_scales(spark, name):
    from tests.parity import compare

    fn, oracle = STAGED[name]
    for sf in (SF_UNIT, SF_ORACLE):
        con = make_duckdb(sf)
        try:
            compare(name, spark, con, fn, oracle, sf)
        finally:
            con.close()


def test_staged_partitioning_invariance(spark):
    from tests.parity import canon_rows, spark_result
    from tropology_spark.sources.tables import clear_session_caches

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {n: set() for n in STAGED}
        for parts in ("5", "13", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            clear_session_caches()
            for n, (fn, _) in STAGED.items():
                cols, rows = spark_result(fn(spark, SF_UNIT))
                results[n].add(tuple(canon_rows(cols, rows)))
        for n, seen in results.items():
            assert len(seen) == 1, f"staged {n} varies with shuffle partitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        clear_session_caches()


def test_staged_no_new_plan_antipatterns(spark):
    """No CartesianProduct / row-Python UDF; BNLJ only at the one
    noted scalar attach (ts_hurst_rs_terms' 2-row window-size table
    crossed into the bounded hour spine) — the name to add to
    BNLJ_ALLOWED at activation."""
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    bnlj_expected = {"ts_hurst_rs_terms"}
    bad = {}
    for name, (fn, _) in STAGED.items():
        s = fn(spark, SF_UNIT)._jdf.queryExecution().explainString(mode)
        if "CartesianProduct" in s:
            bad[name] = "CartesianProduct"
        if "BatchEvalPython" in s:
            bad[name] = "row-Python UDF"
        if "BroadcastNestedLoopJoin" in s and name not in bnlj_expected:
            bad[name] = "unexpected BNLJ"
    assert not bad, bad


def test_staged_decay_matches_pure_python(spark):
    """agg_exp_decay_counts — dyadic weights recomputed with plain
    ints; also pins the dyadic bound decayed <= 4096 * n."""
    from collections import Counter, defaultdict

    import duckdb

    fn, _ = STAGED["agg_exp_decay_counts"]
    rows = duckdb.sql(
        f"""SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    dmax = max(d for _, d in rows)
    n = Counter(t for t, _ in rows)
    dec = defaultdict(int)
    for t, d in rows:
        hl = (dmax - d) // 7
        dec[t] += 0 if hl >= 12 else 4096 // (1 << hl)
    want = {t: (n[t], dec[t], dec[t] // n[t]) for t in n}
    got = {
        r["event_type"]: (r["n_events"], r["decayed_x4096"], r["mean_weight_x4096"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    for t, (cnt, d, _m) in got.items():
        assert 0 <= d <= 4096 * cnt


def test_staged_burstiness_matches_pure_python(spark):
    """text_burstiness_terms — top-k cut, per-day counts and the
    variance numerator recomputed with Counters; also pins the
    variance identity var_num_x29 = 29·Σc² − total² ≥ 0 iff ...
    (it is 29²·population variance — always ≥ 0 when absent days
    count as zeros, exactly the zero-fill the algebra encodes)."""
    from collections import Counter, defaultdict

    import duckdb

    fn, _ = STAGED["text_burstiness_terms"]
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    tot = Counter()
    dc = defaultdict(Counter)
    for did, t in texts:
        day = did % 29
        for tok in t.split(" "):
            if tok != "":
                tot[tok] += 1
                dc[tok][day] += 1
    top = sorted(tot, key=lambda k: (-tot[k], k))[:30]
    want = {}
    for tok in top:
        s2 = sum(v * v for v in dc[tok].values())
        want[tok] = (
            tot[tok], len(dc[tok]), s2, 29 * s2 - tot[tok] * tot[tok],
        )
    got = {
        r["token"]: (r["total"], r["n_active_days"], r["sum_c2"], r["var_num_x29"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    for tok, (_t, _d, _s2, v) in got.items():
        assert v >= 0  # 29^2 * population variance over the full axis


def test_staged_cascade_matches_registered_sets(spark):
    """pipeline_cascade_marginals — recompute the cascade from the
    four REGISTERED flag sets (the composed-audit rule) and pin the
    accounting identities: Σ marginal = |union|, marginal ≤ flagged
    per stage, cum_removed is the running sum, and stage-1 marginal
    equals its flag count (nothing runs before exact)."""
    from collections import defaultdict

    from tropology_spark import QUERIES

    fn, _ = STAGED["pipeline_cascade_marginals"]
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, md5(text) FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    ex = QUERIES["dedup_exact"](spark, SF_UNIT).collect()
    keep = {r["text_hash"]: r["keep_doc_id"] for r in ex}
    flags = defaultdict(set)
    for did, h in docs:
        if h in keep and did > keep[h]:
            flags[1].add(did)
    for stage, qname in (
        (2, "dedup_minhash_lsh"), (3, "dedup_simhash"), (4, "dedup_ngram_jaccard")
    ):
        for r in QUERIES[qname](spark, SF_UNIT).collect():
            flags[stage].add(r["doc_b"])
    first = {}
    for stage in (1, 2, 3, 4):
        for d in flags[stage]:
            first.setdefault(d, stage)
    want = {}
    cum = 0
    for stage, m in ((1, "exact"), (2, "minhash"), (3, "simhash"), (4, "ngram")):
        marg = sum(1 for v in first.values() if v == stage)
        cum += marg
        want[stage] = (m, len(flags[stage]), marg, cum)
    got = {
        r["stage"]: (r["method"], r["n_flagged"], r["n_marginal"], r["cum_removed"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[4][3] == len(first)          # sum of marginals = |union|
    assert got[1][2] == got[1][1]           # nothing precedes stage 1
    for s in (1, 2, 3, 4):
        assert got[s][2] <= got[s][1]


def test_staged_hurst_matches_pure_python(spark):
    """ts_hurst_rs_terms — spine, windows, n-scaled cumulative
    deviations, ranges and variance numerators recomputed with plain
    int loops."""
    from collections import Counter

    import duckdb

    fn, _ = STAGED["ts_hurst_rs_terms"]
    hs = [
        h
        for (h,) in duckdb.sql(
            f"""SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT)
                FROM read_parquet('{SF_UNIT}/events.parquet')"""
        ).fetchall()
    ]
    cnt = Counter(hs)
    h0, hmax = min(cnt), max(cnt)
    xs = [cnt.get(h, 0) for h in range(h0, min(hmax, h0 + 4096) + 1)]
    want = {}
    for w in (8, 16):
        nwin = len(xs) // w
        sum_r = sum_s2 = sum_x = 0
        for i in range(nwin):
            win = xs[i * w : (i + 1) * w]
            total = sum(win)
            cum = 0
            devs = []
            for k, x in enumerate(win, start=1):
                cum += x
                devs.append(w * cum - k * total)
            sum_r += max(devs) - min(devs)
            sum_s2 += w * sum(x * x for x in win) - total * total
            sum_x += total
        want[w] = (nwin, sum_r, sum_s2, sum_x)
    got = {
        r["w"]: (r["n_windows"], r["sum_r_xw"], r["sum_s2num"], r["sum_x"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Property test over the EXACT staged path (frame injection)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SMALL = dict(max_examples=8, deadline=None)


@settings(**_SMALL)
@given(
    rate=st.integers(min_value=1, max_value=4),
    hours=st.integers(min_value=16, max_value=48),
)
def test_hurst_constant_series_has_zero_range(spark, rate, hours):
    """The R/S fixed point, on the exact staged path: a CONSTANT-rate
    series has zero mean-adjusted cumulative deviation at every k, so
    R·w = 0 and the variance numerator = 0 in every window, at every
    scale — any arithmetic drift in the n-scaled deviation or the
    window cut breaks it immediately."""
    fn, _ = STAGED["ts_hurst_rs_terms"]
    base = 1_700_000_000_000_000
    rows = [
        (h * 10 + i, 0, base + h * 3_600_000_000 + i, "click")
        for h in range(hours)
        for i in range(rate)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr("event_id", "user_id", "timestamp_micros(us) AS ts", "event_type")
    got = {r["w"]: r for r in fn(spark, "unused", events=ev).collect()}
    for w in (8, 16):
        assert got[w]["n_windows"] == hours // w
        assert got[w]["sum_r_xw"] == 0, got[w]
        assert got[w]["sum_s2num"] == 0, got[w]
        assert got[w]["sum_x"] == rate * w * (hours // w)
