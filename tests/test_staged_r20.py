"""Driver-replica parity for the STAGED round-20 operators
(tropology_spark/operators/staged_r20.py) — the staging pattern's
twelfth application and the FINAL round's activation bank: the full
compare at both verification scales, pure-Python twins for every
formula-bearing op, two hypothesis property suites on the exact staged
paths (frame injection), and the partitioning-invariance + plan
sweeps.  Activation in round 20 is then a mechanical
move-and-register.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE, SF_UNIT, make_duckdb
from tropology_spark.operators.staged_r20 import STAGED


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
    """No CartesianProduct / row-Python UDF / BNLJ anywhere — the
    fourth all-BNLJ-free slate.  Nothing to add to BNLJ_ALLOWED at
    activation."""
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    bad = {}
    for name, (fn, _) in STAGED.items():
        s = fn(spark, SF_UNIT)._jdf.queryExecution().explainString(mode)
        if "CartesianProduct" in s:
            bad[name] = "CartesianProduct"
        if "BatchEvalPython" in s:
            bad[name] = "row-Python UDF"
        if "BroadcastNestedLoopJoin" in s:
            bad[name] = "unexpected BNLJ"
    assert not bad, bad


# ---------------------------------------------------------------------------
# Twins (NEW-OP CROSS-CHECK DISCIPLINE)
# ---------------------------------------------------------------------------


def _hd_curve_twin(pairs, thresholds):
    out = {}
    for t in thresholds:
        sub = [(a, b) for a, b, h in pairs if h <= t]
        docs = {d for p in sub for d in p}
        out[t] = (len(sub), len(docs))
    return out


def test_staged_simhash_hd_curve_consistent_with_registered(spark):
    """dedup_simhash_hd_curve — recomputed in Python from the
    collected registered M1 pair frame; pins the threshold nesting."""
    from tropology_spark import QUERIES

    fn, _ = STAGED["dedup_simhash_hd_curve"]
    pairs = [
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in QUERIES["dedup_simhash"](spark, SF_UNIT).collect()
    ]
    want = _hd_curve_twin(pairs, (2, 4, 6))
    got = {
        r["hd_max"]: (r["n_pairs"], r["n_docs_flagged"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[2][0] <= got[4][0] <= got[6][0]
    assert got[2][1] <= got[4][1] <= got[6][1]


def test_staged_phash_hd_curve_consistent_with_registered(spark):
    """mm_phash_hd_curve — recomputed in Python from the collected
    registered M99 pair frame; pins the threshold nesting."""
    from tropology_spark import QUERIES

    fn, _ = STAGED["mm_phash_hd_curve"]
    pairs = [
        (r["id_a"], r["id_b"], r["hamming"])
        for r in QUERIES["mm_phash_hamming"](spark, SF_UNIT).collect()
    ]
    want = _hd_curve_twin(pairs, (2, 4, 6))
    got = {
        r["hd_max"]: (r["n_pairs"], r["n_docs_flagged"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[2][0] <= got[4][0] <= got[6][0]


def test_staged_token_budget_curve_consistent_with_registered(spark):
    """pipeline_token_budget_curve — recomputed in Python from the
    collected registered M108 cumulative frame; pins the kept-set
    NESTING across budgets (smaller budget = prefix of larger under
    the same shuffle order)."""
    from tropology_spark import QUERIES

    fn, _ = STAGED["pipeline_token_budget_curve"]
    tb = QUERIES["pipeline_token_budget"](spark, SF_UNIT).collect()
    total = sum(r["n_tokens"] for r in tb)
    want = {}
    kept_sets = {}
    for b in (125, 500, 2000):
        kept = [r for r in tb if r["cum_tokens"] <= b]
        kept_sets[b] = {r["doc_id"] for r in kept}
        used = sum(r["n_tokens"] for r in kept)
        want[b] = (len(kept), used, total, (1_000_000 * used) // total)
    got = {
        r["budget"]: (r["n_docs_kept"], r["tokens_used"], r["total_tokens"],
                      r["kept_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert kept_sets[125] <= kept_sets[500] <= kept_sets[2000]


def _changepoint_twin(rows):
    """(type, day) event rows -> per type the best split by the exact
    cleared between-variance score."""
    from collections import Counter

    dc = Counter(rows)
    out = {}
    for et in {t for t, _d in dc}:
        series = sorted((d, c) for (t, d), c in dc.items() if t == et)
        n = len(series)
        t_sum = sum(c for _d, c in series)
        best = None
        s1 = 0
        for i, (d, c) in enumerate(series, 1):
            s1 += c
            if i == n:
                break
            n1, n2 = i, n - i
            s2 = t_sum - s1
            num = s1 * n2 - s2 * n1
            score = (1_000_000 * num * num) // (n1 * n2)
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, (d, n1, n2, s1, s2, score))
        if best is not None:
            out[et] = best[1]
    return out


def test_staged_changepoint_split_matches_pure_python(spark):
    """ts_changepoint_split — prefix sums, every candidate score and
    the argmax recomputed with Counter + Python big ints."""
    import duckdb

    fn, _ = STAGED["ts_changepoint_split"]
    rows = [
        (et, int(d))
        for et, d in duckdb.sql(
            f"""SELECT event_type, epoch_us(ts) // 86400000000
                FROM read_parquet('{SF_UNIT}/events.parquet')"""
        ).fetchall()
    ]
    want = _changepoint_twin(rows)
    got = {
        r["event_type"]: (r["split_day"], r["n_left"], r["n_right"],
                          r["sum_left"], r["sum_right"], r["score"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_staged_simpson_flip_matches_pure_python(spark):
    """analytics_simpson_flip_audit — per-nation cross-products, signs
    and the pooled sign recomputed with hashlib + Python ints."""
    import hashlib
    from collections import defaultdict

    import duckdb

    fn, _ = STAGED["analytics_simpson_flip_audit"]
    rows = duckdb.sql(
        f"""SELECT c.c_nationkey, o.o_custkey,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/orders.parquet') o
            JOIN read_parquet('{SF_UNIT}/customer.parquet') c
              ON c.c_custkey = o.o_custkey"""
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for nat, ck, cents in rows:
        ia = hashlib.md5(str(int(ck)).encode()).hexdigest()[0] < "8"
        a = agg[int(nat)]
        if ia:
            a[0] += 1
            a[2] += int(cents)
        else:
            a[1] += 1
            a[3] += int(cents)
    ta = sum(a[2] for a in agg.values())
    tb = sum(a[3] for a in agg.values())
    tna = sum(a[0] for a in agg.values())
    tnb = sum(a[1] for a in agg.values())
    pooled = ta * tnb - tb * tna
    sg = lambda x: (x > 0) - (x < 0)  # noqa: E731
    want = {
        nat: (na, nb, s1a * nb - s1b * na, sg(s1a * nb - s1b * na),
              sg(pooled), 1 if sg(s1a * nb - s1b * na) == sg(pooled) else 0)
        for nat, (na, nb, s1a, s1b) in agg.items()
    }
    got = {
        r["nationkey"]: (r["na"], r["nb"], r["dnum"], r["stratum_sign"],
                         r["pooled_sign"], r["agrees"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_staged_quantile_sample_curve_matches_pure_python(spark):
    """agg_quantile_sample_curve — samples, counting quantiles and
    signed errors recomputed with hashlib + sorted(); pins sample
    nesting and err ≡ 0 at s = 1."""
    import hashlib

    import duckdb

    fn, _ = STAGED["agg_quantile_sample_curve"]
    rows = duckdb.sql(
        f"""SELECT l.l_orderkey, l.l_linenumber,
                   CAST(CAST(l.l_shipdate AS DATE)
                        - CAST(o.o_orderdate AS DATE) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/lineitem.parquet') l
            JOIN read_parquet('{SF_UNIT}/orders.parquet') o
              ON l.l_orderkey = o.o_orderkey"""
    ).fetchall()
    samples = {1: [], 4: [], 16: []}
    for ok, ln, lat in rows:
        hk = int(
            hashlib.md5(f"{int(ok)}_{int(ln)}".encode()).hexdigest()[:8], 16
        )
        for s in samples:
            if hk % s == 0:
                samples[s].append(int(lat))
    qs = {}
    for s, vals in samples.items():
        vals.sort()
        n = len(vals)
        qs[s] = (n, vals[(n + 1) // 2 - 1], vals[(9 * n + 9) // 10 - 1])
    want = {
        s: (n, p50, p90, p50 - qs[1][1], p90 - qs[1][2])
        for s, (n, p50, p90) in qs.items()
    }
    got = {
        r["s"]: (r["n_rows"], r["p50"], r["p90"], r["err50_days"],
                 r["err90_days"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[1][3] == 0 and got[1][4] == 0
    assert set(samples[16]) <= set(samples[4])  # moduli nest (as multisets too)


def _prefix_curve_twin(docs):
    """(doc_id, text) -> per length (groups, dup docs, false merges,
    ppm) + the flagged-doc sets for the nesting pin."""
    from collections import Counter

    full = Counter(t for _d, t in docs)
    full_dup = {d for d, t in docs if full[t] > 1}
    out, flag_sets = {}, {}
    for L in (64, 256, 1024):
        grp = Counter(t[:L] for _d, t in docs)
        flagged = {d for d, t in docs if grp[t[:L]] > 1}
        false = flagged - full_dup
        out[L] = (
            len(grp), len(flagged), len(false),
            (1_000_000 * len(false)) // len(docs),
        )
        flag_sets[L] = flagged
    return out, flag_sets, full_dup


def test_staged_prefix_key_curve_matches_pure_python(spark):
    """dedup_prefix_key_curve — prefix groups, flags and false merges
    recomputed with Counter; pins flag nesting (shorter prefix ⊇) and
    the no-false-split guarantee (full dups always flagged)."""
    import duckdb

    fn, _ = STAGED["dedup_prefix_key_curve"]
    docs = [
        (int(d), t)
        for d, t in duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
        ).fetchall()
    ]
    want, flag_sets, full_dup = _prefix_curve_twin(docs)
    got = {
        r["prefix_len"]: (r["n_groups"], r["n_dup_docs"], r["n_false_merged"],
                          r["false_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert flag_sets[1024] <= flag_sets[256] <= flag_sets[64]
    for L in flag_sets:
        assert full_dup <= flag_sets[L]  # no false splits, ever


def test_staged_cluster_size_hist_consistent_with_registered(spark):
    """dedup_cluster_size_hist — recomputed with Counter from the
    collected registered M261 assignment; pins the mass identity
    Σ size·n_clusters == n_docs."""
    from collections import Counter, defaultdict

    from tropology_spark import QUERIES

    fn, _ = STAGED["dedup_cluster_size_hist"]
    cl = QUERIES["dedup_cluster3"](spark, SF_UNIT).collect()
    sizes = Counter(Counter(r["label3"] for r in cl).values())
    firsts = defaultdict(set)
    per_label = Counter(r["label3"] for r in cl)
    for lab, sz in per_label.items():
        firsts[sz].add(lab)
    want = {
        sz: (n, sz * n, min(firsts[sz])) for sz, n in sizes.items()
    }
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"], r["first_label"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert sum(sz * n for sz, (n, _d, _f) in got.items()) == len(cl)


def test_staged_dow_anova_matches_pure_python(spark):
    """ts_dow_anova_terms — daily counts, dow groups and the cleared
    within scatter recomputed with Counter; pins within_num >= 0."""
    from collections import Counter, defaultdict

    import duckdb

    fn, _ = STAGED["ts_dow_anova_terms"]
    rows = duckdb.sql(
        f"""SELECT event_type, epoch_us(ts) // 86400000000
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    dc = Counter((et, int(d)) for et, d in rows)
    grp = defaultdict(list)
    for (et, d), c in dc.items():
        grp[(et, d % 7)].append(c)
    want = {}
    for k, cs in grp.items():
        n = len(cs)
        s = sum(cs)
        ssq = sum(c * c for c in cs)
        want[k] = (n, s, ssq, n * ssq - s * s)
    got = {
        (r["event_type"], r["dow"]): (r["n_k"], r["s_k"], r["ssq_k"],
                                      r["within_num"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert all(v[3] >= 0 for v in got.values())


# ---------------------------------------------------------------------------
# Hypothesis property suites on the EXACT staged paths (frame injection)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SMALL = dict(max_examples=5, deadline=None)


@settings(**_SMALL)
@given(
    l1=st.integers(min_value=1, max_value=5),
    l2=st.integers(min_value=1, max_value=5),
    n1=st.integers(min_value=2, max_value=6),
    n2=st.integers(min_value=2, max_value=6),
)
def test_changepoint_finds_planted_step(spark, l1, l2, n1, n2):
    """ts_changepoint_split on injected events (events= kwarg): a
    perfect two-level step series must split EXACTLY at the level
    boundary (within-SSE zero there, positive everywhere else)."""
    if l1 == l2:
        l2 += 1
    base_day = 20_000
    rows = []
    eid = 0
    for i in range(n1 + n2):
        c = l1 if i < n1 else l2
        for j in range(c):
            us = ((base_day + i) * 86_400 + j) * 1_000_000
            rows.append((eid, 0, us, "click"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr(
        "event_id", "user_id", "timestamp_micros(us) AS ts", "event_type"
    )
    fn, _ = STAGED["ts_changepoint_split"]
    [r] = fn(spark, "unused", events=ev).collect()
    assert r["split_day"] == base_day + n1 - 1  # the last left-level day
    assert (r["n_left"], r["n_right"]) == (n1, n2)
    assert (r["sum_left"], r["sum_right"]) == (n1 * l1, n2 * l2)


@settings(**_SMALL)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=120).map(
            "".join
        ),
        min_size=2,
        max_size=30,
    )
)
def test_prefix_key_curve_property(spark, texts):
    """dedup_prefix_key_curve on injected corpora (docs= kwarg): for
    ARBITRARY texts the staged path must equal the Counter twin, flags
    must nest as prefixes shorten, and full-text dups must always be
    flagged (no false splits)."""
    docs = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    fn, _ = STAGED["dedup_prefix_key_curve"]
    got = {
        r["prefix_len"]: (r["n_groups"], r["n_dup_docs"], r["n_false_merged"],
                          r["false_ppm"])
        for r in fn(spark, "unused", docs=d).collect()
    }
    want, flag_sets, full_dup = _prefix_curve_twin(docs)
    assert got == want
    assert flag_sets[1024] <= flag_sets[256] <= flag_sets[64]
    for L in flag_sets:
        assert full_dup <= flag_sets[L]
