"""Independent pure-Python twins for the round-15 activations
(M309-M317) — the NEW-OP CROSS-CHECK DISCIPLINE (CLAUDE.md round 7):
Spark-vs-DuckDB parity cannot catch a shared-formula error, so every
formula-bearing new operator is re-derived here with hashlib / sets /
Counter / NumPy / plain loops and compared against the REGISTERED
query, plus the two hypothesis property suites on the exact registered
code paths (frame injection through the registry wrapper's **kwargs)
and the seventh-fold BRANCH-COVERAGE INJECTIONS for the guard/zero
branches the fixture cannot reach (the round-14 rule).

(These ops were staged in round 12 as operators/staged_r15.py and
activated in round 15; oracle parity + partitioning invariance now run
through the registry-wide suites — tests/test_oracle_parity.py and
test_units.py's invariance probe.)
"""

from __future__ import annotations

from tests.conftest import SF_UNIT
from tropology_spark import QUERIES


def test_hll_m_curve_matches_pure_python(spark):
    """agg_hll_m_curve — buckets, registers, the dyadic carrier, and
    the estimates recomputed with hashlib + Python ints for all three
    register counts from the same hash pass."""
    import hashlib

    import duckdb

    fn = QUERIES["agg_hll_m_curve"]
    keys = [
        int(k)
        for (k,) in duckdb.sql(
            f"SELECT o_custkey FROM read_parquet('{SF_UNIT}/orders.parquet')"
        ).fetchall()
    ]
    n_exact = len(set(keys))
    want = {}
    for m, am, dv in ((16, 673, 16), (64, 709, 4), (256, 718, 1)):
        regs = {}
        for k in keys:
            hx = hashlib.md5(str(k).encode()).hexdigest()
            b8 = int(hx[:2], 16)
            w = int(hx[2:10], 16)
            rho = 33 if w == 0 else 33 - w.bit_length()
            b = b8 // dv
            regs[b] = max(regs.get(b, 0), rho)
        s = sum(1 << (33 - regs.get(b, 0)) for b in range(m))
        v_empty = sum(1 for b in range(m) if regs.get(b, 0) == 0)
        est = (am * m * m * (1 << 33)) // (1000 * s)
        want[m] = (n_exact, v_empty, s, est, (1_000_000 * est) // n_exact)
    got = {
        r["m"]: (r["n_exact"], r["v_empty"], r["s_carrier"], r["hll_est"], r["ratio_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_hll_m_curve_single_key_reaches_empty_register_spine(spark):
    """Branch-coverage injection (seventh fold): a SINGLE-key corpus
    (o= kwarg) occupies exactly one register per m, so the spine's
    coalesce(mj, 0) zero-fill and the m0 = 0 / v_empty branch are
    exercised deterministically at every register count — the fixture
    fills nearly every register, so this branch needs the injection.
    v_empty = m − 1 and S = 2^(33−rho) + (m−1)·2³³ exactly."""
    import hashlib

    fn = QUERIES["agg_hll_m_curve"]
    o = spark.createDataFrame([(42,)], "o_custkey long")
    hx = hashlib.md5(b"42").hexdigest()
    w = int(hx[2:10], 16)
    rho = 33 if w == 0 else 33 - w.bit_length()
    got = {
        r["m"]: (r["n_exact"], r["v_empty"], r["s_carrier"])
        for r in fn(spark, SF_UNIT, o=o).collect()
    }
    for m in (16, 64, 256):
        s = (1 << (33 - rho)) + (m - 1) * (1 << 33)
        assert got[m] == (1, m - 1, s), (m, got[m])


def test_hll_m_curve_empty_corpus_null_ratio(spark):
    """ADVICE r15 item 3 — an EMPTY o= injection makes n_exact = 0;
    ratio_ppm must come back NULL (the CASE guard, mirrored in the
    oracle), never an ANSI division error.  The all-empty register
    spine still emits every m row with v_empty = m and the dyadic
    floor estimate am·m div 1000."""
    fn = QUERIES["agg_hll_m_curve"]
    o = spark.createDataFrame([], "o_custkey long")
    got = {
        r["m"]: (r["n_exact"], r["v_empty"], r["s_carrier"],
                 r["hll_est"], r["ratio_ppm"])
        for r in fn(spark, SF_UNIT, o=o).collect()
    }
    from tropology_spark.operators.aggregates import _HLL_MS

    for m, am, _dv in _HLL_MS:
        assert got[m] == (0, m, m * (1 << 33), (am * m) // 1000, None), (
            m, got[m],
        )


def test_hll_rho_zero_word_guard_matches_cross_engine(spark):
    """Branch-coverage pin for the w = 0 → rho = 33 guard — the one
    branch NO injection can reach (it needs md5 bits 8..40 of the key
    to be all-zero, probability 2⁻³²): evaluate the shared CASE
    expression on a literal 0 in BOTH engines and pin 33 (without the
    guard both would compute 33 − length(bin(0)) = 32: bin(0) = '0')."""
    import duckdb

    (got_spark,) = spark.sql(
        "SELECT CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END"
        " FROM VALUES (0L) t(w)"
    ).collect()[0]
    (got_duck,) = duckdb.sql(
        "SELECT CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END"
        " FROM (VALUES (CAST(0 AS BIGINT))) t(w)"
    ).fetchone()
    assert got_spark == got_duck == 33


def test_cdc_size_curve_matches_pure_python(spark):
    """mm_cdc_size_curve — window hashes, nested boundaries, chunk
    starts and mean sizes recomputed with hashlib over the hex
    strings; also pins the nesting n_chunks(32) >= n_chunks(64) >=
    n_chunks(128) (power-of-two moduli nest)."""
    import hashlib

    import duckdb

    fn = QUERIES["mm_cdc_size_curve"]
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    n_docs = len(docs)
    total_bytes = sum(len(t.encode("utf-8")) for _, t in docs)
    starts = {32: set(), 64: set(), 128: set()}
    for did, t in docs:
        hs = t.encode("utf-8").hex().upper()
        nb = len(hs) // 2
        for mod in starts:
            starts[mod].add((did, 1))
        for p in range(1, min(nb - 7, 4096) + 1):
            win = hs[2 * p - 2 : 2 * p - 2 + 16]
            h16 = int(hashlib.md5(win.encode()).hexdigest()[:4], 16)
            for mod in starts:
                if h16 % mod == 0:
                    starts[mod].add((did, p))
    want = {
        mod: (n_docs, total_bytes, len(s), (1000 * total_bytes) // len(s))
        for mod, s in starts.items()
    }
    got = {
        r["mod"]: (r["n_docs"], r["total_bytes"], r["n_chunks"], r["mean_chunk_milli_bytes"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[32][2] >= got[64][2] >= got[128][2]  # moduli nest


def test_beta_posterior_matches_pure_python(spark):
    """analytics_beta_posterior_terms — posterior parameters, means
    and the wide-integer variance carrier recomputed with hashlib +
    Python ints; also pins the Beta variance bound var_ppb <= 2.5e8
    (variance <= 1/4 in ppb) and posterior-mean shrinkage toward
    1/2."""
    import hashlib
    from collections import defaultdict

    import duckdb

    fn = QUERIES["analytics_beta_posterior_terms"]
    rows = duckdb.sql(
        f"""SELECT user_id, event_type
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    conv = defaultdict(int)
    for uid, et in rows:
        conv[uid] = max(conv[uid], 1 if et == "purchase" else 0)
    agg = defaultdict(lambda: [0, 0])
    for uid, c in conv.items():
        v = "A" if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8" else "B"
        agg[v][0] += 1
        agg[v][1] += c
    want = {}
    for v, (n, k) in agg.items():
        a, b = k + 1, n - k + 1
        want[v] = (
            n, k, a, b,
            (1_000_000 * k) // n,
            (1_000_000 * a) // (a + b),
            (1_000_000_000 * a * b) // ((a + b) * (a + b) * (a + b + 1)),
        )
    got = {
        r["variant"]: (
            r["n_users"], r["n_conv"], r["a"], r["b"],
            r["mle_ppm"], r["post_mean_ppm"], r["post_var_ppb"],
        )
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    for v, (n, k, a, b, mle, post, var) in got.items():
        assert var <= 250_000_000  # Beta variance <= 1/4, in ppb
        assert min(mle, 500_000) <= post <= max(mle, 500_000) + 1  # shrinkage


def test_winnowing_w_curve_matches_pure_python(spark):
    """text_winnowing_w_curve — gram hashes, window minima, selections
    and densities recomputed with hashlib at all three window sizes;
    also pins density monotone non-increasing in w."""
    import hashlib

    import duckdb

    fn = QUERIES["text_winnowing_w_curve"]
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    want = {}
    for w in (2, 4, 8):
        n_docs = 0
        total_grams = 0
        n_selected = 0
        for did, t in docs:
            toks = t.split(" ")
            grams = [
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            ]
            n_g = len(grams)
            if n_g < w:
                continue
            hs = [
                int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
            ]
            sel = {min(hs[i : i + w]) for i in range(n_g - w + 1)}
            n_docs += 1
            total_grams += n_g
            n_selected += len(sel)
        want[w] = (
            n_docs, total_grams, n_selected,
            (1_000_000 * n_selected) // total_grams,
        )
    got = {
        r["w"]: (r["n_docs"], r["total_grams"], r["n_selected"], r["density_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[2][3] >= got[4][3] >= got[8][3]  # density falls with w


def test_paa_lb_matches_pure_python(spark):
    """ts_paa_lb_audit — zero-filled profiles, segment sums and both
    distance carriers recomputed with plain int loops; also pins the
    GEMINI admissibility lb3 <= true3 on every emitted pair."""
    from collections import Counter, defaultdict

    import duckdb

    fn = QUERIES["ts_paa_lb_audit"]
    rows = duckdb.sql(
        f"""SELECT event_type,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)),
                   hour(ts)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    cnt = Counter(rows)
    days = defaultdict(set)
    for (et, d, _h), _n in cnt.items():
        days[et].add(d)
    want = {}
    for et, ds in days.items():
        for da in sorted(ds):
            if da + 1 not in ds:
                continue
            dx = [
                cnt.get((et, da, h), 0) - cnt.get((et, da + 1, h), 0)
                for h in range(24)
            ]
            lb3 = sum(
                sum(dx[3 * s : 3 * s + 3]) ** 2 for s in range(8)
            )
            true3 = 3 * sum(x * x for x in dx)
            want[(et, da)] = (
                da + 1, lb3, true3, true3 - lb3,
                1_000_000 if true3 == 0 else (1_000_000 * lb3) // true3,
            )
    got = {
        (r["event_type"], r["day_a"]): (
            r["day_b"], r["lb3"], r["true3"], r["slack"], r["tight_ppm"]
        )
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    for (_et, _da), (_db, lb3, true3, slack, _p) in got.items():
        assert 0 <= lb3 <= true3 and slack == true3 - lb3


def test_paa_identical_profiles_reach_true3_zero_guard(spark):
    """Branch-coverage injection (seventh fold): two IDENTICAL
    non-empty day profiles (events= kwarg) make every Δx zero, so
    true3 = lb3 = 0 and the guarded ppm branch fires — tight_ppm is
    DEFINED as 10⁶ (the bound is tight).  The fixture's organic day
    pairs never produce identical hourly profiles."""
    fn = QUERIES["ts_paa_lb_audit"]
    base_day = 20_000
    rows = []
    eid = 0
    for day in (base_day, base_day + 1):
        for h in (1, 5, 23):
            us = (day * 86_400 + h * 3_600) * 1_000_000
            for i in range(3):
                rows.append((eid, 0, us + i, "click"))
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr("event_id", "user_id", "timestamp_micros(us) AS ts", "event_type")
    got = fn(spark, SF_UNIT, events=ev).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["lb3"], r["true3"], r["slack"], r["tight_ppm"]) == (0, 0, 0, 1_000_000)


def test_core_profile_matches_pure_python(spark):
    """graph_core_profile — the 3-round peel recomputed with set/dict
    loops at every k; also pins the survivor-set monotonicity
    (nodes and edges non-increasing in k)."""
    from collections import Counter

    import duckdb

    fn = QUERIES["graph_core_profile"]
    pairs = duckdb.sql(
        f"""SELECT DISTINCT o_custkey AS src, l_partkey AS dst
            FROM read_parquet('{SF_UNIT}/orders.parquet') o
            JOIN read_parquet('{SF_UNIT}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    ue = [(f"c:{s}", f"p:{d}") for s, d in pairs]
    ue = ue + [(b, a) for a, b in ue]
    want = {}
    for k in (5, 25, 50):
        cur = ue
        for _ in range(3):
            deg = Counter(a for a, _b in cur)
            keep = {a for a, dg in deg.items() if dg >= k}
            cur = [(a, b) for a, b in cur if a in keep and b in keep]
        want[k] = (len({a for a, _b in cur}), len(cur) // 2)
    got = {
        r["k"]: (r["n_core_nodes"], r["n_core_edges"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[5][0] >= got[25][0] >= got[50][0]
    assert got[5][1] >= got[25][1] >= got[50][1]


def test_contamination_curve_matches_pure_python(spark):
    """pipeline_contamination_ngram_curve — shingle sets, flags and
    pair counts recomputed with Python sets; also pins the width
    containment flagged(4) ⊆ flagged(3) ⊆ flagged(2)."""
    import duckdb

    fn = QUERIES["pipeline_contamination_ngram_curve"]
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    want = {}
    flagged_sets = {}
    n_train = sum(1 for did, _t in docs if did % 97 != 0)
    for n in (2, 3, 4):
        sh = {}
        for did, t in docs:
            toks = t.split(" ")
            sh[did] = {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
        ev = {did: s for did, s in sh.items() if did % 97 == 0}
        flagged = set()
        pairs = set()
        for did, s in sh.items():
            if did % 97 == 0:
                continue
            for eid, es in ev.items():
                if s & es:
                    flagged.add(did)
                    pairs.add((did, eid))
        flagged_sets[n] = flagged
        want[n] = (
            n_train, len(flagged), len(pairs),
            (1_000_000 * len(flagged)) // n_train,
        )
    got = {
        r["n"]: (r["n_train_docs"], r["n_flagged"], r["n_pairs"], r["flagged_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert flagged_sets[4] <= flagged_sets[3] <= flagged_sets[2]


def test_dim_variance_matches_pure_python(spark):
    """sim_dim_variance_profile — the variance numerators and ranks
    recomputed with NumPy int64 / Python ints."""
    import duckdb
    import numpy as np

    fn = QUERIES["sim_dim_variance_profile"]
    rows = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF_UNIT}/embeddings.parquet')"
    ).fetchall()
    m = np.array([r[0] for r in rows], dtype=np.float64)
    vm = np.round(m * 1_000_000).astype(np.int64)
    n = vm.shape[0]
    stats = {}
    for p in range(vm.shape[1]):
        col = [int(x) for x in vm[:, p]]
        s1 = sum(col)
        s2 = sum(x * x for x in col)
        stats[p + 1] = (n, s1, s2, n * s2 - s1 * s1)
    order = sorted(stats, key=lambda p: (-stats[p][3], p))
    rk = {p: i for i, p in enumerate(order, 1)}
    want = {p: (*stats[p], rk[p]) for p in stats}
    got = {
        r["pos"]: (r["n_vecs"], r["sum_vm"], r["sum_vm2"], r["var_num"], r["rk"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_dim_variance_constant_dimension_reaches_zero_floor(spark):
    """Branch-coverage injection (seventh fold): a CONSTANT dimension
    (e= kwarg — every vector identical in dim 1) drives the variance
    numerator to its exact floor n·Σvm² − (Σvm)² = 0, ranking LAST —
    a value the fixture's continuous embeddings cannot produce."""
    fn = QUERIES["sim_dim_variance_profile"]
    e = spark.createDataFrame(
        [(i, [0.5, float(i) / 10.0]) for i in range(1, 6)],
        "vec_id long, embedding array<double>",
    )
    got = {r["pos"]: (r["var_num"], r["rk"]) for r in fn(spark, SF_UNIT, e=e).collect()}
    assert got[1][0] == 0 and got[2][0] > 0
    assert got[1][1] == 2 and got[2][1] == 1  # zero-variance dim ranks last


def test_join_size_ams_matches_pure_python(spark):
    """agg_join_size_ams — both sketch vectors, the exact join size
    and the signed errors recomputed with hashlib + Counter ints;
    also pins unbiasedness-adjacent sanity (median-of-8 within 3
    sigma-ish of exact is NOT pinned — estimates are noisy by design;
    what IS pinned: est = sa*sb and diff = est - exact per sketch)."""
    import hashlib
    from collections import Counter

    import duckdb

    from tropology_spark.operators.aggregates import (
        _AMS_PAIRS,
        _AMS_PRIME,
        _JSZ_QTY,
    )

    fn = QUERIES["agg_join_size_ams"]
    rows = duckdb.sql(
        f"""SELECT l_partkey, l_quantity
            FROM read_parquet('{SF_UNIT}/lineitem.parquet')"""
    ).fetchall()
    ca = Counter(int(k) for k, _q in rows)
    cb = Counter(int(k) for k, q in rows if q > _JSZ_QTY)
    j_exact = sum(ca[k] * cb.get(k, 0) for k in ca)
    signs = {}
    for k in ca:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        signs[k] = [
            1 if ((h * a + b) % _AMS_PRIME) % 2 == 0 else -1
            for a, b in _AMS_PAIRS
        ]
    want = set()
    for j in range(8):
        sa = sum(ca[k] * signs[k][j] for k in ca)
        sb = sum(cb[k] * signs[k][j] for k in cb)
        want.add((j, sa, sb, sa * sb, j_exact, sa * sb - j_exact))
    got = {
        (r["sketch_id"], r["sa"], r["sb"], r["est"], r["j_exact"], r["diff"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_join_size_ams_empty_filtered_side_yields_null_exact(spark):
    """Branch-coverage injection (seventh fold): when NO row passes
    the l_quantity > 25 filter (li= kwarg), the exact join collapses
    to an empty aggregate — j_exact and diff are NULL on all 8 sketch
    rows (absence of evidence, loudly: the pipeline_sample_bias_audit
    convention), while the sb sketch coordinates are exact zeros and
    est = sa·0 = 0.  The fixture always has qty > 25 rows."""
    fn = QUERIES["agg_join_size_ams"]
    li = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (1, 3.0)], "l_partkey long, l_quantity double"
    )
    got = fn(spark, SF_UNIT, li=li).collect()
    assert len(got) == 8
    for r in got:
        assert r["sb"] == 0 and r["est"] == 0
        assert r["j_exact"] is None and r["diff"] is None


# ---------------------------------------------------------------------------
# Hypothesis property suites on the EXACT registered paths (frame injection)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SMALL = dict(max_examples=5, deadline=None)


@settings(**_SMALL)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("abc"), min_size=10, max_size=40
        ).map(lambda cs: " ".join(cs)),
        min_size=1,
        max_size=5,
    )
)
def test_winnowing_selection_nests_across_w(spark, texts):
    """The w-curve's containment claim on the exact single-home path
    (docs= + w= injection): Selected(8) ⊆ Selected(4) ⊆ Selected(2)
    per document, for ARBITRARY token streams — the min of a
    w2-window is the min of the w1-subwindow containing its argmin."""
    from tropology_spark.operators.text import winnowing_selected

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sel = {}
    for w in (2, 4, 8):
        sel[w] = {
            (r["doc_id"], r["mh"])
            for r in winnowing_selected(spark, "unused", docs=docs, w=w).collect()
        }
    assert sel[8] <= sel[4] <= sel[2]


@settings(**_SMALL)
@given(
    prof_a=st.lists(st.integers(min_value=0, max_value=6), min_size=24, max_size=24),
    prof_b=st.lists(st.integers(min_value=0, max_value=6), min_size=24, max_size=24),
)
def test_paa_lb_property_admissible(spark, prof_a, prof_b):
    """ts_paa_lb_audit on injected day profiles (events= kwarg): the
    registered path must equal the pure recompute AND satisfy the
    GEMINI bound lb3 <= true3 for ARBITRARY hour profiles."""
    fn = QUERIES["ts_paa_lb_audit"]
    base_day = 20_000  # epoch days
    rows = []
    eid = 0
    for day, prof in ((base_day, prof_a), (base_day + 1, prof_b)):
        for h, cnt in enumerate(prof):
            us = (day * 86_400 + h * 3_600) * 1_000_000
            for i in range(cnt):
                rows.append((eid, 0, us + i, "click"))
                eid += 1
    if not rows:
        return
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr("event_id", "user_id", "timestamp_micros(us) AS ts", "event_type")
    got = fn(spark, SF_UNIT, events=ev).collect()
    pairs = [r for r in got if r["day_a"] == base_day]
    if not any(prof_a) or not any(prof_b):
        # a fully-empty day never enters the hourly rollup -> no pair
        assert not pairs
        return
    assert len(pairs) == 1
    r = pairs[0]
    dx = [a - b for a, b in zip(prof_a, prof_b)]
    lb3 = sum(sum(dx[3 * s : 3 * s + 3]) ** 2 for s in range(8))
    true3 = 3 * sum(x * x for x in dx)
    assert (r["lb3"], r["true3"]) == (lb3, true3)
    assert r["lb3"] <= r["true3"]
