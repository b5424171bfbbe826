"""Pure-Python twins + property suites for the round-18 activations
(M338-M347) — converted from tests/test_staged_r18.py at activation
(the r9-r17 pattern): the staged-only parity/invariance/plan sweeps
are dropped (registry-wide suites cover the activated queries), the
twins and the two hypothesis property suites run against QUERIES, and
the SEVENTH-fold branch-coverage injections pin the guard branches the
fixture can't reach (permutation degenerate cohorts, label-scatter
n = 0, the TA dropped-depth edge)."""

from __future__ import annotations

from tests.conftest import SF_UNIT
from tropology_spark import QUERIES


# ---------------------------------------------------------------------------
# Twins (NEW-OP CROSS-CHECK DISCIPLINE) — hashlib / Counter / NumPy
# recomputations with arbitrary-precision ints; no SQL engine (DuckDB
# appears only as a parquet reader / cents-rounding source).
# ---------------------------------------------------------------------------


def _leadlag_twin(rows, max_lag=6):
    """Pure-Counter twin of the lead-lag matrix over (type, hour)
    event rows."""
    from collections import Counter

    hc = Counter(rows)
    hours = sorted({h for _t, h in hc})
    types = sorted({t for t, _h in hc})
    z = {(t, h): hc.get((t, h), 0) for t in types for h in hours}
    hs = set(hours)
    out = {}
    for tx in types:
        for ty in types:
            if tx == ty:
                continue
            best = None
            for lag in range(max_lag + 1):
                pairs = [
                    (z[(tx, h - lag)], z[(ty, h)])
                    for h in hours
                    if h - lag in hs
                ]
                m = len(pairs)
                if m == 0:
                    continue
                sxy = sum(a * b for a, b in pairs)
                sx = sum(a for a, _b in pairs)
                sy = sum(b for _a, b in pairs)
                sxx = sum(a * a for a, _b in pairs)
                syy = sum(b * b for _a, b in pairs)
                num = m * sxy - sx * sy
                dh = m * sxx - sx * sx
                dt = m * syy - sy * sy
                if num <= 0 or dh <= 0 or dt <= 0:
                    continue
                score = (1_000_000_000 * num * num) // (dh * dt)
                key = (-score, lag)
                if best is None or key < best[0]:
                    best = (key, (lag, m, num, dh, dt, score))
            if best is not None:
                out[(tx, ty)] = best[1]
    return out


def test_leadlag_matrix_matches_pure_python(spark):
    """ts_leadlag_matrix — the zero-filled spine, per-pair co-moments
    and fixed-point argmax recomputed with Counter + Python ints."""
    import duckdb

    rows = [
        (et, int(h))
        for et, h in duckdb.sql(
            f"""SELECT event_type, epoch_us(ts) // 3600000000
                FROM read_parquet('{SF_UNIT}/events.parquet')"""
        ).fetchall()
    ]
    want = _leadlag_twin(rows)
    got = {
        (r["type_x"], r["type_y"]): (
            r["best_lag"], r["m"], r["num"], r["dh"], r["dt"], r["score_ppb"]
        )
        for r in QUERIES["ts_leadlag_matrix"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_permutation_rank_matches_pure_python(spark):
    """analytics_permutation_rank — all nine labelings, gaps and
    flags recomputed with hashlib + Python floor division; also pins
    the +1 correction (the observed row always counts itself)."""
    import hashlib

    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderkey, o_orderpriority,
                   CAST(round(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/orders.parquet')
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"""
    ).fetchall()
    gaps = {}
    for j in range(9):
        na = nb = s1a = s1b = 0
        for ok, pr, c in rows:
            if j == 0:
                ia = pr == "1-URGENT"
            else:
                ia = hashlib.md5(f"{int(ok)}_{j}".encode()).hexdigest()[0] < "8"
            if ia:
                na += 1
                s1a += int(c)
            else:
                nb += 1
                s1b += int(c)
        gaps[j] = (na, nb, (1000 * (s1a * nb - s1b * na)) // (na * nb))
    obs = abs(gaps[0][2])
    want = {
        j: (na, nb, g, abs(g), 1 if abs(g) >= obs else 0)
        for j, (na, nb, g) in gaps.items()
    }
    got = {
        r["perm_id"]: (r["na"], r["nb"], r["gap_milli"], r["abs_gap_milli"],
                       r["ge_obs"])
        for r in QUERIES["analytics_permutation_rank"](spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[0][4] == 1  # the observed row counts itself


def test_permutation_rank_degenerate_cohort_guard(spark):
    """SEVENTH fold — the na·nb = 0 guard is unreachable on the
    fixture (md5 coins split thousands of rows); pin it by injection:
    an all-URGENT corpus puts every row in cohort A under the
    OBSERVED labeling (perm 0), so gap_milli/abs_gap_milli are NULL
    and ge_obs reads 0 via CASE NULL semantics — never an ANSI
    division error.  The md5 perms split the 8 keys both ways, so
    the guard fires exactly where nb = 0."""
    odf = spark.createDataFrame(
        [(k, "1-URGENT", float(k)) for k in range(1, 9)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    rows = {
        r["perm_id"]: r
        for r in QUERIES["analytics_permutation_rank"](
            spark, "unused", orders=odf
        ).collect()
    }
    assert len(rows) == 9
    r0 = rows[0]
    assert (r0["na"], r0["nb"]) == (8, 0)
    assert r0["gap_milli"] is None and r0["abs_gap_milli"] is None
    assert r0["ge_obs"] == 0
    for j, r in rows.items():
        if r["na"] * r["nb"] == 0:
            assert r["gap_milli"] is None
        else:
            assert r["gap_milli"] is not None


def test_source_tv_matrix_matches_pure_python(spark):
    """text_source_tv_matrix — zero-filled distributions and the
    cleared TV sums recomputed with Counter; also pins the TV range
    [0, 10⁶] and the complete pair count s·(s−1)/2."""
    from collections import Counter

    import duckdb

    docs = duckdb.sql(
        f"""SELECT source, text
            FROM read_parquet('{SF_UNIT}/documents.parquet')"""
    ).fetchall()
    per = {}
    for src, txt in docs:
        per.setdefault(src, Counter()).update(txt.split(" "))
    tot = {s: sum(c.values()) for s, c in per.items()}
    vocab = set().union(*per.values())
    srcs = sorted(per)
    want = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            sad = sum(
                abs(per[sa].get(t, 0) * tot[sb] - per[sb].get(t, 0) * tot[sa])
                for t in vocab
            )
            want[(sa, sb)] = (
                tot[sa], tot[sb],
                (1_000_000 * sad) // (2 * tot[sa] * tot[sb]),
            )
    got = {
        (r["src_a"], r["src_b"]): (r["n_tokens_a"], r["n_tokens_b"], r["tv_ppm"])
        for r in QUERIES["text_source_tv_matrix"](spark, SF_UNIT).collect()
    }
    assert got == want
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    assert all(0 <= v[2] <= 1_000_000 for v in got.values())


def test_seasonal_anova_matches_pure_python(spark):
    """ts_seasonal_anova_terms — hourly counts, hour-of-day groups and
    the cleared within scatter recomputed with Counter; pins
    within_num >= 0 (Cauchy-Schwarz)."""
    from collections import Counter, defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT event_type, epoch_us(ts) // 3600000000
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    hc = Counter((et, int(h)) for et, h in rows)
    grp = defaultdict(list)
    for (et, h), c in hc.items():
        grp[(et, h % 24)].append(c)
    want = {}
    for k, cs in grp.items():
        n = len(cs)
        s = sum(cs)
        ssq = sum(c * c for c in cs)
        want[k] = (n, s, ssq, n * ssq - s * s)
    got = {
        (r["event_type"], r["hod"]): (r["n_k"], r["s_k"], r["ssq_k"],
                                      r["within_num"])
        for r in QUERIES["ts_seasonal_anova_terms"](spark, SF_UNIT).collect()
    }
    assert got == want
    assert all(v[3] >= 0 for v in got.values())


def test_degree_quantiles_matches_pure_python(spark):
    """graph_degree_quantiles — degrees, counting quantiles and the
    rank thresholds recomputed with Counter + sorted(); also pins the
    ordering p50 <= p90 <= p99 <= max."""
    from collections import Counter

    import duckdb

    pairs = duckdb.sql(
        f"""SELECT DISTINCT o.o_custkey, l.l_partkey
            FROM read_parquet('{SF_UNIT}/orders.parquet') o
            JOIN read_parquet('{SF_UNIT}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    want = {}
    for side, idx in (("customer", 0), ("part", 1)):
        deg = Counter(p[idx] for p in pairs)
        vals = sorted(deg.values())
        n = len(vals)
        q = lambda r: vals[r - 1]  # noqa: E731 — 1-based rank pick
        want[side] = (
            n, q((n + 1) // 2), q((9 * n + 9) // 10),
            q((99 * n + 99) // 100), vals[-1],
        )
    got = {
        r["side"]: (r["n_nodes"], r["p50"], r["p90"], r["p99"], r["max_degree"])
        for r in QUERIES["graph_degree_quantiles"](spark, SF_UNIT).collect()
    }
    assert got == want
    for _s, (_n, p50, p90, p99, mx) in got.items():
        assert p50 <= p90 <= p99 <= mx


def test_qte_deciles_matches_pure_python(spark):
    """analytics_qte_deciles — the per-variant sorted boundaries and
    signed gaps recomputed with hashlib + sorted()."""
    import hashlib

    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderkey, o_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/orders.parquet')"""
    ).fetchall()
    per = {"A": [], "B": []}
    for ok, ck, c in rows:
        v = "A" if hashlib.md5(str(int(ck)).encode()).hexdigest()[0] < "8" else "B"
        per[v].append((int(c), int(ok)))
    vals = {}
    for v, lst in per.items():
        lst.sort()
        n = len(lst)
        vals[v] = {d: lst[(d * (n + 1)) // 10 - 1][0] for d in range(1, 10)}
    want = {
        d: (vals["A"][d], vals["B"][d], vals["B"][d] - vals["A"][d])
        for d in range(1, 10)
    }
    got = {
        r["decile"]: (r["val_a_cents"], r["val_b_cents"], r["qte_cents"])
        for r in QUERIES["analytics_qte_deciles"](spark, SF_UNIT).collect()
    }
    assert got == want


def _kanon_twin(rows):
    """(nat, cents) -> per-width (classes, below, risk, ppm) + the
    at-risk row-index sets for the nesting pin."""
    from collections import Counter

    out, risk_sets = {}, {}
    for w in (100_000, 200_000, 400_000):
        cls = Counter((nat, (c + 10_000_000) // w) for nat, c in rows)
        below = {k for k, n in cls.items() if n < 5}
        risk = sum(cls[k] for k in below)
        out[w] = (
            len(cls), len(below), risk,
            (1_000_000 * risk) // len(rows),
        )
        risk_sets[w] = {
            i
            for i, (nat, c) in enumerate(rows)
            if (nat, (c + 10_000_000) // w) in below
        }
    return out, risk_sets


def test_kanon_curve_matches_pure_python(spark):
    """pipeline_kanon_curve — classes, violations and rows at risk
    recomputed with Counter over the shifted buckets; also pins the
    at-risk ROW-SET nesting as buckets coarsen."""
    import duckdb

    rows = [
        (int(n), int(c))
        for n, c in duckdb.sql(
            f"""SELECT c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT)
                FROM read_parquet('{SF_UNIT}/customer.parquet')"""
        ).fetchall()
    ]
    want, risk_sets = _kanon_twin(rows)
    got = {
        r["width_cents"]: (r["n_classes"], r["n_below_k"], r["rows_at_risk"],
                           r["risk_ppm"])
        for r in QUERIES["pipeline_kanon_curve"](spark, SF_UNIT).collect()
    }
    assert got == want
    assert risk_sets[400_000] <= risk_sets[200_000] <= risk_sets[100_000]


def test_overlap_duration_matches_brute_force(spark):
    """join_session_overlap_duration — the bucket-candidate machinery
    vs the BRUTE-FORCE all-pairs interval scan in Python over the
    same session_spans frame (the stronger cross-formulation check:
    buckets must lose no pair and double-count none)."""
    from collections import defaultdict

    from tropology_spark.operators.timeseries import session_spans

    spans = [
        (r["user_id"], r["sess_seq"], r["start_us"], r["end_us"])
        for r in session_spans(spark, SF_UNIT).collect()
    ]
    agg = defaultdict(lambda: [0, 0])
    for ua, sa, s1, e1 in spans:
        for ub, sb, s2, e2 in spans:
            if ua < ub and s1 <= e2 and s2 <= e1:
                a = agg[(ua, ub)]
                a[0] += 1
                a[1] += min(e1, e2) - max(s1, s2)
    top = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    want = {k: tuple(v) for k, v in top}
    got = {
        (r["user_a"], r["user_b"]): (r["n_overlaps"], r["total_ovl_us"])
        for r in QUERIES["join_session_overlap_duration"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_label_scatter_matches_pure_python(spark):
    """sim_label_scatter_terms — per-label component sums and the
    Gram-identity scatter recomputed with NumPy round + Python ints;
    pins within_num >= 0 (Cauchy-Schwarz)."""
    from collections import defaultdict

    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"""SELECT label, embedding
            FROM read_parquet('{SF_UNIT}/embeddings.parquet')"""
    ).fetchall()
    per = defaultdict(list)
    for lab, emb in rows:
        per[int(lab)].append(
            [int(x) for x in np.round(
                np.array(emb, dtype=np.float64) * 1_000_000
            ).astype(np.int64)]
        )
    want = {}
    for lab, vecs in per.items():
        n = len(vecs)
        ssq = sum(x * x for v in vecs for x in v)
        s2 = sum(
            s * s for s in (sum(v[p] for v in vecs) for p in range(64))
        )
        want[lab] = (n, ssq, s2, n * ssq - s2, ssq // n)
    got = {
        r["label"]: (r["n_vecs"], r["ssq_u2"], r["s2_u2"], r["within_num"],
                     r["mean_norm2_u2"])
        for r in QUERIES["sim_label_scatter_terms"](spark, SF_UNIT).collect()
    }
    assert got == want
    assert all(v[3] >= 0 for v in got.values())


def test_label_scatter_short_embedding_guard(spark):
    """SEVENTH fold — n = Σcnt div 64 hits 0 only when an injected
    frame carries embeddings shorter than 64 components (the fixture
    is always 64-dim); pin that mean_norm2_u2 reads NULL — never an
    ANSI division error — and the raw carriers still flow."""
    emb = spark.createDataFrame(
        [(1, 3, [0.5, -0.25])],
        "vec_id long, label long, embedding array<double>",
    )
    [r] = QUERIES["sim_label_scatter_terms"](spark, "unused", e=emb).collect()
    assert r["n_vecs"] == 0  # 2 components div 64
    assert r["mean_norm2_u2"] is None
    assert r["ssq_u2"] == 500_000**2 + 250_000**2


def test_ta_depth_curve_matches_pure_python(spark):
    """analytics_ta_depth_curve — both ranked lists, thresholds,
    seen sets and stop flags recomputed with sorted() + Python ints;
    also pins the stop monotonicity (thresholds fall, the k-th seen
    score rises — once stopped, stopped at every deeper probe) AND
    the dropped-depth edge: sf0.001 has 150 customers, so depths 256
    and 512 have no rank-p row and emit NOTHING in both engines."""
    from collections import defaultdict

    import duckdb

    cust = [
        int(k)
        for (k,) in duckdb.sql(
            f"SELECT c_custkey FROM read_parquet('{SF_UNIT}/customer.parquet')"
        ).fetchall()
    ]
    agg = defaultdict(lambda: [0, 0])
    for k, c in duckdb.sql(
        f"""SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/orders.parquet')"""
    ).fetchall():
        agg[int(k)][0] += int(c)
        agg[int(k)][1] += 1
    base = {k: (agg[k][0], agg[k][1]) for k in cust}
    score = {k: s + 100_000 * n for k, (s, n) in base.items()}
    by_x = sorted(cust, key=lambda k: (-base[k][0], k))
    by_y = sorted(cust, key=lambda k: (-base[k][1], k))
    rx = {k: i for i, k in enumerate(by_x, 1)}
    ry = {k: i for i, k in enumerate(by_y, 1)}
    want = {}
    for p in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512):
        if p > len(cust):
            continue  # both engines drop depths past the list length
        t = base[by_x[p - 1]][0] + 100_000 * base[by_y[p - 1]][1]
        seen = [k for k in cust if min(rx[k], ry[k]) <= p]
        seen.sort(key=lambda k: (-score[k], k))
        kth = score[seen[4]] if len(seen) >= 5 else None
        want[p] = (
            t, kth, len(seen),
            1 if kth is not None and kth >= t else 0,
        )
    got = {
        r["depth"]: (r["t_threshold"], r["kth_seen_score"], r["n_seen"],
                     r["stopped"])
        for r in QUERIES["analytics_ta_depth_curve"](spark, SF_UNIT).collect()
    }
    assert got == want
    # the dropped-depth edge is fixture-REACHABLE at sf0.001
    assert len(cust) < 256 and set(got) == {1, 2, 4, 8, 16, 32, 64, 128}
    flags = [got[p][3] for p in sorted(got)]
    assert flags == sorted(flags)  # stop is monotone in depth


def test_distinct_sample_curve_all_null_key_guard(spark):
    """ADVICE r17 — an injected orders= with rows but all-NULL
    o_custkey drives d_true to 0 (countDistinct of NULLs) while
    n_rows > 0: seen_ppm must read NULL in both engines, never an
    ANSI division error (the empty-frame sweep can't reach this —
    empty frames yield zero rows and no division)."""
    odf = spark.createDataFrame(
        [(k, None) for k in range(1, 17)],
        "o_orderkey long, o_custkey long",
    )
    rows = {
        r["s"]: r
        for r in QUERIES["agg_distinct_sample_curve"](
            spark, "unused", orders=odf
        ).collect()
    }
    assert rows[1]["n_rows"] == 16 and rows[1]["d_sample"] == 0
    for r in rows.values():
        assert r["d_true"] == 0 and r["seen_ppm"] is None


# ---------------------------------------------------------------------------
# Hypothesis property suites on the EXACT registered paths (frame injection)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SMALL = dict(max_examples=5, deadline=None)


@settings(**_SMALL)
@given(
    lead=st.integers(min_value=1, max_value=6),
    bump_at=st.integers(min_value=0, max_value=59),
    base=st.integers(min_value=1, max_value=3),
    amp=st.integers(min_value=5, max_value=9),
)
def test_leadlag_finds_planted_lead(spark, lead, bump_at, base, amp):
    """ts_leadlag_matrix on injected events (events= kwarg): plant
    type 'b' as an exact copy of type 'a' shifted LEAD hours later
    (single-bump profile, so no other alignment is perfect) — the
    (a, b) row must report best_lag == LEAD with the exact
    Cauchy-Schwarz score 10⁹."""
    H = 60
    pattern = [base] * H
    pattern[bump_at] = amp
    rows = []
    eid = 0
    for h in range(H):
        for i in range(pattern[h]):
            rows.append((eid, 0, (h * 3_600 + i) * 1_000_000, "a"))
            eid += 1
    for h in range(H):
        for i in range(pattern[h]):
            rows.append(
                (eid, 0, ((h + lead) * 3_600 + i) * 1_000_000, "b")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr(
        "event_id", "user_id", "timestamp_micros(us) AS ts", "event_type"
    )
    got = {
        (r["type_x"], r["type_y"]): (r["best_lag"], r["score_ppb"])
        for r in QUERIES["ts_leadlag_matrix"](spark, "unused", events=ev).collect()
    }
    assert got[("a", "b")] == (lead, 1_000_000_000)


@settings(**_SMALL)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-100_000, max_value=1_000_000),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_kanon_curve_risk_nesting_property(spark, rows):
    """pipeline_kanon_curve on injected customers (customers= kwarg):
    for ARBITRARY (nationkey, balance-cents) corpora — negative
    balances included — the registered path must equal the Counter
    twin and the at-risk row sets must NEST as buckets coarsen (a
    merged class only gains population)."""
    cust = spark.createDataFrame(
        [(n, c / 100) for n, c in rows],
        "c_nationkey long, c_acctbal double",
    )
    got = {
        r["width_cents"]: (r["n_classes"], r["n_below_k"], r["rows_at_risk"],
                           r["risk_ppm"])
        for r in QUERIES["pipeline_kanon_curve"](
            spark, "unused", customers=cust
        ).collect()
    }
    want, risk_sets = _kanon_twin(rows)
    assert got == want
    assert risk_sets[400_000] <= risk_sets[200_000] <= risk_sets[100_000]
