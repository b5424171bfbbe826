"""Pure-Python twins + property suites for the round-19 activations
(M348-M357) — converted from tests/test_staged_r19.py at activation
(the r9-r18 pattern): the staged-only parity/invariance/plan sweeps
are dropped (registry-wide suites cover the activated queries), the
twins and the two hypothesis property suites run against QUERIES, and
the SEVENTH-fold branch-coverage injections pin the guard branches the
fixture can't reach (the LOO single-source NULL guard — new at
activation per the probe-kwarg guard rule — and the sample-bias
empty-sample NULL branch)."""

from __future__ import annotations

from tests.conftest import SF_UNIT
from tropology_spark import QUERIES


def test_winnowing_cte_factoring_is_byte_identical():
    """The _WINNOW_SEL_CTE factoring must reconstruct the registered
    M259 oracle exactly: the shared prefix ends at the sel CTE and
    the registered suffix starts at the final SELECT (the M353 oracle
    splices the same constant — this pin keeps them from drifting)."""
    from tropology_spark import ORACLES
    from tropology_spark.operators.text import _WINNOW_SEL_CTE

    oracle = ORACLES["text_winnowing_fingerprints"]
    assert oracle.startswith(_WINNOW_SEL_CTE)
    assert oracle[len(_WINNOW_SEL_CTE):].lstrip().startswith("SELECT doc_id")


# ---------------------------------------------------------------------------
# Twins (NEW-OP CROSS-CHECK DISCIPLINE) — hashlib / Counter / NumPy
# recomputations with arbitrary-precision ints; no SQL engine (DuckDB
# appears only as a parquet reader / cents-rounding source).
# ---------------------------------------------------------------------------


def _discord_twin(rows):
    """(type, day, hod) event rows -> per (type, day) the nearest
    other day and its exact squared L2 over zero-filled profiles."""
    from collections import Counter

    dc = Counter(rows)
    days = sorted({(t, d) for t, d, _h in dc})
    prof = {
        (t, d): [dc.get((t, d, h), 0) for h in range(24)] for t, d in days
    }
    out = {}
    for t, d in days:
        best = None
        for t2, d2 in days:
            if t2 != t or d2 == d:
                continue
            dist = sum(
                (a - b) * (a - b) for a, b in zip(prof[(t, d)], prof[(t2, d2)])
            )
            key = (dist, d2)
            if best is None or key < best:
                best = key
        if best is not None:
            out[(t, d)] = (best[1], best[0])
    return out


def test_discord_days_matches_pure_python(spark):
    """ts_discord_days — zero-filled profiles, pair distances and the
    argmin recomputed with Counter + Python ints."""
    import duckdb

    rows = [
        (et, int(d), int(h))
        for et, d, h in duckdb.sql(
            f"""SELECT event_type, epoch_us(ts) // 86400000000,
                       (epoch_us(ts) // 3600000000) % 24
                FROM read_parquet('{SF_UNIT}/events.parquet')"""
        ).fetchall()
    ]
    want = _discord_twin(rows)
    got = {
        (r["event_type"], r["day"]): (r["nn_day"], r["min_d2"])
        for r in QUERIES["ts_discord_days"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_linear_interpolate_matches_pure_python(spark):
    """ts_linear_interpolate — gaps, brackets and the rational
    interpolants recomputed with Counter + Python floor division;
    also pins every interpolant inside [min, max]·1000 of its
    brackets."""
    from collections import Counter

    import duckdb

    rows = duckdb.sql(
        f"""SELECT event_type, epoch_us(ts) // 3600000000
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    hv = Counter((et, int(h)) for et, h in rows)
    want = {}
    for et in {t for t, _h in hv}:
        hs = sorted(h for t, h in hv if t == et)
        for h1, h2 in zip(hs, hs[1:]):
            if h2 > h1 + 1:
                v1, v2 = hv[(et, h1)], hv[(et, h2)]
                for g in range(h1 + 1, h2):
                    want[(et, g)] = (
                        h1, h2, v1, v2,
                        (1000 * (v1 * (h2 - g) + v2 * (g - h1))) // (h2 - h1),
                    )
    got = {
        (r["event_type"], r["h"]): (
            r["prev_h"], r["next_h"], r["v_prev"], r["v_next"],
            r["interp_milli"],
        )
        for r in QUERIES["ts_linear_interpolate"](spark, SF_UNIT).collect()
    }
    assert got == want
    for _k, (_h1, _h2, v1, v2, im) in got.items():
        assert 1000 * min(v1, v2) <= im <= 1000 * max(v1, v2)


def test_loo_source_impact_matches_pure_python(spark):
    """pipeline_loo_source_impact — totals, floors and deltas
    recomputed with Counter ints."""
    from collections import defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT source, len(string_split(text, ' '))
            FROM read_parquet('{SF_UNIT}/documents.parquet')"""
    ).fetchall()
    agg = defaultdict(lambda: [0, 0])
    for src, t in rows:
        agg[src][0] += 1
        agg[src][1] += int(t)
    nn = sum(a[0] for a in agg.values())
    tt = sum(a[1] for a in agg.values())
    full = (1000 * tt) // nn
    want = {
        src: (n, t, full, (1000 * (tt - t)) // (nn - n),
              (1000 * (tt - t)) // (nn - n) - full)
        for src, (n, t) in agg.items()
    }
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["full_mean_milli"],
                      r["loo_mean_milli"], r["delta_milli"])
        for r in QUERIES["pipeline_loo_source_impact"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_loo_single_source_guard(spark):
    """SEVENTH-fold injection pin (the probe-kwarg guard rule): a
    SINGLE-SOURCE corpus has no leave-one-out population (nn ==
    n_docs) — the fixture never reaches this branch, an injected
    ``docs=`` frame does.  loo/delta must be NULL (not a
    division-by-zero error) and the full mean stays exact."""
    docs = spark.createDataFrame(
        [(1, "only", "a b c"), (2, "only", "d e")],
        "doc_id long, source string, text string",
    )
    rows = QUERIES["pipeline_loo_source_impact"](
        spark, "unused", docs=docs
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["source"] == "only"
    assert (r["n_docs"], r["n_tokens"]) == (2, 5)
    assert r["full_mean_milli"] == (1000 * 5) // 2
    assert r["loo_mean_milli"] is None
    assert r["delta_milli"] is None


def test_log2_histogram_matches_pure_python(spark):
    """agg_log2_value_histogram — buckets via int.bit_length and the
    per-bucket stats recomputed in Python; also pins the power-of-two
    bucket bounds 2^(b−1) <= min <= max < 2^b."""
    from collections import defaultdict

    import duckdb

    cents = [
        int(c)
        for (c,) in duckdb.sql(
            f"""SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                FROM read_parquet('{SF_UNIT}/orders.parquet')"""
        ).fetchall()
    ]
    agg = defaultdict(list)
    for c in cents:
        agg[c.bit_length()].append(c)
    want = {
        b: (len(v), min(v), max(v), sum(v)) for b, v in agg.items()
    }
    got = {
        r["bucket"]: (r["n_orders"], r["min_cents"], r["max_cents"],
                      r["sum_cents"])
        for r in QUERIES["agg_log2_value_histogram"](spark, SF_UNIT).collect()
    }
    assert got == want
    for b, (_n, mn, mx, _s) in got.items():
        assert (1 << (b - 1)) <= mn <= mx < (1 << b)


def test_knn_hubness_consistent_with_registered(spark):
    """sim_knn_hubness — the in-degree histogram recomputed in Python
    from the collected registered kNN frame; also pins the edge-mass
    identity Σ degree·count == |kNN edges| and the spine identity
    Σ count == |corpus|."""
    from collections import Counter

    import duckdb

    knn = QUERIES["sim_knn_join"](spark, SF_UNIT).collect()
    indeg = Counter(r["neighbor_id"] for r in knn)
    vecs = [
        int(v)
        for (v,) in duckdb.sql(
            f"SELECT vec_id FROM read_parquet('{SF_UNIT}/embeddings.parquet')"
        ).fetchall()
    ]
    per = Counter(indeg.get(v, 0) for v in vecs)
    firsts = {}
    for v in sorted(vecs):
        d = indeg.get(v, 0)
        firsts.setdefault(d, v)
    want = {d: (n, firsts[d]) for d, n in per.items()}
    got = {
        r["in_degree"]: (r["n_vectors"], r["first_vec"])
        for r in QUERIES["sim_knn_hubness"](spark, SF_UNIT).collect()
    }
    assert got == want
    assert sum(d * n for d, (n, _f) in got.items()) == len(knn)
    assert sum(n for n, _f in got.values()) == len(vecs)


def _winnow_sel_twin(docs, w=4):
    """hashlib recompute of the winnowing selection sets (the r15
    twin construction): doc_id -> (n_grams, selected-mh set)."""
    import hashlib

    out = {}
    for did, t in docs:
        toks = t.split(" ")
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        n_g = len(grams)
        if n_g < w:
            continue
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
        out[did] = (n_g, {min(hs[i : i + w]) for i in range(n_g - w + 1)})
    return out


def test_moss_pairs_matches_pure_python(spark):
    """dedup_moss_pairs — selections re-derived with hashlib (fully
    independent of the SQL single home) and the pair/containment
    arithmetic recomputed with sets."""
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    sel = _winnow_sel_twin([(int(d), t) for d, t in docs])
    ids = sorted(sel)
    want = {}
    for i, da in enumerate(ids):
        for db in ids[i + 1:]:
            shared = len(sel[da][1] & sel[db][1])
            if shared >= 2:
                na, nb = len(sel[da][1]), len(sel[db][1])
                want[(da, db)] = (
                    shared, na, nb, (1_000_000 * shared) // min(na, nb)
                )
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared"], r["n_sel_a"], r["n_sel_b"],
                                   r["cont_ppm"])
        for r in QUERIES["dedup_moss_pairs"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_katz3_consistent_with_registered(spark):
    """graph_katz3_score — the dyadic 16/4/1 assembly and top-20
    recomputed in Python from the collected registered path-count
    frame."""
    from collections import defaultdict

    pc = QUERIES["graph_path_counts3"](spark, SF_UNIT).collect()
    acc = defaultdict(lambda: [0, 0, 0])
    for r in pc:
        acc[r["node"]][r["hop"] - 1] += r["n_paths"]
    scored = sorted(
        (
            (16 * p1 + 4 * p2 + p3, node, p1, p2, p3)
            for node, (p1, p2, p3) in acc.items()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    want = {node: (k, p1, p2, p3) for k, node, p1, p2, p3 in scored}
    got = {
        r["node"]: (r["katz_x64"], r["p1"], r["p2"], r["p3"])
        for r in QUERIES["graph_katz3_score"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_elasticity_matches_pure_python(spark):
    """analytics_price_elasticity_terms — per-part demand, per-brand
    co-moments and the signed slope numerators recomputed with
    Counter ints; pins slope_den >= 0."""
    from collections import defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT p.p_brand, p.p_partkey,
                   CAST(round(p.p_retailprice * 100) AS BIGINT),
                   CAST(round(l.l_quantity) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/part.parquet') p
            JOIN read_parquet('{SF_UNIT}/lineitem.parquet') l
              ON l.l_partkey = p.p_partkey"""
    ).fetchall()
    per = defaultdict(lambda: [0, 0])
    for b, pk, x, q in rows:
        per[(b, int(pk))][1] += int(q)
        per[(b, int(pk))][0] = int(x)
    acc = defaultdict(lambda: [0, 0, 0, 0, 0])
    for (b, _pk), (x, y) in per.items():
        a = acc[b]
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] += x * y
        a[4] += x * x
    want = {
        b: (n, sx, sy, sxy, sxx, n * sxy - sx * sy, n * sxx - sx * sx)
        for b, (n, sx, sy, sxy, sxx) in acc.items()
    }
    got = {
        r["brand"]: (r["n_parts"], r["s_x"], r["s_y"], r["s_xy"], r["s_xx"],
                     r["slope_num"], r["slope_den"])
        for r in QUERIES["analytics_price_elasticity_terms"](
            spark, SF_UNIT
        ).collect()
    }
    assert got == want
    assert all(v[6] >= 0 for v in got.values())


def test_sample_bias_matches_pure_python(spark):
    """pipeline_sample_bias_audit — the md5 sample membership and both
    floor means recomputed with hashlib ints (NULL on empty
    samples)."""
    import hashlib
    from collections import defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT doc_id, source, len(string_split(text, ' '))
            FROM read_parquet('{SF_UNIT}/documents.parquet')"""
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])  # nf, tf, ns, ts
    for did, src, t in rows:
        hk = int(hashlib.md5(str(int(did)).encode()).hexdigest()[:8], 16)
        a = agg[src]
        a[0] += 1
        a[1] += int(t)
        if hk % 16 == 0:
            a[2] += 1
            a[3] += int(t)
    want = {}
    for src, (nf, tf, ns, ts) in agg.items():
        fm = (1000 * tf) // nf
        sm = None if ns == 0 else (1000 * ts) // ns
        want[src] = (nf, ns, fm, sm, None if sm is None else sm - fm)
    got = {
        r["source"]: (r["n_full"], r["n_sample"], r["full_mean_milli"],
                      r["sample_mean_milli"], r["bias_milli"])
        for r in QUERIES["pipeline_sample_bias_audit"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_sample_bias_empty_sample_guard(spark):
    """SEVENTH-fold injection pin: a source whose md5 1/16 sample is
    EMPTY reports NULL sample mean and bias (absence of evidence,
    loudly).  doc_ids are chosen with hashlib so every id hashes to a
    NON-zero residue mod 16 — the branch the sf fixture may never
    reach."""
    import hashlib

    ids = [
        i
        for i in range(1, 200)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 16 != 0
    ][:5]
    assert len(ids) == 5
    docs = spark.createDataFrame(
        [(i, "s", "w x y z") for i in ids],
        "doc_id long, source string, text string",
    )
    rows = QUERIES["pipeline_sample_bias_audit"](
        spark, "unused", docs=docs
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_full"], r["n_sample"]) == (5, 0)
    assert r["full_mean_milli"] == 4000
    assert r["sample_mean_milli"] is None
    assert r["bias_milli"] is None


def test_gini_by_month_matches_pure_python(spark):
    """analytics_gini_by_month — monthly spend, ranks and the Lorenz
    carriers recomputed with sorted() + Python big ints; pins
    0 <= gini_ppm < 10⁶."""
    from collections import defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT year(o_orderdate) * 100 + month(o_orderdate),
                   o_custkey, CAST(round(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/orders.parquet')"""
    ).fetchall()
    spend = defaultdict(int)
    for mk, ck, c in rows:
        spend[(int(mk), int(ck))] += int(c)
    months = defaultdict(list)
    for (mk, ck), s in spend.items():
        months[mk].append((s, ck))
    want = {}
    for mk, lst in months.items():
        lst.sort()
        n = len(lst)
        tot = sum(s for s, _c in lst)
        s1 = sum(i * s for i, (s, _c) in enumerate(lst, 1))
        want[mk] = (
            n, tot,
            (1_000_000 * (2 * s1 - (n + 1) * tot)) // (n * tot),
        )
    got = {
        r["month_key"]: (r["n_customers"], r["total_cents"], r["gini_ppm"])
        for r in QUERIES["analytics_gini_by_month"](spark, SF_UNIT).collect()
    }
    assert got == want
    assert all(0 <= v[2] < 1_000_000 for v in got.values())


# ---------------------------------------------------------------------------
# Hypothesis property suites on the EXACT registered paths (frame
# injection via the probe kwargs)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SMALL = dict(max_examples=5, deadline=None)


@settings(**_SMALL)
@given(
    a=st.integers(min_value=1, max_value=20),
    b=st.integers(min_value=0, max_value=5),
    gaps=st.lists(st.integers(min_value=2, max_value=6), min_size=1, max_size=4),
)
def test_linear_interpolate_recovers_exact_line(spark, a, b, gaps):
    """ts_linear_interpolate on injected events (events= kwarg): when
    the observed points lie EXACTLY on a line v = a + b·h, every
    interpolant must equal the line exactly (the numerator factors as
    (h2−h1)·(a+b·h), so the division is exact) — interp_milli ==
    1000·(a + b·h) at every filled hour."""
    hours = [0]
    for g in gaps:
        hours.append(hours[-1] + g)
    rows = []
    eid = 0
    for h in hours:
        v = a + b * h
        for i in range(v):
            rows.append((eid, 0, (h * 3_600 + i) * 1_000_000, "click"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr(
        "event_id", "user_id", "timestamp_micros(us) AS ts", "event_type"
    )
    got = {
        r["h"]: r["interp_milli"]
        for r in QUERIES["ts_linear_interpolate"](
            spark, "unused", events=ev
        ).collect()
    }
    want = {
        h: 1000 * (a + b * h)
        for h1, h2 in zip(hours, hours[1:])
        if h2 > h1 + 1
        for h in range(h1 + 1, h2)
    }
    assert got == want


@settings(**_SMALL)
@given(
    base=st.lists(st.integers(min_value=0, max_value=4), min_size=24, max_size=24),
    odd_day=st.integers(min_value=0, max_value=3),
    bump_hod=st.integers(min_value=0, max_value=23),
    bump=st.integers(min_value=3, max_value=8),
    n_days=st.integers(min_value=3, max_value=4),
)
def test_discord_days_isolates_planted_anomaly(spark, base, odd_day, bump_hod, bump, n_days):
    """ts_discord_days on injected events (events= kwarg): n identical
    days with ONE day bumped on one hour — every normal day's nearest
    neighbor is a twin at distance 0, and the planted day's
    min-distance is exactly bump² (it IS the discord)."""
    odd_day = odd_day % n_days
    base_day = 20_000
    rows = []
    eid = 0
    for d in range(n_days):
        for hod in range(24):
            c = base[hod] + (bump if d == odd_day and hod == bump_hod else 0)
            for i in range(c):
                us = ((base_day + d) * 86_400 + hod * 3_600 + i) * 1_000_000
                rows.append((eid, 0, us, "click"))
                eid += 1
    if not rows:
        return
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr(
        "event_id", "user_id", "timestamp_micros(us) AS ts", "event_type"
    )
    got = {
        r["day"] - base_day: r["min_d2"]
        for r in QUERIES["ts_discord_days"](spark, "unused", events=ev).collect()
        if r["event_type"] == "click"
    }
    # days with zero total events never enter the day spine
    present = {
        d for d in range(n_days)
        if sum(base) + (bump if d == odd_day else 0) > 0
    }
    normal = {d for d in present if d != odd_day}
    for d in got:
        if d == odd_day and len(normal) >= 1:
            assert got[d] == (bump * bump if len(normal) >= 1 else 0)
        elif d in normal and len(normal) >= 2:
            assert got[d] == 0
