"""Independent pure-Python twins for the round-9 activations
(M226-M242) — the NEW-OP CROSS-CHECK DISCIPLINE (CLAUDE.md round 7):
Spark-vs-DuckDB parity cannot catch a shared-formula error, so every
formula-bearing new operator is re-derived here with hashlib / sets /
Counter / plain loops and compared against the REGISTERED query.

(These ops were staged in round 8 as operators/staged_r9.py and
activated in round 9; oracle parity + partitioning invariance now run
through the registry-wide suites — tests/test_oracle_parity.py and
test_units.py's invariance probe — so this file keeps only the twins.)
"""

from __future__ import annotations

from tests.conftest import SF_UNIT
from tropology_spark import QUERIES


def test_skyline_matches_bruteforce(spark):
    """M228 — the linear-sweep skyline equals the O(n²) Python
    dominance scan."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT),
                   CAST(p_size AS BIGINT)
            FROM read_parquet('{SF_UNIT}/part.parquet')"""
    ).fetchall()
    want = set()
    for k, c, s in rows:
        dominated = any(
            dc <= c and ds >= s and (dc < c or ds > s) for _, dc, ds in rows
        )
        if not dominated:
            want.add((k, c, s))
    got = {
        (r["p_partkey"], r["cents"], r["size"])
        for r in QUERIES["join_skyline_pareto"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_bpe_vocab4_matches_pure_python(spark):
    """M227 — four Counter/str.replace merge rounds (the M221 twin,
    iterated)."""
    from collections import Counter

    import duckdb

    texts = [
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM read_parquet('{SF_UNIT}/documents.parquet')"
        ).fetchall()
    ]
    toks = [w for t in texts for w in t.split(" ")]

    def counts(tokens):
        c = Counter()
        for w in tokens:
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
        return c

    def top(c, k=10):
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(p, n, i + 1) for i, (p, n) in enumerate(ordered)]

    def disp(p):
        for r in range(1, 5):
            p = p.replace(chr(r), str(r))
        return p

    want = set()
    cur = toks
    for r in range(1, 5):
        c = counts(cur)
        want |= {(r, disp(p), n, rn) for p, n, rn in top(c)}
        mpair = top(c, 1)[0][0]
        cur = [w.replace(mpair, chr(r)) for w in cur]
    got = {
        (r["merge_round"], r["pair"], r["n"], r["rn"])
        for r in QUERIES["text_bpe_vocab4"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_survival_curve_matches_pure_python(spark):
    """M229 — survival at k == #customers with lifetime >= k, per
    cohort."""
    from collections import defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_custkey,
                   CAST(min(datediff('day', DATE '1970-01-01',
                                     CAST(o_orderdate AS DATE))) // 7 AS BIGINT),
                   CAST(max(datediff('day', DATE '1970-01-01',
                                     CAST(o_orderdate AS DATE))) // 7 AS BIGINT)
            FROM read_parquet('{SF_UNIT}/orders.parquet') GROUP BY 1"""
    ).fetchall()
    lifetimes = defaultdict(list)
    for _, fw, lw in rows:
        lifetimes[fw].append(lw - fw)
    want = {}
    for cohort, offs in lifetimes.items():
        for k in set(offs):
            want[(cohort, k)] = sum(1 for o in offs if o >= k)
    got = {
        (r["cohort_week"], r["k"]): r["n_surviving"]
        for r in QUERIES["analytics_survival_curve"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_winback_matches_pure_python(spark):
    """M233 — winbacks = gaps >= threshold in the sorted per-user
    active-day list."""
    from collections import defaultdict

    import duckdb

    from tropology_spark.operators.analytics import _WINBACK_GAP_DAYS

    rows = duckdb.sql(
        f"""SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    days = defaultdict(list)
    for u, d in rows:
        days[u].append(d)
    stats = []
    for u, ds in days.items():
        ds.sort()
        gaps = [b - a for a, b in zip(ds, ds[1:])]
        nw = sum(1 for g in gaps if g >= _WINBACK_GAP_DAYS)
        if nw > 0:
            stats.append((u, nw, max(gaps), len(ds)))
    stats.sort(key=lambda t: (-t[1], t[0]))
    want = {(u, nw, mg, na) for u, nw, mg, na in stats[:20]}
    got = {
        (r["user_id"], r["n_winbacks"], r["max_gap_days"], r["n_active_days"])
        for r in QUERIES["analytics_winback_counts"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_xcorr_matches_pure_python(spark):
    """M234 — lagged co-moment terms from plain dict arithmetic over
    the observed-hour spine."""
    from collections import Counter

    import duckdb

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    spine = {h for _, h in rows}
    cx = Counter(h for t, h in rows if t == "click")
    cy = Counter(h for t, h in rows if t == "purchase")
    want = {}
    for lag in range(4):
        pts = [
            (cx.get(h - lag, 0), cy.get(h, 0))
            for h in spine
            if (h - lag) in spine
        ]
        want[lag] = (
            len(pts),
            sum(x for x, _ in pts),
            sum(y for _, y in pts),
            sum(x * y for x, y in pts),
            sum(x * x for x, _ in pts),
            sum(y * y for _, y in pts),
        )
    got = {
        r["lag"]: (
            r["n_hours"], r["sum_x"], r["sum_y"],
            r["sum_xy"], r["sum_x2"], r["sum_y2"],
        )
        for r in QUERIES["ts_xcorr_lagged_terms"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_open_orders_sweep_matches_pure_python(spark):
    """M236 — the sweep's open_after equals a brute-force interval
    count at every change day."""
    import duckdb

    ivs = duckdb.sql(
        f"""SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
            FROM read_parquet('{SF_UNIT}/orders.parquet') o
            JOIN read_parquet('{SF_UNIT}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    days = sorted({d for iv in ivs for d in iv})
    got = {
        r["day"]: (r["n_opened"], r["n_shipped"], r["open_after"])
        for r in QUERIES["ts_open_orders_sweep"](spark, SF_UNIT).collect()
    }
    assert set(got) == set(days)
    for day in days:
        n_open = sum(1 for od, _ in ivs if od == day)
        n_ship = sum(1 for _, sd in ivs if sd == day)
        # open_after counts lines opened by `day` minus lines whose
        # ship day is <= day  (post-change value)
        open_after = sum(1 for od, _ in ivs if od <= day) - sum(
            1 for _, sd in ivs if sd <= day
        )
        assert got[day] == (n_open, n_ship, open_after), day


def test_dataset_diff_matches_pure_python(spark):
    """M237 — the diff classification from plain dict arithmetic over
    the derived versions."""
    from collections import Counter

    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    va = {i: t for i, t in rows if i % 17 != 3}
    vb = {
        i: (t + " zchanged" if i % 19 == 0 else t)
        for i, t in rows
        if i % 13 != 5
    }
    n = Counter()
    chars = Counter()
    for i in set(va) | set(vb):
        if i not in va:
            st = "added"
        elif i not in vb:
            st = "removed"
        elif va[i] != vb[i]:
            st = "changed"
        else:
            st = "unchanged"
        n[st] += 1
        chars[st] += len(vb.get(i, va.get(i)))
    got = {
        r["status"]: (r["n_docs"], r["n_chars"])
        for r in QUERIES["pipeline_dataset_diff"](spark, SF_UNIT).collect()
    }
    assert got == {st: (n[st], chars[st]) for st in n}


def test_session_overlap_matches_pure_python(spark):
    """M238 — the bucketed interval-overlap join equals a brute-force
    pairwise intersect over Python-built spans (sessionization
    recomputed from scratch with plain lists)."""
    from collections import defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id, event_id, epoch_us(ts)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    by_user = defaultdict(list)
    for u, e, us in rows:
        by_user[u].append((us, e))
    spans = []
    for u, evs in by_user.items():
        evs.sort()
        start = prev = evs[0][0]
        for us, _ in evs[1:]:
            if us - prev > 30 * 60 * 1_000_000:
                spans.append((u, start, prev))
                start = us
            prev = us
        spans.append((u, start, prev))
    counts = defaultdict(int)
    for i, (ua, sa, ea) in enumerate(spans):
        for ub, sb, eb in spans[i + 1:]:
            if ua == ub:
                continue
            if sa <= eb and sb <= ea:
                x, y = min(ua, ub), max(ua, ub)
                counts[(x, y)] += 1
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {(a, b, n) for (a, b), n in ordered}
    got = {
        (r["user_a"], r["user_b"], r["n_overlaps"])
        for r in QUERIES["join_session_overlap"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_window_funnel_matches_pure_python(spark):
    """M239 — windowed first-touch chain from plain dict arithmetic."""
    from collections import defaultdict

    import duckdb

    from tropology_spark.operators.analytics import _FUNNEL_STEPS, _WF_WINDOW_US

    rows = duckdb.sql(
        f"""SELECT user_id, event_type, epoch_us(ts)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    by_user = defaultdict(lambda: defaultdict(list))
    for u, t, us in rows:
        by_user[u][t].append(us)
    a, b, c = _FUNNEL_STEPS
    n1 = n2 = n3 = 0
    for u, evs in by_user.items():
        if not evs.get(a):
            continue
        n1 += 1
        t1 = min(evs[a])
        lim = t1 + _WF_WINDOW_US
        b2 = [x for x in evs.get(b, []) if t1 < x <= lim]
        if not b2:
            continue
        n2 += 1
        t2 = min(b2)
        if any(t2 < x <= lim for x in evs.get(c, [])):
            n3 += 1
    got = {
        r["step"]: r["n_users"]
        for r in QUERIES["analytics_window_funnel"](spark, SF_UNIT).collect()
    }
    assert got == {1: n1, 2: n2, 3: n3}
