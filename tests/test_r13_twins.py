"""Independent pure-Python twins for the round-13 activations
(M283-M296) — the NEW-OP CROSS-CHECK DISCIPLINE (CLAUDE.md round 7):
Spark-vs-DuckDB parity cannot catch a shared-formula error, so every
formula-bearing new operator is re-derived here with hashlib / sets /
Counter / plain loops and compared against the REGISTERED query, plus
the ball2/reach2 shared-frontier consistency pin and the three
hypothesis property suites on the exact registered code paths (frame
injection through the registry wrapper's **kwargs).

(These ops were staged in round 11 as operators/staged_r13.py and
activated in round 13; oracle parity + partitioning invariance now run
through the registry-wide suites — tests/test_oracle_parity.py and
test_units.py's invariance probe.)
"""

from __future__ import annotations

from tests.conftest import SF_UNIT
from tropology_spark import QUERIES

# ---------------------------------------------------------------------------
# Pure-Python twins (the NEW-OP CROSS-CHECK DISCIPLINE)
# ---------------------------------------------------------------------------


def _docs(sf):
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()


def test_heaps_matches_pure_python(spark):
    """text_heaps_curve — Counter twin over doc_id prefixes; also pins
    vocab monotonicity in the prefix."""
    fn = QUERIES["text_heaps_curve"]
    texts = _docs(SF_UNIT)
    dm = max(d for d, _ in texts)
    want = {}
    for pct in (25, 50, 100):
        cut = (pct * dm) // 100
        toks = [
            tok
            for d, t in texts
            if d <= cut
            for tok in t.split(" ")
            if tok != ""
        ]
        vocab = set(toks)
        docs = {d for d, t in texts if d <= cut and any(x != "" for x in t.split(" "))}
        want[pct] = (
            len(docs), len(toks), len(vocab),
            (1_000_000 * len(vocab)) // len(toks),
        )
    got = {
        r["pct"]: (r["n_docs"], r["n_tokens"], r["n_vocab"], r["vocab_per_mtoken"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[25][2] <= got[50][2] <= got[100][2]


def test_minhash_estimate_matches_pure_python(spark):
    """dedup_minhash_estimate_error — signatures, agreement counts and
    exact bigram Jaccard recomputed with hashlib/sets (only the
    permutation CONSTANTS are imported)."""
    import hashlib
    from itertools import combinations

    from tropology_spark.operators.dedup import _MH_PERMS, _MH_PRIME

    fn = QUERIES["dedup_minhash_estimate_error"]
    texts = _docs(SF_UNIT)
    grams = {}
    sigs = {}
    for did, t in texts:
        toks = t.split(" ")
        g = {f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)}
        grams[did] = g
        hs = [int(hashlib.md5(x.encode()).hexdigest()[:8], 16) for x in g]
        if hs:
            sigs[did] = [
                min((h * a + b) % _MH_PRIME for h in hs) for a, b in _MH_PERMS
            ]
    # band 4x4 candidates
    buckets = {}
    for did, mh in sigs.items():
        for j in range(4):
            buckets.setdefault((j, tuple(mh[4 * j : 4 * j + 4])), []).append(did)
    cand = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            cand.add((a, b))
    want = {}
    for a, b in cand:
        agree = sum(1 for i in range(16) if sigs[a][i] == sigs[b][i])
        inter = len(grams[a] & grams[b])
        union = len(grams[a] | grams[b])
        est = 62500 * agree
        jac = (1_000_000 * inter) // union
        want[(a, b)] = (agree, est, jac, abs(est - jac))
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["agree"], r["est_ppm"], r["jac_ppm"], r["err_ppm"]
        )
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_hnsw_levels_matches_pure_python(spark):
    """sim_hnsw_levels — trailing-zero levels recomputed with hashlib;
    also pins the cumulative/geometric shape (n_cum halves-ish and
    level-0 cum equals the corpus)."""
    import hashlib

    import duckdb

    fn = QUERIES["sim_hnsw_levels"]
    ids = [
        v
        for (v,) in duckdb.sql(
            f"SELECT vec_id FROM read_parquet('{SF_UNIT}/embeddings.parquet')"
        ).fetchall()
    ]
    lv = {}
    for v in ids:
        w = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        lv[v] = (
            4 if w % 16 == 0 else 3 if w % 8 == 0 else
            2 if w % 4 == 0 else 1 if w % 2 == 0 else 0
        )
    n = len(ids)
    want = {}
    for level in range(5):
        n_nodes = sum(1 for x in lv.values() if x == level)
        n_cum = sum(1 for x in lv.values() if x >= level)
        want[level] = (n_nodes, n_cum, (1_000_000 * n_cum * (1 << level)) // n)
    got = {
        r["level"]: (r["n_nodes"], r["n_cum"], r["geo_ratio_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[0][1] == n


def test_walsh_matches_pure_python(spark):
    """ts_walsh_spectrum — the 8-point WHT recomputed with plain loops
    from raw event timestamps; also pins the exact Parseval identity
    Σ_j w_j² = 8·Σ_i c_i² per day."""
    from collections import Counter

    import duckdb

    fn = QUERIES["ts_walsh_spectrum"]
    rows = duckdb.sql(
        f"""SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT),
                   CAST((epoch_us(ts) // 10800000000) % 8 AS BIGINT)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    c = Counter(rows)
    days = {d for d, _ in rows}
    want = {}
    for d in days:
        for j in range(8):
            want[(d, j)] = sum(
                (1 - 2 * (bin(i & j).count("1") % 2)) * c.get((d, i), 0)
                for i in range(8)
            )
    got = {
        (r["day"], r["j"]): r["w"] for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    for d in days:
        lhs = sum(got[(d, j)] ** 2 for j in range(8))
        rhs = 8 * sum(c.get((d, i), 0) ** 2 for i in range(8))
        assert lhs == rhs, d  # Parseval, exact in integers


def test_cdc_dedup_matches_pure_python(spark):
    """mm_cdc_dedup_stats — boundaries, chunk extents, digests and the
    per-source dedup economics recomputed with hashlib."""
    import hashlib
    from collections import defaultdict

    import duckdb

    fn = QUERIES["mm_cdc_dedup_stats"]
    texts = duckdb.sql(
        f"SELECT doc_id, source, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))  # src -> dg -> [refs, cb]
    for did, src, t in texts:
        raw = t.encode("utf-8")
        hs = raw.hex().upper()
        nb = len(raw)
        if nb == 0:
            continue
        cuts = {1}
        for p in range(1, min(nb - 7, 4096) + 1):
            win = hs[2 * p - 2 : 2 * p - 2 + 16]
            if int(hashlib.md5(win.encode()).hexdigest()[:4], 16) % 64 == 0:
                cuts.add(p)
        cs = sorted(cuts) + [nb + 1]
        for a, b in zip(cs, cs[1:]):
            chunk = hs[2 * a - 2 : 2 * b - 2]
            dg = hashlib.md5(chunk.encode()).hexdigest()
            slot = per[src][dg]
            slot[0] += 1
            slot[1] = b - a
    want = {}
    for src, dgs in per.items():
        n_chunks = sum(r for r, _ in dgs.values())
        n_unique = len(dgs)
        bt = sum(r * cb for r, cb in dgs.values())
        bu = sum(cb for _, cb in dgs.values())
        want[src] = (
            n_chunks, n_unique, bt, bu, (1_000_000 * (bt - bu)) // bt,
        )
    got = {
        r["source"]: (
            r["n_chunks"], r["n_unique"], r["bytes_total"], r["bytes_unique"],
            r["saved_ppm"],
        )
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_spearman_matches_pure_python(spark):
    """ts_spearman_terms — doubled midranks and every co-moment term
    recomputed with plain dict arithmetic (arbitrary-precision ints
    check the DECIMAL/HUGEINT carriers)."""
    from collections import Counter

    import duckdb

    fn = QUERIES["ts_spearman_terms"]
    rows = duckdb.sql(
        f"""SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT), event_type
            FROM read_parquet('{SF_UNIT}/events.parquet')
            WHERE event_type IN ('click', 'purchase')"""
    ).fetchall()
    xc, yc = Counter(), Counter()
    hours = set()
    for h, t in rows:
        hours.add(h)
        if t == "click":
            xc[h] += 1
        else:
            yc[h] += 1
    xs = [xc.get(h, 0) for h in hours]
    ys = [yc.get(h, 0) for h in hours]

    def mid2(vals):
        cnt = Counter(vals)
        cum, m2 = 0, {}
        for v in sorted(cnt):
            m2[v] = (cum + 1) + (cum + cnt[v])
            cum += cnt[v]
        return [m2[v] for v in vals]

    u, v = mid2(xs), mid2(ys)
    n = len(hours)
    su, sv = sum(u), sum(v)
    suv = sum(a * b for a, b in zip(u, v))
    su2 = sum(a * a for a in u)
    sv2 = sum(b * b for b in v)
    want = (
        n, su, sv, suv, su2, sv2,
        n * suv - su * sv, n * su2 - su * su, n * sv2 - sv * sv,
    )
    r = fn(spark, SF_UNIT).collect()[0]
    got = (
        r["n"], r["su"], r["sv"], r["suv"], r["su2"], r["sv2"],
        r["rho_num"], r["den_x"], r["den_y"],
    )
    assert got == want


def test_did_matches_pure_python(spark):
    """analytics_did_terms — cells and the shifted integral division
    recomputed with arbitrary-precision Python ints."""
    import hashlib

    import duckdb

    fn = QUERIES["analytics_did_terms"]
    rows = duckdb.sql(
        f"""SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CAST(round(o_totalprice * 100) AS BIGINT), o_custkey
            FROM read_parquet('{SF_UNIT}/orders.parquet')"""
    ).fetchall()
    bd = (min(d for d, _, _ in rows) + max(d for d, _, _ in rows)) // 2
    n = {(t, p): 0 for t in (0, 1) for p in (0, 1)}
    s = {(t, p): 0 for t in (0, 1) for p in (0, 1)}
    for d, cents, ck in rows:
        t = 1 if hashlib.md5(str(ck).encode()).hexdigest()[0] < "8" else 0
        p = 1 if d > bd else 0
        n[(t, p)] += 1
        s[(t, p)] += cents
    num = (s[(1, 1)] * n[(1, 0)] - s[(1, 0)] * n[(1, 1)]) * n[(0, 1)] * n[(0, 0)] - (
        s[(0, 1)] * n[(0, 0)] - s[(0, 0)] * n[(0, 1)]
    ) * n[(1, 1)] * n[(1, 0)]
    den = n[(1, 1)] * n[(1, 0)] * n[(0, 1)] * n[(0, 0)]
    big = 1_000_000_000
    want = (
        n[(0, 0)], n[(0, 1)], n[(1, 0)], n[(1, 1)],
        s[(0, 0)], s[(0, 1)], s[(1, 0)], s[(1, 1)],
        (num + big * den) // den - big,
    )
    r = fn(spark, SF_UNIT).collect()[0]
    got = (
        r["n00"], r["n01"], r["n10"], r["n11"],
        r["s00"], r["s01"], r["s10"], r["s11"], r["did_cents"],
    )
    assert got == want


def test_ldp_matches_pure_python(spark):
    """pipeline_ldp_freq_audit — coins, replacement pick and the
    debias carrier recomputed with hashlib; also pins the exact
    algebraic identity Σ err3 = 0 (Σ t3_est ≡ 3n ≡ Σ 3·true)."""
    import hashlib
    from collections import Counter

    import duckdb

    fn = QUERIES["pipeline_ldp_freq_audit"]
    rows = duckdb.sql(
        f"""SELECT event_id, event_type
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    types = sorted({t for _, t in rows})
    true_c, rep_c = Counter(), Counter()
    for eid, t in rows:
        h = hashlib.md5(str(eid).encode()).hexdigest()
        true_c[t] += 1
        if h[0] < "8":
            rep_c[t] += 1
        else:
            j = int(h[1], 16) % 4
            i = types.index(t)
            rep_c[types[j + (1 if j >= i else 0)]] += 1
    n = len(rows)
    want = {
        t: (true_c[t], rep_c.get(t, 0), 8 * rep_c.get(t, 0) - n,
            8 * rep_c.get(t, 0) - n - 3 * true_c[t])
        for t in types
    }
    got = {
        r["event_type"]: (r["true_n"], r["reported_n"], r["t3_est"], r["err3"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert sum(e for *_, e in got.values()) == 0  # exact debias identity


def test_feature_window_matches_bruteforce(spark):
    """join_feature_window — the bucketed band equi-join equals the
    O(P x V) brute-force scan."""
    import duckdb

    fn = QUERIES["join_feature_window"]
    ev = duckdb.sql(
        f"""SELECT event_id, user_id, epoch_us(ts), event_type
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    acts = [(u, us, t) for _, u, us, t in ev if t in ("view", "click")]
    want = {}
    for eid, u, us, t in ev:
        if t != "purchase":
            continue
        nv = sum(
            1 for au, aus, at in acts
            if au == u and us - 86_400_000_000 <= aus < us and at == "view"
        )
        nc = sum(
            1 for au, aus, at in acts
            if au == u and us - 86_400_000_000 <= aus < us and at == "click"
        )
        want[eid] = (u, nv, nc)
    got = {
        r["event_id"]: (r["user_id"], r["n_views_24h"], r["n_clicks_24h"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_ball2_matches_pure_python(spark):
    """graph_ball2_sizes — seed pick and both ball sizes recomputed
    with sets."""
    from collections import Counter, defaultdict

    import duckdb

    fn = QUERIES["graph_ball2_sizes"]
    edges = duckdb.sql(
        f"""SELECT DISTINCT o_custkey, l_partkey
            FROM read_parquet('{SF_UNIT}/orders.parquet') o
            JOIN read_parquet('{SF_UNIT}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    out_n = defaultdict(set)
    in_n = defaultdict(set)
    deg = Counter()
    for s, d in edges:
        out_n[s].add(d)
        in_n[d].add(s)
        deg[s] += 1
    seeds = sorted(deg, key=lambda s: (-deg[s], s))[:3]
    want = {}
    for s in seeds:
        b2 = {w for d in out_n[s] for w in in_n[d]} - {s}
        want[s] = (len(out_n[s]), len(b2))
    got = {
        r["seed"]: (r["n_ball1"], r["n_ball2"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_importance_matches_pure_python(spark):
    """pipeline_importance_weights — weights and ESS contributions
    recomputed with Counter arithmetic."""
    from collections import Counter

    import duckdb

    fn = QUERIES["pipeline_importance_weights"]
    rows = duckdb.sql(
        f"SELECT source FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    n_s = Counter(s for (s,) in rows)
    total, k = sum(n_s.values()), len(n_s)
    want = {}
    for s, n in n_s.items():
        w = (1_000_000 * total) // (k * n)
        want[s] = (n, w, n * w, n * w * w)
    got = {
        r["source"]: (r["n_docs"], r["w_ppm"], r["contrib_w"], r["contrib_w2"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_pq_distortion_matches_pure_python(spark):
    """sim_pq_distortion — micro-unit codes and the self-ADC error
    recomputed with plain int loops; also pins the codebook anchor
    (vectors 1..8 at distortion 0)."""
    import duckdb

    fn = QUERIES["sim_pq_distortion"]
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF_UNIT}/embeddings.parquet')"
    ).fetchall()
    vm = {vid: [round(float(x) * 1_000_000) for x in emb] for vid, emb in rows}
    qerr = {}
    for vid, v in vm.items():
        e = 0
        for s, (lo, hi) in enumerate(((0, 32), (32, 64))):
            e += min(
                sum((v[i] - vm[c][i]) ** 2 for i in range(lo, hi))
                for c in range(1, 9)
            )
        qerr[vid] = e
    from collections import defaultdict

    want = defaultdict(lambda: [0, None, None, None])
    for vid, q in qerr.items():
        b = q // 10_000_000_000
        slot = want[b]
        slot[0] += 1
        slot[1] = q if slot[1] is None else min(slot[1], q)
        slot[2] = q if slot[2] is None else max(slot[2], q)
        slot[3] = vid if slot[3] is None else min(slot[3], vid)
    got = {
        r["bucket"]: [r["n_vectors"], r["min_qerr"], r["max_qerr"], r["min_vec_id"]]
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == {b: list(v) for b, v in want.items()}
    for c in range(1, 9):
        assert qerr[c] == 0  # the codebook anchor


# ---------------------------------------------------------------------------
# Property tests over the EXACT staged code paths (frame injection)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SMALL = dict(max_examples=8, deadline=None)

_EV_ROW = st.tuples(
    st.integers(min_value=0, max_value=5),      # user
    st.integers(min_value=0, max_value=400_000),  # seconds offset
    st.sampled_from(["view", "click", "purchase"]),
)


@settings(**_SMALL)
@given(rows=st.lists(_EV_ROW, min_size=1, max_size=60, unique=True))
def test_feature_window_bucket_idiom_on_random_events(spark, rows):
    """The M197 bucket-idiom guarantee on the exact staged path: on
    arbitrary event layouts (timestamps straddling bucket edges), the
    (b, b-1) probe explode + exact band filter equals the brute-force
    window count."""
    fn = QUERIES["join_feature_window"]
    base = 1_700_000_000_000_000  # epoch micros anchor
    data = [
        (i, u, (base + sec * 1_000_000), t)
        for i, (u, sec, t) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        [(i, u, us, t) for i, u, us, t in data],
        "event_id long, user_id long, us long, event_type string",
    ).selectExpr(
        "event_id", "user_id", "timestamp_micros(us) AS ts", "event_type"
    )
    got = {
        r["event_id"]: (r["n_views_24h"], r["n_clicks_24h"])
        for r in fn(spark, "unused", events=ev).collect()
    }
    want = {}
    for i, u, us, t in data:
        if t != "purchase":
            continue
        nv = sum(
            1 for _, au, aus, at in data
            if au == u and at == "view" and us - 86_400_000_000 <= aus < us
        )
        nc = sum(
            1 for _, au, aus, at in data
            if au == u and at == "click" and us - 86_400_000_000 <= aus < us
        )
        want[i] = (nv, nc)
    assert got == want


@settings(**_SMALL)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200_000),
            st.sampled_from(["view", "click", "purchase", "error", "signup"]),
        ),
        min_size=5,
        max_size=60,
    )
)
def test_walsh_parseval_on_injected_events(spark, rows):
    """The exact WHT energy identity Σ_j w_j² = 8·Σ_i c_i² per day, on
    the exact staged path over arbitrary event layouts — a formula
    error in the sign matrix or the zero-fill breaks it immediately."""
    fn = QUERIES["ts_walsh_spectrum"]
    base = 1_700_000_000_000_000
    ev = spark.createDataFrame(
        [
            (i, 0, base + sec * 1_000_000, t)
            for i, (sec, t) in enumerate(rows)
        ],
        "event_id long, user_id long, us long, event_type string",
    ).selectExpr("event_id", "user_id", "timestamp_micros(us) AS ts", "event_type")
    out = fn(spark, "unused", events=ev).collect()
    from collections import Counter, defaultdict

    c = Counter()
    for sec, _t in rows:
        us = base + sec * 1_000_000
        c[(us // 86_400_000_000, (us // 10_800_000_000) % 8)] += 1
    per_day = defaultdict(dict)
    for r in out:
        per_day[r["day"]][r["j"]] = r["w"]
    for day, ws in per_day.items():
        assert set(ws) == set(range(8))
        lhs = sum(w * w for w in ws.values())
        rhs = 8 * sum(c.get((day, i), 0) ** 2 for i in range(8))
        assert lhs == rhs, day


@settings(**_SMALL)
@given(
    rows=st.lists(
        st.sampled_from(["view", "click", "purchase", "error", "signup"]),
        min_size=5,
        max_size=80,
    )
)
def test_ldp_debias_identity_on_injected_events(spark, rows):
    """The exact k-RR debias algebra on the staged path: reported
    counts sum to n, and Σ err3 = 0 identically (Σ(8c − n) = 3n =
    Σ 3·true) — independent of the coin outcomes."""
    fn = QUERIES["pipeline_ldp_freq_audit"]
    base = 1_700_000_000_000_000
    ev = spark.createDataFrame(
        [(i, 0, base + i * 1_000_000, t) for i, t in enumerate(rows)],
        "event_id long, user_id long, us long, event_type string",
    ).selectExpr("event_id", "user_id", "timestamp_micros(us) AS ts", "event_type")
    got = fn(spark, "unused", events=ev).collect()
    n = len(rows)
    present = {t for t in rows}
    assert {r["event_type"] for r in got} == present
    assert sum(r["true_n"] for r in got) == n
    # reported counts can land on absent types only when k_present < 5;
    # the identity below holds exactly when all reported types are
    # present — restrict to that case.
    if len(present) == 5:
        assert sum(r["reported_n"] for r in got) == n
        assert sum(r["err3"] for r in got) == 0


def test_cms_width_matches_pure_python(spark):
    """agg_cms_width_curve — sketch cells, per-user min estimates and
    the error rollups recomputed with hashlib + dicts; also pins the
    CMS guarantees: overcount ≥ 0 everywhere, and (because 8 | 16 | 32
    makes narrower grids coarsenings of wider ones: ph % 8 ==
    (ph % 16) % 8) the total overcount is non-increasing in width."""
    import hashlib
    from collections import Counter

    import duckdb

    from tropology_spark.operators.aggregates import _CMS_PRIME, _CMS_ROWS

    fn = QUERIES["agg_cms_width_curve"]
    users = [
        u
        for (u,) in duckdb.sql(
            f"SELECT user_id FROM read_parquet('{SF_UNIT}/events.parquet')"
        ).fetchall()
    ]
    hv = {
        u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        for u in set(users)
    }
    true_n = Counter(users)
    want = {}
    for w in (8, 16, 32):
        cells = Counter()
        for u in users:
            for i, (a, b) in enumerate(_CMS_ROWS):
                cells[(i, ((hv[u] * a + b) % _CMS_PRIME) % w)] += 1
        n_exact = 0
        s_over = 0
        m_over = 0
        for u, t in true_n.items():
            est = min(
                cells[(i, ((hv[u] * a + b) % _CMS_PRIME) % w)]
                for i, (a, b) in enumerate(_CMS_ROWS)
            )
            assert est >= t  # CMS never underestimates
            n_exact += est == t
            s_over += est - t
            m_over = max(m_over, est - t)
        want[w] = (len(true_n), n_exact, s_over, m_over)
    got = {
        r["w"]: (r["n_users"], r["n_exact"], r["sum_overcount"], r["max_overcount"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[8][2] >= got[16][2] >= got[32][2]  # grid-refinement containment


def test_reach2_hll_matches_pure_python(spark):
    """graph_reach2_hll_audit — frontier, registers, dyadic carrier
    and the integral estimate recomputed with hashlib + Python ints;
    also pins n_exact == graph_ball2_sizes' n_ball2 (the two staged
    bodies share the frontier by construction)."""
    import hashlib
    from collections import Counter, defaultdict

    import duckdb

    from tropology_spark.operators.aggregates import _HLL_M, _HLL_NUM

    fn = QUERIES["graph_reach2_hll_audit"]
    edges = duckdb.sql(
        f"""SELECT DISTINCT o_custkey, l_partkey
            FROM read_parquet('{SF_UNIT}/orders.parquet') o
            JOIN read_parquet('{SF_UNIT}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    out_n = defaultdict(set)
    in_n = defaultdict(set)
    deg = Counter()
    for s, d in edges:
        out_n[s].add(d)
        in_n[d].add(s)
        deg[s] += 1
    seeds = sorted(deg, key=lambda s: (-deg[s], s))[:3]
    want = {}
    for s in seeds:
        b2 = {w for d in out_n[s] for w in in_n[d]} - {s}
        regs = defaultdict(int)
        for w in b2:
            h = hashlib.md5(str(w).encode()).hexdigest()
            bucket = int(h[0], 16)
            hw = int(h[1:9], 16)
            rho = 33 if hw == 0 else 33 - hw.bit_length()
            regs[bucket] = max(regs[bucket], rho)
        sc = sum(1 << (33 - regs[b]) for b in range(_HLL_M))
        est = _HLL_NUM // (1000 * sc)
        want[s] = (len(b2), est, (1_000_000 * est) // len(b2))
    got = {
        r["seed"]: (r["n_exact"], r["hll_est"], r["ratio_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    ball2 = {
        r["seed"]: r["n_ball2"]
        for r in QUERIES["graph_ball2_sizes"](spark, SF_UNIT).collect()
    }
    for s, (n_exact, _e, _r) in got.items():
        assert ball2[s] == n_exact  # shared frontier, cross-body pin


@settings(**_SMALL)
@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=6, max_size=40),
        min_size=1,
        max_size=4,
    )
)
def test_minhash_estimate_exact_on_duplicates(spark, texts):
    """The estimator's fixed point, on the exact staged path: a
    DUPLICATED document shares every shingle with its copy, so the
    pair must surface as an LSH candidate with agree = 16,
    est_ppm = jac_ppm = 10⁶ and err_ppm = 0 — any drift between the
    signature arithmetic and the exact-Jaccard side breaks the
    identity immediately (corpus built as originals + one verbatim
    copy each, ids offset by 1000)."""
    fn = QUERIES["dedup_minhash_estimate_error"]
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (1000 + i, t) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["agree"], r["est_ppm"], r["jac_ppm"], r["err_ppm"])
        for r in fn(spark, "unused", docs=docs).collect()
    }
    for i, t in enumerate(texts):
        if len(t.split(" ")) < 2 or all(x == "" for x in t.split(" ")):
            continue  # no bigram shingles -> no signature
        key = (i, 1000 + i)
        assert key in got, (t, sorted(got))
        assert got[key] == (16, 1_000_000, 1_000_000, 0), got[key]
