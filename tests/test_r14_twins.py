"""Independent pure-Python twins for the round-14 activations
(M297-M308) — the NEW-OP CROSS-CHECK DISCIPLINE (CLAUDE.md round 7):
Spark-vs-DuckDB parity cannot catch a shared-formula error, so every
formula-bearing new operator is re-derived here with hashlib / sets /
Counter / NumPy / plain loops and compared against the REGISTERED
query, plus the two hypothesis property suites on the exact registered
code paths (frame injection through the registry wrapper's **kwargs).

(These ops were staged in round 12 as operators/staged_r14.py and
activated in round 14; oracle parity + partitioning invariance now run
through the registry-wide suites — tests/test_oracle_parity.py and
test_units.py's invariance probe.)
"""

from __future__ import annotations

from tests.conftest import SF_UNIT
from tropology_spark import QUERIES


def test_decay_matches_pure_python(spark):
    """agg_exp_decay_counts — dyadic weights recomputed with plain
    ints; also pins the dyadic bound decayed <= 4096 * n."""
    from collections import Counter, defaultdict

    import duckdb

    fn = QUERIES["agg_exp_decay_counts"]
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


def test_burstiness_matches_pure_python(spark):
    """text_burstiness_terms — top-k cut, per-day counts and the
    variance numerator recomputed with Counters; also pins the
    variance identity var_num_x29 = 29·Σc² − total² ≥ 0 iff ...
    (it is 29²·population variance — always ≥ 0 when absent days
    count as zeros, exactly the zero-fill the algebra encodes)."""
    from collections import Counter, defaultdict

    import duckdb

    fn = QUERIES["text_burstiness_terms"]
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


def test_cascade_matches_registered_sets(spark):
    """pipeline_cascade_marginals — recompute the cascade from the
    four REGISTERED flag sets (the composed-audit rule) and pin the
    accounting identities: Σ marginal = |union|, marginal ≤ flagged
    per stage, cum_removed is the running sum, and stage-1 marginal
    equals its flag count (nothing runs before exact)."""
    from collections import defaultdict

    fn = QUERIES["pipeline_cascade_marginals"]
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


def test_hurst_matches_pure_python(spark):
    """ts_hurst_rs_terms — spine, windows, n-scaled cumulative
    deviations, ranges and variance numerators recomputed with plain
    int loops."""
    from collections import Counter

    import duckdb

    fn = QUERIES["ts_hurst_rs_terms"]
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
    fn = QUERIES["ts_hurst_rs_terms"]
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


# ---------------------------------------------------------------------------
# Twins for the round-14 extension slate (second staging session)
# ---------------------------------------------------------------------------


def test_srm_matches_pure_python(spark):
    """analytics_srm_audit — cohort split counts and the milli-chi2
    carrier recomputed with hashlib + Counters; also pins the identity
    Σ dev over cohorts = n_A_total − n_B_total."""
    import hashlib
    from collections import defaultdict

    import duckdb

    fn = QUERIES["analytics_srm_audit"]
    rows = duckdb.sql(
        f"""SELECT user_id,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    d0 = {}
    for uid, d in rows:
        d0[uid] = min(d, d0.get(uid, d))
    coh = defaultdict(lambda: [0, 0])
    for uid, d in d0.items():
        a = hashlib.md5(str(uid).encode()).hexdigest()[0] < "8"
        coh[d][0 if a else 1] += 1
    want = {
        d: (na, nb, na + nb, na - nb, (1000 * (na - nb) * (na - nb)) // (na + nb))
        for d, (na, nb) in coh.items()
    }
    got_rows = fn(spark, SF_UNIT).collect()
    got = {
        r["cohort_day"]: (r["n_a"], r["n_b"], r["n_users"], r["dev"], r["chisq_milli"])
        for r in got_rows
    }
    assert got == want
    assert sum(r["dev"] for r in got_rows) == sum(
        na - nb for na, nb, *_ in want.values()
    )


def test_bloom_fpr_matches_pure_python(spark):
    """agg_bloom_fpr_curve — bit sets, double-hash positions, and
    false positives recomputed with hashlib + Python ints; also pins
    FPR monotone non-increasing in bits-per-key."""
    import hashlib

    import duckdb

    fn = QUERIES["agg_bloom_fpr_curve"]
    mem = {
        int(k)
        for (k,) in duckdb.sql(
            f"SELECT DISTINCT o_custkey FROM read_parquet('{SF_UNIT}/orders.parquet')"
        ).fetchall()
    }
    probes = [
        int(k) + 1_000_000_000
        for (k,) in duckdb.sql(
            f"SELECT c_custkey FROM read_parquet('{SF_UNIT}/customer.parquet')"
        ).fetchall()
    ]
    n_members = len(mem)

    def h12(k):
        hx = hashlib.md5(str(k).encode()).hexdigest()
        return int(hx[:8], 16), int(hx[8:16], 16)

    want = {}
    for bpk in (8, 16, 32):
        m = bpk * n_members
        bits = set()
        for k in mem:
            h1, h2 = h12(k)
            bits.add(h1 % m)
            bits.add((h1 + h2) % m)
        n_fp = 0
        for k in probes:
            h1, h2 = h12(k)
            if h1 % m in bits and (h1 + h2) % m in bits:
                n_fp += 1
        want[bpk] = (
            n_members, len(probes), n_fp, (1_000_000 * n_fp) // len(probes),
        )
    got = {
        r["bits_per_key"]: (r["n_members"], r["n_nonmembers"], r["n_fp"], r["fpr_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    fprs = [got[b][3] for b in (8, 16, 32)]
    assert fprs[0] >= fprs[1] >= fprs[2]  # more bits, fewer false positives


def test_continuation_matches_pure_python(spark):
    """text_continuation_terms — bigram counts, continuation counts,
    and the follower Simpson numerator recomputed with Counters over
    the exact split(' ') tokenization (empty tokens included — the J6
    discipline)."""
    from collections import Counter, defaultdict

    import duckdb

    fn = QUERIES["text_continuation_terms"]
    texts = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    bc = defaultdict(Counter)
    for (t,) in texts:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            bc[a][b] += 1
    agg = {
        tok: (
            sum(c.values()),
            len(c),
            sum(v * (v - 1) for v in c.values()),
        )
        for tok, c in bc.items()
    }
    top = sorted(agg, key=lambda t: (-agg[t][0], t))[:20]
    want = {
        tok: (*agg[tok], rk) for rk, tok in enumerate(top, 1)
    }
    got = {
        r["token"]: (r["n_bigrams"], r["n_continuations"], r["simpson_num"], r["rk"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_truncation_matches_pure_python(spark):
    """pipeline_truncation_loss_curve — histogram cut recomputed with
    plain ints; also pins the curve monotonicity (lost and docs_over
    non-increasing in max_len) and kept+lost = total."""
    import duckdb

    fn = QUERIES["pipeline_truncation_loss_curve"]
    lens = [
        len(t.split(" "))
        for (t,) in duckdb.sql(
            f"SELECT text FROM read_parquet('{SF_UNIT}/documents.parquet')"
        ).fetchall()
    ]
    total = sum(lens)
    want = {}
    for L in (128, 256, 512):
        lost = sum(max(0, n - L) for n in lens)
        over = sum(1 for n in lens if n > L)
        want[L] = (over, lost, total, (1_000_000 * lost) // total)
    got = {
        r["max_len"]: (r["n_docs_over"], r["tokens_lost"], r["tokens_total"], r["loss_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[128][1] >= got[256][1] >= got[512][1]
    assert got[128][0] >= got[256][0] >= got[512][0]


def test_quantizer_drift_matches_pure_python(spark):
    """sim_quantizer_drift — one NumPy Lloyd round (cell means, 6-dp
    cosine, (ccos DESC, cell) tie-break) compared cell by cell; also
    pins the conservation identities Σn_before = Σn_after = n_vectors
    and n_stayed ≤ min(n_before, n_after) per cell."""
    from collections import defaultdict

    import duckdb
    import numpy as np

    fn = QUERIES["sim_quantizer_drift"]
    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{SF_UNIT}/embeddings.parquet')"
    ).fetchall()
    ids = [int(r[0]) for r in rows]
    lab = {int(r[0]): int(r[1]) for r in rows}
    m = np.array([r[2] for r in rows], dtype=np.float64)
    idx = {v: i for i, v in enumerate(ids)}
    nv = {v: float(np.linalg.norm(m[idx[v]])) for v in ids}
    cells = sorted(set(lab.values()))
    cen = {}
    for c in cells:
        members = [v for v in ids if lab[v] == c]
        cen[c] = m[[idx[v] for v in members]].mean(axis=0)
    nc = {c: float(np.linalg.norm(cen[c])) for c in cells}
    assign1 = {}
    for v in ids:
        scored = sorted(
            (
                (-round(float(np.dot(m[idx[v]], cen[c])) / (nv[v] * nc[c]), 6), c)
                for c in cells
            ),
        )
        assign1[v] = scored[0][1]
    before = defaultdict(int)
    after = defaultdict(int)
    stayed = defaultdict(int)
    for v in ids:
        before[lab[v]] += 1
        after[assign1[v]] += 1
        if assign1[v] == lab[v]:
            stayed[assign1[v]] += 1
    want = {}
    for c in set(before) | set(after):
        na = after.get(c, 0)
        ns = stayed.get(c, 0)
        want[c] = (
            before.get(c, 0), na, ns, na - ns,
            0 if na == 0 else (1_000_000 * (na - ns)) // na,
        )
    got = {
        r["cell"]: (r["n_before"], r["n_after"], r["n_stayed"], r["n_arrived"], r["arrived_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == sum(v[1] for v in got.values()) == len(ids)
    for c, (nb, na, ns, *_rest) in got.items():
        assert ns <= min(nb, na)


def test_record_hours_matches_pure_python(spark):
    """ts_record_hours — prefix maxima recomputed with plain loops."""
    from collections import Counter, defaultdict

    import duckdb

    fn = QUERIES["ts_record_hours"]
    rows = duckdb.sql(
        f"""SELECT event_type,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
                     + hour(ts)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    cnt = Counter(rows)
    series = defaultdict(dict)
    for (et, h), n in cnt.items():
        series[et][h] = n
    want = {}
    for et, hs in series.items():
        best = None
        n_rec = 0
        last = None
        for h in sorted(hs):
            if best is None or hs[h] > best:
                n_rec += 1
                last = h
                best = max(best or 0, hs[h])
        want[et] = (len(hs), n_rec, last, max(hs.values()))
    got = {
        r["event_type"]: (r["n_hours"], r["n_records"], r["last_record_h"], r["max_n"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_sequential_matches_pure_python(spark):
    """analytics_sequential_counts — per-day cumulative users and
    converters recomputed with hashlib + dict loops; also pins
    monotonicity of both cumulative columns and converted ≤ users."""
    import hashlib
    from collections import defaultdict

    import duckdb

    fn = QUERIES["analytics_sequential_counts"]
    rows = duckdb.sql(
        f"""SELECT user_id, event_type,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    d0 = {}
    fp = {}
    days = set()
    for uid, et, d in rows:
        days.add(d)
        d0[uid] = min(d, d0.get(uid, d))
        if et == "purchase":
            fp[uid] = min(d, fp.get(uid, d))
    var = {
        uid: ("A" if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8" else "B")
        for uid in d0
    }
    want = {}
    for v in ("A", "B"):
        cu = cc = 0
        nu = defaultdict(int)
        nc = defaultdict(int)
        for uid in d0:
            if var[uid] != v:
                continue
            nu[d0[uid]] += 1
            if uid in fp:
                nc[fp[uid]] += 1
        for d in sorted(days):
            cu += nu.get(d, 0)
            cc += nc.get(d, 0)
            want[(d, v)] = (cu, cc, 0 if cu == 0 else (1_000_000 * cc) // cu)
    got_rows = fn(spark, SF_UNIT).collect()
    got = {
        (r["day"], r["variant"]): (r["cum_users"], r["cum_converted"], r["conv_ppm"])
        for r in got_rows
    }
    assert got == want
    for v in ("A", "B"):
        seq = sorted(
            (d for d, vv in got if vv == v),
        )
        for a, b in zip(seq, seq[1:]):
            assert got[(b, v)][0] >= got[(a, v)][0]
            assert got[(b, v)][1] >= got[(a, v)][1]
    for (_d, _v), (cu, cc, _p) in got.items():
        assert cc <= cu


def test_degree_gini_matches_pure_python(spark):
    """graph_degree_gini — the Lorenz identity recomputed with
    arbitrary-precision Python ints over the distinct edge list."""
    from collections import Counter

    import duckdb

    fn = QUERIES["graph_degree_gini"]
    pairs = duckdb.sql(
        f"""SELECT DISTINCT o_custkey AS src, l_partkey AS dst
            FROM read_parquet('{SF_UNIT}/orders.parquet') o
            JOIN read_parquet('{SF_UNIT}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    deg = Counter(dst for _src, dst in pairs)
    ranked = sorted(deg.items(), key=lambda t: (t[1], t[0]))
    n = len(ranked)
    total = sum(d for _, d in ranked)
    s1 = sum(pos * d for pos, (_, d) in enumerate(ranked, 1))
    gini_ppm = (1_000_000 * (2 * s1 - (n + 1) * total)) // (n * total)
    rows = fn(spark, SF_UNIT).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_nodes"], r["total_degree"], r["gini_ppm"]) == (n, total, gini_ppm)
    assert 0 <= r["gini_ppm"] < 1_000_000


@settings(**_SMALL)
@given(
    series=st.lists(
        st.integers(min_value=1, max_value=9), min_size=2, max_size=24
    )
)
def test_record_hours_property_prefix_maxima(spark, series):
    """ts_record_hours on injected series (events= kwarg): the staged
    path must equal the pure prefix-maxima recompute for ARBITRARY
    hourly series — every count/record/argmax column, not just the
    fixture's."""
    fn = QUERIES["ts_record_hours"]
    base = 1_700_000_000_000_000
    rows = [
        (h * 100 + i, 0, base + h * 3_600_000_000 + i, "click")
        for h, n in enumerate(series)
        for i in range(n)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr("event_id", "user_id", "timestamp_micros(us) AS ts", "event_type")
    got = {r["event_type"]: r for r in fn(spark, "unused", events=ev).collect()}
    best = None
    n_rec = 0
    last_i = None
    for i, n in enumerate(series):
        if best is None or n > best:
            n_rec += 1
            last_i = i
            best = n
    r = got["click"]
    assert r["n_hours"] == len(series)
    assert r["n_records"] == n_rec
    assert r["max_n"] == max(series)
    # last_record_h is the absolute hour of the last record index
    h0 = base // 3_600_000_000
    assert r["last_record_h"] - h0 == last_i


@settings(**_SMALL)
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=120),  # age crosses 12 HLs
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_exp_decay_property_dyadic_weights(spark, days):
    """agg_exp_decay_counts on injected series (events= kwarg): the
    registered path must equal the pure dyadic recompute for ARBITRARY
    age layouts — including ages PAST 12 half-lives, where the weight
    is exactly 0 (the fixture spans ~1 month, so parity and the
    fixture twin never exercise that branch; ages up to 120 days do)."""
    fn = QUERIES["agg_exp_decay_counts"]
    dmax = max(a for a, _ in days)
    base = 1_700_000_000_000_000
    rows = [
        (a * 1000 + i, 0, base + (dmax - a) * 86_400_000_000 + i, "click")
        for a, n in days
        for i in range(n)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr("event_id", "user_id", "timestamp_micros(us) AS ts", "event_type")
    # ages are measured from the corpus max DAY on the epoch-day axis,
    # which the base offset preserves (base is far from a day edge? no
    # — recompute ages exactly as the op does, from epoch days)
    base_day = base // 86_400_000_000
    day_of = lambda a: (base + (dmax - a) * 86_400_000_000) // 86_400_000_000
    corpus_max = max(day_of(a) for a, _ in days)
    want_n = sum(n for _, n in days)
    want_dec = 0
    for a, n in days:
        hl = (corpus_max - day_of(a)) // 7
        want_dec += n * (0 if hl >= 12 else 4096 // (1 << hl))
    r = fn(spark, "unused", events=ev).collect()
    assert len(r) == 1 and r[0]["event_type"] == "click"
    assert (r[0]["n_events"], r[0]["decayed_x4096"]) == (want_n, want_dec)
    assert r[0]["mean_weight_x4096"] == want_dec // want_n


def test_bloom_fpr_zero_fp_rows_still_emitted(spark):
    """agg_bloom_fpr_curve's config spine is a LEFT join: with a
    single member and a single (almost surely) missing probe, every
    bits-per-key row must still appear with n_fp = 0 and fpr_ppm = 0
    (the fixture plausibly has false positives at every config, so
    the zero branch needs an injection to be exercised at all)."""
    fn = QUERIES["agg_bloom_fpr_curve"]
    mem = spark.createDataFrame([(1,)], "k long")
    probes = spark.createDataFrame([(2_000_000_007,)], "k long")
    got = {
        r["bits_per_key"]: (r["n_members"], r["n_nonmembers"], r["n_fp"], r["fpr_ppm"])
        for r in fn(spark, "unused", mem=mem, probes=probes).collect()
    }
    # replicate the k=2 double-hash membership check to confirm the
    # probe genuinely misses at every config (else the corpus choice
    # stopped being a zero-fp case and this test must pick another key)
    import hashlib

    def h12(k):
        hx = hashlib.md5(str(k).encode()).hexdigest()
        return int(hx[:8], 16), int(hx[8:16], 16)

    for bpk in (8, 16, 32):
        m = bpk * 1
        h1m, h2m = h12(1)
        bits = {h1m % m, (h1m + h2m) % m}
        h1p, h2p = h12(2_000_000_007)
        is_fp = h1p % m in bits and (h1p + h2p) % m in bits
        want_fp = 1 if is_fp else 0
        assert got[bpk] == (1, 1, want_fp, want_fp * 1_000_000)
    assert sum(v[2] for v in got.values()) < 3, "pick a probe key that misses"


def test_quantizer_drift_emptied_cell_row(spark):
    """sim_quantizer_drift's drift signal is the EMPTIED cell (the
    full-outer merge + the arrived_ppm zero-guard) — a branch the
    fixture's one Lloyd round plausibly never reaches.  Inject two
    seed cells with IDENTICAL centroids: every member ties on cosine
    and the (ccos DESC, cell) tie-break sends all of them to the
    lower cell id, so the higher cell must emit a
    (n_before=2, n_after=0, stayed=0, arrived=0, ppm=0) row."""
    fn = QUERIES["sim_quantizer_drift"]

    def pad(x, y):  # the Lloyd chain runs at the fixture EMB_DIM=64
        return [x, y] + [0.0] * 62

    vecs = [
        (0, 0, pad(1.0, 0.2)), (1, 0, pad(1.0, -0.2)),
        (2, 1, pad(1.0, 0.01)), (3, 1, pad(1.0, -0.01)),
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, label long, embedding array<double>"
    )
    got = {r["cell"]: r for r in fn(spark, "unused", e=emb).collect()}
    assert set(got) == {0, 1}
    r1 = got[1]
    assert (r1["n_before"], r1["n_after"], r1["n_stayed"],
            r1["n_arrived"], r1["arrived_ppm"]) == (2, 0, 0, 0, 0)
    r0 = got[0]
    assert (r0["n_before"], r0["n_after"], r0["n_stayed"]) == (2, 4, 2)
    assert r0["n_arrived"] == 2 and r0["arrived_ppm"] == 500_000


def test_sequential_counts_zero_users_guard(spark):
    """analytics_sequential_counts' conv_ppm guard at cum_users = 0 —
    the fixture has users in both md5 variants from day one, so the
    guard needs an injection: variant A (user 6, md5 '1…') signs up
    on day 0, variant B (user 1, md5 'c…') only on day 1, so the
    (day 0, B) spine row must read (0, 0, 0) instead of dividing."""
    fn = QUERIES["analytics_sequential_counts"]
    base = 1_700_006_400_000_000  # mid-day: no day-edge ambiguity
    rows = [
        (1, 6, base, "purchase"),               # day d0, variant A, converts
        (2, 1, base + 86_400_000_000, "click"), # day d0+1, variant B
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr("event_id", "user_id", "timestamp_micros(us) AS ts", "event_type")
    got = {
        (r["day"], r["variant"]): (r["cum_users"], r["cum_converted"], r["conv_ppm"])
        for r in fn(spark, "unused", events=ev).collect()
    }
    d0 = base // 86_400_000_000
    assert got[(d0, "B")] == (0, 0, 0)                 # the guarded row
    assert got[(d0, "A")] == (1, 1, 1_000_000)
    assert got[(d0 + 1, "A")] == (1, 1, 1_000_000)
    assert got[(d0 + 1, "B")] == (1, 0, 0)


def test_hurst_span_over_spine_cap_keeps_complete_windows_only(spark):
    """ADVICE r14 (low), fixed: a span over the 4096-hour spine cap
    used to admit a truncated trailing window (the complete-window
    bound read the UNCAPPED hmax).  Inject a 5001-hour unit-rate
    series (events= kwarg): the spine holds hours h0..h0+4096, so the
    complete-window counts must be 4097 div w — 512 at w=8, 256 at
    w=16 — covering exactly 4096 hours each (sum_x = 4096, never
    4097), with zero range and zero variance on the constant series."""
    fn = QUERIES["ts_hurst_rs_terms"]
    base_us = 1_700_000_000_000_000 - (1_700_000_000_000_000 % 3_600_000_000)
    rows = [(i, 0, base_us + i * 3_600_000_000, "click") for i in range(5001)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr("event_id", "user_id", "timestamp_micros(us) AS ts", "event_type")
    got = {
        r["w"]: (r["n_windows"], r["sum_r_xw"], r["sum_s2num"], r["sum_x"])
        for r in fn(spark, "unused", events=ev).collect()
    }
    assert got == {8: (512, 0, 0, 4096), 16: (256, 0, 0, 4096)}
