"""Pure-Python twins + property suites for the round-17 activations
(M328-M337) — converted from tests/test_staged_r17.py at activation
(the r9-r16 precedent: drop the staged-only parity/invariance/plan
sweeps — the registry-wide suites cover registered queries — keep the
twins and both hypothesis property suites, now running against
QUERIES, and add the seventh-fold branch-coverage injection pins).

Twins are hashlib / Counter / NumPy / big-int recomputations with no
SQL engine (DuckDB appears only as a parquet reader / cents-rounding
source) — the NEW-OP CROSS-CHECK DISCIPLINE: Spark-vs-DuckDB parity
cannot catch a shared-formula error; these can.
"""

from __future__ import annotations

from tests.conftest import SF_UNIT
from tropology_spark import QUERIES


def test_distinct_sample_curve_matches_pure_python(spark):
    """M328 — samples, distinct counts and the signed extrapolation
    errors recomputed with hashlib + sets; also pins the power-of-two
    sample NESTING s=16 ⊆ s=4 ⊆ s=1."""
    import hashlib

    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderkey, o_custkey
            FROM read_parquet('{SF_UNIT}/orders.parquet')"""
    ).fetchall()
    samples = {1: set(), 4: set(), 16: set()}
    counts = {1: 0, 4: 0, 16: 0}
    for ok, ck in rows:
        hk = int(hashlib.md5(str(int(ok)).encode()).hexdigest()[:8], 16)
        for s in samples:
            if hk % s == 0:
                samples[s].add(int(ck))
                counts[s] += 1
    d_true = len(samples[1])
    want = {
        s: (
            counts[s], len(ks), s * len(ks), d_true,
            s * len(ks) - d_true, (1_000_000 * len(ks)) // d_true,
        )
        for s, ks in samples.items()
    }
    got = {
        r["s"]: (r["n_rows"], r["d_sample"], r["est_naive"], r["d_true"],
                 r["err"], r["seen_ppm"])
        for r in QUERIES["agg_distinct_sample_curve"](spark, SF_UNIT).collect()
    }
    assert got == want
    assert samples[16] <= samples[4] <= samples[1]  # moduli nest


def test_zipf_rank_curve_matches_pure_python(spark):
    """M329 — vocabulary counts, ranks and the Zipf products recomputed
    with Counter + Python ints."""
    from collections import Counter

    import duckdb

    docs = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    vocab = Counter(t for (txt,) in docs for t in txt.split(" "))
    ranked = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    top = ranked[0][1]
    want = {
        r: (tok, c, top, (1_000_000 * c * r) // top,
            (1_000_000 * c * r) // top - 1_000_000)
        for r, (tok, c) in enumerate(ranked, 1)
    }
    got = {
        r["rank"]: (r["token"], r["freq"], r["top_freq"],
                    r["zipf_ratio_ppm"], r["dev_ppm"])
        for r in QUERIES["text_zipf_rank_curve"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_shard_balance_matches_pure_python(spark):
    """M330 — ring points re-derived with hashlib, per-shard occupancy,
    shares and deviations recomputed with ints; also pins the totals
    to the corpus size."""
    import hashlib

    import duckdb

    from tropology_spark.operators.pipeline_ops import _CH_MOD, _CH_VNODES

    ids = [
        int(d)
        for (d,) in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF_UNIT}/documents.parquet')"
        ).fetchall()
    ]
    ring = [
        (s, int(hashlib.md5(f"{s}_{v}".encode()).hexdigest()[:8], 16))
        for s in range(8)
        for v in range(_CH_VNODES)
    ]
    cnt = {("mod8", s): 0 for s in range(8)}
    cnt.update({("ring8", s): 0 for s in range(8)})
    for did in ids:
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16)
        cnt[("mod8", h % 8)] += 1
        ra = min(((r - h) % _CH_MOD, s, r) for s, r in ring)[1]
        cnt[("ring8", ra)] += 1
    n = len(ids)
    want = {
        k: (c, (1_000_000 * c) // n, 1000 * c - (1000 * n) // 8)
        for k, c in cnt.items()
    }
    got = {
        (r["scheme"], r["shard"]): (r["n_keys"], r["share_ppm"], r["dev_milli"])
        for r in QUERIES["pipeline_shard_balance"](spark, SF_UNIT).collect()
    }
    assert got == want
    for scheme in ("mod8", "ring8"):
        assert sum(got[(scheme, s)][0] for s in range(8)) == n


def test_reservoir_merge_matches_pure_python(spark):
    """M331 — both derivations recomputed with hashlib + sorted();
    pins the structural guarantee the audit exists for: merged ==
    global, positions and all, agree ≡ 1."""
    import hashlib

    import duckdb

    rows = duckdb.sql(
        f"""SELECT doc_id, source
            FROM read_parquet('{SF_UNIT}/documents.parquet')"""
    ).fetchall()
    keyed = sorted(
        (int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16), int(d), s)
        for d, s in rows
    )
    want = {
        d: (s, h, i, i, 1) for i, (h, d, s) in enumerate(keyed[:20], 1)
    }
    got = {
        r["doc_id"]: (r["source"], r["h"], r["pos_global"], r["pos_merged"],
                      r["agree"])
        for r in QUERIES["pipeline_reservoir_merge_audit"](spark, SF_UNIT).collect()
    }
    assert got == want
    assert len(got) == 20 and all(v[4] == 1 for v in got.values())


def test_dominant_period_matches_pure_python(spark):
    """M332 — hourly counts, per-lag co-moments and the fixed-point
    scores recomputed with Counter + Python big ints, including the
    (score DESC, lag) argmax."""
    from collections import Counter

    import duckdb

    rows = duckdb.sql(
        f"""SELECT event_type, epoch_us(ts) // 3600000000
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    hc = Counter((et, int(h)) for et, h in rows)
    types = {et for et, _h in hc}
    want = {}
    for et in types:
        series = {h: c for (t, h), c in hc.items() if t == et}
        best = None
        for lag in range(2, 49):
            pairs = [
                (series[h], series[h - lag])
                for h in series
                if h - lag in series
            ]
            m = len(pairs)
            if m < 24:
                continue
            sxy = sum(a * b for a, b in pairs)
            sh = sum(a for a, _b in pairs)
            st = sum(b for _a, b in pairs)
            shh = sum(a * a for a, _b in pairs)
            stt = sum(b * b for _a, b in pairs)
            num = m * sxy - sh * st
            dh = m * shh - sh * sh
            dt = m * stt - st * st
            if num <= 0 or dh <= 0 or dt <= 0:
                continue
            score = (1_000_000_000 * num * num) // (dh * dt)
            key = (-score, lag)
            if best is None or key < best[0]:
                best = (key, (lag, m, num, dh, dt, score))
        if best is not None:
            want[et] = best[1]
    got = {
        r["event_type"]: (r["best_lag"], r["m"], r["num"], r["dh"], r["dt"],
                          r["score_ppb"])
        for r in QUERIES["ts_dominant_period"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_misra_gries_matches_pure_python(spark):
    """M333 — per-shard counts, offset summaries, the merge, the
    re-prune and the exact meet recomputed with Counter; also pins
    est ≤ exact everywhere AND the mergeable-MG theory bound
    under ≤ Σ shard thresholds + merge threshold."""
    from collections import Counter, defaultdict

    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    sc = defaultdict(Counter)
    for did, txt in docs:
        toks = txt.split(" ")
        sc[int(did) % 4].update(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    merged = Counter()
    bound = 0
    for shard in sc:
        ranked = sorted(sc[shard].items(), key=lambda kv: (-kv[1], kv[0]))
        t_s = ranked[8][1] if len(ranked) > 8 else 0
        bound += t_s
        for bg, c in ranked[:8]:
            if c - t_s > 0:
                merged[bg] += c - t_s
    ranked_m = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
    t_m = ranked_m[8][1] if len(ranked_m) > 8 else 0
    bound += t_m
    gc = Counter()
    for c in sc.values():
        gc.update(c)
    want = {
        bg: (ws - t_m, gc[bg], gc[bg] - (ws - t_m))
        for bg, ws in ranked_m[:8]
        if ws - t_m > 0
    }
    got = {
        r["bigram"]: (r["est"], r["exact"], r["under"])
        for r in QUERIES["agg_misra_gries_audit"](spark, SF_UNIT).collect()
    }
    assert got == want
    for _bg, (est, exact, under) in got.items():
        assert 0 <= under == exact - est  # the summary only subtracts
        assert under <= bound  # the mergeable-MG error budget


def test_misra_gries_zero_error_spine(spark):
    """M333 seventh-fold branch pin — the fixture corpus always prunes
    (every shard has > k distinct bigrams), so the zero-error spine
    (every threshold 0, est == exact, under ≡ 0) is unreachable
    without injection: a 4-doc corpus (one per shard) with ≤ k
    distinct bigrams per shard must emit exact summaries."""
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(4)], "doc_id long, text string"
    )
    got = {
        (r["bigram"]): (r["est"], r["exact"], r["under"])
        for r in QUERIES["agg_misra_gries_audit"](
            spark, "unused", docs=docs
        ).collect()
    }
    assert got == {"a b": (4, 4, 0), "b c": (4, 4, 0)}


def test_reservoir_merge_empty_corpus(spark):
    """M331 seventh-fold branch pin — an EMPTY docs= frame flows
    through the two-pass global rank, the per-source windows and the
    join to zero rows (no guard exists to diverge)."""
    docs = spark.createDataFrame([], "doc_id long, source string")
    assert (
        QUERIES["pipeline_reservoir_merge_audit"](
            spark, "unused", docs=docs
        ).count()
        == 0
    )


def test_bloom_prefilter_empty_probe_propagates_null(spark):
    """M334 seventh-fold branch pin — an EMPTY probe side (li=) leaves
    n_probe/n_true NULL (sum over zero rows) and every derived column
    NULL-propagates: absence of evidence, loudly, never a fabricated
    zero.  n_pass stays 0 (the coalesced left join) and n_build keeps
    the real fixture build count."""
    li = spark.createDataFrame([], "l_partkey long")
    rows = QUERIES["join_bloom_prefilter_audit"](
        spark, SF_UNIT, li=li
    ).collect()
    assert sorted(r["bits_per_key"] for r in rows) == [8, 16]
    for r in rows:
        assert r["n_build"] > 0
        assert r["n_pass"] == 0
        for c in ("n_probe", "n_true", "n_fp", "fp_ppm", "reduction_ppm"):
            assert r[c] is None, (c, r[c])


def test_bloom_prefilter_matches_pure_python(spark):
    """M334 — filter bits, per-key hits and the weighted pass/true/fp
    masses recomputed with hashlib + Counter; also pins the
    no-false-negative guarantee n_pass >= n_true."""
    import hashlib
    from collections import Counter

    import duckdb

    build = {
        int(k)
        for (k,) in duckdb.sql(
            f"""SELECT p_partkey FROM read_parquet('{SF_UNIT}/part.parquet')
                WHERE p_size >= 40"""
        ).fetchall()
    }
    probe = Counter(
        int(k)
        for (k,) in duckdb.sql(
            f"SELECT l_partkey FROM read_parquet('{SF_UNIT}/lineitem.parquet')"
        ).fetchall()
    )

    def hh(k):
        hx = hashlib.md5(str(k).encode()).hexdigest()
        return int(hx[:8], 16), int(hx[8:16], 16)

    nb = len(build)
    n_probe = sum(probe.values())
    n_true = sum(c for k, c in probe.items() if k in build)
    want = {}
    for bpk in (8, 16):
        m = bpk * nb
        bits = {(h1 + j * h2) % m for k in build for h1, h2 in [hh(k)] for j in (0, 1)}
        n_pass = sum(
            c
            for k, c in probe.items()
            if all((hh(k)[0] + j * hh(k)[1]) % m in bits for j in (0, 1))
        )
        want[bpk] = (
            nb, n_probe, n_true, n_pass, n_pass - n_true,
            (1_000_000 * (n_pass - n_true)) // (n_probe - n_true),
            (1_000_000 * (n_probe - n_pass)) // n_probe,
        )
    got = {
        r["bits_per_key"]: (
            r["n_build"], r["n_probe"], r["n_true"], r["n_pass"], r["n_fp"],
            r["fp_ppm"], r["reduction_ppm"],
        )
        for r in QUERIES["join_bloom_prefilter_audit"](spark, SF_UNIT).collect()
    }
    assert got == want
    for bpk, (_nb, _np, nt, npass, _f, _fp, _red) in got.items():
        assert npass >= nt  # Bloom has no false negatives


def test_mutual_knn_consistent_with_registered(spark):
    """M335 — a composed audit: the mutual pairs recomputed in Python
    from the collected registered sim_knn_join frame."""
    knn = {
        (r["vec_id"], r["neighbor_id"]): (r["rn"], r["cosine"])
        for r in QUERIES["sim_knn_join"](spark, SF_UNIT).collect()
    }
    want = {}
    for (a, b), (rn_ab, cos) in knn.items():
        if a < b and (b, a) in knn:
            want[(a, b)] = (rn_ab, knn[(b, a)][0], cos)
    got = {
        (r["vec_a"], r["vec_b"]): (r["rn_ab"], r["rn_ba"], r["cosine"])
        for r in QUERIES["sim_mutual_knn"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_rocchio_matches_pure_python(spark):
    """M336 — both retrieval rounds, the shifted centroid floor and
    the overlap flags recomputed with NumPy round + Python big ints."""
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"""SELECT vec_id, embedding
            FROM read_parquet('{SF_UNIT}/embeddings.parquet')"""
    ).fetchall()
    vm = {
        int(vid): [
            int(x)
            for x in np.round(
                np.array(emb, dtype=np.float64) * 1_000_000
            ).astype(np.int64)
        ]
        for vid, emb in rows
    }
    q = vm[0]
    sc = {
        v: sum(a * b for a, b in zip(vec, q))
        for v, vec in vm.items()
        if v != 0
    }
    order0 = sorted(sc, key=lambda v: (-sc[v], v))
    top5, orig10 = order0[:5], set(order0[:10])
    cen = [
        sum(vm[v][p] for v in top5) // 5  # Python // IS the shifted floor
        for p in range(len(q))
    ]
    sc2 = {
        v: sum(a * b for a, b in zip(vec, cen))
        for v, vec in vm.items()
        if v != 0
    }
    order2 = sorted(sc2, key=lambda v: (-sc2[v], v))[:10]
    want = {
        rk: (v, sc2[v], 1 if v in orig10 else 0)
        for rk, v in enumerate(order2, 1)
    }
    got = {
        r["rk"]: (r["vec_id"], r["dot_c_u2"], r["in_orig10"])
        for r in QUERIES["sim_rocchio_feedback"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_lehr_matches_pure_python(spark):
    """M337 — every carrier recomputed with Python big ints from the
    DuckDB cents, including the signed shifted gap and the ceiled Lehr
    division."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/orders.parquet')
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"""
    ).fetchall()
    a = [int(c) for p, c in rows if p == "1-URGENT"]
    b = [int(c) for p, c in rows if p == "5-LOW"]
    na, nb = len(a), len(b)
    s1a, s1b = sum(a), sum(b)
    s2a, s2b = sum(x * x for x in a), sum(x * x for x in b)
    dnum = s1a * nb - s1b * na
    ssnum = nb * (na * s2a - s1a * s1a) + na * (nb * s2b - s1b * s1b)
    # floored pooled variance (cents²) FIRST — the two-step form that
    # keeps the final numerator ~10³² (the single-division clearing
    # measured 1.63e38 at sf0.1 and overflowed Decimal(38)).
    s2p = ssnum // ((na + nb - 2) * na * nb)
    d2 = dnum * dnum
    want = (
        na, nb, s1a // na, s1b // nb,
        (na * s2a - s1a * s1a) // na,
        (nb * s2b - s1b * s1b) // nb,
        (1000 * dnum) // (na * nb),  # Python // IS the shifted floor
        None if dnum == 0 else (16 * s2p * na * nb * na * nb + d2 - 1) // d2,
    )
    [r] = QUERIES["analytics_lehr_sample_size"](spark, SF_UNIT).collect()
    assert (
        r["na"], r["nb"], r["mean_a_cents"], r["mean_b_cents"],
        r["ssa"], r["ssb"], r["gap_milli_cents"], r["n_lehr"],
    ) == want


# ---------------------------------------------------------------------------
# Hypothesis property suites on the EXACT registered paths (frame injection)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SMALL = dict(max_examples=5, deadline=None)


@settings(**_SMALL)
@given(
    period=st.integers(min_value=2, max_value=12),
    base=st.integers(min_value=1, max_value=4),
    amp=st.integers(min_value=3, max_value=9),
)
def test_dominant_period_finds_planted_period(spark, period, base, amp):
    """M332 on injected events (events= kwarg): plant an exactly
    periodic hourly series (one bump per cycle — minimal period = the
    cycle length by construction) and the detector must return EXACTLY
    that period with a perfect score: at every multiple of P the
    shifted series is identical, Cauchy-Schwarz holds with equality
    (num² = dh·dt → score_ppb = 10⁹), and the (score DESC, lag)
    tie-break picks the smallest such lag = P."""
    if amp == base:
        amp += 1
    pattern = [amp] + [base] * (period - 1)
    rows = []
    eid = 0
    for h in range(120):
        for i in range(pattern[h % period]):
            us = (h * 3_600 + i) * 1_000_000
            rows.append((eid, 0, us, "click"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).selectExpr(
        "event_id", "user_id", "timestamp_micros(us) AS ts", "event_type"
    )
    [r] = QUERIES["ts_dominant_period"](spark, "unused", events=ev).collect()
    assert r["best_lag"] == period
    assert r["score_ppb"] == 1_000_000_000  # exact Cauchy-Schwarz equality


@settings(**_SMALL)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_reservoir_merge_property(spark, docs):
    """M331 on injected corpora (docs= kwarg): for ARBITRARY
    (doc_id, source) sets the merged per-source sample must equal the
    global sample — min(k, n) rows, agree ≡ 1, and the selected set is
    exactly the bottom-k by (h, doc_id)."""
    import hashlib

    d = spark.createDataFrame(list(docs), "doc_id long, source string")
    got = QUERIES["pipeline_reservoir_merge_audit"](
        spark, "unused", docs=d
    ).collect()
    keyed = sorted(
        (int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16), did)
        for did, _s in docs
    )
    want_ids = [did for _h, did in keyed[: min(20, len(docs))]]
    assert sorted(r["doc_id"] for r in got) == sorted(want_ids)
    assert all(r["agree"] == 1 for r in got)
    assert {r["doc_id"]: r["pos_global"] for r in got} == {
        did: i for i, (_h, did) in enumerate(keyed[: len(want_ids)], 1)
    }


# ---------------------------------------------------------------------------
# Self-review guard pins (round-17 activation review): the same ANSI
# division-by-zero probe-surface class the r16 ADVICE items closed,
# found on three of this round's own ops and guarded the same way.
# ---------------------------------------------------------------------------


def test_shard_balance_empty_corpus_guard(spark):
    """M330 — an empty docs= injection still emits the 16-row
    zero-filled spine: n_keys 0 everywhere, share_ppm guarded NULL in
    both engines (n_total = 0), dev_milli exactly 0."""
    docs = spark.createDataFrame([], "doc_id long")
    rows = QUERIES["pipeline_shard_balance"](
        spark, "unused", docs=docs
    ).collect()
    assert len(rows) == 16
    for r in rows:
        assert (r["n_keys"], r["share_ppm"], r["dev_milli"]) == (0, None, 0)


def test_lehr_degenerate_cohorts_guard(spark):
    """M337 — degenerate orders= injections: a single-cohort corpus
    (na = 0) NULLs the a-side mean/SS plus gap and n_lehr; a
    one-row-per-cohort corpus (na = nb = 1) has zero pooled degrees
    of freedom, so n_lehr is NULL while the means, SS carriers and
    the gap stay defined."""
    one_cohort = spark.createDataFrame(
        [("5-LOW", 1.00), ("5-LOW", 2.00)],
        "o_orderpriority string, o_totalprice double",
    )
    [r] = QUERIES["analytics_lehr_sample_size"](
        spark, "unused", orders=one_cohort
    ).collect()
    assert (r["na"], r["nb"]) == (0, 2)
    assert r["mean_a_cents"] is None and r["ssa"] is None
    assert r["mean_b_cents"] == 150 and r["ssb"] == (2 * 50000 - 90000) // 2
    assert r["gap_milli_cents"] is None and r["n_lehr"] is None

    one_each = spark.createDataFrame(
        [("1-URGENT", 1.00), ("5-LOW", 2.00)],
        "o_orderpriority string, o_totalprice double",
    )
    [r2] = QUERIES["analytics_lehr_sample_size"](
        spark, "unused", orders=one_each
    ).collect()
    assert (r2["na"], r2["nb"]) == (1, 1)
    assert (r2["mean_a_cents"], r2["mean_b_cents"]) == (100, 200)
    assert (r2["ssa"], r2["ssb"]) == (0, 0)
    assert r2["gap_milli_cents"] == (1000 * (100 - 200)) // 1 == -100000
    assert r2["n_lehr"] is None  # na + nb - 2 == 0: no pooled variance


def test_bloom_prefilter_all_member_probe_guard(spark):
    """M334 — an li= injection whose keys are ALL build-side members
    leaves no non-member mass: n_probe == n_true, fp_ppm guarded NULL
    in both engines; n_fp and reduction_ppm stay defined (the filter
    passes every member — no false negatives — so n_pass == n_probe
    and reduction_ppm == 0)."""
    import duckdb

    member_keys = [
        int(k)
        for (k,) in duckdb.sql(
            f"""SELECT p_partkey FROM read_parquet('{SF_UNIT}/part.parquet')
                WHERE p_size >= 40 LIMIT 5"""
        ).fetchall()
    ]
    assert member_keys, "fixture lost its p_size >= 40 parts"
    li = spark.createDataFrame([(k,) for k in member_keys], "l_partkey long")
    rows = QUERIES["join_bloom_prefilter_audit"](
        spark, SF_UNIT, li=li
    ).collect()
    assert sorted(r["bits_per_key"] for r in rows) == [8, 16]
    for r in rows:
        assert r["n_probe"] == r["n_true"] == r["n_pass"] == len(member_keys)
        assert r["fp_ppm"] is None
        assert (r["n_fp"], r["reduction_ppm"]) == (0, 0)


@settings(**_SMALL)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.lists(
                st.sampled_from(list("abcdef")), min_size=2, max_size=12
            ).map(" ".join),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_misra_gries_property(spark, docs):
    """M333 on injected corpora (docs= kwarg): for ARBITRARY
    (doc_id, text) sets the registered offset-form MG pipeline must
    equal a from-scratch Python Misra-Gries recompute (per-shard
    summaries, merge, re-prune), with est ≤ exact everywhere and the
    total under-estimate bounded by the sum of pruning thresholds —
    the mergeable-summary theory bound on corpora the fixture never
    shows (tiny shards, all-tie counts, empty summaries)."""
    from collections import Counter, defaultdict

    d = spark.createDataFrame(list(docs), "doc_id long, text string")
    sc = defaultdict(Counter)
    for did, txt in docs:
        toks = txt.split(" ")
        sc[did % 4].update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    merged = Counter()
    bound = 0
    for shard in sc:
        ranked = sorted(sc[shard].items(), key=lambda kv: (-kv[1], kv[0]))
        t_s = ranked[8][1] if len(ranked) > 8 else 0
        bound += t_s
        for bg, c in ranked[:8]:
            if c - t_s > 0:
                merged[bg] += c - t_s
    ranked_m = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
    t_m = ranked_m[8][1] if len(ranked_m) > 8 else 0
    bound += t_m
    gc = Counter()
    for c in sc.values():
        gc.update(c)
    want = {
        bg: (ws - t_m, gc[bg], gc[bg] - (ws - t_m))
        for bg, ws in ranked_m[:8]
        if ws - t_m > 0
    }
    got = {
        r["bigram"]: (r["est"], r["exact"], r["under"])
        for r in QUERIES["agg_misra_gries_audit"](
            spark, "unused", docs=d
        ).collect()
    }
    assert got == want
    for _bg, (est, exact, under) in got.items():
        assert 0 <= under == exact - est
        assert under <= bound


@settings(**_SMALL)
@given(
    member_idx=st.lists(
        st.integers(min_value=0, max_value=4), min_size=0, max_size=5,
        unique=True,
    ),
    extra=st.lists(
        st.integers(min_value=10**9, max_value=10**9 + 50),
        min_size=0, max_size=8, unique=True,
    ),
    mult=st.integers(min_value=1, max_value=3),
)
def test_bloom_prefilter_no_false_negative_property(
    spark, member_idx, extra, mult
):
    """M334 on injected probe sets (li= kwarg): for ARBITRARY mixes of
    build-side members and disjoint non-member keys (the 10⁹+ range
    the fixture never reaches), Bloom's structural guarantee holds at
    every bits-per-key: every member row passes (no false negatives ⇒
    n_pass ≥ n_true), n_true counts exactly the member mass, and
    n_probe the whole probe mass — weighted by multiplicity."""
    import duckdb

    fixture_members = [
        int(k)
        for (k,) in duckdb.sql(
            f"""SELECT p_partkey FROM read_parquet('{SF_UNIT}/part.parquet')
                WHERE p_size >= 40 ORDER BY p_partkey LIMIT 5"""
        ).fetchall()
    ]
    keys = [fixture_members[i] for i in member_idx] + list(extra)
    rows = [(k,) for k in keys for _ in range(mult)]
    li = spark.createDataFrame(rows, "l_partkey long")
    got = QUERIES["join_bloom_prefilter_audit"](spark, SF_UNIT, li=li).collect()
    assert sorted(r["bits_per_key"] for r in got) == [8, 16]
    n_probe = len(rows) if rows else None
    n_true = len(member_idx) * mult if rows else None
    for r in got:
        assert r["n_probe"] == n_probe and r["n_true"] == n_true
        if rows:
            assert r["n_pass"] >= r["n_true"]  # no false negatives
            assert r["n_fp"] == r["n_pass"] - r["n_true"] >= 0
        else:
            assert r["n_pass"] == 0 and r["n_fp"] is None
