"""Independent pure-Python twins for the round-12 activations
(M270-M282) — the NEW-OP CROSS-CHECK DISCIPLINE (CLAUDE.md round 7):
Spark-vs-DuckDB parity cannot catch a shared-formula error, so every
formula-bearing new operator is re-derived here with hashlib / sets /
Counter / NumPy / plain loops and compared against the REGISTERED
query, plus the IVF+PQ-vs-PQ consistency pin and the four hypothesis
property suites on the exact registered code paths (frame injection
through the registry wrapper's **kwargs).

(These ops were staged in round 11 as operators/staged_r12.py and
activated in round 12; oracle parity + partitioning invariance now run
through the registry-wide suites — tests/test_oracle_parity.py and
test_units.py's invariance probe.)
"""

from __future__ import annotations

from tests.conftest import SF_UNIT, make_duckdb
from tropology_spark import QUERIES


def _load_vm():
    """Embeddings as int64 micro-unit vectors keyed by vec_id."""
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_UNIT}/embeddings.parquet')"
    ).fetchall()
    ids = [int(r[0]) for r in rows]
    m = np.array([r[1] for r in rows], dtype=np.float64)
    vm = np.round(m * 1_000_000).astype(np.int64)
    return ids, vm


def test_sq8_matches_pure_python(spark):
    """M270 — codes, reconstruction, and ADC top-10 recomputed with
    NumPy int64 arithmetic (floor division on non-negative numerators
    == both engines' div)."""
    import numpy as np

    ids, vm = _load_vm()
    idx = {v: i for i, v in enumerate(ids)}
    mn = vm.min(axis=0)
    mx = vm.max(axis=0)
    span = mx - mn
    assert (span > 0).all()  # fixture guarantee the CASE guard covers
    qi = idx[0]
    corpus = [v for v in ids if v != 0]
    code = ((vm - mn) * 255) // span
    recon = mn + (code * span) // 255
    scores = {v: int(np.dot(vm[qi], recon[idx[v]])) for v in corpus}
    order = sorted(corpus, key=lambda v: (-scores[v], v))[:10]
    want = {(rk, v, scores[v]) for rk, v in enumerate(order, 1)}

    got_rows = QUERIES["sim_sq8_recall"](spark, SF_UNIT).collect()
    got = {(r["rk"], r["vec_id"], r["adc_score"]) for r in got_rows}
    assert got == want
    # hit flags sum to |SQ8 top10 ∩ exact top10| — bounded sanity
    assert 0 <= sum(r["hit"] for r in got_rows) <= 10


def test_ams_f2_matches_pure_python(spark):
    """M271 — counters, estimates, exact F2, and the wide ppm carrier
    recomputed with hashlib + Counter + Python ints."""
    import hashlib
    from collections import Counter

    import duckdb

    from tropology_spark.operators.aggregates import _AMS_PAIRS, _AMS_PRIME

    pks = [
        int(r[0])
        for r in duckdb.sql(
            f"SELECT l_partkey FROM read_parquet('{SF_UNIT}/lineitem.parquet')"
        ).fetchall()
    ]
    f2 = sum(c * c for c in Counter(pks).values())
    want = set()
    for j, (a, b) in enumerate(_AMS_PAIRS):
        c = 0
        for pk in pks:
            h = int(hashlib.md5(str(pk).encode()).hexdigest()[:8], 16)
            c += 1 if ((h * a + b) % _AMS_PRIME) % 2 == 0 else -1
        want.add((j, c, c * c, f2, (c * c * 1_000_000) // f2))

    got = {
        (r["sketch_id"], r["counter"], r["est"], r["f2_exact"], r["ratio_ppm"])
        for r in QUERIES["agg_ams_f2"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_bm25_matches_pure_python(spark):
    """M272 — the integer rational milli carrier recomputed with
    Counter arithmetic over the exact split(' ') tokenization."""
    from collections import Counter

    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    tf: Counter = Counter()
    dl: Counter = Counter()
    dfc: Counter = Counter()
    for doc_id, text in docs:
        toks = text.split(" ")
        dl[doc_id] = len(toks)
        for t in toks:
            tf[(doc_id, t)] += 1
        for t in set(toks):
            dfc[t] += 1
    d_total = sum(dl.values())
    n_docs = len(docs)
    terms = sorted(dfc, key=lambda t: (-dfc[t], t))[:5]
    want = set()
    for t in terms:
        scored = []
        for (doc_id, tok), f in tf.items():
            if tok != t:
                continue
            milli = (22000 * f * d_total) // (
                10 * f * d_total + 3 * d_total + 9 * dl[doc_id] * n_docs
            )
            scored.append((doc_id, f, dl[doc_id], milli))
        scored.sort(key=lambda r: (-r[3], r[0]))
        for rk, (doc_id, f, length, milli) in enumerate(scored[:10], 1):
            want.add((t, doc_id, f, length, dfc[t], n_docs, milli, rk))

    got = {
        (
            r["token"], r["doc_id"], r["tf"], r["dl"], r["df"],
            r["n_docs"], r["milli_tf_comp"], r["rk"],
        )
        for r in QUERIES["text_bm25_terms"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_greedy_search_matches_pure_python(spark):
    """M273 — the walk recomputed over the FULLY materialized kNN
    graph with NumPy int64 dots (the oracle's formulation),
    independently checking the Spark side's on-demand edge
    expansion."""
    import numpy as np

    from tropology_spark.operators.similarity import (
        _GG_ENTRY,
        _GG_K,
        _GG_STEPS,
    )

    ids, vm = _load_vm()
    idx = {v: i for i, v in enumerate(ids)}
    corpus = [v for v in ids if v != 0]
    dq = {v: int(np.dot(vm[idx[v]], vm[idx[0]])) for v in corpus}
    edges = {}
    for a in corpus:
        ws = [(int(np.dot(vm[idx[a]], vm[idx[b]])), b) for b in corpus if b != a]
        ws.sort(key=lambda t: (-t[0], t[1]))
        edges[a] = [b for _, b in ws[:_GG_K]]
    cur = _GG_ENTRY
    want = {(0, cur, dq[cur])}
    for step in range(1, _GG_STEPS + 1):
        cur = min([cur] + edges[cur], key=lambda v: (-dq[v], v))
        want.add((step, cur, dq[cur]))

    got = {
        (r["step"], r["vec_id"], r["dq"])
        for r in QUERIES["sim_graph_greedy_search"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_motif_counts_matches_pure_python(spark):
    """M274 — the sliding-window count recomputed with Counter over
    the ORACLE's sax words (the counting formula is the op's own
    contribution; the words are the already-registered ts_sax_symbols
    output)."""
    from collections import Counter, defaultdict

    from tropology_spark.registry import ORACLES

    con = make_duckdb(SF_UNIT)
    try:
        words = con.execute(
            f"SELECT user_id, symbols FROM ({ORACLES['ts_sax_symbols']}) s"
        ).fetchall()
    finally:
        con.close()
    occ: Counter = Counter()
    users = defaultdict(set)
    for user_id, w in words:
        for i in range(len(w) - 3):
            motif = w[i : i + 4]
            occ[motif] += 1
            users[motif].add(user_id)
    top = sorted(occ, key=lambda m: (-occ[m], m))[:20]
    want = {(m, occ[m], len(users[m])) for m in top}

    got = {
        (r["motif"], r["n_occ"], r["n_users"])
        for r in QUERIES["ts_motif_counts"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_ivfpq_consistent_with_pq(spark):
    """M275 — cross-path consistency pin (the batch-vs-scalar IVF
    precedent): the composite shares the PQ codebook and the exact-L2
    rerank with the registered sim_pq_topk, so for every vec_id both
    emit, adc_d2 and dist2 must be IDENTICAL (restricting the ADC scan
    to the probed cells may drop candidates but can never change a
    survivor's distances)."""
    fn = QUERIES["sim_ivfpq_topk"]
    ivfpq = {
        r["vec_id"]: (r["adc_d2"], r["dist2"])
        for r in fn(spark, SF_UNIT).collect()
    }
    pq = {
        r["vec_id"]: (r["adc_d2"], r["dist2"])
        for r in QUERIES["sim_pq_topk"](spark, SF_UNIT).collect()
    }
    shared = set(ivfpq) & set(pq)
    assert shared, "expected overlap between IVF+PQ and PQ top-10"
    for v in shared:
        assert ivfpq[v] == pq[v], (v, ivfpq[v], pq[v])
    # and the composite's candidates all sit in the probed cells of
    # the registered IVF search (same coarse stage, same probe list)
    ivf_cells = {
        r["cell"] for r in QUERIES["sim_ivf_topk"](spark, SF_UNIT).collect()
    }
    got_cells = {r["cell"] for r in fn(spark, SF_UNIT).collect()}
    assert got_cells <= ivf_cells or len(ivf_cells) < 2


def test_poisson_bootstrap_matches_pure_python(spark):
    """M276 — weights, per-resample sums, and the milli-mean carriers
    recomputed with hashlib + Python ints."""
    import hashlib

    import duckdb

    from tropology_spark.operators.analytics import _BOOT_B

    rows = duckdb.sql(
        f"SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)"
        f" FROM read_parquet('{SF_UNIT}/orders.parquet')"
    ).fetchall()
    n_full = len(rows)
    cents_full = sum(c for _, c in rows)
    table = [0, 0, 0, 1, 1, 1, 2, 3]
    want = set()
    for b in range(_BOOT_B):
        n_eff = 0
        s = 0
        for k, c in rows:
            h = int(hashlib.md5(f"{b}-{k}".encode()).hexdigest()[:8], 16)
            m = table[h % 8]
            n_eff += m
            s += m * c
        want.add(
            (
                b,
                n_eff,
                s,
                (1000 * s) // n_eff,
                (1000 * cents_full) // n_full,
            )
        )

    got = {
        (
            r["resample"], r["n_eff"], r["sum_cents"],
            r["milli_mean"], r["milli_mean_full"],
        )
        for r in QUERIES["analytics_poisson_bootstrap"](spark, SF_UNIT).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Hypothesis property suites on the EXACT registered paths (the
# round-11 precedent) — frame-injection kwargs through the registry
# wrapper for the Spark-backed ones, pure integer algebra for the
# shared-formula ones.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SMALL = dict(max_examples=5, deadline=None)


@settings(**_SMALL)
@given(
    mat=st.lists(
        st.lists(st.integers(min_value=-400, max_value=400),
                 min_size=4, max_size=4),
        min_size=3,
        max_size=9,
    )
)
def test_sq8_property_matches_int_recompute(spark, mat):
    """M270 on injected corpora (e= kwarg): the registered path's
    codes/reconstruction/ADC ranking must equal the pure-int recompute
    for ARBITRARY vectors, and every reconstruction must sit within
    the SQ8 grid-error bound span div 255 + 1 of its input.  (Values
    are thousandths — exactly representable, so the vm rounding is
    exact; the hit column joins the fixture truth and is ignored
    here.)"""
    from tests.conftest import SF_UNIT

    rows = [(i, [v / 1000.0 for v in vec]) for i, vec in enumerate(mat)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["rk"], r["vec_id"], r["adc_score"])
        for r in QUERIES["sim_sq8_recall"](spark, SF_UNIT, e=emb).collect()
    }

    vm = [[v * 1000 for v in vec] for vec in mat]  # micro-units of x/1000
    d = len(vm[0])
    mn = [min(r[p] for r in vm) for p in range(d)]
    mx = [max(r[p] for r in vm) for p in range(d)]
    recon = {}
    for i, r in enumerate(vm):
        if i == 0:
            continue
        rec = []
        for p in range(d):
            span = mx[p] - mn[p]
            code = 0 if span == 0 else ((r[p] - mn[p]) * 255) // span
            rp = mn[p] + (code * span) // 255
            rec.append(rp)
            assert 0 <= (r[p] - rp) <= span // 255 + 1  # grid-error bound
        recon[i] = rec
    scores = {
        i: sum(q * x for q, x in zip(vm[0], rec)) for i, rec in recon.items()
    }
    order = sorted(scores, key=lambda i: (-scores[i], i))[:10]
    want = {(rk, i, scores[i]) for rk, i in enumerate(order, 1)}
    assert got == want


@settings(**_SMALL)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=40
    )
)
def test_ams_property_doubling_algebra(spark, keys):
    """M271 on injected key streams (li= kwarg): overlaying the stream
    with itself must EXACTLY double every counter, quadruple every
    estimate and the exact F2, and leave every ppm ratio bit-identical
    — the mergeable-sketch algebra the weak-scaling probe
    spot-checked, pinned as a law on arbitrary inputs."""
    li1 = spark.createDataFrame([(k,) for k in keys], "l_partkey long")
    li2 = li1.unionAll(li1)
    fn = QUERIES["agg_ams_f2"]
    r1 = {r["sketch_id"]: r for r in fn(spark, "unused", li=li1).collect()}
    r2 = {r["sketch_id"]: r for r in fn(spark, "unused", li=li2).collect()}
    assert set(r1) == set(r2) == set(range(8))
    for j in range(8):
        assert r2[j]["counter"] == 2 * r1[j]["counter"]
        assert r2[j]["est"] == 4 * r1[j]["est"]
        assert r2[j]["f2_exact"] == 4 * r1[j]["f2_exact"]
        assert r2[j]["ratio_ppm"] == r1[j]["ratio_ppm"]


@settings(max_examples=50, deadline=None)
@given(
    tf=st.integers(min_value=1, max_value=4096),
    dl=st.integers(min_value=1, max_value=4096),
    d_total=st.integers(min_value=1, max_value=10**7),
    n_docs=st.integers(min_value=1, max_value=10**4),
)
def test_bm25_property_saturation(tf, dl, d_total, n_docs):
    """M272's integer rational: the tf component must be strictly
    bounded by k1+1 (milli < 2200) and monotone non-decreasing in tf
    for fixed (dl, D, N) — the BM25 saturation semantics, pinned on
    the exact formula both engines evaluate."""
    def milli(t):
        return (22000 * t * d_total) // (
            10 * t * d_total + 3 * d_total + 9 * dl * n_docs
        )

    assert 0 <= milli(tf) < 2200
    assert milli(tf + 1) >= milli(tf)


@settings(max_examples=25, deadline=None)
@given(
    mat=st.lists(
        st.lists(st.integers(min_value=-100, max_value=100),
                 min_size=3, max_size=3),
        min_size=3,
        max_size=10,
    )
)
def test_greedy_walk_property_monotone_absorbing(mat):
    """M273's walk semantics on arbitrary integer vectors (the twin's
    full-graph formulation): the query-dot sequence is non-decreasing,
    and once the walker repeats a position it stays there forever
    (greedy fixed points are absorbing)."""
    n = len(mat)
    ids = list(range(1, n))  # vec 0 is the query
    dq = {i: sum(a * b for a, b in zip(mat[i], mat[0])) for i in ids}
    if 1 not in dq:
        return
    edges = {}
    for a in ids:
        ws = sorted(
            ((sum(x * y for x, y in zip(mat[a], mat[b])), b)
             for b in ids if b != a),
            key=lambda t: (-t[0], t[1]),
        )
        edges[a] = [b for _, b in ws[:4]]
    cur, seq = 1, [1]
    for _ in range(6):
        cur = min([cur] + edges[cur], key=lambda v: (-dq[v], v))
        seq.append(cur)
    for x, y in zip(seq, seq[1:]):
        assert dq[y] >= dq[x]  # monotone ascent
    for i in range(len(seq) - 1):
        if seq[i] == seq[i + 1]:
            assert all(s == seq[i] for s in seq[i + 1:])  # absorbing
            break


def test_curriculum_matches_pure_python(spark):
    """M277 — the ppm quality score, the SQL ntile (front-loaded
    remainder) cut, and the stage manifest recomputed with Counter
    arithmetic."""
    import duckdb

    from tropology_spark.operators.pipeline_ops import _CURR_STAGES
    from tropology_spark.operators.text import _STOPWORDS

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    q = []
    for doc_id, text in docs:
        toks = text.split(" ")
        n_tok = len(toks)
        n_stop = sum(1 for t in toks if t in _STOPWORDS)
        q.append(
            (doc_id, n_tok, (500000 * n_stop) // n_tok + 5000 * min(n_tok, 100))
        )
    q.sort(key=lambda r: (-r[2], r[0]))
    n = len(q)
    base, rem = divmod(n, _CURR_STAGES)
    want = {}
    pos = 0
    for stage in range(1, _CURR_STAGES + 1):
        size = base + (1 if stage <= rem else 0)
        chunk = q[pos : pos + size]
        pos += size
        want[stage] = (
            len(chunk),
            sum(r[1] for r in chunk),
            min(r[2] for r in chunk),
            max(r[2] for r in chunk),
        )

    got = {
        r["stage"]: (r["n_docs"], r["sum_tokens"], r["min_q_ppm"], r["max_q_ppm"])
        for r in QUERIES["pipeline_curriculum_stages"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_filtered_topk_matches_pure_python(spark):
    """M278 — per-label cosine ranking recomputed with NumPy (the
    matryoshka twin's rounding discipline)."""
    from collections import defaultdict

    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{SF_UNIT}/embeddings.parquet')"
    ).fetchall()
    ids = [int(r[0]) for r in rows]
    labels = {int(r[0]): int(r[1]) for r in rows}
    m = np.array([r[2] for r in rows], dtype=np.float64)
    idx = {v: i for i, v in enumerate(ids)}
    q = m[idx[0]]
    nq = np.linalg.norm(q)
    cos = {
        v: round(float(np.dot(m[idx[v]], q) / (np.linalg.norm(m[idx[v]]) * nq)), 6)
        for v in ids
        if v != 0
    }
    by_label = defaultdict(list)
    for v, c in cos.items():
        by_label[labels[v]].append((c, v))
    want = set()
    for lab, entries in by_label.items():
        entries.sort(key=lambda t: (-t[0], t[1]))
        for rk, (c, v) in enumerate(entries[:3], 1):
            want.add((lab, rk, v, c))

    got = {
        (r["label"], r["rk"], r["vec_id"], r["cosine"])
        for r in QUERIES["sim_filtered_topk"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_cuped_matches_pure_python(spark):
    """M279 — boundary, per-user pre/post cents, and the co-moment
    terms recomputed with hashlib + Counter ints."""
    import hashlib
    from collections import defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)),
                   CAST(round(value * 100) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    days = [d for _, d, _ in rows]
    bd = (min(days) + max(days)) // 2
    xs = defaultdict(int)
    ys = defaultdict(int)
    for uid, d, cents in rows:
        if d <= bd:
            xs[uid] += cents
        else:
            ys[uid] += cents
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for uid in set(xs) | set(ys):
        v = (
            "A"
            if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8"
            else "B"
        )
        x, y = xs[uid], ys[uid]
        a = agg[v]
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] += x * y
        a[4] += x * x
        a[5] += y * y
    want = {(v, *vals) for v, vals in ((v, tuple(a)) for v, a in agg.items())}

    got = {
        (
            r["variant"], r["n_users"], r["sum_x"], r["sum_y"],
            r["sum_xy"], r["sum_x2"], r["sum_y2"],
        )
        for r in QUERIES["analytics_cuped_terms"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_mannwhitney_matches_pure_python(spark):
    """M280 — doubled midranks, rank sums, and the doubled U
    recomputed with hashlib + Counter ints; also pins the identity
    u2_A + u2_B = 2·n_A·n_B."""
    import hashlib
    from collections import Counter, defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id, CAST(round(value * 100) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    spend = defaultdict(int)
    for uid, cents in rows:
        spend[uid] += cents
    per_value = Counter()
    a_at = Counter()
    for uid, s in spend.items():
        per_value[s] += 1
        if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8":
            a_at[s] += 1
    cum = 0
    r2 = {"A": 0, "B": 0}
    n = {"A": 0, "B": 0}
    for s in sorted(per_value):
        cnt = per_value[s]
        lo, hi = cum + 1, cum + cnt
        cum += cnt
        twomr = lo + hi
        ca = a_at[s]
        r2["A"] += ca * twomr
        r2["B"] += (cnt - ca) * twomr
        n["A"] += ca
        n["B"] += cnt - ca
    want = {
        (v, n[v], r2[v], r2[v] - n[v] * (n[v] + 1)) for v in ("A", "B")
    }

    got_rows = QUERIES["analytics_mannwhitney_terms"](spark, SF_UNIT).collect()
    got = {
        (r["variant"], r["n_users"], r["rank2_sum"], r["u2"])
        for r in got_rows
    }
    assert got == want
    u2 = {r["variant"]: r["u2"] for r in got_rows}
    nn = {r["variant"]: r["n_users"] for r in got_rows}
    assert u2["A"] + u2["B"] == 2 * nn["A"] * nn["B"]  # the MW identity


def test_theilsen_matches_pure_python(spark):
    """M281 — shifted floor-div micro-slopes and the lower counting
    median recomputed with Python ints (floor division directly — the
    shift identity must make the engines equal it)."""
    from collections import Counter, defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT event_type,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
                     + hour(ts) AS h
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    counts = Counter(rows)
    series = defaultdict(dict)
    for (et, h), nv in counts.items():
        series[et][h] = nv
    want = set()
    for et, hs in series.items():
        keys = sorted(hs)
        slopes = [
            ((hs[h2] - hs[h1]) * 1_000_000) // (h2 - h1)
            for i, h1 in enumerate(keys)
            for h2 in keys[i + 1 :]
        ]
        slopes.sort()
        np_ = len(slopes)
        med = slopes[(np_ + 1) // 2 - 1]
        want.add((et, np_, med, min(slopes), max(slopes)))

    got = {
        (
            r["event_type"], r["n_pairs"], r["slope_micro"],
            r["min_smicro"], r["max_smicro"],
        )
        for r in QUERIES["ts_theilsen_micro"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_mmr_matches_pure_python(spark):
    """M282 — the greedy MMR walk recomputed with NumPy int64 dots
    (pool cut, pairwise penalties, argmax picks)."""
    import numpy as np

    from tropology_spark.operators.similarity import _MMR_K, _MMR_POOL

    ids, vm = _load_vm()
    idx = {v: i for i, v in enumerate(ids)}
    corpus = [v for v in ids if v != 0]
    rel = {v: int(np.dot(vm[idx[v]], vm[idx[0]])) for v in corpus}
    pool = sorted(corpus, key=lambda v: (-rel[v], v))[:_MMR_POOL]
    pw = {
        (a, b): int(np.dot(vm[idx[a]], vm[idx[b]]))
        for a in pool
        for b in pool
        if a != b
    }
    first = min(pool, key=lambda v: (-rel[v], v))
    picks = [(1, first, rel[first], 0, rel[first])]
    picked = [first]
    for i in range(2, _MMR_K + 1):
        cands = [v for v in pool if v not in picked]
        scored = [
            (v, rel[v], max(pw[(v, s)] for s in picked)) for v in cands
        ]
        v, r, pen = min(scored, key=lambda t: (-(t[1] - t[2]), t[0]))
        picks.append((i, v, r, pen, r - pen))
        picked.append(v)
    want = set(picks)

    got = {
        (r["pick_order"], r["vec_id"], r["rel"], r["pen"], r["score2"])
        for r in QUERIES["sim_mmr_diversify"](spark, SF_UNIT).collect()
    }
    assert got == want
