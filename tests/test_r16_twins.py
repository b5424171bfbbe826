"""Pure-Python twins + property suites for the round-16 activations
(M318-M327) — converted from tests/test_staged_r16.py at activation
(the r9-r15 precedent: drop the staged-only parity/invariance/plan
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


def test_anisotropy_matches_pure_python(spark):
    """M318 — the Gram-identity carriers recomputed with NumPy round +
    Python big ints, including both shifted signed floor divisions."""
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF_UNIT}/embeddings.parquet')"
    ).fetchall()
    vm = np.round(
        np.array([r[0] for r in rows], dtype=np.float64) * 1_000_000
    ).astype(np.int64)
    n = vm.shape[0]
    sn2 = sum(int(x) * int(x) for x in vm.ravel())
    gram = sum(int(s) * int(s) for s in vm.sum(axis=0, dtype=object))
    want = (
        n,
        sn2,
        sn2 // n,
        gram // n,
        (gram - sn2) // (n * (n - 1)),  # Python // IS floor == the shift
        (1_000_000 * (gram - sn2)) // ((n - 1) * sn2),
    )
    [r] = QUERIES["sim_anisotropy_terms"](spark, SF_UNIT).collect()
    assert (
        r["n_vectors"], r["sum_norm2_u2"], r["mean_norm2_u2"],
        r["gram_div_n"], r["mean_pair_dot_u2"], r["ani_ppm"],
    ) == want


def test_benford_matches_pure_python(spark):
    """M319 — digit counts from the cents integers plus the published
    ppm constants recomputed independently (and the constants
    re-derived from log10 to prove they ARE Benford)."""
    import math
    from collections import Counter

    import duckdb

    from tropology_spark.operators.analytics import _BENFORD_PPM

    # the embedded constants really are round(1e6 * log10(1 + 1/d))
    for d, p in _BENFORD_PPM:
        assert p == round(1_000_000 * math.log10(1 + 1 / d))
    assert sum(p for _d, p in _BENFORD_PPM) == 1_000_000

    cents = [
        int(c)
        for (c,) in duckdb.sql(
            f"""SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                FROM read_parquet('{SF_UNIT}/orders.parquet')"""
        ).fetchall()
    ]
    obs = Counter(int(str(c)[0]) for c in cents)
    nt = len(cents)
    want = {
        d: (obs.get(d, 0), (1_000_000 * obs.get(d, 0)) // nt, p,
            (1_000_000 * obs.get(d, 0)) // nt - p)
        for d, p in _BENFORD_PPM
    }
    got = {
        r["digit"]: (r["n_obs"], r["obs_ppm"], r["benford_ppm"], r["dev_ppm"])
        for r in QUERIES["analytics_benford_audit"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_benford_absent_digit_zero_fill_injection(spark):
    """M319 seventh fold — the absent-digit spine branch the fixture
    cannot reach (TPC-H order totals span every leading digit): an
    injected corpus whose totals all lead with 1 must still emit all
    NINE digit rows, zero-filled with n_obs = 0, obs_ppm = 0 and
    dev_ppm = −benford_ppm for digits 2-9."""
    from tropology_spark.operators.analytics import _BENFORD_PPM

    odf = spark.createDataFrame(
        [(1.23,), (10.00,), (199.99,)], "o_totalprice double"
    )
    got = {
        r["digit"]: (r["n_obs"], r["obs_ppm"], r["dev_ppm"])
        for r in QUERIES["analytics_benford_audit"](
            spark, "unused", orders=odf
        ).collect()
    }
    assert set(got) == set(range(1, 10))
    assert got[1] == (3, 1_000_000, 1_000_000 - 301030)
    for d, p in _BENFORD_PPM:
        if d != 1:
            assert got[d] == (0, 0, -p)


def test_benford_population_excludes_nonpositive_totals(spark):
    """M319 population rule (self-review r16) — zero, negative and
    NULL totals are OUT of the Benford population in BOTH engines
    (the law is defined for positive magnitudes; a negative total's
    '-' first char would otherwise fail the ANSI BIGINT cast and a
    zero/NULL row would desynchronize the two denominators): only the
    one positive row counts, nt = 1."""
    odf = spark.createDataFrame(
        [(1.23,), (0.00,), (-5.00,), (None,)], "o_totalprice double"
    )
    got = {
        r["digit"]: (r["n_obs"], r["obs_ppm"])
        for r in QUERIES["analytics_benford_audit"](
            spark, "unused", orders=odf
        ).collect()
    }
    assert got[1] == (1, 1_000_000)
    assert all(got[d] == (0, 0) for d in range(2, 10))


def _ch_twin(doc_ids):
    """Pure-hashlib twin of the consistent-hash audit: ring points
    re-derived independently, per-key mod and successor assignments,
    the two (n_keys, n_moved, moved_ppm, n_to_new) rows."""
    import hashlib

    from tropology_spark.operators.pipeline_ops import _CH_MOD, _CH_VNODES

    rings = {}
    for ns in (8, 9):
        rings[ns] = [
            (s, int(hashlib.md5(f"{s}_{v}".encode()).hexdigest()[:8], 16))
            for s in range(ns)
            for v in range(_CH_VNODES)
        ]
    out = {}
    per = []
    for did in doc_ids:
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16)
        ra = {
            ns: min(((r - h) % _CH_MOD, s, r) for s, r in rings[ns])[1]
            for ns in (8, 9)
        }
        per.append((h % 8, h % 9, ra[8], ra[9]))
    for method, old, new in (("mod", 0, 1), ("ring", 2, 3)):
        n = len(per)
        moved = sum(1 for p in per if p[old] != p[new])
        to_new = sum(1 for p in per if p[old] != p[new] and p[new] == 8)
        out[method] = (n, moved, (1_000_000 * moved) // n, to_new)
    return out


def test_consistent_hash_matches_pure_python(spark):
    """M320 — the full audit recomputed with hashlib (ring points NOT
    reused from the module constants); also pins the structural ring
    guarantee n_moved == n_to_new and the mod-vs-ring economics (mod
    moves the majority, ring a minority)."""
    import duckdb

    ids = [
        int(d)
        for (d,) in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF_UNIT}/documents.parquet')"
        ).fetchall()
    ]
    want = _ch_twin(ids)
    got = {
        r["method"]: (r["n_keys"], r["n_moved"], r["moved_ppm"], r["n_to_new"])
        for r in QUERIES["pipeline_consistent_hash_moves"](
            spark, SF_UNIT
        ).collect()
    }
    assert got == want
    assert got["ring"][1] == got["ring"][3]  # every ring move -> new shard
    assert got["ring"][1] < got["mod"][1]  # ring re-shards a minority


def test_triangle_downsample_matches_pure_python(spark):
    """M321 — hourly counts, bucket anchors and the integer
    doubled-areas recomputed with Counter + Python ints, including the
    (area DESC, h) tie-break and interior-bucket rule."""
    from collections import Counter, defaultdict

    import duckdb

    from tropology_spark.operators.timeseries import _LT_BUCKET_H

    hours = [
        int(h)
        for (h,) in duckdb.sql(
            f"""SELECT epoch_us(ts) // 3600000000
                FROM read_parquet('{SF_UNIT}/events.parquet')"""
        ).fetchall()
    ]
    hc = Counter(hours)
    bs = defaultdict(lambda: [0, 0, 0])  # b -> [n, sh, sc]
    for h, c in hc.items():
        b = h // _LT_BUCKET_H
        bs[b][0] += 1
        bs[b][1] += h
        bs[b][2] += c
    want = {}
    for h, c in hc.items():
        b = h // _LT_BUCKET_H
        if b - 1 not in bs or b + 1 not in bs:
            continue
        pn, psh, psc = bs[b - 1]
        nn, nsh, nsc = bs[b + 1]
        area2 = abs(
            (h * pn - psh) * (nsc * pn - psc * nn)
            - (nsh * pn - psh * nn) * (c * pn - psc)
        )
        key = (-area2, h)
        if b not in want or key < want[b][0]:
            want[b] = (key, (h, c, area2))
    want = {b: v for b, (_k, v) in want.items()}
    got = {
        r["bucket"]: (r["h"], r["c"], r["area2"])
        for r in QUERIES["ts_triangle_downsample"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_ldiversity_matches_pure_python(spark):
    """M322 — equivalence classes, distinct sensitive counts and both
    violation flags recomputed with sets."""
    from collections import defaultdict

    import duckdb

    from tropology_spark.operators.pipeline_ops import _LDIV_BUCKET

    rows = duckdb.sql(
        f"""SELECT source, n_chars, lang
            FROM read_parquet('{SF_UNIT}/documents.parquet')"""
    ).fetchall()
    cls = defaultdict(lambda: [0, set()])
    for src, nc, lang in rows:
        k = (src, int(nc) // _LDIV_BUCKET)
        cls[k][0] += 1
        cls[k][1].add(lang)
    want = {
        k: (n, len(ls), 1 if len(ls) < 2 else 0, 1 if len(ls) < 3 else 0)
        for k, (n, ls) in cls.items()
    }
    got = {
        (r["source"], r["size_bucket"]): (
            r["n_rows"], r["l_distinct"], r["below_l2"], r["below_l3"]
        )
        for r in QUERIES["pipeline_ldiversity_audit"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_ldiversity_violation_flags_injection(spark):
    """M322 seventh fold — both flag states pinned on an injected
    corpus: a single-language class trips below_l2 AND below_l3, a
    two-language class trips only below_l3, a three-language class
    trips neither."""
    rows = (
        [("a", 10, "en")] * 3
        + [("b", 10, "en"), ("b", 20, "de")]
        + [("c", 10, "en"), ("c", 20, "de"), ("c", 30, "fr")]
    )
    ddf = spark.createDataFrame(rows, "source string, n_chars long, lang string")
    got = {
        r["source"]: (r["n_rows"], r["l_distinct"], r["below_l2"], r["below_l3"])
        for r in QUERIES["pipeline_ldiversity_audit"](
            spark, "unused", docs=ddf
        ).collect()
    }
    assert got == {"a": (3, 1, 1, 1), "b": (2, 2, 0, 1), "c": (3, 3, 0, 0)}


def test_wedge_sample_matches_pure_python(spark):
    """M323 — wedge keys, per-modulus samples and closure counts
    recomputed with hashlib + sets over the SAME capped projection
    (the projection is M120's already-twinned machinery; the new
    sampling/closure formula is what's re-derived); also pins the
    power-of-two sample NESTING s=16 ⊆ s=4 ⊆ s=1."""
    import hashlib
    from collections import defaultdict

    from tropology_spark.operators.graph_motifs import (
        _HUB_CAP,
        _WS_MODS,
        copurchase_projection,
    )

    proj = {
        (r["u"], r["v"])
        for r in copurchase_projection(spark, SF_UNIT, hub_cap=_HUB_CAP).collect()
    }
    adj = defaultdict(set)
    for u, v in proj:
        adj[u].add(v)
        adj[v].add(u)
    samples = {s: [0, 0] for s in _WS_MODS}  # s -> [n_wedges, n_closed]
    nested = {s: set() for s in _WS_MODS}
    for x, ys in adj.items():
        for u in ys:
            for w in ys:
                if not u < w:
                    continue
                hk = int(
                    hashlib.md5(f"{x}_{u}_{w}".encode()).hexdigest()[:8], 16
                )
                closed = (u, w) in proj
                for s in _WS_MODS:
                    if hk % s == 0:
                        samples[s][0] += 1
                        samples[s][1] += closed
                        nested[s].add((x, u, w))
    full_ppm = (1_000_000 * samples[1][1]) // samples[1][0]
    want = {}
    for s in _WS_MODS:
        nw, ncl = samples[s]
        if nw == 0:
            continue  # a modulus sampling nothing emits NO row
        ppm = (1_000_000 * ncl) // nw
        want[s] = (nw, ncl, ppm, ppm - full_ppm)
    got = {
        r["s"]: (r["n_wedges"], r["n_closed"], r["closure_ppm"], r["dev_ppm"])
        for r in QUERIES["graph_wedge_sample_closure"](spark, SF_UNIT).collect()
    }
    assert got == want
    assert nested[16] <= nested[4] <= nested[1]  # moduli nest


def test_wedge_sample_empty_modulus_emits_no_row_injection(spark):
    """M323 seventh fold — the n_wedges = 0 CASE branch is structurally
    DEAD (groupBy emits only observed moduli, both engines): pin the
    actual semantics on an injected one-wedge projection whose md5 key
    is divisible by neither 4 nor 16 — only the s = 1 row appears, with
    dev_ppm 0 against itself."""
    import hashlib

    # find a small (x, u, w) wedge key not divisible by 4: edges
    # (x,u),(x,w) with u < w; scan a few candidates deterministically.
    pick = None
    for x in range(1, 50):
        u, w = 100, 101
        hk = int(hashlib.md5(f"{x}_{u}_{w}".encode()).hexdigest()[:8], 16)
        if hk % 4 != 0:
            pick = (x, u, w)
            break
    assert pick is not None
    x, u, w = pick
    proj = spark.createDataFrame([(x, u), (x, w)], "u long, v long")
    got = {
        r["s"]: (r["n_wedges"], r["n_closed"], r["closure_ppm"], r["dev_ppm"])
        for r in QUERIES["graph_wedge_sample_closure"](
            spark, "unused", proj=proj
        ).collect()
    }
    assert got == {1: (1, 0, 0, 0)}


def test_minhash_k_curve_consistent_with_registered(spark):
    """M324 — a composed audit: the k=16 point must equal the
    aggregate of the REGISTERED dedup_minhash_estimate_error frame,
    and the k=8 point must equal the Python recompute of
    |125000·agree8 − jac_ppm| from the collected signature prefixes
    joined to the same pairs (big-int arithmetic, no SQL)."""
    from tropology_spark.operators.dedup import minhash_sigs_frame

    base = QUERIES["dedup_minhash_estimate_error"](spark, SF_UNIT).collect()
    sigs = {
        r["doc_id"]: [r[f"mh{i}"] for i in range(16)]
        for r in minhash_sigs_frame(spark, SF_UNIT).collect()
    }
    want = {}
    for k in (8, 16):
        errs = []
        for r in base:
            if k == 16:
                est = 62_500 * r["agree"]
            else:
                agree8 = sum(
                    1
                    for i in range(8)
                    if sigs[r["doc_a"]][i] == sigs[r["doc_b"]][i]
                )
                est = 125_000 * agree8
            errs.append(abs(est - r["jac_ppm"]))
        want[k] = (
            len(errs),
            sum(1 for e in errs if e == 0),
            sum(errs),
            max(errs),
        )
    got = {
        r["k"]: (r["n_pairs"], r["n_exact"], r["sum_abs_err_ppm"], r["max_abs_err_ppm"])
        for r in QUERIES["dedup_minhash_k_curve"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_pq_k_curve_matches_pure_python(spark):
    """M325 — the per-k self-ADC distortions recomputed with NumPy
    round + Python big ints (codebook = vectors 1..k, subspace
    halves); also pins the monotone non-increasing distortion and the
    n_zero == k anchor."""
    import duckdb
    import numpy as np

    from tropology_spark.operators.similarity import _PQK_KS

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
    half = len(next(iter(vm.values()))) // 2
    want = {}
    for k in _PQK_KS:
        qerrs = []
        for v in vm.values():
            q = 0
            for lo, hi in ((0, half), (half, 2 * half)):
                q += min(
                    sum(
                        (a - b) * (a - b)
                        for a, b in zip(v[lo:hi], vm[code][lo:hi])
                    )
                    for code in range(1, k + 1)
                )
            qerrs.append(q)
        want[k] = (
            len(qerrs),
            sum(1 for q in qerrs if q == 0),
            sum(qerrs),
            sum(qerrs) // len(qerrs),
            max(qerrs),
        )
    got = {
        r["k"]: (r["n_vectors"], r["n_zero"], r["sum_qerr"], r["mean_qerr"], r["max_qerr"])
        for r in QUERIES["sim_pq_k_curve"](spark, SF_UNIT).collect()
    }
    assert got == want
    for k in _PQK_KS:
        assert got[k][1] == k  # the k codebook vectors reconstruct exactly
    assert got[2][2] >= got[4][2] >= got[8][2]  # distortion falls with k
    assert got[2][4] >= got[4][4] >= got[8][4]


def test_local_maxima_matches_pure_python(spark):
    """M326 — per-type daily counts, the strict triple test and the
    Laplacian sharpness recomputed with Counter ints."""
    from collections import Counter

    import duckdb

    rows = duckdb.sql(
        f"""SELECT event_type, epoch_us(ts) // 86400000000
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    dc = Counter((et, int(d)) for et, d in rows)
    want = {}
    for (et, d), c in dc.items():
        p, n = dc.get((et, d - 1)), dc.get((et, d + 1))
        if p is not None and n is not None and c > p and c > n:
            want[(et, d)] = (c, p, n, 2 * c - p - n)
    got = {
        (r["event_type"], r["day"]): (r["c"], r["prev_c"], r["next_c"], r["sharp2"])
        for r in QUERIES["ts_local_maxima"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_higher_moments_matches_pure_python(spark):
    """M327 — power sums and all three assembled central-moment
    carriers recomputed with Python big ints (the m3c signed floor via
    Python's native floor division — the shift identity's fixed
    point)."""
    from collections import defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/lineitem.parquet')"""
    ).fetchall()
    acc = defaultdict(lambda: [0, 0, 0, 0, 0])
    for fl, x in rows:
        x = int(x)
        a = acc[fl]
        a[0] += 1
        a[1] += x
        a[2] += x * x
        a[3] += x**3
        a[4] += x**4
    want = {}
    for fl, (n, s1, s2, s3, s4) in acc.items():
        want[fl] = (
            n, s1, s2, s3, s4,
            (n * s2 - s1 * s1) // n,
            (n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3) // (n * n),
            (n**3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1**4)
            // n**3,
        )
    got = {
        r["l_returnflag"]: (
            r["n"], r["s1"], r["s2"], r["s3"], r["s4"],
            r["m2c"], r["m3c"], r["m4c"],
        )
        for r in QUERIES["agg_higher_moments_terms"](spark, SF_UNIT).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Hypothesis property suites on the EXACT registered paths (frame injection)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SMALL = dict(max_examples=5, deadline=None)


@settings(**_SMALL)
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-4, max_value=4).map(lambda i: i / 8),
            min_size=64,
            max_size=64,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_anisotropy_gram_identity_property(spark, vecs):
    """M318 on injected embeddings (e= kwarg): the one-pass Gram
    identity must equal the BRUTE-FORCE ordered-pair dot sum for
    ARBITRARY vectors (eighth-exact floats, so vm is exact), and every
    carrier must match the Python floor recompute."""
    vecs = [list(v) for v in vecs]
    vecs[0][0] = 0.5  # guarantee sn2 > 0 (the ani_ppm denominator)
    e = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    [r] = QUERIES["sim_anisotropy_terms"](spark, "unused", e=e).collect()
    vm = [[round(x * 1_000_000) for x in v] for v in vecs]
    n = len(vm)
    sn2 = sum(x * x for v in vm for x in v)
    brute = sum(
        sum(a * b for a, b in zip(vm[i], vm[j]))
        for i in range(n)
        for j in range(n)
        if i != j
    )
    gram = sum(
        s * s for s in (sum(v[p] for v in vm) for p in range(64))
    )
    assert gram - sn2 == brute  # the Gram identity itself
    assert (
        r["n_vectors"], r["sum_norm2_u2"], r["mean_norm2_u2"],
        r["gram_div_n"], r["mean_pair_dot_u2"], r["ani_ppm"],
    ) == (
        n, sn2, sn2 // n, gram // n,
        brute // (n * (n - 1)),
        (1_000_000 * brute) // ((n - 1) * sn2),
    )


@settings(**_SMALL)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40,
        unique=True,
    )
)
def test_consistent_hash_ring_property(spark, ids):
    """M320 on injected key sets (docs= kwarg): for ARBITRARY doc_id
    sets the registered path must equal the hashlib twin, and the
    structural ring guarantee must hold — every ring-moved key lands
    on the NEW shard (n_moved == n_to_new)."""
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["method"]: (r["n_keys"], r["n_moved"], r["moved_ppm"], r["n_to_new"])
        for r in QUERIES["pipeline_consistent_hash_moves"](
            spark, "unused", docs=docs
        ).collect()
    }
    assert got == _ch_twin(ids)
    assert got["ring"][1] == got["ring"][3]


# ---------------------------------------------------------------------------
# ADVICE r16 guard pins (closed round 17): the three division guards
# added to r16 activations, each reachable only through a probe kwarg.
# ---------------------------------------------------------------------------


def test_anisotropy_single_vector_guard(spark):
    """M318 — a single-vector e= injection reaches the n <= 1 guard:
    the pair axis n(n−1) is empty, so mean_pair_dot_u2/ani_ppm are
    NULL in BOTH engines (before the guard, ANSI division by zero
    errored); the norm carriers stay exact."""
    e = spark.createDataFrame(
        [(0, [1 / 8] + [0.0] * 63)], "vec_id long, embedding array<double>"
    )
    [r] = QUERIES["sim_anisotropy_terms"](spark, "unused", e=e).collect()
    assert r["n_vectors"] == 1
    assert r["sum_norm2_u2"] == 125_000**2
    assert r["mean_pair_dot_u2"] is None
    assert r["ani_ppm"] is None


def test_benford_empty_population_guard(spark):
    """M319 — an orders= injection whose totals are all zero or
    negative leaves the cents >= 1 population EMPTY (nt = 0): the
    9-digit spine still emits with n_obs = 0 and NULL obs_ppm/dev_ppm
    in BOTH engines (absence of evidence, loudly)."""
    odf = spark.createDataFrame(
        [(0.00,), (-5.25,)], "o_totalprice double"
    )
    rows = QUERIES["analytics_benford_audit"](
        spark, "unused", orders=odf
    ).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    for r in rows:
        assert r["n_obs"] == 0
        assert r["obs_ppm"] is None and r["dev_ppm"] is None
        assert r["benford_ppm"] > 0  # the published constants still ride


def test_consistent_hash_moves_empty_corpus_guard(spark):
    """M320 — an empty docs= injection reaches the n_keys = 0 guard:
    both method rows emit with n_keys 0, NULL n_moved/n_to_new (sums
    over zero rows) and NULL moved_ppm (before the guard, ANSI
    division by zero errored)."""
    docs = spark.createDataFrame([], "doc_id long")
    got = {
        r["method"]: (r["n_keys"], r["n_moved"], r["moved_ppm"], r["n_to_new"])
        for r in QUERIES["pipeline_consistent_hash_moves"](
            spark, "unused", docs=docs
        ).collect()
    }
    assert got == {
        "mod": (0, None, None, None),
        "ring": (0, None, None, None),
    }
