"""Independent pure-Python twins for the round-11 activations
(M253-M269) — the NEW-OP CROSS-CHECK DISCIPLINE (CLAUDE.md round 7):
Spark-vs-DuckDB parity cannot catch a shared-formula error, so every
formula-bearing new operator is re-derived here with hashlib / sets /
Counter / NumPy / plain loops and compared against the REGISTERED
query, plus the composed-audit consistency pins and the three
hypothesis property suites on the exact registered code paths (frame
injection through the registry wrapper's **kwargs).

(These ops were staged in round 10 as operators/staged_r11.py and
activated in round 11; oracle parity + partitioning invariance now run
through the registry-wide suites — tests/test_oracle_parity.py and
test_units.py's invariance probe.)
"""

from __future__ import annotations

from tests.conftest import SF_UNIT
from tropology_spark import QUERIES


def test_quota_matches_pure_python(spark):
    """M253 — largest-remainder allocation recomputed with Counter
    arithmetic; also pins the Hare guarantee Σ quota = N."""
    from collections import Counter

    import duckdb

    fn = QUERIES["pipeline_quota_sample"]
    rows = duckdb.sql(
        f"SELECT source FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    n_s = Counter(s for (s,) in rows)
    total = sum(n_s.values())
    base = {s: (1000 * n) // total for s, n in n_s.items()}
    rem = {s: (1000 * n) % total for s, n in n_s.items()}
    seats = 1000 - sum(base.values())
    ranked = sorted(n_s, key=lambda s: (-rem[s], s))
    extra = {s: 1 if i < seats else 0 for i, s in enumerate(ranked)}
    want = {
        s: (n_s[s], base[s], rem[s], extra[s], base[s] + extra[s]) for s in n_s
    }
    got = {
        r["source"]: (r["n_docs"], r["base_quota"], r["rem"], r["extra"], r["quota"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert sum(q for *_, q in got.values()) == 1000


def test_ols_matches_pure_python(spark):
    """M254 — co-moment terms with arbitrary-precision Python ints
    (independent check of the DECIMAL/HUGEINT carriers)."""
    from collections import defaultdict

    import duckdb

    fn = QUERIES["analytics_ols_terms"]
    rows = duckdb.sql(
        f"""SELECT p.p_brand, CAST(l.l_quantity AS BIGINT),
                   CAST(round(l.l_extendedprice * 100) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/lineitem.parquet') l
            JOIN read_parquet('{SF_UNIT}/part.parquet') p
              ON l.l_partkey = p.p_partkey"""
    ).fetchall()
    acc = defaultdict(lambda: [0, 0, 0, 0, 0])
    for b, x, y in rows:
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
        r["brand"]: (
            r["n"], r["sx"], r["sy"], r["sxy"], r["sxx"],
            r["slope_num"], r["slope_den"],
        )
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_bq_matches_numpy(spark):
    """M256 — sign-bit packing, Hamming candidates and cosine rerank
    recomputed with NumPy/plain ints."""
    import duckdb
    import numpy as np

    fn = QUERIES["sim_bq_hamming_topk"]
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF_UNIT}/embeddings.parquet')"
    ).fetchall()
    ids = [r[0] for r in rows]
    m = np.array([r[1] for r in rows], dtype=np.float64)
    sig = {}
    for j, vid in enumerate(ids):
        h0 = sum(1 << i for i in range(32) if m[j, i] >= 0)
        h1 = sum(1 << i for i in range(32) if m[j, 32 + i] >= 0)
        sig[vid] = (h0, h1)
    qi = ids.index(0)
    q0, q1 = sig[0]
    hd = {
        vid: bin((h0 ^ q0)).count("1") + bin((h1 ^ q1)).count("1")
        for vid, (h0, h1) in sig.items()
        if vid != 0
    }
    cand = sorted(hd, key=lambda v: (hd[v], v))[:50]
    q = m[qi]
    want = []
    for vid in cand:
        j = ids.index(vid)
        cos = round(
            float(m[j] @ q / (np.linalg.norm(m[j]) * np.linalg.norm(q))), 6
        )
        want.append((vid, hd[vid], cos))
    want = sorted(want, key=lambda t: (-t[2], t[0]))[:10]
    got = [
        (r["vec_id"], r["hamming"], r["cosine"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert sorted(got, key=lambda t: (-t[2], t[0])) == want


def test_cv_folds_matches_pure_python(spark):
    """M255 — expanding-window counts from a day Counter; also pins
    the expanding-window property."""
    from collections import Counter

    import duckdb

    fn = QUERIES["pipeline_rolling_cv_folds"]
    days = [
        d
        for (d,) in duckdb.sql(
            f"""SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                FROM read_parquet('{SF_UNIT}/events.parquet')"""
        ).fetchall()
    ]
    cnt = Counter(days)
    d0 = min(cnt)
    want = {}
    for f in (1, 2, 3):
        cut = d0 + 7 * f
        n_train = sum(n for d, n in cnt.items() if d < cut)
        n_val = sum(n for d, n in cnt.items() if cut <= d < cut + 7)
        want[f] = (cut - 1, n_train, n_val)
    got = {
        r["fold"]: (r["train_end_day"], r["n_train"], r["n_val"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    assert got[1][1] + got[1][2] <= got[2][1]  # expanding window
    assert got[2][1] + got[2][2] <= got[3][1]


def test_wmedian_matches_pure_python(spark):
    """M258 — lower weighted median from a sorted cumulative scan."""
    from collections import defaultdict

    import duckdb

    fn = QUERIES["agg_weighted_median"]
    rows = duckdb.sql(
        f"""SELECT o.o_orderpriority, CAST(round(o.o_totalprice * 100) AS BIGINT),
                   CAST(count(*) AS BIGINT)
            FROM read_parquet('{SF_UNIT}/orders.parquet') o
            JOIN read_parquet('{SF_UNIT}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2, o.o_orderkey"""
    ).fetchall()
    by_p = defaultdict(lambda: defaultdict(int))
    for p, cents, w in rows:
        by_p[p][cents] += w
    want = {}
    for p, vals in by_p.items():
        wt = sum(vals.values())
        cum = 0
        for cents in sorted(vals):
            cum += vals[cents]
            if 2 * cum >= wt:
                want[p] = (wt, cents)
                break
    got = {
        r["priority"]: (r["w_total"], r["wmedian_cents"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_winnowing_matches_pure_python(spark):
    """M259 — window-min selection recomputed with hashlib and plain
    list scans."""
    import hashlib

    import duckdb

    fn = QUERIES["text_winnowing_fingerprints"]
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    want = {}
    for did, t in texts:
        toks = t.split(" ")
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        n = len(hs)
        if n < 4:
            continue
        sel = {min(hs[j : j + 4]) for j in range(n - 3)}
        want[did] = (n, len(sel), (1_000_000 * len(sel)) // n)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_selected"], r["density_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_cdc_matches_pure_python(spark):
    """M260 — rolling-hash boundaries recomputed with hashlib over the
    hex encoding."""
    import hashlib

    import duckdb

    fn = QUERIES["mm_cdc_chunking"]
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    want = {}
    for did, t in texts:
        raw = t.encode("utf-8")
        hs = raw.hex().upper()
        nb = len(raw)
        n_windows = max(min(nb - 7, 4096), 0)
        n_bound = 0
        for p in range(1, n_windows + 1):
            win = hs[2 * p - 2 : 2 * p - 2 + 16]
            h = int(hashlib.md5(win.encode()).hexdigest()[:4], 16)
            if h % 64 == 0:
                n_bound += 1
        chunks = n_bound + 1
        want[did] = (nb, n_windows, n_bound, chunks, (100 * nb) // chunks)
    got = {
        r["doc_id"]: (
            r["n_bytes"], r["n_windows"], r["n_bound"], r["n_chunks"],
            r["avg_chunk_x100"],
        )
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_cluster3_matches_pure_python(spark):
    """M261 — 3-round min-label propagation recomputed with dicts over
    the SAME registered candidate pair set; also pins consistency with
    dedup_minhash_lsh (every pair ends in one cluster)."""
    from collections import defaultdict

    fn = QUERIES["dedup_cluster3"]
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_UNIT).collect()
    ]
    docs = {
        r["doc_id"]
        for r in fn(spark, SF_UNIT).select("doc_id").collect()
    }
    nbr = defaultdict(set)
    for a, b in pairs:
        nbr[a].add(b)
        nbr[b].add(a)
    lbl = {d: d for d in docs}
    for _ in range(3):
        lbl = {
            d: min([lbl[d]] + [lbl[n] for n in nbr[d]]) for d in docs
        }
    got = {
        r["doc_id"]: r["label3"] for r in fn(spark, SF_UNIT).collect()
    }
    assert got == lbl
    for a, b in pairs:
        assert got[a] == got[b], (a, b)  # candidate pairs co-cluster


def test_path_counts_matches_pure_python(spark):
    """M262 — the A^h mat-vec recomputed with dict arithmetic (exact
    integer path counts)."""
    from collections import Counter, defaultdict

    import duckdb

    fn = QUERIES["graph_path_counts3"]
    edges = duckdb.sql(
        f"""SELECT DISTINCT o_custkey, l_partkey
            FROM read_parquet('{SF_UNIT}/orders.parquet') o
            JOIN read_parquet('{SF_UNIT}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    out_n = defaultdict(list)
    in_n = defaultdict(list)
    deg = Counter()
    for s, d in edges:
        out_n[s].append(d)
        in_n[d].append(s)
        deg[s] += 1
    seeds = sorted(deg, key=lambda s: (-deg[s], s))[:3]
    p1 = Counter()
    for s in seeds:
        for d in out_n[s]:
            p1[d] += 1
    p2 = Counter()
    for node, n in p1.items():
        for c in in_n[node]:
            p2[c] += n
    p3 = Counter()
    for node, n in p2.items():
        for d in out_n[node]:
            p3[d] += n
    want = (
        {(1, k): v for k, v in p1.items()}
        | {(2, k): v for k, v in p2.items()}
        | {(3, k): v for k, v in p3.items()}
    )
    got = {
        (r["hop"], r["node"]): r["n_paths"]
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_threshold_curve_consistent_with_registered_pairs(spark):
    """M257 — composed audit: the lowest threshold (0.4 = the
    registered M2 cutoff) must count EXACTLY the registered
    dedup_embedding_cosine pair set, and the curve must be
    monotonically non-increasing in the threshold."""
    fn = QUERIES["dedup_threshold_curve"]
    n_pairs = QUERIES["dedup_embedding_cosine"](spark, SF_UNIT).count()
    got = {
        r["t_ppm"]: (r["n_pairs"], r["n_docs"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got[400000][0] == n_pairs
    assert got[400000][0] >= got[600000][0] >= got[800000][0]
    assert got[400000][1] >= got[600000][1] >= got[800000][1]


# ---------------------------------------------------------------------------
# Property tests over the EXACT registered code paths (frame injection)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SMALL = dict(max_examples=8, deadline=None)


@settings(**_SMALL)
@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=12
    )
)
def test_quota_sample_hare_invariants(spark, counts):
    """M253 on injected corpora: Σ quota = N exactly, every source
    gets base or base+1 (the Hare quota property — never off by more
    than one seat from its exact share), and the allocation matches
    the pure-Python largest-remainder rule."""
    fn = QUERIES["pipeline_quota_sample"]
    rows = [(f"s{i:02d}",) for i, n in enumerate(counts) for _ in range(n)]
    docs = spark.createDataFrame(rows, "source string")
    got = {
        r["source"]: (r["n_docs"], r["base_quota"], r["extra"], r["quota"])
        for r in fn(spark, "unused", docs=docs).collect()
    }
    total = sum(counts)
    base = {f"s{i:02d}": (1000 * n) // total for i, n in enumerate(counts)}
    rem = {f"s{i:02d}": (1000 * n) % total for i, n in enumerate(counts)}
    seats = 1000 - sum(base.values())
    ranked = sorted(base, key=lambda s: (-rem[s], s))
    want = {
        s: (
            counts[int(s[1:])],
            base[s],
            1 if i < seats else 0,
            base[s] + (1 if i < seats else 0),
        )
        for i, s in enumerate(ranked)
    }
    assert got == want
    assert sum(q for *_, q in got.values()) == 1000
    for s, (_, b, e, q) in got.items():
        assert q in (b, b + 1)


@settings(**_SMALL)
@given(
    prefix_a=st.lists(st.sampled_from("abcde"), min_size=0, max_size=8),
    prefix_b=st.lists(st.sampled_from("fghij"), min_size=0, max_size=8),
    shared=st.lists(st.sampled_from("klmno"), min_size=6, max_size=10),
)
def test_winnowing_containment_guarantee(spark, prefix_a, prefix_b, shared):
    """The winnowing GUARANTEE on the exact registered selection path:
    two documents sharing a run of ≥ k+w−1 = 6 tokens contain at least
    one identical full window of gram hashes, whose minimum BOTH
    documents select — their fingerprint sets must intersect.
    (Disjoint prefix alphabets keep the shared run the only
    overlap.)"""
    from tropology_spark.operators.text import winnowing_selected

    doc_a = " ".join([*prefix_a, *shared])
    doc_b = " ".join([*prefix_b, *shared])
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    sel = winnowing_selected(spark, "unused", docs=docs).collect()
    a = {r["mh"] for r in sel if r["doc_id"] == 1}
    b = {r["mh"] for r in sel if r["doc_id"] == 2}
    assert a & b, (doc_a, doc_b)


@settings(**_SMALL)
@given(
    body=st.text(alphabet="abcdefgh ", min_size=20, max_size=120),
    prefix=st.text(alphabet="pqrstuvw", min_size=9, max_size=20),
)
def test_cdc_boundaries_shift_resistant(spark, body, prefix):
    """The defining CDC property, on the exact registered window-hash
    path: prefixing an asset shifts every boundary UNIFORMLY — the
    boundary set over the shared suffix is preserved (every window
    fully inside the original content hashes identically at its
    shifted position) — where M185's fixed grid would recut every
    chunk.  Windows overlapping the splice point are the only ones
    allowed to differ."""
    from tropology_spark.operators.multimodal import cdc_boundary_positions

    docs = spark.createDataFrame(
        [(1, body), (2, prefix + body)], "doc_id long, text string"
    )
    rows = cdc_boundary_positions(spark, "unused", docs=docs).collect()
    b1 = {r["p"] for r in rows if r["doc_id"] == 1 and r["bound"] == 1}
    b2 = {r["p"] for r in rows if r["doc_id"] == 2 and r["bound"] == 1}
    shift = len(prefix.encode("utf-8"))
    assert {p - shift for p in b2 if p > shift} == b1, (body, prefix)


def test_probe_curve_consistent_with_registered_ivf(spark):
    """M263 — composed audit: the n_probe=2 point must count EXACTLY
    the registered sim_ivf_topk list's overlap with the registered
    brute-force truth, and recall must be monotonically non-decreasing
    in n_probe (more cells scanned can only add candidates)."""
    fn = QUERIES["sim_ivf_probe_curve"]
    truth = {
        r["vec_id"]
        for r in QUERIES["sim_topk_cosine"](spark, SF_UNIT).collect()
    }
    approx2 = {
        r["vec_id"] for r in QUERIES["sim_ivf_topk"](spark, SF_UNIT).collect()
    }
    got = {
        r["n_probe"]: (r["n_hits"], r["recall_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got[2][0] == len(truth & approx2)
    assert got[1][0] <= got[2][0] <= got[4][0]


def test_band_curve_matches_pure_python(spark):
    """M264 — truth (prefix-blocked Jaccard), signatures, all three
    band groupings and the hit counts recomputed with hashlib/sets
    (only the permutation CONSTANTS are imported — the formulas are
    re-derived)."""
    import hashlib
    from itertools import combinations

    import duckdb

    from tropology_spark.operators.dedup import _MH_PERMS, _MH_PRIME

    fn = QUERIES["dedup_band_curve"]
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    tok_sets = {did: set(t.split(" ")) for did, t in texts}
    pfx = {did: t[:40] for did, t in texts}
    truth = set()
    for a, b in combinations(sorted(tok_sets), 2):
        if pfx[a] != pfx[b]:
            continue
        inter = len(tok_sets[a] & tok_sets[b])
        union = len(tok_sets[a]) + len(tok_sets[b]) - inter
        if union and inter / union >= 0.5:
            truth.add((a, b))
    sigs = {}
    for did, t in texts:
        toks = t.split(" ")
        grams = {f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)}
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
        if hs:
            sigs[did] = [
                min((h * a + b) % _MH_PRIME for h in hs) for a, b in _MH_PERMS
            ]
    want = {}
    for r in (2, 4, 8):
        buckets = {}
        for did, mh in sigs.items():
            for j in range(16 // r):
                buckets.setdefault(
                    (j, tuple(mh[j * r : (j + 1) * r])), []
                ).append(did)
        cand = set()
        for members in buckets.values():
            for a, b in combinations(sorted(members), 2):
                cand.add((a, b))
        want[r] = (16 // r, len(truth), len(cand), len(cand & truth))
    got = {
        r["band_rows"]: (r["n_bands"], r["n_true"], r["n_candidates"], r["n_hit"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    # The S-curve direction: fewer rows per band can only add candidates.
    assert got[2][2] >= got[4][2] >= got[8][2]
    assert got[2][3] >= got[4][3] >= got[8][3]


def test_uniformity_matches_pure_python(spark):
    """M265 — digit counts via Counter, the squared deviations with
    arbitrary-precision Python ints."""
    from collections import Counter

    import duckdb

    fn = QUERIES["mm_payload_uniformity"]
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    want = {}
    for did, t in texts:
        hx = t.encode("utf-8").hex().upper()
        L = len(hx)
        if L == 0:
            continue
        cnt = Counter(hx)
        dev2 = sum(
            (16 * cnt.get(d, 0) - L) ** 2 for d in "0123456789ABCDEF"
        )
        want[did] = (L // 2, dev2, (1000 * dev2) // (16 * L))
    got = {
        r["media_id"]: (r["n_bytes"], r["dev2_sum"], r["chisq_milli"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_phash_clusters_matches_pure_python(spark):
    """M266 — the pHash band candidates AND the 3-round min-label
    propagation recomputed from raw sha256 digests with hashlib/dicts
    (unlike the cluster3 twin, the pair set here is re-derived too).
    No blanket pair-co-clustering pin: the pHash band graph has chains
    (unlike the LSH near-clique components), so diameter > 3
    components legitimately carry several labels after the bounded
    unroll — the documented stepping-stone semantics.  Instead pin
    that every doc within 3 hops of its component minimum has
    converged to it."""
    import hashlib
    from collections import defaultdict
    from itertools import combinations

    import duckdb

    fn = QUERIES["mm_phash_clusters"]
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    ph, b1, b2 = {}, {}, {}
    for did, t in texts:
        h = hashlib.sha256(t.encode("utf-8")).hexdigest()
        ph[did] = int(h[:4], 16)
        b1[did], b2[did] = h[:2], h[2:4]
    pairs = set()
    for a, b in combinations(sorted(ph), 2):
        if (b1[a] == b1[b] or b2[a] == b2[b]) and bin(
            ph[a] ^ ph[b]
        ).count("1") <= 3:
            pairs.add((a, b))
    nbr = defaultdict(set)
    for a, b in pairs:
        nbr[a].add(b)
        nbr[b].add(a)
    lbl = {d: d for d in ph}
    for _ in range(3):
        lbl = {d: min([lbl[d]] + [lbl[n] for n in nbr[d]]) for d in ph}
    size = defaultdict(int)
    for d in ph:
        size[lbl[d]] += 1
    want = {d: (lbl[d], size[lbl[d]]) for d in ph}
    got = {
        r["doc_id"]: (r["phash_cluster"], r["cluster_size"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    # BFS from every component: all nodes within 3 hops of their
    # component's global minimum must have adopted it.
    comp_min = {}
    for d in sorted(ph):
        if d in comp_min:
            continue
        stack, seen = [d], {d}
        while stack:
            x = stack.pop()
            for n in nbr[x]:
                if n not in seen:
                    seen.add(n)
                    stack.append(n)
        mn = min(seen)
        for x in seen:
            comp_min[x] = mn
    for d in sorted(ph):
        mn = comp_min[d]
        frontier, dist = {mn}, 0
        reach = {mn}
        while dist < 3:
            frontier = {n for x in frontier for n in nbr[x]} - reach
            reach |= frontier
            dist += 1
        for x in reach:
            assert got[x][0] == mn, (x, mn)


@settings(**_SMALL)
@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=3, max_size=40),
        min_size=2,
        max_size=8,
    )
)
def test_band_curve_config_containment(spark, texts):
    """The structural guarantee behind the (b, r) curve, on the exact
    registered banding path: a pair sharing an 8-row band shares both
    its 4-row halves, and a pair sharing a 4-row band shares both its
    2-row halves — so the candidate SETS must nest
    cand(r=8) ⊆ cand(r=4) ⊆ cand(r=2) on any corpus (the count
    monotonicity the twin checks is a corollary)."""
    from tropology_spark.operators.dedup import (
        bands_from_sigs,
        minhash_candidate_pairs,
        minhash_sigs_frame,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sigs = minhash_sigs_frame(spark, "unused", docs=docs).localCheckpoint(
        eager=True
    )
    cand = {
        r: {
            (x["doc_a"], x["doc_b"])
            for x in minhash_candidate_pairs(
                bands_from_sigs(sigs, band_rows=r)
            ).collect()
        }
        for r in (2, 4, 8)
    }
    assert cand[8] <= cand[4] <= cand[2], cand


def test_hll_matches_pure_python(spark):
    """M267 — the full HLL pipeline (bucket split, rho via bit_length,
    register max-merge, dyadic harmonic-sum carrier, integral
    alpha*m^2/S estimate, ppm ratio) recomputed from raw parquet with
    hashlib + Python ints (arbitrary precision — an independent check
    on every BIGINT carrier)."""
    import hashlib
    from collections import defaultdict

    import duckdb

    from tropology_spark.operators.aggregates import _HLL_M, _HLL_NUM

    fn = QUERIES["agg_hll_audit"]
    rows = duckdb.sql(
        "SELECT o_orderpriority, o_custkey "
        f"FROM read_parquet('{SF_UNIT}/orders.parquet')"
    ).fetchall()
    regs: dict = defaultdict(lambda: defaultdict(int))
    exact: dict = defaultdict(set)
    for pri, ck in rows:
        h = hashlib.md5(str(ck).encode()).hexdigest()
        bucket = int(h[0], 16)
        w = int(h[1:9], 16)
        rho = 33 if w == 0 else 33 - w.bit_length()
        regs[pri][bucket] = max(regs[pri][bucket], rho)
        exact[pri].add(ck)
    want = {}
    for pri in exact:
        s = sum(1 << (33 - regs[pri][b]) for b in range(_HLL_M))
        v = sum(1 for b in range(_HLL_M) if regs[pri][b] == 0)
        est = _HLL_NUM // (1000 * s)
        n = len(exact[pri])
        want[pri] = (n, v, s, est, (1000000 * est) // n)
    got = {
        r["o_orderpriority"]: (
            r["n_exact"], r["v_empty"], r["s_carrier"],
            r["hll_est"], r["ratio_ppm"],
        )
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
    # sanity on the estimator itself: every group within 3x of exact
    # (m=16 gives ~26% standard error; 3x is a loose structural bound
    # that catches formula errors, not noise)
    for pri, (n, _v, _s, est, _r) in got.items():
        assert n // 3 <= est <= 3 * n, (pri, n, est)


def test_simpson_matches_pure_python(spark):
    """M268 — Counter twin over the raw text: token counts, the
    unbiased collision numerator, and the ppm division recomputed with
    Python ints."""
    from collections import Counter

    import duckdb

    fn = QUERIES["text_simpson_concentration"]
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    want = {}
    for did, t in texts:
        c = Counter(tok for tok in t.split(" ") if tok != "")
        n = sum(c.values())
        if n == 0:
            continue
        s2 = sum(v * (v - 1) for v in c.values())
        ppm = (1000000 * s2) // (n * (n - 1)) if n >= 2 else 0
        want[did] = (n, len(c), s2, ppm)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["s2"], r["simpson_ppm"])
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
