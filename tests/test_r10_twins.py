"""Independent pure-Python twins for the round-10 activations
(M243-M252) — the NEW-OP CROSS-CHECK DISCIPLINE (CLAUDE.md round 7):
Spark-vs-DuckDB parity cannot catch a shared-formula error, so every
formula-bearing new operator is re-derived here with hashlib / sets /
Counter / NumPy / plain loops and compared against the REGISTERED
query.

(These ops were staged in round 9 as operators/staged_r10.py and
activated in round 10; oracle parity + partitioning invariance now run
through the registry-wide suites — tests/test_oracle_parity.py and
test_units.py's invariance probe — so this file keeps only the twins
plus the batch-vs-scalar IVF consistency pin.)
"""

from __future__ import annotations

from tests.conftest import SF_UNIT
from tropology_spark import QUERIES


def test_range_2d_matches_bruteforce(spark):
    """M243 — the 3x3 grid join equals the O(n²) Python scan."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT),
                   CAST(p_size AS BIGINT)
            FROM read_parquet('{SF_UNIT}/part.parquet')"""
    ).fetchall()
    want = {}
    for k, c, s in rows:
        nbrs = [
            k2
            for k2, c2, s2 in rows
            if k2 != k and abs(c - c2) <= 50 and abs(s - s2) <= 2
        ]
        want[k] = (len(nbrs), min(nbrs) if nbrs else None)
    got = {
        r["p_partkey"]: (r["n_neighbors"], r["min_partner"])
        for r in QUERIES["join_range_2d_parts"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_haar_matches_pure_python(spark):
    """M248 — the hierarchical aggregation equals a direct per-day
    Haar transform on plain lists."""
    from collections import Counter

    import duckdb

    rows = duckdb.sql(
        f"""SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT),
                   CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT)
            FROM read_parquet('{SF_UNIT}/events.parquet')"""
    ).fetchall()
    cnt = Counter(rows)
    days = {d for d, _ in rows}
    want = {}
    for day in days:
        x = [cnt.get((day, h), 0) for h in range(24)]
        d1 = [x[2 * j] - x[2 * j + 1] for j in range(12)]
        s1 = [x[2 * j] + x[2 * j + 1] for j in range(12)]
        d2 = [s1[2 * j] - s1[2 * j + 1] for j in range(6)]
        want[day] = (sum(x), sum(abs(v) for v in d1), sum(abs(v) for v in d2))
    got = {
        r["day"]: (r["total"], r["sad1"], r["sad2"])
        for r in QUERIES["ts_haar_volatility"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_pmi_matches_pure_python(spark):
    """M246 — integer lift ranking from Counter arithmetic (Python
    ints are arbitrary-precision, so this also cross-checks the
    DECIMAL(38,0)/HUGEINT carriers)."""
    from collections import Counter

    import duckdb

    texts = [
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM read_parquet('{SF_UNIT}/documents.parquet')"
        ).fetchall()
    ]
    uni = Counter()
    big = Counter()
    total = 0
    for t in texts:
        toks = t.split(" ")
        total += len(toks)
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    scored = [
        (
            (1_000_000 * n_xy * total) // (uni[x] * uni[y]),
            x,
            y,
            n_xy,
        )
        for (x, y), n_xy in big.items()
        if n_xy >= 3
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = {
        (x, y, n_xy, uni[x], uni[y], lift, i + 1)
        for i, (lift, x, y, n_xy) in enumerate(scored[:50])
    }
    got = {
        (r["x"], r["y"], r["n_xy"], r["n_x"], r["n_y"], r["lift_ppm"], r["rn"])
        for r in QUERIES["text_pmi_collocations"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_compaction_matches_pure_python(spark):
    """M245 — shard derivation (md5 hex, the M43 rule) + first-fit
    binning recomputed with hashlib and a running total."""
    import hashlib
    from collections import defaultdict

    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchall()
    by_shard = defaultdict(lambda: [0, 0])  # shard -> [n_docs, bytes]
    for did, nc in rows:
        shard = int(hashlib.md5(str(did).encode()).hexdigest()[:2], 16) % 16
        by_shard[shard][0] += 1
        by_shard[shard][1] += nc
    want = defaultdict(lambda: [0, 0, 0])  # bin -> [n_shards, n_docs, bytes]
    prefix = 0
    for shard in sorted(by_shard):
        n_docs, b = by_shard[shard]
        bin_ = prefix // 32768
        want[bin_][0] += 1
        want[bin_][1] += n_docs
        want[bin_][2] += b
        prefix += b
    got = {
        r["bin"]: (r["n_shards"], r["n_docs"], r["bytes"], r["fill_ppm"])
        for r in QUERIES["pipeline_compaction_plan"](spark, SF_UNIT).collect()
    }
    assert got == {
        b: (ns, nd, by, (1_000_000 * by) // 32768)
        for b, (ns, nd, by) in want.items()
    }


def test_chisq_matches_pure_python(spark):
    """M250 — contingency terms with Python's arbitrary-precision ints
    (independent check of the HUGEINT / DECIMAL(38,0) wide-integer
    path)."""
    from collections import Counter

    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderpriority,
                   CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                        THEN 0 ELSE 1 END
            FROM read_parquet('{SF_UNIT}/orders.parquet')"""
    ).fetchall()
    cells = Counter(rows)
    rt = Counter()
    ct = Counter()
    for (p, e), n in cells.items():
        rt[p] += n
        ct[e] += n
    n_total = sum(cells.values())
    want = {}
    for (p, e), n in cells.items():
        dev = n * n_total - rt[p] * ct[e]
        chi = (1_000_000 * dev * dev) // (rt[p] * ct[e] * n_total)
        want[(p, e)] = (n, rt[p], ct[e], dev, chi)
    got = {
        (r["priority"], r["era"]): (
            r["n"], r["row_total"], r["col_total"], r["dev_num"], r["chi_ppm"]
        )
        for r in QUERIES["analytics_chisq_priority_era"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_profile_drift_matches_pure_python(spark):
    """M247 — per-source version deltas from dict arithmetic over the
    derived versions."""
    from collections import Counter

    import duckdb

    rows = duckdb.sql(
        f"""SELECT doc_id, source, len(text)
            FROM read_parquet('{SF_UNIT}/documents.parquet')"""
    ).fetchall()
    na, nb, ca, cb = Counter(), Counter(), Counter(), Counter()
    for did, src, ln in rows:
        if did % 17 != 3:
            na[src] += 1
            ca[src] += ln
        if did % 13 != 5:
            lb = ln + len(" zchanged") if did % 19 == 0 else ln
            nb[src] += 1
            cb[src] += lb
    want = {
        s: (na[s], nb[s], ca[s], cb[s], nb[s] - na[s], cb[s] - ca[s])
        for s in set(na) | set(nb)
    }
    got = {
        r["source"]: (
            r["n_a"], r["n_b"], r["chars_a"], r["chars_b"],
            r["delta_docs"], r["delta_chars"],
        )
        for r in QUERIES["pipeline_profile_drift"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_rich_club_matches_projection_scan(spark):
    """M249 — the threshold terms recomputed with plain sets/dicts
    over the SAME projection frame (independent of the SQL
    join/rollup formula)."""
    from collections import defaultdict

    from tropology_spark.operators.graph_motifs import (
        _HUB_CAP,
        copurchase_projection,
    )

    proj = [
        (r["u"], r["v"])
        for r in copurchase_projection(spark, SF_UNIT, hub_cap=_HUB_CAP).collect()
    ]
    deg = defaultdict(int)
    for u, v in proj:
        deg[u] += 1
        deg[v] += 1
    want = {}
    for k in (4, 8, 16):
        club = {n for n, d in deg.items() if d > k}
        ek = sum(1 for u, v in proj if u in club and v in club)
        nk = len(club)
        dens = (2_000_000 * ek) // (nk * (nk - 1)) if nk >= 2 else None
        want[k] = (nk, ek, dens)
    got = {
        r["k"]: (r["n_k"], r["e_k"], r["density_ppm"])
        for r in QUERIES["graph_rich_club_terms"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_batch_ivf_consistent_with_scalar_path(spark):
    """M244 — each query's batch rows equal the scalar ivf_topk
    pipeline run for that query alone (the batch join must not leak
    candidates across queries; the scalar path is itself
    oracle-audited as sim_ivf_topk)."""
    from tropology_spark.operators.similarity import (
        _BATCH_K,
        _BATCH_QUERY_IDS,
        ivf_topk,
    )
    from tropology_spark.sources.tables import load

    got = {}
    for r in QUERIES["sim_ivf_batch_topk"](spark, SF_UNIT).collect():
        got.setdefault(r["q"], []).append((r["rn"], r["vec_id"], r["cosine"]))
    e = load(spark, SF_UNIT, "embeddings")
    for q in _BATCH_QUERY_IDS:
        scalar = [
            (i + 1, r["vec_id"], r["cosine"])
            for i, r in enumerate(ivf_topk(e, q, k=_BATCH_K).collect())
        ]
        assert sorted(got[q]) == scalar, q


def test_sample_neighbors_matches_pure_python(spark):
    """M251 — the md5-ranked 2-hop sample recomputed with hashlib and
    sorted lists."""
    import hashlib
    from collections import defaultdict

    import duckdb

    rows = duckdb.sql(
        f"""SELECT DISTINCT o_custkey, l_partkey
            FROM read_parquet('{SF_UNIT}/orders.parquet') o
            JOIN read_parquet('{SF_UNIT}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    out_n = defaultdict(list)  # src -> [dst]
    in_n = defaultdict(list)   # dst -> [src]
    for s, d in rows:
        out_n[s].append(d)
        in_n[d].append(s)

    def h(a, b):
        return hashlib.md5(f"{a}_{b}".encode()).hexdigest()

    want = set()
    for seed, dsts in out_n.items():
        hop1 = sorted(dsts, key=lambda d: (h(seed, d), d))[:3]
        for rk, node in enumerate(hop1, 1):
            want.add((seed, 1, None, node, rk))
        for via in hop1:
            back = [s for s in in_n[via] if s != seed]
            hop2 = sorted(back, key=lambda s: (h(via, s), s))[:3]
            for rk, node in enumerate(hop2, 1):
                want.add((seed, 2, via, node, rk))
    got = {
        (r["seed"], r["hop"], r["via"], r["node"], r["rk"])
        for r in QUERIES["graph_sample_neighbors2"](spark, SF_UNIT).collect()
    }
    assert got == want


def test_matryoshka_matches_numpy(spark):
    """M252 — prefix-cosine recall recomputed with NumPy (the
    maxsim-vs-NumPy precedent)."""
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF_UNIT}/embeddings.parquet')"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    m = np.array([r[1] for r in rows], dtype=np.float64)
    qi = int(np.where(ids == 0)[0][0])

    def topk(prefix, k=10):
        mp = m[:, :prefix]
        q = mp[qi]
        cos = (mp @ q) / (np.linalg.norm(mp, axis=1) * np.linalg.norm(q))
        cos = np.round(cos, 6)
        order = sorted(
            (int(i) for i in range(len(ids)) if i != qi),
            key=lambda i: (-cos[i], ids[i]),
        )
        return [int(ids[i]) for i in order[:k]]

    truth = set(topk(64))
    want = {}
    for p in (8, 16, 32):
        hits = len(truth & set(topk(p)))
        want[p] = (hits, (1_000_000 * hits) // 10)
    got = {
        r["prefix_dim"]: (r["n_hits"], r["recall_ppm"])
        for r in QUERIES["sim_matryoshka_recall"](spark, SF_UNIT).collect()
    }
    assert got == want
