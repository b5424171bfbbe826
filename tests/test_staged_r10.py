"""Driver-replica parity for the STAGED round-10 operators
(tropology_spark/operators/staged_r10.py) — the full compare the
registry queries get, run over the staged (fn, oracle) pairs at both
verification scales, plus independent Python twins for the
formula-risk ops and the partitioning-invariance probe.  Activation in
round 10 is then a mechanical move-and-register.

The staged module must never be imported by package __init__ (registry
order is externally significant); importing it here is safe because it
registers nothing.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE, SF_UNIT, make_duckdb
from tropology_spark.operators.staged_r10 import STAGED


def test_staged_module_registers_nothing():
    from tropology_spark import QUERIES

    assert not (set(STAGED) & set(QUERIES))


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_parity_both_scales(spark, name):
    from tests.parity import compare

    fn, oracle = STAGED[name]
    for sf in (SF_UNIT, SF_ORACLE):
        con = make_duckdb(sf)
        try:
            compare(name, spark, con, fn, oracle, sf)
        finally:
            con.close()


def test_staged_partitioning_invariance(spark):
    """The activation-time lockstep requires partitioning invariance;
    pin it NOW for every staged op (three shuffle-partition settings
    must produce identical value sets)."""
    from tests.parity import canon_rows, spark_result
    from tropology_spark.sources.tables import clear_session_caches

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {n: set() for n in STAGED}
        for parts in ("5", "13", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            clear_session_caches()
            for n, (fn, _) in STAGED.items():
                cols, rows = spark_result(fn(spark, SF_UNIT))
                results[n].add(tuple(canon_rows(cols, rows)))
        for n, seen in results.items():
            assert len(seen) == 1, f"staged {n} varies with shuffle partitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        clear_session_caches()


def test_staged_range_2d_matches_bruteforce(spark):
    """join_range_2d_parts — the 3x3 grid join equals the O(n²)
    Python scan."""
    import duckdb

    fn, _ = STAGED["join_range_2d_parts"]
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
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_staged_haar_matches_pure_python(spark):
    """ts_haar_volatility — the hierarchical aggregation equals a
    direct per-day Haar transform on plain lists."""
    from collections import Counter, defaultdict

    import duckdb

    fn, _ = STAGED["ts_haar_volatility"]
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
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_staged_pmi_matches_pure_python(spark):
    """text_pmi_collocations — integer lift ranking from Counter
    arithmetic (Python ints are arbitrary-precision, so this also
    cross-checks the div carriers)."""
    from collections import Counter

    import duckdb

    fn, _ = STAGED["text_pmi_collocations"]
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
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_staged_compaction_matches_pure_python(spark):
    """pipeline_compaction_plan — shard derivation (md5 hex, the M43
    rule) + first-fit binning recomputed with hashlib and a running
    total."""
    import hashlib
    from collections import defaultdict

    import duckdb

    fn, _ = STAGED["pipeline_compaction_plan"]
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
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == {
        b: (ns, nd, by, (1_000_000 * by) // 32768)
        for b, (ns, nd, by) in want.items()
    }


def test_staged_chisq_matches_pure_python(spark):
    """analytics_chisq_priority_era — contingency terms with Python's
    arbitrary-precision ints (independent check of the HUGEINT /
    DECIMAL(38,0) wide-integer path)."""
    from collections import Counter

    import duckdb

    fn, _ = STAGED["analytics_chisq_priority_era"]
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
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_staged_profile_drift_matches_pure_python(spark):
    """pipeline_profile_drift — per-source version deltas from dict
    arithmetic over the derived versions."""
    from collections import Counter

    import duckdb

    fn, _ = STAGED["pipeline_profile_drift"]
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
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_staged_rich_club_matches_projection_scan(spark):
    """graph_rich_club_terms — the threshold terms recomputed with
    plain sets/dicts over the SAME projection frame (independent of
    the SQL join/rollup formula)."""
    from collections import defaultdict

    from tropology_spark.operators.graph_motifs import (
        _HUB_CAP,
        copurchase_projection,
    )

    fn, _ = STAGED["graph_rich_club_terms"]
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
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_staged_batch_ivf_consistent_with_scalar_path(spark):
    """sim_ivf_batch_topk — each query's batch rows equal the scalar
    ivf_topk pipeline run for that query alone (the batch join must
    not leak candidates across queries; the scalar path is itself
    oracle-audited as sim_ivf_topk)."""
    from pyspark.sql import functions as F

    from tropology_spark.operators.similarity import ivf_topk
    from tropology_spark.operators.staged_r10 import (
        _BATCH_K,
        _BATCH_QUERY_IDS,
    )
    from tropology_spark.sources.tables import load

    fn, _ = STAGED["sim_ivf_batch_topk"]
    got = {}
    for r in fn(spark, SF_UNIT).collect():
        got.setdefault(r["q"], []).append((r["rn"], r["vec_id"], r["cosine"]))
    e = load(spark, SF_UNIT, "embeddings")
    for q in _BATCH_QUERY_IDS:
        scalar = [
            (i + 1, r["vec_id"], r["cosine"])
            for i, r in enumerate(ivf_topk(e, q, k=_BATCH_K).collect())
        ]
        assert sorted(got[q]) == scalar, q


def test_staged_sample_neighbors_matches_pure_python(spark):
    """graph_sample_neighbors2 — the md5-ranked 2-hop sample recomputed
    with hashlib and sorted lists."""
    from collections import defaultdict
    import hashlib

    import duckdb

    fn, _ = STAGED["graph_sample_neighbors2"]
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
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want


def test_staged_matryoshka_matches_numpy(spark):
    """sim_matryoshka_recall — prefix-cosine recall recomputed with
    NumPy (the maxsim-vs-NumPy precedent)."""
    import duckdb
    import numpy as np

    fn, _ = STAGED["sim_matryoshka_recall"]
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
        for r in fn(spark, SF_UNIT).collect()
    }
    assert got == want
