"""Property-based tests (SURVEY.md §5.2 item 3): algebraic invariants
over generated inputs.  Example counts are kept small — each example
runs Spark jobs."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

SMALL = dict(max_examples=10, deadline=None)


@settings(**SMALL)
@given(
    xs=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=30),
    ys=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=30),
)
def test_union_all_count_additivity_and_intersect_subset(spark, xs, ys):
    a = spark.createDataFrame([(x,) for x in xs] or [(None,)], "v int").filter(
        F.col("v").isNotNull()
    )
    b = spark.createDataFrame([(y,) for y in ys] or [(None,)], "v int").filter(
        F.col("v").isNotNull()
    )
    assert a.unionByName(b).count() == len(xs) + len(ys)
    inter = {r["v"] for r in a.intersect(b).collect()}
    assert inter == (set(xs) & set(ys))


@settings(**SMALL)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=8)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_degree_sums_equal_edge_count(spark, edges):
    distinct_edges = sorted(set(edges))
    df = spark.createDataFrame(distinct_edges, "src int, dst int")
    out_sum = df.groupBy("src").count().agg(F.sum("count")).collect()[0][0]
    in_sum = df.groupBy("dst").count().agg(F.sum("count")).collect()[0][0]
    assert out_sum == in_sum == len(distinct_edges)


@settings(**SMALL)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    )
)
def test_exact_sum_matches_rational_arithmetic(spark, vals):
    """Cent-exact sum == exact Fraction arithmetic of per-element
    rounded cents (the declared semantics)."""
    from tropology_spark.functions.exact import exact_sum

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(exact_sum(F.col("v"), 2).alias("s")).collect()[0]["s"]

    def cents(x: float) -> int:
        # Spark's round(): half away from zero on the shortest repr.
        from decimal import Decimal, ROUND_HALF_UP

        return int(Decimal(repr(x * 100.0)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))

    want = float(
        Fraction(sum(cents(v) for v in vals), 100)
    )
    assert got == round(want, 2)


@settings(**SMALL)
@given(
    vec=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, allow_infinity=False),
        min_size=4,
        max_size=16,
    ).filter(lambda v: any(abs(x) > 1e-3 for x in v))
)
def test_cosine_self_similarity_is_one(spark, vec):
    from tropology_spark.operators.similarity import dot, norm

    df = spark.createDataFrame([(vec,)], "emb array<double>")
    cos = df.select(
        (dot(F.col("emb"), F.col("emb")) / (norm(F.col("emb")) * norm(F.col("emb")))).alias("c")
    ).collect()[0]["c"]
    assert abs(cos - 1.0) < 1e-9


@settings(**SMALL)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=20).filter(lambda t: t.strip()),
        min_size=2,
        max_size=10,
    )
)
def test_jaccard_bounds_and_orientation(spark, texts):
    """Every emitted Jaccard pair is in (0,1] and doc_a < doc_b."""
    from tropology_spark.registry import QUERIES  # noqa: F401  (import check)

    rows = [(i, t, len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    tok = df.select(
        "doc_id",
        F.substring(F.col("text"), 1, 40).alias("pfx"),
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token"),
    ).filter(F.col("token") != "")
    siz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.pfx") == F.col("b.pfx"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = siz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = siz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    out = inter.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a", "doc_b", jac.alias("j")
    )
    for r in out.collect():
        assert 0.0 < r["j"] <= 1.0
        assert r["doc_a"] < r["doc_b"]


@settings(**SMALL)
@given(
    tail_a=st.lists(st.sampled_from(["red", "blue", "green", "cyan"]),
                    unique=True, min_size=3, max_size=4),
)
def test_jaccard_block_width_recall(spark, tail_a):
    """jaccard_pairs' recall contract: a planted near-dup pair whose
    only edit is AFTER the block prefix is always recalled at that
    width; a pair edited in the FIRST token is missed by any positive
    prefix block but recalled with blocking disabled (block_width=0)."""
    from tropology_spark.operators.dedup import jaccard_pairs

    base = "prefix0 " + " ".join(tail_a)           # > 8 shared leading chars
    late_edit = base + " extratoken"               # edit strictly after prefix
    early_edit = "zprefix0 " + " ".join(tail_a)    # first token differs
    df = spark.createDataFrame(
        [(0, base), (1, late_edit), (2, early_edit)], "doc_id long, text string"
    )
    blocked = {(r["doc_a"], r["doc_b"])
               for r in jaccard_pairs(df, block_width=8, threshold=0.5).collect()}
    assert (0, 1) in blocked            # recalled: edit after the block key
    assert (0, 2) not in blocked        # documented miss: edit inside the key
    unblocked = {(r["doc_a"], r["doc_b"])
                 for r in jaccard_pairs(df, block_width=0, threshold=0.5).collect()}
    assert {(0, 1), (0, 2)} <= unblocked  # no block -> full recall


@settings(**SMALL)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                min_size=1,
                max_size=30,
            ),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    )
)
def test_packing_bins_are_contiguous_and_complete(spark, docs):
    """Sequence packing (M29): every doc lands in exactly one bin, bins
    are consecutive from 0, and each bin's pre-assignment running sum
    respects the capacity boundary rule (bin = cum_before // cap)."""
    from pyspark.sql import Window

    cap = 16
    rows = [(i, " ".join(toks), "en") for i, toks in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = (
        df.select("doc_id", "lang", F.size(F.split("text", " ")).alias("n"))
        .withColumn("cum_before", F.coalesce(F.sum("n").over(w), F.lit(0)))
        .withColumn("bin", F.expr(f"cum_before DIV {cap}"))
    ).collect()
    assert len(assigned) == len(rows)
    # Python replay: same deterministic order, same bins.
    cum = 0
    expect = {}
    for i, toks in sorted(docs):
        expect[i] = cum // cap
        cum += len(toks)
    got = {r["doc_id"]: r["bin"] for r in assigned}
    assert got == expect
    # Bins start at 0 and only move forward in doc_id order (a doc
    # longer than the capacity may legitimately skip bin numbers).
    ordered_bins = [expect[i] for i, _ in sorted(docs)]
    assert ordered_bins[0] == 0
    assert all(a <= b for a, b in zip(ordered_bins, ordered_bins[1:]))


@settings(**SMALL)
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                    max_size=40, unique=True))
def test_split_assignment_is_stable_and_total(spark, ids):
    """Dataset split (M26): every row gets exactly one split, assignment
    depends only on doc_id (stable across subsets), and matches the
    md5-bucket rule."""
    import hashlib

    df = spark.createDataFrame([(i, "x", "en") for i in ids],
                               "doc_id long, text string, lang string")
    md5 = F.md5(F.col("doc_id").cast("string"))
    bucket = F.conv(F.substring(md5, 1, 2), 16, 10).cast("int") % 10
    split = F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    got = {r["doc_id"]: r["s"] for r in df.select("doc_id", split.alias("s")).collect()}
    for i in ids:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 10
        assert got[i] == ("train" if b < 8 else "val" if b == 8 else "test"), i


@settings(**SMALL)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=100, max_value=112),
        ),
        min_size=1,
        max_size=60,
    ),
    cap=st.integers(min_value=1, max_value=6),
)
def test_twohop_capped_invariants(spark, edges, cap):
    """M119 invariants on arbitrary graphs: (a) cold partner count never
    exceeds the uncapped two-hop partner count, (b) hot_exposure is an
    upper bound on partners reachable via hot dsts, (c) every src with
    zero hot parts has hot_exposure 0, (d) cold+hot paths cover every
    partner (a partner reachable at all is reachable via a cold dst or
    counted in a hot dst's slots)."""
    from collections import defaultdict

    from tropology_spark.operators.graph import twohop_capped_frames

    uniq = sorted(set(edges))
    e = spark.createDataFrame(uniq, "src long, dst long")
    result, _hot = twohop_capped_frames(e, cap)
    got = {
        r["custkey"]: (r["n_twohop_cold"], r["n_hot_parts"], r["hot_exposure"])
        for r in result.collect()
    }

    by_dst = defaultdict(set)
    for s, d in uniq:
        by_dst[d].add(s)
    partners_all = defaultdict(set)
    partners_cold = defaultdict(set)
    hot_dsts = {d for d, ms in by_dst.items() if len(ms) > cap}
    for d, ms in by_dst.items():
        for s in ms:
            others = ms - {s}
            partners_all[s] |= others
            if d not in hot_dsts:
                partners_cold[s] |= others

    for s, _d in uniq:
        n_cold, n_hot, exposure = got[s]
        assert n_cold == len(partners_cold[s])
        assert n_cold <= len(partners_all[s])  # (a)
        via_hot = set()
        for d in hot_dsts:
            if s in by_dst[d]:
                via_hot |= by_dst[d] - {s}
        assert len(via_hot) <= exposure  # (b)
        if n_hot == 0:
            assert exposure == 0  # (c)
        assert partners_all[s] == partners_cold[s] | via_hot  # (d)


@settings(max_examples=5, deadline=None)
@given(
    n_users=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_kmv_estimate_within_error_bound(spark, n_users, seed):
    """D4's KMV estimator: for any cardinality, the estimate must land
    within 5/sqrt(k) relative error (theoretical sd is ~1/sqrt(k-2);
    5 sigma keeps the test deterministic-in-practice), and exactly
    equal the true count below the sketch size."""
    import math

    from pyspark.sql import Window

    from tropology_spark.operators.relational import _KMV_K

    ids = [(f"g", (seed * 1_000_003 + i) % 2_147_483_647) for i in range(n_users)]
    df = spark.createDataFrame(ids, "event_type string, user_id long")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    dist = df.select("event_type", h).distinct()
    ranked = dist.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    )
    per = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("mk"),
    )
    est = per.select(
        F.when(
            F.col("n_h") >= _KMV_K,
            F.expr(f"({_KMV_K - 1} * 4294967296) div (mk + 1)"),
        )
        .otherwise(F.col("n_h"))
        .cast("bigint")
        .alias("e")
    ).collect()[0]["e"]
    true = len({u for _, u in ids})
    if true < _KMV_K:
        assert est == true
    else:
        assert abs(est - true) / true <= 5 / math.sqrt(_KMV_K)


@settings(**SMALL)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),   # group
            st.integers(min_value=-50, max_value=50),  # order key (ties likely)
        ),
        min_size=1,
        max_size=60,
    ),
    nparts=st.integers(min_value=1, max_value=7),
)
def test_global_row_number_equals_single_window(spark, rows, nparts):
    """plans/global_order.py contract: the two-pass range-partitioned
    rank is BIT-IDENTICAL to the single-partition window row_number for
    any data, any group structure, and any partition count — provided
    the order carries a unique tie-break (here the synthetic id)."""
    from pyspark.sql import Window

    from tropology_spark.plans.global_order import global_row_number

    df = spark.createDataFrame(
        [(g, k, i) for i, (g, k) in enumerate(rows)], "g int, k int, id int"
    )
    got = {
        (r["g"], r["id"]): r["pos"]
        for r in global_row_number(
            df, ["k", "id"], group_cols=["g"], out="pos", num_partitions=nparts
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("k", "id")
    want = {
        (r["g"], r["id"]): r["pos"]
        for r in df.withColumn("pos", F.row_number().over(w)).collect()
    }
    assert got == want


@settings(**SMALL)
@given(
    probes=st.lists(st.integers(min_value=0, max_value=5000), min_size=0, max_size=25),
    cands=st.lists(st.integers(min_value=0, max_value=5000), min_size=0, max_size=25),
)
def test_band_bucket_join_equals_theta_join(spark, probes, cands):
    """The M197 band-join rewrite property on arbitrary data: keying
    both sides by the W-bucket and exploding the probe side to
    (b, b-1) yields EXACTLY the pairs of the declarative theta join
    c <= p AND p - c <= W — each matched pair exactly once (the
    candidate's bucket is unique), none missed (an in-band candidate's
    bucket can only be b or b-1), including the W and 0 boundaries."""
    W_BAND = 900
    p = spark.createDataFrame(
        [(i, t) for i, t in enumerate(probes)] or [(None, None)], "pid int, p int"
    ).filter(F.col("pid").isNotNull())
    c = spark.createDataFrame(
        [(j, t) for j, t in enumerate(cands)] or [(None, None)], "cid int, c int"
    ).filter(F.col("cid").isNotNull())
    want = {
        (i, j)
        for i, pt in enumerate(probes)
        for j, ct in enumerate(cands)
        if ct <= pt and pt - ct <= W_BAND
    }
    p2 = p.withColumn(
        "b",
        F.explode(
            F.array(
                F.expr(f"p div {W_BAND}"), F.expr(f"p div {W_BAND} - 1")
            )
        ),
    )
    c2 = c.withColumn("cb", F.expr(f"c div {W_BAND}"))
    got = {
        (r["pid"], r["cid"])
        for r in p2.join(c2, F.col("b") == F.col("cb"))
        .filter((F.col("c") <= F.col("p")) & (F.col("p") - F.col("c") <= W_BAND))
        .collect()
    }
    assert got == want
    # exactly-once: the inner join can never duplicate a pair
    dup = (
        p2.join(c2, F.col("b") == F.col("cb"))
        .filter((F.col("c") <= F.col("p")) & (F.col("p") - F.col("c") <= W_BAND))
        .groupBy("pid", "cid")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


@settings(**SMALL)
@given(
    vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40)
)
def test_med2x_carrier_is_exact_integer(spark, vals):
    """The M195/M206 med2x carrier: 2 x percentile(x, 0.5) over BIGINTs
    is always an exact integer (value or midpoint of two values) and
    equals the doubled statistics.median — the property that makes the
    rolling/grouped medians hash-comparable across engines."""
    import statistics

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.agg((2 * F.expr("percentile(v, 0.5)")).alias("m2")).collect()[0]["m2"]
    want = 2 * statistics.median(vals)
    assert got == want
    assert float(got).is_integer()


@settings(max_examples=50, deadline=None)
@given(
    spends=st.lists(st.integers(min_value=0, max_value=10**7), min_size=2, max_size=80)
)
def test_gini_rank_identity_matches_pairwise_definition(spends):
    """M192's Lorenz rank identity vs the canonical mean-absolute-
    difference definition of Gini — pure math, no engines: parity can
    only prove Spark == DuckDB, not that both compute Gini.  With
    x sorted ascending and 1-based ranks i:
    (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)  ==  Σ_ij |x_i − x_j| / (2n·Σx)."""
    from fractions import Fraction

    if sum(spends) == 0:
        return
    xs = sorted(spends)
    n = len(xs)
    s = sum(xs)
    rank_form = Fraction(2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * s,
                         n * s)
    pair_form = Fraction(sum(abs(a - b) for a in xs for b in xs), 2 * n * s)
    assert rank_form == pair_form


@settings(max_examples=50, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=130), min_size=1, max_size=200)
)
def test_counting_quantile_ranks_match_sorted_indexing(vals):
    """M196's counting-quantile construction vs direct sorted-list
    indexing: the smallest value whose cumulative count reaches rank
    (n+1) div 2 is the lower median, and rank ceil(0.9·n) = (9n+9)
    div 10 is the discrete p90 — for any multiset over the bounded
    domain."""
    from collections import Counter

    n = len(vals)
    xs = sorted(vals)
    cnt = Counter(vals)

    def by_counting(rank: int) -> int:
        cum = 0
        for v in sorted(cnt):
            cum += cnt[v]
            if cum >= rank:
                return v
        raise AssertionError("rank beyond total")

    r50 = (n + 1) // 2
    r90 = (9 * n + 9) // 10
    assert by_counting(r50) == xs[r50 - 1]
    assert by_counting(r90) == xs[r90 - 1]
    assert r90 == -((-9 * n) // 10)  # (9n+9) div 10 IS ceil(0.9 n)


@settings(**SMALL)
@given(
    purchases=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),      # user
            st.integers(min_value=0, max_value=5400),   # seconds
        ),
        min_size=1,
        max_size=12,
    ),
    views=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=5400),
        ),
        min_size=0,
        max_size=20,
    ),
)
def test_asof_tolerance_equals_bruteforce(spark, purchases, views):
    """M217 property: the registered bucketed as-of (run on a synthetic
    events frame via the events= substitution) equals the brute-force
    definition — latest same-user view with p-v in [0, TOL], ties to
    the larger event id, sentinel otherwise — for arbitrary timestamp
    layouts including exact bucket boundaries (TOL=1800 s and the
    generator range straddles 3 buckets)."""
    from tropology_spark.operators.relational import (
        _ASOF_TOL_US,
        join_asof_tolerance,
    )

    rows = [
        (i, u, "purchase", s) for i, (u, s) in enumerate(purchases)
    ] + [
        (1000 + j, u, "view", s) for j, (u, s) in enumerate(views)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, sec long"
    ).select(
        "event_id", "user_id", "event_type", F.expr("timestamp_seconds(sec)").alias("ts")
    )
    got = {
        r["purchase_id"]: (r["last_view_id"], r["staleness_us"])
        for r in join_asof_tolerance(spark, "unused", events=ev).collect()
    }
    tol_s = _ASOF_TOL_US // 1_000_000
    want = {}
    for i, (u, s) in enumerate(purchases):
        best = max(
            (
                (vs, 1000 + j)
                for j, (vu, vs) in enumerate(views)
                if vu == u and vs <= s and s - vs <= tol_s
            ),
            default=None,
        )
        want[i] = (
            (best[1], (s - best[0]) * 1_000_000) if best else (-1, -1)
        )
    assert got == want


@settings(**SMALL)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),    # event type index
            st.integers(min_value=0, max_value=4),    # user
            st.integers(min_value=0, max_value=12),   # hour (gappy)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_sliding_distinct_equals_setunion(spark, obs):
    """M218 property: the hour-offset-explode rewrite (run through the
    registered query via the events= substitution) equals the direct
    trailing-3h set union at every observed (type, hour) — for
    arbitrary gappy hour layouts (gaps must shrink the window's
    content, never pull in rows across them; unobserved hours must
    emit nothing)."""
    from tropology_spark.operators.timeseries import ts_sliding_distinct

    types = ["click", "view"]
    rows = [
        (i, u, types[t], h * 3600)
        for i, (t, u, h) in enumerate(obs)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, sec long"
    ).select(
        "event_id", "user_id", "event_type",
        F.expr("timestamp_seconds(sec)").alias("ts"),
    )
    got = {
        (r["event_type"], r["hour"]): r["n_users_3h"]
        for r in ts_sliding_distinct(spark, "unused", events=ev).collect()
    }
    users: dict = {}
    for t, u, h in obs:
        users.setdefault((types[t], h), set()).add(u)
    want = {
        (ty, h): len(
            users.get((ty, h), set())
            | users.get((ty, h - 1), set())
            | users.get((ty, h - 2), set())
        )
        for (ty, h) in users
    }
    assert got == want
