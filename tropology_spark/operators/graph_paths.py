"""Graph traversal operators (SURVEY.md §2.M M38) — bounded-depth
shortest paths over the bipartite wiki-link graph.

Registered after the pipeline_ops module on purpose: the driver's
correctness window covers registry positions in insertion order, and
the north-star pipeline ops outrank traversal depth for window slots
(tropology_spark/__init__.py ordering note).

Scale notes (§7.7): each expansion is one join of the frontier against
the src-bucketed edge table — frontier-sized shuffle, never an edge
shuffle.  Depth is fixed (the product shape: "how close is trope X" UI
hops are 2-3), which bounds cost AND makes the operator ANSI-SQL
expressible via unrolled CTEs, the graph_pagerank3 trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tropology_spark.registry import register
from tropology_spark.sources.tables import CUST_A

_BI_CTE = """
    WITH edges AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    bi AS (SELECT 'c:' || CAST(src AS VARCHAR) AS u,
                  'p:' || CAST(dst AS VARCHAR) AS v FROM edges
           UNION ALL
           SELECT 'p:' || CAST(dst AS VARCHAR), 'c:' || CAST(src AS VARCHAR)
           FROM edges)
"""


@register(
    "graph_bfs3",
    oracle=_BI_CTE
    + f"""
    , n1 AS (SELECT DISTINCT v FROM bi WHERE u = 'c:{CUST_A}'),
      n2 AS (SELECT DISTINCT b.v FROM bi b JOIN n1 ON b.u = n1.v),
      n3 AS (SELECT DISTINCT b.v FROM bi b JOIN n2 ON b.u = n2.v),
      levels AS (
        SELECT 'c:{CUST_A}' AS node, 0 AS dist
        UNION ALL SELECT v, 1 FROM n1
        UNION ALL SELECT v, 2 FROM n2
        UNION ALL SELECT v, 3 FROM n3)
    SELECT node, CAST(min(dist) AS BIGINT) AS dist
    FROM levels GROUP BY node
    """,
)
def graph_bfs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M38 — BFS shortest-path distance (<= 3 hops) from a focus work
    over the undirected bipartite graph: the "degrees of separation"
    between a work and every reachable trope/work in UI range.

    Three frontier expansions (join frontier → edge table, distinct),
    then min-distance per node over the leveled union — identical
    unrolled shape in the DuckDB oracle.  Distances are small ints;
    node ids are namespaced strings — exact carriers."""
    from tropology_spark.operators.graph import bi_materialized

    bi = bi_materialized(spark, sf_dir)
    start = spark.createDataFrame([(f"c:{CUST_A}",)], "v string")
    levels = [start.select(F.col("v").alias("node"), F.lit(0).alias("dist"))]
    frontier = start
    for depth in (1, 2, 3):
        frontier = (
            bi.join(frontier.select(F.col("v").alias("u")), "u")
            .select("v")
            .distinct()
        )
        levels.append(frontier.select(F.col("v").alias("node"), F.lit(depth).alias("dist")))
    leveled = levels[0]
    for lv in levels[1:]:
        leveled = leveled.unionByName(lv)
    return leveled.groupBy("node").agg(F.min("dist").cast("bigint").alias("dist"))


# ---------------------------------------------------------------------------
# M92 — deterministic random walks (node2vec-style sampling)
# ---------------------------------------------------------------------------


@register(
    "graph_random_walk3",
    oracle=_BI_CTE
    + """
    , starts AS (SELECT DISTINCT 'c:' || CAST(src AS VARCHAR) AS start FROM edges),
    s1 AS (
      SELECT start, v AS n1 FROM (
        SELECT s.start, b.v,
               row_number() OVER (PARTITION BY s.start
                                  ORDER BY md5(s.start || '_1_' || b.v), b.v) AS rn
        FROM starts s JOIN bi b ON b.u = s.start) t
      WHERE rn = 1
    ),
    s2 AS (
      SELECT start, n1, v AS n2 FROM (
        SELECT s.start, s.n1, b.v,
               row_number() OVER (PARTITION BY s.start
                                  ORDER BY md5(s.n1 || '_2_' || b.v), b.v) AS rn
        FROM s1 s JOIN bi b ON b.u = s.n1) t
      WHERE rn = 1
    ),
    s3 AS (
      SELECT start, n1, n2, v AS n3 FROM (
        SELECT s.start, s.n1, s.n2, b.v,
               row_number() OVER (PARTITION BY s.start
                                  ORDER BY md5(s.n2 || '_3_' || b.v), b.v) AS rn
        FROM s2 s JOIN bi b ON b.u = s.n2) t
      WHERE rn = 1
    )
    SELECT start, n1, n2, n3 FROM s3
    """,
)
def graph_random_walk3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M92 — one length-3 walk from every work node, the sampling pass
    graph-embedding training data comes from (DeepWalk/node2vec input
    sequences).  "Random" is a deterministic hash choice: at step i the
    walker at u moves to the neighbor v minimizing md5(u_i_v) — an
    unbiased-looking but reproducible draw, so retries, both engines,
    and any partitioning agree on every path (the plans/skew.py
    content-salt philosophy applied to sampling).

    Scale: each step is frontier ⋈ src-bucketed edges + an argmin
    window partitioned by walker — frontier-sized shuffles only; depth
    is fixed so the whole walk unrolls into 3 joins (the bfs3 shape)."""
    from tropology_spark.operators.graph import bi_materialized
    from tropology_spark.sources.tables import edges_materialized

    e = edges_materialized(spark, sf_dir)
    c_node = F.concat(F.lit("c:"), F.col("src").cast("string"))
    bi = bi_materialized(spark, sf_dir)
    from pyspark.sql import Window

    cur = e.select(c_node.alias("start")).distinct()
    carried = ["start"]
    for step in (1, 2, 3):
        prev = carried[-1]
        h = F.md5(F.concat(F.col(prev), F.lit(f"_{step}_"), F.col("v")))
        w = Window.partitionBy("start").orderBy(h, F.col("v"))
        cur = (
            cur.join(bi, F.col(prev) == F.col("u"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(*carried, F.col("v").alias(f"n{step}"))
        )
        carried.append(f"n{step}")
    return cur


# ---------------------------------------------------------------------------
# M100 — weighted shortest path (<= 3 hops): Bellman-Ford, cents-exact
# ---------------------------------------------------------------------------

_WEIGHTED_CTE = """
    WITH we AS (
      SELECT o_custkey AS src, l_partkey AS dst,
             CAST(min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ),
    bi AS (SELECT 'c:' || CAST(src AS VARCHAR) AS u,
                  'p:' || CAST(dst AS VARCHAR) AS v, w FROM we
           UNION ALL
           SELECT 'p:' || CAST(dst AS VARCHAR),
                  'c:' || CAST(src AS VARCHAR), w FROM we)
"""


@register(
    "graph_sssp3",
    oracle=_WEIGHTED_CTE
    + f"""
    , p1 AS (SELECT v AS node, CAST(min(w) AS BIGINT) AS d
             FROM bi WHERE u = 'c:{CUST_A}' GROUP BY v),
      p2 AS (SELECT b.v AS node, CAST(min(p1.d + b.w) AS BIGINT) AS d
             FROM bi b JOIN p1 ON b.u = p1.node GROUP BY b.v),
      p3 AS (SELECT b.v AS node, CAST(min(p2.d + b.w) AS BIGINT) AS d
             FROM bi b JOIN p2 ON b.u = p2.node GROUP BY b.v),
      lv AS (SELECT 'c:{CUST_A}' AS node, CAST(0 AS BIGINT) AS d
             UNION ALL SELECT node, d FROM p1
             UNION ALL SELECT node, d FROM p2
             UNION ALL SELECT node, d FROM p3)
    SELECT node, CAST(min(d) AS BIGINT) AS dist_cents FROM lv GROUP BY node
    """,
)
def graph_sssp3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M100 — single-source WEIGHTED shortest path (<= 3 hops) from the
    focus work: Bellman-Ford unrolled to a fixed depth, the weighted
    sibling of graph_bfs3.  Edge weight = cheapest observed price of
    the link in integer cents (exact carrier); path cost is a BIGINT
    sum, so min-plus relaxation is bit-identical across engines.

    Each round is the dynamic program p_k(v) = min_u(p_{{k-1}}(u) +
    w(u,v)) — exactly-k-hop best cost — and the answer is the min over
    rounds.  Scale (SURVEY.md §7.7): identical to bfs3 — frontier ⋈
    src-bucketed weighted edges per round, frontier-sized shuffles,
    never an edge-table shuffle; weights ride along the existing edge
    partitioning.  Fixed depth keeps it ANSI-expressible (the
    pagerank3 unroll trick)."""
    from tropology_spark.sources.tables import load

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_extendedprice")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    we = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst"))
        .agg(F.min(cents).cast("bigint").alias("w"))
    )
    c_node = F.concat(F.lit("c:"), F.col("src").cast("string"))
    p_node = F.concat(F.lit("p:"), F.col("dst").cast("string"))
    bi = (
        we.select(c_node.alias("u"), p_node.alias("v"), "w")
        .unionByName(we.select(p_node.alias("u"), c_node.alias("v"), "w"))
        .localCheckpoint(eager=True)
    )
    focus = f"c:{CUST_A}"
    p = (
        bi.filter(F.col("u") == focus)
        .groupBy(F.col("v").alias("node"))
        .agg(F.min("w").cast("bigint").alias("d"))
    )
    levels = [
        spark.createDataFrame([(focus, 0)], "node string, d long"),
        p,
    ]
    for _ in (2, 3):
        p = (
            bi.join(p.select(F.col("node").alias("u"), "d"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.min(F.col("d") + F.col("w")).cast("bigint").alias("d"))
        )
        levels.append(p)
    lv = levels[0]
    for x in levels[1:]:
        lv = lv.unionByName(x)
    return lv.groupBy("node").agg(F.min("d").cast("bigint").alias("dist_cents"))


# ---------------------------------------------------------------------------
# M111 — bounded closeness centrality (multi-source BFS)
# ---------------------------------------------------------------------------

_CLOSENESS_MAX_SRC = 10  # focus works: src < 10 (the UI compare panel)


@register(
    "graph_closeness3",
    oracle=_BI_CTE
    + f"""
    , starts AS (SELECT DISTINCT 'c:' || CAST(src AS VARCHAR) AS start
                 FROM edges WHERE src < {_CLOSENESS_MAX_SRC}),
    f1 AS (SELECT DISTINCT s.start, b.v FROM starts s JOIN bi b ON b.u = s.start),
    f2 AS (SELECT DISTINCT f.start, b.v FROM f1 f JOIN bi b ON b.u = f.v),
    f3 AS (SELECT DISTINCT f.start, b.v FROM f2 f JOIN bi b ON b.u = f.v),
    levels AS (
        SELECT start, start AS node, 0 AS dist FROM starts
        UNION ALL SELECT start, v, 1 FROM f1
        UNION ALL SELECT start, v, 2 FROM f2
        UNION ALL SELECT start, v, 3 FROM f3),
    sp AS (SELECT start, node, min(dist) AS dist
           FROM levels GROUP BY start, node)
    SELECT start,
           CAST(count(*) - 1 AS BIGINT) AS n_reached,
           CAST(sum(dist) AS BIGINT) AS sum_dist
    FROM sp GROUP BY start
    """,
)
def graph_closeness3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M111 — bounded closeness centrality for the focus works
    (src < 10): how many nodes each reaches within 3 hops and
    the total shortest-path distance — the exact integer terms of
    harmonic/closeness centrality (the float ratio n_reached/sum_dist
    is left to the consumer, per the M79 co-moment discipline).

    Multi-source BFS: the (start, node) frontier expands through the
    same three unrolled joins as M38, deduplicated per level, then
    min-dist per pair.  Scale: frontier-sized shuffles only; starts
    are a filter pushdown on the edge scan, so cost is proportional to
    the probed neighborhood, not the graph."""
    from tropology_spark.operators.graph import bi_materialized
    from tropology_spark.sources.tables import edges_materialized

    e = edges_materialized(spark, sf_dir)
    c_node = F.concat(F.lit("c:"), F.col("src").cast("string"))
    bi = bi_materialized(spark, sf_dir)
    starts = (
        e.filter(F.col("src") < _CLOSENESS_MAX_SRC)
        .select(c_node.alias("start"))
        .distinct()
    )
    levels = [starts.select("start", F.col("start").alias("node"), F.lit(0).alias("dist"))]
    frontier = starts.select("start", F.col("start").alias("v"))
    for depth in (1, 2, 3):
        frontier = (
            bi.join(frontier.select("start", F.col("v").alias("u")), "u")
            .select("start", "v")
            .distinct()
        )
        levels.append(
            frontier.select("start", F.col("v").alias("node"), F.lit(depth).alias("dist"))
        )
    leveled = levels[0]
    for lv in levels[1:]:
        leveled = leveled.unionByName(lv)
    sp = leveled.groupBy("start", "node").agg(F.min("dist").alias("dist"))
    return sp.groupBy("start").agg(
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_reached"),
        F.sum("dist").cast("bigint").alias("sum_dist"),
    )


# ---------------------------------------------------------------------------
# M262 graph_path_counts3 — exact path counts from a seed set (PPR numerator)
# ---------------------------------------------------------------------------

_PATH_SEEDS = 3


@register(
    "graph_path_counts3",
    oracle=f"""
    WITH edges AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
    seeds AS (SELECT src FROM (
                SELECT src, row_number() OVER (ORDER BY d DESC, src) AS rs1
                FROM deg) t
              WHERE rs1 <= {_PATH_SEEDS}),
    p1 AS (SELECT e.dst AS node, CAST(count(*) AS BIGINT) AS n_paths
           FROM edges e JOIN seeds s ON e.src = s.src GROUP BY e.dst),
    p2 AS (SELECT e2.src AS node, CAST(sum(p1.n_paths) AS BIGINT) AS n_paths
           FROM p1 JOIN edges e2 ON e2.dst = p1.node GROUP BY e2.src),
    p3 AS (SELECT e3.dst AS node, CAST(sum(p2.n_paths) AS BIGINT) AS n_paths
           FROM p2 JOIN edges e3 ON e3.src = p2.node GROUP BY e3.dst)
    SELECT CAST(1 AS BIGINT) AS hop, node, n_paths FROM p1
    UNION ALL SELECT CAST(2 AS BIGINT), node, n_paths FROM p2
    UNION ALL SELECT CAST(3 AS BIGINT), node, n_paths FROM p3
    """,
)
def graph_path_counts3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M262 — exact PATH COUNTS from a deterministic seed set
    (the 3 highest-out-degree works, degree-desc/key-asc tie-break):
    per node, the number of distinct length-1/2/3 paths from any seed,
    alternating work→trope→work→trope on the bipartite edge list —
    the exact-integer numerator of personalized PageRank (PPR mass at
    hop h = path counts weighted by damping^h / degree products; the
    COUNTS cross the engine hash gate where the float masses never
    would — I8's accepted-risk carrier avoided entirely).  Paths may
    revisit nodes (pure path semantics, the standard A^h definition).

    Scale: each hop is one equi-join against the shared edge view +
    one map-side-combinable rollup — the A^h·x sparse mat-vec shape;
    per-hop frontiers are checkpointed (each feeds the next hop AND
    the output union).  Counts are BIGINT-exact: ≤ seeds·maxdeg³ ~
    1e12 at 100 TB, far inside the carrier.

    Round-19 optimization: served from the session-shared
    :func:`path_counts3_materialized` view — the M354 Katz
    composition consumes the identical frame, and before the view it
    re-ran the whole 3-hop propagation."""
    return path_counts3_materialized(spark, sf_dir)


_PC3_CACHE: dict[tuple[str, str], DataFrame] = {}

from tropology_spark.sources.tables import SESSION_CACHES  # noqa: E402

SESSION_CACHES.append(_PC3_CACHE)


def path_counts3_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered M262 frame ``(hop, node, n_paths)``, eagerly
    materialized once per (session, sf_dir) — the single home of the
    3-hop path-count propagation, shared by graph_path_counts3 and
    graph_katz3_score (M354)."""
    from tropology_spark.sources.tables import cache_get_or_build

    def build() -> DataFrame:
        from tropology_spark.session import iter_materialize

        return iter_materialize(_path_counts3_frame(spark, sf_dir))

    return cache_get_or_build(
        _PC3_CACHE, (spark.sparkContext.applicationId, sf_dir), build
    )


def _path_counts3_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tropology_spark.session import iter_materialize
    from tropology_spark.sources.tables import edges_materialized

    e = edges_materialized(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    seeds = (
        deg.orderBy(F.desc("d"), F.asc("src"))
        .limit(_PATH_SEEDS)
        .select("src")
    )
    p1 = iter_materialize(
        e.join(F.broadcast(seeds), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    )
    e2 = e.select(F.col("src").alias("node2"), F.col("dst").alias("node"))
    p2 = iter_materialize(
        p1.join(e2, "node")
        .groupBy(F.col("node2").alias("node"))
        .agg(F.sum("n_paths").cast("bigint").alias("n_paths"))
    )
    e3 = e.select(F.col("src").alias("node"), F.col("dst").alias("node3"))
    p3 = (
        p2.join(e3, "node")
        .groupBy(F.col("node3").alias("node"))
        .agg(F.sum("n_paths").cast("bigint").alias("n_paths"))
    )
    hop = lambda n, df: df.select(  # noqa: E731
        F.lit(n).cast("bigint").alias("hop"), "node", "n_paths"
    )
    return hop(1, p1).unionByName(hop(2, p2)).unionByName(hop(3, p3))


# ---------------------------------------------------------------------------
# graph_ball2_sizes — exact 1/2-hop ball sizes for the top-degree seeds (M292)
# ---------------------------------------------------------------------------

_BALL_SEEDS = 3


@register(
    "graph_ball2_sizes",
    oracle=f"""
    WITH edges AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
    seeds AS (SELECT src FROM (
                SELECT src, row_number() OVER (ORDER BY d DESC, src) AS rs1
                FROM deg) t
              WHERE rs1 <= {_BALL_SEEDS}),
    b1 AS (SELECT DISTINCT s.src AS seed, e.dst
           FROM seeds s JOIN edges e ON e.src = s.src),
    b2 AS (SELECT DISTINCT b1.seed, e2.src AS w
           FROM b1 JOIN edges e2 ON e2.dst = b1.dst
           WHERE e2.src <> b1.seed)
    SELECT b1c.seed, b1c.n_ball1, b2c.n_ball2
    FROM (SELECT seed, CAST(count(*) AS BIGINT) AS n_ball1
          FROM b1 GROUP BY seed) b1c
    JOIN (SELECT seed, CAST(count(*) AS BIGINT) AS n_ball2
          FROM b2 GROUP BY seed) b2c
      ON b1c.seed = b2c.seed
    """,
)
def graph_ball2_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M292 — exact NEIGHBORHOOD-FUNCTION point values: for
    the {s} highest-out-degree works (graph_path_counts3's seed rule),
    |ball(seed, 1)| = its distinct tropes and |ball(seed, 2)| = the
    distinct OTHER works sharing any trope — the first two points of
    the ANF curve N(v, h) that reachability/influence analyses
    estimate with sketches at scale; exact DISTINCT counts here (M262
    counts PATHS — multiplicities; this counts the reached SET, the
    other half of the A^h story).

    Scale: the seed set is bounded (broadcast); hop 1 is one
    broadcast-semi join; hop 2 is one equi-join back on the shared
    edge view + a distinct rollup keyed by (seed, work).  At 100 TB
    the per-seed frontier is the only growing state — the exact-ANF
    shape; corpus-wide N(h) needs the HLL register trick (M267) on
    the frontier, the documented scale path (graph_reach2_hll_audit
    runs exactly that, next to this truth)."""
    from tropology_spark.session import iter_materialize
    from tropology_spark.sources.tables import edges_materialized

    e = edges_materialized(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    seeds = deg.orderBy(F.desc("d"), F.asc("src")).limit(_BALL_SEEDS).select("src")
    b1 = iter_materialize(
        e.join(F.broadcast(seeds), "src").select(
            F.col("src").alias("seed"), "dst"
        ).distinct()
    )  # referenced by the hop-1 count AND the hop-2 expansion
    e2 = e.select(F.col("src").alias("w"), "dst")
    b2 = (
        b1.join(e2, "dst")
        .filter(F.col("w") != F.col("seed"))
        .select("seed", "w")
        .distinct()
    )
    b1c = b1.groupBy("seed").agg(F.count(F.lit(1)).cast("bigint").alias("n_ball1"))
    b2c = b2.groupBy("seed").agg(F.count(F.lit(1)).cast("bigint").alias("n_ball2"))
    return b1c.join(b2c, "seed")


graph_ball2_sizes.__doc__ = graph_ball2_sizes.__doc__.format(s=_BALL_SEEDS)


# ---------------------------------------------------------------------------
# M354 graph_katz3_score — dyadic truncated Katz centrality over seed paths
# ---------------------------------------------------------------------------


def _katz3_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH pc AS MATERIALIZED ({ORACLES["graph_path_counts3"]})
    SELECT node,
           CAST(sum(CASE hop WHEN 1 THEN 16 * n_paths
                             WHEN 2 THEN 4 * n_paths
                             ELSE n_paths END) AS BIGINT) AS katz_x64,
           CAST(coalesce(sum(CASE WHEN hop = 1 THEN n_paths END), 0)
                AS BIGINT) AS p1,
           CAST(coalesce(sum(CASE WHEN hop = 2 THEN n_paths END), 0)
                AS BIGINT) AS p2,
           CAST(coalesce(sum(CASE WHEN hop = 3 THEN n_paths END), 0)
                AS BIGINT) AS p3
    FROM pc GROUP BY node
    ORDER BY katz_x64 DESC, node LIMIT 20
    """


@register("graph_katz3_score", oracle=_katz3_oracle())
def graph_katz3_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.M M354 — truncated KATZ centrality from the M262 seed
    set: katz_x64 = 16·p1 + 4·p2 + p3, the hop-discounted path count
    with attenuation β = 1/4 carried ×4³ so every term is an exact
    integer (the dyadic-weight discipline of agg_exp_decay_counts) —
    top-20 nodes by discounted reachability from the hubs, the
    influence ranking that, unlike raw reach, cannot be dominated by
    a long tail of barely-reachable nodes.

    Composed, not copied: the session-shared
    path_counts3_materialized view IS the input
    (QUERIES['graph_path_counts3'] serves the same view — round-19
    sharing); the oracle wraps ORACLES['graph_path_counts3'] AS
    MATERIALIZED (the DuckDB inlining trap).  Scale: a
    3-row-per-node rollup over the existing frame + one bounded
    top-20 sort-limit."""
    pc = path_counts3_materialized(spark, sf_dir)
    agg = pc.groupBy("node").agg(
        F.sum(
            F.when(F.col("hop") == 1, 16 * F.col("n_paths"))
            .when(F.col("hop") == 2, 4 * F.col("n_paths"))
            .otherwise(F.col("n_paths"))
        )
        .cast("bigint")
        .alias("katz_x64"),
        F.coalesce(F.sum(F.when(F.col("hop") == 1, F.col("n_paths"))), F.lit(0))
        .cast("bigint")
        .alias("p1"),
        F.coalesce(F.sum(F.when(F.col("hop") == 2, F.col("n_paths"))), F.lit(0))
        .cast("bigint")
        .alias("p2"),
        F.coalesce(F.sum(F.when(F.col("hop") == 3, F.col("n_paths"))), F.lit(0))
        .cast("bigint")
        .alias("p3"),
    )
    return agg.select("node", "katz_x64", "p1", "p2", "p3").orderBy(
        F.desc("katz_x64"), F.asc("node")
    ).limit(20)
