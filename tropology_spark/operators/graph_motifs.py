"""Graph motif counting (SURVEY.md §2.M M56, M65, M70) — triangle
counts and local clustering structure on the co-purchase projection,
and butterfly counts on the bipartite link graph itself.

The link table (``sources.tables.edges``) is bipartite (work → trope in
tropology terms, customer → part here), so it contains no triangles by
construction.  The standard motif pipeline first PROJECTS it to a
unipartite co-occurrence graph — two customers are adjacent when they
share at least ``_MIN_SHARED`` parts — then counts triangles with the
oriented wedge join (every edge stored once as ``u < v``, so each
triangle ``u < v < w`` is enumerated exactly once).

Determinism: every output is an integer count over integer keys — no
floats anywhere.

Scale notes (SURVEY.md §7.7): the projection's cost is Σ_parts C(deg,2)
— quadratic in hub-part degree, the same celebrity-node shape as J2/J9;
the shared-part threshold prunes the long tail of weak pairs before the
triangle join, hub parts are AQE-skew-split, and beyond that the
projection itself would be LSH/cap-bounded like the dedup family.  The
triangle join is self-joins of the (much smaller) projected edge list,
materialized once (Spark does not reuse aliased exchange branches —
CLAUDE.md perf note) and shuffled on the join keys; orientation keeps
each wedge closed once instead of six times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.operators.graph import TWOHOP_DEGREE_CAP
from tropology_spark.registry import register
from tropology_spark.sources.tables import SESSION_CACHES, cache_get_or_build, edges

#: Minimum shared parts for a projected co-purchase edge.  At sf0.01
#: this keeps ~65k of 214k candidate pairs; at sf0.1 the graph is
#: sparser (more customers dilute co-purchase) and ~15k pairs survive.
_MIN_SHARED = 3

#: The thresholded projection is the shared (and dominant: the wedge
#: self-join) input of M56 and M70 — checkpoint it once per
#: (session, sf) like sources.tables._LOAD_CACHE, so a session running
#: several motif queries pays the projection once.  Keyed by
#: applicationId: a fresh session never sees stale handles.
_PROJ_CACHE: dict[tuple[str, str, int | None], DataFrame] = {}
SESSION_CACHES.append(_PROJ_CACHE)


def copurchase_projection(
    spark: SparkSession, sf_dir: str, hub_cap: int | None = None
) -> DataFrame:
    """Projected co-purchase edge list ``(u < v)`` with >= _MIN_SHARED
    shared parts, localCheckpoint-materialized (three aliased triangle
    branches + the degree count would otherwise each re-derive the
    orders ⋈ lineitem ⋈ self pipeline).

    ``hub_cap`` is the 100 TB skew lever (SCALE.md watchlist item 1,
    wired before any full run): parts linked by more than ``hub_cap``
    customers are dropped BEFORE the wedge self-join, bounding its
    per-part cost at C(hub_cap, 2).  A documented sparsifier: capped
    output pairs are always a subset of the uncapped projection
    (removing a part can only lower a pair's shared count), pinned by
    tests/test_units.py.  Declared queries run uncapped — the fixture
    graphs need no cap."""
    key = (spark.sparkContext.applicationId, sf_dir, hub_cap)
    return cache_get_or_build(
        _PROJ_CACHE, key, lambda: _projection_build(spark, sf_dir, hub_cap)
    )


def _projection_build(
    spark: SparkSession,
    sf_dir: str,
    hub_cap: int | None,
    e: DataFrame | None = None,
) -> DataFrame:
    """``e`` substitutes a pre-built ``(src, dst)`` edge frame for the
    table-derived one (scale probes run the exact production shape on
    replicated edges)."""
    if e is None:
        e = edges(spark, sf_dir)
    if hub_cap is not None:
        # Anti-join the HOT list (|E|/cap rows by construction — the
        # small side), not an inner join on the O(parts) cold list:
        # at scale the cold list is nearly the whole part dimension
        # and broadcasting it would be the wrong side.  Broadcast is
        # gated like the other capped paths (graph.py).
        from tropology_spark.operators.graph import BROADCAST_NODE_LIMIT

        hot = (
            e.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("part_deg"))
            .filter(F.col("part_deg") > hub_cap)
            .select("dst")
            .localCheckpoint(eager=True)
        )
        if hot.count() <= BROADCAST_NODE_LIMIT:
            hot = F.broadcast(hot)
        e = e.join(hot, "dst", "left_anti")
    a = e.select(F.col("src").alias("ua"), F.col("dst").alias("d"))
    b = e.select(F.col("src").alias("ub"), F.col("dst").alias("d"))
    proj = (
        a.join(b, "d")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy(F.col("ua").alias("u"), F.col("ub").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    return proj


@register(
    "graph_triangles",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    proj AS (
      SELECT a.src AS u, b.src AS v
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_SHARED}
    ),
    tri AS (
      SELECT e1.u, e1.v, e2.v AS w
      FROM proj e1
      JOIN proj e2 ON e2.u = e1.v
      JOIN proj e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    members AS (
      SELECT u AS node FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(count(*) AS BIGINT) AS n_triangles
    FROM members GROUP BY node
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M56 — per-node triangle participation on the co-purchase
    projection: project the bipartite link graph onto customers (edge
    iff >= {k} shared parts), then close oriented wedges.  Output is
    one row per node appearing in at least one triangle.

    The projected edge list is localCheckpoint-materialized because the
    triangle join references it from three aliased branches — without
    it Spark re-derives the projection (orders ⋈ lineitem ⋈ itself)
    per branch.  At 100 TB run the declared hub-capped twin (M120,
    ``graph_triangles_capped``)."""
    proj = copurchase_projection(spark, sf_dir)
    e1 = proj
    e2 = proj.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = proj.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = (
        e1.join(e2, "v")
        .join(e3, (F.col("u3") == F.col("u")) & (F.col("w3") == F.col("w")))
        .select("u", "v", "w")
    )
    members = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    return members.groupBy(F.col("node").cast("bigint").alias("node")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


#: Hub cap for the DECLARED capped motif query (M120): same constant
#: as the two-hop celebrity split (graph.py::TWOHOP_DEGREE_CAP) so the
#: two capped families cut the degree distribution at the same place.
_HUB_CAP = 32


@register(
    "graph_triangles_capped",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    keep AS (SELECT dst FROM e0 GROUP BY dst HAVING count(*) <= {_HUB_CAP}),
    e AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT dst FROM keep)),
    proj AS (
      SELECT a.src AS u, b.src AS v
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_SHARED}
    ),
    tri AS (
      SELECT e1.u, e1.v, e2.v AS w
      FROM proj e1
      JOIN proj e2 ON e2.u = e1.v
      JOIN proj e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    members AS (
      SELECT u AS node FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(count(*) AS BIGINT) AS n_triangles
    FROM members GROUP BY node
    """,
)
def graph_triangles_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M120 — hub-capped triangle participation: M56 over the
    sparsified projection (``hub_cap`` drops parts with more than
    _HUB_CAP linked customers BEFORE the wedge self-join, bounding
    per-part wedge cost at C(cap, 2) — the SCALE.md watch-item-1
    lever, now exercised by a DECLARED oracle-checked query instead of
    only a unit test).  Semantics are the documented sparsifier:
    capped pairs are a subset of the uncapped projection, and the
    triangle closure runs unchanged on the smaller edge list."""
    proj = copurchase_projection(spark, sf_dir, hub_cap=_HUB_CAP)
    e1 = proj
    e2 = proj.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = proj.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = (
        e1.join(e2, "v")
        .join(e3, (F.col("u3") == F.col("u")) & (F.col("w3") == F.col("w")))
        .select("u", "v", "w")
    )
    members = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    return members.groupBy(F.col("node").cast("bigint").alias("node")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


# ---------------------------------------------------------------------------
# M65 — butterfly counting (the bipartite motif; triangles cannot exist)
# ---------------------------------------------------------------------------


@register(
    "graph_butterflies",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    pairs AS (
      SELECT a.src AS u, b.src AS v, count(*) AS n_common
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
    ),
    bf AS (
      SELECT u, v, n_common * (n_common - 1) // 2 AS n_bf
      FROM pairs WHERE n_common >= 2
    ),
    members AS (
      SELECT u AS node, n_bf FROM bf
      UNION ALL SELECT v, n_bf FROM bf
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(sum(n_bf) AS BIGINT) AS n_butterflies
    FROM members GROUP BY node
    """,
)
def graph_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M65 — per-node butterfly (2x2 biclique) counts: the bipartite
    analog of triangle participation, the standard cohesion motif for
    two-mode graphs (Sanei-Mehri et al., KDD'18 — public algorithm).
    Two customers sharing n parts close C(n,2) butterflies; each
    counts toward both endpoints.  All-integer arithmetic.

    Plan: the wedge pair table (same dst-blocked self-join as I4/I9)
    aggregated once — no third join; butterfly counts are a closed form
    of the common-neighbor count.  At 100 TB the hub-part quadratic is
    the usual celebrity shape: per-part degree cap / AQE skew split on
    the dst join, and the pair table never re-shuffles (u and v sums
    are map-side-combinable unions)."""
    e = edges(spark, sf_dir)
    a = e.select(F.col("src").alias("ua"), F.col("dst").alias("d"))
    b = e.select(F.col("src").alias("ub"), F.col("dst").alias("d"))
    pairs = (
        a.join(b, "d")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy(F.col("ua").alias("u"), F.col("ub").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= 2)
    )
    bf = pairs.select(
        "u",
        "v",
        (F.col("n_common") * (F.col("n_common") - 1) / 2)
        .cast("bigint")
        .alias("n_bf"),
    )
    members = bf.select(F.col("u").alias("node"), "n_bf").unionAll(
        bf.select(F.col("v").alias("node"), "n_bf")
    )
    return members.groupBy(F.col("node").cast("bigint").alias("node")).agg(
        F.sum("n_bf").cast("bigint").alias("n_butterflies")
    )


# ---------------------------------------------------------------------------
# M134 — hub-capped butterflies (the M120 pattern for M65)
# ---------------------------------------------------------------------------


@register(
    "graph_butterflies_capped",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    keep AS (SELECT dst FROM e0 GROUP BY dst
             HAVING count(*) <= {TWOHOP_DEGREE_CAP}),
    e AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT dst FROM keep)),
    pairs AS (
      SELECT a.src AS u, b.src AS v, count(*) AS n_common
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
    ),
    bf AS (
      SELECT u, v, n_common * (n_common - 1) // 2 AS n_bf
      FROM pairs WHERE n_common >= 2
    ),
    members AS (
      SELECT u AS node, n_bf FROM bf
      UNION ALL SELECT v, n_bf FROM bf
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(sum(n_bf) AS BIGINT) AS n_butterflies
    FROM members GROUP BY node
    """,
)
def graph_butterflies_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M134 — hub-capped butterfly counts: M65 restricted to COLD parts
    (degree <= the shared celebrity cut, graph.TWOHOP_DEGREE_CAP), the
    declared 100 TB scale path for the one remaining quadratic motif
    without one.  The wedge cost drops from Σ deg² to cap·|E_cold|.

    Reuses the SESSION-SHARED cold co-pair view
    (``graph.capped_copair_materialized`` — the same half table M119
    and M121 consume), so butterflies are a closed-form fold over an
    aggregate that is already materialized: C(n_common, 2) per ordered
    pair, summed per endpoint.  No new wedge join at all."""
    from tropology_spark.operators.graph import capped_copair_materialized

    _hot, half, _cold_deg, _small = capped_copair_materialized(spark, sf_dir)
    bf = half.filter(F.col("n_common") >= 2).select(
        F.col("cust_a").alias("u"),
        F.col("cust_b").alias("v"),
        (F.col("n_common") * (F.col("n_common") - 1) / 2)
        .cast("bigint")
        .alias("n_bf"),
    )
    members = bf.select(F.col("u").alias("node"), "n_bf").unionAll(
        bf.select(F.col("v").alias("node"), "n_bf")
    )
    return members.groupBy(F.col("node").cast("bigint").alias("node")).agg(
        F.sum("n_bf").cast("bigint").alias("n_butterflies")
    )


# ---------------------------------------------------------------------------
# M70 — local clustering structure (triangles vs wedges, exact integers)
# ---------------------------------------------------------------------------


@register(
    "graph_clustering_pairs",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    proj AS (
      SELECT a.src AS u, b.src AS v
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_SHARED}
    ),
    und AS (SELECT u, v FROM proj UNION ALL SELECT v, u FROM proj),
    deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY u),
    tri AS (
      SELECT e1.u, e1.v, e2.v AS w
      FROM proj e1
      JOIN proj e2 ON e2.u = e1.v
      JOIN proj e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    members AS (
      SELECT u AS node FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri
    ),
    tcount AS (SELECT node, count(*) AS n_triangles FROM members GROUP BY node)
    SELECT CAST(d.node AS BIGINT) AS node,
           CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(d.d * (d.d - 1) // 2 AS BIGINT) AS n_wedges
    FROM deg d LEFT JOIN tcount t ON t.node = d.node
    WHERE d.d >= 2
    """,
)
def graph_clustering_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M70 — local clustering structure on the co-purchase projection:
    per node, closed triangles vs potential wedges C(deg,2).  The
    local clustering coefficient is their ratio — reported as the
    exact integer PAIR rather than the float division, so the gate
    stays hash-checkable and the consumer picks the precision.

    Plan: the M56 triangle pipeline plus a degree count on the same
    materialized projected edge list — the checkpoint is shared within
    the query, so the projection's hub-part quadratic (see M56) is
    paid once."""
    proj = copurchase_projection(spark, sf_dir)
    und = proj.unionAll(proj.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("dg"))
    e2 = proj.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = proj.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = (
        proj.join(e2, "v")
        .join(e3, (F.col("u3") == F.col("u")) & (F.col("w3") == F.col("w")))
        .select("u", "v", "w")
    )
    members = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    tcount = members.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        deg.filter(F.col("dg") >= 2)
        .join(tcount, "node", "left")
        .select(
            F.col("node").cast("bigint").alias("node"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            (F.col("dg") * (F.col("dg") - 1) / 2).cast("bigint").alias("n_wedges"),
        )
    )


# ---------------------------------------------------------------------------
# M135 — hub-capped clustering pairs (the M120 pattern for M70)
# ---------------------------------------------------------------------------


@register(
    "graph_clustering_pairs_capped",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    keep AS (SELECT dst FROM e0 GROUP BY dst HAVING count(*) <= {_HUB_CAP}),
    e AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT dst FROM keep)),
    proj AS (
      SELECT a.src AS u, b.src AS v
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_SHARED}
    ),
    und AS (SELECT u, v FROM proj UNION ALL SELECT v, u FROM proj),
    deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY u),
    tri AS (
      SELECT e1.u, e1.v, e2.v AS w
      FROM proj e1
      JOIN proj e2 ON e2.u = e1.v
      JOIN proj e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    members AS (
      SELECT u AS node FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri
    ),
    tcount AS (SELECT node, count(*) AS n_triangles FROM members GROUP BY node)
    SELECT CAST(d.node AS BIGINT) AS node,
           CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(d.d * (d.d - 1) // 2 AS BIGINT) AS n_wedges
    FROM deg d LEFT JOIN tcount t ON t.node = d.node
    WHERE d.d >= 2
    """,
)
def graph_clustering_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M135 — hub-capped local clustering structure: M70 over the
    SPARSIFIED projection (parts above _HUB_CAP linked customers are
    dropped before the wedge self-join — graph.TWOHOP_DEGREE_CAP's
    cut, same constant), closing the last quadratic motif without a
    declared scale path.  Reuses the session-cached hub-capped
    projection already built for M120 (``copurchase_projection`` with
    the same ``hub_cap`` key), so a session running both capped motif
    queries pays the capped wedge join once; the degree count and
    triangle closure run unchanged on the smaller edge list."""
    proj = copurchase_projection(spark, sf_dir, hub_cap=_HUB_CAP)
    und = proj.unionAll(proj.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("dg"))
    e2 = proj.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = proj.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = (
        proj.join(e2, "v")
        .join(e3, (F.col("u3") == F.col("u")) & (F.col("w3") == F.col("w")))
        .select("u", "v", "w")
    )
    members = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    tcount = members.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        deg.filter(F.col("dg") >= 2)
        .join(tcount, "node", "left")
        .select(
            F.col("node").cast("bigint").alias("node"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            (F.col("dg") * (F.col("dg") - 1) / 2).cast("bigint").alias("n_wedges"),
        )
    )


# ---------------------------------------------------------------------------
# M79 — degree-assortativity terms (exact integer co-moments)
# ---------------------------------------------------------------------------


@register(
    "graph_assortativity_terms",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    proj AS (
      SELECT a.src AS u, b.src AS v
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_SHARED}
    ),
    und AS (SELECT u, v FROM proj UNION ALL SELECT v, u FROM proj),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u)
    SELECT CAST(count(*) AS BIGINT) AS n_dir_edges,
           CAST(sum(du.d) AS BIGINT) AS sum_du,
           CAST(sum(dv.d) AS BIGINT) AS sum_dv,
           CAST(sum(du.d * dv.d) AS BIGINT) AS sum_dudv,
           CAST(sum(du.d * du.d) AS BIGINT) AS sum_du2,
           CAST(sum(dv.d * dv.d) AS BIGINT) AS sum_dv2
    FROM und
    JOIN deg du ON und.u = du.node
    JOIN deg dv ON und.v = dv.node
    """,
)
def graph_assortativity_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M79 — degree-assortativity raw terms over the co-purchase
    projection: for every directed edge (both orientations, the
    standard convention), the exact integer sums n, Σd_u, Σd_v,
    Σd_u·d_v, Σd_u², Σd_v².  Newman's assortativity coefficient is a
    closed-form ratio of these — emitted as integers so the gate stays
    hash-exact and the one float division happens at the consumer.

    Scale: degrees are O(nodes) → broadcast onto the edge list (no
    shuffle of edges for the enrichment); the final fold is a single
    scalar aggregate with map-side partials."""
    proj = copurchase_projection(spark, sf_dir)
    und = proj.unionAll(proj.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    return (
        und.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .agg(
            F.count(F.lit(1)).alias("n_dir_edges"),
            F.sum("du").cast("bigint").alias("sum_du"),
            F.sum("dv").cast("bigint").alias("sum_dv"),
            F.sum(F.col("du") * F.col("dv")).cast("bigint").alias("sum_dudv"),
            F.sum(F.col("du") * F.col("du")).cast("bigint").alias("sum_du2"),
            F.sum(F.col("dv") * F.col("dv")).cast("bigint").alias("sum_dv2"),
        )
    )


# ---------------------------------------------------------------------------
# M83 — HITS-style authority via exact path counts (bipartite-native)
# ---------------------------------------------------------------------------


@register(
    "graph_hits_paths",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    auth1 AS (SELECT dst, CAST(count(*) AS BIGINT) AS a1 FROM e GROUP BY dst),
    hub1 AS (
      SELECT e.src, CAST(sum(a.a1) AS BIGINT) AS h1
      FROM e JOIN auth1 a ON e.dst = a.dst
      GROUP BY e.src
    ),
    auth2 AS (
      SELECT e.dst, CAST(sum(h.h1) AS BIGINT) AS a2
      FROM e JOIN hub1 h ON e.src = h.src
      GROUP BY e.dst
    )
    SELECT CAST(a1.dst AS BIGINT) AS node,
           a1.a1 AS authority_1, a2.a2 AS authority_2
    FROM auth1 a1 JOIN auth2 a2 ON a1.dst = a2.dst
    """,
)
def graph_hits_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M83 — HITS (Kleinberg) authority on the bipartite link graph,
    kept EXACT by skipping normalization: with all-ones init, the
    unnormalized iterates are path counts — authority_1(part) = its
    degree, authority_2(part) = Σ paths of length 3 ending at it — and
    path counts are integers, so the ranking (identical to normalized
    HITS, which only rescales) is hash-checkable.  The float-vector
    HITS loop would sit under the same accepted-risk caveat as
    PageRank; this is the declarable form.

    Scale: two hub/authority half-steps = two map-side-combinable
    aggregates with the per-node vector joined back along the edge
    partitioning — the I8/PageRank shape without the damping floats;
    further iterations chain the same two joins."""
    e = edges(spark, sf_dir).localCheckpoint(eager=True)
    auth1 = e.groupBy("dst").agg(F.count(F.lit(1)).cast("bigint").alias("a1"))
    hub1 = (
        e.join(auth1, "dst")
        .groupBy("src")
        .agg(F.sum("a1").cast("bigint").alias("h1"))
    )
    auth2 = (
        e.join(hub1, "src")
        .groupBy("dst")
        .agg(F.sum("h1").cast("bigint").alias("a2"))
    )
    return (
        auth1.join(auth2, "dst")
        .select(
            F.col("dst").cast("bigint").alias("node"),
            F.col("a1").alias("authority_1"),
            F.col("a2").alias("authority_2"),
        )
    )


# ---------------------------------------------------------------------------
# M129 — modularity terms of a node partition (exact integer form)
# ---------------------------------------------------------------------------

_MOD_BUCKETS = 8


@register(
    "graph_modularity_terms",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS u,
                      'p:' || CAST(l_partkey AS VARCHAR) AS v
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    m AS (SELECT count(*) AS m_edges FROM e),
    nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
    bk AS (SELECT node,
                  ('0x' || substring(md5(node), 1, 8))::BIGINT % {_MOD_BUCKETS}
                    AS bucket
           FROM nodes),
    deg AS (SELECT node, count(*) AS d
            FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e) t
            GROUP BY node),
    per AS (
      SELECT bk.bucket,
             count(*) AS n_nodes,
             sum(deg.d) AS sum_degree
      FROM bk JOIN deg USING (node) GROUP BY bk.bucket
    ),
    internal AS (
      SELECT bu.bucket, count(*) AS n_internal
      FROM e JOIN bk bu ON e.u = bu.node JOIN bk bv ON e.v = bv.node
      WHERE bu.bucket = bv.bucket
      GROUP BY bu.bucket
    )
    SELECT per.bucket,
           CAST(per.n_nodes AS BIGINT) AS n_nodes,
           CAST(per.sum_degree AS BIGINT) AS sum_degree,
           CAST(coalesce(internal.n_internal, 0) AS BIGINT) AS n_internal,
           CAST((SELECT m_edges FROM m) AS BIGINT) AS m_edges,
           CAST(4 * (SELECT m_edges FROM m) * coalesce(internal.n_internal, 0)
                - per.sum_degree * per.sum_degree AS BIGINT) AS q_num
    FROM per LEFT JOIN internal USING (bucket)
    """,
)
def graph_modularity_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M129 — Newman modularity terms of a node partition, in EXACT
    integer form: per community, Q's contribution is
    (e_c/m) - (d_c/2m)² = (4·m·e_c - d_c²) / 4m², so the query emits
    the integer numerator ``q_num`` (plus the raw e_c, d_c, m) and the
    caller divides once.  The partition audited here is the md5
    hash-bucket partition — the NULL MODEL: its modularity must sit
    near 0, which is the calibration row a community-detection run is
    compared against (real communities must clear it).  Any node
    partition (CC labels, label-prop output, a hub split) reuses the
    identical shape.  Scale: degrees and buckets are O(nodes) (gated
    broadcast against the edge stream); the internal-edge test is one
    equi-join per endpoint — no pair explosion anywhere."""
    from pyspark.sql import DataFrame as _DF

    from tropology_spark.operators.graph import BROADCAST_NODE_LIMIT
    from tropology_spark.sources.tables import edges_materialized

    # Materialized base: this body references the edge table from four
    # plan branches (nodes / degrees / internal join / m_edges) — over
    # the raw derivation each branch re-runs orders⋈lineitem (30
    # exchanges measured, 14 after).
    e = edges_materialized(spark, sf_dir).select(
        F.concat(F.lit("c:"), F.col("src").cast("string")).alias("u"),
        F.concat(F.lit("p:"), F.col("dst").cast("string")).alias("v"),
    )
    nodes = e.select(F.col("u").alias("node")).union(
        e.select(F.col("v").alias("node"))
    ).distinct()
    bk = nodes.select(
        "node",
        (
            F.conv(F.substring(F.md5(F.col("node")), 1, 8), 16, 10).cast("bigint")
            % _MOD_BUCKETS
        ).alias("bucket"),
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    small = nodes.count() <= BROADCAST_NODE_LIMIT

    def maybe_b(df: _DF) -> _DF:
        return F.broadcast(df) if small else df

    per = (
        bk.join(deg, "node")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("d").cast("bigint").alias("sum_degree"),
        )
    )
    bu = bk.select(F.col("node").alias("u"), F.col("bucket").alias("b_u"))
    bv = bk.select(F.col("node").alias("v"), F.col("bucket").alias("b_v"))
    internal = (
        e.join(maybe_b(bu), "u")
        .join(maybe_b(bv), "v")
        .filter(F.col("b_u") == F.col("b_v"))
        .groupBy(F.col("b_u").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_internal"))
    )
    m_edges = e.agg(F.count(F.lit(1)).cast("bigint").alias("m_edges"))
    return (
        per.join(internal, "bucket", "left")
        .crossJoin(F.broadcast(m_edges))
        .select(
            "bucket",
            "n_nodes",
            "sum_degree",
            F.coalesce("n_internal", F.lit(0)).cast("bigint").alias("n_internal"),
            "m_edges",
            (
                F.lit(4) * F.col("m_edges") * F.coalesce("n_internal", F.lit(0))
                - F.col("sum_degree") * F.col("sum_degree")
            )
            .cast("bigint")
            .alias("q_num"),
        )
    )


# ---------------------------------------------------------------------------
# M130 — label-propagation communities (3 deterministic rounds)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_round_sql(i: int) -> str:
    """One synchronous LPA round as SQL: candidate multiset = own label
    + neighbor labels; adopt the most frequent, smallest label on
    ties."""
    prev = f"l{i - 1}"
    return f"""
    cand{i} AS (
      SELECT und.u AS node, l.lbl FROM und JOIN {prev} l ON und.v = l.node
      UNION ALL SELECT node, lbl FROM {prev}
    ),
    cnt{i} AS (SELECT node, lbl, count(*) AS c FROM cand{i} GROUP BY node, lbl),
    l{i} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
        FROM cnt{i}
      ) t WHERE rn = 1
    )"""


@register(
    "graph_label_prop3",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    proj AS (
      SELECT a.src AS u, b.src AS v
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_SHARED}
    ),
    und AS (SELECT u, v FROM proj UNION ALL SELECT v, u FROM proj),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    l0 AS (SELECT node, node AS lbl FROM nodes),
    {",".join(_lpa_round_sql(i) for i in range(1, _LPA_ROUNDS + 1))}
    SELECT CAST(node AS BIGINT) AS node,
           CAST(lbl AS BIGINT) AS community
    FROM l{_LPA_ROUNDS}
    """,
)
def graph_label_prop3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M130 — label-propagation community detection (Raghavan LPA) made
    deterministic: synchronous updates, candidate multiset = own label
    + neighbor labels, adopt the most frequent with smallest-label
    tie-break, exactly {_LPA_ROUNDS} unrolled rounds (the pagerank3 /
    bfs3 fixed-depth discipline — plan depth is static, no fixpoint
    scan).  Runs on the thresholded co-purchase projection (communities
    = works that keep co-citing the same tropes), NOT the raw bipartite
    graph — so the result is finer than connected components.  Audit
    its quality with M129's modularity terms against the null model.
    Scale: each round is one edge join + one (node, lbl) count + one
    per-node top-1 window; labels are O(nodes); the projection is the
    session-cached (and at 100 TB hub-capped) view.  Each round's
    label vector is eagerly materialized (iter_materialize — the
    pagerank/CC loop discipline): the round body references ``labels``
    TWICE (neighbor join + own-label union), so an unmaterialized
    unroll re-derives earlier rounds 2^k times (37 exchanges measured
    at 3 rounds, 13 after)."""
    from pyspark.sql import Window

    from tropology_spark.session import iter_materialize

    proj = copurchase_projection(spark, sf_dir)
    und = proj.unionByName(
        proj.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nodes = edges(spark, sf_dir).select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("lbl", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lbl"))
    for _ in range(_LPA_ROUNDS):
        cand = (
            und.join(labels, und.v == labels.node)
            .select(F.col("u").alias("node"), "lbl")
            .unionAll(labels.select("node", "lbl"))
        )
        counts = cand.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("c"))
        labels = iter_materialize(
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
        )
    return labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("lbl").cast("bigint").alias("community"),
    )


# ---------------------------------------------------------------------------
# M204 — per-edge triangle support (the k-truss primitive)
# ---------------------------------------------------------------------------


#: The hub-capped projection as a shared oracle prefix (named proj0 so
#: the k-truss peel can chain proj1, proj2, ...): the single SQL home
#: of the M120/M204/M213 projection arithmetic — the composed-audit
#: discipline (CLAUDE.md) applied to the motif family.
_CAPPED_PROJ_CTE = f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    keep AS (SELECT dst FROM e0 GROUP BY dst HAVING count(*) <= {_HUB_CAP}),
    e AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT dst FROM keep)),
    proj0 AS (
      SELECT a.src AS u, b.src AS v
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_SHARED}
    )
"""


@register(
    "graph_triangle_support",
    oracle=_CAPPED_PROJ_CTE
    + """
    , tri AS (
      SELECT e1.u, e1.v, e2.v AS w
      FROM proj0 e1
      JOIN proj0 e2 ON e2.u = e1.v
      JOIN proj0 e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    sup AS (
      SELECT u AS a, v AS b FROM tri
      UNION ALL SELECT v, w FROM tri
      UNION ALL SELECT u, w FROM tri
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(count(*) AS BIGINT) AS support
    FROM sup GROUP BY a, b
    ORDER BY support DESC, a, b LIMIT 20
    """,
)
def graph_triangle_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M204 — EDGE support: how many triangles each projected edge
    participates in — the primitive under k-truss decomposition (an
    edge is in the k-truss iff its support ≥ k−2), which is the
    standard community-core definition one notch stronger than k-core
    (M91 counts neighbors; this counts reinforced neighbors).  Runs on
    the hub-capped projection (the M120 sparsifier) so the wedge join
    is bounded at C(cap, 2) per part.

    Every closed wedge (u<v, v<w, u<w) contributes support to all
    three of its edges, each already in canonical u<v orientation, so
    the rollup needs no normalization.  Top-20 by (support, a, b).

    Scale: the triangle table is referenced by THREE union branches —
    checkpointed first (the DOUBLE-REFERENCE RULE; without it Spark
    re-runs the 3-way wedge closure per branch).  The support rollup
    is map-side combinable on (a, b); top-20 is TakeOrdered."""
    from tropology_spark.session import iter_materialize

    proj = copurchase_projection(spark, sf_dir, hub_cap=_HUB_CAP)
    e1 = proj
    e2 = proj.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = proj.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = iter_materialize(
        e1.join(e2, "v")
        .join(e3, (F.col("u3") == F.col("u")) & (F.col("w3") == F.col("w")))
        .select("u", "v", "w")
    )
    sup = (
        tri.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(tri.select(F.col("v").alias("a"), F.col("w").alias("b")))
        .unionAll(tri.select(F.col("u").alias("a"), F.col("w").alias("b")))
    )
    return (
        sup.groupBy(
            F.col("a").cast("bigint").alias("a"),
            F.col("b").cast("bigint").alias("b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .orderBy(F.desc("support"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# M213 — k-truss decomposition (peel M204's supports to the truss)
# ---------------------------------------------------------------------------

#: Truss parameter: an edge survives when its support (triangle count
#: in the SURVIVING subgraph) is >= _TRUSS_K - 2.  7 peels genuinely
#: at every fixture scale (sf0.001's dense projection has min support
#: 4; sf0.01's sparse one has a mode at 1).
_TRUSS_K = 7

#: Unrolled peel rounds — the fixed-round SQL-checkable variant, the
#: M91 k-core precedent (the fixpoint variant would be rows-only).
_TRUSS_ROUNDS = 2

#: One peel round, oracle side: close wedges on the surviving edge
#: set, roll supports up per edge, keep edges meeting the threshold.
_TRUSS_SQL_ROUND = """
    , tri{n} AS (
      SELECT e1.u, e1.v, e2.v AS w
      FROM proj{p} e1
      JOIN proj{p} e2 ON e2.u = e1.v
      JOIN proj{p} e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    sup{n} AS (
      SELECT a, b, count(*) AS support FROM (
        SELECT u AS a, v AS b FROM tri{n}
        UNION ALL SELECT v, w FROM tri{n}
        UNION ALL SELECT u, w FROM tri{n}) t{n}
      GROUP BY a, b
    ),
    proj{n} AS (SELECT a AS u, b AS v FROM sup{n}
                WHERE support >= {thr})
"""


@register(
    "graph_ktruss",
    oracle=_CAPPED_PROJ_CTE
    + "".join(
        _TRUSS_SQL_ROUND.format(n=i + 1, p=i, thr=_TRUSS_K - 2)
        for i in range(_TRUSS_ROUNDS)
    )
    + f"""
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(support AS BIGINT) AS support
    FROM sup{_TRUSS_ROUNDS} WHERE support >= {_TRUSS_K - 2}
    """,
)
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M213 — k-truss decomposition at k={k}, {r} unrolled peel rounds
    on the hub-capped projection: repeatedly drop edges supported by
    fewer than k-2 triangles IN THE SURVIVING SUBGRAPH, then report
    each survivor with its final-round support.  One notch stronger
    than M91's k-core (which counts neighbors; this counts reinforced
    neighbors) and exactly the decomposition M204's per-edge supports
    are the primitive for — round 1's support table IS M204's
    (un-truncated), later rounds recompute it on the peeled edge set.
    The fixed round count keeps it SQL-oracle-checkable, the M91
    precedent; the fixpoint variant is the CC loop shape.

    Scale: each round is the M204 wedge closure on a SHRINKING edge
    set — the first round dominates and is bounded by the hub cap
    (per-part cost <= C({cap}, 2)); the support rollup is map-side
    combinable on (a, b).  Each round's surviving edge set feeds THREE
    wedge-join branches, and the triangle table feeds three rollup
    branches — both are checkpointed (the DOUBLE-REFERENCE RULE;
    without it round i re-derives round i-1's entire chain 3^i
    times)."""
    from tropology_spark.session import iter_materialize

    thr = _TRUSS_K - 2
    cur = copurchase_projection(spark, sf_dir, hub_cap=_HUB_CAP)
    keep = None
    for i in range(_TRUSS_ROUNDS):
        e2 = cur.select(F.col("u").alias("v"), F.col("v").alias("w"))
        e3 = cur.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
        tri = iter_materialize(
            cur.join(e2, "v")
            .join(e3, (F.col("u3") == F.col("u")) & (F.col("w3") == F.col("w")))
            .select("u", "v", "w")
        )
        sup = (
            tri.select(F.col("u").alias("a"), F.col("v").alias("b"))
            .unionAll(tri.select(F.col("v").alias("a"), F.col("w").alias("b")))
            .unionAll(tri.select(F.col("u").alias("a"), F.col("w").alias("b")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        keep = sup.filter(F.col("support") >= thr)
        if i < _TRUSS_ROUNDS - 1:
            cur = iter_materialize(
                keep.select(F.col("a").alias("u"), F.col("b").alias("v"))
            )
    return keep.select(
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        F.col("support").cast("bigint").alias("support"),
    )


graph_ktruss.__doc__ = graph_ktruss.__doc__.format(
    k=_TRUSS_K, r=_TRUSS_ROUNDS, cap=_HUB_CAP
)


# ---------------------------------------------------------------------------
# M231 graph_closure_rate_capped — global clustering coefficient terms
# ---------------------------------------------------------------------------


def _closure_oracle() -> str:
    return (
        _CAPPED_PROJ_CTE
        + """
    , und AS (SELECT u, v FROM proj0 UNION ALL SELECT v, u FROM proj0),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
    wed AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
    tri AS (
      SELECT e1.u, e1.v, e2.v AS w
      FROM proj0 e1
      JOIN proj0 e2 ON e2.u = e1.v
      JOIN proj0 e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri)
    SELECT n_triangles, n_wedges,
           CAST(CASE WHEN n_wedges = 0 THEN NULL
                     ELSE (1000000 * 3 * n_triangles) // n_wedges END
                AS BIGINT) AS closure_ppm
    FROM t CROSS JOIN wed
    """
    )


@register("graph_closure_rate_capped", oracle=_closure_oracle())
def graph_closure_rate_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M231 — the GLOBAL clustering coefficient of the
    hub-capped co-purchase projection: 3·triangles / wedges in ppm,
    with the raw terms alongside (the single number the per-node M70/
    M135 tables roll up to; transitivity, the graph-cohesion KPI).
    Composed, not copied: the oracle extends ``_CAPPED_PROJ_CTE``
    (the single SQL home of the M120/M204/M213 projection arithmetic)
    and the Spark side reads the session-shared
    ``copurchase_projection`` view.

    Scale: the projection is the dominant cost and is already hub-
    capped + session-materialized; wedges are one degree rollup
    (Σ C(d,2) — integers), triangles one oriented 3-branch join over
    the materialized edge list; the finale is a 1-row cross of two
    scalars (guarded NULL on a wedge-free graph — the ADVICE r6
    degenerate-denominator rule)."""
    proj = copurchase_projection(spark, sf_dir, hub_cap=_HUB_CAP)
    und = proj.select("u", "v").unionAll(
        proj.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    wed = deg.agg(
        F.expr("sum(d * (d - 1) div 2)").cast("bigint").alias("n_wedges")
    )
    e1 = proj
    e2 = proj.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = proj.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = (
        e1.join(e2, "v")
        .join(e3, (F.col("u3") == F.col("u")) & (F.col("w3") == F.col("w")))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return tri.crossJoin(F.broadcast(wed)).select(
        "n_triangles",
        "n_wedges",
        F.expr(
            "CASE WHEN n_wedges = 0 THEN NULL"
            " ELSE (1000000 * 3 * n_triangles) div n_wedges END"
        )
        .cast("bigint")
        .alias("closure_ppm"),
    )


# ---------------------------------------------------------------------------
# M249 graph_rich_club_terms — rich-club density at degree thresholds
# ---------------------------------------------------------------------------

_RICH_KS = (4, 8, 16)


def _rich_club_oracle() -> str:
    ks = ", ".join(str(k) for k in _RICH_KS)
    return (
        _CAPPED_PROJ_CTE
        + f"""
    , und AS (SELECT u, v FROM proj0 UNION ALL SELECT v, u FROM proj0),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
    ks AS (SELECT unnest([{ks}]) AS k),
    nk AS (
      SELECT ks.k, CAST(count(deg.node) AS BIGINT) AS n_k
      FROM ks LEFT JOIN deg ON deg.d > ks.k GROUP BY ks.k
    ),
    ek AS (
      SELECT ks.k, CAST(count(*) AS BIGINT) AS e_k
      FROM proj0 e
      JOIN deg da ON e.u = da.node
      JOIN deg db ON e.v = db.node
      JOIN ks ON da.d > ks.k AND db.d > ks.k
      GROUP BY ks.k
    )
    SELECT CAST(nk.k AS BIGINT) AS k, n_k,
           CAST(coalesce(e_k, 0) AS BIGINT) AS e_k,
           CAST(CASE WHEN n_k >= 2
                     THEN (2000000 * coalesce(e_k, 0)) // (n_k * (n_k - 1))
                END AS BIGINT) AS density_ppm
    FROM nk LEFT JOIN ek ON nk.k = ek.k
    """
    )


@register("graph_rich_club_terms", oracle=_rich_club_oracle())
def graph_rich_club_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M249 — the RICH-CLUB coefficient terms of the
    hub-capped co-purchase projection: for degree thresholds k ∈
    {4, 8, 16}, the count of nodes with degree > k, the edges BOTH of
    whose endpoints qualify, and the induced density in ppm
    (2·E_k / (N_k·(N_k−1))) — "do the hubs preferentially wire to
    each other", the club structure M79's assortativity terms
    summarize in one number.  All three threshold rows are always
    emitted (LEFT joins; NULL density when the club has < 2 members —
    the degenerate-denominator rule).

    Composed, not copied: the oracle extends _CAPPED_PROJ_CTE (the
    M120/M204/M213/M231 single home) and the Spark side reads the
    session-shared copurchase_projection.  Scale: one degree rollup,
    a ×|ks| bounded threshold join, one edge pass — the degree table
    is broadcast-sized after the rollup and double-referenced, so it
    is checkpointed."""
    from tropology_spark.session import iter_materialize

    proj = copurchase_projection(spark, sf_dir, hub_cap=_HUB_CAP)
    und = proj.select("u", "v").unionAll(
        proj.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = iter_materialize(
        und.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).cast("bigint").alias("d")
        )
    )  # referenced by nk and twice by ek
    ks = spark.createDataFrame([(k,) for k in _RICH_KS], "k long")
    nk = (
        ks.join(F.broadcast(deg), deg.d > ks.k, "left")
        .groupBy("k")
        .agg(F.count(F.col("node")).cast("bigint").alias("n_k"))
    )
    da = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ek = (
        proj.join(F.broadcast(da), "u")
        .join(F.broadcast(db), "v")
        .crossJoin(F.broadcast(ks.select(F.col("k").alias("ek_k"))))
        .filter((F.col("du") > F.col("ek_k")) & (F.col("dv") > F.col("ek_k")))
        .groupBy(F.col("ek_k").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_k"))
    )
    return nk.join(ek, "k", "left").select(
        F.col("k").cast("bigint").alias("k"),
        "n_k",
        F.coalesce(F.col("e_k"), F.lit(0)).cast("bigint").alias("e_k"),
        F.expr(
            "CASE WHEN n_k >= 2"
            " THEN (2000000 * coalesce(e_k, 0)) div (n_k * (n_k - 1)) END"
        )
        .cast("bigint")
        .alias("density_ppm"),
    )


# ---------------------------------------------------------------------------
# graph_wedge_sample_closure (M323) — closure rate on md5-sampled wedges
# ---------------------------------------------------------------------------

_WS_MODS = (1, 4, 16)


def _wedge_sample_oracle() -> str:
    mods = ", ".join(str(s) for s in _WS_MODS)
    return (
        _CAPPED_PROJ_CTE
        + f"""
    , und AS (SELECT u AS x, v AS y FROM proj0
              UNION ALL SELECT v, u FROM proj0),
    wed AS (
      SELECT a.x, a.y AS u, b.y AS w,
             ('0x' || substring(md5(CAST(a.x AS VARCHAR) || '_'
                  || CAST(a.y AS VARCHAR) || '_'
                  || CAST(b.y AS VARCHAR)), 1, 8))::BIGINT AS hk
      FROM und a JOIN und b ON a.x = b.x AND a.y < b.y
    ),
    wc AS (
      SELECT wed.*, CASE WHEN p.u IS NULL THEN 0 ELSE 1 END AS closed
      FROM wed LEFT JOIN proj0 p ON p.u = wed.u AND p.v = wed.w
    ),
    per AS (
      SELECT s.s,
             CAST(count(*) AS BIGINT) AS n_wedges,
             CAST(sum(closed) AS BIGINT) AS n_closed
      FROM wc JOIN (SELECT unnest([{mods}]) AS s) s ON wc.hk % s.s = 0
      GROUP BY s.s
    )
    SELECT CAST(s AS BIGINT) AS s, n_wedges, n_closed,
           CAST(CASE WHEN n_wedges = 0 THEN NULL
                     ELSE (1000000 * n_closed) // n_wedges END AS BIGINT)
             AS closure_ppm,
           CAST(CASE WHEN n_wedges = 0 THEN NULL
                     ELSE (1000000 * n_closed) // n_wedges
                          - max(CASE WHEN s = 1 THEN
                                  (1000000 * n_closed) // n_wedges END)
                              OVER () END AS BIGINT) AS dev_ppm
    FROM per
    """
    )


@register("graph_wedge_sample_closure", oracle=_wedge_sample_oracle())
def graph_wedge_sample_closure(
    spark: SparkSession, sf_dir: str, proj: DataFrame | None = None
) -> DataFrame:
    """M323 — WEDGE-SAMPLED closure rate (the approximate
    triangle-counting audit, Seshadhri et al.): enumerate the capped
    projection's wedges, sample them by the deterministic md5 key at
    moduli s ∈ 1/4/16 (power-of-two moduli NEST: the s=16 sample is a
    subset of the s=4 sample — twin-pinned containment), and report
    per modulus the sampled wedge count, closed count, closure ppm and
    the signed deviation from the full (s=1) truth — exactly M231's
    global clustering coefficient, estimated from 1/s of the work.
    At 100 TB wedge enumeration is THE cost (Σ C(d,2)); this measures
    what sampling buys and what it costs in accuracy, on the same
    hub-capped projection the exact ops run.

    Composed, not copied: the Spark side reads the session-shared
    copurchase_projection view; the oracle extends _CAPPED_PROJ_CTE
    (the M120/M204/M213/M231 single home).  The ×3 modulus axis rides
    an explode on the wedge rows; the closed test is one LEFT
    equi-join against the projection — no BNLJ anywhere.  A modulus
    that samples ZERO wedges emits NO row (groupBy on observed keys
    only, both engines — injection-pinned in tests/test_r16_twins.py).

    ``proj=`` substitutes the projection frame for probes; the driver
    contract never passes it."""
    if proj is None:
        proj = copurchase_projection(spark, sf_dir, hub_cap=_HUB_CAP)
    und = proj.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        proj.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    a = und.select("x", F.col("y").alias("wu"))
    b = und.select("x", F.col("y").alias("ww"))
    wed = (
        a.join(b, "x")
        .filter(F.col("wu") < F.col("ww"))
        .select(
            "x",
            "wu",
            "ww",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws("_", F.col("x"), F.col("wu"), F.col("ww"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("hk"),
        )
    )
    pr = proj.select(F.col("u").alias("wu"), F.col("v").alias("ww"), F.lit(1).alias("cl"))
    wc = wed.join(pr, ["wu", "ww"], "left").select(
        "hk", F.coalesce(F.col("cl"), F.lit(0)).alias("closed")
    )
    per = (
        wc.select(
            "hk",
            "closed",
            F.explode(F.array(*[F.lit(s) for s in _WS_MODS])).alias("s"),
        )
        .filter(F.col("hk") % F.col("s") == 0)
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_wedges"),
            F.sum("closed").cast("bigint").alias("n_closed"),
        )
    )
    w = Window.partitionBy(F.pmod(F.col("s"), F.lit(1)))
    rate = F.expr(
        "CASE WHEN n_wedges = 0 THEN NULL"
        " ELSE (1000000 * n_closed) div n_wedges END"
    )
    return per.select(
        F.col("s").cast("bigint").alias("s"),
        "n_wedges",
        "n_closed",
        rate.cast("bigint").alias("closure_ppm"),
    ).select(
        "s",
        "n_wedges",
        "n_closed",
        "closure_ppm",
        (
            F.col("closure_ppm")
            - F.max(F.when(F.col("s") == 1, F.col("closure_ppm"))).over(w)
        )
        .cast("bigint")
        .alias("dev_ppm"),
    )
