"""Advanced aggregations (SURVEY.md §2 D5-D8).

ROLLUP/CUBE/GROUPING SETS have no direct tropology analog (PostgreSQL
did the planning there); they complete the aggregation surface.  The
collect-list query IS a reference shape: the per-node neighbor list
assembled for the sigma.js network payload (``api.clj`` —
reconstructed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.functions.exact import exact_sum, sql_exact_sum
from tropology_spark.registry import register
from tropology_spark.sources.tables import load, register_views


def _cust_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))


_CNR_SQL = (
    "customer JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey"
)


@register(
    "agg_rollup",
    oracle=f"""
    SELECT coalesce(r_name, '(all)') AS region_name,
           coalesce(n_name, '(all)') AS nation_name,
           CAST(grouping(r_name) AS BIGINT) AS g_region,
           CAST(grouping(n_name) AS BIGINT) AS g_nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           {sql_exact_sum('c_acctbal', 2)} AS total_acctbal
    FROM {_CNR_SQL}
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — ROLLUP with grouping() flags; rollup-produced NULL keys are
    coalesced identically in both engines (fixtures store no NULLs, so
    this is unambiguous)."""
    df = _cust_nation_region(spark, sf_dir)
    return (
        df.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("bigint").alias("g_region"),
            F.grouping("n_name").cast("bigint").alias("g_nation"),
            F.count(F.lit(1)).alias("n_customers"),
            exact_sum(F.col("c_acctbal"), 2).alias("total_acctbal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation_name"),
            "g_region",
            "g_nation",
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT coalesce(c_mktsegment, '(all)') AS segment,
           coalesce(r_name, '(all)') AS region_name,
           CAST(grouping(c_mktsegment) AS BIGINT) AS g_segment,
           CAST(grouping(r_name) AS BIGINT) AS g_region,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM {_CNR_SQL}
    GROUP BY CUBE (c_mktsegment, r_name)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — CUBE over two dimensions."""
    df = _cust_nation_region(spark, sf_dir)
    return (
        df.cube("c_mktsegment", "r_name")
        .agg(
            F.grouping("c_mktsegment").cast("bigint").alias("g_segment"),
            F.grouping("r_name").cast("bigint").alias("g_region"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("(all)")).alias("segment"),
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region_name"),
            "g_segment",
            "g_region",
            "n_customers",
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 — explicit GROUPING SETS via Spark SQL (exercises the SQL
    entry path alongside the DataFrame API)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "agg_collect_neighbors",
    oracle="""
    WITH edges AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
    SELECT src, string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS neighbors,
           CAST(count(*) AS BIGINT) AS n_neighbors
    FROM edges GROUP BY src
    """,
)
def agg_collect_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 — neighbor-list assembly for the network payload.  The list
    is sorted numerically then joined to a string so the value hash is
    deterministic and portable (array hashing is engine-specific)."""
    from tropology_spark.sources.tables import edges

    return (
        edges(spark, sf_dir)
        .groupBy("src")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("dst")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("neighbors"),
            F.count(F.lit(1)).alias("n_neighbors"),
        )
    )


#: M169 — neighbor-list cap.  SCALE.md names D8's collect_list as the
#: one unbounded per-group aggregation state in the repo; the capped
#: twin bounds it to this many neighbors per node.
NEIGHBOR_CAP = 8


@register(
    "agg_collect_neighbors_capped",
    oracle=f"""
    WITH edges AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    ranked AS (SELECT src, dst,
                      row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
               FROM edges),
    tot AS (SELECT src, CAST(count(*) AS BIGINT) AS n_neighbors FROM edges GROUP BY src),
    kept AS (SELECT src,
                    string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS neighbors,
                    CAST(count(*) AS BIGINT) AS n_kept
             FROM ranked WHERE rn <= {NEIGHBOR_CAP} GROUP BY src)
    SELECT tot.src, kept.neighbors, kept.n_kept, tot.n_neighbors,
           CAST(CASE WHEN tot.n_neighbors > {NEIGHBOR_CAP} THEN 1 ELSE 0 END
                AS BIGINT) AS truncated
    FROM tot JOIN kept ON tot.src = kept.src
    """,
)
def agg_collect_neighbors_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M169 — D8's celebrity-safe twin (VERDICT r5 item 6): the
    neighbor list keeps only the NEIGHBOR_CAP smallest dst ids per
    node, with the TRUE degree and a truncation flag alongside — the
    payload shape an API would actually serve for a celebrity node.

    Scale: the cap is enforced BEFORE any list is assembled — the E7
    window top-k form (sort-based window, bounded spill) filters to
    <= NEIGHBOR_CAP rows per src, so no aggregation buffer ever holds
    an unbounded list; D8's plain collect_list state grows with the
    hottest node.  The true degree comes from a separate count agg
    (map-side combinable) on the shared materialized edge view, and
    the final join runs on two already-small per-src frames."""
    from tropology_spark.sources.tables import edges_materialized

    ed = edges_materialized(spark, sf_dir)  # session-shared; 2 references
    ranked = ed.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("src").orderBy("dst")),
    )
    kept = (
        ranked.filter(F.col("rn") <= NEIGHBOR_CAP)
        .groupBy("src")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("dst")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("neighbors"),
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        )
    )
    tot = ed.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("n_neighbors"))
    return tot.join(kept, "src").select(
        "src",
        "neighbors",
        "n_kept",
        "n_neighbors",
        F.when(F.col("n_neighbors") > NEIGHBOR_CAP, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("truncated"),
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIASES = ["p_urgent", "p_high", "p_medium", "p_notspec", "p_low"]


@register(
    "agg_pivot",
    oracle="SELECT o_orderstatus, "
    + ", ".join(
        f"CAST(sum(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS {a}"
        for p, a in zip(_PRIORITIES, _PRIORITY_ALIASES)
    )
    + " FROM orders GROUP BY o_orderstatus",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts as a status × priority crosstab.  Pivot
    values are pinned explicitly (never inferred — inference is a
    separate job and nondeterministic column order at scale); absent
    combinations coalesce to 0 to match the oracle's CASE-sums."""
    o = load(spark, sf_dir, "orders")
    pivoted = o.groupBy("o_orderstatus").pivot("o_orderpriority", _PRIORITIES).count()
    return pivoted.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("bigint").alias(a)
            for p, a in zip(_PRIORITIES, _PRIORITY_ALIASES)
        ],
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(median(o_totalprice), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median + p90).  Both engines
    define quantiles by linear interpolation at (n-1)*q over the sorted
    values; 4-dp rounding absorbs the last-ulp difference in the
    interpolation arithmetic."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           round(stddev_samp(l_extendedprice), 2) AS price_stddev,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covar / stddev).  Both engines
    accumulate co-moments; order drift is ~1e-12 relative, absorbed by
    rounding chosen per magnitude (corr∈[-1,1] → 6 dp; covar/stddev
    ~1e4-1e5 → 2 dp).

    ACCEPTED-RISK exception to the "no round(x, k>0) as a value
    carrier" invariant (functions/exact.py): co-moments have no exact
    integer representation (unlike money, there is no cents trick), so
    rounding is the only available carrier.  A co-moment landing within
    ~1e-12 relative of a half-ulp rounding boundary could flip the last
    digit between engines/partitionings; with 3 groups × 3 stats the
    per-run flip probability is ~1e-9.  Empirically stable across
    shuffle.partitions ∈ {7, 11, 32} at sf0.01 and sf0.1.  If this row
    ever hash-mismatches, the last-digit flip is the first suspect —
    widen the rounding one notch rather than chase a logic bug."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# M59-M61 — order-statistic and distribution aggregates (round-2 additions)
# ---------------------------------------------------------------------------


@register(
    "agg_median_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey
      FROM orders
    ),
    ranked AS (
      SELECT o_orderpriority, cents,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY cents, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM c
    ),
    med AS (
      SELECT o_orderpriority, cents AS median_cents
      FROM ranked WHERE rn = (n + 1) // 2
    ),
    freq AS (
      SELECT o_orderpriority, cents, count(*) AS cnt
      FROM c GROUP BY 1, 2
    ),
    modes AS (
      SELECT o_orderpriority, cents AS mode_cents, cnt AS mode_count
      FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                         ORDER BY cnt DESC, cents) AS mr
            FROM freq)
      WHERE mr = 1
    )
    SELECT m.o_orderpriority, m.median_cents,
           mo.mode_cents, CAST(mo.mode_count AS BIGINT) AS mode_count
    FROM med m JOIN modes mo USING (o_orderpriority)
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M59 — EXACT order statistics per group: the lower median (the
    element at rank ceil(n/2) in cents order — a real data value, no
    even-count interpolation, hence integer-exact cross-engine) and the
    mode (most frequent cents value, smallest-value tie-break).

    approx_percentile (D-row `agg_percentiles`) is the sketch path;
    this is the exact path a billing reconciliation needs.  Scale: both
    statistics partition by the group key — one shuffle; the mode's
    (group, value) pre-aggregation combines map-side, and the median's
    within-group sort is the standard single-pass window (at 100 TB a
    group that exceeds one partition would move to approx_percentile or
    a two-pass count-then-select on the value histogram, which the
    `agg_histogram` shape already provides)."""
    o = load(spark, sf_dir, "orders")
    from pyspark.sql import Window

    c = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    wr = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = c.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    med = ranked.filter(
        F.col("rn") == F.floor((F.col("n") + 1) / 2)
    ).select("o_orderpriority", F.col("cents").alias("median_cents"))
    freq = c.groupBy("o_orderpriority", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    wm = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cnt").desc(), F.col("cents")
    )
    modes = (
        freq.withColumn("mr", F.row_number().over(wm))
        .filter(F.col("mr") == 1)
        .select(
            "o_orderpriority",
            F.col("cents").alias("mode_cents"),
            F.col("cnt").cast("bigint").alias("mode_count"),
        )
    )
    return med.join(modes, "o_orderpriority")


_HH_K = 50  # heavy hitter = token with count > total/50 (exact phi-frequent)


@register(
    "agg_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
    total AS (SELECT sum(cnt) AS n FROM counts)
    SELECT token, cnt, CAST(n AS BIGINT) AS total_tokens
    FROM counts, total
    WHERE cnt * {_HH_K} > n
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M60 — exact phi-frequent items: tokens whose corpus frequency
    exceeds 1/{k} of all tokens.  The threshold test is the integer
    cross-multiplication ``cnt * {k} > total`` — no float share, no
    rounding policy.  This is the exact counterpart of the streaming
    Misra-Gries / count-min sketches: at 100 TB the same plan holds
    (token counts combine map-side; the scalar total broadcasts), and a
    sketch replaces the exact count only when the distinct-token
    dictionary itself outgrows a shuffle.
    """
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * _HH_K > F.col("n"))
        .select("token", "cnt", F.col("n").cast("bigint").alias("total_tokens"))
    )


_HIST_WIDTH_CENTS = 50_000_00  # $50k equi-width buckets


@register(
    "agg_histogram",
    oracle=f"""
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    )
    SELECT cents // {_HIST_WIDTH_CENTS} AS bucket,
           CAST(cents // {_HIST_WIDTH_CENTS} * {_HIST_WIDTH_CENTS} AS BIGINT)
             AS bucket_lo_cents,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM c GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M61 — equi-width value histogram of order totals with integer
    bucket edges (floor-division of cents by a fixed width — no float
    `width_bucket` boundary policy).  The distribution-profiling
    primitive behind `pipeline_skew_profile`'s power-of-two variant,
    here with linear buckets.  Scale: one map-side-combinable groupBy
    on a derived integer key; bucket count is bounded by the value
    range, not the row count."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    c = o.select(cents.alias("cents"))
    bucket = F.floor(F.col("cents") / _HIST_WIDTH_CENTS)
    return (
        c.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").cast("bigint").alias("min_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
        )
        .select(
            "bucket",
            (F.col("bucket") * _HIST_WIDTH_CENTS).cast("bigint").alias("bucket_lo_cents"),
            "n_orders",
            "min_cents",
            "max_cents",
        )
    )


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M73 — several COUNT(DISTINCT x) over DIFFERENT columns in one
    aggregate (D3 counts one).  Spark plans this with Expand (one
    replicated stream per distinct column, then a two-phase aggregate)
    — the row count multiplies by the number of distinct columns, which
    is the scale lever to watch: at 100 TB, replace columns whose
    exact count nobody reconciles with approx_count_distinct to drop
    their Expand branch."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_weighted_avg",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity) AS BIGINT) AS qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(sum(qty * cents) AS BIGINT) AS wsum_qty_cents,
           CAST(sum(qty) AS BIGINT) AS total_qty,
           round(CAST(sum(qty * cents) AS DOUBLE) / (sum(qty) * 100.0), 6)
             AS wavg_price
    FROM c GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M75 — quantity-weighted average price, exactly: numerator and
    denominator are exact integer sums (qty × cents stays far below
    2^53), reported alongside ONE final IEEE division — which is
    bit-identical across engines because its operands are — rounded
    for display.  The order-independent form of the weighted mean the
    float-SUM version can't guarantee (functions/exact.py).

    Scale: a plain map-side-combinable aggregate — the integer pair is
    also the mergeable partial state a rollup tier would store."""
    l = load(spark, sf_dir, "lineitem")
    c = l.select(
        "l_returnflag",
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    return c.groupBy("l_returnflag").agg(
        F.sum(F.col("qty") * F.col("cents")).cast("bigint").alias("wsum_qty_cents"),
        F.sum("qty").cast("bigint").alias("total_qty"),
        F.round(
            F.sum(F.col("qty") * F.col("cents")).cast("double")
            / (F.sum("qty") * F.lit(100.0)),
            6,
        ).alias("wavg_price"),
    )


@register(
    "agg_min_max_by",
    oracle="""
    WITH k AS (
      SELECT user_id, event_id, event_type,
             printf('%020d%020d', epoch_us(ts), event_id) AS ord_key
      FROM events
    )
    SELECT user_id,
           CAST(arg_min(event_id, ord_key) AS BIGINT) AS first_event_id,
           CAST(arg_max(event_id, ord_key) AS BIGINT) AS last_event_id,
           arg_max(event_type, ord_key) AS last_event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM k
    GROUP BY user_id
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M81 — argmin/argmax aggregation (`min_by`/`max_by` ⟷ DuckDB
    `arg_min`/`arg_max`): the first/last event per user WITHOUT a
    window — a single map-side-combinable aggregate instead of a
    row_number + filter, the cheaper plan whenever only the extreme
    row's attributes are needed.  The comparator is the unique
    (ts, event_id) ordering encoded as a fixed-width digit string
    (lexicographic = numeric; DuckDB 1.0's arg_min/arg_max cannot
    compare structs), so ties are impossible and the pick is
    deterministic in both engines.

    Scale: one shuffle, partial aggregation keeps per-partition state
    at one candidate row per key — compare E6/E7, which sort every
    group's rows."""
    ev = load(spark, sf_dir, "events")
    key = F.format_string("%020d%020d", F.unix_micros(F.col("ts")), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_id", key).cast("bigint").alias("first_event_id"),
        F.max_by("event_id", key).cast("bigint").alias("last_event_id"),
        F.max_by("event_type", key).alias("last_event_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# M97 — bitmap-partial distinct count (the scalable COUNT DISTINCT)
# ---------------------------------------------------------------------------


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M97 — exact distinct counting via bitmap partial aggregation:
    keys bucket into 32k-bit bitmaps (bitmap_bit_position /
    bitmap_construct_agg per (group, bucket)), partial bitmaps OR-merge,
    and the final count is the popcount sum.  The oracle is plain
    COUNT(DISTINCT) — identical answer, but the bitmap plan's partial
    state is a fixed-size bitmap per bucket instead of a hash set of
    keys, the shape that survives a 100-TB distinct (D3's expand-mode
    COUNT DISTINCT re-shuffles raw keys; this ships compressed
    set-state that merges associatively, e.g. for a rollup cube or a
    streaming refresh).

    Spark-side it is pure SQL (bitmap functions are JVM built-ins,
    Spark 3.5+); two map-side-combinable aggregates, one shuffle on
    (group, bucket)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, CAST(sum(cnt) AS BIGINT) AS n_parts
        FROM (
          SELECT l_returnflag,
                 bitmap_count(bitmap_construct_agg(
                   bitmap_bit_position(l_partkey))) AS cnt
          FROM lineitem
          GROUP BY l_returnflag, bitmap_bucket_number(l_partkey)
        )
        GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# M128 — Count-Min sketch matrix (deterministic, portable hashes)
# ---------------------------------------------------------------------------

#: CMS geometry: d=4 hash rows × w=64 counters.  Error bound e·N/w with
#: probability 1-(1/2)^d over the min of the rows.  The row hashes are
#: fixed affine maps over md5-low-32 — the dedup.py MinHash discipline,
#: so any engine recomputes the identical sketch.
_CMS_W = 64
_CMS_PRIME = 4294967311
_CMS_ROWS = [(1049, 337), (2089, 619), (4093, 829), (8191, 523)]


@register(
    "agg_cms_matrix",
    oracle=f"""
    WITH h AS (
      SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
      FROM events
    ),
    cells AS (
      {" UNION ALL ".join(
          f"SELECT {i} AS row_id, ((hv * {a} + {b}) % {_CMS_PRIME}) % {_CMS_W} AS col_id FROM h"
          for i, (a, b) in enumerate(_CMS_ROWS)
      )}
    )
    SELECT CAST(row_id AS BIGINT) AS row_id,
           CAST(col_id AS BIGINT) AS col_id,
           CAST(count(*) AS BIGINT) AS cnt
    FROM cells GROUP BY row_id, col_id
    """,
)
def agg_cms_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M128 — Count-Min sketch of per-user event frequency as the
    materialized d×w counter matrix.  The sketch a 100 TB pipeline
    ships to the driver for heavy-hitter / frequency estimation when
    the exact key histogram (M47) no longer fits: 256 counters
    summarize any number of events, merging is cell-wise addition
    (map-side combinable by construction), and a key's estimate is the
    min over its d cells.  All portable integer arithmetic (md5-low-32
    base hash + fixed affine rows, the J3 discipline) — the oracle
    recomputes the identical matrix."""
    from tropology_spark.sources.tables import load

    e = load(spark, sf_dir, "events")
    hv = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("hv")
    )
    h = e.select(hv)
    cells = h.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("bigint").alias("row_id"),
                        (
                            ((F.col("hv") * F.lit(a) + F.lit(b)) % F.lit(_CMS_PRIME))
                            % F.lit(_CMS_W)
                        )
                        .cast("bigint")
                        .alias("col_id"),
                    )
                    for i, (a, b) in enumerate(_CMS_ROWS)
                ]
            )
        ).alias("c")
    ).select("c.row_id", "c.col_id")
    return cells.groupBy("row_id", "col_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


# ---------------------------------------------------------------------------
# M138 — KMV sketch set-intersection (mergeable audience overlap)
# ---------------------------------------------------------------------------

_KMVX_K = 64


@register(
    "agg_kmv_intersect",
    oracle=f"""
    WITH h AS (SELECT DISTINCT event_type,
                  ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
               FROM events),
    t AS (SELECT DISTINCT event_type FROM events),
    pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b
           FROM t a JOIN t b ON a.event_type < b.event_type),
    m AS (
      SELECT pr.type_a, pr.type_b, h.h,
             max(CASE WHEN h.event_type = pr.type_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN h.event_type = pr.type_b THEN 1 ELSE 0 END) AS in_b
      FROM pr JOIN h ON h.event_type IN (pr.type_a, pr.type_b)
      GROUP BY pr.type_a, pr.type_b, h.h
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
          FROM m),
    s AS (SELECT type_a, type_b, count(*) AS n_u,
                 max(CASE WHEN rn = {_KMVX_K} THEN h END) AS mk,
                 sum(CASE WHEN rn <= {_KMVX_K} AND in_a = 1 AND in_b = 1
                          THEN 1 ELSE 0 END) AS n_both_k,
                 sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both_all
          FROM r GROUP BY type_a, type_b)
    SELECT type_a, type_b,
           CAST(CASE WHEN n_u >= {_KMVX_K}
                     THEN (n_both_k * (({_KMVX_K - 1} * 4294967296) // (mk + 1)))
                          // {_KMVX_K}
                     ELSE n_both_all END AS BIGINT) AS approx_common_users
    FROM s
    """,
)
def agg_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M138 — approximate audience overlap |users(A) ∩ users(B)| for
    every event-type pair via K-MINIMUM-VALUES intersection (the D4
    estimator's pair form, Beyer et al. SIGMOD'07): over the UNION's k
    smallest distinct md5-low-32 hashes, the fraction present in both
    sets scales the KMV union estimate — every intermediate an exact
    integer, estimate by integer division only, exact-count fallback
    below k.  This is the MERGEABLE way to audit training-mixture
    overlap: per-set sketches are k integers each, pair estimates need
    only sketch×sketch merges.  At 100 TB the per-type sketches are
    built once in one distinct shuffle (the D3/D4 first phase) and the
    O(T²) pair stage touches k·T integers, never raw data; the
    declarative form here is that sketch's oracle-matching reference.
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    hcol = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    h = e.select("event_type", hcol).distinct()
    t = e.select("event_type").distinct()
    pr = (
        t.alias("a")
        .join(
            t.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    # The per-(pair, hash) membership fold: T is tiny (event types), so
    # the pair table broadcasts and the heavy side streams through once.
    m = (
        F.broadcast(pr)
        .join(
            h,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    r = m.withColumn(
        "rn", F.row_number().over(Window.partitionBy("type_a", "type_b").orderBy("h"))
    )
    s = r.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_u"),
        F.max(F.when(F.col("rn") == _KMVX_K, F.col("h"))).alias("mk"),
        F.sum(
            F.when(
                (F.col("rn") <= _KMVX_K) & (F.col("in_a") == 1) & (F.col("in_b") == 1),
                1,
            ).otherwise(0)
        ).alias("n_both_k"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("n_both_all"),
    )
    return s.select(
        "type_a",
        "type_b",
        F.when(
            F.col("n_u") >= _KMVX_K,
            F.expr(
                f"(n_both_k * (({_KMVX_K - 1} * 4294967296) div (mk + 1)))"
                f" div {_KMVX_K}"
            ),
        )
        .otherwise(F.col("n_both_all"))
        .cast("bigint")
        .alias("approx_common_users"),
    )


# ---------------------------------------------------------------------------
# M214 — KMV sketch set-difference (completes the sketch algebra)
# ---------------------------------------------------------------------------


@register(
    "agg_kmv_diff",
    oracle=f"""
    WITH h AS (SELECT DISTINCT o_orderpriority,
                  ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
               FROM orders),
    t AS (SELECT DISTINCT o_orderpriority FROM orders),
    pr AS (SELECT a.o_orderpriority AS pri_a, b.o_orderpriority AS pri_b
           FROM t a JOIN t b ON a.o_orderpriority < b.o_orderpriority),
    m AS (
      SELECT pr.pri_a, pr.pri_b, h.h,
             max(CASE WHEN h.o_orderpriority = pr.pri_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN h.o_orderpriority = pr.pri_b THEN 1 ELSE 0 END) AS in_b
      FROM pr JOIN h ON h.o_orderpriority IN (pr.pri_a, pr.pri_b)
      GROUP BY pr.pri_a, pr.pri_b, h.h
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY pri_a, pri_b ORDER BY h) AS rn
          FROM m),
    s AS (SELECT pri_a, pri_b, count(*) AS n_u,
                 max(CASE WHEN rn = {_KMVX_K} THEN h END) AS mk,
                 sum(CASE WHEN rn <= {_KMVX_K} AND in_a = 1 AND in_b = 0
                          THEN 1 ELSE 0 END) AS n_oa_k,
                 sum(CASE WHEN rn <= {_KMVX_K} AND in_a = 0 AND in_b = 1
                          THEN 1 ELSE 0 END) AS n_ob_k,
                 sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
                   AS n_oa_all,
                 sum(CASE WHEN in_a = 0 AND in_b = 1 THEN 1 ELSE 0 END)
                   AS n_ob_all
          FROM r GROUP BY pri_a, pri_b)
    SELECT pri_a, pri_b,
           CAST(CASE WHEN n_u >= {_KMVX_K}
                     THEN (n_oa_k * (({_KMVX_K - 1} * 4294967296) // (mk + 1)))
                          // {_KMVX_K}
                     ELSE n_oa_all END AS BIGINT) AS approx_only_a,
           CAST(CASE WHEN n_u >= {_KMVX_K}
                     THEN (n_ob_k * (({_KMVX_K - 1} * 4294967296) // (mk + 1)))
                          // {_KMVX_K}
                     ELSE n_ob_all END AS BIGINT) AS approx_only_b,
           CAST(n_oa_all AS BIGINT) AS exact_only_a,
           CAST(n_ob_all AS BIGINT) AS exact_only_b
    FROM s
    """,
)
def agg_kmv_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M214 — approximate audience DIFFERENCE |custs(A) \\ custs(B)|
    (and the mirror) for every order-priority pair, completing the KMV
    sketch algebra next to union (D4), intersection (M138), and the
    merge audit (M168): over the union's k smallest distinct
    md5-low-32 hashes, the fraction present in A but not B scales the
    KMV union estimate — audience-minus-audience is the curation ask
    ("how many users would this source add over that one").  Exact
    EXCEPT counts ride along as the audit columns (the M161
    trust-table discipline: the estimate is only shippable next to its
    error), and are the exact fallback below k.  Every intermediate is
    an exact integer; estimates are integer divisions only.  The base
    sets are priority-keyed customer cohorts, NOT the events user
    sets M138 uses — every fixture user emits every event type, so
    event-type differences are empty by construction; priority
    cohorts genuinely differ (~180 exclusive customers per pair at
    sf0.01), exercising the estimator.

    Scale: identical to M138 — per-set sketches are k integers built
    in one distinct shuffle; the O(T²) pair stage merges sketches,
    never raw data.  The exact audit columns are the one piece that
    re-reads per-hash membership; at 100 TB they'd be sampled or
    dropped while the sketch path stays as is."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "orders")
    hcol = (
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    h = e.select("o_orderpriority", hcol).distinct()
    t = e.select("o_orderpriority").distinct()
    pr = (
        t.alias("a")
        .join(t.alias("b"), F.col("a.o_orderpriority") < F.col("b.o_orderpriority"))
        .select(
            F.col("a.o_orderpriority").alias("pri_a"),
            F.col("b.o_orderpriority").alias("pri_b"),
        )
    )
    m = (
        F.broadcast(pr)
        .join(
            h,
            (F.col("o_orderpriority") == F.col("pri_a"))
            | (F.col("o_orderpriority") == F.col("pri_b")),
        )
        .groupBy("pri_a", "pri_b", "h")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == F.col("pri_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("o_orderpriority") == F.col("pri_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    r = m.withColumn(
        "rn", F.row_number().over(Window.partitionBy("pri_a", "pri_b").orderBy("h"))
    )
    only_a = (F.col("in_a") == 1) & (F.col("in_b") == 0)
    only_b = (F.col("in_a") == 0) & (F.col("in_b") == 1)
    s = r.groupBy("pri_a", "pri_b").agg(
        F.count(F.lit(1)).alias("n_u"),
        F.max(F.when(F.col("rn") == _KMVX_K, F.col("h"))).alias("mk"),
        F.sum(F.when((F.col("rn") <= _KMVX_K) & only_a, 1).otherwise(0)).alias(
            "n_oa_k"
        ),
        F.sum(F.when((F.col("rn") <= _KMVX_K) & only_b, 1).otherwise(0)).alias(
            "n_ob_k"
        ),
        F.sum(F.when(only_a, 1).otherwise(0)).alias("n_oa_all"),
        F.sum(F.when(only_b, 1).otherwise(0)).alias("n_ob_all"),
    )

    def est(nk: str, nall: str) -> F.Column:
        return (
            F.when(
                F.col("n_u") >= _KMVX_K,
                F.expr(
                    f"({nk} * (({_KMVX_K - 1} * 4294967296) div (mk + 1)))"
                    f" div {_KMVX_K}"
                ),
            )
            .otherwise(F.col(nall))
            .cast("bigint")
        )

    return s.select(
        "pri_a",
        "pri_b",
        est("n_oa_k", "n_oa_all").alias("approx_only_a"),
        est("n_ob_k", "n_ob_all").alias("approx_only_b"),
        F.col("n_oa_all").cast("bigint").alias("exact_only_a"),
        F.col("n_ob_all").cast("bigint").alias("exact_only_b"),
    )


# ---------------------------------------------------------------------------
# M161 — exact-vs-KMV audit (the sketch's own trust table)
# ---------------------------------------------------------------------------

# The REAL D4 constant, not a copy: the audit's oracle must recompute
# the exact estimator D4 ships (the dedup_lsh_recall single-source
# rule).  Mid-module import is safe — relational.py does not import
# this module.
from tropology_spark.operators.relational import _KMV_K  # noqa: E402


@register(
    "agg_kmv_audit",
    oracle=f"""
    WITH ex AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM events GROUP BY event_type
    ),
    h AS (SELECT DISTINCT event_type,
                 ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
          FROM events),
    r AS (SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM h),
    p AS (SELECT event_type, count(*) AS n_h,
                 max(CASE WHEN rn = {_KMV_K} THEN h END) AS mk
          FROM r GROUP BY event_type),
    est AS (
      SELECT event_type,
             CAST(CASE WHEN n_h >= {_KMV_K}
                       THEN ({_KMV_K - 1} * 4294967296) // (mk + 1)
                       ELSE n_h END AS BIGINT) AS approx_users
      FROM p
    )
    SELECT ex.event_type, ex.exact_users, est.approx_users,
           CAST((1000000 * abs(est.approx_users - ex.exact_users))
                // ex.exact_users AS BIGINT) AS err_ppm
    FROM ex JOIN est ON ex.event_type = est.event_type
    """,
)
def agg_kmv_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M161 — the KMV sketch's own trust table: exact distinct count
    (D3's plan) and the D4 KMV estimate side-by-side per group, with
    the relative error as an integer ppm.  The M112/M126 audit
    discipline applied to the cardinality sketch — at 100 TB the exact
    side runs on a sampled slice while the sketch runs everywhere, and
    this query is the agreement check that justifies trusting the
    sketch's numbers in dashboards.  Composes the two REGISTERED
    queries so audit and production cannot drift."""
    from tropology_spark.registry import QUERIES

    ex = (
        QUERIES["agg_count_distinct"](spark, sf_dir)
        .select("event_type", F.col("n_users").cast("bigint").alias("exact_users"))
    )
    est = QUERIES["agg_approx_distinct"](spark, sf_dir)
    return (
        ex.join(est, "event_type")
        .select(
            "event_type",
            "exact_users",
            "approx_users",
            F.expr(
                "(1000000 * abs(approx_users - exact_users)) div exact_users"
            )
            .cast("bigint")
            .alias("err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# M175 — mergeable quantile-sketch audit (binned histogram vs exact rank)
# ---------------------------------------------------------------------------

_QSK_W = 16384  # bin width in cents (~$164); sketch size = price-range / W


@register(
    "agg_quantile_sketch_audit",
    oracle=f"""
    WITH c AS (
      SELECT o_orderpriority AS prio,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    bins AS (
      SELECT prio, cents // {_QSK_W} AS bin, CAST(count(*) AS BIGINT) AS cnt
      FROM c GROUP BY 1, 2
    ),
    cum AS (
      SELECT prio, bin, cnt,
             CAST(sum(cnt) OVER (PARTITION BY prio ORDER BY bin) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY prio) AS BIGINT) AS n
      FROM bins
    ),
    est AS (
      SELECT prio, CAST(max(n) AS BIGINT) AS n_orders,
             CAST(count(*) AS BIGINT) AS n_bins,
             CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bin END) * {_QSK_W}
                  + {_QSK_W} // 2 AS BIGINT) AS est_p50_cents,
             CAST(min(CASE WHEN 10 * cum >= 9 * n THEN bin END) * {_QSK_W}
                  + {_QSK_W} // 2 AS BIGINT) AS est_p90_cents
      FROM cum GROUP BY prio
    ),
    rk AS (
      SELECT prio, cents,
             row_number() OVER (PARTITION BY prio ORDER BY cents) AS rn,
             CAST(count(*) OVER (PARTITION BY prio) AS BIGINT) AS n
      FROM c
    ),
    exact AS (
      SELECT prio,
             CAST(max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
               AS exact_p50_cents,
             CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) AS BIGINT)
               AS exact_p90_cents
      FROM rk GROUP BY prio
    )
    SELECT est.prio, est.n_orders, est.n_bins,
           est.est_p50_cents, exact.exact_p50_cents,
           CAST((1000000 * abs(est.est_p50_cents - exact.exact_p50_cents))
                // exact.exact_p50_cents AS BIGINT) AS p50_err_ppm,
           est.est_p90_cents, exact.exact_p90_cents,
           CAST((1000000 * abs(est.est_p90_cents - exact.exact_p90_cents))
                // exact.exact_p90_cents AS BIGINT) AS p90_err_ppm
    FROM est JOIN exact ON est.prio = exact.prio
    """,
)
def agg_quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M175 — the quantile member of the sketch-audit family (M161
    KMV-distinct, M128 CMS-counts): a fixed-width binned histogram
    sketch of order totals — per (priority, 16384-cent bin) counts,
    the mergeable state a rollup tier stores — estimates p50/p90 as
    the midpoint of the first bin whose cumulative count crosses the
    rank threshold, and is audited against the EXACT discrete
    percentile (value at rank ⌈q·n⌉ under the unique cents order)
    with integer-ppm error.  Max error is ±W/2 by construction — the
    audit proves the configured bin width honors that bound.

    Every intermediate is an exact integer: cents, bin = cents div W,
    counts, ranks; thresholds compare 10·cum ≥ 9·n style
    cross-multiplications, never fractions.

    Scale: the sketch is O(groups × price-range/W) — config-bounded,
    mergeable by addition, and built with one map-side-combinable
    aggregate.  The exact side's per-group rank window exists ONLY to
    audit the sketch at fixture scale; production keeps the sketch."""
    o = load(spark, sf_dir, "orders")
    c = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    bins = c.groupBy(
        "prio", F.expr(f"cents div {_QSK_W}").alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wc = Window.partitionBy("prio").orderBy("bin")
    wt = Window.partitionBy("prio")
    cum = bins.select(
        "prio", "bin", "cnt",
        F.sum("cnt").over(wc).cast("bigint").alias("cum"),
        F.sum("cnt").over(wt).cast("bigint").alias("n"),
    )
    est = cum.groupBy("prio").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        (
            F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("bin")))
            * _QSK_W
            + _QSK_W // 2
        )
        .cast("bigint")
        .alias("est_p50_cents"),
        (
            F.min(F.when(10 * F.col("cum") >= 9 * F.col("n"), F.col("bin")))
            * _QSK_W
            + _QSK_W // 2
        )
        .cast("bigint")
        .alias("est_p90_cents"),
    )
    wr = Window.partitionBy("prio").orderBy("cents")
    rk = c.select(
        "prio", "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wt).cast("bigint").alias("n"),
    )
    exact = rk.groupBy("prio").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("cents"))
        )
        .cast("bigint")
        .alias("exact_p50_cents"),
        F.max(
            F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("cents"))
        )
        .cast("bigint")
        .alias("exact_p90_cents"),
    )
    return est.join(exact, "prio").select(
        "prio", "n_orders", "n_bins",
        "est_p50_cents", "exact_p50_cents",
        F.expr(
            "(1000000 * abs(est_p50_cents - exact_p50_cents)) div exact_p50_cents"
        )
        .cast("bigint")
        .alias("p50_err_ppm"),
        "est_p90_cents", "exact_p90_cents",
        F.expr(
            "(1000000 * abs(est_p90_cents - exact_p90_cents)) div exact_p90_cents"
        )
        .cast("bigint")
        .alias("p90_err_ppm"),
    )


# ---------------------------------------------------------------------------
# M187 — mergeable-partials audit (rollup-tier associativity as a query)
# ---------------------------------------------------------------------------


@register(
    "agg_mergeable_stats_audit",
    oracle="""
    WITH part AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS sq,
             CAST(min(n_chars) AS BIGINT) AS mn,
             CAST(max(n_chars) AS BIGINT) AS mx
      FROM documents GROUP BY source
    ),
    merged AS (
      SELECT CAST(count(*) AS BIGINT) AS n_partials,
             CAST(sum(n) AS BIGINT) AS m_n, CAST(sum(s) AS BIGINT) AS m_s,
             CAST(sum(sq) AS BIGINT) AS m_sq,
             CAST(min(mn) AS BIGINT) AS m_mn, CAST(max(mx) AS BIGINT) AS m_mx
      FROM part
    ),
    direct AS (
      SELECT CAST(count(*) AS BIGINT) AS d_n,
             CAST(sum(n_chars) AS BIGINT) AS d_s,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS d_sq,
             CAST(min(n_chars) AS BIGINT) AS d_mn,
             CAST(max(n_chars) AS BIGINT) AS d_mx
      FROM documents
    )
    SELECT n_partials, d_n, m_n, d_s, m_s, d_sq, m_sq, d_mn, m_mn, d_mx, m_mx,
           CAST(CASE WHEN d_n = m_n AND d_s = m_s AND d_sq = m_sq
                     AND d_mn = m_mn AND d_mx = m_mx
                THEN 1 ELSE 0 END AS BIGINT) AS all_equal
    FROM merged CROSS JOIN direct
    """,
)
def agg_mergeable_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M187 — mergeability made checkable: per-source PARTIAL stats
    (count / sum / sum-of-squares / min / max over n_chars — every
    one an exact integer, so merging is exact integer addition or
    min/max) are merged into global stats and compared against the
    direct single-pass aggregate; all_equal = 1 is the associativity
    proof.  This is the contract every rollup tier, sketch (M161/
    M128/M175) and two-phase aggregate (D11) silently relies on —
    here it is a registered query a data platform can run per
    snapshot, and the reason the repo's stats avoid float SUMs (which
    would NOT merge bit-identically; functions/exact.py).

    Scale: both branches are map-side-combinable scans; the partials
    table is O(sources).  In production the partials are the stored
    artifact and the direct branch runs only at audit time."""
    d = load(spark, sf_dir, "documents")
    part = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sq"),
        F.min("n_chars").cast("bigint").alias("mn"),
        F.max("n_chars").cast("bigint").alias("mx"),
    )
    merged = part.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partials"),
        F.sum("n").cast("bigint").alias("m_n"),
        F.sum("s").cast("bigint").alias("m_s"),
        F.sum("sq").cast("bigint").alias("m_sq"),
        F.min("mn").cast("bigint").alias("m_mn"),
        F.max("mx").cast("bigint").alias("m_mx"),
    )
    direct = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("d_n"),
        F.sum("n_chars").cast("bigint").alias("d_s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("d_sq"),
        F.min("n_chars").cast("bigint").alias("d_mn"),
        F.max("n_chars").cast("bigint").alias("d_mx"),
    )
    return merged.crossJoin(F.broadcast(direct)).select(
        "n_partials", "d_n", "m_n", "d_s", "m_s", "d_sq", "m_sq",
        "d_mn", "m_mn", "d_mx", "m_mx",
        F.when(
            (F.col("d_n") == F.col("m_n"))
            & (F.col("d_s") == F.col("m_s"))
            & (F.col("d_sq") == F.col("m_sq"))
            & (F.col("d_mn") == F.col("m_mn"))
            & (F.col("d_mx") == F.col("m_mx")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("all_equal"),
    )


# ---------------------------------------------------------------------------
# M258 agg_weighted_median — exact lower weighted median (integer compare)
# ---------------------------------------------------------------------------


@register(
    "agg_weighted_median",
    oracle="""
    WITH ow AS (
      SELECT o.o_orderpriority AS priority,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS w
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2, o.o_orderkey
    ),
    v AS (SELECT priority, cents, CAST(sum(w) AS BIGINT) AS w
          FROM ow GROUP BY 1, 2),
    c AS (SELECT priority, cents, w,
                 CAST(sum(w) OVER (PARTITION BY priority ORDER BY cents)
                      AS BIGINT) AS cw,
                 CAST(sum(w) OVER (PARTITION BY priority) AS BIGINT) AS wt
          FROM v)
    SELECT priority, w_total, wmedian_cents FROM (
      SELECT priority, wt AS w_total, cents AS wmedian_cents,
             row_number() OVER (PARTITION BY priority ORDER BY cents) AS rm1
      FROM c WHERE 2 * cw >= wt) t
    WHERE rm1 = 1
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M258 — exact LOWER WEIGHTED MEDIAN of order price per
    priority, weighted by the order's line-item count: the smallest
    cents value whose cumulative weight reaches half the total
    (2·cumw ≥ W — integer compare only, no halving, no midpoint, so
    the result is always an OBSERVED value and crosses the engine
    hash gate with zero float carriers; the med2x doubling trick is
    unnecessary because the lower-median definition never averages).
    The weighted complement of M59's unweighted median — "the price
    of the median SHIPPED LINE, not the median order".

    Scale: orders collapse to the per-(priority, cents) weight table
    (two map-side-combinable rollups); the cumulative runs per
    priority — a real partition key, no constant-key window; the
    winner is one rank filter."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    ow = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("priority", "cents", "o_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    v = ow.groupBy("priority", "cents").agg(
        F.sum("w").cast("bigint").alias("w")
    )
    wp = Window.partitionBy("priority")
    c = v.select(
        "priority",
        "cents",
        "w",
        F.sum("w")
        .over(wp.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cw"),
        F.sum("w").over(wp).cast("bigint").alias("wt"),
    )
    r = (
        c.filter(2 * F.col("cw") >= F.col("wt"))
        .withColumn("rm1", F.row_number().over(wp.orderBy("cents")))
        .filter(F.col("rm1") == 1)
    )
    return r.select(
        "priority",
        F.col("wt").alias("w_total"),
        F.col("cents").alias("wmedian_cents"),
    )


# ---------------------------------------------------------------------------
# M267 agg_hll_audit — HyperLogLog register audit, exact dyadic estimate
# ---------------------------------------------------------------------------

#: HLL geometry: b = 4 bucket bits (one md5 hex digit) -> m = 16
#: registers; rho is measured over the NEXT 32 hash bits (8 hex
#: chars), so rho in [1, 33] and an empty register carries 0.
_HLL_M = 16
#: alpha_16 = 0.673 carried as a /1000 fixed point, and the whole raw
#: estimate kept integral: E = alpha*m^2 / sum(2^-rho_j).  With
#: S = sum_j 2^(33 - M_j) (an integer, since M_j <= 33) the estimate
#: is exactly (673 * m^2 * 2^33) div (1000 * S) — a dyadic-rational
#: carrier, no float anywhere (the KMV-estimate discipline applied to
#: HLL's harmonic mean).
_HLL_NUM = 673 * _HLL_M * _HLL_M * (1 << 33)


@register(
    "agg_hll_audit",
    oracle=f"""
    WITH h AS (
      SELECT o_orderpriority,
             ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1))::BIGINT
               AS bucket,
             ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 2, 8))::BIGINT
               AS w
      FROM orders),
    regs AS (
      SELECT o_orderpriority, bucket,
             max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS m
      FROM h GROUP BY o_orderpriority, bucket),
    spine AS (
      SELECT g.o_orderpriority, s.b AS bucket
      FROM (SELECT DISTINCT o_orderpriority FROM orders) g,
           (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS b) s),
    full_regs AS (
      SELECT spine.o_orderpriority, spine.bucket, coalesce(regs.m, 0) AS m0
      FROM spine LEFT JOIN regs
        ON spine.o_orderpriority = regs.o_orderpriority
       AND spine.bucket = regs.bucket),
    agg AS (
      SELECT o_orderpriority,
             CAST(sum(1::BIGINT << (33 - m0)) AS BIGINT) AS s_carrier,
             CAST(sum(CASE WHEN m0 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty
      FROM full_regs GROUP BY o_orderpriority),
    ex AS (SELECT o_orderpriority,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
           FROM orders GROUP BY o_orderpriority),
    est AS (
      SELECT agg.o_orderpriority, ex.n_exact, agg.v_empty, agg.s_carrier,
             CAST({_HLL_NUM} // (1000 * agg.s_carrier) AS BIGINT) AS hll_est
      FROM agg JOIN ex ON agg.o_orderpriority = ex.o_orderpriority)
    SELECT o_orderpriority, n_exact, v_empty, s_carrier, hll_est,
           CAST((1000000 * hll_est) // n_exact AS BIGINT) AS ratio_ppm
    FROM est
    """,
)
def agg_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M267 — HyperLogLog distinct-count audit, the one
    canonical mergeable sketch the family (KMV M138/M161/M214, bitmap
    M97, CMS M128, quantile M175) did not yet cover: per order
    priority, the m=16 max-rho register vector summarized to its
    dyadic harmonic-sum carrier, the raw HLL estimate, and the
    estimate/exact ratio in ppm.

    All integer arithmetic end to end: bucket = first md5 hex digit,
    rho = 33 - bit_length of the next 32 hash bits (length(bin(w)) —
    both engines agree exactly), registers max-merge, and the
    harmonic mean is carried as S = sum 2^(33-M_j) so the alpha*m^2/S
    estimate is one integral division (no float, no engine libm — the
    cross-engine float rule).  Empty registers enter as M_j = 0 via a
    16-slot spine (explode of a bounded literal sequence, no join
    blowup), exactly the standard-HLL convention, and v_empty is
    emitted so a consumer can see when the linear-counting regime
    (many empty registers) applies.

    Scale: register max-merge is map-side combinable (the entire point
    of HLL at 100 TB — per-partition partials are 16 bytes and merge
    associatively, vs D3's expand-mode raw-key reshuffle); one shuffle
    on (group, bucket), one on group; the exact side exists only
    because this is an AUDIT."""
    o = load(spark, sf_dir, "orders")
    md = F.md5(F.col("o_custkey").cast("string"))
    h = o.select(
        "o_orderpriority",
        F.conv(F.substring(md, 1, 1), 16, 10).cast("bigint").alias("bucket"),
        F.conv(F.substring(md, 2, 8), 16, 10).cast("bigint").alias("w"),
        "o_custkey",
    )
    regs = h.groupBy("o_orderpriority", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(33)).otherwise(
                F.lit(33) - F.length(F.bin("w"))
            )
        ).alias("m")
    )
    spine = (
        o.select("o_orderpriority")
        .distinct()
        .select(
            "o_orderpriority",
            F.expr(f"explode(sequence(0L, {_HLL_M - 1}L))").alias("bucket"),
        )
    )
    full = spine.join(regs, ["o_orderpriority", "bucket"], "left").withColumn(
        "m0", F.coalesce(F.col("m"), F.lit(0))
    )
    agg = full.groupBy("o_orderpriority").agg(
        F.sum(F.expr("shiftleft(1L, CAST(33 - m0 AS INT))"))
        .cast("bigint")
        .alias("s_carrier"),
        F.sum(F.when(F.col("m0") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("v_empty"),
    )
    ex = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_exact")
    )
    return (
        agg.join(ex, "o_orderpriority")
        .withColumn(
            "hll_est",
            F.expr(f"CAST({_HLL_NUM} div (1000 * s_carrier) AS BIGINT)"),
        )
        .withColumn(
            "ratio_ppm",
            F.expr("CAST((1000000 * hll_est) div n_exact AS BIGINT)"),
        )
        .select(
            "o_orderpriority", "n_exact", "v_empty", "s_carrier",
            "hll_est", "ratio_ppm",
        )
    )


# ---------------------------------------------------------------------------
# M271 agg_ams_f2 — AMS tug-of-war F2 sketch audit
# ---------------------------------------------------------------------------

#: AMS sign-hash family: ±1 from the parity of (a·h + b) mod p over
#: the md5-low-32 base hash (the dedup.py portability rationale —
#: both engines parse the same 8 hex chars).  Multipliers < 2^30 so
#: a·h < 2^62 never overflows int64 under ANSI Spark.
_AMS_PRIME = 4294967311  # smallest prime > 2^32
_AMS_PAIRS = [
    (664525013, 1073741789),
    (931386389, 1073741597),
    (822752279, 1073741399),
    (668265263, 1073741201),
    (374761393, 1073741003),
    (536870923, 1073740805),
    (715827883, 1073740607),
    (611603851, 1073740409),
]

_AMS_SIGN_SQL = [
    f"CASE WHEN ((h * {a} + {b}) % {_AMS_PRIME}) % 2 = 0 "
    "THEN 1 ELSE -1 END"
    for a, b in _AMS_PAIRS
]

_AMS_ORACLE = f"""
    WITH h AS (
      SELECT ('0x' || substring(md5(CAST(l_partkey AS STRING)), 1, 8))::BIGINT
               AS h
      FROM lineitem
    ),
    s AS (SELECT
      {", ".join(f"CAST(sum({sql}) AS BIGINT) AS c{j}" for j, sql in enumerate(_AMS_SIGN_SQL))}
      FROM h),
    u AS ({" UNION ALL ".join(f"SELECT CAST({j} AS BIGINT) AS sketch_id, c{j} AS counter FROM s" for j in range(8))}),
    f2 AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact
           FROM (SELECT CAST(count(*) AS BIGINT) AS c
                 FROM lineitem GROUP BY l_partkey))
    SELECT sketch_id, counter,
           CAST(counter * counter AS BIGINT) AS est,
           f2_exact,
           CAST((CAST(counter * counter AS HUGEINT) * 1000000) // f2_exact
                AS BIGINT) AS ratio_ppm
    FROM u CROSS JOIN f2
"""


@register("agg_ams_f2", oracle=_AMS_ORACLE)
def agg_ams_f2(
    spark: SparkSession, sf_dir: str, li: DataFrame | None = None
) -> DataFrame:
    """M271 — AMS ("tug-of-war") second-frequency-moment sketch audit
    over the lineitem part-key stream: eight ±1-sign counters (sign =
    parity of a universal hash over the md5-low-32 of the key), each
    counter's square an unbiased F2 estimate, reported against the
    exact F2 = Σ_v c_v² with the estimate/truth ratio in ppm.  The
    KMV/HLL audit discipline applied to the classic AMS sketch
    (Alon-Matias-Szegedy 1996): the registered query IS the quality
    gate a production F2 sketch ships with.

    Integer-exact cross engines: signs/counters/squares are BIGINTs
    (|counter| ≤ n_rows, est ≤ n²  — 3.6·10¹¹ at sf0.1); the ppm ratio
    is computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) per the
    wide-integer finale rule because est·10⁶ exceeds BIGINT once
    n_rows passes ~3·10⁶ on a regenerated fixture.  Numerator and
    denominator are both non-negative so div//floor agree.

    Scale: the sketch is ONE map-side-combinable aggregate over a
    single-column projection — each partition emits 8 partial sums,
    the classic mergeable-sketch shape; the exact branch (a groupBy on
    the key) exists only because this is the audit.  The 1-row exact
    attach is a deliberate scalar crossJoin (BNLJ-allowlisted).
    ``li=`` overrides the lineitem frame (weak-scaling probe kwarg —
    tools/scale_probes/ams_scale.py; the driver contract never passes
    it)."""
    if li is None:
        li = load(spark, sf_dir, "lineitem")
    li_keys = li.select("l_partkey")
    hashed = li_keys.select(
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    counters = hashed.agg(
        *[
            F.sum(F.expr(sql)).cast("bigint").alias(f"c{j}")
            for j, sql in enumerate(_AMS_SIGN_SQL)
        ]
    )
    stack_args = ", ".join(f"{j}L, c{j}" for j in range(8))
    u = counters.select(
        F.expr(f"stack(8, {stack_args}) AS (sketch_id, counter)")
    )
    f2 = (
        li_keys.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_exact"))
    )
    return u.crossJoin(F.broadcast(f2)).select(
        F.col("sketch_id").cast("bigint").alias("sketch_id"),
        "counter",
        (F.col("counter") * F.col("counter")).cast("bigint").alias("est"),
        "f2_exact",
        F.expr(
            "CAST((CAST(counter AS DECIMAL(38,0)) * counter * 1000000)"
            " div f2_exact AS BIGINT)"
        ).alias("ratio_ppm"),
    )


# ---------------------------------------------------------------------------
# agg_cms_width_curve — Count-Min error vs width (M295)
# ---------------------------------------------------------------------------

_CMSC_WS = (8, 16, 32)


def _cms_width_oracle() -> str:
    ws = ", ".join(str(w) for w in _CMSC_WS)
    cell_rows = " UNION ALL ".join(
        f"SELECT hv, {i} AS row_id, ((hv * {a} + {b}) % {_CMS_PRIME}) AS ph FROM h"
        for i, (a, b) in enumerate(_CMS_ROWS)
    )
    return f"""
    WITH h AS (
      SELECT user_id,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
      FROM events
    ),
    ws AS (SELECT unnest([{ws}]) AS w),
    ph AS ({cell_rows}),
    cells AS (
      SELECT ws.w, ph.row_id, ph.ph % ws.w AS col_id,
             CAST(count(*) AS BIGINT) AS cnt
      FROM ph CROSS JOIN ws
      GROUP BY 1, 2, 3
    ),
    u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_n,
                 min(hv) AS hv
          FROM h GROUP BY user_id),
    uph AS ({cell_rows.replace("FROM h", "FROM u")}),
    est AS (
      SELECT ws.w, uph.hv, CAST(min(cells.cnt) AS BIGINT) AS est_n
      FROM uph CROSS JOIN ws
      JOIN cells ON cells.w = ws.w AND cells.row_id = uph.row_id
                AND cells.col_id = uph.ph % ws.w
      GROUP BY 1, 2
    )
    SELECT CAST(est.w AS BIGINT) AS w,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN est.est_n = u.true_n THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(sum(est.est_n - u.true_n) AS BIGINT) AS sum_overcount,
           CAST(max(est.est_n - u.true_n) AS BIGINT) AS max_overcount
    FROM est JOIN u ON est.hv = u.hv
    GROUP BY est.w
    """


@register("agg_cms_width_curve", oracle=_cms_width_oracle())
def agg_cms_width_curve(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M295 — the Count-Min WIDTH tuning curve: rebuild the
    M128 sketch at w ∈ 8/16/32 from the SAME md5-low-32 base hash and
    affine row functions, estimate every user's event count (min over
    the d=4 row cells) and report, per width, how many users are
    estimated EXACTLY, the total and the worst overcount — the
    memory-vs-error axis a CMS deployment sizes by (error ~ N/w; the
    curve shows it halving as width doubles).  CMS never
    underestimates, so overcount = est − true is always ≥ 0 — an
    algebraic guarantee the twin pins.  Completes the tuning-curve
    family: M264 tunes LSH (b,r), M263 tunes IVF n_probe, this tunes
    the sketch family's one free axis.

    Composed, not copied: the hash and row constants are the
    registered M128 home's (the single-home rule — a constant
    drift would break both sides identically, which is why the twin
    re-derives the formula from the raw constants too).  Scale: ONE
    events pass → the per-user (true_n, hv) table (hv is a pure
    function of user_id, so every event of a user lands in the same
    cells and the cell count equals Σ true_n over its users — the
    round-19 restructure: the ×d explode runs over DISTINCT USERS,
    never over raw events, and the events scan happens once);
    per-user estimates join the bounded cell table (d·Σw = 224 rows,
    broadcast).

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    from tropology_spark.session import iter_materialize

    e = events if events is not None else load(spark, sf_dir, "events")
    hv = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("hv")
    )
    h = e.select("user_id", hv)
    row_structs = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("row_id"),
                ((F.col("hv") * F.lit(a) + F.lit(b)) % F.lit(_CMS_PRIME)).alias(
                    "ph"
                ),
            )
            for i, (a, b) in enumerate(_CMS_ROWS)
        ]
    )
    ws = spark.createDataFrame([(w,) for w in _CMSC_WS], "w long")
    # u feeds TWO plan branches (cells + uph) — materialized per the
    # DOUBLE-REFERENCE RULE (it is one small row per distinct user;
    # re-deriving it costs a full events scan per branch).
    u = iter_materialize(
        h.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("true_n"),
            F.min("hv").alias("hv"),
        )
    )
    # Every event of a user hashes to the user's cells, so the cell
    # count over raw events is exactly sum(true_n) over its users.
    cells = (
        u.select("true_n", F.explode(row_structs).alias("c"))
        .select("true_n", "c.row_id", "c.ph")
        .crossJoin(F.broadcast(ws))
        .groupBy("w", "row_id", (F.col("ph") % F.col("w")).alias("col_id"))
        .agg(F.sum("true_n").cast("bigint").alias("cnt"))
    )
    uph = u.select(
        "user_id", "true_n", F.explode(row_structs).alias("c")
    ).select("user_id", "true_n", "c.row_id", "c.ph")
    est = (
        uph.crossJoin(F.broadcast(ws))
        .join(cells, ["w", "row_id"])
        .filter(F.col("col_id") == F.col("ph") % F.col("w"))
        .groupBy("w", "user_id", "true_n")
        .agg(F.min("cnt").cast("bigint").alias("est_n"))
    )
    return est.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("est_n") == F.col("true_n"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.sum(F.col("est_n") - F.col("true_n"))
        .cast("bigint")
        .alias("sum_overcount"),
        F.max(F.col("est_n") - F.col("true_n"))
        .cast("bigint")
        .alias("max_overcount"),
    ).select(
        F.col("w").cast("bigint").alias("w"),
        "n_users",
        "n_exact",
        "sum_overcount",
        "max_overcount",
    )


# ---------------------------------------------------------------------------
# graph_reach2_hll_audit — HyperBall: the HLL register trick on frontiers
# (M296).  Lives HERE, next to the M267 register machinery whose
# constants its oracle splices at import time — a graph_paths home
# would import this module mid-package-init and perturb the
# externally-significant registry order.
# ---------------------------------------------------------------------------


def _reach2_hll_oracle() -> str:
    return f"""
    WITH edges AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
    seeds AS (SELECT src FROM (
                SELECT src, row_number() OVER (ORDER BY d DESC, src) AS rs1
                FROM deg) t
              WHERE rs1 <= 3),
    b1 AS (SELECT DISTINCT s.src AS seed, e.dst
           FROM seeds s JOIN edges e ON e.src = s.src),
    b2 AS (SELECT DISTINCT b1.seed, e2.src AS w
           FROM b1 JOIN edges e2 ON e2.dst = b1.dst
           WHERE e2.src <> b1.seed),
    hh AS (
      SELECT seed,
             ('0x' || substring(md5(CAST(w AS VARCHAR)), 1, 1))::BIGINT AS bucket,
             ('0x' || substring(md5(CAST(w AS VARCHAR)), 2, 8))::BIGINT AS hw
      FROM b2),
    regs AS (
      SELECT seed, bucket,
             max(CASE WHEN hw = 0 THEN 33 ELSE 33 - length(bin(hw)) END) AS m
      FROM hh GROUP BY seed, bucket),
    spine AS (
      SELECT s.seed, b.b AS bucket
      FROM (SELECT DISTINCT seed FROM b2) s,
           (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS b) b),
    agg AS (
      SELECT spine.seed,
             CAST(sum(1::BIGINT << (33 - coalesce(regs.m, 0))) AS BIGINT)
               AS s_carrier
      FROM spine LEFT JOIN regs
        ON spine.seed = regs.seed AND spine.bucket = regs.bucket
      GROUP BY spine.seed),
    ex AS (SELECT seed, CAST(count(*) AS BIGINT) AS n_exact
           FROM b2 GROUP BY seed)
    SELECT ex.seed, ex.n_exact,
           CAST({_HLL_NUM} // (1000 * agg.s_carrier) AS BIGINT) AS hll_est,
           CAST((1000000 * ({_HLL_NUM} // (1000 * agg.s_carrier))) // ex.n_exact
                AS BIGINT) AS ratio_ppm
    FROM ex JOIN agg ON ex.seed = agg.seed
    """


@register("graph_reach2_hll_audit", oracle=_reach2_hll_oracle())
def graph_reach2_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M296 — HYPERBALL, audited: the M267 HLL register trick
    applied to each seed's 2-hop frontier — per seed the exact
    |ball(seed, 2)| (graph_ball2_sizes' set) next to the m=16 HLL
    estimate of the SAME set and the est/exact ratio in ppm.  This is
    literally the HyperBall algorithm (Boldi-Vigna): the exact
    distinct-frontier rollup that stops scaling at 100 TB is replaced
    by 16 mergeable registers per node — union of balls = register
    max-merge, the property that makes the full ANF curve one
    edge-pass per hop.  The audit quantifies what the switch costs in
    accuracy, per seed, with zero floats (the dyadic S-carrier
    estimate is one integral division).

    Composed, not copied: the frontier derivation is the ball2 body's
    (same seed rule, same two joins); the register arithmetic uses
    the REGISTERED M267 constants (_HLL_M, _HLL_NUM) — one drift
    breaks both sides identically, so the twin re-derives the dyadic
    algebra from raw md5 too.  Scale: registers merge map-side per
    (seed, bucket); the spine is bounded (seeds × 16)."""
    from tropology_spark.session import iter_materialize
    from tropology_spark.sources.tables import edges_materialized

    e = edges_materialized(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    seeds = deg.orderBy(F.desc("d"), F.asc("src")).limit(3).select("src")
    b1 = e.join(F.broadcast(seeds), "src").select(
        F.col("src").alias("seed"), "dst"
    ).distinct()
    e2 = e.select(F.col("src").alias("w"), "dst")
    b2 = iter_materialize(
        b1.join(e2, "dst")
        .filter(F.col("w") != F.col("seed"))
        .select("seed", "w")
        .distinct()
    )  # referenced by the exact count AND the register build
    md = F.md5(F.col("w").cast("string"))
    hh = b2.select(
        "seed",
        F.conv(F.substring(md, 1, 1), 16, 10).cast("bigint").alias("bucket"),
        F.conv(F.substring(md, 2, 8), 16, 10).cast("bigint").alias("hw"),
    )
    regs = hh.groupBy("seed", "bucket").agg(
        F.max(
            F.when(F.col("hw") == 0, F.lit(33)).otherwise(
                F.lit(33) - F.length(F.bin("hw"))
            )
        ).alias("m")
    )
    spine = b2.select("seed").distinct().select(
        "seed", F.expr(f"explode(sequence(0L, {_HLL_M - 1}L))").alias("bucket")
    )
    agg = (
        spine.join(regs, ["seed", "bucket"], "left")
        .withColumn("m0", F.coalesce(F.col("m"), F.lit(0)))
        .groupBy("seed")
        .agg(
            F.sum(F.expr("shiftleft(1L, CAST(33 - m0 AS INT))"))
            .cast("bigint")
            .alias("s_carrier")
        )
    )
    ex = b2.groupBy("seed").agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    return (
        ex.join(agg, "seed")
        .withColumn(
            "hll_est",
            F.expr(f"CAST({_HLL_NUM} div (1000 * s_carrier) AS BIGINT)"),
        )
        .select(
            "seed",
            "n_exact",
            "hll_est",
            F.expr("CAST((1000000 * hll_est) div n_exact AS BIGINT)").alias(
                "ratio_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# agg_exp_decay_counts — dyadic exponentially-decayed activity
# ---------------------------------------------------------------------------

#: Half-life = 7 days; the decay weight is the exact dyadic rational
#: 4096 div 2^(age_days div 7), zero past 12 half-lives (2^12 = 4096).
_DECAY_SCALE = 4096
_DECAY_HL_DAYS = 7


@register(
    "agg_exp_decay_counts",
    oracle=f"""
    WITH e AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    mx AS (SELECT CAST(max(day) AS BIGINT) AS dmax FROM e),
    w AS (
      SELECT event_type,
             CASE WHEN (mx.dmax - day) // {_DECAY_HL_DAYS} >= 12 THEN 0
                  ELSE {_DECAY_SCALE}
                       // (1 << CAST((mx.dmax - day) // {_DECAY_HL_DAYS}
                                     AS INTEGER))
             END AS wt
      FROM e CROSS JOIN mx
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(wt) AS BIGINT) AS decayed_x4096,
           CAST(sum(wt) // count(*) AS BIGINT) AS mean_weight_x4096
    FROM w GROUP BY event_type
    """,
)
def agg_exp_decay_counts(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M297 — exponentially TIME-DECAYED activity per event
    type: each event contributes the exact dyadic weight
    4096 div 2^(age_in_half_lives) (half-life 7 days, age measured
    from the corpus' max day — data-derived, regeneration-robust;
    weights past 12 half-lives are exactly 0) — the freshness-weighted
    popularity signal every trending/ranking surface maintains, with
    the decay carried as an INTEGER dyadic rational instead of the
    usual float exp() (the M58/M230 dyadic-taps discipline applied to
    the aggregation family).  Emitted: raw count, the ×4096 decayed
    mass, and the mean weight — a consumer divides by 4096 exactly.

    Scale: the decayed sum is a plain map-side-combinable SUM (each
    row's weight depends only on its own age) — the property that
    makes dyadic decay deployable where exp() scores would need a
    re-normalization pass; one shuffle on the type key.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e0 = events if events is not None else load(spark, sf_dir, "events")
    e = e0.select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("day"),
    )
    w = Window.partitionBy(F.pmod(F.col("day"), F.lit(1)))
    x = e.select(
        "event_type",
        "day",
        F.max("day").over(w).cast("bigint").alias("dmax"),
    ).select(
        "event_type",
        F.expr(
            f"CASE WHEN (dmax - day) div {_DECAY_HL_DAYS} >= 12 THEN 0"
            f" ELSE {_DECAY_SCALE} div shiftleft(1L,"
            f" CAST((dmax - day) div {_DECAY_HL_DAYS} AS INT)) END"
        )
        .cast("bigint")
        .alias("wt"),
    )
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("wt").cast("bigint").alias("decayed_x4096"),
    ).select(
        "event_type",
        "n_events",
        "decayed_x4096",
        F.expr("decayed_x4096 div n_events")
        .cast("bigint")
        .alias("mean_weight_x4096"),
    )


# ---------------------------------------------------------------------------
# agg_bloom_fpr_curve — Bloom false-positive rate vs bits-per-key
# ---------------------------------------------------------------------------

_BLOOM_BPKS = (8, 16, 32)

_BLOOM_FPR_ORACLE = f"""
    WITH mem AS (SELECT DISTINCT o_custkey AS k FROM orders),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n_members FROM mem),
    cfg AS (SELECT CAST(unnest([{", ".join(str(b) for b in _BLOOM_BPKS)}]) AS BIGINT) AS bpk),
    mh AS (SELECT k,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT AS h1,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 9, 8))::BIGINT AS h2
           FROM mem),
    bits AS (
      SELECT DISTINCT cfg.bpk,
             (mh.h1 + j.j * mh.h2) % (cfg.bpk * nm.n_members) AS pos
      FROM mh CROSS JOIN nm CROSS JOIN cfg, unnest([0, 1]) AS j(j)
    ),
    nonm AS (SELECT c_custkey + 1000000000 AS k FROM customer),
    ph AS (SELECT k,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT AS h1,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 9, 8))::BIGINT AS h2
           FROM nonm),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_nonmembers FROM nonm),
    pp AS (
      SELECT cfg.bpk, ph.k,
             (ph.h1 + j.j * ph.h2) % (cfg.bpk * nm.n_members) AS pos
      FROM ph CROSS JOIN nm CROSS JOIN cfg, unnest([0, 1]) AS j(j)
    ),
    hit AS (SELECT pp.bpk, pp.k, CAST(count(*) AS BIGINT) AS n_hit
            FROM pp JOIN bits ON pp.bpk = bits.bpk AND pp.pos = bits.pos
            GROUP BY pp.bpk, pp.k),
    fp AS (SELECT bpk, CAST(count(*) AS BIGINT) AS n_fp
           FROM hit WHERE n_hit = 2 GROUP BY bpk)
    SELECT cfg.bpk AS bits_per_key, nm.n_members, tot.n_nonmembers,
           CAST(coalesce(fp.n_fp, 0) AS BIGINT) AS n_fp,
           CAST((1000000 * coalesce(fp.n_fp, 0)) // tot.n_nonmembers
                AS BIGINT) AS fpr_ppm
    FROM cfg LEFT JOIN fp ON cfg.bpk = fp.bpk
    CROSS JOIN nm CROSS JOIN tot
"""


@register("agg_bloom_fpr_curve", oracle=_BLOOM_FPR_ORACLE)
def agg_bloom_fpr_curve(
    spark: SparkSession,
    sf_dir: str,
    mem: DataFrame | None = None,
    probes: DataFrame | None = None,
) -> DataFrame:
    """M302 — Bloom-filter false-positive-rate curve vs bits-per-key — the
    SIZING axis of the approximate-membership family (M174 audits ONE
    fixed 4096-bit/3-hash dedup filter; this measures the FPR a
    deployment buys at m/n ∈ {8, 16, 32} bits per key, the number that
    decides the filter's memory budget at 100 TB).  Members = custkeys
    with orders; probes = the customer keys shifted by 10⁹ — a
    DISJOINT key space, so every probe is a non-member by construction
    (scale-robust: at sf0.001 every customer has orders, so an
    anti-join probe set would be empty).  A false positive is a probe
    whose both hash positions (k = 2: h1 mod m, (h1+h2) mod m over
    the md5-low/high-32 halves — the Kirsch-Mitzenmacher
    double-hashing scheme) land on set bits.
    Emits per config the member/probe counts, false positives, and
    fpr_ppm = (10⁶·n_fp) div n_nonmembers — all integers, md5-only
    randomness, every config row always emitted (LEFT join from the
    config spine).

    Scale: the bit table is a distinct-agg over members ×2 positions
    ×|configs| (map-side combinable); the probe is an equi-join on
    (config, position).  The 1-row member-count attach (the modulus)
    is a deliberate scalar crossJoin — BNLJ-allowlist at activation.
    ``mem=``/``probes=`` override the member/probe key frames (one
    ``k`` column each; weak-scaling probe kwargs —
    tools/scale_probes/bloomfpr_scale.py, which measures the claim
    that FPR at fixed bits-per-key is SCALE-FREE; the driver contract
    never passes them)."""
    from tropology_spark.session import iter_materialize

    # mem feeds the count AND the hash pass; the 1-row count feeds the
    # bit table, the probe positions, and the final attach — both are
    # multi-referenced, so both checkpoint (the double-reference rule).
    if mem is None:
        mem = (
            load(spark, sf_dir, "orders")
            .select(F.col("o_custkey").alias("k"))
            .distinct()
        )
    mem = iter_materialize(mem)
    nm = iter_materialize(
        mem.agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    )

    def hashes(df):
        md5s = F.md5(F.col("k").cast("string"))
        return df.select(
            "k",
            F.conv(F.substring(md5s, 1, 8), 16, 10).cast("bigint").alias("h1"),
            F.conv(F.substring(md5s, 9, 8), 16, 10).cast("bigint").alias("h2"),
        )

    cfg_arr = F.array(*[F.lit(b).cast("bigint") for b in _BLOOM_BPKS])
    j_arr = F.array(F.lit(0).cast("bigint"), F.lit(1).cast("bigint"))
    mh = hashes(mem).crossJoin(F.broadcast(nm))
    bits = (
        mh.select(
            "h1",
            "h2",
            "n_members",
            F.explode(cfg_arr).alias("bpk"),
        )
        .select(
            "bpk",
            "h1",
            "h2",
            "n_members",
            F.explode(j_arr).alias("j"),
        )
        .select(
            "bpk",
            F.expr("(h1 + j * h2) % (bpk * n_members)").alias("pos"),
        )
        .distinct()
    )
    if probes is None:
        probes = load(spark, sf_dir, "customer").select(
            (F.col("c_custkey") + 1000000000).alias("k")
        )
    nonm = hashes(probes)
    tot = nonm.agg(F.count(F.lit(1)).cast("bigint").alias("n_nonmembers"))
    pp = (
        nonm.crossJoin(F.broadcast(nm))
        .select("k", "h1", "h2", "n_members", F.explode(cfg_arr).alias("bpk"))
        .select("k", "bpk", "h1", "h2", "n_members", F.explode(j_arr).alias("j"))
        .select("bpk", "k", F.expr("(h1 + j * h2) % (bpk * n_members)").alias("pos"))
    )
    hit = pp.join(bits, ["bpk", "pos"]).groupBy("bpk", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit")
    )
    fp = (
        hit.filter(F.col("n_hit") == 2)
        .groupBy("bpk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_fp"))
    )
    cfg = spark.createDataFrame(
        [(b,) for b in _BLOOM_BPKS], "bits_per_key long"
    )
    return (
        cfg.join(fp, cfg.bits_per_key == fp.bpk, "left")
        .crossJoin(F.broadcast(nm))
        .crossJoin(F.broadcast(tot))
        .select(
            "bits_per_key",
            "n_members",
            "n_nonmembers",
            F.coalesce(F.col("n_fp"), F.lit(0)).cast("bigint").alias("n_fp"),
            F.expr(
                "CAST((1000000 * coalesce(n_fp, 0L)) div n_nonmembers AS BIGINT)"
            ).alias("fpr_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# agg_hll_m_curve — HLL error vs register count (the sketch sizing axis)
# ---------------------------------------------------------------------------

#: (m, alpha_milli, b8_divisor): bucket = first-byte div (256/m), so
#: every register count reads the SAME md5 pass; alpha constants from
#: Flajolet et al. (0.673 / 0.709 / 0.7213/(1+1.079/256) ~ 0.718).
_HLL_MS = ((16, 673, 16), (64, 709, 4), (256, 718, 1))


def _hll_curve_oracle() -> str:
    cfg_rows = ", ".join(f"({m}, {a}, {dv})" for m, a, dv in _HLL_MS)
    return f"""
    WITH h AS (
      SELECT ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 2))::BIGINT
               AS b8,
             ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 3, 8))::BIGINT
               AS w
      FROM orders),
    cfg AS (SELECT CAST(m AS BIGINT) AS m, CAST(am AS BIGINT) AS am,
                   CAST(dv AS BIGINT) AS dv
            FROM (VALUES {cfg_rows}) t(m, am, dv)),
    regs AS (
      SELECT cfg.m, h.b8 // cfg.dv AS bucket,
             max(CASE WHEN h.w = 0 THEN 33 ELSE 33 - length(bin(h.w)) END)
               AS mj
      FROM h CROSS JOIN cfg GROUP BY cfg.m, h.b8 // cfg.dv),
    spine AS (SELECT cfg.m, cfg.am, s.b AS bucket
              FROM cfg, unnest(generate_series(0, cfg.m - 1)) AS s(b)),
    full_regs AS (
      SELECT spine.m, spine.am, spine.bucket, coalesce(regs.mj, 0) AS m0
      FROM spine LEFT JOIN regs
        ON spine.m = regs.m AND spine.bucket = regs.bucket),
    agg AS (
      SELECT m, am,
             CAST(sum(1::BIGINT << (33 - m0)) AS BIGINT) AS s_carrier,
             CAST(sum(CASE WHEN m0 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_empty
      FROM full_regs GROUP BY m, am),
    ex AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
           FROM orders)
    SELECT agg.m, ex.n_exact, agg.v_empty, agg.s_carrier,
           CAST((agg.am * agg.m * agg.m * (1::BIGINT << 33))
                // (1000 * agg.s_carrier) AS BIGINT) AS hll_est,
           CAST(CASE WHEN ex.n_exact = 0 THEN NULL
                     ELSE (1000000 * ((agg.am * agg.m * agg.m
                                       * (1::BIGINT << 33))
                                      // (1000 * agg.s_carrier)))
                          // ex.n_exact END AS BIGINT) AS ratio_ppm
    FROM agg CROSS JOIN ex
    """


@register("agg_hll_m_curve", oracle=_hll_curve_oracle())
def agg_hll_m_curve(
    spark: SparkSession, sf_dir: str, o: DataFrame | None = None
) -> DataFrame:
    """M309 — HLL accuracy vs REGISTER COUNT m ∈ {16, 64, 256} — the
    sketch sizing axis the fixed-m M267 audit cannot show (HLL's
    standard error is ~1.04/√m, so 16→256 registers buys a 4× error
    cut for a 16× memory cost; this curve measures the actual trade on
    the data).  Completes the sketch-tuning-curve family: CMS width
    (M295), bloom bits-per-key (M302), LSH bands (M264), IVF probes
    (M263) — every approximate structure in the engine now ships
    with its sizing curve.

    ONE md5 pass serves every m: bucket = first-byte div (256/m)
    (power-of-two register counts nest on the same 8 bucket bits —
    the curve-over-prefix discipline applied to a sketch), rho = 33 −
    bit_length of the NEXT 32 bits (disjoint from the bucket bits,
    unlike M267's m=16 layout — documented difference), registers
    max-merge per (m, bucket), empty registers zero-filled from the
    per-m spine.  The estimate keeps the M267 dyadic-rational carrier
    exactly: est = (α_milli·m²·2³³) div (1000·S) with
    S = Σ 2^(33−M_j) — max value 718·256²·2³³ ≈ 4·10¹⁷ < 2⁶³.

    Scale: the register table is ≤ 336 rows total; the map-side
    register max-merge is the whole point of HLL at 100 TB.  The
    1-row exact attach is a deliberate scalar crossJoin
    (BNLJ-allowlisted); the config axis EXPLODES the hash rows (never
    a join).  ``o=`` overrides the orders frame (branch-coverage
    injection: a single-key corpus reaches the empty-register
    m0 = 0 / v_empty spine branch deterministically at every m — the
    driver contract never passes it).  ratio_ppm NULL-guards
    n_exact = 0 in BOTH engines (ADVICE r15 — reachable only through
    an empty/all-NULL-key ``o=`` injection; the fixture always has
    customers)."""
    if o is None:
        o = load(spark, sf_dir, "orders")
    md = F.md5(F.col("o_custkey").cast("string"))
    h = o.select(
        F.conv(F.substring(md, 1, 2), 16, 10).cast("bigint").alias("b8"),
        F.conv(F.substring(md, 3, 8), 16, 10).cast("bigint").alias("w"),
    )
    cfg_arr = F.array(
        *[
            F.struct(
                F.lit(m).cast("bigint").alias("m"),
                F.lit(a).cast("bigint").alias("am"),
                F.lit(dv).cast("bigint").alias("dv"),
            )
            for m, a, dv in _HLL_MS
        ]
    )
    hx = h.select("b8", "w", F.explode(cfg_arr).alias("c")).select(
        "b8", "w", "c.m", "c.am", "c.dv"
    )
    regs = hx.groupBy("m", F.expr("b8 div dv").alias("bucket")).agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(33)).otherwise(
                F.lit(33) - F.length(F.bin("w"))
            )
        ).alias("mj")
    )
    cfg = spark.createDataFrame(
        [(m, a) for m, a, _ in _HLL_MS], "m long, am long"
    )
    spine = cfg.select(
        "m",
        "am",
        F.explode(F.expr("sequence(0L, m - 1)")).alias("bucket"),
    )
    full = spine.join(regs, ["m", "bucket"], "left").withColumn(
        "m0", F.coalesce(F.col("mj"), F.lit(0))
    )
    agg = full.groupBy("m", "am").agg(
        F.sum(F.expr("shiftleft(1L, CAST(33 - m0 AS INT))"))
        .cast("bigint")
        .alias("s_carrier"),
        F.sum(F.when(F.col("m0") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("v_empty"),
    )
    ex = o.agg(F.countDistinct("o_custkey").cast("bigint").alias("n_exact"))
    return (
        agg.crossJoin(F.broadcast(ex))
        .withColumn(
            "hll_est",
            F.expr(
                "CAST((am * m * m * shiftleft(1L, 33))"
                " div (1000 * s_carrier) AS BIGINT)"
            ),
        )
        .select(
            "m",
            "n_exact",
            "v_empty",
            "s_carrier",
            "hll_est",
            F.expr(
                "CAST(CASE WHEN n_exact = 0 THEN NULL"
                " ELSE (1000000 * hll_est) div n_exact END AS BIGINT)"
            ).alias("ratio_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# agg_join_size_ams — AGMS join-cardinality estimate vs exact join size
# ---------------------------------------------------------------------------

_JSZ_QTY = 25  # the filtered side: lineitem rows with l_quantity > 25


def _join_size_oracle() -> str:
    sa = ", ".join(
        f"CAST(sum({sql}) AS BIGINT) AS sa{j}"
        for j, sql in enumerate(_AMS_SIGN_SQL)
    )
    sb = ", ".join(
        f"CAST(sum(CASE WHEN fb = 1 THEN {sql} ELSE 0 END) AS BIGINT) AS sb{j}"
        for j, sql in enumerate(_AMS_SIGN_SQL)
    )
    u = " UNION ALL ".join(
        f"SELECT CAST({j} AS BIGINT) AS sketch_id, sa{j} AS sa, sb{j} AS sb"
        f" FROM s"
        for j in range(8)
    )
    return f"""
    WITH h AS (
      SELECT ('0x' || substring(md5(CAST(l_partkey AS STRING)), 1, 8))::BIGINT
               AS h,
             CASE WHEN l_quantity > {_JSZ_QTY} THEN 1 ELSE 0 END AS fb
      FROM lineitem
    ),
    s AS (SELECT {sa}, {sb} FROM h),
    u AS ({u}),
    ex AS (
      SELECT CAST(sum(a.ca * b.cb) AS BIGINT) AS j_exact
      FROM (SELECT l_partkey, CAST(count(*) AS BIGINT) AS ca
            FROM lineitem GROUP BY l_partkey) a
      JOIN (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cb
            FROM lineitem WHERE l_quantity > {_JSZ_QTY}
            GROUP BY l_partkey) b
        ON a.l_partkey = b.l_partkey
    )
    SELECT u.sketch_id, u.sa, u.sb,
           CAST(u.sa * u.sb AS BIGINT) AS est,
           ex.j_exact,
           CAST(u.sa * u.sb - ex.j_exact AS BIGINT) AS diff
    FROM u CROSS JOIN ex
    """


@register("agg_join_size_ams", oracle=_join_size_oracle())
def agg_join_size_ams(
    spark: SparkSession, sf_dir: str, li: DataFrame | None = None
) -> DataFrame:
    """M317 — AGMS JOIN-CARDINALITY estimation audit — the Alon-
    Gibbons-Matias-Szegedy result that the dot product of two
    independent ±1-sign sketches is an unbiased estimator of the join
    size Σ_k a_k·b_k: here side A = the full lineitem part-key stream
    and side B = the ``l_quantity > {q}`` slice, so the estimate
    answers the cardinality question a cost-based optimizer asks
    before picking a join strategy ("how many rows survive this
    filtered join?") — the r12 agg_ams_f2 is exactly the SELF-join
    special case of this sketch.  Eight independent estimates est_j =
    SA_j·SB_j ship next to the exact join size and the SIGNED error
    diff = est − exact (no division anywhere — signed integer
    division is the div//floor trap, so the consumer takes the
    median-of-8 and normalizes; the twin pins the exact values).

    Sign hashes reuse the aggregates.py _AMS_SIGN_SQL single home
    (same md5-low-32 base hash, same multiplier family — the two
    sketches for A and B use the SAME hash per sketch id, which is
    what makes E[SA·SB] = Σ a_k·b_k).  Scale: BOTH sketch vectors
    come from ONE lineitem scan (SB_j is the fb-masked partial of the
    same pass) — 16 map-side-combinable partial sums per partition;
    the exact branch (two groupBys + an equi-join) exists only
    because this is the audit.  The 1-row exact attach is a
    deliberate scalar crossJoin (BNLJ-allowlisted).  When the
    filtered side is EMPTY the exact join collapses to an empty
    aggregate and j_exact/diff are NULL — absence of evidence,
    loudly (the pipeline_sample_bias_audit convention; pinned by an
    ``li=`` injection).  ``li=`` overrides the lineitem frame —
    (l_partkey, l_quantity) (probe/property kwarg; the driver
    contract never passes it)."""
    if li is None:
        li = load(spark, sf_dir, "lineitem")
    rows = li.select(
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
        F.when(F.col("l_quantity") > _JSZ_QTY, 1).otherwise(0).alias("fb"),
        "l_partkey",
    )
    s = rows.agg(
        *(
            [
                F.sum(F.expr(sql)).cast("bigint").alias(f"sa{j}")
                for j, sql in enumerate(_AMS_SIGN_SQL)
            ]
            + [
                F.sum(
                    F.when(F.col("fb") == 1, F.expr(sql)).otherwise(0)
                )
                .cast("bigint")
                .alias(f"sb{j}")
                for j, sql in enumerate(_AMS_SIGN_SQL)
            ]
        )
    )
    stack_args = ", ".join(f"{j}L, sa{j}, sb{j}" for j in range(8))
    u = s.select(
        F.expr(f"stack(8, {stack_args}) AS (sketch_id, sa, sb)")
    )
    a = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("ca")
    )
    b = (
        li.filter(F.col("l_quantity") > _JSZ_QTY)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
    )
    ex = (
        a.join(b, "l_partkey")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("j_exact"))
    )
    return u.crossJoin(F.broadcast(ex)).select(
        F.col("sketch_id").cast("bigint").alias("sketch_id"),
        "sa",
        "sb",
        (F.col("sa") * F.col("sb")).cast("bigint").alias("est"),
        "j_exact",
        (F.col("sa") * F.col("sb") - F.col("j_exact"))
        .cast("bigint")
        .alias("diff"),
    )


agg_join_size_ams.__doc__ = agg_join_size_ams.__doc__.format(q=_JSZ_QTY)


# ---------------------------------------------------------------------------
# agg_higher_moments_terms (M327) — exact power sums + central carriers
# ---------------------------------------------------------------------------

_HM_BIG = 10**13  # shift for the signed m3 division, sized from the
# domain bound |sum (x-mu)^3| <= n*50^3 (quantity <= 50): covers n to
# ~10^7 group rows (the r17 Lehr lesson -- domain bound, not habit).
# Bound re-derived + adversarially floor-pinned in tests/
# test_units.py::test_registered_shift_constants_sized_from_domain_bounds.


@register(
    "agg_higher_moments_terms",
    oracle=f"""
    WITH q AS (
      SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS x
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2,
             CAST(sum(x * x * x) AS BIGINT) AS s3,
             CAST(sum(x * x * x * x) AS BIGINT) AS s4
      FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, s1, s2, s3, s4,
           CAST((CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1) // n
                AS BIGINT) AS m2c,
           CAST((CAST(n AS HUGEINT) * n * s3
                 - 3 * CAST(n AS HUGEINT) * s1 * s2
                 + 2 * CAST(s1 AS HUGEINT) * s1 * s1
                 + CAST({_HM_BIG} AS HUGEINT) * (CAST(n AS HUGEINT) * n))
                // (CAST(n AS HUGEINT) * n) - {_HM_BIG} AS BIGINT) AS m3c,
           CAST((CAST(n AS HUGEINT) * n * n * s4
                 - 4 * CAST(n AS HUGEINT) * n * s1 * s3
                 + 6 * CAST(n AS HUGEINT) * s1 * s1 * s2
                 - 3 * CAST(s1 AS HUGEINT) * s1 * s1 * s1)
                // (CAST(n AS HUGEINT) * n * n) AS BIGINT) AS m4c
    FROM s
    """,
)
def agg_higher_moments_terms(
    spark: SparkSession, sf_dir: str, li: DataFrame | None = None
) -> DataFrame:
    """M327 — HIGHER-MOMENT terms of line quantity per return flag:
    the exact power sums n, Σx, Σx², Σx³, Σx⁴ (quantity is an integral
    1..50 domain — the safe axis for fourth powers) plus the assembled
    CENTRAL-moment carriers as single integral divisions: m2c =
    (nΣx² − (Σx)²) div n ≡ ⌊Σ(x−μ)²⌋, m3c = (n²Σx³ − 3nΣxΣx² +
    2(Σx)³) div n² ≡ ⌊Σ(x−μ)³⌋ (SIGNED numerator → the +BIG·den shift
    identity), m4c likewise at n³ (provably non-negative, plain
    floor).  Skewness and kurtosis — the distribution-SHAPE monitors
    a data-quality pipeline tracks beyond M15's mean/variance — are
    client-side ratios of these exact integers (*_terms discipline:
    the fractional powers stay outside the hash gate).

    Intermediates ride HUGEINT/DECIMAL(38,0) (M192 rule); the
    documented headroom bound is (Σx)⁴ < 10³⁸ — holds through a 100×
    corpus replication of sf0.1 (Σx ≈ 7.5e9 → 3.2e39 exceeds it at
    ~100×; group-level sums in this fixture are 1000× below the
    ceiling).  Scale: ONE map-side-combinable aggregate — power sums
    are the canonical mergeable statistic (M187's audit shape).

    ``li=`` substitutes the lineitem frame for probes (the
    adversarial negative-skew m3c floor pin); the driver contract
    never passes it."""
    if li is None:
        li = load(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity")).cast("bigint").alias("x"),
    )
    s = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).cast("bigint").alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x"))
        .cast("bigint")
        .alias("s4"),
    )
    return s.select(
        "l_returnflag", "n", "s1", "s2", "s3", "s4",
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)"
            " div n AS BIGINT)"
        ).alias("m2c"),
        F.expr(
            f"CAST((CAST(n AS DECIMAL(38,0)) * n * s3"
            f" - 3 * CAST(n AS DECIMAL(38,0)) * s1 * s2"
            f" + 2 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1"
            f" + CAST({_HM_BIG} AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n))"
            f" div (CAST(n AS DECIMAL(38,0)) * n) - {_HM_BIG} AS BIGINT)"
        ).alias("m3c"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * n * n * s4"
            " - 4 * CAST(n AS DECIMAL(38,0)) * n * s1 * s3"
            " + 6 * CAST(n AS DECIMAL(38,0)) * s1 * s1 * s2"
            " - 3 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1 * s1)"
            " div (CAST(n AS DECIMAL(38,0)) * n * n) AS BIGINT)"
        ).alias("m4c"),
    )


# ---------------------------------------------------------------------------
# agg_distinct_sample_curve — distinct-count extrapolation bias vs sample rate
# ---------------------------------------------------------------------------

_DSC_MODS = (1, 4, 16)


@register(
    "agg_distinct_sample_curve",
    oracle=f"""
    WITH h AS (
      SELECT o_custkey AS k,
             ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
               AS hk
      FROM orders
    ),
    per AS (
      SELECT s.s,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT k) AS BIGINT) AS d_sample
      FROM h JOIN (SELECT unnest([{", ".join(str(s) for s in _DSC_MODS)}]) AS s) s
        ON h.hk % s.s = 0
      GROUP BY s.s
    ),
    t AS (
      SELECT CAST(s AS BIGINT) AS s, n_rows, d_sample,
             CAST(s * d_sample AS BIGINT) AS est_naive,
             CAST(max(CASE WHEN s = 1 THEN d_sample END) OVER () AS BIGINT)
               AS d_true
      FROM per
    )
    SELECT s, n_rows, d_sample, est_naive, d_true,
           CAST(est_naive - d_true AS BIGINT) AS err,
           CASE WHEN d_true = 0 THEN NULL
                ELSE CAST((1000000 * d_sample) // d_true AS BIGINT)
           END AS seen_ppm
    FROM t
    """,
)
def agg_distinct_sample_curve(
    spark: SparkSession, sf_dir: str, orders: DataFrame | None = None
) -> DataFrame:
    """M328 — the DISTINCT-COUNT EXTRAPOLATION bias curve: sample
    order ROWS by the deterministic md5 key at moduli s ∈ 1/4/16
    (power-of-two moduli NEST — the s=16 sample is a subset of the
    s=4 sample, twin-pinned), count distinct customers in each
    sample, and report the naive scale-up estimate s·d against the
    full truth — the species-estimation bias (distinct counts do NOT
    extrapolate linearly: popular customers survive any sample, rare
    ones vanish) that separates row-samplable aggregates from
    cardinality questions.  The practical planner rule this audit
    grounds: never estimate distinct counts from a row sample — use a
    KMV/HLL sketch over the FULL scan (M138/M267), which costs the
    same one pass this curve does.

    Exact: counts, signed err = s·d − d_true (NO division — the
    div//floor trap), coverage seen_ppm.  The truth is the s=1 point
    (pmod-constant window attach on the 3-row axis, no scalar cross).
    Scale: one scan; the ×3 modulus axis rides an explode on the rows;
    count(DISTINCT) shuffles (s, custkey) projections — map-side
    partial, bounded by 3 × |customers|.

    ``orders=`` substitutes the order frame for probes; the driver
    contract never passes it."""
    o = orders if orders is not None else load(spark, sf_dir, "orders")
    h = o.select(
        F.col("o_custkey").alias("k"),
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("hk"),
    )
    per = (
        h.select(
            "k",
            "hk",
            F.explode(F.array(*[F.lit(s) for s in _DSC_MODS])).alias("s"),
        )
        .filter(F.col("hk") % F.col("s") == 0)
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("k").cast("bigint").alias("d_sample"),
        )
    )
    w = Window.partitionBy(F.pmod(F.col("s"), F.lit(1)))
    t = per.select(
        F.col("s").cast("bigint").alias("s"),
        "n_rows",
        "d_sample",
        (F.col("s") * F.col("d_sample")).cast("bigint").alias("est_naive"),
        F.max(F.when(F.col("s") == 1, F.col("d_sample")))
        .over(w)
        .cast("bigint")
        .alias("d_true"),
    )
    return t.select(
        "s",
        "n_rows",
        "d_sample",
        "est_naive",
        "d_true",
        (F.col("est_naive") - F.col("d_true")).cast("bigint").alias("err"),
        # ADVICE r17: an injected orders= with rows but all-NULL
        # o_custkey gives d_true = 0 (countDistinct of NULLs) — NULL
        # the coverage ratio in BOTH engines instead of an ANSI error
        # (the shard-balance/benford precedent); unreachable on the
        # fixture, injection-pinned in tests/test_r18_twins.py.
        F.expr(
            "CASE WHEN d_true = 0 THEN NULL"
            " ELSE CAST((1000000 * d_sample) div d_true AS BIGINT) END"
        ).alias("seen_ppm"),
    )


# ---------------------------------------------------------------------------
# agg_misra_gries_audit — mergeable heavy-hitter summaries vs exact top-k
# ---------------------------------------------------------------------------

_MG_K = 8
_MG_SHARDS = 4


@register(
    "agg_misra_gries_audit",
    oracle=f"""
    WITH bg AS (
      SELECT doc_id % {_MG_SHARDS} AS shard, l[i] || ' ' || l[i + 1] AS bigram
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 1
    ),
    sc AS (SELECT shard, bigram, CAST(count(*) AS BIGINT) AS c
           FROM bg GROUP BY 1, 2),
    sr AS (
      SELECT shard, bigram, c,
             row_number() OVER (PARTITION BY shard
                                ORDER BY c DESC, bigram) AS rn17s
      FROM sc
    ),
    st AS (
      SELECT *, coalesce(max(CASE WHEN rn17s = {_MG_K + 1} THEN c END)
                           OVER (PARTITION BY shard), 0) AS t_s
      FROM sr
    ),
    summ AS (
      SELECT bigram, c - t_s AS w FROM st
      WHERE rn17s <= {_MG_K} AND c - t_s > 0
    ),
    mrg AS (SELECT bigram, CAST(sum(w) AS BIGINT) AS ws
            FROM summ GROUP BY bigram),
    mr AS (
      SELECT bigram, ws,
             row_number() OVER (ORDER BY ws DESC, bigram) AS rn17m
      FROM mrg
    ),
    mt AS (
      SELECT *, coalesce(max(CASE WHEN rn17m = {_MG_K + 1} THEN ws END)
                           OVER (), 0) AS t_m
      FROM mr
    ),
    fin AS (
      SELECT bigram, CAST(ws - t_m AS BIGINT) AS est FROM mt
      WHERE rn17m <= {_MG_K} AND ws - t_m > 0
    ),
    gc AS (SELECT bigram, CAST(sum(c) AS BIGINT) AS exact FROM sc
           GROUP BY bigram)
    SELECT fin.bigram, fin.est, gc.exact,
           CAST(gc.exact - fin.est AS BIGINT) AS under
    FROM fin JOIN gc ON fin.bigram = gc.bigram
    """,
)
def agg_misra_gries_audit(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """M333 — the MISRA-GRIES mergeable heavy-hitter audit, completing
    the mergeable-sketch family (KMV M138, HLL M267, CMS M128, AMS
    M271, Bloom M174 all have audits; the deterministic counter-based
    top-k summary did not): per shard (doc_id mod 4) the k=8 counter
    summary of document BIGRAM counts in the order-free offset form —
    counts of the top-8 minus the (k+1)-th largest, the Agarwal-et-al
    mergeable formulation — then the summaries MERGE (sum weights,
    prune again by the same rule) and the merged estimates meet the
    exact global counts: est ≤ exact always (the summary only ever
    subtracts), and exact − est is bounded by the sum of the pruning
    thresholds — the theory bound the twin pins.  At 100 TB this is
    THE map-side top-k: each executor keeps k counters, the driver
    merges s·k rows, the error budget is known in advance.

    Oracle enumerates bigram positions with the standard 4096 cap
    (the chunking precedent).  Scale: the corpus collapses to the
    (shard, bigram) count table ONCE (materialized — it feeds the
    per-shard summaries AND the exact rollup: DOUBLE-REFERENCE RULE);
    per-shard windows ride the real shard key; the merged re-rank is
    a ≤ shards·k row frame on the pmod-constant window.

    ``docs=`` substitutes the document frame for probes (an injected
    corpus with ≤ k distinct bigrams per shard drives every pruning
    threshold to 0 and pins the zero-error spine under ≡ 0 — the
    seventh-fold branch pin); the driver contract never passes it."""
    from tropology_spark.session import iter_materialize

    d = docs if docs is not None else load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    bg = d.select(
        (F.col("doc_id") % _MG_SHARDS).alias("shard"),
        F.explode(bigrams).alias("bigram"),
    )
    # (shard, bigram) counts feed the summaries AND the exact rollup.
    sc = iter_materialize(
        bg.groupBy("shard", "bigram").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
    )
    ws_shard = Window.partitionBy("shard")
    sr = sc.withColumn(
        "rn17s",
        F.row_number().over(
            ws_shard.orderBy(F.col("c").desc(), F.col("bigram"))
        ),
    ).withColumn(
        "t_s",
        F.coalesce(
            F.max(F.when(F.col("rn17s") == _MG_K + 1, F.col("c"))).over(
                ws_shard
            ),
            F.lit(0),
        ),
    )
    summ = sr.filter(
        (F.col("rn17s") <= _MG_K) & (F.col("c") - F.col("t_s") > 0)
    ).select("bigram", (F.col("c") - F.col("t_s")).alias("w"))
    mrg = summ.groupBy("bigram").agg(F.sum("w").cast("bigint").alias("ws"))
    wm = Window.partitionBy(F.pmod(F.col("ws"), F.lit(1)))
    mr = mrg.withColumn(
        "rn17m",
        F.row_number().over(wm.orderBy(F.col("ws").desc(), F.col("bigram"))),
    ).withColumn(
        "t_m",
        F.coalesce(
            F.max(F.when(F.col("rn17m") == _MG_K + 1, F.col("ws"))).over(wm),
            F.lit(0),
        ),
    )
    fin = mr.filter(
        (F.col("rn17m") <= _MG_K) & (F.col("ws") - F.col("t_m") > 0)
    ).select("bigram", (F.col("ws") - F.col("t_m")).cast("bigint").alias("est"))
    gc = sc.groupBy("bigram").agg(F.sum("c").cast("bigint").alias("exact"))
    return fin.join(gc, "bigram").select(
        "bigram",
        "est",
        "exact",
        (F.col("exact") - F.col("est")).cast("bigint").alias("under"),
    )


# ---------------------------------------------------------------------------
# M351 agg_log2_value_histogram — HDR-style power-of-two value histogram
# ---------------------------------------------------------------------------


@register(
    "agg_log2_value_histogram",
    oracle="""
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(length(bin(cents)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM c GROUP BY 1
    """,
)
def agg_log2_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.M M351 — the POWER-OF-TWO (HDR-style) histogram of
    order values: bucket = bit_length of the cents amount (the M267
    length(bin(x)) idiom — both engines agree bit-for-bit on positive
    BIGINTs), with count, min, max and sum per bucket — the log-scale
    value summary every monitoring stack ships because a linear
    histogram can't hold nine orders of magnitude (latencies, bytes,
    revenues) in bounded rows.  ~2× relative error per bucket by
    construction, ≤ 63 rows ever.

    Scale: ONE map-side-combinable rollup; the bucket function is a
    pure JVM expression.  This is the cheap first look before the
    exact counting quantiles (M196 idiom) are run on a chosen
    sub-range."""
    o = load(spark, sf_dir, "orders")
    c = o.select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    return c.groupBy(
        F.length(F.bin(F.col("cents"))).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("cents").cast("bigint").alias("min_cents"),
        F.max("cents").cast("bigint").alias("max_cents"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )
