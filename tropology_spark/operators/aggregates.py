"""Advanced aggregations (SURVEY.md §2 D5-D8).

ROLLUP/CUBE/GROUPING SETS have no direct tropology analog (PostgreSQL
did the planning there); they complete the aggregation surface.  The
collect-list query IS a reference shape: the per-node neighbor list
assembled for the sigma.js network payload (``api.clj`` —
reconstructed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
