"""Plan-shape tests (SURVEY.md §5.2 item 5, §4.2): the physical plans
Catalyst picks must stay the plans we designed for — pushdown reaching
the parquet scan, broadcasts on the small dims, TakeOrderedAndProject
for top-k, partial aggregation before the shuffle.  Guards against
silent performance regressions."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from tests.conftest import SF_UNIT
from tropology_spark import QUERIES


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_scan_projection_prunes_columns(spark):
    plan = plan_of(QUERIES["scan_project"](spark, SF_UNIT))
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_partkey" in read_schema
    assert "l_shipdate" not in read_schema and "l_quantity" not in read_schema


def test_key_probe_pushes_filter_to_scan(spark):
    plan = plan_of(QUERIES["scan_pushdown_lookup"](spark, SF_UNIT))
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "p_partkey" in pushed and "EqualTo" in pushed


def test_flagship_uses_broadcast_joins(spark):
    plan = plan_of(QUERIES["flagship_revenue_by_region"](spark, SF_UNIT))
    assert plan.count("BroadcastHashJoin") >= 3


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = plan_of(QUERIES["topk_global"](spark, SF_UNIT))
    assert "TakeOrderedAndProject" in plan


def test_degree_agg_is_two_phase(spark):
    """D11 — partial (map-side) aggregation must appear below the
    shuffle and final above it."""
    plan = plan_of(QUERIES["agg_degree"](spark, SF_UNIT), "simple")
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_whole_stage_codegen_covers_flagship(spark):
    plan = plan_of(QUERIES["flagship_revenue_by_region"](spark, SF_UNIT), "codegen")
    assert "WholeStageCodegen" in plan and "Found" in plan


def test_ts_range_filter_pushdown(spark):
    plan = plan_of(QUERIES["filter_ts_range"](spark, SF_UNIT))
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "ts" in pushed


def test_iterative_vector_join_shuffle_path_plan(spark):
    """The non-broadcast iterative-graph path must (a) never broadcast
    the node vector and (b) reuse the persisted edge partitioning, so
    the only exchange Catalyst inserts (ENSURE_REQUIREMENTS) is on the
    O(nodes) vector side — the property that keeps per-iteration cost
    off the edge list at 100 TB node counts."""
    import pyspark.sql.functions as F

    from tropology_spark.operators.graph import _vector_join

    bi = spark.range(1000).select(
        (F.col("id") % 100).cast("string").alias("u"),
        ((F.col("id") + 7) % 100).cast("string").alias("v"),
    )
    bi_p = bi.repartition("u").persist()
    bi_p.count()
    vec = spark.range(100).select(
        F.col("id").cast("string").alias("node"), F.lit(1.0).alias("pr")
    )
    try:
        plan = plan_of(_vector_join(bi_p, vec, use_broadcast=False), "simple")
        assert "Broadcast" not in plan
        assert "ShuffledHashJoin" in plan
        # Exactly one requirement-driven exchange: the vector side.
        # (The REPARTITION_BY_COL exchange inside the cached relation is
        # the one-time setup shuffle, not per-iteration work.)
        assert plan.count("ENSURE_REQUIREMENTS") == 1
    finally:
        bi_p.unpersist()


def test_dynamic_partition_pruning(spark, tmp_path):
    """SURVEY.md §4.2 — dynamic partition pruning: joining a
    partitioned fact to a filtered dim must inject a runtime pruning
    subquery into the fact scan."""
    import pyspark.sql.functions as F

    from tropology_spark.sources.tables import load

    path = str(tmp_path / "orders_by_year")
    orders = load(spark, SF_UNIT, "orders").withColumn("order_year", F.year("o_orderdate"))
    orders.write.partitionBy("order_year").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(y, "pick" if y == 1997 else "skip") for y in range(1995, 2002)],
        "y int, tag string",
    ).filter("tag = 'pick'")  # DPP triggers only for a *filtered* dim side
    joined = fact.join(dim, fact.order_year == dim.y).select("o_orderkey", "tag")
    plan = plan_of(joined)
    assert "dynamicpruning" in plan.lower()


def test_contamination_broadcasts_eval_side(spark):
    """M25 — the benchmark (eval) side must be the broadcast build side;
    the corpus shingle stream must not shuffle for the join."""
    plan = plan_of(QUERIES["text_contamination"](spark, SF_UNIT))
    assert "BroadcastHashJoin" in plan


def test_link_prediction_broadcasts_degrees(spark):
    """M32 — degree enrichment must broadcast the O(nodes) side, never
    shuffle the O(pairs) table; pair blocking stays an equi join."""
    plan = plan_of(QUERIES["graph_link_prediction"](spark, SF_UNIT))
    assert plan.count("BroadcastHashJoin") >= 2


def test_lateral_topk_decorrelates_to_window(spark):
    """M37 — the LATERAL LIMIT-per-group subquery must decorrelate into
    a rank window (or equivalent join), never a per-row nested loop."""
    plan = plan_of(QUERIES["join_lateral_topk"](spark, SF_UNIT))
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_split_assign_partial_aggregates(spark):
    """M26 — the profiling groupBy must partial-aggregate map-side."""
    plan = plan_of(QUERIES["pipeline_split_assign"](spark, SF_UNIT), "simple")
    assert plan.count("HashAggregate") >= 2


def test_vocab_oov_broadcasts_vocab(spark):
    """M45 — the top-K vocab must ship as a broadcast build side; the
    corpus token stream must not shuffle for the membership join."""
    plan = plan_of(QUERIES["text_vocab_oov"](spark, SF_UNIT))
    assert "BroadcastHashJoin" in plan


def test_inverted_index_single_exchange(spark):
    """M42 — deriving df from the collected posting set must keep the
    whole query to ONE aggregation exchange (a countDistinct next to
    collect_set would plan a second expand+shuffle)."""
    plan = plan_of(QUERIES["text_inverted_index"](spark, SF_UNIT), "simple")
    assert plan.count("Exchange") == 1


def test_zorder_single_pass(spark):
    """M48 — the Morton-key build is projection-only: one scan, one
    partial+final aggregation, no join or window."""
    plan = plan_of(QUERIES["pipeline_zorder_layout"](spark, SF_UNIT), "simple")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_dq_report_orphan_checks_use_broadcast_anti_join(spark):
    """M50 — the referential-integrity lookups at fixture scale must be
    broadcast anti-joins (at fact scale they co-bucket instead; the pin
    guards the small-dim default)."""
    plan = plan_of(QUERIES["pipeline_dq_report"](spark, SF_UNIT))
    assert "BroadcastHashJoin LeftAnti" in plan


def test_weighted_sample_is_take_ordered(spark):
    """M63 — the weighted sample must be a per-partition-heap top-k,
    never a global sort."""
    plan = plan_of(QUERIES["pipeline_weighted_sample"](spark, SF_UNIT))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_enrichment_joins_broadcast_the_small_side(spark):
    """M66/M67/M68 — per-group bounds, the df table, and the medians
    are metadata-sized: they must broadcast so the fact scan never
    shuffles for the enrichment join."""
    for name in ("pipeline_minmax_scale", "text_rare_token_rate", "ts_anomaly_topk"):
        plan = plan_of(QUERIES[name](spark, SF_UNIT))
        assert "BroadcastHashJoin" in plan, name


def test_heavy_hitters_total_is_broadcast_scalar(spark):
    """M60 — the grand total joins the count table as a 1-row
    broadcast, not a shuffled cross."""
    plan = plan_of(QUERIES["agg_heavy_hitters"](spark, SF_UNIT))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """M71 (scale policy) — with a selective filter on the build side
    and broadcast disabled (the big-big join shape at 100 TB), Spark
    must inject a runtime bloom filter on the probe side: the fact
    scan is pre-filtered by `might_contain` before the shuffle, the
    row-level analog of dynamic partition pruning."""
    from pyspark.sql import functions as F
    from tropology_spark.sources.tables import load

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load(spark, SF_UNIT, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = load(spark, SF_UNIT, "lineitem")
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_window_family_rides_one_exchange(spark):
    """M57/M58/M62/M69/M72/M74/M76/M78 — every per-user/per-group
    window pipeline must plan exactly ONE hash exchange: lag, running
    sums, all taps/leads, both row_number directions and the final
    aggregate reuse the same partitioning."""
    for name in (
        "ts_sessionize", "ts_ewma", "ts_runs", "ts_ohlc_hourly",
        "ts_pattern_triples", "win_pareto_abc", "pipeline_scd2",
        "join_point_in_time",
    ):
        plan = plan_of(QUERIES[name](spark, SF_UNIT), "simple")
        assert plan.count("Exchange hashpartitioning") == 1, name


def test_bitmap_distinct_avoids_expand(spark):
    """M80 — the bitmap-partial distinct must NOT use the Expand-based
    distinct rewrite (which re-shuffles raw keys); its aggregate state
    is bitmap_construct_agg over (group, bucket)."""
    plan = plan_of(QUERIES["agg_bitmap_distinct"](spark, SF_UNIT))
    assert "Expand" not in plan
    assert "bitmap_construct_agg" in plan


def test_source_drift_broadcasts_enrichments(spark):
    """M77 — the vocab/source-total enrichment joins onto the
    (source, token) frame must be broadcasts."""
    plan = plan_of(QUERIES["text_source_drift"](spark, SF_UNIT))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row grand total


def test_rp_lsh_hyperplanes_broadcast(spark):
    """M73 — the 2k-row hyperplane table joins the corpus long form as
    a broadcast; the signature aggs combine map-side."""
    plan = plan_of(QUERIES["sim_rp_lsh_topk"](spark, SF_UNIT))
    assert "BroadcastHashJoin" in plan


def test_twohop_capped_anti_joins_hot_dsts_before_wedge(spark):
    """M119 — the celebrity split must be physical: the hot-dst list is
    removed from the wedge input via a broadcast anti join (the hot
    list is |E|/cap rows, no explicit hint so extreme-scale planning
    stays free), and the wedge self-join itself survives as the only
    SortMergeJoin-eligible big join."""
    from tropology_spark.operators.graph import TWOHOP_DEGREE_CAP, twohop_capped_frames
    from tropology_spark.sources.tables import edges

    result, _ = twohop_capped_frames(
        edges(spark, SF_UNIT), TWOHOP_DEGREE_CAP, materialize=False
    )
    plan = plan_of(result)
    assert "LeftAnti" in plan  # hot dsts excluded before the pair join
    assert "BroadcastHashJoin" in plan  # small hot side broadcast locally


def test_batch_topk_broadcasts_query_batch(spark):
    """M160 — the query batch must broadcast (corpus scans once, never
    re-shuffles for the batch fan-out)."""
    plan = plan_of(QUERIES["sim_batch_topk"](spark, SF_UNIT))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_maxsim_broadcasts_chunk_table(spark):
    """M143 — the 4-row query-chunk table must broadcast against the
    doc-chunk stream."""
    plan = plan_of(QUERIES["sim_maxsim_topk"](spark, SF_UNIT))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_related_tropes_wedge_materialized_once(spark):
    """M149 — after the store-half/mirror-lazy fix the final plan reads
    the checkpointed pair table from both union branches instead of
    re-deriving orders⋈lineitem per branch (54 exchanges before, 2
    after; allow headroom for AQE variation)."""
    from tropology_spark.sources.tables import clear_session_caches

    clear_session_caches()
    try:
        plan = plan_of(QUERIES["graph_related_tropes"](spark, SF_UNIT))
        assert plan.count("Exchange") <= 6, plan.count("Exchange")
        assert "Scan ExistingRDD" in plan  # the checkpointed half table
    finally:
        clear_session_caches()


def test_stickiness_single_events_reduction(spark):
    """M140 — both sliding DISTINCT widths must come from ONE distinct
    (day, user) reduction of the events scan (the day spine broadcasts
    onto it), not two scans."""
    plan = plan_of(QUERIES["analytics_stickiness_terms"](spark, SF_UNIT), "simple")
    assert plan.count("Scan parquet") <= 2  # events + (day-spine derivation)


def _partitionless_window_lines(df) -> list[str]:
    """Physical-plan Window nodes with NO partition spec.  A partitioned
    node prints three bracketed arg groups (`Window [exprs], [part],
    [order]` — two `], [` separators); a global one prints two groups
    (one separator) and is the single-task funnel we ban at scale."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        ln.strip()
        for ln in plan.splitlines()
        if "Window [" in ln and ln.count("], [") < 2
    ]


def test_global_order_rewrites_have_no_partitionless_window(spark):
    """Round-6 fix (VERDICT r5 item 1): the three corpus-proportional
    global orders now ride plans/global_order.py's two-pass
    range-partitioned prefix-sum — no `WindowExec: No Partition
    Defined` node may appear anywhere in their physical plans.  (The
    helper's internal offsets window partitions by lit(0) over a
    config-bounded <= num_partitions x groups table, so it prints a
    partition spec and passes this scan.)"""
    for name in (
        "pipeline_epoch_shuffle",
        "pipeline_interleave_sources",
        "analytics_rfm_segments",
    ):
        bad = _partitionless_window_lines(QUERIES[name](spark, SF_UNIT))
        assert not bad, f"{name} has global windows: {bad}"


def test_token_rank_score_broadcasts_vocab_rank_table(spark):
    """M164 gate fix (VERDICT r5 item 4): the broadcast decision now
    reads the VOCAB cardinality (the actual broadcast side), so at
    fixture scale the (token, rank) table must broadcast-join onto the
    token stream."""
    plan = plan_of(QUERIES["text_token_rank_score"](spark, SF_UNIT))
    assert "BroadcastHashJoin" in plan
