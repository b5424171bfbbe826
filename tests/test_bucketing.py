"""Bucketing evidence for the SCALE.md claims: a self-join over a
table bucketed on the join key must plan WITHOUT exchanging (shuffling)
either side — the layout decision that makes the graph layer's
degree/neighbor/common-neighbor joins shuffle-free at 100 TB."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_UNIT


@pytest.fixture(scope="module")
def bucketed_edges(spark, tmp_path_factory):
    from tropology_spark.sources.tables import edges

    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    # warehouse.dir is a static conf; an explicit table path works on
    # any session.
    e = edges(spark, SF_UNIT)
    (
        e.write.bucketBy(8, "dst")
        .sortBy("dst")
        .mode("overwrite")
        .option("path", f"{warehouse}/edges_by_dst")
        .saveAsTable("edges_by_dst")
    )
    yield "edges_by_dst"
    spark.sql("DROP TABLE IF EXISTS edges_by_dst")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_self_join_has_no_shuffle(spark, bucketed_edges):
    # At fixture size the planner would rather broadcast (also
    # shuffle-free but not the point); disable it to exercise the
    # cluster-scale path where neither side fits in memory.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e = spark.table(bucketed_edges)
        a, b = e.alias("a"), e.alias("b")
        joined = a.join(
            b, (F.col("a.dst") == F.col("b.dst")) & (F.col("a.src") < F.col("b.src"))
        ).select(F.col("a.src"), F.col("b.src").alias("src_b"))
        plan = plan_of(joined)
        # Co-located bucket join: sort-merge with NO Exchange on either side.
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_avoids_shuffle(spark, bucketed_edges):
    e = spark.table(bucketed_edges)
    agg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    plan = plan_of(agg)
    assert "Exchange" not in plan, plan
    total = agg.agg(F.sum("deg")).collect()[0][0]
    from tropology_spark.sources.tables import edges

    assert total == edges(spark, SF_UNIT).count()
