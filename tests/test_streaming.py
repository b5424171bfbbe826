"""Streaming equivalence tests (SURVEY.md §5.2 item 4, §2 K-rows).

Each windowed streaming job, run with availableNow over the same rows,
must equal its batch twin (exactly-once, deterministic).  Late-data
and dedup semantics are exercised with sequenced micro-batches.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_UNIT
from tropology_spark.sources.tables import load
from tropology_spark.streaming import jobs


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """sf0.001 events (ts already ns→µs converted) as a parquet dir a
    file stream can read."""
    path = str(tmp_path_factory.mktemp("events_stream") / "data")
    load(spark, SF_UNIT, "events").coalesce(1).write.parquet(path)
    return path


def run_stream_to_memory(spark, sdf, name, output_mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    return spark.table(name)


def assert_same_rows(a, b, cols):
    ra = sorted([tuple(r[c] for c in cols) for r in a.collect()])
    rb = sorted([tuple(r[c] for c in cols) for r in b.collect()])
    assert ra == rb


def _stream_events(spark, events_dir):
    schema = load(spark, SF_UNIT, "events").schema
    return spark.readStream.schema(schema).parquet(events_dir)


def test_tumbling_equals_batch(spark, events_dir):
    batch = jobs.stream_tumbling(spark.read.parquet(events_dir))
    stream = run_stream_to_memory(
        spark, jobs.stream_tumbling(_stream_events(spark, events_dir)),
        "t_tumbling", "complete",
    )
    assert_same_rows(batch, stream, ["window_start", "event_type", "n_events", "total_value"])


def test_sliding_equals_batch(spark, events_dir):
    batch = jobs.stream_sliding(spark.read.parquet(events_dir))
    stream = run_stream_to_memory(
        spark, jobs.stream_sliding(_stream_events(spark, events_dir)),
        "t_sliding", "complete",
    )
    assert_same_rows(batch, stream, ["window_start", "event_type", "n_events", "total_value"])


def test_session_windows_match_batch_twin(spark, events_dir):
    """Native session_window output must agree with the lag/cumsum batch
    twin on (user, session_start, n_events)."""
    stream = run_stream_to_memory(
        spark, jobs.stream_sessions(_stream_events(spark, events_dir)),
        "t_sessions", "complete",
    )
    from tropology_spark import QUERIES

    twin = QUERIES["stream_sessionize_30m"](spark, SF_UNIT).select(
        "user_id", "session_start", "n_events"
    )
    assert_same_rows(twin, stream.select("user_id", "session_start", "n_events"),
                     ["user_id", "session_start", "n_events"])


def test_streaming_dedup(spark, tmp_path):
    """K5 — duplicated input rows collapse to one per event_id."""
    path = str(tmp_path / "dup")
    ev = load(spark, SF_UNIT, "events").limit(200)
    ev.unionByName(ev).coalesce(1).write.parquet(path)
    sdf = spark.readStream.schema(ev.schema).parquet(path)
    out = run_stream_to_memory(spark, jobs.stream_dedup(sdf), "t_dedup", "append")
    assert out.count() == 200
    assert out.select("event_id").distinct().count() == 200


def test_running_count_update_mode(spark, events_dir):
    """K6 — stateful per-user counts equal the batch groupBy."""
    stream = run_stream_to_memory(
        spark, jobs.stream_running_count(_stream_events(spark, events_dir)),
        "t_runcount", "complete",
    )
    batch = spark.read.parquet(events_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    assert_same_rows(batch, stream, ["user_id", "n_events"])


def test_stream_static_join(spark, events_dir):
    """K7 — stream-static enrichment preserves every event exactly
    once."""
    customer = load(spark, SF_UNIT, "customer")
    out = run_stream_to_memory(
        spark,
        jobs.stream_static_join(_stream_events(spark, events_dir), customer),
        "t_enrich", "append",
    )
    n = spark.read.parquet(events_dir).count()
    assert out.count() == n
    assert out.filter(F.col("segment").isNull()).count() == 0


def test_watermark_drops_late_rows(spark, tmp_path):
    """K4 — a row older than the watermark is dropped; a fresh row is
    not.  Two sequenced micro-batches via maxFilesPerTrigger=1."""
    import datetime as dt

    src = str(tmp_path / "late_src")
    os.makedirs(src, exist_ok=True)
    schema = "ts timestamp, event_id long"

    def write_batch(rows, fname):
        df = spark.createDataFrame(rows, schema=schema)
        df.coalesce(1).write.mode("append").parquet(src)

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    # Batch 1: events up to 12:00 → watermark after batch1 = 11:50.
    write_batch([(t0, 1), (t0 - dt.timedelta(minutes=5), 2)], "b1")

    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    agg = (
        sdf.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("t_late")
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
        # Batch 2: one hopelessly late row (> 2h before watermark) and
        # one fresh row.
        write_batch(
            [(t0 - dt.timedelta(hours=3), 3), (t0 + dt.timedelta(minutes=1), 4)], "b2"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["ws"]: r["n"] for r in spark.table("t_late").collect()}
    late_window = t0.replace(hour=9)
    # The late row's window never appears; the fresh row reached the
    # noon window (events at 12:00 and 12:01); 11:55 sits in 11:00.
    assert late_window not in rows
    assert rows[t0.replace(minute=0)] == 2
    assert rows[t0.replace(hour=11, minute=0)] == 1


def test_foreachbatch_streaming_upsert(spark, tmp_path):
    """Streaming crawl-persist path: micro-batches land in the keyed
    upsert sink via foreachBatch; the final store holds exactly the
    newest row per key (the reference's continuous persist loop)."""
    from tropology_spark.sources.sinks import upsert_parquet

    src = str(tmp_path / "src")
    store = str(tmp_path / "pages")
    schema = "code string, title string, v long"

    spark.createDataFrame(
        [("a/x", "t1", 1), ("a/y", "t1", 1)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)

    def sink(batch_df, batch_id):
        upsert_parquet(spark, batch_df, store, key="code", version_col="v")

    q = sdf.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [("a/x", "t2", 2), ("a/z", "t1", 1)], schema
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r["code"]: r["title"] for r in spark.read.parquet(store).collect()}
    assert rows == {"a/x": "t2", "a/y": "t1", "a/z": "t1"}


def test_stateful_crawl_scheduler_accumulates_across_batches(spark, tmp_path):
    """K6+ — applyInPandasWithState: per-user state must FOLD across
    micro-batches (not reset), and the emitted schedule must follow the
    capped-backoff rule."""
    src = str(tmp_path / "sched_src")
    ev = load(spark, SF_UNIT, "events").orderBy("event_id")
    half = ev.count() // 2
    ev.limit(half).coalesce(1).write.mode("append").parquet(src)

    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        jobs.stream_stateful_crawl_scheduler(sdf)
        .writeStream.format("memory")
        .queryName("t_sched")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        ev.exceptAll(ev.limit(half)).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    # Last emitted row per user (max n_events — counts only grow) must
    # equal the batch-side totals.
    got = (
        spark.table("t_sched")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_sec").alias("last_sec"),
            F.max("next_update_sec").alias("next_update_sec"),
        )
    )
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.unix_timestamp("ts")).alias("last_sec"),
    )
    exp = {
        r["user_id"]: (
            r["n_events"],
            r["last_sec"],
            r["last_sec"] + min(3600 * r["n_events"], 86400),
        )
        for r in batch.collect()
    }
    act = {
        r["user_id"]: (r["n_events"], r["last_sec"], r["next_update_sec"])
        for r in got.collect()
    }
    assert act == exp
    # State genuinely spanned batches: some user must have rows from
    # both triggers with growing counts.
    per_user_rows = (
        spark.table("t_sched").groupBy("user_id").count().filter("count > 1").count()
    )
    assert per_user_rows > 0


def test_streaming_transactional_ingest(spark, tmp_path):
    """foreachBatch → txlog: each micro-batch commits atomically, the
    table gains one readable version per batch, and history is
    time-travelable — the transactional variant of the crawl persist
    loop."""
    from tropology_spark.sources.txlog import tx_read, tx_versions, tx_write

    src = str(tmp_path / "tx_src")
    table = str(tmp_path / "tx_table")
    schema = "code string, title string"

    spark.createDataFrame([("a/x", "t1")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)

    def sink(batch_df, batch_id):
        if batch_df.count() > 0:
            tx_write(spark, batch_df, table, mode="append")

    q = sdf.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame([("a/y", "t1")], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert tx_versions(table) == [0, 1]
    assert {r["code"] for r in tx_read(spark, table).collect()} == {"a/x", "a/y"}
    assert tx_read(spark, table, version=0).count() == 1


def _tws_runner_available() -> bool:
    """transformWithStateInPandas spawns a separate streaming Python
    runner that imports google.protobuf; if that import is broken in
    the env, the query crashes at init (not at plan time)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _tws_runner_available(),
    reason="transformWithState streaming runner needs google.protobuf",
)
def test_transform_with_state_matches_applyinpandas_twin(spark, tmp_path):
    """The transformWithStateInPandas scheduler must produce the same
    final per-user schedule as the applyInPandasWithState one over the
    same two micro-batches."""
    src = str(tmp_path / "tws_src")
    ev = load(spark, SF_UNIT, "events").orderBy("event_id").limit(400)
    ev.limit(200).coalesce(1).write.mode("append").parquet(src)

    def run(builder, name):
        sdf = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            builder(sdf)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)
        return (
            spark.table(name)
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("next_update_sec").alias("next_update_sec"),
            )
        )

    ev.exceptAll(ev.limit(200)).coalesce(1).write.mode("append").parquet(src)
    old_api = run(jobs.stream_stateful_crawl_scheduler, "t_sched_old")
    new_api = run(jobs.stream_stateful_scheduler_tws, "t_sched_tws")
    assert_same_rows(old_api, new_api, ["user_id", "n_events", "next_update_sec"])


def test_stream_stream_interval_join_equals_batch_twin(spark, events_dir):
    """K8: the stream-stream interval join (two unbounded sides, both
    watermarked) must emit exactly the pairs the registered batch twin
    counts."""
    src = _stream_events(spark, events_dir)
    clicks = src.filter(F.col("event_type") == "click")
    purchases = src.filter(F.col("event_type") == "purchase")
    out = run_stream_to_memory(
        spark,
        jobs.stream_stream_interval_join(clicks, purchases),
        "t_ssjoin",
        "append",
    )
    stream_counts = out.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_clicks_prior_1h")
    )
    batch = jobs.stream_interval_join(spark, SF_UNIT)
    assert_same_rows(
        batch, stream_counts, ["event_id", "user_id", "n_clicks_prior_1h"]
    )


def test_window_topk_counts_equal_batch(spark, events_dir):
    """M124 — the streaming half (watermarked windowed counts) must
    equal the batch count stage row-for-row; applying the rank to the
    streamed counts must then reproduce the registered batch twin
    exactly (the foreachBatch contract)."""
    from pyspark.sql import Window

    batch_counts = jobs.stream_window_counts(spark.read.parquet(events_dir))
    streamed = run_stream_to_memory(
        spark, jobs.stream_window_counts(_stream_events(spark, events_dir)),
        "t_window_counts", "append",
    )
    # Append-mode contract: every emitted row matches the batch stage
    # exactly, and the ONLY rows withheld are the trailing windows the
    # watermark could not close (no later event ever advances past the
    # final window).
    cols = ["window_start", "event_type", "n_events"]
    b_rows = {tuple(r[c] for c in cols) for r in batch_counts.collect()}
    s_rows = {tuple(r[c] for c in cols) for r in streamed.collect()}
    assert s_rows <= b_rows
    frontier = max(r[0] for r in s_rows)
    assert all(r[0] > frontier for r in b_rows - s_rows)

    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    ranked_stream = (
        streamed.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
    )
    from tropology_spark import QUERIES

    twin = QUERIES["stream_window_topk_1h"](spark, SF_UNIT).filter(
        F.col("window_start") <= frontier  # closed windows only
    )
    assert_same_rows(ranked_stream, twin,
                     ["window_start", "event_type", "n_events", "rk"])


def test_checkpoint_recovery_resumes_without_reprocessing(spark, tmp_path):
    """K-family recovery semantics: a stateful streaming aggregation
    stopped after batch 1 and RESTARTED from its checkpointLocation
    must (a) resume with its state intact — the final upserted counts
    equal the batch twin over ALL data — and (b) read only the files
    that arrived while it was down (the checkpoint's source log), not
    reprocess phase 1.  This is the exactly-once restart contract a
    production ingest relies on; the idempotent keyed upsert in
    foreachBatch is the matching sink discipline."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = load(spark, SF_UNIT, "events").select("event_id", "event_type")
    n_total = ev.count()
    ev1 = ev.filter(F.col("event_id") % 2 == 0)
    ev2 = ev.filter(F.col("event_id") % 2 == 1)
    n2 = ev2.count()
    ev1.coalesce(1).write.mode("overwrite").parquet(src)

    store: dict[str, int] = {}

    def upsert(batch_df, _epoch):
        for r in batch_df.collect():
            store[r["event_type"]] = r["n"]  # keyed upsert: idempotent

    def start():
        sdf = (
            spark.readStream.schema(ev.schema)
            .parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            sdf.writeStream.foreachBatch(upsert)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)
        return q

    start()  # phase 1: only the even half exists
    phase1 = dict(store)
    assert sum(phase1.values()) == n_total - n2

    ev2.coalesce(1).write.mode("append").parquet(src)
    q2 = start()  # phase 2: restart from the SAME checkpoint
    # (a) state survived the restart: totals equal the batch twin
    want = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert store == want
    # (b) the restarted run read ONLY the new files (source log replay)
    read_rows = sum(p["numInputRows"] for p in q2.recentProgress)
    assert read_rows == n2, f"restart reprocessed old data: {read_rows} != {n2}"


def test_sliding_distinct_stream_matches_batch_and_registered(spark, events_dir):
    """M218's streaming twin: the chained two-stage stateful query
    (windowed per-user collapse → per-window user count) must equal
    (a) the same builder run on the batch frame, restricted to the
    watermark-closed windows append mode emits, and (b) the registered
    ts_sliding_distinct rows under the label mapping trailing-hour
    H ↔ window [H-2h, H+1h)."""
    import datetime

    from tropology_spark import QUERIES

    ev = spark.read.parquet(events_dir)
    batch = jobs.stream_sliding_distinct(ev)
    stream = run_stream_to_memory(
        spark,
        jobs.stream_sliding_distinct(_stream_events(spark, events_dir)),
        "t_sliding_distinct",
        "append",
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - datetime.timedelta(minutes=10)
    closed = batch.filter(F.expr(f"window.end <= timestamp'{wm}'"))
    cols = ["event_type", "ws", "n_users_3h"]
    a = closed.select("event_type", F.col("window.start").alias("ws"), "n_users_3h")
    b = stream.select("event_type", F.col("window.start").alias("ws"), "n_users_3h")
    assert_same_rows(a, b, cols)

    # (b) registered-query mapping: every (type, H, n) row must appear
    # as the window starting at H-2 hours with the same count.
    win = {
        (r["event_type"], r["ws"]): r["n_users_3h"]
        for r in batch.select(
            "event_type", F.col("window.start").alias("ws"), "n_users_3h"
        ).collect()
    }
    reg = QUERIES["ts_sliding_distinct"](spark, SF_UNIT).collect()
    assert len(reg) > 0
    epoch = datetime.datetime(1970, 1, 1)
    for r in reg:
        ws = epoch + datetime.timedelta(hours=int(r["hour"]) - 2)
        assert win.get((r["event_type"], ws)) == r["n_users_3h"], (
            r["event_type"], r["hour"], ws,
        )


def test_asof_tolerance_stream_matches_registered(spark, events_dir):
    """M217's streaming twin: the outer-interval-join → windowed
    max_by chain must reproduce the registered join_asof_tolerance
    rows (including sentinels, produced by watermark passage instead
    of a left join) for every purchase whose 1-hour window the final
    watermark closed — and must cover a non-trivial share of them."""
    from tropology_spark import QUERIES

    stream = run_stream_to_memory(
        spark,
        jobs.stream_asof_tolerance(_stream_events(spark, events_dir)),
        "t_asof_tol",
        "append",
    )
    got = {
        r["purchase_id"]: (
            r["last_view_id"] if r["last_view_id"] is not None else -1,
        )
        for r in stream.collect()
    }
    want = {
        r["purchase_id"]: (r["last_view_id"],)
        for r in QUERIES["join_asof_tolerance"](spark, SF_UNIT).collect()
    }
    assert len(got) > 0.5 * len(want)  # only tail windows may be withheld
    for pid, v in got.items():
        assert want[pid] == v, (pid, v, want[pid])
