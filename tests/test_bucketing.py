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


def test_quantizer_index_persist_reload(spark, tmp_path):
    """VERDICT r7 item 2 — the ANN family's 'saved index at 100 TB'
    claim, in code: train the coarse quantizer once, persist the
    assignment bucketed by cell, reload it in a SECOND session, and
    pin (a) reloaded assignments identical to the trained ones and
    (b) the cell-blocked pair join over the reloaded artifact planning
    with zero shuffle exchanges (the J9/M2/M189 join shape consuming
    the on-disk partitioning)."""
    from tropology_spark.operators.similarity import (
        quantizer_assign_materialized,
        quantizer_read_index,
        quantizer_write_index,
    )

    _, assign = quantizer_assign_materialized(spark, SF_UNIT)
    want = {(r["vec_id"], r["cell"]) for r in assign.collect()}
    quantizer_write_index(
        spark, SF_UNIT, "quant_idx_test", path=str(tmp_path / "quant_idx")
    )
    try:
        # A fresh session (separate session state, shared catalog —
        # the closest same-JVM stand-in for "another job reloads the
        # artifact") must see the exact trained assignment.
        s2 = spark.newSession()
        re = quantizer_read_index(s2, "quant_idx_test")
        got = {(r["vec_id"], r["cell"]) for r in re.collect()}
        assert got == want

        prev = s2.conf.get("spark.sql.autoBroadcastJoinThreshold")
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a, b = re.alias("a"), re.alias("b")
            pairs = a.join(
                b,
                (F.col("a.cell") == F.col("b.cell"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            ).select(F.col("a.vec_id"), F.col("b.vec_id").alias("vec_b"))
            plan = plan_of(pairs)
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            assert pairs.count() > 0
        finally:
            s2.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS quant_idx_test")


def test_quantizer_env_index_skips_retraining(spark, tmp_path, monkeypatch):
    """TROPOLOGY_QUANT_INDEX_DIR — the cross-session artifact path:
    a cold cache with the env var set must REUSE the written
    assignment instead of re-running Lloyd (pinned by making the
    trainer raise), and the reloaded assignment must equal the
    trained one."""
    import tropology_spark.operators.similarity as S
    from tropology_spark.sources.tables import clear_session_caches

    _, assign = S.quantizer_assign_materialized(spark, SF_UNIT)
    want = {(r["vec_id"], r["cell"]) for r in assign.collect()}
    monkeypatch.setenv("TROPOLOGY_QUANT_INDEX_DIR", str(tmp_path))
    clear_session_caches()
    try:
        # First cold build with the env var: trains once, writes.
        _, a1 = S.quantizer_assign_materialized(spark, SF_UNIT)
        assert {(r["vec_id"], r["cell"]) for r in a1.collect()} == want

        # Second cold build: must come from the artifact — no Lloyd.
        clear_session_caches()

        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("lloyd_rounds ran despite saved index")

        monkeypatch.setattr(S, "lloyd_rounds", boom)
        _, a2 = S.quantizer_assign_materialized(spark, SF_UNIT)
        assert {(r["vec_id"], r["cell"]) for r in a2.collect()} == want
    finally:
        clear_session_caches()


def test_quantizer_partial_index_triggers_retrain(spark, tmp_path, monkeypatch):
    """ADVICE r8: a crashed/concurrent writer leaves a parquet dir
    WITHOUT the _SUCCESS marker; the reload gate must treat it as
    absent (retrain + overwrite), never load the partial assignment."""
    import os

    import tropology_spark.operators.similarity as S
    from tropology_spark.sources.tables import clear_session_caches

    _, assign = S.quantizer_assign_materialized(spark, SF_UNIT)
    want = {(r["vec_id"], r["cell"]) for r in assign.collect()}
    idx_path = tmp_path / f"assign_{os.path.basename(SF_UNIT)}"
    idx_path.mkdir()
    # a plausible-but-partial artifact: one stray parquet-ish file,
    # no _SUCCESS marker
    (idx_path / "part-00000.parquet").write_bytes(b"PAR1garbagePAR1")
    monkeypatch.setenv("TROPOLOGY_QUANT_INDEX_DIR", str(tmp_path))
    clear_session_caches()
    try:
        calls = {"n": 0}
        real = S.lloyd_rounds

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(S, "lloyd_rounds", counting)
        _, a1 = S.quantizer_assign_materialized(spark, SF_UNIT)
        assert calls["n"] == 1, "partial index dir must trigger a retrain"
        assert {(r["vec_id"], r["cell"]) for r in a1.collect()} == want
        assert (idx_path / "_SUCCESS").exists(), "retrain must rewrite the artifact"
    finally:
        clear_session_caches()


def test_ivf_index_persist_reload(spark, tmp_path, monkeypatch):
    """VERDICT r8 item 6 — the THIRD saved-index artifact, following
    the quantizer/minhash precedent: persist the IVF inverted file
    (vectors bucketed by cell) + its k-row centroid table, reload in a
    fresh session, and pin (a) the from-index search returning the
    registered sim_ivf_topk rows exactly, (b) NO training on the read
    path (lloyd_rounds raises), and (c) the probe scan BUCKET-PRUNED
    to the probed cells (SelectedBucketsCount: 2 of 16 — 'a probe
    touches only matching buckets', the sim_ivf_topk docstring's
    100 TB claim, now demonstrated)."""
    import tropology_spark.operators.similarity as S
    from tropology_spark import QUERIES

    want = [
        (r["vec_id"], r["cell"], r["cosine"], )
        for r in QUERIES["sim_ivf_topk"](spark, SF_UNIT).collect()
    ]
    S.ivf_write_index(spark, SF_UNIT, "ivf_idx_test", path=str(tmp_path / "ivf"))
    try:
        s2 = spark.newSession()
        # Bucket PRUNING rides the bucketed scan; Spark's auto-bucketed-
        # scan rule turns the bucketed read off when no operator needs
        # the partitioning (its criterion is shuffle avoidance, not
        # I/O), which would silently read all 16 buckets.  The index
        # consumer posture pins it on (documented in
        # ivf_topk_from_index).
        s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")

        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("lloyd_rounds ran on the index read path")

        monkeypatch.setattr(S, "lloyd_rounds", boom)
        got_df = S.ivf_topk_from_index(s2, "ivf_idx_test", S.QUERY_VEC_ID)
        got = [(r["vec_id"], r["cell"], r["cosine"]) for r in got_df.collect()]
        assert got == want

        plan = plan_of(got_df)
        assert "SelectedBucketsCount: 2 out of 16" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS ivf_idx_test")
        spark.sql("DROP TABLE IF EXISTS ivf_idx_test_centroids")


def test_minhash_index_persist_reload(spark, tmp_path):
    """The LSH sibling of the quantizer artifact: the band table
    written bucketed on (band, bucket), reloaded in a second session,
    must (a) reproduce the registered dedup_minhash_lsh candidate set
    exactly through the shared minhash_candidate_pairs join, and (b)
    plan that join's equi stage with zero shuffle exchanges."""
    from tropology_spark import QUERIES
    from tropology_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_read_index,
        minhash_write_index,
    )

    want = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_UNIT).collect()
    }
    minhash_write_index(
        spark, SF_UNIT, "mh_idx_test", path=str(tmp_path / "mh_idx")
    )
    try:
        s2 = spark.newSession()
        re = minhash_read_index(s2, "mh_idx_test")
        got = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_candidate_pairs(re).collect()
        }
        assert got == want

        prev = s2.conf.get("spark.sql.autoBroadcastJoinThreshold")
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a, b = re.alias("a"), re.alias("b")
            joined = a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            ).select(F.col("a.doc_id"), F.col("b.doc_id").alias("doc_b"))
            plan = plan_of(joined)
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
        finally:
            s2.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_idx_test")


def test_pq_index_persist_reload(spark, tmp_path, monkeypatch):
    """VERDICT r9 item 4 — the FOURTH saved-index artifact: persist
    the PQ encoded corpus (codes bucketed by vec_id) + its k×d
    codebook, reload in a fresh session, and pin (a) the from-index
    search returning the registered sim_pq_topk rows exactly, (b) NO
    codebook rebuild and NO corpus re-encoding on the read path (the
    codebook constructor raises — only the artifact can supply it),
    and (c) the ADC per-vector rollup consuming the on-disk hash
    partitioning: groupBy(vec_id) over the reloaded codes plans with
    ZERO Exchange (the aggregation analogue of IVF's bucket pruning)."""
    import tropology_spark.operators.similarity as S
    from tropology_spark import QUERIES

    want = [
        (r["vec_id"], r["adc_d2"], r["dist2"])
        for r in QUERIES["sim_pq_topk"](spark, SF_UNIT).collect()
    ]
    S.pq_write_index(spark, SF_UNIT, "pq_idx_test", path=str(tmp_path / "pq"))
    try:
        s2 = spark.newSession()
        s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")

        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("codebook rebuilt on the index read path")

        monkeypatch.setattr(S, "_pq_cb", boom)
        got_df = S.pq_topk_from_index(s2, "pq_idx_test", SF_UNIT)
        got = [(r["vec_id"], r["adc_d2"], r["dist2"]) for r in got_df.collect()]
        assert got == want

        rollup = s2.table("pq_idx_test").groupBy("vec_id").count()
        plan = plan_of(rollup)
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS pq_idx_test")
        spark.sql("DROP TABLE IF EXISTS pq_idx_test_codebook")


def test_bq_index_persist_reload(spark, tmp_path, monkeypatch):
    """The FIFTH saved-index artifact: persist the BQ sign-bit
    signature table (16 bytes/vector, bucketed by vec_id), reload in a
    fresh session, and pin (a) the from-index search returning the
    sim_bq_hamming_topk body's rows exactly, (b) NO corpus re-encoding
    on the read path (the signature builder raises — the query
    signature is a point lookup IN the artifact, rerank vectors come
    from the source by key), and (c) a vec_id-keyed rollup over the
    reloaded signatures consuming the on-disk hash partitioning with
    ZERO Exchange (the PQ artifact's aggregation pin)."""
    import tropology_spark.operators.similarity as S
    from tropology_spark import QUERIES

    fn = QUERIES["sim_bq_hamming_topk"]
    want = [
        (r["vec_id"], r["hamming"], r["cosine"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    S.bq_write_index(spark, SF_UNIT, "bq_idx_test", path=str(tmp_path / "bq"))
    try:
        s2 = spark.newSession()
        s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")

        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("corpus re-encoded on the index read path")

        monkeypatch.setattr(S, "bq_signatures_frame", boom)
        got_df = S.bq_topk_from_index(s2, "bq_idx_test", SF_UNIT)
        got = [(r["vec_id"], r["hamming"], r["cosine"]) for r in got_df.collect()]
        assert got == want
        assert len(got) == S.BQ_K

        rollup = s2.table("bq_idx_test").groupBy("vec_id").count()
        plan = plan_of(rollup)
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bq_idx_test")


def test_bq_env_index_skips_reencoding(spark, tmp_path, monkeypatch):
    """TROPOLOGY_BQ_INDEX_DIR — the registered sim_bq_hamming_topk's
    artifact-reload wiring (VERDICT r10 item 7, the quantizer-env
    precedent): with the env var set, the first run encodes once and
    WRITES ``<dir>/sig_<sf>``; a second run must reload it through
    bq_search_signatures with NO corpus re-encoding (the signature
    builder raises) and return the default path's rows exactly.  A
    partial artifact (no _SUCCESS) must trigger a re-encode, never a
    load (the ADVICE r8 gate)."""
    import os

    import tropology_spark.operators.similarity as S
    from tropology_spark import QUERIES

    fn = QUERIES["sim_bq_hamming_topk"]
    want = [
        (r["vec_id"], r["hamming"], r["cosine"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    monkeypatch.setenv("TROPOLOGY_BQ_INDEX_DIR", str(tmp_path))
    sig_path = tmp_path / f"sig_{os.path.basename(SF_UNIT)}"
    got1 = [
        (r["vec_id"], r["hamming"], r["cosine"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got1 == want
    assert (sig_path / "_SUCCESS").exists(), "first env run must write the artifact"

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("corpus re-encoded despite saved signatures")

    monkeypatch.setattr(S, "bq_signatures_frame", boom)
    got2 = [
        (r["vec_id"], r["hamming"], r["cosine"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got2 == want

    # partial artifact: strip the marker -> must re-encode + rewrite
    monkeypatch.undo()  # restores the real signature builder
    monkeypatch.setenv("TROPOLOGY_BQ_INDEX_DIR", str(tmp_path))
    (sig_path / "_SUCCESS").unlink()
    got3 = [
        (r["vec_id"], r["hamming"], r["cosine"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got3 == want
    assert (sig_path / "_SUCCESS").exists(), "re-encode must rewrite the artifact"


def test_ivfpq_index_persist_reload(spark, tmp_path, monkeypatch):
    """The SIXTH saved-index artifact — the IVF+PQ composite (PQ codes
    bucketed by coarse cell): persist, reload in a fresh session, and
    pin (a) the from-index search returning the REGISTERED
    sim_ivfpq_topk rows exactly, (b) NO training on the read path
    (both the Lloyd trainer and the codebook constructor raise —
    centroids and codebook can only come from the artifact), and (c)
    the probed code scan BUCKET-PRUNED to the probed cells
    (SelectedBucketsCount: 2 of 16 — IVF's I/O pruning now composing
    with PQ's 2-ints-per-vector payload in one artifact)."""
    import tropology_spark.operators.similarity as S
    from tropology_spark import QUERIES

    fn = QUERIES["sim_ivfpq_topk"]
    want = [
        (r["vec_id"], r["cell"], r["adc_d2"], r["dist2"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    S.ivfpq_write_index(
        spark, SF_UNIT, "ivfpq_idx_test", path=str(tmp_path / "ivfpq")
    )
    try:
        s2 = spark.newSession()
        s2.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )

        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("training ran on the index read path")

        monkeypatch.setattr(S, "lloyd_rounds", boom)
        monkeypatch.setattr(S, "_pq_cb", boom)
        got_df = S.ivfpq_topk_from_index(s2, "ivfpq_idx_test", SF_UNIT)
        got = [
            (r["vec_id"], r["cell"], r["adc_d2"], r["dist2"])
            for r in got_df.collect()
        ]
        assert got == want

        plan = plan_of(got_df)
        assert "SelectedBucketsCount: 2 out of 16" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS ivfpq_idx_test")
        spark.sql("DROP TABLE IF EXISTS ivfpq_idx_test_centroids")
        spark.sql("DROP TABLE IF EXISTS ivfpq_idx_test_codebook")


def test_ivfpq_env_index_skips_training(spark, tmp_path, monkeypatch):
    """TROPOLOGY_IVFPQ_INDEX_DIR — the registered sim_ivfpq_topk's
    artifact-reload wiring (VERDICT r11 item 6, the BQ-env precedent):
    with the env var set, the first run trains once and WRITES
    ``<dir>/ivfpq_<sf>`` (+ centroids/codebook siblings; the inverted
    file LAST so its _SUCCESS implies the siblings completed); a
    second run must reload all three frames through the single-home
    ivfpq_search_frames with NO training (the build-frames helper
    raises) and return the default path's rows exactly.  A partial
    artifact (no _SUCCESS on the inverted file) must trigger a
    retrain, never a load (the ADVICE r8 gate)."""
    import os

    import tropology_spark.operators.similarity as S
    from tropology_spark import QUERIES

    fn = QUERIES["sim_ivfpq_topk"]
    want = [
        (r["vec_id"], r["cell"], r["adc_d2"], r["dist2"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    monkeypatch.setenv("TROPOLOGY_IVFPQ_INDEX_DIR", str(tmp_path))
    inv_path = tmp_path / f"ivfpq_{os.path.basename(SF_UNIT)}"
    got1 = [
        (r["vec_id"], r["cell"], r["adc_d2"], r["dist2"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got1 == want
    assert (inv_path / "_SUCCESS").exists(), "first env run must write the artifact"

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("training ran despite a saved IVF+PQ artifact")

    monkeypatch.setattr(S, "_ivfpq_build_frames", boom)
    got2 = [
        (r["vec_id"], r["cell"], r["adc_d2"], r["dist2"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got2 == want

    # partial artifact: strip the marker -> must retrain + rewrite
    monkeypatch.undo()  # restores the real build helper
    monkeypatch.setenv("TROPOLOGY_IVFPQ_INDEX_DIR", str(tmp_path))
    (inv_path / "_SUCCESS").unlink()
    got3 = [
        (r["vec_id"], r["cell"], r["adc_d2"], r["dist2"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got3 == want
    assert (inv_path / "_SUCCESS").exists(), "retrain must rewrite the artifact"


def test_ivf_env_index_skips_training(spark, tmp_path, monkeypatch):
    """TROPOLOGY_IVF_INDEX_DIR — the registered sim_ivf_topk's
    artifact-reload wiring (VERDICT r12 item 5, the IVF+PQ-env
    precedent): with the env var set, the first run trains once and
    WRITES ``<dir>/ivf_<sf>`` (+ the centroid sibling; the inverted
    file LAST so its _SUCCESS implies the sibling completed); a second
    run must reload both frames through the single-home
    ivf_search_frames with NO training (the build-frames helper
    raises) and return the default path's rows exactly.  A partial
    artifact (no _SUCCESS on the inverted file) must trigger a
    retrain, never a load (the ADVICE r8 gate)."""
    import os

    import tropology_spark.operators.similarity as S
    from tropology_spark import QUERIES

    fn = QUERIES["sim_ivf_topk"]
    want = [
        (r["vec_id"], r["cell"], r["cosine"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    monkeypatch.setenv("TROPOLOGY_IVF_INDEX_DIR", str(tmp_path))
    inv_path = tmp_path / f"ivf_{os.path.basename(SF_UNIT)}"
    got1 = [
        (r["vec_id"], r["cell"], r["cosine"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got1 == want
    assert (inv_path / "_SUCCESS").exists(), "first env run must write the artifact"

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("training ran despite a saved IVF artifact")

    monkeypatch.setattr(S, "_ivf_build_frames", boom)
    got2 = [
        (r["vec_id"], r["cell"], r["cosine"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got2 == want

    # partial artifact: strip the marker -> must retrain + rewrite
    monkeypatch.undo()  # restores the real build helper
    monkeypatch.setenv("TROPOLOGY_IVF_INDEX_DIR", str(tmp_path))
    (inv_path / "_SUCCESS").unlink()
    got3 = [
        (r["vec_id"], r["cell"], r["cosine"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got3 == want
    assert (inv_path / "_SUCCESS").exists(), "retrain must rewrite the artifact"


def test_pq_env_index_skips_encoding(spark, tmp_path, monkeypatch):
    """TROPOLOGY_PQ_INDEX_DIR — the registered sim_pq_topk's
    artifact-reload wiring (VERDICT r12 item 5): with the env var set,
    the first run encodes once and WRITES ``<dir>/pq_<sf>`` (+ the
    codebook sibling; the encoded corpus LAST so its _SUCCESS implies
    the sibling completed); a second run must reload both frames
    through the single-home pq_search_frames with NO corpus re-encode
    (the build-frames helper raises) and return the default path's
    rows exactly.  A partial artifact must trigger a re-encode, never
    a load."""
    import os

    import tropology_spark.operators.similarity as S
    from tropology_spark import QUERIES

    fn = QUERIES["sim_pq_topk"]
    want = [
        (r["vec_id"], r["adc_d2"], r["dist2"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    monkeypatch.setenv("TROPOLOGY_PQ_INDEX_DIR", str(tmp_path))
    enc_path = tmp_path / f"pq_{os.path.basename(SF_UNIT)}"
    got1 = [
        (r["vec_id"], r["adc_d2"], r["dist2"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got1 == want
    assert (enc_path / "_SUCCESS").exists(), "first env run must write the artifact"

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("corpus encoding ran despite a saved PQ artifact")

    monkeypatch.setattr(S, "_pq_build_frames", boom)
    got2 = [
        (r["vec_id"], r["adc_d2"], r["dist2"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got2 == want

    # partial artifact: strip the marker -> must re-encode + rewrite
    monkeypatch.undo()  # restores the real build helper
    monkeypatch.setenv("TROPOLOGY_PQ_INDEX_DIR", str(tmp_path))
    (enc_path / "_SUCCESS").unlink()
    got3 = [
        (r["vec_id"], r["adc_d2"], r["dist2"])
        for r in fn(spark, SF_UNIT).collect()
    ]
    assert got3 == want
    assert (enc_path / "_SUCCESS").exists(), "re-encode must rewrite the artifact"


def test_minhash_env_index_skips_signatures(spark, tmp_path, monkeypatch):
    """TROPOLOGY_MINHASH_INDEX_DIR — the cross-session artifact path
    for the band table (completing the env wiring across the artifact
    family): a cold cache with the env var set must REUSE the written
    bands instead of re-running the signature pass (pinned by making
    the builder raise), and the reloaded bands must equal the
    computed ones."""
    import tropology_spark.operators.dedup as D
    from tropology_spark.sources.tables import clear_session_caches

    want = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in D.minhash_bands_materialized(spark, SF_UNIT).collect()
    }
    monkeypatch.setenv("TROPOLOGY_MINHASH_INDEX_DIR", str(tmp_path))
    clear_session_caches()
    try:
        # First cold build with the env var: one signature pass, writes.
        b1 = D.minhash_bands_materialized(spark, SF_UNIT)
        assert {(r["doc_id"], r["band"], r["bucket"]) for r in b1.collect()} == want

        # Second cold build: must come from the artifact — no signatures.
        clear_session_caches()

        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("minhash_bands_frame ran despite saved index")

        monkeypatch.setattr(D, "minhash_bands_frame", boom)
        b2 = D.minhash_bands_materialized(spark, SF_UNIT)
        assert {(r["doc_id"], r["band"], r["bucket"]) for r in b2.collect()} == want
    finally:
        clear_session_caches()


def test_minhash_partial_env_index_triggers_rebuild(spark, tmp_path, monkeypatch):
    """A parquet dir without the _SUCCESS marker must be treated as
    absent (rebuild + overwrite), never loaded — the ADVICE r8 gate,
    applied to the minhash env artifact."""
    import os

    import tropology_spark.operators.dedup as D
    from tropology_spark.sources.tables import clear_session_caches

    want = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in D.minhash_bands_materialized(spark, SF_UNIT).collect()
    }
    idx_path = tmp_path / f"bands_{os.path.basename(SF_UNIT)}"
    idx_path.mkdir()
    (idx_path / "part-00000.parquet").write_bytes(b"PAR1garbagePAR1")
    monkeypatch.setenv("TROPOLOGY_MINHASH_INDEX_DIR", str(tmp_path))
    clear_session_caches()
    try:
        calls = {"n": 0}
        real = D.minhash_bands_frame

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(D, "minhash_bands_frame", counting)
        b1 = D.minhash_bands_materialized(spark, SF_UNIT)
        assert calls["n"] == 1, "partial index dir must trigger a rebuild"
        assert {(r["doc_id"], r["band"], r["bucket"]) for r in b1.collect()} == want
        assert (idx_path / "_SUCCESS").exists(), "rebuild must rewrite the artifact"
    finally:
        clear_session_caches()


def test_publish_parquet_is_atomic_and_race_safe(spark, tmp_path):
    """ADVICE r13 item 2: env-artifact publishes must be atomic —
    write to a temp sibling, rename into place.  Pins the protocol:
    (a) the published dir carries _SUCCESS and the right rows, with no
    temp sibling left behind; (b) a partial (gate-less) leftover at
    the path is replaced; (c) when a COMPLETE artifact already exists
    (a concurrent writer won), the temp copy is discarded and the
    winner's content is untouched."""
    import os

    from tropology_spark.sources.tables import publish_parquet

    final = str(tmp_path / "artifact")
    df1 = spark.range(5).selectExpr("id AS k")
    publish_parquet(df1, final)
    assert os.path.exists(os.path.join(final, "_SUCCESS"))
    assert {r["k"] for r in spark.read.parquet(final).collect()} == set(range(5))
    assert [p for p in os.listdir(tmp_path) if ".tmp-" in p] == []

    # (b) partial leftover (no _SUCCESS) is replaced
    os.remove(os.path.join(final, "_SUCCESS"))
    df2 = spark.range(10, 13).selectExpr("id AS k")
    publish_parquet(df2, final)
    assert os.path.exists(os.path.join(final, "_SUCCESS"))
    assert {r["k"] for r in spark.read.parquet(final).collect()} == {10, 11, 12}

    # (c) complete artifact wins; the loser's temp is discarded
    publish_parquet(df1, final)
    assert {r["k"] for r in spark.read.parquet(final).collect()} == {10, 11, 12}
    assert [p for p in os.listdir(tmp_path) if ".tmp-" in p] == []


def test_all_env_artifact_knobs_composite(spark, tmp_path, monkeypatch):
    """VERDICT r13 item 6: the seven env knobs are each pinned
    separately; this composite sets ALL of them in one session (the
    cluster posture a real deployment runs) and asserts the six
    artifact-consuming registered queries return rows identical to the
    knob-less run — catching any cross-artifact interaction.  Also
    sweeps for leaked atomic-publish temp dirs."""
    import os

    from tests.parity import canon_rows, spark_result
    from tropology_spark import QUERIES
    from tropology_spark.sources.tables import clear_session_caches

    consumers = [
        "dedup_embedding_cosine",   # TROPOLOGY_QUANT_INDEX_DIR
        "dedup_minhash_lsh",        # TROPOLOGY_MINHASH_INDEX_DIR
        "sim_ivf_topk",             # TROPOLOGY_IVF_INDEX_DIR
        "sim_pq_topk",              # TROPOLOGY_PQ_INDEX_DIR
        "sim_bq_hamming_topk",      # TROPOLOGY_BQ_INDEX_DIR
        "sim_ivfpq_topk",           # TROPOLOGY_IVFPQ_INDEX_DIR
    ]
    clear_session_caches()
    baseline = {}
    try:
        for n in consumers:
            cols, rows = spark_result(QUERIES[n](spark, SF_UNIT))
            baseline[n] = tuple(canon_rows(cols, rows))
    finally:
        clear_session_caches()
    for v in ("QUANT", "MINHASH", "IVF", "PQ", "BQ", "IVFPQ"):
        monkeypatch.setenv(f"TROPOLOGY_{v}_INDEX_DIR", str(tmp_path))
    monkeypatch.setenv("TROPOLOGY_CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    try:
        # twice: first run WRITES every artifact, second run RELOADS
        for phase in ("write", "reload"):
            clear_session_caches()
            for n in consumers:
                cols, rows = spark_result(QUERIES[n](spark, SF_UNIT))
                assert tuple(canon_rows(cols, rows)) == baseline[n], (
                    f"{n} diverges under the composite env posture ({phase})"
                )
        leftovers = [p for p in os.listdir(tmp_path) if ".tmp-" in p]
        assert leftovers == [], leftovers
    finally:
        clear_session_caches()
