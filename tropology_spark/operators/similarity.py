"""Similarity search over embeddings (SURVEY.md §2 J8-J10).

Approximate-nearest-neighbor building blocks on the ``embeddings``
fixture (``array<float>``, dim 64): brute-force cosine top-k (the
baseline), a learned-cell-blocked kNN join (the blocked/IVF-shaped scale
path — at 100 TB the block key is a coarse quantizer cell id instead
of the label), and nearest-centroid assignment (the IVF training +
assignment step).

Numerics convention (SURVEY.md §7.4): elements are widened fp32→fp64
(exact), cosines are rounded to 6 dp in BOTH engines before any
ranking, and every rank has a unique tie-break — so ordering is
deterministic despite sub-ulp summation-order drift between engines.

Spark side computes dot products array-natively (``zip_with`` +
``aggregate`` — single pass, no shuffle per element); the oracle
enumerates positions relationally.  Both reduce 64 exact fp64 products
whose sum drift is ~1e-14, far inside the 1e-6 rounding bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.registry import register
from tropology_spark.session import iter_materialize
from tropology_spark.sources.tables import SESSION_CACHES, load, publish_parquet

QUERY_VEC_ID = 0
EMB_DIM = 64  # fixed (FIXTURES.md §2)


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


#: Shared oracle CTE: embeddings in long (vec_id, pos, val) form.
_EX_CTE = f"""
    WITH ex AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i) s
    ),
    nrm AS (SELECT vec_id, sqrt(sum(val * val)) AS nv FROM ex GROUP BY vec_id)
"""


@register(
    "sim_topk_cosine",
    oracle=_EX_CTE
    + f"""
    , q AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (SELECT e.vec_id, sum(e.val * q.val) AS dp
          FROM ex e JOIN q ON e.pos = q.pos
          WHERE e.vec_id <> {QUERY_VEC_ID}
          GROUP BY e.vec_id)
    SELECT d.vec_id,
           round(d.dp / (n1.nv * n2.nv), 6) AS cosine
    FROM d
    JOIN nrm n1 ON d.vec_id = n1.vec_id
    CROSS JOIN (SELECT nv FROM nrm WHERE vec_id = {QUERY_VEC_ID}) n2
    ORDER BY cosine DESC, d.vec_id
    LIMIT 10
    """,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — brute-force cosine top-10 for one query vector.  The query
    row is broadcast; the corpus is scanned once.  At scale this is the
    exact-rerank stage after an ANN pre-filter (J9's blocking).

    Round-19: served from the session-shared
    :func:`topk_cosine_materialized` view — eight composed audits use
    this frame as their exact truth and each re-ran the corpus scan."""
    return topk_cosine_materialized(spark, sf_dir)


_TOPK_COS_CACHE: dict[tuple[str, str], DataFrame] = {}
SESSION_CACHES.append(_TOPK_COS_CACHE)


def topk_cosine_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered J8 top-10 frame ``(vec_id, cosine)``, eagerly
    materialized (10 rows) once per (session, sf_dir) — the exact
    truth consumed by the ANN/recall audit family."""
    from tropology_spark.sources.tables import cache_get_or_build

    def build() -> DataFrame:
        return iter_materialize(_topk_cosine_frame(spark, sf_dir))

    return cache_get_or_build(
        _TOPK_COS_CACHE, (spark.sparkContext.applicationId, sf_dir), build
    )


def _topk_cosine_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        as_double(F.col("embedding")).alias("emb"),
    ).withColumn("nv", norm(F.col("emb")))  # norm once per vector, not per pair
    q = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("emb").alias("qemb"), F.col("nv").alias("nq"))
    )
    cos = F.round(dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6)
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


#: One Lloyd round, oracle side (the _PAGERANK_ITER unroll pattern —
#: graph.py:459): centroids = means of the previous assignment's
#: cells, then every vector re-assigns to its nearest centroid by
#: 6-dp-rounded cosine with the cell id as the unique tie-break.
_LLOYD_SQL_ITER = """
    , cen{n} AS (SELECT a.cell AS tcell, ex.pos, avg(ex.val) AS cval
                 FROM ex JOIN assign{p} a ON ex.vec_id = a.vec_id
                 GROUP BY a.cell, ex.pos),
    cn{n} AS (SELECT tcell, sqrt(sum(cval * cval)) AS nc
              FROM cen{n} GROUP BY tcell),
    vc{n} AS (SELECT e.vec_id, c.tcell,
                     round(sum(e.val * c.cval)
                           / (any_value(nrm.nv) * any_value(cn{n}.nc)), 6)
                       AS ccos
              FROM ex e
              JOIN cen{n} c ON e.pos = c.pos
              JOIN nrm ON e.vec_id = nrm.vec_id
              JOIN cn{n} ON c.tcell = cn{n}.tcell
              WHERE 1 = 1 {vf}
              GROUP BY e.vec_id, c.tcell),
    assign{n} AS (SELECT vec_id, tcell AS cell
                  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                                     ORDER BY ccos DESC, tcell) AS rn
                        FROM vc{n}) t WHERE rn = 1)
"""

#: Lloyd refinement rounds AFTER the seed assignment (round-6 upgrade,
#: VERDICT r5 item 5).  Total assignment rounds = 1 + _LLOYD_ITERS.
_LLOYD_ITERS = 2

#: Quantizer TRAINING sample: Lloyd's refinement rounds score only
#: vec_id % _LLOYD_TRAIN_MOD == 0 (the FAISS practice — the coarse
#: quantizer is trained on a sample, the corpus is assigned ONCE).
#: Round-6 perf fix: full-corpus refinement rounds re-timed
#: sim_knn_join 3.4 s → 9.7 s at sf0.1; sample training keeps the
#: Lloyd iterations while paying the n × k scoring pass once.
_LLOYD_TRAIN_MOD = 5


def lloyd_rounds(
    e: DataFrame,
    assign0: DataFrame,
    iters: int,
    dim: int = EMB_DIM,
    train_mod: int | None = None,
    pin: str = "vc",
    return_cen: bool = False,
):
    """Run ``iters`` nearest-centroid assignment rounds from a seed
    assignment (Lloyd's algorithm; round 1 over a seed partition IS
    the classic one-shot "hash-init k-means", further rounds refine
    it).  Returns ``(vc, assign)`` — the last round's per-(vector,
    cell) rounded cosines and the final argmax assignment.  ``vc`` is
    only produced under ``pin="vc"`` (the IVF consumers that read the
    n×k row form); under ``pin="assign"`` the rounds run the map-side
    argmax with no row-form frame at all and ``vc`` is ``None``.

    ``e``: (vec_id, emb: array<double>, nv) — one row per vector.
    ``assign0``: (vec_id, cell).

    Spark-side each round is ARRAY-NATIVE and two-stage:

    * Centroids: ONE groupBy(cell) computing all EMB_DIM per-dimension
      means as parallel avg aggregates (map-side combinable; no
      explode — the oracle's long-form avg(val) per pos computes the
      same numbers, summation-order drift ~1e-14 vs the 6-dp rounding
      bucket, the module-header convention).  k centroid arrays are
      then broadcast.
    * Assignment — MAP-SIDE (round-19 optimization, guide §2.1
      "remove shuffles outright"): the k centroid structs are rolled
      into ONE array row (collect_list — order-irrelevant, the argmax
      is a min over the set) and attached to every vector by a
      literal-key broadcast join (Spark constant-folds the ``_j=1``
      equi-key, so the executed plan is a 1-row-build
      BroadcastNestedLoopJoin — see plans/r19/quantizer_train_after
      .txt; harmless, pinned away from the BNLJ sweep, and exactly
      what an explicit crossJoin(broadcast(cen_row)) would run);
      each vector then scores all k
      centroids IN PLACE (transform + the same zip_with/aggregate dot)
      and picks argmax as array_min(struct(-ccos, cell)) — the
      identical struct ordering min (ties in the ROUNDED cosine break
      to the smallest cell, matching the oracle's ORDER BY ccos DESC,
      cell) with ZERO shuffle: the per-round groupBy(vec_id) argmax
      exchange of the scored corpus is gone (measured 3.4 s → 1.3 s
      median warm train at sf0.1; at 100 TB each round saves a
      full-corpus/sample shuffle — assignment becomes one broadcast
      map pass).  The ``pin="vc"`` FINAL round keeps the row-form
      crossJoin + groupBy argmax: its consumers read the n × k vc
      FRAME itself (the IVF probe), so the explode would be rebuilt
      anyway and the pinned frame serves the argmax.

    Every in-loop frame is referenced exactly ONCE by the next step,
    so the unrolled lineage is a single linear chain — no exponential
    re-derivation for the DOUBLE-REFERENCE RULE to guard against, and
    per-round checkpoints would only add blocking-job latency
    (measured ~1.5-2.5 s each at fixture scale).  The rule bites
    where branching starts: the FINAL vc is referenced from two plan
    branches (the final argmax + the IVF probe), so it alone is
    pinned via iter_materialize; the final assign is then one cheap
    aggregate over the pinned frame.

    ``pin``: which final frame to materialize at the branch point —
    ``"vc"`` (IVF: the probe branch consumes the full n × k cosine
    table) or ``"assign"`` (kNN: only the n-row assignment is
    consumed, by BOTH pair-join sides; pinning the 11M-row vc there
    was measured as the entire 3.4 s → 9.7 s round-6 regression —
    checkpointing a frame no branch reads is not the
    DOUBLE-REFERENCE RULE, it is a 270 MB write for nothing).

    ``train_mod``: when set, refinement rounds before the last score
    ONLY vectors with vec_id % train_mod == 0 (the caller seeds
    assign0 from the same sample) — the FAISS sample-training idiom:
    the n × k scoring pass is paid once, on the final full
    assignment, instead of every round.  Centroid steps need no
    extra filter — joining against a sample-only assignment restricts
    them automatically."""
    # ONE SQL-string expression for the whole centroid array (the
    # avgs compose inside array() in a single aggregate expression) —
    # the per-dimension Column-object loop it replaces cost ~3 s of
    # DRIVER-side py4j round-trips per 3-round train at any scale
    # (~200 gateway calls), measured construct 4.2 → 1.3 s at dim=64
    # with bit-identical centroids.  Lazy-plan construction runs
    # inside every bench/view timer, so driver-side build time is
    # real suite cost (round-19 optimization, guide §5 driver).
    cen_array_sql = (
        "array(" + ",".join(f"avg(emb[{d}])" for d in range(dim)) + ") AS cemb"
    )
    assign = assign0
    vc = None
    for i in range(iters):
        cen = (
            e.join(assign, "vec_id")
            .groupBy("cell")
            .agg(F.expr(cen_array_sql))
            .withColumn("nc", norm(F.col("cemb")))
        )
        scored = (
            e.filter(F.pmod(F.col("vec_id"), F.lit(train_mod)) == 0)
            if train_mod is not None and i < iters - 1
            else e
        )
        if i == iters - 1 and pin == "vc":
            # vc-consuming callers (the IVF probe branch) need the
            # n × k row frame itself — keep the row form and derive
            # the argmax from the pinned blocks.
            vc = scored.crossJoin(F.broadcast(cen)).select(
                "vec_id",
                "cell",
                F.round(
                    dot(F.col("emb"), F.col("cemb")) / (F.col("nv") * F.col("nc")), 6
                ).alias("ccos"),
            )
            vc = iter_materialize(vc)
            assign = (
                vc.groupBy("vec_id")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("ccos")).alias("negc"),
                            F.col("cell").alias("cell"),
                        )
                    ).alias("m")
                )
                .select("vec_id", F.col("m.cell").alias("cell"))
            )
        else:
            # Map-side argmax (docstring above): one k-struct array
            # row, literal-key broadcast attach, per-vector in-place
            # scoring — no groupBy(vec_id) exchange.  The final
            # isNotNull filter restores the empty-centroid edge of
            # the row form (an empty cen used to cross-join to zero
            # rows; array_min over the empty array is NULL).
            cen_row = cen.agg(
                F.collect_list(F.struct("cell", "cemb", "nc")).alias("cens")
            ).withColumn("_j", F.lit(1))
            best = F.array_min(
                F.transform(
                    F.col("cens"),
                    lambda c: F.struct(
                        (
                            -F.round(
                                dot(F.col("emb"), c["cemb"])
                                / (F.col("nv") * c["nc"]),
                                6,
                            )
                        ).alias("negc"),
                        c["cell"].alias("cell"),
                    ),
                )
            )
            assign = (
                scored.withColumn("_j", F.lit(1))
                .join(F.broadcast(cen_row), "_j")
                .select("vec_id", best["cell"].alias("cell"))
                .filter(F.col("cell").isNotNull())
            )
            if i == iters - 1 and pin == "assign":
                # n-row pin serving the two pair-join references
                # (DOUBLE-REFERENCE RULE applied to the frame actually
                # branched on; per-round pins were measured SLOWER —
                # each adds a blocking job and the in-loop frames are
                # single-reference).
                assign = iter_materialize(assign)
        if i == iters - 1:
            cen_last = cen
    if return_cen:
        # the LAST round's centroid table (cell, cemb, nc) — the k-row
        # artifact an IVF index persists: probes for ANY future query
        # score against exactly these centroids (ivf_write_index).
        return vc, assign, cen_last
    return vc, assign


#: The full learned-quantizer assignment chain as a shared oracle
#: prefix (ends with ``assign(vec_id, cell)``): seed cells by the
#: multiplicative vec_id hash on the training sample, refine with the
#: unrolled Lloyd rounds, assign the full corpus once.  The single SQL
#: home of the J9/M2/M189 cell arithmetic — the composed-audit
#: discipline applied to the coarse quantizer.
KNN_ASSIGN_CTE = (
    _EX_CTE
    + """
    , params AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS k FROM embeddings),
    assign0 AS (SELECT vec_id, (vec_id * 1000003) % (SELECT k FROM params) AS cell
                FROM embeddings WHERE vec_id % {m} = 0)
    """.format(m=_LLOYD_TRAIN_MOD)
    + _LLOYD_SQL_ITER.format(n=1, p=0, vf=f"AND e.vec_id % {_LLOYD_TRAIN_MOD} = 0")
    + _LLOYD_SQL_ITER.format(n=2, p=1, vf=f"AND e.vec_id % {_LLOYD_TRAIN_MOD} = 0")
    + _LLOYD_SQL_ITER.format(n=3, p=2, vf="")
    + """
    , assign AS (SELECT * FROM assign3)
    """
)

#: Session-shared quantizer view ``(e, assign)``: the normalized
#: corpus (vec_id, emb, nv) and its learned-cell assignment, built
#: once per (session, sf) — shared by J9's pair join and the M2/M189
#: embedding-dedup blocking (cache_get_or_build: concurrent cold-
#: cache callers share ONE Lloyd train).
_QUANT_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}
SESSION_CACHES.append(_QUANT_CACHE)


def quantizer_assign_materialized(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """``(e, assign)`` — e: (vec_id, emb array<double>, nv), assign:
    (vec_id, cell) from the seeded + Lloyd-refined coarse quantizer
    (k = ceil(sqrt(n)) cells, sample-trained, full corpus assigned
    once; the exact chain ``KNN_ASSIGN_CTE`` mirrors in SQL).  Both
    frames are materialized: e feeds every Lloyd round and every
    caller's pair-join sides, assign is branched on by each caller
    (the DOUBLE-REFERENCE RULE applied at the cache boundary).

    Index persistence (VERDICT r7 item 2 — the 100 TB posture, where
    the quantizer is a SAVED artifact, trained once and reloaded by
    every consumer): when ``TROPOLOGY_QUANT_INDEX_DIR`` is set, the
    assignment is read from ``<dir>/assign_<sf>`` if present and
    written there after training otherwise — so the Lloyd build runs
    at most once across sessions (the TROPOLOGY_CHECKPOINT_DIR
    pattern).  The driver contract never sets the env var, so
    registered-query behavior is unchanged by default.  For the
    plan-level benefit (shuffle-free cell-blocked pair joins) persist
    via :func:`quantizer_write_index` instead, which keeps the
    bucketing metadata a plain parquet round-trip loses."""
    import math
    import os

    from tropology_spark.sources.tables import table_count

    def build() -> tuple[DataFrame, DataFrame]:
        e = iter_materialize(
            load(spark, sf_dir, "embeddings")
            .select("vec_id", as_double(F.col("embedding")).alias("emb"))
            .withColumn("nv", norm(F.col("emb")))
        )
        idx_dir = os.environ.get("TROPOLOGY_QUANT_INDEX_DIR")
        idx_path = None
        if idx_dir:
            idx_path = os.path.join(
                idx_dir, f"assign_{os.path.basename(os.path.normpath(sf_dir))}"
            )
            # ADVICE r8: gate on the parquet _SUCCESS marker, not bare
            # directory existence — a crashed/concurrent writer leaves
            # a partial directory that must trigger a retrain, never a
            # silent load of a half-written assignment.
            if os.path.exists(os.path.join(idx_path, "_SUCCESS")):
                return (e, spark.read.parquet(idx_path))
        n = table_count(spark, sf_dir, "embeddings")
        k = math.ceil(math.sqrt(n))
        assign0 = e.filter(
            F.pmod(F.col("vec_id"), F.lit(_LLOYD_TRAIN_MOD)) == 0
        ).select(
            "vec_id",
            F.pmod(F.col("vec_id") * F.lit(1000003), F.lit(k)).alias("cell"),
        )
        _, assign = lloyd_rounds(
            e, assign0, 1 + _LLOYD_ITERS, train_mod=_LLOYD_TRAIN_MOD, pin="assign"
        )
        if idx_path is not None:
            publish_parquet(assign, idx_path)  # atomic (ADVICE r13)
            assign = spark.read.parquet(idx_path)
        return (e, assign)

    from tropology_spark.sources.tables import cache_get_or_build

    return cache_get_or_build(
        _QUANT_CACHE, (spark.sparkContext.applicationId, sf_dir), build
    )


def quantizer_write_index(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist the trained coarse-quantizer assignment as a BUCKETED
    catalog table — cell-clustered on disk via the M23 bucketing
    toolkit substrate, so a reloading session's cell-blocked pair
    join (J9/M2/M189's shape) reads both sides pre-partitioned and
    plans with ZERO shuffle exchanges (pinned by
    tests/test_bucketing.py::test_quantizer_index_persist_reload).

    ``bucketBy(cell)`` + ``sortBy(cell, vec_id)`` is exactly the
    "assignment table written bucketed by cell" the 100 TB design
    notes promise (sim_knn_join docstring, SURVEY §7.7): at scale the
    quantizer trains once, this artifact ships to every consumer, and
    per-cell work co-locates without an exchange."""
    _, assign = quantizer_assign_materialized(spark, sf_dir)
    w = (
        assign.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "cell")
        .sortBy("cell", "vec_id")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def quantizer_read_index(spark: SparkSession, table: str) -> DataFrame:
    """Reload a :func:`quantizer_write_index` artifact.  The catalog
    carries the bucket spec, so downstream cell-keyed joins and
    aggregations consume the on-disk hash partitioning directly."""
    return spark.table(table)


def _ivf_build_frames(
    spark: SparkSession, sf_dir: str, lloyd_iters: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Build the two IVF artifact frames — the INVERTED FILE
    ``(vec_id, cell, emb, nv)`` and the k-row LAST-round centroid
    table ``(cell, cemb, nc)`` — with the registered sim_ivf_topk's
    own training (label-seeded assignment + ``lloyd_iters`` Lloyd
    rounds).  Single home of the build: :func:`ivf_write_index`
    (bucketed saveAsTable flavor) and the registered op's
    ``TROPOLOGY_IVF_INDEX_DIR`` write-if-missing path (plain-parquet
    flavor) both call it, so the persisted artifact can never drift
    from the driver-checked training."""
    ev = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "label", as_double(F.col("embedding")).alias("emb"))
        .withColumn("nv", norm(F.col("emb")))
    )
    assign0 = ev.select("vec_id", F.col("label").alias("cell"))
    _, assign, cen = lloyd_rounds(
        ev.select("vec_id", "emb", "nv"), assign0, lloyd_iters, return_cen=True
    )
    inv = ev.join(assign, "vec_id").select("vec_id", "cell", "emb", "nv")
    return inv, cen


def ivf_write_index(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    n_buckets: int = 16,
    lloyd_iters: int = 1,
    path: str | None = None,
) -> None:
    """Persist the IVF index the sim_ivf_topk docstring promises ("at
    100 TB the assignment is written bucketed by cell so a probe
    touches only matching buckets") — the round-9 third saved-index
    artifact, following the quantizer/minhash precedent:

    * ``<table>``: the INVERTED FILE — (vec_id, cell, emb, nv) with the
      full vectors, ``bucketBy(cell)`` + ``sortBy(cell, vec_id)``, so
      cell-equality predicates bucket-PRUNE the scan (a 2-probe search
      reads 2 of ``n_buckets`` buckets, not the corpus).
    * ``<table>_centroids``: the k-row centroid table (cell, cemb, nc)
      of the LAST training round — exactly the centroids the search's
      probe scores against, so reload reproduces the registered
      ranking bit-for-bit.

    The build is the registered sim_ivf_topk's own: label-seeded
    assignment refined by ``lloyd_rounds`` with the same iteration
    count."""
    inv, cen = _ivf_build_frames(spark, sf_dir, lloyd_iters)
    w = (
        inv.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "cell")
        .sortBy("cell", "vec_id")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    cw = cen.write.mode("overwrite").format("parquet")
    if path is not None:
        cw = cw.option("path", path + "_centroids")
    cw.saveAsTable(table + "_centroids")


def ivf_topk_from_index(
    spark: SparkSession,
    table: str,
    query_vec_id: int,
    n_probe: int = 2,
    k: int = 10,
) -> DataFrame:
    """IVF search against a :func:`ivf_write_index` artifact — NO
    training, NO corpus scan: the query vector and its candidates come
    from the inverted file itself.

    The probe is the real IVF read path: score the query against the
    k-row broadcast centroid table, take the ``n_probe`` best cells,
    and push them into the scan as a LITERAL ``cell IN (...)``
    predicate — literal equality on the bucket column is what enables
    bucket pruning (``SelectedBucketsCount: n_probe out of
    n_buckets`` in the scan node; a join/semi-join would read every
    bucket).  The 2-row probe collect is the standard IVF driver step
    (the probe list is index metadata, not data).

    Consumer posture: set ``spark.sql.sources.bucketing.
    autoBucketedScan.enabled=false`` in the reading session — Spark's
    auto-bucketed-scan rule otherwise drops the bucketed read (its
    criterion is shuffle avoidance, not I/O) and with it the pruning.
    Ranking is pinned equal to the registered sim_ivf_topk in
    tests/test_bucketing.py::test_ivf_index_persist_reload."""
    return ivf_search_frames(
        spark.table(table), spark.table(table + "_centroids"),
        query_vec_id, n_probe, k,
    )


def ivf_search_frames(
    inv: DataFrame,
    cen: DataFrame,
    query_vec_id: int,
    n_probe: int = 2,
    k: int = 10,
) -> DataFrame:
    """The from-index IVF search over the two artifact FRAMES — the
    single home of the probe + rerank arithmetic:
    :func:`ivf_topk_from_index` (bucketed-table flavor, where the
    literal ``cell IN (...)`` predicate bucket-prunes) and the
    registered op's ``TROPOLOGY_IVF_INDEX_DIR`` reload path
    (plain-parquet flavor) both delegate here, so the saved artifact
    and the driver-checked search cannot drift (the
    ivfpq_search_frames / bq_search_signatures precedent)."""
    q = inv.filter(F.col("vec_id") == query_vec_id).select(
        F.col("emb").alias("qemb"), F.col("nv").alias("nq")
    )
    probe_rows = (
        q.crossJoin(F.broadcast(cen))
        .select(
            "cell",
            F.round(
                dot(F.col("qemb"), F.col("cemb")) / (F.col("nq") * F.col("nc")), 6
            ).alias("ccos"),
        )
        .orderBy(F.col("ccos").desc(), F.col("cell"))
        .limit(n_probe)
        .collect()
    )
    probe_cells = [r["cell"] for r in probe_rows]
    cand = inv.filter(
        F.col("cell").isin(probe_cells) & (F.col("vec_id") != query_vec_id)
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "cell",
            F.round(dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6)
            .alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


@register(
    "sim_knn_join",
    oracle=KNN_ASSIGN_CTE
    + """
    , d AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, sum(ea.val * eb.val) AS dp
      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id
      JOIN ex ea ON ea.vec_id = a.vec_id
      JOIN ex eb ON eb.vec_id = b.vec_id AND ea.pos = eb.pos
      GROUP BY a.vec_id, b.vec_id
    ),
    cos AS (
      SELECT d.va, d.vb, round(d.dp / (na.nv * nb.nv), 6) AS cosine
      FROM d JOIN nrm na ON d.va = na.vec_id JOIN nrm nb ON d.vb = nb.vec_id
    )
    SELECT va AS vec_id, vb AS neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY va
                                       ORDER BY cosine DESC, vb) AS rn
          FROM cos) t
    WHERE rn <= 3
    """,
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — cell-blocked kNN self-join: top-3 neighbors per vector
    within its LEARNED coarse-quantizer cell (the IVF bucket idea).

    Round-19 optimization: the O(3n) result frame is served from the
    session-shared :func:`knn_join_materialized` view — three
    registered queries consume the identical frame (this one + the
    M335 mutual join + the M352 hubness rollup), and before the view
    each composition re-ran the FULL cell-blocked pair join (the
    suite paid the n^1.5 dot stage three times per session).

    Blocking that survives 100×: ``k = ceil(sqrt(n))`` cells are
    seeded by a deterministic multiplicative hash of vec_id, then
    refined with ``1 + _LLOYD_ITERS`` nearest-centroid rounds
    (Lloyd's algorithm — round-6 upgrade from the one-shot hash-init
    train; cells become real clusters, so within-cell neighbors are
    likelier true neighbors).  Both the number of cells AND the
    expected cell population grow as √n, keeping the within-cell pair
    count at O(n^1.5) total instead of the O(n²/C) of any
    fixed-cardinality block.  The multiplicative vec_id hash is exact
    integer arithmetic in both engines (multiplier < 2³⁰:
    ANSI-overflow-safe).

    At 100 TB the final assignment table is written bucketed by cell
    so the pair join is shuffle-free (SURVEY.md §7.7)."""
    return knn_join_materialized(spark, sf_dir)


_KNN_JOIN_CACHE: dict[tuple[str, str], DataFrame] = {}
SESSION_CACHES.append(_KNN_JOIN_CACHE)


def knn_join_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered J9 kNN frame ``(vec_id, neighbor_id, cosine,
    rn)``, eagerly materialized once per (session, sf_dir) — the
    single home of the cell-blocked pair join, shared by
    sim_knn_join, sim_mutual_knn (M335) and sim_knn_hubness (M352)."""
    from tropology_spark.sources.tables import cache_get_or_build

    def build() -> DataFrame:
        return iter_materialize(_knn_join_frame(spark, sf_dir))

    return cache_get_or_build(
        _KNN_JOIN_CACHE, (spark.sparkContext.applicationId, sf_dir), build
    )


def _knn_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Session-shared quantizer (also the M2/M189 blocking): e feeds
    # both pair-join sides; assign is the pinned n-row branch point.
    e, assign = quantizer_assign_materialized(spark, sf_dir)

    # Block the pair join on the learned cell; cosine array-natively.
    ea = e.join(assign, "vec_id").select(
        F.col("vec_id").alias("va"), F.col("cell"), F.col("emb").alias("ea"),
        F.col("nv").alias("na"),
    )
    eb = e.join(assign, "vec_id").select(
        F.col("vec_id").alias("vb"), F.col("cell").alias("cb"), F.col("emb").alias("eb"),
        F.col("nv").alias("nb"),
    )
    cos = F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    pairs = (
        ea.join(eb, (F.col("cell") == F.col("cb")) & (F.col("va") != F.col("vb")))
        .select("va", "vb", cos.alias("cosine"))
    )
    w = Window.partitionBy("va").orderBy(F.col("cosine").desc(), F.col("vb"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("va").alias("vec_id"),
            F.col("vb").alias("neighbor_id"),
            "cosine",
            "rn",
        )
    )


@register(
    "sim_centroid_assign",
    oracle=_EX_CTE
    + """
    , cen AS (SELECT label AS clabel, pos, avg(val) AS cval FROM ex GROUP BY label, pos),
    cn AS (SELECT clabel, sqrt(sum(cval * cval)) AS nc FROM cen GROUP BY clabel),
    d AS (SELECT e.vec_id, c.clabel, sum(e.val * c.cval) AS dp
          FROM ex e JOIN cen c ON e.pos = c.pos
          GROUP BY e.vec_id, c.clabel),
    cos AS (SELECT d.vec_id, d.clabel,
                   round(d.dp / (nrm.nv * cn.nc), 6) AS cosine
            FROM d JOIN nrm ON d.vec_id = nrm.vec_id
                   JOIN cn ON d.clabel = cn.clabel)
    SELECT cos.vec_id, emb.label AS own_label, cos.clabel AS assigned_label, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cosine DESC, clabel) AS rn
          FROM cos) cos
    JOIN embeddings emb ON cos.vec_id = emb.vec_id
    WHERE rn = 1
    """,
)
def sim_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — label centroids + nearest-centroid assignment (the IVF
    train/assign step).  Long (vec, pos, val) form mirrors the oracle
    relationally; centroids are tiny (10×64) and broadcast."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("pos0", "v"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("v").cast("double").alias("val"),
    )
    nrm = ex.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nv"))
    cen = (
        ex.groupBy(F.col("label").alias("clabel"), F.col("pos"))
        .agg(F.avg("val").alias("cval"))
    )
    cn = cen.groupBy("clabel").agg(F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("nc"))
    d = (
        ex.join(F.broadcast(cen), "pos")
        .groupBy("vec_id", "clabel")
        .agg(F.sum(F.col("val") * F.col("cval")).alias("dp"))
    )
    cos = (
        d.join(nrm, "vec_id")
        .join(F.broadcast(cn), "clabel")
        .select(
            "vec_id",
            "clabel",
            F.round(F.col("dp") / (F.col("nv") * F.col("nc")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("clabel"))
    return (
        cos.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(e.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            F.col("label").alias("own_label"),
            F.col("clabel").alias("assigned_label"),
            "cosine",
        )
    )


@register(
    "sim_ivf_topk",
    oracle=_EX_CTE
    + """
    , assign0 AS (SELECT vec_id, label AS cell FROM embeddings)
    """
    + _LLOYD_SQL_ITER.format(n=1, p=0, vf="")
    + f"""
    , assign AS (SELECT * FROM assign1),
    probe AS (SELECT tcell AS pcell
              FROM (SELECT *, row_number() OVER (ORDER BY ccos DESC, tcell) AS rn
                    FROM vc1 WHERE vec_id = {QUERY_VEC_ID}) t WHERE rn <= 2),
    q AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    cand AS (SELECT a.vec_id, a.cell FROM assign a
             JOIN probe ON a.cell = probe.pcell
             WHERE a.vec_id <> {QUERY_VEC_ID}),
    d AS (SELECT e.vec_id, sum(e.val * q.val) AS dp
          FROM ex e JOIN q ON e.pos = q.pos
          JOIN cand ON e.vec_id = cand.vec_id
          GROUP BY e.vec_id)
    SELECT d.vec_id, cand.cell,
           round(d.dp / (n1.nv * n2.nv), 6) AS cosine
    FROM d
    JOIN cand ON d.vec_id = cand.vec_id
    JOIN nrm n1 ON d.vec_id = n1.vec_id
    CROSS JOIN (SELECT nv FROM nrm WHERE vec_id = {QUERY_VEC_ID}) n2
    ORDER BY cosine DESC, d.vec_id
    LIMIT 10
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: train centroids (one per label partition), assign
    every vector to its nearest centroid (the inverted file), probe the
    query's 2 nearest cells, exact-rerank only the candidates — the
    full coarse-quantizer search pipeline, the scale path where
    brute-force J8 is infeasible.

    The registered query runs ONE assignment round (lloyd_iters=1):
    the fixture embeddings carry no cluster structure, so Lloyd
    refinement provably cannot raise — and was measured (round 6) to
    lower — the 2-probe recall@10 the M112 audit pins (one-shot 4/10
    vs 3/10 at every iteration count 2-4).  The Lloyd path is the
    SAME loop sim_knn_join's learned quantizer runs (lloyd_rounds);
    its recall benefit is pinned where structure exists —
    tests/test_units.py::test_ivf_recall_on_clustered_data compares
    refined vs one-shot on clustered synthetic data.

    At 100 TB the assignment is written bucketed by cell so a probe
    touches only matching buckets.

    Index wiring (the sim_ivfpq_topk precedent): when
    ``TROPOLOGY_IVF_INDEX_DIR`` is set, the inverted file + centroid
    frames are reloaded from ``<dir>/ivf_<sf>`` (+ ``_centroids``
    sibling; written there on first use — the inverted file is written
    LAST so its ``_SUCCESS`` marker implies the sibling completed, per
    the ADVICE r8 partial-artifact rule) and the search runs through
    :func:`ivf_search_frames` — the same single-home arithmetic
    :func:`ivf_topk_from_index` uses, so the registered op and the
    saved artifact cannot drift.  The driver contract never sets the
    env var."""
    import os

    idx_dir = os.environ.get("TROPOLOGY_IVF_INDEX_DIR")
    if idx_dir:
        sf = os.path.basename(os.path.normpath(sf_dir))
        base = os.path.join(idx_dir, f"ivf_{sf}")
        if not os.path.exists(os.path.join(base, "_SUCCESS")):
            inv, cen = _ivf_build_frames(spark, sf_dir)
            publish_parquet(cen, base + "_centroids")  # atomic publishes
            publish_parquet(inv, base)  # _SUCCESS gate LAST (ADVICE r13)
        return ivf_search_frames(
            spark.read.parquet(base),
            spark.read.parquet(base + "_centroids"),
            QUERY_VEC_ID,
        )
    return ivf_topk_result_materialized(spark, sf_dir)


_IVF_TRAIN_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame, DataFrame]] = {}
SESSION_CACHES.append(_IVF_TRAIN_CACHE)


def ivf_train_materialized(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """``(ev, vc, assign)`` of the registered IVF training over the
    corpus embeddings (label-seeded assignment + ONE Lloyd round —
    exactly :func:`ivf_candidates`' train stage), materialized once
    per (session, sf_dir).  Round-19: four registered IVF consumers
    (scalar top-k, batch top-k, probe curve, IVF+PQ) each re-ran this
    identical train; the probe/rerank stages stay per-query."""
    from tropology_spark.sources.tables import cache_get_or_build

    def build() -> tuple[DataFrame, DataFrame, DataFrame]:
        ev = iter_materialize(
            load(spark, sf_dir, "embeddings")
            .select(
                "vec_id",
                "label",
                as_double(F.col("embedding")).alias("emb"),
            )
            .withColumn("nv", norm(F.col("emb")))
        )
        assign0 = ev.select("vec_id", F.col("label").alias("cell"))
        vc, assign = lloyd_rounds(ev.select("vec_id", "emb", "nv"), assign0, 1)
        # vc is pinned by lloyd_rounds (pin="vc"); assign is branched
        # on by every consumer's candidate join — pin it too.
        return (ev, vc, iter_materialize(assign))

    return cache_get_or_build(
        _IVF_TRAIN_CACHE, (spark.sparkContext.applicationId, sf_dir), build
    )


_IVF_TOPK_CACHE: dict[tuple[str, str], DataFrame] = {}
SESSION_CACHES.append(_IVF_TOPK_CACHE)


def ivf_topk_result_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered sim_ivf_topk result (10 rows), materialized once
    per (session, sf_dir) — its recall-audit composers re-ran the
    whole IVF search per reference before round 19."""
    from tropology_spark.sources.tables import cache_get_or_build

    def build() -> DataFrame:
        return iter_materialize(
            ivf_topk(
                load(spark, sf_dir, "embeddings"),
                QUERY_VEC_ID,
                train=ivf_train_materialized(spark, sf_dir),
            )
        )

    return cache_get_or_build(
        _IVF_TOPK_CACHE, (spark.sparkContext.applicationId, sf_dir), build
    )


def ivf_candidates(
    e: DataFrame,
    query_vec_id: int,
    n_probe: int = 2,
    lloyd_iters: int = 1,
    dim: int = EMB_DIM,
    with_probe_rank: bool = False,
    train: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The COARSE stage of the IVF search — train/assign cells, probe
    the query's ``n_probe`` nearest, return ``(ev, cand)`` where
    ``ev`` is the materialized (vec_id, label, emb, nv) frame and
    ``cand`` the (vec_id, cell) candidate list inside the probed
    cells.  Single home of the cell-probe arithmetic: ``ivf_topk``
    (exact fine stage) and the registered IVF+PQ composite (ADC fine
    stage) both consume it.

    ``with_probe_rank=True`` additionally carries each candidate's
    cell PROBE RANK as ``rnp`` (1 = nearest probed cell) — the
    candidate set at any smaller ``n_probe`` is exactly the
    ``rnp <= n_probe`` slice, which is what lets the probe CURVE
    (sim_ivf_probe_curve) build candidates ONCE at max n_probe and
    derive every curve point by filter (VERDICT r11 item 4).  The
    default path is unchanged (left-semi, no extra column).

    ``train``: a pre-built ``(ev, vc, assign)`` — registered corpus
    consumers pass :func:`ivf_train_materialized` so one session
    trains once (round-19); probe (``e=``) callers leave it None."""
    if train is not None:
        ev, vc, assign = train
    else:
        ev = iter_materialize(
            e.select(
                "vec_id",
                "label",  # native type: cell ordering must match the oracle's
                as_double(F.col("embedding")).alias("emb"),
            ).withColumn("nv", norm(F.col("emb")))
        )  # referenced by assign0, every Lloyd round, rerank, and q
        assign0 = ev.select("vec_id", F.col("label").alias("cell"))
        vc, assign = lloyd_rounds(
            ev.select("vec_id", "emb", "nv"), assign0, lloyd_iters, dim=dim
        )
    probe = (
        vc.filter(F.col("vec_id") == query_vec_id)
        .withColumn(
            "rn",
            # partition by vec_id (constant after the filter): the
            # frame is one vector x k cells — bounded — and the
            # non-empty spec keeps the plan funnel-node-free.
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("ccos").desc(), F.col("cell")
                )
            ),
        )
        .filter(F.col("rn") <= n_probe)
        .select(F.col("cell").alias("pcell"), F.col("rn").alias("rnp"))
    )
    if with_probe_rank:
        cand = (
            assign.join(F.broadcast(probe), assign.cell == F.col("pcell"))
            .filter(F.col("vec_id") != query_vec_id)
            .select("vec_id", "cell", "rnp")
        )
        return ev, cand
    cand = (
        assign.join(
            F.broadcast(probe.select("pcell")),
            assign.cell == F.col("pcell"),
            "left_semi",
        )
        .filter(F.col("vec_id") != query_vec_id)
    )
    return ev, cand


def ivf_topk(
    e: DataFrame,
    query_vec_id: int,
    n_probe: int = 2,
    k: int = 10,
    lloyd_iters: int = 1,
    dim: int = EMB_DIM,
    train: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """The IVF search pipeline over any ``(vec_id, label, embedding)``
    frame (labels seed the initial partition; ``lloyd_iters`` > 1 adds
    Lloyd refinement rounds).  Exactness is oracle-pinned on the
    fixture (sim_ivf_topk); recall quality is pinned on clustered
    synthetic data in
    tests/test_units.py::test_ivf_recall_on_clustered_data."""
    ev, cand = ivf_candidates(e, query_vec_id, n_probe, lloyd_iters, dim, train=train)
    q = ev.filter(F.col("vec_id") == query_vec_id).select(
        F.col("emb").alias("qemb"), F.col("nv").alias("nq")
    )
    return (
        ev.join(cand, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "cell",
            F.round(dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6)
            .alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# M90 — random-projection LSH ANN (signed random hyperplanes)
# ---------------------------------------------------------------------------

_RP_TABLES = 4  # independent hash tables (union of candidates)
_RP_BITS = 8  # hyperplane bits per table (2^8 buckets)


@register(
    "sim_rp_lsh_topk",
    oracle=_EX_CTE
    + f"""
    , exm AS (
      SELECT vec_id, pos, CAST(round(val * 1000000) AS BIGINT) AS vm FROM ex
    ),
    hp AS (
      SELECT t.t, b.b, p.pos,
             CASE WHEN (('0x' || substring(md5(CAST(t.t AS VARCHAR) || '_'
                           || CAST(b.b AS VARCHAR) || '_'
                           || CAST(p.pos AS VARCHAR)), 1, 8))::BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS w
      FROM (SELECT unnest(generate_series(0, {_RP_TABLES - 1})) AS t) t,
           (SELECT unnest(generate_series(0, {_RP_BITS - 1})) AS b) b,
           (SELECT unnest(generate_series(1, {EMB_DIM})) AS pos) p
    ),
    bits AS (
      SELECT e.vec_id, h.t, h.b,
             CASE WHEN sum(h.w * e.vm) >= 0 THEN 1 ELSE 0 END AS bit
      FROM exm e JOIN hp h ON e.pos = h.pos
      GROUP BY e.vec_id, h.t, h.b
    ),
    sigs AS (
      SELECT vec_id, t, sum(bit * (CAST(1 AS BIGINT) << b)) AS sig
      FROM bits GROUP BY vec_id, t
    ),
    qsig AS (SELECT t, sig FROM sigs WHERE vec_id = {QUERY_VEC_ID}),
    cand AS (
      SELECT DISTINCT s.vec_id
      FROM sigs s JOIN qsig q ON s.t = q.t AND s.sig = q.sig
      WHERE s.vec_id <> {QUERY_VEC_ID}
    ),
    qq AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (
      SELECT e.vec_id, sum(e.val * qq.val) AS dp
      FROM ex e JOIN cand c ON e.vec_id = c.vec_id
      JOIN qq ON e.pos = qq.pos
      GROUP BY e.vec_id
    )
    SELECT d.vec_id, round(d.dp / (n1.nv * n2.nv), 6) AS cosine
    FROM d JOIN nrm n1 ON d.vec_id = n1.vec_id
    CROSS JOIN (SELECT nv FROM nrm WHERE vec_id = {QUERY_VEC_ID}) n2
    ORDER BY cosine DESC, d.vec_id
    LIMIT 10
    """,
)
def sim_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M90 — cosine ANN via signed-random-projection LSH (the SimHash
    idea applied to embeddings): {t} independent tables of {b}
    hyperplane bits, candidates = vectors sharing the query's full
    signature in ANY table, exact cosine rerank of the candidates.
    The complement to IVF (sim_ivf_topk): no training pass, and recall
    comes from table multiplicity instead of cell probing.

    Determinism: hyperplane signs derive from md5(t_b_pos) — the
    engine-portable hash family (dedup.py) — and each projection is a
    sum of ±(value-in-micros) BIGINTs, so every signature bit is
    integer-exact in both engines; floats appear only in the final
    rounded rerank.

    Scale: signatures are one scan + two map-side-combinable aggs; the
    candidate lookup is an equi-join on (table, signature) — at 100 TB
    the signature table is written bucketed by signature so a query
    probe touches {t} buckets, never the corpus."""
    spark_session = spark
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    ).withColumn("nv", norm(F.col("emb")))

    # Long integer-micros form: the projection sums stay BIGINT-exact.
    exm = e.select(
        "vec_id", F.posexplode("emb").alias("pos0", "val")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("val") * 1000000).cast("bigint").alias("vm"),
    )

    # Hyperplane table: (t, b, pos) -> w in {-1, +1}, ~2k rows, broadcast.
    one = spark_session.range(1)
    hp = (
        one.select(
            F.explode(F.sequence(F.lit(0), F.lit(_RP_TABLES - 1))).alias("t")
        )
        .select("t", F.explode(F.sequence(F.lit(0), F.lit(_RP_BITS - 1))).alias("b"))
        .select(
            "t", "b", F.explode(F.sequence(F.lit(1), F.lit(EMB_DIM))).alias("pos")
        )
        .select(
            "t",
            "b",
            "pos",
            (
                F.lit(1)
                - 2
                * (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("_", F.col("t"), F.col("b"), F.col("pos"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("bigint")
                    % 2
                )
            ).alias("w"),
        )
    )

    bits = (
        exm.join(F.broadcast(hp), "pos")
        .groupBy("vec_id", "t", "b")
        .agg(
            F.when(F.sum(F.col("w") * F.col("vm")) >= 0, 1).otherwise(0).alias("bit")
        )
    )
    sigs = bits.groupBy("vec_id", "t").agg(
        F.sum(F.col("bit") * F.expr("CAST(shiftleft(1, b) AS BIGINT)")).alias("sig")
    )
    qsig = sigs.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("t").alias("qt"), F.col("sig").alias("qs")
    )
    cand = (
        sigs.join(
            F.broadcast(qsig),
            (F.col("t") == F.col("qt")) & (F.col("sig") == F.col("qs")),
            "left_semi",
        )
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id")
        .distinct()
    )

    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qemb"), F.col("nv").alias("nq")
    )
    cos = F.round(dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6)
    return (
        e.join(cand, "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# M104 — product-quantization ANN (seeded codebook, integer-exact ADC)
# ---------------------------------------------------------------------------

_PQ_K = 8  # codes per subspace (codebook seeded from vec_id 1..8)
_PQ_CAND = 50  # ADC candidates kept for exact rerank


def _pq_exm(e: DataFrame) -> DataFrame:
    """Micro-unit integer long form of an embedding frame — the
    single home of the M104 value quantization (vm = round(val·10⁶)),
    shared by the registered query and the saved-index paths."""
    return e.select(
        "vec_id", F.posexplode(as_double(F.col("embedding"))).alias("pos0", "val")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("val") * 1000000).cast("bigint").alias("vm"),
    )


def _pq_sub(exm: DataFrame) -> DataFrame:
    """Tag each position with its subspace (first half = 0, rest = 1)."""
    return exm.withColumn(
        "s", F.when(F.col("pos") <= EMB_DIM // 2, 0).otherwise(1)
    )


def _pq_cb(sub: DataFrame) -> DataFrame:
    """The seeded codebook: vectors 1..k ARE the codebook entries."""
    return sub.filter(F.col("vec_id").between(1, _PQ_K)).select(
        F.col("vec_id").alias("code"), "s", "pos", F.col("vm").alias("cm")
    )


def _pq_enc0(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """Per (vector, subspace, code): exact squared distance to the
    codebook entry — the argmin input for encoding AND the query's ADC
    lookup table."""
    diff = F.col("vm") - F.col("cm")
    return (
        sub.join(F.broadcast(cb), ["s", "pos"])
        .groupBy("vec_id", "s", "code")
        .agg(F.sum(diff * diff).cast("bigint").alias("d2"))
    )


#: The shared PQ encode-chain CTE (micro-unit long form → subspace tag
#: → seeded codebook → per-(vector, subspace, code) exact squared
#: distance) — the SQL single home mirrored by the _pq_exm/_pq_sub/
#: _pq_cb/_pq_enc0 Spark helpers; spliced after _EX_CTE by the
#: registered sim_pq_topk oracle and the staged distortion audit.
_PQ_ENC_CTE = f"""
    , exm AS (SELECT vec_id, pos, CAST(round(val * 1000000) AS BIGINT) AS vm
              FROM ex),
    sub AS (SELECT vec_id, pos, vm,
                   CASE WHEN pos <= {EMB_DIM // 2} THEN 0 ELSE 1 END AS s
            FROM exm),
    cb AS (SELECT vec_id AS code, s, pos, vm AS cm FROM sub
           WHERE vec_id BETWEEN 1 AND {_PQ_K}),
    enc0 AS (SELECT v.vec_id, v.s, c.code,
                    CAST(sum((v.vm - c.cm) * (v.vm - c.cm)) AS BIGINT) AS d2
             FROM sub v JOIN cb c ON c.s = v.s AND c.pos = v.pos
             GROUP BY v.vec_id, v.s, c.code)"""


@register(
    "sim_pq_topk",
    oracle=_EX_CTE
    + _PQ_ENC_CTE
    + f""",
    enc AS (SELECT vec_id, s, code FROM (
              SELECT vec_id, s, code,
                     row_number() OVER (PARTITION BY vec_id, s
                                        ORDER BY d2, code) AS rn
              FROM enc0) t WHERE rn = 1),
    qd AS (SELECT s, code, d2 AS qd2 FROM enc0
           WHERE vec_id = {QUERY_VEC_ID}),
    adc AS (SELECT e.vec_id, CAST(sum(q.qd2) AS BIGINT) AS adc_d2
            FROM enc e JOIN qd q ON q.s = e.s AND q.code = e.code
            WHERE e.vec_id <> {QUERY_VEC_ID}
            GROUP BY e.vec_id),
    cand AS (SELECT vec_id, adc_d2 FROM (
               SELECT vec_id, adc_d2,
                      row_number() OVER (ORDER BY adc_d2, vec_id) AS rn
               FROM adc) t WHERE rn <= {_PQ_CAND}),
    rer AS (SELECT v.vec_id,
                   CAST(sum((v.vm - q.vm) * (v.vm - q.vm)) AS BIGINT) AS dist2
            FROM exm v
            JOIN exm q ON q.vec_id = {QUERY_VEC_ID} AND q.pos = v.pos
            JOIN cand ON cand.vec_id = v.vec_id
            GROUP BY v.vec_id)
    SELECT r.vec_id, c.adc_d2, r.dist2
    FROM rer r JOIN cand c ON r.vec_id = c.vec_id
    ORDER BY r.dist2, r.vec_id
    LIMIT 10
    """,
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M104 — product-quantization ANN: split each vector into 2
    subspaces, encode every subvector as its nearest codebook entry
    (codebook deterministically seeded from vec_id 1..{k}), rank the
    corpus by asymmetric-distance (ADC = sum over subspaces of the
    query-to-centroid squared distance looked up by the vector's
    code), exact-rerank the top {c} candidates by true squared L2.

    The whole pipeline is INTEGER-exact: values become micro-unit
    BIGINTs, every distance is a sum of squared BIGINT diffs, and both
    rank orders carry a unique (distance, vec_id) tie-break — the only
    ANN variant with zero floats end-to-end (complements IVF's
    cell-probe and RP-LSH's signature-bucket recall paths).

    Scale (SURVEY.md §7.7): codes are 2 small ints per vector — the
    classic 64x memory compression; the ADC scan reads codes only
    (never raw vectors), the codebook is a {k}x{d} broadcast, and the
    rerank touches {c} vectors.  At 100 TB the encoded table is the
    only full-corpus artifact, written bucketed by (s0_code) so probes
    prune.

    Index wiring (the sim_ivfpq_topk precedent): when
    ``TROPOLOGY_PQ_INDEX_DIR`` is set, the encoded corpus + codebook
    frames are reloaded from ``<dir>/pq_<sf>`` (+ ``_codebook``
    sibling; written there on first use — the encoded corpus is
    written LAST so its ``_SUCCESS`` marker implies the sibling
    completed, per the ADVICE r8 partial-artifact rule) and the search
    runs through :func:`pq_search_frames` — the same single-home
    arithmetic :func:`pq_topk_from_index` uses, so the registered op
    and the saved artifact cannot drift.  The driver contract never
    sets the env var."""
    import os

    idx_dir = os.environ.get("TROPOLOGY_PQ_INDEX_DIR")
    if idx_dir:
        sf = os.path.basename(os.path.normpath(sf_dir))
        base = os.path.join(idx_dir, f"pq_{sf}")
        if not os.path.exists(os.path.join(base, "_SUCCESS")):
            enc, cb = _pq_build_frames(spark, sf_dir)
            publish_parquet(cb, base + "_codebook")  # atomic publishes
            publish_parquet(enc, base)  # _SUCCESS gate LAST (ADVICE r13)
        return pq_search_frames(
            spark.read.parquet(base),
            spark.read.parquet(base + "_codebook"),
            load(spark, sf_dir, "embeddings"),
        )
    e = load(spark, sf_dir, "embeddings")
    exm = _pq_exm(e)
    sub = _pq_sub(exm)
    cb = _pq_cb(sub)
    enc0 = _pq_enc0(sub, cb)
    w_enc = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    enc = (
        enc0.withColumn("rn", F.row_number().over(w_enc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code")
    )
    qd = enc0.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "s", "code", F.col("d2").alias("qd2")
    )
    adc = (
        enc.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qd), ["s", "code"])
        .groupBy("vec_id")
        .agg(F.sum("qd2").cast("bigint").alias("adc_d2"))
    )
    cand = adc.orderBy("adc_d2", "vec_id").limit(_PQ_CAND)
    qm = exm.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("pos").alias("qpos"), F.col("vm").alias("qm")
    )
    rdiff = F.col("vm") - F.col("qm")
    rer = (
        exm.join(cand.select("vec_id"), "vec_id", "left_semi")
        .join(F.broadcast(qm), F.col("pos") == F.col("qpos"))
        .groupBy("vec_id")
        .agg(F.sum(rdiff * rdiff).cast("bigint").alias("dist2"))
    )
    return (
        rer.join(cand, "vec_id")
        .select("vec_id", "adc_d2", "dist2")
        .orderBy("dist2", "vec_id")
        .limit(10)
    )


def _pq_build_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Build the two PQ artifact frames — the ENCODED corpus
    ``(vec_id, s, code)`` and the k×d codebook ``(code, s, pos, cm)``
    — with the registered sim_pq_topk's own encode chain (the shared
    ``_pq_*`` helpers).  Single home of the build:
    :func:`pq_write_index` (bucketed saveAsTable flavor) and the
    registered op's ``TROPOLOGY_PQ_INDEX_DIR`` write-if-missing path
    (plain-parquet flavor) both call it."""
    e = load(spark, sf_dir, "embeddings")
    sub = _pq_sub(_pq_exm(e))
    cb = _pq_cb(sub)
    enc0 = _pq_enc0(sub, cb)
    w_enc = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    enc = (
        enc0.withColumn("rn", F.row_number().over(w_enc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code")
    )
    return enc, cb


def pq_write_index(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist the PQ index sim_pq_topk's docstring promises ("at
    100 TB the encoded table is the only full-corpus artifact") — the
    round-10 FOURTH saved-index artifact, following the
    quantizer/minhash/IVF precedent:

    * ``<table>``: the ENCODED corpus — (vec_id, s, code), two small
      ints per vector (the classic 64× compression), ``bucketBy
      (vec_id)`` + ``sortBy(vec_id, s)`` so the ADC scan's
      per-vector rollup (groupBy vec_id) consumes the on-disk hash
      partitioning with ZERO shuffle — the aggregation analogue of the
      IVF artifact's bucket pruning.
    * ``<table>_codebook``: the k×d codebook (code, s, pos, cm) — the
      trained object; reloading it is what makes the read path
      training-free.

    The corpus-wide argmin encoding pass (the expensive step — k
    distance evaluations per vector) runs ONCE here; the read path
    (:func:`pq_topk_from_index`) never re-encodes anything but the
    query."""
    enc, cb = _pq_build_frames(spark, sf_dir)
    w = (
        enc.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "vec_id")
        .sortBy("vec_id", "s")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    cw = cb.write.mode("overwrite").format("parquet")
    if path is not None:
        cw = cw.option("path", path + "_codebook")
    cw.saveAsTable(table + "_codebook")


def pq_topk_from_index(
    spark: SparkSession,
    table: str,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    n_cand: int = _PQ_CAND,
    k: int = 10,
) -> DataFrame:
    """PQ search against a :func:`pq_write_index` artifact — NO
    codebook training, NO corpus re-encoding: codes and codebook come
    from the saved tables; the only raw-vector reads are the query
    row (to build its 2×k ADC lookup table) and the ``n_cand`` rerank
    candidates (point lookups by vec_id at scale — the source table
    is never scanned for ranking).  Ranking is pinned equal to the
    registered sim_pq_topk in tests/test_bucketing.py::
    test_pq_index_persist_reload.

    Consumer posture: like the IVF artifact, set
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` in
    the reading session so the ADC rollup keeps the bucketed scan and
    plans shuffle-free."""
    return pq_search_frames(
        spark.table(table), spark.table(table + "_codebook"),
        load(spark, sf_dir, "embeddings"), query_vec_id, n_cand, k,
    )


def pq_search_frames(
    enc: DataFrame,
    cb: DataFrame,
    e: DataFrame,
    query_vec_id: int = QUERY_VEC_ID,
    n_cand: int = _PQ_CAND,
    k: int = 10,
) -> DataFrame:
    """The from-index PQ search over the two artifact FRAMES plus the
    raw embeddings source (query encode + rerank point lookups only) —
    the single home of the ADC + rerank arithmetic:
    :func:`pq_topk_from_index` (bucketed-table flavor, zero-Exchange
    ADC rollup) and the registered op's ``TROPOLOGY_PQ_INDEX_DIR``
    reload path (plain-parquet flavor) both delegate here, so the
    saved artifact and the driver-checked search cannot drift (the
    ivfpq_search_frames / bq_search_signatures precedent)."""
    # Filter BEFORE the explode: the query encode is a point lookup.
    qexm = _pq_exm(e.filter(F.col("vec_id") == query_vec_id))
    qd = _pq_enc0(_pq_sub(qexm), cb).select(
        "s", "code", F.col("d2").alias("qd2")
    )
    adc = (
        enc.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(qd), ["s", "code"])
        .groupBy("vec_id")
        .agg(F.sum("qd2").cast("bigint").alias("adc_d2"))
    )
    cand = adc.orderBy("adc_d2", "vec_id").limit(n_cand)
    qm = qexm.select(F.col("pos").alias("qpos"), F.col("vm").alias("qm"))
    rdiff = F.col("vm") - F.col("qm")
    rer = (
        _pq_exm(e)
        .join(cand.select("vec_id"), "vec_id", "left_semi")
        .join(F.broadcast(qm), F.col("pos") == F.col("qpos"))
        .groupBy("vec_id")
        .agg(F.sum(rdiff * rdiff).cast("bigint").alias("dist2"))
    )
    return (
        rer.join(cand, "vec_id")
        .select("vec_id", "adc_d2", "dist2")
        .orderBy("dist2", "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# BQ (sign-bit binary quantization) — shared arithmetic + saved index
# ---------------------------------------------------------------------------

BQ_CAND = 50
BQ_K = 10

#: Sign-bit pack of one 32-dim slice into a BIGINT: bit i set iff the
#: component is >= 0.  Two applications (offsets 1 and 33) collapse a
#: 64-dim vector to 16 bytes — the 64x compression of every vector
#: store's BQ tier.  Single home of the pack arithmetic: the staged/
#: registered sim_bq_hamming_topk body, the probe script, and the
#: index writer all call :func:`bq_signatures_frame`.
_BQ_PACK = (
    "aggregate(zip_with(slice(embedding, {o}, 32), sequence(0, 31),"
    " (v, i) -> IF(v >= 0, shiftleft(1L, i), 0L)), 0L, (a, x) -> a + x)"
)


def bq_signatures_frame(e: DataFrame, with_vectors: bool = False) -> DataFrame:
    """Sign-bit signatures (vec_id, h0, h1) of an embeddings frame.

    ``with_vectors=True`` additionally carries the double-cast raw
    vector and its norm (emb, nv) — the in-suite search shape, where
    one materialized pass serves both the Hamming scan and the exact
    rerank.  The compact ``False`` shape is what the saved index
    persists: 16 bytes/vector, rerank vectors stay in the source."""
    cols = [
        F.col("vec_id"),
        F.expr(_BQ_PACK.format(o=1)).cast("bigint").alias("h0"),
        F.expr(_BQ_PACK.format(o=33)).cast("bigint").alias("h1"),
    ]
    if not with_vectors:
        return e.select(*cols)
    return e.select(
        *cols, as_double(F.col("embedding")).alias("emb")
    ).withColumn("nv", norm(F.col("emb")))


def bq_write_index(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist the BQ signature table — the FIFTH saved-index artifact,
    following the quantizer/minhash/IVF/PQ precedent:

    * ``<table>``: (vec_id, h0, h1) — the sign-bit signatures ONLY,
      16 bytes/vector.  Unlike the in-suite search frame the artifact
      deliberately does NOT carry raw vectors: the Hamming scan is the
      whole point of BQ (branch-free xor+popcount over two BIGINT
      columns), and the exact rerank touches only ``BQ_CAND`` raw
      vectors fetched from the source by key.  ``bucketBy(vec_id)`` +
      ``sortBy(vec_id)`` so any vec_id-keyed consumer join (rerank
      fetch, metadata attach, cross-index intersection with the PQ
      codes artifact — also vec_id-bucketed) consumes the on-disk
      hash partitioning without an exchange.

    The corpus-wide encode pass runs ONCE here; the read path
    (:func:`bq_topk_from_index`) never packs a corpus signature."""
    sig = bq_signatures_frame(load(spark, sf_dir, "embeddings"))
    w = (
        sig.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "vec_id")
        .sortBy("vec_id")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bq_topk_from_index(
    spark: SparkSession,
    table: str,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    n_cand: int = BQ_CAND,
    k: int = BQ_K,
) -> DataFrame:
    """BQ search against a :func:`bq_write_index` artifact — NO corpus
    re-encoding: the query signature is a point lookup IN the saved
    table, the Hamming scan reads the two signature words only, and
    the exact cosine rerank fetches the ``n_cand`` winners' raw
    vectors from the source by key (broadcast-joined: the corpus side
    never shuffles).  Ranking is pinned equal to the
    sim_bq_hamming_topk body in tests/test_bucketing.py::
    test_bq_index_persist_reload, which also monkeypatch-raises
    :func:`bq_signatures_frame` to prove the read path trains
    nothing.

    Consumer posture: like the IVF/PQ artifacts, set
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` in
    the reading session so vec_id-keyed plans keep the bucketed
    scan."""
    return bq_search_signatures(
        spark, spark.table(table), sf_dir, query_vec_id, n_cand, k
    )


def bq_search_signatures(
    spark: SparkSession,
    sig: DataFrame,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    n_cand: int = BQ_CAND,
    k: int = BQ_K,
) -> DataFrame:
    """BQ search over a PRE-ENCODED signature frame ``sig(vec_id, h0,
    h1)`` — the single home of the from-index search arithmetic,
    shared by :func:`bq_topk_from_index` (saved-table flavor) and the
    registered ``sim_bq_hamming_topk``'s ``TROPOLOGY_BQ_INDEX_DIR``
    reload path, so the driver-checked op and the serving artifact
    cannot drift.  Pinned equal to the in-suite single-pass body in
    tests/test_bucketing.py::test_bq_index_persist_reload."""
    q_sig = sig.filter(F.col("vec_id") == query_vec_id).select(
        F.col("h0").alias("q0"), F.col("h1").alias("q1")
    )
    cand = (
        sig.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q_sig))
        .select(
            "vec_id",
            F.expr("CAST(bit_count(h0 ^ q0) + bit_count(h1 ^ q1) AS BIGINT)")
            .alias("hamming"),
        )
        .orderBy("hamming", "vec_id")
        .limit(n_cand)
    )
    ev = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .withColumn("nv", norm(F.col("emb")))
    )
    qv = ev.filter(F.col("vec_id") == query_vec_id).select(
        F.col("emb").alias("qemb"), F.col("nv").alias("nq")
    )
    rer = (
        ev.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "hamming",
            F.round(
                dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6
            ).alias("cosine"),
        )
    )
    return rer.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k).select(
        "vec_id", "hamming", "cosine"
    )


# ---------------------------------------------------------------------------
# IVF+PQ composite — the SIXTH saved-index artifact
# ---------------------------------------------------------------------------


def _ivfpq_build_frames(
    spark: SparkSession,
    sf_dir: str,
    lloyd_iters: int = 1,
    e: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the IVF+PQ composite's three artifact frames — ``(inv,
    cen, cb)``: the (vec_id, cell, s, code) composite inverted file,
    the k-row centroid table of the LAST coarse round, and the PQ
    codebook.  Single home of the BUILD: :func:`ivfpq_write_index`
    (bucketed catalog artifact) and the registered sim_ivfpq_topk's
    ``TROPOLOGY_IVFPQ_INDEX_DIR`` write-if-missing path both call it,
    so the two artifact flavors cannot drift."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    ev = e.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    ).withColumn("nv", norm(F.col("emb")))
    assign0 = ev.select("vec_id", F.col("label").alias("cell"))
    _, assign, cen = lloyd_rounds(
        ev.select("vec_id", "emb", "nv"), assign0, lloyd_iters, return_cen=True
    )
    sub = _pq_sub(_pq_exm(e))
    cb = _pq_cb(sub)
    enc0 = _pq_enc0(sub, cb)
    w_enc = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    enc = (
        enc0.withColumn("rn", F.row_number().over(w_enc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code")
    )
    inv = enc.join(assign, "vec_id").select("vec_id", "cell", "s", "code")
    return inv, cen, cb


def ivfpq_write_index(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    n_buckets: int = 16,
    lloyd_iters: int = 1,
    path: str | None = None,
    e: DataFrame | None = None,
) -> None:
    """Persist the IVF+PQ composite index (the staged sim_ivfpq_topk's
    at-scale posture, and the classic on-disk layout of production
    vector indexes: coarse cells prune I/O, PQ codes shrink what's
    read) — the SIXTH saved-index artifact, following the quantizer/
    minhash/IVF/PQ/BQ precedent:

    * ``<table>``: the composite inverted file — (vec_id, cell, s,
      code): every vector's PQ codes keyed by its coarse cell,
      ``bucketBy(cell)`` + ``sortBy(cell, vec_id, s)``.  A probe reads
      ``n_probe`` of ``n_buckets`` buckets (bucket pruning) and those
      buckets hold 2 small ints per vector (the 64× PQ compression) —
      both prunings compose in ONE artifact.
    * ``<table>_centroids``: the k-row (cell, cemb, nc) table of the
      LAST coarse-training round — what the probe scores against.
    * ``<table>_codebook``: the PQ k×d codebook (code, s, pos, cm).

    Both training passes (Lloyd assignment + argmin encoding) run ONCE
    here; the read path (:func:`ivfpq_topk_from_index`) trains
    nothing and never reads a raw corpus vector except the ``n_cand``
    rerank rows.  ``e=`` overrides the embeddings frame — needs
    (vec_id, label, embedding); weak-scaling probe kwarg
    (tools/scale_probes/ivfpq_scale.py)."""
    inv, cen, cb = _ivfpq_build_frames(spark, sf_dir, lloyd_iters, e)
    w = (
        inv.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "cell")
        .sortBy("cell", "vec_id", "s")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    cw = cen.write.mode("overwrite").format("parquet")
    if path is not None:
        cw = cw.option("path", path + "_centroids")
    cw.saveAsTable(table + "_centroids")
    bw = cb.write.mode("overwrite").format("parquet")
    if path is not None:
        bw = bw.option("path", path + "_codebook")
    bw.saveAsTable(table + "_codebook")


def ivfpq_topk_from_index(
    spark: SparkSession,
    table: str,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    n_probe: int = 2,
    n_cand: int = _PQ_CAND,
    k: int = 10,
    e: DataFrame | None = None,
) -> DataFrame:
    """IVF+PQ search against an :func:`ivfpq_write_index` artifact —
    NO coarse training, NO codebook rebuild, NO corpus re-encoding:
    the probe scores the query against the broadcast saved centroids
    and pushes the winning cells into the code scan as a LITERAL
    ``cell IN (...)`` predicate (bucket pruning: ``SelectedBucketsCount:
    n_probe out of n_buckets``), the ADC sum reads 2 ints per
    surviving vector, and only the ``n_cand`` rerank rows touch raw
    vectors (point lookups in the source).  Ranking is pinned equal to
    the staged sim_ivfpq_topk in tests/test_bucketing.py::
    test_ivfpq_index_persist_reload.

    Consumer posture: like the IVF/PQ artifacts, set
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` in
    the reading session or Spark drops the bucketed scan and with it
    the pruning.  ``e=`` overrides the query/rerank vector source
    (probe kwarg — must be the corpus the index was built on)."""
    return ivfpq_search_frames(
        spark,
        spark.table(table),
        spark.table(table + "_centroids"),
        spark.table(table + "_codebook"),
        sf_dir,
        query_vec_id=query_vec_id,
        n_probe=n_probe,
        n_cand=n_cand,
        k=k,
        e=e,
    )


def ivfpq_search_frames(
    spark: SparkSession,
    inv: DataFrame,
    cen: DataFrame,
    cb: DataFrame,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    n_probe: int = 2,
    n_cand: int = _PQ_CAND,
    k: int = 10,
    e: DataFrame | None = None,
) -> DataFrame:
    """IVF+PQ search over PRE-TRAINED artifact frames — ``inv``
    (vec_id, cell, s, code), ``cen`` (cell, cemb, nc), ``cb`` (code,
    s, pos, cm) — the single home of the from-index search arithmetic,
    shared by :func:`ivfpq_topk_from_index` (bucketed saved-table
    flavor) and the registered ``sim_ivfpq_topk``'s
    ``TROPOLOGY_IVFPQ_INDEX_DIR`` reload path (plain-parquet flavor),
    so the driver-checked op and the serving artifact cannot drift —
    the bq_search_signatures precedent.  Trains nothing: centroids and
    codebook can only come from the caller's frames."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == query_vec_id).select(
        as_double(F.col("embedding")).alias("qemb")
    ).withColumn("nq", norm(F.col("qemb")))
    probe_rows = (
        qv.crossJoin(F.broadcast(cen))
        .select(
            "cell",
            F.round(
                dot(F.col("qemb"), F.col("cemb")) / (F.col("nq") * F.col("nc")), 6
            ).alias("ccos"),
        )
        .orderBy(F.col("ccos").desc(), F.col("cell"))
        .limit(n_probe)
        .collect()
    )
    probe_cells = [r["cell"] for r in probe_rows]
    cand_codes = inv.filter(
        F.col("cell").isin(probe_cells) & (F.col("vec_id") != query_vec_id)
    )
    qexm = _pq_exm(e.filter(F.col("vec_id") == query_vec_id))
    qd = _pq_enc0(_pq_sub(qexm), cb).select(
        "s", "code", F.col("d2").alias("qd2")
    )
    adc = (
        cand_codes.join(F.broadcast(qd), ["s", "code"])
        .groupBy("vec_id", "cell")
        .agg(F.sum("qd2").cast("bigint").alias("adc_d2"))
    )
    candk = adc.orderBy("adc_d2", "vec_id").limit(n_cand)
    qm = qexm.select(F.col("pos").alias("qpos"), F.col("vm").alias("qm"))
    rdiff = F.col("vm") - F.col("qm")
    rer = (
        _pq_exm(e)
        .join(candk.select("vec_id"), "vec_id", "left_semi")
        .join(F.broadcast(qm), F.col("pos") == F.col("qpos"))
        .groupBy("vec_id")
        .agg(F.sum(rdiff * rdiff).cast("bigint").alias("dist2"))
    )
    return (
        rer.join(candk, "vec_id")
        .select("vec_id", "cell", "adc_d2", "dist2")
        .orderBy("dist2", "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# M112 — ANN recall audit (approx vs exact ground truth)
# ---------------------------------------------------------------------------

# Composed textually from the two already-registered oracles: DuckDB
# accepts a full WITH...SELECT as a CTE body, so the audit oracle IS
# the two audited oracles joined — no re-derivation to drift.
from tropology_spark.registry import ORACLES as _ORACLES

_RECALL_ORACLE = f"""
    WITH exact AS ({_ORACLES['sim_topk_cosine']}),
         approx AS ({_ORACLES['sim_ivf_topk']})
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST(count(*) AS BIGINT) AS n_hit,
           round(CAST(count(*) AS DOUBLE)
                 / (SELECT count(*) FROM exact), 6) AS recall_at_10
    FROM exact JOIN approx ON exact.vec_id = approx.vec_id
"""


@register("sim_ann_recall", oracle=_RECALL_ORACLE)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M112 — the ANN quality gate: recall@10 of the IVF 2-probe search
    (sim_ivf_topk) against the brute-force ground truth
    (sim_topk_cosine) for the fixture query vector.  Production vector
    search ships with exactly this audit — approximate indexes are
    only trustworthy alongside a measured recall, and at 100 TB the
    audit runs on a sampled query set while the index serves the rest.

    Both branches are the already-verified query pipelines; the audit
    adds one tiny join + count, so the oracle composes the two audited
    oracles verbatim.  The two 10-row result sets are checkpointed
    because each is referenced twice (count + hit join) and Spark
    would re-run the full pipeline per reference (46 exchanges
    measured, half after)."""
    exact = (
        sim_topk_cosine(spark, sf_dir).select("vec_id").localCheckpoint(eager=True)
    )
    approx = (
        sim_ivf_topk(spark, sf_dir).select("vec_id").localCheckpoint(eager=True)
    )
    n_exact = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    n_hit = (
        exact.join(approx, "vec_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    return n_exact.crossJoin(n_hit).select(
        "n_exact",
        "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_exact"), 6).alias(
            "recall_at_10"
        ),
    )


@register(
    "sim_norm_histogram",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i) s
    ),
    n2 AS (SELECT vec_id, round(sum(val * val), 6) AS norm2 FROM ex GROUP BY vec_id)
    SELECT CAST(floor(norm2) AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(vec_id) AS BIGINT) AS first_vec
    FROM n2 GROUP BY band
    """,
)
def sim_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M123 — embedding-norm histogram: the vector-quality audit run
    before any similarity work (zero / degenerate / unnormalized
    vectors show up as outlier bands).  Bands are unit-wide in norm²
    so no sqrt enters the comparison; the band edge is taken on the
    6-dp-rounded sum — same accepted-risk class as the sim family's
    rounded cosines (a flip needs a norm² within 5e-7 of an integer
    AND a cross-engine ulp disagreement at that exact point).  Scale:
    one narrow pass computing a per-row scalar, then a
    map-side-combinable groupBy on a ~100-value key — pure scan
    throughput."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    norm2 = F.round(dot(F.col("emb"), F.col("emb")), 6)
    return (
        e.select("vec_id", F.floor(norm2).cast("bigint").alias("band"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").cast("bigint").alias("first_vec"),
        )
    )


# ---------------------------------------------------------------------------
# M143 — ColBERT-style MaxSim late-interaction scoring
# ---------------------------------------------------------------------------

_MS_CHUNKS = 4
_MS_CW = EMB_DIM // _MS_CHUNKS  # 16 dims per chunk


@register(
    "sim_maxsim_topk",
    oracle=_EX_CTE
    + f"""
    , cx AS (
      SELECT vec_id, (pos - 1) // {_MS_CW} AS ck, (pos - 1) % {_MS_CW} AS r, val
      FROM ex
    ),
    cn AS (SELECT vec_id, ck, sqrt(sum(val * val)) AS n FROM cx GROUP BY 1, 2),
    dp AS (
      SELECT d.vec_id, q.ck AS qck, d.ck AS dck, sum(d.val * q.val) AS dp
      FROM cx d JOIN cx q ON q.vec_id = {QUERY_VEC_ID} AND d.r = q.r
      WHERE d.vec_id <> {QUERY_VEC_ID}
      GROUP BY 1, 2, 3
    ),
    cm AS (
      SELECT dp.vec_id, dp.qck,
             CAST(round(dp.dp / (cq.n * cd.n) * 1000000) AS BIGINT) AS cos_micro
      FROM dp
      JOIN cn cq ON cq.vec_id = {QUERY_VEC_ID} AND cq.ck = dp.qck
      JOIN cn cd ON cd.vec_id = dp.vec_id AND cd.ck = dp.dck
    ),
    mx AS (SELECT vec_id, qck, max(cos_micro) AS m FROM cm GROUP BY 1, 2),
    sc AS (SELECT vec_id, CAST(sum(m) AS BIGINT) AS maxsim_micro
           FROM mx GROUP BY vec_id)
    SELECT vec_id, maxsim_micro
    FROM sc ORDER BY maxsim_micro DESC, vec_id LIMIT 10
    """,
)
def sim_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M143 — late-interaction MaxSim scoring (the ColBERT retrieval
    operator, Khattab & Zaharia SIGIR'20 — public algorithm): treating
    each vector's {_MS_CHUNKS} contiguous {_MS_CW}-dim slices as its
    "token embeddings", score(query, doc) = Σ over query chunks of the
    MAX chunk-cosine against any doc chunk; top-10 docs by score.
    Determinism: each chunk-cosine becomes an INTEGER (µ-units,
    rounded once); max and sum over integers are order-free, and the
    rank carries the unique vec_id tie-break — stricter than the
    rounded-double convention the rest of the sim family uses.

    Scale: the doc side explodes 1→{_MS_CHUNKS} chunk rows (narrow, no
    shuffle); the query's chunk table is {_MS_CHUNKS} rows broadcast;
    per doc the {_MS_CHUNKS}×{_MS_CHUNKS} interaction stays inside one
    partition and reduces by two map-side-combinable aggs.  This is
    the exact-rerank stage of a token-level retrieval pipeline — the
    candidate pre-filter at 100 TB is IVF/LSH (M7/M90) over the
    pooled vectors."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    chunks = e.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("emb"), i * _MS_CW + 1, _MS_CW)
                    for i in range(_MS_CHUNKS)
                ]
            )
        ).alias("ck", "arr"),
    ).withColumn("n", norm(F.col("arr")))
    q = chunks.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("ck").alias("qck"), F.col("arr").alias("qarr"), F.col("n").alias("qn")
    )
    d = chunks.filter(F.col("vec_id") != QUERY_VEC_ID)
    cm = d.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "qck",
        F.round(
            dot(F.col("arr"), F.col("qarr")) / (F.col("n") * F.col("qn")) * 1000000
        )
        .cast("bigint")
        .alias("cos_micro"),
    )
    mx = cm.groupBy("vec_id", "qck").agg(F.max("cos_micro").alias("m"))
    sc = mx.groupBy("vec_id").agg(F.sum("m").cast("bigint").alias("maxsim_micro"))
    return sc.orderBy(F.col("maxsim_micro").desc(), F.col("vec_id")).limit(10)


# ---------------------------------------------------------------------------
# M148 — cluster-cohesion audit (per-label centroid cosine, integer µ)
# ---------------------------------------------------------------------------


@register(
    "sim_cluster_cohesion",
    oracle=_EX_CTE
    + """
    , cen AS (SELECT label, pos, avg(val) AS cval FROM ex GROUP BY label, pos),
    cn AS (SELECT label, sqrt(sum(cval * cval)) AS nc FROM cen GROUP BY label),
    vc AS (
      SELECT e.vec_id, e.label,
             CAST(round(sum(e.val * c.cval)
                        / (any_value(nrm.nv) * any_value(cn.nc)) * 1000000)
                  AS BIGINT) AS cos_micro
      FROM ex e
      JOIN cen c ON e.label = c.label AND e.pos = c.pos
      JOIN nrm ON e.vec_id = nrm.vec_id
      JOIN cn ON e.label = cn.label
      GROUP BY e.vec_id, e.label
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(cos_micro) AS BIGINT) AS sum_cos_micro,
           CAST((sum(cos_micro) + 1000000 * count(*)) // count(*) - 1000000
                AS BIGINT) AS cohesion_micro
    FROM vc GROUP BY label
    """,
)
def sim_cluster_cohesion(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M148 — intra-cluster cohesion audit: for each label, the mean
    cosine of member vectors to their OWN label centroid, carried as
    integers (per-vector cosine rounded once to µ-units, summed
    exactly, one integer division).  The quality gate on a clustering
    / IVF partition before trusting it for routing (J10 assigns to
    centroids; this scores how tight each cell actually is — loose
    cells need re-training or splitting).  Scale: centroids are
    O(labels×dim) from one map-side-combinable agg; members join their
    centroid BY LABEL (co-partitioned with the next agg, no pair
    work); everything after the first explode is label-keyed.

    ``e=`` substitutes the embeddings frame (the shift-constant audit
    injects adversarial negative-mean-cosine labels through it; the
    driver contract never passes it)."""
    ex = (
        (e if e is not None else load(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            "label",
            F.posexplode(as_double(F.col("embedding"))).alias("pos", "val"),
        )
    )
    cen = ex.groupBy("label", "pos").agg(F.avg("val").alias("cval"))
    cn = cen.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("nc")
    )
    nv = ex.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nv")
    )
    vc = (
        ex.join(cen, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("val") * F.col("cval")).alias("dp"))
        .join(nv, "vec_id")
        .join(F.broadcast(cn), "label")
        .select(
            "label",
            F.round(F.col("dp") / (F.col("nv") * F.col("nc")) * 1000000)
            .cast("bigint")
            .alias("cos_micro"),
        )
    )
    return (
        vc.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum("cos_micro").cast("bigint").alias("sum_cos_micro"),
        )
        .withColumn(
            # +1e6 shift keeps the numerator non-negative (cos >= -1),
            # where DuckDB's floor-div (//) and Spark's trunc-div (div)
            # agree; subtracting the shift back is exact.
            "cohesion_micro",
            F.expr(
                "(sum_cos_micro + 1000000 * n_vectors) div n_vectors - 1000000"
            ).cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# M151 — L2-distance top-k (the metric twin of J8's cosine)
# ---------------------------------------------------------------------------


@register(
    "sim_topk_l2",
    oracle=_EX_CTE
    + f"""
    , q AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (SELECT e.vec_id,
                 CAST(round(sum((e.val - q.val) * (e.val - q.val)) * 1000000)
                      AS BIGINT) AS d2_micro
          FROM ex e JOIN q ON e.pos = q.pos
          WHERE e.vec_id <> {QUERY_VEC_ID}
          GROUP BY e.vec_id)
    SELECT vec_id, d2_micro
    FROM d ORDER BY d2_micro, vec_id LIMIT 10
    """,
)
def sim_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M151 — brute-force SQUARED-L2 top-10 for one query vector: the
    metric twin of J8's cosine (embeddings trained with L2 objectives
    rank differently from cosine unless normalized — a retrieval
    engine must offer both).  The squared distance becomes one integer
    (µ-units, rounded once; sums of 64 exact fp64 squares drift ~1e-14,
    far inside the bucket), ranked ascending with the unique vec_id
    tie-break — no sqrt, which preserves order and exactness.
    Scale: identical plan to J8 — query row broadcast, corpus scanned
    once, per-row array fold, global top-10; the ANN pre-filter at
    100 TB is the same IVF/LSH family re-keyed for L2 (cell metric
    changes, plan shape does not)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qemb")
    )
    diff2 = F.aggregate(
        F.zip_with(F.col("emb"), F.col("qemb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(diff2 * 1000000).cast("bigint").alias("d2_micro"),
        )
        .orderBy("d2_micro", "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# M160 — batched multi-query top-k (the serving-path retrieval shape)
# ---------------------------------------------------------------------------

_BATCH_Q = 10


@register(
    "sim_batch_topk",
    oracle=_EX_CTE
    + f"""
    , q AS (SELECT vec_id AS qid, pos, val FROM ex WHERE vec_id < {_BATCH_Q}),
    d AS (SELECT q.qid, e.vec_id, sum(e.val * q.val) AS dp
          FROM ex e JOIN q ON e.pos = q.pos
          WHERE e.vec_id >= {_BATCH_Q}
          GROUP BY q.qid, e.vec_id),
    cos AS (
      SELECT d.qid, d.vec_id,
             round(d.dp / (ne.nv * nq.nv), 6) AS cosine
      FROM d
      JOIN nrm ne ON d.vec_id = ne.vec_id
      JOIN nrm nq ON d.qid = nq.vec_id
    )
    SELECT qid, vec_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY cosine DESC, vec_id) AS rn
          FROM cos) t
    WHERE rn <= 3
    """,
)
def sim_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M160 — BATCHED top-k retrieval: {_BATCH_Q} query vectors scored
    against the corpus in ONE pass, top-3 each — the serving-path
    shape (queries arrive in batches; re-scanning the corpus per query
    multiplies cost by batch size).  Same 6-dp-rounded cosine + unique
    tie-break discipline as J8.  Scale: the query batch broadcasts
    (batch × dim doubles — tiny); the corpus scans once with a
    {_BATCH_Q}× in-partition fan-out, and the per-query rank
    partitions by qid — corpus never re-shuffles.  At 100 TB the same
    plan runs after an IVF/LSH candidate pre-filter per query."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    ).withColumn("nv", norm(F.col("emb")))
    q = e.filter(F.col("vec_id") < _BATCH_Q).select(
        F.col("vec_id").alias("qid"),
        F.col("emb").alias("qemb"),
        F.col("nv").alias("qn"),
    )
    cos = F.round(dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("qn")), 6)
    scored = (
        e.filter(F.col("vec_id") >= _BATCH_Q)
        .crossJoin(F.broadcast(q))
        .select("qid", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w).cast("bigint")).filter(
        F.col("rn") <= 3
    )


# ---------------------------------------------------------------------------
# M178/M182 — recall audits for the OTHER two approximate indexes
# ---------------------------------------------------------------------------

_LSH_RECALL_ORACLE = f"""
    WITH exact AS ({_ORACLES['sim_topk_cosine']}),
         approx AS ({_ORACLES['sim_rp_lsh_topk']})
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST(count(*) AS BIGINT) AS n_hit,
           round(CAST(count(*) AS DOUBLE)
                 / (SELECT count(*) FROM exact), 6) AS recall_at_10
    FROM exact JOIN approx ON exact.vec_id = approx.vec_id
"""


@register("sim_lsh_recall", oracle=_LSH_RECALL_ORACLE)
def sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M178 — recall@10 of the multi-table hyperplane-LSH index
    (sim_rp_lsh_topk) against brute force, completing the audit pair
    M112 opened for IVF: every approximate index in the registry now
    ships with its own measured recall (the dedup family's
    J3→dedup_lsh_recall discipline applied to vector search).  The
    oracle composes the two REGISTERED oracles (never copied strings
    — the _J2_ORACLE rule), so index and audit cannot drift.

    Both 10-row branches are checkpointed (double-reference rule:
    count + hit join)."""
    exact = (
        sim_topk_cosine(spark, sf_dir).select("vec_id").localCheckpoint(eager=True)
    )
    approx = (
        sim_rp_lsh_topk(spark, sf_dir).select("vec_id").localCheckpoint(eager=True)
    )
    n_exact = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    n_hit = exact.join(approx, "vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit")
    )
    return n_exact.crossJoin(n_hit).select(
        "n_exact",
        "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_exact"), 6).alias(
            "recall_at_10"
        ),
    )


_PQ_RECALL_ORACLE = f"""
    WITH exact AS ({_ORACLES['sim_topk_l2']}),
         approx AS ({_ORACLES['sim_pq_topk']})
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST(count(*) AS BIGINT) AS n_hit,
           round(CAST(count(*) AS DOUBLE)
                 / (SELECT count(*) FROM exact), 6) AS recall_at_10
    FROM exact JOIN approx ON exact.vec_id = approx.vec_id
"""


@register("sim_pq_recall", oracle=_PQ_RECALL_ORACLE)
def sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M182 — recall@10 of the product-quantization ADC search
    (sim_pq_topk) against the EXACT squared-L2 top-10 (sim_topk_l2 —
    the right ground truth: PQ approximates L2 distance, not cosine).
    Same composed-oracle + checkpointed-branch shape as M112/M178;
    with this, all three approximate indexes (IVF, LSH, PQ) carry a
    registered recall audit."""
    exact = (
        sim_topk_l2(spark, sf_dir).select("vec_id").localCheckpoint(eager=True)
    )
    approx = (
        sim_pq_topk(spark, sf_dir).select("vec_id").localCheckpoint(eager=True)
    )
    n_exact = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    n_hit = exact.join(approx, "vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit")
    )
    return n_exact.crossJoin(n_hit).select(
        "n_exact",
        "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_exact"), 6).alias(
            "recall_at_10"
        ),
    )


# ---------------------------------------------------------------------------
# M201 — cosine range search (threshold query, the top-k dual)
# ---------------------------------------------------------------------------

_RANGE_TAU = 0.1


@register(
    "sim_range_search",
    oracle=_EX_CTE
    + f"""
    , q AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (SELECT e.vec_id, sum(e.val * q.val) AS dp
          FROM ex e JOIN q ON e.pos = q.pos
          WHERE e.vec_id <> {QUERY_VEC_ID}
          GROUP BY e.vec_id)
    SELECT d.vec_id, round(d.dp / (n1.nv * n2.nv), 6) AS cosine
    FROM d
    JOIN nrm n1 ON d.vec_id = n1.vec_id
    CROSS JOIN (SELECT nv FROM nrm WHERE vec_id = {QUERY_VEC_ID}) n2
    WHERE round(d.dp / (n1.nv * n2.nv), 6) >= {_RANGE_TAU}
    ORDER BY d.vec_id
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M201 — RANGE search: every vector with cosine ≥ τ to the query,
    the dual of J8's top-k (retrieval wants "the 10 best"; dedup,
    recall evaluation, and radius-based clustering want "everything
    this similar").  Result size is data-dependent, so the contract is
    the threshold, not a k — the missing member of the exact-search
    family (J8 top-k cosine, M151 top-k L2, M160 batched top-k).

    Exactness: same accepted-risk envelope as J8 — the filter compares
    the 6-dp-rounded cosine (both engines round the same double), and
    the output key is the unique vec_id, so row membership is the only
    cross-engine surface; a flip needs a cosine within ~1e-7 of τ.

    Scale: one broadcast of the query vector, one corpus scan, no
    shuffle at all until the (absent) aggregation — the filter
    replaces top-k's TakeOrdered.  The IVF/LSH indexes (M7/M90) serve
    the same query approximately by probing only nearby cells."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        as_double(F.col("embedding")).alias("emb"),
    ).withColumn("nv", norm(F.col("emb")))
    q = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("emb").alias("qemb"), F.col("nv").alias("nq"))
    )
    cos = F.round(dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6)
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= _RANGE_TAU)
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# M222 — IVF cell-balance stats (index-health audit of the learned quantizer)
# ---------------------------------------------------------------------------


@register(
    "sim_ivf_cell_stats",
    oracle=KNN_ASSIGN_CTE
    + """
    , cs AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs
             FROM assign GROUP BY cell),
    t AS (SELECT cs.*, CAST(sum(n_vecs) OVER () AS BIGINT) AS total FROM cs)
    SELECT CAST(cell AS BIGINT) AS cell, n_vecs,
           CAST((1000000 * n_vecs) // total AS BIGINT) AS share_ppm,
           CAST(row_number() OVER (ORDER BY n_vecs DESC, cell) AS BIGINT) AS rn
    FROM t
    """,
)
def sim_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M222 — posting-list balance of the learned coarse quantizer:
    per cell, its vector count, corpus share in ppm, and size rank —
    the M211 index-health discipline applied to the IVF/kNN family
    (skewed cells are exactly what makes an IVF probe or the J9/M2/
    M189 cell-blocked pair join slow; this is the meter an ANN
    deployment watches before it reshards or re-trains).

    Composed, not copied: the oracle extends ``KNN_ASSIGN_CTE``
    verbatim (the single SQL home of the quantizer arithmetic) and
    the Spark side reads the session-shared
    ``quantizer_assign_materialized`` view — one Lloyd build serves
    J9 + M2 + M189 + this audit.

    Scale: the assignment collapses to O(k)=O(√n) cell counts in one
    map-side-combinable rollup; the share/rank windows ride the
    bounded cell axis on the pmod constant key (global_order.py
    idiom — no partition-less WindowExec), and ppm is positive-
    integer ``div`` (cross-engine exact)."""
    _, assign = quantizer_assign_materialized(spark, sf_dir)
    cs = assign.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
    ck = F.pmod(F.col("cell"), F.lit(1))
    tw = Window.partitionBy(ck)
    rw = Window.partitionBy(ck).orderBy(F.desc("n_vecs"), F.asc("cell"))
    return (
        cs.withColumn("total", F.sum("n_vecs").over(tw).cast("bigint"))
        .withColumn("rn", F.row_number().over(rw).cast("bigint"))
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            "n_vecs",
            F.expr("(1000000 * n_vecs) div total").cast("bigint").alias("share_ppm"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# M232 sim_rrf_fusion — reciprocal-rank fusion of the cosine and L2 top-k
# ---------------------------------------------------------------------------

_RRF_K = 60


def _rrf_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH cg AS ({ORACLES['sim_topk_cosine']}),
    lg AS ({ORACLES['sim_topk_l2']}),
    cr AS (SELECT vec_id,
                  row_number() OVER (ORDER BY cosine DESC, vec_id) AS rk
           FROM cg),
    lr AS (SELECT vec_id,
                  row_number() OVER (ORDER BY d2_micro, vec_id) AS rk
           FROM lg),
    u AS (SELECT * FROM cr UNION ALL SELECT * FROM lr),
    s AS (SELECT vec_id,
                 CAST(sum(1000000000 // ({_RRF_K} + rk)) AS BIGINT) AS rrf_nano,
                 CAST(count(*) AS BIGINT) AS n_lists
          FROM u GROUP BY vec_id)
    SELECT vec_id, rrf_nano, n_lists,
           CAST(row_number() OVER (ORDER BY rrf_nano DESC, vec_id) AS BIGINT)
             AS rn
    FROM s
    """


@register("sim_rrf_fusion", oracle=_rrf_oracle())
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M232 — RECIPROCAL-RANK FUSION of the two exact
    retrieval lists (J8 cosine, M151 squared-L2) for the query
    vector: score = Σ 1/(60+rank) over the lists a vector appears in
    — the standard zero-tuning hybrid-retrieval combiner.  Each term
    is the exact integer ``10⁹ div (60+rank)`` (positive — DuckDB
    ``//`` and Spark ``div`` agree), so the fused score crosses the
    engine hash gate bit-for-bit where the textbook float sum could
    not.  Composed, not copied: both input lists come from the
    REGISTERED queries / ORACLES verbatim.

    Scale: the inputs are top-k lists (k rows each) — everything
    after retrieval is broadcast-sized; rank windows ride the pmod
    constant key over ≤ k rows."""
    from tropology_spark.registry import QUERIES

    c = QUERIES["sim_topk_cosine"](spark, sf_dir)
    l2 = QUERIES["sim_topk_l2"](spark, sf_dir)
    ck = F.pmod(F.col("vec_id"), F.lit(1))
    cr = c.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy(ck).orderBy(F.desc("cosine"), F.asc("vec_id"))
        ),
    ).select("vec_id", "rk")
    lr = l2.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy(ck).orderBy(F.asc("d2_micro"), F.asc("vec_id"))
        ),
    ).select("vec_id", "rk")
    s = (
        cr.unionByName(lr)
        .groupBy("vec_id")
        .agg(
            F.expr(f"sum(1000000000 div ({_RRF_K} + rk))")
            .cast("bigint")
            .alias("rrf_nano"),
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        )
    )
    return s.withColumn(
        "rn",
        F.row_number()
        .over(
            Window.partitionBy(ck).orderBy(F.desc("rrf_nano"), F.asc("vec_id"))
        )
        .cast("bigint"),
    )


# ---------------------------------------------------------------------------
# M241 sim_recall_at_k_curve — recall@{1,3,5,10} of the IVF search
# ---------------------------------------------------------------------------

_RECALL_KS = (1, 3, 5, 10)


def _recall_curve_oracle() -> str:
    from tropology_spark.registry import ORACLES

    ks = ", ".join(str(k) for k in _RECALL_KS)
    return f"""
    WITH exact AS ({ORACLES['sim_topk_cosine']}),
    approx AS ({ORACLES['sim_ivf_topk']}),
    er AS (SELECT vec_id,
                  row_number() OVER (ORDER BY cosine DESC, vec_id) AS rk
           FROM exact),
    ar AS (SELECT vec_id,
                  row_number() OVER (ORDER BY cosine DESC, vec_id) AS rk
           FROM approx),
    ks AS (SELECT unnest([{ks}]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(count(ar.vec_id) AS BIGINT) AS n_hits,
           CAST((1000000 * count(ar.vec_id)) // ks.k AS BIGINT) AS recall_ppm
    FROM ks
    LEFT JOIN er ON er.rk <= ks.k
    LEFT JOIN ar ON ar.vec_id = er.vec_id AND ar.rk <= ks.k
    GROUP BY ks.k
    """


@register("sim_recall_at_k_curve", oracle=_recall_curve_oracle())
def sim_recall_at_k_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M241 — the recall CURVE of the IVF search against the
    brute-force ground truth: recall@k for k in {1,3,5,10} — M112's
    single-number audit widened to the curve an index-tuning session
    actually reads (recall@1 tells you about the top hit, recall@10
    about the candidate pool; probes/cells are tuned to the k the
    product serves).  Hit = ground-truth rank ≤ k AND found by the
    index within its own top k.

    Composed, not copied: both lists are the REGISTERED queries /
    ORACLES verbatim; ranks derive from each list's own (cosine DESC,
    vec_id) order.  Scale: the retrievals dominate (already audited);
    the curve is arithmetic over two ≤10-row lists — every join here
    is broadcast-trivial, windows ride the pmod key."""
    from tropology_spark.registry import QUERIES

    exact = QUERIES["sim_topk_cosine"](spark, sf_dir)
    approx = QUERIES["sim_ivf_topk"](spark, sf_dir)
    ck = F.pmod(F.col("vec_id"), F.lit(1))
    rw = Window.partitionBy(ck).orderBy(F.desc("cosine"), F.asc("vec_id"))
    er = exact.select("vec_id", F.row_number().over(rw).alias("rk"))
    ar = approx.select(
        F.col("vec_id").alias("a_id"), F.row_number().over(rw).alias("a_rk")
    )
    ks = spark.createDataFrame([(k,) for k in _RECALL_KS], "k long")
    pairs = er.crossJoin(F.broadcast(ks)).filter(F.col("rk") <= F.col("k"))
    hits = pairs.join(
        F.broadcast(ar),
        (F.col("a_id") == F.col("vec_id")) & (F.col("a_rk") <= F.col("k")),
        "left",
    )
    return hits.groupBy("k").agg(
        F.count(F.col("a_id")).cast("bigint").alias("n_hits"),
        F.expr("(1000000 * count(a_id)) div k").cast("bigint").alias("recall_ppm"),
    ).select(F.col("k").cast("bigint").alias("k"), "n_hits", "recall_ppm")


# ---------------------------------------------------------------------------
# M244 sim_ivf_batch_topk — the batch IVF serving path (one probe join)
# ---------------------------------------------------------------------------

_BATCH_QUERY_IDS = (0, 7, 19, 23, 42)
_BATCH_K = 5
_BATCH_PROBE = 2


def _ivf_batch_oracle() -> str:
    qids = ", ".join(str(q) for q in _BATCH_QUERY_IDS)
    return (
        _EX_CTE
        + """
    , assign0 AS (SELECT vec_id, label AS cell FROM embeddings)
    """
        + _LLOYD_SQL_ITER.format(n=1, p=0, vf="")
        + f"""
    , assign AS (SELECT * FROM assign1),
    qs AS (SELECT unnest([{qids}]) AS q),
    probe AS (
      SELECT q, tcell AS pcell
      FROM (SELECT vc1.vec_id AS q, tcell,
                   row_number() OVER (PARTITION BY vc1.vec_id
                                      ORDER BY ccos DESC, tcell) AS rn
            FROM vc1 JOIN qs ON vc1.vec_id = qs.q) t
      WHERE rn <= {_BATCH_PROBE}
    ),
    cand AS (
      SELECT p.q, a.vec_id FROM assign a
      JOIN probe p ON a.cell = p.pcell
      WHERE a.vec_id <> p.q
    ),
    qv AS (SELECT qs.q, ex.pos, ex.val FROM ex JOIN qs ON ex.vec_id = qs.q),
    d AS (
      SELECT c.q, e.vec_id, sum(e.val * qv.val) AS dp
      FROM ex e JOIN cand c ON e.vec_id = c.vec_id
      JOIN qv ON qv.q = c.q AND e.pos = qv.pos
      GROUP BY c.q, e.vec_id
    ),
    cos AS (
      SELECT d.q, d.vec_id, round(d.dp / (n1.nv * n2.nv), 6) AS cosine
      FROM d JOIN nrm n1 ON d.vec_id = n1.vec_id
             JOIN nrm n2 ON d.q = n2.vec_id
    )
    SELECT CAST(q AS BIGINT) AS q, vec_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY q
                                       ORDER BY cosine DESC, vec_id) AS rn
          FROM cos) t
    WHERE rn <= {_BATCH_K}
    """
    )


@register("sim_ivf_batch_topk", oracle=_ivf_batch_oracle())
def sim_ivf_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M244 — BATCH IVF search: top-{k} per query for a SET of
    query vectors in ONE pass (probe table join), the serving shape a
    production retrieval tier actually runs — per-query searches
    re-scan the index |Q| times; the batch path joins the candidate
    set once and fans the rerank per (query, candidate) pair.  Same
    train/probe/rerank semantics as the registered sim_ivf_topk
    (label-seeded one-round assignment, {p}-cell probe, exact rerank),
    generalized from the scalar query to a query relation.  Measured
    at sf0.1: 4.13 s vs 8.13 s for the scalar loop over the same five
    queries (BASELINE.md round-9 table).

    Scale: the probe table is |Q|×{p} rows (broadcast); candidates are
    |Q|×(corpus/cells×{p}) — the IVF contract; the rerank joins each
    candidate to its query's broadcast vector, so the corpus is
    touched once regardless of |Q|."""
    # round-19: the (ev, vc, assign) train is the session-shared view
    # (identical label-seeded one-round training; the probe/rerank
    # below stay per-query-set).
    ev, vc, assign = ivf_train_materialized(spark, sf_dir)
    qset = list(_BATCH_QUERY_IDS)
    probe = (
        vc.filter(F.col("vec_id").isin(qset))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("ccos").desc(), F.col("cell")
                )
            ),
        )
        .filter(F.col("rn") <= _BATCH_PROBE)
        .select(F.col("vec_id").alias("q"), F.col("cell").alias("pcell"))
    )
    cand = (
        assign.join(F.broadcast(probe), assign.cell == F.col("pcell"))
        .filter(F.col("vec_id") != F.col("q"))
        .select("q", "vec_id")
    )
    qv = ev.filter(F.col("vec_id").isin(qset)).select(
        F.col("vec_id").alias("q"), F.col("emb").alias("qemb"), F.col("nv").alias("nq")
    )
    cos = (
        ev.select("vec_id", "emb", "nv")
        .join(cand, "vec_id")
        .join(F.broadcast(qv), "q")
        .select(
            "q",
            "vec_id",
            F.round(dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6)
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("q").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cos.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _BATCH_K)
        .select(F.col("q").cast("bigint").alias("q"), "vec_id", "cosine", "rn")
    )


sim_ivf_batch_topk.__doc__ = sim_ivf_batch_topk.__doc__.format(
    k=_BATCH_K, p=_BATCH_PROBE
)


# ---------------------------------------------------------------------------
# M252 sim_matryoshka_recall — prefix-dimension recall curve (MRL evaluation)
# ---------------------------------------------------------------------------

_MRL_PREFIXES = (8, 16, 32)
_MRL_K = 10


def _matryoshka_oracle() -> str:
    from tropology_spark.registry import ORACLES

    ps = ", ".join(str(p) for p in _MRL_PREFIXES)
    return (
        _EX_CTE
        + f"""
    , truth AS (
      SELECT vec_id FROM ({ORACLES['sim_topk_cosine']}) t
    ),
    ps AS (SELECT unnest([{ps}]) AS p),
    np AS (
      SELECT ps.p, ex.vec_id, sqrt(sum(val * val)) AS nv
      FROM ex JOIN ps ON ex.pos <= ps.p
      GROUP BY ps.p, ex.vec_id
    ),
    q AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (
      SELECT ps.p, e.vec_id, sum(e.val * q.val) AS dp
      FROM ex e JOIN q ON e.pos = q.pos
      JOIN ps ON e.pos <= ps.p
      WHERE e.vec_id <> {QUERY_VEC_ID}
      GROUP BY ps.p, e.vec_id
    ),
    scored AS (
      SELECT d.p, d.vec_id,
             round(d.dp / (n1.nv * n2.nv), 6) AS cosine
      FROM d
      JOIN np n1 ON d.p = n1.p AND d.vec_id = n1.vec_id
      JOIN np n2 ON d.p = n2.p AND n2.vec_id = {QUERY_VEC_ID}
    ),
    ranked AS (
      SELECT p, vec_id,
             row_number() OVER (PARTITION BY p
                                ORDER BY cosine DESC, vec_id) AS rn
      FROM scored
    )
    SELECT CAST(r.p AS BIGINT) AS prefix_dim,
           CAST(count(truth.vec_id) AS BIGINT) AS n_hits,
           CAST((1000000 * count(truth.vec_id)) // {_MRL_K} AS BIGINT)
             AS recall_ppm
    FROM ranked r LEFT JOIN truth ON r.vec_id = truth.vec_id
    WHERE r.rn <= {_MRL_K}
    GROUP BY r.p
    """
    )


@register("sim_matryoshka_recall", oracle=_matryoshka_oracle())
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M252 — MATRYOSHKA (prefix-dimension) recall curve: how
    much of the full-64-dim top-{k} survives when retrieval uses only
    the first {ps} dimensions — the evaluation that decides how far an
    MRL-trained embedding can be truncated for cheap first-stage
    retrieval (storage and bandwidth scale linearly with the kept
    prefix; recall@k is the price).  Truth is the REGISTERED J8
    brute-force list (composed, not copied); each prefix re-scores
    with prefix dot products and PREFIX norms (a truncated vector must
    be re-normalized, not just re-dotted).

    Scale: one corpus pass per prefix (the ×|prefixes| explode rides
    the bounded ps table); prefix dot/norm are array-slice aggregates
    (JVM-side, no UDF); ranks per prefix on the pmod constant key
    over the bounded candidate set."""
    from tropology_spark.registry import QUERIES

    truth = QUERIES["sim_topk_cosine"](spark, sf_dir).select(
        F.col("vec_id").alias("t_id")
    )
    e = load(spark, sf_dir, "embeddings")
    ps = spark.createDataFrame([(p,) for p in _MRL_PREFIXES], "p int")
    ev = iter_materialize(
        e.select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .crossJoin(F.broadcast(ps))
        .select(
            "vec_id",
            "p",
            F.expr("slice(emb, 1, p)").alias("pemb"),
        )
        .withColumn("nv", norm(F.col("pemb")))
    )  # referenced by the query row AND the candidate side
    q = ev.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("p").alias("qp"), F.col("pemb").alias("qemb"), F.col("nv").alias("nq")
    )
    scored = (
        ev.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q), F.col("p") == F.col("qp"))
        .select(
            "p",
            "vec_id",
            F.round(
                dot(F.col("pemb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6
            ).alias("cosine"),
        )
    )
    ranked = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("p").orderBy(F.col("cosine").desc(), F.col("vec_id"))
        ),
    ).filter(F.col("rn") <= _MRL_K)
    return (
        ranked.join(F.broadcast(truth), ranked.vec_id == F.col("t_id"), "left")
        .groupBy("p")
        .agg(
            F.count(F.col("t_id")).cast("bigint").alias("n_hits"),
            F.expr(f"(1000000 * count(t_id)) div {_MRL_K}")
            .cast("bigint")
            .alias("recall_ppm"),
        )
        .select(F.col("p").cast("bigint").alias("prefix_dim"), "n_hits", "recall_ppm")
    )


sim_matryoshka_recall.__doc__ = sim_matryoshka_recall.__doc__.format(
    k=_MRL_K, ps="/".join(str(p) for p in _MRL_PREFIXES)
)


# ---------------------------------------------------------------------------
# M256 sim_bq_hamming_topk — binary-quantization retrieval (sign bits +
# Hamming scan, exact cosine rerank)
# ---------------------------------------------------------------------------


def _bq_oracle() -> str:
    return (
        _EX_CTE
        + f"""
    , sig AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN pos <= 32 AND val >= 0
                           THEN (CAST(1 AS BIGINT) << CAST(pos - 1 AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS h0,
             CAST(sum(CASE WHEN pos > 32 AND val >= 0
                           THEN (CAST(1 AS BIGINT) << CAST(pos - 33 AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS h1
      FROM ex GROUP BY vec_id
    ),
    q AS (SELECT h0 AS q0, h1 AS q1 FROM sig WHERE vec_id = {QUERY_VEC_ID}),
    hd AS (
      SELECT s.vec_id,
             CAST(bit_count(xor(s.h0, q.q0))
                  + bit_count(xor(s.h1, q.q1)) AS BIGINT) AS hamming
      FROM sig s CROSS JOIN q
      WHERE s.vec_id <> {QUERY_VEC_ID}
    ),
    cand AS (SELECT vec_id, hamming FROM (
               SELECT *, row_number() OVER (ORDER BY hamming, vec_id) AS rb1
               FROM hd) t WHERE rb1 <= {BQ_CAND}),
    qv AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (SELECT e.vec_id, sum(e.val * qv.val) AS dp
          FROM ex e JOIN qv ON e.pos = qv.pos
          JOIN cand c ON c.vec_id = e.vec_id
          GROUP BY e.vec_id)
    SELECT d.vec_id, cand.hamming,
           round(d.dp / (n1.nv * n2.nv), 6) AS cosine
    FROM d JOIN cand ON d.vec_id = cand.vec_id
    JOIN nrm n1 ON d.vec_id = n1.vec_id
    JOIN nrm n2 ON n2.vec_id = {QUERY_VEC_ID}
    ORDER BY cosine DESC, d.vec_id
    LIMIT {BQ_K}
    """
    )


@register("sim_bq_hamming_topk", oracle=_bq_oracle())
def sim_bq_hamming_topk(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M256 — BINARY-QUANTIZATION retrieval: each 64-dim
    vector collapses to its SIGN BITS packed into two BIGINTs (64
    bits/vector — the 64x compression every vector store's BQ tier
    ships), candidates come from Hamming distance (two XOR+popcount
    ops — the cheapest distance computable), and the top 50 rerank
    exactly by cosine, top 10 emitted — the third member of the
    compressed-retrieval family (IVF cells M7, PQ codes M104, sign
    bits here), and the only one whose scan distance is branch-free
    integer ops.

    Integer-exact end-to-end until the declared cosine rerank; the
    Hamming scan carries only BIGINTs.  Scale: the signature table is
    16 bytes/vector; the scan is corpus-linear with a 2-word working
    set per row (at 100 TB: written bucketed, read columnar, SIMD
    popcount in the JVM); the rerank touches 50 raw vectors by key —
    point lookups, never a scan.

    Index wiring (VERDICT r10 item 7 — the quantizer-reload
    convention): when ``TROPOLOGY_BQ_INDEX_DIR`` is set, the compact
    signature table is reloaded from ``<dir>/sig_<sf>`` (written there
    after the first encode; ``_SUCCESS``-gated per the ADVICE r8 rule)
    and the search runs through :func:`bq_search_signatures` — the
    same single-home arithmetic the saved-table artifact uses, pinned
    equal to this body in tests/test_bucketing.py.  The driver
    contract never sets the env var.

    ``e=`` substitutes the embeddings frame — (vec_id, embedding) —
    for the weak-scaling probe (tools/scale_probes/bq_scale.py); the
    driver contract never passes it."""
    if e is None:
        import os

        idx_dir = os.environ.get("TROPOLOGY_BQ_INDEX_DIR")
        if idx_dir:
            p = os.path.join(
                idx_dir, f"sig_{os.path.basename(os.path.normpath(sf_dir))}"
            )
            if not os.path.exists(os.path.join(p, "_SUCCESS")):
                publish_parquet(  # atomic (ADVICE r13)
                    bq_signatures_frame(load(spark, sf_dir, "embeddings")), p
                )
            return bq_search_signatures(spark, spark.read.parquet(p), sf_dir)
    e = e if e is not None else load(spark, sf_dir, "embeddings")
    sig = iter_materialize(
        bq_signatures_frame(e, with_vectors=True)
    )  # referenced by the query row AND the corpus scan
    q = sig.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("h0").alias("q0"),
        F.col("h1").alias("q1"),
        F.col("emb").alias("qemb"),
        F.col("nv").alias("nq"),
    )
    cand = (
        sig.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.expr("CAST(bit_count(h0 ^ q0) + bit_count(h1 ^ q1) AS BIGINT)")
            .alias("hamming"),
            F.round(
                dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6
            ).alias("cosine"),
        )
        .orderBy("hamming", "vec_id")
        .limit(BQ_CAND)
    )
    return cand.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(BQ_K).select(
        "vec_id", "hamming", "cosine"
    )


# ---------------------------------------------------------------------------
# M263 sim_ivf_probe_curve — recall vs n_probe (the other IVF tuning axis)
# ---------------------------------------------------------------------------

_PROBE_NPS = (1, 2, 4)
_PROBE_K = 10


def _probe_curve_oracle() -> str:
    from tropology_spark.registry import ORACLES

    nps = ", ".join(str(n) for n in _PROBE_NPS)
    return (
        _EX_CTE
        + """
    , assign0 AS (SELECT vec_id, label AS cell FROM embeddings)
    """
        + _LLOYD_SQL_ITER.format(n=1, p=0, vf="")
        + f"""
    , assign AS (SELECT * FROM assign1),
    pr AS (SELECT tcell, row_number() OVER (ORDER BY ccos DESC, tcell) AS rnp
           FROM vc1 WHERE vec_id = {QUERY_VEC_ID}),
    nps AS (SELECT unnest([{nps}]) AS np),
    cand AS (SELECT nps.np, a.vec_id FROM assign a
             JOIN pr ON a.cell = pr.tcell
             JOIN nps ON pr.rnp <= nps.np
             WHERE a.vec_id <> {QUERY_VEC_ID}),
    q AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (SELECT c.np, e.vec_id, sum(e.val * q.val) AS dp
          FROM ex e JOIN q ON e.pos = q.pos
          JOIN cand c ON e.vec_id = c.vec_id
          GROUP BY c.np, e.vec_id),
    cos AS (SELECT d.np, d.vec_id, round(d.dp / (n1.nv * n2.nv), 6) AS cosine
            FROM d JOIN nrm n1 ON d.vec_id = n1.vec_id
            CROSS JOIN (SELECT nv FROM nrm
                        WHERE vec_id = {QUERY_VEC_ID}) n2),
    appr AS (SELECT np, vec_id FROM (
               SELECT *, row_number() OVER (PARTITION BY np
                                            ORDER BY cosine DESC, vec_id) AS ra1
               FROM cos) t WHERE ra1 <= {_PROBE_K}),
    truth AS (SELECT vec_id FROM ({ORACLES['sim_topk_cosine']}) t)
    SELECT CAST(nps.np AS BIGINT) AS n_probe,
           CAST(count(truth.vec_id) AS BIGINT) AS n_hits,
           CAST((1000000 * count(truth.vec_id)) // {_PROBE_K} AS BIGINT)
             AS recall_ppm
    FROM nps LEFT JOIN appr ON appr.np = nps.np
             LEFT JOIN truth ON appr.vec_id = truth.vec_id
    GROUP BY nps.np
    """
    )


@register("sim_ivf_probe_curve", oracle=_probe_curve_oracle())
def sim_ivf_probe_curve(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M263 — the IVF recall-vs-N_PROBE curve: recall@10 of
    the one-round IVF search probing 1/2/4 cells, against the J8
    brute-force truth — M241 tunes the k axis, this tunes the OTHER
    knob an IVF deployment has (probes = the scan-fraction dial:
    n_probe/cells of the corpus read per query; the curve says what
    recall each setting buys).  Hit = index top-10 ∩ truth top-10.

    Composed, not copied: the oracle re-derives the inverted file
    through the SAME _LLOYD_SQL_ITER prefix the registered sim_ivf_
    topk oracle uses and wraps ORACLES['sim_topk_cosine'] for truth;
    the Spark side builds :func:`ivf_candidates` ONCE at
    n_probe = max(probes) with the probe rank retained and derives
    each curve point as the ``rnp <= n_probe`` slice of ONE scored
    candidate frame (VERDICT r11 item 4 — the candidate set at any
    smaller n_probe is exactly a probe-rank prefix, so the per-point
    top-10 over the filtered slice equals the registered ivf_topk at
    that setting; one Lloyd build + one cosine pass serve the whole
    curve instead of ×|probes| retrievals).  Scale: the curve
    arithmetic is broadcast-trivial; every threshold row always
    emitted (LEFT joins).  ``e=`` overrides the embeddings frame fed
    to the candidate build + scored pass (weak-scaling probe kwarg —
    tools/scale_probes/probecurve_scale.py; the truth stays the
    fixture J8 top-10, and the driver contract never passes it)."""
    from tropology_spark.registry import QUERIES

    truth = iter_materialize(
        QUERIES["sim_topk_cosine"](spark, sf_dir).select(
            F.col("vec_id").alias("t_id")
        )
    )  # referenced once per probe branch
    train = None
    if e is None:
        e = load(spark, sf_dir, "embeddings")
        train = ivf_train_materialized(spark, sf_dir)  # round-19 sharing
    ev, cand = ivf_candidates(
        e, QUERY_VEC_ID, n_probe=max(_PROBE_NPS), with_probe_rank=True, train=train
    )
    q = ev.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qemb"), F.col("nv").alias("nq")
    )
    scored = iter_materialize(
        ev.join(cand, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "rnp",
            F.round(
                dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6
            ).alias("cosine"),
        )
    )  # one cosine pass, referenced once per curve point
    branches = [
        scored.filter(F.col("rnp") <= np)
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(_PROBE_K)
        .select(F.lit(np).cast("bigint").alias("n_probe"), "vec_id")
        for np in _PROBE_NPS
    ]
    appr = branches[0]
    for b in branches[1:]:
        appr = appr.unionByName(b)
    nps = spark.createDataFrame([(n,) for n in _PROBE_NPS], "n_probe long")
    hits = (
        appr.join(F.broadcast(truth), appr.vec_id == F.col("t_id"), "left")
        .groupBy("n_probe")
        .agg(F.count(F.col("t_id")).cast("bigint").alias("n_hits"))
    )
    return nps.join(hits, "n_probe", "left").select(
        F.col("n_probe").cast("bigint").alias("n_probe"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        F.expr(f"(1000000 * coalesce(n_hits, 0)) div {_PROBE_K}")
        .cast("bigint")
        .alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# M270 sim_sq8_recall — int8 scalar quantization retrieval + recall audit
# ---------------------------------------------------------------------------

#: Micro-unit long form of the embeddings (the M104 vm carrier),
#: shared CTE head for the SQ8 / greedy-walk / MMR oracles.
_SQ8_EX_CTE = f"""
    WITH ex AS (
      SELECT vec_id, i AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS vm
      FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i) s
    )
"""

_SQ8_ORACLE = (
    _SQ8_EX_CTE
    + f"""
    , st AS (SELECT pos, min(vm) AS mn, max(vm) AS mx FROM ex GROUP BY pos),
    cd AS (
      SELECT e.vec_id, e.pos, st.mn, st.mx,
             CASE WHEN st.mx = st.mn THEN CAST(0 AS BIGINT)
                  ELSE ((e.vm - st.mn) * 255) // (st.mx - st.mn) END AS code
      FROM ex e JOIN st ON e.pos = st.pos
      WHERE e.vec_id <> {QUERY_VEC_ID}
    ),
    rc AS (SELECT vec_id, pos,
                  mn + (code * (mx - mn)) // 255 AS recon FROM cd),
    q AS (SELECT pos, vm AS qvm FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    sc AS (SELECT r.vec_id, CAST(sum(q.qvm * r.recon) AS BIGINT) AS adc_score
           FROM rc r JOIN q ON r.pos = q.pos GROUP BY r.vec_id),
    tp AS (SELECT vec_id, adc_score,
                  row_number() OVER (ORDER BY adc_score DESC, vec_id) AS rk_sq
           FROM sc),
    exact AS ({{exact}})
    SELECT CAST(tp.rk_sq AS BIGINT) AS rk, tp.vec_id, tp.adc_score,
           CAST(CASE WHEN e2.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS hit
    FROM tp LEFT JOIN (SELECT vec_id FROM exact) e2 ON tp.vec_id = e2.vec_id
    WHERE tp.rk_sq <= 10
    """
).format(exact=_ORACLES["sim_topk_cosine"])


@register("sim_sq8_recall", oracle=_SQ8_ORACLE)
def sim_sq8_recall(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M270 — SQ8 scalar-quantization retrieval + recall audit: the
    standard int8 codec (per-dimension min/max grid, 256 levels)
    evaluated against the brute-force cosine truth.  Completes the
    quantization family: BQ (1 bit/dim), PQ (subspace codebooks), IVF
    (coarse cells), matryoshka (prefix dims) — SQ8 is the 8-bit/dim
    point on the same accuracy/footprint curve.

    Everything is integer-exact cross-engine: values enter as the
    M104 micro-unit carrier vm = round(val·10⁶); the code
    ((vm−mn)·255) div (mx−mn) and the reconstruction
    mn + (code·(mx−mn)) div 255 use non-negative numerators only, so
    Spark ``div`` (truncating) and DuckDB ``//`` (flooring) agree; the
    ADC score Σ qvm·recon is a BIGINT (≤ 64·(6·10⁵)² ≈ 2.3·10¹³).
    Ranking is (adc_score DESC, vec_id) — fully deterministic.  The
    hit flag joins the registered sim_topk_cosine truth (oracle
    composes that oracle verbatim, the sim_ann_recall rule).

    Scale: the per-dim min/max is one map-side-combinable agg over a
    narrow projection; codes are a scan-local transform (at 100 TB the
    encoded corpus is a saved artifact like the PQ/BQ indexes — 64
    bytes/vector); the query-side scan is one broadcast join + a
    map-combinable sum.  The exploded ex frame feeds three branches
    (stats, codes, query) → checkpointed per the double-reference
    rule.  ``e=`` overrides the embeddings frame (weak-scaling probe
    kwarg — tools/scale_probes/sq8_scale.py; the driver contract
    never passes it)."""
    if e is None:
        e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ex = iter_materialize(_pq_exm(e))
    st = ex.groupBy("pos").agg(
        F.min("vm").alias("mn"), F.max("vm").alias("mx")
    )
    cd = (
        ex.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(st), "pos")
        .select(
            "vec_id",
            "pos",
            "mn",
            "mx",
            F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("bigint"))
            .otherwise(F.expr("((vm - mn) * 255) div (mx - mn)"))
            .alias("code"),
        )
    )
    rc = cd.select(
        "vec_id", "pos", F.expr("mn + (code * (mx - mn)) div 255").alias("recon")
    )
    q = ex.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "pos", F.col("vm").alias("qvm")
    )
    sc = (
        rc.join(F.broadcast(q), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("qvm") * F.col("recon")).cast("bigint").alias("adc_score"))
    )
    top = sc.orderBy(F.desc("adc_score"), F.asc("vec_id")).limit(10)
    # rank over the 10 survivors only — non-foldable constant partition
    # key so no partition-less WindowExec appears (global_order idiom).
    w = Window.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
        F.desc("adc_score"), F.asc("vec_id")
    )
    exact = (
        sim_topk_cosine(spark, sf_dir)
        .select("vec_id")
        .withColumn("h1", F.lit(1).cast("bigint"))
    )
    return (
        top.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .join(F.broadcast(exact), "vec_id", "left")
        .select(
            "rk",
            "vec_id",
            "adc_score",
            F.coalesce(F.col("h1"), F.lit(0)).cast("bigint").alias("hit"),
        )
    )


# ---------------------------------------------------------------------------
# M273 sim_graph_greedy_search — greedy routing over a kNN graph (HNSW layer 0)
# ---------------------------------------------------------------------------

_GG_K = 4  # out-degree of the kNN graph
_GG_STEPS = 3  # unrolled greedy hops
_GG_ENTRY = 1  # fixed entry point (HNSW's fixed entry node)

#: One greedy step, oracle side: the walker stands at cur{p}; the
#: next position is the best of {cur} ∪ outgoing neighbors by
#: (query-dot DESC, vec_id ASC) — moves only when a neighbor improves,
#: ties resolved to the smaller id, fully deterministic.
_GG_STEP_SQL = """
    , cur{n} AS MATERIALIZED (
      SELECT vec_id, dq FROM (
        SELECT u.vec_id, u.dq,
               row_number() OVER (ORDER BY u.dq DESC, u.vec_id) AS rk_s{n}
        FROM (SELECT vec_id, dq FROM cur{p}
              UNION ALL
              SELECT d.vec_id, d.dq
              FROM edges e JOIN cur{p} c ON e.a = c.vec_id
              JOIN dqs d ON d.vec_id = e.b) u) w
      WHERE rk_s{n} = 1)
"""


def _gg_oracle() -> str:
    steps = "".join(
        _GG_STEP_SQL.format(n=i, p=i - 1) for i in range(1, _GG_STEPS + 1)
    )
    walk = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, vec_id, dq FROM cur{i}"
        for i in range(_GG_STEPS + 1)
    )
    return (
        _SQ8_EX_CTE
        + f"""
    , pw AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             CAST(sum(a.vm * b.vm) AS BIGINT) AS w
      FROM ex a JOIN ex b ON a.pos = b.pos
      WHERE a.vec_id <> b.vec_id
        AND a.vec_id <> {QUERY_VEC_ID} AND b.vec_id <> {QUERY_VEC_ID}
      GROUP BY a.vec_id, b.vec_id),
    edges AS MATERIALIZED (SELECT a, b FROM (
        SELECT a, b, row_number() OVER (PARTITION BY a
                                        ORDER BY w DESC, b) AS rk_e
        FROM pw) e WHERE rk_e <= {_GG_K}),
    q AS (SELECT pos, vm AS qvm FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    dqs AS MATERIALIZED (SELECT e.vec_id, CAST(sum(e.vm * q.qvm) AS BIGINT) AS dq
            FROM ex e JOIN q ON e.pos = q.pos
            WHERE e.vec_id <> {QUERY_VEC_ID}
            GROUP BY e.vec_id),
    cur0 AS (SELECT vec_id, dq FROM dqs WHERE vec_id = {_GG_ENTRY})
    {steps}
    , walk AS ({walk}),
    exact AS ({{exact}})
    SELECT w.step, w.vec_id, w.dq,
           CAST(CASE WHEN e2.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
             AS in_exact_top10
    FROM walk w
    LEFT JOIN (SELECT vec_id FROM exact) e2 ON w.vec_id = e2.vec_id
    """
    ).format(exact=_ORACLES["sim_topk_cosine"])


@register("sim_graph_greedy_search", oracle=_gg_oracle())
def sim_graph_greedy_search(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M273 — greedy routing over a kNN graph: the HNSW layer-0 search
    story: build the out-degree-{k} exact kNN graph (integer micro-dot
    weights, (w DESC, b) tie-break), start at the fixed entry node,
    and take {s} unrolled greedy hops, each moving to the best of
    {{current}} ∪ out-neighbors by (query-dot DESC, vec_id ASC) — the
    walker stays put when no neighbor improves, so the walk is a
    monotone deterministic descent.  Emits the 4-row walk with each
    position's integer query-dot and whether it already sits in the
    registered exact top-10 (oracle composes sim_topk_cosine
    verbatim).

    All scores are BIGINT micro-dots (Σ vm_a·vm_b ≤ 64·(6·10⁵)² ≈
    2.3·10¹³) — no floats anywhere in the ranking.  Scale: the walk
    only ever inspects out-edges of VISITED nodes, so the Spark side
    expands each hop's top-{k} neighbor list ON DEMAND (one broadcast
    1-row walker × corpus scan per hop, whole-stage-codegen zip_with
    dots — {s}·n dot products total, never the n² graph build), while
    the oracle states the same walk over the fully materialized kNN
    graph — a deliberate cross-FORMULATION check that the on-demand
    expansion equals the precomputed-graph walk.  At 100 TB the graph
    IS a saved artifact (like the IVF/PQ/BQ indexes) built once via
    LSH-blocked candidate generation, and each hop is k row lookups.
    The vm-array frame feeds the query row, the per-hop scans, and the
    dq pass → checkpointed per the double-reference rule (per-round
    materializations via iter_materialize — the durable-checkpoint
    posture).  ``e=`` overrides the embeddings frame (weak-scaling
    probe kwarg — tools/scale_probes/gg_scale.py; the driver contract
    never passes it)."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    vmarr = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
    )
    ev = iter_materialize(e.select("vec_id", vmarr.alias("vm")))

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    corpus = ev.filter(F.col("vec_id") != QUERY_VEC_ID)
    q = ev.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("vm").alias("qvm")
    )
    dqs = iter_materialize(
        corpus.crossJoin(F.broadcast(q))
        .select("vec_id", "vm", idot(F.col("vm"), F.col("qvm")).alias("dq"))
    )  # referenced once per hop + entry
    cur = iter_materialize(dqs.filter(F.col("vec_id") == _GG_ENTRY))
    walk = [cur.select(F.lit(0).cast("bigint").alias("step"), "vec_id", "dq")]
    wstep = Window.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
        F.desc("dq"), F.asc("vec_id")
    )
    for i in range(1, _GG_STEPS + 1):
        # On-demand out-edges of the walker: top-k corpus neighbors of
        # cur by (micro-dot DESC, vec_id) — identical to the oracle's
        # precomputed edges because the graph ranking is per-source.
        nb = (
            dqs.crossJoin(
                F.broadcast(
                    cur.select(
                        F.col("vec_id").alias("cid"), F.col("vm").alias("cvm")
                    )
                )
            )
            .filter(F.col("vec_id") != F.col("cid"))
            .select(
                "vec_id", "vm", "dq", idot(F.col("vm"), F.col("cvm")).alias("w")
            )
        )
        cand = (
            nb.orderBy(F.desc("w"), F.asc("vec_id"))
            .limit(_GG_K)
            .select("vec_id", "vm", "dq")
        )
        cur = iter_materialize(
            cur.select("vec_id", "vm", "dq")
            .unionAll(cand)
            .withColumn("rk_s", F.row_number().over(wstep))
            .filter(F.col("rk_s") == 1)
            .select("vec_id", "vm", "dq")
        )
        walk.append(
            cur.select(F.lit(i).cast("bigint").alias("step"), "vec_id", "dq")
        )
    walk_df = walk[0]
    for wdf in walk[1:]:
        walk_df = walk_df.unionAll(wdf)
    exact = (
        sim_topk_cosine(spark, sf_dir)
        .select("vec_id")
        .withColumn("h1", F.lit(1).cast("bigint"))
    )
    return walk_df.join(F.broadcast(exact), "vec_id", "left").select(
        "step",
        "vec_id",
        "dq",
        F.coalesce(F.col("h1"), F.lit(0)).cast("bigint").alias("in_exact_top10"),
    )


sim_graph_greedy_search.__doc__ = sim_graph_greedy_search.__doc__.format(
    k=_GG_K, s=_GG_STEPS
)


# ---------------------------------------------------------------------------
# M275 sim_ivfpq_topk — the IVF+PQ composite (coarse cells + ADC codes)
# ---------------------------------------------------------------------------

_IVFPQ_ORACLE = (
    _EX_CTE
    + """
    , assign0 AS (SELECT vec_id, label AS cell FROM embeddings)
    """
    + _LLOYD_SQL_ITER.format(n=1, p=0, vf="")
    + f"""
    , assign AS (SELECT * FROM assign1),
    probe AS (SELECT tcell AS pcell
              FROM (SELECT *, row_number() OVER (ORDER BY ccos DESC, tcell)
                              AS rn_p
                    FROM vc1 WHERE vec_id = {QUERY_VEC_ID}) t
              WHERE rn_p <= 2),
    cand0 AS MATERIALIZED (
      SELECT a.vec_id, a.cell FROM assign a
      JOIN probe ON a.cell = probe.pcell
      WHERE a.vec_id <> {QUERY_VEC_ID}),
    exm AS (SELECT vec_id, pos, CAST(round(val * 1000000) AS BIGINT) AS vm
            FROM ex),
    sub AS (SELECT vec_id, pos, vm,
                   CASE WHEN pos <= {EMB_DIM // 2} THEN 0 ELSE 1 END AS s
            FROM exm),
    cb AS (SELECT vec_id AS code, s, pos, vm AS cm FROM sub
           WHERE vec_id BETWEEN 1 AND {_PQ_K}),
    encc AS (SELECT v.vec_id, v.s, c.code,
                    CAST(sum((v.vm - c.cm) * (v.vm - c.cm)) AS BIGINT) AS d2
             FROM sub v
             JOIN cand0 ON v.vec_id = cand0.vec_id
             JOIN cb c ON c.s = v.s AND c.pos = v.pos
             GROUP BY v.vec_id, v.s, c.code),
    enc AS (SELECT vec_id, s, code FROM (
              SELECT vec_id, s, code,
                     row_number() OVER (PARTITION BY vec_id, s
                                        ORDER BY d2, code) AS rn_e
              FROM encc) t WHERE rn_e = 1),
    qd AS (SELECT v.s, c.code,
                  CAST(sum((v.vm - c.cm) * (v.vm - c.cm)) AS BIGINT) AS qd2
           FROM sub v JOIN cb c ON c.s = v.s AND c.pos = v.pos
           WHERE v.vec_id = {QUERY_VEC_ID}
           GROUP BY v.s, c.code),
    adc AS (SELECT e.vec_id, CAST(sum(q.qd2) AS BIGINT) AS adc_d2
            FROM enc e JOIN qd q ON q.s = e.s AND q.code = e.code
            GROUP BY e.vec_id),
    candk AS MATERIALIZED (
      SELECT vec_id, adc_d2 FROM (
        SELECT vec_id, adc_d2,
               row_number() OVER (ORDER BY adc_d2, vec_id) AS rn_c
        FROM adc) t WHERE rn_c <= {_PQ_CAND}),
    rer AS (SELECT v.vec_id,
                   CAST(sum((v.vm - q.vm) * (v.vm - q.vm)) AS BIGINT) AS dist2
            FROM exm v
            JOIN exm q ON q.vec_id = {QUERY_VEC_ID} AND q.pos = v.pos
            JOIN candk ON candk.vec_id = v.vec_id
            GROUP BY v.vec_id)
    SELECT r.vec_id, c0.cell, ck.adc_d2, r.dist2
    FROM rer r
    JOIN candk ck ON r.vec_id = ck.vec_id
    JOIN cand0 c0 ON r.vec_id = c0.vec_id
    ORDER BY r.dist2, r.vec_id
    LIMIT 10
    """
)


@register("sim_ivfpq_topk", oracle=_IVFPQ_ORACLE)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M275 — the IVF+PQ composite: the standard two-stage vector index
    (coarse inverted-file cells prune the corpus, PQ asymmetric
    distance scans only the probed cells' CODES, exact rerank touches
    only the ADC top-{c}): sim_ivf_topk's coarse stage feeding
    sim_pq_topk's fine stage, each reused from its single home
    (:func:`ivf_candidates` — extracted from ivf_topk with identical
    semantics — and the ``_pq_*`` helpers).  Oracle composes the same
    two registered oracle fragments (the Lloyd iter SQL + the PQ
    CTEs), restricted to the candidate cells.

    All fine-stage arithmetic is integer-exact (micro-unit BIGINT
    squared distances, (d2, code)/(adc, vec_id) unique tie-breaks);
    the coarse stage carries the registered 6-dp-rounded cell cosines.
    cand0 and candk are referenced from two plan branches each →
    Spark checkpoints (iter_materialize), oracle MATERIALIZED (the
    DuckDB materialized rule).

    Index wiring (VERDICT r11 item 6 — the sim_bq_hamming_topk
    precedent): when ``TROPOLOGY_IVFPQ_INDEX_DIR`` is set, the three
    artifact frames are reloaded from ``<dir>/ivfpq_<sf>`` (+
    ``_centroids`` / ``_codebook`` siblings; written there on first
    use — the inverted file is written LAST so its ``_SUCCESS`` marker
    implies the siblings completed, per the ADVICE r8 partial-artifact
    rule) and the search runs through :func:`ivfpq_search_frames` —
    the same single-home arithmetic :func:`ivfpq_topk_from_index`
    uses, so the registered op and the saved artifact cannot drift.
    The driver contract never sets the env var.

    Scale: this IS the 100 TB retrieval posture — the inverted file
    prunes to n_probe/k of the corpus, the ADC scan reads 2 small ints
    per surviving vector (codes only, never raw vectors), the codebook
    is a {k2}×d broadcast, and the rerank touches {c} rows.  Both
    stages' artifacts are persistable in one composite
    (ivfpq_write_index)."""
    import os

    idx_dir = os.environ.get("TROPOLOGY_IVFPQ_INDEX_DIR")
    if idx_dir:
        sf = os.path.basename(os.path.normpath(sf_dir))
        base = os.path.join(idx_dir, f"ivfpq_{sf}")
        if not os.path.exists(os.path.join(base, "_SUCCESS")):
            inv, cen, cb = _ivfpq_build_frames(spark, sf_dir)
            publish_parquet(cen, base + "_centroids")  # atomic publishes
            publish_parquet(cb, base + "_codebook")
            publish_parquet(inv, base)  # _SUCCESS gate LAST (ADVICE r13)
        return ivfpq_search_frames(
            spark,
            spark.read.parquet(base),
            spark.read.parquet(base + "_centroids"),
            spark.read.parquet(base + "_codebook"),
            sf_dir,
        )
    e = load(spark, sf_dir, "embeddings")
    ev, cand = ivf_candidates(
        e, QUERY_VEC_ID, train=ivf_train_materialized(spark, sf_dir)
    )
    cand = iter_materialize(cand)  # 2 refs: encode filter + cell attach
    exm = _pq_exm(e)
    sub = _pq_sub(exm)
    cb = _pq_cb(sub)
    subc = sub.join(cand.select("vec_id"), "vec_id", "left_semi")
    encc = _pq_enc0(subc, cb)
    w_enc = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    enc = (
        encc.withColumn("rn_e", F.row_number().over(w_enc))
        .filter(F.col("rn_e") == 1)
        .select("vec_id", "s", "code")
    )
    qd = _pq_enc0(sub.filter(F.col("vec_id") == QUERY_VEC_ID), cb).select(
        "s", "code", F.col("d2").alias("qd2")
    )
    adc = (
        enc.join(F.broadcast(qd), ["s", "code"])
        .groupBy("vec_id")
        .agg(F.sum("qd2").cast("bigint").alias("adc_d2"))
    )
    candk = iter_materialize(
        adc.orderBy("adc_d2", "vec_id").limit(_PQ_CAND)
    )  # 2 refs: rerank filter + adc attach
    qm = exm.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("pos").alias("qpos"), F.col("vm").alias("qm")
    )
    rdiff = F.col("vm") - F.col("qm")
    rer = (
        exm.join(candk.select("vec_id"), "vec_id", "left_semi")
        .join(F.broadcast(qm), F.col("pos") == F.col("qpos"))
        .groupBy("vec_id")
        .agg(F.sum(rdiff * rdiff).cast("bigint").alias("dist2"))
    )
    return (
        rer.join(candk, "vec_id")
        .join(cand, "vec_id")
        .select("vec_id", "cell", "adc_d2", "dist2")
        .orderBy("dist2", "vec_id")
        .limit(10)
    )


sim_ivfpq_topk.__doc__ = sim_ivfpq_topk.__doc__.format(c=_PQ_CAND, k2=_PQ_K)


# ---------------------------------------------------------------------------
# M278 sim_filtered_topk — metadata-filtered vector search (per-label top-k)
# ---------------------------------------------------------------------------

_FILT_K = 3

_FILT_ORACLE = f"""
    WITH ex AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i) s
    ),
    nrm AS (SELECT vec_id, sqrt(sum(val * val)) AS nv FROM ex GROUP BY vec_id),
    q AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (SELECT e.vec_id, any_value(e.label) AS label, sum(e.val * q.val) AS dp
          FROM ex e JOIN q ON e.pos = q.pos
          WHERE e.vec_id <> {QUERY_VEC_ID}
          GROUP BY e.vec_id),
    cos AS (SELECT d.vec_id, d.label,
                   round(d.dp / (n1.nv * n2.nv), 6) AS cosine
            FROM d
            JOIN nrm n1 ON d.vec_id = n1.vec_id
            CROSS JOIN (SELECT nv FROM nrm WHERE vec_id = {QUERY_VEC_ID}) n2)
    SELECT label, CAST(rk_f AS BIGINT) AS rk, vec_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY label
                                       ORDER BY cosine DESC, vec_id) AS rk_f
          FROM cos) t
    WHERE rk_f <= {_FILT_K}
"""


@register("sim_filtered_topk", oracle=_FILT_ORACLE)
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M278 — metadata-FILTERED vector search: top-{k} by cosine within
    every label group for the fixture query vector: the production
    feature every vector store ships (filtered/faceted ANN — "nearest
    documents WHERE source = X") that none of the other sim ops
    exercises.  One corpus pass computes all per-label answers
    simultaneously (the batch form of a filtered query; a single
    filter is the label = X slice of this result).

    Cross-engine float discipline matches the sim family: cosines
    rounded to 6 dp, (cosine DESC, vec_id) unique tie-break, per-label
    window — never a global one.  Scale: at 100 TB filtered search is
    the argument FOR metadata-partitioned vector layouts — with the
    corpus bucketed/partitioned by the filter column (exactly the
    IVF+PQ artifact's bucketBy(cell) discipline applied to a metadata
    key) each filtered query scans only its slice; the registered
    one-pass batch shape is the offline-eval form."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    ).withColumn("nv", norm(F.col("emb")))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qemb"), F.col("nv").alias("nq")
    )
    cos = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cos.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _FILT_K)
        .select("label", "rk", "vec_id", "cosine")
    )


sim_filtered_topk.__doc__ = sim_filtered_topk.__doc__.format(k=_FILT_K)


# ---------------------------------------------------------------------------
# M282 sim_mmr_diversify — Maximal Marginal Relevance (unrolled greedy)
# ---------------------------------------------------------------------------

_MMR_POOL = 20  # relevance candidate pool
_MMR_K = 5  # diversified picks

#: One greedy MMR pick, oracle side: among unpicked pool members,
#: maximize score2 = rel − max(pair-dot to any previous pick); the
#: pick CTEs are MATERIALIZED (oracle-side double-reference rule).
_MMR_STEP_SQL = """
    , pen{n} AS (
      SELECT p.vec_id, max(pd.w) AS pen
      FROM pool p
      JOIN pw_mmr pd ON pd.a = p.vec_id
      WHERE pd.b IN (SELECT vec_id FROM picked{p})
        AND p.vec_id NOT IN (SELECT vec_id FROM picked{p})
      GROUP BY p.vec_id),
    pick{n} AS MATERIALIZED (
      SELECT vec_id, rel, pen, rel - pen AS score2 FROM (
        SELECT p.vec_id, p.rel, pn.pen,
               row_number() OVER (ORDER BY p.rel - pn.pen DESC, p.vec_id)
                 AS rk_m{n}
        FROM pool p JOIN pen{n} pn ON p.vec_id = pn.vec_id) t
      WHERE rk_m{n} = 1),
    picked{n} AS MATERIALIZED (
      SELECT vec_id FROM picked{p}
      UNION ALL SELECT vec_id FROM pick{n})
"""


def _mmr_oracle() -> str:
    steps = "".join(
        _MMR_STEP_SQL.format(n=i, p=i - 1) for i in range(2, _MMR_K + 1)
    )
    picks = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS pick_order, vec_id, rel,"
        f" pen, score2 FROM pick{i}"
        for i in range(1, _MMR_K + 1)
    )
    return (
        _SQ8_EX_CTE
        + f"""
    , q AS (SELECT pos, vm AS qvm FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    rel0 AS (SELECT e.vec_id, CAST(sum(e.vm * q.qvm) AS BIGINT) AS rel
             FROM ex e JOIN q ON e.pos = q.pos
             WHERE e.vec_id <> {QUERY_VEC_ID}
             GROUP BY e.vec_id),
    pool AS MATERIALIZED (
      SELECT vec_id, rel FROM (
        SELECT vec_id, rel,
               row_number() OVER (ORDER BY rel DESC, vec_id) AS rk_p
        FROM rel0) t WHERE rk_p <= {_MMR_POOL}),
    pw_mmr AS MATERIALIZED (
      SELECT a.vec_id AS a, b.vec_id AS b,
             CAST(sum(ea.vm * eb.vm) AS BIGINT) AS w
      FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
      JOIN ex ea ON ea.vec_id = a.vec_id
      JOIN ex eb ON eb.vec_id = b.vec_id AND ea.pos = eb.pos
      GROUP BY a.vec_id, b.vec_id),
    pick1 AS MATERIALIZED (
      SELECT vec_id, rel, CAST(0 AS BIGINT) AS pen, rel AS score2 FROM (
        SELECT vec_id, rel,
               row_number() OVER (ORDER BY rel DESC, vec_id) AS rk_m1
        FROM pool) t WHERE rk_m1 = 1),
    picked1 AS MATERIALIZED (SELECT vec_id FROM pick1)
    {steps}
    SELECT * FROM ({picks}) all_picks
    """
    )


@register("sim_mmr_diversify", oracle=_mmr_oracle())
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M282 — Maximal Marginal Relevance re-ranking (Carbonell &
    Goldstein 1998): the diversity stage every production retrieval
    system runs after relevance ranking: greedily pick {k} results
    from the relevance top-{pool}, each pick maximizing
    λ·rel(q,d) − (1−λ)·max_sim(d, already-picked).  At λ = 1/2 the
    doubled objective is the pure integer difference
    score2 = rel − max_pair_dot — zero floats anywhere (micro-unit
    BIGINT dots, (score DESC, vec_id) tie-breaks; pick 1 is pure
    relevance with penalty 0).

    The greedy loop is unrolled ({k} − 1 dependent steps); the
    selected-set frame is re-referenced every step → Spark
    materializes per round through iter_materialize (the durable-
    checkpoint posture) and the oracle marks pool/pair/pick CTEs
    MATERIALIZED (the oracle-side double-reference rule).  Scale:
    the pairwise stage is {pool}×{pool} over the POOL, never the
    corpus — MMR cost is independent of corpus size once the
    relevance pool is cut, which is why it composes after any of the
    ANN tiers (BQ/PQ/IVF/SQ8)."""
    vmarr = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
    )
    ev = iter_materialize(
        load(spark, sf_dir, "embeddings").select("vec_id", vmarr.alias("vm"))
    )  # feeds q, rel, and the pool pairs

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    q = ev.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("vm").alias("qvm")
    )
    rel = (
        ev.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "vm", idot(F.col("vm"), F.col("qvm")).alias("rel"))
    )
    pool = iter_materialize(
        rel.orderBy(F.desc("rel"), F.asc("vec_id")).limit(_MMR_POOL)
    )  # feeds pair dots + every pick round
    pw = iter_materialize(
        pool.select("vec_id", "vm")
        .crossJoin(
            F.broadcast(
                pool.select(
                    F.col("vec_id").alias("b"), F.col("vm").alias("vmb")
                )
            )
        )
        .filter(F.col("vec_id") != F.col("b"))
        .select(
            F.col("vec_id").alias("a"), "b", idot(F.col("vm"), F.col("vmb")).alias("w")
        )
    )  # referenced every pick round
    wpick = Window.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
        F.desc("score2"), F.asc("vec_id")
    )
    first = iter_materialize(
        pool.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select(
            "vec_id",
            "rel",
            F.lit(0).cast("bigint").alias("pen"),
            F.col("rel").alias("score2"),
        )
    )
    picks = [first]
    picked = first.select("vec_id")
    for i in range(2, _MMR_K + 1):
        pen = (
            pw.join(F.broadcast(picked.select(F.col("vec_id").alias("b"))), "b")
            .groupBy("a")
            .agg(F.max("w").alias("pen"))
        )
        cand = (
            pool.join(picked, "vec_id", "left_anti")
            .join(pen, pen.a == F.col("vec_id"))
            .select("vec_id", "rel", "pen", (F.col("rel") - F.col("pen")).alias("score2"))
        )
        pick = iter_materialize(
            cand.withColumn("rk_m", F.row_number().over(wpick))
            .filter(F.col("rk_m") == 1)
            .select("vec_id", "rel", F.col("pen").cast("bigint").alias("pen"), "score2")
        )
        picks.append(pick)
        picked = iter_materialize(picked.unionAll(pick.select("vec_id")))
    out = None
    for i, p in enumerate(picks, 1):
        row = p.select(
            F.lit(i).cast("bigint").alias("pick_order"),
            "vec_id",
            "rel",
            "pen",
            "score2",
        )
        out = row if out is None else out.unionAll(row)
    return out


sim_mmr_diversify.__doc__ = sim_mmr_diversify.__doc__.format(
    k=_MMR_K, pool=_MMR_POOL
)


# ---------------------------------------------------------------------------
# sim_hnsw_levels — geometric HNSW level-assignment audit (M285)
# ---------------------------------------------------------------------------

_HNSW_MAX_LEVEL = 4


@register(
    "sim_hnsw_levels",
    oracle=f"""
    WITH h AS (
      SELECT vec_id,
             ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS w
      FROM embeddings),
    lv AS (
      SELECT vec_id,
             CASE WHEN w % 16 = 0 THEN 4
                  WHEN w % 8 = 0 THEN 3
                  WHEN w % 4 = 0 THEN 2
                  WHEN w % 2 = 0 THEN 1
                  ELSE 0 END AS level
      FROM h),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM lv),
    spine AS (SELECT unnest(generate_series(0, {_HNSW_MAX_LEVEL})) AS level),
    cnt AS (SELECT level, CAST(count(*) AS BIGINT) AS n_nodes
            FROM lv GROUP BY level)
    SELECT CAST(spine.level AS BIGINT) AS level,
           CAST(coalesce(cnt.n_nodes, 0) AS BIGINT) AS n_nodes,
           CAST(sum(coalesce(cnt.n_nodes, 0))
                  OVER (ORDER BY spine.level DESC) AS BIGINT) AS n_cum,
           CAST((1000000 * sum(coalesce(cnt.n_nodes, 0))
                             OVER (ORDER BY spine.level DESC)
                 * (1 << spine.level)) // n.nt AS BIGINT) AS geo_ratio_ppm
    FROM spine LEFT JOIN cnt ON spine.level = cnt.level
    CROSS JOIN n
    """,
)
def sim_hnsw_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M285 — HNSW LEVEL-ASSIGNMENT audit: the geometric layer
    draw (P(level ≥ ℓ) = 2^−ℓ, capped at {L}) realized
    DETERMINISTICALLY from the md5-low-32 of each vec_id (level =
    trailing-zero count, the I7/M43 reproducibility discipline —
    rand() would unpin the hash gate), rolled up to per-level node
    counts, the cumulative layer occupancy, and the occupancy-vs-
    geometric-expectation ratio in ppm (10⁶·n_cum·2^ℓ/n — exactly 10⁶
    ×(observed/expected), one integral division).  The hierarchy half
    of the M273 greedy layer-0 search: together they are the
    HNSW story — this op audits the LAYER CAPACITY an index build
    would allocate before any graph is wired.

    Scale: one scan projecting two BIGINTs per vector, one bounded
    rollup; the spine/window ride the 5-row level axis (the
    bounded-domain counting idiom).  All integers; the trailing-zero
    test is a CASE chain over power-of-two moduli — identical
    arithmetic in both engines, no ctz builtin needed."""
    e = load(spark, sf_dir, "embeddings")
    w = F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    lv = e.select(
        F.when(w % 16 == 0, 4)
        .when(w % 8 == 0, 3)
        .when(w % 4 == 0, 2)
        .when(w % 2 == 0, 1)
        .otherwise(0)
        .alias("level")
    )
    cnt = lv.groupBy("level").agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    spine = spark.range(_HNSW_MAX_LEVEL + 1).select(F.col("id").alias("level"))
    ww = Window.partitionBy(F.pmod(F.col("level"), F.lit(1))).orderBy(
        F.desc("level")
    ).rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(F.pmod(F.col("level"), F.lit(1)))
    full = spine.join(cnt, "level", "left").select(
        "level", F.coalesce(F.col("n_nodes"), F.lit(0)).cast("bigint").alias("n_nodes")
    )
    return full.select(
        F.col("level").cast("bigint").alias("level"),
        "n_nodes",
        F.sum("n_nodes").over(ww).cast("bigint").alias("n_cum"),
        F.expr(
            "(1000000 * sum(n_nodes) OVER (PARTITION BY pmod(level, 1)"
            " ORDER BY level DESC ROWS BETWEEN UNBOUNDED PRECEDING AND"
            " CURRENT ROW) * shiftleft(1L, CAST(level AS INT)))"
        )
        .cast("bigint")
        .alias("num"),
        F.sum("n_nodes").over(wt).cast("bigint").alias("nt"),
    ).select(
        "level",
        "n_nodes",
        "n_cum",
        F.expr("num div nt").cast("bigint").alias("geo_ratio_ppm"),
    )


sim_hnsw_levels.__doc__ = sim_hnsw_levels.__doc__.format(L=_HNSW_MAX_LEVEL)


# ---------------------------------------------------------------------------
# sim_pq_distortion — per-vector PQ reconstruction-error histogram (M294)
# ---------------------------------------------------------------------------

_PQD_BUCKET = 10_000_000_000  # 1e10 in the micro-unit² distance domain


def _pq_distortion_oracle() -> str:
    return (
        _EX_CTE
        + _PQ_ENC_CTE
        + f""",
    best AS (SELECT vec_id, s, min(d2) AS bd2 FROM enc0 GROUP BY vec_id, s),
    q AS (SELECT vec_id, CAST(sum(bd2) AS BIGINT) AS qerr
          FROM best GROUP BY vec_id)
    SELECT CAST(qerr // {_PQD_BUCKET} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(qerr) AS BIGINT) AS min_qerr,
           CAST(max(qerr) AS BIGINT) AS max_qerr,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id
    FROM q GROUP BY 1
    """
    )


@register("sim_pq_distortion", oracle=_pq_distortion_oracle())
def sim_pq_distortion(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M294 — PQ QUANTIZATION-DISTORTION histogram: every
    vector's reconstruction error under the M104 codebook (self-ADC =
    Σ over subspaces of the minimum squared distance to any code —
    exactly the error the ADC scan substitutes for the true distance),
    bucketed at 10¹⁰ micro-unit² — the audit that says whether the
    codebook fits the corpus BEFORE recall degrades (codebook vectors
    1..8 land in bucket 0 at distortion 0 by construction — the
    built-in sanity anchor).  M182 measures PQ's end-to-end RECALL;
    this measures the geometric CAUSE, per vector, exactly.

    Composed, not copied: the Spark side reuses the registered
    _pq_exm/_pq_sub/_pq_cb/_pq_enc0 helpers verbatim; the oracle
    splices the shared _PQ_ENC_CTE (the M104 single home, factored at
    staging with byte-identical registered SQL).  Scale: enc0 is the
    same bounded (n × subspaces × codes) table the registered query
    builds; the rollups are map-side combinable; distances stay
    BIGINT (micro-unit² ≤ ~4e12 per subspace at unit norm).

    ``e=`` substitutes the embedding frame for the weak-scaling probe
    (tools/scale_probes/pqdist_scale.py); the driver contract never
    passes it."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    sub = _pq_sub(_pq_exm(e))
    enc0 = _pq_enc0(sub, _pq_cb(sub))
    best = enc0.groupBy("vec_id", "s").agg(F.min("d2").alias("bd2"))
    q = best.groupBy("vec_id").agg(F.sum("bd2").cast("bigint").alias("qerr"))
    return q.groupBy(
        F.expr(f"qerr div {_PQD_BUCKET}").cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.min("qerr").cast("bigint").alias("min_qerr"),
        F.max("qerr").cast("bigint").alias("max_qerr"),
        F.min("vec_id").cast("bigint").alias("min_vec_id"),
    )


# ---------------------------------------------------------------------------
# sim_quantizer_drift — Lloyd-round reassignment audit (index maintenance)
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = (
    _EX_CTE
    + """
    , assign0 AS (SELECT vec_id, label AS cell FROM embeddings)
    """
    + _LLOYD_SQL_ITER.format(n=1, p=0, vf="")
    + """
    , lab AS (SELECT vec_id, CAST(label AS BIGINT) AS cell0 FROM embeddings),
    mv AS (SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell1, l.cell0
           FROM assign1 a JOIN lab l ON a.vec_id = l.vec_id),
    aft AS (SELECT cell1 AS cell, CAST(count(*) AS BIGINT) AS n_after,
                   CAST(sum(CASE WHEN cell1 = cell0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_stayed
            FROM mv GROUP BY cell1),
    bef AS (SELECT cell0 AS cell, CAST(count(*) AS BIGINT) AS n_before
            FROM lab GROUP BY cell0)
    SELECT CAST(coalesce(aft.cell, bef.cell) AS BIGINT) AS cell,
           CAST(coalesce(bef.n_before, 0) AS BIGINT) AS n_before,
           CAST(coalesce(aft.n_after, 0) AS BIGINT) AS n_after,
           CAST(coalesce(aft.n_stayed, 0) AS BIGINT) AS n_stayed,
           CAST(coalesce(aft.n_after, 0) - coalesce(aft.n_stayed, 0)
                AS BIGINT) AS n_arrived,
           CAST(CASE WHEN coalesce(aft.n_after, 0) = 0 THEN 0
                     ELSE (1000000 * (aft.n_after - aft.n_stayed))
                          // aft.n_after END AS BIGINT) AS arrived_ppm
    FROM aft FULL OUTER JOIN bef ON aft.cell = bef.cell
    """
)


@register("sim_quantizer_drift", oracle=_DRIFT_ORACLE)
def sim_quantizer_drift(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M305 — Quantizer-drift audit — one Lloyd refinement round over the
    label-seeded coarse cells (the registered sim_ivf_topk's exact
    training step) compared against the seed assignment: per cell the
    before/after occupancy, how many vectors stayed, how many arrived,
    and the arrival fraction in ppm.  This is the INDEX-MAINTENANCE
    signal a 100 TB vector deployment monitors: when fresh data's
    reassignment fraction rises, the saved IVF/IVF+PQ artifacts
    (ivf_write_index / ivfpq_write_index) are due for a retrain —
    the audit that tells you WHEN to rebuild, next to the recall
    curves that tell you what rebuild buys.

    Cells are compared on the same 6-dp-rounded cosine ranking the
    registered IVF family pins ((ccos DESC, cell) unique tie-break);
    all emitted columns are BIGINTs, the ppm guard keeps emptied
    cells at 0, and the full-outer merge emits cells present on
    EITHER side (a cell can empty out — that row is the drift
    signal).  Scale: one Lloyd round (k-row broadcast centroids) +
    two map-side rollups + a cell-keyed full join — no pairwise
    stage anywhere.

    ``e=`` substitutes the embeddings frame (the emptied-cell pin
    injects centroid-degenerate corpora through it; the driver
    contract never passes it)."""
    ev = (
        (e if e is not None else load(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            F.col("label").cast("bigint").alias("cell0"),
            as_double(F.col("embedding")).alias("emb"),
        )
        .withColumn("nv", norm(F.col("emb")))
    )
    assign0 = ev.select("vec_id", F.col("cell0").alias("cell"))
    _, assign1 = lloyd_rounds(
        ev.select("vec_id", "emb", "nv"), assign0, 1
    )
    mv = assign1.select(
        "vec_id", F.col("cell").cast("bigint").alias("cell1")
    ).join(ev.select("vec_id", "cell0"), "vec_id")
    aft = mv.groupBy(F.col("cell1").alias("cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after"),
        F.sum(F.when(F.col("cell1") == F.col("cell0"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_stayed"),
    )
    bef = ev.groupBy(F.col("cell0").alias("b_cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before")
    )
    j = aft.join(bef, aft.cell == F.col("b_cell"), "full_outer")
    return j.select(
        F.coalesce(F.col("cell"), F.col("b_cell")).cast("bigint").alias("cell"),
        F.coalesce(F.col("n_before"), F.lit(0)).cast("bigint").alias("n_before"),
        F.coalesce(F.col("n_after"), F.lit(0)).cast("bigint").alias("n_after"),
        F.coalesce(F.col("n_stayed"), F.lit(0)).cast("bigint").alias("n_stayed"),
        (
            F.coalesce(F.col("n_after"), F.lit(0))
            - F.coalesce(F.col("n_stayed"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_arrived"),
        F.expr(
            "CAST(CASE WHEN coalesce(n_after, 0L) = 0 THEN 0"
            " ELSE (1000000 * (n_after - n_stayed)) div n_after END AS BIGINT)"
        ).alias("arrived_ppm"),
    )


# ---------------------------------------------------------------------------
# sim_dim_variance_profile — per-dimension variance terms of the corpus
# ---------------------------------------------------------------------------

_DIMVAR_ORACLE = (
    _SQ8_EX_CTE
    + """
    , st AS (
      SELECT pos,
             CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(vm) AS BIGINT) AS sum_vm,
             CAST(sum(vm * vm) AS BIGINT) AS sum_vm2
      FROM ex GROUP BY pos
    ),
    v AS (
      SELECT pos, n_vecs, sum_vm, sum_vm2,
             CAST(CAST(n_vecs AS HUGEINT) * sum_vm2
                  - CAST(sum_vm AS HUGEINT) * sum_vm AS BIGINT) AS var_num
      FROM st
    )
    SELECT pos, n_vecs, sum_vm, sum_vm2, var_num,
           CAST(row_number() OVER (ORDER BY var_num DESC, pos) AS BIGINT)
             AS rk
    FROM v
"""
)


@register("sim_dim_variance_profile", oracle=_DIMVAR_ORACLE)
def sim_dim_variance_profile(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M316 — Per-DIMENSION variance terms of the embedding corpus —
    n, Σvm, Σvm² on the micro-unit carrier plus the exact
    population-variance numerator n·Σvm² − (Σvm)² and the variance
    rank: the evidence behind every prefix-dimension decision
    (matryoshka truncation M252 keeps the FIRST dims; this profile
    shows whether the first dims actually carry the variance, and is
    the integer input a PCA/OPQ rotation decision reads).  The
    *_terms discipline: the variance itself divides by n², so its
    exact integer numerator ships instead.

    var_num is computed in wide integers (DECIMAL(38,0)/HUGEINT —
    n·Σvm² ≈ n²·(6·10⁵)² passes BIGINT at ~2.5·10³ vectors… the
    FIXTURE's 2·10³ stays under, but a regenerated or scaled corpus
    would not, so the wide-integer rule applies unconditionally) and
    the result casts back to BIGINT only while n ≤ √(2⁶³/var(vm)) —
    ~5·10³ vectors at the worst-case ±6·10⁵ component spread, ~10⁵ at
    a typical 10¹⁰-µ² per-dimension variance (ADVICE r15: the earlier
    ~10⁷ figure was off by orders of magnitude).  Both engines raise
    loudly on overflow (ANSI / HUGEINT→BIGINT cast); past the bound,
    normalize per-dimension first or consume the DECIMAL upstream of
    the cast.  The rank window rides the pmod
    constant key over the 64-row dimension table.  Scale: ONE
    map-side-combinable agg over the exploded (pos, vm) projection —
    corpus-linear, no joins; the profile is d rows.  ``e=`` overrides
    the embeddings frame (probe kwarg; a constant-dimension injection
    pins the var_num = 0 floor the fixture cannot reach)."""
    if e is None:
        e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ex = _pq_exm(e)
    st = ex.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("vm").cast("bigint").alias("sum_vm"),
        F.sum(F.col("vm") * F.col("vm")).cast("bigint").alias("sum_vm2"),
    )
    v = st.select(
        "pos",
        "n_vecs",
        "sum_vm",
        "sum_vm2",
        F.expr(
            "CAST(CAST(n_vecs AS DECIMAL(38,0)) * sum_vm2"
            " - CAST(sum_vm AS DECIMAL(38,0)) * sum_vm AS BIGINT)"
        ).alias("var_num"),
    )
    w = Window.partitionBy(F.pmod(F.col("pos"), F.lit(1))).orderBy(
        F.desc("var_num"), F.asc("pos")
    )
    return v.select(
        "pos",
        "n_vecs",
        "sum_vm",
        "sum_vm2",
        "var_num",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# sim_anisotropy_terms (M318) — one-pass embedding anisotropy diagnostic
# ---------------------------------------------------------------------------

# Shift constants for the two signed integral divisions, sized from
# DOMAIN BOUNDS (the r17 Lehr lesson — never size a shift by habit):
# |mean pair dot| <= mean norm^2 <= 64e12 u^2 (components cap at 1e6),
# so the pair carrier shifts by 1e14; |ani| <= 1e6 ppm by
# Cauchy-Schwarz, so the ppm carrier shifts by 1e7.  (The original
# shared 1e9 was too small for anti-aligned corpora — both engines
# truncated identically so parity couldn't see it; the Gram-identity
# hypothesis suite caught it.)  Bounds re-derived + adversarially
# floor-pinned in tests/test_units.py::
# test_registered_shift_constants_sized_from_domain_bounds.
_ANI_BIG_PAIR = 10**14
_ANI_BIG_PPM = 10**7


@register(
    "sim_anisotropy_terms",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) s
    ),
    exm AS (
      SELECT vec_id, pos, CAST(round(val * 1000000) AS BIGINT) AS vm FROM ex
    ),
    per_pos AS (
      SELECT pos,
             CAST(sum(vm) AS BIGINT) AS s_pos,
             CAST(sum(vm * vm) AS BIGINT) AS ssq_pos,
             CAST(count(*) AS BIGINT) AS cnt_pos
      FROM exm GROUP BY pos
    ),
    tot AS (
      SELECT CAST(sum(cnt_pos) // 64 AS BIGINT) AS n,
             CAST(sum(ssq_pos) AS HUGEINT) AS sn2,
             sum(CAST(s_pos AS HUGEINT) * s_pos) AS gram
      FROM per_pos
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           CAST(sn2 AS BIGINT) AS sum_norm2_u2,
           CAST(sn2 // n AS BIGINT) AS mean_norm2_u2,
           CAST(gram // n AS BIGINT) AS gram_div_n,
           CAST(CASE WHEN n <= 1 THEN NULL ELSE
                (gram - sn2 + CAST({_ANI_BIG_PAIR} AS HUGEINT) * (n * (n - 1)))
                // (n * (n - 1)) - {_ANI_BIG_PAIR} END AS BIGINT)
             AS mean_pair_dot_u2,
           CAST(CASE WHEN n <= 1 OR sn2 = 0 THEN NULL ELSE
                (1000000 * (gram - sn2)
                 + CAST({_ANI_BIG_PPM} AS HUGEINT) * ((n - 1) * sn2))
                // ((n - 1) * sn2) - {_ANI_BIG_PPM} END AS BIGINT) AS ani_ppm
    FROM tot
    """,
)
def sim_anisotropy_terms(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M318 — embedding ANISOTROPY terms (Ethayarajh's diagnostic; an
    isotropic embedding space has mean pairwise cosine ≈ 0, a
    collapsed one ≈ 1 — the single number that says whether cosine
    similarity is still informative before any retrieval tier is
    tuned): mean pairwise dot (µ-unit², over ALL n(n−1) ordered
    pairs) and its ratio to the mean squared norm in ppm.  The
    all-pairs sum NEVER materializes pairs — the Gram identity
    Σ_{{i≠j}} <vi,vj> = |Σvi|² − Σ|vi|² turns it into per-dimension
    component sums: one scan, one 64-row rollup, zero joins.

    All integer: vm micro-carriers, gram/sn2 in HUGEINT/DECIMAL(38,0)
    (M192 rule), and the two signed ratios through the +BIG·den shift
    identity (floor == truncate).  Scale: the per-pos partial is
    map-side combinable — the 100 TB cost is exactly one corpus scan,
    which is why this is THE cheap drift probe to run before the
    O(n·k) quantizer retrain (sim_quantizer_drift, M305).

    ``e=`` substitutes the embedding frame for probes; the driver
    contract never passes it."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    exm = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos0", "val")
    ).select(
        "vec_id",
        F.round(F.col("val").cast("double") * 1_000_000)
        .cast("bigint")
        .alias("vm"),
        (F.col("pos0") + 1).alias("pos"),
    )
    per_pos = exm.groupBy("pos").agg(
        F.sum("vm").cast("bigint").alias("s_pos"),
        F.sum(F.col("vm") * F.col("vm")).cast("bigint").alias("ssq_pos"),
        F.count(F.lit(1)).cast("bigint").alias("cnt_pos"),
    )
    tot = per_pos.agg(
        F.expr("sum(cnt_pos) div 64").cast("bigint").alias("n"),
        # widen BEFORE summing — a BIGINT-aggregated sum would give
        # the Spark side less headroom than the oracle's native
        # HUGEINT sum (the r17 Lehr asymmetric-overflow class; the
        # binding stage in both engines is the per-pos BIGINT partial)
        F.sum(F.expr("CAST(ssq_pos AS DECIMAL(38,0))")).alias("sn2"),
        F.sum(F.expr("CAST(s_pos AS DECIMAL(38,0)) * s_pos")).alias("gram"),
    )
    return tot.select(
        F.col("n").alias("n_vectors"),
        F.col("sn2").cast("bigint").alias("sum_norm2_u2"),
        F.expr("CAST(sn2 div n AS BIGINT)").alias("mean_norm2_u2"),
        F.expr("CAST(gram div n AS BIGINT)").alias("gram_div_n"),
        F.expr(
            f"CAST(CASE WHEN n <= 1 THEN NULL ELSE"
            f" (gram - sn2 + CAST({_ANI_BIG_PAIR} AS DECIMAL(38,0))"
            f" * (n * (n - 1))) div (n * (n - 1)) - {_ANI_BIG_PAIR} END AS BIGINT)"
        ).alias("mean_pair_dot_u2"),
        F.expr(
            f"CAST(CASE WHEN n <= 1 OR sn2 = 0 THEN NULL ELSE"
            f" (1000000 * (gram - sn2) + CAST({_ANI_BIG_PPM} AS DECIMAL(38,0))"
            f" * ((n - 1) * sn2)) div ((n - 1) * sn2) - {_ANI_BIG_PPM} END AS BIGINT)"
        ).alias("ani_ppm"),
    )


# ---------------------------------------------------------------------------
# sim_pq_k_curve (M325) — PQ distortion vs codebook size from ONE encode pass
# ---------------------------------------------------------------------------

_PQK_KS = (2, 4, 8)


def _pq_k_oracle() -> str:
    sel = " UNION ALL ".join(
        f"SELECT vec_id, {k} AS k, sum(m{k}) AS qerr FROM best GROUP BY vec_id"
        for k in _PQK_KS
    )
    mins = ", ".join(
        f"min(CASE WHEN code <= {k} THEN d2 END) AS m{k}" for k in _PQK_KS
    )
    return (
        _EX_CTE
        + _PQ_ENC_CTE
        + f""",
    best AS (SELECT vec_id, s, {mins} FROM enc0 GROUP BY vec_id, s),
    q AS ({sel})
    SELECT CAST(k AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN qerr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           CAST(sum(qerr) AS BIGINT) AS sum_qerr,
           CAST(sum(qerr) // count(*) AS BIGINT) AS mean_qerr,
           CAST(max(qerr) AS BIGINT) AS max_qerr
    FROM q GROUP BY k
    """
    )


@register("sim_pq_k_curve", oracle=_pq_k_oracle())
def sim_pq_k_curve(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M325 — the PQ CODEBOOK-SIZE tuning curve: total / mean / worst
    self-ADC distortion at k ∈ 2/4/8 codebook entries per subspace,
    from ONE encode pass (the code sets nest — codes 1..2 ⊂ 1..4 ⊂
    1..8 — so the per-(vector, subspace) minimum at every k is a
    conditional min over the SAME enc0 table: the curve-over-prefix
    rule on the code axis).  Distortion is provably non-increasing in
    k (min over a superset — twin-pinned monotone), and n_zero == k is
    the built-in anchor (exactly the k codebook vectors reconstruct
    exactly).  M294 histograms the distortion AT k=8; this is the
    memory-vs-distortion axis a PQ deployment sizes by — the third
    index tuning curve after IVF n_probe (M263) and LSH (b,r) (M264).

    Composed, not copied: the Spark side reuses the registered
    _pq_exm/_pq_sub/_pq_cb/_pq_enc0 helpers; the oracle splices the
    shared _PQ_ENC_CTE (the M104 single home).  Scale: one bounded
    (n × subspaces × 8) encode table, one conditional-min rollup, a
    ×3 explode on the per-vector rows — map-side combinable
    throughout.

    ``e=`` substitutes the embedding frame for probes; the driver
    contract never passes it."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    sub = _pq_sub(_pq_exm(e))
    enc0 = _pq_enc0(sub, _pq_cb(sub))
    best = enc0.groupBy("vec_id", "s").agg(
        *[
            F.min(F.when(F.col("code") <= k, F.col("d2"))).alias(f"m{k}")
            for k in _PQK_KS
        ]
    )
    q = best.groupBy("vec_id").agg(
        *[F.sum(f"m{k}").cast("bigint").alias(f"q{k}") for k in _PQK_KS]
    )
    ks = q.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("bigint").alias("k"),
                        F.col(f"q{k}").alias("qerr"),
                    )
                    for k in _PQK_KS
                ]
            )
        ).alias("r")
    ).select("r.k", "r.qerr")
    return ks.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(F.when(F.col("qerr") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
        F.sum("qerr").cast("bigint").alias("sum_qerr"),
        F.expr("sum(qerr) div count(*)").cast("bigint").alias("mean_qerr"),
        F.max("qerr").cast("bigint").alias("max_qerr"),
    )


# ---------------------------------------------------------------------------
# sim_mutual_knn — mutual top-3 pairs from the registered kNN join
# ---------------------------------------------------------------------------


def _mutual_knn_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH knn AS MATERIALIZED ({ORACLES["sim_knn_join"]})
    SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b,
           CAST(a.rn AS BIGINT) AS rn_ab, CAST(b.rn AS BIGINT) AS rn_ba,
           a.cosine
    FROM knn a
    JOIN knn b ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
    WHERE a.vec_id < a.neighbor_id
    """


@register("sim_mutual_knn", oracle=_mutual_knn_oracle())
def sim_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M335 — MUTUAL kNN pairs: vector pairs that each rank the other
    inside their cell-blocked top-3 (the registered J9 frame, both
    directions) — the matching-robust retrieval primitive (mutual-NN
    pairs are the classic seed for dedup clustering, bitext mining
    and correspondence problems precisely because one-directional
    neighbors are hub-polluted: a celebrity vector is in everyone's
    top-k, but almost nobody is in ITS top-k).  Emits (vec_a < vec_b,
    both ranks, the shared cosine).

    Composed, not copied: QUERIES['sim_knn_join'] IS the base frame
    (checkpointed once — it feeds both join sides: DOUBLE-REFERENCE
    RULE), and the oracle wraps ORACLES['sim_knn_join'] AS MATERIALIZED
    (the DuckDB inlining trap).  The cosine column inherits J9's
    6-dp-rounded carrier (ranks-on-rounded-scores rule).  Scale: the
    mutual join touches only the O(3n) kNN result, never the corpus.
    The base frame is the session-shared knn_join_materialized view
    (round-19: QUERIES['sim_knn_join'] now serves exactly that view,
    so the composition shares one pair-join run instead of re-running
    it; the frame arrives already checkpointed — the
    DOUBLE-REFERENCE pin lives in the view)."""
    knn = knn_join_materialized(spark, sf_dir)
    a = knn.alias("a")
    b = knn.alias("b")
    return (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.neighbor_id"))
            & (F.col("a.neighbor_id") == F.col("b.vec_id")),
        )
        .filter(F.col("a.vec_id") < F.col("a.neighbor_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("a.neighbor_id").alias("vec_b"),
            F.col("a.rn").cast("bigint").alias("rn_ab"),
            F.col("b.rn").cast("bigint").alias("rn_ba"),
            F.col("a.cosine").alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# sim_rocchio_feedback — one round of pseudo-relevance feedback
# ---------------------------------------------------------------------------

_ROC_FB = 5  # feedback depth (top-k whose centroid expands the query)
_ROC_K = 10  # final retrieval depth
#: Shift constant for the signed centroid floor cm = (Σvm + BIG·k)
#: div k − BIG.  Domain bound: |Σ_{top5} vm| ≤ 5·10⁶ per dimension
#: (|component| ≤ 1 ⇒ |vm| ≤ 10⁶ — fixture-verified in the shift
#: audit), so BIG ≥ 10⁶; held at 1000× headroom.
_ROC_BIG = 1_000_000_000


def _rocchio_oracle() -> str:
    return (
        _EX_CTE
        + f""",
    exm AS MATERIALIZED (
      SELECT vec_id, pos, CAST(round(val * 1000000) AS BIGINT) AS vm FROM ex
    ),
    q AS (SELECT pos, vm AS qm FROM exm WHERE vec_id = {QUERY_VEC_ID}),
    sc AS MATERIALIZED (
      SELECT e.vec_id, CAST(sum(e.vm * q.qm) AS BIGINT) AS dot0
      FROM exm e JOIN q USING (pos)
      WHERE e.vec_id <> {QUERY_VEC_ID}
      GROUP BY e.vec_id
    ),
    top5 AS (SELECT vec_id FROM sc ORDER BY dot0 DESC, vec_id
             LIMIT {_ROC_FB}),
    cen AS (
      SELECT pos,
             CAST((sum(vm) + CAST({_ROC_BIG} AS HUGEINT) * {_ROC_FB})
                  // {_ROC_FB} - {_ROC_BIG} AS BIGINT) AS cm
      FROM exm JOIN top5 USING (vec_id) GROUP BY pos
    ),
    sc2 AS (
      SELECT e.vec_id, CAST(sum(e.vm * c.cm) AS BIGINT) AS dot_c
      FROM exm e JOIN cen c USING (pos)
      WHERE e.vec_id <> {QUERY_VEC_ID}
      GROUP BY e.vec_id
    ),
    orig AS (SELECT vec_id FROM sc ORDER BY dot0 DESC, vec_id
             LIMIT {_ROC_K}),
    out AS (
      SELECT vec_id, dot_c,
             row_number() OVER (ORDER BY dot_c DESC, vec_id) AS rk17
      FROM sc2
    )
    SELECT CAST(out.rk17 AS BIGINT) AS rk, out.vec_id,
           out.dot_c AS dot_c_u2,
           CAST(CASE WHEN orig.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
             AS in_orig10
    FROM out LEFT JOIN orig ON out.vec_id = orig.vec_id
    WHERE out.rk17 <= {_ROC_K}
    """
    )


@register("sim_rocchio_feedback", oracle=_rocchio_oracle())
def sim_rocchio_feedback(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M336 — one round of ROCCHIO pseudo-relevance feedback (query
    expansion, the alpha=0 beta=1 corner): retrieve the query vector's
    top-5 by the exact integer dot, replace the query with their
    micro-unit integer CENTROID (per-dimension sum floored by the
    +BIG·k shift — component sums are SIGNED), retrieve the top-10 by
    the centroid, and flag which of them the ORIGINAL top-10 already
    contained — in_orig10 = 0 rows are what feedback bought.  The
    retrieval-quality family's missing member: RRF fuses rankings
    (M232), recall curves grade them (M241), MMR diversifies them
    (M282) — this one EXPANDS the query, the first-round trick of
    every IR stack.

    All-integer: dots in µ-unit², the one signed floor via the shift
    identity; ranks on exact integers with unique tie-breaks (NOT the
    6-dp cosine carrier — unnormalized dots need no norms at all).
    Scale: two corpus passes (score against a 64-row broadcast query,
    then a 64-row broadcast centroid) + two global sort-limits; the
    scored frame is checkpointed once (it feeds top-5 AND the original
    top-10: DOUBLE-REFERENCE RULE).

    ``e=`` substitutes the embedding frame for probes; the driver
    contract never passes it."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    exm = _pq_exm(e).select("vec_id", "pos", "vm")
    q = exm.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "pos", F.col("vm").alias("qm")
    )
    corpus = exm.filter(F.col("vec_id") != QUERY_VEC_ID)
    # the first-round scores feed top-5 AND the original top-10.
    sc = iter_materialize(
        corpus.join(F.broadcast(q), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("vm") * F.col("qm")).cast("bigint").alias("dot0"))
    )
    top5 = sc.orderBy(F.col("dot0").desc(), F.col("vec_id")).limit(_ROC_FB)
    cen = (
        exm.join(F.broadcast(top5.select("vec_id")), "vec_id")
        .groupBy("pos")
        .agg(
            F.expr(
                f"CAST((sum(vm) + CAST({_ROC_BIG} AS DECIMAL(38,0))"
                f" * {_ROC_FB}) div {_ROC_FB} - {_ROC_BIG} AS BIGINT)"
            ).alias("cm")
        )
    )
    sc2 = (
        corpus.join(F.broadcast(cen), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("vm") * F.col("cm")).cast("bigint").alias("dot_c"))
    )
    out = sc2.orderBy(F.col("dot_c").desc(), F.col("vec_id")).limit(_ROC_K)
    w = Window.partitionBy(F.pmod(F.col("dot_c"), F.lit(1))).orderBy(
        F.col("dot_c").desc(), F.col("vec_id")
    )
    orig10 = sc.orderBy(F.col("dot0").desc(), F.col("vec_id")).limit(
        _ROC_K
    ).select("vec_id", F.lit(1).alias("hit"))
    return (
        out.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .join(orig10, "vec_id", "left")
        .select(
            "rk",
            "vec_id",
            F.col("dot_c").alias("dot_c_u2"),
            F.coalesce(F.col("hit"), F.lit(0)).cast("bigint").alias("in_orig10"),
        )
    )


# ---------------------------------------------------------------------------
# M346 sim_label_scatter_terms — exact within-label scatter carriers
# ---------------------------------------------------------------------------


def _label_scatter_oracle() -> str:
    return (
        _EX_CTE
        + """,
    exm AS (
      SELECT vec_id, label, pos, CAST(round(val * 1000000) AS BIGINT) AS vm
      FROM ex
    ),
    pp AS (
      SELECT label, pos, CAST(sum(vm) AS BIGINT) AS s_pos,
             CAST(sum(vm * vm) AS BIGINT) AS ssq_pos,
             CAST(count(*) AS BIGINT) AS cnt_pos
      FROM exm GROUP BY label, pos
    ),
    t AS (
      SELECT label,
             CAST(sum(cnt_pos) // 64 AS BIGINT) AS n,
             CAST(sum(ssq_pos) AS HUGEINT) AS ssq,
             sum(CAST(s_pos AS HUGEINT) * s_pos) AS s2
      FROM pp GROUP BY label
    )
    SELECT CAST(label AS BIGINT) AS label, CAST(n AS BIGINT) AS n_vecs,
           CAST(ssq AS BIGINT) AS ssq_u2,
           CAST(s2 AS BIGINT) AS s2_u2,
           CAST(n * ssq - s2 AS BIGINT) AS within_num,
           CASE WHEN n = 0 THEN NULL
                ELSE CAST(ssq // n AS BIGINT) END AS mean_norm2_u2
    FROM t
    """
    )


@register("sim_label_scatter_terms", oracle=_label_scatter_oracle())
def sim_label_scatter_terms(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """M346 — exact WITHIN-LABEL scatter carriers per label:
    n·Σ|v|² − |Σv|² ≡ n²·Var-like scatter in µ² (the Gram identity
    per group — the r16 anisotropy machinery partitioned by label),
    plus the raw Σ|v|² and |Σv|² terms and the mean norm² — the
    integer inputs of Calinski-Harabasz / silhouette-style cluster
    quality (M148's cohesion is a ROUNDED cosine to the centroid;
    these are exact integers that survive the hash gate, the *_terms
    discipline).  within_num ≥ 0 by Cauchy-Schwarz — twin-pinned.

    Headroom: the binding stage in BOTH engines is the per-(label,
    pos) BIGINT partials (ssq_pos ≤ n·10¹², (s_pos)² via the widened
    product) — safe to n ≈ 9·10⁶ saturated-component vectors per
    label (~6·10⁸ typical unit-norm, |vm| ~ 10⁶/√64); past that,
    lift the partials to DECIMAL.  The label-level sums are widened
    BEFORE aggregation on the Spark side to match the oracle's native
    HUGEINT sums.  Scale: one scan to the (label, pos) partials —
    map-side combinable, zero joins.

    Degenerate-n guard (probe-kwarg guard rule): an injected frame
    whose embeddings carry fewer than 64 components can drive
    n = Σcnt div 64 to 0 — mean_norm2_u2 is NULL (not an ANSI
    division error) in BOTH engines; unreachable on the 64-dim
    fixture, injection-pinned in tests/test_r18_twins.py.

    ``e=`` substitutes the embedding frame for probes; the driver
    contract never passes it."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    exm = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("pos0", "val"),
    ).select(
        "label",
        F.round(F.col("val").cast("double") * 1_000_000)
        .cast("bigint")
        .alias("vm"),
        (F.col("pos0") + 1).alias("pos"),
    )
    pp = exm.groupBy("label", "pos").agg(
        F.sum("vm").cast("bigint").alias("s_pos"),
        F.sum(F.col("vm") * F.col("vm")).cast("bigint").alias("ssq_pos"),
        F.count(F.lit(1)).cast("bigint").alias("cnt_pos"),
    )
    t = pp.groupBy("label").agg(
        F.expr("sum(cnt_pos) div 64").cast("bigint").alias("n"),
        # widen BEFORE summing — a BIGINT-aggregated sum would give the
        # Spark side less headroom than the oracle's native HUGEINT sum
        # (the asymmetric-overflow class the r17 Lehr lesson named)
        F.sum(F.expr("CAST(ssq_pos AS DECIMAL(38,0))")).alias("ssq"),
        F.sum(F.expr("CAST(s_pos AS DECIMAL(38,0)) * s_pos")).alias("s2"),
    )
    return t.select(
        F.col("label").cast("bigint").alias("label"),
        F.col("n").alias("n_vecs"),
        F.col("ssq").cast("bigint").alias("ssq_u2"),
        F.col("s2").cast("bigint").alias("s2_u2"),
        F.expr("CAST(n * ssq - s2 AS BIGINT)").alias("within_num"),
        F.expr(
            "CASE WHEN n = 0 THEN NULL"
            " ELSE CAST(ssq div n AS BIGINT) END"
        ).alias("mean_norm2_u2"),
    )


# ---------------------------------------------------------------------------
# M352 sim_knn_hubness — in-degree distribution of the kNN graph
# ---------------------------------------------------------------------------


def _knn_hubness_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH knn AS MATERIALIZED ({ORACLES["sim_knn_join"]}),
    ind AS (
      SELECT e.vec_id,
             CAST(coalesce(k.c, 0) AS BIGINT) AS in_degree
      FROM embeddings e
      LEFT JOIN (SELECT neighbor_id, CAST(count(*) AS BIGINT) AS c
                 FROM knn GROUP BY neighbor_id) k
        ON k.neighbor_id = e.vec_id
    )
    SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(vec_id) AS BIGINT) AS first_vec
    FROM ind GROUP BY in_degree
    """


@register("sim_knn_hubness", oracle=_knn_hubness_oracle())
def sim_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.M M352 — HUBNESS of the registered kNN graph: the
    in-degree distribution of J9's cell-blocked top-3 neighbor
    relation, zero-in-degree vectors included (the corpus spine LEFT
    joins the neighbor counts) — the intrinsic-dimensionality
    pathology meter: in high-dimensional spaces a few vectors appear
    in EVERYONE'S top-k (hubs) while many appear in no one's
    (anti-hubs), which silently degrades retrieval and is exactly why
    mutual-kNN (M335) filters one-directional neighbors.  A healthy
    distribution concentrates near k; a hub-heavy tail says
    re-normalize or re-embed.

    Composed, not copied: the session-shared knn_join_materialized
    view IS the edge frame (QUERIES['sim_knn_join'] serves the same
    view — round-19 sharing); the oracle wraps
    ORACLES['sim_knn_join'] AS MATERIALIZED (the DuckDB inlining
    trap).  Scale: the rollup touches the O(3n) kNN result and the
    vector spine — never pairs."""
    knn = knn_join_materialized(spark, sf_dir)
    e = load(spark, sf_dir, "embeddings").select("vec_id")
    ind = e.join(
        knn.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        ),
        "vec_id",
        "left",
    ).select(
        "vec_id", F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("in_degree")
    )
    return ind.groupBy("in_degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.min("vec_id").cast("bigint").alias("first_vec"),
    )
