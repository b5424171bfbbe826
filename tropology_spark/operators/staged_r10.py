"""STAGED round-10 operators — implemented and parity-tested, NOT yet
registered (the round-8 staging pattern, second application).

The round-9 driver window is exactly budgeted (_R9_NEW + _R9_RETUNED +
_R9_STALE — see ``tropology_spark/__init__.py``), and the window test
requires every never-sampled query to sit INSIDE the first 50, so new
registrations are blocked until round 10 re-budgets the window.  These
ops live here with the SAME (fn, oracle) contract the registry uses;
round 10 activates each by moving it into its home module with
``@register`` + the five-fold lockstep (CLAUDE.md).  Until then
tests/test_staged_r10.py runs the full driver-replica comparison over
``STAGED`` at both verification scales, plus Python twins for the
formula-bearing ops and a partitioning-invariance probe.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.sources.tables import load

#: name -> (query_fn, oracle_sql); the registry contract, unregistered.
STAGED: dict = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# join_range_2d_parts — 2-D band join via grid buckets (M197 in 2-D)
# ---------------------------------------------------------------------------

_R2D_W_CENTS = 50  # |Δprice| <= 50 cents
_R2D_W_SIZE = 2    # |Δsize|  <= 2


@_stage(
    "join_range_2d_parts",
    oracle=f"""
    WITH pc AS (
      SELECT p_partkey AS k, CAST(round(p_retailprice * 100) AS BIGINT) AS c,
             CAST(p_size AS BIGINT) AS s
      FROM part
    ),
    pairs AS (
      SELECT a.k AS ka, b.k AS kb
      FROM pc a JOIN pc b
        ON a.k <> b.k
       AND abs(a.c - b.c) <= {_R2D_W_CENTS}
       AND abs(a.s - b.s) <= {_R2D_W_SIZE}
    )
    SELECT pc.k AS p_partkey,
           CAST(count(pairs.kb) AS BIGINT) AS n_neighbors,
           CAST(min(pairs.kb) AS BIGINT) AS min_partner
    FROM pc LEFT JOIN pairs ON pc.k = pairs.ka
    GROUP BY pc.k
    """,
)
def join_range_2d_parts(
    spark: SparkSession, sf_dir: str, parts: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the 2-D BAND JOIN: for every part, how many other
    parts sit within (|Δprice| ≤ 50 cents AND |Δsize| ≤ 2) and the
    smallest such partner key — the product-substitutability
    neighborhood, and the M197 bucket idiom lifted to TWO dimensions
    (completing the range-join family: 1-D band M197, intervals M238,
    2-D grids here — the shape every spatial/embedding-block join
    reduces to).

    The rewrite: grid cell = (cents div W_c, size div W_s); a
    qualifying pair's cells differ by ≤ 1 on each axis, so the probe
    side explodes to its 3×3 neighbor cells (9 DISTINCT cell keys per
    row — each matching pair meets on exactly ONE of them, the build
    row's own cell, so no dedup is needed) and the exact predicate
    prunes after the equi-join.  Candidate cost is bounded by grid
    occupancy, never corpus²; the declared inequality join stays
    oracle-only.  Every part is emitted (n_neighbors = 0 with NULL
    partner kept by the left join) so the result verifies at every
    scale.

    ``parts=`` substitutes the part frame — (p_partkey, p_retailprice,
    p_size) — for the weak-scaling probe (tools/scale_probes/
    range2d_scale.py); the driver contract never passes it."""
    src = parts if parts is not None else load(spark, sf_dir, "part")
    pc = src.select(
        F.col("p_partkey").alias("k"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("c"),
        F.col("p_size").cast("bigint").alias("s"),
    )
    build = pc.select(
        F.col("k").alias("kb"),
        F.col("c").alias("cb"),
        F.col("s").alias("sb"),
        F.expr(f"c div {_R2D_W_CENTS}").alias("gx"),
        F.expr(f"s div {_R2D_W_SIZE}").alias("gy"),
    )
    probe = pc.select(
        "k", "c", "s",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dx ->"
                f" transform(sequence(-1, 1), dy ->"
                f" struct(c div {_R2D_W_CENTS} + dx AS gx,"
                f"        s div {_R2D_W_SIZE} + dy AS gy))))"
            )
        ).alias("g"),
    ).select("k", "c", "s", F.col("g.gx").alias("gx"), F.col("g.gy").alias("gy"))
    cand = probe.join(build, ["gx", "gy"]).filter(
        (F.col("k") != F.col("kb"))
        & (F.abs(F.col("c") - F.col("cb")) <= _R2D_W_CENTS)
        & (F.abs(F.col("s") - F.col("sb")) <= _R2D_W_SIZE)
    )
    agg = cand.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
        F.min("kb").cast("bigint").alias("min_partner"),
    )
    return pc.select("k").join(agg, "k", "left").select(
        F.col("k").alias("p_partkey"),
        F.coalesce(F.col("n_neighbors"), F.lit(0)).cast("bigint").alias("n_neighbors"),
        F.col("min_partner"),
    )


# ---------------------------------------------------------------------------
# sim_ivf_batch_topk — the batch IVF serving path (one probe join)
# ---------------------------------------------------------------------------

_BATCH_QUERY_IDS = (0, 7, 19, 23, 42)
_BATCH_K = 5
_BATCH_PROBE = 2


def _ivf_batch_oracle() -> str:
    from tropology_spark.operators.similarity import _EX_CTE, _LLOYD_SQL_ITER

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


@_stage("sim_ivf_batch_topk", oracle=_ivf_batch_oracle())
def sim_ivf_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — BATCH IVF search: top-{k} per query for a SET of
    query vectors in ONE pass (probe table join), the serving shape a
    production retrieval tier actually runs — per-query searches
    re-scan the index |Q| times; the batch path joins the candidate
    set once and fans the rerank per (query, candidate) pair.  Same
    train/probe/rerank semantics as the registered sim_ivf_topk
    (label-seeded one-round assignment, {p}-cell probe, exact rerank),
    generalized from the scalar query to a query relation.

    Scale: the probe table is |Q|×{p} rows (broadcast); candidates are
    |Q|×(corpus/cells×{p}) — the IVF contract; the rerank joins each
    candidate to its query's broadcast vector, so the corpus is
    touched once regardless of |Q|."""
    from tropology_spark.operators.similarity import (
        as_double,
        dot,
        lloyd_rounds,
        norm,
    )
    from tropology_spark.session import iter_materialize

    e = load(spark, sf_dir, "embeddings")
    ev = iter_materialize(
        e.select(
            "vec_id", "label", as_double(F.col("embedding")).alias("emb")
        ).withColumn("nv", norm(F.col("emb")))
    )
    assign0 = ev.select("vec_id", F.col("label").alias("cell"))
    vc, assign = lloyd_rounds(ev.select("vec_id", "emb", "nv"), assign0, 1)
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
# pipeline_compaction_plan — small-files compaction by cumulative binning
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 32768  # target output-file payload, chars


def _compaction_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH layout AS ({ORACLES['pipeline_shard_layout']}),
    files AS (
      SELECT l.shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(d.n_chars) AS BIGINT) AS bytes
      FROM layout l JOIN documents d ON l.doc_id = d.doc_id
      GROUP BY l.shard
    ),
    binned AS (
      SELECT shard, n_docs, bytes,
             CAST(coalesce(sum(bytes) OVER (ORDER BY shard
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0)
                  // {_COMPACT_TARGET} AS BIGINT) AS bin
      FROM files
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n_shards,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(bytes) AS BIGINT) AS bytes,
           CAST((1000000 * sum(bytes)) // {_COMPACT_TARGET} AS BIGINT)
             AS fill_ppm
    FROM binned GROUP BY bin
    """


@_stage("pipeline_compaction_plan", oracle=_compaction_oracle())
def pipeline_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the COMPACTION PLAN every lakehouse maintenance
    job computes: pack the M43 shard "files" into target-size output
    bins by the deterministic first-fit rule bin = (exclusive prefix
    sum of bytes, in shard order) div TARGET — a shard starts a new
    bin exactly when the running total crosses the target, so bins are
    contiguous shard ranges (merge-friendly: each output file reads
    consecutive inputs).  Per bin: shard count, docs, bytes, fill
    ratio in ppm (>1e6 = the bin that absorbed an oversized shard).

    Composed, not copied: the oracle wraps ORACLES['pipeline_shard_
    layout'] verbatim and the Spark side runs the registered M43
    query.  Scale: the corpus collapses to O(shards) file rows before
    the plan; the prefix sum rides the pmod constant key over the
    bounded shard axis (M196's bounded-domain argument — shard count
    is a config constant, not a data size)."""
    from tropology_spark.registry import QUERIES

    layout = QUERIES["pipeline_shard_layout"](spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    files = (
        layout.join(d, "doc_id")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("bytes"),
        )
    )
    w = (
        Window.partitionBy(F.pmod(F.col("shard"), F.lit(1)))
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = files.select(
        "shard",
        "n_docs",
        "bytes",
        F.coalesce(F.sum("bytes").over(w), F.lit(0))
        .cast("bigint")
        .alias("prefix"),
    ).select(
        "shard",
        "n_docs",
        "bytes",
        F.expr(f"prefix div {_COMPACT_TARGET}").cast("bigint").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.expr(f"(1000000 * sum(bytes)) div {_COMPACT_TARGET}")
        .cast("bigint")
        .alias("fill_ppm"),
    )


# ---------------------------------------------------------------------------
# text_pmi_collocations — integer-carrier PMI collocation ranking
# ---------------------------------------------------------------------------

_PMI_MIN_N = 3
_PMI_TOP = 50


@_stage(
    "text_pmi_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT l[i] AS x, l[i + 1] AS y
      FROM (SELECT string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 1
    ),
    big AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy FROM toks GROUP BY x, y),
    uni AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
      ) GROUP BY token
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    )),
    scored AS (
      SELECT b.x, b.y, b.n_xy, ux.n AS n_x, uy.n AS n_y,
             CAST((1000000 * CAST(b.n_xy AS HUGEINT) * tot.n_tokens)
                  // (CAST(ux.n AS HUGEINT) * uy.n) AS BIGINT) AS lift_ppm
      FROM big b JOIN uni ux ON b.x = ux.token
                 JOIN uni uy ON b.y = uy.token
                 CROSS JOIN tot
      WHERE b.n_xy >= {_PMI_MIN_N}
    )
    SELECT x, y, n_xy, n_x, n_y, lift_ppm,
           CAST(row_number() OVER (ORDER BY lift_ppm DESC, x, y) AS BIGINT)
             AS rn
    FROM scored
    QUALIFY rn <= {_PMI_TOP}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — COLLOCATION mining by pointwise mutual
    information: adjacent word pairs seen ≥ {m} times, scored by the
    exact-integer PMI lift  n_xy·N / (n_x·n_y)  in ppm (PMI's log is
    monotone in the lift, so ranking by the integer lift IS ranking by
    PMI with no float carrier), top-{t} by (lift DESC, pair) — the
    phrase detector feeding tokenizer vocabularies and stop-phrase
    lists.  The product 10⁶·n_xy·N is computed in DECIMAL(38,0) /
    HUGEINT (the M192 wide-integer finale rule, per ADVICE r9: at
    ~3e6+ tokens a frequent bigram overflows BIGINT — DuckDB raises
    while non-ANSI Spark wraps silently); the BIGINT quotient is safe
    (lift ≤ 10⁶·N).  J6's bigram extraction idiom (zip-with, oracle enumerates
    positions at the 4096 cap) + J4's unigram counts; the corpus total
    is a 1-row broadcast.

    Scale: two token passes collapse to count tables; the scoring
    join keys bigrams to their two unigram rows (shuffle on tokens —
    Zipf-skewed, but the ≥{m} filter prunes the long tail before the
    join); the final rank is a TakeOrdered over the filtered
    survivors."""
    d = load(spark, sf_dir, "documents")
    toked = d.select(F.split(F.col("text"), " ").alias("l"))
    pairs = F.zip_with(
        F.slice(F.col("l"), 1, F.greatest(F.size(F.col("l")) - 1, F.lit(0))),
        F.slice(F.col("l"), 2, F.greatest(F.size(F.col("l")) - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("x"), y.alias("y")),
    )
    big = (
        toked.select(F.explode(pairs).alias("p"))
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
        .filter(F.col("n_xy") >= _PMI_MIN_N)
    )
    uni = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    scored = (
        big.join(uni.select(F.col("token").alias("x"), F.col("n").alias("n_x")), "x")
        .join(uni.select(F.col("token").alias("y"), F.col("n").alias("n_y")), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x", "y", "n_xy", "n_x", "n_y",
            F.expr(
                "(CAST(1000000 AS DECIMAL(38,0)) * n_xy * n_tokens)"
                " div (CAST(n_x AS DECIMAL(38,0)) * n_y)"
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )
    w = Window.partitionBy(F.pmod(F.col("n_xy"), F.lit(1))).orderBy(
        F.desc("lift_ppm"), F.asc("x"), F.asc("y")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _PMI_TOP)
    )


text_pmi_collocations.__doc__ = text_pmi_collocations.__doc__.format(
    m=_PMI_MIN_N, t=_PMI_TOP
)


# ---------------------------------------------------------------------------
# pipeline_profile_drift — per-source drift between corpus versions
# ---------------------------------------------------------------------------


def _profile_drift_oracle() -> str:
    from tropology_spark.operators.pipeline_ops import DIFF_VERSIONS_SQL

    return (
        DIFF_VERSIONS_SQL
        + """
    , sa AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_a,
             CAST(sum(n_chars) AS BIGINT) AS chars_a
      FROM va GROUP BY source
    ),
    sb AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(n_chars) AS BIGINT) AS chars_b
      FROM vb GROUP BY source
    )
    SELECT coalesce(sa.source, sb.source) AS source,
           CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
           CAST(coalesce(n_b, 0) AS BIGINT) AS n_b,
           CAST(coalesce(chars_a, 0) AS BIGINT) AS chars_a,
           CAST(coalesce(chars_b, 0) AS BIGINT) AS chars_b,
           CAST(coalesce(n_b, 0) - coalesce(n_a, 0) AS BIGINT) AS delta_docs,
           CAST(coalesce(chars_b, 0) - coalesce(chars_a, 0) AS BIGINT)
             AS delta_chars
    FROM sa FULL OUTER JOIN sb ON sa.source = sb.source
    """
    )


@_stage("pipeline_profile_drift", oracle=_profile_drift_oracle())
def pipeline_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the PER-SOURCE DRIFT report between two corpus
    versions: document and character deltas per source, margins kept
    by the full outer join (a source present in only one version IS
    the headline finding) — the release-note companion of M237's
    global diff and the version-axis sibling of M94's temporal source
    drift.  Composed, not copied: both engines derive the versions
    from the shared DIFF_VERSIONS_SQL / diff_versions pair (the M237
    single home).

    Scale: each version collapses to O(sources) rows before the
    join; deltas are exact integer differences (n_chars is a stored
    BIGINT)."""
    from tropology_spark.operators.pipeline_ops import diff_versions

    va, vb = diff_versions(spark, sf_dir)
    sa = va.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a"),
        F.sum("n_chars").cast("bigint").alias("chars_a"),
    )
    sb = vb.groupBy(F.col("source").alias("source_b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("n_chars").cast("bigint").alias("chars_b"),
    )
    j = sa.join(sb, sa.source == sb.source_b, "full_outer")
    z = F.lit(0).cast("bigint")
    return j.select(
        F.coalesce(F.col("source"), F.col("source_b")).alias("source"),
        F.coalesce(F.col("n_a"), z).alias("n_a"),
        F.coalesce(F.col("n_b"), z).alias("n_b"),
        F.coalesce(F.col("chars_a"), z).alias("chars_a"),
        F.coalesce(F.col("chars_b"), z).alias("chars_b"),
        (F.coalesce(F.col("n_b"), z) - F.coalesce(F.col("n_a"), z))
        .cast("bigint")
        .alias("delta_docs"),
        (F.coalesce(F.col("chars_b"), z) - F.coalesce(F.col("chars_a"), z))
        .cast("bigint")
        .alias("delta_chars"),
    )


# ---------------------------------------------------------------------------
# ts_haar_volatility — 2-level Haar multi-resolution volatility
# ---------------------------------------------------------------------------


@_stage(
    "ts_haar_volatility",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    grid AS (
      SELECT day, h FROM days,
           (SELECT unnest(generate_series(0, 23)) AS h)
    ),
    cnt AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    x AS (
      SELECT grid.day, grid.h, coalesce(cnt.n, 0) AS x
      FROM grid LEFT JOIN cnt ON grid.day = cnt.day AND grid.h = cnt.h
    ),
    l1 AS (
      SELECT day, h // 2 AS j,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN h % 2 = 0 THEN x ELSE -x END) AS BIGINT) AS d1
      FROM x GROUP BY day, h // 2
    ),
    l2 AS (
      SELECT day, j // 2 AS j2,
             CAST(sum(CASE WHEN j % 2 = 0 THEN s1 ELSE -s1 END) AS BIGINT) AS d2
      FROM l1 GROUP BY day, j // 2
    ),
    tot AS (SELECT day, CAST(sum(x) AS BIGINT) AS total FROM x GROUP BY day),
    a1 AS (SELECT day, CAST(sum(abs(d1)) AS BIGINT) AS sad1 FROM l1 GROUP BY day),
    a2 AS (SELECT day, CAST(sum(abs(d2)) AS BIGINT) AS sad2 FROM l2 GROUP BY day)
    SELECT tot.day, total, sad1, sad2
    FROM tot JOIN a1 ON tot.day = a1.day JOIN a2 ON tot.day = a2.day
    """,
)
def ts_haar_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — 2-level HAAR wavelet volatility of the daily
    activity curve: each observed day's 24 zero-filled hourly counts
    decompose into 12 level-1 and 6 level-2 detail coefficients
    (pairwise differences at 2 h and 4 h scales); the per-day sums of
    |d1| and |d2| separate fast churn (hour-to-hour spikes) from slow
    shape (morning/evening ramps) — multi-resolution analysis as pure
    integer arithmetic, where an FFT never crosses the engine hash
    gate.  Zero-filled on the bounded 24-hour domain per OBSERVED day
    (missing hours are load-bearing zeros; absent days are not
    invented — the M203/M181 gap rules).

    Scale: the transform is hierarchical aggregation — groupBy(day,
    h div 2) then (day, j div 2) then (day), every stage map-side
    combinable on the same day-keyed partitioning; no window, no
    join wider than the ×24 bounded grid explode."""
    from tropology_spark.session import iter_materialize

    e = load(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000").cast("bigint")
    hour = F.expr("unix_micros(ts) div 3600000000 % 24").cast("bigint")
    cnt = e.groupBy(day.alias("day"), hour.alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    days = e.select(day.alias("day")).distinct()
    grid = days.select(
        "day", F.explode(F.expr("sequence(0L, 23L)")).alias("h")
    )
    x = iter_materialize(
        grid.join(cnt, ["day", "h"], "left").select(
            "day", "h", F.coalesce(F.col("n"), F.lit(0)).alias("x")
        )
    )  # three references below: l1, the per-day total, and via l1 -> l2
    l1 = x.groupBy("day", F.expr("h div 2").alias("j")).agg(
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(
            F.when(F.col("h") % 2 == 0, F.col("x")).otherwise(-F.col("x"))
        ).cast("bigint").alias("d1"),
    )
    l1 = iter_materialize(l1)  # feeds l2 AND the sad1 rollup
    l2 = l1.groupBy("day", F.expr("j div 2").alias("j2")).agg(
        F.sum(
            F.when(F.col("j") % 2 == 0, F.col("s1")).otherwise(-F.col("s1"))
        ).cast("bigint").alias("d2"),
    )
    sad1 = l1.groupBy("day").agg(
        F.sum(F.abs(F.col("d1"))).cast("bigint").alias("sad1")
    )
    sad2 = l2.groupBy("day").agg(
        F.sum(F.abs(F.col("d2"))).cast("bigint").alias("sad2")
    )
    total = x.groupBy("day").agg(F.sum("x").cast("bigint").alias("total"))
    return (
        total.join(sad1, "day").join(sad2, "day")
        .select("day", "total", "sad1", "sad2")
    )


# ---------------------------------------------------------------------------
# graph_rich_club_terms — rich-club density at degree thresholds
# ---------------------------------------------------------------------------

_RICH_KS = (4, 8, 16)


def _rich_club_oracle() -> str:
    from tropology_spark.operators.graph_motifs import _CAPPED_PROJ_CTE

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


@_stage("graph_rich_club_terms", oracle=_rich_club_oracle())
def graph_rich_club_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the RICH-CLUB coefficient terms of the
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
    from tropology_spark.operators.graph_motifs import _HUB_CAP, copurchase_projection
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
# analytics_chisq_priority_era — chi-square independence terms
# ---------------------------------------------------------------------------

_CHISQ_SPLIT_DATE = "1998-01-01"  # reuse the M242 era boundary


@_stage(
    "analytics_chisq_priority_era",
    oracle=f"""
    WITH c AS (
      SELECT o_orderpriority AS priority,
             CASE WHEN o_orderdate < TIMESTAMP '{_CHISQ_SPLIT_DATE}'
                  THEN 0 ELSE 1 END AS era,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT priority, CAST(sum(n) AS BIGINT) AS row_total
           FROM c GROUP BY 1),
    ct AS (SELECT era, CAST(sum(n) AS BIGINT) AS col_total FROM c GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
    SELECT c.priority, CAST(c.era AS BIGINT) AS era, c.n, row_total, col_total,
           CAST(c.n * n_total - row_total * col_total AS BIGINT) AS dev_num,
           CAST((1000000
                 * CAST(c.n * n_total - row_total * col_total AS HUGEINT)
                 * CAST(c.n * n_total - row_total * col_total AS HUGEINT))
                // (CAST(row_total AS HUGEINT) * col_total * n_total)
                AS BIGINT) AS chi_ppm
    FROM c JOIN rt ON c.priority = rt.priority
           JOIN ct ON c.era = ct.era
           CROSS JOIN tot
    """,
)
def analytics_chisq_priority_era(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — CHI-SQUARE INDEPENDENCE terms for the (order
    priority × era) contingency table: per cell the observed count,
    margins, the exact deviation numerator O·N − RT·CT, and the
    scaled cell contribution 10⁶·dev²/(RT·CT·N) — the independence
    test every mix-shift dashboard runs ("did the priority mix change
    between the eras"), with every carrier an exact integer.  dev² is
    computed in HUGEINT / DECIMAL(38,0) (the M192 wide-integer finale
    rule: at 100 TB O·N ~ 1e9·1e12 squares far past BIGINT); the
    quotient is non-negative over a non-negative denominator, so
    floor and trunc agree.

    Scale: the corpus collapses to the ≤ |priorities|×2 cell table in
    one map-side-combinable pass; margins and the total are rollups
    of the CELL table (never re-scans); everything after is
    broadcast-sized arithmetic."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.when(
            F.col("o_orderdate") < F.lit(_CHISQ_SPLIT_DATE).cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("era"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    from tropology_spark.session import iter_materialize

    c = iter_materialize(c)  # referenced by rt, ct, tot and the finale
    rt = c.groupBy("priority").agg(F.sum("n").cast("bigint").alias("row_total"))
    ct = c.groupBy("era").agg(F.sum("n").cast("bigint").alias("col_total"))
    tot = c.agg(F.sum("n").cast("bigint").alias("n_total"))
    dev = "(n * n_total - row_total * col_total)"
    return (
        c.join(F.broadcast(rt), "priority")
        .join(F.broadcast(ct), "era")
        .crossJoin(F.broadcast(tot))
        .select(
            "priority",
            F.col("era").cast("bigint").alias("era"),
            "n",
            "row_total",
            "col_total",
            F.expr(dev).cast("bigint").alias("dev_num"),
            F.expr(
                f"(CAST(1000000 AS DECIMAL(38,0))"
                f" * CAST({dev} AS DECIMAL(38,0))"
                f" * CAST({dev} AS DECIMAL(38,0)))"
                f" div (CAST(row_total AS DECIMAL(38,0)) * col_total * n_total)"
            )
            .cast("bigint")
            .alias("chi_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# graph_sample_neighbors2 — deterministic 2-hop neighbor sampling (GNN prep)
# ---------------------------------------------------------------------------

_SAMPLE_FANOUT = 3


@_stage(
    "graph_sample_neighbors2",
    oracle=f"""
    WITH edges AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    h1 AS (
      SELECT src AS seed, dst AS node,
             CAST(row_number() OVER (
               PARTITION BY src
               ORDER BY md5(CAST(src AS VARCHAR) || '_' || CAST(dst AS VARCHAR)),
                        dst) AS BIGINT) AS rk
      FROM edges QUALIFY rk <= {_SAMPLE_FANOUT}
    ),
    h2 AS (
      -- the rank alias must NOT be named rk: with h1 in scope QUALIFY
      -- would resolve a bare rk to h1.rk (always <= fanout, a no-op
      -- filter) instead of the new alias
      SELECT h1.seed, h1.node AS via, e.src AS node,
             CAST(row_number() OVER (
               PARTITION BY h1.seed, h1.node
               ORDER BY md5(CAST(h1.node AS VARCHAR) || '_'
                            || CAST(e.src AS VARCHAR)), e.src)
               AS BIGINT) AS rk2
      FROM h1 JOIN edges e ON e.dst = h1.node AND e.src <> h1.seed
      QUALIFY rk2 <= {_SAMPLE_FANOUT}
    )
    SELECT seed, CAST(1 AS BIGINT) AS hop, CAST(NULL AS BIGINT) AS via,
           node, rk
    FROM h1
    UNION ALL
    SELECT seed, CAST(2 AS BIGINT), via, node, rk2 FROM h2
    """,
)
def graph_sample_neighbors2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — deterministic 2-HOP NEIGHBOR SAMPLING, the
    GraphSAGE/GNN minibatch-preparation primitive: per seed work-node,
    at most {f} hop-1 tropes ranked by the md5 edge hash, and per
    sampled trope at most {f} hop-2 works (excluding the seed) —
    bounded {f} + {f}² rows per seed, reproducible on any engine, any
    partitioning, any day (the I7/M43 md5-rank discipline; a `rand()`
    sample would never cross the hash gate, and more importantly
    would never re-materialize the same training neighborhoods).

    Scale: hop-1 is one per-src window over the edge list; hop-2 is
    one shuffle on the trope key + a per-(seed, trope) window whose
    partitions are bounded by trope degree — a celebrity trope at
    100 TB takes the capped-projection split (the M119/M120 pattern)
    before the rank; the output is bounded by seeds × ({f} + {f}²),
    never by edge count."""
    from tropology_spark.sources.tables import edges_materialized

    e = edges_materialized(spark, sf_dir)
    w1 = Window.partitionBy("src").orderBy(
        F.md5(F.concat_ws("_", F.col("src"), F.col("dst"))), F.col("dst")
    )
    h1 = (
        e.withColumn("rk", F.row_number().over(w1).cast("bigint"))
        .filter(F.col("rk") <= _SAMPLE_FANOUT)
        .select(F.col("src").alias("seed"), F.col("dst").alias("node"), "rk")
    )
    e2 = e.select(F.col("src").alias("node2"), F.col("dst").alias("via_d"))
    w2 = Window.partitionBy("seed", "node").orderBy(
        F.md5(F.concat_ws("_", F.col("node"), F.col("node2"))), F.col("node2")
    )
    h2 = (
        h1.join(e2, h1.node == e2.via_d)
        .filter(F.col("node2") != F.col("seed"))
        .withColumn("rk2", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rk2") <= _SAMPLE_FANOUT)
        .select(
            "seed",
            F.lit(2).cast("bigint").alias("hop"),
            F.col("node").alias("via"),
            F.col("node2").alias("node"),
            F.col("rk2").alias("rk"),
        )
    )
    out1 = h1.select(
        "seed",
        F.lit(1).cast("bigint").alias("hop"),
        F.lit(None).cast("bigint").alias("via"),
        "node",
        "rk",
    )
    return out1.unionByName(h2)


graph_sample_neighbors2.__doc__ = graph_sample_neighbors2.__doc__.format(
    f=_SAMPLE_FANOUT
)


# ---------------------------------------------------------------------------
# sim_matryoshka_recall — prefix-dimension recall curve (MRL evaluation)
# ---------------------------------------------------------------------------

_MRL_PREFIXES = (8, 16, 32)
_MRL_K = 10


def _matryoshka_oracle() -> str:
    from tropology_spark.operators.similarity import _EX_CTE, QUERY_VEC_ID
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


@_stage("sim_matryoshka_recall", oracle=_matryoshka_oracle())
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — MATRYOSHKA (prefix-dimension) recall curve: how
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
    from tropology_spark.operators.similarity import (
        QUERY_VEC_ID,
        as_double,
        dot,
        norm,
    )
    from tropology_spark.registry import QUERIES
    from tropology_spark.session import iter_materialize

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
