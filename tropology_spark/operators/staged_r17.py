"""STAGED round-17 operators — implemented and parity-tested, NOT yet
registered (the round-8..16 staging pattern, seventh application).

The round-13 window executed and the round-14/15/16 slates are
already banked, so these bodies target ROUND 17.  Same (fn, oracle)
contract as the registry; activation is the mechanical move +
five-fold lockstep.  tests/test_staged_r17.py runs the driver-replica
compare at both verification scales, Python twins for the
formula-bearing ops, hypothesis property suites on the exact staged
paths, the partitioning-invariance probe, and the plan sweep.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).

New capability coverage (SURVEY §2.M candidates at activation):
- agg_distinct_sample_curve — naive distinct-count extrapolation
  error at md5-sample moduli 1/4/16 (the species-estimation bias a
  cardinality planner must know about; nested samples).
- text_zipf_rank_curve — rank×frequency Zipf product for the top-20
  tokens in ppm of the top frequency (the s=1 Zipf fit without logs).
- pipeline_shard_balance — per-shard occupancy under mod vs
  consistent-ring placement at 8 shards (the OTHER side of the r16
  moves audit: the ring's cheap re-sharding costs placement balance
  at low vnode counts).
- pipeline_reservoir_merge_audit — per-source top-k samples merged ==
  the global top-k sample, positions and all (the mergeable
  bottom-k-sketch guarantee that makes distributed uniform sampling
  a map-side operation).
- ts_dominant_period — argmax over hour-axis lags 2..48 of the exact
  integer autocorrelation score (equi-joined lags, the gap rule;
  M101 fixes row-lags 1..3 — this finds the PERIOD).
- agg_misra_gries_audit — per-shard Misra-Gries heavy-hitter
  summaries (k=8 counters over doc bigrams) offset-pruned, merged,
  re-pruned, vs the exact global top-8 — the mergeable-summary
  counterpart of the KMV/HLL/CMS/AMS/Bloom audit family; est ≤ exact
  pinned, the n/(k+1) theory bound twin-pinned.
- join_bloom_prefilter_audit — runtime-filter economics on a real
  join: Bloom(build keys) applied to the probe side at 8/16 bits per
  key — rows passed, false passes, and the shuffle-reduction ppm
  (what Spark's runtime row-group filtering buys).
- sim_mutual_knn — mutual top-3 pairs from the registered cell-blocked
  kNN join (both directions rank each other — the matching-robust
  retrieval primitive).
- sim_rocchio_feedback — one round of pseudo-relevance feedback:
  integer centroid of the query's top-5, re-retrieve top-10, flag
  the newcomers (the query-expansion audit, all-integer dots).
- analytics_lehr_sample_size — the experiment-design terms: pooled
  variance + mean gap between two order-priority cohorts and Lehr's
  n = 16·s²/d² as ONE ceiled integral division (the sample-size rule
  of thumb every A/B platform quotes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.session import iter_materialize
from tropology_spark.sources.tables import load

#: name -> (query_fn, oracle_sql); the registry contract, unregistered.
STAGED: dict = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco


def _md5_low32(col) -> F.Column:
    """The repo-wide portable hash: md5-low-32 of the string form."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


# ---------------------------------------------------------------------------
# agg_distinct_sample_curve — distinct-count extrapolation bias vs sample rate
# ---------------------------------------------------------------------------

_DSC_MODS = (1, 4, 16)


@_stage(
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
           CAST((1000000 * d_sample) // d_true AS BIGINT) AS seen_ppm
    FROM t
    """,
)
def agg_distinct_sample_curve(
    spark: SparkSession, sf_dir: str, orders: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the DISTINCT-COUNT EXTRAPOLATION bias curve:
    sample order ROWS by the deterministic md5 key at moduli s ∈
    1/4/16 (power-of-two moduli NEST — the s=16 sample is a subset of
    the s=4 sample, twin-pinned), count distinct customers in each
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
        F.col("o_custkey").alias("k"), _md5_low32(F.col("o_orderkey")).alias("hk")
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
        F.expr("(1000000 * d_sample) div d_true").cast("bigint").alias("seen_ppm"),
    )


# ---------------------------------------------------------------------------
# text_zipf_rank_curve — rank x frequency Zipf product for the top-20 tokens
# ---------------------------------------------------------------------------

_ZIPF_TOP = 20


@_stage(
    "text_zipf_rank_curve",
    oracle=f"""
    WITH tk AS (SELECT unnest(string_split(text, ' ')) AS token
                FROM documents),
    vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
              FROM tk GROUP BY token),
    rk AS (SELECT token, freq,
                  row_number() OVER (ORDER BY freq DESC, token) AS rk17
           FROM vocab),
    top AS (SELECT * FROM rk WHERE rk17 <= {_ZIPF_TOP}),
    t AS (
      SELECT CAST(rk17 AS BIGINT) AS rank, token, freq,
             CAST(max(CASE WHEN rk17 = 1 THEN freq END) OVER () AS BIGINT)
               AS top_freq
      FROM top
    )
    SELECT rank, token, freq, top_freq,
           CAST((1000000 * freq * rank) // top_freq AS BIGINT)
             AS zipf_ratio_ppm,
           CAST((1000000 * freq * rank) // top_freq - 1000000 AS BIGINT)
             AS dev_ppm
    FROM t
    """,
)
def text_zipf_rank_curve(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the ZIPF rank-frequency product for the top-20
    tokens: under Zipf's law with s=1, rank × frequency is constant,
    so the exact integer carrier 10⁶·c_r·r/c_1 sits near 10⁶ for a
    natural-language corpus and drifts for synthetic or boilerplate
    text — the corpus-naturalness screen that needs NO logarithms
    (the log-log regression's transcendentals never enter the hash
    gate).  dev_ppm is the signed per-rank deviation — the fitted
    residual a quality monitor tracks release-over-release.

    Ranking: the vocabulary is tiny next to the corpus (M164's
    argument), so its global (freq DESC, token) rank rides the
    pmod-constant-key window over the vocab frame — no corpus sort,
    no partition-less window over data-scale rows.  Scale: one token
    rollup (map-side combinable), one O(vocab) window, a 20-row tail.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    tk = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    vocab = tk.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    rk = vocab.withColumn(
        "rk17",
        F.row_number().over(
            Window.partitionBy(F.pmod(F.col("freq"), F.lit(1))).orderBy(
                F.col("freq").desc(), F.col("token")
            )
        ),
    ).filter(F.col("rk17") <= _ZIPF_TOP)
    w = Window.partitionBy(F.pmod(F.col("rk17"), F.lit(1)))
    t = rk.select(
        F.col("rk17").cast("bigint").alias("rank"),
        "token",
        "freq",
        F.max(F.when(F.col("rk17") == 1, F.col("freq")))
        .over(w)
        .cast("bigint")
        .alias("top_freq"),
    )
    return t.select(
        "rank",
        "token",
        "freq",
        "top_freq",
        F.expr("(1000000 * freq * rank) div top_freq")
        .cast("bigint")
        .alias("zipf_ratio_ppm"),
        (F.expr("(1000000 * freq * rank) div top_freq") - F.lit(1_000_000))
        .cast("bigint")
        .alias("dev_ppm"),
    )


# ---------------------------------------------------------------------------
# pipeline_shard_balance — per-shard occupancy under mod vs ring placement
# ---------------------------------------------------------------------------


def _shard_balance_oracle() -> str:
    from tropology_spark.operators.pipeline_ops import _CH_MOD, _RING8

    r8 = ", ".join(f"({s}, {r})" for s, _v, r in _RING8)
    return f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM documents
    ),
    ring8(shard, r) AS (VALUES {r8}),
    a8 AS (
      SELECT h.doc_id,
             (SELECT shard FROM ring8 rp
              ORDER BY (rp.r - h.h + {_CH_MOD}) % {_CH_MOD}, rp.shard, rp.r
              LIMIT 1) AS a
      FROM h
    ),
    cnt AS (
      SELECT 'mod8' AS scheme, h.h % 8 AS shard, CAST(count(*) AS BIGINT) AS c
      FROM h GROUP BY 2
      UNION ALL
      SELECT 'ring8', a, CAST(count(*) AS BIGINT) FROM a8 GROUP BY 2
    ),
    spine AS (
      SELECT sc.scheme, sh.shard
      FROM (SELECT unnest(['mod8', 'ring8']) AS scheme) sc,
           (SELECT unnest(generate_series(0, 7)) AS shard) sh
    ),
    f AS (
      SELECT spine.scheme, CAST(spine.shard AS BIGINT) AS shard,
             CAST(coalesce(cnt.c, 0) AS BIGINT) AS n_keys
      FROM spine LEFT JOIN cnt
        ON spine.scheme = cnt.scheme AND spine.shard = cnt.shard
    ),
    t AS (
      SELECT scheme, shard, n_keys,
             CAST(sum(n_keys) OVER (PARTITION BY scheme) AS BIGINT) AS n_total
      FROM f
    )
    SELECT scheme, shard, n_keys,
           CAST((1000000 * n_keys) // n_total AS BIGINT) AS share_ppm,
           CAST(1000 * n_keys - (1000 * n_total) // 8 AS BIGINT) AS dev_milli
    FROM t
    """


@_stage("pipeline_shard_balance", oracle=_shard_balance_oracle())
def pipeline_shard_balance(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — per-shard OCCUPANCY under the two placement
    schemes the r16 moves audit compares: mod hashing (perfectly
    balanced on a uniform hash) vs the 4-vnode consistent ring (arc
    lengths are uneven, so low vnode counts buy cheap re-sharding at
    the price of skewed shards — THE vnode-count trade-off, and
    exactly the skew a 100 TB ring-partitioned layout must size
    executor memory for).  Per (scheme, shard): key count, share_ppm,
    and the signed deviation from the ideal n/8 in milli-keys.  The
    8-shard spine is zero-filled (an arc can be empty), the per-scheme
    total rides a PARTITION BY scheme window — real key, no scalar
    attach.

    Composed: the ring successor arithmetic is pipeline_ops.py's
    ``ring_assign`` permanent single home (ADVICE r13 item 1 — no
    cross-slate coupling).  Scale: one hash pass, a 16-row rollup.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    from tropology_spark.operators.pipeline_ops import _RING8, ring_assign

    d = docs if docs is not None else load(spark, sf_dir, "documents")
    # h feeds the mod count AND the ring assignment — DOUBLE-REFERENCE.
    h = iter_materialize(
        d.select("doc_id", _md5_low32(F.col("doc_id")).alias("h"))
    )
    cnt = (
        h.select(F.lit("mod8").alias("scheme"), (F.col("h") % 8).alias("shard"))
        .unionByName(
            ring_assign(h, _RING8, "shard").select(
                F.lit("ring8").alias("scheme"), "shard"
            )
        )
        .groupBy("scheme", "shard")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    spine = spark.createDataFrame(
        [(sc, sh) for sc in ("mod8", "ring8") for sh in range(8)],
        "scheme string, shard long",
    )
    f = spine.join(cnt, ["scheme", "shard"], "left").select(
        "scheme",
        F.col("shard").cast("bigint").alias("shard"),
        F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("n_keys"),
    )
    w = Window.partitionBy("scheme")
    t = f.withColumn("n_total", F.sum("n_keys").over(w).cast("bigint"))
    return t.select(
        "scheme",
        "shard",
        "n_keys",
        F.expr("(1000000 * n_keys) div n_total").cast("bigint").alias("share_ppm"),
        (F.lit(1000) * F.col("n_keys") - F.expr("(1000 * n_total) div 8"))
        .cast("bigint")
        .alias("dev_milli"),
    )


# ---------------------------------------------------------------------------
# pipeline_reservoir_merge_audit — per-source top-k merge == global sample
# ---------------------------------------------------------------------------

_RES_K = 20


@_stage(
    "pipeline_reservoir_merge_audit",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM documents
    ),
    g AS (
      SELECT doc_id, source, h,
             row_number() OVER (ORDER BY h, doc_id) AS pos_global
      FROM h
    ),
    shard AS (
      SELECT doc_id, h,
             row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rs17
      FROM h
    ),
    merged AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY h, doc_id) AS pos_merged
      FROM shard WHERE rs17 <= {_RES_K}
    )
    SELECT g.doc_id, g.source, g.h,
           CAST(g.pos_global AS BIGINT) AS pos_global,
           CAST(m.pos_merged AS BIGINT) AS pos_merged,
           CAST(CASE WHEN g.pos_global = m.pos_merged THEN 1 ELSE 0 END
                AS BIGINT) AS agree
    FROM g JOIN merged m ON g.doc_id = m.doc_id
    WHERE g.pos_global <= {_RES_K} AND m.pos_merged <= {_RES_K}
    """,
)
def pipeline_reservoir_merge_audit(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the MERGEABLE-SAMPLE guarantee, audited: a
    deterministic uniform k-sample (bottom-k by the md5 key — the
    bottom-k sketch) taken PER SOURCE and merged must equal the
    GLOBAL k-sample exactly, positions and all, because the global
    bottom-k of a union is the bottom-k of the per-part bottom-ks.
    This is what makes distributed uniform sampling a map-side
    operation at 100 TB: each executor keeps k rows, the driver merges
    s·k — no global shuffle of the corpus.  The audit derives both
    sides INDEPENDENTLY — the global side through the two-pass
    range-partitioned rank (plans/global_order.py, no single-partition
    window), the merged side through per-source windows + the bounded
    ≤ sources·k re-rank — and joins them: k rows, agree = 1
    everywhere.

    Scale: the global rank is the measured two-pass idiom (0.14×
    per-unit at 10×, SCALE.md); the merged side shuffles once on
    source and once on a ≤ s·k frame.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    from tropology_spark.plans.global_order import global_row_number

    d = docs if docs is not None else load(spark, sf_dir, "documents")
    # h feeds the global rank AND the per-source ranks — DOUBLE-REF.
    h = iter_materialize(
        d.select("doc_id", "source", _md5_low32(F.col("doc_id")).alias("h"))
    )
    g = global_row_number(
        h, [F.col("h").asc(), F.col("doc_id").asc()], out="pos_global"
    ).filter(F.col("pos_global") <= _RES_K)
    ws = Window.partitionBy("source").orderBy("h", "doc_id")
    cand = (
        h.withColumn("rs17", F.row_number().over(ws))
        .filter(F.col("rs17") <= _RES_K)
    )
    wm = Window.partitionBy(F.pmod(F.col("h"), F.lit(1))).orderBy("h", "doc_id")
    merged = (
        cand.withColumn("pos_merged", F.row_number().over(wm))
        .filter(F.col("pos_merged") <= _RES_K)
        .select("doc_id", "pos_merged")
    )
    return g.join(merged, "doc_id").select(
        "doc_id",
        "source",
        "h",
        F.col("pos_global").cast("bigint").alias("pos_global"),
        F.col("pos_merged").cast("bigint").alias("pos_merged"),
        F.when(F.col("pos_global") == F.col("pos_merged"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("agree"),
    )


# ---------------------------------------------------------------------------
# ts_dominant_period — argmax over hour-axis lags of the exact ACF score
# ---------------------------------------------------------------------------

_DP_MIN_LAG = 2
_DP_MAX_LAG = 48
_DP_MIN_OVERLAP = 24  # >= a day of co-present hours per (type, lag)


@_stage(
    "ts_dominant_period",
    oracle=f"""
    WITH hc AS (
      SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    lagd AS (
      SELECT a.event_type, l.lag_k, a.c AS head, b.c AS tail
      FROM hc a
      JOIN (SELECT unnest(generate_series({_DP_MIN_LAG}, {_DP_MAX_LAG}))
              AS lag_k) l ON true
      JOIN hc b ON b.event_type = a.event_type AND b.h = a.h - l.lag_k
    ),
    t AS (
      SELECT event_type, CAST(lag_k AS BIGINT) AS lag_k,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(head * tail) AS BIGINT) AS s_xy,
             CAST(sum(head) AS BIGINT) AS s_h,
             CAST(sum(tail) AS BIGINT) AS s_t,
             CAST(sum(head * head) AS BIGINT) AS s_hh,
             CAST(sum(tail * tail) AS BIGINT) AS s_tt
      FROM lagd GROUP BY 1, 2
    ),
    sc AS (
      SELECT event_type, lag_k, m,
             CAST(m * s_xy - s_h * s_t AS BIGINT) AS num,
             CAST(m * s_hh - s_h * s_h AS BIGINT) AS dh,
             CAST(m * s_tt - s_t * s_t AS BIGINT) AS dt
      FROM t WHERE m >= {_DP_MIN_OVERLAP}
    ),
    v AS (
      SELECT event_type, lag_k, m, num, dh, dt,
             CAST((1000000000 * CAST(num AS HUGEINT) * num)
                  // (CAST(dh AS HUGEINT) * dt) AS BIGINT) AS score_ppb
      FROM sc WHERE num > 0 AND dh > 0 AND dt > 0
    )
    SELECT event_type, CAST(lag_k AS BIGINT) AS best_lag, m, num, dh, dt,
           score_ppb
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY score_ppb DESC, lag_k) AS rk17
          FROM v) z
    WHERE rk17 = 1
    """,
)
def ts_dominant_period(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the DOMINANT PERIOD of each type's hourly
    activity series: over calendar-hour lags 2..48, the lag maximizing
    the exact integer autocorrelation score — the periodicity detector
    (expect ~24 for anything diurnal) that decides resampling rates
    and seasonal-model windows.  M101 carries the ACF terms at row
    lags 1..3; this searches the PERIOD axis, on the hour key, with
    equi-joined lags (the ts_seasonal_naive_error gap rule — row-lags
    silently cross gaps) and only co-present hour pairs.

    Exact argmax without floats: corr²'s denominators cleared —
    score_ppb = 10⁹·num² div (dh·dt) with num = m·Σxy − ΣxΣy > 0
    (positive-correlation lags only; squaring would otherwise lose
    the sign), dh/dt the variance numerators, everything BIGINT with
    the one division in DECIMAL(38,0)/HUGEINT.  Overlap gate m ≥ 24
    (a day of co-present hours) keeps boundary lags from winning on
    tiny overlaps.  Headroom: 10⁹·num² at sf0.1 is ~10²⁹ — two more
    decades fit; past that the carrier drops to ppm.  Tie-break
    (score DESC, lag) is unique.  Scale: events collapse map-side to
    O(types × hours); the ×47 lag axis explodes THAT table, never the
    corpus; one per-type window on a real key.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    hc = iter_materialize(  # head AND tail sides — DOUBLE-REFERENCE
        e.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("h"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    head = hc.select(
        "event_type",
        "h",
        F.col("c").alias("head"),
        F.explode(
            F.array(
                *[F.lit(k) for k in range(_DP_MIN_LAG, _DP_MAX_LAG + 1)]
            )
        ).alias("lag_k"),
    )
    tail = hc.select(
        "event_type", F.col("h").alias("ht"), F.col("c").alias("tail")
    )
    lagd = head.join(
        tail,
        (head.event_type == tail.event_type)
        & (tail.ht == head.h - head.lag_k),
    ).select(head.event_type, "lag_k", "head", "tail")
    t = lagd.groupBy("event_type", "lag_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("head") * F.col("tail")).cast("bigint").alias("s_xy"),
        F.sum("head").cast("bigint").alias("s_h"),
        F.sum("tail").cast("bigint").alias("s_t"),
        F.sum(F.col("head") * F.col("head")).cast("bigint").alias("s_hh"),
        F.sum(F.col("tail") * F.col("tail")).cast("bigint").alias("s_tt"),
    )
    sc = t.filter(F.col("m") >= _DP_MIN_OVERLAP).select(
        "event_type",
        F.col("lag_k").cast("bigint").alias("lag_k"),
        "m",
        (F.col("m") * F.col("s_xy") - F.col("s_h") * F.col("s_t"))
        .cast("bigint")
        .alias("num"),
        (F.col("m") * F.col("s_hh") - F.col("s_h") * F.col("s_h"))
        .cast("bigint")
        .alias("dh"),
        (F.col("m") * F.col("s_tt") - F.col("s_t") * F.col("s_t"))
        .cast("bigint")
        .alias("dt"),
    )
    v = sc.filter(
        (F.col("num") > 0) & (F.col("dh") > 0) & (F.col("dt") > 0)
    ).withColumn(
        "score_ppb",
        F.expr(
            "CAST((1000000000 * CAST(num AS DECIMAL(38,0)) * num)"
            " div (CAST(dh AS DECIMAL(38,0)) * dt) AS BIGINT)"
        ),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("score_ppb").desc(), F.col("lag_k")
    )
    return (
        v.withColumn("rk17", F.row_number().over(w))
        .filter(F.col("rk17") == 1)
        .select(
            "event_type",
            F.col("lag_k").alias("best_lag"),
            "m",
            "num",
            "dh",
            "dt",
            "score_ppb",
        )
    )


# ---------------------------------------------------------------------------
# agg_misra_gries_audit — mergeable heavy-hitter summaries vs exact top-k
# ---------------------------------------------------------------------------

_MG_K = 8
_MG_SHARDS = 4


@_stage(
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
    """Staged M-row — the MISRA-GRIES mergeable heavy-hitter audit,
    completing the mergeable-sketch family (KMV M138, HLL M267, CMS
    M128, AMS M271, Bloom M174 all have audits; the deterministic
    counter-based top-k summary did not): per shard (doc_id mod 4) the
    k=8 counter summary of document BIGRAM counts in the
    order-free offset form — counts of the top-8 minus the (k+1)-th
    largest, the Agarwal-et-al mergeable formulation — then the
    summaries MERGE (sum weights, prune again by the same rule) and
    the merged estimates meet the exact global counts: est ≤ exact
    always (the summary only ever subtracts), and exact − est is
    bounded by the sum of the pruning thresholds — the theory bound
    the twin pins.  At 100 TB this is THE map-side top-k: each
    executor keeps k counters, the driver merges s·k rows, the error
    budget is known in advance.

    Oracle enumerates bigram positions with the standard 4096 cap
    (the chunking precedent).  Scale: the corpus collapses to the
    (shard, bigram) count table ONCE (materialized — it feeds the
    per-shard summaries AND the exact rollup: DOUBLE-REFERENCE RULE);
    per-shard windows ride the real shard key; the merged re-rank is
    a ≤ shards·k row frame on the pmod-constant window.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
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
# join_bloom_prefilter_audit — runtime-filter economics on a real join
# ---------------------------------------------------------------------------

_JBF_BPKS = (8, 16)
_JBF_SIZE = 40  # build side: parts with p_size >= this


@_stage(
    "join_bloom_prefilter_audit",
    oracle=f"""
    WITH build AS (SELECT p_partkey AS k FROM part WHERE p_size >= {_JBF_SIZE}),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_build FROM build),
    cfg AS (SELECT CAST(unnest([{", ".join(str(b) for b in _JBF_BPKS)}]) AS BIGINT)
              AS bpk),
    mh AS (SELECT k,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT AS h1,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 9, 8))::BIGINT AS h2
           FROM build),
    bits AS (
      SELECT DISTINCT cfg.bpk, (mh.h1 + j.j * mh.h2) % (cfg.bpk * nb.n_build)
               AS pos
      FROM mh CROSS JOIN nb CROSS JOIN cfg, unnest([0, 1]) AS j(j)
    ),
    kc AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS cnt
           FROM lineitem GROUP BY 1),
    ph AS (SELECT kc.k, kc.cnt,
                  ('0x' || substring(md5(CAST(kc.k AS VARCHAR)), 1, 8))::BIGINT AS h1,
                  ('0x' || substring(md5(CAST(kc.k AS VARCHAR)), 9, 8))::BIGINT AS h2,
                  CASE WHEN build.k IS NULL THEN 0 ELSE 1 END AS member
           FROM kc LEFT JOIN build ON kc.k = build.k
    ),
    pp AS (
      SELECT cfg.bpk, ph.k, ph.cnt, ph.member,
             (ph.h1 + j.j * ph.h2) % (cfg.bpk * nb.n_build) AS pos
      FROM ph CROSS JOIN nb CROSS JOIN cfg, unnest([0, 1]) AS j(j)
    ),
    hit AS (
      SELECT pp.bpk, pp.k, max(pp.cnt) AS cnt, max(pp.member) AS member,
             CAST(count(*) AS BIGINT) AS n_hit
      FROM pp JOIN bits ON pp.bpk = bits.bpk AND pp.pos = bits.pos
      GROUP BY pp.bpk, pp.k
    ),
    per AS (
      SELECT cfg.bpk,
             CAST(coalesce(sum(CASE WHEN hit.n_hit = 2 THEN hit.cnt END), 0)
                  AS BIGINT) AS n_pass
      FROM cfg LEFT JOIN hit ON cfg.bpk = hit.bpk
      GROUP BY cfg.bpk
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_probe,
             CAST(sum(member * cnt) AS BIGINT) AS n_true
      FROM ph
    )
    SELECT per.bpk AS bits_per_key, nb.n_build, tot.n_probe, tot.n_true,
           per.n_pass,
           CAST(per.n_pass - tot.n_true AS BIGINT) AS n_fp,
           CAST((1000000 * (per.n_pass - tot.n_true))
                // (tot.n_probe - tot.n_true) AS BIGINT) AS fp_ppm,
           CAST((1000000 * (tot.n_probe - per.n_pass)) // tot.n_probe
                AS BIGINT) AS reduction_ppm
    FROM per CROSS JOIN nb CROSS JOIN tot
    """,
)
def join_bloom_prefilter_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Staged M-row — RUNTIME-FILTER economics on a real join: build a
    k=2 double-hashed Bloom filter over the join keys of the BUILD
    side (parts with p_size ≥ 40, ~20% of parts) at 8 and 16 bits per
    key and apply it to the PROBE side (every lineitem row, real
    skewed key multiplicities — the probe collapses to its key
    histogram first, so the filter is evaluated once per DISTINCT key
    and weighted by row count): rows passed, false passes (non-member
    rows the filter lets through), fp_ppm over the true non-member
    mass, and the headline number — reduction_ppm, the fraction of
    probe-side shuffle a pre-shuffle filter deletes.  This is exactly
    what Spark's runtime row-level filtering / DPP buys on a selective
    build side; the audit prices it per bits-per-key so the 100 TB
    deployment can trade filter memory against shuffle bytes.

    Bloom has NO false negatives by construction (members' bits are
    set by themselves), so n_pass ≥ n_true always — twin-pinned along
    with the exact per-key hit set.  Scale: bits ≤ 2/key map-side
    distinct; the probe histogram is one map-side rollup; the 1-row
    build-count modulus cross is the r14 Bloom-curve scalar attach
    (BNLJ_ALLOWED at activation)."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    # build keys feed bits + the member flag + the count — DOUBLE-REF.
    build = iter_materialize(
        p.filter(F.col("p_size") >= _JBF_SIZE).select(F.col("p_partkey").alias("k"))
    )
    nb = build.agg(F.count(F.lit(1)).cast("bigint").alias("n_build"))
    cfg = spark.createDataFrame([(b,) for b in _JBF_BPKS], "bpk long")
    mh = build.select(
        "k",
        F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h1"),
        F.conv(F.substring(F.md5(F.col("k").cast("string")), 9, 8), 16, 10)
        .cast("bigint")
        .alias("h2"),
    )
    j = F.explode(F.array(F.lit(0), F.lit(1))).alias("j")
    bits = (
        mh.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(cfg))
        .select("bpk", "h1", "h2", "n_build", j)
        .select(
            "bpk",
            ((F.col("h1") + F.col("j") * F.col("h2"))
             % (F.col("bpk") * F.col("n_build"))).alias("pos"),
        )
        .dropDuplicates(["bpk", "pos"])
    )
    kc = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # the probe key histogram feeds the totals AND the hit join.
    ph = iter_materialize(
        kc.join(build.withColumn("member", F.lit(1)), "k", "left")
        .select(
            "k",
            "cnt",
            F.coalesce(F.col("member"), F.lit(0)).alias("member"),
            F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            .alias("h1"),
            F.conv(F.substring(F.md5(F.col("k").cast("string")), 9, 8), 16, 10)
            .cast("bigint")
            .alias("h2"),
        )
    )
    pp = (
        ph.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(cfg))
        .select("bpk", "k", "cnt", "member", "h1", "h2", "n_build", j)
        .select(
            "bpk",
            "k",
            "cnt",
            "member",
            ((F.col("h1") + F.col("j") * F.col("h2"))
             % (F.col("bpk") * F.col("n_build"))).alias("pos"),
        )
    )
    hit = (
        pp.join(bits, ["bpk", "pos"])
        .groupBy("bpk", "k")
        .agg(
            F.max("cnt").alias("cnt"),
            F.max("member").alias("member"),
            F.count(F.lit(1)).alias("n_hit"),
        )
    )
    per = (
        cfg.join(
            hit.filter(F.col("n_hit") == 2)
            .groupBy("bpk")
            .agg(F.sum("cnt").cast("bigint").alias("n_pass")),
            "bpk",
            "left",
        )
        .select(
            "bpk", F.coalesce(F.col("n_pass"), F.lit(0)).cast("bigint").alias("n_pass")
        )
    )
    tot = ph.agg(
        F.sum("cnt").cast("bigint").alias("n_probe"),
        F.sum(F.col("member") * F.col("cnt")).cast("bigint").alias("n_true"),
    )
    return (
        per.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bpk").cast("bigint").alias("bits_per_key"),
            "n_build",
            "n_probe",
            "n_true",
            "n_pass",
            (F.col("n_pass") - F.col("n_true")).cast("bigint").alias("n_fp"),
            F.expr("(1000000 * (n_pass - n_true)) div (n_probe - n_true)")
            .cast("bigint")
            .alias("fp_ppm"),
            F.expr("(1000000 * (n_probe - n_pass)) div n_probe")
            .cast("bigint")
            .alias("reduction_ppm"),
        )
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


@_stage("sim_mutual_knn", oracle=_mutual_knn_oracle())
def sim_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — MUTUAL kNN pairs: vector pairs that each rank
    the other inside their cell-blocked top-3 (the registered J9
    frame, both directions) — the matching-robust retrieval primitive
    (mutual-NN pairs are the classic seed for dedup clustering,
    bitext mining and correspondence problems precisely because
    one-directional neighbors are hub-polluted: a celebrity vector is
    in everyone's top-k, but almost nobody is in ITS top-k).  Emits
    (vec_a < vec_b, both ranks, the shared cosine).

    Composed, not copied: QUERIES['sim_knn_join'] IS the base frame
    (checkpointed once — it feeds both join sides: DOUBLE-REFERENCE
    RULE), and the oracle wraps ORACLES['sim_knn_join'] AS MATERIALIZED
    (the DuckDB inlining trap).  The cosine column inherits J9's
    6-dp-rounded carrier (ranks-on-rounded-scores rule).  Scale: the
    mutual join touches only the O(3n) kNN result, never the corpus."""
    from tropology_spark.registry import QUERIES

    knn = iter_materialize(QUERIES["sim_knn_join"](spark, sf_dir))
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
_ROC_BIG = 1_000_000_000  # shift constant for the signed centroid floor


def _rocchio_oracle() -> str:
    from tropology_spark.operators.similarity import QUERY_VEC_ID, _EX_CTE

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


@_stage("sim_rocchio_feedback", oracle=_rocchio_oracle())
def sim_rocchio_feedback(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — one round of ROCCHIO pseudo-relevance feedback
    (query expansion, the alpha=0 beta=1 corner): retrieve the query
    vector's top-5 by the exact integer dot, replace the query with
    their micro-unit integer CENTROID (per-dimension sum floored by
    the +BIG·k shift — component sums are SIGNED), retrieve the top-10
    by the centroid, and flag which of them the ORIGINAL top-10
    already contained — in_orig10 = 0 rows are what feedback bought.
    The retrieval-quality family's missing member: RRF fuses rankings
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
    from tropology_spark.operators.similarity import QUERY_VEC_ID, _pq_exm

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
    orig = top5.unionByName(
        sc.orderBy(F.col("dot0").desc(), F.col("vec_id")).limit(_ROC_K)
    ).select("vec_id").dropDuplicates()
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
# analytics_lehr_sample_size — the experiment-design sample-size terms
# ---------------------------------------------------------------------------

_LEHR_A = "1-URGENT"
_LEHR_B = "5-LOW"
_LEHR_BIG = 10**12  # shift for the signed mean gap: covers any
# |mean gap| below 10^9 milli-cents ($10M) — totalprice cents are
# < 10^8, so |1000*dnum| <= 1000*maxc*na*nb << BIG*na*nb always


@_stage(
    "analytics_lehr_sample_size",
    oracle=f"""
    WITH x AS (
      SELECT CASE WHEN o_orderpriority = '{_LEHR_A}' THEN 1 ELSE 0 END AS ia,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
      WHERE o_orderpriority IN ('{_LEHR_A}', '{_LEHR_B}')
    ),
    s AS (
      SELECT CAST(sum(ia) AS BIGINT) AS na,
             CAST(sum(1 - ia) AS BIGINT) AS nb,
             CAST(sum(ia * c) AS BIGINT) AS s1a,
             CAST(sum((1 - ia) * c) AS BIGINT) AS s1b,
             sum(CAST(ia AS HUGEINT) * c * c) AS s2a,
             sum(CAST(1 - ia AS HUGEINT) * c * c) AS s2b
      FROM x
    ),
    d AS (
      SELECT na, nb, s1a, s1b,
             CAST((na * s2a - CAST(s1a AS HUGEINT) * s1a) // na AS BIGINT)
               AS ssa,
             CAST((nb * s2b - CAST(s1b AS HUGEINT) * s1b) // nb AS BIGINT)
               AS ssb,
             CAST(s1a AS HUGEINT) * nb - CAST(s1b AS HUGEINT) * na AS dnum,
             nb * (na * s2a - CAST(s1a AS HUGEINT) * s1a)
               + na * (nb * s2b - CAST(s1b AS HUGEINT) * s1b) AS ssnum
      FROM s
    )
    SELECT na, nb,
           CAST(s1a // na AS BIGINT) AS mean_a_cents,
           CAST(s1b // nb AS BIGINT) AS mean_b_cents,
           ssa, ssb,
           CAST((1000 * dnum + CAST({_LEHR_BIG} AS HUGEINT) * (na * nb))
                // (na * nb) - {_LEHR_BIG} AS BIGINT) AS gap_milli_cents,
           CAST(CASE WHEN dnum = 0 THEN NULL
                     ELSE (16 * ssnum * na * nb
                           + (na + nb - 2) * dnum * dnum - 1)
                          // ((na + nb - 2) * dnum * dnum) END AS BIGINT)
             AS n_lehr
    FROM d
    """,
)
def analytics_lehr_sample_size(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Staged M-row — the EXPERIMENT-DESIGN terms between the URGENT
    and LOW order-priority cohorts: per-cohort counts, floor means,
    the exact centered sum-of-squares carriers Σ(x−μ)² (the M15/m2c
    discipline), the signed mean gap in milli-cents (+BIG shift), and
    LEHR'S RULE n = 16·s²/d² — the per-arm sample size for 80% power
    at α=0.05 — assembled as ONE ceiled integral division:
    n = ⌈16·SSnum·na·nb / ((na+nb−2)·D²)⌉ with SSnum the pooled-SS
    numerator over the common na·nb denominator and D = s1a·nb −
    s1b·na the cleared mean gap.  The number every A/B platform quotes
    before launching; a near-zero observed gap correctly yields an
    astronomically large n — that IS the answer (you cannot power a
    test for an effect this small).

    Exactness: x⁴-free (only x² enters), intermediates in
    DECIMAL(38,0)/HUGEINT; headroom 16·SSnum·na·nb ≈ 10³² at sf0.1 —
    six decades below the ceiling.  D = 0 yields NULL (no detectable
    direction).  Scale: ONE map-side-combinable conditional aggregate
    over the two cohorts; a 1-row finale with no joins at all."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(_LEHR_A, _LEHR_B)
    )
    x = o.select(
        F.when(F.col("o_orderpriority") == _LEHR_A, 1).otherwise(0).alias("ia"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    s = x.agg(
        F.sum("ia").cast("bigint").alias("na"),
        F.sum(F.lit(1) - F.col("ia")).cast("bigint").alias("nb"),
        F.sum(F.col("ia") * F.col("c")).cast("bigint").alias("s1a"),
        F.sum((F.lit(1) - F.col("ia")) * F.col("c")).cast("bigint").alias("s1b"),
        F.sum(F.expr("CAST(ia AS DECIMAL(38,0)) * c * c")).alias("s2a"),
        F.sum(F.expr("CAST(1 - ia AS DECIMAL(38,0)) * c * c")).alias("s2b"),
    )
    d = s.select(
        "na",
        "nb",
        "s1a",
        "s1b",
        F.expr(
            "CAST((na * s2a - CAST(s1a AS DECIMAL(38,0)) * s1a) div na"
            " AS BIGINT)"
        ).alias("ssa"),
        F.expr(
            "CAST((nb * s2b - CAST(s1b AS DECIMAL(38,0)) * s1b) div nb"
            " AS BIGINT)"
        ).alias("ssb"),
        F.expr(
            "CAST(s1a AS DECIMAL(38,0)) * nb - CAST(s1b AS DECIMAL(38,0)) * na"
        ).alias("dnum"),
        F.expr(
            "nb * (na * s2a - CAST(s1a AS DECIMAL(38,0)) * s1a)"
            " + na * (nb * s2b - CAST(s1b AS DECIMAL(38,0)) * s1b)"
        ).alias("ssnum"),
    )
    return d.select(
        "na",
        "nb",
        F.expr("CAST(s1a div na AS BIGINT)").alias("mean_a_cents"),
        F.expr("CAST(s1b div nb AS BIGINT)").alias("mean_b_cents"),
        "ssa",
        "ssb",
        F.expr(
            f"CAST((1000 * dnum + CAST({_LEHR_BIG} AS DECIMAL(38,0))"
            f" * (na * nb)) div (na * nb) - {_LEHR_BIG} AS BIGINT)"
        ).alias("gap_milli_cents"),
        F.expr(
            "CAST(CASE WHEN dnum = 0 THEN NULL"
            " ELSE (16 * ssnum * na * nb"
            "       + (na + nb - 2) * dnum * dnum - 1)"
            "      div ((na + nb - 2) * dnum * dnum) END AS BIGINT)"
        ).alias("n_lehr"),
    )
