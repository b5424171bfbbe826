"""Scalar-function surface (SURVEY.md §2 H-rows).

The reference analogs are tropology's code-normalization and parsing
helpers (``base.clj code-from-url``, ``parsing.clj get-wiki-links`` —
reconstructed): lowercase ``Category/PageName`` identities derived from
pmwiki URLs, split/explode link extraction, regex URL gating, crawl
backoff date arithmetic, and log-scaled display sizes.  All stay
JVM-side (built-in functions, whole-stage codegen) — no Python UDFs in
this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tropology_spark.registry import register
from tropology_spark.sources.tables import load


@register(
    "fn_string_core",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lc,
           upper(c_mktsegment) AS seg_uc,
           CAST(length(c_name) AS BIGINT) AS name_len,
           lower(concat_ws('/', c_mktsegment, replace(c_name, ' ', ''))) AS code,
           substring(c_name, 1, 8) AS name_prefix
    FROM customer
    """,
)
def fn_string_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 — string core; ``code`` is the tropology page-identity shape:
    lowercased ``category/pagename`` with whitespace stripped."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower(F.col("c_name")).alias("name_lc"),
        F.upper(F.col("c_mktsegment")).alias("seg_uc"),
        F.length(F.col("c_name")).cast("bigint").alias("name_len"),
        F.lower(
            F.concat_ws("/", F.col("c_mktsegment"), F.replace(F.col("c_name"), F.lit(" "), F.lit("")))
        ).alias("code"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
    )


@register(
    "fn_explode_tokens",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    """,
)
def fn_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 — split + explode: the parse flatMap (one page → many
    links)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))


@register(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(url, 'pmwiki[.]php/([A-Za-z0-9#]+)/([A-Za-z0-9]+)$', 1)
             AS category,
           regexp_extract(url, 'pmwiki[.]php/([A-Za-z0-9#]+)/([A-Za-z0-9]+)$', 2)
             AS page,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
    FROM (SELECT p_partkey, p_brand,
                 'http://tvtropes.org/pmwiki/pmwiki.php/' || p_brand || '/'
                   || regexp_replace(p_name, '[^A-Za-z0-9]', '', 'g') AS url
          FROM part)
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 — the pmwiki-URL → code extraction pattern (tropology's
    identity derivation), over synthesized URLs."""
    p = load(spark, sf_dir, "part")
    url = F.concat(
        F.lit("http://tvtropes.org/pmwiki/pmwiki.php/"),
        F.col("p_brand"),
        F.lit("/"),
        F.regexp_replace(F.col("p_name"), "[^A-Za-z0-9]", ""),
    )
    pat = r"pmwiki[.]php/([A-Za-z0-9#]+)/([A-Za-z0-9]+)$"
    return p.select(
        "p_partkey",
        F.regexp_extract(url, pat, 1).alias("category"),
        F.regexp_extract(url, pat, 2).alias("page"),
        F.regexp_extract(F.col("p_brand"), "([0-9]+)", 1).alias("brand_num"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
             AS days_to_2002,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS next_update
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 — date arithmetic; ``next_update`` is the re-crawl backoff
    shape (``next_update = time_stamp + 30 days``)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_2002"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "next_update"
        ),
    )


@register(
    "fn_math",
    oracle="""
    SELECT o_orderkey,
           round(ln(o_totalprice), 6) AS ln_price,
           round(sqrt(o_totalprice), 6) AS sqrt_price,
           CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
           CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
           abs(o_totalprice) AS abs_price
    FROM orders
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5 — math surface (sigma.js node size ∝ log(degree) in the
    reference API layer)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(F.log(F.col("o_totalprice")), 6).alias("ln_price"),
        F.round(F.sqrt(F.col("o_totalprice")), 6).alias("sqrt_price"),
        F.ceil(F.col("o_totalprice")).cast("bigint").alias("ceil_price"),
        F.floor(F.col("o_totalprice")).cast("bigint").alias("floor_price"),
        F.abs(F.col("o_totalprice")).alias("abs_price"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE c_mktsegment
             WHEN 'BUILDING' THEN '#ff0000'
             WHEN 'AUTOMOBILE' THEN '#00ff00'
             WHEN 'MACHINERY' THEN '#0000ff'
             ELSE '#999999'
           END AS color,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'suppressed') AS seg_or_suppressed
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 — CASE / nullif / coalesce (the category→color mapping for
    the network visualization payload)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", "#ff0000")
        .when(F.col("c_mktsegment") == "AUTOMOBILE", "#00ff00")
        .when(F.col("c_mktsegment") == "MACHINERY", "#0000ff")
        .otherwise("#999999")
        .alias("color"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("suppressed")).alias(
            "seg_or_suppressed"
        ),
    )


@register(
    "fn_array_ops",
    oracle="""
    SELECT doc_id,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
           list_contains(string_split(text, ' '), 'data') AS has_data,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
             AS first3_tokens
    FROM documents
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7 — array surface over tokenized text (the transient link-set
    manipulation during parsing)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ",").alias(
            "first3_tokens"
        ),
    )


@register(
    "fn_hash_md5",
    oracle="SELECT doc_id, md5(text) AS text_md5 FROM documents",
)
def fn_hash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9 — portable content hashing (dedup key; both engines emit
    lowercase hex md5)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("text_md5")
    )


@register(
    "fn_fuzzy_levenshtein",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
    FROM part a
    JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fn_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-duplicate detection by edit distance: part-name pairs
    within a brand block at Levenshtein <= 2 (both engines implement
    the standard unit-cost edit distance).  The brand block bounds the
    quadratic pair count — same blocking discipline as the dedup
    family."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_name", F.length("p_name").alias("len")
    )
    _cand, result = passjoin_blocked_pairs(p)
    return result


def passjoin_blocked_pairs(p: DataFrame) -> tuple[DataFrame, DataFrame]:
    """PassJoin segment blocking (k=2, 3 segments) over a
    ``(p_partkey, p_brand, p_name, len)`` frame.  Pigeonhole: two
    edits cannot touch all three segments, so for every true pair one
    of the target's segments appears UNEDITED in the probe string,
    shifted by at most k positions.  Candidates therefore come from
    an equi-join on (brand, target_len, segment_idx, content) —
    ~0.5M pairs instead of the 8M brute-force brand block at sf0.1 —
    and the unchanged naive oracle proves the rewrite misses nothing.

    Returns ``(candidates, verified)``: the blocked candidate pair
    set (what the skew test counts against the brute-force C(n,2))
    and the Levenshtein-verified result the declared query returns.
    At 100 TB a single celebrity brand block is quadratic under naive
    blocking; this bounds it by candidate generation instead."""
    k = 2

    def _as_col(i):
        from pyspark.sql import Column

        return i if isinstance(i, Column) else F.lit(i)

    def seg_len(total, i):
        third = F.floor(total / 3)
        return F.when(_as_col(i) < 2, third).otherwise(total - 2 * third)

    def seg_start(total, i):
        third = F.floor(total / 3)
        return _as_col(i) * third

    # Index side: each string's three segments at its own length.
    segs = p.select(
        F.col("p_partkey").alias("s_key"),
        F.col("p_brand").alias("s_brand"),
        F.col("len").alias("s_len"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.substring(
                            F.col("p_name"),
                            (seg_start(F.col("len"), i) + 1).cast("int"),
                            seg_len(F.col("len"), i).cast("int"),
                        ).alias("content"),
                    )
                    for i in range(3)
                ]
            )
        ).alias("sg"),
    ).select("s_key", "s_brand", "s_len", F.col("sg.i").alias("i"), F.col("sg.content").alias("content"))

    # Probe side: substrings matching any segment of any target length
    # within ±k, at positions shifted by at most ±k.
    probes = (
        p.select(
            F.col("p_partkey").alias("r_key"),
            F.col("p_brand").alias("r_brand"),
            F.col("p_name").alias("r_name"),
            F.col("len").alias("r_len"),
            F.explode(F.sequence(F.col("len") - k, F.col("len") + k)).alias("L"),
        )
        .filter(F.col("L") >= 3)
        .select(
            "r_key", "r_brand", "r_name", "r_len", "L",
            F.explode(F.array(*[F.lit(i) for i in range(3)])).alias("i"),
        )
        .withColumn("m", seg_len(F.col("L"), F.col("i")))
        .withColumn("pstart", seg_start(F.col("L"), F.col("i")))
        .withColumn("q_lo", F.greatest(F.col("pstart") - k, F.lit(0)))
        .withColumn("q_hi", F.least(F.col("pstart") + k, F.col("r_len") - F.col("m")))
        # sequence(lo, hi) DESCENDS when lo > hi (empty window must
        # yield no probes, not reversed garbage) — guard with an empty
        # array.
        .withColumn(
            "q",
            F.explode(
                F.when(
                    F.col("q_lo") <= F.col("q_hi"),
                    F.sequence(F.col("q_lo"), F.col("q_hi")),
                ).otherwise(F.array().cast("array<bigint>"))
            ),
        )
        .select(
            "r_key", "r_brand", "r_name", "L", "i",
            F.expr("substring(r_name, CAST(q + 1 AS INT), CAST(m AS INT))").alias("content"),
        )
        # Adjacent shifts often yield identical substrings (repeated
        # words); dedupe before the join.
        .distinct()
    )

    cand = (
        probes.join(
            segs,
            (F.col("r_brand") == F.col("s_brand"))
            & (F.col("L") == F.col("s_len"))
            & (probes.i == segs.i)
            & (probes.content == segs.content)
            & (F.col("r_key") != F.col("s_key")),
        )
        .select(
            F.least(F.col("r_key"), F.col("s_key")).alias("part_a"),
            F.greatest(F.col("r_key"), F.col("s_key")).alias("part_b"),
        )
        .distinct()
    )
    names = p.select(F.col("p_partkey"), F.col("p_name"))
    verified = (
        cand.join(names.select(F.col("p_partkey").alias("part_a"), F.col("p_name").alias("name_a")), "part_a")
        .join(names.select(F.col("p_partkey").alias("part_b"), F.col("p_name").alias("name_b")), "part_b")
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    passjoin = verified.filter(dist <= k).select(
        "part_a", "part_b", dist.cast("bigint").alias("distance")
    )
    # Segment blocking needs >= 3 usable characters (the probe filter
    # L >= 3 above): a pair where BOTH strings are shorter than 3 never
    # generates a candidate in either direction.  Brute-force that tiny
    # block directly — it is empty on p_name but keeps the operator
    # total for arbitrary string columns.  (Pairs with exactly one short
    # string still come from the main path via the long side's probes.)
    tiny = p.filter(F.col("len") < 3).select("p_partkey", "p_brand", "p_name")
    ta, tb = tiny.alias("ta"), tiny.alias("tb")
    tiny_dist = F.levenshtein(F.col("ta.p_name"), F.col("tb.p_name"))
    tiny_pairs = (
        ta.join(
            tb,
            (F.col("ta.p_brand") == F.col("tb.p_brand"))
            & (F.col("ta.p_partkey") < F.col("tb.p_partkey")),
        )
        .filter(tiny_dist <= k)
        .select(
            F.col("ta.p_partkey").alias("part_a"),
            F.col("tb.p_partkey").alias("part_b"),
            tiny_dist.cast("bigint").alias("distance"),
        )
    )
    return cand, passjoin.unionAll(tiny_pairs)


@register(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           CAST((event_id & 255) & (user_id & 255) AS BIGINT) AS b_and,
           CAST((event_id & 255) | (user_id & 255) AS BIGINT) AS b_or,
           CAST(xor(event_id & 255, user_id & 255) AS BIGINT) AS b_xor,
           CAST((event_id & 255) << 3 AS BIGINT) AS b_shl,
           CAST(event_id >> 4 AS BIGINT) AS b_shr
    FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H10 — bitwise surface (AND/OR/XOR/shifts): the primitive layer
    under the engine's own hash-family and Z-order operators
    (pipeline_zorder_layout builds Morton keys from exactly these).
    Operands are masked to one byte BEFORE shifting so no value ever
    nears int64 overflow — shift overflow is silent wraparound in
    Spark and an error in DuckDB, the one place the engines disagree.

    Dialect note: XOR is `^` in Spark SQL but the `xor()` function in
    DuckDB (whose `^` is exponentiation)."""
    ev = load(spark, sf_dir, "events")
    ebyte = F.col("event_id").bitwiseAND(F.lit(255))
    ubyte = F.col("user_id").bitwiseAND(F.lit(255))
    return ev.select(
        "event_id",
        ebyte.bitwiseAND(ubyte).cast("bigint").alias("b_and"),
        ebyte.bitwiseOR(ubyte).cast("bigint").alias("b_or"),
        ebyte.bitwiseXOR(ubyte).cast("bigint").alias("b_xor"),
        F.shiftleft(ebyte, 3).cast("bigint").alias("b_shl"),
        F.shiftright(F.col("event_id"), 4).cast("bigint").alias("b_shr"),
    )


@register(
    "fn_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           CAST(list_aggregate(
                  list_transform(embedding,
                                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                           AS BIGINT)),
                  'sum') AS BIGINT) AS sum_micro,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(list_aggregate(
                  list_transform(embedding,
                                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                           AS BIGINT)),
                  'max') AS BIGINT) AS max_micro
    FROM embeddings
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H11 — higher-order array functions (transform / filter /
    aggregate lambdas): the embedding vector quantized to exact
    micro-units element-wise, then folded JVM-side — the lambda
    surface that keeps array math out of Python.  Element quantization
    (floor(x·10⁶ + ½) on the float32→double widening both engines
    share) happens BEFORE any fold, so the sums are exact integers in
    any order.

    Scale: embarrassingly parallel projection — no shuffle, no UDF;
    at 100 TB this is the cheap pre-pass that feeds the similarity
    family (J8-J10) integer-exact features."""
    e = load(spark, sf_dir, "embeddings")
    micro = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast("long"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("n_dims"),
        F.aggregate(
            micro, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).cast("bigint").alias("sum_micro"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.array_max(micro).cast("bigint").alias("max_micro"),
    )


_TRY_MULT = 1 << 40  # pushes cents >= 2^23 over the int64 boundary


@register(
    "fn_try_arithmetic",
    oracle=f"""
    WITH c AS (
      SELECT event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             event_id % 5 AS k
      FROM events
    )
    SELECT event_id,
           CASE WHEN k = 0 THEN NULL
                ELSE round(CAST(cents AS DOUBLE) / k, 6) END AS safe_div,
           CASE WHEN cents >= {1 << 23} THEN NULL
                ELSE cents * {_TRY_MULT} END AS safe_mul
    FROM c
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H12 — ANSI-safe arithmetic (`try_divide`, `try_multiply`):
    Spark 4 runs ANSI mode, where /0 and int64 overflow RAISE; the
    try_* family converts those to NULL — the per-row safety valve a
    pipeline uses when a poisoned row must not kill a 100 TB job
    (the arithmetic sibling of M34's corrupt-row quarantine).

    The oracle proves the NULL semantics analytically: divisor 0 ⟷
    NULL, and the multiply overflows int64 exactly when cents >= 2^23
    (x · 2^40 >= 2^63) — DuckDB would error on the overflow, so its
    CASE must short-circuit first.  Scale: projection-only, no
    shuffle."""
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        (F.col("event_id") % 5).alias("k"),
    )
    return c.select(
        "event_id",
        F.round(F.try_divide(F.col("cents").cast("double"), F.col("k")), 6).alias(
            "safe_div"
        ),
        F.try_multiply(F.col("cents"), F.lit(_TRY_MULT).cast("bigint")).alias("safe_mul"),
    )


# ---------------------------------------------------------------------------
# M156 — calendar-interval surface (months, quarters, ISO weekdays)
# ---------------------------------------------------------------------------


@register(
    "fn_date_intervals",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3_months,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday,
           CAST(CASE WHEN isodow(o_orderdate) >= 6 THEN 1 ELSE 0 END AS BIGINT)
             AS is_weekend
    FROM orders
    """,
)
def fn_date_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M156 — CALENDAR interval surface, complementing H4's day-based
    arithmetic: month addition (calendar-aware: Jan 31 + 3 months
    clamps to Apr 30 in both engines), last-day-of-month, quarter, and
    ISO weekday (Mon=1..Sun=7 — Spark's dayofweek is Sun=1, so the
    declared column pins the ISO convention via weekday()+1).  The
    month/quarter keys are what partitioned-retention and fiscal
    rollups bucket by; clamping differences between engines is exactly
    the class of bug this row pins.  Scale: pure per-row projection —
    whole-stage codegen, no shuffle."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3_months"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).cast("bigint").alias("order_quarter"),
        (F.weekday(d) + 1).cast("bigint").alias("iso_weekday"),
        F.when(F.weekday(d) + 1 >= 6, 1).otherwise(0).cast("bigint").alias("is_weekend"),
    )


# ---------------------------------------------------------------------------
# M159 — SHA-2 hash surface (the content-addressing complement of H9)
# ---------------------------------------------------------------------------


@register(
    "fn_hash_sha2",
    oracle="""
    SELECT doc_id,
           sha256(text) AS sha256_hex,
           CAST(('0x' || substring(sha256(text), 1, 8))::BIGINT % 1024 AS BIGINT)
             AS shard_1024
    FROM documents
    """,
)
def fn_hash_sha2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M159 — SHA-256 content addressing: the collision-resistant
    complement of H9's md5 (dedup keys and provenance records use
    sha256 where adversarial collisions matter — md5's are practical,
    sha256's are not), plus the standard hex-prefix shard key
    (mod 1024) used to lay out content-addressed stores.  Both engines
    emit lowercase hex; the shard derivation is the J3 integer-parse
    discipline on the first 8 hex chars.  Scale: pure per-row
    projection, whole-stage codegen."""
    d = load(spark, sf_dir, "documents")
    sha = F.sha2(F.col("text"), 256)
    return d.select(
        "doc_id",
        sha.alias("sha256_hex"),
        (F.conv(F.substring(sha, 1, 8), 16, 10).cast("bigint") % 1024)
        .cast("bigint")
        .alias("shard_1024"),
    )


# ---------------------------------------------------------------------------
# M176 — URL parsing surface (crawler-core: host / path / query / fragment)
# ---------------------------------------------------------------------------

#: Deterministic URL synthesized per part — the fixture has no URL
#: column, so both engines build the SAME string from part attributes,
#: then parse it back.  Shape mirrors the reference's crawl targets
#: (pmwiki paths + query + fragment).
_URL_SQL = (
    "'https://www.' || lower(replace(p_brand, '#', '')) || '.example.org/wiki/'"
    " || replace(lower(p_type), ' ', '-') || '/' || CAST(p_partkey AS STRING)"
    " || '?size=' || CAST(p_size AS STRING) || '&ref=index#sec' "
    " || CAST(p_partkey % 10 AS STRING)"
)


@register(
    "fn_url_parse",
    oracle=f"""
    WITH u AS (SELECT p_partkey, {_URL_SQL} AS url FROM part)
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, url,
           regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '#(.*)$', 1) AS fragment,
           regexp_extract(url, '[?&]size=([^&#]*)', 1) AS size_param
    FROM u
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M176 — the URL-decomposition surface a crawler engine needs
    (the reference's whole data model is crawled pmwiki URLs): host,
    path, query, fragment, and a single query parameter, extracted
    with Spark's built-in ``parse_url`` — a JVM expression, not a
    UDF.  The oracle decomposes the same strings with anchored
    regexes, proving the two parsers agree on this URL shape.

    The URL itself is synthesized deterministically from part
    attributes (brand → host, type → path segments, partkey → page,
    size → query param) with identical SQL in both engines — the
    fixture ships no URL column; what is under test is the parser.

    Scale: pure row-local string work — whole-stage codegen, no
    shuffle at all (the plan is scan → project)."""
    p = load(spark, sf_dir, "part")
    u = p.select(
        F.col("p_partkey").cast("bigint").alias("p_partkey"),
        F.expr(_URL_SQL).alias("url"),
    )
    return u.select(
        "p_partkey", "url",
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY')").alias("query"),
        F.expr("parse_url(url, 'REF')").alias("fragment"),
        F.expr("parse_url(url, 'QUERY', 'size')").alias("size_param"),
    )


# ---------------------------------------------------------------------------
# M226 fn_tz_day_profile — timezone-aware local-hour profile (DST-correct)
# ---------------------------------------------------------------------------

_TZ = "America/New_York"


@register(
    "fn_tz_day_profile",
    oracle=f"""
    SELECT event_type,
           strftime(timezone('{_TZ}', timezone('UTC', ts)), '%H') AS local_hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def fn_tz_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M226 — the tz-correct hour-of-day activity profile
    (event counts + distinct users per type and LOCAL hour), the form
    every "when are users active" dashboard actually needs: civil
    time, DST-correct, not UTC buckets.  Cross-engine rule (verified
    live in round 8 across both 2024 DST edges and under a non-UTC
    DuckDB session TZ): Spark ``convert_timezone('UTC', tz, ts)`` ==
    DuckDB ``timezone(tz, timezone('UTC', ts))`` — the double-
    timezone() oracle form pins the naive→UTC interpretation and
    returns a naive local, independent of the session TimeZone (the
    single TIMESTAMPTZ cast reads the session TZ; never use it).

    Scale: pure scan-side projection to a 24-value key, one map-side-
    combinable rollup with a distinct partial — no window, no join."""
    e = load(spark, sf_dir, "events")
    local_hour = F.date_format(
        F.expr(f"convert_timezone('UTC', '{_TZ}', ts)"), "HH"
    )
    return e.groupBy("event_type", local_hour.alias("local_hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
