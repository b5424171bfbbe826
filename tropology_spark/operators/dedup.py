"""Deduplication operators (SURVEY.md §2 J1-J3) — north-star additions.

Training-data dedup over the ``documents`` table: exact (hash groupBy),
blocked Jaccard candidate pairs, and MinHash-LSH for the 100 TB path
where all-pairs comparison is infeasible.

Scale notes (§7.7): J1 is one shuffle on a 16-byte key.  J2's
complexity is bounded by its blocking key (here the 40-char prefix
FIXTURES.md §5 identifies as the planted near-dup signature; at scale
the block is any cheap locality key).  J3 replaces O(pairs) with
O(docs·bands): signatures are computed in one narrow pass and
candidates emerge from band-bucket groupBys — the standard
shuffle-bounded LSH shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tropology_spark.registry import register
from tropology_spark.sources.tables import load


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — exact dedup: md5 content hash, keep the smallest doc_id as
    the deterministic representative."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "dedup_jaccard_pairs",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, substring(text, 1, 40) AS pfx,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    siz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM tok a
      JOIN tok b ON a.token = b.token AND a.pfx = b.pfx AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS BIGINT) AS n_common,
           round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN siz sa ON doc_a = sa.doc_id
    JOIN siz sb ON doc_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — near-dup candidate pairs: block on the 40-char prefix, then
    token-set Jaccard >= 0.5 via co-occurrence counts.  The ratio is an
    exact integer division → deterministic across engines."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.substring(F.col("text"), 1, 40).alias("pfx"),
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token"),
    )
    siz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.pfx") == F.col("b.pfx"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = siz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = siz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", "n_common", F.round(jac, 6).alias("jaccard"))
    )


# MinHash parameters: 16 permutations in 4 bands of 4 rows.  The hash
# family is (a*x + b) mod p over crc32(token) — fixed large odd
# multipliers (a well-mixed universal family) so the signature is
# deterministic across runs and partitionings.
_MH_PRIME = 4294967311  # smallest prime > 2^32
# Multipliers are < 2^30 so a*crc32 < 2^62 never overflows int64
# (Spark runs ANSI mode: overflow would raise, not wrap).
_MH_AS = [
    664525013, 931386389, 822752279, 668265263, 374761393, 536870923,
    715827883, 611603851, 483570327, 998244353, 754974721, 469762049,
    920350133, 858993461, 741103597, 637534207,
]
_MH_BS = [1073741789 - 97 * i for i in range(16)]
_MH_PERMS = list(zip(_MH_AS, _MH_BS))
_MH_BAND_ROWS = 4


@register("dedup_minhash_lsh")  # rows-only: sketch, not ANSI-SQL-expressible
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — MinHash-LSH near-dup candidates, the 100 TB-scale
    replacement for J2's pair enumeration.

    One narrow pass computes 16 min-hashes per doc (explode tokens →
    groupBy min per permutation — map-side combinable), bands of 4 are
    hashed to buckets, and candidate pairs are docs sharing any band
    bucket.  Shingles are word 2-grams — unigrams carry no signal
    against the fixtures' 31-word vocabulary.  Declared rows-only
    (SURVEY.md §2 J3): the sketch is not portable SQL; correctness is
    pinned by unit tests (J2's confirmed pairs are recalled —
    tests/test_units.py)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    shingles = F.array_distinct(
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    )
    tok = d.select("doc_id", F.explode(shingles).alias("token")).select(
        "doc_id", F.crc32(F.col("token")).alias("h")
    )
    sigs = tok.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_MH_PRIME)).alias(f"mh{i}")
            for i, (a, b) in enumerate(_MH_PERMS)
        ]
    )
    n_bands = len(_MH_PERMS) // _MH_BAND_ROWS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh{j * _MH_BAND_ROWS + r}")
                                for r in range(_MH_BAND_ROWS)
                            ],
                        ).alias("bucket"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
