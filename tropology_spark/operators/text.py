"""Text-analysis operators (SURVEY.md §2 J4-J7) — north-star additions.

Token statistics over ``documents``: wordcount, TF-IDF, bigrams, and
per-language/source profiles.  The reference analog is tropology's
trope-snippet text extraction (``api.clj`` — reconstructed); the
LLM-pipeline framing adds corpus-level statistics.

All four stay JVM-side: split/explode/groupBy/window — no Python in
the hot path.  At 100 TB the explode output is the dominant
intermediate; partial aggregation (map-side combine) keeps the shuffle
proportional to distinct (doc, token) pairs, not raw tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.registry import register
from tropology_spark.sources.tables import load


@register(
    "text_wordcount",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — corpus word count (tokenize → explode → count)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_tfidf_top",
    oracle="""
    WITH tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf,
             round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS score
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT doc_id, token, tf, score
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, token) AS rn
          FROM scored) t
    WHERE rn = 1
    """,
)
def text_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — top TF-IDF term per document.  The rank runs on the
    6-dp-rounded score (identical in both engines) with the token as
    tie-break, so term selection is fully deterministic."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "token", "tf", "score")
    )


@register(
    "text_bigrams",
    oracle="""
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT l[i] || ' ' || l[i + 1] AS bigram
      FROM (SELECT string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(l) - 1
    )
    GROUP BY bigram
    """,
)
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — bigram counts via adjacent-array zip (no shuffle until the
    final count; the oracle enumerates positions relationally)."""
    d = load(spark, sf_dir, "documents")
    # Materialize the token array once (three references below would
    # otherwise re-split the text three times per row).
    toked = d.select(F.split(F.col("text"), " ").alias("t"))
    bigrams = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return (
        toked.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_lang_stats",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — language/source profile; integer sums → the average is an
    exact division, deterministic across engines."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6).alias("avg_chars"),
    )
