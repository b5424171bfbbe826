"""The crawl/ingest pipeline — tropology's ETL write path, Spark-first.

Reconstructs the reference's two control loops (SURVEY.md §3.1, §3.3)
as pure DataFrame stages over a parquet-backed page store:

    frontier selection  →  fetch+parse  →  page upsert
         ↑                                   │
         └── degree maintenance ← link explode┘

* **Page store** (the ``pages`` table analog): one row per code with
  crawl bookkeeping — ``time_stamp``, ``next_update`` (backoff),
  ``has_error``, cached ``incoming``/``outgoing`` degrees.
* **Link store** (the ``links`` table analog): distinct
  ``(from_code, to_code)`` pairs.
* **Frontier** = due pages (``next_update <= now``, not errored,
  ORDER BY + LIMIT — the reference's ``query-nodes-to-crawl`` top-k)
  plus discovered-but-never-crawled link targets (left anti join).

Fetching is injected (no network here; tests supply HTML) — the same
seam the reference's own tests use (saved local fixture pages,
SURVEY.md §5.1).  Every stage is a DataFrame transformation; the only
actions are the sink writes.  At scale the page/link stores are
bucketed by code (SCALE.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.sources.html import parse_pages
from tropology_spark.sources.sinks import upsert_parquet

PAGES_SCHEMA = (
    "code string, category string, title string, url string, "
    "is_redirect boolean, has_error boolean, "
    "time_stamp timestamp, next_update timestamp, "
    "incoming bigint, outgoing bigint"
)
LINKS_SCHEMA = "from_code string, to_code string"

RECRAWL_BACKOFF_DAYS = 30


def read_pages(spark: SparkSession, store_dir: str) -> DataFrame:
    path = os.path.join(store_dir, "pages")
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], PAGES_SCHEMA)


def read_links(spark: SparkSession, store_dir: str) -> DataFrame:
    path = os.path.join(store_dir, "links")
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], LINKS_SCHEMA)


def frontier(
    spark: SparkSession, store_dir: str, now: str, limit: int = 100
) -> DataFrame:
    """Next crawl batch: due known pages (top-k by ``next_update``) plus
    link targets never seen as pages (the discovery anti-join,
    SURVEY.md §2 C6/F2).  Returns one ``code`` column."""
    pages = read_pages(spark, store_dir)
    links = read_links(spark, store_dir)
    due = (
        pages.filter(
            (F.col("next_update") <= F.lit(now).cast("timestamp"))
            & ~F.col("has_error")
            & ~F.col("is_redirect")
        )
        .orderBy(F.col("next_update").asc(), F.col("code").asc())
        .limit(limit)
        .select("code")
    )
    undiscovered = (
        links.select(F.col("to_code").alias("code"))
        .distinct()
        .join(pages.select("code"), "code", "left_anti")
        .orderBy("code")
        .limit(limit)
    )
    return due.unionByName(undiscovered).distinct()


def crawl_batch(
    spark: SparkSession,
    store_dir: str,
    fetched: DataFrame,
    now: str,
) -> None:
    """Ingest one crawl micro-batch.

    ``fetched``: (url, html) rows — produced by any fetcher (the
    injected seam).  Persists pages (idempotent keyed upsert), replaces
    the crawled pages' outbound links, and rebuilds cached degrees —
    the reference's single-transaction persist step (§3.1), expressed
    as three idempotent writes.
    """
    parsed = parse_pages(fetched).localCheckpoint(eager=True)

    now_ts = F.lit(now).cast("timestamp")
    new_pages = parsed.filter(F.col("code").isNotNull()).select(
        "code",
        "category",
        "title",
        "url",
        (F.col("is_redirect") == "true").alias("is_redirect"),
        F.lit(False).alias("has_error"),
        now_ts.alias("time_stamp"),
        # Interval arithmetic, not date_add: the backoff must preserve
        # time-of-day or every batch crawled the same day comes due at
        # the same midnight instant.
        (now_ts + F.expr(f"INTERVAL {RECRAWL_BACKOFF_DAYS} DAYS")).alias("next_update"),
        F.lit(0).cast("bigint").alias("incoming"),
        F.lit(0).cast("bigint").alias("outgoing"),
    )
    # Deduplicate within the batch (two URLs may redirect to one code).
    w = Window.partitionBy("code").orderBy("url")
    new_pages = new_pages.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")

    new_links = (
        parsed.filter(F.col("code").isNotNull())
        .select(F.col("code").alias("from_code"), F.explode("links").alias("to_code"))
        .distinct()
    )

    # links: replace outbound sets of the crawled pages (delete+insert
    # semantics of the reference), keep everyone else's.
    links_path = os.path.join(store_dir, "links")
    crawled = new_pages.select(F.col("code").alias("from_code")).distinct()
    old_links = read_links(spark, store_dir)
    kept = old_links.join(crawled, "from_code", "left_anti")
    merged_links = kept.unionByName(new_links).distinct().localCheckpoint(eager=True)

    # pages: newest crawl wins per code.
    upsert_parquet(
        spark,
        new_pages,
        os.path.join(store_dir, "pages"),
        key="code",
        version_col="time_stamp",
    )

    merged_links.write.mode("overwrite").parquet(links_path + "_next")
    import shutil

    if os.path.exists(links_path):
        shutil.rmtree(links_path)
    shutil.move(links_path + "_next", links_path)

    refresh_degrees(spark, store_dir)


def refresh_degrees(spark: SparkSession, store_dir: str) -> None:
    """Recompute the cached per-page degree columns from the link store
    (the reference's ``update-link-count!`` materialized aggregate,
    SURVEY.md §2 D1/I2)."""
    pages = read_pages(spark, store_dir)
    links = read_links(spark, store_dir)
    out_deg = links.groupBy(F.col("from_code").alias("code")).agg(
        F.count(F.lit(1)).alias("new_out")
    )
    in_deg = links.groupBy(F.col("to_code").alias("code")).agg(
        F.count(F.lit(1)).alias("new_in")
    )
    refreshed = (
        pages.drop("incoming", "outgoing")
        .join(out_deg, "code", "left")
        .join(in_deg, "code", "left")
        .withColumn("outgoing", F.coalesce(F.col("new_out"), F.lit(0)).cast("bigint"))
        .withColumn("incoming", F.coalesce(F.col("new_in"), F.lit(0)).cast("bigint"))
        .drop("new_out", "new_in")
        .localCheckpoint(eager=True)
    )
    path = os.path.join(store_dir, "pages")
    refreshed.write.mode("overwrite").parquet(path + "_next")
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)
    shutil.move(path + "_next", path)
