"""Skew mitigation utilities (SURVEY.md §7.7, SCALE.md).

AQE's skew-join splitting handles most cases at runtime; these are the
explicit tools for the pathological keys it can't — the TVTropes
celebrity-node case where one key holds a double-digit percentage of
all rows.

Both use a DETERMINISTIC salt (crc32 of the row content, not rand()):
results are reproducible across runs and retries, which matters for
exactly-once sinks and for the oracle-comparison discipline this repo
runs under.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_salt(df: DataFrame, n_salt: int) -> Column:
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    return F.pmod(F.crc32(F.concat_ws("\x1f", *cols)), F.lit(n_salt))


def salted_join(
    skewed: DataFrame, small: DataFrame, key: str, n_salt: int = 8
) -> DataFrame:
    """Equi-join a skewed fact against a smaller table with the hot
    keys spread over ``n_salt`` sub-partitions.

    The skewed side gets a content-derived salt; the small side is
    replicated once per salt value, so every (key, salt) bucket joins
    locally.  Output equals the plain join (verified by test) with the
    hot key's work spread across ``n_salt`` tasks.
    """
    skewed_s = skewed.withColumn("_salt", _content_salt(skewed, n_salt))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return skewed_s.join(small_s, [key, "_salt"]).drop("_salt")


def salted_count(df: DataFrame, key: str, n_salt: int = 8) -> DataFrame:
    """Two-phase count with an explicit salt: partial counts per
    (key, salt), final sum per key.  Spark's map-side partial
    aggregation usually makes this unnecessary — it exists for
    aggregations where partials can't combine map-side (e.g. after an
    explode whose output never co-locates hot keys)."""
    partial = (
        df.withColumn("_salt", _content_salt(df, n_salt))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(key).agg(F.sum("_c").cast("bigint").alias("n"))
