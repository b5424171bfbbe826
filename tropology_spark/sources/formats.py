"""Text-format sources/sinks (SURVEY.md §2 A-family completeness):
CSV and JSON-lines with explicit-schema discipline.

The reference ingests exactly one wire format (HTML, A5) and persists
via JDBC; a standalone engine also needs the two interchange formats
every pipeline meets.  Both wrappers enforce the §1.2 rule — **no
schema inference in production paths**: readers take an explicit
schema (or a reference DataFrame to borrow one from), so a malformed
file fails loudly instead of silently widening every column to
string.

Scale notes: CSV/JSONL are splittable when uncompressed (Spark
parallelizes by byte range) but carry no column pruning or predicate
pushdown — both wrappers exist to get data INTO parquet, not to serve
queries.  ``PERMISSIVE``-mode corrupt-record capture keeps a 100 TB
ingest from dying on row 37 billion.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType

#: Column capturing rows that failed to parse (PERMISSIVE mode).
CORRUPT_COL = "_corrupt_record"


def _schema_of(schema: Union[StructType, DataFrame]) -> StructType:
    return schema.schema if isinstance(schema, DataFrame) else schema


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema) + [StructField(CORRUPT_COL, StringType(), True)])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Union[StructType, DataFrame],
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with explicit schema; unparseable rows land in
    ``_corrupt_record`` instead of aborting the scan (filter it to
    quarantine them)."""
    return (
        spark.read.schema(_with_corrupt(_schema_of(schema)))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    """CSV out (quoting handled by Spark; embedded separators/newlines
    round-trip)."""
    df.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: Union[StructType, DataFrame],
) -> DataFrame:
    """JSON-lines with explicit schema and corrupt-row capture."""
    return (
        spark.read.schema(_with_corrupt(_schema_of(schema)))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines out (one object per line — the LLM-corpus wire
    format)."""
    df.write.mode("overwrite").json(path)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) split of a PERMISSIVE read: clean rows with the
    capture column dropped, corrupt raw lines for the dead-letter
    sink.  The parsed batch is cached first — Spark (correctly) refuses
    queries that project ONLY the corrupt column from a raw file scan
    (the parser would never mark anything corrupt), and one ingest
    batch feeding two outputs should be parsed once anyway."""
    df = df.cache()
    corrupt = df.filter(df[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)
    clean = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    return clean, corrupt


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (M119).  Columnar like parquet — stripes, per-column
    statistics, predicate pushdown — the interchange format for
    Hive-ecosystem consumers.  Overwrite-mode: deterministic
    re-publish, same policy as the CSV/JSONL writers."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (M119).  Schema comes from the ORC footer (columnar
    formats carry their types — the no-inference rule above is about
    text formats, which do not)."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: Union[StructType, DataFrame],
    row_tag: str = "row",
) -> DataFrame:
    """XML source (Spark 4 native StaxXML reader — no external
    package).  Explicit schema per the §1.2 no-inference rule; rows
    that fail to parse land in ``_corrupt_record`` like the CSV/JSONL
    readers.  XML is the third interchange format a crawler meets
    (sitemaps, RSS/Atom feeds, API exports) — the A5 HTML path covers
    markup-as-content, this covers markup-as-records."""
    return (
        spark.read.format("xml")
        .schema(_with_corrupt(_schema_of(schema)))
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )


def write_xml(
    df: DataFrame, path: str, root_tag: str = "rows", row_tag: str = "row"
) -> None:
    """XML sink (element per row under ``root_tag``)."""
    (
        df.write.mode("overwrite")
        .format("xml")
        .option("rootTag", root_tag)
        .option("rowTag", row_tag)
        .save(path)
    )
