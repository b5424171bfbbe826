"""JDBC source/sink (SURVEY.md §2 A4) — design note + thin wrappers.

Tropology's entire storage layer is PostgreSQL via clojure.java.jdbc
(``db.clj`` — reconstructed); the Spark equivalent is the built-in
JDBC data source.  No database exists in this environment, so these
wrappers only assemble the reader/writer configuration — the part with
engineering content at scale:

* **Partitioned reads**: a single-connection JDBC read is a 1-task
  scan; ``partitioned_jdbc_reader`` splits on a numeric key into
  ``num_partitions`` range predicates so the scan parallelizes (the
  idiom for ingesting the reference's ``pages``/``links`` tables).
* **Pushdown**: Catalyst pushes filters/projections into the generated
  SQL automatically (predicate pushdown happens server-side).
* **Writes**: batched inserts sized by ``batchsize``; idempotent
  upserts are NOT expressible through plain JDBC writes — route them
  through :func:`tropology_spark.sources.sinks.upsert_parquet`
  semantics or server-side staging tables.

Option construction is unit-testable without a server; the reader
returns a ``DataFrameReader`` ready for ``.load()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def partitioned_jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 16,
    fetch_size: int = 10_000,
    **props: str,
) -> DataFrameReader:
    """Reader configured for a parallel range-partitioned JDBC scan."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
    )
    for k, v in props.items():
        reader = reader.option(k, v)
    return reader


def jdbc_append_writer(df: DataFrame, url: str, table: str, batch_size: int = 10_000):
    """Writer configured for batched appends (the crawl-persist path
    when PostgreSQL is the sink)."""
    return (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode("append")
    )
