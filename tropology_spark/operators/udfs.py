"""UDF / UDAF surface (SURVEY.md §2 L-rows).

Tropology's parsing layer is arbitrary per-page Clojure code
(``base.clj`` code normalization — reconstructed); the Spark
equivalents are demonstrated at all three tiers with the same
semantics so the SQL oracle proves UDF correctness by hash parity:

* L1 — row-at-a-time Python UDF (correctness reference, slow path),
* L2 — Arrow-vectorized pandas_udf (the production path: ~10-100×
  less serialization overhead),
* L3 — grouped applyInPandas (per-group normalization, the UDAF-ish
  shape).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from tropology_spark.registry import register
from tropology_spark.sources.tables import load

_CODE_ORACLE = """
    SELECT c_custkey,
           lower(c_mktsegment || '/' || regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g'))
             AS code
    FROM customer
"""


def _code_norm(category: str, name: str) -> str:
    """The tropology page-identity rule: lowercase category/name with
    non-alphanumerics stripped (``base.clj code-from-url`` shape)."""
    return (category + "/" + re.sub(r"[^A-Za-z0-9]", "", name)).lower()


@register("udf_scalar_code_norm", oracle=_CODE_ORACLE)
def udf_scalar_code_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 — row-at-a-time Python UDF; the oracle's pure-SQL twin proves
    the UDF computes the declared function.  ``useArrow=False`` makes
    the declared row-at-a-time eval type EXPLICIT — Spark 4's udf()
    otherwise tries to infer an Arrow eval type from the plain-Python
    type hints and emits the bench-tail "Cannot infer the eval type"
    UserWarning (the VERDICT r9 cosmetic item, now silenced at its
    source; the vectorized twin L2 is the production path)."""
    code_udf = F.udf(_code_norm, StringType(), useArrow=False)
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", code_udf(F.col("c_mktsegment"), F.col("c_name")).alias("code")
    )


@register("udf_pandas_vectorized", oracle=_CODE_ORACLE)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 — same function as L1 as an Arrow-batched pandas_udf (the
    scale path: one Python invocation per batch, not per row)."""

    @F.pandas_udf(StringType())
    def code_vec(category: pd.Series, name: pd.Series) -> pd.Series:
        return (
            category + "/" + name.str.replace(r"[^A-Za-z0-9]", "", regex=True)
        ).str.lower()

    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", code_vec(F.col("c_mktsegment"), F.col("c_name")).alias("code")
    )


@register(
    "udf_grouped_normalize",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 3) AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def udf_grouped_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 — per-group z-score via applyInPandas.  pandas ``std()`` is
    ddof=1, so the oracle uses ``stddev_samp``; z is rounded to 3 dp on
    both sides (population stats drift ~1e-12 between engines)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        pdf = pdf.assign(z=((v - v.mean()) / v.std()).round(3))
        return pdf[["event_id", "event_type", "z"]]

    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return e.groupBy("event_type").applyInPandas(
        normalize, schema="event_id bigint, event_type string, z double"
    )


@register(
    "udf_udtf_tokenize",
    oracle="""
    SELECT doc_id,
           CAST(i AS BIGINT) AS pos,
           l[i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         (SELECT unnest(generate_series(1, 4096)) AS i)
    WHERE i <= len(l)
    """,
)
def udf_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 as a REAL Python UDTF (Spark 3.5+ ``@udtf``): one input row
    fans out to one output row per token with its 1-based position —
    the table-function tier of the UDF ladder (L1 scalar → L2
    vectorized → L3 grouped → L4 table).  The SQL twin (posexplode's
    semantics) proves the UDTF's fan-out is exact.

    Scale: UDTFs run row-at-a-time through Python — the SLOWEST tier;
    the JVM-side equivalent (posexplode, used by H2/J4-J6) is the hot
    path, and this surface exists for logic that genuinely needs
    imperative per-row fan-out.  No shuffle: fan-out happens in the
    scan stage."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: long, token: string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok

    from tropology_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("documents",))
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM documents d, LATERAL tokenize_udtf(d.text) t
        """
    )
