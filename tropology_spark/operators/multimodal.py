"""Multimodal columns (SURVEY.md §2 J11, §7.5) — north-star addition.

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row
objects.  The decode step itself is STUBBED behind a deterministic
fake (this container ships no image/audio codecs — SURVEY.md §7.5);
the Spark-side plumbing — schema, batch iteration, partition-level
behavior, output contract — is real and unit-tested
(tests/test_units.py::test_multimodal_feature_extraction).

At 100 TB: payloads live in Parquet binary columns partitioned by
(modality, date); feature extraction is embarrassingly parallel with
no shuffle — executor count scales it linearly.  Feature vectors then
feed the J8-J10 similarity operators unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), False),
                    StructField("width", LongType(), True),
                    StructField("height", LongType(), True),
                    StructField("sha256", StringType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def decode_payload(payload: bytes, mime: str) -> object:
    """Real decoder hook — intentionally unimplemented (no codec libs
    in this environment; SURVEY.md §7.5).  ``fake_features`` is the
    deterministic stand-in the pipeline tests run against."""
    raise NotImplementedError(
        f"no codec available for {mime}; install a decoder and wire it here"
    )


def fake_features(payload: bytes) -> list[float]:
    """Deterministic fake 'embedding': FEATURE_DIM floats derived from
    the payload digest.  Stands in for the decode→featurize step so
    batch shapes, schemas and partitioning are exercised for real."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame) -> DataFrame:
    """The mapInPandas feature-extraction stage over MEDIA_SCHEMA rows.

    One Arrow batch in → one batch out; constant memory per partition;
    no shuffle.  Swap ``fake_features`` for a real decoder via
    ``decode_payload`` without touching the plumbing."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "features": payloads.map(fake_features),
                }
            )

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def attach_media(df: DataFrame, payload_col: str, mime: str) -> DataFrame:
    """Wrap an existing binary column into the canonical media shape
    (metadata computed JVM-side; sha256 via the built-in function)."""
    return df.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ).alias("meta"),
    )
