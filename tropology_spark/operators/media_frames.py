"""Media frame sampling (SURVEY.md §2.M M39) — the second multimodal
stage after featurization (multimodal.py): split an opaque binary
payload into fixed-width frames and sample first/middle/last, the
standard video/audio keyframe-sampling shape.

No codec ships in this container (SURVEY.md §7.5), so the payload is
the UTF-8 re-encoding of ``documents.text`` (exactly mm_features'
stand-in) and a "frame" is a 64-byte window — which makes every output
DuckDB-checkable (md5 over byte windows) while the Spark side runs the
REAL production plumbing: binary column in, Arrow-batched
``mapInPandas``, byte slicing in pandas, no shuffle.  Swapping the
slicer for an actual demuxer changes one local function.

At 100 TB: identical posture to feature extraction — embarrassingly
parallel scan→map, cost linear in bytes, no shuffle; sampled-frame
digests then feed dedup (J1) or ANN (M7) unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from tropology_spark.registry import register
from tropology_spark.sources.tables import load

FRAME_BYTES = 64

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("first_md5", StringType(), False),
        StructField("mid_md5", StringType(), False),
        StructField("last_md5", StringType(), False),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Arrow-batched frame sampler over ``(media_id, payload)`` rows:
    frame i covers bytes ``[i*w, (i+1)*w)``; emits the digest of the
    first, middle (``(n_frames-1)//2``) and last frame.  Assumes
    non-empty payloads (filter upstream)."""

    def sampler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def md5_window(b: bytes, frame_idx: int) -> str:
            return hashlib.md5(
                b[frame_idx * frame_bytes : (frame_idx + 1) * frame_bytes]
            ).hexdigest()

        for pdf in batches:
            payloads = pdf["payload"]
            n_frames = payloads.map(
                lambda b: (len(b) + frame_bytes - 1) // frame_bytes
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": n_frames.astype("int64"),
                    "first_md5": payloads.map(lambda b: md5_window(b, 0)),
                    "mid_md5": [
                        md5_window(b, (n - 1) // 2)
                        for b, n in zip(payloads, n_frames)
                    ],
                    "last_md5": [
                        md5_window(b, n - 1) for b, n in zip(payloads, n_frames)
                    ],
                }
            )

    return media.mapInPandas(sampler, schema=FRAME_SCHEMA)


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) AS n,
             (octet_length(encode(text)) + {FRAME_BYTES - 1}) // {FRAME_BYTES}
               AS n_frames
      FROM documents
      WHERE octet_length(encode(text)) > 0
    )
    SELECT media_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           md5(substring(text, 1, {FRAME_BYTES})) AS first_md5,
           md5(substring(text, ((n_frames - 1) // 2) * {FRAME_BYTES} + 1,
                         {FRAME_BYTES})) AS mid_md5,
           md5(substring(text, (n_frames - 1) * {FRAME_BYTES} + 1,
                         {FRAME_BYTES})) AS last_md5
    FROM m
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M39 — keyframe sampling as a declared query.  The oracle slices
    the SAME bytes with substring (the fixture text is pure ASCII, so
    byte windows == character windows) and must reproduce every digest
    — any drop, reorder, re-encode, or off-by-one in the Arrow batch
    path mismatches all three md5 columns."""
    docs = (
        load(spark, sf_dir, "documents")
        .withColumn("payload", F.encode(F.col("text"), "UTF-8"))
        .filter(F.length(F.col("payload")) > 0)
        .select(F.col("doc_id").alias("media_id"), "payload")
    )
    return sample_frames(docs)
