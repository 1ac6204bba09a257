"""Multimodal (binary) column plumbing (SURVEY.md §2.12 mandate).

Treats media as opaque ``binary`` columns plus typed metadata, with
decode / feature-extraction running as Arrow-batched ``mapInPandas``
over the binary payloads — the Spark-side shape a real image/audio
pipeline needs (schema, partitioning, batch iteration, UDF signature),
with the codec itself stubbed since media libraries aren't in this
environment.

The reference's only nod to this is unused ML deps in its Docker image
(``Dockerfile:25-30`` installs sentence-transformers + pinecone);
everything here is the forward-designed surface.

Scale shape: mapInPandas streams Arrow batches — constant memory per
task regardless of corpus size; binary payloads never hit the driver;
the projection is narrow (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("content_md5", StringType()),
])


def to_media_table(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Pack rows into the opaque-binary media shape (payload = utf-8
    bytes here; in production, image/audio bytes land the same way)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_media(payload: bytes, media_type: str) -> bytes:
    """Codec stub. Real deployments dispatch on media_type to PIL /
    torchaudio / pyav; those libs aren't in this container."""
    if media_type == "text/plain":
        return payload
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata/feature extraction over binary payloads.

    The per-batch body is where decode+resize+embed would run; here it
    computes byte length + md5 (deterministic, oracle-checkable) after
    round-tripping through ``decode_media``.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_media(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(b) for b in decoded],
                "content_md5": [hashlib.md5(b).hexdigest() for b in decoded],
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
