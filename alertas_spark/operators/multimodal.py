"""Multimodal columns: opaque ``binary`` payloads + typed metadata, processed with
Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a deterministic fake
(documented stub — byte-length-derived dimensions + md5 checksum); everything the
engine is responsible for is real: binary column construction, schema declaration,
Arrow batch transfer, partition-preserving mapInPandas plumbing.  Swap
:func:`_fake_decode_batch` for a real codec (PIL/ffmpeg) in production.

Because the fake decode is a pure function of the bytes, the whole pipeline is
oracle-checkable: DuckDB reproduces the same metadata straight from the text column.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType, StructField,
                               StructType)

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media", BinaryType()),          # opaque payload
    StructField("media_type", StringType()),     # typed metadata
])

FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("fake_width", IntegerType()),
    StructField("fake_height", IntegerType()),
    StructField("checksum", StringType()),
])


def with_media_column(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload (here: utf-8 bytes of ``text``) + typed
    metadata — the multimodal data model: binary column, never interpreted by the
    relational layer."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.lit("text/plain").alias("media_type"),
    )


def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode (no codecs in this container): deterministic metadata from bytes.
    Real deployment replaces the body with e.g. PIL.Image.open(BytesIO(buf)).size —
    the signature, schema, and batching are what the engine guarantees."""
    for pdf in batches:
        n_bytes = pdf["media"].map(len)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes.astype("int32"),
            "fake_width": (64 + (n_bytes % 64) * 16).astype("int32"),
            "fake_height": (64 + ((n_bytes // 7) % 64) * 16).astype("int32"),
            "checksum": pdf["media"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
        })


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.  mapInPandas is
    partition-preserving: no shuffle, batches stream through Python with Arrow."""
    return media.mapInPandas(_fake_decode_batch, schema=FEATURES_SCHEMA)


@declare(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS INTEGER) AS n_bytes,
           CAST(64 + (strlen(text) % 64) * 16 AS INTEGER) AS fake_width,
           CAST(64 + ((strlen(text) // 7) % 64) * 16 AS INTEGER) AS fake_height,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing: build binary column → mapInPandas fake-decode →
    typed feature rows.  The oracle recomputes the deterministic metadata directly,
    which verifies the whole Arrow round-trip byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_features(with_media_column(docs))
