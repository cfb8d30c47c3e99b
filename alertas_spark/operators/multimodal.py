"""Multimodal columns: opaque ``binary`` payloads + typed metadata, processed with
Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *default* decode step is a
deterministic fake (documented stub — byte-length-derived dimensions + md5
checksum); everything the engine is responsible for is real: binary column
construction, schema declaration, Arrow batch transfer, partition-preserving
mapInPandas plumbing.  The codec is an injection seam, not a module edit:
:func:`decode_features` and :func:`sample_frames` take any
``Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]`` batch function plus its
output schema, so production passes ``decode_features(media,
decoder=pil_decode, schema=...)`` and the stub never runs.

Because the fake decode is a pure function of the bytes, the whole pipeline is
oracle-checkable: DuckDB reproduces the same metadata straight from the text column.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType)

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


#: A codec: consumes Arrow-sized pandas batches of (doc_id, media, media_type),
#: yields feature batches matching the declared output schema.
Decoder = "Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]"

#: Output schema for :func:`pil_decode_batch` — real image metadata.
IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mode", StringType()),
])


def pil_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """WORKED EXAMPLE of a real codec behind the seam: PIL image decode.

    Usage: ``decode_features(media, decoder=pil_decode_batch,
    schema=IMAGE_FEATURES_SCHEMA)``.  The import lives *inside* the batch
    function so it resolves on the executors (where decoding runs), and the
    module stays importable in codec-less containers — this one has no PIL, so
    the exercising test (tests/test_multimodal.py::test_pil_decode_real_codec)
    self-skips; the declared queries keep using the deterministic stub.
    Per-image failures surface as NULL dimensions rather than killing the batch:
    at 100 TB a corrupt payload is data, not an infrastructure error."""
    import io

    from PIL import Image  # executor-side import: raises only where decoding runs

    for pdf in batches:
        widths: list = []
        heights: list = []
        modes: list = []
        for buf in pdf["media"]:
            try:
                with Image.open(io.BytesIO(bytes(buf))) as img:
                    widths.append(img.width)
                    heights.append(img.height)
                    modes.append(img.mode)
            except Exception:
                widths.append(None)
                heights.append(None)
                modes.append(None)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": pdf["media"].map(len).astype("int32"),
            "width": pd.array(widths, dtype="Int32"),
            "height": pd.array(heights, dtype="Int32"),
            "mode": modes,
        })


def decode_features(media: DataFrame, decoder=None,
                    schema: StructType = FEATURES_SCHEMA) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.  mapInPandas is
    partition-preserving: no shuffle, batches stream through Python with Arrow.
    ``decoder`` is the codec seam (defaults to the deterministic stub): production
    injects a real PIL/ffmpeg batch function and its schema here."""
    return media.mapInPandas(decoder or _fake_decode_batch, schema=schema)


#: Both multimodal oracles recompute the stub's BYTE-level arithmetic with
#: DuckDB's CHARACTER-level strlen/substring, which agree only because the
#: fixture text is pure ASCII (pinned by tests/test_multimodal.py::
#: test_fixture_text_is_ascii — this DuckDB build has no BLOB
#: substring/md5, so the oracle cannot be expressed byte-based directly).
#: Any multi-byte character would shift frame boundaries and lengths.

@declare(
    "multimodal_decode_features",
    late=True,  # double-pinned: green driver rows in r1+r2; slot rotated to first-time queries
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


# ---------------------------------------------------------------------------
# Frame sampling: 1 payload → N sampled frame rows
# ---------------------------------------------------------------------------

FRAME_BYTES = 256   # fixed-size "frame" within the payload
FRAME_STRIDE = 4    # keep every 4th frame

_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_len", IntegerType()),
    StructField("frame_md5", StringType()),
])


def _sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame extraction (≙ ffmpeg keyframe sampling in production): the payload
    is treated as a sequence of fixed-size byte frames and every STRIDE-th frame is
    emitted as its own row — the 1→N batch-shape change that distinguishes
    frame-sampling plumbing from per-row decode."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": [],
                                "frame_md5": []}
        for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
            data = bytes(buf)
            for i in range(0, (len(data) + FRAME_BYTES - 1) // FRAME_BYTES,
                           FRAME_STRIDE):
                chunk = data[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_len"].append(len(chunk))
                out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(out)


def sample_frames(media: DataFrame, sampler=None,
                  schema: StructType = _FRAME_SCHEMA) -> DataFrame:
    """1→N frame extraction over the binary column; same codec seam as
    :func:`decode_features` (default: the deterministic fixed-size-frame stub)."""
    return media.mapInPandas(sampler or _sample_frames_batch, schema=schema)


@declare(
    "multimodal_frame_sample",
    # character-based oracle == byte-based operator only on ASCII fixtures; see
    # the ASCII note above multimodal_decode_features
    oracle=f"""
    WITH idx AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT)))
                   AS frame_idx
        FROM documents
    ), frames AS (
        SELECT doc_id, frame_idx,
               substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS chunk
        FROM idx WHERE frame_idx % {FRAME_STRIDE} = 0
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(strlen(chunk) AS INTEGER) AS frame_len,
           md5(chunk) AS frame_md5
    FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the binary payload: every {FRAME_STRIDE}-th fixed-size
    frame becomes its own row (1→N mapInPandas, partition-preserving, no shuffle).
    The deterministic fake frames make the whole explode oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(with_media_column(docs))


# ---------------------------------------------------------------------------
# Resize: binary payload → binary payload (fixed target size)
# ---------------------------------------------------------------------------

TARGET_BYTES = 128  # resized payload size

RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media", BinaryType()),           # resized payload
    StructField("media_type", StringType()),
    StructField("orig_bytes", IntegerType()),
])


def _fake_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize (≙ PIL ``Image.resize`` in production): nearest-neighbor byte
    resampling to exactly ``TARGET_BYTES`` — output byte ``i`` is input byte
    ``floor(i·n/TARGET)``; empty payloads stay empty.  Binary in → binary out:
    the batch shape that distinguishes a *transform* stage (composable with
    further media stages) from decode's payload→metadata projection."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "media": [], "media_type": [],
                                "orig_bytes": []}
        for doc_id, buf, mtype in zip(pdf["doc_id"], pdf["media"],
                                      pdf["media_type"]):
            data = bytes(buf)
            n = len(data)
            resized = (bytes(data[(i * n) // TARGET_BYTES]
                             for i in range(TARGET_BYTES)) if n else b"")
            out["doc_id"].append(doc_id)
            out["media"].append(resized)
            out["media_type"].append(mtype)
            out["orig_bytes"].append(n)
        yield pd.DataFrame(out)


def resize_media(media: DataFrame, resizer=None,
                 schema: StructType = RESIZED_SCHEMA) -> DataFrame:
    """Arrow-batched binary→binary resize over the media column; same injectable
    codec seam as :func:`decode_features` (default: the deterministic
    nearest-neighbor stub).  Partition-preserving, no shuffle — at 100 TB this
    is a pure streaming pass over the payload column."""
    return media.mapInPandas(resizer or _fake_resize_batch, schema=schema)


@declare(
    "multimodal_resize",
    # character-based oracle == byte-based operator only on ASCII fixtures; see
    # the ASCII note above multimodal_decode_features
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS INTEGER) AS orig_bytes,
           CAST(CASE WHEN strlen(text) = 0 THEN 0 ELSE {TARGET_BYTES} END
                AS INTEGER) AS resized_bytes,
           md5(CASE WHEN strlen(text) = 0 THEN ''
                    ELSE array_to_string(list_transform(range(0, {TARGET_BYTES}),
                         i -> substring(text,
                              CAST((i * strlen(text)) // {TARGET_BYTES} AS INTEGER) + 1,
                              1)), '') END) AS resized_md5
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing end-to-end: binary column → mapInPandas nearest-neighbor
    resample to {TARGET_BYTES} bytes → JVM-side metadata projection
    (``octet_length`` + ``md5`` on the resized binary, no second Python hop).
    The oracle reconstructs the same resample character-wise."""
    docs = load_table(spark, sf_dir, "documents")
    resized = resize_media(with_media_column(docs))
    return resized.select(
        "doc_id", "orig_bytes",
        F.octet_length("media").cast("int").alias("resized_bytes"),
        F.md5("media").alias("resized_md5"),
    )


# ---------------------------------------------------------------------------
# REAL codec end-to-end (pure-stdlib PNG): runs in THIS container
# ---------------------------------------------------------------------------

_PNG_W = 16  # fixed raster width for the text→image payload

_PNG_MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media", BinaryType()),
    StructField("text", StringType()),   # carried for the roundtrip check
])

_PNG_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mode", StringType()),
    StructField("n_source_bytes", IntegerType()),
    StructField("roundtrip_ok", BooleanType()),
])


def _png_encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Render each doc's bytes into a 16-wide greyscale raster and encode a
    REAL PNG (operators/png_codec.py, Sub-filtered scanlines so the decoder's
    non-trivial filter path executes)."""
    import numpy as np

    from alertas_spark.operators.png_codec import encode_png

    for pdf in batches:
        bufs = []
        for txt in pdf["text"]:
            data = txt.encode("utf-8")
            h = max(1, -(-len(data) // _PNG_W))
            arr = np.zeros(h * _PNG_W, dtype=np.uint8)
            arr[:len(data)] = np.frombuffer(data, dtype=np.uint8)
            bufs.append(encode_png(arr.reshape(h, _PNG_W), filter_type=1))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": bufs,
                            "text": pdf["text"]})


def _png_decode_verify_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode the PNG payload with the pure-stdlib codec and verify the pixel
    roundtrip against the carried source bytes."""
    import numpy as np

    from alertas_spark.operators.png_codec import decode_png

    for pdf in batches:
        rows: dict[str, list] = {k: [] for k in
                                 ("doc_id", "width", "height", "mode",
                                  "n_source_bytes", "roundtrip_ok")}
        for doc_id, buf, txt in zip(pdf["doc_id"], pdf["media"], pdf["text"]):
            data = txt.encode("utf-8")
            try:
                px = decode_png(bytes(buf))
            except ValueError:
                # corrupt payload is data, not an infrastructure error: one
                # bad row must NULL out, not kill the Spark task (same
                # per-image contract as png_decode_batch)
                rows["doc_id"].append(doc_id)
                rows["width"].append(None)
                rows["height"].append(None)
                rows["mode"].append(None)
                rows["n_source_bytes"].append(len(data))
                rows["roundtrip_ok"].append(False)
                continue
            flat = px.reshape(-1)
            ok = (px.shape[1] == _PNG_W and px.shape[2] == 1
                  and np.array_equal(flat[:len(data)],
                                     np.frombuffer(data, dtype=np.uint8))
                  and not flat[len(data):].any())
            rows["doc_id"].append(doc_id)
            rows["width"].append(px.shape[1])
            rows["height"].append(px.shape[0])
            rows["mode"].append("L")
            rows["n_source_bytes"].append(len(data))
            rows["roundtrip_ok"].append(bool(ok))
        yield pd.DataFrame(rows)


@declare(
    "multimodal_png_roundtrip",
    oracle=f"""
    SELECT doc_id,
           CAST({_PNG_W} AS INTEGER) AS width,
           CAST(greatest(1, ceil(strlen(text) / {_PNG_W}.0)) AS INTEGER)
               AS height,
           'L' AS mode,
           CAST(strlen(text) AS INTEGER) AS n_source_bytes,
           true AS roundtrip_ok
    FROM documents
    """,
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end-to-end, executable in this container: each doc's
    bytes are rastered and encoded as an actual PNG (pure zlib+numpy codec,
    operators/png_codec.py) in one mapInPandas stage, then a SECOND stage
    decodes the binary payload — chunk parse, CRC check, inflate, Sub-filter
    reconstruction — and verifies the pixels bit-for-bit against the source.

    The oracle recomputes the expected geometry from the text length and
    demands ``roundtrip_ok`` on every row, so a codec bug (filter math, CRC,
    stride) fails the cross-engine hash, not just a unit test.  This closes
    the "real codec never executes in CI" gap: the PIL seam example remains
    for full-format production decoding, but the engine-side contract is now
    proven with a genuine binary format in-container.  Both stages are
    partition-preserving (no shuffle)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = docs.mapInPandas(_png_encode_batch, schema=_PNG_MEDIA_SCHEMA)
    return media.mapInPandas(_png_decode_verify_batch,
                             schema=_PNG_FEATURES_SCHEMA)
