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


# ----------------------------------------------------- codec seam --
#
# The production adapter the fake-codec docstrings promise (round-12
# verdict stretch item): a per-media-type registry of grayscale
# decoders feeding a canonical byte-grid column, so everything
# downstream of decode — the resize/frame transforms here, the
# perceptual hashes in operators/phash.py — runs UNCHANGED on real
# images. A decoder maps payload bytes -> (width, row-major grayscale
# bytes); ``decode_to_gray_grid`` nearest-resamples that to the fixed
# SRC-grid shape the SQL-expression hashes expect (phash's
# "deployment swaps the pixel expression for a decoded-luma column"
# seam, made concrete). PIL isn't in this container, so
# ``pil_gray_codec`` is import-gated: constructing it without PIL
# raises ImportError loudly (tests skip), while the registry/grid
# plumbing is fully exercised in-container through
# ``text_bytes_codec`` (the deterministic fake as just another
# registered codec).

from collections.abc import Callable  # noqa: E402

#: media_type -> payload-bytes -> (width, row-major grayscale bytes)
_CODECS: dict[str, Callable[[bytes], tuple[int, bytes]]] = {}


def register_codec(media_type: str,
                   decode: Callable[[bytes], tuple[int, bytes]]) -> None:
    _CODECS[media_type] = decode


def unregister_codec(media_type: str) -> None:
    _CODECS.pop(media_type, None)


def text_bytes_codec(src_w: int = 16) -> Callable[[bytes],
                                                  tuple[int, bytes]]:
    """The deterministic fake as a registered codec: payload bytes
    laid out row-major at ``src_w`` bytes per row, truncated to whole
    rows (the resize_nearest convention)."""
    def decode(payload: bytes) -> tuple[int, bytes]:
        h = len(payload) // src_w
        return src_w, bytes(payload[: h * src_w])
    return decode


def pil_gray_codec() -> Callable[[bytes], tuple[int, bytes]]:
    """Real image decode via PIL (grayscale 'L' mode). Import-gated:
    raises ImportError at CONSTRUCTION when PIL is absent (this
    container), so a deployment wires it with one line —
    ``register_codec("image/png", pil_gray_codec())`` — and a broken
    environment fails loudly at registration, not per-row."""
    import io

    from PIL import Image  # noqa: PLC0415 — the import IS the gate

    def decode(payload: bytes) -> tuple[int, bytes]:
        img = Image.open(io.BytesIO(payload)).convert("L")
        return img.width, img.tobytes()
    return decode


def decode_to_gray_grid(
    media: DataFrame,
    grid_w: int = 16,
    grid_h: int = 6,
    payload_col: str = "payload",
) -> DataFrame:
    """Decode every payload through its media_type's REGISTERED codec
    and nearest-resample to a ``grid_w x grid_h`` grayscale byte grid
    — the canonical pixel column every downstream hash/transform
    consumes (feed the result's ``payload`` straight into
    ``phash.phash_df``: the grid is exactly one SRC_W-wide image of
    height grid_h). Arrow mapInPandas, constant memory, narrow plan
    (§2.9: the only Python is the codec itself). Rows whose type has
    no registered codec raise loudly (a silent drop would
    under-report near-dups); undecodable payloads (codec returns
    height 0) are dropped like a demuxer rejecting a truncated file.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "media_type": [], "payload": [],
            }
            for mid, mtype, payload in zip(
                    pdf["media_id"], pdf["media_type"],
                    pdf[payload_col]):
                codec = _CODECS.get(mtype)
                if codec is None:
                    raise NotImplementedError(
                        f"no codec registered for {mtype!r} — "
                        "register_codec() it (e.g. pil_gray_codec() "
                        "for images)")
                w, gray = codec(bytes(payload))
                h = len(gray) // w if w else 0
                if h < 1:
                    continue
                grid = bytes(
                    gray[((i * h) // grid_h) * w
                         + ((j * w) // grid_w)]
                    for i in range(grid_h) for j in range(grid_w)
                )
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["payload"].append(grid)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


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


TRANSFORM_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("i", LongType()),
    StructField("j", LongType()),
    StructField("val", StringType()),
])


def resize_nearest(media: DataFrame, src_w: int = 16, out_w: int = 4,
                   out_h: int = 4) -> DataFrame:
    """Nearest-neighbor image resize over binary payloads.

    The "image" is the deterministic fake this environment allows: the
    payload bytes laid out row-major at ``src_w`` bytes per row (height
    = n_bytes // src_w). The *plumbing* is the real thing — Arrow
    batches in, per-payload numpy-style index arithmetic, typed rows
    out, shuffle-free — and because the fake is bytes, the resampled
    pixels are oracle-checkable byte-for-byte (kind='px', val = the
    sampled byte as 2-digit hex). A real deployment swaps the body for
    PIL: the schema, batch iteration, and scale shape don't change.

    Emits nothing for payloads shorter than one row (height 0), like a
    decoder rejecting a truncated file.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in TRANSFORM_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                h = len(data) // src_w
                if h < 1:
                    continue
                for i in range(out_h):
                    src_row = (i * h) // out_h
                    for j in range(out_w):
                        src_col = (j * src_w) // out_w
                        b = data[src_row * src_w + src_col]
                        out["media_id"].append(mid)
                        out["kind"].append("px")
                        out["i"].append(i)
                        out["j"].append(j)
                        out["val"].append(f"{b:02X}")
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=TRANSFORM_SCHEMA)


def frame_sample(media: DataFrame, frame_bytes: int = 32,
                 stride: int = 4) -> DataFrame:
    """Every ``stride``-th fixed-size frame from a binary payload —
    the video analogue of ``resize_nearest``'s fake codec: payload =
    concatenated ``frame_bytes``-byte frames, sampling keeps frames
    0, stride, 2*stride, ... (kind='frame', i = frame index, j = -1,
    val = md5 of the frame's uppercase-hex encoding — hex-then-hash so
    the oracle can recompute it from SQL string functions, byte
    slicing not being portable). Trailing partial frames are dropped,
    as a real demuxer drops a truncated tail packet.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in TRANSFORM_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = len(data) // frame_bytes
                for fi in range(0, n_frames, stride):
                    frame = data[fi * frame_bytes:(fi + 1) * frame_bytes]
                    out["media_id"].append(mid)
                    out["kind"].append("frame")
                    out["i"].append(fi)
                    out["j"].append(-1)
                    out["val"].append(
                        hashlib.md5(frame.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=TRANSFORM_SCHEMA)
