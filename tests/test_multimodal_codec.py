"""Codec-seam adapter (multimodal.py round 13 — the round-12 verdict
stretch item): a per-media-type registry of grayscale decoders
feeding the canonical byte grid, so phash/resize run UNCHANGED on
real images. PIL is absent in this container, so the real-image
codec is import-gated (loud at construction) while the registry +
grid plumbing is fully exercised via the deterministic fake codec."""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators import phash as P
from formula1_data_pipeline_spark.operators.multimodal import (
    decode_to_gray_grid,
    pil_gray_codec,
    register_codec,
    text_bytes_codec,
    to_media_table,
    unregister_codec,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").limit(200)
    return to_media_table(docs)


def test_grid_adapter_is_value_preserving_for_the_fake(spark, media):
    """phash over the codec-adapter grid must EQUAL phash over the
    raw fake payload: the grid resample uses the same nearest
    arithmetic as the SQL pixel sampler, so the seam changes where
    decode happens, never a hash bit — exactly what lets a real
    codec swap in without touching gated logic."""
    register_codec("text/plain", text_bytes_codec(P.SRC_W))
    try:
        grid = decode_to_gray_grid(media, grid_w=P.SRC_W,
                                   grid_h=P.GRID_ROWS)
        for kind in ("ahash", "dhash"):
            via_adapter = {
                r["media_id"]: r["phash"]
                for r in P.phash_df(grid, kind).collect()
            }
            via_raw = {
                r["media_id"]: r["phash"]
                for r in P.phash_df(media, kind).collect()
            }
            assert via_adapter == via_raw
            assert len(via_adapter) > 100
    finally:
        unregister_codec("text/plain")


def test_unregistered_media_type_raises_loudly(spark, media):
    unregister_codec("text/plain")
    with pytest.raises(Exception, match="no codec registered"):
        decode_to_gray_grid(media).collect()


def test_truncated_payload_dropped_like_a_demuxer(spark):
    register_codec("text/plain", text_bytes_codec(P.SRC_W))
    try:
        tiny = to_media_table(
            spark.createDataFrame([(1, "short")], "doc_id long, text string"))
        assert decode_to_gray_grid(tiny).count() == 0
    finally:
        unregister_codec("text/plain")


def test_pil_codec_import_gate():
    """Without PIL the factory must raise ImportError at CONSTRUCTION
    (one loud line at registration, never a per-row surprise); with
    PIL present it must decode a real PNG through the same grid path."""
    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(ImportError):
            pil_gray_codec()
    else:  # pragma: no cover — container has no PIL; runs in deploys
        decode = pil_gray_codec()
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("L", (32, 12), color=128).save(buf, format="PNG")
        w, gray = decode(buf.getvalue())
        assert (w, len(gray)) == (32, 32 * 12)
