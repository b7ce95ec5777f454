"""Multimodal plumbing: schema, Arrow batch decode, strict seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.operators import multimodal as M


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "a much longer document body " * 10), (3, "")],
        "doc_id long, text string",
    )
    return M.attach_fake_media(df, "text", "doc_id")


def test_attach_media_schema(media):
    assert dict(media.dtypes) == {
        "id": "bigint", "media": "binary", "media_type": "string",
    }
    types = {r["id"]: r["media_type"] for r in media.collect()}
    assert types == {1: "audio", 2: "video", 3: "image"}  # id % 3 cycle


def test_decode_media_meta(media):
    out = M.decode_media_meta(media)
    rows = {r["id"]: r for r in out.collect()}
    assert set(out.columns) == {
        "id", "media_type", "n_bytes", "width", "height", "n_frames", "digest",
    }
    assert rows[1]["n_bytes"] == len(b"hello world")
    assert rows[3]["n_bytes"] == 0
    assert rows[1]["media_type"] == "audio" and rows[1]["n_frames"] > 1
    assert rows[3]["media_type"] == "image" and rows[3]["n_frames"] == 1
    assert all(16 <= rows[i]["width"] <= 255 for i in rows)


def test_decode_deterministic(media):
    a = sorted(map(tuple, M.decode_media_meta(media).collect()))
    b = sorted(map(tuple, M.decode_media_meta(media).collect()))
    assert a == b


def test_strict_decode_raises_not_implemented(media):
    with pytest.raises(Exception) as exc_info:
        M.decode_media_meta(media, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_native_meta_matches_decode_bytes(media):
    native = {r["id"]: r["n_bytes"] for r in M.media_meta_native(media).collect()}
    decoded = {r["id"]: r["n_bytes"] for r in M.decode_media_meta(media).collect()}
    assert native == decoded
