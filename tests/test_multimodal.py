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


def test_resize_media_shapes_and_determinism(media):
    out = M.resize_media(media, 8, 4)
    rows = {r["id"]: r for r in out.collect()}
    assert dict(out.dtypes) == {
        "id": "bigint", "media_type": "string",
        "width": "int", "height": "int", "media": "binary",
    }
    for r in rows.values():
        assert r["width"] == 8 and r["height"] == 4
        assert len(r["media"]) == 32  # exact target byte budget, padded
    again = {r["id"]: bytes(r["media"]) for r in M.resize_media(media, 8, 4).collect()}
    assert {i: bytes(r["media"]) for i, r in rows.items()} == again


def test_sample_frames_only_videos_expand(media):
    out = M.sample_frames(media, every_n=2, frame_bytes=16).collect()
    assert all(r["frame_idx"] % 2 == 0 for r in out)
    ids = {r["id"] for r in out}
    assert ids == {2}  # only id=2 is a video in the fixture
    n_frames = len(b"a much longer document body " * 10) // 16
    assert len(out) == len(range(0, max(n_frames, 1), 2))
    assert all(len(r["frame"]) <= 16 for r in out)


def test_extract_features_unit_norm_and_similarity_ready(media, spark):
    out = M.extract_features(media, dim=16)
    rows = {r["id"]: r["feature"] for r in out.collect()}
    assert all(len(v) == 16 for v in rows.values())
    import math

    for i in (1, 2):
        assert math.isclose(
            sum(x * x for x in rows[i]), 1.0, rel_tol=1e-5
        )  # unit-normalized
    assert rows[3] == [0.0] * 16  # empty media -> zero vector
    # plugs into the similarity operator unchanged
    from advanced_etl_pipelines_spark.operators.similarity import (
        brute_force_topk,
    )
    nn = brute_force_topk(out, out.where(F.col("id") == 1), "feature", "id", k=1)
    assert nn.first()["neighbor_id"] in (2, 3)
