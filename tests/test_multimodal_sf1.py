"""sf1 value invariants for the four sf-pinned multimodal queries
(round-6 VERDICT "What's missing" item 1: their expected-frame oracles
are exact only at sf0.01, so nothing checked their *values* at sf1).

All media is minted deterministically from doc_id alone
(operators/multimodal.py attach_*), and scripts/make_scale_data.py
replicates documents with pure id offsets — so the scale corpus carries
two checkable facts the rows-only fallback misses:

  A. copy-0 slice equality: sf1 rows (or per-id stage values) for ids
     below the sf0.01 corpus must be value-identical to the sf0.01
     answer — which IS hash-anchored by the checked-in expected frame —
     and, where cheap, to the sf0.1 answer too;
  B. aggregation replay: the final sf1 aggregate must equal a Python
     re-aggregation of the engine's own per-id stage output, pinning
     that the 10x-scale shuffle/grouping (not just the per-row codec)
     is value-correct.

Same discipline as test_dedup.py's minhash sf1 invariants; skipped when
the scale corpus isn't built (scripts/make_scale_data.py).
"""

from __future__ import annotations

import os as _os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.operators.multimodal import (
    attach_jpeg_media,
    attach_png_media,
    attach_wav_media,
    average_hash_media,
    extract_audio_features,
)
from advanced_etl_pipelines_spark.sources.readers import read_table

_SF1 = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    ".localdata/sf1",
)
_SF01 = "/root/testdata/sf0.1"
_SF001 = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not _os.path.isdir(_SF1), reason="scale corpus .localdata/sf1 not built"
)


def _docs(spark, sf_dir):
    return read_table(spark, _os.path.join(sf_dir, "documents.parquet"))


def _stride(spark, sf_dir) -> int:
    return _docs(spark, sf_dir).agg(F.max("doc_id")).collect()[0][0] + 1


@pytest.fixture(scope="module")
def sf1_png_hashes(spark) -> list[tuple[int, int]]:
    """(id, phash) for every sf1 doc at the phash queries' config
    (patterns=4, grid=8) — shared by both phash tests so the 50k-image
    decode pass runs once."""
    hashed = average_hash_media(
        attach_png_media(_docs(spark, _SF1), "doc_id", patterns=4)
    )
    return [(r["id"], r["phash"]) for r in hashed.collect()]


def test_video_frames_sf1_slices(spark):
    from advanced_etl_pipelines_spark.plans.registry_llm import (
        q_multimodal_video_frames as q,
    )

    cols = ["id", "n_sampled_frames", "avg_luma", "luma_spread"]

    def rows(sf_dir):
        return {tuple(r[c] for c in cols) for r in q(spark, sf_dir).collect()}

    big = rows(_SF1)
    small = rows(_SF01)
    tiny = rows(_SF001)  # the oracle-hash-anchored answer
    s01 = _stride(spark, _SF01)
    s001 = _stride(spark, _SF001)

    # A: copy-0 slices, value-for-value (incl. the r4-rounded lumas)
    assert {t for t in big if t[0] < s01} == small
    assert {t for t in big if t[0] < s001} == tiny
    # every copy contributes one row per doc
    assert len(big) == 10 * len(small)


def test_audio_features_sf1_clip_slice_and_bucket_replay(spark):
    from advanced_etl_pipelines_spark.plans.registry_llm import (
        q_multimodal_audio_features as q,
    )

    fields = ("duration_s", "rms", "zcr", "centroid_hz")

    def clip_feats(sf_dir, below=None) -> dict[int, tuple]:
        docs = _docs(spark, sf_dir)
        if below is not None:
            docs = docs.where(F.col("doc_id") < below)
        feats = extract_audio_features(
            attach_wav_media(
                docs, "doc_id", sample_rate=8000, adpcm_odd_ids=True
            )
        )
        return {
            r["id"]: tuple(r[f] for f in fields) for r in feats.collect()
        }

    # A: per-clip feature slice == the sf0.01 per-clip features (both
    # PCM and ADPCM paths; decode + DSP are deterministic per row, so
    # exact float equality is required, not approximate)
    s001 = _stride(spark, _SF001)
    assert clip_feats(_SF1, below=s001) == clip_feats(_SF001)

    # B: the full sf1 bucket aggregate == Python re-aggregation of the
    # engine's own per-clip stage (summation order may differ, so the
    # r4-rounded averages get a 2e-4 band — far below any real
    # aggregation bug, just over a rounding-boundary ulp)
    full = clip_feats(_SF1)
    buckets: dict[float, list[tuple]] = {}
    for vals in full.values():
        buckets.setdefault(round(vals[0], 2), []).append(vals)
    got = {
        round(r["duration_s"], 2): r for r in q(spark, _SF1).collect()
    }
    assert set(got) == set(buckets)
    for d, clips in buckets.items():
        assert got[d]["n_clips"] == len(clips)
        for out_col, idx in (
            ("avg_rms", 1), ("avg_zcr", 2), ("avg_centroid_hz", 3),
        ):
            expect = sum(c[idx] for c in clips) / len(clips)
            assert abs(got[d][out_col] - round(expect, 4)) <= 2e-4, (
                d, out_col, got[d][out_col], expect,
            )


def test_phash_dedup_sf1_replay_and_slice(spark, sf1_png_hashes):
    from advanced_etl_pipelines_spark.plans.registry_llm import (
        q_multimodal_phash_dedup as q,
    )

    # B: full sf1 cluster table == Python re-aggregation of the per-id
    # hash stage (pure integers — exact equality)
    cnt: Counter = Counter()
    keep: dict[int, int] = {}
    for i, h in sf1_png_hashes:
        cnt[h] += 1
        keep[h] = min(keep.get(h, i), i)
    expected = {(h, cnt[h], keep[h]) for h in cnt}
    got = {
        (r["phash"], r["n_images"], r["keep_id"])
        for r in q(spark, _SF1).collect()
    }
    assert got == expected

    # A: copy-0 per-id hashes == the sf0.01 per-id hashes (whose
    # aggregate is the oracle-pinned expected frame)
    tiny = {
        (r["id"], r["phash"])
        for r in average_hash_media(
            attach_png_media(_docs(spark, _SF001), "doc_id", patterns=4)
        ).collect()
    }
    s001 = _stride(spark, _SF001)
    assert {(i, h) for i, h in sf1_png_hashes if i < s001} == tiny


def test_phash_cross_format_sf1_replay(spark, sf1_png_hashes):
    from advanced_etl_pipelines_spark.plans.registry_llm import (
        q_multimodal_phash_cross_format as q,
    )

    jpg = {
        r["id"]: r["phash"]
        for r in average_hash_media(
            attach_jpeg_media(
                _docs(spark, _SF1), "doc_id", patterns=4, subsampling="420"
            )
        ).collect()
    }
    png = dict(sf1_png_hashes)
    assert set(png) == set(jpg)

    layouts: dict[int, dict] = {}
    for i, ph in png.items():
        s = layouts.setdefault(
            i % 4, {"n": 0, "same": 0, "png": set(), "jpg": set()}
        )
        s["n"] += 1
        s["same"] += int(ph == jpg[i])
        s["png"].add(ph)
        s["jpg"].add(jpg[i])
    expected = {
        (lay, s["n"], s["same"], len(s["png"]), len(s["jpg"]))
        for lay, s in layouts.items()
    }
    got = {
        (
            r["layout"], r["n_images"], r["n_hash_identical"],
            r["png_clusters"], r["jpeg_clusters"],
        )
        for r in q(spark, _SF1).collect()
    }
    assert got == expected
