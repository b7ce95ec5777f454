"""Multimodal column plumbing (SURVEY.md §2.6 [extension]).

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct.  The Spark-side architecture is real and
tested — schema, Arrow-batched ``mapInPandas`` decode, partition-size
control — while the codec itself is stubbed (this container has no
PIL/ffmpeg): ``decode_media_meta`` produces deterministic fake features
derived from the bytes, and ``decode_media_meta(strict=True)`` raises
``NotImplementedError`` where a real decoder would plug in.

Scale notes: media bytes dominate row size, so operators here
(1) never shuffle the binary column for metadata-only outputs — project
it away first; (2) decode via ``mapInPandas`` so bytes move driver-free,
one Arrow batch at a time (bound batch bytes with
``spark.sql.execution.arrow.maxRecordsPerBatch`` for large media).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_frames int, digest bigint"
)


def attach_fake_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic stand-in for a real media column: the UTF-8 bytes of
    the text, typed by id.  Real pipelines read binary from parquet/blob
    storage; everything downstream is identical."""
    mtype = F.element_at(
        F.lit(["image", "audio", "video"]), (F.col(id_col) % 3 + 1).cast("int")
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        mtype.alias("media_type"),
    )


def _fake_decode(media: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic fake (width, height, n_frames) from byte content.
    A real implementation would dispatch to PIL / soundfile / pyav here."""
    n = len(media)
    head = sum(media[:16]) if n else 0
    width = 16 + (head + n) % 240
    height = 16 + (head * 7 + n * 3) % 240
    frames = 1 if media_type == "image" else 1 + (n % 32)
    return width, height, frames


def decode_media_meta(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched media "decode": (id, media, media_type) ->
    MEDIA_META_SCHEMA rows.

    ``strict=True`` is the real-codec seam: it raises NotImplementedError
    exactly where image/audio decode libraries would be invoked, proving
    the plumbing without pretending the codecs exist.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: F401  (vectorized paths would use this)

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile/pyav; "
                    "install and replace _fake_decode"
                )
            out = {
                "id": pdf["id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["media"].map(len),
                "width": [],
                "height": [],
                "n_frames": [],
                "digest": [],
            }
            ws, hs, fs, ds = [], [], [], []
            for media, mt in zip(pdf["media"], pdf["media_type"]):
                w, h, fr = _fake_decode(media, mt)
                ws.append(w)
                hs.append(h)
                fs.append(fr)
                # cheap stable digest of the first KiB (crc32: deterministic
                # across processes, unlike Python hash())
                import zlib

                ds.append(zlib.crc32(bytes(media[:1024])))
            out["width"], out["height"], out["n_frames"], out["digest"] = (
                ws,
                hs,
                fs,
                ds,
            )
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema=MEDIA_META_SCHEMA)


def media_meta_native(df: DataFrame) -> DataFrame:
    """SQL-expressible subset of the decode (byte length + deterministic
    pseudo-dimensions) as native expressions — used by the oracle-checked
    registry query; the mapInPandas path above is the general seam."""
    n = F.octet_length("media")
    return df.select(
        "id",
        "media_type",
        n.cast("bigint").alias("n_bytes"),
        (16 + (n % 240)).cast("int").alias("width_hint"),
        (16 + ((n * 3) % 240)).cast("int").alias("height_hint"),
    )
