"""Multimodal column plumbing: media spans as opaque binaries + typed
metadata, with decode/feature UDF scaffolding.

The engine treats image/audio/video as opaque payloads addressed by
``media_ref`` (binary columns when materialized). The Spark-side
plumbing — schemas, Arrow batch shapes, partitioning — is real and
tested; the actual codec work is stubbed (no image/audio libraries in
this container): ``decode_media`` computes deterministic fake features
from md5(media_ref) unless ``strict=True``, in which case it raises
NotImplementedError exactly where a codec library would plug in.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = (
    "doc_id string, media_ref string, kind string, span_order int,"
    " width int, height int, duration_ms int, feature array<float>"
)

FEATURE_DIM = 8


def _fake_decode(media_ref: str, kind: str) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a codec: md5-derived dims/features."""
    h = hashlib.md5(media_ref.encode()).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    duration = (h[2] * 256 + h[3]) if kind == "audio" else 0
    feat = [((b / 255.0) * 2 - 1) for b in h[4 : 4 + FEATURE_DIM]]
    return width, height, duration, feat


def decode_media(media_spans_df: DataFrame, strict: bool = False) -> DataFrame:
    """media spans (doc_id, span_order, kind, media_ref, offset) →
    decoded features via Arrow-batched mapInPandas.

    strict=True raises NotImplementedError (the codec integration
    point); strict=False emits the deterministic fake so downstream
    plumbing (similarity over media features, joins back to spans) is
    testable in this container.
    """

    def run(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires an image/audio codec library "
                    "(not available in this container); integrate the "
                    "real decoder here"
                )
            rows = []
            for doc_id, order, kind, ref in zip(
                pdf["doc_id"], pdf["span_order"], pdf["kind"], pdf["media_ref"]
            ):
                w, hgt, dur, feat = _fake_decode(ref, kind)
                rows.append((doc_id, ref, kind, int(order), w, hgt, dur, feat))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "kind", "span_order",
                    "width", "height", "duration_ms", "feature",
                ],
            )

    return media_spans_df.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Audio/video frame sampling *plan*: one row per planned frame
    (doc_id, media_ref, frame_idx, t_ms). The frame extraction itself
    is part of the codec stub; the explode/partition shape is the real
    scale concern and is exercised here."""
    a = decoded.filter(F.col("kind") == "audio")
    return a.select(
        "doc_id",
        "media_ref",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
            )
        ).alias("frame_idx", "_i"),
    ).select(
        "doc_id", "media_ref", "frame_idx",
        (F.col("frame_idx") * every_ms).alias("t_ms"),
    )
