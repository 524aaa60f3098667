"""Multimodal (image/audio/video) column operators for training pipelines.

Not in the reference (sensor telemetry only); first-class for a 100 TB
training-data engine. Media travel as opaque ``binary`` columns with a
typed metadata struct; all per-item compute runs as Arrow-batched
``mapInPandas`` stages so the decode/transform cost distributes across
the cluster and never round-trips the driver.

Decode stubs: the heavy codecs (PIL/librosa/ffmpeg) are NOT in this
environment, so the decode step is a clearly-marked deterministic fake
behind ``_decode_image_impl``/`_extract_audio_impl`` — the Spark-side
plumbing (schemas, batch iteration, partitioning, output shapes) is real
and tested. Swap the ``*_impl`` functions for real codecs in production.

Scale design:
- ``binary`` payloads stay columnar (Arrow) end-to-end; batches are
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor
  memory holds O(batch) media items, not O(partition).
- Feature outputs are fixed-length ``array<float>`` — joinable to the
  embedding/similarity operators (operators.similarity) downstream.
- Repartition by a content-hash bucket before decode when file sizes are
  skewed (one 4 GB video must not pin one task: pre-split by time-range
  via the ``frame_sample`` plan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media row schema: payload + typed metadata (format/dims/duration)
MEDIA_META = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])

IMAGE_FEATURE_DIM = 16


def _decode_image_impl(payload: bytes) -> list[float]:
    """STUB decode → feature vector. Deterministic fake: md5 of the bytes
    expanded to IMAGE_FEATURE_DIM floats in [0, 1). A real deployment
    replaces this body with e.g. PIL decode + model features.
    """
    if payload is None:
        raise NotImplementedError("null payload: no decoder registered")
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 256.0 for i in range(IMAGE_FEATURE_DIM)]


def _extract_audio_impl(payload: bytes, duration_ms: int) -> dict:
    """STUB audio feature extraction: deterministic fake summary stats."""
    h = hashlib.md5(payload or b"").digest()
    return {
        "rms": h[0] / 256.0,
        "zero_crossings": int.from_bytes(h[1:3], "big") % 1000,
        "est_duration_ms": int(duration_ms or 0),
    }


def decode_image_features(media: DataFrame,
                          id_col: str = "media_id",
                          payload_col: str = "payload") -> DataFrame:
    """Binary image column → fixed-length feature vectors via mapInPandas.

    Output: (media_id, features array<float>, n_bytes). Arrow-batched; the
    per-batch loop is the ONLY Python in the plan — everything before the
    stage boundary (filter/prune) stays JVM-side.
    """
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_image_impl(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "features": feats,
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf[payload_col]],
            })

    return media.select(id_col, payload_col).mapInPandas(batches, out_schema)


def resize_plan(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize planning: pure-JVM projection computing scale factors and the
    post-resize metadata; the pixel work belongs in the decode UDF.
    Demonstrates that metadata algebra should NOT enter the Python stage.
    """
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(target_w) / w, F.lit(target_h) / h)
    return media.select(
        "media_id",
        F.round(w * scale).cast("int").alias("out_w"),
        F.round(h * scale).cast("int").alias("out_h"),
        scale.alias("scale"),
        (w * h).alias("in_pixels"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame-extraction task list: one row per (media_id, frame_ts).

    ``sequence`` + ``explode`` keeps plan generation JVM-side; each task row
    is then a unit of decode work, so a long video fans out across the
    cluster instead of pinning one task (the skew-splitting pattern).
    """
    n = (F.col("meta.duration_ms") / every_ms).cast("long")
    return (media
            .filter(F.col("meta.duration_ms") > 0)
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"))
            .select("media_id", "frame_idx",
                    (F.col("frame_idx") * every_ms).alias("frame_ts_ms")))


def audio_features(media: DataFrame) -> DataFrame:
    """Binary audio column → summary-stat features via mapInPandas (stub)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("est_duration_ms", T.LongType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_extract_audio_impl(p, d) for p, d in
                    zip(pdf["payload"], pdf["duration_ms"])]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    flat = media.select("media_id", "payload",
                        F.col("meta.duration_ms").alias("duration_ms"))
    return flat.mapInPandas(batches, out_schema)
