"""Multimodal (image/audio/video) column operators for training pipelines.

Not in the reference (sensor telemetry only); first-class for a 100 TB
training-data engine. Media travel as opaque ``binary`` columns with a
typed metadata struct; all per-item compute runs as Arrow-batched
``mapInPandas`` stages so the decode/transform cost distributes across
the cluster and never round-trips the driver.

Decoders: REAL for the formats this environment can genuinely decode —
binary netpbm images (P5/P6, parsed with numpy) and RIFF/WAV audio
(stdlib ``wave``), plus a PIL path behind an import-guard for other
image formats when the library is present. Payloads that match no
decoder fall back to a clearly-marked deterministic md5 fake so the
plumbing (schemas, batch iteration, partitioning, output shapes) stays
testable on synthetic blobs. Detection is parse-success, not sniffing:
a payload is only "an image" if the full strict decode succeeds.

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
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional: real codec for non-netpbm images when available
    from PIL import Image  # type: ignore
    HAS_PIL = True
except ImportError:
    HAS_PIL = False

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


def _parse_pnm(payload: bytes) -> "np.ndarray | None":
    """Strict binary-netpbm (P5 grayscale / P6 RGB, maxval<=255) decoder.

    Returns an (H, W, C) uint8 array, or None if the payload is not a
    complete, well-formed PNM — including the exact pixel-byte-count
    check, so arbitrary text that merely starts with 'P6' never parses.
    """
    if payload is None or len(payload) < 10 or payload[:1] != b"P":
        return None
    kind = payload[:2]
    if kind not in (b"P5", b"P6"):
        return None
    # header tokens: magic, width, height, maxval; '#' comments allowed
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        ch = payload[pos:pos + 1]
        if ch in b" \t\r\n":
            pos += 1
        elif ch == b"#":
            while pos < n and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif ch.isdigit():
            start = pos
            while pos < n and payload[pos:pos + 1].isdigit():
                pos += 1
            tokens.append(int(payload[start:pos]))
        else:
            return None
    if len(tokens) < 3 or pos >= n or payload[pos:pos + 1] not in b" \t\r\n":
        return None
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = tokens
    ch_n = 3 if kind == b"P6" else 1
    if not (0 < w and 0 < h and 0 < maxval <= 255):
        return None
    if n - pos != w * h * ch_n:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch_n,
                        offset=pos)
    return arr.reshape(h, w, ch_n)


def _image_stat_features(arr: "np.ndarray") -> list[float]:
    """Real image features: 4x4 grid of grayscale block means in [0, 1] —
    a classic tiny-thumbnail descriptor; IMAGE_FEATURE_DIM floats."""
    gray = arr.astype(np.float64).mean(axis=2) / 255.0
    feats = []
    for rows in np.array_split(gray, 4, axis=0):
        for block in np.array_split(rows, 4, axis=1):
            feats.append(float(block.mean()) if block.size else 0.0)
    return feats


def _decode_image_impl(payload: bytes) -> list[float]:
    """Image payload → IMAGE_FEATURE_DIM feature vector.

    Real path: strict PNM parse (or PIL when installed) → 4x4 grayscale
    block-mean descriptor. Unrecognized payloads get the deterministic
    md5 fake (documented stub) so synthetic-blob pipelines stay testable.
    """
    if payload is None:
        raise NotImplementedError("null payload: no decoder registered")
    arr = _parse_pnm(payload)
    if arr is None and HAS_PIL:
        try:
            img = Image.open(io.BytesIO(payload))
            img.load()
            a = np.asarray(img.convert("RGB"), dtype=np.uint8)
            arr = a.reshape(a.shape[0], a.shape[1], 3)
        except Exception:  # noqa: BLE001 — not an image: fall through
            arr = None
    if arr is not None:
        return _image_stat_features(arr)
    h = hashlib.md5(payload).digest()  # STUB fallback: md5 expansion
    return [h[i % 16] / 256.0 for i in range(IMAGE_FEATURE_DIM)]


def _parse_wav(payload: bytes) -> "tuple[np.ndarray, int] | None":
    """RIFF/WAV decode via the stdlib: (mono float samples in [-1, 1],
    frame_rate), or None if the payload is not a parseable WAV."""
    if payload is None or payload[:4] != b"RIFF":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            n_ch = wf.getnchannels()
            width = wf.getsampwidth()
            rate = wf.getframerate()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError):
        return None
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def _extract_audio_impl(payload: bytes, duration_ms: int) -> dict:
    """Audio payload → summary features.

    Real path for WAV: RMS amplitude, sign-change zero crossings, and the
    true duration from frame count / sample rate. Non-WAV payloads fall
    back to the deterministic md5 fake (documented stub)."""
    parsed = _parse_wav(payload)
    if parsed is not None:
        x, rate = parsed
        if len(x) == 0:
            return {"rms": 0.0, "zero_crossings": 0, "est_duration_ms": 0}
        rms = float(np.sqrt(np.mean(x * x)))
        zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
        return {"rms": rms, "zero_crossings": zc,
                "est_duration_ms": int(round(len(x) / rate * 1000.0))}
    h = hashlib.md5(payload or b"").digest()  # STUB fallback
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


def _dhash_impl(payload: bytes) -> tuple[int, int]:
    """Perceptual difference hash (dHash, Krawetz 2013): grayscale →
    9×8 block-mean thumbnail → 64 horizontal-gradient bits. Returns
    (hash, decoded_flag); undecodable payloads hash their md5 (flag 0)
    so the pipeline plumbing stays testable on synthetic blobs — the
    same documented-stub contract as ``_decode_image_impl``."""
    arr = _parse_pnm(payload) if payload is not None else None
    if arr is None and HAS_PIL and payload is not None:
        try:
            img = Image.open(io.BytesIO(payload))
            img.load()
            a = np.asarray(img.convert("RGB"), dtype=np.uint8)
            arr = a.reshape(a.shape[0], a.shape[1], 3)
        except Exception:  # noqa: BLE001 — not an image
            arr = None
    if arr is None:
        h = hashlib.md5(payload or b"").digest()
        return int.from_bytes(h[:8], "big", signed=True), 0
    gray = arr.astype(np.float64).mean(axis=2)
    grid = np.empty((8, 9))
    for i, rows in enumerate(np.array_split(gray, 8, axis=0)):
        for j, block in enumerate(np.array_split(rows, 9, axis=1)):
            grid[i, j] = block.mean() if block.size else 0.0
    bits = (grid[:, 1:] > grid[:, :-1]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # two's-complement into a signed 64-bit (Spark bigint)
    if v >= 1 << 63:
        v -= 1 << 64
    return v, 1


def image_dhash(media: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload") -> DataFrame:
    """Binary image column → 64-bit perceptual dHash (Arrow-batched).

    The content-dedup primitive for image corpora: visually-identical
    and lightly-edited images land within a few Hamming bits, which
    :func:`timeseries_data_analysis_spark.operators.dedup.hamming_pairs`
    then pairs up with the same banded join the SimHash text family
    uses — no all-pairs, no embedding model required. Output:
    ``(id_col, dhash bigint, decoded int)`` — ``decoded=0`` marks the
    md5-stub path for non-image payloads (exclude them before pairing
    unless testing plumbing).
    """
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("decoded", T.IntegerType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hs = [_dhash_impl(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "dhash": [h for h, _ in hs],
                "decoded": [d for _, d in hs],
            })

    return media.select(id_col, payload_col).mapInPandas(batches, out_schema)
