"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Decode is REAL for every image format plus PCM audio: WAV, BMP and PNG are
parsed by the pure-stdlib+numpy codecs in
:mod:`nifi_dicom_spark.functions.codecs`, baseline JPEG by the from-scratch
entropy/DCT codec in :mod:`nifi_dicom_spark.functions.jpeg`; they yield
genuine features (RMS energy windows, grayscale band means), genuine
decoded dimensions and genuine resizes. Only MP3/MP4 (psychoacoustic audio
/ video codec stacks, genuinely out of scope for an analytics engine
without external libs) fall back to a deterministic, clearly-marked stub. The
Spark-side plumbing is identical and fully tested either way: schema
(binary payload + typed metadata struct), Arrow-batched ``mapInPandas``
transforms, partition-size control for fat binary rows.

Reference analog: the payload of a flow-file is exactly such an opaque
binary (the serialized DICOM object with PixelData), and the reference's
read paths deliberately skip bulk pixel data when only metadata is needed
(``ExtractDICOMTags.java:134-136``) — mirrored here by keeping metadata in
separate columns so Parquet column pruning skips the binary entirely.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        # decoded container metadata — populated only when a REAL decode ran
        # (BMP/PNG images), null for audio/stub paths
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _fake_decode_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB for the remaining undecodable formats (MP3/MP4 — their
    psychoacoustic/entropy stacks are genuinely out of scope without
    external libs; WAV/BMP/PNG/baseline-JPEG decode for real).

    Deterministic fake: sha256-seeded pseudo-feature so tests are stable.
    Replace the body with the real decode + model features in production;
    the Spark plumbing (batch shape, schema, partitioning) is identical.
    """
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def _decode_feature(
    payload: bytes, dim: int = 16
) -> tuple[np.ndarray, int | None, int | None]:
    """Real decode for WAV/BMP/PNG payloads (pure-stdlib+numpy codecs);
    deterministic stub otherwise. Returns (feature, width, height) — dims
    non-null only when a real image decode ran. Magic bytes only gate the
    ATTEMPT — unsupported variants (float WAV, compressed/odd-bpp BMP,
    16-bit/interlaced PNG, truncated files) fall back to the stub rather
    than crashing the whole Spark job on one bad row."""
    from nifi_dicom_spark.functions import codecs

    try:
        if codecs.is_wav(payload):
            samples, _sr = codecs.decode_wav(payload)
            return codecs.audio_energy_features(samples, dim), None, None
        if codecs.is_bmp(payload):
            img = codecs.decode_bmp(payload)
            return codecs.image_block_features(img, dim), img.shape[1], img.shape[0]
        if codecs.is_png(payload):
            img = codecs.decode_png(payload)
            return codecs.image_block_features(img, dim), img.shape[1], img.shape[0]
        from nifi_dicom_spark.functions import jpeg

        if jpeg.is_jpeg(payload):
            img = jpeg.decode_jpeg(payload)
            return codecs.image_block_features(img, dim), img.shape[1], img.shape[0]
    except Exception:
        pass  # unsupported variant / corrupt container → stub path
    return _fake_decode_feature(payload, dim), None, None


def extract_features(media: DataFrame, dim: int = 16, batch_rows: int = 64) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batches carry the binaries; `spark.sql.execution.arrow.
    maxRecordsPerBatch` (set by the caller for fat media) bounds batch memory.
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            decoded = [
                _decode_feature(bytes(p) if p is not None else b"", dim)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f, _w, _h in decoded],
                    "sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in payloads
                    ],
                    "n_bytes": [len(p or b"") for p in payloads],
                    "width": pd.array([w for _f, w, _h in decoded], dtype="Int32"),
                    "height": pd.array([h for _f, _w, h in decoded], dtype="Int32"),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize. BMP and PNG payloads are REALLY decoded,
    nearest-neighbor resized and re-encoded in their own format
    (pure-stdlib+numpy codecs); other formats pass through with re-stamped
    metadata (stub path — real impl would decode via PIL/libjpeg)."""
    from nifi_dicom_spark.functions import codecs

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else None
                decoded, encode, mime = None, None, "image/fake"
                try:
                    if codecs.is_bmp(raw):
                        decoded, encode, mime = (
                            codecs.decode_bmp(raw), codecs.encode_bmp, "image/bmp"
                        )
                    elif codecs.is_png(raw):
                        decoded, encode, mime = (
                            codecs.decode_png(raw), codecs.encode_png, "image/png"
                        )
                    else:
                        from nifi_dicom_spark.functions import jpeg

                        if jpeg.is_jpeg(raw):
                            decoded, encode, mime = (
                                jpeg.decode_jpeg(raw),
                                jpeg.encode_jpeg,
                                "image/jpeg",
                            )
                except Exception:
                    decoded = None  # unsupported variant → passthrough
                if decoded is not None:
                    img = codecs.resize_nearest(decoded, width, height)
                    payloads.append(encode(img))
                else:
                    payloads.append(raw)
                    mime = "image/fake"
                metas.append(
                    {
                        "width": width,
                        "height": height,
                        "sample_rate": None,
                        "n_frames": None,
                        "mime": mime,
                    }
                )
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB video frame sampling: emits one row per sampled frame index with
    deterministic fake frame payloads (real impl: ffmpeg seek+decode)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                n = (r["meta"]["n_frames"] or 0) if r["meta"] is not None else 0
                for f in range(0, n, every_n):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": f,
                            "frame_sha": hashlib.sha256(
                                (r["payload"] or b"") + f.to_bytes(4, "little")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_sha"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        kernel,
        schema="media_id long, frame_idx int, frame_sha string",
    )
