"""Pure-numpy media codecs for the multimodal pipeline.

No imaging/audio library ships in this environment, but two ubiquitous
container formats are fully decodable with ``struct`` + numpy alone:

* **WAV** (RIFF/WAVE, PCM 8/16-bit) — parse the chunk list, return mono
  float32 samples in [-1, 1] plus the sample rate;
* **BMP** (BITMAPINFOHEADER, 24-bit uncompressed) — return an (H, W, 3)
  uint8 RGB array (bottom-up row order and 4-byte row padding handled).

Encoders exist for round-trip tests and for re-emitting resized images.
Compressed formats (JPEG/PNG/MP3/MP4) still fall back to the declared
deterministic stub in :mod:`nifi_dicom_spark.functions.multimodal` — their
entropy coders are out of scope without external libs, and the Spark-side
plumbing is identical either way.

Reference analog: pixelmed ships its own from-scratch pixel/waveform codecs
for the same reason (no external decoder dependency for core formats).
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def is_bmp(payload: bytes | None) -> bool:
    return payload is not None and len(payload) >= 54 and payload[:2] == b"BM"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (mono float32 samples in [-1, 1], sample_rate)."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:  # 8-bit PCM is unsigned
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if n_channels > 1:
        usable = (len(samples) // n_channels) * n_channels
        samples = samples[:usable].reshape(-1, n_channels).mean(axis=1)
    return samples, sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono float32 [-1, 1] → 16-bit PCM RIFF/WAVE."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    # round-to-nearest at the decoder's 1/32768 scale (truncation would bias
    # toward zero and double the quantization error)
    pcm = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(pcm)), pcm,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (H, W, 3) uint8 RGB."""
    if not is_bmp(payload):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or planes != 1:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=data_offset
    ).reshape(height, row_bytes)
    img = rows[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BMP."""
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, bottom-up
    pixels = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + info + pixels


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index sampling (pure numpy)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


def image_block_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real image feature: mean grayscale over ``dim`` row-bands, [0, 1]."""
    gray = img.astype(np.float32).mean(axis=2) / 255.0
    bands = np.array_split(gray, dim, axis=0)
    return np.array([b.mean() if b.size else 0.0 for b in bands], dtype=np.float32)


def audio_energy_features(samples: np.ndarray, dim: int) -> np.ndarray:
    """Real audio feature: RMS energy over ``dim`` equal time windows."""
    if samples.size == 0:
        return np.zeros(dim, dtype=np.float32)
    windows = np.array_split(samples.astype(np.float64), dim)
    return np.array(
        [np.sqrt((w**2).mean()) if w.size else 0.0 for w in windows],
        dtype=np.float32,
    )
