"""MPEG audio (MP3) frame-level parse — pure stdlib, from scratch.

Companion to :mod:`nifi_dicom_spark.functions.mp4`: the *bitstream*
(polyphase filterbank / Huffman spectral decode) is genuinely out of scope
without external libs, but everything a training-data pipeline asks of an
audio corpus at 100 TB is frame-level: duration, bitrate profile (CBR vs
VBR), sample rate, channel mode, frame count and byte-exact frame
boundaries for sharding. All of that lives in the 4-byte frame headers and
the optional Xing/Info VBR tag, which this module parses:

* full MPEG-1/2/2.5 × Layer I/II/III header tables (bitrate, sample rate,
  samples-per-frame, padding) and the per-layer frame-length formulae;
* ID3v2 tag skip (syncsafe size) and leading-junk resync;
* Xing/``Info`` VBR tag detection in the first frame (side-info offset by
  version × channel mode) with total-frame/byte counts;
* ``parse_mp3`` — scan all frames, return count/duration/bitrate stats and
  a CBR/VBR verdict;
* ``frame_table`` — byte-exact (offset, size, duration) per frame, the
  audio analog of mp4.sample_table;
* ``write_mp3`` — deterministic minimal writer (valid headers, seeded
  payload bytes, optional ID3v2 and Xing) so tests and oracle queries
  round-trip real frame structure with no external data.

Reference analog: the reference reads DICOM structure while deliberately
skipping bulk data (``ExtractDICOMTags.java:134-136``); here we read frame
headers while skipping the spectral payload.
"""

from __future__ import annotations

import hashlib
import struct
from typing import NamedTuple

# header-field tables, indexed [version_key][layer] — version_key: 1 = MPEG-1,
# 2 = MPEG-2 and MPEG-2.5 (they share bitrate tables); layer: 1/2/3
_BITRATES: dict[tuple[int, int], tuple[int, ...]] = {
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SAMPLE_RATES = {
    3: (44100, 48000, 32000),  # version bits 11 = MPEG-1
    2: (22050, 24000, 16000),  # version bits 10 = MPEG-2
    0: (11025, 12000, 8000),  # version bits 00 = MPEG-2.5
}
_VERSION_NAME = {3: "1", 2: "2", 0: "2.5"}
_MODE_NAME = ("stereo", "joint_stereo", "dual_channel", "mono")


class FrameHeader(NamedTuple):
    version: str  # "1" | "2" | "2.5"
    layer: int  # 1 | 2 | 3
    bitrate_kbps: int
    sample_rate: int
    channels: int  # 1 | 2
    mode: str
    frame_len: int  # bytes, header included
    samples: int  # PCM samples per frame
    has_crc: bool = False  # protection_bit == 0: 2-byte CRC follows header


def _parse_header(data: bytes, pos: int) -> FrameHeader | None:
    """Decode the 4-byte frame header at ``pos``; None when invalid."""
    if pos + 4 > len(data):
        return None
    b1, b2, b3, b4 = data[pos : pos + 4]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    ver_bits = (b2 >> 3) & 0x3
    layer_bits = (b2 >> 1) & 0x3
    if ver_bits == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # bits 11→Layer I ... 01→Layer III
    br_idx = (b3 >> 4) & 0xF
    sr_idx = (b3 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / bad
    ver_key = 1 if ver_bits == 3 else 2
    bitrate = _BITRATES[(ver_key, layer)][br_idx]
    sample_rate = _SAMPLE_RATES[ver_bits][sr_idx]
    padding = (b3 >> 1) & 0x1
    mode_bits = (b4 >> 6) & 0x3
    channels = 1 if mode_bits == 3 else 2
    if layer == 1:
        samples = 384
        frame_len = (12 * bitrate * 1000 // sample_rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or ver_key == 1) else 576
        frame_len = samples // 8 * bitrate * 1000 // sample_rate + padding
    if frame_len <= 4:
        return None
    return FrameHeader(
        _VERSION_NAME[ver_bits],
        layer,
        bitrate,
        sample_rate,
        channels,
        _MODE_NAME[mode_bits],
        frame_len,
        samples,
        (b2 & 0x1) == 0,  # protection_bit 0 = CRC present
    )


def _id3v2_len(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 when absent)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    size = 0
    for b in data[6:10]:
        if b & 0x80:
            return 0  # not syncsafe → malformed
        size = (size << 7) | b
    return 10 + size


def is_mp3(payload: bytes | None) -> bool:
    """ID3v2-tagged or a valid frame header within the first 2 KiB."""
    if payload is None or len(payload) < 4:
        return False
    start = _id3v2_len(payload)
    if start and start < len(payload):
        return True
    limit = min(len(payload) - 4, 2048)
    return any(_parse_header(payload, p) for p in range(start, limit + 1))


class Frame(NamedTuple):
    index: int
    offset: int  # absolute byte offset of the header
    size: int  # frame bytes (header included)
    duration_s: float


def _xing_offset(h: FrameHeader) -> int:
    """Side-info length ⇒ where a Xing/Info tag would sit inside frame 1
    (the 2-byte CRC, when present, sits between header and side info)."""
    crc = 2 if h.has_crc else 0
    if h.version == "1":
        return 4 + crc + (17 if h.channels == 1 else 32)
    return 4 + crc + (9 if h.channels == 1 else 17)


def _parse_xing(data: bytes, frame_pos: int, h: FrameHeader) -> dict | None:
    pos = frame_pos + _xing_offset(h)
    tag = data[pos : pos + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    flags = struct.unpack_from(">I", data, pos + 4)[0]
    out: dict = {"tag": tag.decode("ascii"), "frames": None, "bytes": None}
    p = pos + 8
    if flags & 0x1:
        out["frames"] = struct.unpack_from(">I", data, p)[0]
        p += 4
    if flags & 0x2:
        out["bytes"] = struct.unpack_from(">I", data, p)[0]
    return out


def frame_table(payload: bytes, max_frames: int | None = None) -> list[Frame]:
    """Byte-exact frame boundaries: scan headers, follow frame_len chains.

    Leading junk before the first valid header is skipped (resync); the scan
    stops at the first invalid chain position after that (rather than
    resyncing mid-stream — a truncated tail must not invent frames)."""
    start = _id3v2_len(payload)
    first = None
    for p in range(start, min(len(payload) - 4, start + 4096) + 1):
        if _parse_header(payload, p) is not None:
            first = p
            break
    if first is None:
        raise ValueError("no MPEG audio frame found")
    frames: list[Frame] = []
    pos = first
    while pos + 4 <= len(payload):
        h = _parse_header(payload, pos)
        if h is None or pos + h.frame_len > len(payload):
            break
        frames.append(Frame(len(frames), pos, h.frame_len, h.samples / h.sample_rate))
        pos += h.frame_len
        if max_frames is not None and len(frames) >= max_frames:
            break
    return frames


def parse_mp3(payload: bytes) -> dict:
    """Scan every frame → stream-level metadata:

    ``{"version", "layer", "sample_rate", "channels", "mode", "n_frames",
    "duration_s", "bitrate_kbps" (mean), "is_vbr", "xing_frames",
    "id3_bytes", "audio_bytes"}``

    ``xing_frames`` is the Xing/Info tag's claimed total when present (the
    authoritative count for a partially-downloaded VBR file); ``n_frames``
    is always the physically-scanned count.
    """
    frames = frame_table(payload)
    if not frames:
        raise ValueError("no complete MPEG audio frame")
    first = _parse_header(payload, frames[0].offset)
    assert first is not None
    bitrates = []
    duration = 0.0
    for fr in frames:
        h = _parse_header(payload, fr.offset)
        assert h is not None
        bitrates.append(h.bitrate_kbps)
        duration += fr.duration_s
    xing = _parse_xing(payload, frames[0].offset, first)
    return {
        "version": first.version,
        "layer": first.layer,
        "sample_rate": first.sample_rate,
        "channels": first.channels,
        "mode": first.mode,
        "n_frames": len(frames),
        "duration_s": duration,
        "bitrate_kbps": sum(bitrates) / len(bitrates),
        "is_vbr": len(set(bitrates)) > 1 or xing is not None and xing["tag"] == "Xing",
        "xing_frames": xing["frames"] if xing else None,
        "id3_bytes": _id3v2_len(payload),
        "audio_bytes": sum(f.size for f in frames),
    }


def extract_frame(payload: bytes, frame: Frame) -> bytes:
    return payload[frame.offset : frame.offset + frame.size]


# ---------------------------------------------------------------------------
# Writer — deterministic minimal generator for tests/oracles
# ---------------------------------------------------------------------------

_BR_INDEX = {
    (vk, ly): {kbps: i for i, kbps in enumerate(tbl) if kbps}
    for (vk, ly), tbl in _BITRATES.items()
}
_SR_INDEX = {vb: {sr: i for i, sr in enumerate(t)} for vb, t in _SAMPLE_RATES.items()}


def write_mp3(
    n_frames: int,
    *,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    seed: bytes = b"",
    id3: bytes | None = None,
    xing: bool = False,
) -> bytes:
    """MPEG-1 Layer III CBR stream with valid headers and seeded payload
    bytes (md5 keystream per frame — byte-identical for identical inputs,
    so oracle queries can replay the mux). ``id3`` prepends an ID3v2 tag;
    ``xing`` stamps an Info tag with the true frame/byte counts into frame 0.
    """
    br_idx = _BR_INDEX[(1, 3)][bitrate_kbps]
    sr_idx = _SR_INDEX[3][sample_rate]
    mode_bits = 3 if channels == 1 else 0
    header = bytes(
        [
            0xFF,
            0xFB,  # sync + MPEG-1 + Layer III + no CRC
            (br_idx << 4) | (sr_idx << 2),  # no padding, not private
            (mode_bits << 6),
        ]
    )
    frame_len = 1152 // 8 * bitrate_kbps * 1000 // sample_rate
    body_len = frame_len - 4
    frames = []
    for i in range(n_frames):
        key = hashlib.md5(seed + i.to_bytes(4, "big")).digest()
        body = (key * (body_len // 16 + 1))[:body_len]
        frames.append(header + body)
    if xing and frames:
        off = _xing_offset(_parse_header(frames[0], 0))  # type: ignore[arg-type]
        total = frame_len * n_frames
        tag = b"Info" + struct.pack(">III", 0x3, n_frames, total)
        f0 = bytearray(frames[0])
        f0[off : off + len(tag)] = tag
        frames[0] = bytes(f0)
    out = b"".join(frames)
    if id3 is not None:
        size = len(id3)
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out = b"ID3\x04\x00\x00" + ss + id3 + out
    return out
