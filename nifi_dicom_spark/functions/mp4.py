"""ISO BMFF (MP4) container demux — pure stdlib, from scratch.

Real container parsing for the one media format whose *codec* payload
(H.264/AAC entropy stacks) is genuinely out of scope without external
libs. What an analytics/training-data pipeline actually needs from video
at 100 TB is demux-level: duration, track layout, codec fourcc, frame
count, frame boundaries, and the raw access-unit bytes for sampling —
exactly the parts the container provides without touching the codec.
This module supplies them:

* box (atom) walker with 32/64-bit sizes (``largesize``) and
  size-0 ("to end of file") handling;
* ``parse_mp4`` — movie header (timescale/duration) + per-track
  ``tkhd``/``mdhd``/``hdlr``/``stsd`` metadata (kind, codec fourcc,
  width/height for video, channels/sample-rate for audio);
* ``sample_table`` — the full stbl resolution: ``stsc`` chunk→sample
  runs joined with ``stco``/``co64`` chunk offsets and ``stsz`` sizes to
  byte-exact (offset, size) per sample, plus ``stts`` decode times;
* ``mux_mp4`` — a deterministic minimal muxer (ftyp + mdat + moov) so
  tests and oracle queries can round-trip real files with no external
  data. Samples are grouped into multi-sample chunks to genuinely
  exercise the stsc/stco join.

The *bitstream* decode of the extracted access units remains the declared
stub in :mod:`nifi_dicom_spark.functions.multimodal` — real pipelines
hand those bytes to a GPU decoder; the Spark-side contract (schema,
Arrow batching, per-sample rows) is what this engine owns.

Reference analog: pixelmed ships its own from-scratch container parsers
(DICOM encapsulated-frame offset tables) for the same demux-without-codec
reason; the reference's ``ExtractDICOMTags.java:134-136`` reads structure
while skipping bulk data — mirrored here by reading moov without decoding
mdat.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

_FULLBOX_CONTAINERS = {
    b"moov",
    b"trak",
    b"mdia",
    b"minf",
    b"stbl",
    b"edts",
    b"dinf",
    b"udta",
}


def is_mp4(payload: bytes | None) -> bool:
    return payload is not None and len(payload) >= 12 and payload[4:8] == b"ftyp"


class Box(NamedTuple):
    type: bytes
    start: int  # body start (after size+type [+largesize])
    end: int  # body end


def _walk(data: bytes, start: int, end: int):
    """Yield child boxes of data[start:end]; tolerant of a truncated tail
    (stops rather than raising — one bad row must not kill a Spark job)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            return
        yield Box(btype, body, pos + size)
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes) -> Box | None:
    for b in _walk(data, start, end):
        if b.type == btype:
            return b
    return None


def _find_all(data: bytes, start: int, end: int, btype: bytes) -> list[Box]:
    return [b for b in _walk(data, start, end) if b.type == btype]


class Sample(NamedTuple):
    index: int  # 0-based sample number within the track
    offset: int  # absolute byte offset in the file
    size: int  # bytes
    dt: int  # decode delta in track-timescale ticks
    pts: int  # decode time in track-timescale ticks (sum of prior deltas)


def parse_mp4(payload: bytes) -> dict:
    """Parse ftyp + moov into a metadata dict:

    ``{"brand", "timescale", "duration_s", "tracks": [{"track_id", "kind",
    "codec", "width", "height", "channels", "sample_rate", "n_samples",
    "timescale", "duration_s"}]}``

    Raises ``ValueError`` when the payload is not ISO BMFF or has no moov.
    """
    if not is_mp4(payload):
        raise ValueError("not an ISO BMFF payload (missing ftyp)")
    ftyp = _find(payload, 0, len(payload), b"ftyp")
    if ftyp is None:
        # magic matched but the declared box size is bogus (walker rejected)
        raise ValueError("malformed ftyp box")
    brand = payload[ftyp.start : ftyp.start + 4].decode("latin-1")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    mvhd = _find(payload, moov.start, moov.end, b"mvhd")
    if mvhd is None:
        raise ValueError("no mvhd box")
    version = payload[mvhd.start]
    if version == 1:
        timescale = struct.unpack_from(">I", payload, mvhd.start + 20)[0]
        duration = struct.unpack_from(">Q", payload, mvhd.start + 24)[0]
    else:
        timescale = struct.unpack_from(">I", payload, mvhd.start + 12)[0]
        duration = struct.unpack_from(">I", payload, mvhd.start + 16)[0]
    tracks = []
    for trak in _find_all(payload, moov.start, moov.end, b"trak"):
        tracks.append(_parse_trak(payload, trak))
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_s": duration / timescale if timescale else 0.0,
        "tracks": tracks,
    }


def _parse_trak(payload: bytes, trak: Box) -> dict:
    out: dict = {
        "track_id": None,
        "kind": "other",
        "codec": None,
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "n_samples": 0,
        "timescale": None,
        "duration_s": None,
    }
    tkhd = _find(payload, trak.start, trak.end, b"tkhd")
    if tkhd is not None:
        v = payload[tkhd.start]
        # v0: ver/flags(4) ctime(4) mtime(4) track_id(4); v1 widens times to 8
        out["track_id"] = struct.unpack_from(
            ">I", payload, tkhd.start + (20 if v == 1 else 12)
        )[0]
        # width/height: 16.16 fixed, last 8 bytes of the box body
        w, h = struct.unpack_from(">II", payload, tkhd.end - 8)
        if w and h:
            out["width"], out["height"] = w >> 16, h >> 16
    mdia = _find(payload, trak.start, trak.end, b"mdia")
    if mdia is None:
        return out
    mdhd = _find(payload, mdia.start, mdia.end, b"mdhd")
    if mdhd is not None:
        v = payload[mdhd.start]
        if v == 1:
            ts = struct.unpack_from(">I", payload, mdhd.start + 20)[0]
            dur = struct.unpack_from(">Q", payload, mdhd.start + 24)[0]
        else:
            ts = struct.unpack_from(">I", payload, mdhd.start + 12)[0]
            dur = struct.unpack_from(">I", payload, mdhd.start + 16)[0]
        out["timescale"] = ts
        out["duration_s"] = dur / ts if ts else 0.0
    hdlr = _find(payload, mdia.start, mdia.end, b"hdlr")
    if hdlr is not None:
        handler = payload[hdlr.start + 8 : hdlr.start + 12]
        out["kind"] = {b"vide": "video", b"soun": "audio"}.get(handler, "other")
    minf = _find(payload, mdia.start, mdia.end, b"minf")
    stbl = (
        _find(payload, minf.start, minf.end, b"stbl") if minf is not None else None
    )
    if stbl is None:
        return out
    stsd = _find(payload, stbl.start, stbl.end, b"stsd")
    if stsd is not None:
        # ver/flags(4) entry_count(4) then the first sample entry
        n_entries = struct.unpack_from(">I", payload, stsd.start + 4)[0]
        if n_entries >= 1:
            entry_start = stsd.start + 8
            out["codec"] = payload[entry_start + 4 : entry_start + 8].decode(
                "latin-1"
            )
            # sample-entry header: size(4) fourcc(4) reserved(6) dri(2) = 16
            body = entry_start + 16
            if out["kind"] == "video" and entry_start + 36 <= stsd.end:
                # VisualSampleEntry: pre_defined(2) reserved(2) pre_defined(12)
                # width(2) height(2)
                vw, vh = struct.unpack_from(">HH", payload, body + 16)
                out["width"] = out["width"] or vw
                out["height"] = out["height"] or vh
            elif out["kind"] == "audio" and body + 20 <= stsd.end:
                # AudioSampleEntry: reserved(8) channels(2) samplesize(2)
                # pre_defined(2) reserved(2) samplerate(16.16)
                out["channels"] = struct.unpack_from(">H", payload, body + 8)[0]
                out["sample_rate"] = (
                    struct.unpack_from(">I", payload, body + 16)[0] >> 16
                )
    stsz = _find(payload, stbl.start, stbl.end, b"stsz")
    if stsz is not None:
        out["n_samples"] = struct.unpack_from(">I", payload, stsz.start + 8)[0]
    return out


def sample_table(payload: bytes, track_id: int | None = None) -> list[Sample]:
    """Resolve the full sample table of one track to byte-exact
    (offset, size, decode-delta, pts) tuples — the stsc chunk→sample runs
    joined with stco/co64 chunk offsets, stsz sizes and stts time deltas.

    ``track_id=None`` picks the first video track, else the first track.
    """
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    traks = _find_all(payload, moov.start, moov.end, b"trak")
    if not traks:
        raise ValueError("no trak box")
    chosen = None
    if track_id is None:
        for trak in traks:
            meta = _parse_trak(payload, trak)
            if meta["kind"] == "video":
                chosen = trak
                break
        chosen = chosen or traks[0]
    else:
        for trak in traks:
            if _parse_trak(payload, trak)["track_id"] == track_id:
                chosen = trak
                break
        if chosen is None:
            raise ValueError(f"no track with id {track_id}")
    mdia = _find(payload, chosen.start, chosen.end, b"mdia")
    if mdia is None:
        raise ValueError("no mdia box")
    minf = _find(payload, mdia.start, mdia.end, b"minf")
    if minf is None:
        raise ValueError("no minf box")
    stbl = _find(payload, minf.start, minf.end, b"stbl")
    if stbl is None:
        raise ValueError("no stbl box")

    # Every count below comes from UNTRUSTED payload bytes: validate each
    # against its own box length (per-entry tables) or the payload size
    # (uniform counts) BEFORE materializing lists — a corrupt 12-byte box
    # claiming 2^32 samples must raise, not allocate gigabytes.
    stsz = _find(payload, stbl.start, stbl.end, b"stsz")
    if stsz is None:
        raise ValueError("no stsz box")
    uniform, count = struct.unpack_from(">II", payload, stsz.start + 4)
    if uniform:
        if count * max(uniform, 1) > len(payload):
            raise ValueError("stsz count exceeds payload size")
        sizes = [uniform] * count
    else:
        if stsz.start + 12 + 4 * count > stsz.end:
            raise ValueError("stsz count exceeds box length")
        sizes = list(
            struct.unpack_from(f">{count}I", payload, stsz.start + 12)
        )

    # stco / co64: chunk offsets
    stco = _find(payload, stbl.start, stbl.end, b"stco")
    if stco is not None:
        n_chunks = struct.unpack_from(">I", payload, stco.start + 4)[0]
        if stco.start + 8 + 4 * n_chunks > stco.end:
            raise ValueError("stco count exceeds box length")
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload, stco.start + 8))
    else:
        co64 = _find(payload, stbl.start, stbl.end, b"co64")
        if co64 is None:
            raise ValueError("no stco/co64 box")
        n_chunks = struct.unpack_from(">I", payload, co64.start + 4)[0]
        if co64.start + 8 + 8 * n_chunks > co64.end:
            raise ValueError("co64 count exceeds box length")
        offsets = list(struct.unpack_from(f">{n_chunks}Q", payload, co64.start + 8))

    # stsc: runs of (first_chunk, samples_per_chunk); expand to per-chunk
    stsc = _find(payload, stbl.start, stbl.end, b"stsc")
    if stsc is None:
        raise ValueError("no stsc box")
    n_runs = struct.unpack_from(">I", payload, stsc.start + 4)[0]
    if stsc.start + 8 + 12 * n_runs > stsc.end:
        raise ValueError("stsc count exceeds box length")
    runs = [
        struct.unpack_from(">III", payload, stsc.start + 8 + 12 * i)[:2]
        for i in range(n_runs)
    ]
    per_chunk: list[int] = []
    prev_first = 0
    for i, (first, spc) in enumerate(runs):
        first = max(first, 1)
        if first <= prev_first:
            # non-increasing runs would silently misalign every later
            # chunk's sample base — corrupt table, refuse
            raise ValueError("stsc first_chunk values must be increasing")
        if i == 0 and first > 1:
            # malformed: chunks before the first run have NO declared
            # sample count — give them zero samples rather than applying
            # the run's count at the wrong chunk base (positional
            # alignment: per_chunk[k] is chunk k+1's count)
            per_chunk.extend([0] * (first - 1))
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        # clamp to the declared chunk list — corrupt first_chunk values must
        # not inflate the expansion
        span = max(0, min(last, n_chunks) - first + 1)
        per_chunk.extend([spc] * span)
        prev_first = first

    # stts: runs of (sample_count, delta); expand to per-sample deltas
    stts = _find(payload, stbl.start, stbl.end, b"stts")
    if stts is None:
        raise ValueError("no stts box")
    n_truns = struct.unpack_from(">I", payload, stts.start + 4)[0]
    if stts.start + 8 + 8 * n_truns > stts.end:
        raise ValueError("stts count exceeds box length")
    deltas: list[int] = []
    for i in range(n_truns):
        cnt, dt = struct.unpack_from(">II", payload, stts.start + 8 + 8 * i)
        deltas.extend([dt] * min(cnt, count - len(deltas)))
        if len(deltas) >= count:
            break

    samples: list[Sample] = []
    idx, pts = 0, 0
    end = len(payload)
    for chunk_i, chunk_off in enumerate(offsets):
        pos = chunk_off
        for _ in range(per_chunk[chunk_i] if chunk_i < len(per_chunk) else 0):
            if idx >= count:
                break
            if pos + sizes[idx] > end:
                # truncated mdat (e.g. a partially-downloaded faststart file
                # whose moov promises more than the bytes deliver): return
                # the verified prefix — emitting hashes of out-of-range
                # slices would silently corrupt downstream data
                return samples
            dt = deltas[idx] if idx < len(deltas) else 0
            samples.append(Sample(idx, pos, sizes[idx], dt, pts))
            pos += sizes[idx]
            pts += dt
            idx += 1
    return samples


def extract_sample(payload: bytes, sample: Sample) -> bytes:
    """The actual access-unit bytes of one sample, sliced from mdat."""
    if sample.offset + sample.size > len(payload):
        raise ValueError("sample extends past payload end")
    return payload[sample.offset : sample.offset + sample.size]


# ---------------------------------------------------------------------------
# Muxer — deterministic minimal writer for tests/oracles (no external data)
# ---------------------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version) + flags.to_bytes(3, "big") + body)


def mux_mp4(
    samples: list[bytes],
    *,
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
    sample_duration: int = 40,
    kind: str = "video",
    codec: str = "mp4v",
    sample_rate: int = 8000,
    channels: int = 1,
    samples_per_chunk: int = 3,
) -> bytes:
    """Write a single-track MP4: ftyp + mdat + moov. Deterministic bytes for
    identical inputs (replay/oracle safe). Samples are packed into chunks of
    ``samples_per_chunk`` so the stsc/stco join is exercised for real."""
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)
    mdat_base = len(ftyp) + 8  # absolute offset of the first sample byte

    duration = n * sample_duration
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">II", 0, 0)  # ctime mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )  # unity matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = _full(
        b"tkhd",
        0,
        7,  # enabled | in_movie | in_preview
        struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track_id
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer group volume reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    handler = b"vide" if kind == "video" else b"soun"
    hdlr = _full(
        b"hdlr",
        0,
        0,
        b"\x00" * 4 + handler + b"\x00" * 12 + b"nds\x00",
    )
    fourcc = codec.encode("latin-1")[:4].ljust(4, b" ")
    if kind == "video":
        entry_body = (
            b"\x00" * 6
            + struct.pack(">H", 1)  # data_reference_index
            + b"\x00" * 16  # pre_defined/reserved
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
            + b"\x00" * 4
            + struct.pack(">H", 1)  # frame_count
            + b"\x00" * 32  # compressorname
            + struct.pack(">Hh", 24, -1)  # depth, pre_defined
        )
        media_hdr = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    else:
        entry_body = (
            b"\x00" * 6
            + struct.pack(">H", 1)
            + b"\x00" * 8
            + struct.pack(">HHHH", channels, 16, 0, 0)
            + struct.pack(">I", sample_rate << 16)
        )
        media_hdr = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    stsd = _full(
        b"stsd", 0, 0, struct.pack(">I", 1) + _box(fourcc, entry_body)
    )
    stts = _full(
        b"stts", 0, 0, struct.pack(">III", 1, n, sample_duration)
        if n
        else struct.pack(">I", 0)
    )
    # chunks of samples_per_chunk (last chunk may be short → second stsc run)
    spc = max(1, samples_per_chunk)
    n_full = n // spc
    rem = n % spc
    stsc_runs = []
    if n_full:
        stsc_runs.append((1, spc, 1))
    if rem:
        stsc_runs.append((n_full + 1, rem, 1))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    sizes = [len(s) for s in samples]
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes),
    )
    chunk_offsets = []
    pos = mdat_base
    for c in range(n_full + (1 if rem else 0)):
        chunk_offsets.append(pos)
        in_chunk = spc if c < n_full else rem
        pos += sum(sizes[c * spc : c * spc + in_chunk])
    stco = _full(
        b"stco",
        0,
        0,
        struct.pack(">I", len(chunk_offsets))
        + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", media_hdr + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
