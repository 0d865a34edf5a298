"""AAC-LC audio codec (ADTS) — from scratch, spec-shaped, mono + stereo.

Closes the last declared audio stub: compressed AAC payloads now decode
to real PCM instead of falling back to the deterministic fake feature.

What is spec-EXACT here (ISO/IEC 13818-7 / 14496-3, public spec):

* ADTS framing: the full fixed+variable header bit layout (syncword,
  MPEG-4 ID, layer 00, protection_absent, AAC-LC profile, the standard
  sampling-frequency-index table, channel configuration, 13-bit frame
  length, buffer fullness, raw-block count) — third-party tools identify
  these streams, and `parse_adts` walks third-party ADTS streams.
* Raw-data-block syntax: id_syn_ele elements (SCE/CPE … END, byte-aligned
  terminator), single_channel_element → individual_channel_stream with
  global_gain, ics_info (window_sequence/shape, max_sfb, predictor flag),
  channel_pair_element → common_window flag, shared ics_info,
  ms_mask_present (0 = L/R, 1 = per-band ms_used bits, 2 = all bands
  mid/side; the encoder emits 0 or 2 by a per-frame energy decision, the
  decoder reconstructs all three masks with the spec's l=m+s / r=m−s
  rotation), then two individual_channel_streams,
  section_data (4-bit codebook + 5-bit incremental section lengths with
  the 31-escape), DPCM scalefactor chain seeded from global_gain,
  pulse/TNS/gain-control presence flags, spectral pair coding with sign
  bits and the REAL escape sequence (N ones, a zero, then an (N+4)-bit
  word; value = 2^(N+4) + word) for magnitudes ≥ 16.
* Filterbank: 2048-tap sine window, 1024-line MDCT with 50 % TDAC
  overlap-add (the long-window AAC filterbank; exact-inverse verified),
  and the 4/3-power-law requantization ``x = sign·q^{4/3}·2^{(gg−sf−210)/4}``
  with per-scalefactor-band step control.

Documented deviations, same embed-or-derive policy as the Layer II/III
codecs (`mpeg_audio.py`): (a) the spectral and scalefactor Huffman code
TABLES are engine-canonical — deterministic canonical Huffman codes from
fixed Zipf/Laplacian frequency models — because the spec's printed
codebooks (tables A.2–A.13) are non-derivable table data; encoder and
decoder build identical tables so streams are exactly self-consistent
(third-party streams parse at the ADTS level via `parse_adts`/
`probe_media` but not at the spectral level — `decode_aac` raises and
the multimodal feature path falls back to its declared stub); (b) the
scalefactor-band layout is a derived closed-form geometric progression
(widths ×1.09, multiples of 4 — the spec's long-window granularity)
instead of the printed per-rate swb offset tables. Scope: mono (SCE)
and 2-channel stereo (CPE with common_window + M/S), long windows only
(ONLY_LONG_SEQUENCE), no TNS/PNS/prediction (all legal encoder choices
signalled through the real syntax bits).

Reference analog: decompress-on-read of encapsulated compressed payloads
(``apps/DeidentifyAndRedact.java:271``,
``AttributeList.setDecompressPixelData``).
"""

from __future__ import annotations

import numpy as np

from nifi_dicom_spark.functions.h264 import _BitReader, _BitWriter

__all__ = [
    "encode_aac",
    "decode_aac",
    "is_aac",
    "parse_adts",
    "sfb_layout",
]

FRAME_LEN = 1024  # spectral lines / new PCM samples per frame
_WIN_LEN = 2 * FRAME_LEN

# the standard ADTS sampling_frequency_index table (13818-7 table 35)
SAMPLE_RATES = (
    96000,
    88200,
    64000,
    48000,
    44100,
    32000,
    24000,
    22050,
    16000,
    12000,
    11025,
    8000,
)

_ESC = 16  # in-codeword magnitude cap; >= 16 uses the escape sequence
_QMAX = (1 << 12) - 1  # encoder-side magnitude cap (escape N <= 7)
_SF_MAX = 60  # per-band scalefactor range [0, 60], dpcm in [-60, 60]
_ID_SCE = 0
_ID_CPE = 1
_ID_END = 7
_CB_ZERO = 0
_CB_PAIR = 11  # our engine-canonical pair book, signalled like ESC_HCB


# ---------------------------------------------------------------------------
# filterbank: 2048-tap sine window, 1024-line MDCT (TDAC)
# ---------------------------------------------------------------------------


_KERNEL: tuple[np.ndarray, np.ndarray] | None = None


def _kernel() -> tuple[np.ndarray, np.ndarray]:
    global _KERNEL
    if _KERNEL is None:
        n = np.arange(_WIN_LEN)
        k = np.arange(FRAME_LEN)
        win = np.sin(np.pi / _WIN_LEN * (n + 0.5))
        cos = np.cos(
            np.pi / (2 * _WIN_LEN) * np.outer(2 * k + 1, 2 * n + 1 + FRAME_LEN)
        )
        # float32 transform: ~2x faster matmul; kernel rounding sits ~120 dB
        # under the payload, far below any quantizer operating point
        _KERNEL = (win.astype(np.float32), cos.astype(np.float32))
    return _KERNEL


def _mdct(z: np.ndarray) -> np.ndarray:
    win, cos = _kernel()
    return (cos @ (win * z.astype(np.float32))).astype(np.float64)


def _imdct(X: np.ndarray) -> np.ndarray:
    win, cos = _kernel()
    return ((4.0 / _WIN_LEN) * win * (cos.T @ X.astype(np.float32))).astype(
        np.float64
    )


# ---------------------------------------------------------------------------
# scalefactor bands: derived geometric layout (widths x1.09, multiples of 4)
# ---------------------------------------------------------------------------


_SFB: np.ndarray | None = None


def sfb_layout() -> np.ndarray:
    """Band edges as offsets [0, ..., 1024]; every width a multiple of 4
    (the spec's long-window swb granularity), geometric growth so low
    frequencies get fine scalefactor control like the printed tables."""
    global _SFB
    if _SFB is None:
        edges = [0]
        w = 4.0
        while edges[-1] < FRAME_LEN:
            step = max(4, int(round(w / 4.0)) * 4)
            edges.append(min(FRAME_LEN, edges[-1] + step))
            w *= 1.09
        _SFB = np.asarray(edges, dtype=np.int64)
    return _SFB


# ---------------------------------------------------------------------------
# engine-canonical Huffman tables (embed-or-derive policy; see module doc)
# ---------------------------------------------------------------------------


_TABLES: tuple | None = None


def _tables() -> tuple[dict, dict, dict, dict, int, int]:
    """(pair_enc, pair_dec, sf_enc, sf_dec, pair_maxlen, sf_maxlen).
    Pair symbols (a, b) with a,b in [0, 16] (16 = escape flag) weighted
    by the Zipf decay of quantized MDCT magnitudes; scalefactor DPCM
    symbols in [-60, 60] weighted Laplacian around 0."""
    global _TABLES
    if _TABLES is None:
        from nifi_dicom_spark.functions.mpeg_audio import _canonical_huffman

        pw = [
            ((a, b), max(1, round(1e12 / (((a + 1) * (b + 1)) ** 1.7))))
            for a in range(_ESC + 1)
            for b in range(_ESC + 1)
        ]
        sw = [
            (d, max(1, round(1e9 * 0.5 ** abs(d))))
            for d in range(-_SF_MAX, _SF_MAX + 1)
        ]
        pe = _canonical_huffman(pw)
        se = _canonical_huffman(sw)
        pd = {(ln, code): s for s, (code, ln) in pe.items()}
        sd = {(ln, code): s for s, (code, ln) in se.items()}
        _TABLES = (
            pe,
            pd,
            se,
            sd,
            max(ln for _, ln in pe.values()),
            max(ln for _, ln in se.values()),
        )
    return _TABLES


def _read_code(r: _BitReader, dec: dict, maxlen: int):
    # one windowed read + integer shifts instead of a per-bit reader call
    n = min(maxlen, len(r.data) * 8 - r.pos)
    window = r.u(n)
    code = 0
    get = dec.get
    for ln in range(1, n + 1):
        code = (code << 1) | ((window >> (n - ln)) & 1)
        hit = get((ln, code))
        if hit is not None:
            r.pos -= n - ln  # give back the unconsumed tail of the window
            return hit
    raise ValueError("invalid AAC Huffman code")


def _write_escape(w: _BitWriter, v: int) -> None:
    """Spec escape sequence for magnitudes >= 16: N ones, a zero, then the
    (N+4)-bit word; decoded value = 2^(N+4) + word."""
    n = v.bit_length() - 5
    if n:
        w.u((1 << n) - 1, n)
    w.u(0, 1)
    w.u(v - (1 << (n + 4)), n + 4)


def _read_escape(r: _BitReader) -> int:
    n = 0
    while r.u(1):
        n += 1
        if n > 8:
            raise ValueError("AAC escape prefix too long")
    return (1 << (n + 4)) + r.u(n + 4)


# ---------------------------------------------------------------------------
# ADTS framing (spec-exact)
# ---------------------------------------------------------------------------


def _adts_header(frame_len: int, sr_index: int, channels: int = 1) -> bytes:
    w = _BitWriter()
    w.u(0xFFF, 12)  # syncword
    w.u(0, 1)  # ID: MPEG-4
    w.u(0, 2)  # layer
    w.u(1, 1)  # protection_absent (no CRC)
    w.u(1, 2)  # profile: AAC-LC (object type 2, coded minus 1)
    w.u(sr_index, 4)
    w.u(0, 1)  # private
    w.u(channels, 3)  # channel_configuration
    w.u(0, 1)  # original/copy
    w.u(0, 1)  # home
    w.u(0, 1)  # copyright id bit
    w.u(0, 1)  # copyright id start
    w.u(frame_len, 13)  # full frame incl. this header
    w.u(0x7FF, 11)  # buffer fullness: VBR
    w.u(0, 2)  # raw data blocks minus 1
    return w.getvalue()


def _parse_adts_header(data: bytes, pos: int) -> dict | None:
    if pos + 7 > len(data):
        return None
    r = _BitReader(data[pos : pos + 7])
    if r.u(12) != 0xFFF:
        return None
    r.u(1)  # ID
    if r.u(2) != 0:
        return None  # layer must be 00
    protection_absent = r.u(1)
    profile = r.u(2) + 1
    sr_index = r.u(4)
    if sr_index >= len(SAMPLE_RATES):
        return None
    r.u(1)
    channels = r.u(3)
    r.u(4)
    frame_len = r.u(13)
    if frame_len < 7:
        return None
    return {
        "profile": profile,
        "sample_rate": SAMPLE_RATES[sr_index],
        "channels": channels,
        "frame_len": frame_len,
        "header_len": 7 if protection_absent else 9,
    }


def is_aac(payload: bytes | None) -> bool:
    """ADTS sniff anchored at offset 0 (same anchored-not-resync policy as
    ``is_layer1``): a valid header whose frame length stays in bounds."""
    if not payload or len(payload) < 7:
        return False
    h = _parse_adts_header(payload, 0)
    return h is not None and h["frame_len"] <= len(payload)


def parse_adts(payload: bytes) -> dict:
    """Header-only probe: walk the ADTS frame chain (works on third-party
    streams too — no spectral decode). Returns sample_rate/channels/
    profile/n_frames/duration_s."""
    pos = 0
    n = 0
    first = None
    while pos + 7 <= len(payload):
        h = _parse_adts_header(payload, pos)
        if h is None or pos + h["frame_len"] > len(payload):
            break
        if first is None:
            first = h
        n += 1
        pos = pos + h["frame_len"]
    if first is None:
        raise ValueError("no ADTS frames")
    return {
        "profile": first["profile"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": n,
        "duration_s": n * FRAME_LEN / first["sample_rate"],
    }


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _analyze(lines: np.ndarray, quality: int):
    """Quantize one channel's MDCT lines: (gg, sf, q, neg, band_cb).
    A silent channel yields gg=0 and an empty band_cb (max_sfb 0)."""
    edges = sfb_layout()
    n_bands = len(edges) - 1
    amax = float(np.abs(lines).max())
    if amax <= 0.0:
        return (
            0,
            np.zeros(0, dtype=np.int64),
            np.zeros(FRAME_LEN, dtype=np.int64),
            lines < 0,
            [],
        )

    target = float(min(quality, _QMAX))
    # global gain sized so the loudest band quantizes near `target`
    gg = int(np.ceil(210 + 4 * np.log2(amax / target ** (4.0 / 3.0))))
    gg = max(0, min(255, gg))
    # per-band scalefactors: finer steps for quieter bands (sf raises the
    # band's effective gain exponent — same 2^(1/4) ladder as the spec)
    band_amax = np.array(
        [float(np.abs(lines[edges[b] : edges[b + 1]]).max()) for b in range(n_bands)]
    )
    sf = np.zeros(n_bands, dtype=np.int64)
    nz_bands = band_amax > 0
    with np.errstate(divide="ignore"):
        want = 210 + 4 * np.log2(
            np.where(nz_bands, band_amax, 1.0) / target ** (4.0 / 3.0)
        )
    sf[nz_bands] = np.clip(gg - np.ceil(want[nz_bands]).astype(np.int64), 0, _SF_MAX)

    # quantize per band
    q = np.zeros(FRAME_LEN, dtype=np.int64)
    for b in range(n_bands):
        if not nz_bands[b]:
            continue
        lo, hi = edges[b], edges[b + 1]
        step = 2.0 ** ((gg - sf[b] - 210) / 4.0)
        q[lo:hi] = np.minimum(
            np.rint((np.abs(lines[lo:hi]) / step) ** 0.75).astype(np.int64), _QMAX
        )
    neg = lines < 0

    band_cb = [
        _CB_PAIR if int(q[edges[b] : edges[b + 1]].max(initial=0)) else _CB_ZERO
        for b in range(n_bands)
    ]
    return gg, sf, q, neg, band_cb


def _own_max_sfb(band_cb: list) -> int:
    max_sfb = 0
    for b, cb in enumerate(band_cb):
        if cb != _CB_ZERO:
            max_sfb = b + 1
    return max_sfb


def _write_ics_info(w: _BitWriter, max_sfb: int) -> None:
    w.u(0, 1)  # ics_reserved
    w.u(0, 2)  # ONLY_LONG_SEQUENCE
    w.u(0, 1)  # sine window
    w.u(max_sfb, 6)
    w.u(0, 1)  # predictor_data_present


def _write_ics(
    w: _BitWriter,
    gg: int,
    sf: np.ndarray,
    q: np.ndarray,
    neg: np.ndarray,
    band_cb: list,
    max_sfb: int,
    *,
    common_window: bool,
) -> None:
    """individual_channel_stream: global_gain, [ics_info unless the CPE
    hoisted a common one], section_data, scale_factor_data, the three
    absent-tool flags, spectral_data. With a common (shared) max_sfb the
    channel's band_cb is zero-padded so sections still tile it."""
    pe, _pd, se, _sd, _pm, _sm = _tables()
    edges = sfb_layout()
    if len(band_cb) < max_sfb:
        band_cb = list(band_cb) + [_CB_ZERO] * (max_sfb - len(band_cb))

    w.u(gg, 8)
    if not common_window:
        _write_ics_info(w, max_sfb)
    # section_data: merge equal-codebook runs; 5-bit lengths, 31 escapes
    b = 0
    while b < max_sfb:
        cb = band_cb[b]
        ln = 1
        while b + ln < max_sfb and band_cb[b + ln] == cb:
            ln += 1
        w.u(cb, 4)
        rem = ln
        while rem >= 31:
            w.u(31, 5)
            rem -= 31
        w.u(rem, 5)
        b += ln
    # scale_factor_data: DPCM chain seeded from global_gain over coded bands
    last = gg
    for b in range(max_sfb):
        if band_cb[b] == _CB_ZERO:
            continue
        cur = gg - int(sf[b])  # transmitted value, spec-style "sf applied"
        d = cur - last
        code, ln = se[d]
        w.u(code, ln)
        last = cur
    w.u(0, 1)  # pulse_data_present
    w.u(0, 1)  # tns_data_present
    w.u(0, 1)  # gain_control_data_present
    # spectral_data: pairs with sign bits + escapes, band-major
    for b in range(max_sfb):
        if band_cb[b] == _CB_ZERO:
            continue
        lo, hi = edges[b], edges[b + 1]
        for i in range(lo, hi, 2):
            a, c = int(q[i]), int(q[i + 1])
            ca, cc = min(a, _ESC), min(c, _ESC)
            code, ln = pe[(ca, cc)]
            w.u(code, ln)
            if a:
                w.u(int(neg[i]), 1)
            if c:
                w.u(int(neg[i + 1]), 1)
            if ca == _ESC:
                _write_escape(w, a)
            if cc == _ESC:
                _write_escape(w, c)


def _encode_frame(lines: np.ndarray, quality: int) -> bytes:
    """One mono raw_data_block: SCE(ICS) + END, byte-aligned. Bit-for-bit
    the pre-CPE-refactor layout (a silent channel degenerates to gg=0 +
    max_sfb=0 through the same generic writer)."""
    w = _BitWriter()
    w.u(_ID_SCE, 3)
    w.u(0, 4)  # element_instance_tag
    gg, sf, q, neg, band_cb = _analyze(lines, quality)
    _write_ics(w, gg, sf, q, neg, band_cb, _own_max_sfb(band_cb), common_window=False)
    w.u(_ID_END, 3)
    while w._nbits:
        w.u(0, 1)  # byte-align the raw data block
    return w.getvalue()


def _encode_frame_pair(
    left: np.ndarray, right: np.ndarray, quality: int
) -> bytes:
    """One stereo raw_data_block: CPE(common_window ics_info, M/S mask,
    ICS×2) + END. The M/S decision is per-frame and global (mask 0 or 2):
    rotate to mid/side when the rotated pair concentrates the energy —
    2·min(E[m²], E[s²]) ≤ min(E[l²], E[r²]) — so identical channels ride a
    silent side and anti-phase channels a silent mid, while independent
    channels stay L/R (the rotation would only spread their energy)."""
    el = float((left**2).mean())
    er = float((right**2).mean())
    mid = 0.5 * (left + right)
    side = 0.5 * (left - right)
    em = float((mid**2).mean())
    es = float((side**2).mean())
    use_ms = (el > 0.0 or er > 0.0) and 2.0 * min(em, es) <= min(el, er)
    c0, c1 = (mid, side) if use_ms else (left, right)

    a0 = _analyze(c0, quality)
    a1 = _analyze(c1, quality)
    max_sfb = max(_own_max_sfb(a0[4]), _own_max_sfb(a1[4]))
    w = _BitWriter()
    w.u(_ID_CPE, 3)
    w.u(0, 4)  # element_instance_tag
    w.u(1, 1)  # common_window
    _write_ics_info(w, max_sfb)
    w.u(2 if use_ms else 0, 2)  # ms_mask_present: all bands or none
    for gg, sf, q, neg, band_cb in (a0, a1):
        _write_ics(w, gg, sf, q, neg, band_cb, max_sfb, common_window=True)
    w.u(_ID_END, 3)
    while w._nbits:
        w.u(0, 1)  # byte-align the raw data block
    return w.getvalue()


def encode_aac(
    samples: np.ndarray, sample_rate: int = 32000, *, quality: int = 12
) -> bytes:
    """Encode mono ``(n,)`` or stereo ``(n, 2)`` PCM (float, [-1, 1]) as an
    ADTS AAC-LC stream (see the module doc for scope + documented
    deviations) — mono emits SCE raw data blocks (bit-identical to the
    mono-only codec), stereo emits CPE blocks with a shared ics_info and a
    per-frame M/S decision. ``quality`` targets the per-band quantized
    magnitude — higher = finer = larger frames (VBR: rate follows the
    signal, the ADTS frame-length field carries it).
    The default sits just under the in-codeword magnitude cap of 16, so
    pairs Huffman-code without escape sequences (~5-7 bits/sample at
    ~30 dB SNR); quality > ~20 shifts the stream escape-heavy, buying
    SNR at ~2x the rate.
    Frames cover 1024 new samples each with one leading+trailing flush
    frame, so ``decode_aac`` returns ``(n_frames - 1) * 1024`` samples;
    the first 1024 decoded samples align with the first 1024 inputs."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2 and x.shape[1] == 1:
        x = x[:, 0]
    if x.ndim not in (1, 2) or (x.ndim == 2 and x.shape[1] != 2):
        # ravel() here would silently interleave a multichannel layout
        # into one garbled mono stream — reject like Layer III
        raise ValueError("samples must be (n,) mono or (n, 2) stereo")
    if sample_rate not in SAMPLE_RATES:
        raise ValueError(f"sample_rate must be one of {SAMPLE_RATES}")
    if not len(x):
        raise ValueError("empty signal")
    if not np.isfinite(x).all():
        raise ValueError("samples must be finite (no NaN/inf)")
    if quality < 4:
        raise ValueError("quality must be >= 4")
    sr_index = SAMPLE_RATES.index(sample_rate)
    nch = 1 if x.ndim == 1 else 2
    n_blocks = -(-len(x) // FRAME_LEN)
    padded = np.zeros(((n_blocks + 2) * FRAME_LEN, nch) if nch == 2 else (n_blocks + 2) * FRAME_LEN)
    padded[FRAME_LEN : FRAME_LEN + len(x)] = x  # one block of leading flush
    out = bytearray()
    for i in range(n_blocks + 1):
        z = padded[i * FRAME_LEN : i * FRAME_LEN + _WIN_LEN]
        if nch == 1:
            body = _encode_frame(_mdct(z), quality)
        else:
            body = _encode_frame_pair(
                _mdct(z[:, 0]), _mdct(z[:, 1]), quality
            )
        out += _adts_header(7 + len(body), sr_index, channels=nch) + body
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _read_ics_info(r: _BitReader) -> int:
    """Parse ics_info, returning max_sfb; raises on out-of-scope tools."""
    if r.u(1):
        raise ValueError("ics_reserved_bit set")
    if r.u(2) != 0:
        raise ValueError("only ONLY_LONG_SEQUENCE windows are in scope")
    r.u(1)  # window_shape
    max_sfb = r.u(6)
    if max_sfb > len(sfb_layout()) - 1:
        raise ValueError("max_sfb exceeds the band layout")
    if r.u(1):
        raise ValueError("prediction is out of scope")
    return max_sfb


def _decode_ics(r: _BitReader, common_max_sfb: int | None = None) -> np.ndarray:
    """Parse one individual_channel_stream to dequantized MDCT lines.
    ``common_max_sfb`` is the CPE-hoisted shared ics_info; None means the
    stream carries its own (the SCE / common_window=0 layout)."""
    _pe, pd, _se, sd, pm, sm = _tables()
    edges = sfb_layout()
    gg = r.u(8)
    max_sfb = _read_ics_info(r) if common_max_sfb is None else common_max_sfb
    band_cb = []
    while len(band_cb) < max_sfb:
        cb = r.u(4)
        ln = 0
        while True:
            inc = r.u(5)
            ln += inc
            if inc != 31:
                break
        band_cb.extend([cb] * ln)
    if len(band_cb) != max_sfb:
        raise ValueError("section data does not tile max_sfb")
    sf = np.zeros(max_sfb, dtype=np.int64)
    last = gg
    for b in range(max_sfb):
        if band_cb[b] == _CB_ZERO:
            continue
        last = last + _read_code(r, sd, sm)
        sf[b] = gg - last  # back to the step-ladder offset
    for flag in ("pulse", "tns", "gain control"):
        if r.u(1):
            raise ValueError(f"{flag} data is out of scope")
    lines = np.zeros(FRAME_LEN)
    for b in range(max_sfb):
        cb = band_cb[b]
        if cb == _CB_ZERO:
            continue
        if cb != _CB_PAIR:
            raise ValueError(f"unknown spectral codebook {cb}")
        lo, hi = edges[b], edges[b + 1]
        step = 2.0 ** ((gg - int(sf[b]) - 210) / 4.0)
        for i in range(lo, hi, 2):
            ca, cc = _read_code(r, pd, pm)
            sa = r.u(1) if ca else 0
            sc = r.u(1) if cc else 0
            a = _read_escape(r) if ca == _ESC else ca
            c = _read_escape(r) if cc == _ESC else cc
            if a:
                lines[i] = (-1.0 if sa else 1.0) * a ** (4.0 / 3.0) * step
            if c:
                lines[i + 1] = (-1.0 if sc else 1.0) * c ** (4.0 / 3.0) * step
    return lines


def _decode_frame(body: bytes) -> np.ndarray:
    """One raw_data_block to dequantized MDCT lines, shape (nch, 1024):
    SCE → (1, 1024); CPE → (2, 1024) with the M/S mask unrotated back to
    L/R (l = m + s, r = m − s — the spec reconstruction for every masked
    band; mask 1 applies it per ms_used bit, mask 2 everywhere)."""
    r = _BitReader(body)
    ide = r.u(3)
    if ide == _ID_SCE:
        r.u(4)  # element_instance_tag
        out = _decode_ics(r)[None, :]
    elif ide == _ID_CPE:
        r.u(4)  # element_instance_tag
        ms_used: list[int] | None = None
        msp = 0
        if r.u(1):  # common_window
            max_sfb = _read_ics_info(r)
            msp = r.u(2)
            if msp == 3:
                raise ValueError("reserved ms_mask_present value 3")
            if msp == 1:
                ms_used = [r.u(1) for _ in range(max_sfb)]
            ch0 = _decode_ics(r, common_max_sfb=max_sfb)
            ch1 = _decode_ics(r, common_max_sfb=max_sfb)
        else:
            # independent windows: each ICS carries its own ics_info and
            # M/S is not signalled (the mask requires a common grid)
            ch0 = _decode_ics(r)
            ch1 = _decode_ics(r)
        if msp == 2:
            ch0, ch1 = ch0 + ch1, ch0 - ch1
        elif msp == 1:
            edges = sfb_layout()
            for b, used in enumerate(ms_used or []):
                if used:
                    lo, hi = edges[b], edges[b + 1]
                    m = ch0[lo:hi].copy()
                    ch0[lo:hi] = m + ch1[lo:hi]
                    ch1[lo:hi] = m - ch1[lo:hi]
        out = np.stack([ch0, ch1])
    else:
        raise ValueError(f"unsupported syntactic element id {ide}")
    if r.u(3) != _ID_END:
        raise ValueError("expected END element")
    return out


def decode_aac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an ADTS AAC-LC stream produced by :func:`encode_aac` to
    (PCM float array, sample_rate) — ``(n,)`` for mono streams (unchanged
    shape), ``(n, 2)`` for stereo CPE streams. Raises ``ValueError`` on
    malformed data or on (spec-valid) toolsets outside the declared scope
    — the multimodal feature path catches that and keeps its stub."""
    pos = 0
    sr = None
    nch = None
    prev = None
    chunks = []
    while pos + 7 <= len(payload):
        h = _parse_adts_header(payload, pos)
        if h is None or pos + h["frame_len"] > len(payload):
            if not chunks:
                raise ValueError("no ADTS frames")
            break
        if h["channels"] not in (1, 2) or h["profile"] != 2:
            raise ValueError("only mono/stereo AAC-LC is in scope")
        if nch is None:
            nch = h["channels"]
        elif h["channels"] != nch:
            raise ValueError("channel configuration changed mid-stream")
        sr = h["sample_rate"]
        body = payload[pos + h["header_len"] : pos + h["frame_len"]]
        lines = _decode_frame(body)
        if lines.shape[0] != nch:
            raise ValueError(
                "raw data block does not match the ADTS channel config"
            )
        y = np.stack([_imdct(ch) for ch in lines])  # (nch, 2048)
        if prev is not None:
            chunks.append(prev[:, FRAME_LEN:] + y[:, :FRAME_LEN])
        prev = y
        pos += h["frame_len"]
    if not chunks:
        raise ValueError("stream too short for TDAC overlap")
    out = np.concatenate(chunks, axis=1)
    return (out[0] if nch == 1 else out.T), int(sr)
