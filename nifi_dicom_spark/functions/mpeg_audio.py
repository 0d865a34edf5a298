"""MPEG-1 Layer I subband audio codec — pure numpy, from scratch.

This closes the "compressed audio bitstream" gap left by
:mod:`nifi_dicom_spark.functions.mp3` (which parses frame headers but not
payloads): a complete encoder + decoder for MPEG-1 Audio Layer I, so the
multimodal feature path decodes compressed audio for REAL instead of the
sha-seeded stub.

What is faithful to ISO/IEC 11172-3 (all public-spec knowledge):

* the exact Layer I frame bit layout — 32-bit header, per-subband 4-bit
  allocation indices, 6-bit scalefactor indices, then 12 × 32 MSB-first
  sample codes;
* the scalefactor table (Table 3-B.1 is the closed form
  ``sf(i) = 2 * 2**(-i/3)``, i = 0..62);
* the Layer I mid-rise quantizer: ``2**nb - 1`` levels, offset-binary
  ("MSB-inverted two's complement") code words, dequant
  ``s'' = (2**nb / (2**nb - 1)) * (f + 2**(1-nb))``, the all-ones code
  excluded;
* the 32-band cosine-modulated filterbank structure: 512-tap prototype,
  32-sample hop, critically sampled (implemented in the direct/unfolded
  form — see the deviation note below).

One deliberate, documented deviation: the 512 prototype-window
coefficients (ISO Table 3-C.1) are *data*, not derivable from a formula,
and this repo embeds no copied tables it cannot re-derive. Instead the
filterbank is implemented in the canonical direct (unfolded) form of the
same cosine-modulated pseudo-QMF — modulation
``cos((2b+1)(π/64)(n − 255.5) + (−1)^b·π/4)``, synthesis = analysis
transpose — with a prototype designed from first principles
(Kaiser-windowed sinc; β and cutoff grid-searched offline for maximum
reconstruction SNR: β = 11.6, ω_c = 1.15·π/64, measured ≈ 56 dB
filterbank-only round-trip, comfortably under the ~45 dB 8-bit
quantization floor that dominates end-to-end). The ISO folded C/D-table
flow is an implementation optimization of exactly this structure (the
printed tables bake the (−1)^⌊n/64⌋ folding signs into the window).
Consequence: streams produced by this encoder decode bit-format-exactly
by any conformant tool, and this decoder reconstructs them to measured
>40 dB SNR; decoding *third-party* Layer I streams would carry a small
additional filterbank-mismatch error (the ISO decoder compliance test is
itself SNR-based, not bit-exact). Layer II/III spectral payloads remain
out of scope (see ``multimodal._fake_decode_feature``).

Vectorization: the analysis is ONE ``(blocks × 512) @ (512 × 32)``
matmul over a stride-tricks sliding window; the synthesis is one
``(blocks × 32) @ (32 × 512)`` matmul plus a 16-step strided
overlap-add. Bit packing is per-frame numpy (``np.unpackbits`` /
bit-matrix dots), no per-sample Python in the hot loops.

Reference analog: the reference decompresses encapsulated pixel/bulk
data on read via pixelmed codecs (``AttributeList.java:45,231``); this
module is the equivalent "decompress the payload, not just the headers"
capability for the audio kind of the media schema.
"""

from __future__ import annotations

import numpy as np

from nifi_dicom_spark.functions import mp3

N_BANDS = 32
TAPS = 512
HOP = 32
SAMPLES_PER_FRAME = 384  # Layer I: 12 subband samples x 32 bands
_GRANULES = 12

# Layer I valid bitrates (kbps) and MPEG-1 sample rates, from the public
# header tables already in mp3.py.
_LAYER1_BITRATES = mp3._BITRATES[(1, 1)][1:]  # drop the 'free' slot
_MPEG1_RATES = mp3._SAMPLE_RATES[3]

# Scalefactor table: ISO 11172-3 Table 3-B.1 in closed form.
SCALEFACTORS = 2.0 * np.power(2.0, -np.arange(63) / 3.0)


def _design_prototype() -> np.ndarray:
    """512-tap near-PR pseudo-QMF prototype: Kaiser-windowed sinc.
    β = 11.6 and cutoff 1.15·π/64 are the offline grid-search optimum for
    round-trip reconstruction SNR of the matched (transpose-synthesis)
    filterbank on this length/band-count (≈ 56 dB on white noise).
    Deterministic — no randomness, no external data."""
    n = np.arange(TAPS, dtype=np.float64)
    c = (TAPS - 1) / 2.0
    wc = 1.15 * np.pi / (2.0 * N_BANDS)
    x = n - c
    h = np.where(x == 0.0, wc / np.pi, np.sin(wc * x) / (np.pi * np.where(x == 0, 1, x)))
    h *= np.kaiser(TAPS, 11.6)
    # unit DC gain of the prototype lowpass
    return h / h.sum()


_PROTO = _design_prototype()

# Analysis matrix A[n, b] = h[n]·cos((2b+1)(π/64)(n − 255.5) + (−1)^b·π/4):
# subband samples for one block are  window(512, newest-last) @ A -> (32,).
# The (−1)^b·π/4 phase is what cancels the dominant alias between adjacent
# bands (classic pseudo-QMF); synthesis uses the SAME filters time-reversed,
# which for this matrix form is simply the transpose.
_N = np.arange(TAPS, dtype=np.float64)[:, None]
_B = np.arange(N_BANDS, dtype=np.float64)[None, :]
_THETA = (np.power(-1.0, np.arange(N_BANDS)) * np.pi / 4)[None, :]
_ANALYSIS = (
    _PROTO[:, None]
    * np.cos((2 * _B + 1) * (np.pi / (2 * N_BANDS)) * (_N - (TAPS - 1) / 2.0) + _THETA)
).astype(np.float64)
_SYNTHESIS = _ANALYSIS.T.copy()

# cascade delay of analysis+synthesis (peak-correlation lag; window center
# 255.5 minus the 31.5-sample hop offset on each side -> 480)
_DELAY = TAPS - HOP


def _calibrate_gain() -> float:
    """Measure the analysis→synthesis passband gain on a deterministic
    probe and return the scalar that makes the cascade unity-gain
    (≈ 1/128 = 1/4M for this normalization). Runs once at import; pure
    numpy, ~1 ms."""
    rng = np.random.default_rng(12345)
    x = rng.standard_normal(8192)
    s = analyze(x)
    y = synthesize(s, gain=1.0)
    a = x[: len(x) - _DELAY]
    b = y[_DELAY : len(x)]
    return float(np.dot(a, b) / np.dot(b, b))


def analyze(x: np.ndarray) -> np.ndarray:
    """Analysis filterbank: mono float signal -> (n_blocks, 32) subband
    samples, one block per 32 input samples (zero history priming)."""
    x = np.asarray(x, dtype=np.float64)
    pad = (-len(x)) % HOP
    if pad:
        x = np.concatenate([x, np.zeros(pad)])
    # prime with TAPS-HOP zeros of history so block t sees x[: 32(t+1)]
    xp = np.concatenate([np.zeros(TAPS - HOP), x])
    n_blocks = len(x) // HOP
    sw = np.lib.stride_tricks.sliding_window_view(xp, TAPS)[::HOP][:n_blocks]
    # the copy pays for itself: BLAS's fast GEMM path needs contiguous
    # input, and the strided view otherwise routes through a ~7x slower
    # fallback (measured 1.56 ms vs 0.22 ms on a 75x512 block matrix)
    return np.ascontiguousarray(sw) @ _ANALYSIS


def synthesize(s: np.ndarray, gain: float | None = None) -> np.ndarray:
    """Synthesis filterbank: (n_blocks, 32) -> mono float signal of
    length 32*n_blocks + 480 (tail included; cascade delay 480)."""
    s = np.asarray(s, dtype=np.float64)
    if gain is None:
        gain = _GAIN
    contrib = (s @ _SYNTHESIS) * gain  # (n_blocks, 512)
    t = contrib.shape[0]
    out = np.zeros(HOP * (t - 1) + TAPS if t else 0)
    c = contrib.reshape(t, TAPS // HOP, HOP)
    for k in range(TAPS // HOP):  # 16-step strided overlap-add
        out[HOP * k : HOP * (k + t)].reshape(t, HOP)[:] += c[:, k, :]
    return out


_GAIN = _calibrate_gain()


# ---------------------------------------------------------------------------
# Layer I quantizer (ISO 2.4.3.3.1, offset-binary code words)
# ---------------------------------------------------------------------------


def _quantize(y: np.ndarray, nb: int) -> np.ndarray:
    """Normalized samples y in [-1, 1] -> nb-bit code words (uint32).
    Offset binary; the all-ones pattern (forbidden by the spec) is never
    emitted: 2**nb - 1 usable levels."""
    half = 1 << (nb - 1)
    a_inv = (2**nb - 1) / float(2**nb)
    f = y * a_inv - 2.0 ** (1 - nb)
    cp = np.rint(f * half).astype(np.int64)
    cp = np.clip(cp, -half, half - 2)  # half-1 would encode the forbidden code
    return (cp + half).astype(np.uint32)


def _dequantize(code: np.ndarray, nb: int) -> np.ndarray:
    half = 1 << (nb - 1)
    f = (code.astype(np.float64) - half) / half
    return (2**nb / (2**nb - 1.0)) * (f + 2.0 ** (1 - nb))


# ---------------------------------------------------------------------------
# Bit packing — MSB-first, numpy per frame
# ---------------------------------------------------------------------------


def _pack_bits(values: np.ndarray, widths: np.ndarray) -> bytes:
    """Concatenate each values[i] as widths[i] MSB-first bits; pad the
    final byte with zero bits."""
    values = np.asarray(values, dtype=np.uint64)
    widths = np.asarray(widths, dtype=np.int64)
    total = int(widths.sum())
    ends = np.cumsum(widths)
    starts = ends - widths
    # bit positions are consecutive; per-bit shift counts down within each field
    offsets = np.arange(total) - np.repeat(starts, widths)
    shifts = (np.repeat(widths, widths) - 1 - offsets).astype(np.uint64)
    bits = ((np.repeat(values, widths) >> shifts) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(bits).tobytes()


class _BitReader:
    """MSB-first reader over a frame body; bulk reads are vectorized."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self._pos = 0

    def take(self, n: int, width: int) -> np.ndarray:
        """Read n consecutive width-bit fields as uint32."""
        end = self._pos + n * width
        if end > len(self._bits):
            raise ValueError("Layer I frame body truncated")
        chunk = self._bits[self._pos : end].reshape(n, width).astype(np.uint32)
        self._pos = end
        w = (1 << np.arange(width - 1, -1, -1)).astype(np.uint32)
        return chunk @ w


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _frame_slots(bitrate_kbps: int, sample_rate: int) -> int:
    """Layer I frame length in bytes (no padding): slots of 4 bytes."""
    return (12 * bitrate_kbps * 1000 // sample_rate) * 4


def encode_layer1(
    samples: np.ndarray,
    sample_rate: int = 32000,
    *,
    bits: int = 8,
    coded_bands: int = 30,
) -> bytes:
    """Encode PCM (float, [-1, 1]; shape (n,) mono or (n, 2) stereo) as an
    MPEG-1 Layer I CBR stream.

    ``bits`` is the uniform allocation given to subbands 0..coded_bands-1
    of every channel (a fixed allocation is a legal encoder choice —
    psychoacoustics only ever changes WHICH allocation is written). The
    smallest standard bitrate whose frame fits the payload is selected;
    spare bits are zero-padded, as the spec allows (ancillary data
    region). Field order is the ISO one: allocations by (subband,
    channel), scalefactors by (subband, channel), then sample codes by
    (granule, subband, channel).
    """
    if sample_rate not in _MPEG1_RATES:
        raise ValueError(f"sample_rate must be one of {_MPEG1_RATES}")
    if not 2 <= bits <= 15:
        raise ValueError("Layer I allocations are 2..15 bits")
    if not 1 <= coded_bands <= N_BANDS:
        raise ValueError("coded_bands must be 1..32")
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] not in (1, 2):
        raise ValueError("samples must be (n,) mono or (n, 1|2) channels")
    nch = x.shape[1]
    # flush: the filterbank cascade needs _DELAY future samples to finish
    # reconstructing the tail, so append that much silence before framing
    # (the standard encoder-delay/padding behavior of MPEG encoders)
    x = np.concatenate([x, np.zeros((_DELAY, nch))])
    pad = (-x.shape[0]) % SAMPLES_PER_FRAME
    if pad:
        x = np.concatenate([x, np.zeros((pad, nch))])
    n_frames = x.shape[0] // SAMPLES_PER_FRAME
    if n_frames == 0:
        raise ValueError("need at least one frame of samples")

    # (n_frames, 12, 32, nch)
    sub = np.stack(
        [analyze(x[:, ch]).reshape(n_frames, _GRANULES, N_BANDS) for ch in range(nch)],
        axis=-1,
    )

    # payload bits: alloc (32x4xch) + scf (6 per coded band per ch) + samples
    need_bits = 32 + nch * (
        N_BANDS * 4 + coded_bands * 6 + coded_bands * _GRANULES * bits
    )
    need_bytes = (need_bits + 7) // 8
    rate = next(
        (r for r in _LAYER1_BITRATES if _frame_slots(r, sample_rate) >= need_bytes),
        None,
    )
    if rate is None:
        raise ValueError(
            f"payload ({need_bytes} B) exceeds the largest Layer I frame at "
            f"{sample_rate} Hz; lower bits/coded_bands"
        )
    frame_len = _frame_slots(rate, sample_rate)

    br_idx = mp3._BR_INDEX[(1, 1)][rate]
    sr_idx = mp3._SR_INDEX[3][sample_rate]
    header = bytes(
        [
            0xFF,
            0xFF,  # sync + MPEG-1 + Layer I + no CRC
            (br_idx << 4) | (sr_idx << 2),
            ((3 if nch == 1 else 0) << 6),  # mono / stereo
        ]
    )

    alloc_field = np.zeros((N_BANDS, nch), dtype=np.uint64)
    alloc_field[:coded_bands, :] = bits - 1  # index = nb - 1 (Layer I rule)
    widths = np.concatenate(
        [
            np.full(N_BANDS * nch, 4, dtype=np.int64),
            np.full(coded_bands * nch, 6, dtype=np.int64),
            np.full(coded_bands * _GRANULES * nch, bits, dtype=np.int64),
        ]
    )

    frames = []
    for fi in range(n_frames):
        s = sub[fi][:, :coded_bands, :]  # (12, coded_bands, nch)
        peak = np.abs(s).max(axis=0)  # (coded_bands, nch)
        # smallest table scalefactor >= peak: table is descending
        scf_idx = (
            np.searchsorted(-SCALEFACTORS, -np.maximum(peak, 1e-12), side="right") - 1
        )
        scf_idx = np.clip(scf_idx, 0, 62).astype(np.uint64)
        scf = SCALEFACTORS[scf_idx]
        codes = _quantize(s / scf[None, :, :], bits)

        values = np.concatenate(
            [
                alloc_field.reshape(-1),
                scf_idx.reshape(-1),
                codes.reshape(-1).astype(np.uint64),
            ]
        )
        body = _pack_bits(values, widths)
        frame = header + body
        frames.append(frame + b"\x00" * (frame_len - len(frame)))
    return b"".join(frames)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_layer1(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an MPEG-1 Layer I stream (mono, stereo or dual-channel;
    2-channel audio is downmixed to mono to match ``codecs.decode_wav``'s
    contract). Returns (float64 samples, sample_rate). Uses the existing
    frame scanner for sync/ID3 handling, then entropy-decodes each
    payload. CRC-protected frames skip the 2-byte CRC word (the checksum
    itself is not verified). Joint-stereo frames are rejected: their
    shared-allocation intensity bands need ``mode_extension`` handling
    this decoder does not implement, and misparsing them would produce
    silent garbage. The last ≤480 returned samples of a stream without
    encoder flush padding are a partial (attenuated-tail) reconstruction
    — streams from :func:`encode_layer1` carry the flush, so their
    original-signal region is always fully reconstructed."""
    frames = mp3.frame_table(payload)
    if not frames:
        raise ValueError("no MPEG frames found")
    first = mp3._parse_header(payload, frames[0].offset)
    if first is None or first.layer != 1 or first.version != "1":
        raise ValueError("not an MPEG-1 Layer I stream")
    if first.mode == "joint_stereo":
        raise ValueError("joint-stereo Layer I (intensity bands) unsupported")
    nch = first.channels
    sr = first.sample_rate

    per_frame = []
    for fr in frames:
        h = mp3._parse_header(payload, fr.offset)
        if h is None or h.layer != 1:
            continue
        skip = 4 + (2 if h.has_crc else 0)  # header + optional CRC word
        body = payload[fr.offset + skip : fr.offset + fr.size]
        r = _BitReader(body)
        alloc = r.take(N_BANDS * nch, 4).reshape(N_BANDS, nch)
        if (alloc == 15).any():
            raise ValueError("forbidden Layer I allocation index 15")
        nb = np.where(alloc > 0, alloc + 1, 0)
        scf = np.zeros((N_BANDS, nch))
        coded = np.argwhere(alloc > 0)
        # scalefactor fields are always 6 bits and contiguous in coded
        # (subband, channel) order — one vectorized take for all of them
        if len(coded):
            idxs = r.take(len(coded), 6)
            if (idxs > 62).any():
                raise ValueError("forbidden scalefactor index 63")
            scf[coded[:, 0], coded[:, 1]] = SCALEFACTORS[idxs]
        sub = np.zeros((_GRANULES, N_BANDS, nch))
        # sample order: s=0..11, sb=0..31, ch. When every coded (sb, ch)
        # shares one width (any fixed-allocation encoder, incl. ours) the
        # whole sample block is one contiguous run of equal-width fields —
        # read it in a single vectorized take and scatter.
        nz = nb[alloc > 0]
        if len(nz) and (nz == nz[0]).all():
            w = int(nz[0])
            codes = r.take(_GRANULES * len(coded), w).reshape(_GRANULES, len(coded))
            vals = _dequantize(codes, w) * scf[coded[:, 0], coded[:, 1]][None, :]
            sub[:, coded[:, 0], coded[:, 1]] = vals
        else:
            for g in range(_GRANULES):
                for sb, ch in coded:
                    w = int(nb[sb, ch])
                    code = r.take(1, w)
                    sub[g, sb, ch] = _dequantize(code, w)[0] * scf[sb, ch]
        per_frame.append(sub)

    allsub = np.concatenate(per_frame, axis=0)  # (12*F, 32, nch)
    mono_sub = allsub.mean(axis=2) if nch > 1 else allsub[:, :, 0]
    out = synthesize(mono_sub)
    # trim the cascade delay so sample 0 aligns with encoder input 0;
    # return the full frame content (one sample per subband slot). The
    # tail's final ≤_DELAY samples are partially reconstructed — for
    # flush-padded streams (ours) that region is the appended silence, and
    # for third-party streams truncating it would LOSE real audio, so it
    # is returned as-is (documented above).
    n = allsub.shape[0] * HOP
    return out[_DELAY : _DELAY + n], sr


def is_layer1(payload: bytes | None) -> bool:
    """True when the payload STARTS with an MPEG-1 Layer I frame header
    (after an optional ID3v2 tag). Deliberately anchored at offset 0 — no
    resync scan — so this dispatch gate is O(1) on the hot feature path
    and can never steal a BMP/PNG/JPEG payload whose compressed bytes
    happen to contain a sync pattern somewhere in the first 2 KB (the
    ``mp3.is_mp3`` scan is the right tool for *probing*, not for
    *dispatch*). Decoding still tolerates mid-stream junk via
    ``frame_table``'s resync once a stream is positively identified."""
    if not payload or len(payload) < 4:
        return False
    try:
        h = mp3._parse_header(payload, mp3._id3v2_len(payload))
    except Exception:
        return False
    return h is not None and h.layer == 1 and h.version == "1"


def roundtrip_snr_db(x: np.ndarray, y: np.ndarray) -> float:
    """SNR of reconstruction y against reference x (aligned, same length
    convention as decode_layer1's output)."""
    n = min(len(x), len(y))
    a, b = np.asarray(x[:n], dtype=np.float64), np.asarray(y[:n], dtype=np.float64)
    err = a - b
    p = float(np.dot(a, a))
    e = float(np.dot(err, err))
    if e == 0:
        return float("inf")
    return 10.0 * np.log10(p / e) if p > 0 else float("-inf")


__all__ = [
    "SCALEFACTORS",
    "analyze",
    "synthesize",
    "encode_layer1",
    "decode_layer1",
    "is_layer1",
    "roundtrip_snr_db",
]