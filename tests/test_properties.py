"""Property-based tests (hypothesis) for the engine's core correctness
claims. The reference pins behavior with a handful of golden tests
(SURVEY §5); these generalize the two load-bearing invariants:

1. **Delivery-order invariance** — the LWW total order (op_seq, offset) makes
   the final state a pure function of the event SET, not the delivery order.
2. **Batch-split invariance** — any partition of the log into epochs applied
   sequentially equals the single-batch apply (cross-batch LWW-max is
   associative), which is what makes crash/replay/rebatching safe.

The heavy search runs against the pure-pandas oracle (fast); Spark replay is
spot-checked on a bounded number of generated cases.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from nifi_dicom_spark.fixtures.generator import GeneratorConfig, generate_change_events
from nifi_dicom_spark.fixtures.oracle import assert_final_state_equal, replay_oracle


def _log(seed: int, n: int, malformed: float = 0.05) -> pd.DataFrame:
    return generate_change_events(
        GeneratorConfig(
            seed=seed,
            n_conversations=6,
            max_turns=4,
            n_events=n,
            duplicate_ratio=0.15,
            late_ratio=0.25,
            malformed_ratio=malformed,
            schema_change_at=n // 3,
        )
    )


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), perm_seed=st.integers(0, 10_000))
def test_oracle_delivery_order_invariance(seed: int, perm_seed: int):
    log = _log(seed, 300)
    rng = np.random.default_rng(perm_seed)
    shuffled = log.iloc[rng.permutation(len(log))].reset_index(drop=True)
    a = replay_oracle(log).reset_index(drop=True)
    b = replay_oracle(shuffled).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    seed=st.integers(0, 10_000),
    frac=st.floats(0.0, 1.0),
    perm_seed=st.integers(0, 10_000),
)
def test_oracle_redelivery_invariance(seed: int, frac: float, perm_seed: int):
    """At-least-once delivery: re-appending any random subset of already-
    delivered events (then shuffling) leaves the final state unchanged —
    duplicates carry identical (op_seq, offset) and lose every LWW tie."""
    log = _log(seed, 300)
    dups = log.sample(frac=frac, random_state=perm_seed)
    redelivered = pd.concat([log, dups], ignore_index=True)
    rng = np.random.default_rng(perm_seed)
    redelivered = redelivered.iloc[rng.permutation(len(redelivered))]
    a = replay_oracle(log).reset_index(drop=True)
    b = replay_oracle(redelivered).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 5_000),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(seed: int, n: int, rate: int):
    """encode∘decode is identity up to 16-bit quantization for ANY mono
    signal in [-1, 1]."""
    from nifi_dicom_spark.functions.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    sig = rng.uniform(-1, 1, size=n).astype(np.float32)
    back, sr = decode_wav(encode_wav(sig, rate))
    assert sr == rate and len(back) == n
    assert float(np.abs(back - sig).max()) <= 1.5 / 32768


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    h=st.integers(1, 40),
    w=st.integers(1, 40),
)
def test_bmp_roundtrip_property(seed: int, h: int, w: int):
    """encode∘decode is exact identity for ANY rgb8 image, including widths
    that exercise every 4-byte row-padding remainder."""
    from nifi_dicom_spark.functions.codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    h=st.integers(1, 32),
    w=st.integers(1, 32),
)
def test_png_roundtrip_property(seed: int, h: int, w: int):
    """encode∘decode is exact identity for ANY rgb8 image (zlib is
    lossless; filter-0 scanlines reverse trivially)."""
    from nifi_dicom_spark.functions.codecs import decode_png, encode_png, is_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = encode_png(img)
    assert is_png(payload)
    assert (decode_png(payload) == img).all()


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    h=st.integers(2, 24),
    w=st.integers(2, 24),
    filt=st.integers(0, 4),
)
def test_png_decode_reverses_every_filter(seed: int, h: int, w: int, filt: int):
    """Hand-filter scanlines with each of the five PNG filters (forward
    transform implemented independently here, per spec §9) and assert the
    decoder's unfiltering recovers the original image exactly."""
    import struct
    import zlib

    from nifi_dicom_spark.functions.codecs import _paeth, _png_chunk, decode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    flat = img.reshape(h, w * 3).astype(np.int32)
    bpp, stride = 3, w * 3
    out = bytearray()
    for y in range(h):
        row, prior = flat[y], (flat[y - 1] if y else np.zeros(stride, np.int32))
        f = np.zeros(stride, np.int32)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            pred = {
                0: 0,
                1: a,
                2: b,
                3: (a + b) >> 1,
                4: _paeth(int(a), int(b), int(c)),
            }[filt]
            f[x] = (row[x] - pred) & 0xFF
        out.append(filt)
        out.extend(f.astype(np.uint8).tobytes())
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        sig
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == img).all()


def test_png_color_types_and_unsupported_variants():
    """Gray/palette/gray-alpha/RGBA decode to the expected RGB expansion;
    16-bit and interlaced PNGs raise (→ stub fallback in multimodal)."""
    import struct
    import zlib

    import pytest

    from nifi_dicom_spark.functions.codecs import _png_chunk, decode_png

    sig = b"\x89PNG\r\n\x1a\n"

    def build(w, h, depth, color, raw, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
        return (
            sig
            + _png_chunk(b"IHDR", ihdr)
            + extra
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # gray 2x2 → replicated channels
    g = build(2, 2, 8, 0, bytes([0, 10, 20, 0, 30, 40]))
    assert decode_png(g).tolist() == [
        [[10] * 3, [20] * 3], [[30] * 3, [40] * 3]
    ]
    # palette 2x1
    plte = _png_chunk(b"PLTE", bytes([255, 0, 0, 0, 0, 255]))
    p = build(2, 1, 8, 3, bytes([0, 0, 1]), extra=plte)
    assert decode_png(p).tolist() == [[[255, 0, 0], [0, 0, 255]]]
    # RGBA 1x1 → alpha dropped
    a = build(1, 1, 8, 6, bytes([0, 9, 8, 7, 128]))
    assert decode_png(a).tolist() == [[[9, 8, 7]]]
    # gray+alpha 1x1
    ga = build(1, 1, 8, 4, bytes([0, 55, 200]))
    assert decode_png(ga).tolist() == [[[55, 55, 55]]]
    # 16-bit depth and interlaced: declared unsupported
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(build(1, 1, 16, 0, bytes([0, 0, 1])))
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    bad = sig + _png_chunk(b"IHDR", ihdr_i) + _png_chunk(
        b"IDAT", zlib.compress(bytes([0, 1]))
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bad)


def test_spark_replay_split_invariance_spot_checks(spark, tmp_path):
    """Spark end-to-end: for a few generated logs, applying the log in k
    random epochs equals the oracle (cross-batch LWW-max associativity on
    the real merge path)."""
    from nifi_dicom_spark.model import CHANGE_EVENTS_SCHEMA
    from nifi_dicom_spark.operators.apply import (
        apply_changes,
        create_transcripts_table,
        read_final_state,
    )

    for case, (seed, k) in enumerate([(101, 3), (202, 1), (303, 5)]):
        log = _log(seed, 600)
        rng = np.random.default_rng(seed)
        table = create_transcripts_table(
            spark, str(tmp_path / f"t{case}"), n_buckets=8
        )
        chunks = np.array_split(rng.permutation(len(log)), k)
        for epoch, idx in enumerate(chunks):
            batch = spark.createDataFrame(
                log.iloc[np.sort(idx)], schema=CHANGE_EVENTS_SCHEMA
            )
            apply_changes(table, batch, epoch=epoch)
        assert_final_state_equal(
            read_final_state(table).toPandas(), replay_oracle(log)
        )


@settings(max_examples=50, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(0, 40),
    spc=st.integers(1, 7),
    timescale=st.integers(1, 90_000),
    dur=st.integers(0, 3_000),
)
def test_mp4_sample_table_roundtrip_property(
    seed: int, n: int, spc: int, timescale: int, dur: int
):
    """mux∘demux is byte-exact for ANY sample list: every (offset, size)
    the stsc×stco×stsz join resolves slices back the original access unit,
    and decode timestamps are the running stts sum — across every
    samples-per-chunk grouping including short last chunks and n=0."""
    from nifi_dicom_spark.functions import mp4

    rng = np.random.default_rng(seed)
    samples = [rng.bytes(int(rng.integers(1, 64))) for _ in range(n)]
    payload = mp4.mux_mp4(
        samples,
        width=16,
        height=16,
        timescale=timescale,
        sample_duration=dur,
        samples_per_chunk=spc,
    )
    meta = mp4.parse_mp4(payload)
    assert meta["tracks"][0]["n_samples"] == n
    table = mp4.sample_table(payload)
    assert len(table) == n
    for i, s in enumerate(table):
        assert s.index == i
        assert mp4.extract_sample(payload, s) == samples[i]
        assert s.pts == i * dur and s.dt == dur
    # deterministic writer (oracle/replay contract)
    assert (
        mp4.mux_mp4(
            samples, width=16, height=16, timescale=timescale,
            sample_duration=dur, samples_per_chunk=spc,
        )
        == payload
    )


@settings(max_examples=50, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 30),
    br=st.sampled_from([32, 64, 96, 128, 192, 320]),
    sr=st.sampled_from([32000, 44100, 48000]),
    mono=st.booleans(),
    id3_len=st.integers(0, 64),
    xing=st.booleans(),
)
def test_mp3_frame_table_roundtrip_property(
    seed: int, n: int, br: int, sr: int, mono: bool, id3_len: int, xing: bool
):
    """write∘parse recovers frame count, layout and stream parameters for
    ANY valid MPEG-1 Layer III configuration, with or without ID3v2 and
    Xing, and the frame table chains byte-exactly."""
    from nifi_dicom_spark.functions import mp3

    rng = np.random.default_rng(seed)
    payload = mp3.write_mp3(
        n,
        bitrate_kbps=br,
        sample_rate=sr,
        channels=1 if mono else 2,
        seed=rng.bytes(8),
        id3=rng.bytes(id3_len) if id3_len else None,
        xing=xing,
    )
    assert mp3.is_mp3(payload)
    m = mp3.parse_mp3(payload)
    assert m["n_frames"] == n
    assert m["sample_rate"] == sr and m["channels"] == (1 if mono else 2)
    assert m["bitrate_kbps"] == float(br) and not m["is_vbr"]
    assert m["xing_frames"] == (n if xing else None)
    expect_len = 1152 // 8 * br * 1000 // sr
    table = mp3.frame_table(payload)
    start = m["id3_bytes"]
    for i, fr in enumerate(table):
        assert fr.offset == start + i * expect_len and fr.size == expect_len
    assert m["duration_s"] == sum(f.duration_s for f in table)


@settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    seed=st.integers(0, 2**31 - 1),
    bits=st.integers(2, 10),
    n_cols=st.integers(2, 3),
)
def test_zvalue_matches_python_morton_reference(spark, seed, bits, n_cols):
    """The built-in-expression Morton interleave is bit-exact against a
    Python reference over random values spanning negatives, zeros and a
    wide magnitude range (one Spark job per example, 200 rows each)."""
    from nifi_dicom_spark.lake.zorder import zvalue_column

    rng = np.random.default_rng(seed)
    n = 200
    cols = [f"c{i}" for i in range(n_cols)]
    data = {c: rng.integers(-(2**40), 2**40, size=n) for c in cols}
    pdf = pd.DataFrame(data)
    df = spark.createDataFrame(pdf)
    got = (
        zvalue_column(df, cols, bits=bits)
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )

    # reference: equi-width bins over [lo, hi] then MSB-first interleave
    nbins = 1 << bits
    bins = {}
    for c in cols:
        lo, hi = float(pdf[c].min()), float(pdf[c].max())
        if lo == hi:
            bins[c] = np.zeros(n, dtype=np.int64)
            continue
        # width_bucket(v, lo, hi, nbins): 1..nbins inside, nbins+1 at max
        wb = np.floor((pdf[c].to_numpy(float) - lo) / (hi - lo) * nbins) + 1
        bins[c] = np.clip(wb - 1, 0, nbins - 1).astype(np.int64)

    def morton(row_idx):
        z = 0
        for b in range(bits - 1, -1, -1):
            for c in cols:
                z = (z << 1) | ((int(bins[c][row_idx]) >> b) & 1)
        return z

    ref = pdf.copy()
    ref["_zorder"] = [morton(i) for i in range(n)]
    ref = ref.sort_values(cols).reset_index(drop=True)
    mismatch = (got["_zorder"] != ref["_zorder"]).sum()
    # float rounding at exact bin edges may flip a bin by one — allow a
    # tiny tolerance on edge collisions, none elsewhere
    assert mismatch <= n // 50, f"{mismatch} z-value mismatches"


@given(
    seed=st.integers(0, 10_000),
    levels=st.sampled_from([3, 5, 9]),
)
@settings(max_examples=40, deadline=None)
def test_layer2_grouped_quantizer_error_bound(seed: int, levels: int):
    """Mid-tread grouped quantizer: dequant(quant(y)) stays within half a
    step (1/(levels-1)) of y for y in [-1, 1], and the grouped base-L
    code split/join is an exact bijection."""
    from nifi_dicom_spark.functions import mpeg_audio as ma

    rng = np.random.default_rng(seed)
    y = rng.uniform(-1, 1, 3 * 50)
    q = ma._quantize_grouped(y, levels)
    assert q.min() >= 0 and q.max() <= levels - 1
    back = ma._dequantize_grouped(q, levels)
    assert np.abs(back - y).max() <= 1.0 / (levels - 1) + 1e-12
    # base-L triplet grouping is exact
    tri = q.reshape(-1, 3)
    code = tri[:, 0] + levels * tri[:, 1] + levels * levels * tri[:, 2]
    assert (code < levels**3).all()
    split = np.stack([code % levels, (code // levels) % levels, code // levels**2], 1)
    assert (split == tri).all()


@given(seed=st.integers(0, 10_000), n=st.integers(1, 300))
@settings(max_examples=40, deadline=None)
def test_pack_bits_take_var_roundtrip_property(seed: int, n: int):
    """_take_var is the exact inverse of _pack_bits for any width mix in
    the Layer II range (2..16 bits)."""
    from nifi_dicom_spark.functions import mpeg_audio as ma

    rng = np.random.default_rng(seed)
    widths = rng.integers(2, 17, size=n)
    values = np.array([int(rng.integers(0, 1 << w)) for w in widths], dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(ma._pack_bits(values, widths.astype(np.int64)), np.uint8)
    )
    got, pos = ma._take_var(bits, 0, widths.astype(np.int64))
    assert pos == int(widths.sum()) and (got == values).all()


@given(
    seed=st.integers(0, 10_000),
    levels=st.sampled_from([5, 9, 15, 63, 255]),
    nch=st.sampled_from([1, 2]),
    sr=st.sampled_from([32000, 44100, 48000]),
)
@settings(max_examples=15, deadline=None)
@example(seed=8248, levels=5, nch=1, sr=44100)  # r4 regression: class-0 3-level fallback
def test_layer2_roundtrip_property(seed: int, levels: int, nch: int, sr: int):
    """Any bandlimited signal x encodes to a parseable legal-header stream
    that decodes with bounded error. The envelope must be derived from the
    EFFECTIVE allocation, not the requested ``levels``: band classes offer
    different quantizer menus (class 0 = bands 0-2 has no 5-level entry,
    so levels=5 encodes the signal band with the 3-level quantizer whose
    half-step is 2/(3-1), not 2/(5-1)). Verified r5: the decode matches an
    independent scalar reference of the per-band quantize/dequantize
    pipeline bit-exactly (test_layer2_matches_scalar_reference), so any
    residual error here is quantizer envelope + filterbank leakage, not a
    bitstream defect."""
    from nifi_dicom_spark.functions import mp3, mpeg_audio as ma

    rng = np.random.default_rng(seed)
    n = 1152 * int(rng.integers(1, 3))
    t = np.arange(n) / sr
    x = 0.6 * np.sin(2 * np.pi * rng.uniform(100, 2000) * t) * np.linspace(
        rng.uniform(0.1, 1), 1, n
    )
    sig = np.stack([x, 0.5 * x], 1) if nch == 2 else x
    try:
        enc = ma.encode_layer2(sig, sr, levels=levels)
    except ValueError as e:
        # legal outcome: full-sblimit high-resolution allocations can
        # exceed the largest LEGAL frame for the channel mode (mono caps
        # at 192 kbps, stereo needs ~2x the bits of mono) — the encoder
        # must say so, never emit an illegal header
        assert "exceeds the largest Layer II frame" in str(e)
        assert levels >= 63 and sr > 32000
        return
    h = mp3._parse_header(enc, 0)
    assert h.layer == 2 and h.samples == 1152 and h.channels == nch
    assert h.bitrate_kbps not in (32, 48, 56, 80) or nch == 1
    assert h.bitrate_kbps < 224 or nch == 2
    dec, out_sr = ma.decode_layer2(enc)
    assert out_sr == sr
    ref = sig.mean(axis=1) if nch == 2 else sig
    m = min(len(ref), len(dec))
    err = np.abs(dec[:m] - ref[:m]).max()
    # envelope from the coarsest quantizer actually in the allocation:
    # scalefactors overshoot the band peak by up to 2^(1/3), leakage across
    # adjacent bands sums half-steps — 0.35 absorbs both (measured ceiling
    # ~0.61 for the pinned example vs bound 1.16)
    min_eff = min(
        l for l in ma.effective_levels(levels) if l is not None
    )
    assert err < max(np.abs(ref).max(), 1e-6) * (
        2.0 / min(min_eff - 1, 62) + 0.35
    ), f"err {err} exceeds effective-{min_eff}-level envelope"


@given(
    seed=st.integers(0, 10_000),
    quality=st.sampled_from([300, 800, 1500, 4000]),
    sr=st.sampled_from([32000, 44100, 48000]),
)
@settings(max_examples=12, deadline=None)
def test_layer3_roundtrip_snr_property(seed: int, quality: int, sr: int):
    """Any bandlimited signal survives the full Layer III spectral chain
    (MDCT -> 4/3-law quantization -> Huffman -> IMDCT/TDAC -> synthesis)
    with SNR > 30 dB at quality >= 300, through a legal mono MPEG-1
    Layer III header (empirical worst over the strategy space: ~45 dB —
    the 15 dB margin absorbs filterbank leakage on unlucky tones)."""
    from nifi_dicom_spark.functions import mp3, mpeg_audio as ma

    rng = np.random.default_rng(seed)
    n = 1152 * int(rng.integers(1, 3))
    t = np.arange(n) / sr
    x = 0.6 * np.sin(2 * np.pi * rng.uniform(100, 3000) * t) * np.linspace(
        rng.uniform(0.1, 1), 1, n
    )
    enc = ma.encode_layer3(x, sr, quality=quality)
    h = mp3._parse_header(enc, 0)
    assert h.layer == 3 and h.version == "1" and h.channels == 1
    assert h.samples == 1152 and h.sample_rate == sr
    dec, out_sr = ma.decode_layer3(enc)
    assert out_sr == sr and len(dec) % 576 == 0
    assert ma.roundtrip_snr_db(x, dec[:n]) > 30


@given(
    seed=st.integers(0, 10_000),
    quality=st.sampled_from([300, 1500]),
    sr=st.sampled_from([32000, 44100, 48000]),
    correlation=st.sampled_from(["independent", "identical", "antiphase", "mixed"]),
)
@settings(max_examples=16, deadline=None)
def test_layer3_stereo_roundtrip_snr_property(
    seed: int, quality: int, sr: int, correlation: str
):
    """Stereo Layer III: whatever channel correlation the signal has, the
    per-frame joint-stereo (M/S) decision must stay transparent — both
    channels reconstruct above the same SNR envelope as mono, whichever
    mode each frame was coded in (the decoder un-rotates masked frames
    with the spec's (m±s)/sqrt(2) reconstruction)."""
    from nifi_dicom_spark.functions import mp3, mpeg_audio as ma

    rng = np.random.default_rng(seed)
    n = 1152 * int(rng.integers(1, 3))
    t = np.arange(n) / sr

    def tone():
        return 0.5 * np.sin(2 * np.pi * rng.uniform(100, 3000) * t) * np.linspace(
            rng.uniform(0.1, 1), 1, n
        )

    left = tone()
    if correlation == "identical":
        right = left.copy()
    elif correlation == "antiphase":
        right = -left
    elif correlation == "mixed":
        right = 0.7 * left + 0.3 * tone()
    else:
        right = tone()
    x = np.stack([left, right], axis=1)
    enc = ma.encode_layer3(x, sr, quality=quality)
    assert enc == ma.encode_layer3(x, sr, quality=quality)
    h = mp3._parse_header(enc, 0)
    assert h.layer == 3 and h.channels == 2 and h.sample_rate == sr
    dec, out_sr = ma.decode_layer3(enc)
    assert out_sr == sr and dec.shape[1] == 2 and dec.shape[0] % 576 == 0
    assert ma.roundtrip_snr_db(left, dec[:n, 0]) > 28
    assert ma.roundtrip_snr_db(right, dec[:n, 1]) > 28


@given(
    seed=st.integers(0, 10_000),
    levels=st.sampled_from([5, 9, 15, 63]),
    sr=st.sampled_from([32000, 44100, 48000]),
)
@settings(max_examples=10, deadline=None)
@example(seed=8248, levels=5, sr=44100)
def test_layer2_matches_scalar_reference(seed: int, levels: int, sr: int):
    """Zero-tolerance bitstream oracle: decode(encode(x)) must equal an
    independent SCALAR reference of the documented pipeline — per-(band,
    part) peak -> smallest scalefactor >= peak -> effective-class quantize/
    dequantize -> synthesis — to 1e-12. Catches any allocation, scfsi,
    scalefactor-order, field-order, or grouping defect that an inf-norm
    envelope (test above) cannot see."""
    from nifi_dicom_spark.functions import mpeg_audio as ma2

    rng = np.random.default_rng(seed)
    n = 1152 * int(rng.integers(1, 3))
    t = np.arange(n) / sr
    x = 0.6 * np.sin(2 * np.pi * rng.uniform(100, 2000) * t) * np.linspace(
        rng.uniform(0.1, 1), 1, n
    )
    try:
        enc = ma2.encode_layer2(x, sr, levels=levels)
    except ValueError:
        return  # legal frame-budget rejection, covered by the test above
    dec, _ = ma2.decode_layer2(enc)

    eff = ma2.effective_levels(levels)
    x2 = np.concatenate([x, np.zeros(ma2._DELAY)])
    x2 = np.concatenate([x2, np.zeros((-len(x2)) % 1152)])
    sub = ma2.analyze(x2).reshape(-1, 36, ma2.N_BANDS)
    deq = np.zeros_like(sub)
    scf_tab = ma2.SCALEFACTORS
    for fi in range(sub.shape[0]):
        for sb, L in enumerate(eff):
            if L is None:
                continue
            for part in range(3):
                seg = sub[fi, part * 12 : (part + 1) * 12, sb]
                peak = max(np.abs(seg).max(), 1e-12)
                ix = int(
                    np.clip(
                        np.searchsorted(-scf_tab, -peak, side="right") - 1, 0, 62
                    )
                )
                scf = scf_tab[ix]
                if L in ma2._GROUP_BITS:
                    q = ma2._quantize_grouped(seg / scf, L)
                    back = ma2._dequantize_grouped(q, L)
                else:
                    nb = int(L + 1).bit_length() - 1
                    back = ma2._dequantize(ma2._quantize(seg / scf, nb), nb)
                deq[fi, part * 12 : (part + 1) * 12, sb] = back * scf
    ref = ma2.synthesize(deq.reshape(-1, ma2.N_BANDS))[ma2._DELAY : ma2._DELAY + n]
    m = min(len(dec), len(ref))
    assert np.abs(dec[:m] - ref[:m]).max() < 1e-12


# --- H.264 baseline-intra (I_PCM) lossless property --------------------------


@given(
    seed=st.integers(0, 10_000),
    w=st.integers(1, 20),
    h=st.integers(1, 12),
    n=st.integers(1, 3),
)
@settings(max_examples=30, deadline=None)
def test_h264_ipcm_roundtrip_property(seed: int, w: int, h: int, n: int):
    """I_PCM macroblocks are the spec's raw-sample mode: for ANY frame
    content (including pathological zero runs that force emulation-
    prevention escapes) and ANY even geometry, encode→decode returns
    bit-identical 4:2:0 planes, and the header-only probe agrees with the
    deep decode on dims and frame count."""
    from nifi_dicom_spark.functions import h264

    rng = np.random.default_rng(seed)
    lw, lh = 2 * w, 2 * h  # any even luma geometry, 2x2 .. 40x24
    yuvs = []
    for i in range(n):
        if i == 0 and seed % 3 == 0:
            y = np.zeros((lh, lw), np.uint8)  # worst case for escaping
        else:
            y = rng.integers(0, 256, (lh, lw), dtype=np.uint8)
        cb = rng.integers(0, 256, (h, w), dtype=np.uint8)
        cr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        yuvs.append((y, cb, cr))
    bs = h264.encode_h264_yuv(yuvs)
    assert h264.is_annexb(bs)
    info = h264.parse_h264(bs)
    assert (info["width"], info["height"], info["n_frames"]) == (lw, lh, n)
    out = h264.decode_h264_yuv(bs)
    assert len(out) == n
    for (y0, cb0, cr0), (y1, cb1, cr1) in zip(yuvs, out):
        assert np.array_equal(y0, y1)
        assert np.array_equal(cb0, cb1)
        assert np.array_equal(cr0, cr1)


# --- H.264 CAVLC I_16x16 lossy-fidelity property ------------------------------


@given(
    seed=st.integers(0, 10_000),
    w=st.integers(1, 3),
    h=st.integers(1, 2),
    qp=st.integers(0, 51),
    mb_types=st.sampled_from(("i16", "i4", "auto")),
)
@settings(max_examples=25, deadline=None)
def test_h264_cavlc_roundtrip_property(
    seed: int, w: int, h: int, qp: int, mb_types: str
):
    """For ANY frame content and QP, the CAVLC I_16x16 codec reconstructs
    within a quantizer-proportional fidelity bound. PSNR (not inf-norm —
    the Layer II lesson: per-band half-step errors can pile up at one
    sample) against the quantizer floor: uniform-noise content bottoms
    out near 10*log10(255^2/(step^2/12)), and the bound keeps ~8 dB of
    slack below that. A catastrophic decode (wrong reconstruction level,
    broken prediction neighbor, table drift) lands tens of dB under it."""
    from nifi_dicom_spark.functions import h264

    rng = np.random.default_rng(seed)
    lw, lh = 16 * w, 16 * h
    y = rng.integers(0, 256, (lh, lw), dtype=np.uint8)
    if seed % 4 == 0:  # smooth content exercises DC/plane paths + cbp=0
        ys, xs = np.mgrid[0:lh, 0:lw]
        y = np.clip(120 + 3 * xs + 2 * ys, 0, 255).astype(np.uint8)
    cb = rng.integers(0, 256, (lh // 2, lw // 2), dtype=np.uint8)
    cr = rng.integers(0, 256, (lh // 2, lw // 2), dtype=np.uint8)
    bs = h264.encode_h264_yuv([(y, cb, cr)], qp=qp, mb_types=mb_types)
    y1, cb1, cr1 = h264.decode_h264_yuv(bs)[0]
    if qp == 0:
        assert int(np.abs(y.astype(int) - y1.astype(int)).max()) <= 2
    mse = float(np.mean((y.astype(np.float64) - y1.astype(np.float64)) ** 2))
    psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
    assert psnr >= 44.0 - 0.8 * qp, f"qp={qp}: Y PSNR {psnr:.1f}"
    cmse = float(np.mean((cb.astype(np.float64) - cb1.astype(np.float64)) ** 2))
    cpsnr = 99.0 if cmse == 0 else 10 * np.log10(255.0**2 / cmse)
    # chroma QP saturates at 39 (table 8-15), so its floor is flat past qp~45
    assert cpsnr >= 44.0 - 0.8 * min(qp, 45), f"qp={qp}: Cb PSNR {cpsnr:.1f}"


# --- AAC-LC round-trip quality property ---------------------------------------


@given(
    seed=st.integers(0, 10_000),
    n=st.integers(64, 4000),
    sr_idx=st.integers(0, 11),
    quality=st.sampled_from([30, 60, 150, 400]),
)
@settings(max_examples=20, deadline=None)
def test_aac_roundtrip_snr_property(seed: int, n: int, sr_idx: int, quality: int):
    """For ANY band-limited signal, length, table sample rate and quality
    tier, the AAC encode→decode trip must (a) parse back frame-exactly,
    (b) reconstruct with SNR above a generous envelope (the per-band
    scalefactors keep quantization error proportional to band energy —
    an SNR bound, deliberately not an inf-norm one), and (c) be
    bit-deterministic."""
    from nifi_dicom_spark.functions import aac
    from nifi_dicom_spark.functions.mpeg_audio import roundtrip_snr_db

    rng = np.random.default_rng(seed)
    sr = aac.SAMPLE_RATES[sr_idx]
    t = np.arange(n) / sr
    x = np.zeros(n)
    for _ in range(rng.integers(1, 4)):
        f = rng.uniform(50.0, 0.35 * sr)
        x += rng.uniform(0.05, 0.3) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
    bs = aac.encode_aac(x, sr, quality=quality)
    assert bs == aac.encode_aac(x, sr, quality=quality)
    meta = aac.parse_adts(bs)
    n_blocks = -(-n // aac.FRAME_LEN)
    assert meta["n_frames"] == n_blocks + 1
    assert meta["sample_rate"] == sr
    y, sr2 = aac.decode_aac(bs)
    assert sr2 == sr and len(y) == n_blocks * aac.FRAME_LEN
    assert roundtrip_snr_db(x, y[:n]) > 22.0


@given(
    seed=st.integers(0, 10_000),
    n=st.integers(64, 4000),
    sr_idx=st.integers(0, 11),
    quality=st.sampled_from([30, 150]),
    correlation=st.sampled_from(["independent", "identical", "antiphase", "mixed"]),
)
@settings(max_examples=20, deadline=None)
def test_aac_stereo_roundtrip_snr_property(
    seed: int, n: int, sr_idx: int, quality: int, correlation: str
):
    """Stereo CPE round-trip: for ANY channel correlation structure the
    per-frame M/S decision must stay transparent — both channels come back
    above the same SNR envelope as mono, whichever mask the encoder picked
    (identical → silent side, antiphase → silent mid, independent → L/R)."""
    from nifi_dicom_spark.functions import aac
    from nifi_dicom_spark.functions.mpeg_audio import roundtrip_snr_db

    rng = np.random.default_rng(seed)
    sr = aac.SAMPLE_RATES[sr_idx]
    t = np.arange(n) / sr

    def tone():
        x = np.zeros(n)
        for _ in range(rng.integers(1, 4)):
            f = rng.uniform(50.0, 0.35 * sr)
            x += rng.uniform(0.05, 0.3) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 6.28)
            )
        return x

    left = tone()
    if correlation == "identical":
        right = left.copy()
    elif correlation == "antiphase":
        right = -left
    elif correlation == "mixed":
        right = 0.7 * left + 0.3 * tone()
    else:
        right = tone()
    x = np.stack([left, right], axis=1)
    bs = aac.encode_aac(x, sr, quality=quality)
    assert bs == aac.encode_aac(x, sr, quality=quality)
    meta = aac.parse_adts(bs)
    n_blocks = -(-n // aac.FRAME_LEN)
    assert meta["channels"] == 2 and meta["n_frames"] == n_blocks + 1
    y, sr2 = aac.decode_aac(bs)
    assert sr2 == sr and y.shape == (n_blocks * aac.FRAME_LEN, 2)
    assert roundtrip_snr_db(left, y[:n, 0]) > 22.0
    assert roundtrip_snr_db(right, y[:n, 1]) > 22.0
