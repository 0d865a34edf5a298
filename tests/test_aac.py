"""AAC-LC (ADTS) codec: spec-exact framing/syntax checks, lossy round-trip
quality, escape-sequence coverage, out-of-scope rejection, sniffer
isolation from the MPEG-audio family, and the multimodal feature path."""

from __future__ import annotations

import numpy as np
import pytest

from nifi_dicom_spark.functions import aac
from nifi_dicom_spark.functions.mpeg_audio import roundtrip_snr_db


def _two_tone(n=5000, sr=32000, f1=440.0, f2=2500.0):
    t = np.arange(n) / sr
    return 0.4 * np.sin(2 * np.pi * f1 * t) + 0.2 * np.sin(2 * np.pi * f2 * t + 0.3)


def test_adts_layout_and_probe():
    x = _two_tone()
    bs = aac.encode_aac(x, 32000)
    # spec-exact fixed header fields, byte level
    assert bs[0] == 0xFF and (bs[1] & 0xF0) == 0xF0  # syncword
    assert (bs[1] & 0x06) == 0  # layer == 00
    assert bs[1] & 0x01  # protection_absent
    assert (bs[2] >> 6) == 1  # profile: AAC-LC (coded minus 1)
    assert ((bs[2] >> 2) & 0xF) == aac.SAMPLE_RATES.index(32000)
    meta = aac.parse_adts(bs)
    # 5000 samples -> 5 blocks + 1 flush frame
    assert meta == {
        "profile": 2,
        "sample_rate": 32000,
        "channels": 1,
        "n_frames": 6,
        "duration_s": 6 * 1024 / 32000,
    }
    # frame chain tiles the payload exactly
    pos, n = 0, 0
    while pos < len(bs):
        h = aac._parse_adts_header(bs, pos)
        pos += h["frame_len"]
        n += 1
    assert pos == len(bs) and n == 6


def test_roundtrip_quality_and_determinism():
    x = _two_tone()
    bs = aac.encode_aac(x, 32000)
    assert bs == aac.encode_aac(x, 32000)  # bit-deterministic
    y, sr = aac.decode_aac(bs)
    assert sr == 32000
    assert len(y) == 5 * 1024  # (n_frames - 1) * 1024, covers the input
    # default operating point: escape-free pairs, ~28 dB on dense tones
    assert roundtrip_snr_db(x, y[: len(x)]) > 25.0
    # finer quality strictly improves reconstruction
    y2, _ = aac.decode_aac(aac.encode_aac(x, 32000, quality=400))
    assert roundtrip_snr_db(x, y2[: len(x)]) > roundtrip_snr_db(x, y[: len(x)])
    # and actually compresses: well under 16-bit PCM at the default point
    assert len(bs) * 8 / len(x) < 10.0


def test_escape_sequences_cover_large_magnitudes():
    # quality 3000 pushes quantized magnitudes far past the in-codeword cap
    # of 16, so the spec escape path (N ones, zero, N+4-bit word) is the
    # hot path here — and must invert exactly
    x = _two_tone(3000)
    bs = aac.encode_aac(x, 32000, quality=3000)
    y, _ = aac.decode_aac(bs)
    assert roundtrip_snr_db(x, y[: len(x)]) > 55.0


def test_silence_and_impulse():
    z = np.zeros(1500)
    y, _ = aac.decode_aac(aac.encode_aac(z, 44100))
    assert float(np.abs(y).max()) == 0.0
    imp = np.zeros(2048)
    imp[100] = 0.9
    # an impulse is the flat-spectrum worst case for a per-band quantizer:
    # every band carries energy at the default in-book operating point
    y2, _ = aac.decode_aac(aac.encode_aac(imp, 48000))
    assert roundtrip_snr_db(imp, y2[: len(imp)]) > 25.0
    y3, _ = aac.decode_aac(aac.encode_aac(imp, 48000, quality=150))
    assert roundtrip_snr_db(imp, y3[: len(imp)]) > 45.0


def test_sfb_layout_invariants():
    edges = aac.sfb_layout()
    widths = edges[1:] - edges[:-1]
    assert edges[0] == 0 and edges[-1] == aac.FRAME_LEN
    assert (widths > 0).all() and (widths % 4 == 0).all()
    assert (np.diff(widths) >= 0).all()  # monotone growth like the spec tables


def test_out_of_scope_and_malformed_rejection():
    x = _two_tone(1500)
    bs = aac.encode_aac(x, 32000)
    # header says stereo but the raw data block is an SCE: the element/
    # channel-config cross-check must catch the mismatch
    stereo = bytearray(bs)
    stereo[2] = (stereo[2] & 0xFE) | 0x00
    stereo[3] = (stereo[3] & 0x3F) | 0x80  # channel_configuration 1 -> 2
    with pytest.raises(ValueError, match="channel config"):
        aac.decode_aac(bytes(stereo))
    # channel_configuration 3 (5.1-ish layouts onward): out of scope
    three = bytearray(bs)
    three[2] = (three[2] & 0xFE) | 0x00
    three[3] = (three[3] & 0x3F) | 0xC0  # channel_configuration 1 -> 3
    with pytest.raises(ValueError, match="mono/stereo"):
        aac.decode_aac(bytes(three))
    with pytest.raises(ValueError):
        aac.decode_aac(b"\x00" * 32)  # not ADTS at all
    with pytest.raises(ValueError):
        aac.decode_aac(bs[:6])  # shorter than one header
    with pytest.raises(ValueError):
        aac.encode_aac(x, 12345)  # non-table sample rate
    with pytest.raises(ValueError):
        aac.encode_aac(np.array([]), 32000)


def test_sniffer_isolation_from_mpeg_family():
    from nifi_dicom_spark.functions import mpeg_audio

    x = _two_tone(2000)
    adts = aac.encode_aac(x, 32000)
    l1 = mpeg_audio.encode_layer1(x[:1920], 32000, bits=6)
    l3 = mpeg_audio.encode_layer3(x[:2304], 32000)
    assert aac.is_aac(adts)
    # ADTS carries layer bits 00 (reserved in the MPEG-ES header), so the
    # MPEG sniffers must refuse it — and vice versa
    assert not mpeg_audio.is_layer1(adts)
    assert not mpeg_audio.is_layer2(adts)
    assert not mpeg_audio.is_layer3(adts)
    # mp3.is_mp3 is a deliberate resync SCANNER (junk-tolerant) and may
    # catch a spurious sync inside compressed payload bytes; the probe
    # dispatch checks is_aac first, so classification stays correct —
    # asserted in test_multimodal_feature_and_probe_paths
    assert not aac.is_aac(l1)
    assert not aac.is_aac(l3)
    assert not aac.is_aac(None)
    assert not aac.is_aac(b"")


# ---------------------------------------------------------------------------
# stereo (CPE + common_window + per-frame M/S)
# ---------------------------------------------------------------------------


def _stereo(n=5000, sr=32000):
    t = np.arange(n) / sr
    left = 0.4 * np.sin(2 * np.pi * 440.0 * t) + 0.2 * np.sin(2 * np.pi * 2500.0 * t)
    right = 0.35 * np.sin(2 * np.pi * 620.0 * t + 0.7) + 0.15 * np.sin(
        2 * np.pi * 1800.0 * t
    )
    return np.stack([left, right], axis=1)


def test_stereo_roundtrip_quality_and_framing():
    x = _stereo()
    bs = aac.encode_aac(x, 32000)
    assert bs == aac.encode_aac(x, 32000)  # bit-deterministic
    meta = aac.parse_adts(bs)
    assert meta["channels"] == 2 and meta["n_frames"] == 6
    y, sr = aac.decode_aac(bs)
    assert sr == 32000 and y.shape == (5 * 1024, 2)
    for ch in range(2):
        assert roundtrip_snr_db(x[:, ch], y[: len(x), ch]) > 25.0
    # finer quality strictly improves both channels
    y2, _ = aac.decode_aac(aac.encode_aac(x, 32000, quality=400))
    for ch in range(2):
        assert roundtrip_snr_db(x[:, ch], y2[: len(x), ch]) > roundtrip_snr_db(
            x[:, ch], y[: len(x), ch]
        )


def test_stereo_ms_decision_compresses_correlated_channels():
    mono = _two_tone()
    # identical channels: side is silent, M/S should approach the mono rate
    dual = np.stack([mono, mono], axis=1)
    bs_ms = aac.encode_aac(dual, 32000)
    bs_mono = aac.encode_aac(mono, 32000)
    # two *independent* channels cost ~2x mono; M/S on identical channels
    # must beat that clearly (side = silence = max_sfb 0)
    assert len(bs_ms) < 1.25 * len(bs_mono)
    y, _ = aac.decode_aac(bs_ms)
    for ch in range(2):
        assert roundtrip_snr_db(mono, y[: len(mono), ch]) > 25.0
    # anti-phase channels: mid is silent, same win through the side channel
    anti = np.stack([mono, -mono], axis=1)
    bs_anti = aac.encode_aac(anti, 32000)
    assert len(bs_anti) < 1.25 * len(bs_mono)
    y2, _ = aac.decode_aac(bs_anti)
    assert roundtrip_snr_db(mono, y2[: len(mono), 0]) > 25.0
    assert roundtrip_snr_db(-mono, y2[: len(mono), 1]) > 25.0
    # independent channels stay L/R (rotation would spread energy, not
    # concentrate it) and still round-trip fine
    ind = _stereo()
    y3, _ = aac.decode_aac(aac.encode_aac(ind, 32000))
    for ch in range(2):
        assert roundtrip_snr_db(ind[:, ch], y3[: len(ind), ch]) > 25.0


def test_stereo_edge_shapes_and_guards():
    mono = _two_tone(1500)
    # (n, 1) squeezes to mono: bit-identical to the 1-D encode
    assert aac.encode_aac(mono[:, None], 32000) == aac.encode_aac(mono, 32000)
    with pytest.raises(ValueError, match="mono or"):
        aac.encode_aac(np.zeros((64, 3)), 32000)  # 3 channels
    with pytest.raises(ValueError, match="mono or"):
        aac.encode_aac(np.zeros((4, 4, 4)), 32000)  # not a signal at all
    # stereo silence stays silent on both channels
    y, _ = aac.decode_aac(aac.encode_aac(np.zeros((1500, 2)), 44100))
    assert y.shape[1] == 2 and float(np.abs(y).max()) == 0.0
    # one silent channel: M/S concentrates everything in mid
    half = np.stack([mono, np.zeros_like(mono)], axis=1)
    y2, _ = aac.decode_aac(aac.encode_aac(half, 32000))
    assert roundtrip_snr_db(mono, y2[: len(mono), 0]) > 25.0
    assert float(np.abs(y2[: len(mono), 1]).max()) < 0.05
    # a channel-config change mid-stream is rejected
    bs_m = aac.encode_aac(mono, 32000)
    bs_s = aac.encode_aac(np.stack([mono, mono], axis=1), 32000)
    with pytest.raises(ValueError, match="changed mid-stream"):
        aac.decode_aac(bs_m + bs_s)


def test_stereo_per_band_ms_mask_decode_path():
    """The encoder emits ms_mask_present 0 or 2; the decoder also implements
    the spec's per-band mask 1. Exercise it by rewriting an all-M/S frame's
    mask bits to the equivalent explicit per-band form."""
    from nifi_dicom_spark.functions.h264 import _BitReader, _BitWriter

    mono = _two_tone(1024)
    bs = aac.encode_aac(np.stack([mono, mono], axis=1), 32000)
    ref, _ = aac.decode_aac(bs)
    out = bytearray()
    pos = 0
    while pos + 7 <= len(bs):
        h = aac._parse_adts_header(bs, pos)
        body = bs[pos + h["header_len"] : pos + h["frame_len"]]
        r = _BitReader(body)
        assert r.u(3) == 1  # CPE
        r.u(4)
        assert r.u(1) == 1  # common_window
        max_sfb = aac._read_ics_info(r)
        assert r.u(2) == 2  # encoder emitted the all-bands mask
        tail_bitpos = 3 + 4 + 1 + 11 + 2  # bits consumed so far
        w = _BitWriter()
        head = _BitReader(body)
        for _ in range(tail_bitpos - 2):
            w.u(head.u(1), 1)
        w.u(1, 2)  # ms_mask_present = 1
        for _ in range(max_sfb):
            w.u(1, 1)  # every band ms_used
        rest = _BitReader(body)
        rest.pos = tail_bitpos
        nbits = len(body) * 8 - tail_bitpos
        for _ in range(nbits):
            w.u(rest.u(1), 1)
        w.align_zero()  # re-establish the raw_data_block byte alignment
        nb = w.getvalue()
        out += aac._adts_header(7 + len(nb), aac.SAMPLE_RATES.index(32000), 2) + nb
        pos += h["frame_len"]
    y, sr = aac.decode_aac(bytes(out))
    assert sr == 32000
    assert np.allclose(y, ref)  # mask-1-everywhere == mask-2


def test_multimodal_feature_and_probe_paths():
    from nifi_dicom_spark.functions.codecs import audio_energy_features
    from nifi_dicom_spark.functions.multimodal import _decode_feature, probe_one

    x = _two_tone(3000)
    bs = aac.encode_aac(x, 32000)
    feat, w, h = _decode_feature(bs, dim=4)
    samples, _sr = aac.decode_aac(bs)
    assert w is None and h is None
    assert np.allclose(feat, audio_energy_features(samples, 4))
    p = probe_one(bs)
    assert p["format"] == "aac"
    assert p["codec"] == "aac-lc-p2"
    assert (p["sample_rate"], p["channels"], p["n_frames"]) == (32000, 1, 4)
    assert p["duration_ms"] == int(4 * 1024 / 32000 * 1000)
