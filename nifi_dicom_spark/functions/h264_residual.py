"""H.264 I_16x16 residual layer: transforms, quantization, intra
prediction and CAVLC block coding for :mod:`nifi_dicom_spark.functions.h264`.

What is spec-EXACT here (ITU-T H.264 / ISO 14496-10, public spec):

* The normative inverse 4x4 core transform (8.5.12.3 butterflies with
  arithmetic ``>>1``), AC scaling (8.5.12.2, flat scaling lists — the
  ``d = c * V[qP%6] << (qP/6)`` identity), the 4x4 luma-DC inverse
  Hadamard + scaling (8.5.10 incl. the low-QP rounding branch), the 2x2
  chroma-DC transform + scaling (8.5.11), and the chroma-QP mapping
  (table 8-15).
* Intra_16x16 luma prediction, all four modes V/H/DC/Plane (8.3.3) and
  intra chroma prediction DC/H/V/Plane incl. the per-4x4-block DC
  neighbor selection rules (8.3.4).
* The 4x4 zig-zag scan (table 8-13) and the CAVLC *structure* (9.2):
  coeff_token(TotalCoeff, TrailingOnes) with the four nC context
  buckets, trailing-one sign bits, the full level prefix/suffix
  algorithm with adaptive suffixLength (9.2.2.1-2, incl. the
  ``level_prefix==14``/``>=15``/``>=16`` escapes and the ``+2`` first-level
  adjustment), total_zeros, run_before with the zerosLeft clamp, and the
  neighbor-based nC derivation (9.2.1: ``(nA+nB+1)>>1``, I_PCM counts 16).
* The nC >= 8 coeff_token code: the spec's 6-bit fixed-length form
  ``((TotalCoeff-1)<<2)|TrailingOnes`` with ``000011`` for zero coeffs.

Documented deviation, same embed-or-derive policy as the AAC / Layer III
codecs (`aac.py`, `mpeg_audio.py`): the printed VLC code-word TABLES
(9-5 coeff_token for nC < 8, 9-7/9-8 total_zeros, 9-9 chroma-DC
total_zeros, 9-10 run_before) are non-derivable table data, so they are
engine-canonical — deterministic canonical Huffman codes built from
fixed frequency models shaped like the spec's code-length profiles.
Encoder and decoder derive identical tables, so engine streams are
exactly self-consistent; third-party CAVLC streams would not, which is
why :mod:`.h264` gates entropy-coded slice decode on an SEI marker and
keeps the declared-stub fallback for foreign streams.

Reference analog: decompress-on-read of encapsulated compressed pixel
data (``apps/DeidentifyAndRedact.java:271``,
``AttributeList.setDecompressPixelData``).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ZIGZAG",
    "blk_xy",
    "chroma_qp",
    "recon_luma_mb",
    "recon_chroma_mb",
    "scan_block",
    "unscan_block",
    "fdct4",
    "quant4",
    "dequant4",
    "idct4",
    "quant_luma_dc",
    "dequant_luma_dc",
    "quant_chroma_dc",
    "dequant_chroma_dc",
    "pred_luma16",
    "pred_chroma8",
    "cavlc_encode_block",
    "cavlc_decode_block",
    "nc_from_neighbors",
]

# 4x4 zig-zag scan (table 8-13) as flat row-major indices
ZIGZAG = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])

# quant multipliers MF and dequant scales V per qP%6, by position group
# (group 0: corners of the even lattice, group 1: odd lattice, group 2: rest)
_MF = [
    (13107, 5243, 8066),
    (11916, 4660, 7490),
    (10082, 4194, 6554),
    (9362, 3647, 5825),
    (8192, 3355, 5243),
    (7282, 2893, 4559),
]
_V = [
    (10, 16, 13),
    (11, 18, 14),
    (13, 20, 16),
    (14, 23, 18),
    (16, 25, 20),
    (18, 29, 23),
]
_GRP = np.array(
    [[0, 2, 0, 2], [2, 1, 2, 1], [0, 2, 0, 2], [2, 1, 2, 1]], dtype=np.int64
)
_MF_MAT = [np.array([[_MF[m][g] for g in row] for row in _GRP], np.int64) for m in range(6)]
_V_MAT = [np.array([[_V[m][g] for g in row] for row in _GRP], np.int64) for m in range(6)]

# chroma QP from clipped qPi (table 8-15)
_QPC = list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39]

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]], np.int64)
_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]], np.int64)
_H2 = np.array([[1, 1], [1, -1]], np.int64)


def chroma_qp(qp_y: int, offset: int = 0) -> int:
    """QPc from QPy + chroma_qp_index_offset (8.4.4.5 / table 8-15)."""
    return _QPC[max(0, min(51, qp_y + offset))]


# --------------------------------------------------------------------------
# transforms + (de)quantization
# --------------------------------------------------------------------------


def fdct4(x: np.ndarray) -> np.ndarray:
    """Forward 4x4 integer core transform (encoder side, non-normative)."""
    return _CF @ x.astype(np.int64) @ _CF.T


def quant4(w: np.ndarray, qp: int) -> np.ndarray:
    """Intra quantization Z = sign(W)*((|W|*MF + f) >> qbits), f = 2^qbits/3."""
    m, k = qp % 6, qp // 6
    qbits = 15 + k
    f = (1 << qbits) // 3
    return np.sign(w) * ((np.abs(w) * _MF_MAT[m] + f) >> qbits)


def dequant4(c: np.ndarray, qp: int) -> np.ndarray:
    """Normative AC scaling (8.5.12.2 with flat lists): c*V[qP%6] << qP/6.
    Exactly equal to the spec's LevelScale4x4 form for every qP — the
    spec's 16x weightScale cancels against its extra ``-4`` shift."""
    m, k = qp % 6, qp // 6
    return (c.astype(np.int64) * _V_MAT[m]) << k


def _bf(a0, a1, a2, a3):
    e0 = a0 + a2
    e1 = a0 - a2
    e2 = (a1 >> 1) - a3
    e3 = a1 + (a3 >> 1)
    return e0 + e3, e1 + e2, e1 - e2, e0 - e3


def idct4(d: np.ndarray) -> np.ndarray:
    """Normative inverse core transform (8.5.12.3): horizontal butterflies,
    vertical butterflies, then (x+32)>>6 — arithmetic shifts throughout."""
    d = d.astype(np.int64)
    c0, c1, c2, c3 = _bf(d[:, 0], d[:, 1], d[:, 2], d[:, 3])
    f = np.stack([c0, c1, c2, c3], axis=1)
    r0, r1, r2, r3 = _bf(f[0], f[1], f[2], f[3])
    return (np.stack([r0, r1, r2, r3], axis=0) + 32) >> 6


def quant_luma_dc(wdc: np.ndarray, qp: int) -> np.ndarray:
    """Encoder-side I_16x16 luma DC: forward Hadamard /2, then quantize
    with MF(0,0) at qbits+1 (the standard encoder recipe — non-normative,
    round-trip-verified against the normative dequant below)."""
    y = (_H4 @ wdc.astype(np.int64) @ _H4) >> 1
    m, k = qp % 6, qp // 6
    qbits = 16 + k
    f = (1 << qbits) // 3
    return np.sign(y) * ((np.abs(y) * _MF[m][0] + f) >> qbits)


def dequant_luma_dc(c: np.ndarray, qp: int) -> np.ndarray:
    """Normative luma DC scaling (8.5.10): inverse Hadamard, then scale
    with the low-QP rounding branch."""
    f = _H4 @ c.astype(np.int64) @ _H4
    m, k = qp % 6, qp // 6
    t = f * _V[m][0]
    if k >= 2:
        return t << (k - 2)
    return (t + (1 << (1 - k))) >> (2 - k)


def quant_chroma_dc(wdc: np.ndarray, qp: int) -> np.ndarray:
    """Encoder-side 2x2 chroma DC quantization (non-normative)."""
    y = _H2 @ wdc.astype(np.int64) @ _H2
    m, k = qp % 6, qp // 6
    qbits = 16 + k
    f = (1 << qbits) // 3
    return np.sign(y) * ((np.abs(y) * _MF[m][0] + f) >> qbits)


def dequant_chroma_dc(c: np.ndarray, qp: int) -> np.ndarray:
    """Normative chroma DC scaling for 4:2:0 (8.5.11):
    ((f * 16*V0) << qP/6) >> 5 == ((f*V0) << qP/6) >> 1."""
    f = _H2 @ c.astype(np.int64) @ _H2
    m, k = qp % 6, qp // 6
    return ((f * _V[m][0]) << k) >> 1


# --------------------------------------------------------------------------
# intra prediction (8.3.3 / 8.3.4)
# --------------------------------------------------------------------------


def _clip8(a: np.ndarray) -> np.ndarray:
    return np.clip(a, 0, 255)


def pred_luma16(mode: int, top, left, corner) -> np.ndarray:
    """Intra_16x16 prediction (8.3.3). ``top``/``left`` are length-16 int
    arrays of reconstructed neighbors or None when unavailable; ``corner``
    is the top-left sample (needed by Plane). Returns int64 (16,16)."""
    if mode == 0:  # Vertical
        if top is None:
            raise ValueError("Intra_16x16_Vertical needs the top neighbor")
        return np.tile(top.astype(np.int64), (16, 1))
    if mode == 1:  # Horizontal
        if left is None:
            raise ValueError("Intra_16x16_Horizontal needs the left neighbor")
        return np.tile(left.astype(np.int64)[:, None], (1, 16))
    if mode == 2:  # DC
        if top is not None and left is not None:
            dc = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif top is not None:
            dc = (int(top.sum()) + 8) >> 4
        elif left is not None:
            dc = (int(left.sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, np.int64)
    if mode == 3:  # Plane
        if top is None or left is None or corner is None:
            raise ValueError("Intra_16x16_Plane needs both neighbors")
        t = top.astype(np.int64)
        l = left.astype(np.int64)
        q = int(corner)
        h = sum((i + 1) * (int(t[8 + i]) - (int(t[6 - i]) if 6 - i >= 0 else q)) for i in range(8))
        v = sum((i + 1) * (int(l[8 + i]) - (int(l[6 - i]) if 6 - i >= 0 else q)) for i in range(8))
        a = 16 * (int(l[15]) + int(t[15]))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        xs = np.arange(16, dtype=np.int64)
        return _clip8((a + b * (xs[None, :] - 7) + c * (xs[:, None] - 7) + 16) >> 5)
    raise ValueError(f"invalid Intra_16x16 prediction mode {mode}")


def pred_chroma8(mode: int, top, left, corner) -> np.ndarray:
    """Intra chroma prediction for one 8x8 plane (8.3.4); mode numbering
    0=DC, 1=Horizontal, 2=Vertical, 3=Plane (table 7-16)."""
    if mode == 0:  # DC, per 4x4 sub-block with the spec's neighbor choice
        out = np.empty((8, 8), np.int64)
        for yo in (0, 4):
            for xo in (0, 4):
                t4 = top[xo : xo + 4].astype(np.int64) if top is not None else None
                l4 = left[yo : yo + 4].astype(np.int64) if left is not None else None
                if xo == yo:  # (0,0) and (4,4): both when available
                    if t4 is not None and l4 is not None:
                        dc = (int(t4.sum()) + int(l4.sum()) + 4) >> 3
                    elif t4 is not None:
                        dc = (int(t4.sum()) + 2) >> 2
                    elif l4 is not None:
                        dc = (int(l4.sum()) + 2) >> 2
                    else:
                        dc = 128
                elif xo > yo:  # (4,0): prefer top
                    if t4 is not None:
                        dc = (int(t4.sum()) + 2) >> 2
                    elif l4 is not None:
                        dc = (int(l4.sum()) + 2) >> 2
                    else:
                        dc = 128
                else:  # (0,4): prefer left
                    if l4 is not None:
                        dc = (int(l4.sum()) + 2) >> 2
                    elif t4 is not None:
                        dc = (int(t4.sum()) + 2) >> 2
                    else:
                        dc = 128
                out[yo : yo + 4, xo : xo + 4] = dc
        return out
    if mode == 1:  # Horizontal
        if left is None:
            raise ValueError("Intra_Chroma_Horizontal needs the left neighbor")
        return np.tile(left.astype(np.int64)[:, None], (1, 8))
    if mode == 2:  # Vertical
        if top is None:
            raise ValueError("Intra_Chroma_Vertical needs the top neighbor")
        return np.tile(top.astype(np.int64), (8, 1))
    if mode == 3:  # Plane
        if top is None or left is None or corner is None:
            raise ValueError("Intra_Chroma_Plane needs both neighbors")
        t = top.astype(np.int64)
        l = left.astype(np.int64)
        q = int(corner)
        h = sum((i + 1) * (int(t[4 + i]) - (int(t[2 - i]) if 2 - i >= 0 else q)) for i in range(4))
        v = sum((i + 1) * (int(l[4 + i]) - (int(l[2 - i]) if 2 - i >= 0 else q)) for i in range(4))
        a = 16 * (int(l[7]) + int(t[7]))
        b = (17 * h + 16) >> 5
        c = (17 * v + 16) >> 5
        xs = np.arange(8, dtype=np.int64)
        return _clip8((a + b * (xs[None, :] - 3) + c * (xs[:, None] - 3) + 16) >> 5)
    raise ValueError(f"invalid intra chroma prediction mode {mode}")


# --------------------------------------------------------------------------
# CAVLC tables (engine-canonical; see module docstring)
# --------------------------------------------------------------------------

_TABLES: dict | None = None


def _build_tables() -> dict:
    from nifi_dicom_spark.functions.mpeg_audio import _canonical_huffman

    def pack(enc: dict) -> tuple[dict, dict, int]:
        dec = {(ln, code): s for s, (code, ln) in enc.items()}
        return enc, dec, max(ln for _, ln in enc.values())

    # coeff_token contexts: weights shaped like the spec's length profile
    # (short codes for few coefficients in the low-nC bucket, flattening as
    # nC grows; TrailingOnes==min(tc,3) cheapest)
    def ct_syms():
        return [(tc, t1) for tc in range(17) for t1 in range(min(tc, 3) + 1)]

    ct0 = _canonical_huffman([((tc, t1), 1 << (40 - 2 * tc + t1)) for tc, t1 in ct_syms()])
    ct1 = _canonical_huffman([((tc, t1), 1 << (40 - tc + t1)) for tc, t1 in ct_syms()])
    ct2 = _canonical_huffman(
        [((tc, t1), 1 << (40 - (tc + 1) // 2 + t1)) for tc, t1 in ct_syms()]
    )
    cdc = _canonical_huffman(
        [((tc, t1), 1 << (12 - 3 * tc + t1)) for tc in range(5) for t1 in range(min(tc, 3) + 1)]
    )
    # total_zeros per TotalCoeff: small counts cheap
    tz_luma = {
        tc: pack(_canonical_huffman([(z, 1 << (16 - z)) for z in range(16 - tc + 1)]))
        for tc in range(1, 16)
    }
    tz_cdc = {
        tc: pack(_canonical_huffman([(z, 1 << (4 - z)) for z in range(4 - tc + 1)]))
        for tc in range(1, 4)
    }
    # run_before per min(zerosLeft, 7): short runs cheap
    runs = {
        zl: pack(
            _canonical_huffman(
                [(rn, 1 << (15 - rn)) for rn in range(min(zl if zl < 7 else 14, 14) + 1)]
            )
        )
        for zl in range(1, 8)
    }
    return {
        "ct": [pack(ct0), pack(ct1), pack(ct2)],
        "cdc": pack(cdc),
        "tz_luma": tz_luma,
        "tz_cdc": tz_cdc,
        "runs": runs,
    }


def _tables() -> dict:
    global _TABLES
    if _TABLES is None:
        _TABLES = _build_tables()
    return _TABLES


def _read_vlc(r, dec: dict, maxlen: int, what: str):
    code = 0
    for ln in range(1, maxlen + 1):
        code = (code << 1) | r.u(1)
        s = dec.get((ln, code))
        if s is not None:
            return s
    raise ValueError(f"invalid CAVLC {what} code")


def nc_from_neighbors(na, nb) -> int:
    """9.2.1: nC from neighbor TotalCoeffs; None = unavailable."""
    if na is not None and nb is not None:
        return (na + nb + 1) >> 1
    if na is not None:
        return na
    if nb is not None:
        return nb
    return 0


def _ct_write(w, nc: int, tc: int, t1: int) -> None:
    t = _tables()
    if nc == -1:
        code, ln = t["cdc"][0][(tc, t1)]
    elif nc >= 8:  # spec 6-bit FLC
        code, ln = (3 if tc == 0 else ((tc - 1) << 2) | t1), 6
    else:
        ctx = 0 if nc < 2 else (1 if nc < 4 else 2)
        code, ln = t["ct"][ctx][0][(tc, t1)]
    w.u(code, ln)


def _ct_read(r, nc: int) -> tuple[int, int]:
    t = _tables()
    if nc == -1:
        enc, dec, maxlen = t["cdc"]
        return _read_vlc(r, dec, maxlen, "coeff_token")
    if nc >= 8:
        v = r.u(6)
        if v == 3:
            return 0, 0
        tc, t1 = (v >> 2) + 1, v & 3
        if t1 > min(tc, 3):
            raise ValueError("invalid CAVLC coeff_token code")
        return tc, t1
    ctx = 0 if nc < 2 else (1 if nc < 4 else 2)
    enc, dec, maxlen = t["ct"][ctx]
    return _read_vlc(r, dec, maxlen, "coeff_token")


def _level_escape(level_code: int, base: int) -> tuple[int, int, int]:
    """Escape coding shared by both suffixLength regimes: the smallest
    (prefix >= 15, p-3 suffix bits) pair reaching ``level_code`` above the
    regime's escape base (30 for suffixLength 0 — the spec adds 15 twice
    there — else 15<<suffixLength)."""
    lc = level_code - base
    if lc < 4096:
        return 15, 12, lc
    prefix = 16
    while lc - ((1 << (prefix - 3)) - 4096) >= (1 << (prefix - 3)):
        prefix += 1
    return prefix, prefix - 3, lc - ((1 << (prefix - 3)) - 4096)


def _encode_level(w, level: int, first: bool, t1: int, suffix_len: int) -> int:
    """Spec 9.2.2 level coding, encoder side: emit level_prefix/suffix for
    one level under the current suffixLength, return the updated
    suffixLength."""
    level_code = 2 * level - 2 if level > 0 else -2 * level - 1
    if first and t1 < 3:
        level_code -= 2  # |level| >= 2 guaranteed, reclaim two codes
    if suffix_len == 0:
        if level_code < 14:
            prefix, ssize, suffix = level_code, 0, 0
        elif level_code < 30:
            prefix, ssize, suffix = 14, 4, level_code - 14
        else:
            prefix, ssize, suffix = _level_escape(level_code, 30)
    else:
        if level_code < (15 << suffix_len):
            prefix = level_code >> suffix_len
            ssize, suffix = suffix_len, level_code & ((1 << suffix_len) - 1)
        else:
            prefix, ssize, suffix = _level_escape(level_code, 15 << suffix_len)
    w.u(0, prefix)
    w.u(1, 1)
    if ssize:
        w.u(suffix, ssize)
    if suffix_len == 0:
        suffix_len = 1
    if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
        suffix_len += 1
    return suffix_len


def _decode_level(r, first: bool, t1: int, suffix_len: int) -> tuple[int, int]:
    """Spec 9.2.2 level decoding: (level, updated suffixLength)."""
    prefix = 0
    while r.u(1) == 0:
        prefix += 1
        if prefix > 32:
            raise ValueError("invalid CAVLC level_prefix")
    if prefix == 14 and suffix_len == 0:
        ssize = 4
    elif prefix >= 15:
        ssize = prefix - 3
    else:
        ssize = suffix_len
    level_code = min(15, prefix) << suffix_len
    if ssize:
        level_code += r.u(ssize)
    if prefix >= 15 and suffix_len == 0:
        level_code += 15
    if prefix >= 16:
        level_code += (1 << (prefix - 3)) - 4096
    if first and t1 < 3:
        level_code += 2
    level = (level_code + 2) >> 1 if level_code % 2 == 0 else -((level_code + 1) >> 1)
    if suffix_len == 0:
        suffix_len = 1
    if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
        suffix_len += 1
    return level, suffix_len


def cavlc_encode_block(w, coeffs: np.ndarray, nc: int) -> int:
    """Encode one scanned coefficient vector (length 16, 15 or 4, already
    in zig-zag order) with CAVLC; returns TotalCoeff (for nC tracking)."""
    t = _tables()
    max_coeff = len(coeffs)
    nz = [i for i, v in enumerate(coeffs) if v]
    tc = len(nz)
    t1 = 0
    while t1 < min(tc, 3) and abs(int(coeffs[nz[tc - 1 - t1]])) == 1:
        t1 += 1
    _ct_write(w, nc, tc, t1)
    if tc == 0:
        return 0
    for j in range(t1):  # sign bits, highest frequency first (1 = negative)
        w.u(1 if coeffs[nz[tc - 1 - j]] < 0 else 0, 1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i, pos in enumerate(reversed(nz[: tc - t1])):
        suffix_len = _encode_level(w, int(coeffs[pos]), i == 0, t1, suffix_len)
    total_zeros = nz[-1] + 1 - tc
    if tc < max_coeff:
        tz = t["tz_cdc"] if max_coeff == 4 else t["tz_luma"]
        enc, _dec, _ml = tz[min(tc, 15)]
        code, ln = enc[total_zeros]
        w.u(code, ln)
    zeros_left = total_zeros
    for i in range(tc - 1, 0, -1):  # runs, highest frequency first
        if zeros_left == 0:
            break
        run = nz[i] - nz[i - 1] - 1
        enc, _dec, _ml = t["runs"][min(zeros_left, 7)]
        code, ln = enc[run]
        w.u(code, ln)
        zeros_left -= run
    return tc


def cavlc_decode_block(r, nc: int, max_coeff: int) -> tuple[np.ndarray, int]:
    """Decode one CAVLC block to a scanned coefficient vector; returns
    (coeffs, TotalCoeff). Raises ``ValueError`` on malformed bitstreams."""
    t = _tables()
    tc, t1 = _ct_read(r, nc)
    coeffs = np.zeros(max_coeff, np.int64)
    if tc > max_coeff:
        raise ValueError(f"CAVLC TotalCoeff {tc} exceeds block size {max_coeff}")
    if tc == 0:
        return coeffs, 0
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(tc - t1):
        level, suffix_len = _decode_level(r, i == 0, t1, suffix_len)
        levels.append(level)
    if tc < max_coeff:
        tz = t["tz_cdc"] if max_coeff == 4 else t["tz_luma"]
        _enc, dec, maxlen = tz[min(tc, 15)]
        total_zeros = _read_vlc(r, dec, maxlen, "total_zeros")
    else:
        total_zeros = 0
    if tc + total_zeros > max_coeff:
        raise ValueError("CAVLC total_zeros exceeds block size")
    zeros_left = total_zeros
    pos = tc + total_zeros - 1
    for i, lv in enumerate(levels):  # highest frequency first
        coeffs[pos] = lv
        if i == tc - 1:
            break
        if zeros_left > 0:
            _enc, dec, maxlen = t["runs"][min(zeros_left, 7)]
            run = _read_vlc(r, dec, maxlen, "run_before")
            if run > zeros_left:
                raise ValueError("CAVLC run_before exceeds zeros_left")
        else:
            run = 0
        zeros_left -= run
        pos -= run + 1
    return coeffs, tc


# --------------------------------------------------------------------------
# macroblock reconstruction (shared by encoder and decoder so the encoder's
# prediction neighbors are bit-exactly the decoder's)
# --------------------------------------------------------------------------


def blk_xy(blk_idx: int) -> tuple[int, int]:
    """Luma 4x4 block coding order (6.4.3): 2x2 quads raster, raster within
    each quad. Returns (x4, y4) in 4-px units within the macroblock."""
    quad, within = blk_idx >> 2, blk_idx & 3
    return (quad & 1) * 2 + (within & 1), (quad >> 1) * 2 + (within >> 1)


def scan_block(z: np.ndarray, skip_dc: bool) -> np.ndarray:
    """4x4 coefficient block -> zig-zag scanned vector (15 AC coeffs when
    ``skip_dc`` — the Intra16x16/chroma AC shape — else all 16)."""
    flat = z.reshape(16)[ZIGZAG]
    return flat[1:] if skip_dc else flat


def unscan_block(s: np.ndarray, skip_dc: bool) -> np.ndarray:
    """Inverse of :func:`scan_block`; DC position left zero when skipped."""
    flat = np.zeros(16, np.int64)
    flat[ZIGZAG[1:] if skip_dc else ZIGZAG] = s
    return flat.reshape(4, 4)


def recon_luma_mb(pred: np.ndarray, dc_q: np.ndarray, ac_scanned, qp: int) -> np.ndarray:
    """Reconstruct one I_16x16 luma macroblock from quantized levels:
    normative DC Hadamard + scaling, per-4x4 AC scaling + inverse core
    transform, clip(pred + residual). ``ac_scanned`` is a list of 16
    scanned 15-vectors (or None for CodedBlockPatternLuma == 0)."""
    dc = dequant_luma_dc(dc_q, qp)
    out = np.empty((16, 16), np.int64)
    for blk in range(16):
        x4, y4 = blk_xy(blk)
        d = (
            unscan_block(ac_scanned[blk], skip_dc=True)
            if ac_scanned is not None
            else np.zeros((4, 4), np.int64)
        )
        d = dequant4(d, qp)
        d[0, 0] = dc[y4, x4]
        r = idct4(d)
        sl = np.s_[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4]
        out[sl] = _clip8(pred[sl] + r)
    return out.astype(np.uint8)


def recon_chroma_mb(pred: np.ndarray, dc_q: np.ndarray, ac_scanned, qpc: int) -> np.ndarray:
    """Reconstruct one 8x8 chroma plane from quantized levels (2x2 DC +
    optional 4 scanned AC 15-vectors)."""
    dc = dequant_chroma_dc(dc_q, qpc)
    out = np.empty((8, 8), np.int64)
    for blk in range(4):
        x4, y4 = blk & 1, blk >> 1
        d = (
            unscan_block(ac_scanned[blk], skip_dc=True)
            if ac_scanned is not None
            else np.zeros((4, 4), np.int64)
        )
        d = dequant4(d, qpc)
        d[0, 0] = dc[y4, x4]
        r = idct4(d)
        sl = np.s_[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4]
        out[sl] = _clip8(pred[sl] + r)
    return out.astype(np.uint8)


# --------------------------------------------------------------------------
# Intra_4x4 prediction (8.3.1): nine modes over 4x4 blocks
# --------------------------------------------------------------------------

I4_MODES_TOP = (0, 3, 7)  # need the top row (DDL/VL pad top-right)
I4_MODES_LEFT = (1, 8)
I4_MODES_BOTH = (4, 5, 6)  # need top + left + corner


def pred_luma4(mode: int, top, left, corner) -> np.ndarray:
    """One Intra_4x4 prediction (8.3.1.2.1-9). ``top`` is the 8-sample
    above row (above-right already substituted with p[3,-1] when that
    block is unavailable, per 8.3.1.2's sample gathering), ``left`` the
    4-sample column, ``corner`` p[-1,-1]; None where unavailable. Encoder
    and decoder share this one implementation, so the stream is exactly
    self-consistent."""
    t, l, q = top, left, corner

    def tt(i):  # p[i, -1] with the corner at i == -1
        return int(q) if i == -1 else int(t[i])

    def ll(i):  # p[-1, i] with the corner at i == -1
        return int(q) if i == -1 else int(l[i])

    out = np.empty((4, 4), np.int64)
    if mode == 0:  # Vertical
        if t is None:
            raise ValueError("Intra_4x4_Vertical needs the top neighbor")
        return np.tile(t[:4].astype(np.int64), (4, 1))
    if mode == 1:  # Horizontal
        if l is None:
            raise ValueError("Intra_4x4_Horizontal needs the left neighbor")
        return np.tile(l.astype(np.int64)[:, None], (1, 4))
    if mode == 2:  # DC
        if t is not None and l is not None:
            dc = (int(t[:4].sum()) + int(l.sum()) + 4) >> 3
        elif t is not None:
            dc = (int(t[:4].sum()) + 2) >> 2
        elif l is not None:
            dc = (int(l.sum()) + 2) >> 2
        else:
            dc = 128
        out[:] = dc
        return out
    if mode == 3:  # Diagonal_Down_Left
        if t is None:
            raise ValueError("Intra_4x4_DDL needs the top neighbor")
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    out[y, x] = (int(t[6]) + 3 * int(t[7]) + 2) >> 2
                else:
                    out[y, x] = (
                        int(t[x + y]) + 2 * int(t[x + y + 1]) + int(t[x + y + 2]) + 2
                    ) >> 2
        return out
    if mode in (4, 5, 6) and (t is None or l is None or q is None):
        raise ValueError(f"Intra_4x4 mode {mode} needs both neighbors")
    if mode == 4:  # Diagonal_Down_Right
        for y in range(4):
            for x in range(4):
                if x > y:
                    out[y, x] = (tt(x - y - 2) + 2 * tt(x - y - 1) + tt(x - y) + 2) >> 2
                elif x < y:
                    out[y, x] = (ll(y - x - 2) + 2 * ll(y - x - 1) + ll(y - x) + 2) >> 2
                else:
                    out[y, x] = (tt(0) + 2 * int(q) + ll(0) + 2) >> 2
        return out
    if mode == 5:  # Vertical_Right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    out[y, x] = (tt(x - (y >> 1) - 1) + tt(x - (y >> 1)) + 1) >> 1
                elif z > 0:
                    out[y, x] = (
                        tt(x - (y >> 1) - 2)
                        + 2 * tt(x - (y >> 1) - 1)
                        + tt(x - (y >> 1))
                        + 2
                    ) >> 2
                elif z == -1:
                    out[y, x] = (ll(0) + 2 * int(q) + tt(0) + 2) >> 2
                else:
                    out[y, x] = (
                        ll(y - 2 * x - 1) + 2 * ll(y - 2 * x - 2) + ll(y - 2 * x - 3) + 2
                    ) >> 2
        return out
    if mode == 6:  # Horizontal_Down (the x/y mirror of Vertical_Right)
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    out[y, x] = (ll(y - (x >> 1) - 1) + ll(y - (x >> 1)) + 1) >> 1
                elif z > 0:
                    out[y, x] = (
                        ll(y - (x >> 1) - 2)
                        + 2 * ll(y - (x >> 1) - 1)
                        + ll(y - (x >> 1))
                        + 2
                    ) >> 2
                elif z == -1:
                    out[y, x] = (ll(0) + 2 * int(q) + tt(0) + 2) >> 2
                else:
                    out[y, x] = (
                        tt(x - 2 * y - 1) + 2 * tt(x - 2 * y - 2) + tt(x - 2 * y - 3) + 2
                    ) >> 2
        return out
    if mode == 7:  # Vertical_Left
        if t is None:
            raise ValueError("Intra_4x4_VL needs the top neighbor")
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    out[y, x] = (int(t[i]) + int(t[i + 1]) + 1) >> 1
                else:
                    out[y, x] = (int(t[i]) + 2 * int(t[i + 1]) + int(t[i + 2]) + 2) >> 2
        return out
    if mode == 8:  # Horizontal_Up
        if l is None:
            raise ValueError("Intra_4x4_HU needs the left neighbor")
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                i = y + (x >> 1)
                if z > 5:
                    out[y, x] = int(l[3])
                elif z == 5:
                    out[y, x] = (int(l[2]) + 3 * int(l[3]) + 2) >> 2
                elif z % 2 == 0:
                    out[y, x] = (int(l[i]) + int(l[i + 1]) + 1) >> 1
                else:
                    out[y, x] = (int(l[i]) + 2 * int(l[i + 1]) + int(l[i + 2]) + 2) >> 2
        return out
    raise ValueError(f"invalid Intra_4x4 prediction mode {mode}")
