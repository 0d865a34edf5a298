"""MPEG-4 AVC / H.264 baseline intra codec — from scratch, spec-conformant
bitstream layer (ITU-T H.264 / ISO 14496-10).

What is REAL here (written against the published spec, no external libs):

* Annex-B byte-stream framing: start-code scan, NAL header parse,
  emulation-prevention three-byte escape/unescape (clause 7.4.1.1) — the
  raw-sample payload routinely contains ``00 00 0x`` runs, so this path is
  exercised on every stream, not just in a corner test.
* Exp-Golomb entropy coding, ``ue(v)``/``se(v)`` (clause 9.1).
* Sequence / picture parameter sets: full SPS parse including the
  high-profile chroma-format branch, all three ``pic_order_cnt_type``
  layouts, frame cropping (clause 7.3.2.1); full PPS parse (7.3.2.2).
* IDR slice headers (7.3.3) incl. ``dec_ref_pic_marking`` and the
  macroblock layer of I slices (7.3.5).
* Pixel reconstruction: 4:2:0 plane assembly from macroblock rasters,
  crop-window application, chroma upsample and JFIF full-range BT.601
  YCbCr→RGB (same convention as :mod:`nifi_dicom_spark.functions.jpeg`).

Macroblock coverage — the honest boundary: slices carry **I_PCM**
macroblocks (``mb_type`` 25 in I slices — the spec's raw-sample lossless
mode, clause 7.4.5 table 7-11 + 8.3.5) and, since round 5, **CAVLC-coded
I_16x16 and I_4x4** macroblocks (``encode_h264(frames, qp=...,
mb_types="i16"|"i4"|"auto")``): real lossy compression with all four
Intra_16x16 and all nine Intra_4x4 prediction modes, the normative 4x4
integer transform + DC Hadamard reconstruction, quantization, and CAVLC
entropy coding (:mod:`.h264_residual`). The I_PCM toolset is bit-exact
standard H.264 a conformant third-party decoder plays; the CAVLC
toolset is spec-exact in syntax, transforms and prediction but uses
engine-canonical VLC code tables and the identity coded_block_pattern
mapping (embed-or-derive policy — the spec's printed tables 9-4/9-5..
9-10 are non-derivable table data), so those streams carry a spec-legal
SEI user-data marker and the decoder only attempts entropy decode when
it is present. What stays a declared stub: third-party CAVLC/CABAC
streams and inter macroblocks — these raise :class:`UnsupportedH264`
and the feature path falls back to the clearly-marked stub
(:func:`nifi_dicom_spark.functions.multimodal._fake_decode_feature`)
rather than fabricating pixels.

Reference analog: decompress-on-read of encapsulated video pixel data
(``apps/DeidentifyAndRedact.java:271`` decompresses on import when the
transfer syntax requires it) — here an H.264 access unit pulled out of an
MP4 sample table decodes to genuine pixels the same way MJPEG does.

Scale shape: one access unit is self-contained, so decode parallelises
per row / per sampled frame inside Arrow-batched ``mapInPandas`` — no
cross-row state, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "UnsupportedH264",
    "is_annexb",
    "encode_h264",
    "encode_h264_aus",
    "encode_h264_yuv",
    "decode_h264",
    "decode_h264_yuv",
    "parse_h264",
]

NAL_SLICE = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9

_SLICE_NALS = (NAL_SLICE, NAL_IDR)
# profiles whose SPS carries the chroma_format/scaling branch (7.3.2.1.1)
_HIGH_PROFILES = (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)


class UnsupportedH264(ValueError):
    """Spec-valid H.264 the codec declares out of scope (third-party
    entropy-coded residuals — CABAC or unmarked CAVLC — inter prediction,
    interlace, slice groups). Distinct from malformed data so callers can
    tell 'real stream, undeclared toolset' apart from 'not H.264 at
    all'."""


# --------------------------------------------------------------------------
# bit I/O
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._cur = 0
        self._nbits = 0

    def u(self, val: int, n: int) -> None:
        if val < 0 or (n < 64 and val >> n):
            raise ValueError(f"u({n}) out of range: {val}")
        # O(n/8) arithmetic append (hot path for entropy-coded payloads)
        cur = (self._cur << n) | val
        nbits = self._nbits + n
        while nbits >= 8:
            nbits -= 8
            self.buf.append((cur >> nbits) & 0xFF)
        self._cur = cur & ((1 << nbits) - 1)
        self._nbits = nbits

    def ue(self, val: int) -> None:
        if val < 0:
            raise ValueError(f"ue out of range: {val}")
        code = val + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, val: int) -> None:
        # 9.1.1: positive k maps to 2k-1, non-positive to -2k
        self.ue(2 * val - 1 if val > 0 else -2 * val)

    def align_zero(self) -> None:
        """pcm_alignment_zero_bit padding (7.3.5)."""
        while self._nbits:
            self.u(0, 1)

    def write_bytes(self, data: bytes) -> None:
        if self._nbits:
            raise ValueError("write_bytes requires byte alignment")
        self.buf += data

    def rbsp_trailing(self) -> None:
        self.u(1, 1)
        while self._nbits:
            self.u(0, 1)

    def getvalue(self) -> bytes:
        if self._nbits:
            raise ValueError("unterminated RBSP (call rbsp_trailing)")
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("bitstream truncated")
        val = 0
        pos = self.pos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            val = (val << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return val

    def ue(self) -> int:
        lz = 0
        while self.u(1) == 0:
            lz += 1
            if lz > 31:
                raise ValueError("invalid Exp-Golomb code")
        return (1 << lz) - 1 + (self.u(lz) if lz else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_bytes(self, n: int) -> bytes:
        if self.pos & 7:
            raise ValueError("read_bytes requires byte alignment")
        start = self.pos >> 3
        if start + n > len(self.data):
            raise ValueError("bitstream truncated")
        self.pos += n * 8
        return self.data[start : start + n]


# --------------------------------------------------------------------------
# NAL framing (Annex B + emulation prevention, 7.4.1.1)
# --------------------------------------------------------------------------


def _escape(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape(ebsp: bytes) -> bytes:
    if b"\x00\x00\x03" not in ebsp:  # fast path — common for short NALs
        return ebsp
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3 and (i + 1 == n or ebsp[i + 1] <= 3):
            zeros = 0  # emulation_prevention_three_byte: drop
        else:
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _nal(nal_type: int, ref_idc: int, rbsp: bytes) -> bytes:
    header = bytes([(ref_idc << 5) | nal_type])
    return b"\x00\x00\x00\x01" + header + _escape(rbsp)


def _iter_nals(payload: bytes):
    """Yield (nal_type, ref_idc, rbsp) for each NAL in an Annex-B stream."""
    i = 0
    n = len(payload)
    starts = []
    while True:
        j = payload.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        starts.append(j + 3)
        i = j + 3
    for k, s in enumerate(starts):
        e = starts[k + 1] - 3 if k + 1 < len(starts) else n
        # the start-code scan overshoots by the next prefix's leading zeros
        while e > s and payload[e - 1] == 0 and k + 1 < len(starts):
            e -= 1
        if e <= s:
            continue
        header = payload[s]
        if header & 0x80:
            raise ValueError("forbidden_zero_bit set")
        yield header & 0x1F, (header >> 5) & 3, _unescape(payload[s + 1 : e])


def is_annexb(payload: bytes | None) -> bool:
    """Sniff an Annex-B H.264 elementary stream / access unit: a start code
    within the first 4 bytes whose first NAL has a clear forbidden bit and
    a plausible type."""
    if not payload or len(payload) < 5:
        return False
    if payload[:3] == b"\x00\x00\x01":
        h = payload[3]
    elif payload[:4] == b"\x00\x00\x00\x01":
        if len(payload) < 6:
            return False
        h = payload[4]
    else:
        return False
    return (h & 0x80) == 0 and (h & 0x1F) in (
        NAL_SLICE,
        NAL_IDR,
        NAL_SEI,
        NAL_SPS,
        NAL_PPS,
        NAL_AUD,
    )


# --------------------------------------------------------------------------
# parameter sets
# --------------------------------------------------------------------------


def _sps_rbsp(mb_w: int, mb_h: int, width: int, height: int) -> bytes:
    w = _BitWriter()
    w.u(66, 8)  # profile_idc: Baseline
    w.u(0xC0, 8)  # constraint_set0+1 (Constrained Baseline), reserved zero
    w.u(30, 8)  # level_idc 3.0
    w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type: order = decode order (all-intra stream)
    w.ue(0)  # max_num_ref_frames (no inter prediction anywhere)
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    crop_r = (mb_w * 16 - width) // 2  # CropUnitX = 2 for 4:2:0
    crop_b = (mb_h * 16 - height) // 2
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    w.rbsp_trailing()
    return w.getvalue()


def _pps_rbsp() -> bytes:
    w = _BitWriter()
    w.ue(0)  # pic_parameter_set_id
    w.ue(0)  # seq_parameter_set_id
    w.u(0, 1)  # entropy_coding_mode_flag: CAVLC
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 2)  # weighted_bipred_idc
    w.se(0)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.u(0, 1)  # deblocking_filter_control_present_flag
    w.u(0, 1)  # constrained_intra_pred_flag
    w.u(0, 1)  # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    return w.getvalue()


def _skip_scaling_list(r: _BitReader, size: int) -> None:
    """Walk one scaling_list() (spec 7.3.2.1.1.1) without keeping it —
    the header probe only needs to keep the bit reader in sync."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        if nxt != 0:
            last = nxt


def _parse_sps(rbsp: bytes) -> dict:
    """Parse any spec-valid SPS header (7.3.2.1.1) — scaling matrices are
    skipped, interlaced and non-4:2:0 streams yield correct dims. This is
    deliberately NOT where the decode boundary is enforced: probe_media
    must read dims from third-party streams the pixel decoder declines
    (:func:`_require_decodable` guards the decode path)."""
    r = _BitReader(rbsp)
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    level = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    separate_planes = False
    scaling_matrix = False
    if profile in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_planes = bool(r.u(1))
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            scaling_matrix = True
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                if r.u(1):  # seq_scaling_list_present_flag[i]
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    delta_poc_always_zero = False
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        delta_poc_always_zero = bool(r.u(1))
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):
            r.se()  # offset_for_ref_frame[i]
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    mb_w = r.ue() + 1
    map_units_h = r.ue() + 1
    frame_mbs_only = bool(r.u(1))
    # FrameHeightInMbs = (2 - frame_mbs_only_flag) * PicHeightInMapUnits
    mb_h = (2 - int(frame_mbs_only)) * map_units_h
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # Crop units (7.4.2.1.1): ChromaArrayType 0 (mono / separate planes)
    # crops in luma samples; otherwise in chroma sub-sample units.
    if chroma_format_idc == 0 or separate_planes:
        unit_x, unit_y = 1, 2 - int(frame_mbs_only)
    else:
        sub_w = {1: 2, 2: 2, 3: 1}[chroma_format_idc]
        sub_h = {1: 2, 2: 1, 3: 1}[chroma_format_idc]
        unit_x, unit_y = sub_w, sub_h * (2 - int(frame_mbs_only))
    width = mb_w * 16 - unit_x * (crop_l + crop_r)
    height = mb_h * 16 - unit_y * (crop_t + crop_b)
    return {
        "sps_id": sps_id,
        "profile": profile,
        "level": level,
        "mb_w": mb_w,
        "mb_h": mb_h,
        "width": width,
        "height": height,
        "crop": (crop_l, crop_r, crop_t, crop_b),
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "delta_poc_always_zero": delta_poc_always_zero,
        "chroma_format_idc": chroma_format_idc,
        "frame_mbs_only": frame_mbs_only,
        "scaling_matrix": scaling_matrix,
    }


def _require_decodable(sps: dict) -> None:
    """The pixel-decode boundary (encode side only ever emits 4:2:0
    progressive, no scaling matrices): header-parseable but undecodable
    toolsets raise :class:`UnsupportedH264` here, AFTER the probe has had
    its chance to read dims."""
    if sps["chroma_format_idc"] != 1:
        raise UnsupportedH264(
            f"chroma_format_idc {sps['chroma_format_idc']} (only 4:2:0)"
        )
    if not sps["frame_mbs_only"]:
        raise UnsupportedH264("interlaced (frame_mbs_only_flag=0)")
    if sps["scaling_matrix"]:
        raise UnsupportedH264("seq_scaling_matrix not supported")


def _parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    if r.u(1):
        raise UnsupportedH264("CABAC entropy coding (declared boundary)")
    bottom_field_poc_present = bool(r.u(1))
    if r.ue() != 0:
        raise UnsupportedH264("slice groups (FMO) not supported")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.u(1)  # weighted_pred_flag
    r.u(2)  # weighted_bipred_idc
    pic_init_qp = r.se() + 26
    r.se()  # pic_init_qs_minus26
    chroma_qp_offset = r.se()
    deblocking_control = bool(r.u(1))
    r.u(1)  # constrained_intra_pred_flag
    redundant_pic_cnt_present = bool(r.u(1))
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "bottom_field_poc_present": bottom_field_poc_present,
        "pic_init_qp": pic_init_qp,
        "chroma_qp_offset": chroma_qp_offset,
        "deblocking_control": deblocking_control,
        "redundant_pic_cnt_present": redundant_pic_cnt_present,
    }


# --------------------------------------------------------------------------
# SEI marker for engine CAVLC streams (user_data_unregistered, type 5)
# --------------------------------------------------------------------------

# CAVLC coefficient VLC tables are engine-canonical (embed-or-derive
# policy, see functions/h264_residual.py) — a third-party CAVLC stream
# would mis-decode under them, so the encoder brands its entropy-coded
# streams with this spec-legal SEI and the decoder only attempts
# I_16x16 residual decode when the marker is present; unmarked
# entropy-coded slices raise UnsupportedH264 into the declared stub.
import hashlib as _hashlib

_CAVLC_SEI_UUID = _hashlib.md5(b"nifi-dicom-spark:cavlc-i16x16:v1").digest()


def _sei_marker_rbsp() -> bytes:
    w = _BitWriter()
    w.u(5, 8)  # payload_type: user_data_unregistered (D.1.7)
    w.u(16, 8)  # payload_size: the 16-byte uuid_iso_iec_11578
    w.write_bytes(_CAVLC_SEI_UUID)
    w.rbsp_trailing()
    return w.getvalue()


def _sei_has_marker(rbsp: bytes) -> bool:
    """Walk sei_message()s (7.3.2.3, ff-extended type/size bytes) looking
    for the engine's user-data UUID; malformed SEI is just 'no marker'."""
    i = 0
    try:
        while i < len(rbsp) and rbsp[i] != 0x80:
            pt = 0
            while rbsp[i] == 255:
                pt += 255
                i += 1
            pt += rbsp[i]
            i += 1
            sz = 0
            while rbsp[i] == 255:
                sz += 255
                i += 1
            sz += rbsp[i]
            i += 1
            if pt == 5 and sz >= 16 and rbsp[i : i + 16] == _CAVLC_SEI_UUID:
                return True
            i += sz
    except IndexError:
        return False
    return False


# --------------------------------------------------------------------------
# slice encode (IDR, single slice, all I_PCM)
# --------------------------------------------------------------------------


def _idr_slice_rbsp(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, mb_w: int, mb_h: int, idr_pic_id: int
) -> bytes:
    w = _BitWriter()
    # slice_header (7.3.3)
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type: I (all slices of the picture are I)
    w.ue(0)  # pic_parameter_set_id
    w.u(0, 4)  # frame_num (IDR ⇒ 0; log2_max_frame_num = 4)
    w.ue(idr_pic_id)  # idr_pic_id — alternated so consecutive IDRs differ
    # poc_type 2 ⇒ no POC fields; I slice ⇒ no ref-idx/pred tables
    # dec_ref_pic_marking for IDR (7.3.3.3):
    w.u(0, 1)  # no_output_of_prior_pics_flag
    w.u(0, 1)  # long_term_reference_flag
    w.se(0)  # slice_qp_delta
    # slice_data: raster MB loop, every macroblock I_PCM (mb_type 25)
    for my in range(mb_h):
        for mx in range(mb_w):
            w.ue(25)
            w.align_zero()  # pcm_alignment_zero_bit*
            yb = y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
            cbb = cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            crb = cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            w.write_bytes(yb.tobytes() + cbb.tobytes() + crb.tobytes())
    w.rbsp_trailing()
    return w.getvalue()


def _nc_at(grid: np.ndarray, bx: int, by: int) -> int:
    """nC for the 4x4 block at grid (bx, by): neighbor TotalCoeffs, raster
    decode order guarantees in-frame left/above are already known (9.2.1)."""
    from nifi_dicom_spark.functions.h264_residual import nc_from_neighbors

    na = int(grid[by, bx - 1]) if bx > 0 else None
    nb = int(grid[by - 1, bx]) if by > 0 else None
    return nc_from_neighbors(na, nb)


def _luma_neighbors(ry: np.ndarray, mx: int, my: int):
    top = ry[my * 16 - 1, mx * 16 : mx * 16 + 16].astype(np.int64) if my > 0 else None
    left = ry[my * 16 : my * 16 + 16, mx * 16 - 1].astype(np.int64) if mx > 0 else None
    corner = int(ry[my * 16 - 1, mx * 16 - 1]) if (mx > 0 and my > 0) else None
    return top, left, corner


def _chroma_neighbors(pl: np.ndarray, mx: int, my: int):
    top = pl[my * 8 - 1, mx * 8 : mx * 8 + 8].astype(np.int64) if my > 0 else None
    left = pl[my * 8 : my * 8 + 8, mx * 8 - 1].astype(np.int64) if mx > 0 else None
    corner = int(pl[my * 8 - 1, mx * 8 - 1]) if (mx > 0 and my > 0) else None
    return top, left, corner


def _i4_gorder(gx: int, gy: int, mbs_w: int) -> int:
    """Global decode-order index of the 4x4 luma block at grid (gx, gy):
    raster macroblocks, 6.4.3 coding order within each."""
    x4, y4 = gx & 3, gy & 3
    quad = (y4 >> 1) * 2 + (x4 >> 1)
    within = (y4 & 1) * 2 + (x4 & 1)
    return ((gy >> 2) * mbs_w + (gx >> 2)) * 16 + quad * 4 + within


def _i4_neighbors(ry: np.ndarray, gx: int, gy: int, mbs_w: int):
    """(top8, left4, corner) for Intra_4x4 prediction of the block at grid
    (gx, gy); the above-right quartet substitutes p[3,-1] when that block
    is out of frame or later in decode order (8.3.1.2 sample gathering)."""
    px, py = gx * 4, gy * 4
    top = None
    if gy > 0:
        t4 = ry[py - 1, px : px + 4].astype(np.int64)
        if gx + 1 < mbs_w * 4 and _i4_gorder(gx + 1, gy - 1, mbs_w) < _i4_gorder(
            gx, gy, mbs_w
        ):
            tr = ry[py - 1, px + 4 : px + 8].astype(np.int64)
        else:
            tr = np.full(4, int(ry[py - 1, px + 3]), np.int64)
        top = np.concatenate([t4, tr])
    left = ry[py : py + 4, px - 1].astype(np.int64) if gx > 0 else None
    corner = int(ry[py - 1, px - 1]) if (gx > 0 and gy > 0) else None
    return top, left, corner


def _i4_pred_mode_pred(mode_grid: np.ndarray, gx: int, gy: int) -> int:
    """predIntra4x4PredMode (8.3.1.1): min of the left/above blocks' modes;
    an unavailable neighbor forces DC (2). The grid holds 2 for every
    block of a non-I_4x4 macroblock, which is exactly the spec's rule."""
    if gx == 0 or gy == 0:
        return 2
    return int(min(mode_grid[gy, gx - 1], mode_grid[gy - 1, gx]))


def _encode_mb_chroma(src_c, rc, mx: int, my: int, qpc: int):
    """Shared chroma encode for both intra MB types: SAD-select one
    intra_chroma_pred_mode, transform+quantize both components, derive
    CodedBlockPatternChroma. Returns (cm, cpred, dcq_c, acs_c, cbpc)."""
    from nifi_dicom_spark.functions import h264_residual as hr

    ctl = [_chroma_neighbors(rc[c], mx, my) for c in range(2)]
    cmodes = [0]
    if ctl[0][1] is not None:
        cmodes.append(1)
    if ctl[0][0] is not None:
        cmodes.append(2)
    if ctl[0][0] is not None and ctl[0][1] is not None:
        cmodes.append(3)
    corig = [
        src_c[c][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].astype(np.int64)
        for c in range(2)
    ]
    cpreds = {m: [hr.pred_chroma8(m, *ctl[c]) for c in range(2)] for m in cmodes}
    cm = min(
        cmodes,
        key=lambda m: sum(int(np.abs(corig[c] - cpreds[m][c]).sum()) for c in range(2)),
    )
    dcq_c = []
    acs_c = []
    for c in range(2):
        cresid = corig[c] - cpreds[cm][c]
        w00c = np.zeros((2, 2), np.int64)
        blocks = []
        for blk in range(4):
            x4, y4 = blk & 1, blk >> 1
            w4 = hr.fdct4(cresid[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4])
            w00c[y4, x4] = w4[0, 0]
            z = hr.quant4(w4, qpc)
            z[0, 0] = 0
            blocks.append(hr.scan_block(z, skip_dc=True))
        dcq_c.append(hr.quant_chroma_dc(w00c, qpc))
        acs_c.append(blocks)
    any_cac = any(s.any() for blocks in acs_c for s in blocks)
    any_cdc = any(d.any() for d in dcq_c)
    cbpc = 2 if any_cac else (1 if any_cdc else 0)
    return cm, cpreds[cm], dcq_c, acs_c, cbpc


def _write_chroma_residual(w, cbpc: int, dcq_c, acs_c, nnz_c, mx: int, my: int):
    from nifi_dicom_spark.functions import h264_residual as hr

    if cbpc:
        for c in range(2):
            hr.cavlc_encode_block(w, dcq_c[c].reshape(4), -1)
    if cbpc == 2:
        for c in range(2):
            for blk in range(4):
                gx, gy = mx * 2 + (blk & 1), my * 2 + (blk >> 1)
                tc = hr.cavlc_encode_block(w, acs_c[c][blk], _nc_at(nnz_c[c], gx, gy))
                nnz_c[c][gy, gx] = tc
    else:
        for c in range(2):
            nnz_c[c][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 0


def _recon_mb_chroma(rc, cpred, dcq_c, acs_c, cbpc: int, mx: int, my: int, qpc: int):
    from nifi_dicom_spark.functions import h264_residual as hr

    for c in range(2):
        rc[c][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = hr.recon_chroma_mb(
            cpred[c],
            dcq_c[c] if cbpc else np.zeros((2, 2), np.int64),
            acs_c[c] if cbpc == 2 else None,
            qpc,
        )


def _plan_mb_i16(orig, ry, mx, my, qp):
    """I_16x16 luma plan: (sad, pm, pred, dc_q, acs, cbpl)."""
    from nifi_dicom_spark.functions import h264_residual as hr

    top, left, corner = _luma_neighbors(ry, mx, my)
    modes = [2]
    if top is not None:
        modes.append(0)
    if left is not None:
        modes.append(1)
    if top is not None and left is not None:
        modes.append(3)
    preds = {m: hr.pred_luma16(m, top, left, corner) for m in modes}
    sads = {m: int(np.abs(orig - preds[m]).sum()) for m in modes}
    pm = min(modes, key=lambda m: sads[m])
    pred = preds[pm]
    resid = orig - pred
    w00 = np.zeros((4, 4), np.int64)
    acs = []
    for blk in range(16):
        x4, y4 = hr.blk_xy(blk)
        w4 = hr.fdct4(resid[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4])
        w00[y4, x4] = w4[0, 0]
        z = hr.quant4(w4, qp)
        z[0, 0] = 0
        acs.append(hr.scan_block(z, skip_dc=True))
    dc_q = hr.quant_luma_dc(w00, qp)
    cbpl = 15 if any(s.any() for s in acs) else 0
    return sads[pm], pm, pred, dc_q, acs, cbpl


def _plan_mb_i4(orig, ry, mode_grid, mx, my, mbs_w, qp):
    """I_4x4 luma plan, block-by-block in coding order with lock-step
    reconstruction INTO ``ry`` (later blocks predict from earlier ones).
    Returns (sad, modes16, coeffs16, recon_backup) — the caller restores
    ``ry`` from the backup if it picks the I_16x16 plan instead."""
    from nifi_dicom_spark.functions import h264_residual as hr

    backup = ry[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].copy()
    sad_total = 0
    modes16 = []
    coeffs16 = []
    for blk in range(16):
        x4, y4 = hr.blk_xy(blk)
        gx, gy = mx * 4 + x4, my * 4 + y4
        top, left, corner = _i4_neighbors(ry, gx, gy, mbs_w)
        cand = [2]
        if top is not None:
            cand += list(hr.I4_MODES_TOP)
        if left is not None:
            cand += list(hr.I4_MODES_LEFT)
        if top is not None and left is not None and corner is not None:
            cand += list(hr.I4_MODES_BOTH)
        ob = orig[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4]
        best, best_sad, best_pred = 2, None, None
        for m in sorted(cand):
            p = hr.pred_luma4(m, top, left, corner)
            s = int(np.abs(ob - p).sum())
            if best_sad is None or s < best_sad:
                best, best_sad, best_pred = m, s, p
        sad_total += best_sad
        z = hr.quant4(hr.fdct4(ob - best_pred), qp)
        modes16.append(best)
        coeffs16.append(hr.scan_block(z, skip_dc=False))
        rb = np.clip(best_pred + hr.idct4(hr.dequant4(z, qp)), 0, 255).astype(np.uint8)
        ry[my * 16 + y4 * 4 : my * 16 + y4 * 4 + 4, mx * 16 + x4 * 4 : mx * 16 + x4 * 4 + 4] = rb
    return sad_total, modes16, coeffs16, backup


def _idr_slice_cavlc_rbsp(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    mb_w: int,
    mb_h: int,
    idr_pic_id: int,
    qp: int,
    mb_types: str = "i16",
) -> bytes:
    """One IDR I slice of CAVLC-coded intra macroblocks: per-MB SAD mode
    decisions, forward core transform (+ DC Hadamard for I_16x16), intra
    quantization at ``qp``, CAVLC residual coding with spec 9.2.1 nC
    contexts — and lock-step reconstruction through the *decoder's*
    normative path so prediction neighbors match the decoder bit-exactly.
    ``mb_types``: "i16" = all I_16x16, "i4" = all I_4x4 (nine-mode
    per-block prediction), "auto" = per-MB SAD decision (I_4x4 must beat
    I_16x16 by >12.5% to pay for its mode signaling)."""
    from nifi_dicom_spark.functions import h264_residual as hr

    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type: I
    w.ue(0)  # pic_parameter_set_id
    w.u(0, 4)  # frame_num
    w.ue(idr_pic_id)
    w.u(0, 1)  # no_output_of_prior_pics_flag
    w.u(0, 1)  # long_term_reference_flag
    w.se(qp - 26)  # slice_qp_delta (pic_init_qp is 26 in our PPS)
    qpc = hr.chroma_qp(qp)
    # decoder-view state
    ry = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    rc = [np.zeros((mb_h * 8, mb_w * 8), np.uint8) for _ in range(2)]
    nnz_l = np.zeros((mb_h * 4, mb_w * 4), np.int64)
    nnz_c = [np.zeros((mb_h * 2, mb_w * 2), np.int64) for _ in range(2)]
    mode_grid = np.full((mb_h * 4, mb_w * 4), 2, np.int64)
    src_c = (cb, cr)
    for my in range(mb_h):
        for mx in range(mb_w):
            orig = y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].astype(np.int64)
            # ---- pick the macroblock type
            use_i4 = mb_types == "i4"
            plan4 = None
            if mb_types in ("i4", "auto"):
                plan4 = _plan_mb_i4(orig, ry, mode_grid, mx, my, mb_w, qp)
            if mb_types == "auto":
                sad16 = _plan_mb_i16(orig, ry, mx, my, qp)[0]
                use_i4 = plan4[0] * 8 < sad16 * 7
            if plan4 is not None and not use_i4:
                ry[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = plan4[3]
            # ---- chroma (identical for both types)
            cm, cpred, dcq_c, acs_c, cbpc = _encode_mb_chroma(src_c, rc, mx, my, qpc)
            if use_i4:
                _sad, modes16, coeffs16, _backup = plan4
                cbp_quads = [
                    1 if any(coeffs16[q * 4 + k].any() for k in range(4)) else 0
                    for q in range(4)
                ]
                cbpl = sum(b << q for q, b in enumerate(cbp_quads))
                w.ue(0)  # mb_type: I_4x4 (I_NxN)
                for blk in range(16):  # prev/rem intra4x4 pred modes (7.3.5.1)
                    x4, y4 = hr.blk_xy(blk)
                    gx, gy = mx * 4 + x4, my * 4 + y4
                    pmp = _i4_pred_mode_pred(mode_grid, gx, gy)
                    mode = modes16[blk]
                    if mode == pmp:
                        w.u(1, 1)
                    else:
                        w.u(0, 1)
                        w.u(mode - (1 if mode > pmp else 0), 3)
                    mode_grid[gy, gx] = mode
                w.ue(cm)  # intra_chroma_pred_mode
                # coded_block_pattern: identity ME mapping (embed-or-derive
                # deviation — table 9-4 is printed data; the SEI marker
                # already gates these streams)
                w.ue(cbpl + 16 * cbpc)
                if cbpl or cbpc:
                    w.se(0)  # mb_qp_delta
                for blk in range(16):
                    x4, y4 = hr.blk_xy(blk)
                    gx, gy = mx * 4 + x4, my * 4 + y4
                    if cbp_quads[blk >> 2]:
                        tc = hr.cavlc_encode_block(
                            w, coeffs16[blk], _nc_at(nnz_l, gx, gy)
                        )
                        nnz_l[gy, gx] = tc
                    else:
                        nnz_l[gy, gx] = 0
                # luma was already reconstructed block-by-block in the plan
            else:
                _sad, pm, pred, dc_q, acs, cbpl = _plan_mb_i16(orig, ry, mx, my, qp)
                w.ue(1 + pm + 4 * cbpc + (12 if cbpl else 0))
                w.ue(cm)  # intra_chroma_pred_mode
                w.se(0)  # mb_qp_delta (constant QP slice)
                hr.cavlc_encode_block(
                    w, hr.scan_block(dc_q, skip_dc=False), _nc_at(nnz_l, mx * 4, my * 4)
                )
                if cbpl:
                    for blk in range(16):
                        x4, y4 = hr.blk_xy(blk)
                        gx, gy = mx * 4 + x4, my * 4 + y4
                        tc = hr.cavlc_encode_block(w, acs[blk], _nc_at(nnz_l, gx, gy))
                        nnz_l[gy, gx] = tc
                else:
                    nnz_l[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 0
                mode_grid[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 2
                ry[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = hr.recon_luma_mb(
                    pred, dc_q, acs if cbpl else None, qp
                )
            _write_chroma_residual(w, cbpc, dcq_c, acs_c, nnz_c, mx, my)
            _recon_mb_chroma(rc, cpred, dcq_c, acs_c, cbpc, mx, my, qpc)
    w.rbsp_trailing()
    return w.getvalue()


def _decode_slice(
    rbsp: bytes,
    sps: dict,
    pps_by_id: dict,
    idr: bool,
    ref_idc: int,
    cavlc_ok: bool = False,
):
    _require_decodable(sps)
    r = _BitReader(rbsp)
    if r.ue() != 0:  # first_mb_in_slice
        raise UnsupportedH264("multi-slice pictures not supported")
    slice_type = r.ue()
    if slice_type % 5 != 2:  # 2/7 = I; SI/P/B need residual or inter decode
        raise UnsupportedH264(f"slice_type {slice_type} (only I slices)")
    pps_id = r.ue()
    pps = pps_by_id.get(pps_id)
    if pps is None:
        raise ValueError(f"slice references unknown PPS {pps_id}")
    r.u(sps["log2_max_frame_num"])  # frame_num
    if idr:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])
        if pps["bottom_field_poc_present"]:
            r.se()
    elif sps["poc_type"] == 1 and not sps["delta_poc_always_zero"]:
        r.se()
        if pps["bottom_field_poc_present"]:
            r.se()
    if pps["redundant_pic_cnt_present"]:
        r.ue()
    if idr:
        r.u(1)  # no_output_of_prior_pics_flag
        r.u(1)  # long_term_reference_flag
    elif ref_idc:
        if r.u(1):  # adaptive_ref_pic_marking_mode_flag
            raise UnsupportedH264("adaptive ref pic marking (MMCO)")
    qp_y = pps["pic_init_qp"] + r.se()  # SliceQPy (7.4.3)
    if not 0 <= qp_y <= 51:
        raise ValueError(f"SliceQPy {qp_y} out of range")
    if pps["deblocking_control"]:
        if r.ue() != 1:
            r.se()
            r.se()
    from nifi_dicom_spark.functions import h264_residual as hr

    mb_w, mb_h = sps["mb_w"], sps["mb_h"]
    y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    cb = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    cr = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    planes_c = (cb, cr)
    nnz_l = np.zeros((mb_h * 4, mb_w * 4), np.int64)
    nnz_c = [np.zeros((mb_h * 2, mb_w * 2), np.int64) for _ in range(2)]
    mode_grid = np.full((mb_h * 4, mb_w * 4), 2, np.int64)
    for my in range(mb_h):
        for mx in range(mb_w):
            mb_type = r.ue()
            if mb_type == 25:  # I_PCM (8.3.5): raw samples, nC counts 16
                r.byte_align()
                raw = r.read_bytes(384)
                y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = np.frombuffer(
                    raw, dtype=np.uint8, count=256
                ).reshape(16, 16)
                cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.frombuffer(
                    raw, dtype=np.uint8, count=64, offset=256
                ).reshape(8, 8)
                cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.frombuffer(
                    raw, dtype=np.uint8, count=64, offset=320
                ).reshape(8, 8)
                nnz_l[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 16
                for c in range(2):
                    nnz_c[c][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
                continue
            if mb_type > 25:
                raise ValueError(f"invalid I-slice mb_type {mb_type}")
            if not cavlc_ok:
                raise UnsupportedH264(
                    f"mb_type {mb_type} is entropy-coded but the stream has "
                    "no engine CAVLC SEI marker — third-party CAVLC/CABAC "
                    "residuals stay the declared boundary"
                )
            if mb_type == 0:  # I_4x4 (I_NxN): nine-mode per-block prediction
                modes16 = []
                for blk in range(16):  # 7.3.5.1 mb_pred
                    x4, y4 = hr.blk_xy(blk)
                    gx, gy = mx * 4 + x4, my * 4 + y4
                    pmp = _i4_pred_mode_pred(mode_grid, gx, gy)
                    if r.u(1):  # prev_intra4x4_pred_mode_flag
                        mode = pmp
                    else:
                        rem = r.u(3)
                        mode = rem + (1 if rem >= pmp else 0)
                    modes16.append(mode)
                    mode_grid[gy, gx] = mode
                cm = r.ue()  # intra_chroma_pred_mode
                if cm > 3:
                    raise ValueError(f"invalid intra_chroma_pred_mode {cm}")
                # coded_block_pattern: identity ME mapping (embed-or-derive
                # deviation; see the encoder) — cbp_luma bits are per quad
                cbp = r.ue()
                if cbp > 47:
                    raise ValueError(f"invalid coded_block_pattern {cbp}")
                cbpl, cbpc = cbp & 15, cbp >> 4
                if cbpc > 2:
                    raise ValueError(f"invalid CodedBlockPatternChroma {cbpc}")
                if cbp:
                    delta = r.se()
                    if not -26 <= delta <= 25:
                        raise ValueError(f"mb_qp_delta {delta} out of range")
                    qp_y = (qp_y + delta + 52) % 52
                qpc = hr.chroma_qp(qp_y, pps["chroma_qp_offset"])
                coeffs16 = []
                for blk in range(16):  # LumaLevel4x4, quad-gated by cbp
                    x4, y4 = hr.blk_xy(blk)
                    gx, gy = mx * 4 + x4, my * 4 + y4
                    if cbpl & (1 << (blk >> 2)):
                        s, tc = hr.cavlc_decode_block(r, _nc_at(nnz_l, gx, gy), 16)
                        nnz_l[gy, gx] = tc
                        coeffs16.append(s)
                    else:
                        nnz_l[gy, gx] = 0
                        coeffs16.append(None)
                dcq_c = [np.zeros((2, 2), np.int64) for _ in range(2)]
                if cbpc:
                    for c in range(2):
                        s4, _tc4 = hr.cavlc_decode_block(r, -1, 4)
                        dcq_c[c] = s4.reshape(2, 2)
                acs_c = [None, None]
                if cbpc == 2:
                    for c in range(2):
                        blocks = []
                        for blk in range(4):
                            gx, gy = mx * 2 + (blk & 1), my * 2 + (blk >> 1)
                            s, tc = hr.cavlc_decode_block(
                                r, _nc_at(nnz_c[c], gx, gy), 15
                            )
                            nnz_c[c][gy, gx] = tc
                            blocks.append(s)
                        acs_c[c] = blocks
                else:
                    for c in range(2):
                        nnz_c[c][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 0
                # block-by-block reconstruction (later blocks predict from
                # earlier reconstructed ones)
                for blk in range(16):
                    x4, y4 = hr.blk_xy(blk)
                    gx, gy = mx * 4 + x4, my * 4 + y4
                    top, left, corner = _i4_neighbors(y, gx, gy, mb_w)
                    p4 = hr.pred_luma4(modes16[blk], top, left, corner)
                    if coeffs16[blk] is not None:
                        d = hr.dequant4(
                            hr.unscan_block(coeffs16[blk], skip_dc=False), qp_y
                        )
                        p4 = p4 + hr.idct4(d)
                    y[gy * 4 : gy * 4 + 4, gx * 4 : gx * 4 + 4] = np.clip(
                        p4, 0, 255
                    ).astype(np.uint8)
                for c in range(2):
                    ctop, cleft, ccorner = _chroma_neighbors(planes_c[c], mx, my)
                    cpred = hr.pred_chroma8(cm, ctop, cleft, ccorner)
                    planes_c[c][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                        hr.recon_chroma_mb(cpred, dcq_c[c], acs_c[c], qpc)
                    )
                continue
            # I_16x16 (table 7-11): unpack pred mode and coded block pattern
            m = mb_type - 1
            cbpl = 15 if m >= 12 else 0
            cbpc = (m % 12) // 4
            pm = m % 4
            cm = r.ue()  # intra_chroma_pred_mode
            if cm > 3:
                raise ValueError(f"invalid intra_chroma_pred_mode {cm}")
            delta = r.se()
            if not -26 <= delta <= 25:
                raise ValueError(f"mb_qp_delta {delta} out of range")
            qp_y = (qp_y + delta + 52) % 52
            qpc = hr.chroma_qp(qp_y, pps["chroma_qp_offset"])
            # residual (7.3.5.3): luma DC, luma AC, chroma DC, chroma AC
            dc_scan, _tc = hr.cavlc_decode_block(
                r, _nc_at(nnz_l, mx * 4, my * 4), 16
            )
            dc_q = hr.unscan_block(dc_scan, skip_dc=False)
            acs = None
            if cbpl:
                acs = []
                for blk in range(16):
                    x4, y4 = hr.blk_xy(blk)
                    gx, gy = mx * 4 + x4, my * 4 + y4
                    s, tc = hr.cavlc_decode_block(r, _nc_at(nnz_l, gx, gy), 15)
                    nnz_l[gy, gx] = tc
                    acs.append(s)
            else:
                nnz_l[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 0
            dcq_c = [np.zeros((2, 2), np.int64) for _ in range(2)]
            if cbpc:
                for c in range(2):
                    s4, _tc4 = hr.cavlc_decode_block(r, -1, 4)
                    dcq_c[c] = s4.reshape(2, 2)
            acs_c = [None, None]
            if cbpc == 2:
                for c in range(2):
                    blocks = []
                    for blk in range(4):
                        gx, gy = mx * 2 + (blk & 1), my * 2 + (blk >> 1)
                        s, tc = hr.cavlc_decode_block(r, _nc_at(nnz_c[c], gx, gy), 15)
                        nnz_c[c][gy, gx] = tc
                        blocks.append(s)
                    acs_c[c] = blocks
            else:
                for c in range(2):
                    nnz_c[c][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 0
            # prediction from reconstructed neighbors, then normative recon
            top, left, corner = _luma_neighbors(y, mx, my)
            pred = hr.pred_luma16(pm, top, left, corner)
            y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = hr.recon_luma_mb(
                pred, dc_q, acs, qp_y
            )
            for c in range(2):
                ctop, cleft, ccorner = _chroma_neighbors(planes_c[c], mx, my)
                cpred = hr.pred_chroma8(cm, ctop, cleft, ccorner)
                planes_c[c][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                    hr.recon_chroma_mb(cpred, dcq_c[c], acs_c[c], qpc)
                )
    cl, crr, ct, cbm = sps["crop"]
    h, wd = sps["height"], sps["width"]
    y = y[2 * ct : 2 * ct + h, 2 * cl : 2 * cl + wd]
    cb = cb[ct : ct + h // 2, cl : cl + wd // 2]
    cr = cr[ct : ct + h // 2, cl : cl + wd // 2]
    return y, cb, cr


# --------------------------------------------------------------------------
# color / layout helpers (JFIF full-range BT.601, as in functions/jpeg.py)
# --------------------------------------------------------------------------


def _rgb_to_yuv420(frame: np.ndarray):
    if frame.ndim not in (2, 3) or (frame.ndim == 3 and frame.shape[2] < 3):
        raise ValueError(
            f"frame must be (H, W, 3) RGB or (H, W) grayscale, got {frame.shape}"
        )
    if frame.shape[0] % 2 or frame.shape[1] % 2:
        # enforced here too: the 2x2 chroma mean below needs even dims, and
        # a reshape error is not a usable message
        raise ValueError(
            f"4:2:0 needs even dimensions, got {frame.shape[1]}x{frame.shape[0]}"
        )
    if frame.ndim == 2:  # grayscale: flat chroma
        y = frame.astype(np.uint8)
        h, w = y.shape
        cb = np.full((h // 2, w // 2), 128, dtype=np.uint8)
        return y, cb, cb.copy()
    f = frame.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    h, w = y.shape
    # 2x2 mean chroma subsample
    cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    to8 = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return to8(y), to8(cb), to8(cr)


def _yuv420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float64)
    cbf = np.repeat(np.repeat(cb.astype(np.float64), 2, 0), 2, 1) - 128.0
    crf = np.repeat(np.repeat(cr.astype(np.float64), 2, 0), 2, 1) - 128.0
    cbf = cbf[: yf.shape[0], : yf.shape[1]]
    crf = crf[: yf.shape[0], : yf.shape[1]]
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _pad_plane(p: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.pad(p, ((0, h - p.shape[0]), (0, w - p.shape[1])), mode="edge")


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def encode_h264_yuv(
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    qp: int | None = None,
    mb_types: str = "i16",
) -> bytes:
    """Encode pre-converted 4:2:0 planes (uint8 ``(y, cb, cr)`` per frame,
    even luma dims, chroma exactly half) into an Annex-B stream: SPS, PPS,
    then one single-slice IDR picture per frame.

    ``qp=None`` (default) emits I_PCM macroblocks — bit-exact lossless in
    the YUV domain. An integer ``qp`` in [0, 51] emits CAVLC-coded
    I_16x16 macroblocks instead (real lossy compression: intra
    prediction, 4x4 integer transform + DC Hadamard, quantization at
    ``qp``, CAVLC entropy coding), branded with the engine SEI marker
    (see :mod:`.h264_residual` for the embed-or-derive VLC table policy)."""
    if not frames:
        raise ValueError("need at least one frame")
    if qp is not None and not (isinstance(qp, int) and 0 <= qp <= 51):
        raise ValueError(f"qp must be an int in [0, 51], got {qp!r}")
    if mb_types not in ("i16", "i4", "auto"):
        raise ValueError(f"mb_types must be 'i16', 'i4' or 'auto', got {mb_types!r}")
    y0 = frames[0][0]
    h, w = y0.shape
    if h == 0 or w == 0:
        raise ValueError("empty frame (zero width or height)")
    if h % 2 or w % 2:
        raise ValueError(f"4:2:0 needs even dimensions, got {w}x{h}")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    out = bytearray()
    out += _nal(NAL_SPS, 3, _sps_rbsp(mb_w, mb_h, w, h))
    out += _nal(NAL_PPS, 3, _pps_rbsp())
    if qp is not None:
        out += _nal(NAL_SEI, 0, _sei_marker_rbsp())
    for i, (y, cb, cr) in enumerate(frames):
        if y.shape != (h, w) or cb.shape != (h // 2, w // 2) or cr.shape != cb.shape:
            raise ValueError(f"frame {i}: inconsistent plane shapes")
        yp = _pad_plane(np.ascontiguousarray(y, dtype=np.uint8), mb_h * 16, mb_w * 16)
        cbp = _pad_plane(np.ascontiguousarray(cb, dtype=np.uint8), mb_h * 8, mb_w * 8)
        crp = _pad_plane(np.ascontiguousarray(cr, dtype=np.uint8), mb_h * 8, mb_w * 8)
        # consecutive IDRs must carry different idr_pic_id (spec 7.4.3)
        if qp is None:
            rbsp = _idr_slice_rbsp(yp, cbp, crp, mb_w, mb_h, i & 1)
        else:
            rbsp = _idr_slice_cavlc_rbsp(yp, cbp, crp, mb_w, mb_h, i & 1, qp, mb_types)
        out += _nal(NAL_IDR, 3, rbsp)
    return bytes(out)


def encode_h264(
    frames: list[np.ndarray], qp: int | None = None, mb_types: str = "i16"
) -> bytes:
    """Encode uint8 RGB (HxWx3) or grayscale (HxW) frames; color conversion
    is JFIF full-range BT.601 with 2x2 mean chroma subsampling, then the
    lossless I_PCM path of :func:`encode_h264_yuv` (default) or its lossy
    CAVLC I_16x16 path when ``qp`` is given."""
    return encode_h264_yuv(
        [_rgb_to_yuv420(np.asarray(f)) for f in frames], qp=qp, mb_types=mb_types
    )


def encode_h264_aus(
    frames: list[np.ndarray], qp: int | None = None, mb_types: str = "i16"
) -> list[bytes]:
    """Per-frame self-contained access units (SPS+PPS+IDR each) for muxing
    into an MP4 sample table — every sampled AU decodes independently, the
    shape ``decode_frames(every_n=...)`` needs."""
    return [encode_h264([f], qp=qp, mb_types=mb_types) for f in frames]


def decode_h264_yuv(
    payload: bytes, max_frames: int | None = None
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode an Annex-B stream to per-frame cropped 4:2:0 planes.

    ``max_frames`` stops after that many coded pictures — the feature
    kernel wants only the first frame and must not pay full macroblock
    reconstruction for the rest of the stream. Raises
    :class:`UnsupportedH264` for spec-valid toolsets outside the declared
    boundary and ``ValueError`` for malformed data."""
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    frames = []
    cavlc_ok = False
    for nal_type, ref_idc, rbsp in _iter_nals(payload):
        if nal_type == NAL_SEI:
            cavlc_ok = cavlc_ok or _sei_has_marker(rbsp)
        elif nal_type == NAL_SPS:
            s = _parse_sps(rbsp)
            sps_by_id[s["sps_id"]] = s
        elif nal_type == NAL_PPS:
            p = _parse_pps(rbsp)
            if p["sps_id"] not in sps_by_id:
                raise ValueError(f"PPS references unknown SPS {p['sps_id']}")
            pps_by_id[p["pps_id"]] = p
        elif nal_type in _SLICE_NALS:
            if not sps_by_id:
                raise ValueError("slice before SPS")
            # single-SPS streams (what we emit); the active SPS is the one
            # the slice's PPS points at
            peek = _BitReader(rbsp)
            peek.ue()  # first_mb_in_slice
            peek.ue()  # slice_type
            pps_id = peek.ue()
            pps = pps_by_id.get(pps_id)
            if pps is None:
                raise ValueError(f"slice references unknown PPS {pps_id}")
            sps = sps_by_id[pps["sps_id"]]
            frames.append(
                _decode_slice(
                    rbsp, sps, pps_by_id, nal_type == NAL_IDR, ref_idc, cavlc_ok
                )
            )
            if max_frames is not None and len(frames) >= max_frames:
                break
        # SEI/AUD/filler: skipped
    if not frames:
        raise ValueError("no coded pictures in stream")
    return frames


def decode_h264(payload: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """Decode to uint8 RGB frames (BT.601 full-range, nearest chroma
    upsample) — the inverse of :func:`encode_h264` up to color-conversion
    rounding; the YUV planes underneath are bit-exact."""
    return [_yuv420_to_rgb(*f) for f in decode_h264_yuv(payload, max_frames=max_frames)]


def parse_h264(payload: bytes) -> dict:
    """Header-only probe (no pixel decode): first SPS dims/profile/level
    plus the coded-picture count — O(stream scan), used by probe_media."""
    sps = None
    n_frames = 0
    for nal_type, _ref, rbsp in _iter_nals(payload):
        if nal_type == NAL_SPS and sps is None:
            sps = _parse_sps(rbsp)
        elif nal_type in _SLICE_NALS:
            n_frames += 1
    if sps is None:
        raise ValueError("no SPS in stream")
    return {
        "width": sps["width"],
        "height": sps["height"],
        "profile": sps["profile"],
        "level": sps["level"],
        "n_frames": n_frames,
    }
