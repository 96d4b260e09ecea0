"""Baseline + progressive JPEG codec, numpy only (ITU-T T.81 / JFIF).

Closes most of the env-blocked codec surface documented in
ops/multimodal.py: the dominant real-world image format now decodes
(and, for fixtures, encodes) without PIL/libjpeg.

Scope:
- SOF0/SOF1 (baseline/extended sequential DCT, 8-bit), Huffman;
- SOF2 (progressive DCT, 8-bit): spectral selection + successive
  approximation, interleaved DC scans, per-component AC band scans,
  EOB-run accumulation, AC/DC refinement passes (T.81 Annex G — the
  same structure as libjpeg's jdphuff);
- gray (1 component) and YCbCr 3-component scans, any sampling
  factors up to 2×2 (4:4:4, 4:2:2, 4:2:0 all decode; chroma
  upsampling is nearest-neighbor, the spec-sanctioned simple path);
- DRI/RSTn restart intervals (reset DC predictors + EOB run,
  realign bits) in both sequential and progressive scans;
- the ENCODERS emit deterministic bytes for a given input:
  `encode_jpeg` baseline 4:4:4/4:2:0 with the T.81 Annex K example
  tables quality-scaled per the well-known IJG curve, and
  `encode_jpeg_progressive` a spectral-selection + successive-
  approximation scan script over the SAME quantized coefficients —
  so progressive decode must equal baseline decode pixel-for-pixel
  (the parity contract pytest pins).

Out of scope (raise): arithmetic coding (SOF9+), 12-bit precision,
hierarchical.  Those genuinely need a full codec library;
multimodal.decode_real reports them honestly.

Lossiness contract (what tests can pin): decode(encode(x, q)) is NOT
x, but the error is bounded by the quantization tables — at q=95 the
Annex-K tables keep max per-pixel error small (pytest pins ≤ 24 on
smooth synthetic patterns and exact determinism of the encoded
bytes).  decode() itself is exact T.81 arithmetic: dequant → IDCT →
level shift, float64 IDCT rounded once at the end.
"""

from __future__ import annotations

import re
import struct

import numpy as np

# ---- T.81 Annex K example tables (the interchange defaults) --------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# (BITS list of 16 code-length counts, HUFFVAL symbol list) — Annex K.
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8×8 DCT-II basis matrix: block_dct = C @ b @ C.T, idct = C.T @ B @ C
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """The IJG quality curve (public libjpeg convention)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (table * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def _build_codes(bits, vals):
    """Canonical Huffman: symbol → (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits, vals):
    """Canonical Huffman: (length, code) → symbol."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s per spec

    def raw(self, marker: bytes) -> None:
        """Append marker bytes verbatim (markers are NOT stuffed)."""
        self.align()
        self.buf += marker

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _quantize_block(block: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """8×8 samples → 64 quantized coefficients in zigzag order.  The
    ONE forward path both encoders share, so baseline and progressive
    streams carry identical coefficients by construction."""
    coefs = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = np.round(coefs / qtab).astype(np.int64)
    return q.flatten()[ZIGZAG]


def _dequant_block(zz: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """64 zigzag coefficients → 8×8 samples (dequant → IDCT → level
    shift).  The ONE inverse path both decode modes share."""
    q = np.zeros(64, dtype=np.int64)
    q[ZIGZAG] = zz
    coefs = q.reshape(8, 8) * qtab
    return _C.T @ coefs.astype(np.float64) @ _C + 128.0


def _encode_one_block(writer, block, qtab, dc_codes, ac_codes, pred):
    """Encode one 8×8 sample block; returns the new DC predictor."""
    zz = _quantize_block(block, qtab)
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    size, bits = _magnitude(diff)
    c, ln = dc_codes[size]
    writer.put(c, ln)
    if size:
        writer.put(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            c, ln = ac_codes[0x00]  # EOB
            writer.put(c, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            writer.put(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        writer.put(c, ln)
        writer.put(bits, size)
        run = 0
    return pred


def _dht_segment(tc_th: int, bits, vals) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in table.flatten()[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _prep_planes(arr: np.ndarray, subsampling: str):
    """Shared encoder front half: validate, color-convert, pad to the
    MCU grid, subsample.  Returns (gray, h, w, factors, hmax, vmax,
    mcus_x, mcus_y, planes)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and not (a.ndim == 3 and a.shape[2] == 3):
        raise ValueError(f"unsupported array shape {a.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = a.shape[:2]
    sub420 = subsampling == "4:2:0" and not gray
    factors = [(1, 1)] if gray else ([(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * 3)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)

    if gray:
        comps = [a.astype(np.float64)]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    planes = []
    for (ch, cv), p in zip(factors, comps):
        # pad the FULL-res plane to the MCU grid, then box-downsample
        # by the component's factor ratio (1 for luma / 4:4:4)
        p = np.pad(
            p,
            ((0, mcus_y * mcu_h - h), (0, mcus_x * mcu_w - w)),
            mode="edge",
        )
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            p = p.reshape(p.shape[0] // ry, ry, p.shape[1] // rx, rx).mean(
                axis=(1, 3)
            )
        planes.append(np.clip(np.round(p), 0, 255))
    return gray, h, w, factors, hmax, vmax, mcus_x, mcus_y, planes


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF bytes for an 8-bit gray (H,W) or RGB (H,W,3)
    array — Annex-K tables quality-scaled, deterministic.
    ``subsampling`` is ``"4:4:4"`` (default) or ``"4:2:0"`` (chroma
    box-averaged 2×2, 16×16 MCUs — exercises the decoder's
    interleaved multi-block MCU + upsampling path); ignored for
    gray.  ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every that-many MCUs (byte-aligned, DC predictors
    reset) — the error-resilience machinery real encoders emit."""
    gray, h, w, factors, hmax, vmax, mcus_x, mcus_y, planes = _prep_planes(
        arr, subsampling
    )
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, qy)
    if not gray:
        out += _dqt_segment(1, qc)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        ch, cv = factors[cid - 1]
        sof += bytes([cid, (ch << 4) | cv, 0 if cid == 1 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, *_DC_LUMA)
    out += _dht_segment(0x10, *_AC_LUMA)
    if not gray:
        out += _dht_segment(0x01, *_DC_CHROMA)
        out += _dht_segment(0x11, *_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    wtr = _BitWriter()
    dc_y = _build_codes(*_DC_LUMA)
    ac_y = _build_codes(*_AC_LUMA)
    dc_c = _build_codes(*_DC_CHROMA)
    ac_c = _build_codes(*_AC_CHROMA)
    preds = [0] * ncomp
    mcu_i = 0
    rst_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.raw(bytes([0xFF, 0xD0 + (rst_i % 8)]))
                rst_i += 1
                preds = [0] * ncomp
            mcu_i += 1
            for ci, p in enumerate(planes):
                ch, cv = factors[ci]
                qt = qy if ci == 0 else qc
                dct, act = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
                for v in range(cv):
                    for hh in range(ch):
                        py, px = (my * cv + v) * 8, (mx * ch + hh) * 8
                        preds[ci] = _encode_one_block(
                            wtr,
                            p[py : py + 8, px : px + 8],
                            qt,
                            dct,
                            act,
                            preds[ci],
                        )
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- progressive (SOF2): spectral selection + successive approx ----

# AC table for progressive scans: EVERY (run<<4)|size symbol the
# progressive AC coding model can emit — EOB-run codes (nbits<<4)|0
# for nbits 0..14, ZRL 0xF0, and (r<<4)|s for s 1..10 — which the
# Annex-K baseline AC tables do NOT all contain.  All symbols at code
# length 9 (176 codes of 511 slots: canonical, all-ones never
# assigned).  Compression-optimal it is not; tests only need valid,
# deterministic streams, and DECODING always uses the file's own
# tables, so real-world streams are unaffected.
_AC_PROG_VALS = [
    (r << 4) | s for r in range(16) for s in range(11)
]
_AC_PROG = ([0] * 8 + [len(_AC_PROG_VALS)] + [0] * 7, _AC_PROG_VALS)


def _comp_grids(h, w, factors, hmax, vmax, mcus_x, mcus_y):
    """Per component: ((bh_spec, bw_spec), (bh_pad, bw_pad)).  Non-
    interleaved progressive scans cover the SPEC block grid (T.81
    A.2.2: ceil(scaled dims / 8)); interleaved scans cover the padded
    MCU grid, which can be larger (dummy blocks)."""
    grids = []
    for ch, cv in factors:
        sw = -(-(w * ch) // hmax)
        sh = -(-(h * cv) // vmax)
        grids.append(
            ((-(-sh // 8), -(-sw // 8)), (mcus_y * cv, mcus_x * ch))
        )
    return grids


def _default_scan_script(ncomp: int, levels: int):
    """libjpeg-style script: interleaved DC first, per-component AC
    in two spectral bands, then successive-approximation refinements
    (DC interleaved, AC per component) down to full precision.  Each
    scan is (comp_indices, Ss, Se, Ah, Al)."""
    al0 = levels - 1
    comps = list(range(ncomp))
    script = [(comps, 0, 0, 0, al0)]
    for c in comps:
        script.append(([c], 1, 5, 0, al0))
        script.append(([c], 6, 63, 0, al0))
    for al in range(al0 - 1, -1, -1):
        script.append((comps, 0, 0, al + 1, al))
        for c in comps:
            script.append(([c], 1, 5, al + 1, al))
            script.append(([c], 6, 63, al + 1, al))
    return script


def _emit_eobrun(w, ac_codes, state) -> None:
    """Close a pending EOB run: the (nbits<<4) symbol, its extra
    bits, then the correction bits buffered while the run was open
    (refinement scans only) — jcphuff's emit_eobrun."""
    if state["eobrun"] > 0:
        eb = state["eobrun"]
        nbits = eb.bit_length() - 1
        c, ln = ac_codes[nbits << 4]
        w.put(c, ln)
        if nbits:
            w.put(eb - (1 << nbits), nbits)
        state["eobrun"] = 0
        for b in state["be_bits"]:
            w.put(b, 1)
        state["be_bits"] = []


def _enc_ac_first(w, zz, Ss, Se, Al, ac_codes, state) -> None:
    """One block of an Ah=0 AC scan (T.81 G.1.2.2): magnitudes
    truncated toward zero by 2^Al, zero runs + EOB-run accumulation."""
    r = 0
    for k in range(Ss, Se + 1):
        v = int(zz[k])
        a = (-v if v < 0 else v) >> Al
        if a == 0:
            r += 1
            continue
        _emit_eobrun(w, ac_codes, state)
        while r > 15:
            c, ln = ac_codes[0xF0]
            w.put(c, ln)
            r -= 16
        nbits = a.bit_length()
        c, ln = ac_codes[(r << 4) | nbits]
        w.put(c, ln)
        bits = (~a if v < 0 else a) & ((1 << nbits) - 1)
        w.put(bits, nbits)
        r = 0
    if r > 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:  # 14-bit EOB-run ceiling
            _emit_eobrun(w, ac_codes, state)


def _enc_ac_refine(w, zz, Ss, Se, Al, ac_codes, state) -> None:
    """One block of an Ah=Al+1 AC refinement scan (T.81 G.1.2.3 /
    jcphuff encode_mcu_AC_refine): newly-nonzero coefficients appear
    as ±1 symbols; already-nonzero ones contribute one correction bit
    each, buffered and flushed after the next emitted symbol."""
    absv = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
    eobpos = Ss - 1
    for k in range(Ss, Se + 1):
        if absv[k - Ss] == 1:
            eobpos = k
    br: list[int] = []  # this block's pending correction bits
    r = 0
    for k in range(Ss, Se + 1):
        a = absv[k - Ss]
        if a == 0:
            r += 1
            continue
        while r > 15 and k <= eobpos:
            _emit_eobrun(w, ac_codes, state)
            c, ln = ac_codes[0xF0]
            w.put(c, ln)
            r -= 16
            for b in br:
                w.put(b, 1)
            br = []
        if a > 1:  # already nonzero at the previous precision
            br.append(a & 1)
            continue
        _emit_eobrun(w, ac_codes, state)
        c, ln = ac_codes[(r << 4) | 1]
        w.put(c, ln)
        w.put(0 if int(zz[k]) < 0 else 1, 1)
        for b in br:
            w.put(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        state["eobrun"] += 1
        state["be_bits"].extend(br)
        if state["eobrun"] == 0x7FFF or len(state["be_bits"]) > 900:
            _emit_eobrun(w, ac_codes, state)


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    levels: int = 2,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JFIF bytes carrying the IDENTICAL quantized
    coefficients as ``encode_jpeg(arr, quality, subsampling)`` — so
    ``decode_jpeg`` of either stream yields the same pixels exactly
    (the parity contract the tests pin).  ``levels`` is the
    successive-approximation depth (1 = spectral selection only);
    ``restart_interval`` > 0 emits DRI + RSTn in every scan (counted
    in MCUs for interleaved scans, blocks otherwise)."""
    if not 1 <= int(levels) <= 4:
        raise ValueError("levels must be 1..4")
    levels = int(levels)
    gray, h, w, factors, hmax, vmax, mcus_x, mcus_y, planes = _prep_planes(
        arr, subsampling
    )
    ncomp = 1 if gray else 3
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    grids = _comp_grids(h, w, factors, hmax, vmax, mcus_x, mcus_y)

    # quantize every block once, through the SAME per-block forward
    # path the baseline encoder uses (bit-identical coefficients)
    coefs = []
    for ci, p in enumerate(planes):
        qt = qy if ci == 0 else qc
        (_, _), (bh, bw) = grids[ci]
        cz = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                cz[by, bx] = _quantize_block(
                    p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qt
                )
        coefs.append(cz)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, qy)
    if not gray:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        ch, cv = factors[cid - 1]
        sof += bytes([cid, (ch << 4) | cv, 0 if cid == 1 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    out += _dht_segment(0x00, *_DC_LUMA)
    if not gray:
        out += _dht_segment(0x01, *_DC_CHROMA)
    out += _dht_segment(0x10, *_AC_PROG)  # shared prog AC table
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_codes = [
        _build_codes(*(_DC_LUMA if ci == 0 else _DC_CHROMA))
        for ci in range(ncomp)
    ]
    ac_codes = _build_codes(*_AC_PROG)

    for scan_comps, Ss, Se, Ah, Al in _default_scan_script(ncomp, levels):
        sos = bytes([len(scan_comps)])
        for ci in scan_comps:
            td = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | 0])
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

        wtr = _BitWriter()
        state = {"eobrun": 0, "be_bits": []}
        preds = {ci: 0 for ci in scan_comps}
        rst_i = 0
        interleaved = len(scan_comps) > 1

        def _restart_if_due(unit_i):
            nonlocal rst_i
            if (
                restart_interval
                and unit_i
                and unit_i % restart_interval == 0
            ):
                _emit_eobrun(wtr, ac_codes, state)
                wtr.raw(bytes([0xFF, 0xD0 + (rst_i % 8)]))
                rst_i += 1
                for ci in preds:
                    preds[ci] = 0

        def _emit_dc(zz, ci):
            if Ah == 0:
                dcv = int(zz[0]) >> Al
                size, bits = _magnitude(dcv - preds[ci])
                preds[ci] = dcv
                c, ln = dc_codes[ci][size]
                wtr.put(c, ln)
                if size:
                    wtr.put(bits, size)
            else:  # refinement scan: one correction bit per block
                wtr.put((int(zz[0]) >> Al) & 1, 1)

        if Ss == 0:  # DC scan (interleaved or single component)
            if interleaved:
                unit = 0
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        _restart_if_due(unit)
                        unit += 1
                        for ci in scan_comps:
                            ch, cv = factors[ci]
                            for v in range(cv):
                                for hh in range(ch):
                                    _emit_dc(
                                        coefs[ci][my * cv + v, mx * ch + hh],
                                        ci,
                                    )
            else:
                ci = scan_comps[0]
                (bh, bw), _ = grids[ci]
                for ui, (by, bx) in enumerate(
                    (by, bx) for by in range(bh) for bx in range(bw)
                ):
                    _restart_if_due(ui)
                    _emit_dc(coefs[ci][by, bx], ci)
        else:  # AC scan: always single component (T.81 G.1.1.1)
            ci = scan_comps[0]
            (bh, bw), _ = grids[ci]
            enc = _enc_ac_first if Ah == 0 else _enc_ac_refine
            for ui, (by, bx) in enumerate(
                (by, bx) for by in range(bh) for bx in range(bw)
            ):
                _restart_if_due(ui)
                enc(wtr, coefs[ci][by, bx], Ss, Se, Al, ac_codes, state)
        _emit_eobrun(wtr, ac_codes, state)
        out += wtr.flush()

    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and RSTn
    awareness (the scan slice is pre-split on restart markers)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                return 0  # spec: pad past the end with zeros
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF and self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # unstuff
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: amplitude bits → signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_huff(rd: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _decode_block(rd, dc_tab, ac_tab, qtab, pred) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    size = _decode_huff(rd, dc_tab)
    diff = _extend(rd.bits(size), size)
    pred += diff
    zz[0] = pred
    i = 1
    while i < 64:
        rs = _decode_huff(rd, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                i += 16
                continue
            break  # EOB
        i += run
        if i > 63:
            raise ValueError("AC run past block end")
        zz[i] = _extend(rd.bits(size), size)
        i += 1
    return _dequant_block(zz, qtab), pred


def _restart_segments(scan_bytes: bytes, restart: int, n_units: int):
    """Yield one ``(_BitReader, range_of_unit_indices)`` pair per
    restart interval — the ONE restart-walk shared by the baseline and
    progressive decode loops.  With no DRI the whole entropy segment
    is a single interval; otherwise the scan splits on RSTn markers
    and each interval covers at most ``restart`` units, with DC
    predictors / EOB runs reset per interval by the caller
    (T.81 §E.1.4).  Every interval always accounts for its full unit
    window: a truncated segment pads with zero bits (_BitReader
    semantics) rather than shifting later units."""
    segs = (
        re.split(b"\xff[\xd0-\xd7]", scan_bytes) if restart
        else [scan_bytes]
    )
    ui = 0
    for seg in segs:
        upto = min(n_units, ui + restart) if restart else n_units
        yield _BitReader(seg), range(ui, upto)
        ui = upto


def _entropy_end(data: bytes, start: int) -> int:
    """First byte past the entropy-coded segment beginning at
    ``start`` (the next real marker; 0xFF00 stuffing and RSTn stay
    inside)."""
    end = start
    while end < len(data) - 1:
        if data[end] == 0xFF and data[end + 1] not in (0x00,) and not (
            0xD0 <= data[end + 1] <= 0xD7
        ):
            break
        end += 1
    return end


def _dec_ac_first(rd, zz, Ss, Se, Al, actab, state) -> None:
    """One block of an Ah=0 AC scan (T.81 G.2 / jdphuff
    decode_mcu_AC_first): coefficients arrive at reduced precision
    (<< Al); an EOB-run symbol ends this block and skips whole
    following blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = Ss
    while k <= Se:
        rs = _decode_huff(rd, actab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r) - 1  # this block counts
                if r:
                    state["eobrun"] += rd.bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > Se:
            raise ValueError("AC run past band end")
        zz[k] = _extend(rd.bits(s), s) << Al
        k += 1


def _dec_ac_refine(rd, zz, Ss, Se, Al, actab, state) -> None:
    """One block of an AC refinement scan (T.81 G.1.2.3 / jdphuff
    decode_mcu_AC_refine): newly-nonzero coefficients appear as ±1
    << Al; every already-nonzero coefficient passed carries one
    correction bit, including through EOB runs."""
    p1 = 1 << Al
    m1 = -1 << Al
    k = Ss
    if state["eobrun"] == 0:
        while k <= Se:
            rs = _decode_huff(rd, actab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += rd.bits(r)
                    break
                # ZRL: skip 16 zero-history coefs, correcting others
            else:
                if s != 1:
                    raise ValueError("bad newly-nonzero size in refine")
                val = p1 if rd.bit() else m1
            while k <= Se:
                if zz[k] != 0:
                    if rd.bit() and (int(zz[k]) & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= Se:
                zz[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= Se:
            if zz[k] != 0 and rd.bit() and (int(zz[k]) & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _decode_prog_scan(
    scan_bytes, order, Ss, Se, Ah, Al, huff, coefs, grids, restart,
    mcus_x, mcus_y,
) -> None:
    """Decode one progressive scan into the per-component coefficient
    stores.  ``order`` holds the scan's components (frame dict | td |
    ta | idx); multi-component scans are MCU-interleaved (DC only),
    single-component scans walk the component's SPEC block grid."""
    interleaved = len(order) > 1
    if interleaved and Ss != 0:
        raise ValueError("interleaved AC scan in progressive stream")
    unit_blocks: list[list] = []
    if interleaved:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                blocks = []
                for c in order:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            blocks.append(
                                (c, my * c["v"] + v, mx * c["h"] + hh)
                            )
                unit_blocks.append(blocks)
    else:
        c = order[0]
        (bh, bw), _ = grids[c["idx"]]
        for by in range(bh):
            for bx in range(bw):
                unit_blocks.append([(c, by, bx)])

    for rd, units in _restart_segments(scan_bytes, restart, len(unit_blocks)):
        preds = {c["id"]: 0 for c in order}
        state = {"eobrun": 0}
        for ui in units:
            for c, by, bx in unit_blocks[ui]:
                zz = coefs[c["id"]][by, bx]
                if Ss == 0:  # DC
                    if Ah == 0:
                        s = _decode_huff(rd, huff[(0, c["td"])])
                        preds[c["id"]] += _extend(rd.bits(s), s)
                        zz[0] = preds[c["id"]] << Al
                    elif rd.bit():
                        zz[0] |= 1 << Al
                else:
                    actab = huff[(1, c["ta"])]
                    if Ah == 0:
                        _dec_ac_first(rd, zz, Ss, Se, Al, actab, state)
                    else:
                        _dec_ac_refine(rd, zz, Ss, Se, Al, actab, state)


def _finish(planes: dict, frame: dict) -> np.ndarray:
    """Shared decode tail: upsample each component plane to full
    resolution (nearest), crop to the frame dims, color-convert."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(
            np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline (SOF0/1) or progressive (SOF2) JPEG bytes →
    uint8 array ((H,W) gray or (H,W,3) RGB).  Raises ValueError on
    malformed streams and NotImplementedError for frames this codec
    does not cover (lossless, arithmetic coding, 12-bit,
    hierarchical)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    prog = None  # progressive state: coef stores + grids
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    scan_comps = None
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them rather than parsing 0xFF as a code
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG stream (lone 0xFF at end)")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG stream (marker without length)")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("truncated JPEG stream (segment overruns data)")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                o += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = np.frombuffer(body[o : o + 64], dtype=np.uint8)
                qtabs[tq] = t.reshape(8, 8)
                o += 64
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                huff[(tc, th)] = _build_decode(bits, vals)
                o += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {
                "h": h, "w": w, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported frame marker 0xFF{marker:02X} "
                "(lossless/arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                scan_comps.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            if frame is None:
                raise ValueError("SOS before SOF")
            if not frame["progressive"]:
                scan_start = pos
                break
            # progressive: decode this scan into the coefficient
            # stores with the tables in force NOW, keep parsing
            Ss, Se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if prog is None:
                comps = frame["comps"]
                p_hmax = max(c["h"] for c in comps)
                p_vmax = max(c["v"] for c in comps)
                p_mx = -(-frame["w"] // (8 * p_hmax))
                p_my = -(-frame["h"] // (8 * p_vmax))
                grids = _comp_grids(
                    frame["h"], frame["w"],
                    [(c["h"], c["v"]) for c in comps],
                    p_hmax, p_vmax, p_mx, p_my,
                )
                prog = {
                    "grids": grids,
                    "mcus": (p_mx, p_my),
                    "coefs": {
                        c["id"]: np.zeros(
                            (p_my * c["v"], p_mx * c["h"], 64),
                            dtype=np.int64,
                        )
                        for c in comps
                    },
                }
            by_id = {c["id"]: c for c in frame["comps"]}
            idx_of = {c["id"]: i for i, c in enumerate(frame["comps"])}
            order = [
                by_id[sc["id"]]
                | {"td": sc["td"], "ta": sc["ta"], "idx": idx_of[sc["id"]]}
                for sc in scan_comps
            ]
            end = _entropy_end(data, pos)
            _decode_prog_scan(
                data[pos:end], order, Ss, Se, ahal >> 4, ahal & 0x0F,
                huff, prog["coefs"], prog["grids"], restart,
                *prog["mcus"],
            )
            pos = end
        # APPn/COM/others: skipped via seglen
    if frame is not None and frame["progressive"]:
        if prog is None:
            raise ValueError("progressive stream with no scans")
        planes = {}
        for c in frame["comps"]:
            qt = qtabs[c["tq"]]
            cz = prog["coefs"][c["id"]]
            bh, bw = cz.shape[:2]
            plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
            for by in range(bh):
                for bx in range(bw):
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _dequant_block(cz[by, bx], qt)
                    )
            planes[c["id"]] = plane
        return _finish(planes, frame)
    if frame is None or scan_start is None:
        raise ValueError("missing SOF/SOS")

    # isolate the entropy-coded segment (ends at the next real marker;
    # 0xFF00 stuffing and RSTn stay inside)
    end = _entropy_end(data, scan_start)
    scan = data[scan_start:end]

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)
    planes = {
        c["id"]: np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        for c in comps
    }
    order = [by_id[sc["id"]] | {"td": sc["td"], "ta": sc["ta"]}
             for sc in scan_comps]

    # split on restart markers so each interval realigns + resets DC
    n_mcus = mcus_x * mcus_y
    for rd, units in _restart_segments(scan, restart, n_mcus):
        preds = {c["id"]: 0 for c in comps}
        for mcu_idx in units:
            my, mx = divmod(mcu_idx, mcus_x)
            for c in order:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        block, preds[c["id"]] = _decode_block(
                            rd,
                            huff[(0, c["td"])],
                            huff[(1, c["ta"])],
                            qtabs[c["tq"]],
                            preds[c["id"]],
                        )
                        py = (my * c["v"] + v) * 8
                        px = (mx * c["h"] + hh) * 8
                        planes[c["id"]][py : py + 8, px : px + 8] = block

    return _finish(planes, frame)
