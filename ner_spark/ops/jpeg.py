"""Baseline sequential JPEG codec, numpy only (ITU-T T.81 / JFIF).

Closes most of the env-blocked codec surface documented in
ops/multimodal.py: the dominant real-world image format now decodes
(and, for fixtures, encodes) without PIL/libjpeg.

Scope — exactly baseline JPEG:
- SOF0 (baseline DCT, 8-bit precision), Huffman entropy coding;
- gray (1 component) and YCbCr 3-component scans, any sampling
  factors up to 2×2 (4:4:4, 4:2:2, 4:2:0 all decode; chroma
  upsampling is nearest-neighbor, the spec-sanctioned simple path);
- DRI/RSTn restart intervals (reset DC predictors, realign bits);
- the ENCODER emits 4:4:4 (or gray) with the T.81 Annex K example
  quantization + Huffman tables, quality-scaled per the well-known
  IJG curve — deterministic bytes for a given (array, quality).

Out of scope (raise): progressive (SOF2), arithmetic coding (SOF9+),
12-bit precision, hierarchical.  Those genuinely need a full codec
library; multimodal.decode_real reports them honestly.

Lossiness contract (what tests can pin): decode(encode(x, q)) is NOT
x, but the error is bounded by the quantization tables — at q=95 the
Annex-K tables keep max per-pixel error small (pytest pins ≤ 24 on
smooth synthetic patterns and exact determinism of the encoded
bytes).  decode() itself is exact T.81 arithmetic: dequant → IDCT →
level shift, float64 IDCT rounded once at the end.
"""

from __future__ import annotations

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


def _encode_one_block(writer, block, qtab, dc_codes, ac_codes, pred):
    """Encode one 8×8 sample block; returns the new DC predictor."""
    coefs = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = np.round(coefs / qtab).astype(np.int64)
    zz = q.flatten()[ZIGZAG]
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
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and not (a.ndim == 3 and a.shape[2] == 3):
        raise ValueError(f"unsupported array shape {a.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = a.shape[:2]
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
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
    q = np.zeros(64, dtype=np.int64)
    q[ZIGZAG] = zz
    coefs = q.reshape(8, 8) * qtab
    block = _C.T @ coefs.astype(np.float64) @ _C + 128.0
    return block, pred


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes → uint8 array ((H,W) gray or
    (H,W,3) RGB).  Raises ValueError on malformed streams and
    NotImplementedError for non-baseline frames (progressive,
    arithmetic, 12-bit)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
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
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame marker 0xFF{marker:02X} "
                "(progressive/arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                scan_comps.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            scan_start = pos
            break
        # APPn/COM/others: skipped via seglen
    if frame is None or scan_start is None:
        raise ValueError("missing SOF/SOS")

    # isolate the entropy-coded segment (ends at the next real marker;
    # 0xFF00 stuffing and RSTn stay inside)
    end = scan_start
    while end < len(data) - 1:
        if data[end] == 0xFF and data[end + 1] not in (0x00,) and not (
            0xD0 <= data[end + 1] <= 0xD7
        ):
            break
        end += 1
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
    if restart:
        import re

        intervals = re.split(b"\xff[\xd0-\xd7]", scan)
    else:
        intervals = [scan]
    mcu_idx = 0
    n_mcus = mcus_x * mcus_y
    for seg_i, seg in enumerate(intervals):
        rd = _BitReader(seg)
        preds = {c["id"]: 0 for c in comps}
        upto = min(n_mcus, mcu_idx + restart) if restart else n_mcus
        while mcu_idx < upto:
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
            mcu_idx += 1

    # upsample to full resolution (nearest) and crop
    h, w = frame["h"], frame["w"]
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
