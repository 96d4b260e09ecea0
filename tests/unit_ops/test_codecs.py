"""Stdlib codec correctness: PNG roundtrip + all five scanline
filters, WAV PCM roundtrip, NSVC container frame extraction, and the
integer-exact nearest resize.  Pure numpy — no Spark session."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ner_spark.ops.codecs import (
    PNG_SIG,
    decode_frame,
    decode_png,
    decode_wav,
    encode_png,
    encode_video,
    encode_wav,
    resize_nearest,
    video_n_frames,
)


def _img(h, w, ch=None, seed=3):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("ch", [None, 3, 4])
def test_png_roundtrip_exact(ch):
    a = _img(13, 7, ch)
    assert np.array_equal(decode_png(encode_png(a)), a)


def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Apply the PNG spec's filters FORWARD (encoder side) per row —
    independent reimplementation of RFC 2083 §6, so the decoder's
    inversion is checked against the spec, not against itself."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    out = b""
    for y in range(h):
        f = filters[y % len(filters)]
        row, up = flat[y], (flat[y - 1] if y else np.zeros(stride, np.int32))
        filt = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = int(row[i - ch]) if i >= ch else 0
            b = int(up[i])
            c = int(up[i - ch]) if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filt[i] = (int(row[i]) - pred) & 0xFF
        out += bytes([f]) + filt.astype(np.uint8).tobytes()
    return out


def test_png_decoder_inverts_all_five_filters():
    img = _img(10, 6, 3, seed=9)
    raw = _forward_filter(img, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 6, 10, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


@pytest.mark.parametrize("ch,seed", [(1, 1), (3, 2), (4, 5)])
def test_png_decoder_inverts_average_paeth_heavy_rows(ch, seed):
    """Wide rows dominated by filters 3/4 — exercises the per-pixel
    channel-lane recurrence (not just the 6-px spec case above)."""
    img = _img(9, 83, None if ch == 1 else ch, seed=seed)
    flat = img if img.ndim == 3 else img[:, :, None]
    raw = _forward_filter(flat, [3, 4, 4, 3, 1, 3, 4])
    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", 83, 9, 8, color, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


def test_png_unsupported_shapes_raise():
    with pytest.raises(ValueError):
        decode_png(b"\xff\xd8\xff\xe0 not a png")
    palette = encode_png(_img(4, 4, 3))
    # flip the IHDR color type to 3 (palette) and re-CRC
    body = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    bad = (
        PNG_SIG
        + struct.pack(">I", len(body))
        + b"IHDR"
        + body
        + struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
        + palette[8 + 12 + 13 :]
    )
    with pytest.raises(NotImplementedError):
        decode_png(bad)


def test_wav_roundtrip_exact():
    t = np.arange(256)
    samples = ((t * 173) % 32768 - 16384).astype("<i2")
    got, rate = decode_wav(encode_wav(samples, rate=8000))
    assert rate == 8000
    assert np.array_equal(got, samples)


def test_nsvc_container_frame_extraction():
    frames = [_img(5, 4, 3, seed=s) for s in range(4)]
    blob = encode_video(frames)
    assert video_n_frames(blob) == 4
    for i, f in enumerate(frames):
        assert np.array_equal(decode_frame(blob, i), f)
    with pytest.raises(IndexError):
        decode_frame(blob, 4)


def test_resize_nearest_exact_indices():
    # 4x6 -> 2x3: source idx = floor(i*in/out) -> rows {0,2}, cols {0,2,4}
    a = np.arange(24, dtype=np.uint8).reshape(4, 6)
    got = resize_nearest(a, 3, 2)
    assert np.array_equal(got, a[[0, 2]][:, [0, 2, 4]])
    # identity when shapes match
    assert np.array_equal(resize_nearest(a, 6, 4), a)


def test_non_wave_riff_is_not_dispatched_as_audio():
    """A RIFF container that is not WAVE (e.g. AVI) must fall through
    to the env-blocked hook, not crash inside the wave module."""
    import pytest

    from ner_spark.ops.multimodal import decode_real

    avi = b"RIFF" + b"\x00\x00\x00\x24" + b"AVI " + b"\x00" * 16
    with pytest.raises(NotImplementedError):
        decode_real(avi, "video")


# -- property-based roundtrips (hypothesis, same style as
#    tests/tagger/test_decode.py) -------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([None, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, seed):
    a = _img(h, w, ch, seed=seed)
    assert np.array_equal(decode_png(encode_png(a)), a)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 512),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, size=n).astype("<i2")
    got, got_rate = decode_wav(encode_wav(samples, rate=rate))
    assert got_rate == rate
    assert np.array_equal(got, samples)


@settings(max_examples=15, deadline=None)
@given(
    n_frames=st.integers(1, 6),
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_nsvc_roundtrip_property(n_frames, h, w, seed):
    frames = [_img(h, w, 3, seed=seed + i) for i in range(n_frames)]
    blob = encode_video(frames)
    assert video_n_frames(blob) == n_frames
    for i, f in enumerate(frames):
        assert np.array_equal(decode_frame(blob, i), f)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    oh=st.integers(1, 16),
    ow=st.integers(1, 16),
)
def test_resize_nearest_property(h, w, oh, ow):
    """Output shape is exact, every output pixel exists in the input
    at the floor(i*in/out) index, and upscale-then-check stays pure
    integer indexing (no interpolation artifacts)."""
    a = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    got = resize_nearest(a, ow, oh)
    assert got.shape == (oh, ow)
    ys = (np.arange(oh) * h) // oh
    xs = (np.arange(ow) * w) // ow
    assert np.array_equal(got, a[ys][:, xs])


# -- baseline JPEG (ops/jpeg.py, numpy Huffman + DCT, T.81) -----------

from ner_spark.ops.jpeg import _C, decode_jpeg, encode_jpeg


def _smooth(h, w, ch=None):
    """JPEG-friendly smooth pattern (lossy codec: error bounds below
    are calibrated for low-frequency content; random noise would not
    compress meaningfully)."""
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    g = np.clip(128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0), 0, 255)
    if ch is None:
        return g.astype(np.uint8)
    return np.stack(
        [np.roll(g, 3 * c, axis=0) for c in range(ch)], axis=-1
    ).astype(np.uint8)


def test_jpeg_dct_basis_is_orthonormal():
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)


def test_jpeg_gray_roundtrip_bounded():
    a = _smooth(48, 64)
    d = decode_jpeg(encode_jpeg(a, 95))
    assert d.shape == a.shape and d.dtype == np.uint8
    assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 8


def test_jpeg_rgb_444_roundtrip_bounded():
    a = _smooth(48, 64, 3)
    d = decode_jpeg(encode_jpeg(a, 95))
    assert d.shape == a.shape
    assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 16


def test_jpeg_rgb_420_roundtrip_bounded():
    """4:2:0 exercises multi-block interleaved MCUs + chroma
    upsampling; the bound is looser (2×2 chroma averaging)."""
    a = _smooth(48, 64, 3)
    d = decode_jpeg(encode_jpeg(a, 95, "4:2:0"))
    assert d.shape == a.shape
    assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 32


def test_jpeg_non_multiple_of_8_dims_crop_exactly():
    a = _smooth(41, 53, 3)
    d = decode_jpeg(encode_jpeg(a, 90))
    assert d.shape == a.shape
    a2 = _smooth(41, 53)
    d2 = decode_jpeg(encode_jpeg(a2, 90, "4:2:0"))
    assert d2.shape == a2.shape


def test_jpeg_deterministic_bytes():
    a = _smooth(24, 16, 3)
    assert encode_jpeg(a, 90) == encode_jpeg(a, 90)
    assert encode_jpeg(a, 90) != encode_jpeg(a, 50)


def test_jpeg_restart_intervals_decode_identically():
    """RSTn markers (byte realignment + DC predictor reset) must not
    change the decoded pixels — same quantized coefficients, different
    entropy framing."""
    a = _smooth(48, 64, 3)
    d0 = decode_jpeg(encode_jpeg(a, 95))
    for ri in (1, 2, 5):
        di = decode_jpeg(encode_jpeg(a, 95, restart_interval=ri))
        assert np.array_equal(d0, di)


def test_jpeg_decode_real_dispatch_and_resize():
    from ner_spark.ops.multimodal import decode_real, resize_real

    a = _smooth(16, 24, 3)
    payload = encode_jpeg(a, 95)
    d = decode_real(payload, "image")
    assert d["kind"] == "image" and d["array"].shape == a.shape
    small = decode_png(resize_real(payload, 8, 8))
    assert small.shape == (8, 8, 3)


def test_jpeg_rejects_unsupported_and_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    # SOF2 (progressive) is SUPPORTED now; a progressive header with
    # no scans is a malformed stream, not an unimplemented format
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", 8, 8)
        + bytes([1, 1, 0x11, 0])
    )
    with pytest.raises(ValueError):
        decode_jpeg(sof2)
    # arithmetic-coded sequential (SOF9) still raises honestly
    with pytest.raises(NotImplementedError):
        decode_jpeg(sof2.replace(b"\xff\xc2", b"\xff\xc9", 1))


def test_jpeg_quality_monotone_error():
    """Lower quality → coarser quantization → error can only grow (on
    this fixed smooth fixture)."""
    a = _smooth(48, 64)

    def err(q):
        d = decode_jpeg(encode_jpeg(a, q))
        return int(np.abs(d.astype(int) - a.astype(int)).max())

    assert err(95) <= err(50) <= err(10)


def test_jpeg_malformed_streams_raise_valueerror_not_indexerror():
    """The docstring promises ValueError on malformed streams; lone
    trailing 0xFF, marker-without-length, and overrunning segment
    lengths must not escape as IndexError/struct.error."""
    good = encode_jpeg(_smooth(16, 16), 90)
    for bad in (
        b"\xff\xd8\xff",                     # lone 0xFF at end
        b"\xff\xd8\xff jpeg?",               # garbage marker + overrun len
        b"\xff\xd8\xff\xdb\x00",             # DQT length truncated
        good[: len(good) // 2],              # cut mid-stream
    ):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(bad)


def test_jpeg_fill_bytes_before_markers_are_legal():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker code.  Stuff some between segments of a valid stream and
    the decode must be unchanged."""
    a = _smooth(16, 24, 3)
    enc = encode_jpeg(a, 90)
    # insert fill bytes after SOI (before the first marker's 0xFF)
    padded = enc[:2] + b"\xff\xff\xff" + enc[2:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(enc))


# -- progressive JPEG (SOF2: spectral selection + successive approx) --

from ner_spark.ops.jpeg import encode_jpeg_progressive


def test_jpeg_progressive_parity_gray_and_rgb():
    """The parity contract: encode_jpeg_progressive carries the SAME
    quantized coefficients as encode_jpeg (shared _quantize_block),
    so decode of either stream must be pixel-identical."""
    for a in (_smooth(48, 64), _smooth(48, 64, 3)):
        base = decode_jpeg(encode_jpeg(a, 90))
        prog = decode_jpeg(encode_jpeg_progressive(a, 90))
        assert np.array_equal(base, prog)


def test_jpeg_progressive_parity_420_and_odd_dims():
    """4:2:0 exercises interleaved multi-block DC MCUs; odd dims
    exercise the spec-vs-padded block grid split (AC scans cover only
    ceil(dim/8) blocks while interleaved DC covers the MCU grid's
    dummy blocks)."""
    for h, w in ((48, 64), (41, 53), (49, 40)):
        a = _smooth(h, w, 3)
        base = decode_jpeg(encode_jpeg(a, 90, "4:2:0"))
        prog = decode_jpeg(encode_jpeg_progressive(a, 90, "4:2:0"))
        assert np.array_equal(base, prog)


def test_jpeg_progressive_sa_depths_and_restarts():
    """Successive-approximation depths 1 (spectral selection only)
    through 4, and RSTn intervals inside progressive scans (bit
    realignment + DC predictor + EOB-run reset)."""
    a = _smooth(40, 56, 3)
    base = decode_jpeg(encode_jpeg(a, 90, "4:2:0"))
    for levels in (1, 2, 3, 4):
        prog = decode_jpeg(
            encode_jpeg_progressive(a, 90, "4:2:0", levels=levels)
        )
        assert np.array_equal(base, prog), f"levels={levels}"
    for ri in (1, 3):
        prog = decode_jpeg(
            encode_jpeg_progressive(
                a, 90, "4:2:0", levels=3, restart_interval=ri
            )
        )
        assert np.array_equal(base, prog), f"restart={ri}"


def test_jpeg_progressive_noise_and_eobrun_extremes():
    """Noisy content drives the ZRL/new-coef/correction-bit paths;
    flat content accumulates long EOB runs across blocks (the
    (nbits<<4) EOB-run symbols the baseline tables don't even have)."""
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    flat = np.full((64, 64), 128, dtype=np.uint8)
    for a, q in ((noisy, 50), (noisy, 90), (flat, 90)):
        base = decode_jpeg(encode_jpeg(a, q))
        prog = decode_jpeg(encode_jpeg_progressive(a, q, levels=3))
        assert np.array_equal(base, prog)


def test_jpeg_progressive_decode_real_dispatch():
    """multimodal.decode_real's magic-byte dispatch reaches the
    progressive decoder with no special-casing."""
    from ner_spark.ops.multimodal import decode_real

    a = _smooth(16, 24, 3)
    d = decode_real(encode_jpeg_progressive(a, 90), "image")
    assert d["kind"] == "image"
    assert np.array_equal(d["array"], decode_jpeg(encode_jpeg(a, 90)))


def test_jpeg_progressive_malformed_and_unsupported_raise():
    a = _smooth(16, 16)
    enc = encode_jpeg_progressive(a, 90)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(enc[:40])  # cut inside the header segments
    # arithmetic-coded frame marker (SOF9) still raises honestly
    bad = enc.replace(b"\xff\xc2", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bad)
