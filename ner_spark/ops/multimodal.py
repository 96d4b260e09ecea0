"""Multimodal column plumbing (training-data pipeline face).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs.  The Spark-side plumbing — schema, partitioning, Arrow batch
shape, mapInPandas signatures — is real and tested.  Codecs come in
two tiers:

- **Real, stdlib-only** (ops/codecs.py): baseline PNG (zlib), 16-bit
  PCM WAV (wave), and the NSVC indexed video container — decode,
  resize, and frame-sample genuinely run on real bytes, and the
  ``real`` branch of ``mm_pipeline`` proves it externally (payloads
  are PNG/WAV/NSVC encodings of integer-arithmetic pixel patterns, so
  a plain-SQL oracle predicts every decoded dimension and pixel SUM —
  exact, no rounding).
- **Env-blocked hooks**: formats that need external codecs (MP3,
  H.264…) still raise NotImplementedError in
  ``decode_real``/``resize_real``/``sample_real`` — a production
  deployment plugs PIL/ffmpeg in consciously.  Baseline AND
  progressive JPEG decode for real since r5 (ops/jpeg.py, numpy
  Huffman + IDCT; SOF2 spectral selection + successive
  approximation, parity-pinned against the baseline decode) and the
  ``jpeg`` branch of ``mm_pipeline`` scores an encode→decode
  error-bound contract externally.

The md5-keyed deterministic fakes remain as the separate
decode/resize/frame-sample branches: they exercise the same plumbing
with payloads DuckDB can replay byte-for-byte.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ner_spark.io.read import table
from ner_spark.ops import register
from ner_spark.ops.probes import probes as _probes
from ner_spark.ops.probes import union_tagged as _union_tagged
from ner_spark.ops.probes import wrap as _wrap

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.StructType(
            [
                T.StructField("mime", T.StringType(), True),
                T.StructField("n_bytes", T.IntegerType(), False),
            ]
        ), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        # double, not float: the fake-decode features are exact
        # 6-decimal values, and double keeps the Spark schema identical
        # to the DuckDB oracle's DOUBLE[] for the driver compare
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: document text bytes as the opaque
    payload (the engine never looks inside payloads except in the
    decode UDF, so any bytes exercise the real plumbing)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_real(payload: bytes, kind: str):
    """REAL decode for the in-repo-supported formats, dispatched on
    magic bytes: PNG/JPEG → {'kind': 'image', 'array': uint8 ndarray},
    WAV → {'kind': 'audio', 'samples': int16 ndarray, 'rate': int},
    NSVC → {'kind': 'video', 'n_frames': int}.  Anything else (MP3,
    H.264…) needs an external codec — still intentionally
    unimplemented here (and non-baseline JPEG raises inside
    decode_jpeg)."""
    from ner_spark.ops import codecs

    if payload[:8] == codecs.PNG_SIG:
        return {"kind": "image", "array": codecs.decode_png(payload)}
    if payload[:2] == codecs.JPEG_SIG:
        return {"kind": "image", "array": codecs.decode_jpeg(payload)}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, rate = codecs.decode_wav(payload)
        return {"kind": "audio", "samples": samples, "rate": rate}
    if payload[:4] == codecs.NSVC_MAGIC:
        return {"kind": "video", "n_frames": codecs.video_n_frames(payload)}
    raise NotImplementedError(
        "payload is not PNG/JPEG/WAV/NSVC; plug in PIL/ffmpeg for "
        "other formats and route _decode_fn through this"
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in: 'decoded' properties derived from a
    content hash, so tests pin exact values and retries agree."""
    h = hashlib.md5(payload or b"").digest()
    w = 16 + h[0] % 240
    return {
        "width": w if kind == "image" else None,
        "height": 16 + h[1] % 240 if kind == "image" else None,
        "n_frames": 1 + h[2] % 32 if kind == "video" else None,
        "feature": [round(b / 255.0, 6) for b in h[:8]],
    }


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract — the real Arrow plumbing
    (iterator form, batch-shaped, narrow output)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                d = _fake_decode(bytes(payload), kind)
                out.append(
                    (
                        int(mid),
                        kind,
                        d["width"],
                        d["height"],
                        d["n_frames"],
                        d["feature"],
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    # No repartition: decode is embarrassingly parallel and needs no
    # co-partitioning — a hash exchange here would shuffle every
    # payload byte (at 100 TB of media, the single biggest avoidable
    # shuffle).  Input-file splits already bound partition size via
    # spark.sql.files.maxPartitionBytes; plan-asserted shuffle-free in
    # tests/unit_ops/test_plans.py.
    return media.mapInPandas(fn, FEATURE_SCHEMA)


def _mm_features_oracle() -> str:
    """The fake decode is a pure function of md5(payload) and payload
    is the utf-8 text, so DuckDB can replay it exactly: hex-pair →
    byte via strpos arithmetic, then the same width/height/frames/
    feature formulas as _fake_decode.  The 8-element feature vector is
    emitted as (feature_idx, value) ROWS, not an array column: the
    driver canonicalizes results by sorting on every column, and a
    top-level array makes pandas sort_values raise
    ``TypeError: unhashable type: 'list'`` (CORRECTNESS_r02
    mm_features).  All scalars → sortable → comparable."""

    def byte(i: str) -> str:  # 0-based byte of the md5 digest, i is SQL
        hi = f"strpos('0123456789abcdef', substr(h, 2 * ({i}) + 1, 1)) - 1"
        lo = f"strpos('0123456789abcdef', substr(h, 2 * ({i}) + 2, 1)) - 1"
        return f"(({hi}) * 16 + ({lo}))"

    return f"""
    WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
         idx AS (SELECT CAST(range AS INT) AS feature_idx FROM range(8))
    SELECT doc_id AS media_id,
           (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
           CASE WHEN doc_id % 3 = 0
                THEN CAST(16 + {byte('0')} % 240 AS INT) END AS width,
           CASE WHEN doc_id % 3 = 0
                THEN CAST(16 + {byte('1')} % 240 AS INT) END AS height,
           CASE WHEN doc_id % 3 = 2
                THEN CAST(1 + {byte('2')} % 32 AS INT) END AS n_frames,
           feature_idx,
           round({byte('feature_idx')} / 255.0, 6) AS feature_value
    FROM m CROSS JOIN idx
    """


def mm_features(spark, sf_dir):
    """Decode/feature-extract over the opaque media column.  The codec
    is the documented deterministic fake (md5-keyed), which makes the
    whole mapInPandas path externally checkable: DuckDB replays the
    same bytes → the driver verifies the Arrow plumbing end-to-end.
    Feature vector posexploded to scalar rows so the result sorts
    (driver canonicalization can't sort an array column)."""
    d = table(spark, sf_dir, "documents")
    feats = decode_features(media_from_documents(d))
    return feats.select(
        "media_id",
        "kind",
        "width",
        "height",
        "n_frames",
        F.posexplode("feature").alias("feature_idx", "feature_value"),
    )


_MM_META_SQL = """
    SELECT CAST(doc_id % 3 AS INT) AS kind_idx,
           count(*) AS n,
           CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
    FROM documents GROUP BY kind_idx
"""


def mm_meta(spark, sf_dir):
    """Metadata aggregation over the opaque column (JVM-only: byte
    lengths, kind distribution) — oracle-checked via the utf-8 byte
    length (DuckDB strlen counts bytes)."""
    d = table(spark, sf_dir, "documents")
    m = media_from_documents(d)
    return m.groupBy(
        F.pmod(F.col("media_id"), F.lit(3)).cast("int").alias("kind_idx")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
    )


# ---------------------------------------------------------------------------
# Resize + frame-sample (the remaining multimodal pipeline ops): real
# mapInPandas plumbing, stubbed codecs with deterministic md5-keyed
# fakes, scalar fingerprints for the external compare.
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("resized", T.BinaryType(), False),
        T.StructField("resized_fp", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
        T.StructField("frame_fp", T.StringType(), False),
    ]
)


def resize_real(payload: bytes, w: int, h: int) -> bytes:
    """REAL image resize for PNG/JPEG payloads (decode →
    integer-exact nearest-neighbor → re-encode).  JPEG input
    re-encodes as PNG: the resize output feeds downstream EXACT
    contracts, and a second lossy generation would break them.
    Other formats need PIL."""
    from ner_spark.ops import codecs

    if payload[:8] == codecs.PNG_SIG:
        return codecs.encode_png(
            codecs.resize_nearest(codecs.decode_png(payload), w, h)
        )
    if payload[:2] == codecs.JPEG_SIG:
        return codecs.encode_png(
            codecs.resize_nearest(codecs.decode_jpeg(payload), w, h)
        )
    raise NotImplementedError(
        "payload is not PNG/JPEG; plug in PIL for other formats and "
        "route resize_media's inner call through this"
    )


def sample_real(payload: bytes, frame_idx: int) -> bytes:
    """REAL frame extraction for NSVC payloads (indexed ranged read →
    the frame's PNG bytes); real video codecs need ffmpeg/pyav."""
    from ner_spark.ops import codecs

    if payload[:4] == codecs.NSVC_MAGIC:
        frame = codecs.decode_frame(payload, frame_idx)
        return codecs.encode_png(frame)
    raise NotImplementedError(
        "payload is not NSVC; plug in ffmpeg/pyav for real video "
        "formats and route sample_frames' inner call through this"
    )


def resize_media(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Resize images: mapInPandas over the opaque payload, one output
    row per image.  Fake codec: the 'resized' bytes are the md5 of
    (content-hash ‖ :resized:WxH) — a pure function of the input, so
    retries agree and DuckDB can replay the fingerprint.  Shuffle-free
    like decode_features (plan-asserted): resize is embarrassingly
    parallel, payload bytes never cross an exchange."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                h = hashlib.md5(bytes(payload)).hexdigest()
                rb = hashlib.md5(
                    f"{h}:resized:{out_w}x{out_h}".encode()
                ).digest()
                out.append(
                    (int(mid), out_w, out_h, rb, rb.hex())
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        fn, RESIZE_SCHEMA
    )


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Frame-sample videos: mapInPandas emitting one row per sampled
    frame (every ``stride``-th of the fake-decoded n_frames).  Fake
    codec: frame bytes = md5(content-hash ‖ :frame: ‖ idx).  The fan-out
    happens INSIDE the UDF batch (no explode over payload copies)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                h = hashlib.md5(bytes(payload)).digest()
                n_frames = 1 + h[2] % 32
                hx = hashlib.md5(bytes(payload)).hexdigest()
                for idx in range(0, n_frames, stride):
                    fb = hashlib.md5(f"{hx}:frame:{idx}".encode()).digest()
                    out.append((int(mid), idx, fb, fb.hex()))
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        fn, FRAME_SCHEMA
    )


def _mm_resize_sql() -> str:
    return """
    SELECT doc_id AS media_id,
           8 AS out_w, 8 AS out_h,
           md5(md5(text) || ':resized:8x8') AS resized_fp
    FROM documents WHERE doc_id % 3 = 0
    """


def _mm_frames_sql() -> str:
    def byte(i: int) -> str:
        hi = f"strpos('0123456789abcdef', substr(h, {2 * i + 1}, 1)) - 1"
        lo = f"strpos('0123456789abcdef', substr(h, {2 * i + 2}, 1)) - 1"
        return f"(({hi}) * 16 + ({lo}))"

    return f"""
    WITH m AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 2
    ), nf AS (
      SELECT doc_id, h, 1 + {byte(2)} % 32 AS n_frames FROM m
    ), idx AS (SELECT CAST(range AS INT) AS frame_idx FROM range(32))
    SELECT doc_id AS media_id, frame_idx,
           md5(h || ':frame:' || frame_idx) AS frame_fp
    FROM nf JOIN idx ON frame_idx < n_frames AND frame_idx % 4 = 0
    """


# ---------------------------------------------------------------------------
# REAL-codec branch: PNG/WAV/NSVC payloads whose pixel/sample content
# is pure integer arithmetic in doc_id, so decode → dims + SUM is
# SQL-predictable EXACTLY (no floats, no rounding).  Two chained
# mapInPandas stages (encode, then decode/resize/sample via the real
# hooks) — the payload bytes cross the Arrow boundary twice and no
# exchange, same shuffle-free shape as the fake branches.
# ---------------------------------------------------------------------------

REAL_IMG_W, REAL_IMG_H = 24, 16
REAL_AUD_N, REAL_AUD_RATE = 256, 16000
REAL_VID_W, REAL_VID_H = 16, 12

REAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("idx", T.IntegerType(), False),
        T.StructField("dim_a", T.IntegerType(), False),
        T.StructField("dim_b", T.IntegerType(), False),
        T.StructField("px_sum", T.LongType(), False),
    ]
)


def _real_px(d: int, w: int, h: int, f: int = 0):
    """(h, w, 3) uint8 pattern px[y][x][c] = (7d + x + 3y + 11c + 13f)
    % 256 — the integer formula _MM_REAL_SQL replays."""
    import numpy as np

    x, y, c = np.arange(w), np.arange(h), np.arange(3)
    base = d * 7 + x[None, :, None] + 3 * y[:, None, None] + 11 * c[None, None, :]
    return ((base + 13 * f) % 256).astype("uint8")


def real_media_from_documents(docs: DataFrame) -> DataFrame:
    """Encode stage: REAL PNG/WAV/NSVC payloads, deterministic integer
    pixel/sample patterns in doc_id (formulas mirrored in
    _MM_REAL_SQL).  Only doc_id is read — text never enters this
    branch."""
    from ner_spark.ops import codecs

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                k = d % 3
                if k == 0:
                    payload = codecs.encode_png(
                        _real_px(d, REAL_IMG_W, REAL_IMG_H)
                    )
                    kind, mime = "image", "image/png"
                elif k == 1:
                    t = np.arange(REAL_AUD_N, dtype=np.int64)
                    samples = (d * 31 + t * 17) % 32768 - 16384
                    payload = codecs.encode_wav(samples, REAL_AUD_RATE)
                    kind, mime = "audio", "audio/wav"
                else:
                    frames = [
                        _real_px(d, REAL_VID_W, REAL_VID_H, f)
                        for f in range(1 + d % 5)
                    ]
                    payload = codecs.encode_video(frames)
                    kind, mime = "video", "video/x-nsvc"
                rows.append((d, kind, payload, (mime, len(payload))))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return docs.select("doc_id").mapInPandas(fn, MEDIA_SCHEMA)


def mm_real(spark, sf_dir) -> DataFrame:
    """Decode stage over the real payloads, via the REAL hooks
    (decode_real / resize_real / sample_real).  Emits one
    integer-exact contract row per decoded object:

    - image idx 0: decoded (w, h, pixel sum); idx 1: resize_real to
      8×8 (nearest, integer index map) re-decoded (8, 8, pixel sum);
    - audio idx 0: (n_samples, rate, sample sum);
    - video idx f: every stride-2 sampled frame's (w, h, pixel sum).

    A broken filter inversion, a mis-sliced container frame, or an
    off-by-one in the resize index map shifts a SUM and the oracle row
    mismatches — decode correctness is externally falsifiable without
    shipping arrays through the driver compare."""
    from ner_spark.ops import codecs

    media = real_media_from_documents(table(spark, sf_dir, "documents"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                mid, payload = int(mid), bytes(payload)
                d = decode_real(payload, kind)
                if d["kind"] == "image":
                    arr = d["array"]
                    out.append(
                        (mid, kind, 0, arr.shape[1], arr.shape[0],
                         int(arr.sum(dtype="int64")))
                    )
                    small = codecs.decode_png(resize_real(payload, 8, 8))
                    out.append(
                        (mid, kind, 1, 8, 8, int(small.sum(dtype="int64")))
                    )
                elif d["kind"] == "audio":
                    s = d["samples"]
                    out.append(
                        (mid, kind, 0, len(s), d["rate"],
                         int(s.sum(dtype="int64")))
                    )
                else:
                    for f in range(0, d["n_frames"], 2):
                        fr = codecs.decode_png(sample_real(payload, f))
                        out.append(
                            (mid, kind, f, fr.shape[1], fr.shape[0],
                             int(fr.sum(dtype="int64")))
                        )
            yield pd.DataFrame(
                out, columns=[f.name for f in REAL_SCHEMA.fields]
            )

    return media.mapInPandas(fn, REAL_SCHEMA)


# JPEG contract branch: the decoded array of a LOSSY codec is not
# SQL-predictable, so the externally-scored claims are dims + an
# error-bound boolean — deterministic for the fixed corpus (the
# encoder has no RNG; measured max |err| = 22 at q95 4:4:4 over the
# first 1,000 image docs, bound 48 = 2× margin).
JPEG_ERR_BOUND = 48

JPEG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("err_ok", T.BooleanType(), False),
        T.StructField("prog_ok", T.BooleanType(), False),
    ]
)


def mm_jpeg(spark, sf_dir) -> DataFrame:
    """JPEG encode→decode contract over the image-subset docs: the
    SAME deterministic pixel pattern as the PNG real branch is
    compressed through ops/jpeg.py (numpy Huffman + DCT, q=95 4:4:4),
    decoded back through the decode_real dispatch, and each row pins
    dims + max-abs-error ≤ JPEG_ERR_BOUND.  A broken Huffman table,
    zigzag, dequant, or IDCT blows the bound immediately.  ``prog_ok``
    additionally pins the PROGRESSIVE (SOF2) path: the spectral-
    selection + successive-approximation stream of the same input
    must decode pixel-identical to the baseline stream (they carry
    the same quantized coefficients by construction) — while the SQL
    oracle predicts (media_id, dims, TRUE, TRUE) rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ner_spark.ops import codecs

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                a = _real_px(d, REAL_IMG_W, REAL_IMG_H)
                dec = decode_real(codecs.encode_jpeg(a, 95), "image")["array"]
                # dims first: on a crop/padding regression the error
                # subtraction would broadcast-crash the task instead
                # of emitting the falsified row
                ok = dec.shape == a.shape
                if ok:
                    err = int(np.abs(dec.astype(int) - a.astype(int)).max())
                    ok = err <= JPEG_ERR_BOUND
                prog = decode_real(
                    codecs.encode_jpeg_progressive(a, 95, levels=2), "image"
                )["array"]
                prog_ok = bool(np.array_equal(prog, dec))
                rows.append((d, dec.shape[1], dec.shape[0], ok, prog_ok))
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_SCHEMA.fields]
            )

    docs = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    ).select("doc_id")
    return docs.mapInPandas(fn, JPEG_SCHEMA)


_MM_JPEG_SQL = f"""
    SELECT doc_id AS media_id, {REAL_IMG_W} AS width,
           {REAL_IMG_H} AS height, TRUE AS err_ok, TRUE AS prog_ok
    FROM documents WHERE doc_id % 3 = 0
"""

_MM_REAL_SQL = f"""
    SELECT d.doc_id AS media_id, 'image' AS kind, 0 AS idx,
           {REAL_IMG_W} AS dim_a, {REAL_IMG_H} AS dim_b,
           CAST(sum((d.doc_id*7 + x.x + 3*y.y + 11*c.c) % 256)
                AS BIGINT) AS px_sum
    FROM documents d, range({REAL_IMG_W}) x(x), range({REAL_IMG_H}) y(y),
         range(3) c(c)
    WHERE d.doc_id % 3 = 0 GROUP BY d.doc_id
    UNION ALL
    SELECT d.doc_id, 'image', 1, 8, 8,
           CAST(sum((d.doc_id*7 + 3*j.j + 6*i.i + 11*c.c) % 256) AS BIGINT)
    FROM documents d, range(8) j(j), range(8) i(i), range(3) c(c)
    WHERE d.doc_id % 3 = 0 GROUP BY d.doc_id
    UNION ALL
    SELECT d.doc_id, 'audio', 0, {REAL_AUD_N}, {REAL_AUD_RATE},
           CAST(sum((d.doc_id*31 + t.t*17) % 32768 - 16384) AS BIGINT)
    FROM documents d, range({REAL_AUD_N}) t(t)
    WHERE d.doc_id % 3 = 1 GROUP BY d.doc_id
    UNION ALL
    SELECT d.doc_id, 'video', CAST(f.f AS INT), {REAL_VID_W}, {REAL_VID_H},
           CAST(sum((d.doc_id*7 + x.x + 3*y.y + 11*c.c + 13*f.f) % 256)
                AS BIGINT)
    FROM documents d, range(5) f(f), range({REAL_VID_W}) x(x),
         range({REAL_VID_H}) y(y), range(3) c(c)
    WHERE d.doc_id % 3 = 2 AND f.f % 2 = 0 AND f.f < 1 + d.doc_id % 5
    GROUP BY d.doc_id, f.f
"""


@register(
    "mm_pipeline",
    oracle=_probes(
        _wrap("meta", ["kind_idx", "n", "total_bytes"], _MM_META_SQL),
        _wrap(
            "features",
            ["media_id", "kind", "width", "height", "n_frames",
             "feature_idx", "feature_value"],
            _mm_features_oracle(),
            dec={"feature_value": 6},
        ),
        _wrap("resize", ["media_id", "out_w", "out_h", "resized_fp"],
              _mm_resize_sql()),
        _wrap("frames", ["media_id", "frame_idx", "frame_fp"],
              _mm_frames_sql()),
        _wrap("real",
              ["media_id", "kind", "idx", "dim_a", "dim_b", "px_sum"],
              _MM_REAL_SQL),
        _wrap("jpeg", ["media_id", "width", "height", "err_ok", "prog_ok"],
              _MM_JPEG_SQL),
    ),
)
def mm_pipeline(spark, sf_dir):
    """The full multimodal pipeline as one composite probe query:
    metadata aggregation (JVM-only), decode/feature-extract, image
    resize, and video frame-sampling over md5-keyed deterministic
    fakes DuckDB replays byte-for-byte, PLUS the ``real`` branch —
    actual PNG/WAV/NSVC encode→decode→resize→frame-sample through the
    stdlib codecs (ops/codecs.py), whose integer pixel patterns make
    every decoded dimension and pixel sum SQL-predictable exactly —
    PLUS the r5 ``jpeg`` branch: the numpy JPEG codec's
    encode→decode error-bound contract and the progressive-vs-
    baseline pixel-parity bit (mm_jpeg)."""
    d = table(spark, sf_dir, "documents")
    m = media_from_documents(d)
    return _union_tagged(
        [
            ("meta", mm_meta(spark, sf_dir), None),
            ("features", mm_features(spark, sf_dir), {"feature_value": 6}),
            (
                "resize",
                resize_media(m).select(
                    "media_id", "out_w", "out_h", "resized_fp"
                ),
                None,
            ),
            (
                "frames",
                sample_frames(m).select("media_id", "frame_idx", "frame_fp"),
                None,
            ),
            ("real", mm_real(spark, sf_dir), None),
            ("jpeg", mm_jpeg(spark, sf_dir), None),
        ]
    )
