"""Multimodal column plumbing (training-data pipeline face).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs.  The Spark-side plumbing — schema, partitioning, Arrow batch
shape, mapInPandas signatures — is real and tested; the actual codec
calls are STUBBED (the sandbox has no image/audio libraries): decode
is a clearly-marked deterministic fake keyed on the byte content, and
`decode_real` raises NotImplementedError so a production deployment
must plug a codec in consciously.
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
    """Production codec hook — intentionally unimplemented here."""
    raise NotImplementedError(
        "no image/audio codecs in this environment; plug in PIL/ffmpeg "
        "and route _decode_fn through this"
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
    """Production image-resize hook — intentionally unimplemented."""
    raise NotImplementedError(
        "no image codecs in this environment; plug in PIL and route "
        "resize_media's inner call through this"
    )


def sample_real(payload: bytes, frame_idx: int) -> bytes:
    """Production frame-extract hook — intentionally unimplemented."""
    raise NotImplementedError(
        "no video codecs in this environment; plug in ffmpeg/pyav and "
        "route sample_frames' inner call through this"
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
    ),
)
def mm_pipeline(spark, sf_dir):
    """The full multimodal pipeline as one composite probe query:
    metadata aggregation (JVM-only), decode/feature-extract, image
    resize, and video frame-sampling — every codec a documented
    deterministic fake over real mapInPandas plumbing, every branch
    replayed exactly by DuckDB from the same bytes."""
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
        ]
    )
