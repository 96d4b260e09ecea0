"""UDF-surface exactness (U1/U3/U4/U5) vs built-in equivalents, and
multimodal plumbing checks."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ner_spark.io.read import table
from ner_spark.ops import all_queries
from tests.conftest import SF_ORACLE

QUERIES = all_queries()


def test_udf_scalar_matches_builtin(spark):
    got = QUERIES["udf_scalar"](spark, SF_ORACLE).toPandas()
    exp = (
        table(spark, SF_ORACLE, "documents")
        .select("doc_id", F.length("text").alias("cp_len"))
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True).astype({"cp_len": "int64"}),
        exp.sort_values("doc_id").reset_index(drop=True).astype({"cp_len": "int64"}),
    )


def test_udf_grouped_agg_matches_sql(spark):
    """The UDAF's 4-decimal fixed-point integer (×10⁴) vs the float
    SQL formula: agree within one last-place unit of the 4th decimal
    (the UDAF is exact integer cents; the SQL float sum carries ulp
    noise)."""
    got = QUERIES["udf_grouped_agg"](spark, SF_ORACLE).toPandas()
    li = table(spark, SF_ORACLE, "lineitem")
    exp = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity"),
                4,
            ).alias("wavg_price")
        )
        .toPandas()
    )
    key = "l_returnflag"
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert (
        abs(g["wavg_price_4dp"] / 10_000.0 - e["wavg_price"]) < 2e-4
    ).all()


def test_udf_grouped_map_profile(spark):
    got = QUERIES["udf_grouped_map"](spark, SF_ORACLE)
    n_orders = (
        table(spark, SF_ORACLE, "lineitem").select("l_orderkey").distinct().count()
    )
    assert got.count() == n_orders
    row = got.filter(F.col("n_lines") > 1).first()
    assert row["max_step"] >= 0.0


def test_udtf_pairs_counts(spark):
    got = QUERIES["udtf_pairs"](spark, SF_ORACLE)
    pdf = got.groupBy("l_orderkey").count().toPandas()
    # n names in [2,6] → C(n,2) pairs in [1,15]
    assert pdf["count"].between(1, 15).all()
    one = got.first()
    assert one["a"] < one["b"]


def test_mm_features_plumbing(spark):
    from ner_spark.ops.multimodal import decode_features, media_from_documents

    docs_df = table(spark, SF_ORACLE, "documents")
    docs = docs_df.count()
    # the mapInPandas decode itself: one row per media item, 8-dim
    # feature vector (the Arrow batch plumbing)
    raw = decode_features(media_from_documents(docs_df)).toPandas()
    assert len(raw) == docs
    assert set(raw["kind"]) <= {"image", "audio", "video"}
    img = raw[raw["kind"] == "image"]
    assert img["width"].notna().all() and img["height"].notna().all()
    aud = raw[raw["kind"] == "audio"]
    assert aud["width"].isna().all()
    assert raw["feature"].map(len).eq(8).all()
    # the features query posexplodes to scalar rows (driver-sortable)
    from ner_spark.ops.multimodal import mm_features

    feats = mm_features(spark, SF_ORACLE).toPandas()
    assert len(feats) == docs * 8
    assert {"feature_idx", "feature_value"} <= set(feats.columns)
    # deterministic: rerun equals
    again = mm_features(spark, SF_ORACLE).toPandas()
    key = ["media_id", "feature_idx"]
    pd.testing.assert_frame_equal(
        feats.sort_values(key).reset_index(drop=True),
        again.sort_values(key).reset_index(drop=True),
    )


def test_mm_resize_and_frames_plumbing(spark):
    """Resize + frame-sample: real mapInPandas over the opaque payload,
    deterministic fakes — fingerprints are pure functions of content."""
    import hashlib

    from ner_spark.ops.multimodal import (
        media_from_documents,
        resize_media,
        sample_frames,
    )

    m = media_from_documents(table(spark, SF_ORACLE, "documents"))
    rs = resize_media(m).toPandas()
    docs = m.toPandas()
    images = docs[docs["kind"] == "image"]
    assert len(rs) == len(images)
    assert (rs["out_w"] == 8).all() and (rs["out_h"] == 8).all()
    # fingerprint == md5(md5(payload) || ':resized:8x8'), binary matches
    one = rs.iloc[0]
    payload = bytes(
        images[images["media_id"] == one["media_id"]]["payload"].iloc[0]
    )
    h = hashlib.md5(payload).hexdigest()
    assert one["resized_fp"] == hashlib.md5(
        f"{h}:resized:8x8".encode()
    ).hexdigest()
    assert bytes(one["resized"]).hex() == one["resized_fp"]

    fr = sample_frames(m).toPandas()
    videos = docs[docs["kind"] == "video"]
    assert set(fr["media_id"]) == set(videos["media_id"])
    assert (fr["frame_idx"] % 4 == 0).all()
    # per-video frame count = ceil(n_frames / stride), n_frames ≤ 32
    per = fr.groupby("media_id")["frame_idx"].count()
    assert per.between(1, 8).all()


def test_mm_decode_real_is_guarded():
    import pytest

    from ner_spark.ops.multimodal import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(b"x", "image")


def test_mm_real_codec_branch_end_to_end(spark):
    """The ``real`` branch pushes actual PNG/WAV/NSVC bytes through
    two chained mapInPandas stages and decodes them with the stdlib
    codecs.  Recompute a sample of expected (dims, pixel/sample sum)
    rows independently in-process -- a broken filter inversion,
    container slice, or resize index map would shift a sum."""
    import numpy as np

    from ner_spark.ops.multimodal import (
        REAL_AUD_N,
        REAL_AUD_RATE,
        REAL_IMG_H,
        REAL_IMG_W,
        REAL_VID_H,
        REAL_VID_W,
        _real_px,
        mm_real,
    )

    got = {
        (int(r.media_id), int(r.idx)): (
            r.kind, int(r.dim_a), int(r.dim_b), int(r.px_sum)
        )
        for r in mm_real(spark, SF_ORACLE).collect()
    }
    n_docs = table(spark, SF_ORACLE, "documents").count()
    assert len(got) > n_docs  # images emit 2 rows each

    for d in range(12):  # four of each kind
        k = d % 3
        if k == 0:
            full = _real_px(d, REAL_IMG_W, REAL_IMG_H)
            assert got[(d, 0)] == (
                "image", REAL_IMG_W, REAL_IMG_H, int(full.sum())
            )
            small = full[(np.arange(8) * REAL_IMG_H) // 8][
                :, (np.arange(8) * REAL_IMG_W) // 8
            ]
            assert got[(d, 1)] == ("image", 8, 8, int(small.sum()))
        elif k == 1:
            t = np.arange(REAL_AUD_N, dtype=np.int64)
            s = (d * 31 + t * 17) % 32768 - 16384
            assert got[(d, 0)] == (
                "audio", REAL_AUD_N, REAL_AUD_RATE, int(s.sum())
            )
        else:
            for f in range(0, 1 + d % 5, 2):
                fr = _real_px(d, REAL_VID_W, REAL_VID_H, f)
                assert got[(d, f)] == (
                    "video", REAL_VID_W, REAL_VID_H, int(fr.sum())
                )


def test_mm_real_hooks_dispatch_and_guard(spark):
    """decode_real/resize_real/sample_real really decode the stdlib
    formats and still raise for formats that need external codecs."""
    import numpy as np
    import pytest

    from ner_spark.ops.codecs import (
        decode_png,
        encode_png,
        encode_video,
        encode_wav,
    )
    from ner_spark.ops.multimodal import (
        decode_real,
        resize_real,
        sample_real,
    )

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    d = decode_real(encode_png(img), "image")
    assert d["kind"] == "image" and np.array_equal(d["array"], img)

    samples = np.arange(-8, 8, dtype="<i2")
    d = decode_real(encode_wav(samples, 8000), "audio")
    assert d["kind"] == "audio" and d["rate"] == 8000
    assert np.array_equal(d["samples"], samples)

    vid = encode_video([img, img + 1])
    assert decode_real(vid, "video") == {"kind": "video", "n_frames": 2}
    assert np.array_equal(decode_png(sample_real(vid, 1)), img + 1)

    small = decode_png(resize_real(encode_png(img), 3, 2))
    assert np.array_equal(small, img[[0, 2]][:, [0, 2, 4]])

    # JPEG dispatches to the real in-repo codec now (ops/jpeg.py):
    # a valid stream decodes, a truncated one is a MALFORMED error
    # (ValueError), no longer an unimplemented-format raise.
    from ner_spark.ops.jpeg import encode_jpeg

    d = decode_real(encode_jpeg(img, 95), "image")
    assert d["kind"] == "image" and d["array"].shape == img.shape
    assert int(np.abs(d["array"].astype(int) - img.astype(int)).max()) <= 24
    with pytest.raises(ValueError):
        decode_real(b"\xff\xd8\xff jpeg?", "image")

    for fn in (
        lambda: resize_real(b"GIF89a...", 2, 2),
        lambda: sample_real(b"\x00\x00\x00\x18ftypmp42", 0),
    ):
        with pytest.raises(NotImplementedError):
            fn()
