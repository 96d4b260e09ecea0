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
