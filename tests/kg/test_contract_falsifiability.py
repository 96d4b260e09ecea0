"""The kg_contracts invariants must be FALSIFIABLE: each check, fed a
frame with one planted violation, must count it.  (The catalog query
proves the real pipeline's counts are zero; these tests prove a zero
means something.)"""

from __future__ import annotations

import pytest

from ner_spark.ops.kg_queries import (
    byte_exact_violations,
    duplicate_id_violations,
    orphan_violations,
    span_overlap_violations,
    triple_ref_violations,
)

MENTION_SCHEMA = (
    "conv_id string, turn_idx int, start int, end int, "
    "surface string, label string, mention_id long"
)


@pytest.fixture()
def clean(spark):
    txt = spark.createDataFrame(
        [("c0", 0, "alice met bob"), ("c0", 1, "bob left")],
        "conv_id string, turn_idx int, text string",
    )
    mentions = spark.createDataFrame(
        [
            ("c0", 0, 0, 5, "alice", "PER", 1),
            ("c0", 0, 10, 13, "bob", "PER", 2),
            ("c0", 1, 0, 3, "bob", "PER", 3),
        ],
        MENTION_SCHEMA,
    )
    triples = spark.createDataFrame(
        [(1, 2)], "subj_mention_id long, obj_mention_id long"
    )
    return txt, mentions, triples


def test_clean_frames_have_zero_violations(spark, clean):
    txt, mentions, triples = clean
    assert byte_exact_violations(mentions, txt).count() == 0
    assert orphan_violations(mentions, txt).count() == 0
    assert duplicate_id_violations(mentions).count() == 0
    assert span_overlap_violations(mentions).count() == 0
    assert triple_ref_violations(triples, mentions).count() == 0


def test_byte_exact_catches_wrong_surface(spark, clean):
    txt, mentions, _ = clean
    bad = mentions.replace("alice", "alicia", subset=["surface"])
    assert byte_exact_violations(bad, txt).count() == 1


def test_byte_exact_catches_out_of_bounds_span(spark, clean):
    txt, mentions, _ = clean
    from pyspark.sql import functions as F

    # end beyond the text: substr truncates, surface no longer matches
    bad = mentions.withColumn(
        "end", F.when(F.col("mention_id") == 3, 99).otherwise(F.col("end"))
    )
    assert byte_exact_violations(bad, txt).count() == 1


def test_orphans_catch_missing_turn(spark, clean):
    txt, mentions, _ = clean
    assert orphan_violations(mentions, txt.filter("turn_idx = 0")).count() == 1


def test_duplicate_ids_caught(spark, clean):
    _, mentions, _ = clean
    from pyspark.sql import functions as F

    bad = mentions.withColumn(
        "mention_id",
        F.when(F.col("mention_id") == 3, 1).otherwise(F.col("mention_id")),
    )
    assert duplicate_id_violations(bad).count() == 1


def test_span_overlap_caught(spark, clean):
    _, mentions, _ = clean
    from pyspark.sql import functions as F

    # stretch mention 1 (ends at 5) into mention 2's [10, 13) range
    bad = mentions.withColumn(
        "end", F.when(F.col("mention_id") == 1, 11).otherwise(F.col("end"))
    )
    assert span_overlap_violations(bad).count() == 1
    # touching spans ([0,10) then [10,13)) are NOT a violation
    ok = mentions.withColumn(
        "end", F.when(F.col("mention_id") == 1, 10).otherwise(F.col("end"))
    )
    assert span_overlap_violations(ok).count() == 0


def test_triple_refs_catch_dangling_id(spark, clean):
    _, mentions, triples = clean
    dangling = spark.createDataFrame(
        [(1, 99)], "subj_mention_id long, obj_mention_id long"
    )
    assert triple_ref_violations(triples.unionAll(dangling), mentions).count() == 1
