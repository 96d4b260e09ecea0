"""Streaming face: batch/stream parity on the same fixture (the
windowed aggregates must produce identical results through readStream
as through the batch groupBy), and end-to-end stream → tagger →
committed tables."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ner_spark.fixtures.transcripts import transcripts_df
from ner_spark.streaming import face

N_CONVS = 50


@pytest.fixture(scope="module")
def transcript_files(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    transcripts_df(spark, N_CONVS).repartition(6).write.mode("overwrite").parquet(d)
    return d


def _drain(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_tumbling_parity(spark, transcript_files, tmp_path):
    stream = face.stream_transcripts(spark, transcript_files)
    _drain(face.tumbling_counts(stream), tmp_path, "tumble")
    got = spark.sql("SELECT * FROM tumble").toPandas()
    batch = (
        spark.read.parquet(transcript_files)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "role")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("wstart"), "role", "n")
        .toPandas()
    )
    key = ["wstart", "role"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        batch.sort_values(key).reset_index(drop=True),
    )


def test_sliding_parity(spark, transcript_files, tmp_path):
    """X2: sliding-window stream == the identical batch groupBy (each
    event lands in width/slide = 2 windows)."""
    stream = face.stream_transcripts(spark, transcript_files)
    _drain(face.sliding_counts(stream), tmp_path, "slide")
    got = spark.sql("SELECT * FROM slide").toPandas()
    batch = (
        spark.read.parquet(transcript_files)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
        .toPandas()
    )
    key = ["wstart"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        batch.sort_values(key).reset_index(drop=True),
    )


def test_session_parity(spark, transcript_files, tmp_path):
    stream = face.stream_transcripts(spark, transcript_files)
    _drain(face.session_counts(stream), tmp_path, "sess")
    got = spark.sql("SELECT * FROM sess").toPandas()
    batch = (
        spark.read.parquet(transcript_files)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select("conv_id", F.col("w.start").alias("session_start"), "n_turns")
        .toPandas()
    )
    key = ["conv_id", "session_start"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        batch.sort_values(key).reset_index(drop=True),
    )


def test_stateful_conversation_progress(spark, transcript_files, tmp_path):
    """X6: final per-conversation state equals the batch ground truth."""
    stream = face.stream_transcripts(spark, transcript_files)
    q = (
        face.conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per conv = final state
    got = (
        spark.sql("SELECT * FROM progress")
        .groupBy("conv_id")
        .agg(
            F.max("n_turns_seen").alias("n_turns_seen"),
            F.max("max_turn_idx").alias("max_turn_idx"),
        )
        .toPandas()
    )
    exp = (
        spark.read.parquet(transcript_files)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns_seen"),
            F.max("turn_idx").cast("long").alias("max_turn_idx"),
        )
        .toPandas()
    )
    key = "conv_id"
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
    )


def test_stream_to_committed_mentions(spark, transcript_files, tmp_path):
    """File stream (with injected duplicates) → dedup → tagger →
    commit_stage per micro-batch; union of committed batches equals
    the batch-mode tagged turns."""
    import glob
    import os

    from ner_spark.ner.tagger import tag_turns

    # inject duplicates: write one input file twice
    dup_dir = str(tmp_path / "in_dup")
    base = spark.read.parquet(transcript_files)
    base.write.mode("overwrite").parquet(dup_dir)
    one_file = base.limit(30)
    one_file.write.mode("append").parquet(dup_dir)

    # one micro-batch: cross-batch dedup of late rows is best-effort
    # once the watermark passes them, so the deterministic contract is
    # within-watermark dedup — exercised by batching everything together
    root = str(tmp_path / "root")
    face.run_stream_to_mentions(
        spark,
        dup_dir,
        root,
        str(tmp_path / "ckpt_e2e"),
        mode="gazetteer",
        max_files_per_trigger=64,
    )
    batch_dirs = sorted(glob.glob(os.path.join(root, "stream_tagged", "batch=*")))
    assert batch_dirs
    got = None
    for d in batch_dirs:
        part = spark.read.parquet(d).drop("part")
        got = part if got is None else got.unionByName(part)
    expected = tag_turns(base, mode="gazetteer")
    key = ["conv_id", "turn_idx"]
    g = got.select("conv_id", "turn_idx", "text").toPandas().sort_values(key).reset_index(drop=True)
    e = expected.select("conv_id", "turn_idx", "text").toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e)
