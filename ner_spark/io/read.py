"""Readers.

- ``table``: driver testdata parquet (TESTDATA.md).
- ``read_transcripts``: the engine's primary input — Iceberg table of
  multi-turn transcripts (BASELINE.json input_hint); sandbox fallback
  reads partitioned parquet written by :mod:`ner_spark.io.write`.
- ``read_msra_corpus``: MSRA-style ``char<SP>tag`` text corpus
  (reference data format, SURVEY.md §1.1), parsed distributed via a
  grouped mapInPandas (operator S3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver testdata table (parquet scan, operator S1)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_transcripts(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read the transcripts table.

    Production: Iceberg with ``option("snapshot-id", ...)`` for pinned
    reads (operator S2); the Iceberg runtime jar is not available in
    the sandbox (no network — SURVEY.md §0), so this transparently
    falls back to the parquet layout, which is partitioned by
    ``part=pmod(xxhash64(conv_id), N)`` so resume reads prune.

    The fallback HONORS ``snapshot_id`` when the path was written by
    ``commit_stage`` (checkpoint/snapshots.py records a JSON manifest
    per commit): the read pins the manifest's exact fileset — atomic
    visibility + time travel until a bucket is overwritten, with
    SnapshotExpiredError when it was.  Only a bare directory with no
    snapshot log ignores the pin (and raises to say so).
    """
    try:
        if ".parquet" in path or not spark.conf.get(
            "spark.sql.catalog.spark_catalog", ""
        ):
            raise ValueError("no iceberg catalog configured")
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(path)
    except Exception:
        import os

        from ner_spark.checkpoint.snapshots import (
            has_snapshot_log,
            read_snapshot,
        )

        # Stage names may be nested (streaming commits e.g.
        # 'stream_tagged/batch=3'): try every root/stage split, deepest
        # root first, so the snapshot log is found wherever
        # commit_stage put it (root/_snapshots/<full stage path>).  A
        # split only matches when a MANIFEST exists there — a bare
        # intermediate `_snapshots/...` dir created for a nested child
        # stage is not a log for its parent path.  Relative paths get
        # the cwd-rooted split too (root = "").
        norm = os.path.normpath(path)
        parts = norm.split(os.sep)
        splits = [
            (os.sep.join(parts[:i]) or os.sep, os.sep.join(parts[i:]))
            for i in range(len(parts) - 1, 0, -1)
        ]
        if not os.path.isabs(norm):
            splits.append(("", norm))
        for cand_root, cand_stage in splits:
            if has_snapshot_log(cand_root, cand_stage):
                return read_snapshot(
                    spark, cand_root, cand_stage, snapshot_id
                )
        if snapshot_id is not None:
            raise ValueError(
                f"snapshot_id={snapshot_id} requested but {path!r} has "
                "no snapshot log (not written by commit_stage) and no "
                "Iceberg catalog is configured"
            )
        # Plain-parquet fallback; `part=` hive-style dirs surface as a
        # column and drive partition pruning on resume (J6 path).
        return spark.read.parquet(path)


CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("sent_id", T.LongType(), False),
        T.StructField("chars", T.ArrayType(T.StringType()), False),
        T.StructField("tags", T.ArrayType(T.StringType()), False),
    ]
)


def read_msra_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Parse an MSRA-style tagged corpus: one ``char<SP>tag`` per line,
    blank line between sentences (reference input format).

    Distributed strategy: read lines with file/line provenance, assign
    each line to a sentence by counting blank lines *within its file*
    via a window, then assemble sentences with sort_array+collect_list.
    Sentence ids are ``xxhash64(file, sentence_ordinal)`` — stable and
    partition-independent.
    """
    lines = (
        spark.read.text(path)
        .select(
            F.col("value"),
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("pos"),
        )
    )
    # monotonically_increasing_id is monotonic within a partition and
    # partitions follow file order for text reads of a single file set;
    # to stay safe we window per file on pos (text splits keep order).
    from pyspark.sql.window import Window

    w = Window.partitionBy("file").orderBy("pos")
    lines = lines.withColumn(
        "sent_ord",
        F.sum(F.when(F.trim("value") == "", 1).otherwise(0)).over(w),
    ).filter(F.trim("value") != "")
    parsed = lines.select(
        "file",
        "sent_ord",
        "pos",
        F.substring_index("value", " ", 1).alias("ch"),
        F.substring_index("value", " ", -1).alias("tag"),
    )
    return (
        parsed.groupBy("file", "sent_ord")
        .agg(
            F.sort_array(F.collect_list(F.struct("pos", "ch", "tag"))).alias("seq")
        )
        .select(
            F.xxhash64("file", "sent_ord").alias("sent_id"),
            F.col("seq.ch").alias("chars"),
            F.col("seq.tag").alias("tags"),
        )
    )
