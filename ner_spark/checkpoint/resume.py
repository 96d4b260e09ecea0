"""Resumable pipeline runner: each stage commits partition-aligned
with lineage; a restart recomputes ONLY missing/invalid buckets
(SURVEY.md §3.2 stages 2/5/11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ner_spark.checkpoint.lineage import commit_stage, validate_stage
from ner_spark.kg.cooccur import extract_triples
from ner_spark.ner.tagger import mentions_from_turns, tag_turns


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    root: str,
    mode: str = "model",
    n_buckets: int = 8,
) -> dict[str, DataFrame]:
    """transcripts → committed mentions + triples under ``root``.

    Idempotent: rerunning after a partial failure (some buckets
    committed, some not) recomputes only the missing buckets and
    yields byte-identical tables; rerunning after success is a no-op
    read.  Duplicate input rows (at-least-once sources) are dropped
    deterministically before tagging (operator O6)."""
    clean = transcripts.dropDuplicates(["conv_id", "turn_idx"])

    tagged = tag_turns(clean, mode=mode)
    tagged_c = commit_stage(tagged, root, "tagged_turns", n_buckets)

    mentions = mentions_from_turns(tagged_c)
    mentions_c = commit_stage(mentions, root, "mentions", n_buckets)

    triples = extract_triples(tagged_c)
    triples_c = commit_stage(triples, root, "triples", n_buckets)
    return {
        "tagged_turns": tagged_c,
        "mentions": mentions_c,
        "triples": triples_c,
    }


def validate_all(spark: SparkSession, root: str) -> dict[str, bool]:
    return {
        stage: validate_stage(spark, root, stage)
        for stage in ("tagged_turns", "mentions", "triples")
    }
