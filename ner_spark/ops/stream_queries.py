"""Streaming-face contract query (SURVEY.md §2.2 group H, external).

Round 3 left X1–X7 pytest-only (⊘): Structured Streaming results are
not ANSI-SQL-expressible over the pre-registered views.  What IS
oracle-checkable is the PARITY CONTRACT the streaming face is built
on — every event-time-keyed aggregate must produce, from an
availableNow file stream, exactly the rows the identical batch
expression produces on the same data.  ``stream_contracts`` runs the
real readStream → writeStream machinery in-query (scratch dir input +
checkpoints, multiple micro-batches) and emits one violation count per
contract, which the DuckDB oracle pins to zero — the A3 behavioral
pattern, same as kg_contracts.

The input corpus is the deterministic transcript fixture (like every
kg_* query, it is synthesized — sf_dir only keys the catalog shape),
and all comparisons are multiset symmetric differences computed
in-Spark, so any divergence — a dropped window, a duplicated row, a
torn micro-batch commit — surfaces as a nonzero count the gate fails.
The ``late_drop`` row covers X4's lateness semantics explicitly: a
query-restart scenario where rows behind the checkpoint-committed
watermark must be dropped from append-mode aggregates (see
_late_drop_violations).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ner_spark.ops import register

_N_CONVS = 40  # fixture conversations (~220 turns, 4 input files)
_SEQ = 0
_OPEN_SINKS: list[str] = []  # memory-sink tables awaiting drop


def _drain(stream_df: DataFrame, ckpt_root: str, mode: str) -> DataFrame:
    """Run an availableNow stream into a uniquely-named memory sink
    and return the sink table (unique name: a long driver session may
    invoke this query many times).  Each sink holds a full aggregate
    result in driver memory, so streaming_contract_rows drops every
    registered sink once its diff is computed — without that, repeated
    invocations (gate + best-of-N bench passes) would accumulate them
    in the session catalog for the driver's whole lifetime."""
    global _SEQ
    _SEQ += 1
    name = f"stream_contract_{os.getpid()}_{_SEQ}"
    _OPEN_SINKS.append(name)
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(ckpt_root, f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def _sym_diff(a: DataFrame, b: DataFrame) -> int:
    """Multiset symmetric-difference size (0 ⇔ identical result sets).

    Computed as Σ|count_a − count_b| over a full-outer join of the two
    sides' per-row multiplicity tables — NOT via ``exceptAll``, which
    Catalyst rewrites through ``Generate(ReplicateRows(sum, …))`` and
    (a) mis-binds pruned attributes on memory-sink inputs in Spark
    4.1 (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) and (b) physically
    replicates every row, where the count formulation ships only one
    (row, count) pair per distinct row."""
    from functools import reduce

    cols = a.columns
    ca = a.groupBy(*cols).agg(F.count(F.lit(1)).alias("_na"))
    cb = b.groupBy(*cols).agg(F.count(F.lit(1)).alias("_nb"))
    cond = reduce(
        lambda x, y: x & y, [ca[c].eqNullSafe(cb[c]) for c in cols]
    )
    d = ca.join(cb, cond, "full_outer").select(
        F.abs(
            F.coalesce("_na", F.lit(0)) - F.coalesce("_nb", F.lit(0))
        ).alias("d")
    )
    return int(d.agg(F.sum("d")).first()[0] or 0)


def streaming_contract_rows(spark: SparkSession) -> list[tuple[str, int]]:
    """Run every streaming contract scenario; see module docstring."""
    from ner_spark.fixtures.transcripts import transcripts_df
    from ner_spark.streaming import face

    tmp = tempfile.mkdtemp(prefix="ner_spark_streamc_")
    # A stateful streaming aggregate materializes ONE STATE STORE PER
    # SHUFFLE PARTITION PER MICRO-BATCH (checkpoint delta files
    # included); at the session default (32) the six ~220-turn
    # contract streams spend their wall clock on state-store churn,
    # not data (measured 135 s → 34 s at 4 partitions).  Pin a small
    # count for the duration and restore the caller's value — the
    # parity contracts are partition-count-independent by
    # construction, which is exactly what they verify.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        base = transcripts_df(spark, _N_CONVS)
        in_dir = os.path.join(tmp, "in")
        base.repartition(4).write.mode("overwrite").parquet(in_dir)
        batch = spark.read.parquet(in_dir)
        rows: list[tuple[str, int]] = []

        def stream():
            # 2 files/trigger over 4 files → ≥ 2 micro-batches, so the
            # parity claims cover INCREMENTAL state, not one big batch
            return face.stream_transcripts(spark, in_dir, max_files_per_trigger=2)

        # X1 tumbling (+X4 watermark is on every aggregate)
        got = _drain(face.tumbling_counts(stream()), tmp, "complete")
        exp = (
            batch.groupBy(F.window("ts", "10 minutes").alias("w"), "role")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("wstart"), "role", "n")
        )
        rows.append(("tumble_parity", _sym_diff(got, exp)))

        # X2 sliding
        got = _drain(face.sliding_counts(stream()), tmp, "complete")
        exp = (
            batch.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("wstart"), "n")
        )
        rows.append(("slide_parity", _sym_diff(got, exp)))

        # X3 session windows
        got = _drain(face.session_counts(stream()), tmp, "complete")
        exp = (
            batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "conv_id")
            .agg(F.count("*").alias("n_turns"))
            .select("conv_id", F.col("w.start").alias("session_start"), "n_turns")
        )
        rows.append(("session_parity", _sym_diff(got, exp)))

        # X5 stateful dedup: an at-least-once source (one input file
        # re-appended) must yield exactly the distinct turn set.  One
        # micro-batch: cross-batch dedup of rows BEHIND the watermark
        # is best-effort by definition, so the deterministic contract
        # is within-watermark dedup (same note as the pytest).
        dup_dir = os.path.join(tmp, "in_dup")
        base.write.mode("overwrite").parquet(dup_dir)
        base.limit(25).write.mode("append").parquet(dup_dir)
        got = _drain(
            face.deduped(face.stream_transcripts(spark, dup_dir, 64)),
            tmp,
            "append",
        ).select("conv_id", "turn_idx", "text")
        exp = (
            spark.read.parquet(dup_dir)
            .dropDuplicates(["conv_id", "turn_idx"])
            .select("conv_id", "turn_idx", "text")
        )
        rows.append(("dedup_exactly_once", _sym_diff(got, exp)))

        # X6 applyInPandasWithState: final per-conversation state ==
        # batch ground truth (update mode emits increments; the final
        # state is the per-key max)
        got = (
            _drain(face.conversation_progress(stream()), tmp, "update")
            .groupBy("conv_id")
            .agg(
                F.max("n_turns_seen").alias("n_turns_seen"),
                F.max("max_turn_idx").alias("max_turn_idx"),
            )
        )
        exp = batch.groupBy("conv_id").agg(
            F.count("*").alias("n_turns_seen"),
            F.max("turn_idx").cast("long").alias("max_turn_idx"),
        )
        rows.append(("stateful_state_parity", _sym_diff(got, exp)))

        # X7 foreachBatch → commit_stage: stream → tagger → committed
        # stage tables; the union of committed micro-batches must equal
        # the batch tagger's output AND every batch's lineage must
        # re-validate (checksum round-trip)
        from ner_spark.checkpoint.lineage import validate_stage

        root = os.path.join(tmp, "root")
        face.run_stream_to_mentions(
            spark,
            in_dir,
            root,
            os.path.join(tmp, "ckpt_e2e"),
            mode="gazetteer",
            max_files_per_trigger=2,
        )
        batch_dirs = sorted(
            glob.glob(os.path.join(root, "stream_tagged", "batch=*"))
        )
        got = None
        bad_commits = 0 if batch_dirs else 1
        for d in batch_dirs:
            part = (
                spark.read.parquet(d).select("conv_id", "turn_idx", "text")
            )
            got = part if got is None else got.unionByName(part)
            stage = os.path.relpath(d, root)
            if not validate_stage(spark, root, stage):
                bad_commits += 1
        exp = batch.select("conv_id", "turn_idx", "text")
        # no committed batches at all ⇒ every expected row is missing
        # (report the violation instead of crashing on got=None)
        diff = _sym_diff(got, exp) if got is not None else int(exp.count())
        rows.append(("commit_exactly_once", diff + bad_commits))

        rows.append(("late_drop", _late_drop_violations(spark, tmp)))
        return rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        while _OPEN_SINKS:
            spark.catalog.dropTempView(_OPEN_SINKS.pop())
        shutil.rmtree(tmp, ignore_errors=True)


def _late_drop_violations(spark: SparkSession, tmp: str) -> int:
    """X4 lateness semantics, externalized: rows arriving BEHIND the
    committed watermark must be deterministically dropped from
    append-mode windowed aggregates — across a query RESTART, so the
    watermark exercised is the one persisted in the checkpoint, not
    in-memory state.

    Scenario: run 1 drains an on-time file (ts spanning 3 h), which
    commits watermark = max(ts) − 1 h.  A second file of late rows
    (all inside windows long closed by that watermark) plus a third
    far-future file (closing every remaining window) are appended and
    run 2 drains them from the same checkpoint.  The union of rows
    emitted across both runs must equal the BATCH aggregate over the
    on-time ∪ future rows only, restricted to closed windows — late
    rows contribute nothing.  A final guard pins non-vacuity: had the
    late rows been counted, the closed-window result WOULD differ (so
    a regression that stops dropping them cannot pass)."""
    from datetime import timedelta

    from ner_spark.fixtures.transcripts import BASE_TS, TRANSCRIPT_SCHEMA
    from ner_spark.streaming import face

    def _frame(rows):
        return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)

    on_time = [
        ("c%d" % i, 0, "user", "on-time turn", None, BASE_TS + timedelta(minutes=m))
        for i, m in enumerate((0, 5, 12, 47, 95, 180))
    ]
    late = [
        ("l%d" % i, 0, "user", "late turn", None, BASE_TS + timedelta(minutes=m))
        for i, m in enumerate((1, 6, 13))
    ]
    fresh = [("z0", 0, "user", "fresh turn", None, BASE_TS + timedelta(hours=10))]

    late_dir = os.path.join(tmp, "in_late")
    ckpt = os.path.join(tmp, "ckpt_late")
    emitted: list[tuple] = []

    def _capture(bdf: DataFrame, _bid: int) -> None:
        emitted.extend(tuple(r) for r in bdf.collect())

    def _drain_once():
        q = (
            face.tumbling_counts(face.stream_transcripts(spark, late_dir, 4))
            .writeStream.foreachBatch(_capture)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _frame(on_time).coalesce(1).write.mode("append").parquet(late_dir)
    _drain_once()  # commits watermark = max(on_time ts) − 1 h
    _frame(late).coalesce(1).write.mode("append").parquet(late_dir)
    _frame(fresh).coalesce(1).write.mode("append").parquet(late_dir)
    _drain_once()  # must DROP the late file's rows

    got = spark.createDataFrame(
        emitted, "wstart timestamp, role string, n bigint"
    )
    final_wm = BASE_TS + timedelta(hours=9)  # max(fresh ts) − 1 h
    closed = (
        F.col("wstart") + F.expr("INTERVAL 10 MINUTES")
    ) <= F.lit(final_wm)

    def _batch_closed(rows):
        return (
            _frame(rows)
            .groupBy(F.window("ts", "10 minutes").alias("w"), "role")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("wstart"), "role", "n")
            .filter(closed)
        )

    exp = _batch_closed(on_time + fresh)
    exp_with_late = _batch_closed(on_time + late + fresh)
    vacuous = 1 if _sym_diff(exp_with_late, exp) == 0 else 0
    return _sym_diff(got, exp) + vacuous


_STREAM_CONTRACTS = [
    "tumble_parity",
    "slide_parity",
    "session_parity",
    "dedup_exactly_once",
    "stateful_state_parity",
    "commit_exactly_once",
    "late_drop",
]

_STREAM_CONTRACTS_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS contract, CAST(0 AS BIGINT) AS violations"
    for c in _STREAM_CONTRACTS
)


@register("stream_contracts", oracle=_STREAM_CONTRACTS_SQL)
def stream_contracts(spark, sf_dir):
    """Externally-scored Structured Streaming contracts (X1–X7): each
    row is a stream-vs-batch violation count the oracle pins to zero.
    See the module docstring for the scenario behind each row.

    NOTE — eager: every streaming scenario runs AT DataFrame-BUILD
    time (real readStream→writeStream drains in a scratch dir); the
    returned frame is a createDataFrame over the already-computed
    counts.  Correct under the driver's build-then-compare gate; do
    not cache/re-build it expecting a lazy plan."""
    return spark.createDataFrame(
        streaming_contract_rows(spark), "contract string, violations long"
    )
