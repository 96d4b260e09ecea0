"""Physical-plan regression tests: the optimizations the 100 TB story
depends on must be visible in .explain — predicate pushdown reaches
the parquet scan, projections prune columns, join strategies are the
intended ones, and the zero-join triples plan has exactly one
exchange and no join operators (SURVEY.md §4)."""

from __future__ import annotations

import re


from ner_spark.fixtures.transcripts import transcripts_df
from ner_spark.kg.cooccur import extract_triples
from ner_spark.ner.tagger import tag_turns
from ner_spark.ops import all_queries
from ner_spark.ops.relational import (
    agg_pivot,
    filter_pred,
    join_shufflehash,
    join_sortmerge,
    project_expr,
)
from tests.conftest import SF_ORACLE

QUERIES = all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(filter_pred(spark, SF_ORACLE))
    assert "PushedFilters:" in plan
    assert re.search(r"PushedFilters: \[[^\]]*o_orderstatus", plan), plan[:2000]


def test_column_pruning(spark):
    plan = _plan(project_expr(spark, SF_ORACLE))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:1500]
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"}


def test_broadcast_join_strategy(spark):
    plan = _plan(QUERIES["join_broadcast"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sortmerge_join_strategy(spark):
    plan = _plan(join_sortmerge(spark, SF_ORACLE))
    assert "SortMergeJoin" in plan


def test_shuffle_hash_join_strategy(spark):
    plan = _plan(join_shufflehash(spark, SF_ORACLE))
    assert "ShuffledHashJoin" in plan


def test_join_shuffle_composite_runs_both_strategies(spark):
    """The registered composite must execute BOTH physical strategies
    (one plan containing a SortMergeJoin branch and a ShuffledHashJoin
    branch) — otherwise the probe would silently stop covering J3."""
    plan = _plan(QUERIES["join_shuffle"](spark, SF_ORACLE))
    assert "SortMergeJoin" in plan and "ShuffledHashJoin" in plan


def test_triples_plan_is_join_free_single_exchange(spark):
    t = transcripts_df(spark, 50)
    tagged = tag_turns(t, mode="gazetteer")
    plan = _plan(extract_triples(tagged))
    assert "Join" not in plan, plan[:2000]
    # exactly one exchange: the conv_id window shuffle (the tagger's
    # own layout repartition precedes the mapInPandas barrier)
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges <= 2, plan[:3000]
    assert "WindowExec" in plan or "Window" in plan


def test_multimodal_decode_is_shuffle_free(spark):
    """decode_features must not exchange payload bytes: decode is
    embarrassingly parallel, so the plan is scan → project →
    mapInPandas with NO Exchange (at 100 TB of media a repartition
    here would be the largest avoidable shuffle in the engine)."""
    from ner_spark.ops.multimodal import (
        media_from_documents,
        mm_features,
        resize_media,
        sample_frames,
    )

    plan = _plan(mm_features(spark, SF_ORACLE))
    assert "Exchange" not in plan, plan[:2000]
    assert "MapInPandas" in plan
    m = media_from_documents(
        __import__("ner_spark.io.read", fromlist=["table"]).table(
            spark, SF_ORACLE, "documents"
        )
    )
    for build in (resize_media, sample_frames):
        plan = _plan(build(m))
        assert "Exchange" not in plan, plan[:2000]
        assert "MapInPandas" in plan


def test_multimodal_real_branch_is_shuffle_free(spark):
    """The real-codec branch (encode mapInPandas → decode/resize/
    sample mapInPandas) chains two Python stages with NO Exchange
    between them — payload bytes cross the Arrow boundary twice but
    never the wire."""
    from ner_spark.ops.multimodal import mm_real

    plan = _plan(mm_real(spark, SF_ORACLE))
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("MapInPandas") == 2, plan[:2000]


def test_dedup_signatures_no_exchange_when_well_split(spark):
    """MinHash/SimHash signature stages must not repartition raw
    document bytes when the input already has >= defaultParallelism
    partitions (at 100 TB a well-split source repartitioned here would
    be the biggest avoidable shuffle); with an under-split input the
    balancing exchange MUST appear."""
    from ner_spark.io.read import table as _table
    from ner_spark.ops.textops import dedup_simhash_pairs, minhash_signatures

    par = spark.sparkContext.defaultParallelism
    docs = _table(spark, SF_ORACLE, "documents")
    well_split = docs.repartition(max(par, 4))
    # signature computation itself: NO doc_id exchange on a well-split
    # input (raw document bytes never cross a shuffle)
    plan = _plan(minhash_signatures(well_split))
    assert "Exchange hashpartitioning(doc_id" not in plan, plan[:2000]
    # the simhash pair query keeps the intentional narrow
    # (doc_id, simhash) stage-sharing shuffle that stops the self-join
    # recomputing signatures (and re-scanning the corpus) per side.
    # The pre-execution plan prints the shared exchange subtree under
    # BOTH join sides (AQE dedupes the identical exchange at runtime),
    # so textual count is 1 or 2 — never 0 (no sharing) and never
    # more (that would mean extra, unintended doc_id shuffles).
    plan = _plan(dedup_simhash_pairs(well_split))
    n_exch = plan.count("Exchange hashpartitioning(doc_id")
    assert 1 <= n_exch <= 2, plan[:3000]
    single = docs.coalesce(1)
    plan = _plan(minhash_signatures(single))
    assert "Exchange hashpartitioning(doc_id" in plan, plan[:2000]


def test_partial_aggregation_present(spark):
    """A1: map-side partial agg before the exchange."""
    plan = _plan(QUERIES["agg_basic"](spark, SF_ORACLE))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan.lower() or "partial" in plan


def test_whole_stage_codegen_covers_agg(spark):
    df = QUERIES["agg_basic"](spark, SF_ORACLE)
    df.collect()  # AQE finalizes THIS df's plan only after its own action
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # codegen'd operators carry the `*(n)` whole-stage marker
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan[:2000]


def test_pivot_no_distinct_value_job(spark):
    """A8: pivot values enumerated — the plan is the two-aggregate
    pivotfirst shape with NO separate distinct-values collection (an
    un-enumerated pivot fires an eager spark job at plan time)."""
    opt = _optimized(agg_pivot(spark, SF_ORACLE))
    assert "pivotfirst" in opt, opt[:2000]
    assert opt.count("Aggregate [") == 2, opt[:2000]


def test_grouped_map_exchange_width_pinned(spark):
    """U3: the applyInPandas exchange must be an explicit
    hash-repartition on the grouping key, NOT an AQE-coalescible
    shuffle — AQE sizes by bytes, but grouped-map cost is per group,
    and the byte heuristic collapses this small-bytes many-groups
    stage to one task running all ~15k groups sequentially (measured
    65 s vs ~6 s at sf0.01).  The explicit partitioning satisfies
    FlatMapGroupsInPandas' required distribution, so exactly one
    exchange appears, with the pinned partition count."""
    df = QUERIES["udf_grouped_map"](spark, SF_ORACLE)
    plan = _plan(df)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert plan.count("Exchange") == 1, plan[:2000]
    assert re.search(
        rf"hashpartitioning\(l_orderkey[^)]*, {n_parts}\), REPARTITION_BY_NUM",
        plan,
    ), plan[:2000]


def test_winnow_fingerprints_shuffle_free(spark):
    """Winnowing is per-document array algebra: the plan must be
    scan → project/generate with NO Exchange — each doc's fingerprint
    set is independent of every other row, so at 100 TB the operator
    is embarrassingly parallel and a shuffle here would be pure
    waste."""
    from ner_spark.io.read import table
    from ner_spark.ops.textops import winnow_fingerprints

    d = table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    plan = _plan(winnow_fingerprints(d))
    assert "Exchange" not in plan, plan[:2000]
