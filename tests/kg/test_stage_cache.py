"""kg stage-cache policy: single-entry eviction (bounded executor
storage across sf_dirs) and deferred persist (first query pays tagging
only, not cache materialization).  Plan-building only — no actions, so
these are fast."""

from __future__ import annotations

from tests.conftest import SF_ORACLE

SF_SMALL = "/root/testdata/sf0.001"


def _fresh(spark):
    from ner_spark.ops import kg_queries as KQ

    KQ._evict_other_keys(None)
    assert KQ._STAGES == {}
    return KQ


def test_persist_deferred_to_second_touch(spark):
    KQ = _fresh(spark)
    key = (spark.sparkContext.applicationId, SF_SMALL)
    KQ._stages(spark, SF_SMALL)
    assert "tagged_turns" not in KQ._STAGES[key]  # first touch: raw plan
    KQ._stages(spark, SF_SMALL)
    assert "tagged_turns" in KQ._STAGES[key]  # second touch: persisted
    KQ._evict_other_keys(None)


def test_materialize_persists_immediately(spark):
    """materialize=True runs several actions (linking/CC) over the
    mentions — an unpersisted first touch would re-tag per action."""
    KQ = _fresh(spark)
    key = (spark.sparkContext.applicationId, SF_SMALL)
    KQ._stages(spark, SF_SMALL, materialize=True)
    assert "tagged_turns" in KQ._STAGES[key]
    assert "entities" in KQ._STAGES[key]
    KQ._evict_other_keys(None)


def test_cache_is_single_entry_across_sf_dirs(spark):
    KQ = _fresh(spark)
    KQ._stages(spark, SF_SMALL)
    KQ._stages(spark, SF_SMALL)
    KQ._stages(spark, SF_ORACLE)
    assert list(KQ._STAGES) == [
        (spark.sparkContext.applicationId, SF_ORACLE)
    ]
    KQ._evict_other_keys(None)


def test_vocabulary_and_assignments_persisted_and_evicted(spark):
    """The surface vocabulary and assignment map are persisted once
    per stage family, shared by every linking/CC consumer, and
    unpersisted on eviction (bounded executor storage)."""
    KQ = _fresh(spark)
    key = (spark.sparkContext.applicationId, SF_SMALL)
    KQ._stages(spark, SF_SMALL, materialize=True)
    st = KQ._STAGES[key]
    assert st["nodes"].storageLevel.useMemory
    assert st["match_edges"].storageLevel.useMemory
    assert st["assignments"].storageLevel.useMemory
    assert KQ._cached_nodes(spark, SF_SMALL) is st["nodes"]
    assert KQ._cached_match_edges(spark, SF_SMALL) is st["match_edges"]
    frames = [st["nodes"], st["match_edges"], st["assignments"]]
    KQ._evict_other_keys(None)
    assert not any(f.storageLevel.useMemory for f in frames)


def test_bmes_mentions_cached_once_and_evicted(spark):
    """The BMES-model mention frame (kg_mentions_alt + kg_contracts'
    parity row) is built and persisted once per session, without
    triggering the BIO stage DAG, and unpersisted on eviction."""
    KQ = _fresh(spark)
    key = (spark.sparkContext.applicationId, SF_SMALL)
    bmes = KQ._bmes_mentions(spark, SF_SMALL)
    st = KQ._STAGES[key]
    assert "tagged_turns" not in st  # no BIO tagging paid
    assert st["bmes_mentions"].storageLevel.useMemory
    assert KQ._bmes_mentions(spark, SF_SMALL) is bmes  # cached
    KQ._evict_other_keys(None)
    assert not bmes.storageLevel.useMemory


def test_cached_nodes_hit_is_a_pure_cache_read(spark):
    """A warm nodes cache must NOT rebuild the stage DAG: _stages'
    touches counter (whose second hit persists the tagged frame, and
    which a discarded rebuild would bump as a side effect) stays put
    across repeated _cached_nodes hits."""
    KQ = _fresh(spark)
    key = (spark.sparkContext.applicationId, SF_SMALL)
    KQ._stages(spark, SF_SMALL, materialize=True)
    st = KQ._STAGES[key]
    touches = st["touches"]
    nodes = KQ._cached_nodes(spark, SF_SMALL)
    assert KQ._cached_nodes(spark, SF_SMALL) is nodes
    assert st["touches"] == touches
    KQ._evict_other_keys(None)


def test_release_pipeline_unpersists_everything(spark):
    """run_pipeline(materialize=True) persists tagged/nodes/
    assignments; release_pipeline must return ALL of them to
    unpersisted state — a long-lived session calling run_pipeline per
    batch otherwise accumulates executor storage without bound."""
    from ner_spark.pipeline import (
        release_pipeline,
        run_pipeline,
        transcripts_for_sf,
    )

    t = transcripts_for_sf(spark, SF_SMALL, cap=30)
    out = run_pipeline(spark, t, mode="gazetteer", materialize=True)
    persisted = [
        out["tagged_turns"],
        out["nodes"],
        out["match_edges"],
        out["assignments"],
    ]
    assert all(df.is_cached for df in persisted)
    release_pipeline(out)
    assert not any(df.is_cached for df in persisted)
    # idempotent and safe on the non-materialized shape too
    release_pipeline(out)
    out2 = run_pipeline(spark, t, mode="gazetteer")
    release_pipeline(out2)
    assert not out2["tagged_turns"].is_cached


def test_cold_cached_match_edges_registers_evictable_frames(spark):
    """A fully-cold _cached_match_edges call (empty _STAGES) must
    register BOTH persisted frames (nodes via _cached_nodes, edges
    itself) in the stage entry -- an orphaned persist would survive
    reset_stage_cache and poison cold benchmark passes via Spark's
    plan-matching cache substitution."""
    KQ = _fresh(spark)
    edges = KQ._cached_match_edges(spark, SF_SMALL)
    key = (spark.sparkContext.applicationId, SF_SMALL)
    st = KQ._STAGES[key]
    assert st["match_edges"] is edges
    assert st["nodes"].storageLevel.useMemory
    assert edges.storageLevel.useMemory
    nodes = st["nodes"]
    KQ._evict_other_keys(None)
    assert not nodes.storageLevel.useMemory
    assert not edges.storageLevel.useMemory
