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
    assert st["assignments"].storageLevel.useMemory
    assert KQ._cached_nodes(spark, SF_SMALL) is st["nodes"]
    nodes, assigns = st["nodes"], st["assignments"]
    KQ._evict_other_keys(None)
    assert not nodes.storageLevel.useMemory
    assert not assigns.storageLevel.useMemory


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
