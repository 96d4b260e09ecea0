"""Stage 10: star-schema materialization — entity nodes + weighted
predicate edges (BASELINE.json:14 "materializes node/edge tables").

Canonicalization contract: entity_id = the component id from CC (min
node id in the linked-surface component); canonical_surface = the
most-frequent surface in the component (ties broken lexicographically
— max_by over a (count, reversed-surface) struct, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ner_spark.kg.cc import connected_components
from ner_spark.kg.linking import match_edges, surface_nodes


def entity_assignments(
    mentions: DataFrame,
    nodes: DataFrame | None = None,
    edges: DataFrame | None = None,
) -> DataFrame:
    """(surface, label, node_id, entity_id): every distinct surface
    form mapped to its canonical entity via linking + CC.  Surfaces
    with no match edge stay their own entity.

    ``nodes`` (optional): a pre-built — ideally PERSISTED — surface
    vocabulary.  The linking plan references the vocabulary several
    times (signature docs + both sides of the pair rejoin + the final
    component join), and CC's branch decision adds its own action; an
    unpersisted vocabulary re-executes the mentions→groupBy subtree
    for every one of those.  The vocabulary is orders of magnitude
    smaller than the mention stream (the module-header scale
    decision), so callers that run several actions should pass a
    persisted frame (ops/kg_queries does, via its stage cache).
    When neither ``nodes`` nor ``edges`` is passed, match_edges'
    size dispatch persists the derived vocabulary at MEMORY_AND_DISK
    and leaves it cached (see its docstring) — pass and own your
    frames in long-lived sessions.

    ``edges`` (optional): a pre-built — ideally PERSISTED —
    match-edge frame (linking.match_edges output schema).  CC persists
    its own projected copy internally (one materialization per CC
    call), so the shared frame's win is ACROSS consumers: the
    kg_match_edges/kg_cc_components/kg_contracts queries and this
    function all read one cached frame instead of each re-executing
    the signature self-join plan once."""
    if nodes is None:
        nodes = surface_nodes(mentions)
    if edges is None:
        edges = match_edges(nodes)
    edges = edges.select(
        F.col("node_a").alias("src"), F.col("node_b").alias("dst")
    )
    comps = connected_components(edges)
    return (
        nodes.join(comps, nodes.node_id == comps.node, "left")
        .select(
            "surface",
            "label",
            "node_id",
            "n_mentions",
            F.coalesce("component", "node_id").alias("entity_id"),
        )
    )


def build_entities(
    mentions: DataFrame, assignments: DataFrame
) -> DataFrame:
    """entity table: id, canonical surface, label, mention count,
    first timestamp (needs mentions joined back to turn ts upstream —
    here first_ts is the min (conv_id, turn_idx) marker columns if
    present, else omitted)."""
    m = mentions.join(
        F.broadcast(assignments.select("surface", "label", "entity_id")),
        ["surface", "label"],
    )
    canon = (
        m.groupBy("entity_id", "surface", "label")
        .agg(F.count("*").alias("n"))
        .groupBy("entity_id")
        .agg(
            F.max_by(
                "surface", F.struct(F.col("n"), F.col("surface"))
            ).alias("canonical_surface"),
            # match edges never cross labels, so all rows of an entity
            # share one label — max() makes that deterministic even if
            # the invariant were ever relaxed (F.first is order-
            # dependent under parallel aggregation).
            F.max("label").alias("label"),
            F.sum("n").alias("n_mentions"),
        )
    )
    return canon


def build_edges(triples: DataFrame, assignments: DataFrame) -> DataFrame:
    """Weighted entity-level predicate edges: triples → entity ids via
    broadcast of the (small) assignment map, then count per
    (src, dst, pred)."""
    amap = assignments.select("surface", "label", "entity_id")
    subj_map = (
        amap.withColumnRenamed("surface", "subj")
        .withColumnRenamed("label", "subj_type")
        .withColumnRenamed("entity_id", "src_entity_id")
    )
    obj_map = (
        amap.withColumnRenamed("surface", "obj")
        .withColumnRenamed("label", "obj_type")
        .withColumnRenamed("entity_id", "dst_entity_id")
    )
    t = triples.join(F.broadcast(subj_map), ["subj", "subj_type"]).join(
        F.broadcast(obj_map), ["obj", "obj_type"]
    )
    return t.groupBy("src_entity_id", "dst_entity_id", "pred").agg(
        F.count("*").alias("weight")
    )
