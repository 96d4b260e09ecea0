"""Stage 9: connected components on DataFrames via alternating
large-star / small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — public literature; converges in
O(log² n) rounds).

No GraphX/graphframes, no RDDs — each round is two keyed self-join +
aggregate passes (operator J10 + A1).  The driver loop materializes a
count+checksum per round for convergence and ``localCheckpoint``s
every few rounds to cut the lineage chain (SURVEY.md §4.3).

Determinism: component id = min node id in the component — a pure
function of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Checkpoint every round: each star pass references its input twice
# (join + agg on the same DF), so an uncheckpointed chain recomputes
# the whole history once per reference — measured exponential blowup.
# localCheckpoint materializes ~|E| rows per round, trivially cheap
# next to the recompute it avoids.
CHECKPOINT_EVERY = 1


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u."""
    nbr = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        nbr.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", "u").alias("m"))
    )
    return (
        nbr.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient u > v; for each u: m = min(Γ₋(u) ∪ {u}); emit
    (x, m) for x ∈ Γ₋(u) ∪ {u}, x ≠ m."""
    nbr = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = nbr.groupBy("u").agg(F.min("v").alias("m"))
    from_nbrs = (
        nbr.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    from_self = mins.select(F.col("u"), F.col("m").alias("v"))
    return from_nbrs.unionByName(from_self).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-independent and overflow-free (ANSI-safe)
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_rounds: int = 30
) -> DataFrame:
    """(src, dst) edge list → (node, component) with component = min
    node id reachable.  Isolated nodes (no edges) are callers' concern
    (left-join the node table afterwards; absent ⇒ own component)."""
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev = None
    for rnd in range(max_rounds):
        e = _small_star(_large_star(e))
        if (rnd + 1) % CHECKPOINT_EVERY == 0:
            e = e.localCheckpoint(eager=True)
        fp = _fingerprint(e)
        if fp == prev:
            break
        prev = fp
    # At the fixpoint every edge is (node, root), root < node.
    assign = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return assign.unionByName(roots).distinct()
