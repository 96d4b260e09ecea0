"""Stage 7–8: entity-linking candidate blocking + pairwise scoring
(BASELINE.json:6 "MinHash-LSH blocking plus pairwise score UDFs").

Key scale decision: linking operates on DISTINCT (surface, label)
forms, not on mentions — the surface vocabulary is orders of magnitude
smaller than the mention stream at 10¹² turns, and the mention →
entity assignment at the end is a broadcast join back onto mentions.

Blocking is the hand-rolled deterministic MinHash banding from
ner_spark.ops.textops (fixed hash family, no RNG state — stable under
any partitioning; ml.MinHashLSH was rejected for seed/partitioning
instability, SURVEY.md §7 M4).  Surfaces are short (1–4 chars), so
shingles are character 1+2-grams.

Pairwise score (all JVM-side, no Python):
    sim = 0.4 · jaccard_est + 0.4 · (1 − levenshtein/maxlen) + 0.2 · [label equal]
with candidate pairs restricted to equal labels (so the last term is
constant 0.2 and kept only for spec parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ner_spark.ops.textops import lsh_candidate_pairs, minhash_signatures

SIM_THRESHOLD = 0.55


def surface_nodes(mentions: DataFrame) -> DataFrame:
    """Distinct (surface, label) vocabulary with stable node ids."""
    return (
        mentions.groupBy("surface", "label")
        .agg(F.count("*").alias("n_mentions"))
        .withColumn("node_id", F.xxhash64("surface", "label"))
    )


def candidate_pairs(nodes: DataFrame) -> DataFrame:
    """LSH candidate pairs between same-label surfaces.

    Reuses the doc-level MinHash machinery with doc_id := node_id and
    text := label-prefixed surface (prefix keeps blocks label-pure:
    different-label surfaces never share shingles of their prefix+char
    stream only if surfaces differ — a cheap trick to piggyback the
    label into the signature; the explicit label equi-filter after the
    join makes it exact)."""
    docs = nodes.select(
        F.col("node_id").alias("doc_id"),
        F.concat(F.col("label"), F.lit(":"), F.col("surface")).alias("text"),
    )
    # balance=False: ``docs`` is a derived post-shuffle plan (groupBy
    # over mentions), already distributed — and _balance's partition
    # probe would EXECUTE the upstream stages under AQE (see
    # textops._balance docstring)
    sigs = minhash_signatures(docs, k=2, balance=False)
    pairs = lsh_candidate_pairs(sigs)
    return pairs.select(
        F.col("doc_a").alias("node_a"),
        F.col("doc_b").alias("node_b"),
        F.col("est_jaccard"),
    )


def match_edges(nodes: DataFrame, threshold: float = SIM_THRESHOLD) -> DataFrame:
    """(node_a, node_b, sim) scored above threshold."""
    cands = candidate_pairs(nodes)
    a = nodes.alias("a")
    b = nodes.alias("b")
    joined = (
        cands.join(a, F.col("node_a") == F.col("a.node_id"))
        .join(b, F.col("node_b") == F.col("b.node_id"))
        .filter(F.col("a.label") == F.col("b.label"))
    )
    lev = F.levenshtein(F.col("a.surface"), F.col("b.surface"))
    maxlen = F.greatest(F.length("a.surface"), F.length("b.surface"))
    sim = (
        0.4 * F.col("est_jaccard")
        + 0.4 * (1.0 - lev.cast("double") / maxlen)
        + F.lit(0.2)
    )
    return joined.select(
        "node_a", "node_b", F.round(sim, 6).alias("sim")
    ).filter(F.col("sim") >= threshold)
