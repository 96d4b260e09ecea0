"""KG-pipeline queries for the driver gate (rows-only ⊘: the pipeline
is not ANSI-SQL-expressible over the pre-registered views — the driver
records row-count/schema stability; exactness is pytest-enforced
against the single-process oracle and golden fixtures).

Transcripts are synthesized deterministically from the sf_dir's
``documents`` row count (ner_spark.pipeline.transcripts_for_sf), so
each query is a fixed function of sf_dir.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.ops import register

_CAP = 300  # conversations per query run — keeps the driver gate fast


def _transcripts(spark, sf_dir):
    from ner_spark.pipeline import transcripts_for_sf

    return transcripts_for_sf(spark, sf_dir, cap=_CAP)


@register("kg_mentions")  # ⊘
def kg_mentions(spark, sf_dir):
    """Stage 4: BiLSTM-CRF mapInPandas tagger output (PER/LOC/ORG
    spans with stable mention ids)."""
    from ner_spark.ner.tagger import tag_mentions

    return tag_mentions(_transcripts(spark, sf_dir), mode="model")


@register("kg_mentions_gazetteer")  # ⊘
def kg_mentions_gazetteer(spark, sf_dir):
    """Stage 4 alternate: deterministic maximal-munch gazetteer matcher
    through the same mapInPandas path."""
    from ner_spark.ner.tagger import tag_mentions

    return tag_mentions(_transcripts(spark, sf_dir), mode="gazetteer")


@register("kg_mentions_bmes")  # ⊘ pytest: spans == gazetteer (BIO) path
def kg_mentions_bmes(spark, sf_dir):
    """Stage 4, BMES label scheme: spans → BMES tags → decode_bmes
    inside the distributed UDF (C9 through the real path)."""
    from ner_spark.ner.tagger import tag_mentions

    return tag_mentions(_transcripts(spark, sf_dir), mode="gazetteer_bmes")


@register("kg_triples")  # ⊘
def kg_triples(spark, sf_dir):
    """Stages 4+6: tag → co-occurrence triples (pinned predicate rule)."""
    from ner_spark.pipeline import run_pipeline

    t = _transcripts(spark, sf_dir)
    return run_pipeline(spark, t, mode="model")["triples"]


@register("kg_match_edges")  # ⊘
def kg_match_edges(spark, sf_dir):
    """Stages 7–8: MinHash-LSH blocking + JVM pairwise scoring over
    the distinct surface vocabulary."""
    from ner_spark.kg.linking import match_edges, surface_nodes
    from ner_spark.ner.tagger import tag_mentions

    nodes = surface_nodes(tag_mentions(_transcripts(spark, sf_dir), mode="model"))
    return match_edges(nodes)


@register("kg_cc_components")  # ⊘
def kg_cc_components(spark, sf_dir):
    """Stage 9: large-star/small-star connected components over the
    match-edge graph (driver convergence loop + localCheckpoint)."""
    from pyspark.sql import functions as F

    from ner_spark.kg.cc import connected_components
    from ner_spark.kg.linking import match_edges, surface_nodes
    from ner_spark.ner.tagger import tag_mentions

    nodes = surface_nodes(tag_mentions(_transcripts(spark, sf_dir), mode="model"))
    edges = match_edges(nodes).select(
        F.col("node_a").alias("src"), F.col("node_b").alias("dst")
    )
    return connected_components(edges)


@register("kg_entities")  # ⊘
def kg_entities(spark, sf_dir):
    """Stage 10: canonical entity nodes (CC component id, most-frequent
    surface, mention counts)."""
    from ner_spark.pipeline import run_pipeline

    t = _transcripts(spark, sf_dir)
    return run_pipeline(spark, t, mode="model", materialize=True)["entities"]


@register("kg_edges")  # ⊘
def kg_edges(spark, sf_dir):
    """Stage 10: weighted entity-level predicate edges."""
    from ner_spark.pipeline import run_pipeline

    t = _transcripts(spark, sf_dir)
    return run_pipeline(spark, t, mode="model", materialize=True)["edges"]


@register("kg_triple_stats")  # ⊘
def kg_triple_stats(spark, sf_dir):
    """Aggregated triple distribution — a compact, shape-stable view
    of the whole slice (pred class × type pair counts)."""
    from ner_spark.pipeline import run_pipeline

    t = _transcripts(spark, sf_dir)
    triples = run_pipeline(spark, t, mode="model")["triples"]
    pred_class = F.when(
        F.col("pred").isin("co_occurs", "same_context"), F.col("pred")
    ).otherwise(F.lit("lexical"))
    return (
        triples.groupBy(
            pred_class.alias("pred_class"), "subj_type", "obj_type"
        )
        .agg(F.count("*").alias("n"))
    )
