"""Similarity search over the ``embeddings`` table (array<float>, d=64).

- brute-force cosine top-k (exact baseline, DuckDB-oracle-checked);
- random-hyperplane LSH bucketed ANN (the scale path);
- embedding-cosine near-dup (top pair per label block).

All dot products are built-in higher-order functions (zip_with +
aggregate) in float64 — JVM-side, sequential summation order, so Spark
and DuckDB agree bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ner_spark.io.read import table
from ner_spark.ops import register

N_QUERY = 5  # vec_id < 5 are query vectors; the rest are the corpus


def _dbl(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine(a, b):
    """Cosine similarity between two array<double> columns (built-ins
    only; no UDF)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


@register(
    "sim_brute",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {N_QUERY}
    ), c AS (
      SELECT vec_id AS nid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id >= {N_QUERY}
    ), scored AS (
      SELECT qid, nid, list_cosine_similarity(qv, cv) AS cos FROM q, c
    ), ranked AS (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
      FROM scored
    )
    SELECT qid, nid, rk, round(cos, 6) AS cos FROM ranked WHERE rk <= 3
    """,
)
def sim_brute(spark, sf_dir):
    """Brute-force cosine top-3 per query: broadcast the (small) query
    set against the corpus, rank with a per-query window.  At 100 TB
    the corpus side never shuffles — only |Q|·k rows survive the
    window, and AQE coalesces."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("qid"), _dbl("embedding").alias("qv")
    )
    c = e.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("nid"), _dbl("embedding").alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "nid", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "nid", "rk", F.round("cos", 6).alias("cos"))
    )


def hyperplane_signature(vec_col, n_bits: int = 12):
    """Deterministic random-hyperplane signature: plane components are
    derived from xxhash64(bit, dim) mapped to [-1, 1) — no RNG state,
    identical on every executor.  Returns an int bucket id."""
    def bit_val(b):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda x, j: x
                * (
                    F.pmod(F.xxhash64(F.lit("hp"), F.lit(b), j), F.lit(20000)).cast(
                        "double"
                    )
                    / 10000.0
                    - 1.0
                ),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        return F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )

    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        sig = sig + bit_val(b)
    return sig


@register("sim_lsh")  # ⊘ rows-only: bucket hash family is engine-specific
def sim_lsh(spark, sf_dir):
    """ANN via random-hyperplane LSH: queries probe only their own
    bucket (12-bit signature → ~4096 buckets), then exact cosine +
    top-3 within the bucket.  pytest measures recall vs sim_brute.
    At scale: corpus bucketed once (one shuffle, reusable), each query
    touches 1/4096 of the data."""
    e = table(spark, sf_dir, "embeddings")
    with_sig = e.select(
        "vec_id",
        _dbl("embedding").alias("v"),
        hyperplane_signature(_dbl("embedding")).alias("bucket"),
    )
    q = with_sig.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "bucket"
    )
    c = with_sig.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("nid"), F.col("v").alias("cv"), "bucket"
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "qid", "nid", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "nid", "rk", F.round("cos", 6).alias("cos"))
    )


@register(
    "dedup_embcos",
    oracle="""
    WITH p AS (
      SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]) AS cos
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
    ), r AS (
      SELECT label, vec_a, vec_b, cos,
             row_number() OVER (
               PARTITION BY label ORDER BY cos DESC, vec_a, vec_b) AS rk
      FROM p
    )
    SELECT label, vec_a, vec_b, round(cos, 6) AS cos FROM r WHERE rk = 1
    """,
)
def dedup_embcos(spark, sf_dir):
    """Embedding-cosine near-dup: most-similar pair within each label
    block.  Blocked self-join (label carries the shuffle) + per-block
    argmax window — the shape of semantic dedup over a clustered
    corpus.

    Scale guard: this is the EXACT baseline — all-pairs within a
    block, O(|block|²).  It is the oracle twin for the bucketed path;
    at 100 TB run ``sim_lsh``-style hyperplane bucketing first (each
    vector scores only its own bucket) and reserve this operator for
    blocks the cluster-cardinality stats bound under ~10⁵ vectors."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _dbl("embedding").alias("v")
    )
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.label").alias("label"),
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("cos").desc(), F.col("vec_a"), F.col("vec_b")
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("label", "vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )
