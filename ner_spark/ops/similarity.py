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
from ner_spark.ops.probes import probes, union_tagged, wrap

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
    return brute_topk(table(spark, sf_dir, "embeddings"))


def brute_topk(e: DataFrame) -> DataFrame:
    """Exact cosine top-3 per query over an embeddings-shaped frame —
    the body of ``sim_brute``, reusable as the ground truth for the
    ANN recall contracts."""
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


def adaptive_bits(n: int) -> int:
    """~64 vectors per bucket at any corpus size, clamped to [4, 24]."""
    import math

    return max(4, min(24, math.ceil(math.log2(max(n, 2) / 64))))


def ann_lsh(
    e: DataFrame,
    n_bits: int | None = None,
    multiprobe: bool = False,
) -> DataFrame:
    """ANN via random-hyperplane LSH over an embeddings-shaped frame
    (vec_id, embedding): queries probe only their own bucket
    (n_bits-signature buckets), then exact cosine + top-3 within it.
    At scale: corpus bucketed once (one shuffle, reusable), each query
    touches ~2^-n_bits of the data.

    ``n_bits`` defaults ADAPTIVELY to ceil(log2(n/64)) clamped to
    [4, 24] — ~64 vectors per bucket whether the corpus is 500 rows
    (16 buckets) or 10⁹ (2²⁴).  A fixed bucket count can't serve both:
    round 2's hardcoded 12 bits put 4096 buckets under 500 vectors and
    queries probed near-empty cells.  The sizing count is one eager
    Spark job at build time — pass ``n_bits`` explicitly (as every
    registered query does) to keep construction fully lazy.

    ``multiprobe=True``: each query also probes the ``n_bits`` buckets
    at hamming distance 1 from its own (standard multiprobe LSH) —
    boundary-robust recall for vectors near a hyperplane, at
    (n_bits+1)·2^-n_bits scanned fraction instead of 2^-n_bits.  Only
    the tiny broadcast query side fans out; the corpus stays bucketed
    once, and each (query, corpus) pair still scores at most once (a
    corpus vector lives in exactly one bucket)."""
    if n_bits is None:
        n_bits = adaptive_bits(e.count())
    with_sig = e.select(
        "vec_id",
        _dbl("embedding").alias("v"),
        hyperplane_signature(_dbl("embedding"), n_bits).alias("bucket"),
    )
    q = with_sig.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "bucket"
    )
    if multiprobe:
        probed = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b).cast("long"))
                for b in range(n_bits)
            ],
        )
        q = q.select("qid", "qv", F.explode(probed).alias("bucket"))
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


# --- ANN recall contracts (the A3 pattern) --------------------------
#
# The driver's synthetic embeddings are near-random (within-label avg
# cosine 0.0016 vs 0.0003 across — no cluster structure), so any
# pruning ANN there recalls ≈ its scanned fraction — that would
# measure the data, not the algorithm.  The contracts therefore run
# the REAL ann_lsh / ann_ivf operators over a PLANTED clustered frame
# derived deterministically from the embeddings table's row set (8
# tight clusters keyed by vec_id, centers/noise from xxhash64 — no
# RNG state, identical on every executor and every run), where a
# correct bucketing/probing must recover the brute-force top-3 and a
# broken one cannot.  The in-Spark recall boolean plus SQL-predictable
# counts are what the DuckDB oracle checks.

P_CLUSTERS = 8
P_DIM = 16
P_NOISE = 0.05


def _unit(salt: str, a, b):
    """Deterministic pseudo-uniform in [-1, 1) from xxhash64."""
    return (
        F.pmod(F.xxhash64(F.lit(salt), a, b), F.lit(2000)).cast("double")
        / 1000.0
        - 1.0
    )


def planted_embeddings(e: DataFrame) -> DataFrame:
    """(vec_id, embedding) with planted cluster structure: cluster =
    vec_id mod P_CLUSTERS, vector = cluster center + P_NOISE·noise,
    both xxhash64-derived."""
    idx = F.sequence(F.lit(0), F.lit(P_DIM - 1))
    cluster = F.col("vec_id") % P_CLUSTERS
    emb = F.transform(
        idx,
        lambda j: _unit("pc", cluster, j)
        + P_NOISE * _unit("pn", F.col("vec_id"), j),
    )
    return e.select("vec_id", emb.alias("embedding"))


def _ann_recall_contract(spark, sf_dir, ann_fn, bound: float) -> DataFrame:
    """Shared contract shape: run ``ann_fn`` over the planted frame,
    compare to brute-force top-3, emit (n_corpus, n_truth, recall_ok)
    where the oracle predicts n_corpus/n_truth from SQL and expects
    recall_ok TRUE."""
    e = table(spark, sf_dir, "embeddings")
    planted = planted_embeddings(e)
    truth = brute_topk(planted).select("qid", "nid")
    got = ann_fn(planted).select("qid", "nid")
    hits = truth.join(got, ["qid", "nid"], "left_semi").agg(
        F.count("*").alias("n_hit")
    )
    tot = truth.agg(F.count("*").alias("n_truth"))
    n_corpus = e.filter(F.col("vec_id") >= N_QUERY).agg(
        F.count("*").alias("n_corpus")
    )
    return (
        n_corpus.crossJoin(tot)
        .crossJoin(hits)
        .select(
            "n_corpus",
            "n_truth",
            (F.col("n_hit") >= bound * F.col("n_truth")).alias("recall_ok"),
        )
    )


_ANN_CONTRACT_SQL = f"""
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings
             WHERE vec_id >= {N_QUERY}) AS n_corpus,
           CAST({3 * N_QUERY} AS BIGINT) AS n_truth,
           TRUE AS recall_ok
"""


@register("sim_lsh", oracle=_ANN_CONTRACT_SQL)
def sim_lsh(spark, sf_dir):
    """Hyperplane-LSH ANN recall contract, externally scored: ann_lsh
    (16 buckets, multiprobe) over the planted clustered frame must
    recover ≥ 80 % of the brute-force top-3 (tight clusters land in
    one bucket; multiprobe covers cluster members split across a
    hyperplane — measured 1.0 vs 0.87 single-probe here).  n_truth =
    3·N_QUERY also proves brute force returned a full top-3 per query.
    The production-shaped adaptive-bucket path (n_bits=None sizing
    via ``adaptive_bits``) stays executing in pytest — the
    adaptive-default parity tests in
    tests/unit_ops/test_similarity_ann.py."""
    return _ann_recall_contract(
        spark, sf_dir, lambda p: ann_lsh(p, n_bits=4, multiprobe=True), 0.8
    )


IVF_K = 16  # coarse centroids
IVF_NPROBE = 3  # probed cells per query
IVF_ITERS = 2  # Lloyd iterations


def _lit_vec(vals) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in vals])


def _cell_sims(vec_col, centroids):
    """array<double> of cosine(vec, centroid_k) for every centroid —
    all JVM higher-order functions over literal centroid arrays."""
    return F.array(*[cosine(vec_col, _lit_vec(c)) for c in centroids])


IVF_TRAIN_CAP = 1_000_000  # max vectors the Lloyd loop trains on


def ivf_centroids(
    corpus: DataFrame, k: int = IVF_K, train_cap: int = IVF_TRAIN_CAP
) -> list[list[float]]:
    """Deterministic coarse quantizer: seeds = the IVF_K corpus vectors
    with the smallest xxhash64(nid) (an RNG-free sample, stable under
    any partitioning), refined with IVF_ITERS distributed Lloyd
    iterations (assign = argmax cosine vs broadcast-literal centroids;
    update = per-dimension avg, one groupBy).  Centroids are a tiny
    model artifact collected to the driver and reused across queries.

    At 10⁹+ vectors the quantizer does NOT need the whole corpus:
    training runs on a deterministic xxhash64 sample of ≤ ``train_cap``
    rows (``pmod(xxhash64('ivf-sample', nid), 2³⁰) < threshold`` — a
    pure row function, stable under any partitioning; k-means centroid
    quality converges at O(√n) samples, so 10⁶ is generous for k ≤
    4096 cells).  Small corpora pass the filter untouched — the
    driver-gate result is identical with or without the cap, which the
    planted-cluster pytest pins.

    The training loop runs 1 + IVF_ITERS jobs over ``corpus`` (seed
    pick + one assign/update per Lloyd iteration); the corpus is
    PERSISTED for the duration so the upstream scan runs ONCE — the
    seed job fills the cache, every Lloyd pass reads it (at 10⁹
    vectors, re-scanning per job would quadruple the dominant IO;
    tests/unit_ops/test_similarity_ann.py counts the materializations
    with an accumulator-instrumented source)."""
    from pyspark import StorageLevel

    corpus = corpus.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = corpus.count()  # fills the cache; every later job reads it
        train = corpus
        if n > train_cap:
            denom = 1 << 30
            thresh = int(denom * (train_cap / n))
            train = corpus.filter(
                F.pmod(F.xxhash64(F.lit("ivf-sample"), "nid"), F.lit(denom))
                < thresh
            )
        seeds = (
            train.withColumn("h", F.xxhash64("nid"))
            .orderBy("h", "nid")
            .limit(k)
            .select("cv")
            .collect()
        )
        cents = [[float(x) for x in r["cv"]] for r in seeds]
        dim = len(cents[0])
        for _ in range(IVF_ITERS):
            sims = _cell_sims(F.col("cv"), cents)
            assigned = train.select(
                "cv",
                F.array_position(sims, F.array_max(sims)).cast("int").alias("cell"),
            )
            rows = (
                assigned.groupBy("cell")
                .agg(
                    *[
                        F.avg(F.element_at("cv", i + 1)).alias(f"d{i}")
                        for i in range(dim)
                    ]
                )
                .collect()
            )
            new = list(cents)  # empty cells keep their previous centroid
            for r in rows:
                new[int(r["cell"]) - 1] = [float(r[f"d{i}"]) for i in range(dim)]
            cents = new
        return cents
    finally:
        corpus.unpersist()


def ann_ivf(
    e: DataFrame,
    k: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    train_cap: int = IVF_TRAIN_CAP,
) -> DataFrame:
    """ANN via IVF (inverted-file) coarse quantization over an
    embeddings-shaped frame — the classic scale path alongside LSH:
    corpus vectors are assigned to their nearest of ``k`` k-means
    centroids (one shuffle, reusable index); each query probes only
    its ``nprobe`` closest cells and scores exactly within them.  At
    10⁹+ vectors each query touches ~nprobe/k of the corpus, and the
    centroid model is a broadcast-sized artifact."""
    corpus = e.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("nid"), _dbl("embedding").alias("cv")
    )
    cents = ivf_centroids(corpus, k, train_cap=train_cap)
    csims = _cell_sims(F.col("cv"), cents)
    c = corpus.select(
        "nid",
        "cv",
        F.array_position(csims, F.array_max(csims)).cast("int").alias("cell"),
    )
    qsims = _cell_sims(F.col("qv"), cents)
    cells = F.array(
        *[
            F.struct(
                F.element_at(qsims, i + 1).alias("s"), F.lit(i + 1).alias("cell")
            )
            for i in range(len(cents))
        ]
    )
    probed = F.slice(F.reverse(F.array_sort(cells)), 1, nprobe)
    q = (
        e.filter(F.col("vec_id") < N_QUERY)
        .select(F.col("vec_id").alias("qid"), _dbl("embedding").alias("qv"))
        .select("qid", "qv", F.explode(probed).alias("pc"))
        .select("qid", "qv", F.col("pc.cell").alias("cell"))
    )
    scored = c.join(F.broadcast(q), "cell").select(
        "qid", "nid", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "nid", "rk", F.round("cos", 6).alias("cos"))
    )


@register("sim_ivf", oracle=_ANN_CONTRACT_SQL)
def sim_ivf(spark, sf_dir):
    """IVF ANN recall contract, externally scored: ann_ivf (k = 8
    centroids = the planted cluster count, nprobe = 2) over the
    planted clustered frame must recover ≥ 90 % of the brute-force
    top-3 — Lloyd converges onto the planted centers, so each query's
    cluster is inside its probed cells.  Same oracle shape as
    sim_lsh."""
    return _ann_recall_contract(
        spark, sf_dir, lambda p: ann_ivf(p, k=P_CLUSTERS, nprobe=2), 0.9
    )


def embcos_candidates_bucketed(
    e: DataFrame,
    threshold: float = 0.9,
    n_bits: int | None = None,
) -> DataFrame:
    """Bucketed embedding-cosine near-dup candidates — the 100 TB
    scale path the exact all-pairs operator reserves for small blocks:
    hyperplane-bucket every vector once (one shuffle on the signature),
    score pairs only inside a bucket, keep cos ≥ ``threshold``.

    Boundary robustness: the LEFT side of the self-join fans out to
    its own bucket plus the ``n_bits`` hamming-1 neighbors (multiprobe
    for pairs), so any pair whose signatures differ in ≤ 1 bit is
    scored.  Each qualifying unordered pair matches EXACTLY once —
    ``sig_a == sig_b`` hits only the un-flipped probe, and
    ``hamming(a, b) = 1`` hits only the one flipped bit — so no
    distinct/dedup pass is needed.  Scanned fraction ≈
    (n_bits+1)·2^-n_bits of the all-pairs work; candidates are a
    SUBSET of the exact cos ≥ threshold pair set by construction
    (same cosine expression, same filter), so the contract below only
    has to check recall."""
    if n_bits is None:
        n_bits = adaptive_bits(e.count())
    sig = e.select(
        "vec_id",
        _dbl("embedding").alias("v"),
        hyperplane_signature(_dbl("embedding"), n_bits).alias("sig"),
    )
    fanout = F.array(
        F.col("sig"),
        *[
            F.col("sig").bitwiseXOR(F.lit(1 << b).cast("long"))
            for b in range(n_bits)
        ],
    )
    left = sig.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.explode(fanout).alias("bucket"),
    )
    right = sig.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("sig").alias("bucket"),
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
    )


def _embcos_top_pair(spark, sf_dir) -> DataFrame:
    """Exact branch: most-similar pair within each label block.
    Blocked self-join (label carries the shuffle) + per-block argmax
    window — the shape of semantic dedup over a clustered corpus.
    This is the EXACT baseline — all-pairs within a block,
    O(|block|²); reserve it for blocks bounded under ~10⁵ vectors and
    run ``embcos_candidates_bucketed`` everywhere else."""
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


EMBCOS_THRESHOLD = 0.9  # near-dup cosine bound on the planted frame


def _embcos_scale_contract(spark, sf_dir) -> DataFrame:
    """Scale-path branch (A3 pattern): run the REAL bucketed operator
    over the planted clustered frame and emit (n_truth, recall_ok).
    n_truth is computed from actual cosines (exact all-pairs ≥ 0.9)
    but the ORACLE predicts it as the same-cluster pair count
    Σ c·(c−1)/2 over vec_id % P_CLUSTERS — pure SQL over the
    embeddings view — so a single hash-match simultaneously proves the
    planted within/cross separation (within ≥ 0.992, cross ≤ 0.544
    measured) AND pins the truth set the recall is measured against.
    Candidates ⊆ truth by construction (same cosine + threshold), so
    recall is the whole contract."""
    e = table(spark, sf_dir, "embeddings")
    p = planted_embeddings(e)
    pv = p.select("vec_id", _dbl("embedding").alias("v"))
    a, b = pv.alias("a"), pv.alias("b")
    truth = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .filter(F.col("cos") >= EMBCOS_THRESHOLD)
        .select("vec_a", "vec_b")
    )
    cand = embcos_candidates_bucketed(
        p, threshold=EMBCOS_THRESHOLD, n_bits=4
    ).select("vec_a", "vec_b")
    n_hit = truth.join(cand, ["vec_a", "vec_b"], "left_semi").agg(
        F.count("*").alias("n_hit")
    )
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    return n_truth.crossJoin(n_hit).select(
        "n_truth",
        (F.col("n_hit") >= 0.95 * F.col("n_truth")).alias("recall_ok"),
    )


_EMBCOS_TOP_PAIR_SQL = """
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
"""

_EMBCOS_SCALE_SQL = f"""
    SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n_truth,
           TRUE AS recall_ok
    FROM (SELECT count(*) AS c FROM embeddings
          GROUP BY vec_id % {P_CLUSTERS})
"""

_EMBCOS_SQL = probes(
    wrap(
        "top_pair",
        ["label", "vec_a", "vec_b", "cos"],
        _EMBCOS_TOP_PAIR_SQL,
        {"cos": 6},
    ),
    wrap("scale", ["n_truth", "recall_ok"], _EMBCOS_SCALE_SQL),
)


@register("dedup_embcos", oracle=_EMBCOS_SQL)
def dedup_embcos(spark, sf_dir):
    """Embedding-cosine near-dup, composite (both branches externally
    scored every round):

    - ``top_pair``: the exact within-label argmax — all-pairs inside a
      label block, DuckDB-replayed verbatim;
    - ``scale``: the bucketed 100 TB path (hyperplane buckets +
      hamming-1 pair multiprobe, ``embcos_candidates_bucketed``) run
      over the planted clustered frame, its recall vs the exact
      cos ≥ 0.9 pair set pinned ≥ 0.95 and the truth-set size pinned
      to the SQL-predicted same-cluster pair count."""
    return union_tagged(
        [
            ("top_pair", _embcos_top_pair(spark, sf_dir), {"cos": 6}),
            ("scale", _embcos_scale_contract(spark, sf_dir), None),
        ]
    )
