"""ANN recall contracts on a PLANTED clustered fixture.

The driver's synthetic embeddings are near-random (within-label avg
cosine 0.0016 vs 0.0003 across), so any pruning ANN there recalls
about its scanned fraction — that measures the data, not the
algorithm.  These tests plant real cluster structure (tight clusters
around deterministic centers) where a correct IVF / LSH implementation
must recover the brute-force top-3 almost perfectly, and a broken
bucketing/probing would not.
"""

from __future__ import annotations

import numpy as np
import pytest

from ner_spark.ops.similarity import N_QUERY, ann_ivf, ann_lsh

N_CLUSTERS = 8
PER_CLUSTER = 40
DIM = 16
NOISE = 0.05


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.RandomState(0)
    centers = rng.randn(N_CLUSTERS, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vec_id = 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[c] + NOISE * rng.randn(DIM)
            rows.append((vec_id, [float(x) for x in v]))
            vec_id += 1
    # shuffle deterministically so queries (vec_id < N_QUERY) span
    # clusters and ids don't encode cluster membership
    order = rng.permutation(len(rows))
    rows = [(int(i), rows[j][1]) for i, j in enumerate(order)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _brute(planted) -> set[tuple[int, int]]:
    pdf = planted.toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding) for r in pdf.itertuples()}
    out = set()
    for qid in range(N_QUERY):
        qv = vecs[qid]
        scored = sorted(
            (
                (
                    -float(
                        np.dot(qv, cv)
                        / (np.linalg.norm(qv) * np.linalg.norm(cv))
                    ),
                    nid,
                )
                for nid, cv in vecs.items()
                if nid >= N_QUERY
            )
        )[:3]
        out.update((qid, nid) for _s, nid in scored)
    return out


@pytest.mark.parametrize("train_cap", [10**6, 100])
def test_ivf_recall_on_planted_clusters(spark, planted, train_cap):
    """train_cap=100 also exercises the deterministic training sample
    (corpus is ~315 rows, so Lloyd sees ~a third of it) — centroid
    quality must survive subsampling, which is the 10⁹-vector story."""
    truth = _brute(planted)
    got = {
        (int(r["qid"]), int(r["nid"]))
        for r in ann_ivf(
            planted, k=N_CLUSTERS, nprobe=2, train_cap=train_cap
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, (recall, sorted(truth - got))


def test_ivf_training_scans_corpus_once(spark):
    """ivf_centroids runs 1 + IVF_ITERS jobs over the corpus (seed +
    Lloyd assign/updates); the internal persist must make the upstream
    source materialize ONCE — an accumulator-instrumented source counts
    exactly n row-visits, where the unpersisted loop would count
    (1 + IVF_ITERS)·n."""
    from ner_spark.ops.similarity import ivf_centroids

    n = 120
    rows = [
        (i, [float(((i + j) % 5) + 1) for j in range(4)]) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "nid long, cv array<double>")
    acc = spark.sparkContext.accumulator(0)

    def count_rows(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    corpus = df.mapInPandas(count_rows, df.schema)
    cents = ivf_centroids(corpus, k=4)
    assert len(cents) == 4
    assert acc.value == n, (
        f"corpus materialized {acc.value / n:.1f}x during centroid "
        f"training — the persist is not covering the Lloyd passes"
    )


def test_lsh_recall_on_planted_clusters(spark, planted):
    # 6-bit buckets: tight clusters (pairwise cosine ≥ ~0.99) land in
    # the same bucket with near-certainty; cross-cluster rarely does
    truth = _brute(planted)
    got = {
        (int(r["qid"]), int(r["nid"]))
        for r in ann_lsh(planted, n_bits=6).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, (recall, sorted(truth - got))


def test_lsh_multiprobe_dominates_single_probe(spark, planted):
    """Multiprobe (1-bit-flip neighbor buckets) must be a strict
    superset of single-probe candidates and at least as high recall —
    the boundary-robustness the sim_lsh contract relies on."""
    truth = _brute(planted)
    single = {
        (int(r["qid"]), int(r["nid"]))
        for r in ann_lsh(planted, n_bits=6).collect()
    }
    multi = {
        (int(r["qid"]), int(r["nid"]))
        for r in ann_lsh(planted, n_bits=6, multiprobe=True).collect()
    }
    r_single = len(truth & single) / len(truth)
    r_multi = len(truth & multi) / len(truth)
    assert r_multi >= r_single
    # a cluster straddling ≥ 2 hyperplanes can still evade 1-bit
    # probes, so the hard bound stays 0.8; the sim_lsh contract's own
    # planted frame measures 1.0 (vs 0.87 single-probe)
    assert r_multi >= 0.8, (r_multi, sorted(truth - multi))


def test_embcos_bucketed_candidates_contract(spark, planted):
    """The dedup_embcos 'scale' branch operator: candidates must be a
    SUBSET of the exact cos >= 0.9 pair set (same cosine, same
    threshold), recall >= 0.95 on planted clusters, and every
    qualifying pair emitted EXACTLY once (the hamming-0/1 probe-match
    argument in the docstring -- a duplicate would double-count dedup
    work at 100 TB)."""
    import itertools

    from ner_spark.ops.similarity import embcos_candidates_bucketed

    pdf = planted.toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding) for r in pdf.itertuples()}
    truth = set()
    for a, b in itertools.combinations(sorted(vecs), 2):
        va, vb = vecs[a], vecs[b]
        cos = float(
            np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
        )
        if cos >= 0.9:
            truth.add((a, b))
    rows = embcos_candidates_bucketed(planted, threshold=0.9, n_bits=4).collect()
    got = [(int(r["vec_a"]), int(r["vec_b"])) for r in rows]
    assert len(got) == len(set(got)), "duplicate candidate pairs"
    got_set = set(got)
    assert got_set <= truth, sorted(got_set - truth)[:5]
    recall = len(got_set & truth) / len(truth)
    assert recall >= 0.95, (recall, len(truth))


def test_adaptive_bits_sizing():
    """~64 vectors/bucket at any corpus size, clamped to [4, 24] --
    the pure sizing rule behind every n_bits=None default."""
    from ner_spark.ops.similarity import adaptive_bits

    assert adaptive_bits(0) == 4  # degenerate corpora stay sane
    assert adaptive_bits(500) == 4  # clamp floor: >= 16 buckets
    assert adaptive_bits(64 * 2**10) == 10  # exact interior point
    assert adaptive_bits(10**9) == 24  # clamp ceiling
    assert adaptive_bits(10**12) == 24


def test_ann_lsh_adaptive_default_matches_explicit(spark, planted):
    """n_bits=None sizes the bucket count from a one-job corpus count
    (adaptive_bits) and must behave exactly like the explicitly-sized
    operator -- this keeps the production default path EXECUTING, not
    just the explicit n_bits the registered queries pin."""
    from ner_spark.ops.similarity import adaptive_bits

    expected_bits = adaptive_bits(planted.count())
    auto = {
        (int(r["qid"]), int(r["nid"])) for r in ann_lsh(planted).collect()
    }
    explicit = {
        (int(r["qid"]), int(r["nid"]))
        for r in ann_lsh(planted, n_bits=expected_bits).collect()
    }
    assert auto == explicit
    assert auto  # non-vacuous: the adaptive run returned neighbors


def test_embcos_bucketed_adaptive_default_matches_explicit(spark, planted):
    """Same contract for the pair-dedup scale path's n_bits=None."""
    from ner_spark.ops.similarity import (
        adaptive_bits,
        embcos_candidates_bucketed,
    )

    expected_bits = adaptive_bits(planted.count())
    auto = {
        (int(r["vec_a"]), int(r["vec_b"]))
        for r in embcos_candidates_bucketed(planted, threshold=0.9).collect()
    }
    explicit = {
        (int(r["vec_a"]), int(r["vec_b"]))
        for r in embcos_candidates_bucketed(
            planted, threshold=0.9, n_bits=expected_bits
        ).collect()
    }
    assert auto == explicit
    assert auto
