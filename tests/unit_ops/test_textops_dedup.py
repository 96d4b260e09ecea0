"""Near-dup family exactness properties (SURVEY.md §5.2): the
approximate paths (MinHash banding, SimHash chunking) checked against
exact Jaccard / exact Hamming computed independently in pure python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.ops.textops import (
    SIMHASH_BITS,
    dedup_simhash_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _docs(spark):
    """Planted corpus: 30 base docs, each with a near-dup mutation
    (one word appended) and some exact dups."""
    rows = []
    did = 0
    for i in range(30):
        base = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(12))
        rows.append((did, base))
        did += 1
        rows.append((did, base + " " + WORDS[i % len(WORDS)]))  # near-dup
        did += 1
        if i % 5 == 0:
            rows.append((did, base))  # exact dup
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def _jaccard(a: str, b: str, k: int = 5) -> float:
    A = {a[i : i + k] for i in range(max(len(a) - k + 1, 1))}
    B = {b[i : i + k] for i in range(max(len(b) - k + 1, 1))}
    return len(A & B) / len(A | B) if A | B else 0.0


def test_minhash_recall_vs_exact_jaccard(spark):
    import itertools

    docs, rows = _docs(spark)
    true_pairs = {
        (a, b)
        for (a, ta), (b, tb) in itertools.combinations(rows, 2)
        if _jaccard(ta, tb) >= 0.7
    }
    assert true_pairs, "fixture must plant high-jaccard pairs"
    got = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    recall = len(true_pairs & got) / len(true_pairs)
    assert recall >= 0.95, (recall, len(true_pairs))


def test_minhash_partition_invariance(spark):
    docs, _ = _docs(spark)
    a = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    b = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(docs.repartition(7))
        ).collect()
    }
    assert a == b and a


def _py_simhash(text: str, spark) -> int:
    """Independent signature: same xxhash64 inputs via a 1-row Spark
    eval (the token hash is the engine's; the vote/bit assembly here is
    pure python)."""
    toks = text.strip().split()
    hashes = [
        r[0]
        for r in spark.createDataFrame([(t,) for t in toks], "t string")
        .select(F.xxhash64("t"))
        .collect()
    ]
    sig = 0
    for b in range(SIMHASH_BITS):
        vote = sum(1 if (h >> b) & 1 else -1 for h in hashes)
        if vote > 0:
            sig |= 1 << b
    return sig


def test_simhash_64bit_and_hamming_exact(spark):
    docs, rows = _docs(spark)
    pairs = dedup_simhash_pairs(docs).collect()
    assert pairs
    by_id = dict(rows)
    # planted exact dups must be reported at hamming 0
    exact = {
        (a, b)
        for a, ta in rows
        for b, tb in rows
        if a < b and ta == tb
    }
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    for p in exact:
        assert got.get(p) == 0, (p, got.get(p))
    # every reported hamming is the exact 64-bit signature distance
    sig_cache: dict[int, int] = {}

    def sig(doc_id: int) -> int:
        if doc_id not in sig_cache:
            sig_cache[doc_id] = _py_simhash(by_id[doc_id], spark)
        return sig_cache[doc_id]

    sample = sorted(got)[:10]
    for a, b in sample:
        expected = bin((sig(a) ^ sig(b)) & ((1 << 64) - 1)).count("1")
        assert got[(a, b)] == expected
        assert got[(a, b)] <= 6


# --- winnowing rolling-hash fingerprints -----------------------------


def _py_winnow(text: str, k: int, w: int) -> set[int]:
    """Pure-python reference of winnow_fingerprints' selection."""
    import hashlib

    if len(text) < k:
        return set()
    hs = [
        int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(text) - k + 1)
    ]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_matches_python_reference(spark):
    from ner_spark.ops.textops import K_GRAM, WINNOW_W, winnow_fingerprints

    texts = [
        "the quick brown fox jumps over the lazy dog and runs away fast",
        "tiny",          # shorter than k → no fingerprints
        "exact",         # exactly k → one k-gram, fewer than w → min only
        "a" * 40,        # degenerate: all k-grams identical
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_winnow(t, K_GRAM, WINNOW_W), i


def test_winnow_shared_substring_guarantee(spark):
    """Any shared substring of length ≥ k+w−1 must yield at least one
    shared fingerprint (the SIGMOD'03 winnowing guarantee)."""
    from ner_spark.ops.textops import K_GRAM, WINNOW_W, winnow_fingerprints

    shared = "entirely identical passage kept verbatim in both docs"
    assert len(shared) >= K_GRAM + WINNOW_W - 1
    docs = spark.createDataFrame(
        [
            (0, "left preamble text … " + shared + " … one suffix"),
            (1, "other document head | " + shared + " | other tail"),
            (2, "no overlap with the planted passage whatsoever here"),
        ],
        "doc_id long, text string",
    )
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert got[0] & got[1], "shared passage must share a fingerprint"


def test_keepers_from_pairs_full_domain_and_falsifiable(spark):
    """keepers_from_pairs keeps every doc outside the graph, keeps
    exactly the min doc_id inside each component — and a MISSING
    candidate edge (the approximate path's failure mode) visibly
    inflates the keeper set, which is what the cluster_keep_scale
    recall bound measures."""
    from ner_spark.ops.textops import keepers_from_pairs

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    # clusters {0,1,2} (chained) and {4,5}; doc 3 isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a long, doc_b long"
    )
    keep = sorted(
        r["doc_id"] for r in keepers_from_pairs(docs, pairs).collect()
    )
    assert keep == [0, 3, 4]
    # drop the (1, 2) edge → the {0,1,2} cluster splits → 2 becomes a
    # spurious keeper (recall vs the true keeper set stays 1.0 but
    # precision drops: 3 of 4 approx keepers are true)
    split = spark.createDataFrame([(0, 1), (4, 5)], "doc_a long, doc_b long")
    keep2 = sorted(
        r["doc_id"] for r in keepers_from_pairs(docs, split).collect()
    )
    assert keep2 == [0, 2, 3, 4]


def test_minhash_keep_candidates_recover_planted_clusters(spark):
    """The production path's candidate edges must put every planted
    (doc, ¬doc) near-dup pair in one cluster at the keep threshold."""
    from ner_spark.ops.textops import (
        keepers_from_pairs,
        minhash_keep_candidates,
        planted_near_dups,
    )

    import hashlib

    base = spark.createDataFrame(
        [
            # mutually DISSIMILAR texts — hash-derived hex streams
            # share essentially no 5-grams across docs; each ≥ 100
            # chars so the planting predicate fires
            (
                i,
                "en",
                "web",
                " ".join(
                    hashlib.sha256(f"{i}-{j}".encode()).hexdigest()
                    for j in range(3)
                ),
            )
            for i in range(0, 40, 10)  # ids 0,10,20,30 → all planted
        ],
        "doc_id long, lang string, source string, text string",
    )
    aug = planted_near_dups(base)
    keep = keepers_from_pairs(aug, minhash_keep_candidates(aug, 0.5))
    kept = sorted(r["doc_id"] for r in keep.collect())
    # each planted pair (i, -i-1) collapses to its min id = the copy
    assert kept == [-31, -21, -11, -1]
