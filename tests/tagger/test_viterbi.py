"""Viterbi DP vs exhaustive search (SURVEY.md §5.2 item 2d)."""

from __future__ import annotations

import numpy as np
import pytest

from ner_spark.ner import model_np as M


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("T", [1, 2, 4, 6])
def test_viterbi_matches_bruteforce(seed, T):
    rng = np.random.RandomState(seed)
    emit = rng.randn(1, T, M.K).astype(np.float32) * 3
    trans = rng.randn(M.K + 2, M.K + 2).astype(np.float32)
    dp = M.viterbi_batch(emit, np.array([T], dtype=np.int32), trans)[0]
    brute = M.viterbi_brute(emit[0], trans)
    assert dp == brute


def test_viterbi_batch_padding_invariance():
    """A sentence's path must not depend on other batch members."""
    rng = np.random.RandomState(0)
    trans = rng.randn(M.K + 2, M.K + 2).astype(np.float32)
    e1 = rng.randn(1, 4, M.K).astype(np.float32)
    solo = M.viterbi_batch(e1, np.array([4], dtype=np.int32), trans)[0]
    # same emissions embedded in a padded batch with a longer neighbor
    batch = np.zeros((2, 9, M.K), dtype=np.float32)
    batch[0, :4] = e1[0]
    batch[1] = rng.randn(9, M.K)
    paths = M.viterbi_batch(batch, np.array([4, 9], dtype=np.int32), trans)
    assert paths[0] == solo


def test_empty_sentence():
    emit = np.zeros((1, 1, M.K), dtype=np.float32)
    assert M.viterbi_batch(emit, np.array([0], dtype=np.int32), np.zeros((M.K + 2, M.K + 2), dtype=np.float32)) == [[]]
