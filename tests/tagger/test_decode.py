"""BIO/BMES span decode incl. conlleval illegal-transition semantics."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ner_spark.ner.decode import (
    BIO_TAGS,
    BMES_TAGS,
    bio_to_bmes,
    decode_bio,
    decode_bmes,
    spans_to_bio,
    spans_to_bmes,
)


def test_bio_basic():
    tags = ["B-PER", "I-PER", "O", "B-LOC", "B-ORG", "I-ORG"]
    assert decode_bio(tags) == [(0, 2, "PER"), (3, 4, "LOC"), (4, 6, "ORG")]


def test_bio_illegal_i_opens_span():
    # conlleval: I-X after O / other type / start acts as B-X
    assert decode_bio(["I-PER", "I-PER"]) == [(0, 2, "PER")]
    assert decode_bio(["O", "I-LOC"]) == [(1, 2, "LOC")]
    assert decode_bio(["B-PER", "I-LOC"]) == [(0, 1, "PER"), (1, 2, "LOC")]


def test_bio_adjacent_b():
    assert decode_bio(["B-PER", "B-PER"]) == [(0, 1, "PER"), (1, 2, "PER")]


def test_bmes_basic():
    tags = ["S-PER", "O", "B-LOC", "M-LOC", "E-LOC"]
    assert decode_bmes(tags) == [(0, 1, "PER"), (2, 5, "LOC")]


def test_bmes_dangling():
    assert decode_bmes(["B-ORG", "M-ORG"]) == [(0, 2, "ORG")]
    assert decode_bmes(["M-PER"]) == [(0, 1, "PER")]


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(1, 4), st.sampled_from(["PER", "LOC", "ORG"])),
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_roundtrip_and_scheme_agreement(raw):
    """Random non-overlapping span sets: spans→tags→spans round-trips
    in both schemes, and both schemes decode to the same span set
    (SURVEY.md §5.2 item 2c)."""
    spans, cursor = [], 0
    for gap, length, lab in raw:
        start = cursor + gap
        spans.append((start, start + length, lab))
        cursor = start + length
    n = cursor + 2
    bio = spans_to_bio(n, spans)
    bmes = spans_to_bmes(n, spans)
    assert decode_bio(bio) == spans
    assert decode_bmes(bmes) == spans
    assert bio_to_bmes(bio) == bmes
    assert set(bio) <= set(BIO_TAGS)
    assert set(bmes) <= set(BMES_TAGS)
