"""Tag-sequence ↔ span codecs (reference semantics C8/C9, SURVEY.md §2.1).

BIO decode is pinned to conlleval semantics: an ``I-X`` following
``O``, a different type, or sentence start OPENS a new span (treated
as ``B-X``).  BMES: ``S-X`` singleton; ``B-X M-X* E-X`` span; dangling
``B/M`` runs close at the last contiguous same-type tag.

Pure-python over lists (runs inside Arrow batches in the tagger UDF).
"""

from __future__ import annotations

LABELS = ("PER", "LOC", "ORG")
BIO_TAGS = ("O", "B-PER", "I-PER", "B-LOC", "I-LOC", "B-ORG", "I-ORG")
BMES_TAGS = ("O",) + tuple(
    f"{p}-{lab}" for lab in LABELS for p in ("B", "M", "E", "S")
)
BIO_TAG2ID = {t: i for i, t in enumerate(BIO_TAGS)}
BMES_TAG2ID = {t: i for i, t in enumerate(BMES_TAGS)}


def decode_bio(tags: list[str]) -> list[tuple[int, int, str]]:
    """[(start, end, label)] with end exclusive — conlleval semantics."""
    spans: list[tuple[int, int, str]] = []
    start, cur = -1, None
    for i, tag in enumerate(tags):
        if tag == "O" or tag is None:
            if cur is not None:
                spans.append((start, i, cur))
                cur = None
            continue
        prefix, label = tag.split("-", 1)
        if prefix == "B" or cur != label:
            if cur is not None:
                spans.append((start, i, cur))
            start, cur = i, label
        # prefix == "I" and cur == label → continue the span
    if cur is not None:
        spans.append((start, len(tags), cur))
    return spans


def decode_bmes(tags: list[str]) -> list[tuple[int, int, str]]:
    """BMES decode; dangling B/M closes at the run end."""
    spans: list[tuple[int, int, str]] = []
    start, cur = -1, None

    def close(end: int) -> None:
        nonlocal cur
        if cur is not None:
            spans.append((start, end, cur))
            cur = None

    for i, tag in enumerate(tags):
        if tag == "O" or tag is None:
            close(i)
            continue
        prefix, label = tag.split("-", 1)
        if prefix == "S":
            close(i)
            spans.append((i, i + 1, label))
        elif prefix == "B":
            close(i)
            start, cur = i, label
        elif prefix in ("M", "E"):
            if cur != label:  # illegal start → open like B
                close(i)
                start, cur = i, label
            if prefix == "E":
                close(i + 1)
    close(len(tags))
    return spans


def spans_to_bio(n: int, spans: list[tuple[int, int, str]]) -> list[str]:
    tags = ["O"] * n
    for s, e, lab in spans:
        tags[s] = f"B-{lab}"
        for i in range(s + 1, e):
            tags[i] = f"I-{lab}"
    return tags


def spans_to_bmes(n: int, spans: list[tuple[int, int, str]]) -> list[str]:
    tags = ["O"] * n
    for s, e, lab in spans:
        if e - s == 1:
            tags[s] = f"S-{lab}"
        else:
            tags[s] = f"B-{lab}"
            for i in range(s + 1, e - 1):
                tags[i] = f"M-{lab}"
            tags[e - 1] = f"E-{lab}"
    return tags


def bio_to_bmes(tags: list[str]) -> list[str]:
    return spans_to_bmes(len(tags), decode_bio(tags))
