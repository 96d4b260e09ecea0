"""S3: MSRA-style char-tag corpus reader — render the fixture corpus
to the reference's file format and read it back distributed."""

from __future__ import annotations

from ner_spark.fixtures.transcripts import transcripts_pdf
from ner_spark.io.read import read_msra_corpus
from ner_spark.ner.decode import spans_to_bio


def _render_corpus(path: str, n_convs: int = 30) -> int:
    """transcripts+gold → `char<SP>tag` lines, blank line between
    sentences (the reference input format, FIXTURES.md §2)."""
    turns, gold = transcripts_pdf(n_convs)
    by_turn: dict[tuple, list] = {}
    for r in gold.itertuples(index=False):
        by_turn.setdefault((r.conv_id, r.turn_idx), []).append(
            (r.start, r.end, r.label)
        )
    n_sent = 0
    with open(path, "w") as f:
        for r in turns.itertuples(index=False):
            chars = list(r.text)
            if not chars:
                continue
            tags = spans_to_bio(
                len(chars), sorted(by_turn.get((r.conv_id, r.turn_idx), []))
            )
            for ch, tag in zip(chars, tags):
                ch = " " if ch.isspace() else ch  # format uses SP delim
                f.write(f"{ch} {tag}\n")
            f.write("\n")
            n_sent += 1
    return n_sent


def test_corpus_roundtrip(spark, tmp_path):
    p = str(tmp_path / "msra_style.txt")
    n_sent = _render_corpus(p)
    df = read_msra_corpus(spark, p).toPandas()
    assert len(df) == n_sent
    # every sentence: |chars| == |tags|, tags from the BIO alphabet
    for r in df.itertuples(index=False):
        assert len(r.chars) == len(r.tags)
        assert all(t == "O" or t[:2] in ("B-", "I-") for t in r.tags)
    # total token count matches the rendered file
    with open(p) as f:
        n_tokens = sum(1 for line in f if line.strip())
    assert int(df["chars"].map(len).sum()) == n_tokens
