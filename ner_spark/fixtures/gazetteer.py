"""Deterministic Chinese gazetteer (FIXTURES.md §2): 60 PER, 40 LOC,
40 ORG surfaces, 1–4 chars, built from pinned syllable lists — no
RNG, pure combinatorics, identical in every process.

Includes shared-prefix pairs (exercises LSH blocking) and single-char
surfaces (exercises BMES S-X decoding).
"""

from __future__ import annotations

_SURNAMES = list("王李张刘陈杨赵黄周吴")
_GIVEN = list("伟芳娜敏静丽强磊军洋")
_LOC_STEM = list("北南东西中华金山河湖")
_LOC_SUFFIX = ["京", "州", "市", "城"]
_ORG_STEM = ["华信", "天成", "远大", "中科", "方正", "联创", "博雅", "瑞丰", "恒通", "启明"]
_ORG_SUFFIX = ["公司", "大学", "银行", "集团"]


def build_gazetteer() -> list[tuple[str, str]]:
    """[(surface, label)] — order pinned; later code may rely on it."""
    out: list[tuple[str, str]] = []
    # 60 PER: 10 single-surname (1 char), 50 surname+given (2–3 chars)
    for s in _SURNAMES:
        out.append((s, "PER"))
    i = 0
    for s in _SURNAMES:
        for g in _GIVEN[:5]:
            # half get 2-char given names (3-char total) — shared prefixes
            surface = s + g + (_GIVEN[(i + 3) % 10] if i % 2 else "")
            out.append((surface, "PER"))
            i += 1
    # 40 LOC: stem+suffix (2 chars) and stem+stem+suffix (3 chars)
    for a in _LOC_STEM[:5]:
        for suf in _LOC_SUFFIX:
            out.append((a + suf, "LOC"))
    for a in _LOC_STEM[5:]:
        for suf in _LOC_SUFFIX:
            out.append((a + "安" + suf, "LOC"))
    # 40 ORG: stem(+suffix) — 2–4 chars, shared stems
    for stem in _ORG_STEM:
        for suf in _ORG_SUFFIX:
            out.append((stem + suf, "ORG"))
    assert len(out) == 140
    return out


GAZETTEER: list[tuple[str, str]] = build_gazetteer()
GAZ_BY_LABEL: dict[str, list[str]] = {
    lab: [s for s, l in GAZETTEER if l == lab] for lab in ("PER", "LOC", "ORG")
}
