"""Deterministic synthetic transcripts + gold spans (FIXTURES.md §1–2).

Generation is order- and partition-independent: every conversation is
produced by a pure function of its conv_id (per-conv child RNG seeded
by a stable hash), so distributed generation at any parallelism yields
byte-identical rows.  No external data.

Tiers:
- unit:        20 convs, ≤8 turns, pinned edge-case convs first
- correctness: 2,000 convs (Zipf turn counts)
- bench:       parameterized up to ≥10⁶ turns, one pinned whale conv
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ner_spark.fixtures.gazetteer import GAZ_BY_LABEL

BASE_TS = datetime(2024, 1, 1)

# Templates: {PER}/{LOC}/{ORG} placeholders are gazetteer splices at
# computed codepoint offsets; the generator records each splice as gold.
TEMPLATES = [
    "{PER}在{ORG}讨论{LOC}的部署方案",
    "今天{PER}和{PER}一起去了{LOC}",
    "{ORG}宣布将在{LOC}建立新的数据中心",
    "请问{PER}是否已经加入{ORG}",
    "{LOC}的天气不错，{PER}计划出差",
    "deploy to {LOC} cluster per {PER} request",
    "{ORG}与{ORG}达成合作协议",
    "会议纪要：{PER}负责跟进{ORG}的合同",
    "没有任何实体的普通句子，只是噪音文本而已",
    "system maintenance window acknowledged",
    "{PER}",
    "关于{LOC}项目进度的更新来自{ORG}",
]

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "calc", "browse"]

TRANSCRIPT_FIELDS = [
    ("conv_id", T.StringType()),
    ("turn_idx", T.IntegerType()),
    ("role", T.StringType()),
    ("text", T.StringType()),
    ("tool", T.StringType()),
    ("ts", T.TimestampType()),
]
TRANSCRIPT_SCHEMA = T.StructType(
    [T.StructField(n, t, n == "tool") for n, t in TRANSCRIPT_FIELDS]
)
GOLD_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
    ]
)

# Pinned edge-case turns for the unit tier (FIXTURES.md §1 bullet 3):
# (text-template, spans are recomputed by the splicer).  Special
# entries below are literal texts with hand-pinned spans.
_EDGE_TURNS: list[tuple[str, list[tuple[int, int, str, str]]]] = [
    # entity at offset 0 and at end-of-string
    ("王伟在北京", [(0, 2, "王伟", "PER"), (3, 5, "北京", "LOC")]),
    # adjacent entities (B-X B-X boundary)
    ("王伟李芳都在", [(0, 2, "王伟", "PER"), (2, 4, "李芳", "PER")]),
    # single-char entity (BMES S-X)
    ("王在南京", [(0, 1, "王", "PER"), (2, 4, "南京", "LOC")]),
    # entity spanning the full text
    ("华信公司", [(0, 4, "华信公司", "ORG")]),
    # non-BMP codepoint before an entity (codepoint offset math)
    ("😀王伟到了", [(1, 3, "王伟", "PER")]),
    # empty text (empty-adjacent turns)
    ("", []),
    ("", []),
]


def _seed(conv_id: str) -> int:
    return int.from_bytes(hashlib.md5(conv_id.encode()).digest()[:8], "big")


def _zipf_turns(rng: random.Random, lo: int = 1, hi: int = 512) -> int:
    # Zipf(a=2.1) via inverse-ish sampling, clipped (FIXTURES.md §1)
    x = int(1.0 / (rng.random() ** (1.0 / 1.1)))
    return max(lo, min(hi, x))


def _fill_template(tpl: str, rng: random.Random):
    """Splice gazetteer surfaces into tpl; return (text, spans) with
    codepoint-exact offsets."""
    out: list[str] = []
    spans: list[tuple[int, int, str, str]] = []
    pos = 0
    i = 0
    while i < len(tpl):
        if tpl[i] == "{" and tpl[i + 2 : i + 3] != "" and tpl[i + 4 : i + 5] == "}":
            label = tpl[i + 1 : i + 4]
            surfaces = GAZ_BY_LABEL[label]
            surface = surfaces[rng.randrange(len(surfaces))]
            out.append(surface)
            spans.append((pos, pos + len(surface), surface, label))
            pos += len(surface)
            i += 5
        else:
            out.append(tpl[i])
            pos += 1
            i += 1
    return "".join(out), spans


def gen_conv(
    conv_id: str,
    conv_ord: int,
    tier: str = "correctness",
    n_turns_override: int | None = None,
):
    """Pure function conv_id → (turn rows, gold rows)."""
    rng = random.Random(_seed(conv_id))
    turns: list[tuple] = []
    gold: list[tuple] = []

    if tier == "unit" and conv_ord == 0:
        items = [(t, s) for t, s in _EDGE_TURNS]
    else:
        n = n_turns_override or (
            min(_zipf_turns(rng), 8) if tier == "unit" else _zipf_turns(rng)
        )
        items = []
        for _ in range(n):
            tpl = TEMPLATES[rng.randrange(len(TEMPLATES))]
            items.append(_fill_template(tpl, rng))

    t0 = BASE_TS + timedelta(hours=conv_ord % 100000, seconds=conv_ord % 59)
    for idx, (text, spans) in enumerate(items):
        role = ROLES[rng.randrange(4)] if rng.random() < 0.15 else ROLES[idx % 2]
        tool = TOOLS[rng.randrange(3)] if role == "tool" else None
        ts = t0 + timedelta(seconds=idx * (13 + (conv_ord % 7)))
        turns.append((conv_id, idx, role, text, tool, ts))
        for s, e, surf, lab in spans:
            gold.append((conv_id, idx, s, e, surf, lab))
    return turns, gold


def _gen_partition(
    it: Iterator[pd.DataFrame], tier: str, whale: bool, emit_gold: bool
) -> Iterator[pd.DataFrame]:
    cols_t = [n for n, _ in TRANSCRIPT_FIELDS]
    cols_g = [f.name for f in GOLD_SCHEMA.fields]
    for pdf in it:
        rows_t: list[tuple] = []
        rows_g: list[tuple] = []
        for conv_ord in pdf["id"].tolist():
            conv_id = f"c{conv_ord:06d}"
            override = 5000 if (whale and conv_ord == 1) else None
            t, g = gen_conv(conv_id, conv_ord, tier, override)
            rows_t.extend(t)
            rows_g.extend(g)
        if emit_gold:
            yield pd.DataFrame(rows_g, columns=cols_g)
        else:
            yield pd.DataFrame(rows_t, columns=cols_t)


def transcripts_df(
    spark: SparkSession,
    n_convs: int = 2000,
    tier: str = "correctness",
    whale: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation: one task per conv-range,
    each conv a pure function of its id — any partitioning yields the
    same rows (property-tested)."""
    parts = partitions or max(2, min(32, n_convs // 64 or 2))
    seed = spark.range(0, n_convs, 1, parts)
    return seed.mapInPandas(
        lambda it: _gen_partition(it, tier, whale, emit_gold=False),
        TRANSCRIPT_SCHEMA,
    )


def gold_spans_df(
    spark: SparkSession,
    n_convs: int = 2000,
    tier: str = "correctness",
    whale: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    parts = partitions or max(2, min(32, n_convs // 64 or 2))
    seed = spark.range(0, n_convs, 1, parts)
    return seed.mapInPandas(
        lambda it: _gen_partition(it, tier, whale, emit_gold=True), GOLD_SCHEMA
    )


def transcripts_pdf(n_convs: int, tier: str = "correctness"):
    """Single-process (pandas) twin of transcripts_df for oracle runs."""
    rows_t, rows_g = [], []
    for conv_ord in range(n_convs):
        t, g = gen_conv(f"c{conv_ord:06d}", conv_ord, tier)
        rows_t.extend(t)
        rows_g.extend(g)
    cols_t = [n for n, _ in TRANSCRIPT_FIELDS]
    cols_g = [f.name for f in GOLD_SCHEMA.fields]
    return pd.DataFrame(rows_t, columns=cols_t), pd.DataFrame(rows_g, columns=cols_g)
