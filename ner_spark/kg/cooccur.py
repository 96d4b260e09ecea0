"""Stage 6: (subj, pred, obj) triple extraction via dependency-light
co-occurrence windows keyed by (conv_id, turn_idx) (BASELINE.json:6).

Pinned deterministic predicate rule (FIXTURES.md §3 — the test
generator implements it independently in pure python):

- intra-turn: for every mention pair (mᵢ, mⱼ) ordered by (start, end)
  with gap = mⱼ.start − mᵢ.end in [0, 30] codepoints:
  pred = trimmed inter-span text if its length ∈ [1, 12], else
  ``co_occurs``.
- cross-turn: every mention pair in turns (tᵢ, tⱼ) with
  tⱼ − tᵢ ∈ [1, 2]: pred = ``same_context``.

Scale design: both passes are pure equi-joins.
- intra-turn: self-join on (conv_id, turn_idx) — the per-key fan-out
  is (mentions per turn)², naturally tiny.
- cross-turn: the naive formulation joins on conv_id alone, which is
  quadratic in a whale conversation; instead the left side EXPLODES
  into its target turn ids (turn_idx + 1, + 2) and joins on
  (conv_id, turn_idx) — fan-out bounded by mentions-per-turn, never
  by conversation length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CROSS_TURN_WINDOW = 2
MAX_GAP = 30
MAX_PRED_LEN = 12

TRIPLE_COLS = [
    "conv_id",
    "turn_idx",
    "subj_mention_id",
    "obj_mention_id",
    "subj",
    "pred",
    "obj",
    "subj_type",
    "obj_type",
]


def _pair_select(a, b, pred_col):
    return [
        F.col("a.conv_id").alias("conv_id"),
        F.col("a.turn_idx").alias("turn_idx"),
        F.col("a.mention_id").alias("subj_mention_id"),
        F.col("b.mention_id").alias("obj_mention_id"),
        F.col("a.surface").alias("subj"),
        pred_col.alias("pred"),
        F.col("b.surface").alias("obj"),
        F.col("a.label").alias("subj_type"),
        F.col("b.label").alias("obj_type"),
    ]


def extract_triples(mentions: DataFrame, transcripts: DataFrame) -> DataFrame:
    """mentions + turn text → triples (intra-turn ∪ cross-turn)."""
    m = mentions.select(
        "conv_id", "turn_idx", "mention_id", "start", "end", "surface", "label"
    )
    a, b = m.alias("a"), m.alias("b")

    # ---- intra-turn -------------------------------------------------
    pairs = a.join(
        b,
        (F.col("a.conv_id") == F.col("b.conv_id"))
        & (F.col("a.turn_idx") == F.col("b.turn_idx"))
        & (
            (F.col("a.start") < F.col("b.start"))
            | (
                (F.col("a.start") == F.col("b.start"))
                & (F.col("a.end") < F.col("b.end"))
            )
        )
        & (F.col("b.start") - F.col("a.end")).between(0, MAX_GAP),
    )
    t = transcripts.select("conv_id", "turn_idx", "text")
    # substring is 1-based; inter-span text = text[a.end : b.start]
    inter = F.trim(
        F.col("text").substr(F.col("a.end") + 1, F.col("b.start") - F.col("a.end"))
    )
    pred = F.when(F.length(inter).between(1, MAX_PRED_LEN), inter).otherwise(
        F.lit("co_occurs")
    )
    intra = pairs.join(
        t,
        (F.col("a.conv_id") == t.conv_id) & (F.col("a.turn_idx") == t.turn_idx),
    ).select(*_pair_select(a, b, pred))

    # ---- cross-turn (explode target turns → equi-join) --------------
    a_targets = m.select(
        "conv_id",
        "turn_idx",
        "mention_id",
        "surface",
        "label",
        F.explode(
            F.array(
                *[F.col("turn_idx") + d for d in range(1, CROSS_TURN_WINDOW + 1)]
            )
        ).alias("target_turn"),
    ).alias("a")
    cross = a_targets.join(
        b,
        (F.col("a.conv_id") == F.col("b.conv_id"))
        & (F.col("a.target_turn") == F.col("b.turn_idx")),
    ).select(*_pair_select(a_targets, b, F.lit("same_context")))

    return intra.unionByName(cross)
