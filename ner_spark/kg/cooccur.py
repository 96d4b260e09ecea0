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

Scale design — ZERO joins (SURVEY.md §2.2 W3):

The tagger emits one row per turn with its span ARRAY, so pair
generation is pure whole-stage-codegen array algebra on each row:
- intra-turn pairs: nested transform over the sorted span array;
- cross-turn pairs: ``lead(spans, d)`` over a window partitioned by
  conv_id — ONE shuffle of compact per-turn rows, then the same
  array algebra against the led arrays.

The previous formulation (two self-joins + a join back to transcripts
for the inter-span text) shuffled the mention stream three times and
the 6×-larger pair stream once; this one shuffles the per-turn rows
once.  Whale conversations cost O(turns · mentions-per-turn²), never
O(conversation²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

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

_EMPTY_PAIRS = "array()"


def _intra_pairs(ms):
    """Ordered index pairs (i < j) of a sorted span array as
    array<struct<a, b, dt:int>> — guarded so F.sequence never sees a
    descending range (sequence(0,-1) yields [0,-1]!)."""
    n = F.size(ms)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.transform(
                F.sequence(i + 1, n - 1),
                lambda j: F.struct(
                    F.element_at(ms, i + 1).alias("a"),
                    F.element_at(ms, j + 1).alias("b"),
                    F.lit(0).alias("dt"),
                ),
            ),
        )
    )
    return F.when(n >= 2, pairs).otherwise(F.expr("array()").cast(pairs_type()))


def _cross_pairs(ms, other, dt: int):
    """All pairs a ∈ ms × b ∈ other (a later turn's spans)."""
    pairs = F.flatten(
        F.transform(
            ms,
            lambda a: F.transform(
                F.coalesce(other, F.expr("array()").cast("array<struct<start:int,end:int,surface:string,label:string>>")),
                lambda b: F.struct(
                    a.alias("a"), b.alias("b"), F.lit(dt).alias("dt")
                ),
            ),
        )
    )
    return pairs


def pairs_type() -> str:
    span = "struct<start:int,end:int,surface:string,label:string>"
    return f"array<struct<a:{span},b:{span},dt:int>>"


def extract_triples(tagged_turns: DataFrame) -> DataFrame:
    """tag_turns output (conv_id, turn_idx, text, spans) → triples."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ms = F.sort_array(F.col("spans"))  # struct order = (start, end, …)
    base = tagged_turns.select(
        "conv_id",
        "turn_idx",
        "text",
        ms.alias("ms"),
        *[
            F.lead("spans", d).over(w).alias(f"next{d}")
            for d in range(1, CROSS_TURN_WINDOW + 1)
        ],
    )
    all_pairs = F.concat(
        _intra_pairs(F.col("ms")),
        *[
            _cross_pairs(F.col("ms"), F.col(f"next{d}"), d)
            for d in range(1, CROSS_TURN_WINDOW + 1)
        ],
    )
    ex = base.select(
        "conv_id", "turn_idx", "text", F.explode(all_pairs).alias("p")
    )
    a, b, dt = F.col("p.a"), F.col("p.b"), F.col("p.dt")
    gap = b["start"] - a["end"]
    # intra-turn gap rule; cross-turn pairs pass unconditionally
    ex = ex.filter((dt > 0) | gap.between(0, MAX_GAP))
    inter = F.trim(F.col("text").substr(a["end"] + 1, gap))
    pred = F.when(dt > 0, F.lit("same_context")).otherwise(
        F.when(F.length(inter).between(1, MAX_PRED_LEN), inter).otherwise(
            F.lit("co_occurs")
        )
    )
    return ex.select(
        "conv_id",
        "turn_idx",
        F.xxhash64("conv_id", "turn_idx", a["start"], a["end"]).alias(
            "subj_mention_id"
        ),
        F.xxhash64(
            "conv_id", F.col("turn_idx") + dt, b["start"], b["end"]
        ).alias("obj_mention_id"),
        a["surface"].alias("subj"),
        pred.alias("pred"),
        b["surface"].alias("obj"),
        a["label"].alias("subj_type"),
        b["label"].alias("obj_type"),
    )
