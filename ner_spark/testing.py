"""Local mirror of the driver's oracle comparison: row-count + schema
+ order-insensitive value comparison between a Spark DataFrame and a
DuckDB SQL result.  Columns are sorted by name, rows by all columns
(the driver's stated compare), then values are checked exactly.
"""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # numpy float32 → float64 so both engines land on the same dtype
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("int32"):
            df[c] = df[c].astype("int64")
    # Sort BEFORE any stringification: the driver sorts the raw frame on
    # all columns, so an unsortable column (e.g. a top-level array —
    # pandas raises TypeError: unhashable type 'list') must fail HERE in
    # the mirror exactly as it fails in the driver (CORRECTNESS_r02
    # mm_features was green locally but red externally because the old
    # mirror stringified object columns first).
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, na_position="last").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df


def _cell_eq(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        a_null = a is None or (isinstance(a, float) and math.isnan(a))
        b_null = b is None or (isinstance(b, float) and math.isnan(b))
        return a_null == b_null
    if isinstance(a, float) or isinstance(b, float):
        return a == b or (
            math.isfinite(a) and math.isfinite(b) and abs(a - b) <= 0.0
        )
    return a == b


def compare_query(spark_df, duck_result) -> tuple[bool, str]:
    """Return (match, message).  Exact value equality after column/row
    normalization — the strictest reading of the driver's hash check."""
    sp = _normalize(spark_df.toPandas())
    du = _normalize(duck_result.df())
    if len(sp) != len(du):
        return False, f"row count {len(sp)} vs {len(du)}"
    if list(sp.columns) != list(du.columns):
        return False, f"columns {list(sp.columns)} vs {list(du.columns)}"
    for c in sp.columns:
        sv, dv = sp[c].tolist(), du[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not _cell_eq(a, b):
                return (
                    False,
                    f"col {c} row {i}: spark={a!r} duck={b!r} "
                    f"(dtypes {sp[c].dtype} vs {du[c].dtype})",
                )
    return True, "ok"
