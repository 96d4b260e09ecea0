"""Composite-probe rendering helpers (see ops/relational.py header).

A composite query UNIONs several branch queries, each branch's rows
rendered LOSSLESSLY as ``(probe, row_repr)`` string pairs: ``probe``
tags the operator, ``row_repr`` is a ``|``-joined rendering of every
original column.  Floats pass through fixed-scale DECIMAL so both
engines format identically ("1.50"), where a raw double→string cast
would not (Spark "1.2E8" vs DuckDB "120000000.0"); NULL → '∅'
explicitly since concat_ws drops NULLs.  The rendering is INJECTIVE:
each cell escapes ``\\`` → ``\\\\``, ``|`` → ``\\|`` and ``∅`` →
``\\∅`` (identical replace chain in both engines) before joining, so
after escaping a bare ``|`` only ever means "column boundary" and a
bare ``∅`` only ever means NULL — distinct row tuples can never
collide into one rendering (('a|b','c') vs ('a','b|c'), or a data
cell that IS the null marker).  All-string schemas always sort under
the driver's canonicalization, and the rendering is exactly as strong
as comparing each branch separately.

PRECONDITION on ``dec`` scales: the branch must already round the
column to AT MOST the cast scale (the catalog convention — every
float output is ``round(x, k)``).  A raw double landing exactly on a
half at the cast scale (e.g. -987654321.125 at scale 2 — dyadic, so
exactly representable) rounds HALF_UP in Spark's decimal cast but
half-even in DuckDB's, and the renderings diverge
(tests/unit_ops/test_probe_rendering.py pins this).  Pre-rounded
values can't tie: round(x, k) yields the double nearest a k-decimal
value, and for |x| < ~7e13 that double is never halfway between two
k-decimal grid points.

This module must stay import-free of the catalog modules so importing
it never perturbs registration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NULL_MARK = "∅"


def _escaped(s):
    """Injective cell escaping (order matters: backslash first)."""
    s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
    s = F.replace(s, F.lit("|"), F.lit("\\|"))
    return F.replace(s, F.lit(NULL_MARK), F.lit("\\" + NULL_MARK))


def tagged(tag: str, df: DataFrame, dec: dict[str, int] | None = None):
    """Render every row of ``df`` as (probe=tag, row_repr=c1|c2|…).
    ``dec`` maps float column → decimal scale."""
    exprs = []
    for c in df.columns:
        e = F.col(c)
        if dec and c in dec:
            e = e.cast(f"decimal(38,{dec[c]})")
        exprs.append(F.coalesce(_escaped(e.cast("string")), F.lit(NULL_MARK)))
    return df.select(
        F.lit(tag).alias("probe"), F.concat_ws("|", *exprs).alias("row_repr")
    )


def union_tagged(branches) -> DataFrame:
    """branches: iterable of (tag, df, dec-or-None) → unioned probes."""
    dfs = [tagged(t, df, dec) for t, df, dec in branches]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def wrap(tag: str, cols: list[str], inner: str,
         dec: dict[str, int] | None = None) -> str:
    """DuckDB twin of tagged(): wrap a branch oracle into probe rows.
    ``cols`` must list the branch's columns in the same order as the
    Spark DataFrame's."""
    parts = []
    for c in cols:
        expr = c
        if dec and c in dec:
            expr = f"CAST({c} AS DECIMAL(38,{dec[c]}))"
        esc = (
            f"replace(replace(replace(CAST({expr} AS VARCHAR), "
            f"'\\', '\\\\'), '|', '\\|'), '{NULL_MARK}', '\\{NULL_MARK}')"
        )
        parts.append(f"coalesce({esc}, '{NULL_MARK}')")
    return (
        f"SELECT '{tag}' AS probe, concat_ws('|', {', '.join(parts)}) "
        f"AS row_repr FROM ({inner})"
    )


def probes(*wraps: str) -> str:
    return " UNION ALL ".join(wraps)
