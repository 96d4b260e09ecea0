"""The composite-probe mechanism's core claim: Spark's tagged() and
DuckDB's wrap() render IDENTICAL (probe, row_repr) rows for the same
data — including the nasty cases (NULLs, empty strings, the '∅' null
marker and '|' separator appearing in data, negative zero, large
doubles that double→string would format differently) — PROVIDED the
documented precondition holds: float columns are pre-rounded to at
most the decimal-cast scale.  A tie exactly at the cast scale is the
one divergence (Spark HALF_UP vs DuckDB half-even) and is pinned
below as the reason for the precondition."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ner_spark.ops.probes import tagged, wrap
from ner_spark.testing import compare_query

# every double pre-rounded to <= 2 decimals (the catalog convention)
ROWS = [
    (1, "plain", -1.5),
    (2, "has|pipe", 0.0),
    (3, None, None),
    (4, "", 1e8),  # double→string: Spark "1.0E8" vs DuckDB "100000000.0"
    (5, "unicode ✓ 中文", 123.45),
    (6, "null-mark ∅ in data", -0.0),
    (7, "x", -987654321.12),
    (8, "back\\slash and \\| both", 2.0),
    (9, "∅", 3.0),  # a cell that IS the bare null marker
]


@pytest.fixture(scope="module")
def frames(spark):
    pdf = pd.DataFrame(ROWS, columns=["k", "s", "d"])
    sdf = spark.createDataFrame(
        pdf.astype(object).where(pdf.notna(), None),
        "k long, s string, d double",
    )
    con = duckdb.connect()
    con.register("v", pdf)
    return sdf, con


def test_probe_rendering_engine_equivalence(spark, frames):
    sdf, con = frames
    spark_probe = tagged("t", sdf, dec={"d": 2})
    sql = wrap("t", ["k", "s", "d"], "SELECT * FROM v", dec={"d": 2})
    ok, msg = compare_query(spark_probe, con.sql(sql))
    assert ok, msg


def test_probe_rendering_is_injective(spark):
    """Distinct row tuples must render distinctly: the unescaped
    rendering collided ('a|b','c') with ('a','b|c'), and a data cell
    holding the bare null marker with an actual NULL."""
    sdf = spark.createDataFrame(
        [("a|b", "c"), ("a", "b|c"), ("∅", "x"), (None, "x")],
        "u string, v string",
    )
    reprs = [r["row_repr"] for r in tagged("t", sdf).collect()]
    assert len(set(reprs)) == len(reprs), f"collision in {reprs}"


def test_decimal_cast_tie_diverges_between_engines(spark):
    """WHY the precondition exists: a double exactly halfway between
    two scale-2 decimals (dyadic .125) rounds HALF_UP in Spark's
    decimal cast and half-even in DuckDB's — composites must only
    decimal-cast columns the branch already rounded."""
    from pyspark.sql import functions as F

    sp = (
        spark.range(1)
        .select(
            F.lit(-987654321.125)
            .cast("decimal(38,2)")
            .cast("string")
            .alias("r")
        )
        .collect()[0]["r"]
    )
    con = duckdb.connect()
    du = con.sql(
        "SELECT CAST(CAST(-987654321.125 AS DOUBLE) AS DECIMAL(38,2))::VARCHAR"
    ).fetchone()[0]
    assert sp == "-987654321.13" and du == "-987654321.12"


def test_raw_double_to_string_is_engine_sensitive():
    """Documents WHY the decimal cast exists at all: raw double→string
    formats differently ('1.0E8' vs '100000000.0')."""
    import math

    spark_repr = "1.0E8"  # java Double.toString(1e8)
    con = duckdb.connect()
    duck_repr = con.sql("SELECT CAST(100000000.0::DOUBLE AS VARCHAR)").fetchone()[0]
    assert spark_repr != duck_repr
    assert math.isclose(float(spark_repr), float(duck_repr))
