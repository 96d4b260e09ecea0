"""UDF/UDAF/UDTF surface operators (SURVEY.md §2.2 group I) — the
remaining Python-boundary shapes beyond the tagger's mapInPandas
(U2): scalar pandas UDF (U1), grouped map (U3), grouped agg (U4),
UDTF (U5).  All Arrow-vectorized; since round 2 each carries a DuckDB
oracle (the UDF bodies compute SQL-expressible functions on purpose —
the Python boundary is the thing under test, so an exact external
check is strictly stronger than the pytest-vs-builtin pin it keeps)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ner_spark.io.read import table
from ner_spark.ops import register


def _codepoint_len_udf():
    """U1: scalar pandas UDF — codepoint length (mirrors C1's
    vectorized Series→Series shape).  Built lazily: pandas_udf parses
    its DDL type against the active session."""

    @pandas_udf("int")
    def codepoint_len(texts: pd.Series) -> pd.Series:
        return texts.str.len().fillna(0).astype("int32")

    return codepoint_len


@register(
    "udf_scalar",
    oracle="""
    SELECT doc_id, CAST(length(text) AS INT) AS cp_len FROM documents
    """,
)
def udf_scalar(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", _codepoint_len_udf()("text").alias("cp_len"))


def _order_profile(pdf: pd.DataFrame) -> pd.DataFrame:
    """U3 body: whole-group computation (here: per-order gap profile —
    the shape of whole-conversation context ops)."""
    pdf = pdf.sort_values(["l_linenumber", "l_partkey", "l_suppkey", "l_quantity"])
    qty = pdf["l_quantity"].to_numpy()
    return pd.DataFrame(
        {
            "l_orderkey": [int(pdf["l_orderkey"].iloc[0])],
            "n_lines": [len(pdf)],
            "max_step": [
                float(abs(qty[1:] - qty[:-1]).max()) if len(qty) > 1 else 0.0
            ],
        }
    )


@register(
    "udf_grouped_map",
    oracle="""
    WITH s AS (
      SELECT l_orderkey, l_quantity,
             lag(l_quantity) OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
             ) AS prev
      FROM lineitem
    )
    SELECT l_orderkey, count(*) AS n_lines,
           coalesce(max(abs(l_quantity - prev)), 0.0) AS max_step
    FROM s GROUP BY l_orderkey
    """,
)
def udf_grouped_map(spark, sf_dir):
    """U3: groupBy().applyInPandas — groups must fit in memory; at
    scale, guard group size upstream (the whale-conversation salting
    exists exactly because of this constraint).

    The exchange width is pinned with an explicit repartition on the
    grouping key: AQE coalesces shuffles by BYTE size, but a
    grouped-map stage's cost is per GROUP (python/pandas dispatch per
    group), which byte stats can't see — left to AQE, this small-bytes
    many-groups shuffle collapses to ONE task running every group
    sequentially (measured 65 s vs 6 s at sf0.01).  Hash-partitioning
    on the key satisfies FlatMapGroupsInPandas' required distribution,
    so the explicit exchange replaces the implicit one rather than
    adding a second."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return li.repartition(n_parts, "l_orderkey").groupBy("l_orderkey").applyInPandas(
        _order_profile, "l_orderkey long, n_lines long, max_step double"
    )


def _wavg_udf():
    """U4: grouped-agg pandas UDF (Series→scalar).

    Exact INTEGER arithmetic end-to-end: prices are 2-decimal fixed
    point, so round(price·100) recovers exact cents; the weighted
    average is then a rational num/(100·den) emitted as a 4-decimal
    fixed-point integer (×10⁴) with half-up rounding done in integer
    math — no float sum-order ulp noise, no engine round-half
    divergence (Python banker's vs DuckDB half-away, which made the
    round-4 float compare tie-flaky)."""

    @pandas_udf("long")
    def wavg(price: pd.Series, qty: pd.Series) -> int:
        cents = (price * 100).round().astype("int64")
        q = qty.astype("int64")
        den = int(q.sum())
        if den == 0:
            return 0
        num = int((cents * q).sum())
        # wavg = num/(100·den); ×10⁴ and round half-up, all integers
        return (num * 200 + den) // (2 * den)

    return wavg


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(l_quantity AS BIGINT)) * 200
                 + sum(CAST(l_quantity AS BIGINT)))
                // (2 * sum(CAST(l_quantity AS BIGINT)))
                AS BIGINT) AS wavg_price_4dp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _wavg_udf()("l_extendedprice", "l_quantity").alias("wavg_price_4dp")
    )


class PairUDTF:
    """U5: Python UDTF — co-occurrence pair generator over a span
    array (the alternative formulation of kg/cooccur's array algebra;
    eval() is called once per row, yields one row per ordered pair)."""

    def eval(self, names):  # noqa: ANN001 - UDTF protocol
        if names is None:
            return
        items = sorted(names)
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                yield (items[i], items[j])


def _register_pair_udtf(spark):
    from pyspark.sql.functions import udtf

    return udtf(PairUDTF, returnType="a string, b string")


@register(
    "udtf_pairs",
    oracle="""
    WITH names AS (
      SELECT DISTINCT l_orderkey, p_name
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), sizes AS (
      SELECT l_orderkey FROM names GROUP BY l_orderkey
      HAVING count(*) BETWEEN 2 AND 6
    )
    SELECT a.l_orderkey, a.p_name AS a, b.p_name AS b
    FROM names a
    JOIN names b ON a.l_orderkey = b.l_orderkey AND a.p_name < b.p_name
    JOIN sizes s ON s.l_orderkey = a.l_orderkey
    """,
)
def udtf_pairs(spark, sf_dir):
    """Per-order part-name pairs via UDTF (lateral join)."""
    pair_fn = _register_pair_udtf(spark)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    names = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_distinct(F.collect_list("p_name")).alias("names"))
        .filter(F.size("names").between(2, 6))
    )
    return names.lateralJoin(
        pair_fn(F.col("names").outer())
    ).select("l_orderkey", "a", "b")
