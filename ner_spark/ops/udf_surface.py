"""UDF/UDAF/UDTF surface operators (SURVEY.md §2.2 group I) — the
remaining Python-boundary shapes beyond the tagger's mapInPandas
(U2): scalar pandas UDF (U1), grouped map (U3), grouped agg (U4),
UDTF (U5).  All Arrow-vectorized; registered as rows-only catalog
queries (⊘) with exactness pinned by pytest against built-in
equivalents."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ner_spark.io.read import table
from ner_spark.ops import register


def _codepoint_len_udf():
    """U1: scalar pandas UDF — codepoint length (mirrors C1's
    vectorized Series→Series shape).  Built lazily: pandas_udf parses
    its DDL type against the active session."""

    @pandas_udf("int")
    def codepoint_len(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len(t) if t is not None else 0)

    return codepoint_len


@register("udf_scalar")  # ⊘ pytest checks == F.length
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


@register("udf_grouped_map")  # ⊘
def udf_grouped_map(spark, sf_dir):
    """U3: groupBy().applyInPandas — groups must fit in memory; at
    scale, guard group size upstream (the whale-conversation salting
    exists exactly because of this constraint)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )
    return li.groupBy("l_orderkey").applyInPandas(
        _order_profile, "l_orderkey long, n_lines long, max_step double"
    )


def _wavg_udf():
    """U4: grouped-agg pandas UDF (Series→scalar)."""

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        denom = qty.sum()
        return float((price * qty).sum() / denom) if denom else 0.0

    return wavg


@register("udf_grouped_agg")  # ⊘ pytest checks ≈ SQL formula
def udf_grouped_agg(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(_wavg_udf()("l_extendedprice", "l_quantity"), 4).alias(
            "wavg_price"
        )
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


@register("udtf_pairs")  # ⊘ pytest checks == join_self-style expansion
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
