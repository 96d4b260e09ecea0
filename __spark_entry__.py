"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real definitions live in the ``ner_spark`` package; this module is
a thin adapter over its operator registry (ner_spark.ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline slice over transcripts synthesized
    deterministically from sf0.001 documents — tag mentions (BiLSTM-CRF
    mapInPandas), extract co-occurrence triples, return the triples."""
    from ner_spark.pipeline import flagship

    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ner_spark.ops import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from ner_spark.ops import all_oracles

    return all_oracles()
