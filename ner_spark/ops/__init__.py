"""Operator catalog registry.

Every engine operator from SURVEY.md §2.2 registers a named query
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible,
a DuckDB oracle SQL string.  ``__spark_entry__.queries()`` /
``oracle_sql()`` are built from this registry; the local pytest
harness (tests/unit_ops/) mirrors the driver's comparison exactly.

Catalog order is plain registration order, which follows the
pipeline's architecture: the KG flagship stages first (kg_queries),
then the training-data-pipeline families (textops: text analysis +
dedup; similarity; multimodal), the UDF surface, the graph stage, map
functions, and finally the relational cross-section.  There is no
priority reordering: related relational micro-operators are grouped
into composite probe queries (see ops/relational.py header) so the
ENTIRE catalog — 50 queries — fits inside the external gate's scoring
window and every registered query is externally scored every round.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the catalog."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every catalog module so registrations run (architecture
    order — see module docstring)."""
    from ner_spark.ops import kg_queries  # noqa: F401
    from ner_spark.ops import textops  # noqa: F401
    from ner_spark.ops import similarity  # noqa: F401
    from ner_spark.ops import multimodal  # noqa: F401
    from ner_spark.ops import stream_queries  # noqa: F401
    from ner_spark.ops import udf_surface  # noqa: F401
    from ner_spark.ops import graphops  # noqa: F401
    from ner_spark.ops import mapops  # noqa: F401
    from ner_spark.ops import relational  # noqa: F401


def all_queries() -> dict[str, Callable[..., Any]]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
