"""Every oracle-covered catalog query must match DuckDB exactly at
sf0.01 — the same comparison the driver runs for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from ner_spark.ops import all_oracles, all_queries
from ner_spark.testing import compare_query
from tests.conftest import SF_ORACLE

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_ORACLE)
    dres = duck.sql(ORACLES[name])
    ok, msg = compare_query(sdf, dres)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
