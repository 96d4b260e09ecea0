"""Map-type functions (operator F5, SURVEY.md §2.2 group F).

One composite query exercising the full MapType surface —
``map_from_entries`` / ``create_map`` / ``map_keys`` / ``map_values``
/ ``element_at(map, key)`` / ``map_concat`` — with every output
derived THROUGH a map column, so the oracle equality actually pins the
map semantics (entry order = sorted entry list, lookup, concat).

DuckDB's MAP syntax differs from Spark's, so the oracle computes the
same scalars relationally (count/lookup/sum/ordered string_agg): the
map is the Spark-side representation under test, the oracle checks the
values it yields.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.io.read import table
from ner_spark.ops import register


@register(
    "fn_map",
    oracle="""
    SELECT n_regionkey,
           CAST(count(*) AS INT) AS n_keys,
           max(CASE WHEN n_name = 'CHINA'
                    THEN CAST(n_nationkey AS BIGINT) END) AS china_key,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
           CAST(count(*) + 1 AS INT) AS n_keys_concat,
           string_agg(n_name, ',' ORDER BY n_name) AS keys_csv
    FROM nation GROUP BY n_regionkey
    """,
)
def fn_map(spark, sf_dir):
    """Per-region name→key map: build (map_from_entries over a sorted
    entry list — deterministic key order), look up (element_at), fold
    values (aggregate over map_values), extend (map_concat with a
    create_map sentinel), and flatten keys (map_keys → array_join)."""
    n = table(spark, sf_dir, "nation")
    entries = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("n_name").alias("key"),
                F.col("n_nationkey").cast("long").alias("value"),
            )
        )
    )
    g = n.groupBy("n_regionkey").agg(
        F.map_from_entries(entries).alias("m")
    )
    m = F.col("m")
    m2 = F.map_concat(
        m, F.create_map(F.lit("_sentinel"), F.lit(-1).cast("long"))
    )
    return g.select(
        "n_regionkey",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, F.lit("CHINA")).alias("china_key"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("key_sum"),
        F.size(F.map_keys(m2)).alias("n_keys_concat"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )
