"""Relational operator catalog (SURVEY.md §2.2 groups A–G) with DuckDB
oracles.

Design rules for oracle-matched queries (driver compares row-count +
schema + order-insensitive value hash):

- every computed column is aliased identically in Spark and SQL;
- float aggregates are ``round(x, k)`` on both sides so ULP-order
  noise can't flip the hash;
- DuckDB ``sum(int)`` returns HUGEINT → always ``CAST(... AS BIGINT)``;
- timestamps are emitted as formatted strings (engine-neutral);
- every top-k / window ordering carries a unique tiebreak column.

Composite probe queries
-----------------------
Related micro-operators are grouped into COMPOSITE queries (e.g.
``join_variants`` = outer/semi/anti/theta/self/cross) so the whole
catalog fits inside the external gate's scoring window — every
registered query is externally scored every round; nothing relies on
catalog ordering.  A composite is the UNION of its branches, each
branch's rows rendered LOSSLESSLY as ``(probe, row_repr)`` string
pairs: ``probe`` tags the operator, ``row_repr`` is a ``|``-joined
rendering of every original column (floats via fixed-scale DECIMAL so
both engines format identically; NULL → '∅' explicitly since
concat_ws drops NULLs).  This is exactly as strong as comparing each
branch separately — every original row is represented verbatim — and
all-string schemas always sort under the driver's canonicalization.
Each branch's builder remains a standalone function below for direct
use and for plan tests.

Scale notes (the 100 TB story) are in each docstring: what shuffles,
what broadcasts, what prunes.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ner_spark.io.read import table
from ner_spark.ops import register

# --------------------------------------------------------------------------
# Composite-probe helpers (shared: ner_spark/ops/probes.py)
# --------------------------------------------------------------------------

from ner_spark.ops.probes import probes as _probes
from ner_spark.ops.probes import tagged as _tagged  # noqa: F401 (plan tests)
from ner_spark.ops.probes import union_tagged as _union_tagged
from ner_spark.ops.probes import wrap as _wrap


# --------------------------------------------------------------------------
# A. Scans
# --------------------------------------------------------------------------


@register(
    "scan_parquet",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price,
           CAST(sum(l_linenumber) AS BIGINT) AS sum_line
    FROM lineitem
    """,
)
def scan_parquet(spark, sf_dir):
    """S1: parquet scan + full agg.  At scale: columnar scan reads only
    the 2 referenced columns (check ReadSchema); partial agg map-side."""
    return table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.sum("l_linenumber").alias("sum_line"),
    )


# --------------------------------------------------------------------------
# B. Projection / filter  (P1–P4 → composite rel_project_filter)
# --------------------------------------------------------------------------

_PROJECT_EXPR_SQL = """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net
    FROM lineitem
"""


def project_expr(spark, sf_dir):
    """P1: computed projection — stays inside whole-stage codegen.
    Rounded at 4 decimals = the exact decimal width of the product, so
    rounding is a no-op grid-snap on both engines (no half-up ties)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net"),
    )


_FILTER_PRED_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS odate
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
      AND o_totalprice > 50000
"""


def filter_pred(spark, sf_dir):
    """P2: sargable conjunctive predicate — all three push to the
    parquet scan (PushedFilters), pruning row groups at scale."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & F.col("o_orderdate").between("1996-01-01", "1998-12-31")
        & (F.col("o_totalprice") > 50000)
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
    )


_FILTER_LIKE_SQL = """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%ECO%' AND p_name LIKE '%widget%'
"""


def filter_like(spark, sf_dir):
    """P3: LIKE filters (startswith/contains push down as string filters)."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%ECO%") & F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_name", "p_type")


_FILTER_NULL_SQL = """
    SELECT event_id, event_type
    FROM events
    WHERE nullif(event_type, 'error') IS NULL OR props IS NULL
"""


def filter_null(spark, sf_dir):
    """P4: null semantics — nullif/isNull/eqNullSafe composition."""
    e = table(spark, sf_dir, "events")
    return e.filter(
        F.nullif(F.col("event_type"), F.lit("error")).isNull()
        | F.col("props").isNull()
    ).select("event_id", "event_type")


@register(
    "rel_project_filter",
    oracle=_probes(
        _wrap("project", ["l_orderkey", "l_linenumber", "net"],
              _PROJECT_EXPR_SQL, dec={"net": 4}),
        _wrap("pred", ["o_orderkey", "o_custkey", "o_totalprice", "odate"],
              _FILTER_PRED_SQL, dec={"o_totalprice": 2}),
        _wrap("like", ["p_partkey", "p_name", "p_type"], _FILTER_LIKE_SQL),
        _wrap("null", ["event_id", "event_type"], _FILTER_NULL_SQL),
    ),
)
def rel_project_filter(spark, sf_dir):
    """P1–P4 composite: computed projection + sargable predicate + LIKE
    + null-semantics filters, each branch's rows rendered verbatim."""
    return _union_tagged(
        [
            ("project", project_expr(spark, sf_dir), {"net": 4}),
            ("pred", filter_pred(spark, sf_dir), {"o_totalprice": 2}),
            ("like", filter_like(spark, sf_dir), None),
            ("null", filter_null(spark, sf_dir), None),
        ]
    )


# --------------------------------------------------------------------------
# C. Joins
# --------------------------------------------------------------------------


@register(
    "join_broadcast",
    oracle="""
    SELECT r_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast(spark, sf_dir):
    """J1: star joins with explicitly broadcast dims — zero shuffle for
    the joins at any fact-table scale; only the final agg exchanges."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


_JOIN_SORTMERGE_SQL = """
    SELECT o_orderpriority, count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
"""


def join_sortmerge(spark, sf_dir):
    """J2: large-large equi-join forced to sort-merge (MERGE hint) —
    the at-scale strategy when neither side broadcasts; both sides
    shuffle on the join key once, and AQE splits skewed keys."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.hint("MERGE")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


_JOIN_SHUFFLEHASH_SQL = """
    SELECT o_orderstatus, count(*) AS n_items,
           round(avg(l_quantity), 4) AS avg_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
"""


def join_shufflehash(spark, sf_dir):
    """J3: SHUFFLE_HASH hint — avoids the sort when the build side fits
    per-partition memory (uniform keys, e.g. CC iteration joins)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.hint("SHUFFLE_HASH")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


@register(
    "join_shuffle",
    oracle=_probes(
        _wrap("sortmerge", ["o_orderpriority", "n_items", "sum_price"],
              _JOIN_SORTMERGE_SQL, dec={"sum_price": 2}),
        _wrap("shufflehash", ["o_orderstatus", "n_items", "avg_qty"],
              _JOIN_SHUFFLEHASH_SQL, dec={"avg_qty": 4}),
    ),
)
def join_shuffle(spark, sf_dir):
    """J2+J3 composite: the same large-large equi-join executed under
    both shuffle strategies (MERGE hint and SHUFFLE_HASH hint — plan
    tests assert each hint takes effect)."""
    return _union_tagged(
        [
            ("sortmerge", join_sortmerge(spark, sf_dir), {"sum_price": 2}),
            ("shufflehash", join_shufflehash(spark, sf_dir), {"avg_qty": 4}),
        ]
    )


_JOIN_LEFT_SQL = """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
"""


def join_left(spark, sf_dir):
    """J4: left outer keep-all — count(o_orderkey) skips nulls, so
    order-less customers show 0."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


_JOIN_SEMI_SQL = """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_semi(spark, sf_dir):
    """J5: left semi — existence probe, no row multiplication."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_JOIN_ANTI_SQL = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_anti(spark, sf_dir):
    """J6: left anti — the resume primitive (drop already-committed
    partitions, checkpoint/resume.py)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_JOIN_THETA_SQL = """
    SELECT n_name, count(*) AS n_other
    FROM nation, region
    WHERE n_regionkey <> r_regionkey
    GROUP BY n_name
"""


def join_theta(spark, sf_dir):
    """J7: non-equi theta join → BroadcastNestedLoopJoin.  Only ever
    used dim×dim (bounded); a fact-side NLJ would be quadratic."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey != r.r_regionkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_other"))
    )


_JOIN_SELF_SQL = """
    SELECT a.l_orderkey AS l_orderkey, count(*) AS n_pairs
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    GROUP BY a.l_orderkey
"""


def join_self(spark, sf_dir):
    """J10: keyed self-join (the CC large-star/small-star shape and the
    intra-turn mention-pairing shape) — equi key carries the shuffle,
    inequality is residual."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
        )
        .groupBy(F.col("a.l_orderkey").alias("l_orderkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


_JOIN_CROSS_SQL = """
    SELECT r_name, count(*) AS n
    FROM region CROSS JOIN nation
    GROUP BY r_name
"""


def join_cross(spark, sf_dir):
    """J12: bounded cross join (dims only)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).groupBy("r_name").agg(F.count("*").alias("n"))


@register(
    "join_variants",
    oracle=_probes(
        _wrap("left", ["c_custkey", "n_orders"], _JOIN_LEFT_SQL),
        _wrap("semi", ["c_custkey", "c_name"], _JOIN_SEMI_SQL),
        _wrap("anti", ["c_custkey", "c_name"], _JOIN_ANTI_SQL),
        _wrap("theta", ["n_name", "n_other"], _JOIN_THETA_SQL),
        _wrap("self", ["l_orderkey", "n_pairs"], _JOIN_SELF_SQL),
        _wrap("cross", ["r_name", "n"], _JOIN_CROSS_SQL),
    ),
)
def join_variants(spark, sf_dir):
    """J4–J7 + J10 + J12 composite: outer / semi / anti / theta / self
    / cross joins, each branch's rows rendered verbatim."""
    return _union_tagged(
        [
            ("left", join_left(spark, sf_dir), None),
            ("semi", join_semi(spark, sf_dir), None),
            ("anti", join_anti(spark, sf_dir), None),
            ("theta", join_theta(spark, sf_dir), None),
            ("self", join_self(spark, sf_dir), None),
            ("cross", join_cross(spark, sf_dir), None),
        ]
    )


@register(
    "join_range",
    oracle="""
    SELECT a.user_id, count(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.user_id
    """,
)
def join_range(spark, sf_dir):
    """J8: range join — equi on user_id carries the shuffle; the time
    band is a residual predicate, so no quadratic blowup beyond each
    user's own events.  At scale, additionally bucketize ts (coarse
    time bucket in the equi key) to bound per-key fan-in."""
    e = table(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (
                F.col("b.ts")
                <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")
            ),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "join_asof",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id, value, 1 AS is_ref
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, event_id, NULL AS value, 0 AS is_ref
      FROM events WHERE event_type = 'purchase'
    ), filled AS (
      SELECT user_id, ts, event_id, is_ref,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, is_ref DESC, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS asof_value
      FROM u
    )
    SELECT event_id, asof_value FROM filled WHERE is_ref = 0
    """,
)
def join_asof(spark, sf_dir):
    """J9: as-of join via the union+last(ignorenulls) window trick —
    each purchase gets the latest click value at-or-before its ts.
    One shuffle on user_id; no per-row probing.  Ordering is total
    (ts, is_ref desc, event_id) so the fill is deterministic.

    ONE scan of events: the reference/probe split is a conditional
    projection over a single IN-filtered scan, not a union of two
    filtered branches (which would read the fact table twice — at
    100 TB the scan is the cost)."""
    e = table(spark, sf_dir, "events")
    u = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.col("value"))
        .cast("double")
        .alias("value"),
        (F.col("event_type") == "click").cast("int").alias("is_ref"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_ref").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("asof_value", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("is_ref") == 0)
        .select("event_id", "asof_value")
    )


# --------------------------------------------------------------------------
# D. Aggregations
# --------------------------------------------------------------------------


@register(
    "agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_basic(spark, sf_dir):
    """A1: TPC-H Q1 shape — hash agg with automatic partial (map-side)
    + final; the only shuffle carries 4 pre-aggregated doubles per
    group, not rows."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("n"),
        )
    )


_AGG_COUNTD_SQL = """
    SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
    FROM orders GROUP BY o_orderstatus
"""


def agg_countd(spark, sf_dir):
    """A2: exact distinct — expands to two-phase agg under the hood."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
    )


_AGG_APPROXCD_SQL = """
    SELECT event_type, TRUE AS ok
    FROM events GROUP BY event_type
"""


def agg_approxcd_ok(spark, sf_dir):
    """A3: approx distinct (HLL, rsd=0.02) checked BEHAVIORALLY — the
    sketch differs across engines, so the oracle-checkable claim is
    the tolerance: |approx − exact| ≤ 5 % · exact per group.  Spark
    computes both sides and emits the boolean; the oracle expects
    TRUE for every group."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
        )
        .select(
            "event_type",
            (
                F.abs(F.col("approx") - F.col("exact"))
                <= 0.05 * F.col("exact")
            ).alias("ok"),
        )
    )


_AGG_PCTL_SQL = """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 2) AS p50,
           round(quantile_cont(value, 0.95), 2) AS p95
    FROM events GROUP BY event_type
"""


def agg_pctl(spark, sf_dir):
    """A7: exact interpolated percentiles (skew diagnostics feed the
    salting decision; at 100 TB switch to percentile_approx)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 2).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 2).alias("p95"),
        )
    )


@register(
    "agg_stats",
    oracle=_probes(
        _wrap("countd", ["o_orderstatus", "n_cust"], _AGG_COUNTD_SQL),
        _wrap("approxcd", ["event_type", "ok"], _AGG_APPROXCD_SQL),
        _wrap("pctl", ["event_type", "p50", "p95"], _AGG_PCTL_SQL,
              dec={"p50": 2, "p95": 2}),
    ),
)
def agg_stats(spark, sf_dir):
    """A2+A3+A7 composite: exact countDistinct, approx_count_distinct
    under a 5 % tolerance contract, and exact percentiles."""
    return _union_tagged(
        [
            ("countd", agg_countd(spark, sf_dir), None),
            ("approxcd", agg_approxcd_ok(spark, sf_dir), None),
            ("pctl", agg_pctl(spark, sf_dir), {"p50": 2, "p95": 2}),
        ]
    )


_AGG_ROLLUP_SQL = """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def agg_rollup(spark, sf_dir):
    """A4: rollup lattice (per status+priority / per status / total)."""
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


_AGG_PIVOT_SQL = """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
"""


def agg_pivot(spark, sf_dir):
    """A8: pivot with an explicit value list (never let Spark collect
    distinct pivot values at scale — that's a hidden job)."""
    kinds = ["click", "error", "purchase", "signup", "view"]
    df = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
    )
    return df.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@register(
    "agg_shapes",
    oracle=_probes(
        _wrap("rollup", ["o_orderstatus", "o_orderpriority", "n", "sum_price"],
              _AGG_ROLLUP_SQL, dec={"sum_price": 2}),
        _wrap("pivot",
              ["user_id", "click", "error", "purchase", "signup", "view"],
              _AGG_PIVOT_SQL),
    ),
)
def agg_shapes(spark, sf_dir):
    """A4+A8 composite: rollup lattice + explicit-value pivot (the two
    reshaping aggregations)."""
    return _union_tagged(
        [
            ("rollup", agg_rollup(spark, sf_dir), {"sum_price": 2}),
            ("pivot", agg_pivot(spark, sf_dir), None),
        ]
    )


_AGG_COLLECT_SQL = """
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS lines
    FROM lineitem GROUP BY l_orderkey
"""


def agg_collect(spark, sf_dir):
    """A5: ordered collect_list — sort_array makes the result
    partition-order independent (determinism rule, SURVEY.md §4.3);
    emitted as a csv string so the hash is engine-neutral."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
            ).alias("lines")
        )
    )


_AGG_MINBY_SQL = """
    WITH r AS (
      SELECT c_nationkey, c_name,
             row_number() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
             row_number() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
      FROM customer
    )
    SELECT c_nationkey,
           max(CASE WHEN rmax = 1 THEN c_name END) AS richest,
           max(CASE WHEN rmin = 1 THEN c_name END) AS poorest
    FROM r GROUP BY c_nationkey
"""


def agg_minby(spark, sf_dir):
    """A6: max_by/min_by with a composite (value, unique-key) ordering
    struct so float ties can't make the result nondeterministic —
    the same pattern picks canonical entity surfaces (kg/materialize)."""
    order = F.struct(F.col("c_acctbal"), F.col("c_custkey").cast("double"))
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.max_by("c_name", order).alias("richest"),
            F.min_by("c_name", order).alias("poorest"),
        )
    )


@register(
    "agg_order",
    oracle=_probes(
        _wrap("collect", ["l_orderkey", "lines"], _AGG_COLLECT_SQL),
        _wrap("minby", ["c_nationkey", "richest", "poorest"], _AGG_MINBY_SQL),
    ),
)
def agg_order(spark, sf_dir):
    """A5+A6 composite: ordered collect_list + min_by/max_by — the two
    order-sensitive aggregates, both made deterministic by explicit
    total orders."""
    return _union_tagged(
        [
            ("collect", agg_collect(spark, sf_dir), None),
            ("minby", agg_minby(spark, sf_dir), None),
        ]
    )


# --------------------------------------------------------------------------
# E. Window functions
# --------------------------------------------------------------------------

_WIN_ROWNUM_SQL = """
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
"""


def win_rownum(spark, sf_dir):
    """W1: per-group top-k via row_number (the mention_id assignment
    shape) — one shuffle on the partition key, no global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


_WIN_LAG_SQL = """
    SELECT user_id, event_id,
           round(value - lag(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
    FROM events
"""


def win_lag(spark, sf_dir):
    """W2: lag — previous-turn context shape."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


_WIN_ROWS_SQL = """
    SELECT l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mv_qty
    FROM lineitem
"""


def win_rows(spark, sf_dir):
    """W3: rows-frame moving agg — the ±k-turn co-occurrence frame.
    (l_orderkey, l_linenumber) is NOT unique in the fixture, so the
    ordering extends to a full-row total order — rows-frames demand a
    total order for determinism (same rule as O2 in the pipeline)."""
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .rowsBetween(-2, Window.currentRow)
    )
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("mv_qty"),
    )


_WIN_RANGE_SQL = """
    SELECT user_id, event_id,
           count(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS n_last_hour
    FROM events
"""


def win_range(spark, sf_dir):
    """W4: time-range frame (trailing hour) keyed on exact epoch
    microseconds — engine-neutral, no fractional-second truncation."""
    # parquet naive timestamps surface as TIMESTAMP_NTZ in Spark 4;
    # cast to session-tz (UTC) timestamp for unix_micros.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.count("*").over(w).alias("n_last_hour")
    )


_WIN_NTILE_SQL = """
    SELECT c_custkey,
           ntile(4) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
           ) AS quartile
    FROM customer
"""


def win_ntile(spark, sf_dir):
    """W5: ntile — conversation-size skew percentiles → salting input."""
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return table(spark, sf_dir, "customer").select(
        "c_custkey", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "win_analytic",
    oracle=_probes(
        _wrap("rownum", ["o_custkey", "o_orderkey", "rn"], _WIN_ROWNUM_SQL),
        _wrap("lag", ["user_id", "event_id", "delta"], _WIN_LAG_SQL,
              dec={"delta": 2}),
        _wrap("rows", ["l_orderkey", "l_linenumber", "mv_qty"],
              _WIN_ROWS_SQL, dec={"mv_qty": 2}),
        _wrap("range", ["user_id", "event_id", "n_last_hour"],
              _WIN_RANGE_SQL),
        _wrap("ntile", ["c_custkey", "quartile"], _WIN_NTILE_SQL),
    ),
)
def win_analytic(spark, sf_dir):
    """W1–W5 composite: row_number top-k, lag, rows frame, time-range
    frame, ntile — the full analytic-window surface, each branch's
    rows rendered verbatim."""
    return _union_tagged(
        [
            ("rownum", win_rownum(spark, sf_dir), None),
            ("lag", win_lag(spark, sf_dir), {"delta": 2}),
            ("rows", win_rows(spark, sf_dir), {"mv_qty": 2}),
            ("range", win_range(spark, sf_dir), None),
            ("ntile", win_ntile(spark, sf_dir), None),
        ]
    )


_WIN_TUMBLE_SQL = """
    SELECT strftime(
             to_timestamp(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600),
             '%Y-%m-%d %H:%M:%S') AS wstart,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY wstart
"""


def win_tumble(spark, sf_dir):
    """X1 batch face: 10-minute tumbling window agg via window() — the
    identical groupBy runs under readStream in streaming/face.py."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "n",
            "sum_value",
        )
    )


_WIN_SLIDE_SQL = """
    WITH x AS (
      SELECT value,
             CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - 300 * k.k AS ws
      FROM events, (SELECT unnest([0, 1]) AS k) k
    )
    SELECT strftime(to_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS wstart,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM x GROUP BY wstart
"""


def win_slide(spark, sf_dir):
    """X2 batch face: 10-minute window sliding every 5 minutes — each
    event lands in width/slide = 2 windows.  Oracle enumerates the two
    aligned window starts per event (the same expansion Spark's
    window() generator performs)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "n",
            "sum_value",
        )
    )


@register(
    "win_tumble_slide",
    oracle=_probes(
        _wrap("tumble", ["wstart", "n", "sum_value"], _WIN_TUMBLE_SQL,
              dec={"sum_value": 2}),
        _wrap("slide", ["wstart", "n", "sum_value"], _WIN_SLIDE_SQL,
              dec={"sum_value": 2}),
    ),
)
def win_tumble_slide(spark, sf_dir):
    """X1+X2 composite: tumbling and sliding time-window aggregation
    via window() — the identical groupBys run under readStream in
    streaming/face.py (stream/batch parity tests)."""
    return _union_tagged(
        [
            ("tumble", win_tumble(spark, sf_dir), {"sum_value": 2}),
            ("slide", win_slide(spark, sf_dir), {"sum_value": 2}),
        ]
    )


@register(
    "win_session",
    oracle="""
    WITH d AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
    )
    SELECT user_id, CAST(sum(brk) + 1 AS BIGINT) AS n_sessions
    FROM d GROUP BY user_id
    """,
)
def win_session(spark, sf_dir):
    """X3 batch face: session count per user via session_window (gap
    30 min).  Oracle is the classic gap-and-island SQL; boundary
    semantics match Spark's [start, last+gap) window (a gap of exactly
    30 min starts a new session)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )


# --------------------------------------------------------------------------
# F. Sort / limit / set ops
# --------------------------------------------------------------------------

_SORT_GLOBAL_SQL = """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def sort_global(spark, sf_dir):
    """O1+O3: global top-k — Spark plans TakeOrderedAndProject (per-
    partition heaps + driver merge), never a full range-partition sort."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


_SORT_TOPK_SQL = """
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
"""


def sort_topk(spark, sf_dir):
    """O3: top-k with full unique tiebreak."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(10)
    )


@register(
    "sort_limit",
    oracle=_probes(
        _wrap("global", ["o_orderkey", "o_totalprice"], _SORT_GLOBAL_SQL,
              dec={"o_totalprice": 2}),
        _wrap("topk", ["l_orderkey", "l_linenumber", "l_extendedprice"],
              _SORT_TOPK_SQL, dec={"l_extendedprice": 2}),
    ),
)
def sort_limit(spark, sf_dir):
    """O1+O3 composite: global ordered top-k on two tables (both plan
    as TakeOrderedAndProject — per-partition heaps, no full sort)."""
    return _union_tagged(
        [
            ("global", sort_global(spark, sf_dir), {"o_totalprice": 2}),
            ("topk", sort_topk(spark, sf_dir), {"l_extendedprice": 2}),
        ]
    )


_SET_UNION_SQL = """
    SELECT o_orderstatus, count(*) AS n FROM (
      SELECT * FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT * FROM orders WHERE o_totalprice > 150000
    ) GROUP BY o_orderstatus
"""


def set_union(spark, sf_dir):
    """O4: unionByName (bag semantics; overlap counted twice)."""
    o = table(spark, sf_dir, "orders")
    u = o.filter(F.col("o_orderstatus") == "F").unionByName(
        o.filter(F.col("o_totalprice") > 150000)
    )
    return u.groupBy("o_orderstatus").agg(F.count("*").alias("n"))


_SET_INTERSECT_SQL = """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
"""


def set_intersect(spark, sf_dir):
    """O5: intersect (distinct semantics)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .intersect(o.select(F.col("o_custkey").alias("c_custkey")))
    )


_SET_EXCEPT_SQL = """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def set_except(spark, sf_dir):
    """O5: except (distinct semantics) — fixture diffing."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.select("c_custkey").exceptAll(
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    ).distinct()


_SET_DISTINCT_SQL = """
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


def set_distinct(spark, sf_dir):
    """O6: dropDuplicates — the idempotent re-emit dedup primitive."""
    return table(spark, sf_dir, "orders").dropDuplicates(
        ["o_orderstatus", "o_orderpriority"]
    ).select("o_orderstatus", "o_orderpriority")


@register(
    "set_ops",
    oracle=_probes(
        _wrap("union", ["o_orderstatus", "n"], _SET_UNION_SQL),
        _wrap("intersect", ["c_custkey"], _SET_INTERSECT_SQL),
        _wrap("except", ["c_custkey"], _SET_EXCEPT_SQL),
        _wrap("distinct", ["o_orderstatus", "o_orderpriority"],
              _SET_DISTINCT_SQL),
    ),
)
def set_ops(spark, sf_dir):
    """O4+O5+O6 composite: union (bag) / intersect / except (distinct)
    / dropDuplicates."""
    return _union_tagged(
        [
            ("union", set_union(spark, sf_dir), None),
            ("intersect", set_intersect(spark, sf_dir), None),
            ("except", set_except(spark, sf_dir), None),
            ("distinct", set_distinct(spark, sf_dir), None),
        ]
    )


# --------------------------------------------------------------------------
# G. Scalar function families
# --------------------------------------------------------------------------

_FN_STRING_SQL = """
    SELECT p_partkey,
           length(p_name) AS name_len,
           upper(substring(p_name, 1, 5)) AS head,
           concat_ws('|', p_brand, p_type) AS bt,
           replace(p_name, ' ', '_') AS snake
    FROM part
"""


def fn_string(spark, sf_dir):
    """F1: string family (length/substr/upper/concat_ws/replace) —
    1-based substring semantics shared by Spark and DuckDB."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper(F.substring("p_name", 1, 5)).alias("head"),
        F.concat_ws("|", "p_brand", "p_type").alias("bt"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
    )


_FN_REGEX_SQL = """
    SELECT p_partkey,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled
    FROM part
    WHERE regexp_matches(p_brand, 'Brand#[0-9]+')
"""


def fn_regex(spark, sf_dir):
    """F1: regexp extract/replace/match.  DuckDB regexp_replace needs
    the 'g' flag to match Spark's replace-all semantics."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_brand").rlike("Brand#[0-9]+")).select(
        "p_partkey",
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("devoweled"),
    )


_FN_LEVEN_SQL = """
    SELECT c_custkey,
           levenshtein(c_name, 'Customer#000000042') AS dist
    FROM customer
"""


def fn_leven(spark, sf_dir):
    """F1: edit distance — the pairwise linking score component."""
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000042")).alias("dist"),
    )


_FN_COND_SQL = """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'big' END AS bucket,
           count(*) AS n,
           round(sum(least(o_totalprice, 100000.0)), 2) AS capped_sum,
           round(max(greatest(o_totalprice, 200000.0)), 2) AS floor_max
    FROM orders GROUP BY bucket
"""


def fn_cond(spark, sf_dir):
    """F7: when/otherwise + greatest/least."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("big")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.least(F.col("o_totalprice"), F.lit(100000.0))), 2).alias(
            "capped_sum"
        ),
        F.round(F.max(F.greatest(F.col("o_totalprice"), F.lit(200000.0))), 2).alias(
            "floor_max"
        ),
    )


@register(
    "fn_text",
    oracle=_probes(
        _wrap("string", ["p_partkey", "name_len", "head", "bt", "snake"],
              _FN_STRING_SQL),
        _wrap("regex", ["p_partkey", "brand_num", "devoweled"],
              _FN_REGEX_SQL),
        _wrap("leven", ["c_custkey", "dist"], _FN_LEVEN_SQL),
        _wrap("cond", ["bucket", "n", "capped_sum", "floor_max"],
              _FN_COND_SQL, dec={"capped_sum": 2, "floor_max": 2}),
    ),
)
def fn_text(spark, sf_dir):
    """F1+F7 composite: string family, regexp family, levenshtein, and
    conditional expressions."""
    return _union_tagged(
        [
            ("string", fn_string(spark, sf_dir), None),
            ("regex", fn_regex(spark, sf_dir), None),
            ("leven", fn_leven(spark, sf_dir), None),
            ("cond", fn_cond(spark, sf_dir),
             {"capped_sum": 2, "floor_max": 2}),
        ]
    )


_FN_DATE_SQL = """
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           count(*) AS n
    FROM orders GROUP BY month, yr
"""


def fn_date(spark, sf_dir):
    """F2: date bucketing (month truncation + extract)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.year("o_orderdate").alias("yr"),
        )
        .groupBy("month", "yr")
        .agg(F.count("*").alias("n"))
    )


_FN_JSON_SQL = """
    SELECT event_type,
           round(avg(CAST(regexp_extract(props, '"k":\\s*([0-9]+)', 1)
                          AS BIGINT)), 4) AS avg_k
    FROM events GROUP BY event_type
"""


def fn_json(spark, sf_dir):
    """F6: JSON extraction (from_json with explicit schema — never
    schema inference at scale) vs a regexp oracle."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.from_json("props", "k INT").getField("k").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 4).alias("avg_k"))
    )


@register(
    "fn_json_date",
    oracle=_probes(
        _wrap("json", ["event_type", "avg_k"], _FN_JSON_SQL,
              dec={"avg_k": 4}),
        _wrap("date", ["month", "yr", "n"], _FN_DATE_SQL),
    ),
)
def fn_json_date(spark, sf_dir):
    """F6+F2 composite: schema-explicit JSON extraction + date
    bucketing."""
    return _union_tagged(
        [
            ("json", fn_json(spark, sf_dir), {"avg_k": 4}),
            ("date", fn_date(spark, sf_dir), None),
        ]
    )


_FN_MATH_SQL = """
    SELECT l_orderkey, l_linenumber,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(pow(l_discount, 2), 6) AS disc_sq,
           abs(round(l_tax - l_discount, 2)) AS tax_gap,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
"""


def fn_math(spark, sf_dir):
    """F3: math family.  Note DuckDB log() is log10 — oracle uses ln()."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.abs(F.round(F.col("l_tax") - F.col("l_discount"), 2)).alias("tax_gap"),
        F.floor(F.col("l_quantity") / 10).alias("qty_bucket"),
        F.pmod("l_orderkey", F.lit(7)).cast("long").alias("key_mod"),
    )


_FN_HASH_SQL = """
    SELECT count(DISTINCT c_name) AS n_distinct FROM customer
"""


def fn_hash(spark, sf_dir):
    """F3: xxhash64 (the salting/mention-id hash) — engine-specific
    values, so the oracle checks injectivity-in-practice: distinct
    hashes == distinct inputs (64-bit collision odds ~0 at this scale)."""
    return table(spark, sf_dir, "customer").agg(
        F.countDistinct(F.xxhash64("c_name")).alias("n_distinct")
    )


@register(
    "fn_math_hash",
    oracle=_probes(
        _wrap("math",
              ["l_orderkey", "l_linenumber", "ln_price", "disc_sq",
               "tax_gap", "qty_bucket", "key_mod"],
              _FN_MATH_SQL,
              dec={"ln_price": 6, "disc_sq": 6, "tax_gap": 2}),
        _wrap("hash", ["n_distinct"], _FN_HASH_SQL),
    ),
)
def fn_math_hash(spark, sf_dir):
    """F3 composite: math family + xxhash64 injectivity check."""
    return _union_tagged(
        [
            ("math", fn_math(spark, sf_dir),
             {"ln_price": 6, "disc_sq": 6, "tax_gap": 2}),
            ("hash", fn_hash(spark, sf_dir), None),
        ]
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 5) AS first_val,
           round(list_sum(embedding::DOUBLE[]), 5) AS vsum,
           round(CAST(list_max(embedding) AS DOUBLE), 5) AS vmax,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos
    FROM embeddings
    """,
)
def fn_array(spark, sf_dir):
    """F4: array + higher-order functions (size/element_at/aggregate/
    array_max/filter) over the embedding column — all JVM-side, no UDF."""
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 5).alias("first_val"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 5
        ).alias("vsum"),
        F.round(F.array_max("embedding").cast("double"), 5).alias("vmax"),
        F.size(F.filter(dbl, lambda x: x > 0)).alias("n_pos"),
    )
