"""Query registry: every SURVEY.md §2 operator key → (Spark callable, oracle SQL).

Conventions (driver contract, __spark_entry__.py):
  * Spark callable: (spark, sf_dir) → DataFrame, built with the DataFrame API
    (spark.sql only where it IS the operator under test).
  * Oracle: ANSI SQL for DuckDB over the pre-registered harness views.
  * Every computed column is aliased IDENTICALLY on both sides.
  * Double aggregates are ROUND()ed on both sides (sum-order ulps); integer
    and exact-decimal outputs are left alone.
  * Geo inputs are synthesized from lineitem keys (lagespark.oracles) so the
    oracle side is pure closed-form SQL.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lagespark import fixtures, oracles
from lagespark.operators import spatial

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ===========================================================================
# §2.2 projection / filter
# ===========================================================================


@q(
    "q01-project",
    "SELECT l_orderkey, l_linenumber, "
    "ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price FROM lineitem",
)
def q01(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
    )


@q(
    "q02-filter",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
    "WHERE l_quantity > 45 AND l_returnflag = 'A'",
)
def q02(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "A")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@q(
    "q03-bbox-filter",
    "SELECT pid, x, y FROM (" + oracles.POINTS_SELECT + ") "
    "WHERE x >= 2000.0 AND x <= 3300.0 AND y >= 1400.0 AND y <= 3100.0",
)
def q03(spark, sf):
    """Spatial bbox prefilter on plain columns — Catalyst-native, pushable
    (geo q03; the cheap test that runs before every exact kernel)."""
    pts = points_df(spark, sf)
    return pts.filter(
        (F.col("x") >= 2000.0)
        & (F.col("x") <= 3300.0)
        & (F.col("y") >= 1400.0)
        & (F.col("y") <= 3100.0)
    )


def _q04_oracle() -> str:
    # closed form: rect ∩ fixed window has positive area
    return (
        "WITH r AS (" + oracles.RECT_SELECT + ") "
        "SELECT rid FROM r WHERE "
        "GREATEST(0.0, LEAST(rx0 + rw, 6000.0) - GREATEST(rx0, 4000.0)) * "
        "GREATEST(0.0, LEAST(ry0 + rh, 7000.0) - GREATEST(ry0, 5000.0)) > 0"
    )


@q("q04-exact-pred", _q04_oracle())
def q04(spark, sf):
    """Exact spatial predicate (intersects) through the REAL clip kernel in a
    pandas UDF — oracle is the closed-form rect-overlap test (geo q04)."""
    import numpy as np
    from pyspark.sql.types import BooleanType

    from lagespark.kernels import geom

    win = np.array(
        [[4000.0, 5000.0], [6000.0, 5000.0], [6000.0, 7000.0], [4000.0, 7000.0]]
    )

    @F.pandas_udf(BooleanType())
    def intersects(
        rx0: pd.Series, ry0: pd.Series, rw: pd.Series, rh: pd.Series
    ) -> pd.Series:
        # batched rect-clip (round 8, VERDICT r7 #5): one vectorized numpy
        # pass instead of one Sutherland–Hodgman call per row — the rect ×
        # axis-window clip IS the bbox-overlap arithmetic (per-row equality
        # with geom.clip_area is test-pinned in test_kernels_geom)
        areas = geom.rect_clip_area_batch(
            rx0.to_numpy(), ry0.to_numpy(), rw.to_numpy(), rh.to_numpy(),
            win[0, 0], win[0, 1], win[2, 0], win[2, 1],
        )
        return pd.Series(areas > 0.0)

    r = T(spark, sf, "lineitem").selectExpr(*oracles.RECT_EXPRS)
    # cheap bbox prefilter first (q03 discipline), exact kernel on survivors
    cand = r.filter(
        (F.col("rx0") < 6000.0)
        & (F.col("rx0") + F.col("rw") > 4000.0)
        & (F.col("ry0") < 7000.0)
        & (F.col("ry0") + F.col("rh") > 5000.0)
    )
    return cand.filter(intersects("rx0", "ry0", "rw", "rh")).select("rid")


# ===========================================================================
# §2.5 relational joins
# ===========================================================================


@q(
    "q10-join-inner",
    "SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total "
    "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment",
)
def q10(spark, sf):
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@q(
    "q11-join-left",
    "SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer "
    "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey",
)
def q11(spark, sf):
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@q(
    "q12-join-semi",
    "SELECT c_custkey, c_name FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey "
    "AND o_totalprice > 300000)",
)
def q12(spark, sf):
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    big = o.filter(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@q(
    "q13-join-anti",
    "SELECT c_custkey FROM customer c "
    "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)",
)
def q13(spark, sf):
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@q(
    "q14-join-bcast",
    "SELECT p_brand, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS revenue "
    "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand",
)
def q14(spark, sf):
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@q(
    "q15-join-theta",
    "SELECT a.n_name AS n1, b.n_name AS n2 FROM nation a JOIN nation b "
    "ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey",
)
def q15(spark, sf):
    n = T(spark, sf, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2"))


@q(
    "q16-join-range",
    "SELECT r_regionkey AS bucket, COUNT(*) AS n, ROUND(SUM(value), 2) AS total "
    "FROM events JOIN region ON value >= r_regionkey * 100 "
    "AND value < (r_regionkey + 1) * 100 GROUP BY r_regionkey",
)
def q16(spark, sf):
    e, r = T(spark, sf, "events"), T(spark, sf, "region")
    return (
        e.join(
            F.broadcast(r),
            (e.value >= r.r_regionkey * 100) & (e.value < (r.r_regionkey + 1) * 100),
        )
        .groupBy(F.col("r_regionkey").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@q(
    "q17-join-asof",
    "WITH s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'), "
    "c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') "
    "SELECT c.event_id, MAX(CAST(epoch_us(s.ts) AS BIGINT)) AS signup_us "
    "FROM c LEFT JOIN s ON s.user_id = c.user_id AND s.ts <= c.ts "
    "GROUP BY c.event_id",
)
def q17(spark, sf):
    """As-of join (latest signup at-or-before each click, per user) as ONE
    native window pass: union both event streams, order within each user by
    (ts, signups-first-at-ties), and take the running max of the signup
    epoch — no per-group Python, no join explosion, whole-stage codegen.
    (A pd.merge_asof/applyInPandas variant was replaced: per-user grouped
    dispatch paid milliseconds per TINY group, dominating wall time; the
    grouped-map UDF surface stays covered by SURVEY §2.10.)"""
    from pyspark.sql import Window

    e = T(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(None).cast("long").alias("sig_us")
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("sig_us"),
    )
    # nulls-last on sig_us ⇒ at equal ts the signup row sorts BEFORE the
    # click row, so s.ts <= c.ts tie semantics match the oracle's LEFT JOIN
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("sig_us").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = clicks.unionByName(signups).withColumn("last_sig", F.max("sig_us").over(w))
    return (
        ev.filter(F.col("event_id").isNotNull())
        .groupBy("event_id")
        .agg(F.max("last_sig").alias("signup_us"))
    )


@q(
    "q19-multi-join",
    "SELECT o_orderkey, c_mktsegment, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue, "
    "COUNT(*) AS n_lines FROM customer "
    "JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE o_totalprice > 150000 GROUP BY o_orderkey, c_mktsegment",
)
def q19(spark, sf):
    """TPC-H Q3-shape three-table join with selective filter + agg."""
    c, o, li = T(spark, sf, "customer"), T(spark, sf, "orders"), T(spark, sf, "lineitem")
    return (
        c.join(o.filter(F.col("o_totalprice") > 150000), c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "c_mktsegment")
        .agg(
            # 4 dp: the exact sum HAS 4 decimals (2-dp price x 2-dp discount),
            # so rounding at that precision recovers it exactly in both
            # engines; 2 dp would sit on .005 knife-edges
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@q(
    "q48-subquery-correlated",
    "SELECT l_orderkey, l_linenumber FROM lineitem l1 WHERE l_quantity > "
    "(SELECT AVG(l_quantity) * 1.5 FROM lineitem l2 "
    "WHERE l2.l_orderkey = l1.l_orderkey)",
)
def q48(spark, sf):
    """Correlated scalar subquery through the SQL front door — Catalyst
    decorrelates it into a join; DuckDB runs the identical text."""
    T(spark, sf, "lineitem").createOrReplaceTempView("lineitem_q48")
    return spark.sql(ORACLES["q48-subquery-correlated"].replace("lineitem", "lineitem_q48"))


@q("q18-cross", "SELECT r_name, n_name FROM region CROSS JOIN nation")
def q18(spark, sf):
    return T(spark, sf, "region").crossJoin(T(spark, sf, "nation")).select(
        "r_name", "n_name"
    )


# ===========================================================================
# §2.6 aggregations
# ===========================================================================


@q(
    "q20-agg-basic",
    "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty, "
    "ROUND(SUM(l_extendedprice), 2) AS sum_base, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc, "
    "ROUND(AVG(l_quantity), 4) AS avg_qty, COUNT(*) AS n "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus",
)
def q20(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "sum_disc"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@q(
    "q21-agg-distinct",
    "SELECT COUNT(DISTINCT l_partkey) AS n_parts, "
    "COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem",
)
def q21(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@q("q22-agg-approx")  # approximate → rows-only check (driver contract)
def q22(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
    )


@q(
    "q23-rollup",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
    "ROUND(SUM(l_quantity), 2) AS sum_qty FROM lineitem "
    "GROUP BY ROLLUP(l_returnflag, l_linestatus)",
)
def q23(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@q(
    "q24-cube",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
    "ROUND(SUM(l_quantity), 2) AS sum_qty FROM lineitem "
    "GROUP BY CUBE(l_returnflag, l_linestatus)",
)
def q24(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@q(
    "q25-gsets",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem "
    "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())",
)
def q25(spark, sf):
    # PySpark 4 native grouping sets (no temp-view mutation of the session)
    return (
        T(spark, sf, "lineitem")
        .groupingSets(
            [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "q26-percentile",
    "SELECT l_returnflag, ROUND(MEDIAN(l_quantity), 4) AS med_qty FROM lineitem "
    "GROUP BY l_returnflag",
)
def q26(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("med_qty")
    )


@q(
    "q27-collect",
    "SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS lines "
    "FROM lineitem GROUP BY l_orderkey",
)
def q27(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.sort_array(F.collect_list(F.col("l_linenumber").cast("string"))), ","
        ).alias("lines")
    )


@q(
    "q29-pivot",
    "SELECT l_linestatus, "
    "ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A, "
    "ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N, "
    "ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R "
    "FROM lineitem GROUP BY l_linestatus",
)
def q29(spark, sf):
    li = T(spark, sf, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


# ===========================================================================
# §2.7 window / sort / set ops
# ===========================================================================


@q(
    "q30-rank",
    "SELECT * FROM (SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER "
    "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn "
    "FROM orders) WHERE rn <= 3",
)
def q30(spark, sf):
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@q(
    "q31-analytic",
    "SELECT event_id, LAG(event_id) OVER w AS prev_id, "
    "LEAD(event_id) OVER w AS next_id FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
)
def q31(spark, sf):
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
        F.lead("event_id").over(w).alias("next_id"),
    )


@q(
    "q32-frame",
    "SELECT event_id, ROUND(SUM(value) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov_sum "
    "FROM events",
)
def q32(spark, sf):
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select("event_id", F.round(F.sum("value").over(w), 2).alias("mov_sum"))


@q(
    "q33-topk-group",
    "SELECT * FROM (SELECT p_brand, p_partkey, p_retailprice, RANK() OVER "
    "(PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk "
    "FROM part) WHERE rk <= 2",
)
def q33(spark, sf):
    p = T(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rk", F.rank().over(w).cast("long"))
        .filter(F.col("rk") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


@q(
    "q34-sort",
    "SELECT * FROM (SELECT l_orderkey, l_linenumber, ROW_NUMBER() OVER "
    "(ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn "
    "FROM lineitem) WHERE rn <= 100",
)
def q34(spark, sf):
    li = T(spark, sf, "lineitem")
    w = Window.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 100)
        .select("l_orderkey", "l_linenumber", "rn")
    )


@q(
    "q35-topk",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 50",
)
def q35(spark, sf):
    o = T(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
        .select("o_orderkey", "o_totalprice")
    )


@q(
    "q36-union",
    "SELECT key, COUNT(*) AS n FROM (SELECT o_custkey AS key FROM orders "
    "UNION ALL SELECT c_custkey AS key FROM customer) GROUP BY key",
)
def q36(spark, sf):
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    u = o.select(F.col("o_custkey").alias("key")).unionByName(
        c.select(F.col("c_custkey").alias("key"))
    )
    return u.groupBy("key").agg(F.count(F.lit(1)).alias("n"))


@q(
    "q37-intersect",
    "SELECT l_partkey AS pk FROM lineitem INTERSECT SELECT p_partkey AS pk FROM part",
)
def q37(spark, sf):
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    return li.select(F.col("l_partkey").alias("pk")).intersect(
        p.select(F.col("p_partkey").alias("pk"))
    )


@q(
    "q38-except",
    "SELECT p_partkey AS pk FROM part EXCEPT SELECT l_partkey AS pk FROM lineitem",
)
def q38(spark, sf):
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    return p.select(F.col("p_partkey").alias("pk")).exceptAll(
        li.select(F.col("l_partkey").alias("pk"))
    ).distinct()


@q(
    "q39-window-extras",
    "SELECT o_orderkey, DENSE_RANK() OVER w AS drk, NTILE(4) OVER w AS tile, "
    "ROUND(PERCENT_RANK() OVER w, 6) AS prk, "
    "FIRST_VALUE(o_orderkey) OVER w AS first_ok "
    "FROM orders WINDOW w AS (PARTITION BY o_orderpriority "
    "ORDER BY o_totalprice DESC, o_orderkey)",
)
def q39(spark, sf):
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.dense_rank().over(w).cast("long").alias("drk"),
        F.ntile(4).over(w).cast("long").alias("tile"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.first("o_orderkey").over(w).alias("first_ok"),
    )


@q(
    "q28-percentile-approx"
)  # approximate by contract (rows-only, like q22)
def q28(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("p95"),
    )


# ===========================================================================
# §2.8 scalar functions
# ===========================================================================


@q(
    "q45-scalar-fuzzy",
    "SELECT c_custkey, levenshtein(c_name, 'Customer#000000001') AS lev, "
    "reverse(c_name) AS rname, lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded "
    "FROM customer",
)
def q45(spark, sf):
    c = T(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000001")).alias("lev"),
        F.reverse("c_name").alias("rname"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
    )


@q(
    "q40-scalar-string",
    "SELECT o_orderkey, UPPER(SUBSTRING(o_orderpriority, 1, 3)) AS pri3, "
    "CONCAT_WS('-', o_orderstatus, o_orderpriority) AS tag, "
    "LENGTH(o_orderpriority) AS len FROM orders",
)
def q40(spark, sf):
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("pri3"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.length("o_orderpriority").alias("len"),
    )


@q(
    "q41-scalar-date",
    "SELECT o_orderkey, CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)"
    " AS order_month, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr "
    "FROM orders",
)
def q41(spark, sf):
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias(
            "order_month"
        ),
        F.year("o_orderdate").cast("int").alias("yr"),
    )


@q(
    "q42-scalar-math",
    "SELECT l_orderkey, l_linenumber, ROUND(POWER(l_quantity, 2), 2) AS qty_sq, "
    "ROUND(LN(l_extendedprice), 6) AS ln_price, "
    "ROUND(RADIANS(l_quantity), 6) AS qty_rad FROM lineitem",
)
def q42(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.radians("l_quantity"), 6).alias("qty_rad"),
    )


@q(
    "q43-scalar-array",
    "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
    "CAST(list_aggregate(list_transform(string_split(text, ' '), w -> length(w)), "
    "'sum') AS BIGINT) AS total_chars FROM documents",
)
def q43(spark, sf):
    d = T(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, b: a + b
        )
        .cast("long")
        .alias("total_chars"),
    )


@q(
    "q44-scalar-json",
    "SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events",
)
def q44(spark, sf):
    e = T(spark, sf, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


@q(
    "q46-scalar-date2",
    "SELECT o_orderkey, CAST(last_day(o_orderdate) AS VARCHAR) AS month_end, "
    "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS BIGINT) "
    "AS days_to_2025, CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS dow "
    "FROM orders",
)
def q46(spark, sf):
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.datediff(F.lit("2025-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2025"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),  # 0=Sunday both
    )


@q(
    "q47-scalar-map",
    # build a map per order {status: priority-length, 'k': key%7} and read it
    "SELECT o_orderkey, "
    "list_extract(map_extract(map([o_orderstatus, 'k'], "
    "[length(o_orderpriority), CAST(o_orderkey % 7 AS INT)]), o_orderstatus), 1) "
    "AS status_val, "
    "list_extract(map_extract(map([o_orderstatus, 'k'], "
    "[length(o_orderpriority), CAST(o_orderkey % 7 AS INT)]), 'k'), 1) AS k_val, "
    "CAST(cardinality(map([o_orderstatus, 'k'], "
    "[length(o_orderpriority), CAST(o_orderkey % 7 AS INT)])) AS INT) AS m_size "
    "FROM orders",
)
def q47(spark, sf):
    """Map functions (SURVEY §2.8): map_from_arrays / element_at / size."""
    o = T(spark, sf, "orders")
    m = F.map_from_arrays(
        F.array(F.col("o_orderstatus"), F.lit("k")),
        F.array(
            F.length("o_orderpriority"),
            (F.col("o_orderkey") % 7).cast("int"),
        ),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, F.col("o_orderstatus")).alias("status_val"),
        F.element_at(m, F.lit("k")).alias("k_val"),
        F.size(m).alias("m_size"),
    )


# ===========================================================================
# §2.3 geo operators (synthesized points; closed-form SQL oracles)
# ===========================================================================


def points_df(spark, sf) -> DataFrame:
    raw = T(spark, sf, "lineitem").selectExpr(
        f"{oracles.PID_EXPR} AS pid", f"{oracles.X_EXPR} AS x", f"{oracles.Y_EXPR} AS y"
    )
    # (l_orderkey, l_linenumber) is not unique in the harness data → dedupe
    # to a unique pid deterministically (mirrors oracles.POINTS_SELECT)
    return raw.groupBy("pid").agg(F.min("x").alias("x"), F.min("y").alias("y"))


@q(
    "q50-geo-cell",
    f"SELECT cell, COUNT(*) AS n FROM (SELECT "
    f"{oracles.__dict__['PID_EXPR']} AS pid, "
    f"{oracles.X_EXPR} AS x, {oracles.Y_EXPR} AS y FROM lineitem) "
    "GROUP BY cell",  # placeholder; replaced below with the real cell expr
)
def q50(spark, sf):
    pts = spatial.with_grid_cell(points_df(spark, sf), cell_size=250.0)
    return pts.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))


# fix q50's oracle with the exact SQL-expressible cell id
from lagespark.kernels import cells as _cells  # noqa: E402

ORACLES["q50-geo-cell"] = (
    "SELECT "
    + _cells.grid_cell_sql("x", "y", 250.0)
    + " AS cell, COUNT(*) AS n FROM ("
    + oracles.POINTS_SELECT
    + ") GROUP BY cell"
)


def _gf_featureset() -> spatial.FeatureSet:
    return spatial.FeatureSet(fixtures.gruenflaeche_pdf())


def _bf_featureset() -> spatial.FeatureSet:
    return spatial.FeatureSet(fixtures.baufeld_pdf())


def _pip_oracle() -> str:
    cases = oracles.gruenflaeche_pip_cases("x", "y")
    selects = [
        f"SELECT pid, '{fid}' AS feature_id FROM pts WHERE {cond}"
        for fid, cond in cases
    ]
    return (
        "WITH pts AS (" + oracles.POINTS_SELECT + ") " + " UNION ALL ".join(selects)
    )


@q("q51-geo-pip", _pip_oracle())
def q51(spark, sf):
    """Point-in-polygon join: native grid cell + broadcast cover prefilter +
    exact ray-cast kernel (geo-pip)."""
    res = spatial.pip_join(points_df(spark, sf), _gf_featureset(), cell_size=250.0)
    return res.select("pid", "feature_id")


@q(
    "q52-geo-zone",
    "SELECT " + oracles.zone_case_sql("x", "y") + " AS zone, COUNT(*) AS n "
    "FROM (" + oracles.POINTS_SELECT + ") GROUP BY zone",
)
def q52(spark, sf):
    """Lagefaktor distance-band assignment (geo-buffer semantics on points):
    exact distance to the nearest construction polygon, vectorized kernel."""
    pts = spatial.with_zone(points_df(spark, sf), _bf_featureset())
    return pts.groupBy("zone").agg(F.count(F.lit(1)).alias("n"))


@q(
    "q53-geo-range-join",
    "WITH pts AS (" + oracles.POINTS_SELECT + "), "
    "a AS (SELECT * FROM pts WHERE pid % 37 = 0), "
    "b AS (SELECT * FROM pts WHERE pid % 41 = 0) "
    "SELECT a.pid AS pid_l, b.pid AS pid_r, "
    "ROUND(SQRT(POWER(a.x - b.x, 2) + POWER(a.y - b.y, 2)), 6) AS dist "
    "FROM a, b WHERE SQRT(POWER(a.x - b.x, 2) + POWER(a.y - b.y, 2)) < 200.0",
)
def q53(spark, sf):
    """Within-distance join via neighbor-cell explosion + exact filter
    (geo-range-join)."""
    pts = points_df(spark, sf)
    a = pts.filter(F.col("pid") % 37 == 0)
    b = pts.filter(F.col("pid") % 41 == 0)
    return spatial.range_join(
        a, b, d=200.0, cell_size=250.0, left_id="pid", right_id="pid"
    ).select("pid_l", "pid_r", "dist")


def _knn_oracle() -> str:
    from lagespark import fixtures as fx

    dist_cases = []
    for _, row in fx.gruenflaeche_pdf().iterrows():
        rings = [np.array([[p["x"], p["y"]] for p in ring]) for ring in row["rings"]]
        # distance to polygon outer ring (holes do not change exterior dist;
        # query points never fall inside features' holes region by modulus
        # subset — verified in tests)
        d = oracles.polygon_dist_sql("x", "y", rings[0], [rings[0]])
        dist_cases.append((row["feature_id"], d))
    unions = " UNION ALL ".join(
        f"SELECT pid, x, y, '{fid}' AS nn_feature_id, {d} AS d FROM q"
        for fid, d in dist_cases
    )
    return (
        "WITH q AS (SELECT * FROM (" + oracles.POINTS_SELECT + ") WHERE pid % 97 = 0), "
        "cand AS (" + unions + ") "
        "SELECT pid, nn_feature_id, ROUND(d, 6) AS nn_dist FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d, nn_feature_id) "
        "AS rn FROM cand) WHERE rn = 1"
    )


@q("q54-geo-knn", _knn_oracle())
def q54(spark, sf):
    """kNN nearest-compensation-site lookup (geo-knn, BASELINE.json:6)."""
    pts = points_df(spark, sf).filter(F.col("pid") % 97 == 0)
    res = spatial.knn_join(pts, _gf_featureset(), k=1)
    return res.select("pid", "nn_feature_id", "nn_dist")


@q(
    "q55-geo-score",
    "WITH pts AS (" + oracles.POINTS_SELECT + "), "
    "zoned AS (SELECT pid, x, y, " + oracles.zone_case_sql("x", "y") + " AS zone "
    "FROM pts), "
    "pip AS (" + _pip_oracle().replace("WITH pts AS (" + oracles.POINTS_SELECT + ") ", "") + "), "
    "fac AS (SELECT * FROM (VALUES "
    + ", ".join(
        f"({int(r.zone)}, {float(r.lagefaktor)!r})"
        for r in fixtures.factors_pdf().itertuples()
    )
    + ") t(zone, lagefaktor)), "
    "val AS (SELECT * FROM (VALUES "
    + ", ".join(
        f"('{r.feature_id}', {float(r.compensatory_value)!r})"
        for r in fixtures.gruenflaeche_pdf().itertuples()
    )
    + ") t(feature_id, compensatory_value)) "
    "SELECT p.feature_id, z.zone, COUNT(*) AS n_points, "
    "ROUND(SUM(v.compensatory_value * f.lagefaktor), 6) AS score "
    "FROM pip p JOIN zoned z USING (pid) JOIN fac f USING (zone) "
    "JOIN val v USING (feature_id) GROUP BY p.feature_id, z.zone",
)
def q55(spark, sf):
    """The flagship Lagefaktor pipeline: cell index → broadcast cover join →
    exact PIP → distance-band zone → factor join → per-feature×zone score
    (geo-score; BASELINE.json:6 'per-feature area×factor aggregation'
    semantics over contained records)."""
    gf = _gf_featureset()
    bf = _bf_featureset()
    pts = points_df(spark, sf)
    assigned = spatial.pip_join(pts, gf, cell_size=250.0)
    zoned = spatial.with_zone(assigned, bf)
    vals = gf.attrs.reset_index()[["feature_id", "compensatory_value"]]
    vdf = F.broadcast(zoned.sparkSession.createDataFrame(vals))
    factors = F.broadcast(
        zoned.sparkSession.createDataFrame(fixtures.factors_pdf())
    ).select("zone", "lagefaktor")
    return spatial.score_points(
        zoned.join(vdf, "feature_id"), factors, value_col="compensatory_value"
    )


@q(
    "q56-geo-overlay-rect",
    "WITH r AS (" + oracles.RECT_SELECT + ") "
    "SELECT ROUND(SUM(GREATEST(0.0, LEAST(rx0 + rw, 6000.0) - GREATEST(rx0, 4000.0)) * "
    "GREATEST(0.0, LEAST(ry0 + rh, 7000.0) - GREATEST(ry0, 5000.0))), 4) AS total_area, "
    "CAST(COUNT_IF(GREATEST(0.0, LEAST(rx0 + rw, 6000.0) - GREATEST(rx0, 4000.0)) * "
    "GREATEST(0.0, LEAST(ry0 + rh, 7000.0) - GREATEST(ry0, 5000.0)) > 0) AS BIGINT) "
    "AS n_hit FROM r",
)
def q56(spark, sf):
    """Polygon overlay (geo-overlay) checked through the REAL Sutherland–
    Hodgman kernel: synthesized rectangles-as-polygons clipped against a
    fixed window; oracle is the closed-form rect∩rect area."""
    r = T(spark, sf, "lineitem").selectExpr(*oracles.RECT_EXPRS)
    win = np.array([[4000.0, 5000.0], [6000.0, 5000.0], [6000.0, 7000.0], [4000.0, 7000.0]])
    from pyspark.sql.types import DoubleType

    from lagespark.kernels import geom

    @F.pandas_udf(DoubleType())
    def clip_area_udf(
        rx0: pd.Series, ry0: pd.Series, rw: pd.Series, rh: pd.Series
    ) -> pd.Series:
        out = np.empty(len(rx0))
        x0 = rx0.to_numpy()
        y0 = ry0.to_numpy()
        w = rw.to_numpy()
        h = rh.to_numpy()
        for i in range(len(out)):
            ring = np.array(
                [
                    [x0[i], y0[i]],
                    [x0[i] + w[i], y0[i]],
                    [x0[i] + w[i], y0[i] + h[i]],
                    [x0[i], y0[i] + h[i]],
                ]
            )
            out[i] = geom.clip_area(ring, win)
        return pd.Series(out)

    # a small parquet file scans as 1-2 partitions — spread the rows before
    # the CPU-bound kernel (same discipline as overlay_join's kernel stage)
    r = spatial._repartition_for_kernel(r)
    clipped = r.withColumn("a", clip_area_udf("rx0", "ry0", "rw", "rh"))
    return clipped.agg(
        F.round(F.sum("a"), 4).alias("total_area"),
        F.sum((F.col("a") > 0).cast("long")).alias("n_hit"),
    )


def _salt_oracle() -> str:
    cover = feature_cover_pdf_cached()
    vals = ", ".join(f"('{r.feature_id}', {r.cell})" for r in cover.itertuples())
    return (
        "WITH cover(feature_id, cell) AS (SELECT * FROM (VALUES " + vals + ")), "
        "pts AS (SELECT pid, "
        + _cells.grid_cell_sql("x", "y", 250.0)
        + " AS cell FROM (" + oracles.POINTS_SELECT + ")) "
        "SELECT feature_id, COUNT(*) AS n FROM pts JOIN cover USING (cell) "
        "GROUP BY feature_id"
    )


def feature_cover_pdf_cached():
    global _COVER_PDF
    try:
        return _COVER_PDF
    except NameError:
        _COVER_PDF = spatial.feature_cover_pdf(_gf_featureset(), 250.0)
        return _COVER_PDF


@q("q66-geo-salted-join", _salt_oracle())
def q66(spark, sf):
    """Explicit skew salting (geo-salt, BASELINE.json:14): the fact side gets
    salt = pmod(hash(pid), S); the dim (cell cover) replicates ×S; the join
    key becomes (cell, salt) so one hot urban cell spreads across S shuffle
    partitions. Result must equal the unsalted join — the oracle IS the
    unsalted SQL."""
    pts = spatial.with_grid_cell(points_df(spark, sf), cell_size=250.0)
    cover = spark.createDataFrame(feature_cover_pdf_cached())
    joined = spatial.salted_cell_join(pts, cover, salt=8, fact_key="pid")
    return joined.groupBy("feature_id").agg(F.count(F.lit(1)).alias("n"))


def _knn3_oracle() -> str:
    from lagespark import fixtures as fx

    dist_cases = []
    for _, row in fx.gruenflaeche_pdf().iterrows():
        rings = [np.array([[p["x"], p["y"]] for p in ring]) for ring in row["rings"]]
        d = oracles.polygon_dist_sql("x", "y", rings[0], [rings[0]])
        dist_cases.append((row["feature_id"], d))
    unions = " UNION ALL ".join(
        f"SELECT pid, x, y, '{fid}' AS nn_feature_id, {d} AS d FROM q"
        for fid, d in dist_cases
    )
    return (
        "WITH q AS (SELECT * FROM (" + oracles.POINTS_SELECT + ") WHERE pid % 101 = 0), "
        "cand AS (" + unions + ") "
        "SELECT pid, nn_feature_id, ROUND(d, 6) AS nn_dist, CAST(rn AS INT) AS nn_rank "
        "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d, "
        "nn_feature_id) AS rn FROM cand) WHERE rn <= 3"
    )


@q("q67-geo-knn3", _knn3_oracle())
def q67(spark, sf):
    """kNN with k=3 (exercises the rank output of geo-knn)."""
    pts = points_df(spark, sf).filter(F.col("pid") % 101 == 0)
    res = spatial.knn_join(pts, _gf_featureset(), k=3)
    return res.select("pid", "nn_feature_id", "nn_dist", "nn_rank")


def _rect_features(spark, sf, mod: int):
    """Synthesized rects as REAL polygon feature rows (rings/bbox) — the
    input shape of the distributed overlay join."""
    r = T(spark, sf, "lineitem").selectExpr(*oracles.RECT_EXPRS).filter(F.expr(f"rid % {mod} = 0"))
    # rid is not unique in the harness lineitem → deterministic MIN dedup
    r = r.groupBy("rid").agg(
        F.min("rx0").alias("rx0"),
        F.min("ry0").alias("ry0"),
        F.min("rw").alias("rw"),
        F.min("rh").alias("rh"),
    )
    # single selectExpr: the Column-operator form issued dozens of py4j
    # round trips per call (driver latency, round 8 — see _is_axis_rect)
    return r.selectExpr(
        "rid AS feature_id",
        "array(array("
        "named_struct('x', rx0, 'y', ry0), "
        "named_struct('x', rx0 + rw, 'y', ry0), "
        "named_struct('x', rx0 + rw, 'y', ry0 + rh), "
        "named_struct('x', rx0, 'y', ry0 + rh))) AS rings",
        "rx0 AS xmin",
        "ry0 AS ymin",
        "rx0 + rw AS xmax",
        "ry0 + rh AS ymax",
    )


@q(
    "q68-geo-overlay-join",
    "WITH r AS (" + oracles.RECT_SELECT + "), "
    "d AS (SELECT rid, MIN(rx0) AS rx0, MIN(ry0) AS ry0, MIN(rw) AS rw, "
    "MIN(rh) AS rh FROM r GROUP BY rid), "
    "a AS (SELECT * FROM d WHERE rid % 17 = 0), "
    "b AS (SELECT * FROM d WHERE rid % 19 = 0) "
    "SELECT a.rid AS id_l, b.rid AS id_r, ROUND("
    "GREATEST(0.0, LEAST(a.rx0 + a.rw, b.rx0 + b.rw) - GREATEST(a.rx0, b.rx0)) * "
    "GREATEST(0.0, LEAST(a.ry0 + a.rh, b.ry0 + b.rh) - GREATEST(a.ry0, b.ry0)), 2) "
    "AS area FROM a, b WHERE ROUND("
    "GREATEST(0.0, LEAST(a.rx0 + a.rw, b.rx0 + b.rw) - GREATEST(a.rx0, b.rx0)) * "
    "GREATEST(0.0, LEAST(a.ry0 + a.rh, b.ry0 + b.rh) - GREATEST(a.ry0, b.ry0)), 2) > 0",
)
def q68(spark, sf):
    """Distributed polygon×polygon overlay join (geo-overlay with DATA-SCALE
    feature sets on both sides): native bbox-cover explosion → cell
    equi-join → PBSM reference-cell dedup → exact clip-kernel areas. Oracle
    is the closed-form rect-overlap area."""
    a = _rect_features(spark, sf, 17)
    b = _rect_features(spark, sf, 19)
    return spatial.overlay_join(a, b, cell_size=250.0, round_to=2)


@q(
    "q82-geo-intersects-ri",
    "WITH r AS (" + oracles.RECT_SELECT + "), "
    "d AS (SELECT rid, MIN(rx0) AS rx0, MIN(ry0) AS ry0, MIN(rw) AS rw, "
    "MIN(rh) AS rh FROM r GROUP BY rid), "
    "a AS (SELECT * FROM d WHERE rid % 23 = 0), "
    "b AS (SELECT * FROM d WHERE rid % 29 = 0) "
    "SELECT a.rid AS id_l, b.rid AS id_r FROM a, b "
    "WHERE a.rx0 < b.rx0 + b.rw AND a.rx0 + a.rw > b.rx0 "
    "AND a.ry0 < b.ry0 + b.rh AND a.ry0 + a.rh > b.ry0 "
    "AND LEAST(a.rx0 + a.rw, b.rx0 + b.rw) - GREATEST(a.rx0, b.rx0) > 0 "
    "AND LEAST(a.ry0 + a.rh, b.ry0 + b.rh) - GREATEST(a.ry0, b.ry0) > 0",
)
def q82(spark, sf):
    """Boolean intersects join with Raster-Intervals-style pruning
    (PAPERS.md, SIGMOD 2023): sub-grid occupancy/full bitmasks decide most
    pairs with native bitwise ops; the exact clip kernel only sees ambiguous
    cells. Oracle is closed-form rect-intersects."""
    a = _rect_features(spark, sf, 23)
    b = _rect_features(spark, sf, 29)
    res = spatial.intersects_join_ri(a, b, cell_size=250.0, sub=4)
    return res.select("id_l", "id_r")


@q("q83-geo-pip-s2", _pip_oracle())
def q83(spark, sf):
    """PIP join keyed by the S2-family sphere index (the BASELINE.json:6
    'H3 res-9/S2 cells' join key): identical output contract to q51 —
    the same closed-form oracle checks both index paths."""
    pts = points_df(spark, sf).withColumn(
        "lon", F.col("x") / fixtures.M_PER_DEG + fixtures.LON0
    ).withColumn("lat", F.col("y") / fixtures.M_PER_DEG + fixtures.LAT0)
    res = spatial.pip_join_s2(pts, _gf_featureset(), level=15)
    return res.select("pid", "feature_id")


@q(
    "q84-geo-range-rollup",
    "SELECT CAST(COUNT_IF(x >= 1800.0 AND x <= 4200.0 AND y >= 1300.0 AND "
    "y <= 3700.0) AS BIGINT) AS n_total FROM (" + oracles.POINTS_SELECT + ")",
)
def q84(spark, sf):
    """Hypertable-style spatial rollup: per-cell materialized counts answer
    the interior of a range query; only boundary cells re-scan base points.
    Result must be EXACT — oracle is the direct count."""
    pts = points_df(spark, sf)
    roll = spatial.cell_rollup(pts, cell_size=250.0)
    res = spatial.range_count_pruned(
        pts, roll, 1800.0, 1300.0, 4200.0, 3700.0, cell_size=250.0
    )
    return res.select("n_total")


def _within_oracle(d: float = 150.0) -> str:
    from lagespark import fixtures as fx

    dists = []
    for _, row in fx.gruenflaeche_pdf().iterrows():
        rings = [np.array([[p["x"], p["y"]] for p in ring]) for ring in row["rings"]]
        dists.append(oracles.polygon_dist_sql("x", "y", rings[0], [rings[0]]))
    return (
        "SELECT pid, ROUND(LEAST(" + ", ".join(dists) + "), 6) AS dist "
        "FROM (" + oracles.POINTS_SELECT + ") "
        "WHERE LEAST(" + ", ".join(dists) + f") < {d!r}"
    )


@q("q86-geo-within-dist", _within_oracle(150.0))
def q86(spark, sf):
    """Within-distance-of-feature predicate (the buffer-band filter applied
    to an arbitrary radius): exact point-to-footprint distances, vectorized
    kernel; closed-form segment-distance oracle."""
    pts = points_df(spark, sf)
    gf = _gf_featureset()
    # footprint distance (outer rings), matching kNN semantics
    outer_only = spatial.FeatureSet(
        fixtures.gruenflaeche_pdf().assign(
            rings=lambda df: df["rings"].map(lambda rr: [rr[0]])
        )
    )
    res = spatial.with_min_dist(pts, outer_only)
    return res.filter(F.col("dist") < 150.0).select(
        "pid", F.round("dist", 6).alias("dist")
    )


@q(
    "q57-geo-s2cell",
    # round-4: the trig encode DOES have a SQL mirror — the same step chain
    # (exact double-op order) in DuckDB dialect; see cells.s2_cell_sql_steps
    "SELECT cell_s2, COUNT(*) AS n FROM ("
    + _cells.s2_nested_select_sql(
        "SELECT x / 111320.0 + 13.0 AS lon, y / 111320.0 + 52.0 AS lat "
        f"FROM ({oracles.POINTS_SELECT})",
        "lat",
        "lon",
        15,
        "duckdb",
    )
    + ") GROUP BY cell_s2",
)
def q57(spark, sf):
    """S2 cell encode + aggregate — PURE-CATALYST (whole-stage codegen, no
    Python worker): round 4 replaced the pandas-UDF encode with the native
    step chain, which doubles as the DuckDB oracle.

    Precision contract (closed round 6): COS/SIN are the only non-
    correctly-rounded ops in the chain (±1 ulp by libm build). The
    LATTICE_EPS snap in cells.s2_cell_sql_steps / s2_encode assigns any
    point whose scaled st value lands within 1e-9 cell-units of a 1/2^15
    lattice line to round(p) — identically in numpy, the JVM, and DuckDB —
    so libm disagreement can no longer flip a cell at any sf. The
    lattice-adjacent three-engine parity test in test_round6_fixes.py pins
    it."""
    pts = points_df(spark, sf)
    lonlat = pts.select(
        "pid",
        (F.col("x") / fixtures.M_PER_DEG + fixtures.LON0).alias("lon"),
        (F.col("y") / fixtures.M_PER_DEG + fixtures.LAT0).alias("lat"),
    )
    c = spatial.with_s2_cell_native(lonlat, "lat", "lon", level=15)
    return c.groupBy("cell_s2").agg(F.count(F.lit(1)).alias("n"))
