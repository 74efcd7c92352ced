"""TPC-H completion set (round 8) — the ten shapes the suite still lacked.

With these, all 22 TPC-H query STRUCTURES are represented (q1/3-q8/q10/
q14/q17/q18/q21 landed r2-r6). The synthetic star schema has no partsupp
table and no phone/container/comment/commit-date columns, so — exactly
like the existing q4 "late proxy" — each query keeps its structural shape
(the thing Catalyst must plan well at 100 TB) with predicates adapted to
the columns that exist; every adaptation is noted on the entry.

Correlated-subquery members (q2, q11, q15, q20, q22) follow the r6
convention of registry_analytics: ONE SQL text registered for BOTH
engines, so Catalyst's decorrelator itself is the unit under test.
Exactness: every float aggregate accumulates in DECIMAL(24,6) and is
cast to double before any comparison or output, so scalar-subquery
comparisons (q11's HAVING threshold, q15's MAX-revenue equality, q20's
half-of-part-total, q22's average-balance) are bit-identical
cross-engine; orderings are total via unique-key tiebreakers.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import SUM6, register
from .tpch_common import DEC, _tpch_views
from .sources.parquet import read_table


# ---------------------------------------------------------------------------
# q2 — minimum-cost supplier. partsupp/ps_supplycost is absent, so the
# "supply relationship" is the distinct (l_partkey, l_suppkey) pairs and
# "best" is the MAX s_acctbal among EUROPE suppliers of the part (the
# correlated scalar-subquery-per-part shape is untouched). Catalyst
# decorrelates to one per-part aggregate joined back on p_partkey — the
# only plan that survives 100 TB (a per-row re-execution would rescan
# lineitem once per part).
# ---------------------------------------------------------------------------

_Q2_SQL = """
SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
FROM part p, supplier s, lineitem l, nation n, region r
WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
  AND p.p_type = 'PROMO' AND p.p_size <= 10
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE'
  AND s.s_acctbal = (
    SELECT MAX(s2.s_acctbal)
    FROM supplier s2, lineitem l2, nation n2, region r2
    WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


def _tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    _tpch_views(spark, sf, "part", "supplier", "lineitem", "nation", "region")
    return spark.sql(_Q2_SQL)


register("tpch_q2_min_cost_supplier", _tpch_q2, _Q2_SQL)


# ---------------------------------------------------------------------------
# q9 — product-type profit. ps_supplycost is absent; cost proxy =
# 0.1 * p_retailprice * l_quantity. The shape — a part-name LIKE filter
# fanned through the full l⋈o⋈s⋈p⋈n tree, grouped by (nation, year) — is
# what matters: the LIKE prunes part FIRST (pushed to the part scan), so
# the join tree starts from the small filtered dim, and the two fact
# shuffles stay on l_orderkey/l_partkey.
# ---------------------------------------------------------------------------

def _tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    l = read_table(spark, f"{sf}/lineitem.parquet")
    p = read_table(spark, f"{sf}/part.parquet")
    s = read_table(spark, f"{sf}/supplier.parquet")
    o = read_table(spark, f"{sf}/orders.parquet")
    n = read_table(spark, f"{sf}/nation.parquet")
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(DEC)
    return (
        l.join(p.where(F.col("p_name").like("%red%")),
               F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


register(
    "tpch_q9_product_profit",
    _tpch_q9,
    f"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        {SUM6.format(x='l_extendedprice * (1.0 - l_discount) - 0.1 * p_retailprice * l_quantity')}
            AS sum_profit
        FROM lineitem, part, supplier, orders, nation
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
        ORDER BY n_name, year(o_orderdate) DESC""",
)


# ---------------------------------------------------------------------------
# q11 — important stock. No partsupp: per-part "value" = discounted
# revenue shipped by the two target nations' suppliers; the HAVING
# threshold stays a scalar subquery over the SAME grouped relation (the
# fraction-of-grand-total shape). Both sides of the comparison are
# decimal-accumulated then cast to double, so the cut is bit-identical
# cross-engine.
# ---------------------------------------------------------------------------

_Q11_VALUE = "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)"

_Q11_SQL = f"""
SELECT l_partkey AS ps_partkey, {_Q11_VALUE} AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name IN ('NATION_7', 'NATION_8')
GROUP BY l_partkey
HAVING {_Q11_VALUE} > (
  SELECT {_Q11_VALUE} * 0.0015
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name IN ('NATION_7', 'NATION_8'))
ORDER BY value DESC, ps_partkey
"""


def _tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    _tpch_views(spark, sf, "lineitem", "supplier", "nation")
    return spark.sql(_Q11_SQL)


register("tpch_q11_important_stock", _tpch_q11, _Q11_SQL)


# ---------------------------------------------------------------------------
# q12 — shipping modes vs order priority. l_shipmode/commit/receipt dates
# are absent: the mode stand-in is l_returnflag and "late" is the plain
# ship-year window; the shape — one fact⋈fact equi-join feeding a
# conditional two-way CASE count — is unchanged.
# ---------------------------------------------------------------------------

def _tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    o = read_table(spark, f"{sf}/orders.parquet")
    l = read_table(spark, f"{sf}/lineitem.parquet")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit(dt.datetime(1997, 1, 1)))
            & (F.col("l_shipdate") < F.lit(dt.datetime(1998, 1, 1)))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


register(
    "tpch_q12_priority_shipclass",
    _tpch_q12,
    """SELECT l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       FROM orders, lineitem
       WHERE o_orderkey = l_orderkey
         AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY ship_class ORDER BY ship_class""",
)


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution. The o_comment NOT-LIKE filter
# becomes an o_orderpriority filter (the synthetic data has no comments);
# the LEFT OUTER join that PRESERVES zero-order customers and the
# two-level aggregate (per-customer count, then histogram of counts) are
# the shape under test — an inner join would silently drop the c_count=0
# bucket (203 customers at sf0.01).
# ---------------------------------------------------------------------------

def _tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    c = read_table(spark, f"{sf}/customer.parquet")
    o = read_table(spark, f"{sf}/orders.parquet")
    per_cust = (
        c.join(
            o.where(F.col("o_orderpriority") == "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


register(
    "tpch_q13_customer_distribution",
    _tpch_q13,
    """SELECT c_count, COUNT(*) AS custdist FROM (
         SELECT c_custkey, COUNT(o_orderkey) AS c_count
         FROM customer LEFT OUTER JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
         GROUP BY c_custkey) t
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
)


# ---------------------------------------------------------------------------
# q15 — top supplier. The revenue view is a CTE consumed TWICE (once as a
# relation, once under MAX in a scalar subquery); equality against the
# decimal-exact double makes "revenue = max revenue" safe cross-engine.
# Spark plans the reuse without re-scanning lineitem when the exchange is
# reused; either way each pass is one pushed-filter scan + one partial/
# final aggregate on l_suppkey.
# ---------------------------------------------------------------------------

_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def _tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    _tpch_views(spark, sf, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


register("tpch_q15_top_supplier", _tpch_q15, _Q15_SQL)


# ---------------------------------------------------------------------------
# q16 — parts/supplier relationship. partsupp → distinct suppliers per
# part from lineitem; the "customer complaints" NOT-IN exclusion becomes
# the negative-balance suppliers. The exclusion is a LEFT ANTI join
# (s_suppkey is non-null, so NOT IN ≡ anti-join); the count is an exact
# COUNT(DISTINCT) per bounded (brand, type, size) group.
# ---------------------------------------------------------------------------

def _tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    l = read_table(spark, f"{sf}/lineitem.parquet")
    p = read_table(spark, f"{sf}/part.parquet")
    s = read_table(spark, f"{sf}/supplier.parquet")
    sizes = [1, 4, 9, 14, 19, 23, 36, 45]
    excluded = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(
            p.where(
                (F.col("p_brand") != "Brand#45")
                & (~F.col("p_type").like("PROMO%"))
                & (F.col("p_size").isin(sizes))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(excluded, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


register(
    "tpch_q16_supplier_relationship",
    _tpch_q16,
    """SELECT p_brand, p_type, p_size,
              COUNT(DISTINCT l_suppkey) AS supplier_cnt
       FROM lineitem, part
       WHERE p_partkey = l_partkey
         AND p_brand <> 'Brand#45' AND p_type NOT LIKE 'PROMO%'
         AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
         AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
)


# ---------------------------------------------------------------------------
# q19 — discounted revenue under an OR-of-ANDs join predicate (no
# p_container: brand + size bands stand in). The point is predicate
# DECOMPOSITION: Catalyst pushes the brand/size union to the part scan
# and the quantity union to the lineitem scan (each row group can be
# skipped on either side) while the full disjunction is re-checked after
# the equi-join — without that split the scans read everything.
# ---------------------------------------------------------------------------

def _tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    l = read_table(spark, f"{sf}/lineitem.parquet")
    p = read_table(spark, f"{sf}/part.parquet")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & (size >= 1) & (size <= smax)
        & (qty >= qlo) & (qty <= qhi)
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .where(arm("Brand#12", 15, 1, 21)
               | arm("Brand#23", 20, 10, 30)
               | arm("Brand#34", 25, 20, 40))
        .agg(
            F.sum((F.col("l_extendedprice")
                   * (F.lit(1.0) - F.col("l_discount"))).cast(DEC))
            .cast("double").alias("revenue"))
    )


register(
    "tpch_q19_discounted_revenue",
    _tpch_q19,
    f"""SELECT {SUM6.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND (
          (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 21)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
             AND l_quantity BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 20 AND 40))""",
)


# ---------------------------------------------------------------------------
# q20 — potential part promotion. ps_availqty is absent: a supplier
# qualifies when his 1996 shipped quantity of some red part exceeds HALF
# of that part's total 1996 shipped quantity (the nested IN + correlated
# scalar-aggregate-per-(part) shape is intact). Catalyst lowers the IN to
# a LeftSemi and decorrelates the inner sum to a per-part aggregate
# joined on l_partkey.
# ---------------------------------------------------------------------------

_Q20_SQL = """
SELECT s_name, n_name
FROM supplier, nation
WHERE s_nationkey = n_nationkey
  AND s_suppkey IN (
    SELECT l1.l_suppkey
    FROM lineitem l1, part
    WHERE p_partkey = l1.l_partkey AND p_name LIKE 'red%'
      AND l1.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l1.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l1.l_suppkey, l1.l_partkey
    HAVING CAST(SUM(CAST(l1.l_quantity AS DECIMAL(24,6))) AS DOUBLE) > (
      SELECT 0.5 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(24,6))) AS DOUBLE)
      FROM lineitem l2
      WHERE l2.l_partkey = l1.l_partkey
        AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l2.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))
ORDER BY s_name
"""


def _tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    _tpch_views(spark, sf, "supplier", "nation", "lineitem", "part")
    return spark.sql(_Q20_SQL)


register("tpch_q20_part_promotion", _tpch_q20, _Q20_SQL)


# ---------------------------------------------------------------------------
# q22 — global sales opportunity. No c_phone: the country-code list is a
# nationkey list and "never placed an order" (every synthetic customer
# has orders) becomes "never placed an URGENT order". The shape is
# intact: an uncorrelated scalar average (decimal-exact, NOT a bare
# AVG — double AVG is summation-order-dependent) gating the customers,
# then a NOT EXISTS anti-join, then the residual aggregation.
# ---------------------------------------------------------------------------

_Q22_SQL = """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS totacctbal
FROM (
  SELECT c_nationkey AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE c_nationkey IN (3, 8, 11, 14, 17, 20, 23)
    AND c_acctbal > (
      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(24,6))) AS DOUBLE)
             / COUNT(*)
      FROM customer c2
      WHERE c2.c_acctbal > 0.0
        AND c2.c_nationkey IN (3, 8, 11, 14, 17, 20, 23))
    AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')) t
GROUP BY cntrycode
ORDER BY cntrycode
"""


def _tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    _tpch_views(spark, sf, "customer", "orders")
    return spark.sql(_Q22_SQL)


register("tpch_q22_sales_opportunity", _tpch_q22, _Q22_SQL)
