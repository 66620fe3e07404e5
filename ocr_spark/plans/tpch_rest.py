"""TPC-H completion: the five remaining query shapes (Q2, Q9, Q11, Q16, Q20).

With this module the engine covers all 22 TPC-H query shapes (the other
17 live in plans/queries.py and plans/relational_extra.py). The driver's
testdata has no ``partsupp`` table, so these queries run over a
DERIVED partsupp-equivalent built deterministically from lineitem:

    ps_partkey, ps_suppkey  = the distinct (l_partkey, l_suppkey) pairs
    ps_supplycost           = MIN(l_extendedprice / l_quantity)
    ps_availqty             = COUNT(*) * 10

Both the Spark plan and the DuckDB oracle derive it with the identical
expression (a CTE on the oracle side), so the comparison stays exact.
Adaptations to the testdata's narrower columns are noted per query
(e.g. Q16's "supplier complaints" anti-join keeps its NOT-IN shape but
keys on negative s_acctbal, because supplier has no comment column).

Scale notes (100 TB): the derived partsupp is one shuffle keyed on
(l_partkey, l_suppkey) with full map-side partial aggregation; in a real
deployment partsupp is a base table and that shuffle disappears. Every
dimension table (part, supplier, nation, region) broadcasts; only
lineitem/orders-keyed shuffles remain, which is the minimum for these
shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_spark.plans.relational_extra import t

# Shared oracle CTE — must stay textually in sync with derived_partsupp().
_PARTSUPP_CTE = """
WITH partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
         CAST(COUNT(*) * 10 AS BIGINT) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp-equivalent (see module docstring). One shuffle keyed
    (l_partkey, l_suppkey); partial aggregation makes the map side emit
    one row per pair per partition."""
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy(F.col("l_partkey").alias("ps_partkey"),
                       F.col("l_suppkey").alias("ps_suppkey"))
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("ps_supplycost"),
                 (F.count("*") * F.lit(10)).alias("ps_availqty")))


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier (correlated MIN subquery → per-part min join)
# --------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for STANDARD parts up to size 15, the EUROPE supplier
    with the region-wide minimum ps_supplycost for that part. The
    correlated scalar-MIN subquery decorrelates to a per-part min over
    the region-filtered partsupp, joined back on (part, cost) — the same
    plan Catalyst produces for the subquery form. supplier/nation/region
    broadcast; the only large shuffle is the derived-partsupp groupBy.
    Top-100 by a total ordering, so LIMIT is deterministic."""
    ps = derived_partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe_supp = (s.join(F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == F.col("n_nationkey")))
    eu_ps = ps.join(F.broadcast(europe_supp),
                    ps.ps_suppkey == F.col("s_suppkey"))
    min_cost = (eu_ps.groupBy("ps_partkey")
                .agg(F.min("ps_supplycost").alias("min_cost")))
    return (eu_ps.join(min_cost, "ps_partkey")
            .filter(F.col("ps_supplycost") == F.col("min_cost"))
            .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
            .select(F.round("s_acctbal", 2).alias("s_acctbal"),
                    "s_name", "n_name",
                    F.col("ps_partkey").alias("p_partkey"), "p_name",
                    F.round("ps_supplycost", 4).alias("supplycost"))
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(100))


_Q2_SQL = _PARTSUPP_CTE + """
SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
       ps_partkey AS p_partkey, p_name,
       ROUND(ps_supplycost, 4) AS supplycost
FROM partsupp
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN part ON ps_partkey = p_partkey
WHERE r_name = 'EUROPE' AND p_size <= 15 AND p_type = 'STANDARD'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE r2.r_name = 'EUROPE' AND ps2.ps_partkey = partsupp.ps_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# --------------------------------------------------------------------------

def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit = revenue minus supply cost, for parts
    whose name contains 'widget', grouped by supplier nation × order
    year. part filters before its broadcast join (column-pruned to the
    join key), partsupp joins on the composite (partkey, suppkey) pair,
    orders supplies only the year. At 100 TB the fact-side shuffles are
    lineitem⋈orders on orderkey and the derived-partsupp groupBy;
    everything else broadcasts."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ps = derived_partsupp(spark, sf_dir)
    p = (t(spark, sf_dir, "part")
         .filter(F.col("p_name").contains("widget"))
         .select("p_partkey"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("ps_supplycost") * F.col("l_quantity"))
    j = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
         .join(ps, (li.l_partkey == ps.ps_partkey)
               & (li.l_suppkey == ps.ps_suppkey))
         .join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
         .join(F.broadcast(n), s.s_nationkey == n.n_nationkey))
    return (j.groupBy(F.col("n_name").alias("nation"),
                      F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.round(F.sum(profit), 4).alias("sum_profit"),
                 F.count("*").alias("n_items")))


_Q9_SQL = _PARTSUPP_CTE + """
SELECT n_name AS nation,
       YEAR(o_orderdate) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - ps_supplycost * l_quantity), 4) AS sum_profit,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, YEAR(o_orderdate)
"""


# --------------------------------------------------------------------------
# Q11: important stock (HAVING vs a scalar-subquery fraction of total)
# --------------------------------------------------------------------------

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation's
    suppliers, keeping parts above 0.1% of the nation total. The scalar
    total is a 1-row broadcast crossJoin (the decorrelated HAVING
    subquery); the per-part groupBy shuffles on ps_partkey only."""
    ps = derived_partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (t(spark, sf_dir, "nation")
         .filter(F.col("n_name") == "NATION_3").select("n_nationkey"))
    nat_ps = (ps.join(F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))),
        ps.ps_suppkey == F.col("s_suppkey")))
    value = F.col("ps_supplycost") * F.col("ps_availqty")
    per_part = (nat_ps.groupBy("ps_partkey")
                .agg(F.sum(value).alias("raw_value")))
    total = nat_ps.agg((F.sum(value) * F.lit(0.001)).alias("threshold"))
    return (per_part.crossJoin(F.broadcast(total))
            .filter(F.col("raw_value") > F.col("threshold"))
            .select("ps_partkey",
                    F.round("raw_value", 4).alias("part_value")))


_Q11_SQL = _PARTSUPP_CTE + """
SELECT ps_partkey, ROUND(SUM(ps_supplycost * ps_availqty), 4) AS part_value
FROM partsupp
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
GROUP BY ps_partkey
HAVING SUM(ps_supplycost * ps_availqty) > (
  SELECT SUM(ps_supplycost * ps_availqty) * 0.001
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3')
"""


# --------------------------------------------------------------------------
# Q16: parts/supplier relationship (NOT IN anti-join + COUNT DISTINCT)
# --------------------------------------------------------------------------

def q16_parts_supplier_relationship(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    for a size list, excluding one brand/type and excluding suppliers
    from a NOT-IN subquery. The testdata supplier has no comment column,
    so the "complaints" exclusion keys on s_acctbal < 0 — the anti-join
    shape is identical. The excluded-supplier set is tiny → broadcast
    LEFT ANTI; COUNT DISTINCT shuffles once on the group keys."""
    ps = derived_partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    bad_supp = (t(spark, sf_dir, "supplier")
                .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
            .join(F.broadcast(bad_supp),
                  ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt")))


_Q16_SQL = _PARTSUPP_CTE + """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q20: potential part promotion (nested IN subqueries + correlated agg)
# --------------------------------------------------------------------------

def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_1 suppliers whose stock of any
    'small…'-named part exceeds half of what they shipped of it in 1998.
    The correlated SUM subquery decorrelates to a groupBy over the
    1998-filtered lineitem joined back on (partkey, suppkey) — an inner
    join, which matches the SQL NULL semantics (no 1998 shipments ⇒ the
    comparison is NULL ⇒ excluded). part filters broadcast; the
    shipped-quantity groupBy shuffles on the composite key."""
    ps = derived_partsupp(spark, sf_dir)
    p = (t(spark, sf_dir, "part")
         .filter(F.col("p_name").startswith("small")).select("p_partkey"))
    li = t(spark, sf_dir, "lineitem")
    shipped = (li.filter((F.col("l_shipdate") >= F.lit("1998-01-01"))
                         & (F.col("l_shipdate") < F.lit("1999-01-01")))
               .groupBy("l_partkey", "l_suppkey")
               .agg((F.sum("l_quantity") * F.lit(0.5)).alias("half_shipped")))
    promo_supp = (ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
                  .join(shipped, (ps.ps_partkey == F.col("l_partkey"))
                        & (ps.ps_suppkey == F.col("l_suppkey")))
                  .filter(F.col("ps_availqty") > F.col("half_shipped"))
                  .select("ps_suppkey").distinct())
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(promo_supp, s.s_suppkey == F.col("ps_suppkey"), "left_semi")
            .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
            .orderBy("s_name"))


_Q20_SQL = _PARTSUPP_CTE + """
SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part
                         WHERE p_name LIKE 'small%')
      AND ps_availqty > (
        SELECT 0.5 * SUM(l_quantity) FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'))
ORDER BY s_name
"""


SPARK_QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_stock": q11_important_stock,
    "q16_parts_supplier_relationship": q16_parts_supplier_relationship,
    "q20_potential_promotion": q20_potential_promotion,
}

ORACLE_SQL = {
    "q2_min_cost_supplier": _Q2_SQL,
    "q9_product_type_profit": _Q9_SQL,
    "q11_important_stock": _Q11_SQL,
    "q16_parts_supplier_relationship": _Q16_SQL,
    "q20_potential_promotion": _Q20_SQL,
}
