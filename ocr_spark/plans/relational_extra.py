"""Extended relational operator coverage with DuckDB oracles.

SURVEY.md §2 marks whole relational categories as absent from the
reference (it is a per-document dataflow, not a SQL engine). This module
demonstrates that the rebuild provides them anyway — because on Spark
they are free, and a user of a corpus-scale engine needs them:

  * ROLLUP grouping sets with grouping_id (R1)
  * INTERSECT / EXCEPT set operations (R2)
  * correlated scalar-subquery shape, decorrelated to an aggregate
    broadcast join (R3, TPC-H Q17 shape)
  * semi-join + anti-join combined (R4, TPC-H Q21 shape)
  * scalar subquery + anti-join (R5, TPC-H Q22 shape)
  * conditional aggregation (R6, TPC-H Q12 shape)
  * as-of join via last_value(IGNORE NULLS) over a union (R7) — the
    classic point-in-time join, no range-join blowup
  * exact interpolated percentiles (R8)
  * native session windows (R9), pivot (R10)
  * CUBE and explicit GROUPING SETS with grouping_id (R11, R12)
  * approximate aggregates (HLL distinct, sketch percentile) gated
    against exact values with documented error bounds (R13)

Scale notes are on each query: what shuffles, what broadcasts, what AQE
does at larger SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# R1: ROLLUP + grouping_id
# --------------------------------------------------------------------------

def li_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregatable rollup: one scan, map-side partial aggs, a
    single shuffle keyed on the grouping-set id + keys."""
    li = t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                 F.count("*").alias("n_rows"),
                 F.grouping_id().alias("gid")))


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       COUNT(*) AS n_rows,
       GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# R2: INTERSECT / EXCEPT
# --------------------------------------------------------------------------

def nations_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops over distinct key sets: both compile to aggregate +
    shuffle on the key; the sides here are tiny, AQE broadcasts."""
    cust_nations = (t(spark, sf_dir, "customer")
                    .select(F.col("c_nationkey").alias("nationkey")))
    supp_nations = (t(spark, sf_dir, "supplier")
                    .select(F.col("s_nationkey").alias("nationkey")))
    both = (cust_nations.intersect(supp_nations)
            .withColumn("membership", F.lit("both")))
    cust_only = (cust_nations.subtract(supp_nations)
                 .withColumn("membership", F.lit("customer_only")))
    return both.unionByName(cust_only)


_SET_OPS_SQL = """
SELECT nationkey, 'both' AS membership FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT DISTINCT nationkey, 'customer_only' AS membership FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
"""


# --------------------------------------------------------------------------
# R3: correlated scalar subquery → decorrelated aggregate join (Q17)
# --------------------------------------------------------------------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg-per-part computed once (shuffle on l_partkey), then joined
    back — the decorrelation Catalyst would do for the correlated
    subquery; the agg side is #parts rows, broadcastable at any SF where
    parts fit (sf*200k rows — AQE decides)."""
    li = t(spark, sf_dir, "lineitem")
    avg_qty = (li.groupBy("l_partkey")
               .agg((F.avg("l_quantity") * 0.5).alias("half_avg")))
    return (li.join(avg_qty, "l_partkey")
            .filter(F.col("l_quantity") < F.col("half_avg"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 4)
                 .alias("avg_yearly"),
                 F.count("*").alias("n_small")))


_Q17_SQL = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem l
WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity)
                    FROM lineitem WHERE l_partkey = l.l_partkey)
"""


# --------------------------------------------------------------------------
# R4: semi + anti join combined (Q21 shape)
# --------------------------------------------------------------------------

def q21_exists_notexists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders that have a big-quantity lineitem (EXISTS → left_semi) but
    no small-quantity one (NOT EXISTS → left_anti); both joins shuffle
    on o_orderkey and AQE handles any hot order key."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    small = li.filter(F.col("l_quantity") < 5).select("l_orderkey")
    return (orders
            .join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
            .join(small, orders.o_orderkey == small.l_orderkey, "left_anti")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders")))


_Q21_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o.o_orderkey AND l_quantity > 45)
  AND NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey AND l_quantity < 5)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# R5: scalar subquery + anti join (Q22 shape)
# --------------------------------------------------------------------------

def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average balance and no orders: the global
    avg is a 1-row broadcast; the anti join shuffles on custkey."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal"))
    rich = (cust.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("avg_bal")))
    # "idle" = never placed a large order (every customer has SOME order
    # in this dataset, so the anti-join side is the filtered orders)
    large = orders.filter(F.col("o_totalprice") > 300_000)
    idle = rich.join(large, rich.c_custkey == large.o_custkey,
                     "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_custs"),
        F.round(F.sum("c_acctbal"), 4).alias("total_bal"))


_Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_custs,
       ROUND(SUM(c_acctbal), 4) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                   WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_totalprice > 300000)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# R6: conditional aggregation (Q12 shape)
# --------------------------------------------------------------------------

def q12_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01")))
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1) \
            .otherwise(0)
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.sum(high).alias("high_line_count"),
                 F.sum(1 - high).alias("low_line_count")))


_Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# R7: as-of join (point-in-time)
# --------------------------------------------------------------------------

def ev_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the most recent prior purchase by the same user
    — the classic as-of join. Implemented as ONE window pass over the
    union (last_value IGNORE NULLS), not a range join: a range/theta
    join explodes at scale, the union-window is a single shuffle on
    user_id + a sort within partitions."""
    ev = t(spark, sf_dir, "events")
    tagged = ev.select(
        "user_id", "event_id", "ts", "event_type",
        F.when(F.col("event_type") == "purchase", F.col("ts"))
         .alias("purchase_ts"),
        F.when(F.col("event_type") == "purchase", F.col("event_id"))
         .alias("purchase_id"),
    )
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    withlast = tagged.withColumn(
        "last_purchase_id", F.last("purchase_id", ignorenulls=True).over(w)
    ).withColumn(
        "last_purchase_ts", F.last("purchase_ts", ignorenulls=True).over(w))
    return (withlast.filter(F.col("event_type") == "click")
            .select("user_id", "event_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
                     .alias("click_time"),
                    "last_purchase_id",
                    F.date_format("last_purchase_ts", "yyyy-MM-dd HH:mm:ss")
                     .alias("purchase_time")))


_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN event_type = 'purchase' THEN ts END AS purchase_ts,
         CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id
  FROM events
), withlast AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(purchase_id IGNORE NULLS) OVER w AS last_purchase_id,
         last_value(purchase_ts IGNORE NULLS) OVER w AS last_purchase_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_time,
       last_purchase_id,
       strftime(last_purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_time
FROM withlast WHERE event_type = 'click'
"""


# --------------------------------------------------------------------------
# R8: exact interpolated percentiles
# --------------------------------------------------------------------------

def li_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (not approx) — sorts within groups; at 100 TB
    switch to approx_percentile and accept the error bound, which the
    oracle can't check value-for-value (that variant is why this one
    stays exact)."""
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.expr("percentile(l_quantity, 0.5)"), 4)
                 .alias("p50"),
                 F.round(F.expr("percentile(l_quantity, 0.9)"), 4)
                 .alias("p90"),
                 F.round(F.expr("percentile(l_quantity, 0.99)"), 4)
                 .alias("p99")))


_PCT_SQL = """
SELECT l_returnflag,
       ROUND(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS p50,
       ROUND(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 4) AS p90,
       ROUND(CAST(quantile_cont(l_quantity, 0.99) AS DOUBLE), 4) AS p99
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# R9: native session windows
# --------------------------------------------------------------------------

def ev_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (gap-merged event-time sessions) —
    the batch form of the streaming session operator. Oracle replays the
    same semantics with the lag/cumsum islands idiom: a new session
    starts when the gap >= 30 min; window end = last event + gap."""
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                       "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                     .alias("session_start"),
                    F.date_format("w.end", "yyyy-MM-dd HH:mm:ss")
                     .alias("session_end"),
                    "n_events"))


_SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# R10: pivot
# --------------------------------------------------------------------------

_EV_TYPES = ("click", "view", "purchase", "signup", "error")


def ev_pivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: event counts per user with one column per event type.
    The explicit value list keeps the schema static (no extra pass to
    discover pivot values — required at scale, and required here for a
    deterministic column set)."""
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .pivot("event_type", list(_EV_TYPES))
            .agg(F.count(F.lit(1)))
            .na.fill(0, list(_EV_TYPES))
            .select("user_id",
                    *[F.col(c).alias(f"n_{c}") for c in _EV_TYPES]))


_PIVOT_SQL = f"""
SELECT user_id,
       {", ".join(
           "CAST(SUM(CASE WHEN event_type = '" + c + "' THEN 1 ELSE 0 END)"
           f" AS BIGINT) AS n_{c}" for c in _EV_TYPES)}
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# R14: sequential-pattern funnel (view → click → purchase, in order)
# --------------------------------------------------------------------------

def ev_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel per user: earliest view, earliest click AFTER that
    view, earliest purchase AFTER that click — the MATCH_RECOGNIZE-shaped
    analytics every event pipeline runs. Three small aggregates chained
    by equi-joins on user_id (each join input is one-row-per-user, so
    every shuffle is user-cardinality, never event-cardinality); stage =
    how deep the user got."""
    ev = t(spark, sf_dir, "events")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("view_ts")))
    c = (ev.join(v, "user_id")
         .filter((F.col("event_type") == "click")
                 & (F.col("ts") > F.col("view_ts")))
         .groupBy("user_id").agg(F.min("ts").alias("click_ts")))
    p = (ev.join(c, "user_id")
         .filter((F.col("event_type") == "purchase")
                 & (F.col("ts") > F.col("click_ts")))
         .groupBy("user_id").agg(F.min("ts").alias("purchase_ts")))
    funnel = (v.join(c, "user_id", "left").join(p, "user_id", "left"))
    stage = (F.lit(1)
             + F.when(F.col("click_ts").isNotNull(), 1).otherwise(0)
             + F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0))
    fmt_ts = "yyyy-MM-dd HH:mm:ss"
    return funnel.select(
        "user_id", stage.alias("funnel_stage"),
        F.date_format("view_ts", fmt_ts).alias("view_time"),
        F.date_format("click_ts", fmt_ts).alias("click_time"),
        F.date_format("purchase_ts", fmt_ts).alias("purchase_time"))


_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
)
SELECT v.user_id,
       1 + (CASE WHEN c.click_ts IS NOT NULL THEN 1 ELSE 0 END)
         + (CASE WHEN p.purchase_ts IS NOT NULL THEN 1 ELSE 0 END)
         AS funnel_stage,
       strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS view_time,
       strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS click_time,
       strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_time
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
"""


FL_PCTS = (0.5, 0.9)


def ev_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel time-to-convert — the latency companion of
    ev_funnel_conversion's depth counts (HOW LONG each stage
    transition takes decides where the product intervenes): for every
    converted stage pair (view→click, click→purchase, view→purchase),
    the converter count and exact p50/p90 latencies in seconds
    (type-7 interpolated percentiles, the docs_length_percentiles
    cross-engine convention; integer-second inputs). Same
    user-cardinality chained-aggregate shape as the funnel itself,
    then one tiny per-pair percentile aggregate; at extreme user
    counts the exact percentile swaps for approx_percentile — the
    standing exact-vs-approx note."""
    ev = t(spark, sf_dir, "events")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("view_ts")))
    c = (ev.join(v, "user_id")
         .filter((F.col("event_type") == "click")
                 & (F.col("ts") > F.col("view_ts")))
         .groupBy("user_id").agg(F.min("ts").alias("click_ts")))
    p = (ev.join(c, "user_id")
         .filter((F.col("event_type") == "purchase")
                 & (F.col("ts") > F.col("click_ts")))
         .groupBy("user_id").agg(F.min("ts").alias("purchase_ts")))
    j = v.join(c, "user_id").join(p, "user_id", "left")

    def sec(a, b):
        # exact integer microseconds, NTZ-safe (the ev_bot_detection
        # convention — unix_timestamp truncates and the oracle's
        # epoch() rounds; micros agree bit-for-bit)
        return F.expr(f"timestampdiff(MICROSECOND, {a}, {b})")

    pairs = j.select(
        F.explode(F.filter(F.array(
            F.struct(F.lit("view->click").alias("stage_pair"),
                     sec("view_ts", "click_ts").alias("latency_s")),
            F.when(F.col("purchase_ts").isNotNull(), F.struct(
                F.lit("click->purchase").alias("stage_pair"),
                sec("click_ts", "purchase_ts").alias("latency_s"))),
            F.when(F.col("purchase_ts").isNotNull(), F.struct(
                F.lit("view->purchase").alias("stage_pair"),
                sec("view_ts", "purchase_ts").alias("latency_s"))),
        ), lambda x: x.isNotNull())).alias("e")).select("e.*")
    pct = F.percentile("latency_s", F.lit(list(FL_PCTS)))
    return (pairs.groupBy("stage_pair")
            .agg(F.count("*").alias("n_converted"),
                 *[F.round(F.element_at(pct, i + 1) / 1e6, 4)
                   .alias(f"p{int(q * 100)}_latency_s")
                   for i, q in enumerate(FL_PCTS)]))


_FUNNEL_LATENCY_SQL = f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
), j AS (
  SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts
  FROM v JOIN c ON v.user_id = c.user_id
  LEFT JOIN p ON v.user_id = p.user_id
), pairs AS (
  SELECT 'view->click' AS stage_pair,
         epoch_us(click_ts) - epoch_us(view_ts) AS latency_s
  FROM j
  UNION ALL
  SELECT 'click->purchase',
         epoch_us(purchase_ts) - epoch_us(click_ts)
  FROM j WHERE purchase_ts IS NOT NULL
  UNION ALL
  SELECT 'view->purchase',
         epoch_us(purchase_ts) - epoch_us(view_ts)
  FROM j WHERE purchase_ts IS NOT NULL
)
SELECT stage_pair, CAST(COUNT(*) AS BIGINT) AS n_converted,
       {", ".join(
           f"round(quantile_cont(latency_s, {q}) / 1e6, 4)"
           f" AS p{int(q * 100)}_latency_s" for q in FL_PCTS)}
FROM pairs GROUP BY stage_pair
"""


# --------------------------------------------------------------------------
# R15: weekly cohort retention matrix
# --------------------------------------------------------------------------

def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — the standard activation matrix: users
    cohorted by the week of their first event; each (cohort_week,
    week_offset) cell counts distinct users from that cohort active in
    that later week, with the retention rate against cohort size.

    Scale shape: two partial-agg groupBys keyed on user_id (first-event
    and distinct-active-weeks — shuffle volume is user cardinality,
    never event cardinality after map-side combine), one user-keyed
    equi-join, then the final aggregate collapses to a weeks x offsets
    matrix (tiny at any scale). Week arithmetic stays in the naive-
    timestamp domain (Monday truncation in both engines), and the
    cohort week is emitted as a date STRING so the oracle hash is
    timezone-free — the same convention as ev_funnel_conversion."""
    ev = t(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
              .select("user_id",
                      F.date_trunc("week", F.col("first_ts")).alias("cw")))
    active = (ev.select("user_id",
                        F.date_trunc("week", F.col("ts")).alias("wk"))
              .distinct())
    sizes = firsts.groupBy("cw").agg(F.count("*").alias("cohort_size"))
    j = (active.join(firsts, "user_id")
         .select("cw",
                 (F.datediff("wk", "cw") / 7).cast("int")
                 .alias("week_offset"),
                 "user_id"))
    grp = (j.groupBy("cw", "week_offset")
           .agg(F.countDistinct("user_id").alias("n_active")))
    return (grp.join(sizes, "cw")
            .select(
                F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
                "week_offset", "n_active", "cohort_size",
                F.round(F.col("n_active") / F.col("cohort_size"), 4)
                 .alias("retention")))


_RETENTION_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cw
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
), sizes AS (
  SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM firsts GROUP BY cw
), j AS (
  SELECT f.cw,
         CAST(date_diff('day', f.cw, a.wk) // 7 AS INT) AS week_offset,
         a.user_id
  FROM active a JOIN firsts f USING (user_id)
), g AS (
  SELECT cw, week_offset,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
  FROM j GROUP BY cw, week_offset
)
SELECT strftime(g.cw, '%Y-%m-%d') AS cohort_week,
       g.week_offset, g.n_active, s.cohort_size,
       round(g.n_active / CAST(s.cohort_size AS DOUBLE), 4) AS retention
FROM g JOIN sizes s USING (cw)
"""


# --------------------------------------------------------------------------
# R11: CUBE + grouping_id (SURVEY §2.4 marks grouping sets absent in the
# reference; a 100 TB engine runs them constantly)
# --------------------------------------------------------------------------

def li_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (returnflag, linestatus): all 4 grouping sets in
    one pass — map-side partial aggs, a single shuffle keyed on the
    grouping-set id + keys (same scale shape as li_rollup)."""
    li = t(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                 F.count(F.lit(1)).alias("n_rows"),
                 F.grouping_id().alias("gid")))


_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       COUNT(*) AS n_rows,
       GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# R12: explicit GROUPING SETS
# --------------------------------------------------------------------------

def li_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-picked grouping sets (the general form ROLLUP/CUBE sugar
    over): per-flag, per-status, and grand total — skipping the
    (flag, status) set a CUBE would also compute. SQL surface via
    Catalyst; same one-shuffle physical shape."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               COUNT(*) AS n_rows,
               grouping_id() AS gid
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       COUNT(*) AS n_rows,
       GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


# --------------------------------------------------------------------------
# R13: approximate aggregates with a tolerance gate
# --------------------------------------------------------------------------

_ACD_RSD = 0.05   # HLL++ target relative standard deviation


def li_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggregates a 100 TB engine actually runs — HLL distinct
    counts and sketch percentiles — gated against their exact
    counterparts so the oracle pins the error bound, not the raw
    estimate (which is engine-specific):

      * ``acd_within_3sigma``: |approx_count_distinct − exact| ≤
        3·rsd·exact (HLL++ rsd=0.05 → 15% at 3σ; Spark's estimate
        landing outside fails the value-hash against the oracle's TRUE);
      * ``ap50_within_band``: percentile_approx(0.5, accuracy=10000)
        (rank error ≤ 1e-4) must land between the exact p40 and p60 —
        a deliberately wide value band since rank error only bounds
        rank, not value.
    """
    li = t(spark, sf_dir, "lineitem")
    agg = (li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_exact_distinct"),
        F.approx_count_distinct("l_orderkey", rsd=_ACD_RSD).alias("_acd"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_exact"),
        F.expr("percentile(l_quantity, 0.40)").alias("_p40"),
        F.expr("percentile(l_quantity, 0.60)").alias("_p60"),
        F.expr("percentile_approx(l_quantity, 0.5, 10000)").alias("_ap50")))
    return agg.select(
        "l_returnflag", "n_exact_distinct",
        (F.abs(F.col("_acd") - F.col("n_exact_distinct"))
         <= F.lit(3 * _ACD_RSD) * F.col("n_exact_distinct"))
        .alias("acd_within_3sigma"),
        "p50_exact",
        ((F.col("_ap50") >= F.col("_p40")) & (F.col("_ap50") <= F.col("_p60")))
        .alias("ap50_within_band"))


_APPROX_AGGS_SQL = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact_distinct,
       TRUE AS acd_within_3sigma,
       ROUND(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS p50_exact,
       TRUE AS ap50_within_band
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# R14-R20: round-4 TPC-H batch (the remaining shapes expressible without
# a partsupp table: q2/q9/q11/q16/q20 need it and the driver corpus has
# none — documented omission, not an oversight)
# --------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): two nation dims joined to the
    fact chain with a DISJUNCTIVE cross-nation predicate. Both nation
    joins broadcast; the lineitem→orders join is the only large
    exchange, and AQE turns it into a shuffled hash join whose build
    side is the date-filtered orders scan."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"))
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    j = (li.filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                   & (F.col("l_shipdate") < F.lit("1998-01-01")))
         .join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
         .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
         .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
         .filter(pair))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                 .alias("revenue"),
                 F.count("*").alias("n_items")))


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): a 7-table snowflake with
    a conditional-fraction aggregate. Every dim broadcasts at any SF;
    the share is a per-year conditional sum over the joined fact."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"))
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"))
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (li.join(F.broadcast(p.filter(F.col("p_type") == "PROMO")),
                 li.l_partkey == p.p_partkey)
         .join(o, li.l_orderkey == o.o_orderkey)
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01"))
                 & (F.col("o_orderdate") < F.lit("1998-01-01")))
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
         .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
         .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
         .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey")))
    is_target = (F.col("supp_nation") == "NATION_3").cast("double")
    return (j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.round(F.sum(vol * is_target) / F.sum(vol), 6)
                 .alias("mkt_share"),
                 F.round(F.sum(vol), 4).alias("total_volume")))


Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY year(o_orderdate)
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue in a quarter. Deterministic top-N (revenue desc,
    custkey asc tie-break) so the oracle's LIMIT picks the same set;
    the only large exchange is lineitem→orders, then a
    customer-cardinality groupBy."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    j = (li.filter(F.col("l_returnflag") == "R")
         .join(o, li.l_orderkey == o.o_orderkey)
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01"))
                 & (F.col("o_orderdate") < F.lit("1996-04-01")))
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    agg = (j.groupBy("c_custkey", "c_name", "n_name")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 4)
                .alias("revenue"),
                F.count("*").alias("n_items")))
    return (agg.orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join
    so zero-order customers survive with c_count 0, then a second
    aggregate over the counts — the classic histogram-of-groupBy. The
    non-urgent filter sits in the JOIN CONDITION (not WHERE), which is
    the part implementations get wrong: a WHERE would silently turn
    the left join inner."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per = (c.join(o, c.c_custkey == o.o_custkey, "left")
           .groupBy("c_custkey")
           .agg(F.count("o_orderkey").alias("c_count")))
    return (per.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarter revenue per supplier,
    then the suppliers achieving the global max — the scalar-subquery-
    on-an-aggregate pattern, decorrelated to a 1-row broadcast (max
    revenue) instead of a correlated rescan."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    rev = (li.filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                     & (F.col("l_shipdate") < F.lit("1996-04-01")))
           .groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 4)
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))  # 1 row → broadcast
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("mx"))
            .join(F.broadcast(s),
                  F.col("supplier_no") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_revenue"))


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


Q18_MIN_QTY = 300   # calibrated: max per-order quantity is ~458 at
                    # sf0.01, so the gate keeps a real tail


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose summed
    quantity clears a threshold — an IN-subquery-on-a-HAVING, written
    as the aggregate + semi-join Spark plans it into. The order-level
    aggregate is the only corpus-scale shuffle; its survivors are a
    tiny broadcast back onto orders."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
           .filter(F.col("sum_qty") > Q18_MIN_QTY))
    return (o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey",
                    F.col("o_orderdate").cast("string")
                     .alias("o_orderdate_s"),
                    "o_totalprice", "sum_qty"))


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
       o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING ROUND(SUM(l_quantity), 4) > {Q18_MIN_QTY}
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): the disjunctive multi-
    bracket predicate over a part⋈lineitem join — the query optimizers
    historically mangled (OR across join inputs). Spark pushes the
    common p/l conjuncts and broadcasts part; the OR stays a post-join
    filter."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b = (((F.col("p_brand") == "Brand#1")
          & F.col("p_size").between(1, 5)
          & F.col("l_quantity").between(1, 11))
         | ((F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20))
         | ((F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)))
    return (j.filter(b)
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                 .alias("revenue"),
                 F.count("*").alias("n_items")))


Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


BOT_USER_MOD = 29     # user_id % 29 == 3 → the scripted-client class
BOT_MIN_EVENTS = 20   # volume floor before regularity is meaningful
BOT_CV_MAX = 0.3      # coefficient-of-variation ceiling: humans on this
                      # log measure cv ~ 1 (memoryless arrivals); a
                      # scripted 60s cadence with ±7s jitter lands ~0.04


def ev_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/scripted-client detection from request-timing regularity —
    the abuse-filtering stage of a crawl/serving log pipeline: humans
    arrive roughly memoryless (inter-event coefficient of variation
    near 1), scripted clients poll on a timer (cv near 0). Flag =
    volume floor AND cv ceiling, both knobs.

    The request log derives closed-form from events (the pages_soft404
    protocol): users ≡ 3 (mod 29) replay their events on a 60-second
    cadence with a deterministic ±jitter (event_id % 7 seconds), so
    true positives with nonzero-but-tiny cv and true negatives both
    exist and the oracle regenerates the log exactly.

    Scale shape: ONE user-keyed window pass (row_number + lag share the
    same sort) then a partial-aggregated per-user rollup — the same
    single-shuffle shape as ev_sessionize; the cv arithmetic is exact
    integer sums (micros) folded to doubles only at the final division.
    """
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    base = ev.select("user_id", "event_id", "ts", rn.alias("rn"))
    is_bot_class = F.col("user_id") % BOT_USER_MOD == 3
    # micros relative to the log epoch — NTZ-safe (timestamp_diff never
    # interprets the naive timestamps in a zone) and gaps only ever see
    # differences, so the base cancels
    ts_us = F.when(
        is_bot_class,
        (F.col("rn").cast("long") * 60
         + F.col("event_id") % 7) * 1000000
    ).otherwise(F.timestamp_diff(
        "MICROSECOND",
        F.lit("2024-01-01").cast("timestamp_ntz"), F.col("ts")))
    w_rn = Window.partitionBy("user_id").orderBy("rn")
    # gaps at SECOND resolution: keeps every sum an exact integer (no
    # double-summation order sensitivity, no long overflow on squares)
    gaps = (base.select("user_id", "rn", ts_us.alias("us"))
            .withColumn("gap",
                        ((F.col("us") - F.lag("us").over(w_rn))
                         / F.lit(1000000)).cast("long")))
    agg = (gaps.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.count("gap").alias("n_gaps"),
                F.sum("gap").alias("gsum"),
                F.sum(F.col("gap") * F.col("gap")).alias("gsum2")))
    n = F.col("n_gaps").cast("double")
    mean = F.col("gsum") / n
    var = (n * F.col("gsum2") - F.col("gsum") * F.col("gsum")) \
        / (n * (n - 1))
    cv = F.round(F.sqrt(F.greatest(var, F.lit(0.0))) / mean, 6)
    out = agg.select(
        "user_id", "n_events",
        F.round(mean, 4).alias("mean_gap_s"),
        cv.alias("cv"))
    return out.select(
        "user_id", "n_events", "mean_gap_s", "cv",
        ((F.col("n_events") >= BOT_MIN_EVENTS)
         & (F.col("cv") < BOT_CV_MAX)).alias("is_bot"))


EV_BOT_DETECTION_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), tsx AS (
  SELECT user_id, rn,
         CASE WHEN user_id % {BOT_USER_MOD} = 3
              THEN (rn * 60 + event_id % 7) * 1000000
              ELSE date_diff('microsecond', TIMESTAMP '2024-01-01', ts)
              END AS us
  FROM base
), gaps AS (
  SELECT user_id,
         (us - lag(us) OVER (PARTITION BY user_id ORDER BY rn))
           // 1000000 AS gap
  FROM tsx
), agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         COUNT(gap) AS n_gaps,
         SUM(gap) AS gsum, SUM(gap * gap) AS gsum2
  FROM gaps GROUP BY user_id
), stats AS (
  SELECT user_id, n_events,
         round(gsum / CAST(n_gaps AS DOUBLE), 4) AS mean_gap_s,
         round(sqrt(greatest(
                 (CAST(n_gaps AS DOUBLE) * gsum2 - gsum * gsum)
                 / (CAST(n_gaps AS DOUBLE) * (CAST(n_gaps AS DOUBLE) - 1)),
                 0.0))
               / (gsum / CAST(n_gaps AS DOUBLE)), 6) AS cv
  FROM agg
)
SELECT user_id, n_events, mean_gap_s, cv,
       n_events >= {BOT_MIN_EVENTS} AND cv < {BOT_CV_MAX} AS is_bot
FROM stats
"""


SPARK_QUERIES = {
    "ev_bot_detection": ev_bot_detection,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_discounted_revenue": q19_discounted_revenue,
    "li_rollup": li_rollup,
    "li_cube": li_cube,
    "li_grouping_sets": li_grouping_sets,
    "li_approx_aggs": li_approx_aggs,
    "ev_funnel_conversion": ev_funnel_conversion,
    "ev_funnel_latency": ev_funnel_latency,
    "nations_set_ops": nations_set_ops,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q21_exists_notexists": q21_exists_notexists,
    "q22_idle_rich_customers": q22_idle_rich_customers,
    "q12_priority_class_counts": q12_priority_class_counts,
    "ev_asof_last_purchase": ev_asof_last_purchase,
    "li_quantity_percentiles": li_quantity_percentiles,
    "ev_session_window_native": ev_session_window_native,
    "ev_pivot_type_counts": ev_pivot_type_counts,
    "ev_retention_cohorts": ev_retention_cohorts,
}

ORACLE_SQL = {
    "ev_bot_detection": EV_BOT_DETECTION_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q10_returned_items": Q10_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q18_large_volume_customers": Q18_SQL,
    "q19_discounted_revenue": Q19_SQL,
    "li_rollup": _ROLLUP_SQL,
    "li_cube": _CUBE_SQL,
    "li_grouping_sets": _GROUPING_SETS_SQL,
    "li_approx_aggs": _APPROX_AGGS_SQL,
    "ev_funnel_conversion": _FUNNEL_SQL,
    "ev_funnel_latency": _FUNNEL_LATENCY_SQL,
    "nations_set_ops": _SET_OPS_SQL,
    "q17_small_quantity_revenue": _Q17_SQL,
    "q21_exists_notexists": _Q21_SQL,
    "q22_idle_rich_customers": _Q22_SQL,
    "q12_priority_class_counts": _Q12_SQL,
    "ev_asof_last_purchase": _ASOF_SQL,
    "li_quantity_percentiles": _PCT_SQL,
    "ev_session_window_native": _SESSION_WINDOW_SQL,
    "ev_pivot_type_counts": _PIVOT_SQL,
    "ev_retention_cohorts": _RETENTION_SQL,
}
