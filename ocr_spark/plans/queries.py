"""Driver-contract analytics queries with DuckDB oracles.

Each entry here is a (spark_fn, oracle_sql) pair: the Spark side is
DataFrame/SQL API (Catalyst-optimized, JVM-side expressions only — no
Python UDFs in any hot path except the extraction engine itself), the
oracle is ANSI SQL DuckDB runs over the same parquet views.

Conventions that make the driver's order-insensitive value-hash compare
work (see /root/repo/__spark_entry__.py docstring):
  * every computed column is aliased IDENTICALLY on both sides;
  * floating-point aggregates are rounded to 4 decimals on both sides
    (double summation order differs between engines in the last bits);
  * integer sums are cast to BIGINT in DuckDB (it widens to HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# A. TPC-H-flavored relational queries (adapted to the testdata schema)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy partial-aggregatable groupBy.
    Plan check: single scan, partial agg before the 1-key shuffle."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + top-k. orders/customer are FACT-sized
    at scale (sf*1.5M / sf*150k rows) — no explicit broadcast hint; the
    lineitem⋈orders join is a shuffle join on the join key and AQE
    converts to broadcast automatically when a filtered side fits under
    autoBroadcastJoinThreshold (true at test SF, false at 100 TB)."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "revenue")
    )


Q3_SQL = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q4_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then a tiny aggregation."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01")))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join. Broadcast only the genuinely tiny
    dims (nation=25, region=5 rows — constant at any SF); orders/customer/
    supplier grow with SF, so they join by shuffle and AQE may promote
    them to broadcast at small SF."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — should compile to one scan with
    pushed predicates and no shuffle beyond the final single-row agg."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
             F.count("*").alias("n_items"))
    )


Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q14_brand_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast join."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("p_brand").agg(
        F.round(F.sum(rev), 4).alias("brand_revenue"),
        F.count("*").alias("n_items"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_retail"),
    )


Q14_SQL = """
SELECT p_brand,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS brand_revenue,
       COUNT(*) AS n_items,
       ROUND(AVG(p_retailprice), 4) AS avg_retail
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking (W1/W2 analog at corpus level): top-3 customers by
    revenue within each nation."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (rev.withColumn("rank_in_nation", F.row_number().over(w))
            .filter(F.col("rank_in_nation") <= 3))


TOP3_SQL = """
SELECT * FROM (
  SELECT n_name, c_custkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
         ROW_NUMBER() OVER (
           PARTITION BY n_name
           ORDER BY ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) DESC,
                    c_custkey ASC) AS rank_in_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, c_custkey
) WHERE rank_in_nation <= 3
"""


# --------------------------------------------------------------------------
# B. events: sessionization, windows, JSON
# --------------------------------------------------------------------------

def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity), fully window-expressed:
    lag → new-session flag → running sum = session id → per-user rollup."""
    ev = t(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w_user)).withColumn(
        "is_new",
        F.when(F.col("prev_ts").isNull()
               | F.expr("ts - prev_ts > INTERVAL '30' MINUTE"),
               1).otherwise(0))
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("session_events"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("session_events").alias("n_events"),
        F.max("session_events").alias("max_session_events"),
    )


EV_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS session_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions,
       CAST(SUM(session_events) AS BIGINT) AS n_events,
       CAST(MAX(session_events) AS BIGINT) AS max_session_events
FROM per_session GROUP BY user_id
"""


def ev_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                       "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("total_value")))


EV_DAILY_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n,
       ROUND(SUM(value), 4) AS total_value
FROM events GROUP BY strftime(ts, '%Y-%m-%d'), event_type
"""


ANOM_BASELINE_DAYS = 7   # trailing window for the per-type baseline
ANOM_Z = 3.0             # |z| beyond this flags the day
ANOM_ROUND = 3


def ev_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day volume anomaly monitor per event type — the
    ops-dashboard staple over ingestion telemetry: each (type, day)
    count is z-scored against the TRAILING ANOM_BASELINE_DAYS days'
    mean/stddev (trailing only, so an anomalous day cannot launder its
    own baseline); days with fewer than 3 baseline points emit a null
    z and never flag (cold-start discipline). The same shape monitors
    crawl volume, extraction error rates, or per-host yields.

    Scale shape: one partial-agg groupBy (type, day) collapses events
    to type×days rows; the trailing window runs per type over that
    tiny frame — corpus bytes never reach the window."""
    ev = t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                        "event_type")
             .agg(F.count("*").alias("n")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-ANOM_BASELINE_DAYS, -1))
    mu = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    npts = F.count("n").over(w)
    z = F.when((npts >= 3) & (sd > 0),
               F.round((F.col("n") - mu) / sd, ANOM_ROUND))
    return daily.select(
        "day", "event_type", "n",
        F.when(npts >= 3, F.round(mu, ANOM_ROUND)).alias("baseline_mean"),
        z.alias("z_score"),
        F.coalesce(F.abs(z) > ANOM_Z, F.lit(False)).alias("is_anomaly"))


EV_ANOMALY_SQL = f"""
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), win AS (
  SELECT day, event_type, n,
         AVG(n) OVER w AS mu,
         STDDEV_SAMP(n) OVER w AS sd,
         COUNT(n) OVER w AS npts
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {ANOM_BASELINE_DAYS} PRECEDING
                        AND 1 PRECEDING)
)
SELECT day, event_type, n,
       CASE WHEN npts >= 3 THEN round(mu, {ANOM_ROUND}) END
           AS baseline_mean,
       CASE WHEN npts >= 3 AND sd > 0
            THEN round((n - mu) / sd, {ANOM_ROUND}) END AS z_score,
       COALESCE(abs(CASE WHEN npts >= 3 AND sd > 0
                         THEN round((n - mu) / sd, {ANOM_ROUND}) END)
                > {ANOM_Z}, FALSE) AS is_anomaly
FROM win
"""


def ev_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time windows: 1-hour windows every 30
    minutes — each event lands in duration/slide = 2 windows. Spark's
    ``F.window(ts, dur, slide)`` aligns window starts to the epoch; the
    oracle replays that alignment with floor(epoch/slide) arithmetic.
    Completes the windowing family next to tumbling (ev_daily) and
    session (ev_session_window_native) windows."""
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                       "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    F.date_format("w.end", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_end"),
                    "event_type", "n", "total_value"))


EV_HOPPING_SQL = """
WITH hopped AS (
  SELECT event_type, value,
         -- make_timestamp keeps the window start in the NAIVE timestamp
         -- domain; to_timestamp would return TIMESTAMPTZ and the
         -- naive-vs-tz comparison below silently drops every row on any
         -- non-UTC host
         make_timestamp((CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)
                         - j.off * 1800) * 1000000) AS window_start,
         ts
  FROM events, (SELECT unnest(range(0, 2)) AS off) j
), valid AS (
  SELECT * FROM hopped
  WHERE ts >= window_start
    AND ts < window_start + INTERVAL 1 HOUR
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(window_start + INTERVAL 1 HOUR,
                '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
FROM valid
GROUP BY window_start, event_type
"""


def ev_user_top2_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .select("user_id", "event_id", "event_type", "value", "rn"))


EV_TOP2_SQL = """
SELECT user_id, event_id, event_type, value, rn FROM (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= 2
"""


def ev_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction stays JVM-side (get_json_object)."""
    ev = t(spark, sf_dir, "events")
    return (ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.max("k").alias("max_k")))


EV_PROPS_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# C. documents: text analytics / training-data ops
# --------------------------------------------------------------------------

def docs_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


DOCS_LANG_SQL = """
SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 4) AS avg_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""


def docs_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting — JVM regexp, no Python."""
    docs = t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


DOCS_TOKENS_SQL = """
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
       length(text) AS n_chars_actual
FROM documents
"""


def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5-hash groupBy; keeper = min doc_id per text hash."""
    docs = t(spark, sf_dir, "documents")
    return (docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count("*").alias("n_dups")))


DOCS_DEDUP_SQL = """
SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


_STOPWORD_PATTERN = r"\b(the|a|an|and|or|of|to|in|on|for|with|is|are)\b"


def docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length + stopword-density features (JVM regexp)."""
    docs = t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    stop_hits = F.size(F.regexp_extract_all(F.lower("text"),
                                            F.lit(_STOPWORD_PATTERN), F.lit(1)))
    return docs.select(
        "doc_id", "lang",
        toks.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        F.round(stop_hits / toks, 4).alias("stop_density"),
        F.round(
            F.least(F.lit(1.0), toks / F.lit(100.0)) * 0.5
            + F.least(F.lit(1.0), (stop_hits / toks) * F.lit(5.0)) * 0.5,
            4).alias("quality_score"),
    )


DOCS_QUALITY_SQL = f"""
SELECT doc_id, lang,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       len(regexp_extract_all(lower(text), '{_STOPWORD_PATTERN}', 1)) AS stop_hits,
       ROUND(len(regexp_extract_all(lower(text), '{_STOPWORD_PATTERN}', 1))
             / len(string_split_regex(trim(text), '\\s+')), 4) AS stop_density,
       ROUND(LEAST(1.0, len(string_split_regex(trim(text), '\\s+')) / 100.0) * 0.5
             + LEAST(1.0, (len(regexp_extract_all(lower(text), '{_STOPWORD_PATTERN}', 1))
                           / len(string_split_regex(trim(text), '\\s+'))) * 5.0) * 0.5,
             4) AS quality_score
FROM documents
"""


def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: normalized-text md5 prefix as a stable id."""
    docs = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.substring(F.md5(norm), 1, 16).alias("fingerprint"),
    )


DOCS_FP_SQL = """
SELECT doc_id,
       substring(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16)
         AS fingerprint
FROM documents
"""


def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types WITHIN
    sessions — the user-behavior model behind funnel design, bot
    heuristics, and next-action prediction baselines: for every
    (prev_type → next_type) pair observed between consecutive events
    of the same 30-min-gap session, the transition count and the
    row-normalized probability P(next | prev).

    Session scoping is load-bearing: a transition across a session
    boundary is noise, not behavior. Instead of materializing session
    ids and re-windowing by (user, session) — which would cost a
    SECOND exchange keyed on the finer key — the same single
    user-keyed window produces both lag(event_type) and the
    new-session flag, and boundary rows are simply filtered
    (is_new = 1 ⟺ the lagged event belongs to a previous session or
    doesn't exist). One shuffle keyed user_id, then a partial-agg
    groupBy on the tiny (prev, next) key space, then a window over
    the k×k count frame — the matrix itself is event-type-cardinality
    sized at any corpus scale."""
    ev = t(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = (ev.withColumn("prev_ts", F.lag("ts").over(w_user))
               .withColumn("prev_type", F.lag("event_type").over(w_user))
               .withColumn(
                   "is_new",
                   F.when(F.col("prev_ts").isNull()
                          | F.expr("ts - prev_ts > INTERVAL '30' MINUTE"),
                          1).otherwise(0)))
    counts = (flagged.filter(F.col("is_new") == 0)
              .groupBy("prev_type",
                       F.col("event_type").alias("next_type"))
              .agg(F.count("*").alias("n_trans")))
    w_prev = Window.partitionBy("prev_type")
    p = F.col("n_trans") / F.sum("n_trans").over(w_prev)
    return counts.select("prev_type", "next_type", "n_trans",
                         F.round(p, 6).alias("p_trans"))


EV_MARKOV_SQL = """
WITH flagged AS (
  SELECT event_type,
         lag(event_type) OVER w AS prev_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), counts AS (
  SELECT prev_type, event_type AS next_type,
         CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM flagged WHERE is_new = 0
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_trans,
       round(n_trans / CAST(SUM(n_trans) OVER (PARTITION BY prev_type)
                            AS DOUBLE), 6) AS p_trans
FROM counts
"""


EV_PATH_LEN = 5     # leading events kept per session path
EV_TOP_PATHS = 20   # paths reported


def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths — the product-analytics staple beside
    the Markov matrix (which sees single transitions; this sees whole
    JOURNEYS): each session's first EV_PATH_LEN event types joined
    into a path string, sessions counted per path, top EV_TOP_PATHS
    reported with a deterministic (count desc, path) tie-break.

    Scale shape: one user-keyed window pass (the shared sessionize
    shape), per-session truncation BEFORE the path aggregation (the
    collect_list is bounded at EV_PATH_LEN elements — never an
    unbounded per-group array), then a partial-agg groupBy on the
    path-string key space and a top-K."""
    ev = t(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w_user)) \
        .withColumn(
            "is_new",
            F.when(F.col("prev_ts").isNull()
                   | F.expr("ts - prev_ts > INTERVAL '30' MINUTE"),
                   1).otherwise(0))
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(
            w_user.rowsBetween(Window.unboundedPreceding,
                               Window.currentRow)))
    w_sess = Window.partitionBy("user_id", "session_id") \
        .orderBy("ts", "event_id")
    headed = (sess.withColumn("rn", F.row_number().over(w_sess))
              .filter(F.col("rn") <= EV_PATH_LEN))
    paths = (headed.groupBy("user_id", "session_id")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("rn", "event_type"))),
                     lambda s: s.event_type), ">").alias("path")))
    counts = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    # path-aggregate frame (distinct truncated paths), far below
    # event volume; production cuts with a global TakeOrdered(limit)
    w_rank = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (counts.withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= EV_TOP_PATHS)
            .select("rank", "path", "n_sessions"))


EV_TOP_PATHS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), headed AS (
  SELECT * FROM (
    SELECT user_id, session_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                              ORDER BY ts, event_id) AS rn
    FROM sess
  ) WHERE rn <= {EV_PATH_LEN}
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM headed GROUP BY user_id, session_id
), counts AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
  FROM paths GROUP BY path
)
SELECT rank, path, n_sessions FROM (
  SELECT path, n_sessions,
         CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC)
              AS INT) AS rank
  FROM counts
) WHERE rank <= {EV_TOP_PATHS}
"""


MK_ITERS = 8          # fixed power-method rounds (unrolled oracle)
MK_PI_SCALE = 10**9   # π carried in integer micro-units
MK_P_SCALE = 10**6    # transition probs as micro-int weights


def ev_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the session transition matrix —
    the power method over ev_markov_transitions' output (the same
    fixed-rounds discipline as hosts_pagerank / emb_pca_power): where
    users spend their long-run attention, the k-state analogue of
    PageRank on the behavior graph. All arithmetic is INTEGER
    micro-units (π in 1e-9, P in 1e-6, per-edge contribution
    floor(π·P / 1e6) before the sum), so every round is a sum of
    integers — bit-stable under any partition order, the
    docs_classifier_score determinism argument. Truncation drift
    makes Σπ sag a few micro-units per round; the drift is emitted
    (pi_sum_micro) rather than hidden, and every state on this
    fixture has outgoing transitions so no dangling-mass term is
    needed (asserted by the test).

    Scale shape: the matrix is event-type² rows — everything after
    the transition subplan is joins/aggregates over a k×k frame."""
    m = ev_markov_transitions(spark, sf_dir).select(
        "prev_type", "next_type",
        F.round(F.col("p_trans") * MK_P_SCALE).cast("long")
         .alias("p_micro"))
    states = m.select(F.col("prev_type").alias("state")).union(
        m.select("next_type")).distinct()
    n_states = states.count()
    pi = states.select(
        "state", F.lit(MK_PI_SCALE // n_states).alias("pi_micro"))
    for _ in range(MK_ITERS):
        pi = (m.join(pi, m.prev_type == pi.state)
              .select(F.col("next_type").alias("state"),
                      # exact long arithmetic: products stay < 2^63
                      # and `div` is integer division — no double hop
                      F.expr(f"(pi_micro * p_micro) div {MK_P_SCALE}")
                      .alias("c"))
              .groupBy("state")
              .agg(F.sum("c").alias("pi_micro"))).localCheckpoint(
                  eager=False)
    tot = pi.agg(F.sum("pi_micro").alias("pi_sum_micro"))
    return (pi.crossJoin(F.broadcast(tot))
            .select("state",
                    F.round(F.col("pi_micro") / MK_PI_SCALE, 6)
                     .alias("pi"),
                    "pi_micro", "pi_sum_micro"))


def _markov_stationary_sql() -> str:
    parts = [
        "m AS (\n"
        "  SELECT prev_type, next_type,\n"
        f"         CAST(round(p_trans * {MK_P_SCALE}) AS BIGINT)"
        " AS p_micro\n"
        f"  FROM ({EV_MARKOV_SQL})\n)",
        "states AS (SELECT DISTINCT prev_type AS state FROM m\n"
        "           UNION SELECT DISTINCT next_type FROM m)",
        "nst AS (SELECT COUNT(*) AS n FROM states)",
        f"pi0 AS (SELECT state, CAST({MK_PI_SCALE} // n AS BIGINT)"
        " AS pi_micro FROM states, nst)",
    ]
    prev = "pi0"
    for it in range(1, MK_ITERS + 1):
        parts.append(
            f"pi{it} AS (\n"
            f"  SELECT m.next_type AS state,\n"
            f"         CAST(SUM((p.pi_micro * m.p_micro) // {MK_P_SCALE})"
            f" AS BIGINT) AS pi_micro\n"
            f"  FROM m JOIN {prev} p ON p.state = m.prev_type\n"
            f"  GROUP BY m.next_type)")
        prev = f"pi{it}"
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes},
tot AS (SELECT CAST(SUM(pi_micro) AS BIGINT) AS pi_sum_micro FROM {prev})
SELECT state, round(pi_micro / {MK_PI_SCALE}.0, 6) AS pi,
       pi_micro, pi_sum_micro
FROM {prev}, tot
"""


MAU_WINDOW_DAYS = 30   # trailing window for the MAU denominator


def ev_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness — the engagement ratio every product
    dashboard tracks: per day, distinct active users that day (DAU)
    over distinct users in the trailing MAU_WINDOW_DAYS window (MAU).
    Exact form: the per-(day, user) frame joins onto the day spine
    with a bounded date-range condition, then one distinct-count per
    day — shuffle volume is day×user pairs × window width, far below
    event volume after the first distinct.

    Scale note: at extreme user counts the exact trailing distinct is
    replaced by the mergeable-HLL path this repo already pins
    (docs_hll_snapshot_merge / run_stats_job): one HLL register frame
    per day, trailing MAU = register-max fold of 30 frames — same
    output contract, no user-level shuffle. The exact form stays the
    oracle."""
    ev = t(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    joined = days.alias("d").join(
        du.alias("u"),
        (F.col("u.day") <= F.col("d.day"))
        & (F.col("u.day") > F.date_sub(F.col("d.day"), MAU_WINDOW_DAYS)))
    mau = (joined.groupBy(F.col("d.day").alias("day"))
           .agg(F.countDistinct("u.user_id").alias("mau")))
    return (dau.join(mau, "day")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "dau", "mau",
                    F.round(F.col("dau") / F.col("mau"), 6)
                     .alias("stickiness")))


EV_STICKINESS_SQL = f"""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), dau AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM du GROUP BY day
), mau AS (
  SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
  FROM (SELECT DISTINCT day FROM du) d
  JOIN du u ON u.day <= d.day
           AND u.day > d.day - INTERVAL {MAU_WINDOW_DAYS} DAY
  GROUP BY d.day
)
SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, mau.mau,
       round(dau.dau / CAST(mau.mau AS DOUBLE), 6) AS stickiness
FROM dau JOIN mau ON dau.day = mau.day
"""


RFM_BINS = 5   # quintiles per axis → 125 segment codes


def ev_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (Hughes 1994 — the classic user-value
    taxonomy): per user, Recency (days since last event, relative to
    the corpus max timestamp so the query is reproducible), Frequency
    (event count), Monetary (value sum), each quintile-binned with
    deterministic (metric, user_id) tie-breaks, composed into the
    three-digit segment code marketing/product stacks key on (555 =
    best on every axis; recency bins INVERT days so recent = 5).

    Scale shape: one partial-agg groupBy keyed user, three NTILE
    windows over the per-user frame (user-cardinality, far below
    events; the exact-vs-approx note of docs_quality_percentile_gate
    applies at extreme user counts), zero joins."""
    ev = t(spark, sf_dir, "events")
    ref = ev.agg(F.max("ts").alias("ref_ts"))
    per = (ev.crossJoin(F.broadcast(ref))
           .groupBy("user_id")
           .agg(F.min(F.datediff(F.col("ref_ts"), F.col("ts")))
                .alias("recency_days"),
                F.count("*").alias("frequency"),
                F.round(F.sum("value"), 4).alias("monetary")))
    rb = F.ntile(RFM_BINS).over(
        Window.orderBy(F.desc("recency_days"), "user_id"))
    fb = F.ntile(RFM_BINS).over(
        Window.orderBy(F.asc("frequency"), "user_id"))
    mb = F.ntile(RFM_BINS).over(
        Window.orderBy(F.asc("monetary"), "user_id"))
    binned = per.select(
        "user_id", "recency_days", "frequency", "monetary",
        rb.alias("r_bin"), fb.alias("f_bin"), mb.alias("m_bin"))
    seg = F.concat(F.col("r_bin").cast("string"),
                   F.col("f_bin").cast("string"),
                   F.col("m_bin").cast("string"))
    return binned.select("*", seg.alias("segment"))


EV_RFM_SQL = f"""
WITH ref AS (SELECT MAX(ts) AS ref_ts FROM events),
per AS (
  SELECT user_id,
         MIN(datediff('day', ts, ref_ts)) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         round(SUM(value), 4) AS monetary
  FROM events, ref GROUP BY user_id
), binned AS (
  SELECT user_id, CAST(recency_days AS INT) AS recency_days,
         frequency, monetary,
         CAST(NTILE({RFM_BINS}) OVER (
             ORDER BY recency_days DESC, user_id) AS INT) AS r_bin,
         CAST(NTILE({RFM_BINS}) OVER (
             ORDER BY frequency ASC, user_id) AS INT) AS f_bin,
         CAST(NTILE({RFM_BINS}) OVER (
             ORDER BY monetary ASC, user_id) AS INT) AS m_bin
  FROM per
)
SELECT user_id, recency_days, frequency, monetary, r_bin, f_bin, m_bin,
       CAST(r_bin AS VARCHAR) || CAST(f_bin AS VARCHAR)
         || CAST(m_bin AS VARCHAR) AS segment
FROM binned
"""


def ev_experiment_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with CUPED variance reduction (Deng,
    Xu, Kohavi & Walker, WSDM 2013 — the adjustment every large
    experimentation platform applies before reading a lift): users are
    hash-assigned to control/treatment (md5(user_id) parity — the
    deterministic stand-in for the platform's bucketing hash), the
    observation window is split at its midpoint into a pre-period
    (covariate X = per-user value sum before the split — "what the
    user was already worth") and a post-period (metric Y), and the
    CUPED-adjusted metric is Y' = Y − θ·(X − E[X]) with
    θ = cov(X,Y)/var(X) pooled across arms.

    Cross-engine float discipline: per-user sums are integer cents
    (round(value·100)), so every partial aggregate is exact regardless
    of partition order; θ, means, and the variance-reduction ratio
    1 − ρ² are derived from the five exact integer moment sums in one
    fixed expression tree (centered second moments are cast to double
    BEFORE multiplying so nothing overflows BIGINT), and the per-arm
    adjusted mean uses the closed form
    mean_adj = ȳ_a − θ·(x̄_a − x̄) — no double is ever SUMMED.

    Scale shape (100 TB of events): one partial-agg groupBy keyed
    user_id builds the per-user frame; the global moment row and the
    window-midpoint row are 1-row broadcasts; the per-arm rollup is a
    2-group aggregate. No window functions, no user-level join."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_timestamp("ts")).alias("ts_min"),
        F.max(F.unix_timestamp("ts")).alias("ts_max"))
    mid = ((F.col("ts_min") + F.col("ts_max")) / 2).cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(F.coalesce(F.sum(F.when(F.unix_timestamp("ts") <= mid,
                                     cents)), F.lit(0)).alias("x"),
             F.coalesce(F.sum(F.when(F.unix_timestamp("ts") > mid,
                                     cents)), F.lit(0)).alias("y")))
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13),
               16, 10).cast("long") % 2 == 0,
        F.lit("control")).otherwise(F.lit("treatment"))
    pu = per_user.select(arm.alias("arm"), "x", "y")
    mom = pu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    nd = F.col("n").cast("double")
    cxy = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    cxx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    cyy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    theta = cxy / cxx
    rho2 = (cxy * cxy) / (cxx * cyy)
    glob = mom.select(
        theta.alias("theta"), rho2.alias("rho2"),
        (F.col("sx") / F.col("n") / 100.0).alias("xbar"))
    arms = pu.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("sx_a"), F.sum("y").alias("sy_a"))
    xbar_a = F.col("sx_a") / F.col("n_users") / 100.0
    ybar_a = F.col("sy_a") / F.col("n_users") / 100.0
    return (arms.crossJoin(F.broadcast(glob))
            .select("arm", "n_users",
                    F.round(xbar_a, 6).alias("mean_pre"),
                    F.round(ybar_a, 6).alias("mean_post"),
                    F.round(ybar_a - F.col("theta")
                            * (xbar_a - F.col("xbar")), 6)
                     .alias("mean_post_cuped"),
                    F.round("theta", 6).alias("theta"),
                    F.round(1 - F.col("rho2"), 6).alias("var_reduction"))
            .orderBy("arm"))


EV_CUPED_SQL = """
WITH b AS (
  SELECT CAST((epoch(MIN(ts)) + epoch(MAX(ts))) / 2 AS BIGINT) AS mid
  FROM events
), pu AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CASE WHEN epoch(ts) <= b.mid
              THEN CAST(round(value * 100) AS BIGINT) END), 0)
              AS BIGINT) AS x,
         CAST(COALESCE(SUM(CASE WHEN epoch(ts) > b.mid
              THEN CAST(round(value * 100) AS BIGINT) END), 0)
              AS BIGINT) AS y
  FROM events, b GROUP BY user_id, b.mid
), pa AS (
  SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 13)) AS BIGINT) % 2 = 0
              THEN 'control' ELSE 'treatment' END AS arm, x, y
  FROM pu
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pa
), g AS (
  SELECT (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS theta,
         ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
           / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
           AS rho2,
         sx / CAST(n AS DOUBLE) / 100.0 AS xbar
  FROM mom
), arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(x) AS BIGINT) AS sx_a, CAST(SUM(y) AS BIGINT) AS sy_a
  FROM pa GROUP BY arm
)
SELECT arm, n_users,
       round(sx_a / CAST(n_users AS DOUBLE) / 100.0, 6) AS mean_pre,
       round(sy_a / CAST(n_users AS DOUBLE) / 100.0, 6) AS mean_post,
       round(sy_a / CAST(n_users AS DOUBLE) / 100.0
             - g.theta * (sx_a / CAST(n_users AS DOUBLE) / 100.0
                          - g.xbar), 6) AS mean_post_cuped,
       round(g.theta, 6) AS theta,
       round(1 - g.rho2, 6) AS var_reduction
FROM arms CROSS JOIN g
ORDER BY arm
"""


def ev_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over event baskets (the Apriori /
    market-basket readout, Agrawal & Srikant VLDB 1994): a basket is a
    (user_id, day), its items the DISTINCT event types seen that day;
    every directional rule antecedent ⇒ consequent is reported with
    basket counts, support = P(a,b), confidence = P(b|a), and
    lift = P(b|a) / P(b).

    Scale shape (100 TB of events): exactly ONE event-volume shuffle —
    ``groupBy(user, day).agg(collect_set(event_type))`` with map-side
    partial collect_set (events repeat types heavily within a day, so
    the exchange carries near-deduped sets, not raw events). There is
    NO self-join: ordered pairs are generated per basket by a narrow
    array comprehension over the item set, whose size is bounded by the
    event-type vocabulary, never by event volume. Downstream aggregates
    are vocab-bounded (≤ |vocab|² pair rows, |vocab| item rows, one
    total row) and join back as broadcasts."""
    ev = t(spark, sf_dir, "events")
    baskets = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.collect_set("event_type").alias("items")))
    nb = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    ic = (baskets.select(F.explode("items").alias("event_type"))
          .groupBy("event_type").agg(F.count(F.lit(1)).alias("n_item")))
    pair_arr = F.flatten(F.transform(
        F.col("items"),
        lambda a: F.transform(
            F.filter(F.col("items"), lambda c: c != a),
            lambda c: F.struct(a.alias("antecedent"),
                               c.alias("consequent")))))
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.antecedent").alias("antecedent"),
                 F.col("p.consequent").alias("consequent"))
        .agg(F.count(F.lit(1)).alias("n_both")))
    joined = (
        pairs
        .join(F.broadcast(ic.withColumnRenamed("n_item", "n_ante")),
              F.col("antecedent") == F.col("event_type")).drop("event_type")
        .join(F.broadcast(ic.withColumnRenamed("n_item", "n_cons")),
              F.col("consequent") == F.col("event_type")).drop("event_type")
        .crossJoin(F.broadcast(nb)))
    nbd = F.col("n_baskets").cast("double")
    conf = F.col("n_both") / F.col("n_ante")
    return joined.select(
        "antecedent", "consequent",
        F.col("n_both").cast("long").alias("n_both"),
        F.col("n_ante").cast("long").alias("n_ante"),
        F.col("n_cons").cast("long").alias("n_cons"),
        F.round(F.col("n_both") / nbd, 6).alias("support"),
        F.round(conf, 6).alias("confidence"),
        F.round(conf / (F.col("n_cons") / nbd), 6).alias("lift"),
    ).orderBy(F.desc("lift"), "antecedent", "consequent")


EV_ASSOC_SQL = """
WITH b AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
  FROM events
), nb AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets
  FROM (SELECT DISTINCT user_id, day FROM b)
), ic AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM b GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS antecedent, c.event_type AS consequent,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM b a JOIN b c
    ON a.user_id = c.user_id AND a.day = c.day
   AND a.event_type <> c.event_type
  GROUP BY 1, 2
)
SELECT antecedent, consequent, n_both,
       ia.n_item AS n_ante, ik.n_item AS n_cons,
       round(n_both / CAST(nb.n_baskets AS DOUBLE), 6) AS support,
       round(n_both / CAST(ia.n_item AS DOUBLE), 6) AS confidence,
       round((n_both / CAST(ia.n_item AS DOUBLE))
             / (ik.n_item / CAST(nb.n_baskets AS DOUBLE)), 6) AS lift
FROM pairs
JOIN ic ia ON ia.event_type = antecedent
JOIN ic ik ON ik.event_type = consequent
CROSS JOIN nb
ORDER BY lift DESC, antecedent, consequent
"""


ATTR_WINDOW_S = 7 * 24 * 3600  # 7-day lookback


def ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution over conversion paths: every purchase
    is a conversion; the view/click touches of the same user in the
    7-day lookback window form its path, and credit is assigned under
    the three standard models side by side — first-touch, last-touch,
    and linear (1/n per touch). Conversions with an empty path are
    credited to the synthetic ``direct`` channel, so total credit per
    model always equals the conversion count (the books balance).

    Cross-engine float discipline: linear credit is integer
    micro-units (``1_000_000 DIV n`` per touch) summed as BIGINT;
    the exposed columns divide once at the end.

    Scale shape (100 TB of events): one equi-join keyed user_id (the
    range predicate rides the join as a filter; per-user fan-out is
    bounded by user activity in the window), one conversion-keyed
    window for path ordering, then a channel-keyed aggregate whose
    cardinality is the event-type vocabulary."""
    ev = t(spark, sf_dir, "events")
    conv = (ev.filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("event_id").alias("conv_id"),
                    F.unix_timestamp("ts").alias("conv_ts")))
    touch = (ev.filter(F.col("event_type").isin("view", "click"))
             .select(F.col("user_id").alias("t_user"),
                     F.col("event_id").alias("touch_id"),
                     F.col("event_type").alias("channel"),
                     F.unix_timestamp("ts").alias("touch_ts")))
    paths = conv.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("touch_ts") <= F.col("conv_ts"))
        & (F.col("touch_ts") > F.col("conv_ts") - ATTR_WINDOW_S),
        "left",
    ).select("conv_id",
             F.coalesce("channel", F.lit("direct")).alias("channel"),
             "touch_ts", "touch_id")
    wp = Window.partitionBy("conv_id")
    wa = wp.orderBy(F.asc("touch_ts"), F.asc("touch_id"))
    n = F.count(F.lit(1)).over(wp)
    rn = F.row_number().over(wa)
    credited = paths.select(
        "channel",
        F.when(rn == 1, 1).otherwise(0).alias("c_first"),
        F.when(rn == n, 1).otherwise(0).alias("c_last"),
        F.expr(f"1000000 DIV count(*) OVER "
               f"(PARTITION BY conv_id)").alias("c_lin_micro"))
    return (credited.groupBy("channel")
            .agg(F.count(F.lit(1)).alias("n_touches"),
                 F.sum("c_first").cast("long").alias("credit_first"),
                 F.sum("c_last").cast("long").alias("credit_last"),
                 F.round(F.sum("c_lin_micro") / 1e6, 6)
                  .alias("credit_linear"))
            .orderBy("channel"))


EV_ATTRIBUTION_SQL = f"""
WITH conv AS (
  SELECT user_id, event_id AS conv_id, epoch(ts) AS conv_ts
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id AS t_user, event_id AS touch_id,
         event_type AS channel, epoch(ts) AS touch_ts
  FROM events WHERE event_type IN ('view', 'click')
), paths AS (
  SELECT c.conv_id, COALESCE(t.channel, 'direct') AS channel,
         t.touch_ts, t.touch_id
  FROM conv c LEFT JOIN touch t
    ON c.user_id = t.t_user
   AND t.touch_ts <= c.conv_ts
   AND t.touch_ts > c.conv_ts - {ATTR_WINDOW_S}
), credited AS (
  SELECT channel,
         CASE WHEN row_number() OVER wa = 1 THEN 1 ELSE 0 END AS c_first,
         CASE WHEN row_number() OVER wa = COUNT(*) OVER wp
              THEN 1 ELSE 0 END AS c_last,
         1000000 // (COUNT(*) OVER wp) AS c_lin_micro
  FROM paths
  WINDOW wp AS (PARTITION BY conv_id),
         wa AS (PARTITION BY conv_id
                ORDER BY touch_ts ASC, touch_id ASC)
)
SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(c_first) AS BIGINT) AS credit_first,
       CAST(SUM(c_last) AS BIGINT) AS credit_last,
       round(SUM(c_lin_micro) / 1000000.0, 6) AS credit_linear
FROM credited GROUP BY channel ORDER BY channel
"""


def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the revenue companion to
    ev_retention_cohorts: users cohorted by first-event week; purchase
    revenue lands in (cohort, week_offset) cells; the running
    cumulative divided by cohort size is the LTV-per-user curve every
    growth team reads week over week.

    Cross-engine float discipline: revenue is integer cents
    (round(value·100)) through every aggregate INCLUDING the running
    cumulative — the only division is the final per-user readout.

    Scale shape (100 TB of events): first-event groupBy keyed user_id
    (map-side combine), a user-keyed equi-join to tag purchases with
    their cohort, a (cohort, offset) aggregate that collapses to a
    weeks x offsets matrix, and a cohort-keyed running-sum window over
    that tiny matrix. Week arithmetic stays in the naive-timestamp
    domain; cohort weeks are emitted as date strings (timezone-free
    hash, same convention as ev_retention_cohorts)."""
    ev = t(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
              .select("user_id",
                      F.date_trunc("week", F.col("first_ts")).alias("cw")))
    sizes = firsts.groupBy("cw").agg(F.count("*").alias("cohort_size"))
    buys = (ev.filter(F.col("event_type") == "purchase")
            .select("user_id", F.date_trunc("week", "ts").alias("wk"),
                    F.round(F.col("value") * 100).cast("long")
                    .alias("cents")))
    cells = (buys.join(firsts, "user_id")
             .groupBy("cw", (F.datediff("wk", "cw") / 7).cast("int")
                      .alias("week_offset"))
             .agg(F.sum("cents").alias("revenue_cents")))
    w = (Window.partitionBy("cw").orderBy("week_offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (cells.join(F.broadcast(sizes), "cw")
            .select(F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
                    "week_offset", "cohort_size",
                    F.col("revenue_cents").cast("long")
                    .alias("revenue_cents"),
                    F.sum("revenue_cents").over(w).cast("long")
                    .alias("cum_revenue_cents"))
            .withColumn("ltv_per_user",
                        F.round(F.col("cum_revenue_cents") / 100.0
                                / F.col("cohort_size"), 6))
            .orderBy("cohort_week", "week_offset"))


EV_COHORT_LTV_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cw
  FROM events GROUP BY user_id
), sizes AS (
  SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM firsts GROUP BY cw
), buys AS (
  SELECT user_id, date_trunc('week', ts) AS wk,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), cells AS (
  SELECT f.cw,
         CAST(date_diff('day', f.cw, b.wk) / 7 AS INT) AS week_offset,
         CAST(SUM(b.cents) AS BIGINT) AS revenue_cents
  FROM buys b JOIN firsts f USING (user_id)
  GROUP BY 1, 2
)
SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week, c.week_offset,
       s.cohort_size, c.revenue_cents,
       CAST(SUM(c.revenue_cents) OVER (
            PARTITION BY c.cw ORDER BY c.week_offset
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_revenue_cents,
       round(SUM(c.revenue_cents) OVER (
            PARTITION BY c.cw ORDER BY c.week_offset
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            / 100.0 / s.cohort_size, 6) AS ltv_per_user
FROM cells c JOIN sizes s USING (cw)
ORDER BY cohort_week, week_offset
"""


# Inactive strictly longer than this (days) at observation end = churned.
# The synthetic corpus is dense (every user active within 0-2 days of the
# window end), so 0 is the only threshold that yields a genuine
# churned/censored mix; production corpora would use 14-30.
KM_CHURN_GAP_DAYS = 0


def ev_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of user lifetime (Kaplan &
    Meier 1958 — the right-censored retention curve): a user's
    lifetime is first→last event in days; users still active within
    KM_CHURN_GAP_DAYS of the observation end are CENSORED at their
    observed lifetime, everyone else is a churn event. At each event
    day d, the hazard is d_i/n_i (churns over at-risk), and
    S(d) = Π (1 − d_i/n_i) over event days ≤ d — computed as
    exp(cumsum(ln ·)) in a single ordered window so both engines fold
    the same sequence in the same order (ln/exp cross-engine parity is
    the same contract docs_unigram_logprob already pins).

    Scale shape: one user-keyed groupBy (first/last event, map-side
    combined), a 1-row observation-end broadcast, then a per-day
    aggregate whose cardinality is bounded by the observation span —
    the window runs over days, never users."""
    ev = t(spark, sf_dir, "events")
    end = ev.agg(F.max("ts").alias("end_ts"))
    users = (ev.groupBy("user_id")
             .agg(F.min("ts").alias("first_ts"),
                  F.max("ts").alias("last_ts"))
             .crossJoin(F.broadcast(end))
             .select(
                 F.datediff("last_ts", "first_ts").alias("day"),
                 (F.datediff("end_ts", "last_ts") > KM_CHURN_GAP_DAYS)
                 .cast("int").alias("churned")))
    per_day = (users.groupBy("day")
               .agg(F.count(F.lit(1)).alias("n_at_day"),
                    F.sum("churned").alias("d_churn")))
    # day-granularity frame: bounded by distinct active days
    wo = Window.orderBy("day")
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = users.agg(F.count(F.lit(1)).alias("n_total"))
    left_before = F.coalesce(
        F.sum("n_at_day").over(
            wo.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
    at_risk = (per_day.crossJoin(F.broadcast(total))
               .select("day", "n_at_day", "d_churn",
                       (F.col("n_total") - left_before).alias("n_risk")))
    surv = F.exp(F.sum(
        F.log(1.0 - F.col("d_churn") / F.col("n_risk"))).over(wcum))
    return at_risk.select(
        "day",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_churn").cast("long").alias("d_churn"),
        (F.col("n_at_day") - F.col("d_churn")).cast("long")
        .alias("n_censored"),
        F.round(surv, 6).alias("survival"),
    ).orderBy("day")


EV_SURVIVAL_KM_SQL = f"""
WITH endt AS (
  SELECT MAX(ts) AS end_ts FROM events
), users AS (
  SELECT date_diff('day', MIN(ts), MAX(ts)) AS day,
         CASE WHEN date_diff('day', MAX(ts), endt.end_ts)
                   > {KM_CHURN_GAP_DAYS}
              THEN 1 ELSE 0 END AS churned
  FROM events, endt GROUP BY user_id, endt.end_ts
), per_day AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_at_day,
         CAST(SUM(churned) AS BIGINT) AS d_churn
  FROM users GROUP BY day
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM users
), at_risk AS (
  SELECT day, n_at_day, d_churn,
         n_total - COALESCE(SUM(n_at_day) OVER (
            ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) AS n_risk
  FROM per_day, tot
)
SELECT day, CAST(n_risk AS BIGINT) AS n_risk, d_churn,
       CAST(n_at_day - d_churn AS BIGINT) AS n_censored,
       round(exp(SUM(ln(1.0 - d_churn / CAST(n_risk AS DOUBLE))) OVER (
            ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW)), 6) AS survival
FROM at_risk
ORDER BY day
"""


def ev_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation of the first-order Markov next-event model
    (the train/test discipline ev_markov_transitions lacks): session
    transitions are split at the observation midpoint by the LATER
    event's timestamp; train-half counts fit the model (per prev_type,
    predict the argmax next with count-desc / type-asc tie-break);
    eval-half transitions score top-1 accuracy per prev_type, side by
    side with the marginal baseline (always predict the train-half's
    globally most frequent next type) — the lift of conditioning is
    the point of the readout.

    Scale shape: ONE user-keyed window builds all transitions (the
    same single exchange as ev_markov_transitions); train counts,
    predictions, and the baseline are event-type-cardinality frames
    that broadcast back onto the eval aggregate."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_timestamp("ts")).alias("ts_min"),
        F.max(F.unix_timestamp("ts")).alias("ts_max"))
    mid = ((F.col("ts_min") + F.col("ts_max")) / 2).cast("long")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (ev.withColumn("prev_ts", F.lag("ts").over(w_user))
             .withColumn("prev_type", F.lag("event_type").over(w_user))
             .filter(F.col("prev_ts").isNotNull()
                     & F.expr("ts - prev_ts <= INTERVAL '30' MINUTE"))
             .crossJoin(F.broadcast(bounds))
             .select("prev_type",
                     F.col("event_type").alias("next_type"),
                     (F.unix_timestamp("ts") <= mid).alias("is_train")))
    train = (trans.filter("is_train")
             .groupBy("prev_type", "next_type")
             .agg(F.count("*").alias("n")))
    w_pred = Window.partitionBy("prev_type").orderBy(
        F.desc("n"), F.asc("next_type"))
    pred = (train.withColumn("rk", F.row_number().over(w_pred))
            .filter(F.col("rk") == 1)
            .select("prev_type", F.col("next_type").alias("predicted")))
    marg = (train.groupBy("next_type").agg(F.sum("n").alias("n"))
            .orderBy(F.desc("n"), F.asc("next_type")).limit(1)
            .select(F.col("next_type").alias("baseline")))
    ev_rows = (trans.filter(~F.col("is_train"))
               .join(F.broadcast(pred), "prev_type", "left")
               .crossJoin(F.broadcast(marg)))
    return (ev_rows.groupBy("prev_type", "predicted", "baseline")
            .agg(F.count("*").alias("n_eval"),
                 F.sum((F.col("next_type") == F.col("predicted"))
                       .cast("int")).alias("n_correct"),
                 F.sum((F.col("next_type") == F.col("baseline"))
                       .cast("int")).alias("n_correct_baseline"))
            .select("prev_type", "predicted", "baseline",
                    F.col("n_eval").cast("long").alias("n_eval"),
                    F.col("n_correct").cast("long").alias("n_correct"),
                    F.round(F.col("n_correct") / F.col("n_eval"), 6)
                    .alias("accuracy"),
                    F.col("n_correct_baseline").cast("long")
                    .alias("n_correct_baseline"),
                    F.round(F.col("n_correct_baseline")
                            / F.col("n_eval"), 6)
                    .alias("accuracy_baseline"))
            .orderBy("prev_type"))


EV_NEXT_EVENT_EVAL_SQL = """
WITH b AS (
  SELECT CAST((epoch(MIN(ts)) + epoch(MAX(ts))) / 2 AS BIGINT) AS mid
  FROM events
), trans AS (
  SELECT prev_type, event_type AS next_type,
         epoch(ts) <= b.mid AS is_train
  FROM (
    SELECT event_type, ts,
           lag(event_type) OVER w AS prev_type,
           lag(ts) OVER w AS prev_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ), b
  WHERE prev_ts IS NOT NULL AND ts - prev_ts <= INTERVAL 30 MINUTE
), train AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM trans WHERE is_train GROUP BY 1, 2
), pred AS (
  SELECT prev_type, next_type AS predicted FROM (
    SELECT prev_type, next_type, row_number() OVER (
        PARTITION BY prev_type ORDER BY n DESC, next_type) AS rk
    FROM train) WHERE rk = 1
), marg AS (
  SELECT next_type AS baseline FROM (
    SELECT next_type, SUM(n) AS n FROM train GROUP BY next_type
    ORDER BY n DESC, next_type LIMIT 1)
)
SELECT t.prev_type, p.predicted, m.baseline,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN t.next_type = p.predicted
                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       round(SUM(CASE WHEN t.next_type = p.predicted THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy,
       CAST(SUM(CASE WHEN t.next_type = m.baseline
                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct_baseline,
       round(SUM(CASE WHEN t.next_type = m.baseline THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy_baseline
FROM trans t
LEFT JOIN pred p USING (prev_type)
CROSS JOIN marg m
WHERE NOT t.is_train
GROUP BY t.prev_type, p.predicted, m.baseline
ORDER BY t.prev_type
"""


def ev_experiment_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The readout that completes the experimentation family (SRM gate
    → CUPED adjustment → this): the CUPED-adjusted treatment effect
    with its normal-approximation 95% interval. Per user,
    Y′ = y − θ·(x − x̄) with θ and x̄ pooled (ev_experiment_cuped's
    estimator); per arm, mean and sample variance of Y′ are derived
    purely from the five exact integer-cent moment sums (n, Σx, Σy,
    Σxx, Σxy, Σyy per arm) in one fixed expression —
    Var(Y′) = Var(y) − 2θ·Cov(x,y) + θ²·Var(x) — so no double is ever
    summed; then Δ = ȳ′_t − ȳ′_c, SE = √(v_t/n_t + v_c/n_c), and the
    ±1.96·SE interval with a significance flag.

    Scale shape: identical to ev_experiment_cuped — one user-keyed
    partial-agg groupBy, 1-row broadcasts, a 2-group rollup, and a
    single-row readout."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_timestamp("ts")).alias("ts_min"),
        F.max(F.unix_timestamp("ts")).alias("ts_max"))
    mid = ((F.col("ts_min") + F.col("ts_max")) / 2).cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(F.coalesce(F.sum(F.when(F.unix_timestamp("ts") <= mid,
                                     cents)), F.lit(0)).alias("x"),
             F.coalesce(F.sum(F.when(F.unix_timestamp("ts") > mid,
                                     cents)), F.lit(0)).alias("y")))
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13),
               16, 10).cast("long") % 2 == 0,
        F.lit("control")).otherwise(F.lit("treatment"))
    pu = per_user.select(arm.alias("arm"), "x", "y")
    moms = pu.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    g = moms.agg(
        F.sum("n").alias("n"), F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"), F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"), F.sum("syy").alias("syy"))
    nd = F.col("n").cast("double")
    cxy = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    cxx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    glob = g.select((cxy / cxx).alias("theta"),
                    (F.col("sx") / nd).alias("xbar_c100"))
    a = moms.crossJoin(F.broadcast(glob))
    an = F.col("n").cast("double")
    mean_adj = ((F.col("sy") / an)
                - F.col("theta") * (F.col("sx") / an - F.col("xbar_c100"))
                ) / 100.0
    vx = (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / an) \
        / (an - 1)
    vy = (F.col("syy") - F.col("sy").cast("double") * F.col("sy") / an) \
        / (an - 1)
    vxy = (F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / an) \
        / (an - 1)
    var_adj = (vy - 2 * F.col("theta") * vxy
               + F.col("theta") * F.col("theta") * vx) / 10000.0
    arms = a.select("arm", F.col("n").cast("long").alias("n_users"),
                    mean_adj.alias("m"), (var_adj / an).alias("vn"))
    wide = arms.groupBy().pivot("arm", ["control", "treatment"]).agg(
        F.first("n_users").alias("n"), F.first("m").alias("m"),
        F.first("vn").alias("vn"))
    delta = F.col("treatment_m") - F.col("control_m")
    se = F.sqrt(F.col("treatment_vn") + F.col("control_vn"))
    return wide.select(
        F.col("control_n").alias("n_control"),
        F.col("treatment_n").alias("n_treatment"),
        F.round("control_m", 6).alias("mean_adj_control"),
        F.round("treatment_m", 6).alias("mean_adj_treatment"),
        F.round(delta, 6).alias("delta"),
        F.round(se, 6).alias("se"),
        F.round(delta - 1.96 * se, 6).alias("ci_lo"),
        F.round(delta + 1.96 * se, 6).alias("ci_hi"),
        (F.abs(delta) > 1.96 * se).alias("significant"))


EV_EXPERIMENT_CI_SQL = """
WITH b AS (
  SELECT CAST((epoch(MIN(ts)) + epoch(MAX(ts))) / 2 AS BIGINT) AS mid
  FROM events
), pu AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CASE WHEN epoch(ts) <= b.mid
              THEN CAST(round(value * 100) AS BIGINT) END), 0)
              AS BIGINT) AS x,
         CAST(COALESCE(SUM(CASE WHEN epoch(ts) > b.mid
              THEN CAST(round(value * 100) AS BIGINT) END), 0)
              AS BIGINT) AS y
  FROM events, b GROUP BY user_id, b.mid
), pa AS (
  SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 13)) AS BIGINT) % 2 = 0
              THEN 'control' ELSE 'treatment' END AS arm, x, y
  FROM pu
), moms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pa GROUP BY arm
), g AS (
  SELECT (CAST(SUM(n) AS DOUBLE) * SUM(sxy)
            - CAST(SUM(sx) AS DOUBLE) * SUM(sy))
         / (CAST(SUM(n) AS DOUBLE) * SUM(sxx)
            - CAST(SUM(sx) AS DOUBLE) * SUM(sx)) AS theta,
         SUM(sx) / CAST(SUM(n) AS DOUBLE) AS xbar_c100
  FROM moms
), arms AS (
  SELECT arm, n,
         ((sy / CAST(n AS DOUBLE))
          - g.theta * (sx / CAST(n AS DOUBLE) - g.xbar_c100)) / 100.0
           AS m,
         (((syy - CAST(sy AS DOUBLE) * sy / n) / (n - 1))
          - 2 * g.theta * ((sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1))
          + g.theta * g.theta
            * ((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1)))
          / 10000.0 / n AS vn
  FROM moms, g
)
SELECT c.n AS n_control, t.n AS n_treatment,
       round(c.m, 6) AS mean_adj_control,
       round(t.m, 6) AS mean_adj_treatment,
       round(t.m - c.m, 6) AS delta,
       round(sqrt(t.vn + c.vn), 6) AS se,
       round(t.m - c.m - 1.96 * sqrt(t.vn + c.vn), 6) AS ci_lo,
       round(t.m - c.m + 1.96 * sqrt(t.vn + c.vn), 6) AS ci_hi,
       abs(t.m - c.m) > 1.96 * sqrt(t.vn + c.vn) AS significant
FROM arms c, arms t
WHERE c.arm = 'control' AND t.arm = 'treatment'
"""


def ev_experiment_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for the hash-bucketed experiment
    (the first gate every experimentation platform runs before reading
    a lift — Fabijan et al. 2019 "Diagnosing Sample Ratio Mismatch"):
    users are assigned by the same md5-parity rule as
    ev_experiment_cuped, the design allocation is 50/50, and the
    one-df chi-square statistic against expected counts is compared to
    the 0.001-level critical value 10.828 (SRM checks alarm at strict
    thresholds because the test runs on every experiment every day).

    All inputs to the statistic are exact integers (user counts); the
    only floats are the final fixed-form expression. One user-distinct
    aggregate keyed user_id, then a 1-row readout."""
    ev = t(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13),
               16, 10).cast("long") % 2 == 0,
        F.lit("control")).otherwise(F.lit("treatment"))
    counts = (ev.select("user_id").distinct()
              .select(arm.alias("arm"))
              .groupBy().agg(
                  F.sum(F.when(F.col("arm") == "control", 1)
                        .otherwise(0)).alias("n_control"),
                  F.sum(F.when(F.col("arm") == "treatment", 1)
                        .otherwise(0)).alias("n_treatment")))
    n = F.col("n_control") + F.col("n_treatment")
    exp_d = n.cast("double") / 2
    chi2 = ((F.col("n_control") - exp_d) ** 2 / exp_d
            + (F.col("n_treatment") - exp_d) ** 2 / exp_d)
    return counts.select(
        F.col("n_control").cast("long").alias("n_control"),
        F.col("n_treatment").cast("long").alias("n_treatment"),
        n.cast("long").alias("n_total"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 10.828).alias("srm_flag"))


EV_SRM_SQL = """
WITH u AS (
  SELECT DISTINCT user_id FROM events
), arms AS (
  SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 13)) AS BIGINT) % 2 = 0
              THEN 'control' ELSE 'treatment' END AS arm
  FROM u
), c AS (
  SELECT CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_control,
         CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_treatment
  FROM arms
)
SELECT n_control, n_treatment,
       n_control + n_treatment AS n_total,
       round(pow(n_control - (n_control + n_treatment) / 2.0, 2)
               / ((n_control + n_treatment) / 2.0)
             + pow(n_treatment - (n_control + n_treatment) / 2.0, 2)
               / ((n_control + n_treatment) / 2.0), 6) AS chi2,
       (pow(n_control - (n_control + n_treatment) / 2.0, 2)
          / ((n_control + n_treatment) / 2.0)
        + pow(n_treatment - (n_control + n_treatment) / 2.0, 2)
          / ((n_control + n_treatment) / 2.0)) > 10.828 AS srm_flag
FROM c
"""


HOLT_ALPHA = 0.5
HOLT_BETA = 0.3
HOLT_SIGMA_K = 2.0  # anomaly if |residual| > K * sd(residuals)


def ev_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend exponential smoothing over the daily event
    series (Holt 1957 / Hyndman & Athanasopoulos FPP §8.2) with
    one-step-ahead fitted values and residual-based anomaly flags —
    the forecasting/monitoring readout behind every ops dashboard:
    level_t = α·y_t + (1−α)·(level_{t−1}+trend_{t−1}),
    trend_t = β·(level_t−level_{t−1}) + (1−β)·trend_{t−1},
    fitted_t = level_{t−1}+trend_{t−1}, initialized level₁ = y₁,
    trend₁ = y₂−y₁.

    Determinism: the recurrence is inherently sequential, so it folds
    ONCE over the day-ordered array with ``F.aggregate`` (JVM
    higher-order function, fixed fold order — the same fold the
    DuckDB oracle's recursive CTE performs step for step, so every
    IEEE operation happens in the same sequence on both engines); the
    anomaly sigma comes from full-frame ordered window sums, never a
    partition-order-dependent aggregate.

    Scale shape: ONE day-keyed partial aggregate (map-side combined —
    shuffle volume is the day cardinality), a 1-row collect_list of
    the bounded day series, the narrow fold, one explode. The window
    over days is single-partition by construction and bounded by the
    observation span, never event volume."""
    ev = t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("y")))
    series = daily.agg(F.sort_array(
        F.collect_list(F.struct("day", "y"))).alias("s"))
    a, b = HOLT_ALPHA, HOLT_BETA
    first = F.col("s")[0]
    second = F.col("s")[1]
    init = F.struct(
        first["y"].cast("double").alias("level"),
        (second["y"] - first["y"]).cast("double").alias("trend"),
        F.array(F.struct(
            first["day"].alias("day"),
            first["y"].alias("y"),
            first["y"].cast("double").alias("fitted"))).alias("out"))
    folded = F.aggregate(
        F.slice(F.col("s"), 2, F.size("s") - 1), init,
        lambda acc, x: F.struct(
            (a * x["y"] + (1 - a) * (acc["level"] + acc["trend"]))
            .alias("level"),
            (b * ((a * x["y"] + (1 - a) * (acc["level"] + acc["trend"]))
                  - acc["level"]) + (1 - b) * acc["trend"]).alias("trend"),
            F.concat(acc["out"], F.array(F.struct(
                x["day"].alias("day"), x["y"].alias("y"),
                (acc["level"] + acc["trend"]).alias("fitted"))))
            .alias("out")))
    rows = (series.select(F.explode(folded["out"]).alias("r"))
            .select(F.col("r.day").alias("day"),
                    F.col("r.y").cast("long").alias("y"),
                    F.col("r.fitted").alias("fitted_raw"))
            .withColumn("residual_raw",
                        F.col("y") - F.col("fitted_raw")))
    # day-granularity series frame: bounded by distinct days
    wall = (Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    n = F.count(F.lit(1)).over(wall)
    sr = F.sum("residual_raw").over(wall)
    srr = F.sum(F.col("residual_raw") * F.col("residual_raw")).over(wall)
    sd = F.sqrt((srr - sr * sr / n) / (n - 1))
    return (rows.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "y",
        F.round("fitted_raw", 6).alias("fitted"),
        F.round("residual_raw", 6).alias("residual"),
        (F.abs("residual_raw") > HOLT_SIGMA_K * sd + 1e-9)
        .alias("anomaly"))
        .orderBy("day"))


def _holt_sql() -> str:
    a, b = HOLT_ALPHA, HOLT_BETA
    return f"""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), ordered AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS rn FROM daily
), step(rn, day, y, level, trend, fitted) AS (
  SELECT o1.rn, o1.day, o1.y, CAST(o1.y AS DOUBLE),
         CAST(o2.y - o1.y AS DOUBLE), CAST(o1.y AS DOUBLE)
  FROM ordered o1 JOIN ordered o2 ON o2.rn = 2
  WHERE o1.rn = 1
  UNION ALL
  SELECT o.rn, o.day, o.y,
         {a} * o.y + (1 - {a}) * (s.level + s.trend),
         {b} * (({a} * o.y + (1 - {a}) * (s.level + s.trend))
                - s.level) + (1 - {b}) * s.trend,
         s.level + s.trend
  FROM step s JOIN ordered o ON o.rn = s.rn + 1
), resid AS (
  SELECT day, y, fitted, y - fitted AS r FROM step
), sig AS (
  SELECT sqrt((SUM(r * r) OVER w
               - SUM(r) OVER w * SUM(r) OVER w / COUNT(*) OVER w)
              / (COUNT(*) OVER w - 1)) AS sd,
         day, y, fitted, r
  FROM resid
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND UNBOUNDED FOLLOWING)
)
SELECT strftime(day, '%Y-%m-%d') AS day, y,
       round(fitted, 6) AS fitted, round(r, 6) AS residual,
       abs(r) > {HOLT_SIGMA_K} * sd + 1e-9 AS anomaly
FROM sig ORDER BY day
"""


GINI_TOP_FRACS = (1, 10)   # top-N% share readouts


def ev_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration readout over users — the Gini
    coefficient plus top-1%/top-10% revenue shares (the whale-economy
    numbers every monetization review opens with; the user-side
    companion of hosts_concentration's HHI): users are ranked by
    lifetime purchase cents ascending and
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx), computed ENTIRELY in
    BIGINT micro-units — rank sums, cent sums, and the final
    division are exact integers, so the coefficient is bit-identical
    across engines with no float aggregation anywhere. Users with
    events but no purchases count as zeros (they are the inequality).

    Scale shape: one user-keyed partial aggregate, then a
    rank-by-revenue pass — written here as a window over the
    user-cardinality frame (bounded at this SF); the production form
    of the same plan is the standard two-pass range-partitioned
    ranking (repartitionByRange on cents + per-partition offsets),
    which preserves the exact same rank values this query pins."""
    ev = t(spark, sf_dir, "events")
    per_user = (ev.groupBy("user_id")
                .agg(F.sum(F.when(F.col("event_type") == "purchase",
                                  F.round(F.col("value") * 100)
                                  .cast("long")).otherwise(0))
                     .alias("cents")))
    w = Window.orderBy(F.asc("cents"), F.asc("user_id"))
    ranked = (per_user.withColumn("i", F.row_number().over(w))
              .withColumn("n_all",
                          F.count(F.lit(1)).over(Window.partitionBy())))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s0"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("s1"),
        *[F.sum(F.when(F.expr(f"i > ({100 - p} * n_all) DIV 100"),
                       F.col("cents")).otherwise(0))
          .cast("long").alias(f"top{p}_cents")
          for p in GINI_TOP_FRACS])
    g = F.expr("(2 * s1 - (n + 1) * s0) * 1000000 DIV (n * s0)")
    out = agg.withColumn("gini_micro", g)
    cols = [F.col("n").alias("n_users"),
            F.round(F.col("s0") / 100.0, 2).alias("total_revenue"),
            F.round(F.col("gini_micro") / 1e6, 6).alias("gini")]
    for p in GINI_TOP_FRACS:
        cols.append(F.round(F.col(f"top{p}_cents") / F.col("s0"), 6)
                    .alias(f"top{p}pct_share"))
    return out.select(*cols)


def _gini_sql() -> str:
    tops = ",\n         ".join(
        f"CAST(SUM(CASE WHEN i > ({100 - p} * n_all) // 100 "
        f"THEN cents ELSE 0 END) AS BIGINT) AS top{p}_cents"
        for p in GINI_TOP_FRACS)
    shares = ",\n       ".join(
        f"round(top{p}_cents / CAST(s0 AS DOUBLE), 6)"
        f" AS top{p}pct_share" for p in GINI_TOP_FRACS)
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS cents
  FROM events GROUP BY user_id
), ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents ASC, user_id ASC) AS i,
         COUNT(*) OVER () AS n_all
  FROM per_user
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s0,
         CAST(SUM(i * cents) AS BIGINT) AS s1,
         {tops}
  FROM ranked
), g AS (
  SELECT *, (2 * s1 - (n + 1) * s0) * 1000000 // (n * s0)
           AS gini_micro
  FROM agg
)
SELECT n AS n_users, round(s0 / 100.0, 2) AS total_revenue,
       round(gini_micro / 1e6, 6) AS gini,
       {shares}
FROM g
"""


POWER_Z_ALPHA = 1.959964   # two-sided 5%
POWER_Z_BETA = 0.841621    # 80% power
POWER_MDES = (0.01, 0.02, 0.05, 0.10)   # relative minimum detectable effects


def ev_experiment_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-experiment power analysis — the planning companion to
    ev_experiment_srm / _cuped / _ci: from the HISTORICAL per-user
    revenue distribution, the required sample size per arm for each
    candidate relative MDE under the standard two-sample normal
    approximation n = 2·(z_α/2 + z_β)²·σ²/δ², δ = mde·μ (Kohavi et
    al., "Trustworthy Online Controlled Experiments" §17), plus the
    implied run length at the observed distinct-users-per-day rate.

    Cross-engine float discipline: per-user revenue is integer cents;
    μ and σ² come from BIGINT (n, Σx, Σx²) moments with the float
    tree mirrored term for term in the oracle; n_per_arm is emitted
    as round(·, 4) — a planning number — rather than ceil, so no
    integer-boundary sensitivity exists anywhere.

    Scale shape (100 TB of events): one user-keyed partial aggregate
    (per-user cents), one 1-row moment aggregate, one day-cardinality
    aggregate for the traffic rate, then a 4-element literal MDE
    explode on the 1-row frame. Nothing downstream of the first
    groupBy scales with event volume."""
    ev = t(spark, sf_dir, "events")
    per_user = (ev.groupBy("user_id")
                .agg(F.sum(F.when(F.col("event_type") == "purchase",
                                  F.round(F.col("value") * 100)
                                  .cast("long")).otherwise(0))
                     .alias("cents")))
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).alias("sxx"))
    days = (ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
            .agg(F.count(F.lit(1)).alias("n_user_days"),
                 F.countDistinct("day").alias("n_days")))
    base = mom.crossJoin(F.broadcast(days)).select(
        "n_users", "sx", "sxx",
        (F.col("sx") / F.col("n_users")).alias("mu"),
        ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_users"))
         / (F.col("n_users") - 1)).alias("var"),
        (F.col("n_user_days") / F.col("n_days")).alias("users_per_day"))
    z2 = (POWER_Z_ALPHA + POWER_Z_BETA) ** 2
    out = (base.select(
        F.explode(F.array(*[F.lit(m) for m in POWER_MDES])).alias("mde"),
        "n_users", "mu", "var", "users_per_day")
        .withColumn("n_per_arm",
                    2.0 * z2 * F.col("var")
                    / ((F.col("mde") * F.col("mu"))
                       * (F.col("mde") * F.col("mu")))))
    return out.select(
        F.round("mde", 4).alias("mde"),
        F.col("n_users").cast("long").alias("n_users_hist"),
        F.round(F.col("mu") / 100.0, 6).alias("mean_revenue"),
        F.round(F.sqrt("var") / 100.0, 6).alias("sd_revenue"),
        F.round("n_per_arm", 4).alias("n_per_arm"),
        F.round(2.0 * F.col("n_per_arm") / F.col("users_per_day"), 4)
        .alias("days_to_run")).orderBy("mde")


def _power_sql() -> str:
    z2 = (POWER_Z_ALPHA + POWER_Z_BETA) ** 2
    mdes = ", ".join(f"({m})" for m in POWER_MDES)
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS cents
  FROM events GROUP BY user_id
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(cents) AS BIGINT) AS sx,
         CAST(SUM(cents * cents) AS BIGINT) AS sxx
  FROM per_user
), days AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_user_days,
         CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
  FROM (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
), base AS (
  SELECT n_users, sx / CAST(n_users AS DOUBLE) AS mu,
         (sxx - sx * CAST(sx AS DOUBLE) / n_users)
           / (n_users - 1) AS var,
         n_user_days / CAST(n_days AS DOUBLE) AS users_per_day
  FROM mom CROSS JOIN days
), mdes(mde) AS (VALUES {mdes}),
armed AS (
  SELECT mde, n_users, mu, var, users_per_day,
         2.0 * {z2!r} * var / ((mde * mu) * (mde * mu)) AS n_per_arm
  FROM base CROSS JOIN mdes
)
SELECT round(mde, 4) AS mde, n_users AS n_users_hist,
       round(mu / 100.0, 6) AS mean_revenue,
       round(sqrt(var) / 100.0, 6) AS sd_revenue,
       round(n_per_arm, 4) AS n_per_arm,
       round(2.0 * n_per_arm / users_per_day, 4) AS days_to_run
FROM armed ORDER BY mde
"""


CUSUM_K = 0.5    # slack, in sigma units
CUSUM_H = 4.0    # decision threshold, in sigma units


def ev_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided standardized CUSUM changepoint detection over the
    daily event series (Page 1954) — the monitoring primitive that
    catches sustained level shifts the per-day z-score of
    ev_anomaly_daily misses: S⁺_t = max(0, S⁺_{t−1} + z_t − k),
    S⁻_t = max(0, S⁻_{t−1} − z_t − k) with z_t standardized against
    the full-series mean/sd, alarm when either side exceeds h.

    Determinism: μ and σ come from BIGINT (n, Σy, Σy²) moments with
    the float tree mirrored in the oracle; the recurrence is
    inherently sequential so — exactly like ev_forecast_holt — it
    folds ONCE over the day-ordered array with ``F.aggregate``, the
    same IEEE op sequence the oracle's recursive CTE performs.

    Scale shape: ONE day-keyed partial aggregate (shuffle volume =
    day cardinality), a 1-row collect of the bounded day series, a
    narrow fold, one explode. Event volume only touches the first
    map-side-combined groupBy."""
    ev = t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("y")))
    mom = daily.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("y").alias("sy"),
                    F.sum(F.col("y") * F.col("y")).alias("syy"))
    series = daily.agg(F.sort_array(
        F.collect_list(F.struct("day", "y"))).alias("s"))
    both = series.crossJoin(F.broadcast(mom)).select(
        "s", (F.col("sy") / F.col("n")).alias("mu"),
        F.sqrt((F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
               / (F.col("n") - 1)).alias("sd"))
    k = F.lit(CUSUM_K)
    init = F.struct(
        F.lit(0.0).alias("sp"), F.lit(0.0).alias("sn"),
        F.expr("CAST(array() AS "
               "ARRAY<STRUCT<day: DATE, y: BIGINT, z: DOUBLE,"
               " sp: DOUBLE, sn: DOUBLE>>)").alias("out"))
    mu, sd = F.col("mu"), F.col("sd")
    folded = F.aggregate(
        F.col("s"), init,
        lambda acc, x: F.struct(
            F.greatest(F.lit(0.0),
                       acc["sp"] + (x["y"] - mu) / sd - k).alias("sp"),
            F.greatest(F.lit(0.0),
                       acc["sn"] - (x["y"] - mu) / sd - k).alias("sn"),
            F.concat(acc["out"], F.array(F.struct(
                x["day"].alias("day"), x["y"].cast("long").alias("y"),
                ((x["y"] - mu) / sd).alias("z"),
                F.greatest(F.lit(0.0),
                           acc["sp"] + (x["y"] - mu) / sd - k).alias("sp"),
                F.greatest(F.lit(0.0),
                           acc["sn"] - (x["y"] - mu) / sd - k)
                .alias("sn")))).alias("out")))
    return (both.select(F.explode(folded["out"]).alias("r"))
            .select(F.date_format("r.day", "yyyy-MM-dd").alias("day"),
                    F.col("r.y").alias("y"),
                    F.round("r.z", 6).alias("z"),
                    F.round("r.sp", 6).alias("cusum_pos"),
                    F.round("r.sn", 6).alias("cusum_neg"),
                    ((F.col("r.sp") > CUSUM_H) | (F.col("r.sn") > CUSUM_H))
                    .alias("alarm"))
            .orderBy("day"))


def _cusum_sql() -> str:
    k, h = CUSUM_K, CUSUM_H
    return f"""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM daily
), stats AS (
  SELECT sy / CAST(n AS DOUBLE) AS mu,
         sqrt((syy - sy * CAST(sy AS DOUBLE) / n) / (n - 1)) AS sd
  FROM mom
), ordered AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS rn FROM daily
), step(rn, day, y, z, sp, sn) AS (
  SELECT o.rn, o.day, o.y, (o.y - s.mu) / s.sd,
         greatest(0.0, 0.0 + (o.y - s.mu) / s.sd - {k}),
         greatest(0.0, 0.0 - (o.y - s.mu) / s.sd - {k})
  FROM ordered o CROSS JOIN stats s WHERE o.rn = 1
  UNION ALL
  SELECT o.rn, o.day, o.y, (o.y - s.mu) / s.sd,
         greatest(0.0, p.sp + (o.y - s.mu) / s.sd - {k}),
         greatest(0.0, p.sn - (o.y - s.mu) / s.sd - {k})
  FROM step p JOIN ordered o ON o.rn = p.rn + 1 CROSS JOIN stats s
)
SELECT strftime(day, '%Y-%m-%d') AS day, y, round(z, 6) AS z,
       round(sp, 6) AS cusum_pos, round(sn, 6) AS cusum_neg,
       (sp > {h} OR sn > {h}) AS alarm
FROM step ORDER BY day
"""


MARKOV_ATTR_CHANNELS = ("view", "click")
MARKOV_ATTR_ITERS = 25
_MICRO = 1_000_000


def _markov_attr_stages(div: str) -> tuple[list[list[tuple[str, str]]], str]:
    """Shared emitter for the Markov-attribution integer arithmetic.

    Returns ``(stages, n_conv_expr)``: each stage is a list of
    (column_name, expression_string) pairs computed simultaneously
    from the previous stage's columns, and BOTH engines evaluate the
    same strings verbatim — the Spark side via one ``withColumns``
    of ``F.expr`` per stage, the oracle via one chained CTE per
    stage — parameterized only by the integer-div token (Spark
    ``DIV``, DuckDB ``//``). Every iteration materializes its
    absorption values as columns (``a_<variant>_<ch>_<i>``) so the
    expression tree stays linear in the iteration count, and every
    product, sum, and truncating division happens in the same order
    with the same BIGINT semantics on both engines."""
    chans = MARKOV_ATTR_CHANNELS
    srcs = ("start",) + chans
    stages: list[list[tuple[str, str]]] = []
    probs = []
    for s in srcs:
        for d in chans + ("conv", "null"):
            probs.append((
                f"p_{s}_{d}",
                f"CASE WHEN tot_{s} > 0 THEN (n_{s}_{d} * {_MICRO})"
                f" {div} tot_{s} ELSE CAST(0 AS BIGINT) END"))
    stages.append(probs)
    for removed in (None,) + chans:
        tag = "full" if removed is None else f"no_{removed}"
        stages.append([(f"a_{tag}_{ch}_0", "CAST(0 AS BIGINT)")
                       for ch in chans])
        for i in range(1, MARKOV_ATTR_ITERS + 1):
            stage = []
            for ch in chans:
                if removed == ch:
                    stage.append((f"a_{tag}_{ch}_{i}",
                                  "CAST(0 AS BIGINT)"))
                    continue
                terms = " + ".join(
                    f"p_{ch}_{nx} * a_{tag}_{nx}_{i - 1}"
                    for nx in chans if removed != nx)
                stage.append((
                    f"a_{tag}_{ch}_{i}",
                    f"p_{ch}_conv + ({terms}) {div} {_MICRO}"))
            stages.append(stage)
        start_terms = " + ".join(
            f"p_start_{ch} * a_{tag}_{ch}_{MARKOV_ATTR_ITERS}"
            for ch in chans if removed != ch)
        stages.append([(
            f"p_{tag}",
            f"p_start_conv + ({start_terms}) {div} {_MICRO}"
            if start_terms else "p_start_conv")])
    stages.append([
        (f"re_{ch}",
         f"greatest(CAST(0 AS BIGINT), p_full - p_no_{ch})")
        for ch in chans])
    stages.append([("re_sum",
                    " + ".join(f"re_{ch}" for ch in chans))])
    n_conv = " + ".join(f"n_{s}_conv" for s in srcs)
    return stages, f"CAST({n_conv} AS BIGINT)"


def ev_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven Markov removal-effect attribution (Anderl et al.
    2016) — the model-based companion to ev_attribution's positional
    heuristics: user journeys (delimited by purchases; a trailing
    purchase-less suffix is a non-converting journey absorbed by the
    'null' state) become a first-order chain over transient states
    {start, view, click} with absorbing {conv, null}; a channel's
    credit is its REMOVAL EFFECT — how much the start→conv absorption
    probability drops when every edge into that channel is redirected
    to null — normalized across channels and scaled by the observed
    conversion count, so total Markov credit equals conversions.

    Determinism: transition probabilities live in integer micro-units
    (cnt·10⁶ DIV row-total); absorption is a 25-step value iteration
    a' = p(conv) + (Σ p(ch)·a_ch) DIV 10⁶ in pure BIGINT. Spark and
    the oracle evaluate the SAME generated expression strings
    (``_markov_attr_stages``), differing only in the integer-div
    token — bit-identical by construction, no float until the final
    readout division. The channel set is the same literal pair the
    heuristic model uses, so no driver-side collect exists.

    Scale shape (100 TB of events): ONE user-keyed window shuffle
    builds journey ids and lagged states; transition counting is a
    partial-agg groupBy on the tiny (src, dst) vocabulary; everything
    after — the pivot to one row and the staged iteration — is
    narrow arithmetic on a 1-row frame."""
    chans = MARKOV_ATTR_CHANNELS
    srcs = ("start",) + chans
    ev = (t(spark, sf_dir, "events")
          .filter(F.col("event_type").isin(*chans, "purchase"))
          .select("user_id", "ts", "event_id",
                  F.when(F.col("event_type") == "purchase", "conv")
                  .otherwise(F.col("event_type")).alias("state")))
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    jid = F.coalesce(
        F.sum(F.when(F.col("state") == "conv", 1).otherwise(0))
        .over(w_user.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0))
    rows = ev.withColumn("jid", jid)
    w_j = Window.partitionBy("user_id", "jid").orderBy("ts", "event_id")
    lagged = rows.withColumn(
        "src", F.coalesce(F.lag("state").over(w_j), F.lit("start")))
    t1 = lagged.select("src", F.col("state").alias("dst"))
    per_j = (rows.groupBy("user_id", "jid")
             .agg(F.max(F.when(F.col("state") == "conv", 1).otherwise(0))
                  .alias("has_conv"),
                  F.expr("max_by(state, struct(ts, event_id))")
                  .alias("last_state")))
    t2 = (per_j.filter(F.col("has_conv") == 0)
          .select(F.col("last_state").alias("src"),
                  F.lit("null").alias("dst")))
    counts = (t1.unionByName(t2)
              .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n")))
    aggs = []
    for s in srcs:
        for d in chans + ("conv", "null"):
            aggs.append(F.sum(F.when((F.col("src") == s)
                                     & (F.col("dst") == d),
                                     F.col("n")).otherwise(0))
                        .cast("long").alias(f"n_{s}_{d}"))
        aggs.append(F.sum(F.when(F.col("src") == s, F.col("n"))
                          .otherwise(0)).cast("long").alias(f"tot_{s}"))
    one = counts.agg(*aggs)
    stages, n_conv_expr = _markov_attr_stages("DIV")
    for stage in stages:
        one = one.withColumns({name: F.expr(expr)
                               for name, expr in stage})
    one = one.withColumn("n_conv", F.expr(n_conv_expr))
    slices = []
    for ch in chans:
        slices.append(one.select(
            F.lit(ch).alias("channel"),
            F.col("n_conv"),
            F.round(F.col("p_full") / _MICRO, 6).alias("p_conv_full"),
            F.round(F.col(f"p_no_{ch}") / _MICRO, 6)
            .alias("p_conv_removed"),
            F.round(F.col(f"re_{ch}") / _MICRO, 6)
            .alias("removal_effect"),
            F.round(F.when(F.col("re_sum") > 0,
                           F.col("n_conv") * F.col(f"re_{ch}")
                           / F.col("re_sum")).otherwise(0.0), 6)
            .alias("credit_markov")))
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    return out.orderBy("channel")


def _markov_attr_sql() -> str:
    chans = MARKOV_ATTR_CHANNELS
    srcs = ("start",) + chans
    piv = []
    for s in srcs:
        for d in chans + ("conv", "null"):
            piv.append(
                f"CAST(SUM(CASE WHEN src = '{s}' AND dst = '{d}' "
                f"THEN n ELSE 0 END) AS BIGINT) AS n_{s}_{d}")
        piv.append(f"CAST(SUM(CASE WHEN src = '{s}' THEN n ELSE 0 END)"
                   f" AS BIGINT) AS tot_{s}")
    stages, n_conv_expr = _markov_attr_stages("//")
    chain = []
    prev = "pivoted"
    for i, stage in enumerate(stages):
        cols = ", ".join(f"{expr} AS {name}" for name, expr in stage)
        chain.append(f"st{i} AS (SELECT *, {cols} FROM {prev})")
        prev = f"st{i}"
    chan_list = ", ".join(f"'{c}'" for c in chans)
    selects = " UNION ALL ".join(
        f"SELECT '{ch}' AS channel, n_conv, "
        f"round(p_full / {_MICRO}.0, 6) AS p_conv_full, "
        f"round(p_no_{ch} / {_MICRO}.0, 6) AS p_conv_removed, "
        f"round(re_{ch} / {_MICRO}.0, 6) AS removal_effect, "
        f"round(CASE WHEN re_sum > 0 THEN n_conv * re_{ch} "
        f"/ CAST(re_sum AS DOUBLE) ELSE 0.0 END, 6) AS credit_markov "
        f"FROM final" for ch in chans)
    return f"""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 'conv'
              ELSE event_type END AS state
  FROM events
  WHERE event_type IN ({chan_list}, 'purchase')
), j AS (
  SELECT user_id, ts, event_id, state,
         COALESCE(SUM(CASE WHEN state = 'conv' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS jid
  FROM ev
), lagged AS (
  SELECT COALESCE(lag(state) OVER (PARTITION BY user_id, jid
                                   ORDER BY ts, event_id),
                  'start') AS src,
         state AS dst
  FROM j
), per_j AS (
  SELECT user_id, jid,
         MAX(CASE WHEN state = 'conv' THEN 1 ELSE 0 END) AS has_conv
  FROM j GROUP BY user_id, jid
), last AS (
  SELECT user_id, jid, state AS last_state
  FROM (SELECT user_id, jid, state,
               row_number() OVER (PARTITION BY user_id, jid
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM j)
  WHERE rn = 1
), trans AS (
  SELECT src, dst FROM lagged
  UNION ALL
  SELECT l.last_state AS src, 'null' AS dst
  FROM per_j p JOIN last l
    ON l.user_id = p.user_id AND l.jid = p.jid
  WHERE p.has_conv = 0
), counts AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM trans GROUP BY src, dst
), pivoted AS (
  SELECT {', '.join(piv)} FROM counts
), {', '.join(chain)},
final AS (
  SELECT *, {n_conv_expr} AS n_conv FROM {prev}
)
{selects}
ORDER BY channel
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

SPARK_QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_segment_revenue": q3_segment_revenue,
    "q4_priority_semijoin": q4_priority_semijoin,
    "q5_nation_revenue": q5_nation_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q14_brand_share": q14_brand_share,
    "top3_customers_per_nation": top3_customers_per_nation,
    "ev_sessionize": ev_sessionize,
    "ev_daily_type_counts": ev_daily_type_counts,
    "ev_anomaly_daily": ev_anomaly_daily,
    "ev_hopping_counts": ev_hopping_counts,
    "ev_user_top2_by_value": ev_user_top2_by_value,
    "ev_props_json": ev_props_json,
    "ev_markov_transitions": ev_markov_transitions,
    "ev_top_paths": ev_top_paths,
    "ev_rfm_segments": ev_rfm_segments,
    "ev_markov_stationary": ev_markov_stationary,
    "ev_stickiness": ev_stickiness,
    "ev_experiment_cuped": ev_experiment_cuped,
    "ev_assoc_rules": ev_assoc_rules,
    "ev_attribution": ev_attribution,
    "ev_cohort_ltv": ev_cohort_ltv,
    "ev_experiment_srm": ev_experiment_srm,
    "ev_experiment_ci": ev_experiment_ci,
    "ev_next_event_eval": ev_next_event_eval,
    "ev_forecast_holt": ev_forecast_holt,
    "ev_survival_km": ev_survival_km,
    "ev_experiment_power": ev_experiment_power,
    "ev_changepoint_cusum": ev_changepoint_cusum,
    "ev_attribution_markov": ev_attribution_markov,
    "ev_gini_revenue": ev_gini_revenue,
    "docs_lang_stats": docs_lang_stats,
    "docs_token_count": docs_token_count,
    "docs_exact_dedup": docs_exact_dedup,
    "docs_quality_score": docs_quality_score,
    "docs_fingerprint": docs_fingerprint,
}

ORACLE_SQL = {
    "q1_pricing_summary": Q1_SQL,
    "q3_segment_revenue": Q3_SQL,
    "q4_priority_semijoin": Q4_SQL,
    "q5_nation_revenue": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q14_brand_share": Q14_SQL,
    "top3_customers_per_nation": TOP3_SQL,
    "ev_sessionize": EV_SESSION_SQL,
    "ev_daily_type_counts": EV_DAILY_SQL,
    "ev_anomaly_daily": EV_ANOMALY_SQL,
    "ev_hopping_counts": EV_HOPPING_SQL,
    "ev_user_top2_by_value": EV_TOP2_SQL,
    "ev_props_json": EV_PROPS_SQL,
    "ev_markov_transitions": EV_MARKOV_SQL,
    "ev_top_paths": EV_TOP_PATHS_SQL,
    "ev_rfm_segments": EV_RFM_SQL,
    "ev_markov_stationary": _markov_stationary_sql(),
    "ev_stickiness": EV_STICKINESS_SQL,
    "ev_experiment_cuped": EV_CUPED_SQL,
    "ev_assoc_rules": EV_ASSOC_SQL,
    "ev_attribution": EV_ATTRIBUTION_SQL,
    "ev_cohort_ltv": EV_COHORT_LTV_SQL,
    "ev_experiment_srm": EV_SRM_SQL,
    "ev_experiment_ci": EV_EXPERIMENT_CI_SQL,
    "ev_next_event_eval": EV_NEXT_EVENT_EVAL_SQL,
    "ev_forecast_holt": _holt_sql(),
    "ev_survival_km": EV_SURVIVAL_KM_SQL,
    "ev_experiment_power": _power_sql(),
    "ev_changepoint_cusum": _cusum_sql(),
    "ev_attribution_markov": _markov_attr_sql(),
    "ev_gini_revenue": _gini_sql(),
    "docs_lang_stats": DOCS_LANG_SQL,
    "docs_token_count": DOCS_TOKENS_SQL,
    "docs_exact_dedup": DOCS_DEDUP_SQL,
    "docs_quality_score": DOCS_QUALITY_SQL,
    "docs_fingerprint": DOCS_FP_SQL,
}
