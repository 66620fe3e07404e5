"""Crawl-index export family: CDX(J) capture index, WAT metadata
records, WARC revisit-record election, and incremental cross-snapshot
index merge.

Common-Crawl-style pipelines publish three derived artifacts next to
the raw WARC captures: WET (plain-text conversions — pages_wet_export,
plans/webops.py), WAT (per-page metadata JSON records), and the CDX(J)
URL index (SURT-keyed, sorted, the lookup structure behind the index
server). The reference (CMDF/ocr) is a one-document service with none
of these (SURVEY.md §2.1 S1 fetches single presigned URLs); both
operators here are specified by the public formats:

  * CDX(J) — SURT (Sort-friendly URI Reordering Transform) key:
    host labels reversed and comma-joined, ``)`` separator, then the
    path; records sorted by (surt, timestamp) so a binary-searchable
    flat index falls out of the write. Timestamp is the capture time
    as yyyyMMddHHmmss.
  * WAT — one JSON metadata record per page: WARC envelope headers
    plus parsed HTML head metadata (title, canonical link, metas) and
    the outlink count.

Scale notes (100 TB):
  * pages_cdx_index is a narrow per-row JVM regexp map (canonical-link
    parse + SURT rewrite + digest) followed by ONE range exchange:
    ``repartitionByRange(surt_key)`` + ``sortWithinPartitions`` is
    exactly how a production CDX shard set is written (globally
    ordered across files, binary-searchable within each) — no global
    single-partition sort anywhere.
  * pages_wat_export is scan → project, zero shuffle: every field
    (title/canonical/robots/outlink count) comes from per-row JVM
    regexps over the page bytes, and the JSON record is a string
    build. Nothing crosses to Python except the deterministic html
    synthesis UDF that fabricates the fixture corpus itself.

Oracles: gen/wrap.py's page shell is closed-form in doc_id, so the
canonical URL, SURT key, robots directive, link inventory (17 hrefs:
6 nav + 1 ad + 2 sidebar + 5 footer + 1 mailto + 1 partner + 1
canonical <link>), and the md5 content digest are all SQL-derivable
from (doc_id, text) alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ocr_spark.plans.extract_queries import pages_from_documents
from ocr_spark.plans.webops import HREF_PAT, _html_str

CANONICAL_PAT = r'<link rel="canonical" href="([^"]*)">'
ROBOTS_PAT = r'<meta name="robots" content="([^"]*)">'
TITLE_PAT = r"<title>([^<]*)</title>"


def surt_key(url_col: Column) -> Column:
    """SURT-form sort key for a normalized http(s) URL, as one JVM
    expression tree: ``https://site3.example.com/doc/42`` →
    ``com,example,site3)/doc/42``. Scheme is dropped (SURT canonical
    form), host labels are reversed and comma-joined, the path is
    appended after ``)``."""
    host = F.lower(F.regexp_extract(url_col, r"^https?://([^/]+)", 1))
    path = F.regexp_extract(url_col, r"^https?://[^/]+(/.*)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, F.lit(")"), path)


def pages_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDXJ-style capture index over the crawl: one row per page keyed
    by the SURT of its canonical URL, carrying the capture timestamp
    (yyyyMMddHHmmss), mime, status, payload text digest and byte
    length — the flat index a CC-style index server binary-searches.

    The canonical URL is parsed from the page bytes (head
    ``<link rel="canonical">``), not trusted from the fetch log — the
    standard indexer choice. The single exchange is the range
    partitioning that gives the shard set its global (surt, ts)
    order; everything else is a narrow JVM map."""
    out = cdx_columns(pages_from_documents(spark, sf_dir))
    return (out.repartitionByRange(32, "surt_key", "ts14")
               .sortWithinPartitions("surt_key", "ts14"))


def cdx_columns(pages: DataFrame) -> DataFrame:
    """The CDX record build as a narrow column map over a pages frame
    (url, warc_ts, html, text) — shared verbatim by the batch index
    (pages_cdx_index) and the streaming sink
    (streaming/ingest.py::stream_cdx_index) so batch and incremental
    index records are byte-identical by construction."""
    canon = F.regexp_extract(_html_str(), CANONICAL_PAT, 1)
    return pages.select(
        surt_key(canon).alias("surt_key"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("ts14"),
        F.col("url"),
        canon.alias("canonical_url"),
        F.lit("text/html").alias("mime"),
        F.lit(200).cast("int").alias("status"),
        F.md5("text").alias("content_digest"),
        F.octet_length("text").cast("long").alias("text_bytes"),
    )


PAGES_CDX_INDEX_SQL = """
SELECT 'com,example,site' || CAST(doc_id % 13 AS VARCHAR)
         || ')/doc/' || CAST(doc_id AS VARCHAR) AS surt_key,
       '20250101000000' AS ts14,
       'doc://' || CAST(doc_id AS VARCHAR) AS url,
       'https://site' || CAST(doc_id % 13 AS VARCHAR)
         || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
         AS canonical_url,
       'text/html' AS mime,
       CAST(200 AS INT) AS status,
       md5(text) AS content_digest,
       CAST(strlen(text) AS BIGINT) AS text_bytes
FROM documents
"""


def pages_wat_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT-style metadata record export: per page, a JSON envelope of
    the WARC headers plus parsed head metadata (title, canonical link,
    robots meta) and the outlink count — the companion artifact to the
    WET conversion records (pages_wet_export). Zero shuffle; the JSON
    is a deterministic string build (manual concat, not to_json) so
    byte equality holds cross-engine."""
    return wat_columns(pages_from_documents(spark, sf_dir))


def wat_columns(pages: DataFrame) -> DataFrame:
    """The WAT record build as a narrow column map over a pages frame
    (url, html) — shared verbatim by the batch export and the
    streaming sink (streaming/ingest.py::stream_wat_export) so batch
    and incremental WAT records are byte-identical by construction."""
    html = _html_str()
    title = F.regexp_extract(html, TITLE_PAT, 1)
    canon = F.regexp_extract(html, CANONICAL_PAT, 1)
    robots = F.regexp_extract(html, ROBOTS_PAT, 1)
    n_links = F.size(F.regexp_extract_all(html, F.lit(HREF_PAT), 1))
    record = F.concat(
        F.lit('{"Envelope":{"WARC-Header-Metadata":'
              '{"WARC-Target-URI":"'), F.col("url"),
        F.lit('","WARC-Date":"2025-01-01T00:00:00Z",'
              '"WARC-Type":"metadata"},'
              '"Payload-Metadata":{"HTML-Metadata":{"Head":'
              '{"Title":"'), title,
        F.lit('","Link":"'), canon,
        F.lit('","Metas":[{"name":"robots","content":"'), robots,
        F.lit('"}]},"Links":'), n_links.cast("string"),
        F.lit("}}}}"))
    return pages.select(
        "url",
        canon.alias("canonical_url"),
        robots.alias("robots"),
        n_links.cast("int").alias("n_links"),
        record.alias("wat_record"),
    )


PAGES_WAT_EXPORT_SQL = """
WITH meta AS (
  SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
         'https://site' || CAST(doc_id % 13 AS VARCHAR)
           || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
           AS canonical_url,
         CASE WHEN doc_id % 17 = 3 THEN 'noindex,nofollow'
              ELSE 'index,follow' END AS robots,
         CAST(17 AS INT) AS n_links
  FROM documents
)
SELECT url, canonical_url, robots, n_links,
       '{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"'
       || url
       || '","WARC-Date":"2025-01-01T00:00:00Z","WARC-Type":"metadata"},'
       || '"Payload-Metadata":{"HTML-Metadata":{"Head":{"Title":"t'
       || '","Link":"' || canonical_url
       || '","Metas":[{"name":"robots","content":"' || robots
       || '"}]},"Links":' || CAST(n_links AS VARCHAR)
       || '}}}}' AS wat_record
FROM meta
"""


# ---------------------------------------------------------------------------
# WARC revisit records (capture-log storage dedup)
# ---------------------------------------------------------------------------

_CANON_URL = (
    "'https://site' || CAST(doc_id % 13 AS VARCHAR)"
    " || '.example.com/doc/' || CAST(doc_id AS VARCHAR)"
)


def _canon_url_col() -> Column:
    return F.concat(
        F.lit("https://site"), (F.col("doc_id") % 13).cast("string"),
        F.lit(".example.com/doc/"), F.col("doc_id").cast("string"))


def _capture_log(docs: DataFrame) -> DataFrame:
    """Deterministic multi-capture crawl log (url, ts14, digest) —
    one scan, narrow conditional-array explode. Every doc captured at
    2025-01-01; ``doc_id % 5 == 0`` re-crawled UNCHANGED at
    2025-02-01; ``doc_id % 7 == 0`` re-crawled EDITED at 2025-03-01.
    Shared by pages_revisit_records and pages_recrawl_priority; the
    oracles regenerate it closed-form (``_CAPS_CTE``)."""
    cap = lambda ts, content: F.struct(  # noqa: E731
        F.lit(ts).alias("ts14"), content.alias("content"))
    caps = F.filter(F.array(
        cap("20250101000000", F.col("text")),
        F.when((F.col("doc_id") % 5) == 0,
               cap("20250201000000", F.col("text"))),
        F.when((F.col("doc_id") % 7) == 0,
               cap("20250301000000",
                   F.concat(F.col("text"), F.lit(" [updated]")))),
    ), lambda s: s.isNotNull())
    return docs.select(
        _canon_url_col().alias("url"), F.explode(caps).alias("c"),
    ).select("url", F.col("c.ts14").alias("ts14"),
             F.md5("c.content").alias("digest"))


_CAPS_CTE = f"""
caps AS (
  SELECT {_CANON_URL} AS url, '20250101000000' AS ts14,
         md5(text) AS digest
  FROM documents
  UNION ALL
  SELECT {_CANON_URL}, '20250201000000', md5(text)
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT {_CANON_URL}, '20250301000000', md5(text || ' [updated]')
  FROM documents WHERE doc_id % 7 = 0
)
"""


def pages_revisit_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC-style revisit-record election over a multi-capture crawl
    log: the first capture of each payload digest is stored as a full
    ``response`` record; every later capture with the SAME digest
    becomes a ``revisit`` record that references the original capture
    (url + timestamp) instead of storing the payload again — the
    standard WARC/1.1 identical-payload-digest dedup every archive
    crawler (Heritrix, CC) runs at fetch time. The reference processes
    one presigned document per request and has no capture history
    (SURVEY.md §2.1 S1).

    Fixture (closed-form in doc_id, mirrored by the oracle): every doc
    is captured at 2025-01-01; docs with ``doc_id % 5 == 0`` are
    re-crawled unchanged at 2025-02-01 (→ revisit); docs with
    ``doc_id % 7 == 0`` are re-crawled EDITED at 2025-03-01 (new
    digest → a fresh response record, not a revisit).

    Scale shape: the capture multiplication is a per-row
    conditional-array explode (narrow, single scan — no self-union
    re-scans); the election is ONE shuffle keyed on digest
    (row_number + first_value over the same window). Payload bytes
    never move — only (url, ts, digest)."""
    exploded = _capture_log(spark.read.parquet(
        f"{sf_dir}/documents.parquet"))
    w = Window.partitionBy("digest").orderBy("ts14", "url")
    rn = F.row_number().over(w)
    return exploded.select(
        "url", "ts14", "digest",
        F.when(rn == 1, F.lit("response"))
         .otherwise(F.lit("revisit")).alias("record_type"),
        F.when(rn == 1, F.lit(None).cast("string"))
         .otherwise(F.first("url").over(w)).alias("refers_to_url"),
        F.when(rn == 1, F.lit(None).cast("string"))
         .otherwise(F.first("ts14").over(w)).alias("refers_to_ts14"),
    )


PAGES_REVISIT_RECORDS_SQL = f"""
WITH {_CAPS_CTE.strip()}, ranked AS (
  SELECT url, ts14, digest,
         row_number()  OVER w AS rn,
         first_value(url)  OVER w AS f_url,
         first_value(ts14) OVER w AS f_ts
  FROM caps
  WINDOW w AS (PARTITION BY digest ORDER BY ts14, url)
)
SELECT url, ts14, digest,
       CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END AS record_type,
       CASE WHEN rn = 1 THEN NULL ELSE f_url END AS refers_to_url,
       CASE WHEN rn = 1 THEN NULL ELSE f_ts END AS refers_to_ts14
FROM ranked
"""


def pages_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build over the capture log:
    the warehouse-maintenance operator that turns an append-only crawl
    log into a queryable page-version history (Kimball SCD2 — the
    declarative equivalent of an iterative MERGE INTO). A new VERSION
    opens exactly when the payload digest differs from the previous
    capture of the same url; unchanged re-crawls collapse into the
    open version (their count is kept as ``n_captures``). Each version
    carries ``[valid_from, valid_to)`` with ``valid_to = NULL`` /
    ``is_current = true`` on the newest — so "the page as of ts" is a
    range predicate, not a log scan.

    The shared cohorts exercise every path: unchanged re-crawls
    (doc_id % 5) collapse, edits (doc_id % 7) open version 2, and
    doc_id % 35 does both in one history.

    Scale shape (10^12-capture log): ONE shuffle keyed url — the
    change-flag window, the version groupBy (url, version), and the
    valid_to lead window all share hashpartitioning(url)
    (ClusteredDistribution(url, version) is satisfied by the url
    exchange, pinned in test_plans), and payload bytes never move —
    the log carries only (url, ts14, digest)."""
    caps = _capture_log(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    w = Window.partitionBy("url").orderBy("ts14")
    changed = (F.lag("digest").over(w).isNull()
               | (F.lag("digest").over(w) != F.col("digest")))
    versioned = caps.select(
        "url", "ts14", "digest",
        F.sum(changed.cast("int")).over(w).alias("version"))
    spans = (versioned
             .groupBy("url", "version", "digest")
             .agg(F.min("ts14").alias("valid_from"),
                  F.count(F.lit(1)).alias("n_captures")))
    wv = Window.partitionBy("url").orderBy("version")
    valid_to = F.lead("valid_from").over(wv)
    return spans.select(
        "url", F.col("version").cast("int").alias("version"), "digest",
        "valid_from", valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        F.col("n_captures").cast("long").alias("n_captures"))


PAGES_SCD2_HISTORY_SQL = f"""
WITH {_CAPS_CTE.strip()}, flagged AS (
  SELECT url, ts14, digest,
         CASE WHEN lag(digest) OVER w IS NULL
                OR lag(digest) OVER w <> digest THEN 1 ELSE 0 END AS chg
  FROM caps
  WINDOW w AS (PARTITION BY url ORDER BY ts14)
), versioned AS (
  SELECT url, ts14, digest,
         SUM(chg) OVER (PARTITION BY url ORDER BY ts14) AS version
  FROM flagged
), spans AS (
  SELECT url, version, digest, MIN(ts14) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_captures
  FROM versioned GROUP BY url, version, digest
)
SELECT url, CAST(version AS INT) AS version, digest, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       lead(valid_from) OVER w2 IS NULL AS is_current,
       n_captures
FROM spans
WINDOW w2 AS (PARTITION BY url ORDER BY version)
"""


# ---------------------------------------------------------------------------
# adaptive recrawl priority (change-rate estimation)
# ---------------------------------------------------------------------------


def pages_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive recrawl scheduling over the capture log: per URL,
    count observed capture intervals and content CHANGES (digest
    differs from the previous capture), and estimate the change rate
    with the smoothed Cho & Garcia-Molina (TOIT 2003) frequency
    estimator ``λ̂ = -ln((n - X + 0.5) / (n + 0.5))`` (n intervals, X
    changed) — the signal a crawl scheduler uses to put volatile pages
    on a fast revisit cadence and static pages on a slow one. Bucket:
    ``unknown`` with no interval observed, ``fast`` at change_rate
    ≥ 0.5, ``medium`` above 0, else ``slow``. The one-document
    reference has no capture history (SURVEY.md §2.1 S1).

    Scale shape: the change flag is a lag window keyed url; the rollup
    is a groupBy on the SAME key, so the window's exchange satisfies
    the aggregate's distribution — ONE shuffle total, pinned by
    test_recrawl_priority_single_url_exchange."""
    caps = _capture_log(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    w = Window.partitionBy("url").orderBy("ts14")
    prev = F.lag("digest").over(w)
    flagged = caps.select(
        "url",
        prev.isNotNull().cast("long").alias("is_interval"),
        (prev.isNotNull() & (F.col("digest") != prev))
        .cast("long").alias("is_change"))
    n = F.sum("is_interval").cast("long")
    x = F.sum("is_change").cast("long")
    agg = (flagged.groupBy("url")
           .agg(F.count(F.lit(1)).cast("long").alias("n_captures"),
                n.alias("n_intervals"), x.alias("n_changes")))
    rate = F.when(F.col("n_intervals") > 0,
                  F.col("n_changes") / F.col("n_intervals"))
    # ln(b/a), not -ln(a/b): the negated form yields IEEE -0.0 for a
    # never-changing page and 0.0 on the other engine — hash mismatch
    lam = F.when(
        F.col("n_intervals") > 0,
        F.log((F.col("n_intervals") + 0.5)
              / (F.col("n_intervals") - F.col("n_changes") + 0.5)))
    return agg.select(
        "url", "n_captures", "n_intervals", "n_changes",
        F.round(rate, 6).alias("change_rate"),
        F.round(lam, 6).alias("lambda_hat"),
        F.when(F.col("n_intervals") == 0, F.lit("unknown"))
         .when(rate >= 0.5, F.lit("fast"))
         .when(rate > 0, F.lit("medium"))
         .otherwise(F.lit("slow")).alias("recrawl_bucket"))


PAGES_RECRAWL_PRIORITY_SQL = f"""
WITH {_CAPS_CTE.strip()}, flagged AS (
  SELECT url,
         CASE WHEN lag(digest) OVER w IS NULL THEN 0 ELSE 1 END
           AS is_interval,
         CASE WHEN lag(digest) OVER w IS NOT NULL
                   AND digest <> lag(digest) OVER w THEN 1 ELSE 0 END
           AS is_change
  FROM caps
  WINDOW w AS (PARTITION BY url ORDER BY ts14)
), agg AS (
  SELECT url, CAST(COUNT(*) AS BIGINT) AS n_captures,
         CAST(SUM(is_interval) AS BIGINT) AS n_intervals,
         CAST(SUM(is_change) AS BIGINT) AS n_changes
  FROM flagged GROUP BY url
)
SELECT url, n_captures, n_intervals, n_changes,
       round(CASE WHEN n_intervals > 0
                  THEN n_changes / CAST(n_intervals AS DOUBLE) END, 6)
         AS change_rate,
       round(CASE WHEN n_intervals > 0
                  THEN ln((n_intervals + 0.5)
                          / (n_intervals - n_changes + 0.5)) END, 6)
         AS lambda_hat,
       CASE WHEN n_intervals = 0 THEN 'unknown'
            WHEN n_changes / CAST(n_intervals AS DOUBLE) >= 0.5 THEN 'fast'
            WHEN n_changes / CAST(n_intervals AS DOUBLE) > 0 THEN 'medium'
            ELSE 'slow' END AS recrawl_bucket
FROM agg
"""


# ---------------------------------------------------------------------------
# Incremental CDX merge across crawl snapshots
# ---------------------------------------------------------------------------


def pages_cdx_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental capture-index maintenance: merge a NEW crawl
    snapshot's CDX records into the prior index, suppressing identical
    recrawls — a new capture whose (surt_key, digest) already exists
    in the prior index stores nothing new (the fetch became a revisit
    record; see pages_revisit_records) so it does not get an index
    row. Changed pages append a second capture under the same SURT
    key, which is exactly how the CC index accumulates history.

    Fixture: the prior snapshot indexes every doc at 2025-01-01;
    the new snapshot (2025-04-01) re-crawls ``doc_id % 3 == 0``, of
    which ``doc_id % 6 == 0`` changed content (text || ' v2') and the
    rest came back byte-identical (→ suppressed).

    Scale shape: the suppression is a left-anti sort-merge join keyed
    (surt_key, digest) — the new snapshot is the small side of an
    anti-join against the prior index's (key, digest) projection, not
    the raw pages; the merged set then takes ONE range exchange on
    (surt_key, ts14) to restore the global shard order. With the
    prior index stored bucketed by surt_key both exchanges on the big
    side disappear; stated here rather than simulated because the
    fixture reads plain parquet."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = _canon_url_col()
    prior = docs.select(
        surt_key(url).alias("surt_key"),
        F.lit("20250101000000").alias("ts14"),
        url.alias("url"), F.md5("text").alias("digest"),
        F.lit("prior").alias("snapshot"))
    recrawl = docs.filter((F.col("doc_id") % 3) == 0)
    new = recrawl.select(
        surt_key(url).alias("surt_key"),
        F.lit("20250401000000").alias("ts14"),
        url.alias("url"),
        F.md5(F.when((F.col("doc_id") % 6) == 0,
                     F.concat(F.col("text"), F.lit(" v2")))
               .otherwise(F.col("text"))).alias("digest"),
        F.lit("new").alias("snapshot"))
    kept_new = new.join(prior.select("surt_key", "digest"),
                        ["surt_key", "digest"], "left_anti")
    merged = prior.unionByName(kept_new)
    return (merged.repartitionByRange(32, "surt_key", "ts14")
                  .sortWithinPartitions("surt_key", "ts14"))


PAGES_CDX_MERGE_SQL = f"""
WITH prior AS (
  SELECT 'com,example,site' || CAST(doc_id % 13 AS VARCHAR)
           || ')/doc/' || CAST(doc_id AS VARCHAR) AS surt_key,
         '20250101000000' AS ts14, {_CANON_URL} AS url,
         md5(text) AS digest, 'prior' AS snapshot
  FROM documents
), new AS (
  SELECT 'com,example,site' || CAST(doc_id % 13 AS VARCHAR)
           || ')/doc/' || CAST(doc_id AS VARCHAR) AS surt_key,
         '20250401000000' AS ts14, {_CANON_URL} AS url,
         md5(CASE WHEN doc_id % 6 = 0 THEN text || ' v2'
                  ELSE text END) AS digest,
         'new' AS snapshot
  FROM documents WHERE doc_id % 3 = 0
)
SELECT * FROM prior
UNION ALL
SELECT * FROM new n
WHERE NOT EXISTS (SELECT 1 FROM prior p
                  WHERE p.surt_key = n.surt_key
                    AND p.digest = n.digest)
"""


# ---------------------------------------------------------------------------
# recrawl content-delta estimation
# ---------------------------------------------------------------------------

DELTA_SHINGLE_W = 3     # token shingle width for the change estimate
DELTA_MINOR_JAC = 0.5   # >= this Jaccard: a minor edit, not a rewrite


def pages_recrawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl content-delta estimation: for every consecutive capture
    pair of the same URL, the exact token-3-gram Jaccard between the
    two payloads, classified identical (digest match) / minor_edit
    (Jaccard >= DELTA_MINOR_JAC) / rewrite. pages_recrawl_priority
    schedules from the binary changed/unchanged digest signal; this
    operator grades HOW MUCH changed — the input a crawler needs to
    distinguish a timestamp-only template tick from a genuine rewrite
    before spending re-extraction and re-dedup on the capture.

    The capture log extends the shared _capture_log cohorts with a
    modeled REWRITE class (doc_id % 11 == 3 re-crawled at 2025-04-01
    with token order reversed: same unigrams, disjoint 3-grams — a
    worst case the digest alone cannot grade), so all three classes
    exist in the fixture.

    Scale shape: capture multiplication is the same narrow
    conditional-array explode as the siblings; shingling is per-row;
    the ONE shuffle keys captures by url for the lag window. Payload
    text crosses the exchange once — the honest price of an exact
    delta; the MinHash families are the cheap approximate path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rev = F.array_join(
        F.reverse(F.split(F.trim(F.col("text")), r"\s+")), " ")
    cap = lambda ts, content: F.struct(  # noqa: E731
        F.lit(ts).alias("ts14"), content.alias("content"))
    caps = F.filter(F.array(
        cap("20250101000000", F.col("text")),
        F.when((F.col("doc_id") % 5) == 0,
               cap("20250201000000", F.col("text"))),
        F.when((F.col("doc_id") % 7) == 0,
               cap("20250301000000",
                   F.concat(F.col("text"), F.lit(" [updated]")))),
        F.when((F.col("doc_id") % 11) == 3, cap("20250401000000", rev)),
    ), lambda st: st.isNotNull())
    toks = F.split(F.lower(F.trim(F.col("content"))), r"\s+")
    sh = F.when(
        F.size(toks) >= DELTA_SHINGLE_W,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(toks) - DELTA_SHINGLE_W),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i + 1, DELTA_SHINGLE_W)))),
    ).otherwise(F.array().cast("array<string>"))
    capf = (docs.select(_canon_url_col().alias("url"),
                        F.explode(caps).alias("c"))
            .select("url", F.col("c.ts14").alias("ts14"),
                    F.md5("c.content").alias("digest"),
                    F.col("c.content").alias("content"))
            .select("url", "ts14", "digest", sh.alias("sh")))
    w = Window.partitionBy("url").orderBy("ts14")
    prev_sh = F.lag("sh").over(w)
    paired = capf.select(
        "url", F.lag("ts14").over(w).alias("prev_ts14"), "ts14",
        (F.lag("digest").over(w) == F.col("digest")).alias("identical"),
        F.size(F.array_intersect("sh", prev_sh)).alias("n_inter"),
        F.size(F.array_union("sh", prev_sh)).alias("n_union"),
    ).filter(F.col("prev_ts14").isNotNull())
    jac = F.when(F.col("n_union") > 0,
                 F.round(F.col("n_inter") / F.col("n_union"), 4)) \
           .otherwise(F.lit(1.0))
    return paired.select(
        "url", "prev_ts14", "ts14", "identical",
        jac.alias("jaccard"),
        F.when(F.col("identical"), F.lit("identical"))
         .when(jac >= DELTA_MINOR_JAC, F.lit("minor_edit"))
         .otherwise(F.lit("rewrite")).alias("change_class"))


PAGES_RECRAWL_DELTA_SQL = f"""
WITH caps AS (
  SELECT {_CANON_URL} AS url, '20250101000000' AS ts14, text AS content
  FROM documents
  UNION ALL
  SELECT {_CANON_URL}, '20250201000000', text
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT {_CANON_URL}, '20250301000000', text || ' [updated]'
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT {_CANON_URL}, '20250401000000',
         array_to_string(list_reverse(
             string_split_regex(trim(text), '\\s+')), ' ')
  FROM documents WHERE doc_id % 11 = 3
), shing AS (
  SELECT url, ts14, md5(content) AS digest,
         CASE WHEN len(t) >= {DELTA_SHINGLE_W}
              THEN list_distinct(list_transform(
                  range(1, len(t) - {DELTA_SHINGLE_W - 2}),
                  i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
              ELSE [] END AS sh
  FROM (SELECT url, ts14, content,
               string_split_regex(lower(trim(content)), '\\s+') AS t
        FROM caps)
), paired AS (
  SELECT url,
         lag(ts14) OVER w AS prev_ts14, ts14,
         lag(digest) OVER w = digest AS identical,
         len(list_filter(sh,
             x -> list_contains(lag(sh) OVER w, x))) AS n_inter,
         len(list_distinct(list_concat(sh, lag(sh) OVER w))) AS n_union
  FROM shing
  WINDOW w AS (PARTITION BY url ORDER BY ts14)
)
SELECT url, prev_ts14, ts14, identical,
       CASE WHEN n_union > 0
            THEN round(n_inter / CAST(n_union AS DOUBLE), 4)
            ELSE 1.0 END AS jaccard,
       CASE WHEN identical THEN 'identical'
            WHEN (CASE WHEN n_union > 0
                       THEN round(n_inter / CAST(n_union AS DOUBLE), 4)
                       ELSE 1.0 END) >= {DELTA_MINOR_JAC}
            THEN 'minor_edit'
            ELSE 'rewrite' END AS change_class
FROM paired WHERE prev_ts14 IS NOT NULL
"""


SPARK_QUERIES = {
    "pages_cdx_index": pages_cdx_index,
    "pages_wat_export": pages_wat_export,
    "pages_revisit_records": pages_revisit_records,
    "pages_cdx_merge": pages_cdx_merge,
    "pages_recrawl_priority": pages_recrawl_priority,
    "pages_recrawl_delta": pages_recrawl_delta,
    "pages_scd2_history": pages_scd2_history,
}

ORACLE_SQL = {
    "pages_cdx_index": PAGES_CDX_INDEX_SQL,
    "pages_wat_export": PAGES_WAT_EXPORT_SQL,
    "pages_revisit_records": PAGES_REVISIT_RECORDS_SQL,
    "pages_cdx_merge": PAGES_CDX_MERGE_SQL,
    "pages_recrawl_priority": PAGES_RECRAWL_PRIORITY_SQL,
    "pages_recrawl_delta": PAGES_RECRAWL_DELTA_SQL,
    "pages_scd2_history": PAGES_SCD2_HISTORY_SQL,
}
