"""Crawl-index export family: CDX(J) capture index + WAT metadata
records.

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
    pages = pages_from_documents(spark, sf_dir)
    canon = F.regexp_extract(_html_str(), CANONICAL_PAT, 1)
    out = pages.select(
        surt_key(canon).alias("surt_key"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("ts14"),
        F.col("url"),
        canon.alias("canonical_url"),
        F.lit("text/html").alias("mime"),
        F.lit(200).cast("int").alias("status"),
        F.md5("text").alias("content_digest"),
        F.octet_length("text").cast("long").alias("text_bytes"),
    )
    return (out.repartitionByRange(32, "surt_key", "ts14")
               .sortWithinPartitions("surt_key", "ts14"))


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
    pages = pages_from_documents(spark, sf_dir)
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


SPARK_QUERIES = {
    "pages_cdx_index": pages_cdx_index,
    "pages_wat_export": pages_wat_export,
}

ORACLE_SQL = {
    "pages_cdx_index": PAGES_CDX_INDEX_SQL,
    "pages_wat_export": PAGES_WAT_EXPORT_SQL,
}
