"""Raw-page structural features + wrapper byte-parity.

Two extraction-tier queries over the RAW page bytes (the same
``pages_from_documents`` frame the flagship extraction job consumes):

``pages_wrap_digest``
    md5 + byte length of every wrapped page, oracle-checked against a
    FULL ANSI-SQL reconstruction of ``gen/wrap.py::html_for_document``
    from ``(doc_id, text)`` alone.  This pins the entire deterministic
    page generator byte-for-byte — every nav/footer/ad/PII/canonical/
    robots fragment and the html-escape of the document text — so any
    drift between the corpus generator and the oracles' ``_BLOCKS_CTE``
    family is caught at the source, not downstream.

``pages_html_features``
    The classic boilerplate-detection DOM heuristics (the
    text-density / link-density family the main-content extractor's
    container scoring is built on — see core/html_extract.py, and the
    reference's block-level filtering in service/core/pre.py) exposed
    as a per-page QA feature table: html bytes/chars, visible text
    chars after tag stripping, anchor count, anchor-text chars,
    list-item and paragraph counts, text density (visible/html) and
    link density (anchor-text/visible).  A 100 TB crawl uses exactly
    this table to route pages (boilerplate-heavy link farms vs
    content pages) *before* paying for full extraction.

Scale shape: both queries are pure narrow maps — JVM ``regexp_*`` over
the decoded page string, zero Python in the loop, zero shuffles at any
corpus size; the features stay inside whole-stage codegen.  The only
pandas UDF in the plan is the corpus generator itself
(``pages_from_documents``), which a real deployment replaces with the
Iceberg scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_spark.plans.extract_queries import pages_from_documents

_NAV_WORDS = ("home", "about", "products", "pricing", "blog", "careers")
_FOOT_WORDS = ("privacy", "terms", "contact", "sitemap", "subscribe")

FEAT_ROUND = 6


# ---------------------------------------------------------------------------
# the SQL mirror of gen/wrap.py::html_for_document
# ---------------------------------------------------------------------------

def _esc(expr: str) -> str:
    """ANSI-SQL mirror of html.escape(s, quote=True) — same replacement
    order (& first, then < > \" ')."""
    return (
        "replace(replace(replace(replace(replace(" + expr
        + ", '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),"
        + " '\"', '&quot;'), chr(39), '&#x27;')"
    )


def _build_html_cte() -> str:
    sid = "CAST(doc_id AS VARCHAR)"
    s3 = "CAST(doc_id % 3 AS VARCHAR)"
    s5 = "CAST(doc_id % 5 AS VARCHAR)"
    s7 = "CAST(doc_id % 7 AS VARCHAR)"
    s11 = "CAST(doc_id % 11 AS VARCHAR)"
    s13 = "CAST(doc_id % 13 AS VARCHAR)"
    s50 = "CAST(doc_id % 50 AS VARCHAR)"
    s9a = "CAST((doc_id + 1) % 9 AS VARCHAR)"
    s9b = "CAST((doc_id + 2) % 9 AS VARCHAR)"

    nav = " || ".join(
        "'<li><a href=\"/" + w + "' || " + s7 + " || '\">" + w
        + "</a></li>'"
        for w in _NAV_WORDS)
    foot = " || ' ' || ".join(
        "'<a href=\"/" + w + "\">" + w + " ' || " + s5 + " || '</a>'"
        for w in _FOOT_WORDS)
    email = "'contact' || " + s50 + " || '@example' || " + s7 + " || '.com'"
    phone = "'555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')"
    partner = ("'https://partner' || (CASE WHEN doc_id % 13 = 11 THEN '2'"
               " ELSE " + s5 + " END) || '.example.org/p/' || " + s13)
    canonical = ("'https://site' || " + s13
                 + " || '.example.com/doc/' || " + sid)
    robots = ("CASE WHEN doc_id % 17 = 3 THEN 'noindex,nofollow'"
              " ELSE 'index,follow' END")

    article = (
        "'<h1>Document ' || " + sid + " || ' Report</h1>'"
        " || CASE WHEN doc_id % 3 = 0 THEN '<h2>Section ' || " + s7
        + " || ' overview and summary</h2>' ELSE '' END"
        " || '<p>' || " + _esc("text") + " || '</p>'"
        " || CASE WHEN doc_id % 2 = 0 THEN"
        " '<p>This is the closing paragraph of document ' || " + sid
        + " || ' in the corpus.</p>' ELSE '' END"
        " || CASE WHEN doc_id % 4 = 1 THEN"
        " '<p>All material on this site is provided for general"
        " information only. Reproduction of variant ' || " + s3
        + " || ' content requires prior written permission. The publisher"
        " accepts no liability for errors or omissions in this text."
        " Nothing here constitutes professional advice of any kind.</p>'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 5 = 2 THEN"
        " '<ul><li>• Point 1 of document ' || " + sid
        + " || ' in the series covering topic ' || " + s9a
        + " || '.</li><li>• Point 2 of document ' || " + sid
        + " || ' in the series covering topic ' || " + s9b
        + " || '.</li><li>• Point 3 of document ' || " + sid
        + " || ' continues with more detail on the topic ...</li></ul>'"
        " ELSE '' END"
    )

    body = (
        "'<nav class=\"navbar\"><ul>' || " + nav + " || '</ul></nav>'"
        " || '<header class=\"masthead\"><span>site ' || " + s13
        + " || '</span></header>'"
        " || '<div class=\"ad-banner\"><a href=\"/ad' || " + s11
        + " || '\">buy now today</a></div>'"
        " || '<main><article>' || " + article + " || '</article></main>'"
        " || '<aside class=\"sidebar\"><ul>"
        "<li><a href=\"/r1\">related one</a></li>"
        "<li><a href=\"/r2\">related two</a></li></ul></aside>'"
        " || '<footer><div>' || " + foot + " || '</div>'"
        " || '<div class=\"contact-line\">Contact <a href=\"mailto:'"
        " || " + email + " || '\">' || " + email
        + " || '</a> or call ' || " + phone
        + " || '. <a href=\"' || " + partner
        + " || '\">partner site</a></div></footer>'"
    )

    page = (
        "'<!DOCTYPE html><html><head><title>t</title>"
        "<link rel=\"canonical\" href=\"' || " + canonical + " || '\">"
        "<meta name=\"robots\" content=\"' || " + robots + " || '\">"
        "<script>var x=1;</script><style>.a{}</style></head><body>'"
        " || " + body + " || '</body></html>'"
    )

    return (
        "WITH page AS (\n"
        "  SELECT doc_id, 'doc://' || " + sid + " AS url,\n"
        "         " + page + " AS html_str\n"
        "  FROM documents\n)\n"
    )


_HTML_CTE = _build_html_cte()


# ---------------------------------------------------------------------------
# pages_wrap_digest
# ---------------------------------------------------------------------------

def pages_wrap_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 + byte length of every wrapped page, vs the SQL
    reconstruction — the generator byte-parity pin."""
    pages = pages_from_documents(spark, sf_dir)
    return pages.select(
        "url",
        F.md5("html").alias("html_md5"),
        F.length("html").cast("long").alias("html_bytes"),
    )


PAGES_WRAP_DIGEST_SQL = _HTML_CTE + """
SELECT url, md5(html_str) AS html_md5,
       CAST(octet_length(encode(html_str)) AS BIGINT) AS html_bytes
FROM page
"""


# ---------------------------------------------------------------------------
# pages_html_features
# ---------------------------------------------------------------------------

_SCRIPT_STYLE = r"(?s)<script.*?</script>|<style.*?</style>"
_TAG = r"<[^>]*>"
_ANCHOR_TEXT = r"<a [^>]*>([^<]*)</a>"


def pages_html_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page boilerplate-heuristic features from the raw bytes."""
    pages = pages_from_documents(spark, sf_dir)
    h = F.decode(F.col("html"), "UTF-8")
    visible = F.regexp_replace(F.regexp_replace(h, _SCRIPT_STYLE, ""),
                               _TAG, "")
    atexts = F.regexp_extract_all(h, F.lit(_ANCHOR_TEXT), 1)
    anchor_chars = F.aggregate(
        atexts, F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x))
    base = pages.select(
        "url",
        F.length("html").cast("long").alias("html_bytes"),
        F.length(h).cast("long").alias("html_chars"),
        F.length(visible).cast("long").alias("visible_chars"),
        F.size(F.regexp_extract_all(h, F.lit("<a "), 0))
            .cast("long").alias("n_anchors"),
        anchor_chars.alias("anchor_chars"),
        F.size(F.regexp_extract_all(h, F.lit("<li>"), 0))
            .cast("long").alias("n_list_items"),
        F.size(F.regexp_extract_all(h, F.lit("<p>"), 0))
            .cast("long").alias("n_paragraphs"),
    )
    return base.select(
        "*",
        F.round(F.col("visible_chars")
                / F.greatest(F.col("html_chars"), F.lit(1)),
                FEAT_ROUND).alias("text_density"),
        F.round(F.col("anchor_chars")
                / F.greatest(F.col("visible_chars"), F.lit(1)),
                FEAT_ROUND).alias("link_density"),
    )


PAGES_HTML_FEATURES_SQL = _HTML_CTE + f"""
, feat AS (
  SELECT url,
         html_str,
         regexp_replace(regexp_replace(html_str,
             '{_SCRIPT_STYLE}', '', 'g'), '{_TAG}', '', 'g') AS visible,
         regexp_extract_all(html_str, '{_ANCHOR_TEXT}', 1) AS atexts
  FROM page
)
SELECT url,
       CAST(octet_length(encode(html_str)) AS BIGINT) AS html_bytes,
       CAST(length(html_str) AS BIGINT) AS html_chars,
       CAST(length(visible) AS BIGINT) AS visible_chars,
       CAST(len(regexp_extract_all(html_str, '<a ')) AS BIGINT)
         AS n_anchors,
       CAST(COALESCE(list_sum(list_transform(atexts, x -> length(x))), 0)
            AS BIGINT) AS anchor_chars,
       CAST(len(regexp_extract_all(html_str, '<li>')) AS BIGINT)
         AS n_list_items,
       CAST(len(regexp_extract_all(html_str, '<p>')) AS BIGINT)
         AS n_paragraphs,
       round(length(visible)
             / CAST(GREATEST(length(html_str), 1) AS DOUBLE),
             {FEAT_ROUND}) AS text_density,
       round(COALESCE(list_sum(list_transform(atexts, x -> length(x))), 0)
             / CAST(GREATEST(length(visible), 1) AS DOUBLE),
             {FEAT_ROUND}) AS link_density
FROM feat
"""


# ---------------------------------------------------------------------------
# pages_extract_router
# ---------------------------------------------------------------------------

# Route thresholds. ROUTER_BIG_BYTES mirrors the extraction job's
# oversized-row route (operators/extraction.py DEFAULT_BIG_THRESHOLD);
# the density cuts sit inside the fixture's observed spread
# (link_density 0.12-0.58, text_density 0.21-0.55 at sf0.01) so both
# density routes genuinely fire in the corpus (link_heavy catches the
# thinnest pages too, so the low-text cut sits above the min
# text_density of the non-link-heavy remainder).
ROUTER_BIG_BYTES = 2_000_000
ROUTER_LINK_HEAVY = 0.35
ROUTER_LOW_TEXT = 0.33


def pages_extract_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-extraction routing gate composed over the DOM-heuristic
    features: oversized pages go to the isolated big route (the same
    rule run_extraction applies physically), link-heavy pages are
    flagged for the strict/skip path (link farms aren't worth full
    extraction), low-text-density pages for the cheap path, the rest
    to normal extraction.  At 100 TB this table IS the job planner's
    input — routing before extraction is how a crawl avoids paying
    Arrow + Python for pages that a JVM regexp already condemns.

    Scale shape: the features subplan's zero-shuffle narrow map plus a
    per-row CASE — still zero shuffles."""
    feats = pages_html_features(spark, sf_dir)
    route = (
        F.when(F.col("html_bytes") > ROUTER_BIG_BYTES, F.lit("oversized"))
        .when(F.col("link_density") >= ROUTER_LINK_HEAVY,
              F.lit("link_heavy"))
        .when(F.col("text_density") < ROUTER_LOW_TEXT, F.lit("low_text"))
        .otherwise(F.lit("extract")))
    return feats.select("url", "html_bytes", "text_density",
                        "link_density", route.alias("route"))


def _router_sql() -> str:
    return f"""
WITH feat AS (
{PAGES_HTML_FEATURES_SQL}
)
SELECT url, html_bytes, text_density, link_density,
       CASE WHEN html_bytes > {ROUTER_BIG_BYTES} THEN 'oversized'
            WHEN link_density >= {ROUTER_LINK_HEAVY} THEN 'link_heavy'
            WHEN text_density < {ROUTER_LOW_TEXT} THEN 'low_text'
            ELSE 'extract' END AS route
FROM feat
"""


SPARK_QUERIES = {
    "pages_wrap_digest": pages_wrap_digest,
    "pages_html_features": pages_html_features,
    "pages_extract_router": pages_extract_router,
}

ORACLE_SQL = {
    "pages_wrap_digest": PAGES_WRAP_DIGEST_SQL,
    "pages_html_features": PAGES_HTML_FEATURES_SQL,
    "pages_extract_router": _router_sql(),
}
