"""Deterministic multi-block HTML wrapper for the driver's `documents` table.

Wraps each document's text in a boilerplate-laden page whose CONTENT
block structure varies deterministically with doc_id:

  * an ``<h1>`` title block            — always        (label doc_title)
  * an ``<h2>`` section heading        — doc_id % 3 == 0 (paragraph_title)
  * the document text ``<p>``          — always        (label text)
  * a closing ``<p>`` paragraph        — doc_id % 2 == 0 (label text)
  * a 4-sentence disclaimer ``<p>``    — doc_id % 4 == 1 (label text);
    only 3 distinct variants exist corpus-wide, so the corpus carries
    REAL duplicated three-sentence spans — the substrate for C4-style
    sentence-span dedup (plans/webops.py)

so every page yields 2–5 content blocks with non-trivial labels and char
offsets, all recomputable in ANSI SQL from (doc_id, text) alone — the
DuckDB oracle checks REAL block structure (labels, offsets, sequence
edges), not a 1-block identity. Extracted text equals
``expected_text_for_document(doc_id, text)`` byte-for-byte (content
blocks join with "\\n\\n", core/html_extract.py::extract_html), so the
driver's value-hash compare remains the north rule's
byte-identical-text gate, executed end-to-end through Spark.

The boilerplate shell (nav/ads/sidebar/footer, link-dense, bad-class
containers) is derived deterministically from doc_id — no RNG, no state.
"""

from __future__ import annotations

import html as _html

_NAV_WORDS = ("home", "about", "products", "pricing", "blog", "careers")
_FOOT_WORDS = ("privacy", "terms", "contact", "sitemap", "subscribe")


def url_for_document(doc_id: int) -> str:
    return f"doc://{doc_id}"


def contact_email_for_document(doc_id: int) -> str:
    """Deterministic PII-shaped email in the footer boilerplate — the
    substrate for the PII-scan/redaction operators (plans/webops.py).
    Lives in a boilerplate container so extracted content text (and all
    goldens/oracles over it) are untouched."""
    return f"contact{doc_id % 50}@example{doc_id % 7}.com"


def contact_phone_for_document(doc_id: int) -> str:
    return f"555-01{doc_id % 100:02d}"


def partner_url_for_document(doc_id: int) -> str:
    """Deterministic absolute external outlink (footer boilerplate) —
    gives the web-graph operators (plans/webops.py pages_outlinks /
    pages_host_outdegree) a host-bearing edge to aggregate.

    Host site11 (doc_id % 13 == 11) is a deterministic LINK FARM: every
    one of its pages points at partner2, so its outlink concentration
    is 1.0 while honest hosts spread across all 5 partners (gcd(13,5)=1
    cycles them) — the substrate for the link-spam operators
    (plans/webops.py hosts_link_spam / hosts_spam_mass)."""
    idx = 2 if doc_id % 13 == 11 else doc_id % 5
    return f"https://partner{idx}.example.org/p/{doc_id % 13}"


def canonical_url_for_document(doc_id: int) -> str:
    """Deterministic canonical self-url (head <link>, invisible to
    extraction) — gives each page a source HOST so the host graph
    (canonical host → partner host) is parseable from page bytes alone
    (plans/webops.py hosts_pagerank)."""
    return f"https://site{doc_id % 13}.example.com/doc/{doc_id}"


def robots_for_document(doc_id: int) -> str:
    """Deterministic page-level robots directive (head <meta>,
    invisible to extraction) — every 17th document opts out of
    indexing, the substrate for pages_robots_filter
    (plans/webops.py)."""
    return "noindex,nofollow" if doc_id % 17 == 3 else "index,follow"


def published_iso_for_document(doc_id: int) -> str:
    """Deterministic publication timestamp (ISO-8601 Z)."""
    return (f"2024-{1 + doc_id % 12:02d}-{1 + doc_id % 28:02d}"
            f"T{doc_id % 24:02d}:00:00Z")


def meta_published_for_document(doc_id: int) -> str | None:
    """``article:published_time`` head meta — present on 2 of 3 pages,
    so publication-date extraction has a genuine meta-only / none
    split (plans/htmlfeat.py pages_date_extract)."""
    if doc_id % 3 != 1:
        return published_iso_for_document(doc_id)
    return None


def jsonld_for_document(doc_id: int) -> str | None:
    """Deterministic schema.org JSON-LD block (every second page) —
    the structured-metadata substrate (plans/htmlfeat.py
    pages_structured_meta / pages_date_extract). Built by f-string, not
    json.dumps, so the byte-parity SQL mirror stays a plain concat.
    Deliberately contains NO ``href=`` attribute and no email/phone
    shapes, so the outlink / PII scans are untouched."""
    if doc_id % 2 != 0:
        return None
    jtype = "NewsArticle" if doc_id % 10 == 0 else "Article"
    return (
        '{"@context":"https://schema.org","@type":"' + jtype
        + '","headline":"' + title_for_document(doc_id)
        + '","datePublished":"' + published_iso_for_document(doc_id)
        + '","author":{"@type":"Person","name":"Author '
        + str(doc_id % 20) + '"}}'
    )


def appendix_rows_for_document(doc_id: int) -> list[tuple[str, int, str]] | None:
    """Deterministic data-appendix table rows (every sixth page,
    2-4 rows): the substrate for HTML-table→structured-rows extraction
    (plans/htmlfeat.py pages_table_extract). The table lives in a
    bad-class (``widget``) container so every cell is boilerplate to
    the main-content extractor — extracted text, goldens, and all
    block/span oracles are untouched."""
    if doc_id % 6 != 3:
        return None
    return [(f"metric{i}", (doc_id * 31 + i * 7) % 1000,
             f"unit{(i + doc_id) % 4}")
            for i in range(1, 3 + doc_id % 3)]


def consent_banner_for_document(doc_id: int) -> str | None:
    """Deterministic cookie-consent banner (every ninth page): the
    consent-wall boilerplate class that contaminates naive extractors
    — the substrate for pages_consent_banner (plans/htmlfeat.py). The
    ``cookie-banner`` class is already in the extractor's bad-class
    list, so extracted text is untouched; deliberately LINK-FREE so
    the outlink / anchor-text oracles stay closed-form."""
    if doc_id % 9 != 5:
        return None
    return ("We use cookies to improve your experience. By clicking "
            f"accept {doc_id % 3} you agree to our cookie policy.")


def title_for_document(doc_id: int) -> str:
    return f"Document {doc_id} Report"


def heading_for_document(doc_id: int) -> str | None:
    if doc_id % 3 == 0:
        return f"Section {doc_id % 7} overview and summary"
    return None


def closing_for_document(doc_id: int) -> str | None:
    if doc_id % 2 == 0:
        return (f"This is the closing paragraph of document {doc_id} "
                "in the corpus.")
    return None


def disclaimer_for_document(doc_id: int) -> str | None:
    """Deterministic 4-sentence disclaimer, shared verbatim by every
    fourth document (3 variants corpus-wide) — gives the extracted
    corpus genuine duplicated three-sentence spans for the C4-style
    span-dedup operator, while titles/body/closing stay doc-unique."""
    if doc_id % 4 == 1:
        return (
            "All material on this site is provided for general "
            "information only. Reproduction of variant "
            f"{doc_id % 3} content requires prior written permission. "
            "The publisher accepts no liability for errors or "
            "omissions in this text. Nothing here constitutes "
            "professional advice of any kind."
        )
    return None


def bullet_items_for_document(doc_id: int) -> list[str] | None:
    """Deterministic bullet-list block (every fifth document): a
    content ``<ul>`` whose ``<li>`` items each extract as their OWN
    block — i.e. their own LINE of extracted text — the substrate for
    the Gopher line-level signals (bullet-start-line ratio,
    ellipsis-end-line ratio; plans/webops.py
    docs_gopher_line_filters). The last item ends with an ellipsis so
    both signals genuinely occur in the corpus. Items embed doc_id so
    they create no new corpus-wide duplicate paragraphs/spans (the
    para/span-dedup substrate stays exactly the disclaimer variants)."""
    if doc_id % 5 != 2:
        return None
    items = [
        f"• Point {k} of document {doc_id} in the series covering "
        f"topic {(doc_id + k) % 9}."
        for k in (1, 2)
    ]
    items.append(
        f"• Point 3 of document {doc_id} continues with more "
        "detail on the topic ..."
    )
    return items


def content_blocks_for_document(doc_id: int, text: str) -> list[tuple[str, str]]:
    """The (label, text) content blocks the extractor must produce, in
    order. Mirrored in SQL by plans/extract_queries.py's oracles."""
    blocks = [("doc_title", title_for_document(doc_id))]
    h2 = heading_for_document(doc_id)
    if h2 is not None:
        blocks.append(("paragraph_title", h2))
    blocks.append(("text", text))
    tail = closing_for_document(doc_id)
    if tail is not None:
        blocks.append(("text", tail))
    disc = disclaimer_for_document(doc_id)
    if disc is not None:
        blocks.append(("text", disc))
    items = bullet_items_for_document(doc_id)
    if items is not None:
        blocks.extend(("text", it) for it in items)
    return blocks


def expected_text_for_document(doc_id: int, text: str) -> str:
    return "\n\n".join(t for _lbl, t in
                       content_blocks_for_document(doc_id, text))


def html_for_document(doc_id: int, text: str) -> bytes:
    nav = "".join(
        f'<li><a href="/{w}{doc_id % 7}">{w}</a></li>' for w in _NAV_WORDS
    )
    foot = " ".join(
        f'<a href="/{w}">{w} {doc_id % 5}</a>' for w in _FOOT_WORDS
    )
    h2 = heading_for_document(doc_id)
    tail = closing_for_document(doc_id)
    disc = disclaimer_for_document(doc_id)
    items = bullet_items_for_document(doc_id)
    ul = ("<ul>" + "".join(f"<li>{_html.escape(it)}</li>" for it in items)
          + "</ul>") if items is not None else ""
    article = (
        f"<h1>{_html.escape(title_for_document(doc_id))}</h1>"
        + (f"<h2>{_html.escape(h2)}</h2>" if h2 is not None else "")
        + f"<p>{_html.escape(text)}</p>"
        + (f"<p>{_html.escape(tail)}</p>" if tail is not None else "")
        + (f"<p>{_html.escape(disc)}</p>" if disc is not None else "")
        + ul
    )
    arows = appendix_rows_for_document(doc_id)
    appendix = (
        '<section class="widget data-appendix"><table>'
        + "".join(f"<tr><td>{m}</td><td>{v}</td><td>{u}</td></tr>"
                  for m, v, u in arows)
        + "</table></section>"
    ) if arows is not None else ""
    consent = consent_banner_for_document(doc_id)
    consent_div = (f'<div class="cookie-banner">{consent}</div>'
                   if consent is not None else "")
    body = (
        f'<nav class="navbar"><ul>{nav}</ul></nav>'
        f'<header class="masthead"><span>site {doc_id % 13}</span></header>'
        f'<div class="ad-banner"><a href="/ad{doc_id % 11}">buy now today</a></div>'
        f"{consent_div}"
        f"<main><article>{article}</article></main>"
        f"{appendix}"
        f'<aside class="sidebar"><ul><li><a href="/r1">related one</a></li>'
        f'<li><a href="/r2">related two</a></li></ul></aside>'
        f"<footer><div>{foot}</div>"
        f'<div class="contact-line">Contact '
        f'<a href="mailto:{contact_email_for_document(doc_id)}">'
        f"{contact_email_for_document(doc_id)}</a>"
        f" or call {contact_phone_for_document(doc_id)}. "
        f'<a href="{partner_url_for_document(doc_id)}">partner site</a>'
        f"</div></footer>"
    )
    pub = meta_published_for_document(doc_id)
    jsonld = jsonld_for_document(doc_id)
    head_meta = (
        f'<meta property="og:title" '
        f'content="{_html.escape(title_for_document(doc_id))}">'
        + (f'<meta property="article:published_time" content="{pub}">'
           if pub is not None else "")
        + (f'<script type="application/ld+json">{jsonld}</script>'
           if jsonld is not None else "")
    )
    page = (
        "<!DOCTYPE html><html><head><title>t</title>"
        f'<link rel="canonical" href="{canonical_url_for_document(doc_id)}">'
        f'<meta name="robots" content="{robots_for_document(doc_id)}">'
        f"{head_meta}"
        "<script>var x=1;</script><style>.a{}</style></head>"
        f"<body>{body}</body></html>"
    )
    return page.encode("utf-8")
