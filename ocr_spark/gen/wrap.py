"""Deterministic HTML wrapper for the driver's `documents` table.

Wraps each document's text in a boilerplate-laden page such that the
extraction core provably round-trips: extracted text == the original
``documents.text`` byte-for-byte. This turns the whole extraction engine
into an oracle-checkable query — DuckDB just selects the original text
(see plans/queries.py::extract_roundtrip).

The boilerplate shell (nav/ads/sidebar/footer, link-dense, bad-class
containers) is derived deterministically from doc_id — no RNG, no state.
"""

from __future__ import annotations

import html as _html

_NAV_WORDS = ("home", "about", "products", "pricing", "blog", "careers")
_FOOT_WORDS = ("privacy", "terms", "contact", "sitemap", "subscribe")


def url_for_document(doc_id: int) -> str:
    return f"doc://{doc_id}"


def html_for_document(doc_id: int, text: str) -> bytes:
    nav = "".join(
        f'<li><a href="/{w}{doc_id % 7}">{w}</a></li>' for w in _NAV_WORDS
    )
    foot = " ".join(
        f'<a href="/{w}">{w} {doc_id % 5}</a>' for w in _FOOT_WORDS
    )
    body = (
        f'<nav class="navbar"><ul>{nav}</ul></nav>'
        f'<header class="masthead"><span>site {doc_id % 13}</span></header>'
        f'<div class="ad-banner"><a href="/ad{doc_id % 11}">buy now today</a></div>'
        f"<main><article><p>{_html.escape(text)}</p></article></main>"
        f'<aside class="sidebar"><ul><li><a href="/r1">related one</a></li>'
        f'<li><a href="/r2">related two</a></li></ul></aside>'
        f"<footer><div>{foot}</div></footer>"
    )
    page = (
        "<!DOCTYPE html><html><head><title>t</title>"
        "<script>var x=1;</script><style>.a{}</style></head>"
        f"<body>{body}</body></html>"
    )
    return page.encode("utf-8")
