"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the `pages` input table fixed by BASELINE.json `input_hint`:

    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

Two payload kinds live in the ``html`` column:

  * real HTML pages with controlled boilerplate (nav/footer/ads/sidebar),
    a link-density gradient, and content paragraphs — the HTML path;
  * layout-fixture documents (magic prefix ``%OCRFIX1\\n`` + JSON, schema
    FIXTURES.md §3) standing in for the PDF/layout path, since the
    reference's Paddle layout/OCR models are unavailable offline (its model
    artifacts are gitignored; see /root/reference/.gitignore).

Skew knobs (FIXTURES.md §1): one hot host carries ~50% of rows; 1–3
oversized rows (≥ ~10 MB html) exercise the size-aware salting path.

Everything is seeded per-row (``random.Random(f"{seed}:{i}")``) so any row
can be regenerated independently of generation order or partitioning.
"""

from __future__ import annotations

import datetime as _dt
import json
import random

from ocr_spark.gen.fixture_docs import make_fixture_doc

FIXTURE_MAGIC = b"%OCRFIX1\n"

_VOCAB_CONTENT = (
    "the data pipeline reads a stream of documents and writes the extracted "
    "text to a partitioned table while the optimizer prunes columns and "
    "pushes filters down to the scan so that only the required bytes move "
    "across the network and every executor keeps its partition in memory "
    "for the duration of the stage which is why the shuffle is the most "
    "expensive step in any large join and should be avoided when a small "
    "side can be broadcast to all workers instead of moving the big table"
).split()

_VOCAB_BOILER = (
    "home about contact login signup menu products pricing blog careers "
    "privacy terms cookie settings subscribe newsletter follow share tweet "
    "copyright reserved rights sitemap search language english deutsch"
).split()

_LANGS = ["en", "en", "en", "de", "es", "fr", "ko", "zh"]

HOT_HOST = "hot.example.com"
_COLD_HOSTS = [f"site{k}.example.org" for k in range(40)]


def _sentence(rng: random.Random, lo: int = 8, hi: int = 18) -> str:
    n = rng.randint(lo, hi)
    words = [rng.choice(_VOCAB_CONTENT) for _ in range(n)]
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, lo: int = 2, hi: int = 6) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(lo, hi)))


def _nav_html(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in rng.sample(_VOCAB_BOILER, 6)
    )
    return f'<nav class="navbar"><ul>{items}</ul></nav>'


def _footer_html(rng: random.Random) -> str:
    links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.sample(_VOCAB_BOILER, 8)
    )
    return f'<footer id="footer"><div>{links}</div><p>copyright {rng.randint(2001, 2025)} all rights reserved</p></footer>'


def _sidebar_html(rng: random.Random) -> str:
    links = "".join(
        f'<li><a href="/p/{k}">{rng.choice(_VOCAB_BOILER)} {k}</a></li>'
        for k in range(rng.randint(4, 9))
    )
    return f'<aside class="sidebar"><h3>related</h3><ul>{links}</ul></aside>'


def _ad_html(rng: random.Random) -> str:
    return (
        f'<div class="ad-banner"><a href="https://ads.example/{rng.randint(0, 999)}">'
        f'{rng.choice(_VOCAB_BOILER)} {rng.choice(_VOCAB_BOILER)} now</a></div>'
    )


def make_html_page(rng: random.Random, title: str, paragraphs: list[str],
                   headings: list[str] | None = None) -> str:
    """Assemble a page: boilerplate shell around given content paragraphs."""
    headings = headings or []
    body = [
        _nav_html(rng),
        f'<header class="masthead"><span>{rng.choice(_VOCAB_BOILER)}</span></header>',
        _ad_html(rng),
        "<main><article>",
        f"<h1>{title}</h1>",
    ]
    for i, p in enumerate(paragraphs):
        if headings and i < len(headings):
            body.append(f"<h2>{headings[i]}</h2>")
        body.append(f"<p>{p}</p>")
        if rng.random() < 0.25:
            body.append(_ad_html(rng))
    body.append("</article></main>")
    body.append(_sidebar_html(rng))
    body.append(_footer_html(rng))
    return (
        "<!DOCTYPE html><html><head><title>x</title>"
        "<style>.x{color:red}</style><script>var a=1;</script></head><body>"
        + "".join(body)
        + "</body></html>"
    )


def make_row(i: int, seed: int = 42, n_rows: int = 1000,
             fixture_frac: float = 0.1, oversized_rows: int = 2) -> dict:
    """Deterministically generate row ``i`` of an ``n_rows`` corpus."""
    rng = random.Random(f"{seed}:{i}")
    host = HOT_HOST if rng.random() < 0.5 else rng.choice(_COLD_HOSTS)
    lang = rng.choice(_LANGS)
    ts = _dt.datetime(2025, 1, 1) + _dt.timedelta(seconds=i * 137 % 31_536_000)

    is_fixture = (i % int(1 / fixture_frac) == 7) if fixture_frac > 0 else False
    oversized_idx = {3, n_rows // 2, (3 * n_rows) // 4} - {7}
    is_oversized = i in sorted(oversized_idx)[:oversized_rows]

    if is_fixture:
        url = f"https://{host}/doc/{i}.pdf"
        doc = make_fixture_doc(rng, doc_id=f"doc{i}")
        html = FIXTURE_MAGIC + json.dumps(doc, ensure_ascii=False).encode("utf-8")
        crawler_text = ""
    else:
        url = f"https://{host}/page/{i}"
        n_para = rng.randint(3, 8)
        paragraphs = [_paragraph(rng) for _ in range(n_para)]
        if is_oversized:
            # a genuinely oversized page (≥ ~10 MB) to exercise size-aware
            # salting (FIXTURES.md §1)
            big = _paragraph(rng, 400, 500)
            copies = 10_000_000 // len(big) + 1
            paragraphs = paragraphs + [big] * copies
        headings = [_sentence(rng, 2, 4).rstrip(".") for _ in range(n_para // 2)]
        title = _sentence(rng, 3, 6).rstrip(".")
        page = make_html_page(rng, title, paragraphs, headings)
        html = page.encode("utf-8")
        # noisy crawler guess: content plus leaked boilerplate (NOT the target)
        crawler_text = " ".join(paragraphs[:2]) + " " + " ".join(
            rng.sample(_VOCAB_BOILER, 5)
        )

    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": crawler_text,
        "lang": lang,
    }


def generate_pages(n_rows: int, seed: int = 42, fixture_frac: float = 0.1,
                   oversized_rows: int = 2) -> list[dict]:
    return [
        make_row(i, seed=seed, n_rows=n_rows, fixture_frac=fixture_frac,
                 oversized_rows=oversized_rows)
        for i in range(n_rows)
    ]
