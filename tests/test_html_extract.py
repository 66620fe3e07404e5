"""HTML boilerplate-stripping behavior + round-trip property tests
(SURVEY.md §5.2.6)."""

from __future__ import annotations

import random

from ocr_spark.core.html_extract import extract_html
from ocr_spark.gen.wrap import html_for_document


def test_nav_footer_aside_dropped():
    html = (
        "<body><nav><a href='/a'>home</a><a href='/b'>about</a></nav>"
        "<p>the quick brown fox jumps over the lazy dog and keeps running</p>"
        "<footer><a href='/c'>terms</a> copyright</footer></body>"
    )
    text, blocks = extract_html(html)
    assert "home" not in text and "terms" not in text and "copyright" not in text
    assert "quick brown fox" in text


def test_link_density_filter():
    html = (
        "<body><div><a href='/1'>one two three four five six seven eight</a></div>"
        "<p>plain prose with the usual amount of words in a sentence here</p></body>"
    )
    text, _ = extract_html(html)
    assert "one two three" not in text
    assert "plain prose" in text


def test_bad_class_container_dropped():
    html = (
        "<body><div class='sidebar-ad'>the offer of the day for you all now</div>"
        "<p>the content sentence that should definitely survive this pass</p></body>"
    )
    text, _ = extract_html(html)
    assert "offer of the day" not in text
    assert "should definitely survive" in text


def test_script_style_invisible():
    html = ("<body><script>var the = 'a of to in is';</script>"
            "<style>.x{color:red}</style>"
            "<p>the visible words of the body are only these ones here</p></body>")
    text, _ = extract_html(html)
    assert "var the" not in text and "color" not in text
    assert "visible words" in text


def test_offsets_index_into_text():
    html = ("<body><h1>A Title Here</h1>"
            "<p>the first paragraph of the page with enough words in it</p>"
            "<p>the second paragraph of the page with enough words too</p></body>")
    text, blocks = extract_html(html)
    kept = [b for b in blocks if b.is_content]
    assert len(kept) == 3
    prev_end = -1
    for b in kept:
        assert text[b.char_start:b.char_end] == b.text
        assert b.char_start > prev_end
        prev_end = b.char_end


def test_entities_decoded():
    html = "<body><p>the caf&eacute; &amp; the bar were of the same block</p></body>"
    text, _ = extract_html(html)
    assert "café & the bar" in text


def test_wrap_roundtrip_random_texts():
    rng = random.Random(7)
    vocab = "the a of data scan filter join sort merge group stream".split()
    from ocr_spark.gen.wrap import (
        content_blocks_for_document, expected_text_for_document,
    )

    for i in range(50):
        doc_text = " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 200)))
        text, blocks = extract_html(html_for_document(i, doc_text).decode())
        assert text == expected_text_for_document(i, doc_text), \
            f"roundtrip drift at doc {i}"
        kept = [(b.label, b.text) for b in blocks if b.is_content]
        assert kept == content_blocks_for_document(i, doc_text), i


def test_extracted_is_subsequence_of_visible():
    # invariant: every extracted char run appears in the raw html
    html = ("<body><nav>x y z</nav><p>alpha beta gamma delta epsilon zeta "
            "eta theta</p><footer>f</footer></body>")
    text, _ = extract_html(html)
    assert text in html
