"""Property-based invariants for the HTML extractor (SURVEY.md §5.2.6),
driven by hypothesis over generated page structures.

Invariants:
  1. extracted text never contains content from script/style/nav/footer
     regions;
  2. block char offsets are monotone, non-overlapping, and index into
     the text exactly (text[start:end] == block text);
  3. extraction is deterministic (same bytes → same text);
  4. content words survive when embedded in arbitrary boilerplate.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ocr_spark.core.html_extract import extract_html

# words with no HTML metacharacters, lowercase alpha only
_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=2,
                max_size=10)
_sentence = st.lists(_word, min_size=8, max_size=20).map(" ".join)
_paragraphs = st.lists(_sentence, min_size=1, max_size=6)
_nav_words = st.lists(_word, min_size=2, max_size=6)


def _page(paragraphs, nav_words, script_body):
    nav = "".join(f"<a href='/x'>{w}</a>" for w in nav_words)
    paras = "".join(f"<p>{p}.</p>" for p in paragraphs)
    return (
        "<html><head><style>p { color: red }</style>"
        f"<script>var hidden_token_{script_body} = 1;</script></head>"
        f"<body><nav>{nav}</nav><main>{paras}</main>"
        f"<footer>{' '.join(nav_words)}</footer></body></html>"
    )


@settings(max_examples=40, deadline=None)
@given(_paragraphs, _nav_words, st.integers(0, 10**6))
def test_script_nav_never_leak_and_offsets_index(paragraphs, nav_words,
                                                 script_body):
    html = _page(paragraphs, nav_words, script_body)
    text, blocks = extract_html(html)

    # 1. no script/style leakage ever
    assert f"hidden_token_{script_body}" not in text
    assert "color: red" not in text

    # 2. offsets: monotone, non-overlapping, indexing exactly — content
    # blocks only (dropped boilerplate carries the documented -1 marker)
    prev_end = 0
    for b in blocks:
        if not b.is_content:
            assert b.char_start == b.char_end == -1
            continue
        assert 0 <= b.char_start <= b.char_end <= len(text)
        assert b.char_start >= prev_end
        assert text[b.char_start:b.char_end] == b.text
        prev_end = b.char_end

    # 3. determinism
    text2, blocks2 = extract_html(html)
    assert text2 == text
    assert [(b.char_start, b.char_end) for b in blocks2] == \
        [(b.char_start, b.char_end) for b in blocks]


@settings(max_examples=25, deadline=None)
@given(_paragraphs)
def test_long_prose_survives_boilerplate(paragraphs):
    # make each paragraph long enough to pass the density heuristics
    paragraphs = [(p + " ") * 3 for p in paragraphs]
    html = _page(paragraphs, ["home", "about", "login"], 7)
    text, _ = extract_html(html)
    for p in paragraphs:
        first_words = " ".join(p.split()[:4])
        assert first_words in text


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_garbage_bytes_never_raise(data):
    """Arbitrary bytes must produce SOME result, never an exception —
    a poisoned page cannot kill a 100 TB job."""
    from ocr_spark.core.extract import extract_document
    res = extract_document("https://x.test/garbage", data)
    assert res.text is not None or res.error is not None

@settings(max_examples=40, deadline=None)
@given(_paragraphs, _nav_words, st.integers(0, 10**6))
def test_fast_scanner_equals_stdlib_generated(paragraphs, nav_words,
                                              script_body):
    """The fast tag scanner must produce byte-identical output to the
    stdlib html.parser path on generated pages."""
    html = _page(paragraphs, nav_words, script_body)
    fast_text, fast_blocks = extract_html(html)
    std_text, std_blocks = extract_html(html, _stdlib=True)
    assert fast_text == std_text
    assert [(b.text, b.char_start, b.char_end, b.label, b.is_content)
            for b in fast_blocks] == \
        [(b.text, b.char_start, b.char_end, b.label, b.is_content)
         for b in std_blocks]


def test_fast_scanner_equals_stdlib_corpus():
    """Same equivalence over the realistic seeded corpus generator
    (entities, comments, nested boilerplate, both payload kinds)."""
    from ocr_spark.gen.corpus import generate_pages
    rows = generate_pages(120, oversized_rows=0)
    for r in rows:
        if r["url"].endswith(".pdf"):
            continue
        html = r["html"].decode("utf-8")
        assert extract_html(html)[0] == extract_html(html, _stdlib=True)[0], \
            r["url"]
