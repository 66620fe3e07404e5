"""JVM boilerplate pre-scan (operators/extraction.py::jvm_boilerplate_prescan):
the opt-in Arrow-IN optimization must be invisible to extraction output —
byte-identical text AND identical block/span/match structs — on the full
golden corpus and on adversarial comment/rawtext nestings."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.core.extract import extract_document
from ocr_spark.gen.corpus import generate_pages
from ocr_spark.operators.extraction import jvm_boilerplate_prescan


def _prescan_via_spark(spark, rows: list[tuple[str, bytes]]) -> dict[str, str]:
    """Run the REAL JVM regex (not a Python re approximation) and return
    url → pre-scanned html string."""
    df = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in rows], "url string, html binary")
    out = df.select(
        "url", jvm_boilerplate_prescan(F.col("html")).alias("pre")).collect()
    return {r.url: r.pre for r in out}


def _assert_same_extraction(url: str, raw: bytes, pre: str) -> None:
    a = extract_document(url, raw)
    b = extract_document(url, pre.encode("utf-8"))
    assert b.text == a.text, url
    assert b.blocks == a.blocks, url
    assert b.spans == a.spans, url
    assert b.matches == a.matches, url
    assert (b.kind, b.error) == (a.kind, a.error), url


def test_prescan_identity_on_golden_corpus(spark):
    corpus = generate_pages(120, seed=42, oversized_rows=0)
    rows = [(r["url"], r["html"]) for r in corpus]
    pre = _prescan_via_spark(spark, rows)
    for url, raw in rows:
        _assert_same_extraction(url, raw, pre[url])


def test_prescan_identity_adversarial(spark):
    body = "<p>the visible prose of this page has enough words here</p>"
    cases = [
        # fake close inside a script string — rawtext semantics end at
        # the FIRST literal close, same as the kernel scanner
        f"<body><script>var s = \"</scr\" + \"ipt>\";</script>{body}</body>",
        # comment containing a script open: comment wins (leftmost)
        f"<body><!-- <script> -->{body}</script> tail words</body>",
        # unclosed script: kernel drops to EOF; prescan leaves it and the
        # kernel does the dropping
        f"<body>{body}<script>var x=1; <!-- never closed",
        # style tag with a '>' inside a quoted attribute
        f"<body><style media=\"a>b\">.x{{}}</style>{body}</body>",
        # comment glued to script, both removed in order
        f"<body><!--c--><script>1</script><!--d-->{body}</body>",
        # script text inside a textarea (rawtext region the prescan does
        # NOT remove — kernel drops textarea wholesale anyway)
        f"<body><textarea><script>alert(1)</script></textarea>{body}</body>",
        # degenerate unterminated comment-open
        f"<body>{body}<!-->trailing",
        # case-insensitive tags
        f"<body><SCRIPT>x</SCRIPT><Style>y</Style>{body}</body>",
    ]
    rows = [(f"adv://{i}", c.encode()) for i, c in enumerate(cases)]
    pre = _prescan_via_spark(spark, rows)
    for url, raw in rows:
        _assert_same_extraction(url, raw, pre[url])


def test_prescan_passes_fixture_docs_untouched(spark):
    corpus = generate_pages(120, seed=42, oversized_rows=0)
    fixtures = [(r["url"], r["html"]) for r in corpus
                if r["html"].startswith(b"%OCRFIX1\n")]
    assert fixtures, "corpus should contain fixture docs"
    pre = _prescan_via_spark(spark, fixtures)
    for url, raw in fixtures:
        assert pre[url].encode("utf-8") == raw, url


def test_prescan_e2e_run_extraction(spark):
    """Full pipeline equivalence: run_extraction with and without the
    pre-scan yields identical (url, text) over the wrapped corpus."""
    from ocr_spark.operators.extraction import run_extraction
    from ocr_spark.plans.extract_queries import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    base = run_extraction(pages, partitions=8, big_partitions=1,
                          jvm_prescan=False)
    pre = run_extraction(pages, partitions=8, big_partitions=1,
                         jvm_prescan=True)
    a = {r.url: r.text for r in base.select("url", "text").collect()}
    b = {r.url: r.text for r in pre.select("url", "text").collect()}
    assert a == b
