"""WARC source: write → read roundtrip, gzip variant, extraction e2e."""

import gzip

from ocr_spark.gen.corpus import generate_pages
from ocr_spark.sources.warc import parse_warc_records, read_warc, write_warc


def _make_warc(tmp_path, rows, name="part-00000.warc", gz=False):
    import io
    buf = io.BytesIO()
    write_warc(rows, buf)
    data = buf.getvalue()
    if gz:
        data = gzip.compress(data)
        name += ".gz"
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_parse_roundtrip_pure():
    rows = generate_pages(12, oversized_rows=0)
    import io
    buf = io.BytesIO()
    write_warc(rows, buf)
    recs = list(parse_warc_records(buf.getvalue()))
    assert len(recs) == 12
    for rec, row in zip(recs, rows):
        assert rec["headers"]["warc-target-uri"] == row["url"]


def test_read_warc_spark_and_extract(spark, tmp_path):
    rows = generate_pages(30, oversized_rows=0)
    _make_warc(tmp_path, rows[:15], "a.warc")
    _make_warc(tmp_path, rows[15:], "b.warc", gz=True)

    pages = read_warc(spark, str(tmp_path) + "/*.warc*")
    got = {r.url: bytes(r.html) for r in pages.collect()}
    assert len(got) == 30
    for r in rows:
        assert got[r["url"]] == bytes(r["html"]), r["url"]

    # and straight into the extraction job: identical text to the
    # direct-kernel run
    from ocr_spark.core.extract import extract_document
    from ocr_spark.operators.extraction import run_extraction
    out = {r.url: r.text
           for r in run_extraction(pages, partitions=4,
                                   big_partitions=1).collect()}
    for r in rows[:5]:
        assert out[r["url"]] == extract_document(r["url"], r["html"]).text


def test_truncated_archive_does_not_raise(spark, tmp_path):
    rows = generate_pages(5, oversized_rows=0)
    p = _make_warc(tmp_path, rows, "t.warc")
    data = open(p, "rb").read()
    open(p, "wb").write(data[:len(data) // 2])  # truncate mid-record
    n = read_warc(spark, p).count()
    assert 0 <= n < 5  # prefix records survive, no exception
