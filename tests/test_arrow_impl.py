"""The mapInArrow extraction runner must be row-for-row identical to
the mapInPandas one — same kernel, different serialization path only.
Byte-identical text is the north rule, so equality is asserted on every
output column except extract_ms (a timing)."""

from pyspark.sql import functions as F

from ocr_spark.operators.extraction import run_extraction


def _corpus_df(spark, n=120):
    from ocr_spark.gen.corpus import generate_pages

    rows = [(r["url"], r["html"]) for r in generate_pages(n, seed=7)]
    return spark.createDataFrame(rows, "url string, html binary")


def _run(spark, impl):
    df = run_extraction(_corpus_df(spark), partitions=8, big_partitions=2,
                        impl=impl)
    cols = [c for c in df.columns if c != "extract_ms"]
    return [tuple(r) for r in
            df.select(*cols).orderBy("url").collect()]


def test_arrow_impl_matches_pandas_impl(spark):
    a = _run(spark, "pandas")
    b = _run(spark, "arrow")
    assert len(a) == len(b) == 120
    for ra, rb in zip(a, b):
        assert ra == rb, (ra[0], ra, rb)


def test_arrow_impl_null_and_oversized_rows(spark):
    """NULL html routes to the kernel's null_html failure row, and the
    oversized route survives, in BOTH impls."""
    rows = [("doc://n1", None),
            ("doc://n2", b"<html><body><p>tiny page body of words "
                         b"with enough density to keep</p></body></html>"),
            ("doc://big", b"<html><body><p>"
                          + b"filler words and prose " * 150_000
                          + b"</p></body></html>")]
    df = spark.createDataFrame(rows, "url string, html binary")
    for impl in ("pandas", "arrow"):
        out = {r["url"]: r for r in
               run_extraction(df, partitions=2, big_partitions=1,
                              big_threshold=100_000, impl=impl).collect()}
        assert out["doc://n1"]["error"] is not None
        assert out["doc://n2"]["error"] is None
        assert out["doc://big"]["error"] is None
        assert out["doc://big"]["bytes_in"] > 100_000


def test_unknown_impl_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown extraction impl"):
        run_extraction(_corpus_df(spark, 2), impl="rdd")
