"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``ocr_spark`` — a PySpark-native main-content extraction pipeline
(HTML boilerplate strip + layout-fixture PDF path) plus corpus-level
analytics. The flagship ``entry`` pushes the driver's ``documents`` table
through the full salted mapInPandas extraction job; ``extract_roundtrip``
makes the north rule's byte-identical-text gate oracle-checkable (the
DuckDB oracle selects the original text — any extraction byte drift
fails the value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline over sf0.001 documents."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.extraction import run_extraction
    from ocr_spark.plans.extract_queries import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    extracted = run_extraction(pages, partitions=16, big_partitions=2)
    return extracted.select(
        "url", "kind", "text", "n_pages", "n_blocks", "n_blocks_dropped",
        "bytes_in", "error",
    ).orderBy(F.col("url"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7.8."""
    from ocr_spark.plans import (
        curation, dataops, extract_queries, multimodal_queries,
        queries as q, relational_extra, simsearch, webops,
    )

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(q.SPARK_QUERIES)
    out.update(extract_queries.SPARK_QUERIES)
    out.update(dataops.SPARK_QUERIES)
    out.update(simsearch.SPARK_QUERIES)
    out.update(multimodal_queries.SPARK_QUERIES)
    out.update(relational_extra.SPARK_QUERIES)
    out.update(webops.SPARK_QUERIES)
    out.update(curation.SPARK_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/aliases)."""
    from ocr_spark.plans import (
        curation, dataops, extract_queries, multimodal_queries,
        queries as q, relational_extra, simsearch, webops,
    )

    out: dict[str, str] = {}
    out.update(q.ORACLE_SQL)
    out.update(extract_queries.ORACLE_SQL)
    out.update(dataops.ORACLE_SQL)
    out.update(simsearch.ORACLE_SQL)
    out.update(multimodal_queries.ORACLE_SQL)
    out.update(relational_extra.ORACLE_SQL)
    out.update(webops.ORACLE_SQL)
    out.update(curation.ORACLE_SQL)
    return out
