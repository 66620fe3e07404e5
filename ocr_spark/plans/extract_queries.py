"""Extraction-engine queries for the driver contract.

``extract_roundtrip`` is the flagship: wrap every ``documents`` row in a
deterministic boilerplate-laden HTML page, push it through the full salted
mapInPandas extraction pipeline, and return (url, text). The DuckDB oracle
simply selects the original text — so the driver's value-hash compare
*is* the north rule's byte-identical-text gate, executed end-to-end
through Spark.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BinaryType

from ocr_spark.operators.extraction import run_extraction, with_typed_structs


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, …) → pages(url, warc_ts, html, text,
    lang) per the input_hint shape, html synthesized deterministically."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(BinaryType())
    def wrap_html(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        from ocr_spark.gen.wrap import html_for_document
        return pd.Series([
            html_for_document(int(d), t if t is not None else "")
            for d, t in zip(doc_id, text)
        ])

    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        wrap_html("doc_id", "text").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def extract_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(spark, sf_dir)
    extracted = run_extraction(pages, partitions=32, big_partitions=2)
    return extracted.select("url", "text")


EXTRACT_ROUNDTRIP_SQL = """
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, text
FROM documents
"""


def extract_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level rollup over the structured output: content blocks per
    document with char-offset integrity. Oracle-checkable because the
    deterministic wrapper yields exactly ONE content block per document
    spanning the full text."""
    pages = pages_from_documents(spark, sf_dir)
    extracted = with_typed_structs(run_extraction(pages, partitions=32,
                                                  big_partitions=2))
    blocks = extracted.select("url", F.length("text").alias("text_len"),
                              F.explode("blocks").alias("b"))
    return blocks.groupBy("url").agg(
        F.count("*").alias("n_blocks"),
        F.min("b.char_start").alias("first_char"),
        F.max("b.char_end").alias("last_char"),
        F.first("text_len").alias("text_len"),
    )


EXTRACT_BLOCK_STATS_SQL = """
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       CAST(1 AS BIGINT) AS n_blocks,
       CAST(0 AS INT) AS first_char,
       CAST(length(text) AS INT) AS last_char,
       CAST(length(text) AS INT) AS text_len
FROM documents
"""

SPARK_QUERIES = {
    "extract_roundtrip": extract_roundtrip,
    "extract_block_stats": extract_block_stats,
}

ORACLE_SQL = {
    "extract_roundtrip": EXTRACT_ROUNDTRIP_SQL,
    "extract_block_stats": EXTRACT_BLOCK_STATS_SQL,
}
