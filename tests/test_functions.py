"""SQL function surface: register_all exposes the kernels to spark.sql,
and SQL results equal the DataFrame-query kernels exactly."""

from ocr_spark.functions import register_all


def test_sql_functions_match_dataframe_kernels(spark):
    register_all(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("fdocs")
    got = spark.sql("""
        SELECT doc_id,
               ocr_minhash_sig(text)  AS mh,
               ocr_simhash(text)      AS sh,
               ocr_rolling_hash(text) AS rh,
               ocr_langid(text)       AS lg,
               ocr_token_count(text)  AS tc
        FROM fdocs ORDER BY doc_id LIMIT 50
    """).collect()
    assert len(got) == 50

    from ocr_spark.plans.dataops import (
        docs_bpe_token_count, docs_langid, docs_minhash_signature,
        docs_rolling_hash, docs_simhash,
    )
    sf = "/root/testdata/sf0.001"
    mh = {r.doc_id: r.minhash_sig
          for r in docs_minhash_signature(spark, sf).collect()}
    sh = {r.doc_id: r.simhash for r in docs_simhash(spark, sf).collect()}
    rh = {r.doc_id: r.rolling_hash
          for r in docs_rolling_hash(spark, sf).collect()}
    lg = {r.doc_id: r.lang_pred for r in docs_langid(spark, sf).collect()}
    tc = {r.doc_id: r.n_bpe_tokens
          for r in docs_bpe_token_count(spark, sf).collect()}
    for r in got:
        assert r.mh == mh.get(r.doc_id)
        assert r.sh == sh.get(r.doc_id)
        assert r.rh == rh[r.doc_id]
        assert r.lg == lg[r.doc_id]
        assert r.tc == tc[r.doc_id]


def test_sql_extract_and_sentences(spark):
    register_all(spark)
    row = spark.sql("""
        SELECT ocr_extract_text(
          '<body><nav><a href=x>home</a></nav>'
          || '<p>plain prose with the usual amount of words right here.</p>'
          || '</body>') AS t
    """).first()
    assert "plain prose" in row.t and "home" not in row.t

    sents = spark.sql("""
        SELECT s.* FROM (SELECT 'One here. Two there. three' AS x),
        LATERAL split_sentences(x) s
    """).collect()
    assert [r.sentence for r in sents] == ["One here.", "Two there.", "three"]
