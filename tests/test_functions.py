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


def test_sql_surface_matches_final_session_plans(spark):
    """ocr_pub_date / ocr_consent_wall / ocr_table_rows /
    ocr_rake_phrases agree value-for-value with the plan-side queries
    over the same wrapped pages / documents."""
    register_all(spark)
    sf = "/root/testdata/sf0.001"

    from ocr_spark.plans.extract_queries import pages_from_documents
    from ocr_spark.plans.htmlfeat import (
        pages_consent_banner, pages_date_extract, pages_table_extract)

    pages = pages_from_documents(spark, sf)
    pages.createOrReplaceTempView("p_pages")

    got = {r.url: r.d for r in spark.sql(
        "SELECT url, ocr_pub_date(CAST(html AS STRING)) AS d "
        "FROM p_pages").collect()}
    want = {r.url: r.pub_date
            for r in pages_date_extract(spark, sf).collect()}
    assert got == want

    gotc = {r.url: r.c for r in spark.sql(
        "SELECT url, ocr_consent_wall(CAST(html AS STRING)) AS c "
        "FROM p_pages").collect()}
    wantc = {r.url: r.consent_wall
             for r in pages_consent_banner(spark, sf).collect()}
    assert gotc == wantc

    gott = sorted(tuple(r) for r in spark.sql(
        "SELECT url, t.row_idx, t.metric, t.value, t.unit FROM p_pages, "
        "LATERAL ocr_table_rows(CAST(html AS STRING)) t").collect())
    wantt = sorted(tuple(r)
                   for r in pages_table_extract(spark, sf).collect())
    assert gott == wantt

    from ocr_spark.plans.dataops import docs_keyphrases_rake
    spark.read.parquet(f"{sf}/documents.parquet") \
        .createOrReplaceTempView("p_docs")
    gotr = sorted(tuple(r) for r in spark.sql(
        "SELECT doc_id, r.rank, r.phrase, r.score FROM p_docs, "
        "LATERAL ocr_rake_phrases(text) r").collect())
    wantr = sorted((r.doc_id, r.rank, r.phrase, r.score)
                   for r in docs_keyphrases_rake(spark, sf).collect())
    assert gotr == wantr
