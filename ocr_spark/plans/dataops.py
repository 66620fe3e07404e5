"""Training-data pipeline operators over the ``documents`` table.

Deduplication (exact dedup lives in plans/queries.py):
  * MinHash signatures + banded LSH candidate pairs (the scale path for
    near-dup detection: signature computation is a narrow per-row map —
    no shuffle — and the only shuffle is the band-bucket self-join, whose
    key cardinality is controlled by the band hash);
  * SimHash bit-vote fingerprints;
  * exact n-gram Jaccard within blocking buckets (the verify path that
    LSH candidates would feed at scale).
Text analysis:
  * stopword-vote language identification.

Design rules (why this file looks the way it does):
  * Everything is pyspark.sql.functions higher-order expressions —
    transform/aggregate/filter over token arrays — so the whole operator
    runs inside WholeStageCodegen on the JVM. NO Python UDFs: at 100 TB
    a per-row Python hop on `documents` would dominate the job.
  * Every hash is md5-based because md5 is the one hash Spark and DuckDB
    compute identically, which makes each operator oracle-checkable
    value-for-value (xxhash64/murmur differ between engines).
  * MinHash uses k=16 hash functions as ``min(md5(i || '|' || shingle))``
    — the "one hash family, k salts" construction from the original
    MinHash paper (Broder '97), string-min over hex is order-isomorphic
    to integer-min over the 128-bit value.

Reference parity note: the reference (CMDF/ocr) has no corpus-level ops
at all (it is a one-document-at-a-time service, see SURVEY.md §2.3
"absent" lists); these operators are the additional large-scale
training-data capabilities the rebuild adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

MINHASH_K = 16      # hash functions per signature
LSH_BANDS = 4       # bands of 4 rows each → candidates at jaccard ≳ 0.3
SIMHASH_BITS = 32   # one bit per md5 hex digit (high bit of the digit)
SHINGLE_W = 3       # word-shingle width
JACCARD_BLOCK_CHARS = 200   # length-bucket width for exact-jaccard blocking
JACCARD_MIN = 0.1


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# shared tokenization / shingling (Spark side + the SQL fragments)
# --------------------------------------------------------------------------

def _tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


# DuckDB fragment for the same tokens
_SQL_TOKENS = "string_split_regex(lower(trim(text)), '\\s+')"


def _shingles(toks: Column) -> Column:
    """Word 3-grams: shingle[i] = toks[i] ' ' toks[i+1] ' ' toks[i+2].
    Guarded: sequence(0, n) DESCENDS for n<0, so short docs must map to
    an empty array explicitly."""
    return F.when(
        F.size(toks) >= SHINGLE_W,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - SHINGLE_W),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, SHINGLE_W)),
        ),
    ).otherwise(F.array().cast("array<string>"))


_SQL_SHINGLES = (
    f"list_transform(range(1, len({_SQL_TOKENS}) - {SHINGLE_W - 2}), "
    f"i -> {_SQL_TOKENS}[i] || ' ' || {_SQL_TOKENS}[i+1] || ' ' || "
    f"{_SQL_TOKENS}[i+2])"
)


def _minhash(shingles: Column, i: int) -> Column:
    """min over shingles of md5('<i>|' || shingle); hex-string min is
    order-isomorphic to the 128-bit integer min."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))))


def _sql_minhash(i: int) -> str:
    return (f"list_min(list_transform(shingles, "
            f"s -> md5('{i}|' || s)))")


# --------------------------------------------------------------------------
# MinHash signatures
# --------------------------------------------------------------------------

def docs_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature digest. Narrow map — zero shuffle;
    the plan is scan → project, so it scales linearly with input splits."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens()
    base = (docs
            .select("doc_id", _shingles(toks).alias("shingles"))
            .filter(F.size("shingles") > 0))
    sig = base.select(
        "doc_id",
        *[_minhash(F.col("shingles"), i).alias(f"mh{i}")
          for i in range(MINHASH_K)],
    )
    return sig.select(
        "doc_id",
        F.md5(F.concat_ws("|", *[f"mh{i}" for i in range(MINHASH_K)])
              ).alias("minhash_sig"),
    )


_MINHASH_SIG_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
), nz AS (
  SELECT * FROM sh WHERE len(shingles) > 0
), mh AS (
  SELECT doc_id,
         {", ".join(f"{_sql_minhash(i)} AS mh{i}" for i in range(MINHASH_K))}
  FROM nz
)
SELECT doc_id,
       md5({" || '|' || ".join(f"mh{i}" for i in range(MINHASH_K))})
         AS minhash_sig
FROM mh
"""


# --------------------------------------------------------------------------
# Banded LSH candidate pairs
# --------------------------------------------------------------------------

def docs_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via banded LSH: 4 bands × 4 rows.

    Scale shape: signatures are a narrow map; explode to (band, bucket)
    is 4 rows/doc; the single shuffle is the self-join on (band, bucket)
    whose groups are tiny unless documents actually collide — exactly
    the work LSH is supposed to save vs the O(n²) all-pairs join.
    """
    docs = t(spark, sf_dir, "documents")
    base = (docs
            .select("doc_id", _shingles(_tokens()).alias("shingles"))
            .filter(F.size("shingles") > 0))
    rows_per_band = MINHASH_K // LSH_BANDS
    sig = base.select(
        "doc_id",
        *[_minhash(F.col("shingles"), i).alias(f"mh{i}")
          for i in range(MINHASH_K)],
    )
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *[
                    f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
                ])).alias("bucket"),
            )
            for b in range(LSH_BANDS)
        ])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (a.join(b, ["band", "bucket"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"), "band"))
    return (pairs.groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_shared_bands")))


_ROWS_PER_BAND = MINHASH_K // LSH_BANDS
_LSH_PAIRS_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
), nz AS (
  SELECT * FROM sh WHERE len(shingles) > 0
), mh AS (
  SELECT doc_id,
         {", ".join(f"{_sql_minhash(i)} AS mh{i}" for i in range(MINHASH_K))}
  FROM nz
), bands AS (
  {" UNION ALL ".join(
      "SELECT doc_id, " + str(b) + " AS band, md5("
      + " || '|' || ".join(
          f"mh{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND))
      + ") AS bucket FROM mh"
      for b in range(LSH_BANDS))}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       COUNT(*) AS n_shared_bands
FROM bands a JOIN bands b USING (band, bucket)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash: token bit b = high bit of md5(token)'s b-th hex
    digit; each token votes ±1 per bit (term frequency = vote weight);
    fingerprint bit = sign of the vote. Narrow map, zero shuffle."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens()
    base = (docs.select("doc_id", toks.alias("toks"))
            .filter((F.size("toks") > 0) & (F.col("toks")[0] != "")))
    hashed = base.select(
        "doc_id", F.transform("toks", F.md5).alias("hs"))

    def bit_vote(b: int) -> Column:
        return F.aggregate(
            "hs", F.lit(0),
            lambda acc, h: acc + F.when(
                F.substring(h, b + 1, 1).rlike("[89a-f]"), 1).otherwise(-1))

    votes = hashed.select(
        "doc_id",
        *[bit_vote(b).alias(f"v{b}") for b in range(SIMHASH_BITS)])
    return votes.select(
        "doc_id",
        F.concat(*[
            F.when(F.col(f"v{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for b in range(SIMHASH_BITS)
        ]).alias("simhash"),
    )


_SIMHASH_SQL = f"""
WITH tk AS (
  SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
), nz AS (
  SELECT doc_id, list_transform(toks, t -> md5(t)) AS hs
  FROM tk WHERE len(toks) > 0 AND toks[1] <> ''
), v AS (
  SELECT doc_id,
         {", ".join(
             "list_sum(list_transform(hs, h -> CASE WHEN "
             f"substring(h, {b + 1}, 1) SIMILAR TO '[89a-f]' "
             "THEN 1 ELSE -1 END)) AS v" + str(b)
             for b in range(SIMHASH_BITS))}
  FROM nz
)
SELECT doc_id,
       {" || ".join(
           f"(CASE WHEN v{b} > 0 THEN '1' ELSE '0' END)"
           for b in range(SIMHASH_BITS))} AS simhash
FROM v
"""


# --------------------------------------------------------------------------
# Exact n-gram Jaccard within blocking buckets
# --------------------------------------------------------------------------

def docs_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard over distinct word-3-gram sets, blocked by
    (lang, length-bucket) so the self-join is bucket-local — the O(n²)
    blowup is bounded per block instead of per corpus. At 100 TB this is
    the verifier applied to LSH candidates; array_intersect/array_union
    stay JVM-side."""
    docs = t(spark, sf_dir, "documents")
    base = (docs.select(
        "doc_id", "lang",
        F.floor(F.col("n_chars") / JACCARD_BLOCK_CHARS).alias("len_bucket"),
        F.array_distinct(_shingles(_tokens())).alias("grams"))
        .filter(F.size("grams") > 0))
    a, b = base.alias("a"), base.alias("b")
    pairs = (a.join(b, ["lang", "len_bucket"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id")))
    inter = F.size(F.array_intersect("a.grams", "b.grams"))
    union = F.size(F.array_union("a.grams", "b.grams"))
    return (pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_MIN))


_JACCARD_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         CAST(floor(n_chars / {JACCARD_BLOCK_CHARS}) AS BIGINT) AS len_bucket,
         list_distinct({_SQL_SHINGLES}) AS grams
  FROM documents
), nz AS (
  SELECT * FROM base WHERE len(grams) > 0
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(a.grams || b.grams)), 4) AS jaccard
FROM nz a JOIN nz b USING (lang, len_bucket)
WHERE a.doc_id < b.doc_id
  AND ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / len(list_distinct(a.grams || b.grams)), 4) >= {JACCARD_MIN}
"""


# --------------------------------------------------------------------------
# Language identification (stopword vote)
# --------------------------------------------------------------------------

_LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "von", "mit", "auf", "ein"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "dans", "que", "une"),
    "es": ("el", "la", "los", "y", "es", "no", "por", "con", "para", "una"),
}
_LANG_ORDER = ("en", "de", "fr", "es")


def docs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-heuristic language ID: count stopword hits per language,
    argmax with fixed precedence en>de>fr>es on ties. Narrow map."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens()
    base = docs.select("doc_id", "lang", toks.alias("toks"))
    counts = base.select(
        "doc_id", "lang",
        *[F.size(F.filter("toks", lambda x: x.isin(*ws))).alias(f"hits_{lg}")
          for lg, ws in _LANG_STOPWORDS.items()])
    pred = F.lit("und")
    for lg in reversed(_LANG_ORDER):
        others = [o for o in _LANG_ORDER if o != lg]
        cond = (F.col(f"hits_{lg}") > 0)
        for o in others:
            earlier = _LANG_ORDER.index(o) < _LANG_ORDER.index(lg)
            cond = cond & (
                F.col(f"hits_{lg}") > F.col(f"hits_{o}") if earlier
                else F.col(f"hits_{lg}") >= F.col(f"hits_{o}"))
        pred = F.when(cond, F.lit(lg)).otherwise(pred)
    return counts.select(
        "doc_id", "lang",
        *[f"hits_{lg}" for lg in _LANG_ORDER],
        pred.alias("lang_pred"),
    )


def _sql_hits(lg: str) -> str:
    ws = ", ".join(f"'{w}'" for w in _LANG_STOPWORDS[lg])
    return f"len(list_filter(toks, x -> x IN ({ws})))"


def _sql_pred() -> str:
    expr = "'und'"
    for lg in reversed(_LANG_ORDER):
        conds = [f"hits_{lg} > 0"]
        for o in _LANG_ORDER:
            if o == lg:
                continue
            op = ">" if _LANG_ORDER.index(o) < _LANG_ORDER.index(lg) else ">="
            conds.append(f"hits_{lg} {op} hits_{o}")
        expr = f"CASE WHEN {' AND '.join(conds)} THEN '{lg}' ELSE {expr} END"
    return expr


_LANGID_SQL = f"""
WITH tk AS (
  SELECT doc_id, lang, {_SQL_TOKENS} AS toks FROM documents
), counts AS (
  SELECT doc_id, lang,
         {", ".join(f"{_sql_hits(lg)} AS hits_{lg}" for lg in _LANG_ORDER)}
  FROM tk
)
SELECT doc_id, lang, {", ".join(f"hits_{lg}" for lg in _LANG_ORDER)},
       {_sql_pred()} AS lang_pred
FROM counts
"""


# --------------------------------------------------------------------------
# Dedup keeper selection (end-to-end: who survives dedup?)
# --------------------------------------------------------------------------

def docs_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup decision: normalize → fingerprint → keep min doc_id per
    fingerprint group. Output is each doc with its keeper — the shape a
    training-data pipeline materializes before filtering."""
    docs = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    fp = docs.select("doc_id", F.md5(norm).alias("fp"))
    w = Window.partitionBy("fp")
    return (fp.withColumn("keeper_doc_id", F.min("doc_id").over(w))
            .withColumn("is_dup", (F.col("doc_id") != F.col("keeper_doc_id"))
                        .cast("int"))
            .select("doc_id", "keeper_doc_id", "is_dup"))


_DEDUP_KEEPERS_SQL = """
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)),
                                                         '\\s+', ' ', 'g')))
         AS keeper_doc_id,
       CAST(doc_id <> MIN(doc_id) OVER (
           PARTITION BY md5(regexp_replace(lower(trim(text)),
                                           '\\s+', ' ', 'g'))) AS INT)
         AS is_dup
FROM documents
"""


SPARK_QUERIES = {
    "docs_minhash_signature": docs_minhash_signature,
    "docs_minhash_lsh_pairs": docs_minhash_lsh_pairs,
    "docs_simhash": docs_simhash,
    "docs_ngram_jaccard_pairs": docs_ngram_jaccard_pairs,
    "docs_langid": docs_langid,
    "docs_dedup_keepers": docs_dedup_keepers,
}

ORACLE_SQL = {
    "docs_minhash_signature": _MINHASH_SIG_SQL,
    "docs_minhash_lsh_pairs": _LSH_PAIRS_SQL,
    "docs_simhash": _SIMHASH_SQL,
    "docs_ngram_jaccard_pairs": _JACCARD_SQL,
    "docs_langid": _LANGID_SQL,
    "docs_dedup_keepers": _DEDUP_KEEPERS_SQL,
}
