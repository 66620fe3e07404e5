"""SQL-registerable function surface of the engine.

``register_all(spark)`` exposes the engine's scalar/tabular text ops to
plain ``spark.sql`` users, so every capability is reachable from SQL as
well as the DataFrame API:

    ocr_extract_text(html)       -> main-content text (boilerplate-stripped)
    ocr_minhash_sig(text)        -> 32-hex MinHash signature digest
    ocr_simhash(text)            -> 32-char SimHash bit string
    ocr_rolling_hash(text)       -> Rabin-Karp polynomial hash (bigint)
    ocr_langid(text)             -> stopword-vote language guess
    ocr_token_count(text)        -> BPE-ish pre-tokenizer token count
    split_sentences(text)        -> UDTF: (sent_idx, sentence) rows
    ocr_pub_date(html)           -> publication date (jsonld > meta > NULL)
    ocr_consent_wall(html)       -> cookie-wall flag (class OR lexicon)
    ocr_table_rows(html)         -> UDTF: typed (row_idx, metric, value, unit)
    ocr_rake_phrases(text)       -> UDTF: RAKE (rank, phrase, score)

Scalar functions are Arrow-batched pandas UDFs (never row-at-a-time
Python). The MinHash body delegates to the SAME kernel the DataFrame
query uses (identical by construction); langid/token_count build from
the SAME constants as the dataops expressions (stopword sets,
precedence order, BPE pattern imported — a drift would need both
surfaces edited in one place); simhash/rolling-hash are Python mirrors.
All five are pinned value-for-value against the DataFrame queries by
tests/test_functions.py.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import SparkSession, functions as F

# the single source of truth for cross-surface semantics: the DataFrame
# queries' own constants
from ocr_spark.plans.dataops import (
    _BPE_PAT, _LANG_ORDER, _LANG_STOPWORDS, SIMHASH_BITS as _SIMHASH_BITS,
)

_BPE_RE = re.compile(_BPE_PAT)
_WS_RE = re.compile(r"\s+")


def _minhash_sig(text: str) -> str | None:
    # delegates to the SAME kernel the DataFrame query uses
    from ocr_spark.plans.dataops import minhash_vec_py
    mins = minhash_vec_py(text)
    if mins is None:
        return None
    return hashlib.md5("|".join(str(v) for v in mins).encode()).hexdigest()


def _simhash(text: str) -> str | None:
    toks = _WS_RE.split((text or "").lower().strip())
    if not toks or toks == [""]:
        return None
    votes = [0] * _SIMHASH_BITS
    for t in toks:
        m = hashlib.md5(t.encode()).hexdigest()
        for b in range(_SIMHASH_BITS):
            votes[b] += 1 if m[b] in "89abcdef" else -1
    return "".join("1" if v > 0 else "0" for v in votes)


def _rolling_hash(text: str) -> int:
    norm = _WS_RE.sub(" ", (text or "").lower().strip())
    acc = 0
    for ch in norm:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    return acc


def _langid(text: str) -> str:
    toks = _WS_RE.split((text or "").lower().strip())
    hits = {lg: sum(1 for t in toks if t in ws)
            for lg, ws in _LANG_STOPWORDS.items()}
    best = "und"
    for lg in reversed(_LANG_ORDER):
        ok = hits[lg] > 0
        for o in _LANG_ORDER:
            if o == lg:
                continue
            if _LANG_ORDER.index(o) < _LANG_ORDER.index(lg):
                ok = ok and hits[lg] > hits[o]
            else:
                ok = ok and hits[lg] >= hits[o]
        if ok:
            best = lg
    return best


def register_all(spark: SparkSession) -> None:
    """Register every function on the session (idempotent)."""

    @F.pandas_udf("string")
    def ocr_extract_text(html: pd.Series) -> pd.Series:
        from ocr_spark.core.html_extract import extract_html
        return html.map(lambda h: extract_html(h or "")[0])

    @F.pandas_udf("string")
    def ocr_minhash_sig(text: pd.Series) -> pd.Series:
        return text.map(_minhash_sig)

    @F.pandas_udf("string")
    def ocr_simhash(text: pd.Series) -> pd.Series:
        return text.map(_simhash)

    @F.pandas_udf("long")
    def ocr_rolling_hash(text: pd.Series) -> pd.Series:
        return text.map(_rolling_hash)

    @F.pandas_udf("string")
    def ocr_langid(text: pd.Series) -> pd.Series:
        return text.map(_langid)

    @F.pandas_udf("int")
    def ocr_token_count(text: pd.Series) -> pd.Series:
        return text.map(lambda t: len(_BPE_RE.findall(t or "")))

    for name, fn in [
        ("ocr_extract_text", ocr_extract_text),
        ("ocr_minhash_sig", ocr_minhash_sig),
        ("ocr_simhash", ocr_simhash),
        ("ocr_rolling_hash", ocr_rolling_hash),
        ("ocr_langid", ocr_langid),
        ("ocr_token_count", ocr_token_count),
    ]:
        spark.udf.register(name, fn)

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            i = 0
            for s in re.findall(r"[^.]+(?:\.|$)", text or ""):
                s = s.strip()
                if s:
                    yield i, s
                    i += 1

    spark.udtf.register("split_sentences", SplitSentences)

    @F.pandas_udf("string")
    def ocr_pub_date(html: pd.Series) -> pd.Series:
        return html.map(_pub_date)

    @F.pandas_udf("boolean")
    def ocr_consent_wall(html: pd.Series) -> pd.Series:
        return html.map(_consent_wall)

    spark.udf.register("ocr_pub_date", ocr_pub_date)
    spark.udf.register("ocr_consent_wall", ocr_consent_wall)

    @udtf(returnType="row_idx int, metric string, value bigint, "
                     "unit string")
    class TableRows:
        def eval(self, html: str):
            for i, row in enumerate(
                    _TR_RE.findall(html or "")):
                cells = _TD_RE.findall(row)
                if len(cells) >= 3:
                    try:
                        v = int(cells[1])
                    except ValueError:
                        continue
                    yield i, cells[0], v, cells[2]

    spark.udtf.register("ocr_table_rows", TableRows)

    @udtf(returnType="rank int, phrase string, score double")
    class RakePhrases:
        def eval(self, text: str):
            for rank, phrase, score in _rake_phrases(text or ""):
                yield rank, phrase, score

    spark.udtf.register("ocr_rake_phrases", RakePhrases)


# python mirrors of the final-session plan kernels (same constants,
# pinned value-for-value by tests/test_functions.py)

_META_PUB_RE = re.compile(
    '<meta property="article:published_time" content="([^"]*)"')
_JSONLD_RE = re.compile(
    r'<script type="application/ld\+json">(.*?)</script>', re.DOTALL)
_DATE_PUBLISHED_RE = re.compile('"datePublished":"([^"]*)"')
_CONSENT_DIV_RE = re.compile('<div class="cookie-banner">([^<]*)</div>')
_TR_RE = re.compile("<tr>(.*?)</tr>")
_TD_RE = re.compile("<td>([^<]*)</td>")


def _pub_date(html: str | None) -> str | None:
    """jsonld > meta > None — the pages_date_extract precedence."""
    h = html or ""
    m = _JSONLD_RE.search(h)
    if m:
        d = _DATE_PUBLISHED_RE.search(m.group(1))
        if d and d.group(1):
            return d.group(1)
    m = _META_PUB_RE.search(h)
    return m.group(1) if m and m.group(1) else None


def _consent_wall(html: str | None) -> bool:
    from ocr_spark.plans.htmlfeat import _CONSENT_PHRASES
    h = html or ""
    if _CONSENT_DIV_RE.search(h):
        return True
    low = h.lower()
    return sum(1 for p in _CONSENT_PHRASES if p in low) >= 2


def _rake_phrases(text: str):
    """Python mirror of docs_keyphrases_rake's segmentation + integer
    micro-unit score algebra (same constants imported)."""
    from ocr_spark.plans.dataops import _RAKE_SPLIT, RAKE_TOP_K
    clean = re.sub("[^a-z0-9]+", " ", (text or "").lower())
    segs = [re.sub(" +", " ", s).strip()
            for s in re.split(_RAKE_SPLIT, clean)]
    phrases = [s for s in segs if s]
    if not phrases:
        return
    freq: dict[str, int] = {}
    degree: dict[str, int] = {}
    for p in phrases:
        ws = p.split(" ")
        for w in ws:
            freq[w] = freq.get(w, 0) + 1
            degree[w] = degree.get(w, 0) + len(ws)
    score = {p: sum(degree[w] * 1_000_000 // freq[w]
                    for w in p.split(" ")) for p in set(phrases)}
    ranked = sorted(set(phrases), key=lambda p: (-score[p], p))
    for rank, p in enumerate(ranked[:RAKE_TOP_K], start=1):
        yield rank, p, round(score[p] / 1e6, 6)
