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
