"""Rule-based sentence segmentation — deterministic U4 port.

The reference segments paragraphs with pysbd (``Segmenter(language="en",
clean=False)``, /root/reference/service/api/services.py:15,130), protected
by an ``"Eq." → "EqⒹ"`` sentinel swap so equation abbreviations do not end
sentences (services.py:129-131, quirk X5 — the sentinel handling lives in
the caller, see fixture_extract.py).

pysbd is unavailable offline, so this is a small deterministic rule subset
covering the constructs the corpus produces: sentences end at ``. ! ?``
followed by whitespace and an uppercase letter, digit, or opening bracket;
common abbreviations (Fig., Eq., No., et al., e.g., i.e., vs.) do not end
sentences; trailing text forms the final sentence. Like pysbd with
``clean=False``, the concatenation of the returned sentences (with the
single separating spaces) reproduces the input string exactly.
"""

from __future__ import annotations

import re

_ABBREV = (
    "fig", "figs", "eq", "eqs", "no", "nos", "al", "e.g", "i.e", "vs",
    "cf", "etc", "dr", "mr", "mrs", "ms", "prof", "sec", "chap", "vol",
)

_BOUNDARY_RE = re.compile(r"([.!?])\s+(?=[A-Z0-9(\[“\"'])")


def _ends_with_abbrev(chunk: str) -> bool:
    # the char before the boundary punctuation ends `chunk`
    m = re.search(r"([A-Za-z][A-Za-z.]*)$", chunk)
    if not m:
        return False
    word = m.group(1).lower().rstrip(".")
    return word in _ABBREV


def segment_sentences(paragraph: str) -> list[str]:
    """Split a paragraph into sentences (deterministic pysbd-en subset)."""
    if not paragraph:
        return []
    sentences: list[str] = []
    start = 0
    for m in _BOUNDARY_RE.finditer(paragraph):
        end = m.end(1)  # include the punctuation
        before = paragraph[start:m.start(1)]
        if _ends_with_abbrev(before):
            continue
        sentences.append(paragraph[start:end])
        # skip the whitespace run after the boundary
        ws = re.match(r"\s+", paragraph[end:])
        start = end + (ws.end() if ws else 0)
    if start < len(paragraph):
        sentences.append(paragraph[start:])
    return sentences
