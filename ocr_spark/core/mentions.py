"""Deterministic figure/table/equation mention tagger — U6 replacement.

The reference tags mentions with a CRF (spaCy features → sklearn-crfsuite
BIO tags → span assembly, /root/reference/service/models/predict.py:153-181)
whose trained artifact is gitignored and unavailable.  Its *observable*
output, however, is gated by a regex post-filter (predict.py:165-176): every
surviving ref span is exactly ``match.group()`` of ``label_pattern`` /
``equation_pattern`` applied to the cleaned span text.  This module
reproduces that contract with a direct regex scan:

  1. preprocess the sentence exactly like the reference
     (predict.py:145-151, X8: pad letters before '.', isolate brackets,
     collapse whitespace);
  2. find candidate mention spans with whitespace-tolerant patterns;
  3. clean each span exactly like ``clean_span_text`` (predict.py:80-88, X7);
  4. keep ``match.group()`` of the reference's post-filter patterns
     (note the ``Eqs`` vs ``Eq`` skew between predict.py:168 and
     graph.py:116 — replicated verbatim);
  5. section spans ("Section 2.1" → "2.1") feed the section-scoped lookup
     (graph.py:182-190), which coerces them via ``int(float(s))``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# --- the reference's exact post-filter patterns (predict.py:167-168) ------
LABEL_PATTERN = re.compile(
    r"\b(Figure|Fig|Table|Formula|Algorithm|Chart|Equation|Eq)"
    r"\s*\.?\s*\(?(\d+(\.\d+)?|[A-Za-z]+)\)?",
    re.IGNORECASE,
)
EQUATION_PATTERN_PREDICT = re.compile(
    r"\b(Equation|Eqs)\s*\.?\s*\(?\s*(\d+(\.\d+)?)\s*\)?", re.IGNORECASE
)

# --- whitespace-tolerant candidate scanners (post-X8 text has padded
#     dots/brackets, so allow \s* at every seam) ---------------------------
# Identifier alternatives: numbers, roman numerals (case-sensitive via
# the (?-i:...) group — 'Table IV' is a reference the post-filter regex
# [A-Za-z]+ accepts, but lowercase prose after the keyword, e.g. 'the
# table shows', must NOT become a mention; the reference's CRF gates
# that case, our deterministic stand-in gates by form), or a single
# letter ('Figure A').
_CANDIDATE_REF_RE = re.compile(
    r"\b(Figure|Fig|Table|Formula|Algorithm|Chart|Equation|Eqs|Eq)"
    r"\s*\.?\s*\(?\s*(\d+(\.\d+)?|(?-i:[IVXLCDM]+)\b|[A-Za-z]\b)\s*\)?",
    re.IGNORECASE,
)
_CANDIDATE_SEC_RE = re.compile(
    r"\b(Section|Sec|§)\s*\.?\s*(\d+(\.\d+)*)", re.IGNORECASE
)


@dataclass
class MentionResult:
    """Shape-compatible with the reference's ReferenceInfo
    (predict.py:65-78)."""
    ref_info: list[str] = field(default_factory=list)
    raw_texts: list[str] = field(default_factory=list)
    section_info: list[str] = field(default_factory=list)
    order_info: list[str] = field(default_factory=list)


def preprocess_for_inference(text: str) -> str:
    """Exact X8 port (predict.py:145-151)."""
    text = re.sub(r"([a-zA-Z])\.", r"\1 .", text)
    text = re.sub(r"([()])", r" \1 ", text)
    text = re.sub(r"([\[\]])", r" \1 ", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text


def clean_span_text(text: str) -> str:
    """Exact X7 port (predict.py:80-88) applied to a span string."""
    text = re.sub(r"\s+\.", ".", text)
    text = re.sub(r"\(\s+", "(", text)
    text = re.sub(r"\s+\)", ")", text)
    text = re.sub(r"\[\s+", "[", text)
    text = re.sub(r"\s+\]", "]", text)
    return text


DEFAULT_CRF_ARTIFACT = "crf_tags_v1.json"


def _apply_crf_head(out: MentionResult) -> MentionResult:
    """U6 model-artifact seam (same dry-run pattern as the layout/OCR
    heads). ``OCR_SPARK_CRF_IMPL=artifact``: every emitted span's BIO
    tag round-trips through a REAL tag-vocabulary artifact loaded once
    per worker (the reference CRF's tagger emits tag ids the vocabulary
    decodes, predict.py:153-181; its model file is gitignored there).
    The spans are rebuilt FROM the decoded tags, so a truncated or
    reordered vocabulary either raises loudly (KeyError) or visibly
    changes output — the artifact is live in the dataflow, not
    decorative. Swapping a real CRF in replaces what ASSIGNS the tags,
    not this plumbing."""
    import os as _os

    if _os.environ.get("OCR_SPARK_CRF_IMPL", "fixture") != "artifact":
        return out
    from ocr_spark.core.artifacts import load_artifact
    model = load_artifact(_os.environ.get("OCR_SPARK_CRF_ARTIFACT",
                                          DEFAULT_CRF_ARTIFACT))
    index = model.get("_tag_index")
    if index is None:
        index = {t: i for i, t in enumerate(model["labels"])}
        model["_tag_index"] = index    # memoized on the cached artifact
    labels = model["labels"]
    tags = ["B-REF"] * len(out.ref_info) + ["B-SEC"] * len(out.section_info)
    ids = [index[t] for t in tags]           # encode: tag -> id
    decoded = [labels[i] for i in ids]       # decode: id -> tag
    spans = list(out.ref_info) + list(out.section_info)
    routed = MentionResult()
    routed.raw_texts = out.raw_texts
    routed.order_info = out.order_info
    for tag, span in zip(decoded, spans):
        if tag == "B-REF":
            routed.ref_info.append(span)
        elif tag == "B-SEC":
            routed.section_info.append(span)
    return routed


def tag_mentions(sentence: str) -> MentionResult:
    """Deterministic stand-in for ``predict_from_text`` (predict.py:153-181).

    Returns mention strings exactly as the reference post-filter would emit
    them, plus number-only section spans for the scoped lookup.
    """
    out = MentionResult()
    processed = preprocess_for_inference(sentence)

    for m in _CANDIDATE_REF_RE.finditer(processed):
        span = clean_span_text(m.group())
        fm = LABEL_PATTERN.search(span)
        if not fm:
            fm = EQUATION_PATTERN_PREDICT.search(span)
        if fm:
            out.ref_info.append(fm.group())

    for m in _CANDIDATE_SEC_RE.finditer(processed):
        out.section_info.append(m.group(2))

    if out.ref_info or out.section_info:
        out.raw_texts.append(sentence)

    return _apply_crf_head(out)
