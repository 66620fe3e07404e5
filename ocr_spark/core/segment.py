"""Rule-based sentence segmentation — deterministic U4 port.

The reference segments paragraphs with pysbd (``Segmenter(language="en",
clean=False)``, /root/reference/service/api/services.py:15,130), protected
by an ``"Eq." → "EqⒹ"`` sentinel swap so equation abbreviations do not end
sentences (services.py:129-131, quirk X5 — the sentinel handling lives in
the caller, see fixture_extract.py).

pysbd is unavailable offline, so this is a deterministic rule port of the
pysbd-en behavior classes the corpus (and adversarial tests) exercise:

  * **boundaries** — sentences end at a ``. ! ?`` run, optionally followed
    by closing quotes/brackets (``." .' .) ?!``), then whitespace and an
    uppercase letter, digit, or opening bracket/quote;
  * **abbreviations** — common abbreviations (Fig., Eq., No., et al.,
    e.g., i.e., vs., Dr., …) never end a sentence, even before a capital
    (pysbd's prepositive/number-abbreviation rules collapsed into one
    list, adequate for this corpus);
  * **decimals** — a period with no following whitespace (``3.14``,
    ``$5.50``, ``v2.0``) is never a boundary (the boundary regex requires
    trailing whitespace, mirroring pysbd's PeriodBeforeNumberRule);
  * **ellipsis** — ``...`` (or ``..``, ``?!`` runs) is consumed as one
    boundary run and stays with the preceding sentence when followed by
    whitespace + capital; ``I... don't`` (lowercase next) does not split;
  * **quotes** — ``He said "Stop." Then…`` splits AFTER the closing
    quote, keeping the quote with its sentence (pysbd quotation handling);
  * **list markers** (pysbd ListItemReplacer / alphabetical-list rules,
    long-tail classes from VERDICT r2 #6) — a numbered or lettered list
    marker (``1.``, ``(12)``, ``a.``, ``B.``, roman-style single
    letters) that is the ENTIRE sentence-so-far attaches to its item
    instead of becoming a one-token sentence: ``1. Install it. 2. Run
    it.`` → ``["1. Install it.", "2. Run it."]``. The same rule keeps
    name initials (``A. Einstein``) and roman section markers
    (``I. Introduction``) unsplit;
  * **multi-char punctuation** — ``!!``/``?!``/``!?`` runs and the
    Unicode ellipsis ``…`` are consumed as ONE boundary run (``Stop!!
    Now.`` splits after ``!!``; ``Wait… what?`` does not split before a
    lowercase continuation).

  * **roman-numeral markers** — MULTI-char roman markers (``IV.``,
    ``xii)``) follow the same whole-chunk list rule: ``IV. Deploy the
    job.`` keeps the marker with its item, while ``He became Henry
    IV. Then the war began.`` still splits (the chunk before the
    boundary is a full sentence, not a bare marker);
  * **newline list re-flow** (pysbd ListItemReplacer's line-anchored
    rule) — a newline followed by a list marker (``1.``, ``(2)``,
    ``a)``, ``IV.``) is a boundary even when the previous line has no
    terminal punctuation: ``"1. install\\n2. run"`` → two items.

  * **between-punctuation suppression** (pysbd's BetweenPunctuation
    scanner, the last r2-documented tail) — boundary punctuation
    strictly INSIDE a matched paren/bracket/quote span never splits:
    ``He said (it is done. Truly) and left.`` stays one sentence. A
    span-FINAL run (``works.)``, ``Stop."``) still splits after the
    closing delimiter — pysbd reaches the same end state through its
    quotation/parens end-of-sentence rules, and this port's boundary
    regex already consumes the closing run. Matched pairs only: an
    unclosed ``(`` or ``"`` suppresses nothing (pysbd's regexes
    likewise require the closing delimiter). Single-quote spans use
    pysbd's whitespace-anchored open + non-word close so apostrophes
    (``don't``, ``cats'``) never open a span.

Like pysbd with ``clean=False``, the returned sentences are exact
substrings of the input (nothing inserted or rewritten); only the
inter-sentence whitespace runs are dropped.
"""

from __future__ import annotations

import re

_ABBREV = (
    "fig", "figs", "eq", "eqs", "no", "nos", "al", "e.g", "i.e", "vs",
    "cf", "etc", "dr", "mr", "mrs", "ms", "prof", "sec", "chap", "vol",
)

# punctuation run + optional closing quotes/brackets, then whitespace,
# then an upper/digit/opening-bracket/opening-quote sentence starter
_BOUNDARY_RE = re.compile(
    r"(?P<p>[.!?…]+[\"'”’)\]]*)\s+(?=[A-Z0-9(\[“\"'])")

# a sentence-so-far that is ONLY a list marker: optional open bracket,
# a 1-3 digit number, a single letter, or a multi-char roman numeral,
# optional close bracket (the boundary's own punctuation run is not
# part of the candidate)
_LIST_MARKER_RE = re.compile(
    r"^\(?(?:\d{1,3}|[A-Za-z]|[IVXLCDM]{2,7}|[ivxlcdm]{2,7})\)?$")

# newline-anchored list item: the whitespace run containing a newline,
# followed (unconsumed) by a list marker + '.' or ')' + space — a
# boundary even without terminal punctuation on the previous line
_NL_LIST_RE = re.compile(
    r"[ \t]*\n\s*"
    r"(?=\(?(?:\d{1,3}|[A-Za-z]|[IVXLCDM]{2,7}|[ivxlcdm]{2,7})[.)]\s)")


# single-quote span: opening ' must follow whitespace/start, closing '
# must not be followed by a word char; an apostrophe inside a word
# (don't) satisfies neither side. pysbd: between_punctuation.py's
# BETWEEN_SINGLE_QUOTES_REGEX uses the same whitespace-anchored shape.
_SQUOTE_RE = re.compile(r"(?:(?<=\s)|^)'(?:[^']|'(?=[A-Za-z]))*'(?!\w)")
_DQUOTE_RE = re.compile(r"\"[^\"]*\"|“[^”]*”")
_TERM = ".!?…"
_CLOSERS = "\"'”’)]"


def _suppressed_boundaries(paragraph: str) -> set[int]:
    """Positions of terminal punctuation that sit strictly inside a
    matched paren/bracket/quote span (pysbd BetweenPunctuation): these
    never start a sentence boundary. A run that extends through
    closing-delimiter characters to the span's own close (``ok.)``) is
    span-final and is NOT suppressed — the split lands after the close."""
    spans: list[tuple[int, int]] = []
    stack: dict[str, list[int]] = {"(": [], "[": []}
    for i, ch in enumerate(paragraph):
        if ch in "([":
            stack[ch].append(i)
        elif ch == ")" and stack["("]:
            spans.append((stack["("].pop(), i))
        elif ch == "]" and stack["["]:
            spans.append((stack["["].pop(), i))
    for rx in (_DQUOTE_RE, _SQUOTE_RE):
        spans.extend((m.start(), m.end() - 1) for m in rx.finditer(paragraph))
    out: set[int] = set()
    for lo, hi in spans:
        for i in range(lo + 1, hi):
            if paragraph[i] not in _TERM:
                continue
            tail = paragraph[i:hi]
            if all(c in _TERM or c in _CLOSERS for c in tail):
                continue  # span-final run — boundary after the close
            out.add(i)
    return out


def _ends_with_abbrev(chunk: str) -> bool:
    # the word before the boundary punctuation run ends `chunk`
    m = re.search(r"([A-Za-z][A-Za-z.]*)$", chunk)
    if not m:
        return False
    word = m.group(1).lower().rstrip(".")
    return word in _ABBREV


def segment_sentences(paragraph: str) -> list[str]:
    """Split a paragraph into sentences (deterministic pysbd-en port)."""
    if not paragraph:
        return []
    parts = _NL_LIST_RE.split(paragraph)
    if len(parts) > 1:
        out: list[str] = []
        for p in parts:
            out.extend(segment_sentences(p))
        return out
    sentences: list[str] = []
    suppressed = _suppressed_boundaries(paragraph)
    start = 0
    for m in _BOUNDARY_RE.finditer(paragraph):
        if m.start() < start:
            continue  # boundary inside an already-consumed region
        if m.start("p") in suppressed:
            continue  # inside a matched paren/quote span
        end = m.end("p")  # include punctuation + closing quotes
        before = paragraph[start:m.start("p")]
        if _ends_with_abbrev(before):
            continue
        if _LIST_MARKER_RE.match(before.strip()):
            continue  # list marker / initial stays with its item
        sentences.append(paragraph[start:end])
        # skip the whitespace run after the boundary
        ws = re.match(r"\s+", paragraph[end:])
        start = end + (ws.end() if ws else 0)
    if start < len(paragraph):
        sentences.append(paragraph[start:])
    return sentences
