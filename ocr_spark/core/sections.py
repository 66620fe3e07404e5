"""Cross-page stateful section-header parser (W3).

Reimplements the semantics of the reference's ``HeaderParser``
(/root/reference/service/core/layout.py:11-81): a small state machine fed
one page's worth of header strings at a time, tracking part / chapter /
section number / section title, and emitting the *current section number*
(or "") which the caller stamps onto every box of the page
(layout.py:164-167).

Deliberate deviation (documented in SURVEY.md §2.5 W3): the reference keeps
one module-global parser whose state leaks across HTTP requests
(layout.py:83). Here the parser is instantiated per document — the unit of
parallelism — so results are independent of document order. Golden fixtures
are generated per-document, so the leak never manifests in them either.
"""

from __future__ import annotations

import re

_PART_RE = re.compile(r"^(Part|PART)\s*([IVX0-9]+|[A-Z])\s*(.*)", re.IGNORECASE)
_CHAPTER_RE = re.compile(r"^(Chapter|CHAPTER)\s*([0-9]+)\s*(.*)", re.IGNORECASE)
_SECTION_EXPLICIT_RE = re.compile(r"^(Section|§)\s*([0-9]+)\s*(.*)", re.IGNORECASE)
_SECTION_NUMERIC_RE = re.compile(r"^([0-9]+\.[0-9]+)\s+(.*)")
_SPECIAL_RE = re.compile(
    r"^(Preface|Contents|Index|Bibliography|Appendix|Problems|Notes|Exercises)",
    re.IGNORECASE,
)

# priority order: parts first, then chapters, then everything else
# (layout.py:29-38)


class SectionTracker:
    """Per-document section state machine."""

    def __init__(self) -> None:
        self.part: str | None = None
        self.chapter: str | None = None
        self.section_num: str | None = None
        self.section_title: str | None = None

    def _priority(self, text: str) -> int:
        if _PART_RE.match(text):
            return 1
        if _CHAPTER_RE.match(text):
            return 2
        return 3

    def feed_page(self, headers: list[str]) -> str:
        """Consume one page's header strings; return current section number
        ("" when none is known yet) — the value stamped as ``section_info``.
        """
        if not headers:
            return self.current()

        for text in sorted(headers, key=self._priority):
            clean = text.strip()

            if _PART_RE.match(clean):
                self.part = clean
                continue

            if _CHAPTER_RE.match(clean):
                self.chapter = clean
                self.section_num = None
                self.section_title = None
                continue

            num = title = None
            m = _SECTION_EXPLICIT_RE.match(clean)
            if m:
                num, title = m.group(2), m.group(3).strip()
            else:
                m = _SECTION_NUMERIC_RE.match(clean)
                if m:
                    num, title = m.group(1), m.group(2).strip()

            if num:
                # adopt a new number, or a longer title for the same number
                if (self.section_num != num) or (
                    title and (not self.section_title
                               or len(title) > len(self.section_title))
                ):
                    self.section_num = num
                    self.section_title = title
                continue

            if _SPECIAL_RE.match(clean):
                self.section_title = clean

        return self.current()

    def current(self) -> str:
        return self.section_num if self.section_num else ""
