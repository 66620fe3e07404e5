"""Main-content extraction from raw HTML: boilerplate stripping via DOM heuristics.

Pure Python, zero Spark imports — this module is shipped to executors via
``spark-submit --py-files`` and called only from inside Arrow-batched pandas
UDFs (never per-row driver Python).

Approach (public literature): shallow text features in the spirit of
Kohlschuetter et al., "Boilerplate Detection using Shallow Text Features"
(WSDM 2010) and jusText (Pomikalek 2011): the page is segmented into
block-level DOM regions; each block is scored by

  * link density      (chars inside <a> / total chars),
  * text density      (word count; very short isolated blocks are suspect),
  * stopword density  (function-word ratio — content prose is stopword-rich),
  * container class   (nav/header/footer/aside and class/id hints).

The reference system (/root/reference, CMDF/ocr) has no HTML path at all —
it is a PDF layout pipeline — so this module is specified by BASELINE.json's
north rule ("HTML boilerplate strip ... DOM heuristics") rather than by a
reference file.  The *output contract* (blocks with labels + char offsets,
byte-stable text per url) mirrors the reference's structured-document shape
(/root/reference/service/core/layout.py:169-177).

Determinism: the extractor is a pure function of the HTML bytes.  Extracted
text must be byte-identical per url across runs and across parallelism
levels — all iteration is document-ordered, no hashing, no floats in the
text path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

# Tags whose entire subtree is invisible text — never extracted.
DROP_TAGS = frozenset({
    "script", "style", "noscript", "template", "svg", "math", "head",
    "title", "meta", "link", "iframe", "object", "embed", "applet",
    "button", "select", "option", "datalist", "textarea", "canvas",
})

# Structural containers that are boilerplate by role.
BOILERPLATE_CONTAINERS = frozenset({"nav", "header", "footer", "aside", "form", "menu"})

# HTML void elements: never have content or an end tag. Those that are
# also DROP_TAGS (meta, link, embed) must NOT increment the drop depth —
# with no end tag ever coming, a bare <meta> would otherwise suppress
# every byte of text after it.
VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})

# Tags that open a new text block.
BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "body", "blockquote", "pre",
    "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "dl", "dt", "dd",
    "table", "thead", "tbody", "tr", "td", "th", "caption",
    "figure", "figcaption", "br", "hr", "address", "fieldset", "legend",
    "nav", "header", "footer", "aside", "form", "menu", "summary", "details",
})

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# class/id substrings that mark a subtree as boilerplate (classic heuristic).
_BAD_CLASS_RE = re.compile(
    r"(?:^|[-_ ])(?:nav|navbar|menu|footer|header|sidebar|side-bar|banner|"
    r"breadcrumbs?|ads?|advert\w*|sponsor\w*|cookie\w*|consent|popup|modal|"
    r"share|social|related|comments?|widget|promo|subscribe|newsletter|"
    r"pagination|paging|skip|toolbar|masthead)(?:$|[-_ ])",
    re.IGNORECASE,
)

# Small function-word lexicon for stopword density (English-leaning but the
# score only *ranks* blocks; non-English content blocks still win on length
# and link density).
STOPWORDS = frozenset(
    "the a an and or but of to in on for with at by from as is are was were "
    "be been it its this that these those he she they we you i not no do "
    "does did have has had will would can could should may might about into "
    "over under again then once here there all any both each few more most "
    "other some such only own same so than too very just der die das und "
    "ein eine le la les un une et de el los las y en un una".split()
)

_WS_RE = re.compile(r"[ \t\r\n\f\v ]+")
_WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)

# Labels reuse the reference taxonomy (/root/reference/service/core/graph.py:40-47).
LABEL_TEXT = "text"
LABEL_TITLE = "doc_title"
LABEL_PARA_TITLE = "paragraph_title"
LABEL_TABLE = "table"
LABEL_FIGURE = "figure"
LABEL_LIST = "text"


@dataclass
class RawBlock:
    """One DOM text block before classification."""
    tag: str
    depth: int
    text_parts: list[str] = field(default_factory=list)
    link_chars: int = 0
    total_chars: int = 0
    in_boiler_container: bool = False
    bad_class: bool = False
    dom_index: int = 0
    _text_cache: str | None = None

    def text(self) -> str:
        # memoized: called from _flush, extract_html, and _classify; the
        # parts list is final once the block is flushed
        if self._text_cache is None:
            self._text_cache = _WS_RE.sub(" ", "".join(self.text_parts)).strip()
        return self._text_cache


@dataclass
class Block:
    """Classified output block (schema: FIXTURES.md §2 `blocks` struct)."""
    block_id: int
    page_index: int
    label: str
    bbox: list[float]
    text: str
    char_start: int
    char_end: int
    section_info: str | None
    is_content: bool
    link_density: float
    stopword_density: float
    word_count: int


class _BlockParser(HTMLParser):
    """Streaming, event-driven parse: one pass, O(doc) memory in block list."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[RawBlock] = []
        self._stack: list[str] = []
        self._drop_depth = 0
        self._boiler_depth = 0
        self._badclass_depth = 0
        self._link_depth = 0
        self._cur: RawBlock | None = None
        self._dom_counter = 0

    # -- helpers ---------------------------------------------------------
    def _flush(self) -> None:
        if self._cur is not None and self._cur.text():
            self.blocks.append(self._cur)
        self._cur = None

    def _open_block(self, tag: str) -> None:
        self._flush()
        self._dom_counter += 1
        self._cur = RawBlock(
            tag=tag,
            depth=len(self._stack),
            in_boiler_container=self._boiler_depth > 0,
            bad_class=self._badclass_depth > 0,
            dom_index=self._dom_counter,
        )

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag == "body":
            # HTML allows omitting </head>; real Common-Crawl pages do.
            # <body> implicitly closes an open <head> — without this, the
            # head's drop-frame would swallow the entire document.
            for f in self._stack:
                if f.split("!", 1)[0] == "head":
                    self.handle_endtag("head")
                    break
        if tag in DROP_TAGS:
            if tag in VOID_TAGS:
                return  # contentless; no end tag will ever balance it
            self._drop_depth += 1
            self._stack.append(tag)
            return
        if attrs:
            attr_map = dict(attrs)
            classish = " ".join(
                v for k, v in attr_map.items()
                if k in ("class", "id", "role") and v
            )
            is_bad_class = bool(classish) and bool(_BAD_CLASS_RE.search(classish))
            is_boiler = tag in BOILERPLATE_CONTAINERS or (
                attr_map.get("role") in ("navigation", "banner",
                                         "contentinfo", "complementary")
            )
        else:
            is_bad_class = False
            is_boiler = tag in BOILERPLATE_CONTAINERS
        if is_boiler:
            self._boiler_depth += 1
        if is_bad_class:
            self._badclass_depth += 1
        if tag == "a":
            self._link_depth += 1
        self._stack.append(tag + ("!b" if is_boiler else "") + ("!c" if is_bad_class else ""))
        if tag in BLOCK_TAGS:
            self._open_block(tag)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        # pop matching frames conservatively (tolerates malformed HTML)
        for i in range(len(self._stack) - 1, -1, -1):
            frame = self._stack[i]
            base = frame.split("!", 1)[0]
            if base == tag:
                for f in self._stack[i:]:
                    b = f.split("!", 1)[0]
                    if b in DROP_TAGS:
                        self._drop_depth -= 1
                    else:
                        if "!b" in f:
                            self._boiler_depth -= 1
                        if "!c" in f:
                            self._badclass_depth -= 1
                        if b == "a":
                            self._link_depth -= 1
                del self._stack[i:]
                break
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth > 0 or not data:
            return
        if self._cur is None:
            self._open_block("div")
            assert self._cur is not None
        self._cur.text_parts.append(data)
        n = len(_WS_RE.sub(" ", data).strip())
        self._cur.total_chars += n
        if self._link_depth > 0:
            self._cur.link_chars += n

    def close(self) -> None:  # noqa: D102
        super().close()
        self._flush()


def _classify(raw: RawBlock) -> tuple[bool, str, float, float, int]:
    """Return (is_content, label, link_density, stopword_density, words)."""
    text = raw.text()
    words = _WORD_RE.findall(text)
    n_words = len(words)
    link_density = (raw.link_chars / raw.total_chars) if raw.total_chars else 1.0
    lower_words = [w.lower() for w in words]
    n_stop = sum(1 for w in lower_words if w in STOPWORDS)
    stop_density = (n_stop / n_words) if n_words else 0.0

    if raw.tag == "h1":
        label = LABEL_TITLE
    elif raw.tag in HEADING_TAGS:
        label = LABEL_PARA_TITLE
    elif raw.tag in ("table", "tr", "td", "th", "caption", "thead", "tbody"):
        label = LABEL_TABLE
    elif raw.tag in ("figure", "figcaption"):
        label = LABEL_FIGURE
    else:
        label = LABEL_TEXT

    if raw.in_boiler_container or raw.bad_class:
        return False, label, link_density, stop_density, n_words
    if link_density > 0.33:
        return False, label, link_density, stop_density, n_words
    if raw.tag in HEADING_TAGS:
        # headings are content if reasonably sized and link-free
        return n_words >= 1, label, link_density, stop_density, n_words
    if n_words < 3:
        return False, label, link_density, stop_density, n_words
    if n_words < 10 and stop_density < 0.05 and link_density > 0.0:
        return False, label, link_density, stop_density, n_words
    return True, label, link_density, stop_density, n_words


# ---------------------------------------------------------------------------
# Fast tag scanner
# ---------------------------------------------------------------------------
# stdlib html.parser is pure Python and was ~65% of kernel time under
# profile; this regex scanner drives the SAME _BlockParser handlers with
# the same event semantics (charref-converted data, lowercased tag/attr
# names, startendtag = start+end, script/style/textarea/title treated as
# raw text). Equivalence with the stdlib path is pinned by
# tests/test_properties.py::test_fast_scanner_equals_stdlib; extract_html
# falls back to the stdlib parser if the scanner throws.

from html import unescape as _unescape  # noqa: E402

RAWTEXT_TAGS = frozenset({"script", "style", "textarea", "title"})

_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][^\s/>]*)"
    r"((?:\s+[^\s/>=]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)\s*"
    r"(/?)>",
    re.DOTALL)
_ATTR_RE = re.compile(
    r"([^\s/>=]+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?")
_RAWTEXT_CLOSE = {
    t: re.compile(r"</" + t + r"\s*>", re.IGNORECASE) for t in RAWTEXT_TAGS
}


def _scan_fast(html: str, p: _BlockParser) -> None:
    pos, n = 0, len(html)
    find = html.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            data = html[pos:]
            p.handle_data(_unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html[pos:lt]
            p.handle_data(_unescape(data) if "&" in data else data)
        nxt = html[lt + 1:lt + 2]
        if nxt == "!":
            if html.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = n if end < 0 else end + 3
            else:
                end = find(">", lt)
                pos = n if end < 0 else end + 1
            continue
        if nxt == "?":
            end = find(">", lt)
            pos = n if end < 0 else end + 1
            continue
        m = _TAG_RE.match(html, lt)
        if m is None:
            p.handle_data("<")
            pos = lt + 1
            continue
        closing, name, attrstr, selfclose = m.groups()
        name = name.lower()
        pos = m.end()
        if closing:
            p.handle_endtag(name)
            continue
        attrs: list[tuple[str, str | None]] = []
        if attrstr:
            for am in _ATTR_RE.finditer(attrstr):
                v = am.group(2)
                if v is not None:
                    if v[:1] in "\"'":
                        v = v[1:-1]
                    if "&" in v:
                        v = _unescape(v)
                attrs.append((am.group(1).lower(), v))
        p.handle_starttag(name, attrs)
        if selfclose:
            p.handle_endtag(name)
        elif name in RAWTEXT_TAGS:
            cm = _RAWTEXT_CLOSE[name].search(html, pos)
            if cm:
                p.handle_data(html[pos:cm.start()])
                pos = cm.end()
            else:
                p.handle_data(html[pos:])
                pos = n
            p.handle_endtag(name)


def _parse_blocks_stdlib(html: str) -> _BlockParser:
    parser = _BlockParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # html.parser is forgiving; any residual error → best-effort flush
        parser._flush()
    return parser


def _parse_blocks(html: str) -> _BlockParser:
    try:
        parser = _BlockParser()
        _scan_fast(html, parser)
        parser._flush()
        return parser
    except Exception:
        return _parse_blocks_stdlib(html)


def extract_html(html: str, _stdlib: bool = False) -> tuple[str, list[Block]]:
    """Extract main content text + classified blocks from an HTML string.

    Returns ``(text, blocks)`` where ``text`` is the byte-stable extracted
    main content (content blocks joined with ``"\\n\\n"``) and ``blocks``
    covers *kept* blocks with char offsets into ``text`` (boilerplate blocks
    are recorded with ``char_start == char_end == -1``).
    """
    parser = _parse_blocks_stdlib(html) if _stdlib else _parse_blocks(html)

    blocks: list[Block] = []
    text_parts: list[str] = []
    pos = 0
    n_raw = max(len(parser.blocks), 1)
    for i, raw in enumerate(parser.blocks):
        text = raw.text()
        is_content, label, ld, sd, n_words = _classify(raw)
        # synthetic vertical-stack bbox: keeps the blocks schema uniform with
        # the PDF path (normalized [0,1], reference layout.py:111-119)
        bbox = [0.0, i / n_raw, 1.0, (i + 1) / n_raw]
        if is_content:
            start = pos
            if text_parts:
                start = pos + 2  # the "\n\n" joiner
            end = start + len(text)
            blocks.append(Block(
                block_id=len(blocks), page_index=0, label=label, bbox=bbox,
                text=text, char_start=start, char_end=end, section_info=None,
                is_content=True, link_density=ld, stopword_density=sd,
                word_count=n_words,
            ))
            if text_parts:
                pos += 2
            text_parts.append(text)
            pos += len(text)
        else:
            blocks.append(Block(
                block_id=len(blocks), page_index=0, label=label, bbox=bbox,
                text=text, char_start=-1, char_end=-1, section_info=None,
                is_content=False, link_density=ld, stopword_density=sd,
                word_count=n_words,
            ))
    return "\n\n".join(text_parts), blocks
