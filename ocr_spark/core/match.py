"""Mention→target matching (J2) and section-scoped reference pairing (J3).

Reimplements the consumer side of the reference's document graph
(/root/reference/service/core/graph.py) *without materializing a graph*:
the only graph consumers are (a) section membership — an equi-group on
``int(float(section_info))`` standing in for the ``Section_k`` hierarchical
edges (graph.py:78-88, 182-190) — and (b) the name match + min-distance
tie-break of ``find_target_with_name`` (graph.py:112-156).  Sequence edges
(graph.py:60-76) feed only the debug renderer and are not needed for output
correctness (SURVEY.md §2.3 J4).
"""

from __future__ import annotations

import math
import re

VALID_NODE_TYPES = (
    "doc_title", "paragraph_title", "section", "text", "abstract",
    "references", "sidebar_text", "display_formula", "algorithm", "table",
    "figure", "chart", "image", "formula_number", "page_number", "number",
    "footnote", "chart_title",
)
IGNORED_NODE_TYPES = ("header", "footer", "header_image", "footer_image",
                      "seal")
MATCH_TARGET_TYPES = ("image", "table", "figure", "chart", "algorithm",
                      "display_formula")

SECTION_ID_RANGE = range(1, 30)  # graph.py:79

# graph-side mention patterns (graph.py:114-116). NOTE the deliberate skew
# vs the predict-side filter: here plain 'Eq' is an equation keyword, there
# it is 'Eqs' (predict.py:168) — replicated verbatim (SURVEY.md X3).
_LABEL_RE = re.compile(
    r"\b(Figure|Fig|Table|Formula|Algorithm|Chart|Equation|Eq)"
    r"\s*\.?\s*\(?(\d+(\.\d+)?|[A-Za-z]+)\)?",
    re.IGNORECASE,
)
_LABEL_REVERSED_RE = re.compile(
    r"\b(\d+(\.\d+)?)\s*\.?\s*(Figure|Fig|Table|Formula|Algorithm|Chart"
    r"|Equation|Eq)",
    re.IGNORECASE,
)
_EQUATION_RE = re.compile(
    r"\b(Equation|Eq)\s*\.?\s*\(?\s*(\d+(\.\d+))\s*\)?", re.IGNORECASE
)
_BARE_EQNUM_RE = re.compile(r"\(\s*(\d+)\s*\)")


def flatten_pages_to_nodes(pages: list[dict]) -> list[dict]:
    """load_and_transform_data analog (graph.py:6-38): one node per box,
    ids ``pg{page}_box{i}`` over the page's full box list."""
    nodes: list[dict] = []
    for page in pages:
        page_index = page["page_index"]
        boxes = page.get("boxes") or []
        for i, box in enumerate(boxes):
            node = {
                "id": f"pg{page_index}_box{i}",
                "type": box["label"],
                "page": page_index,
                "bbox": list(box["coordinate"]),
            }
            for key in ("text", "ref_info", "section_info"):
                if key in box and box[key] is not None:
                    node[key] = box[key]
            nodes.append(node)
    return nodes


def _center(node: dict) -> tuple[float, float]:
    b = node["bbox"]
    return (b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0


def node_distance(a: dict, b: dict) -> float:
    """Euclidean center distance + |page delta| (graph.py:55-58)."""
    x1, y1 = _center(a)
    x2, y2 = _center(b)
    return math.hypot(x2 - x1, y2 - y1) + abs(a["page"] - b["page"])


def _normalize_kind(kind: str) -> str:
    """MENTION-side normalization (graph.py:126-128): fig→figure AND
    eq→equation."""
    kind = kind.lower()
    if kind == "fig":
        return "figure"
    if kind == "eq":
        return "equation"
    return kind


def _normalize_target_kind(kind: str) -> str:
    """TARGET-side normalization (graph.py:140,145): ONLY fig→figure —
    the reference never maps eq→equation here, so a caption "Eq. 3"
    keeps kind 'eq' and does NOT match mention kind 'equation'. This
    asymmetry is a reference quirk replicated verbatim."""
    kind = kind.lower()
    if kind == "fig":
        return "figure"
    return kind


def _parse_target_name(text: str) -> tuple[str, str] | None:
    """Parse (kind, number) from a candidate target's caption text, with the
    reference's exact precedence: reversed pattern → label pattern → bare
    "(n)" as an equation (graph.py:131-146)."""
    m = _LABEL_REVERSED_RE.search(text)
    if m:
        return _normalize_target_kind(m.group(3)), m.group(1)
    m = _LABEL_RE.search(text)
    if m:
        return _normalize_target_kind(m.group(1)), m.group(2)
    m = _BARE_EQNUM_RE.search(text)
    if m:
        return "equation", m.group(1)
    return None


def find_target_with_name(scope: list[dict], mention_text: str,
                          source: dict) -> dict | None:
    """J2: parse (kind, number) from the mention, equi-match against
    candidate captions, keep the FIRST match in scope order (the ``break``
    at graph.py:150), tie-break by distance (graph.py:152-154)."""
    m = _LABEL_RE.search(mention_text)
    if not m:
        m = _EQUATION_RE.search(mention_text)
    if not m:
        return None
    kind = _normalize_kind(m.group(1))
    num = m.group(2)

    candidates: list[dict] = []
    for target in scope:
        parsed = _parse_target_name(target.get("text", "") or "")
        if parsed and parsed == (kind, num):
            candidates.append(target)
            break  # reference stops at the first name match (graph.py:150)

    if not candidates:
        return None
    candidates.sort(key=lambda n: node_distance(n, source))
    return candidates[0]


def create_reference_pairs(pages: list[dict]) -> list[dict]:
    """J3: for every mention (ref_info) on a text node, resolve its target —
    first within the mention's section scope, then globally
    (graph.py:158-207)."""
    nodes = [n for n in flatten_pages_to_nodes(pages)
             if n["type"] not in IGNORED_NODE_TYPES]

    targets = [n for n in nodes if n["type"] in MATCH_TARGET_TYPES]
    sources = [n for n in nodes if n["type"] == "text"]

    # section membership == the hierarchical in-edges of Section_k
    # (graph.py:84-88): ANY node typed with that section, insertion order.
    members: dict[int, list[dict]] = {}
    for n in nodes:
        si = n.get("section_info")
        if si is None:
            continue
        try:
            k = int(float(si))
        except (TypeError, ValueError):
            continue
        if k in SECTION_ID_RANGE:
            members.setdefault(k, []).append(n)

    pairs: list[dict] = []
    for source in sources:
        ref_items = source.get("ref_info")
        if not ref_items:
            continue
        for item in ref_items:
            scope: list[dict] = []
            sec = item.get("section_info")
            if sec:
                try:
                    k = int(float(sec[0]))
                    if k not in SECTION_ID_RANGE:
                        # missing Section_k node → NetworkXError → fallback
                        # to all targets (graph.py:185-190)
                        raise KeyError(k)
                    scope = members.get(k, [])
                except Exception:
                    scope = targets

            best = find_target_with_name(scope, item.get("figure_text", ""),
                                         source)
            if not best:
                best = find_target_with_name(targets,
                                             item.get("figure_text", ""),
                                             source)
            if best:
                pairs.append({
                    "source_id": source["id"],
                    "page": source["page"],
                    "raw_text": item["raw_text"],
                    "figure_text": item["figure_text"],
                    "text_box": item["text_box"],
                    "ref": best,
                })
    return pairs
