"""Page-geometry kernels: adjacent-run merge (A1), nested-box removal (F5),
caption↔target greedy pairing (J1).

These reproduce the reference's per-page box pipeline
(/root/reference/service/core/pre.py) as numpy/pure-Python kernels that run
*inside* the Arrow batch — the unit of Spark parallelism is the document, so
these order-dependent scans never cross a partition boundary (SURVEY.md §3.4).

J1 in particular is NOT expressible as a relational join: the greedy
``used`` set makes earlier captions steal targets from later ones
(pre.py:160-164), so it stays a sequential kernel by design.
"""

from __future__ import annotations

import numpy as np

from ocr_spark.core.lines import sort_fragments_reading_order

TARGET_LABELS = ("image", "table", "figure", "algorithm", "chart",
                 "display_formula")
TITLE_LABELS = ("figure_title", "figure_caption", "table_caption",
                "table_title", "chart_caption", "chart_title",
                "formula_number")

# containment tolerances — pre.py:234-235
X_TOL = 0.0086
Y_TOL = 0.0077

NARROW_WIDTH = 0.05  # pre.py:32
SUB_Y_MAX = 0.05     # pre.py:161


def merge_adjacent_targets(boxes: list[dict]) -> list[dict]:
    """A1: runs of target-labeled boxes (plus trailing narrow non-
    formula_number boxes, width < 0.05) merge into one bbox-union box that
    keeps the first box's cls_id/label/score — and drops everything else,
    including glyphs (pre.py:18-57).
    """
    if not boxes:
        return []
    out: list[dict] = []
    i, n = 0, len(boxes)
    while i < n:
        cur = boxes[i]
        if cur.get("label") in TARGET_LABELS:
            run = [cur]
            j = i + 1
            while j < n:
                b = boxes[j]
                c = b.get("coordinate")
                is_target = b.get("label") in TARGET_LABELS
                is_narrow = (b.get("label") != "formula_number"
                             and c[2] - c[0] < NARROW_WIDTH)
                if not (is_target or is_narrow):
                    break
                run.append(b)
                j += 1
            if len(run) == 1:
                out.append(cur)
            else:
                coords = [b["coordinate"] for b in run]
                out.append({
                    "cls_id": cur.get("cls_id"),
                    "label": cur.get("label"),
                    "score": cur.get("score"),
                    "coordinate": [min(c[0] for c in coords),
                                   min(c[1] for c in coords),
                                   max(c[2] for c in coords),
                                   max(c[3] for c in coords)],
                })
            i = j
        else:
            out.append(cur)
            i += 1
    return out


def remove_nested_boxes(boxes: list[dict]) -> list[dict]:
    """F5: drop any box contained (within X_TOL/Y_TOL) in another box.

    The reference does an O(n²) Python double loop (pre.py:259-266); at
    ≤ ~100 boxes/page the idiomatic batch-side form is one vectorized numpy
    pairwise mask — same complexity, ~100× less interpreter overhead.
    Mutually-contained boxes remove each other, exactly like the reference.
    Runs AFTER merge_adjacent_targets, mirroring pre.py:257.
    """
    boxes = merge_adjacent_targets(boxes)
    n = len(boxes)
    if n <= 1:
        return boxes
    c = np.asarray([b["coordinate"] for b in boxes], dtype=np.float64)
    x0, y0, x1, y1 = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    # contained[i, j] == True → box i is inside box j (with tolerances)
    contained = (
        (x0[:, None] >= x0[None, :] - X_TOL)
        & (x1[:, None] <= x1[None, :] + X_TOL)
        & (y0[:, None] >= y0[None, :] - Y_TOL)
        & (y1[:, None] <= y1[None, :] + Y_TOL)
    )
    np.fill_diagonal(contained, False)
    drop = contained.any(axis=1)
    return [b for b, d in zip(boxes, drop) if not d]


def caption_distance(title: dict, target: dict, formula_flag: bool) -> float:
    """Exact port of the J1 distance metric (pre.py:5-16): edge-based L1
    with a doubled vertical term; a side-band metric for formula numbers."""
    a = title["coordinate"]
    b = target["coordinate"]
    if formula_flag:
        if a[0] > b[2]:
            return abs(a[1] - b[1]) + abs(a[3] - b[3])
        return abs(b[1] - a[1]) + abs(b[3] - a[3])
    if a[1] > b[3]:
        return 2 * (a[1] - b[3]) + abs(a[0] - b[0]) + abs(a[2] - b[2])
    return 2 * (b[1] - a[3]) + abs(a[0] - b[0]) + abs(a[2] - b[2])


def _vertical_gap(a: dict, b: dict) -> float:
    """sub_y (pre.py:132-138): vertical distance between box edges."""
    ca, cb = a["coordinate"], b["coordinate"]
    if ca[1] > cb[3]:
        return ca[1] - cb[3]
    return cb[1] - ca[3]


DEFAULT_OCR_ARTIFACT = "ocr_head_v1.json"


def _apply_ocr_head(texts: list[str]) -> list[str]:
    """U2 model-artifact seam (same dry-run pattern as the layout head,
    fixture_extract.py::apply_layout_head).

    Default (``OCR_SPARK_OCR_IMPL=fixture``): glyph texts ARE the OCR
    output — pass through. ``OCR_SPARK_OCR_IMPL=artifact``: every glyph
    string round-trips through a REAL recognition-head artifact loaded
    once per worker — encoded into the artifact's charset ids and
    decoded back (the CTC-decode shape of the reference's PP-OCRv5
    head, /root/reference/service/core/ocr.py:10-22: crop → id sequence
    → charset lookup). A character missing from the charset raises
    loudly (KeyError → per-row error), exactly like a wrong charset
    file in production; swapping real recognition weights in changes
    what produces the id sequence, not this plumbing."""
    import os as _os

    if _os.environ.get("OCR_SPARK_OCR_IMPL", "fixture") != "artifact":
        return texts
    from ocr_spark.core.artifacts import load_artifact
    model = load_artifact(_os.environ.get("OCR_SPARK_OCR_ARTIFACT",
                                          DEFAULT_OCR_ARTIFACT))
    index = model.get("_char_index")
    if index is None:
        index = {c: i for i, c in enumerate(model["charset"])}
        model["_char_index"] = index   # memoized on the cached artifact
    charset = model["charset"]
    out = []
    for t in texts:
        ids = [index[c] for c in t]    # encode: char -> class id
        out.append("".join(charset[i] for i in ids))  # decode
    return out


def _ocr_title_text(box: dict) -> str:
    """Fixture-OCR of a caption box: the reference crops the page PNG and
    runs PP-OCRv5 (pre.py:146-149); here glyphs ARE the OCR ground truth.

    Non-formula captions go through reading-order sort then fragment concat
    with no separator (pre.py:147, 174-176); formula numbers take the first
    fragment of the (single) OCR result (pre.py:178-182).
    """
    glyphs = box.get("glyphs") or []
    if not glyphs:
        return ""
    texts = _apply_ocr_head([g["text"] for g in glyphs])
    if box.get("label") == "formula_number":
        return texts[0]
    frags = sort_fragments_reading_order(texts, [g["box"] for g in glyphs])
    return "".join(t for t, _ in frags)


def pair_captions_with_targets(boxes: list[dict]) -> list[dict]:
    """J1: greedy nearest caption↔target pairing with uniqueness
    (pre.py:113-224).

    For each title box in document order, pick the closest unused target
    with vertical gap < 0.05; merge into a union bbox carrying the caption
    text, recode image→figure, cls_id 99; re-insert at max(original
    indices); unmatched targets are relabeled 'None' (pre.py:202-204).
    """
    if not boxes:
        return boxes
    targets: list[tuple[int, dict]] = []
    titles: list[tuple[int, dict]] = []
    others: list[tuple[int, dict]] = []
    for i, b in enumerate(boxes):
        lbl = b.get("label")
        if lbl in TARGET_LABELS:
            targets.append((i, b))
        elif lbl in TITLE_LABELS:
            titles.append((i, b))
        else:
            others.append((i, b))

    merged: list[tuple[int, dict]] = []
    used: set[int] = set()

    for ti, title in titles:
        # NOTE: the reference has a commented-out score threshold here
        # (pre.py:141-142) — intentionally NOT applied (F7).
        title_text = _ocr_title_text(title)
        formula_flag = title.get("label") == "formula_number"

        best_idx, best_target, best_dist = None, None, float("inf")
        for gi, tgt in targets:
            if gi in used or _vertical_gap(title, tgt) >= SUB_Y_MAX:
                continue
            d = caption_distance(title, tgt, formula_flag)
            if d < best_dist:
                best_idx, best_target, best_dist = gi, tgt, d

        if best_target is not None:
            used.add(best_idx)
            tc = title["coordinate"]
            gc = best_target["coordinate"]
            label = best_target["label"]
            if label == "image":
                label = "figure"  # X11 recode (pre.py:184-188)
            merged.append((max(ti, best_idx), {
                "cls_id": 99,
                "label": label,
                "score": best_target["score"],
                "coordinate": [min(gc[0], tc[0]), min(gc[1], tc[1]),
                               max(gc[2], tc[2]), max(gc[3], tc[3])],
                "text": title_text,
            }))

    unmatched = [(i, t) for i, t in targets if i not in used]
    for _, t in unmatched:
        t["label"] = "None"  # X11 (pre.py:202-204)

    final = others + merged + unmatched
    final.sort(key=lambda it: it[0])
    return [b for _, b in final]


def process_page_boxes(boxes: list[dict]) -> list[dict]:
    """Full per-page geometry pass: A1 → F5 → J1 (layout.py:120-122)."""
    return pair_captions_with_targets(remove_nested_boxes(boxes))
