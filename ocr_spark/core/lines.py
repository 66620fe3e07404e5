"""OCR-line clustering and text reconstruction kernels (A2, A3, A4).

Reimplements, batch-side, the reference's line logic:

  * ``cluster_lines_running_mean`` — the running-mean y-center clustering of
    ``correct`` (/root/reference/service/core/post.py:32-64): items sorted
    by y0; an item joins the current line iff its y-center is within
    0.3·avg_line_height of the *running mean* of the line's centers (updated
    after every add). The running mean makes this a strictly sequential
    scan — it cannot be a window function — so it stays a per-box kernel
    inside the Arrow batch (SURVEY.md §2.4 A2).

  * ``reconstruct_line_text`` — within a line, fragments sorted by x0 and
    concatenated, inserting a single space iff the horizontal gap exceeds
    0.35·box_height (post.py:66-94).  Note the reference computes a
    typo-corrected variant and then discards it (post.py:93-94) — the
    *uncorrected* reconstruction is what enters the output text; corrected
    text feeds only the mention tagger (services.py:133).

  * ``sort_fragments_reading_order`` — the caption-OCR ordering of
    ``group_and_sort_by_proximity`` (pre.py:59-111): same running-mean
    clustering but keyed on raw y0 with tolerance 0.5·(first box height),
    returning fragments flattened line-by-line, x-sorted.
"""

from __future__ import annotations


def _mean(xs: list[float]) -> float:
    return sum(xs) / len(xs)


def cluster_lines_running_mean(
    items: list[tuple[list[float], str]],
    line_y_tolerance_ratio: float = 0.3,
) -> list[list[tuple[list[float], str]]]:
    """Group (box, text) fragments into lines; boxes are [x0,y0,x1,y1].

    Exact semantics of post.py:36-64: sort by y0; cluster on running-mean
    y-center with tolerance = ratio × mean(box heights over ALL items).
    """
    if not items:
        return []
    items = sorted(items, key=lambda it: it[0][1])
    avg_h = _mean([b[3] - b[1] for b, _ in items])
    tol = avg_h * line_y_tolerance_ratio

    lines: list[list[tuple[list[float], str]]] = []
    cur = [items[0]]
    cur_center = (items[0][0][1] + items[0][0][3]) / 2.0
    for box, text in items[1:]:
        center = (box[1] + box[3]) / 2.0
        if abs(center - cur_center) <= tol:
            cur.append((box, text))
            # running mean update (post.py:58)
            cur_center = (cur_center * (len(cur) - 1) + center) / len(cur)
        else:
            lines.append(cur)
            cur = [(box, text)]
            cur_center = center
    lines.append(cur)
    return lines


def reconstruct_line_text(
    line: list[tuple[list[float], str]], space_threshold_ratio: float = 0.35
) -> str:
    """x-sort a line's fragments and join, spacing on wide gaps
    (post.py:66-91)."""
    line = sorted(line, key=lambda it: it[0][0])
    text_out = ""
    prev_x_max = -1.0
    for box, text in line:
        if prev_x_max == -1.0:
            text_out = text
        else:
            gap = box[0] - prev_x_max
            threshold = (box[3] - box[1]) * space_threshold_ratio
            if gap > threshold:
                text_out += " " + text
            else:
                text_out += text
        prev_x_max = box[2]
    return text_out


def reconstruct_lines(rec_texts: list[str], rec_boxes: list[list[float]],
                      line_y_tolerance_ratio: float = 0.3,
                      space_threshold_ratio: float = 0.35) -> list[str]:
    """Full ``correct`` pipeline (post.py:32-95): fragments → line strings.

    Raises on empty input, like the reference (post.py:40-43) — callers
    catch and substitute ``[""]`` (services.py:121-124).
    """
    items = list(zip(rec_boxes, rec_texts))
    if not items:
        raise ValueError("no OCR fragments")
    pairs = [(list(map(float, b)), t) for b, t in items]
    lines = cluster_lines_running_mean(pairs, line_y_tolerance_ratio)
    return [reconstruct_line_text(ln, space_threshold_ratio) for ln in lines]


def sort_fragments_reading_order(
    rec_texts: list[str], rec_boxes: list[list[float]]
) -> list[tuple[str, list[float]]]:
    """Caption-fragment ordering (pre.py:59-111): cluster on raw y0 with
    tolerance 0.5 × height of the FIRST box, then flatten x-sorted lines.
    Returns (text, box) tuples in reading order.
    """
    if not rec_texts:
        return []
    first = rec_boxes[0]
    tol = (first[3] - first[1]) * 0.5
    items = list(zip(rec_texts, rec_boxes))

    lines: list[list[tuple[str, list[float]]]] = []
    cur = [items[0]]
    cur_ref = float(items[0][1][1])
    for text, box in items[1:]:
        y = float(box[1])
        if abs(y - cur_ref) <= tol:
            cur.append((text, box))
            cur_ref = _mean([float(it[1][1]) for it in cur])
        else:
            lines.append(cur)
            cur = [(text, box)]
            cur_ref = y
    lines.append(cur)

    out: list[tuple[str, list[float]]] = []
    for ln in lines:
        ln.sort(key=lambda it: it[1][0])
        out.extend(ln)
    return out
