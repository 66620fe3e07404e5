"""Deterministic layout-fixture documents — the PDF-path stand-in.

The reference's PDF path depends on PP-DocLayoutV2 + PP-OCRv5 model weights
(/root/reference/service/core/layout.py:9, ocr.py:4-8) which are gitignored
and unavailable offline.  FIXTURES.md §3 therefore defines a fixture format
that *is* the layout-model output: per page, a list of boxes (label, score,
normalized coordinate — reference box dict shape, layout.py:111-119) where
each box additionally carries its deterministic "OCR ground truth" as
``glyphs`` (text fragments + pixel boxes, the rec_texts/rec_boxes shape of
/root/reference/service/core/post.py:33-36).

Fixtures deliberately exercise every kernel quirk:
  * nested boxes                     → remove_nested_boxes   (pre.py:239-275)
  * adjacent narrow-box target runs  → _group_adjacent_targets (pre.py:18-57)
  * caption/figure pairs + formula_number → group_image_with_caption (pre.py:113-224)
  * top-of-page section headers      → HeaderParser           (layout.py:11-81)
  * Figure/Table/Eq mentions + Section spans → mention tagger + matching
    (graph.py:112-156, predict.py:153-181)
  * multi-fragment glyph lines with sub/super-threshold gaps → line
    clustering + space reconstruction (post.py:32-95)
"""

from __future__ import annotations

import random

_TOPIC_WORDS = (
    "kernel design partition shuffle filter join scan window batch stream "
    "vector column sort merge hash index cache spill codegen broadcast"
).split()

_FILLER = (
    "the results show that the approach scales with the number of cores "
    "and the cost of the scan dominates when the filter is not pushed down "
    "while the join order matters only for the largest inputs in the set"
).split()

LINE_HEIGHT = 20
LINE_SPACING = 30
CHAR_W = 9
SPACE_GAP = 10   # > 0.35 * LINE_HEIGHT = 7  → reconstructed as " "
NOSPACE_GAP = 3  # <= 7                       → concatenated directly


def _sentence(rng: random.Random, lo: int = 6, hi: int = 12) -> str:
    words = [rng.choice(_FILLER) for _ in range(rng.randint(lo, hi))]
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def _wrap(text: str, width: int = 48) -> list[str]:
    lines: list[str] = []
    cur: list[str] = []
    n = 0
    for w in text.split(" "):
        add = len(w) + (1 if cur else 0)
        if cur and n + add > width:
            lines.append(" ".join(cur))
            cur, n = [w], len(w)
        else:
            cur.append(w)
            n += add
    if cur:
        lines.append(" ".join(cur))
    return lines


def _glyphs_for_lines(rng: random.Random, lines: list[str]) -> list[dict]:
    """Fragment each line into 1-3 glyph boxes with controlled gaps."""
    glyphs: list[dict] = []
    for k, line in enumerate(lines):
        y0 = 10 + k * LINE_SPACING
        # choose fragmentation
        words = line.split(" ")
        frags: list[tuple[str, int]] = []  # (text, gap_before_px)
        if len(words) >= 4 and rng.random() < 0.6:
            cut = rng.randint(1, len(words) - 1)
            frags.append((" ".join(words[:cut]), 0))
            rest = " ".join(words[cut:])
            if len(rest) > 6 and rng.random() < 0.3:
                # mid-word split: no-space gap must reconstruct the word
                c = len(rest) // 2
                while c < len(rest) and rest[c] == " ":
                    c += 1
                frags.append((rest[:c], SPACE_GAP))
                frags.append((rest[c:], NOSPACE_GAP))
            else:
                frags.append((rest, SPACE_GAP))
        else:
            frags.append((line, 0))
        x = 10
        for text, gap in frags:
            x0 = x + gap
            x1 = x0 + CHAR_W * len(text)
            jit = rng.randint(-2, 2)
            glyphs.append({"text": text,
                           "box": [x0, y0 + jit, x1, y0 + jit + LINE_HEIGHT]})
            x = x1
    order = list(range(len(glyphs)))
    rng.shuffle(order)
    return [glyphs[i] for i in order]


def _box(label: str, coord: list[float], glyph_lines: list[str] | None,
         rng: random.Random, cls_id: int = 1, score: float = 0.9,
         single_glyph: bool = False) -> dict:
    b = {"cls_id": cls_id, "label": label, "score": round(score, 4),
         "coordinate": [round(c, 4) for c in coord]}
    if glyph_lines is not None:
        if single_glyph:
            b["glyphs"] = [{"text": glyph_lines[0],
                            "box": [10, 10, 10 + CHAR_W * len(glyph_lines[0]), 10 + LINE_HEIGHT]}]
        else:
            b["glyphs"] = _glyphs_for_lines(rng, glyph_lines)
    else:
        b["glyphs"] = []
    return b


def make_fixture_doc(rng: random.Random, doc_id: str) -> dict:
    n_pages = rng.randint(2, 4)
    chapter = rng.randint(1, 9)
    pages = []
    fig_no = 0
    tbl_no = 0
    known_figs: list[int] = []
    known_tbls: list[int] = []
    for p in range(n_pages):
        sec = f"{chapter}.{p + 1}"
        boxes: list[dict] = []

        # header (section source for HeaderParser; y0 < 0.17 — layout.py:128)
        if p != 1 or n_pages == 2:
            # page 1 of 3+-page docs omits its header → section carries over
            title = " ".join(rng.choice(_TOPIC_WORDS).capitalize() for _ in range(2))
            boxes.append(_box("header", [0.1, 0.05, 0.9, 0.10],
                              [f"{sec} {title}"], rng, single_glyph=True))

        # text box A with a nested small box inside it (F5 removal)
        text_a = " ".join(_sentence(rng) for _ in range(2))
        boxes.append(_box("text", [0.1, 0.15, 0.9, 0.30], _wrap(text_a), rng))
        boxes.append(_box("number", [0.2, 0.18, 0.5, 0.22], ["42"], rng,
                          single_glyph=True))

        # target + adjacent narrow box (A1 merge) + caption (J1)
        eq_no = p + 1
        if p % 2 == 0:
            fig_no += 1
            known_figs.append(fig_no)
            target_label = rng.choice(["figure", "image", "chart"])
            cap_label = "figure_title"
            cap_text = f"Figure {fig_no}: " + _sentence(rng, 4, 7)
        else:
            tbl_no += 1
            known_tbls.append(tbl_no)
            target_label = "table"
            cap_label = "table_caption"
            cap_text = f"Table {tbl_no}: " + _sentence(rng, 4, 7)
        boxes.append(_box(target_label, [0.15, 0.32, 0.85, 0.52], None, rng))
        boxes.append(_box("text", [0.855, 0.32, 0.89, 0.52], ["x"], rng,
                          single_glyph=True))  # narrow (w<0.05) → merged by A1
        boxes.append(_box(cap_label, [0.15, 0.53, 0.85, 0.56],
                          [cap_text], rng, single_glyph=True))

        # mention-bearing text box B
        sentences = [_sentence(rng)]
        if known_figs:
            sentences.append(
                f"As shown in Figure {rng.choice(known_figs)} the filter "
                "runs before the join and the cost drops."
            )
        if known_tbls and rng.random() < 0.8:
            sentences.append(
                f"Table {rng.choice(known_tbls)} lists the throughput at "
                "both parallelism levels."
            )
        sentences.append(
            f"The bound follows from Eq. ({eq_no}) as stated in "
            f"Section {sec} above."
        )
        sentences.append(_sentence(rng))
        boxes.append(_box("text", [0.1, 0.60, 0.9, 0.75],
                          _wrap(" ".join(sentences)), rng))

        # display formula + its formula_number "(n)" (J1 with cal_flag=True)
        boxes.append(_box("display_formula", [0.3, 0.77, 0.7, 0.82], None, rng))
        boxes.append(_box("formula_number", [0.72, 0.78, 0.78, 0.81],
                          [f"({eq_no})"], rng, single_glyph=True))

        # an unmatched target on some pages (→ label 'None', pre.py:202-204)
        if rng.random() < 0.3:
            boxes.append(_box("figure", [0.1, 0.84, 0.45, 0.93], None, rng))

        # ignored-type + page furniture (F2 / graph.py:47)
        boxes.append(_box("footer", [0.1, 0.95, 0.9, 0.975], ["footer junk"],
                          rng, single_glyph=True))
        boxes.append(_box("page_number", [0.48, 0.98, 0.52, 0.995],
                          [str(p + 1)], rng, single_glyph=True))

        pages.append({
            "page_index": p,
            "width_pnt": 612.0,
            "height_pnt": 792.0,
            "boxes": boxes,
        })
    return {"doc_id": doc_id, "pages": pages}
