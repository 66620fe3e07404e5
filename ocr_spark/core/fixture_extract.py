"""Per-document PDF-path extraction — the reference's full document flow
(/root/reference/service/api/services.py:95-182 + service/core/layout.py:85-184)
re-expressed as one pure function over a layout-fixture document.

Pipeline per document (all per-page state stays inside this function — the
document is the unit of Spark parallelism):

  raw boxes → A1 merge → F5 nested removal → J1 caption pairing
            → W3 section stamping (prev+current page headers, layout.py:124-167)
            → per text box: fixture-OCR → line reconstruction (A2-A4)
            → sentinel-protected sentence split (X5/U4)
            → per sentence: word segmentation (X6) → mention tagging (U6)
            → mention bbox synthesis (W4/X10, services.py:140-150)
  → figures pass-through (F1) → reference pairs (J2/J3)

Quirks preserved: the empty page-text separator (services.py:153), the
``"Eq." → "EqⒹ"`` sentinel dance (services.py:129-152), negative line
indexing when a mention isn't found (services.py:140 with line_no == -1),
and the fact that typo-corrected text feeds ONLY the tagger, never the
output text (post.py:93-94).
"""

from __future__ import annotations

import copy
import json
import os
import re

from ocr_spark.core.artifacts import load_artifact
from ocr_spark.core.boxes import TARGET_LABELS, process_page_boxes
from ocr_spark.core.lines import reconstruct_lines
from ocr_spark.core.mentions import tag_mentions
from ocr_spark.core.sections import SectionTracker
from ocr_spark.core.segment import segment_sentences
from ocr_spark.core.wordseg import correct_segmentation_and_typos

EQ_SENTINEL = "EqⒹ"  # services.py:129
HEADER_Y_MAX = 0.17  # layout.py:128
HEADER_LABELS = ("header", "paragraph_title")


def _ws_insensitive_pattern(needle: str) -> str:
    return r"\s*".join(re.escape(c) for c in needle.replace(" ", ""))


def find_start_line_for_string(lines: list[str], needle: str) -> int:
    """services.py:63-82: locate the line index where a whitespace-
    insensitive match of ``needle`` starts inside ``" ".join(lines)``."""
    m = re.search(_ws_insensitive_pattern(needle), " ".join(lines),
                  re.IGNORECASE)
    if not m:
        return -1
    start = m.start()
    pos = 0
    for i, line in enumerate(lines):
        if pos <= start < pos + len(line):
            return i
        pos += len(line) + 1
    return -1


def find_start_in_line(line: str, needle: str) -> int:
    """services.py:84-93."""
    m = re.search(_ws_insensitive_pattern(needle), line, re.IGNORECASE)
    return m.start() if m else -1


def _page_header_strings(raw_boxes: list[dict]) -> list[str]:
    """Header OCR per layout.py:126-162: boxes labeled header /
    paragraph_title with y0 < 0.17; the OCR concat takes the FIRST rec_text
    of each result (layout.py:139-141) — with the fixture stub that is the
    first glyph's text."""
    out = []
    for box in raw_boxes:
        if box.get("label") in HEADER_LABELS and box["coordinate"][1] < HEADER_Y_MAX:
            glyphs = box.get("glyphs") or []
            if glyphs:
                out.append(glyphs[0]["text"])
    return out


DEFAULT_LAYOUT_ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data",
    "layout_head_v1.json")


def apply_layout_head(raw_boxes: list[dict]) -> list[dict]:
    """U1 model-artifact seam (the slot-in dry run, ROADMAP #2 /
    VERDICT r2 next-round #4).

    Default (``OCR_SPARK_LAYOUT_IMPL=fixture``): the payload's boxes ARE
    the layout-model output — pass through.

    ``OCR_SPARK_LAYOUT_IMPL=artifact``: every box is routed through a
    REAL artifact file loaded once per worker (core/artifacts.py, the
    same executor-lazy path a GPU model would use): labels are encoded
    into the artifact's class-id vocabulary and decoded back
    (reference layout head shape: detector emits cls_id+score, the
    vocab maps id→label, layout.py:88-89), and the artifact's
    ``score_threshold`` gates boxes (F7 — 0.0 in the shipped artifact,
    preserving the reference's disabled threshold, pre.py). Output is
    byte-identical to the fixture path (pinned by goldens run under
    the flag) — swapping real detector weights in changes what fills
    ``cls_id``/``score``, not this plumbing. A vocabulary mismatch
    raises loudly (KeyError), exactly like a wrong label map in
    production — the negative test pins that the artifact is live."""
    if os.environ.get("OCR_SPARK_LAYOUT_IMPL", "fixture") != "artifact":
        return raw_boxes
    path = os.environ.get("OCR_SPARK_LAYOUT_ARTIFACT",
                          DEFAULT_LAYOUT_ARTIFACT)
    model = load_artifact(path)
    index = model.get("_label_index")
    if index is None:
        index = {lbl: i for i, lbl in enumerate(model["labels"])}
        model["_label_index"] = index   # memoized on the cached artifact
    vocab = model["labels"]
    thr = float(model["score_threshold"])
    out = []
    for b in raw_boxes:
        cls = index[b["label"]]        # encode: label -> class id
        if float(b.get("score", 1.0)) < thr:
            continue
        nb = dict(b)
        nb["cls_id"] = cls
        nb["label"] = vocab[cls]       # decode: class id -> label
        out.append(nb)
    return out


def build_structured_pages(doc: dict) -> list[dict]:
    """layout_detection analog (layout.py:85-177): geometry passes + section
    stamping; returns pages with final box lists, sorted by page_index."""
    tracker = SectionTracker()
    pages_in = doc.get("pages") or []
    structured = []
    prev_raw: list[dict] | None = None
    for page in pages_in:
        raw_boxes = apply_layout_head(page.get("boxes") or [])
        # the reference re-reads pristine model output for the header scan
        # (layout.py:127,145 re-fetch res.json['res']) while the geometry
        # passes mutate a shared copy — deep-copy so both views exist
        processed = process_page_boxes(copy.deepcopy(raw_boxes))

        section_nos: list[str] = []
        if prev_raw is not None:
            section_nos.extend(_page_header_strings(prev_raw))
        section_nos.extend(_page_header_strings(raw_boxes))

        page_section = tracker.feed_page(section_nos)
        if page_section != "":
            for box in processed:
                box["section_info"] = page_section  # layout.py:164-167

        structured.append({"page_index": page["page_index"],
                           "boxes": processed})
        prev_raw = raw_boxes
    structured.sort(key=lambda p: p["page_index"])  # layout.py:175 (O1)
    return structured


def extract_page_texts_and_mentions(structured_pages: list[dict]) -> tuple[
        list[dict], list[dict]]:
    """services.py:108-161: per-page text assembly + mention tagging.

    Mutates text boxes in place (attaching ``ref_info``) exactly like the
    reference, so the subsequent pairing pass sees them. Returns
    (page_texts, figures) where page_texts are ``{'page_num','text'}`` rows.
    """
    page_rows = []
    figures = []
    for page in structured_pages:
        page_text = ""
        boxes = page["boxes"]
        text_boxes = [b for b in boxes if b.get("label") == "text"]
        figure_boxes = [b for b in boxes if b.get("label") in TARGET_LABELS]

        for tb in text_boxes:
            coord = tb["coordinate"]
            glyphs = tb.get("glyphs") or []
            try:
                lines = reconstruct_lines([g["text"] for g in glyphs],
                                          [g["box"] for g in glyphs])
            except Exception:
                lines = [""]  # services.py:121-124
            paragraph = " ".join(lines)
            # cache for the block exporter (extract.py) — reconstructing
            # lines is the hottest per-document kernel; doing it twice
            # per text box doubled fixture extraction cost
            tb["_paragraph"] = paragraph

            if paragraph != "":
                line_height = (coord[3] - coord[1]) / len(lines)
                paragraph = paragraph.replace("Eq.", EQ_SENTINEL)
                sentences = [s.replace(EQ_SENTINEL, "Eq.")
                             for s in segment_sentences(paragraph)]
                for sentence in sentences:
                    corrected = correct_segmentation_and_typos(sentence)
                    corrected = corrected.replace("E q", "Eq")  # services.py:134
                    tagged = tag_mentions(corrected)
                    if not tagged.ref_info:
                        continue
                    refs = tb.setdefault("ref_info", [])
                    for mention in tagged.ref_info:
                        line_no = find_start_line_for_string(lines, mention)
                        # line_no may be -1 → negative indexing picks the
                        # last line, exactly like services.py:140-141
                        num_char = len(lines[line_no]) or 1
                        char_w = (coord[2] - coord[0]) / num_char
                        col = find_start_in_line(lines[line_no], mention)
                        text_box = [
                            coord[0] + col * char_w,
                            coord[1] + line_no * line_height,
                            coord[0] + (col + len(mention)) * char_w,
                            coord[1] + (line_no + 1) * line_height,
                        ]
                        refs.append({
                            "figure_text": mention,
                            "text_box": text_box,
                            "raw_text": list(tagged.raw_texts),
                            "section_info": list(tagged.section_info),
                        })
                paragraph = paragraph.replace(EQ_SENTINEL, "Eq.")

            page_text += paragraph  # A5: NO separator (services.py:153)

        for fb in figure_boxes:
            figures.append({"page_num": page["page_index"],
                            "figure_box": fb["coordinate"],
                            "figure_type": fb["label"]})

        page_rows.append({"page_num": page["page_index"], "text": page_text})
    return page_rows, figures


def extract_fixture_document(payload: bytes | str) -> dict:
    """End-to-end fixture-document extraction; returns the reference's final
    JSON shape (services.py:178) plus the structured pages for block export.
    """
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8")
    doc = json.loads(payload)

    structured_pages = build_structured_pages(doc)
    page_rows, figures = extract_page_texts_and_mentions(structured_pages)

    from ocr_spark.core.match import create_reference_pairs
    pairs = create_reference_pairs(structured_pages)

    matches = [{
        "figure_box": p["ref"]["bbox"],
        "figure_page": p["ref"]["page"],
        "page_num": p["page"],
        "raw_text": p["raw_text"],
        "figure_text": p["figure_text"],
        "text_box": p["text_box"],
    } for p in pairs]  # services.py:167-175

    return {
        "pages": page_rows,
        "figures": figures,
        "matches": matches,
        "structured_pages": structured_pages,
    }
