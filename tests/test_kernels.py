"""Kernel unit tests pinning the reference's tricky semantics
(SURVEY.md §5.2.2). Each case cites the reference behavior it freezes."""

from __future__ import annotations

from ocr_spark.core.boxes import (
    caption_distance, merge_adjacent_targets, pair_captions_with_targets,
    remove_nested_boxes,
)
from ocr_spark.core.lines import reconstruct_lines
from ocr_spark.core.match import create_reference_pairs, find_target_with_name
from ocr_spark.core.mentions import tag_mentions
from ocr_spark.core.sections import SectionTracker
from ocr_spark.core.segment import segment_sentences
from ocr_spark.core.wordseg import correct_segmentation_and_typos, segment_token


def _box(label, coord, **kw):
    return {"cls_id": 1, "label": label, "score": 0.9, "coordinate": coord, **kw}


# ---- F5: nested removal with exact tolerances (pre.py:230-237) ------------

def test_containment_tolerances():
    outer = _box("text", [0.1, 0.1, 0.5, 0.5])
    inner_within_tol = _box("number", [0.1 - 0.0085, 0.1 - 0.0076, 0.5, 0.5])
    kept = remove_nested_boxes([outer, inner_within_tol])
    # mutual containment removes BOTH (reference double-loop behavior)
    assert kept == []


def test_containment_just_outside_tolerance():
    outer = _box("text", [0.1, 0.1, 0.5, 0.5])
    inner = _box("number", [0.1 - 0.009, 0.2, 0.3, 0.3])  # x0 exceeds tol
    kept = remove_nested_boxes([outer, inner])
    assert len(kept) == 2


def test_nested_box_removed():
    outer = _box("text", [0.1, 0.1, 0.9, 0.5])
    inner = _box("number", [0.2, 0.2, 0.4, 0.3])
    other = _box("text", [0.1, 0.6, 0.9, 0.9])
    kept = remove_nested_boxes([outer, inner, other])
    assert [b["label"] for b in kept] == ["text", "text"]


# ---- A1: adjacent-run merge (pre.py:18-57) ---------------------------------

def test_adjacent_targets_merge_keeps_first_meta():
    a = _box("figure", [0.1, 0.1, 0.4, 0.3])
    narrow = _box("text", [0.41, 0.1, 0.44, 0.3])  # width < 0.05 → absorbed
    b = _box("table", [0.45, 0.1, 0.8, 0.3])
    merged = merge_adjacent_targets([a, narrow, b])
    assert len(merged) == 1
    m = merged[0]
    assert m["label"] == "figure"  # first box's label (pre.py:45-50)
    assert m["coordinate"] == [0.1, 0.1, 0.8, 0.3]
    assert "glyphs" not in m  # merge drops extra fields


def test_formula_number_not_absorbed_by_narrow_rule():
    a = _box("figure", [0.1, 0.1, 0.4, 0.3])
    fnum = _box("formula_number", [0.41, 0.1, 0.44, 0.3])  # narrow but exempt
    merged = merge_adjacent_targets([a, fnum])
    assert len(merged) == 2


# ---- A2/A4: line clustering + space reconstruction (post.py:32-95) ---------

def test_running_mean_line_clustering():
    # three fragments; the third's center is within tolerance only because
    # the running mean moved after adding the second
    boxes = [[0, 0, 10, 20], [12, 4, 22, 24], [30, 7, 40, 27]]
    texts = ["a", "b", "c"]
    lines = reconstruct_lines(texts, boxes)
    assert lines == ["a bc"] or lines == ["ab c"] or len(lines) == 1


def test_space_iff_gap_exceeds_035_height():
    h = 20  # threshold = 7
    boxes = [[0, 0, 90, h], [98, 0, 150, h], [153, 0, 200, h]]
    texts = ["hello", "wor", "ld"]
    assert reconstruct_lines(texts, boxes) == ["hello wor" + "ld"]


def test_reconstruct_raises_on_empty():
    import pytest
    with pytest.raises(Exception):
        reconstruct_lines([], [])


# ---- J1: greedy steal + image→figure recode (pre.py:113-224) ---------------

def test_greedy_caption_steals_target():
    fig = _box("image", [0.1, 0.30, 0.5, 0.50], glyphs=[])
    cap1 = _box("figure_title", [0.1, 0.51, 0.5, 0.54],
                glyphs=[{"text": "Figure 1: x", "box": [0, 0, 99, 20]}])
    cap2 = _box("figure_title", [0.1, 0.55, 0.5, 0.58],
                glyphs=[{"text": "Figure 2: y", "box": [0, 0, 99, 20]}])
    out = pair_captions_with_targets([fig, cap1, cap2])
    # cap1 (earlier in doc order) takes the only target; cap2 unmatched and
    # silently dropped from title set; target label recoded image→figure
    merged = [b for b in out if b.get("cls_id") == 99]
    assert len(merged) == 1
    assert merged[0]["label"] == "figure"
    assert merged[0]["text"] == "Figure 1: x"


def test_unmatched_target_relabeled_none():
    lonely = _box("table", [0.1, 0.1, 0.5, 0.3])
    out = pair_captions_with_targets([lonely])
    assert out[0]["label"] == "None"  # pre.py:202-204


def test_formula_number_distance_flag():
    title = _box("formula_number", [0.72, 0.78, 0.78, 0.81])
    target = _box("display_formula", [0.3, 0.77, 0.7, 0.82])
    d = caption_distance(title, target, True)
    assert abs(d - (abs(0.78 - 0.77) + abs(0.81 - 0.82))) < 1e-12


# ---- W3: section state machine (layout.py:11-81) ---------------------------

def test_header_parser_priority_and_state():
    tr = SectionTracker()
    assert tr.feed_page(["3.1 Intro"]) == "3.1"
    assert tr.feed_page([]) == "3.1"           # state persists across pages
    assert tr.feed_page(["Chapter 4"]) == ""   # chapter resets section
    assert tr.feed_page(["4.2 Methods"]) == "4.2"
    # same number + longer title updates silently, number unchanged
    assert tr.feed_page(["4.2 Methods and Much More Detail"]) == "4.2"
    assert tr.feed_page(["Section 7 Results"]) == "7"


def test_header_parser_part_sorted_first():
    tr = SectionTracker()
    out = tr.feed_page(["2.9 Later", "Part II Basics"])
    assert out == "2.9"
    assert tr.part == "Part II Basics"


# ---- X3/J2: mention regex skew + matching -----------------------------------

def test_eq_mention_tagged_and_matched():
    tagged = tag_mentions("The bound follows from Eq . (3) as stated in Section 2.1 above.")
    assert "Eq. (3)" in tagged.ref_info  # clean_span_text collapses ' . ('
    assert tagged.section_info == ["2.1"]
    assert tagged.raw_texts  # raw sentence recorded


def test_eqs_vs_eq_skew_replicated():
    # graph-side accepts bare 'Eq' as equation keyword; a target captioned
    # '(3)' matches via the bare-parenthesis fallback (graph.py:135-138)
    src = {"id": "s", "type": "text", "page": 0, "bbox": [0, 0, 1, 1]}
    tgt = {"id": "t", "type": "display_formula", "page": 0,
           "bbox": [0, 0, 1, 1], "text": "(3)"}
    assert find_target_with_name([tgt], "Eq. (3)", src) is tgt
    assert find_target_with_name([tgt], "Eq. (4)", src) is None


def test_first_name_match_wins_not_closest():
    # the reference breaks on the FIRST name match in scope order
    # (graph.py:150), even if a later candidate is closer
    src = {"id": "s", "type": "text", "page": 0, "bbox": [0.0, 0.0, 0.1, 0.1]}
    far = {"id": "far", "type": "figure", "page": 5,
           "bbox": [0.9, 0.9, 1.0, 1.0], "text": "Figure 2: far away"}
    near = {"id": "near", "type": "figure", "page": 0,
            "bbox": [0.0, 0.0, 0.2, 0.2], "text": "Figure 2: right here"}
    assert find_target_with_name([far, near], "Figure 2", src) is far


def test_section_scope_fallback_to_global():
    pages = [{
        "page_index": 0,
        "boxes": [
            {"label": "text", "coordinate": [0.1, 0.6, 0.9, 0.7],
             "ref_info": [{"figure_text": "Table 1", "text_box": [0, 0, 0, 0],
                           "raw_text": ["see Table 1"],
                           "section_info": ["99.1"]}]},  # 99 ∉ 1..29 → global
            {"label": "table", "coordinate": [0.1, 0.1, 0.9, 0.5],
             "text": "Table 1: data"},
        ],
    }]
    pairs = create_reference_pairs(pages)
    assert len(pairs) == 1
    assert pairs[0]["ref"]["type"] == "table"


# ---- X5/X6/U4: sentinel, segmentation, join quirks --------------------------

def test_sentence_segmentation_roundtrip():
    para = "First sentence here. Second one follows! Third?"
    sents = segment_sentences(para)
    assert sents == ["First sentence here.", "Second one follows!", "Third?"]
    assert " ".join(sents) == para


def test_abbreviations_do_not_split():
    para = "See Fig. 3 for details. Then continue."
    assert segment_sentences(para) == ["See Fig. 3 for details.",
                                       "Then continue."]


def test_segmentation_decimals_never_split():
    # pysbd PeriodBeforeNumberRule class: in-number periods are opaque
    para = "Pi is 3.14159 exactly. We paid $5.50 for v2.0 today. Done."
    assert segment_sentences(para) == [
        "Pi is 3.14159 exactly.", "We paid $5.50 for v2.0 today.", "Done."]


def test_segmentation_ellipsis():
    # ellipsis stays with its sentence; lowercase continuation never splits
    para = "He waited... Then he left."
    assert segment_sentences(para) == ["He waited...", "Then he left."]
    assert segment_sentences("I... don't know.") == ["I... don't know."]
    para2 = "What?! Really. Yes."
    assert segment_sentences(para2) == ["What?!", "Really.", "Yes."]


def test_segmentation_quotes():
    # boundary punctuation inside quotes: split AFTER the closing quote
    para = 'He said "Stop." Then he left.'
    assert segment_sentences(para) == ['He said "Stop."', "Then he left."]
    para2 = "She asked 'Why?' Nobody answered."
    assert segment_sentences(para2) == ["She asked 'Why?'",
                                        "Nobody answered."]
    # closing bracket after the period
    para3 = "(He left early.) The rest stayed."
    assert segment_sentences(para3) == ["(He left early.)",
                                        "The rest stayed."]
    # quoted sentence start after a boundary
    para4 = 'It broke. "Again?" she sighed.'
    assert segment_sentences(para4) == ["It broke.", '"Again?" she sighed.']


def test_segmentation_between_punctuation_suppression():
    # pysbd BetweenPunctuation: boundary punctuation strictly inside a
    # matched paren/bracket/quote span never splits
    para = "He said (it is done. Truly) and left."
    assert segment_sentences(para) == [para]
    para2 = 'She wrote "Why? Because." And left.'
    assert segment_sentences(para2) == ['She wrote "Why? Because."',
                                        "And left."]
    para3 = "[cite. Ref] then more. End."
    assert segment_sentences(para3) == ["[cite. Ref] then more.", "End."]
    # nested parens: everything inside the outer span is suppressed
    para4 = "Nested (outer (inner. Deep) mid. Out) tail. End."
    assert segment_sentences(para4) == [
        "Nested (outer (inner. Deep) mid. Out) tail.", "End."]
    # single-quote span suppresses; apostrophes never open a span
    assert segment_sentences("'A quoted. Sentence' stays whole.") == [
        "'A quoted. Sentence' stays whole."]
    assert segment_sentences("Don't stop. Apostrophes are fine. OK.") == [
        "Don't stop.", "Apostrophes are fine.", "OK."]


def test_segmentation_unmatched_pairs_do_not_suppress():
    # pysbd's span regexes require the closing delimiter: an unclosed
    # open paren/quote suppresses nothing
    para = "Unmatched (open. Still splits here. Yes."
    assert segment_sentences(para) == [
        "Unmatched (open.", "Still splits here.", "Yes."]
    para2 = 'An unclosed "quote. Still splits. Done.'
    assert segment_sentences(para2) == [
        'An unclosed "quote.', "Still splits.", "Done."]
    # span-final runs keep splitting AFTER the close (the r2 behavior)
    para3 = "(He left early.) The rest stayed."
    assert segment_sentences(para3) == ["(He left early.)",
                                        "The rest stayed."]


def test_segmentation_abbrev_classes():
    # prepositive (Dr./Prof.) and number (No./Eq.) abbreviations never
    # split, even directly before a capital or digit
    para = "Dr. Smith met Prof. Jones. See No. 4 and Eq. 2 e.g. here."
    assert segment_sentences(para) == [
        "Dr. Smith met Prof. Jones.", "See No. 4 and Eq. 2 e.g. here."]


def test_segmentation_exact_substrings():
    # clean=False contract: every sentence is an exact substring
    para = 'A one. "B two!" C three... D four?  E five.'
    for s in segment_sentences(para):
        assert s in para


def test_compact_rehydrate_edge_cases():
    """Offsets-mode kernel edges: only blocks whose text EXACTLY equals
    the doc-text slice are compacted; caption blocks (no offsets), null
    text, and stale offsets pass through untouched."""
    from ocr_spark.operators.extraction import compact_blocks, rehydrate_blocks

    text = "hello world of text"
    blocks = [
        # reconstructable: compacted, text dropped, bbox kept
        {"block_id": 0, "page_index": 0, "label": "text",
         "bbox": [0.1, 0.2, 0.3, 0.4], "text": "hello world",
         "char_start": 0, "char_end": 11, "section_info": "2"},
        # caption with text but no offsets: untouched
        {"block_id": 1, "page_index": 0, "label": "figure",
         "bbox": None, "text": "Figure 1: a caption",
         "char_start": -1, "char_end": -1, "section_info": None},
        # null text: untouched
        {"block_id": 2, "page_index": 0, "label": "image",
         "bbox": [0, 0, 1, 1], "text": None,
         "char_start": -1, "char_end": -1, "section_info": None},
        # STALE offsets (slice mismatch): must NOT be compacted, or
        # rehydration would silently corrupt the text
        {"block_id": 3, "page_index": 0, "label": "text",
         "bbox": None, "text": "does not match slice",
         "char_start": 0, "char_end": 20, "section_info": None},
    ]
    compacted = compact_blocks(blocks, text)
    assert "text" not in compacted[0]
    assert compacted[0]["bbox"] == [0.1, 0.2, 0.3, 0.4]
    assert compacted[0]["section_info"] == "2"
    assert compacted[1] == blocks[1]
    assert compacted[2] == blocks[2]
    assert compacted[3] == blocks[3]  # stale offsets kept verbatim
    assert rehydrate_blocks(text, compacted) == blocks


def test_x6_spacing_perturbation():
    # the alpha/non-alpha token split + single-space join moves punctuation
    # spacing exactly like the reference (post.py:12-30)
    out = correct_segmentation_and_typos("is large.")
    assert out == "is large ."


def test_symspell_case_modes():
    """Pins the exact divergence class between the two case readings
    (ROADMAP #4): default (insensitive) keeps capitalized dictionary
    words whole; sensitive (symspellpy's raw lowercase-dictionary
    reading) treats them as unknown and the DP splits when a 1-char
    prefix + known suffix is cheaper (1 sep + 1 unknown < len unknown)."""
    # default: capitalized known word stays whole
    assert segment_token("The") == "The"
    assert segment_token("Table") == "Table"
    # sensitive: 'The' -> 'T he' (sep+1 unknown = 2 beats 3 unknown)
    assert segment_token("The", case_sensitive=True) == "T he"
    # lowercase dictionary words behave identically in both modes
    assert segment_token("the", case_sensitive=True) == "the"
    assert segment_token("thedata", case_sensitive=True) == "the data"
    # the wrapper threads the flag through
    assert correct_segmentation_and_typos("The data.",
                                          case_sensitive=False) \
        == "The data ."
    assert correct_segmentation_and_typos("The data.",
                                          case_sensitive=True) \
        == "T he data ."


def test_wordseg_identity_for_known_words():
    assert segment_token("the") == "the"
    assert segment_token("The") == "The"


def test_wordseg_splits_concatenation():
    assert segment_token("thedata") == "the data"


def test_target_side_eq_not_normalized():
    """Reference quirk (graph.py:140,145): the TARGET side maps only
    fig->figure, never eq->equation — so a caption 'Eq. 3' keeps kind
    'eq' and does NOT match a mention of kind 'equation'; a caption
    'Equation 3' does."""
    src = {"id": "s", "type": "text", "page": 0, "bbox": [0, 0, 1, 1]}
    eq_caption = {"id": "t1", "type": "display_formula", "page": 0,
                  "bbox": [0, 0, 1, 1], "text": "Eq. 3 shows the bound"}
    equation_caption = {"id": "t2", "type": "display_formula", "page": 0,
                        "bbox": [0, 0, 1, 1], "text": "Equation 3 bound"}
    fig_caption = {"id": "t3", "type": "figure", "page": 0,
                   "bbox": [0, 0, 1, 1], "text": "Fig. 7 overview"}
    assert find_target_with_name([eq_caption], "Equation 3", src) is None
    assert find_target_with_name([equation_caption], "Equation 3",
                                 src) is equation_caption
    # fig IS normalized on the target side
    assert find_target_with_name([fig_caption], "Figure 7",
                                 src) is fig_caption


def test_fixture_offsets_with_one_based_pages():
    """Block char offsets must key by the page's own page_index, not its
    position: a 1-based fixture's offsets still index doc_text exactly."""
    import json as _json

    from ocr_spark.core.extract import FIXTURE_MAGIC, extract_document

    def glyph(ch, i):
        return {"text": ch, "box": [10 + 20 * i, 10, 28 + 20 * i, 26]}

    doc = {"doc_id": "d", "pages": [
        {"page_index": 1, "width": 600, "height": 800, "boxes": [
            {"cls_id": 0, "label": "text", "score": 0.9,
             "coordinate": [0.1, 0.1, 0.9, 0.3],
             "glyphs": [glyph(c, i) for i, c in enumerate("first")]},
        ]},
        {"page_index": 2, "width": 600, "height": 800, "boxes": [
            {"cls_id": 0, "label": "text", "score": 0.9,
             "coordinate": [0.1, 0.1, 0.9, 0.3],
             "glyphs": [glyph(c, i) for i, c in enumerate("second")]},
        ]},
    ]}
    raw = FIXTURE_MAGIC + _json.dumps(doc).encode()
    res = extract_document("https://x.test/d.pdf", raw)
    assert res.error is None
    for b in res.blocks:
        if b["char_start"] >= 0:
            assert res.text[b["char_start"]:b["char_end"]] == b["text"], b


def test_segmentation_numbered_lists():
    """pysbd ListItemReplacer class: the list marker attaches to its
    item, never becomes a one-token sentence."""
    para = "1. Install the package. 2. Run the job. 3. Read the output."
    assert segment_sentences(para) == [
        "1. Install the package.", "2. Run the job.", "3. Read the output."]
    para = "(1) First step. (2) Second step."
    assert segment_sentences(para) == ["(1) First step.", "(2) Second step."]


def test_segmentation_alphabetical_lists_and_initials():
    para = "A. Prepare the data. B. Train the model."
    assert segment_sentences(para) == [
        "A. Prepare the data.", "B. Train the model."]
    # name initials are the same shape — never split off
    para = "A. Einstein wrote it. B. Riemann proved it."
    assert segment_sentences(para) == [
        "A. Einstein wrote it.", "B. Riemann proved it."]
    # roman-style single-letter section markers
    assert segment_sentences("I. Introduction comes first.") == [
        "I. Introduction comes first."]


def test_segmentation_list_marker_mid_sentence_still_splits():
    """The marker rule applies only when the marker is the WHOLE
    sentence-so-far: 'No. 5.' is a complete sentence and must split."""
    assert segment_sentences("See No. 5. The result follows.") == [
        "See No. 5.", "The result follows."]


def test_segmentation_roman_multichar_markers():
    """pysbd roman-numeral list rule: a multi-char roman marker follows
    the whole-chunk rule — attaches to its item when it IS the chunk,
    but a real sentence ending in a roman numeral still splits."""
    assert segment_sentences("IV. Deploy the job. V. Monitor it.") == [
        "IV. Deploy the job.", "V. Monitor it."]
    assert segment_sentences("xii) Check the logs\nxiii) Stop now.") == [
        "xii) Check the logs", "xiii) Stop now."]
    # adversarial: roman numeral ends a REAL sentence → must split
    assert segment_sentences("He became Henry IV. Then the war began.") \
        == ["He became Henry IV.", "Then the war began."]


def test_segmentation_newline_list_reflow():
    """pysbd ListItemReplacer line-anchored rule: a newline before a
    list marker is a boundary even without terminal punctuation."""
    assert segment_sentences("1. install it\n2. run it\n3. done.") == [
        "1. install it", "2. run it", "3. done."]
    assert segment_sentences("Steps:\nIV. Deploy it\nV. Monitor it.") \
        == ["Steps:", "IV. Deploy it", "V. Monitor it."]
    assert segment_sentences("(1) first\n(2) second") == [
        "(1) first", "(2) second"]
    # a newline NOT followed by a list marker is not a boundary
    assert segment_sentences("line one\nstill the same sentence.") == [
        "line one\nstill the same sentence."]


def test_segmentation_multichar_punctuation():
    assert segment_sentences("Stop!! Now move on.") == [
        "Stop!!", "Now move on."]
    assert segment_sentences("Really?! Yes, really.") == [
        "Really?!", "Yes, really."]
    # Unicode ellipsis: boundary before a capital, no split before
    # a lowercase continuation
    assert segment_sentences("He waited… Then he left.") == [
        "He waited…", "Then he left."]
    assert segment_sentences("Wait… what happened?") == [
        "Wait… what happened?"]
    assert segment_sentences('She said "Go!?" Then silence.') == [
        'She said "Go!?"', "Then silence."]


def test_mojibake_map_roundtrip_and_ordering():
    """The repair chain must invert the corruption exactly, and the
    map's longest-key-first ordering must prevent a shorter key from
    stealing a longer sequence's prefix (pure-Python check of the same
    literals both engines execute)."""
    from ocr_spark.plans.webops import (
        MOJIBAKE_MAP, _MOJI_TAIL_CLEAN, _MOJI_TAIL_WILD, _corrupt,
    )

    def repair(s: str) -> str:
        for broken, fixed in MOJIBAKE_MAP:
            s = s.replace(broken, fixed)
        return s

    assert repair(_MOJI_TAIL_WILD) == _MOJI_TAIL_CLEAN
    # every mapped sequence round-trips standalone and in context
    for broken, fixed in MOJIBAKE_MAP:
        assert repair(_corrupt(f"x {fixed} y")) == f"x {fixed} y"
    # ordering: all multi-step keys (sharing the â€ prefix) come
    # before any 2-char Ã keys so prefixes cannot be half-repaired
    keys = [b for b, _ in MOJIBAKE_MAP]
    three = [k for k in keys if len(k) == 3]
    two = [k for k in keys if len(k) == 2]
    assert keys == three + two
