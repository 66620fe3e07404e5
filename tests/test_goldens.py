"""The byte-identity gate (north rule): every url's extracted text must be
byte-identical to the frozen golden, and blocks/spans/matches must be
struct-identical (SURVEY.md §5.2.1)."""

from __future__ import annotations

import json
import os

import pytest

from ocr_spark.core.extract import extract_document
from ocr_spark.gen.corpus import generate_pages

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "goldens", "extracted_sf_small.jsonl")


def _load_goldens() -> dict[str, dict]:
    out = {}
    with open(GOLDEN_PATH, encoding="utf-8") as fh:
        for line in fh:
            rec = json.loads(line)
            out[rec["url"]] = rec
    return out


@pytest.fixture(scope="module")
def goldens():
    return _load_goldens()


@pytest.fixture(scope="module")
def corpus():
    return generate_pages(120, seed=42, oversized_rows=0)


def test_golden_corpus_complete(goldens, corpus):
    assert len(goldens) == len(corpus) == 120
    assert {r["url"] for r in corpus} == set(goldens)


def test_text_byte_identical_per_url(goldens, corpus):
    mismatches = []
    for row in corpus:
        res = extract_document(row["url"], row["html"])
        want = goldens[row["url"]]
        if res.text != want["text"]:
            mismatches.append(row["url"])
    assert mismatches == [], f"text drift for {len(mismatches)} urls"


def test_structs_identical_per_url(goldens, corpus):
    for row in corpus:
        res = extract_document(row["url"], row["html"])
        want = goldens[row["url"]]
        got = json.loads(json.dumps({
            "blocks": res.blocks, "spans": res.spans, "matches": res.matches,
        }))
        assert got["blocks"] == want["blocks"], row["url"]
        assert got["spans"] == want["spans"], row["url"]
        assert got["matches"] == want["matches"], row["url"]
        assert res.error is None
        assert res.kind == want["kind"]


def test_fixture_docs_have_matching_pairs(goldens):
    fixtures = [g for g in goldens.values() if g["kind"] == "fixture"]
    assert len(fixtures) == 12
    assert all(f["matches"] for f in fixtures), "every fixture doc should pair"
    # every match's figure_text parses as a known mention kind
    for f in fixtures:
        for m in f["matches"]:
            assert any(k in m["figure_text"].lower()
                       for k in ("figure", "table", "eq", "chart", "image"))
