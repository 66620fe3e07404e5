#!/usr/bin/env python
"""Generate (or regenerate) the golden extraction fixtures.

Goldens are produced ONCE by the reference-semantics kernels at a pinned
commit and then frozen — the pytest gate compares byte-for-byte from then
on (SURVEY.md §5.2.1). Regenerating is an explicit act: rerun this script
and commit the diff with justification.

Corpus: 120 rows, seed 42, fixture docs every 10th row, no oversized rows
(goldens stay small; the skew path is covered by the Spark smoke test).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

from ocr_spark.core.extract import extract_document  # noqa: E402
from ocr_spark.gen.corpus import generate_pages  # noqa: E402

GOLDEN_ROWS = 120
GOLDEN_SEED = 42
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "goldens", "extracted_sf_small.jsonl")


def golden_rows():
    return generate_pages(GOLDEN_ROWS, seed=GOLDEN_SEED, oversized_rows=0)


def main() -> int:
    rows = golden_rows()
    with open(OUT, "w", encoding="utf-8") as fh:
        for r in rows:
            res = extract_document(r["url"], r["html"])
            fh.write(json.dumps({
                "url": res.url,
                "kind": res.kind,
                "text": res.text,
                "blocks": res.blocks,
                "spans": res.spans,
                "matches": res.matches,
                "n_pages": res.n_pages,
                "error": res.error,
            }, ensure_ascii=False, sort_keys=True) + "\n")
    print(f"wrote {GOLDEN_ROWS} goldens to {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
