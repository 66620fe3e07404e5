"""Model-artifact inference plumbing — the U1/U2 slot-in dry run.

The reference's layout/OCR models load from artifact files at process
start and serve batches under a GPU lock
(/root/reference/service/core/layout.py:9, ocr.py:10-22; artifacts
gitignored there). The production Spark shape for that is:

  * the artifact ships to executors (``--files``/``--archives``, or
    package data through ``--py-files`` as here);
  * each Python WORKER loads it lazily exactly once (module-global
    cache — the executor-lazy singleton), not per batch and never per
    row;
  * inference runs inside Arrow-batched ``mapInPandas`` so a real
    GPU/ONNX model sees proper batches.

Since no ML runtime exists in this container, the artifact here is a
deterministic linear scorer over a 16-bucket byte histogram
(``ocr_spark/data/layout_stub_v1.json``) — a REAL file on disk going
through the REAL loading path; swapping in actual weights changes
``_score_batch``'s arithmetic, not the Spark plumbing. The
``n_loads_in_worker`` output column exists so tests can pin the
once-per-worker load guarantee from the outside.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SCORE_SCHEMA = ("url string, score double, model_version string, "
                "n_loads_in_worker int")

DEFAULT_ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data",
    "layout_stub_v1.json")

# executor-lazy singleton now lives in core/artifacts.py (shared with
# the U1 layout-head seam in core/fixture_extract.py); these aliases
# keep this module's test surface. The load counter must be read
# THROUGH a module function: a nested mapInPandas kernel referencing
# the dict directly would get a frozen cloudpickle copy (cloudpickle
# copies plain objects a by-value function references), silently
# diverging from the dict the loader (pickled by reference) mutates
# in the worker.
from ocr_spark.core.artifacts import (  # noqa: E402
    artifact_load_count as _load_count,
    load_artifact as _load_model,
)


def score_bytes(payload: bytes | None, model: dict) -> float:
    """Deterministic linear scorer: 16-bucket histogram of the first
    4096 payload bytes (bucket = byte >> 4, mass-normalized) dotted
    with the artifact weights. Pure function — the DuckDB-free test
    recomputes it directly."""
    head = (payload or b"")[:4096]
    if not head:
        return round(float(model["bias"]), 6)
    hist = [0] * model["dims"]
    for b in head:
        hist[b >> 4] += 1
    n = len(head)
    score = model["bias"] + sum(
        w * (c / n) for w, c in zip(model["weights"], hist))
    return round(float(score), 6)


def run_layout_scoring(pages: DataFrame,
                       artifact_path: str = DEFAULT_ARTIFACT) -> DataFrame:
    """pages(url, html, ...) → (url, score, model_version,
    n_loads_in_worker): the inference stage shape. The artifact path is
    captured in the closure (cloudpickle ships the STRING, not the
    model — each worker loads from its local copy)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _load_model(artifact_path)
        version = str(model["version"])
        for pdf in batches:
            payloads = pdf["html"].tolist()
            yield pd.DataFrame({
                "url": pdf["url"].tolist(),
                "score": [score_bytes(
                    bytes(p) if p is not None else None, model)
                    for p in payloads],
                "model_version": [version] * len(pdf),
                "n_loads_in_worker":
                    [_load_count(artifact_path)] * len(pdf),
            })

    return pages.select("url", "html").mapInPandas(kernel,
                                                   schema=SCORE_SCHEMA)
