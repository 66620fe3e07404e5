"""Executor-lazy model-artifact loading — pure Python, no Spark imports.

The reference loads its layout/OCR/CRF artifacts once at process start
(/root/reference/service/core/layout.py:9, ocr.py:10-22). The Spark
analogue: the artifact file ships to executors (--files/--archives, or
as package data through --py-files), and each Python WORKER loads it
lazily exactly once into a module-global cache — never per batch, never
per row. This module is that cache; operators/inference.py and the
layout head in core/fixture_extract.py both load through it.

The load counter is exposed THROUGH a module function because a nested
mapInPandas kernel referencing the dict directly would get a frozen
cloudpickle copy (see operators/inference.py:_load_count).
"""

from __future__ import annotations

import json
import os

_CACHE: dict = {}
_LOAD_COUNTS: dict = {}


def artifact_load_count(path: str) -> int:
    """Worker-local count of actual file loads for ``path`` (0 or 1 in a
    healthy worker — the once-per-worker guarantee tests pin)."""
    return _LOAD_COUNTS.get(path, 0)


def load_artifact(path: str) -> dict:
    """Load a JSON artifact once per worker process. Falls back to
    zip-shipped package data (--py-files) when the path does not exist
    on the executor's filesystem."""
    model = _CACHE.get(path)
    if model is None:
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                model = json.load(fh)
        else:
            from importlib import resources
            model = json.loads(
                (resources.files("ocr_spark") / "data"
                 / os.path.basename(path)).read_text(encoding="utf-8"))
        _CACHE[path] = model
        _LOAD_COUNTS[path] = _LOAD_COUNTS.get(path, 0) + 1
    return model
