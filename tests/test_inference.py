"""Model-artifact slot-in dry run (U1/U2 seam): a real artifact file
loads executor-lazily exactly once per worker and scores Arrow batches
deterministically."""

import json

from ocr_spark.gen.corpus import generate_pages
from ocr_spark.operators.inference import (
    DEFAULT_ARTIFACT, _load_model, run_layout_scoring, score_bytes,
)


def test_artifact_loads_once_per_worker_and_scores_match(spark):
    rows = generate_pages(120, seed=3, oversized_rows=0)
    df = spark.createDataFrame(
        [(r["url"], r["html"]) for r in rows], "url string, html binary")
    got = {r.url: r for r in
           run_layout_scoring(df.repartition(8)).collect()}
    assert len(got) == 120

    # deterministic parity with the pure-Python scorer
    model = _load_model(DEFAULT_ARTIFACT)
    for r in rows[:20]:
        assert got[r["url"]].score == score_bytes(r["html"], model)
    assert all(v.model_version == "v1" for v in got.values())

    # executor-lazy singleton: every row must report exactly ONE load
    # in its worker — a per-batch (or per-row) reload would show
    # counts > 1 on workers that served multiple batches
    assert {v.n_loads_in_worker for v in got.values()} == {1}


def test_artifact_file_is_wellformed():
    with open(DEFAULT_ARTIFACT, encoding="utf-8") as fh:
        art = json.load(fh)
    assert art["dims"] == len(art["weights"]) == 16
    assert all(-1.0 <= w <= 1.0 for w in art["weights"])


def test_scorer_edge_cases():
    model = _load_model(DEFAULT_ARTIFACT)
    assert score_bytes(None, model) == round(model["bias"], 6)
    assert score_bytes(b"", model) == round(model["bias"], 6)
    a = score_bytes(b"<html>content a</html>", model)
    b = score_bytes(b"<html>content a</html>", model)
    assert a == b  # pure function
