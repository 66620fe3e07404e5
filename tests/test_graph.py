"""J4 sequence + hierarchical edge relations vs a per-document
reference replay of graph.py's build loop."""

import json

from ocr_spark.core.extract import extract_document
from ocr_spark.gen.corpus import generate_pages
from ocr_spark.operators.graph import (
    IGNORED_NODE_TYPES, N_SECTION_NODES, document_graph_edges,
)


def _expected_edges(url, blocks):
    """Sequential replay of the reference semantics (graph.py:16-18,
    60-94): node ids use the per-page enumerate index over ALL boxes
    (assigned before any filter); nodes are filtered by the IGNORED
    blacklist ('None' labels survive); per page, consecutive surviving
    nodes chain in box order; every node with section_info in 1..29
    points at its synthetic section node."""
    by_page: dict = {}
    for b in sorted(blocks, key=lambda b: b["block_id"]):
        by_page.setdefault(b["page_index"], []).append(b)
    edges = set()
    nodes = []
    for page, pb in by_page.items():
        kept = [(i, b) for i, b in enumerate(pb)
                if b["label"] not in IGNORED_NODE_TYPES]
        nodes.extend((page, i, b) for i, b in kept)
        for (ia, _a), (ib, _b) in zip(kept, kept[1:]):
            edges.add((url, f"pg{page}_box{ia}",
                       f"pg{page}_box{ib}", "sequence"))
    for page, i, b in nodes:
        si = b.get("section_info")
        if si is None:
            continue
        sec = int(float(si))
        if 1 <= sec <= N_SECTION_NODES:
            edges.add((url, f"pg{page}_box{i}",
                       f"Section_{sec}", "hierarchical"))
    return edges


def test_graph_edges_match_reference_replay(spark):
    from ocr_spark.operators.extraction import (
        run_extraction, with_typed_structs,
    )

    rows = [r for r in generate_pages(120, seed=5, oversized_rows=0)
            if r["html"].startswith(b"%OCRFIX1")]
    assert len(rows) >= 10  # fixture docs: multi-block, multi-page
    df = spark.createDataFrame(
        [(r["url"], r["html"]) for r in rows], "url string, html binary")
    typed = with_typed_structs(run_extraction(df, partitions=4,
                                              big_partitions=1))
    got = {(r.url, r.src, r.dst, r.edge_type)
           for r in document_graph_edges(typed).collect()}

    want = set()
    for r in rows:
        res = extract_document(r["url"], r["html"])
        want |= _expected_edges(r["url"], res.blocks)

    assert want, "fixture corpus produced no edges"
    assert got == want
    assert any(e[3] == "sequence" for e in got)
    assert any(e[3] == "hierarchical" for e in got)
