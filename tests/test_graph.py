"""J4 sequence + hierarchical edge relations vs a per-document
reference replay of graph.py's build loop."""

import json

from ocr_spark.core.extract import extract_document
from ocr_spark.gen.corpus import generate_pages
from ocr_spark.operators.graph import (
    N_SECTION_NODES, VALID_NODE_TYPES, document_graph_edges,
)


def _expected_edges(url, blocks):
    """Sequential replay of the reference semantics (graph.py:60-88):
    per page, chain consecutive VALID nodes in block order; every node
    with section_info in 1..29 points at its synthetic section node."""
    nodes = [b for b in blocks if b["label"] in VALID_NODE_TYPES]
    edges = set()
    by_page: dict = {}
    for b in nodes:
        by_page.setdefault(b["page_index"], []).append(b)
    for page, pb in by_page.items():
        pb.sort(key=lambda b: b["block_id"])
        for a, b in zip(pb, pb[1:]):
            edges.add((url, f"pg{page}_box{a['block_id']}",
                       f"pg{page}_box{b['block_id']}", "sequence"))
    for b in nodes:
        si = b.get("section_info")
        if si is None:
            continue
        sec = int(float(si))
        if 1 <= sec <= N_SECTION_NODES:
            edges.add((url, f"pg{b['page_index']}_box{b['block_id']}",
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
