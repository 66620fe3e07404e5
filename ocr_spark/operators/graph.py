"""Document-graph edges (SURVEY §2 J4 + the J3-adjacent hierarchical
membership) — relational form of the reference's networkx build.

The reference materializes a ``networkx.DiGraph`` per document
(/root/reference/service/core/graph.py:90-110): nodes are layout boxes
with ids ``pg{p}_box{i}`` where ``i`` is the box's ENUMERATE index
within its page's box list, assigned over ALL boxes BEFORE any label
filter (graph.py:16-18 ``load_and_transform_data``); the filter is the
IGNORED_NODE_TYPES BLACKLIST (graph.py:92-94), so labels in neither
list — notably the ``'None'`` relabel of unmatched caption targets
(pre.py:202-204) — become real nodes with sequence edges. Synthetic
``Section_1..29`` nodes carry ``hierarchical`` edges (box →
``Section_<int(float(section_info))>``, graph.py:78-88); ``sequence``
chains consecutive surviving boxes per page in box order
(graph.py:60-76). A driver-side graph object cannot exist at 100 TB;
both edge types are pure relational operators over the typed blocks
column:

  * box index = ``row_number() over (partition by url, page order by
    block_id) - 1`` computed BEFORE the blacklist filter (blocks are
    emitted in per-page box order, so this reproduces the reference's
    per-page enumerate including ignored boxes);
  * sequence  = ``lead(node_id) over (partition by url, page order by
    block order)`` after the blacklist filter — one window pass,
    shuffle keyed on (url, page);
  * hierarchical = a projection of blocks carrying ``section_info``
    (the synthetic section node id is derived, not joined — the
    reference's ``graph.has_node`` guard becomes a range filter).

Output is an edge list (url, src, dst, edge_type) — the exact relation
a graph engine (GraphFrames etc.) would ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# node-type lists: reference graph.py:40-48. build_document_graph
# filters with the IGNORED blacklist only (graph.py:92-94);
# VALID_NODE_TYPES is exported for parity/documentation but is NOT the
# node filter — labels in neither list (e.g. 'None') are nodes.
VALID_NODE_TYPES = (
    "doc_title", "paragraph_title", "section",
    "text", "abstract", "references", "sidebar_text",
    "display_formula", "algorithm",
    "table", "figure", "chart", "image",
    "formula_number", "page_number", "number", "footnote", "chart_title",
)
IGNORED_NODE_TYPES = (
    "header", "footer", "header_image", "footer_image", "seal",
)
N_SECTION_NODES = 29   # synthetic Section_1..29, graph.py:79-82


def _node_id(page: Column, block: Column) -> Column:
    # id format pg{p}_box{i}: reference graph.py:18
    return F.concat(F.lit("pg"), page.cast("string"),
                    F.lit("_box"), block.cast("string"))


def document_graph_edges(extracted_typed: DataFrame) -> DataFrame:
    """extracted (with typed ``blocks``) → (url, src, dst, edge_type).

    Blocks arrive in reading order (W1 restored them; block_id is the
    emission index), so the per-page sequence chain is a single
    ``lead`` window — no driver-side graph object, no self-join. The
    per-page box index (the ``i`` in ``pg{p}_box{i}``) is assigned over
    ALL blocks, then ignored types are dropped by blacklist — both
    exactly as the reference (graph.py:16-18, 92-94)."""
    wi = Window.partitionBy("url", "page").orderBy("block_id")
    blocks = (extracted_typed
              .select("url", F.explode("blocks").alias("b"))
              .select("url",
                      F.col("b.page_index").alias("page"),
                      F.col("b.block_id").alias("block_id"),
                      F.col("b.label").alias("label"),
                      F.col("b.section_info").alias("section_info"))
              .withColumn("box_idx", F.row_number().over(wi) - F.lit(1))
              .filter(~F.col("label").isin(*IGNORED_NODE_TYPES)))
    nid = _node_id(F.col("page"), F.col("box_idx"))

    w = Window.partitionBy("url", "page").orderBy("block_id")
    seq = (blocks
           .select("url", nid.alias("src"),
                   F.lead(nid).over(w).alias("dst"))
           .filter(F.col("dst").isNotNull())
           .withColumn("edge_type", F.lit("sequence")))

    sec = F.col("section_info").cast("double").cast("int")
    hier = (blocks
            .filter(F.col("section_info").isNotNull())
            .withColumn("sec", sec)
            .filter((F.col("sec") >= 1) & (F.col("sec") <= N_SECTION_NODES))
            .select("url", nid.alias("src"),
                    F.concat(F.lit("Section_"),
                             F.col("sec").cast("string")).alias("dst"))
            .withColumn("edge_type", F.lit("hierarchical")))

    return seq.unionByName(hier)
