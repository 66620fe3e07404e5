"""Per-PAGE link analysis with a URL-keyed rank store maintained
incrementally across crawl snapshots.

The host-rolled PageRank family (plans/webops.py hosts_pagerank*) ranks
~|hosts| nodes; production crawl prioritization (OPIC/Cho et al.) and
search-side quality signals both want the PER-URL rank — a vector the
size of the crawl. Two operators:

  * ``pages_pagerank`` — cold-start weighted PageRank over the
    URL-level followed-link graph (canonical page URL → every followed
    external href URL, nofollow pages emit nothing — the same edge
    semantics as webops._followed_host_edges, minus the host rollup).
  * ``pages_pagerank_incremental`` — the reason a rank STORE exists:
    a new crawl snapshot does not re-run the full iteration budget
    from 1/n. The prior snapshot's converged URL-keyed ranks seed the
    new graph's iteration (new URLs cold-start at 1/n_new), and a
    SHORT budget (``PAGERANK_INC_ITERS``) re-converges — the standard
    warm-start argument for incremental PageRank (Langville & Meyer
    2006 §10; Desikan et al. 2005 use the same seed-and-iterate form).
    tests/test_linkrank.py demonstrates the value on a deep-chain
    graph where cold-start at the same short budget is measurably
    farther from the converged vector.

The reference (CMDF/ocr) has no link-analysis surface at all
(SURVEY.md §2.3); semantics here follow the published formulation.

Scale notes (100 TB): the rank vector is |URLs| rows — it NEVER sits
on the driver. Each iteration is one edge⋈rank equi-join keyed src
plus one partial-aggregated groupBy(dst) (shuffle keyed on url both
times), a 1-row total broadcast, and a localCheckpoint to truncate
lineage — the near_dup_clusters / hosts_pagerank plan class. The
incremental variant's win at scale is ITERATION COUNT: the prior
store is a parquet/Iceberg table keyed url, the seed join is one
equi-join, and the short budget replaces the full one. Simplified
(leaky) dangling treatment, matching hosts_pagerank/hosts_pagerank_full
so the per-page and per-host figures are comparable; the
mass-conserving correction is hosts_pagerank_dangling's 1-row
broadcast pattern and composes here unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_spark.plans.extract_queries import pages_from_documents
from ocr_spark.plans.webops import (
    HREF_PAT,
    PAGERANK_DAMPING,
    PAGERANK_ITERS,
    ROBOTS_PAT,
    _html_str,
)

PAGERANK_INC_ITERS = 3   # warm-start budget: the incremental claim is
                         # that this replaces PAGERANK_ITERS from 1/n


def _page_url_edges(spark: SparkSession, sf_dir: str,
                    include_new: bool = True) -> DataFrame:
    """URL-level followed-link edge list: (canonical src URL → href dst
    URL) for every external followed href; nofollow pages emit nothing;
    the canonical self-link is dropped. ``include_new=False`` restricts
    to the PRIOR snapshot (the docs_new_vs_snapshot role split:
    arrivals are doc_id % 3 == 2)."""
    pages = pages_from_documents(spark, sf_dir)
    if not include_new:
        did = F.regexp_extract("url", r"doc://(\d+)", 1).cast("long")
        pages = pages.filter(did % 3 != 2)
    h = _html_str()
    robots = F.regexp_extract(h, ROBOTS_PAT, 1)
    followed = pages.filter(
        ~F.array_contains(F.split(robots, ","), "nofollow"))
    src = F.regexp_extract(
        h, r'rel="canonical" href="([^"]+)"', 1)
    return (followed
            .select(src.alias("src"),
                    F.explode(F.regexp_extract_all(
                        h, F.lit(HREF_PAT), 1)).alias("dst"))
            .filter(F.col("dst").rlike("^https?://"))
            .filter((F.col("src") != "") & (F.col("dst") != F.col("src"))))


def _url_rank_loop(edges: DataFrame, iters: int,
                   seed: DataFrame | None = None) -> DataFrame:
    """Weighted power iteration keyed on url, returning UNROUNDED
    (url, n, r). ``seed`` is a prior (url, r) rank store: carried URLs
    start there, URLs absent from the store start at 1/n. The loop body
    is webops._pagerank_loop's shape (edge⋈rank equi-join + partial-agg
    groupBy(dst), broadcast 1-row n, per-round localCheckpoint) with
    the node column named url because the store is URL-keyed."""
    edges = (edges.groupBy("src", "dst").agg(F.count("*").alias("w"))
             .localCheckpoint())
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    weighted = edges.join(out_w, "src")
    nodes = (edges.select(F.col("src").alias("url"))
             .union(edges.select(F.col("dst").alias("url")))
             .distinct())
    n = nodes.agg(F.count("*").alias("n"))  # 1 row → broadcast
    base = nodes.crossJoin(F.broadcast(n))
    if seed is None:
        ranks = base.select(
            "url", "n", (F.lit(1.0) / F.col("n")).alias("r"))
    else:
        ranks = (base.join(seed.select("url",
                                       F.col("r").alias("r_prior")),
                           "url", "left")
                 .select("url", "n",
                         F.coalesce("r_prior",
                                    F.lit(1.0) / F.col("n")).alias("r"))
                 .localCheckpoint())
    for _ in range(iters):
        contrib = (weighted
                   .join(ranks.select(F.col("url").alias("src"), "r"),
                         "src")
                   .groupBy(F.col("dst").alias("url"))
                   .agg(F.sum(F.col("r") * F.col("w") / F.col("out_w"))
                        .alias("inflow")))
        ranks = (ranks.join(contrib, "url", "left")
                 .select("url", "n",
                         ((1.0 - PAGERANK_DAMPING) / F.col("n")
                          + PAGERANK_DAMPING
                          * F.coalesce("inflow", F.lit(0.0))).alias("r"))
                 .localCheckpoint())
    return ranks


def pages_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold-start per-page PageRank: PAGERANK_ITERS power iterations
    from 1/n over the URL-level followed-link graph. Output is the
    URL-keyed rank store a snapshot persists (rounded for the
    cross-engine hash; the store itself keeps full doubles)."""
    ranks = _url_rank_loop(_page_url_edges(spark, sf_dir),
                           PAGERANK_ITERS)
    return ranks.select("url", F.round("r", 8).alias("pagerank"))


def pages_pagerank_incremental(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Warm-start per-page PageRank for the NEW snapshot: the prior
    snapshot's converged store seeds the full graph's iteration and
    only PAGERANK_INC_ITERS rounds run. ``seeded`` marks URLs carried
    from the store vs cold-started arrivals — the column an operator
    watches to size the incremental budget (a crawl that is mostly
    arrivals deserves more rounds)."""
    store = _url_rank_loop(
        _page_url_edges(spark, sf_dir, include_new=False),
        PAGERANK_ITERS).select("url", "r")
    ranks = _url_rank_loop(_page_url_edges(spark, sf_dir),
                           PAGERANK_INC_ITERS, seed=store)
    seeded = store.select("url", F.lit(True).alias("seeded"))
    return (ranks.join(seeded, "url", "left")
            .select("url", F.round("r", 8).alias("pagerank"),
                    F.coalesce("seeded", F.lit(False)).alias("seeded")))


# ---------------------------------------------------------------------------
# oracle SQL (unrolled power iterations — recursive CTEs disallow
# aggregates in the recursive term, so unrolling IS the SQL form)
# ---------------------------------------------------------------------------

def _edges_cte(name: str, extra_where: str) -> str:
    """URL-level edge list from doc_id (gen/wrap.py: canonical url =
    https://site{doc_id%13}.example.com/doc/{doc_id}; the only external
    followed href is the partner link)."""
    return f"""{name}0 AS (
  SELECT 'https://site' || CAST(doc_id % 13 AS VARCHAR)
           || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS src,
         'https://partner' || CAST(CASE WHEN doc_id % 13 = 11 THEN 2
                                        ELSE doc_id % 5 END AS VARCHAR)
           || '.example.org/p/' || CAST(doc_id % 13 AS VARCHAR) AS dst
  FROM documents WHERE doc_id % 17 <> 3{extra_where}
), {name} AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM {name}0 GROUP BY src, dst
), {name}_ow AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM {name} GROUP BY src
), {name}_wt AS (
  SELECT e.src, e.dst, e.w, o.out_w
  FROM {name} e JOIN {name}_ow o USING (src)
), {name}_nodes AS (
  SELECT src AS url FROM {name} UNION SELECT dst FROM {name}
), {name}_nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {name}_nodes
)"""


def _iter_ctes(prefix: str, edge: str, iters: int,
               carry: str = "") -> str:
    """c/r CTE pairs for ``iters`` leaky power steps over ``edge``,
    reading/writing rank frames ``{prefix}{i}``. ``carry`` names extra
    columns threaded through unchanged (e.g. seeded)."""
    keep = "".join(f", {prefix}{{i}}.{c}".format(i="{i}")
                   for c in ([carry] if carry else []))
    steps = []
    for i in range(iters):
        k = keep.format(i=i)
        steps.append(f""", {prefix}c{i} AS MATERIALIZED (
  SELECT w.dst AS url, SUM({prefix}{i}.r * w.w / w.out_w) AS inflow
  FROM {edge}_wt w JOIN {prefix}{i} ON {prefix}{i}.url = w.src
  GROUP BY w.dst
), {prefix}{i + 1} AS MATERIALIZED (
  SELECT {prefix}{i}.url, {prefix}{i}.n{k},
         (1.0 - {PAGERANK_DAMPING}) / {prefix}{i}.n
           + {PAGERANK_DAMPING} * COALESCE({prefix}c{i}.inflow, 0.0) AS r
  FROM {prefix}{i} LEFT JOIN {prefix}c{i}
    ON {prefix}c{i}.url = {prefix}{i}.url
)""")
    return "".join(steps)


def _pages_pagerank_sql() -> str:
    return ("WITH " + _edges_cte("e", "")
            + f""", p0 AS MATERIALIZED (
  SELECT url, n, 1.0 / n AS r FROM e_nodes CROSS JOIN e_nn
)"""
            + _iter_ctes("p", "e", PAGERANK_ITERS)
            + f"\nSELECT url, round(r, 8) AS pagerank "
              f"FROM p{PAGERANK_ITERS}")


def _pages_pagerank_incremental_sql() -> str:
    prior = (_edges_cte("ep", " AND doc_id % 3 <> 2")
             + """, q0 AS MATERIALIZED (
  SELECT url, n, 1.0 / n AS r FROM ep_nodes CROSS JOIN ep_nn
)"""
             + _iter_ctes("q", "ep", PAGERANK_ITERS))
    seed = f""", s0 AS MATERIALIZED (
  SELECT e_nodes.url, e_nn.n,
         COALESCE(q{PAGERANK_ITERS}.r, 1.0 / e_nn.n) AS r,
         q{PAGERANK_ITERS}.r IS NOT NULL AS seeded
  FROM e_nodes CROSS JOIN e_nn
  LEFT JOIN q{PAGERANK_ITERS} ON q{PAGERANK_ITERS}.url = e_nodes.url
)"""
    return ("WITH " + prior + ", " + _edges_cte("e", "").lstrip()
            + seed
            + _iter_ctes("s", "e", PAGERANK_INC_ITERS, carry="seeded")
            + f"\nSELECT url, round(r, 8) AS pagerank, seeded "
              f"FROM s{PAGERANK_INC_ITERS}")


SPARK_QUERIES = {
    "pages_pagerank": pages_pagerank,
    "pages_pagerank_incremental": pages_pagerank_incremental,
}

ORACLE_SQL = {
    "pages_pagerank": _pages_pagerank_sql(),
    "pages_pagerank_incremental": _pages_pagerank_incremental_sql(),
}
