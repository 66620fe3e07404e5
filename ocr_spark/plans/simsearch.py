"""Similarity search over the ``embeddings`` table (vec_id, embedding
FLOAT[64], label).

The tiers of an ANN stack, each as an oracle-checked query:
  * ``emb_cosine_topk`` — brute-force cosine top-k: the exactness
    baseline. O(Q·N); fine when the query set is small enough to
    broadcast, which is exactly how it is written (broadcast the query
    side, stream the corpus side — no shuffle of the big table).
  * ``emb_ivf_topk`` — IVF-style cell-pruned top-k: vectors are
    pre-assigned to coarse cells (here the ``label`` column plays the
    trained coarse quantizer); a query probes only its own cell, so the
    join is an equi-join on cell id — partition-prunable and skew-safe
    at 100 TB, instead of a full cross join.
  * ``emb_lsh_near_dup`` — banded random-hyperplane LSH bucketing
    (pre-join bucket cap) + exact cosine verification within buckets:
    the near-dup-pair path. The signature is a narrow per-row map; the
    only shuffle is the capped bucket self-join.
  * ``emb_lsh_multiprobe_topk`` — Hamming-1 probe expansion on the
    query side (broadcast) for recall without more hash tables.
  * ``emb_label_centroids`` — per-cell element-wise centroid (the IVF
    "train" step): posexplode → groupBy(cell, dim) → avg; demonstrates
    vector aggregation without any Python.
  * ``emb_scalar_quantize`` / ``emb_pq_codes`` — the storage tier:
    int8 scalar quantization and product quantization.

Everything is JVM-side higher-order functions over array<double>; md5
seeds the deterministic hyperplanes so Spark and the DuckDB oracle agree
bit-for-bit (dot products are left-fold doubles on both engines:
F.aggregate and list_reduce both fold left-to-right).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

DIM = 64
N_QUERIES = 10          # vec_id < 10 are the demo query set
TOPK = 5
IVF_TOPK = 3
LSH_PLANES = 16         # signature length
EMB_LSH_BANDS = 2       # bands over the signature (OR-amplification)
EMB_BAND_BITS = LSH_PLANES // EMB_LSH_BANDS   # 8 sign bits per band
EMB_BUCKET_CAP = 100    # pre-join degenerate-bucket guard: pair count is
                        # O(n²) per bucket, and with clustered real
                        # embeddings a single 8-bit bucket can hold a
                        # large corpus fraction. Mirrors the MinHash-LSH
                        # discipline (dataops.LSH_BUCKET_CAP); vectors in
                        # capped buckets are near-identical-direction
                        # territory owned by exact dedup.
NEAR_DUP_COS = 0.3


def _planes() -> list[list[float]]:
    """Deterministic ±1 hyperplanes: component d of plane p is +1 iff the
    first hex digit of md5('<p>_<d>') has its high bit set. Reproducible
    in any engine; no RNG state to ship."""
    out = []
    for p in range(LSH_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()
            row.append(1.0 if h[0] in "89abcdef" else -1.0)
        out.append(row)
    return out


PLANES = _planes()


def t(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _vecd(col: str = "embedding") -> Column:
    return F.col(col).cast("array<double>")


def _dot(a: Column, b: Column) -> Column:
    """Left-to-right fold — same order as DuckDB list_reduce, so results
    are bit-identical across engines."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


# SQL fragments (v = array<double> column name on each side)
_SQL_VEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _sql_dot(a: str, b: str) -> str:
    return (f"list_reduce(list_transform(range(1, {DIM + 1}), "
            f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)")


def _sql_norm(a: str) -> str:
    return (f"sqrt(list_reduce(list_transform({a}, x -> x * x), "
            f"(x, y) -> x + y))")


# --------------------------------------------------------------------------
# brute-force cosine top-k
# --------------------------------------------------------------------------

def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir).select(
        "vec_id", _vecd().alias("v")).withColumn("nrm", _norm(F.col("v")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"))
    # broadcast the small query side; the corpus side streams — the plan
    # is BroadcastNestedLoopJoin with zero shuffle of the big table.
    j = emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = j.select("q_id", F.col("vec_id").alias("neighbor_id"),
                      F.round(cos, 6).alias("cos6"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                           F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOPK)
            .select("q_id", "neighbor_id",
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


_COSINE_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, v, {_sql_norm('v')} AS nrm FROM e
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.q_id, n.vec_id AS neighbor_id,
         ROUND({_sql_dot('q.qv', 'n.v')} / (q.qn * n.nrm), 6) AS cos6
  FROM q, n WHERE n.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, neighbor_id, cos6,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos6 DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, ROUND(cos6, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {TOPK}
"""


RANGE_COS_MIN = 0.3   # calibrated to the synthetic vectors (1-8 hits
                      # per query at sf0.01); the knob, not the shape,
                      # changes with real embeddings


def emb_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) search — the fixed-threshold sibling of top-k:
    ALL neighbors with cosine >= RANGE_COS_MIN per query, plus each
    query's hit count (rows per query are data-dependent, which is
    exactly what distinguishes range search from top-k and what the
    dedup/recall tooling built on it needs).

    Scale shape: identical to emb_cosine_topk's — queries broadcast,
    corpus streams through a BroadcastNestedLoopJoin, zero corpus
    shuffle — but WITHOUT the rank window: the threshold filter
    replaces the per-query sort entirely, so range search is strictly
    cheaper than top-k at the same corpus size (no window state, no
    per-partition ordering). The IVF/LSH-bucketed variants prune it
    the same way they prune top-k."""
    emb = t(spark, sf_dir).select(
        "vec_id", _vecd().alias("v")).withColumn("nrm", _norm(F.col("v")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"))
    j = emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    hits = (j.select("q_id", F.col("vec_id").alias("neighbor_id"),
                     F.round(cos, 6).alias("cos6"))
            .filter(F.col("cos6") >= RANGE_COS_MIN))
    w = Window.partitionBy("q_id")
    return (hits.withColumn("n_hits", F.count("*").over(w))
            .select("q_id", "neighbor_id",
                    F.round("cos6", 4).alias("cos_sim"),
                    F.col("n_hits").cast("long").alias("n_hits")))


_RANGE_SEARCH_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, v, {_sql_norm('v')} AS nrm FROM e
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < {N_QUERIES}
), hits AS (
  SELECT q.q_id, n.vec_id AS neighbor_id,
         ROUND({_sql_dot('q.qv', 'n.v')} / (q.qn * n.nrm), 6) AS cos6
  FROM q, n WHERE n.vec_id <> q.q_id
)
SELECT q_id, neighbor_id, ROUND(cos6, 4) AS cos_sim,
       CAST(COUNT(*) OVER (PARTITION BY q_id) AS BIGINT) AS n_hits
FROM hits WHERE cos6 >= {RANGE_COS_MIN}
"""


# --------------------------------------------------------------------------
# IVF-style cell-pruned top-k
# --------------------------------------------------------------------------

def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe only the query's cell (label = pretrained coarse-quantizer
    assignment): the cross join collapses to an equi-join on cell id.
    At scale the table is partitioned by cell, so a probe touches one
    partition instead of the corpus."""
    emb = t(spark, sf_dir).select(
        "vec_id", "label", _vecd().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label"),
        F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    j = emb.join(F.broadcast(q), (F.col("label") == F.col("q_label"))
                 & (F.col("vec_id") != F.col("q_id")))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = j.select("q_id", F.col("label").alias("cell"),
                      F.col("vec_id").alias("neighbor_id"),
                      F.round(cos, 6).alias("cos6"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                           F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= IVF_TOPK)
            .select("q_id", "cell", "neighbor_id",
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


_IVF_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, label, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, label, v, {_sql_norm('v')} AS nrm FROM e
), q AS (
  SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
  FROM n WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.q_id, n.label AS cell, n.vec_id AS neighbor_id,
         ROUND({_sql_dot('q.qv', 'n.v')} / (q.qn * n.nrm), 6) AS cos6
  FROM q JOIN n ON n.label = q.q_label AND n.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, cell, neighbor_id, cos6,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos6 DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, cell, neighbor_id, ROUND(cos6, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {IVF_TOPK}
"""


def emb_ivf_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned radius search: emb_range_search's fixed threshold
    restricted to the query's coarse cell — the approximate form whose
    recall loss is exactly the range hits living outside the probed
    cell (at scale, multi-probe widens cells the same way the top-k
    path does). Compared to the brute-force range scan, the
    BroadcastNestedLoopJoin becomes an EQUI-join on cell id, so the
    corpus side prunes to one partition per probe instead of
    streaming whole."""
    emb = t(spark, sf_dir).select(
        "vec_id", "label", _vecd().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label"),
        F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    j = emb.join(F.broadcast(q), (F.col("label") == F.col("q_label"))
                 & (F.col("vec_id") != F.col("q_id")))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    hits = (j.select("q_id", F.col("label").alias("cell"),
                     F.col("vec_id").alias("neighbor_id"),
                     F.round(cos, 6).alias("cos6"))
            .filter(F.col("cos6") >= RANGE_COS_MIN))
    w = Window.partitionBy("q_id")
    return (hits.withColumn("n_hits", F.count("*").over(w))
            .select("q_id", "cell", "neighbor_id",
                    F.round("cos6", 4).alias("cos_sim"),
                    F.col("n_hits").cast("long").alias("n_hits")))


_IVF_RANGE_SQL = f"""
WITH e AS (
  SELECT vec_id, label, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, label, v, {_sql_norm('v')} AS nrm FROM e
), q AS (
  SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
  FROM n WHERE vec_id < {N_QUERIES}
), hits AS (
  SELECT q.q_id, n.label AS cell, n.vec_id AS neighbor_id,
         ROUND({_sql_dot('q.qv', 'n.v')} / (q.qn * n.nrm), 6) AS cos6
  FROM q JOIN n ON n.label = q.q_label AND n.vec_id <> q.q_id
)
SELECT q_id, cell, neighbor_id, ROUND(cos6, 4) AS cos_sim,
       CAST(COUNT(*) OVER (PARTITION BY q_id) AS BIGINT) AS n_hits
FROM hits WHERE cos6 >= {RANGE_COS_MIN}
"""


# --------------------------------------------------------------------------
# per-cell centroids (the IVF "train" step)
# --------------------------------------------------------------------------

def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir).select("label", _vecd().alias("v"))
    exploded = emb.select("label", F.posexplode("v").alias("pos", "x"))
    return (exploded.groupBy("label", "pos")
            .agg(F.round(F.avg("x"), 4).alias("centroid_val"),
                 F.count("*").alias("n_vecs")))


_CENTROIDS_SQL = f"""
WITH e AS (
  SELECT label, {_SQL_VEC} AS v FROM embeddings
)
SELECT label, g.i - 1 AS pos,
       ROUND(AVG(v[g.i]), 4) AS centroid_val,
       COUNT(*) AS n_vecs
FROM e, generate_series(1, {DIM}) AS g(i)
GROUP BY label, g.i - 1
"""


# --------------------------------------------------------------------------
# hyperplane-LSH near-duplicate pairs
# --------------------------------------------------------------------------

def _lsh_signature(v: Column) -> Column:
    bits = []
    for p in range(LSH_PLANES):
        plane = F.array(*[F.lit(x) for x in PLANES[p]])
        bits.append(F.when(_dot(v, plane) > 0, F.lit("1"))
                    .otherwise(F.lit("0")))
    return F.concat(*bits)


def _sql_plane_literal(p: int) -> str:
    return "[" + ", ".join(f"{x:.1f}" for x in PLANES[p]) + "]"


def _sql_signature() -> str:
    bits = []
    for p in range(LSH_PLANES):
        dot = (f"list_reduce(list_transform(range(1, {DIM + 1}), "
               f"i -> v[i] * ({_sql_plane_literal(p)})[i]), (x, y) -> x + y)")
        bits.append(f"(CASE WHEN {dot} > 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


def _banded_corpus(spark: SparkSession, sf_dir: str,
                   cap: int | None) -> DataFrame:
    """Corpus vectors exploded to (vec_id, v, nrm, band, bucket) — the
    shared banding scheme (EMB_LSH_BANDS bands of EMB_BAND_BITS sign
    bits each). ``cap`` drops degenerate buckets BEFORE any self-join
    (the near-dup path, where a hot bucket is O(n²)); ``None`` keeps
    all buckets (the probing path, whose per-query work is bounded by
    the probe list, not by bucket²)."""
    emb = t(spark, sf_dir).select(
        "vec_id", _vecd().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    sig = emb.withColumn("sig", _lsh_signature(F.col("v")))
    bands = sig.select(
        "vec_id", "v", "nrm", "sig",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.substring("sig", b * EMB_BAND_BITS + 1,
                            EMB_BAND_BITS).alias("bucket"))
            for b in range(EMB_LSH_BANDS)
        ])).alias("bb"),
    ).select("vec_id", "v", "nrm", "bb.band", "bb.bucket")
    if cap is not None:
        w = Window.partitionBy("band", "bucket")
        bands = (bands.withColumn("bucket_n", F.count(F.lit(1)).over(w))
                 .filter(F.col("bucket_n") <= cap)
                 .drop("bucket_n"))
    return bands


# the same banding scheme as a SQL fragment (corpus side of both the
# near-dup and multi-probe oracles)
_SQL_BANDS_FRAGMENT = " UNION ALL ".join(
    f"SELECT vec_id, v, nrm, {b} AS band, "
    f"substring(sig, {b * EMB_BAND_BITS + 1}, {EMB_BAND_BITS}) AS bucket "
    f"FROM sig"
    for b in range(EMB_LSH_BANDS))


def emb_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-dup pairs, banded: the 16-bit sign signature is
    split into EMB_LSH_BANDS bands of EMB_BAND_BITS bits; vectors sharing
    ANY band bucket are candidates (OR-amplification — better recall than
    a single prefix), then exact cosine verifies within buckets.

    Scale shape: signatures are a narrow map; the only shuffle is the
    equi-join on (band, bucket) — never an all-pairs cross join — and
    buckets larger than EMB_BUCKET_CAP are dropped BEFORE the self-join
    (window count on the same shuffle key), so clustered real embeddings
    can never force an O(n²) bucket."""
    bands = _banded_corpus(spark, sf_dir, cap=EMB_BUCKET_CAP)
    a = bands.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
                     F.col("nrm").alias("na"), "band", "bucket")
    b = bands.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
                     F.col("nrm").alias("nb"), "band", "bucket")
    pairs = a.join(b, ["band", "bucket"]).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    cand = (pairs.select("id_a", "id_b", F.round(cos, 4).alias("cos4"))
            .filter(F.col("cos4") >= NEAR_DUP_COS))
    return (cand.groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared_bands"),
                 F.round(F.max("cos4"), 4).alias("cos_sim")))


_LSH_NEAR_DUP_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, v, {_sql_norm('v')} AS nrm FROM e
), sig AS (
  SELECT vec_id, v, nrm, {_sql_signature()} AS sig FROM n
), bands AS (
  {_SQL_BANDS_FRAGMENT}
), capped AS (
  SELECT * FROM (
    SELECT vec_id, v, nrm, band, bucket,
           COUNT(*) OVER (PARTITION BY band, bucket) AS bucket_n
    FROM bands
  ) WHERE bucket_n <= {EMB_BUCKET_CAP}
), cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND({_sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm), 4) AS cos4
  FROM capped a JOIN capped b USING (band, bucket)
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, COUNT(*) AS n_shared_bands,
       ROUND(MAX(cos4), 4) AS cos_sim
FROM cand WHERE cos4 >= {NEAR_DUP_COS}
GROUP BY id_a, id_b
"""


# --------------------------------------------------------------------------
# IVF cell assignment (the "index build" step)
# --------------------------------------------------------------------------

def emb_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every vector to its nearest coarse centroid — the IVF
    index-build step. Centroids (k rows) broadcast against the streaming
    corpus: one narrow pass, no corpus shuffle except the final window
    on vec_id (tiny: k rows per vec before rank-1 filter).

    Determinism across engines: centroid components are ROUNDED to 6
    decimals on both sides (float avg order differs between engines in
    the last bits); distances then fold identically left-to-right."""
    emb = t(spark, sf_dir).select("vec_id",
                                  F.col("label").alias("own_label"),
                                  _vecd().alias("v"))
    exploded = emb.select("own_label", F.posexplode("v").alias("pos", "x"))
    cent = (exploded.groupBy(F.col("own_label").alias("cell"), F.col("pos"))
            .agg(F.round(F.avg("x"), 6).alias("cv")))
    cvecs = (cent.groupBy("cell")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                 lambda s: s.cv).alias("cvec")))
    j = emb.crossJoin(F.broadcast(cvecs))
    dist = F.round(F.sqrt(F.aggregate(
        F.zip_with(F.col("v"), F.col("cvec"),
                   lambda x, c: (x - c) * (x - c)),
        F.lit(0.0), lambda acc, x: acc + x)), 6)
    scored = j.select("vec_id", "own_label", "cell", dist.alias("dist6"))
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist6"), F.asc("cell"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "own_label",
                    F.col("cell").alias("assigned_cell"),
                    F.round("dist6", 4).alias("dist")))


_IVF_ASSIGN_SQL = f"""
WITH e AS (
  SELECT vec_id, label AS own_label, {_SQL_VEC} AS v FROM embeddings
), c0 AS (
  SELECT own_label AS cell, g.i AS pos, ROUND(AVG(v[g.i]), 6) AS cv
  FROM e, generate_series(1, {DIM}) AS g(i)
  GROUP BY own_label, g.i
), c AS (
  SELECT cell, list(cv ORDER BY pos) AS cvec FROM c0 GROUP BY cell
), d AS (
  SELECT e.vec_id, e.own_label, c.cell,
         ROUND(sqrt(list_reduce(
             list_transform(range(1, {DIM + 1}),
                            i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i])),
             (x, y) -> x + y)), 6) AS dist6
  FROM e, c
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY dist6 ASC, cell ASC) AS rn
  FROM d
)
SELECT vec_id, own_label, cell AS assigned_cell, ROUND(dist6, 4) AS dist
FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------------
# scalar quantization (vector compression for the storage tier)
# --------------------------------------------------------------------------

def emb_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization: code_i = round(255 *
    (x_i - min) / (max - min)) - 128. The storage-tier compression step
    of an ANN stack (4x smaller than float32); a narrow map, zero
    shuffle. Output digests the code array so the oracle verifies every
    code byte without hauling arrays through the compare."""
    emb = t(spark, sf_dir).select("vec_id", _vecd().alias("v"))
    vmin, vmax = F.array_min("v"), F.array_max("v")
    scale = F.when(vmax > vmin, vmax - vmin).otherwise(F.lit(1.0))
    codes = F.transform(
        "v", lambda x: (F.round((x - vmin) / scale * 255.0, 0)
                        .cast("int") - 128))
    return emb.select(
        "vec_id",
        F.round(vmin, 6).alias("qmin"),
        F.round(vmax, 6).alias("qmax"),
        F.md5(F.array_join(F.transform(codes, lambda c: c.cast("string")),
                           ",")).alias("codes_md5"),
    )


_SCALAR_QUANT_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SQL_VEC} AS v FROM embeddings
), mm AS (
  SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax,
         CASE WHEN list_max(v) > list_min(v)
              THEN list_max(v) - list_min(v) ELSE 1.0 END AS scale
  FROM e
)
SELECT vec_id,
       ROUND(vmin, 6) AS qmin,
       ROUND(vmax, 6) AS qmax,
       md5(list_aggregate(
         list_transform(v, x -> CAST(CAST(round((x - vmin) / scale * 255.0, 0)
                                          AS INT) - 128 AS VARCHAR)),
         'string_agg', ',')) AS codes_md5
FROM mm
"""


# --------------------------------------------------------------------------
# multi-probe LSH top-k (recall without more tables)
# --------------------------------------------------------------------------

MULTIPROBE_TOPK = 5


def emb_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its own bucket PLUS every
    Hamming-distance-1 bucket (8 bit-flips per band × 2 bands = 18
    probes) — the standard recall lever that avoids building more hash
    tables. The corpus is bucketed ONCE (narrow map); the probe list is
    query-side only (tiny, broadcast), so the single corpus-side
    operation is an equi-join on (band, bucket). Candidates are deduped
    per (query, neighbor), exact-cosine-verified, and ranked top-k."""
    corpus = _banded_corpus(spark, sf_dir, cap=None)

    emb = t(spark, sf_dir).select(
        "vec_id", _vecd().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    sig = emb.withColumn("sig", _lsh_signature(F.col("v")))
    q = sig.filter(F.col("vec_id") < N_QUERIES)
    probe_structs = []
    for b in range(EMB_LSH_BANDS):
        bucket = F.substring("sig", b * EMB_BAND_BITS + 1, EMB_BAND_BITS)
        for p in range(EMB_BAND_BITS + 1):
            if p == 0:
                probe = bucket
            else:  # flip bit p (1-based) of the band bucket
                probe = F.concat(
                    F.substring(bucket, 1, p - 1),
                    F.when(F.substring(bucket, p, 1) == "1",
                           F.lit("0")).otherwise(F.lit("1")),
                    F.substring(bucket, p + 1, EMB_BAND_BITS - p))
            probe_structs.append(
                F.struct(F.lit(b).alias("band"), probe.alias("bucket")))
    probes = q.select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode(F.array(*probe_structs)).alias("pb"),
    ).select("q_id", "qv", "qn", "pb.band", "pb.bucket")

    j = corpus.join(F.broadcast(probes), ["band", "bucket"]) \
        .filter(F.col("vec_id") != F.col("q_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    cand = (j.select("q_id", F.col("vec_id").alias("neighbor_id"),
                     F.round(cos, 6).alias("cos6"))
            .groupBy("q_id", "neighbor_id").agg(F.max("cos6").alias("cos6")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                           F.asc("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= MULTIPROBE_TOPK)
            .select("q_id", "neighbor_id",
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


_MULTIPROBE_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, v, {_sql_norm('v')} AS nrm FROM e
), sig AS (
  SELECT vec_id, v, nrm, {_sql_signature()} AS sig FROM n
), corpus AS (
  {_SQL_BANDS_FRAGMENT}
), qb AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, band,
         substring(sig, band * {EMB_BAND_BITS} + 1, {EMB_BAND_BITS})
           AS bucket
  FROM sig, (SELECT unnest(range(0, {EMB_LSH_BANDS})) AS band)
  WHERE vec_id < {N_QUERIES}
), probes AS (
  SELECT q_id, qv, qn, band,
         CASE WHEN p = 0 THEN bucket
              ELSE substring(bucket, 1, CAST(p AS INT) - 1)
                   || (CASE WHEN substring(bucket, CAST(p AS INT), 1) = '1'
                            THEN '0' ELSE '1' END)
                   || substring(bucket, CAST(p AS INT) + 1,
                                {EMB_BAND_BITS} - CAST(p AS INT))
         END AS bucket
  FROM qb, (SELECT unnest(range(0, {EMB_BAND_BITS + 1})) AS p)
), cand AS (
  SELECT p.q_id, c.vec_id AS neighbor_id,
         MAX(ROUND({_sql_dot('p.qv', 'c.v')} / (p.qn * c.nrm), 6)) AS cos6
  FROM corpus c JOIN probes p USING (band, bucket)
  WHERE c.vec_id <> p.q_id
  GROUP BY p.q_id, c.vec_id
), ranked AS (
  SELECT q_id, neighbor_id, cos6,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos6 DESC, neighbor_id ASC) AS rank
  FROM cand
)
SELECT q_id, neighbor_id, ROUND(cos6, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {MULTIPROBE_TOPK}
"""


# --------------------------------------------------------------------------
# product quantization (the storage-tier companion to scalar quantization)
# --------------------------------------------------------------------------

PQ_M = 8                 # subvectors per vector
PQ_K = 16                # centroids per sub-codebook
PQ_DSUB = DIM // PQ_M    # dims per subvector


def _pq_codebooks() -> list[list[list[float]]]:
    """Deterministic seeded codebooks: component d of centroid c in
    subspace j = md5('pq_<j>_<c>_<d>') mapped to [-1, 1), rounded to 6
    decimals so Spark and DuckDB parse bit-identical literals. (A
    k-means-trained codebook drops in by replacing this function; the
    assignment plan below is unchanged.)"""
    cbs = []
    for j in range(PQ_M):
        ks = []
        for c in range(PQ_K):
            row = []
            for d in range(PQ_DSUB):
                h = hashlib.md5(f"pq_{j}_{c}_{d}".encode()).hexdigest()
                row.append(round(int(h[:4], 16) / 32768.0 - 1.0, 6))
            ks.append(row)
        cbs.append(ks)
    return cbs


PQ_CODEBOOKS = _pq_codebooks()


def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: split each vector into PQ_M subvectors,
    assign each to its nearest centroid in a per-subspace codebook of
    PQ_K entries → PQ_M small codes per vector (8 bytes here vs 256 for
    float32 — the standard ANN storage tier beside int8 scalar
    quantization). Narrow map, zero shuffle; codebooks are literals in
    the plan (k·m·dsub = 1024 doubles — broadcast-free).

    Determinism across engines: distances are left-fold doubles rounded
    to 6 decimals; argmin = first position of the min (lowest-index
    tiebreak on both engines)."""
    emb = t(spark, sf_dir).select("vec_id", _vecd().alias("v"))
    codes = []
    for j in range(PQ_M):
        sub = F.slice("v", j * PQ_DSUB + 1, PQ_DSUB)
        dists = F.array(*[
            F.round(F.aggregate(
                F.zip_with(sub, F.array(*[F.lit(x) for x in cb]),
                           lambda x, c: (x - c) * (x - c)),
                F.lit(0.0), lambda acc, x: acc + x), 6)
            for cb in PQ_CODEBOOKS[j]])
        codes.append((F.array_position(dists, F.array_min(dists)) - 1)
                     .cast("int"))
    code_arr = F.array(*codes)
    code_str = F.array_join(F.transform(code_arr,
                                        lambda c: c.cast("string")), ",")
    return emb.select("vec_id", code_str.alias("pq_codes"),
                      F.md5(code_str).alias("codes_md5"))


def _sql_pq_sub(j: int) -> str:
    dists = []
    for cb in PQ_CODEBOOKS[j]:
        lit = "[" + ", ".join(f"{x:.6f}" for x in cb) + "]"
        dists.append(
            f"round(list_reduce(list_transform(range(1, {PQ_DSUB + 1}), "
            f"i -> (v[{j * PQ_DSUB}+i] - ({lit})[i]) "
            f"* (v[{j * PQ_DSUB}+i] - ({lit})[i])), (x, y) -> x + y), 6)")
    arr = "[" + ", ".join(dists) + "]"
    return (f"CAST(list_position({arr}, list_min({arr})) - 1 AS INT)")


_PQ_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SQL_VEC} AS v FROM embeddings
), c AS (
  SELECT vec_id,
         list_aggregate(list_transform(
             [{", ".join(_sql_pq_sub(j) for j in range(PQ_M))}],
             x -> CAST(x AS VARCHAR)), 'string_agg', ',') AS pq_codes
  FROM e
)
SELECT vec_id, pq_codes, md5(pq_codes) AS codes_md5 FROM c
"""




PQT_ITERS = 2   # fixed Lloyd rounds per subspace — fixed so the
                # unrolled-CTE oracle stays finite (same discipline as
                # KM_ITERS); PQ codebooks converge fast because each
                # subspace is only PQ_DSUB dims


def _pq_subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, sv): every vector split into its PQ_M subvectors —
    the training frame for per-subspace Lloyd."""
    emb = t(spark, sf_dir).select("vec_id", _vecd().alias("v"))
    subs = F.array(*[
        F.struct(F.lit(j).alias("m"),
                 F.slice("v", j * PQ_DSUB + 1, PQ_DSUB).alias("sv"))
        for j in range(PQ_M)])
    return (emb.select("vec_id", F.explode(subs).alias("s"))
            .select("vec_id", F.col("s.m").alias("m"),
                    F.col("s.sv").alias("sv")))


def emb_pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook TRAINING — per-subspace Lloyd's algorithm (Jégou
    et al. 2011 §III: product quantizers are trained as M independent
    k-means problems over the subvector projections). Closes the same
    gap for emb_pq_codes that emb_kmeans_train closed for emb_ivf_topk:
    the codebooks stop being seeded literals and become learned
    in-plan, with the trained table feeding the identical assignment
    shape. Init = the first PQ_K subvectors per subspace, PQT_ITERS
    fixed rounds, centroid components rounded to KM_ROUND each round
    on both engines so downstream argmins see identical doubles.

    Scale shape: all PQ_M subspace problems train SIMULTANEOUSLY in
    one frame keyed m — per round, assignment is an equi-join against
    a broadcast PQ_M-row centroid-array table (narrow map; no corpus
    shuffle), and the update is ONE partial-agg groupBy keyed
    (m, cell, pos) emitting at most M·K·DSUB rows; localCheckpoint
    truncates per-round lineage (the hosts_pagerank discipline).
    Output: (m, cell, pos, cv, n_members) — the exploded trained
    codebooks plus final member counts."""
    return _pq_train_from(_pq_subvectors(spark, sf_dir))


def _pq_train_cent(subs: DataFrame):
    """Per-subspace Lloyd core over any (vec_id, m, sv) frame:
    returns (final codebook frame (m, cell, cv array), assign
    function) — shared by the exploded-report wrapper below and by
    emb_ivfpq_trained_topk, which consumes the codebooks directly."""
    cent = (subs.filter(F.col("vec_id") < PQ_K)
            .select("m", F.col("vec_id").alias("cell"),
                    F.col("sv").alias("cv")))

    def assign(c: DataFrame) -> DataFrame:
        centm = c.groupBy("m").agg(F.array_sort(
            F.collect_list(F.struct("cell", "cv"))).alias("cents"))
        return (subs.join(F.broadcast(centm), "m")
                .select("vec_id", "m", "sv",
                        _km_argmin_sub(F.col("sv"),
                                       F.col("cents")).alias("cell")))

    for _ in range(PQT_ITERS):
        assigned = assign(cent)
        cent = (assigned
                .select("m", "cell", F.posexplode("sv").alias("pos", "x"))
                .groupBy("m", "cell", "pos")
                .agg(F.round(F.avg("x"), KM_ROUND).alias("cv"))
                .groupBy("m", "cell")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s.cv).alias("cv"))
                ).localCheckpoint(eager=False)
    return cent, assign


def _pq_train_from(subs: DataFrame) -> DataFrame:
    """Per-subspace Lloyd over any (vec_id, m, sv) frame — shared by
    emb_pq_train (raw subvectors) and emb_pq_train_residual
    (residual subvectors)."""
    cent, assign = _pq_train_cent(subs)
    final = assign(cent)
    counts = final.groupBy("m", "cell").agg(
        F.count("*").alias("n_members"))
    return (cent.select("m", "cell", F.posexplode("cv").alias("pos", "c"))
            .join(counts, ["m", "cell"])
            .select("m", "cell", "pos", F.col("c").alias("cv"),
                    "n_members"))


def _km_argmin_sub(sv: Column, cents: Column) -> Column:
    """_km_argmin over subvectors (any length — _dist2's zip_with
    fold is length-agnostic)."""
    scored = F.transform(
        cents, lambda c: F.struct(_dist2(sv, c["cv"]).alias("d"),
                                  c["cell"].alias("cell")))
    return F.array_min(scored).getField("cell")


def _sql_sub_dist2(a: str, b: str) -> str:
    return (f"list_reduce(list_transform(range(1, {PQ_DSUB + 1}), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), "
            f"(x, y) -> x + y)")


def _pq_train_sql() -> str:
    """Unrolled per-subspace Lloyd — the emb_kmeans_train oracle
    pattern with subspace id m as an extra key column (one CTE chain
    trains all PQ_M problems at once, mirroring the Spark frame)."""
    return _pq_train_sql_from([
        f"e AS (SELECT vec_id, {_SQL_VEC} AS v FROM embeddings)",
        f"s AS (SELECT vec_id, CAST(t.m AS INT) AS m,\n"
        f"              list_transform(range(1, {PQ_DSUB + 1}),\n"
        f"                  i -> v[t.m * {PQ_DSUB} + i]) AS sv\n"
        f"       FROM e, range(0, {PQ_M}) AS t(m))",
    ])


def _pq_train_ctes(base_parts: list[str],
                   pfx: str = "c") -> tuple[list[str], str]:
    """The Lloyd CTE chain over any base providing s(vec_id, m, sv),
    returned as (parts, final-codebook CTE name) so a composing query
    (emb_ivfpq_trained_topk's oracle) can keep building; ``pfx``
    namespaces the chain's CTEs so a caller can embed it beside
    another iterative chain (the residual variant nests it after
    _KM_CTES, whose own a1../c1.. names must stay untouched)."""
    parts = list(base_parts)
    parts.append(
        f"{pfx}0 AS (SELECT m, vec_id AS cell, sv AS cv FROM s "
        f"WHERE vec_id < {PQ_K})")
    prev = f"{pfx}0"
    for it in range(1, PQT_ITERS + 1):
        parts.append(
            f"{pfx}a{it} AS (\n"
            f"  SELECT vec_id, m, sv, cell FROM (\n"
            f"    SELECT vec_id, m, sv, cell, ROW_NUMBER() OVER (\n"
            f"      PARTITION BY vec_id, m ORDER BY d, cell) AS rn\n"
            f"    FROM (SELECT s.vec_id, s.m, s.sv, c.cell,\n"
            f"                 {_sql_sub_dist2('s.sv', 'c.cv')} AS d\n"
            f"          FROM s JOIN {prev} c ON s.m = c.m))\n"
            f"  WHERE rn = 1)")
        parts.append(
            f"{pfx}{it} AS (\n"
            f"  SELECT m, cell, list(cv ORDER BY pos) AS cv FROM (\n"
            f"    SELECT m, cell, u.i AS pos,\n"
            f"           ROUND(AVG(sv[u.i]), {KM_ROUND}) AS cv\n"
            f"    FROM {pfx}a{it}, generate_series(1, {PQ_DSUB}) AS u(i)\n"
            f"    GROUP BY m, cell, u.i)\n"
            f"  GROUP BY m, cell)")
        prev = f"{pfx}{it}"
    parts.append(
        f"{pfx}af AS (\n"
        f"  SELECT vec_id, m, cell FROM (\n"
        f"    SELECT vec_id, m, cell, ROW_NUMBER() OVER (\n"
        f"      PARTITION BY vec_id, m ORDER BY d, cell) AS rn\n"
        f"    FROM (SELECT s.vec_id, s.m, c.cell,\n"
        f"                 {_sql_sub_dist2('s.sv', 'c.cv')} AS d\n"
        f"          FROM s JOIN {prev} c ON s.m = c.m))\n"
        f"  WHERE rn = 1)")
    return parts, prev


def _pq_train_sql_from(base_parts: list[str], pfx: str = "c") -> str:
    """Complete trained-codebook report statement over the CTE chain."""
    parts, prev = _pq_train_ctes(base_parts, pfx)
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes},
counts AS (
  SELECT m, cell, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM {pfx}af GROUP BY m, cell
)
SELECT c.m, c.cell, CAST(u.i - 1 AS INT) AS pos, c.cv[u.i] AS cv,
       counts.n_members
FROM {prev} c JOIN counts ON counts.m = c.m AND counts.cell = c.cell,
     generate_series(1, {PQ_DSUB}) AS u(i)
"""


def emb_pq_train_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebooks trained on RESIDUAL statistics — the missing half
    of emb_ivfpq_residual_topk's measured-neutral verdict
    (BENCH/residual_adc.json: residual ENCODING with seeded codebooks
    gains nothing; the production win is codebooks trained on
    (v − centroid) — this op). Per-subspace Lloyd over the residual
    subvectors of the trained coarse quantizer's final assignment —
    the same shared kernel as emb_pq_train, different input frame.
    The test closes the loop quantitatively: residual-trained
    codebooks must reconstruct residuals with LOWER total squared
    error than BOTH the seeded literals and the raw-trained codebooks
    evaluated on the same residuals.

    Scale shape: the coarse quantizer is the audited _kmeans loop;
    the residualization is one broadcast K-row equi-join; training is
    emb_pq_train's audited bounded-aggregate iteration."""
    cent, assigned = _kmeans(spark, sf_dir)
    cent_b = cent.select(F.col("cell").alias("rcell"),
                         F.col("cv").alias("rcv"))
    res = (assigned
           .join(F.broadcast(cent_b), F.col("cell") == F.col("rcell"))
           .select("vec_id",
                   F.zip_with("v", "rcv", lambda a, b: a - b)
                   .alias("rv")))
    subs = F.array(*[
        F.struct(F.lit(j).alias("m"),
                 F.slice("rv", j * PQ_DSUB + 1, PQ_DSUB).alias("sv"))
        for j in range(PQ_M)])
    frame = (res.select("vec_id", F.explode(subs).alias("s"))
             .select("vec_id", F.col("s.m").alias("m"),
                     F.col("s.sv").alias("sv")))
    return _pq_train_from(frame)


def _pq_train_residual_sql() -> str:
    base = [
        # e, a1../c1.., af — the trained coarse quantizer (_KM_CTES
        # carries its own leading WITH; the chain builder adds ours)
        _KM_CTES.removeprefix("WITH "),
        f"res AS (\n"
        f"  SELECT af.vec_id,\n"
        f"         list_transform(range(1, {DIM + 1}),\n"
        f"                        i -> af.v[i] - c.cv[i]) AS rv\n"
        f"  FROM af JOIN {_KM_FINAL} c ON c.cell = af.cell)",
        f"s AS (SELECT vec_id, CAST(t.m AS INT) AS m,\n"
        f"              list_transform(range(1, {PQ_DSUB + 1}),\n"
        f"                  i -> rv[t.m * {PQ_DSUB} + i]) AS sv\n"
        f"       FROM res, range(0, {PQ_M}) AS t(m))",
    ]
    return _pq_train_sql_from(base, pfx="pqc")


def emb_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-distortion report: per vector, the exact squared
    reconstruction error of BOTH storage-tier codecs — int8 scalar
    quantization (decode: (code+128)/255*scale + vmin) and product
    quantization (whose per-subspace min distance IS the subspace
    reconstruction error, so the PQ error is the sum of the assigned
    distances — no second pass) — plus the codec each vector would
    pick at equal read cost. This is the dashboard an ANN storage tier
    publishes per corpus before committing to a codec/bit budget
    (recall curves measure the END effect; distortion is the leading
    indicator and needs no query set).

    Determinism across engines: every fold is per-row left-to-right
    over the dims with the same rounding as the codecs themselves
    (round 6); no cross-row float aggregation exists to reorder.

    Scale shape: pure narrow map over the corpus, zero shuffle; the
    codebooks are plan literals exactly as in emb_pq_codes."""
    emb = t(spark, sf_dir).select("vec_id", _vecd().alias("v"))
    vmin, vmax = F.array_min("v"), F.array_max("v")
    scale = F.when(vmax > vmin, vmax - vmin).otherwise(F.lit(1.0))
    recon = F.transform(
        "v", lambda x: ((F.round((x - vmin) / scale * 255.0, 0)
                         .cast("int")).cast("double") / 255.0 * scale
                        + vmin))
    sq_err = F.round(F.aggregate(
        F.zip_with("v", recon, lambda x, r: (x - r) * (x - r)),
        F.lit(0.0), lambda acc, x: acc + x), 6)
    pq_terms = []
    for j in range(PQ_M):
        sub = F.slice("v", j * PQ_DSUB + 1, PQ_DSUB)
        dists = F.array(*[
            F.round(F.aggregate(
                F.zip_with(sub, F.array(*[F.lit(x) for x in cb]),
                           lambda x, c: (x - c) * (x - c)),
                F.lit(0.0), lambda acc, x: acc + x), 6)
            for cb in PQ_CODEBOOKS[j]])
        pq_terms.append(F.array_min(dists))
    pq_err = F.round(sum(pq_terms[1:], pq_terms[0]), 6)
    return emb.select(
        "vec_id",
        sq_err.alias("sq_err"),
        pq_err.alias("pq_err"),
        F.lit(DIM + 8).alias("sq_bytes"),      # codes + (min, max)
        F.lit(PQ_M).alias("pq_bytes"),         # one byte per code
        F.when(sq_err <= pq_err, F.lit("sq_int8")).otherwise(F.lit("pq"))
         .alias("lower_distortion"))


def _sql_pq_err(j: int) -> str:
    dists = []
    for cb in PQ_CODEBOOKS[j]:
        lit = "[" + ", ".join(f"{x:.6f}" for x in cb) + "]"
        dists.append(
            f"round(list_reduce(list_transform(range(1, {PQ_DSUB + 1}), "
            f"i -> (v[{j * PQ_DSUB}+i] - ({lit})[i]) "
            f"* (v[{j * PQ_DSUB}+i] - ({lit})[i])), (x, y) -> x + y), 6)")
    return f"list_min([{', '.join(dists)}])"


_QUANT_ERR_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SQL_VEC} AS v FROM embeddings
), mm AS (
  SELECT vec_id, v,
         list_min(v) AS vmin,
         CASE WHEN list_max(v) > list_min(v)
              THEN list_max(v) - list_min(v) ELSE 1.0 END AS scale
  FROM e
), err AS (
  SELECT vec_id,
         round(list_reduce(list_transform(v,
             x -> (x - (CAST(CAST(round((x - vmin) / scale * 255.0, 0)
                                  AS INT) AS DOUBLE) / 255.0 * scale
                        + vmin))
                  * (x - (CAST(CAST(round((x - vmin) / scale * 255.0, 0)
                                    AS INT) AS DOUBLE) / 255.0 * scale
                          + vmin))),
             (x, y) -> x + y), 6) AS sq_err,
         round({" + ".join(_sql_pq_err(j) for j in range(PQ_M))}, 6)
             AS pq_err
  FROM mm
)
SELECT vec_id, sq_err, pq_err,
       {DIM + 8} AS sq_bytes, {PQ_M} AS pq_bytes,
       CASE WHEN sq_err <= pq_err THEN 'sq_int8' ELSE 'pq' END
           AS lower_distortion
FROM err
"""


# --------------------------------------------------------------------------
# SemDeDup: semantic within-cluster deduplication
# --------------------------------------------------------------------------

SEMDEDUP_COS = 0.3       # pair-cosine threshold (the paper's eps knob)
SEMDEDUP_CELL_CAP = 200  # guard: within-cell pairing is O(cell²); SemDeDup's
                         # own premise is that k (cluster count) is chosen so
                         # cells stay small (~n/k). Cells above the cap skip
                         # pairing and keep all rows, flagged cell_capped —
                         # owned by re-clustering with a larger k, the same
                         # discipline as EMB_BUCKET_CAP on the LSH path.


def emb_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup WITHIN coarse
    clusters — never across the corpus. Each vector's cell is its
    coarse-quantizer assignment (``label``, as in emb_ivf_topk); within
    a cell, members are ordered by ascending cosine-to-centroid (the
    paper keeps the LOW-centroid-similarity representative — the
    "edge" example — from each duplicate group; vec_id breaks ties)
    and a vector is dropped iff it has pair cosine ≥ SEMDEDUP_COS with
    some EARLIER vector in that order. Pairwise-greedy against earlier
    keepers is the standard published implementation shape.

    Scale shape (100 TB): centroids are one partial-agg groupBy over
    (cell, dim) then broadcast (k·DIM doubles); the pairing is an
    equi-join on cell — never corpus-wide — and SemDeDup's design knob
    (k) bounds cell size, with SEMDEDUP_CELL_CAP as the explicit guard
    asserted in the plan test. The reference has no embedding stage at
    all (SURVEY §2 absent lists)."""
    emb = t(spark, sf_dir).select(
        "vec_id", F.col("label").alias("cell"), _vecd().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    exploded = emb.select("cell", F.posexplode("v").alias("pos", "x"))
    cent = (exploded.groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), 6).alias("cv")))
    cvecs = (cent.groupBy("cell")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                 lambda s: s.cv).alias("cvec")))
    j = emb.join(F.broadcast(cvecs), "cell")
    ccos = F.round(_dot(F.col("v"), F.col("cvec"))
                   / (F.col("nrm") * _norm(F.col("cvec"))), 6)
    scored = j.select("vec_id", "cell", "v", "nrm", ccos.alias("ccos"))
    ranked = (scored
              .withColumn("cell_n",
                          F.count(F.lit(1)).over(Window.partitionBy("cell")))
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("cell")
                  .orderBy(F.asc("ccos"), F.asc("vec_id")))))
    small = ranked.filter(F.col("cell_n") <= SEMDEDUP_CELL_CAP)
    a = small.select("cell", F.col("rn").alias("rn_a"),
                     F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = small.select("cell", F.col("rn").alias("rn_b"),
                     F.col("vec_id").alias("vec_id_b"),
                     F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pair_cos = F.round(_dot(F.col("va"), F.col("vb"))
                       / (F.col("na") * F.col("nb")), 4)
    dups = (a.join(b, "cell").filter(F.col("rn_a") < F.col("rn_b"))
            .select("vec_id_b", pair_cos.alias("cos4"))
            .filter(F.col("cos4") >= SEMDEDUP_COS)
            .groupBy(F.col("vec_id_b").alias("vec_id"))
            .agg(F.count(F.lit(1)).alias("n_dup_earlier")))
    out = ranked.join(dups, "vec_id", "left")
    n_dup = F.coalesce(F.col("n_dup_earlier"), F.lit(0))
    action = (F.when(F.col("cell_n") > SEMDEDUP_CELL_CAP, F.lit("keep"))
              .when(n_dup > 0, F.lit("drop")).otherwise(F.lit("keep")))
    return out.select(
        "vec_id", "cell", F.round("ccos", 4).alias("centroid_cos"),
        (F.col("cell_n") > SEMDEDUP_CELL_CAP).alias("cell_capped"),
        n_dup.alias("n_dup_earlier"), action.alias("action"))


_SEMDEDUP_SQL = f"""
WITH e AS (
  SELECT vec_id, label AS cell, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, cell, v, {_sql_norm('v')} AS nrm FROM e
), c0 AS (
  SELECT cell, g.i AS pos, ROUND(AVG(v[g.i]), 6) AS cv
  FROM n, generate_series(1, {DIM}) AS g(i)
  GROUP BY cell, g.i
), c AS (
  SELECT cell, list(cv ORDER BY pos) AS cvec FROM c0 GROUP BY cell
), s AS (
  SELECT n.vec_id, n.cell, n.v, n.nrm,
         ROUND({_sql_dot('n.v', 'c.cvec')}
               / (n.nrm * {_sql_norm('c.cvec')}), 6) AS ccos
  FROM n JOIN c USING (cell)
), r AS (
  SELECT *, COUNT(*) OVER (PARTITION BY cell) AS cell_n,
         ROW_NUMBER() OVER (PARTITION BY cell
                            ORDER BY ccos ASC, vec_id ASC) AS rn
  FROM s
), d AS (
  SELECT b.vec_id, COUNT(*) AS n_dup_earlier
  FROM r a JOIN r b ON a.cell = b.cell AND a.rn < b.rn
  WHERE a.cell_n <= {SEMDEDUP_CELL_CAP}
    AND ROUND({_sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm), 4)
        >= {SEMDEDUP_COS}
  GROUP BY b.vec_id
)
SELECT r.vec_id, r.cell, ROUND(r.ccos, 4) AS centroid_cos,
       r.cell_n > {SEMDEDUP_CELL_CAP} AS cell_capped,
       COALESCE(d.n_dup_earlier, 0) AS n_dup_earlier,
       CASE WHEN r.cell_n > {SEMDEDUP_CELL_CAP} THEN 'keep'
            WHEN COALESCE(d.n_dup_earlier, 0) > 0 THEN 'drop'
            ELSE 'keep' END AS action
FROM r LEFT JOIN d ON d.vec_id = r.vec_id
"""


# --------------------------------------------------------------------------
# k-means Lloyd training (the real IVF coarse quantizer)
# --------------------------------------------------------------------------

KM_K = 8        # trained cells (deliberately < the fixture's 10 true
                # clusters so merged cells genuinely occur)
KM_ITERS = 3    # fixed Lloyd iterations — fixed, not converge-tested,
                # so the unrolled-CTE oracle is finite
KM_ROUND = 6    # centroid components round here each iteration on BOTH
                # engines, so downstream argmins see identical doubles


def _dist2(a: Column, b: Column) -> Column:
    """Squared L2, left-to-right fold (bit-identical to the DuckDB
    mirror's list_reduce)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def _sql_dist2(a: str, b: str) -> str:
    return (f"list_reduce(list_transform(range(1, {DIM + 1}), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), "
            f"(x, y) -> x + y)")


def _km_argmin(v: Column, cents: Column) -> Column:
    """Nearest-centroid cell id, computed INLINE over the broadcast
    centroid array: score every centroid with a narrow transform, take
    array_min over struct(d, cell) — ties break to the lowest cell id.
    No explode, no per-iteration shuffle of the corpus."""
    scored = F.transform(
        cents, lambda c: F.struct(_dist2(v, c["cv"]).alias("d"),
                                  c["cell"].alias("cell")))
    return F.array_min(scored).getField("cell")


def _kmeans(spark: SparkSession, sf_dir: str,
            k: int = KM_K) -> tuple[DataFrame, DataFrame]:
    """Lloyd's algorithm, KM_ITERS fixed rounds, init = the first KM_K
    vectors (deterministic, no RNG to ship). Returns (centroids(cell,
    cv array), final assignment(vec_id, v, cell)).

    Scale shape (100 TB): each iteration is ONE bounded shuffle — the
    (cell, dim) centroid aggregate, K·DIM rows out with map-side
    partial_avg — while the assignment step is a narrow map against a
    broadcast 1-row centroid array (same totals-broadcast pattern as
    docs_bigram_logprob). localCheckpoint truncates per-round lineage,
    the hosts_pagerank / near_dup_clusters discipline. Cells that lose
    all members drop out identically on both engines. The reference
    has no embedding stage (SURVEY §2 absent lists)."""
    emb = t(spark, sf_dir).select("vec_id", _vecd().alias("v"))
    cent = (emb.filter(F.col("vec_id") < k)
            .select(F.col("vec_id").alias("cell"), F.col("v").alias("cv")))
    assigned = None
    for _ in range(KM_ITERS):
        centrow = cent.agg(F.array_sort(
            F.collect_list(F.struct("cell", "cv"))).alias("cents"))
        assigned = (emb.crossJoin(F.broadcast(centrow))
                    .select("vec_id", "v",
                            _km_argmin(F.col("v"),
                                       F.col("cents")).alias("cell")))
        cent = (assigned.select("cell", F.posexplode("v").alias("pos", "x"))
                .groupBy("cell", "pos")
                .agg(F.round(F.avg("x"), KM_ROUND).alias("cv"))
                .groupBy("cell")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s.cv).alias("cv"))
                ).localCheckpoint(eager=False)
    centrow = cent.agg(F.array_sort(
        F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    assigned = (emb.crossJoin(F.broadcast(centrow))
                .select("vec_id", "v",
                        _km_argmin(F.col("v"), F.col("cents")).alias("cell")))
    return cent, assigned


def emb_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained coarse quantizer: final Lloyd centroids (exploded to
    (cell, pos, cv) for the oracle) + member count per cell from the
    final assignment. Replaces the round-3 note on emb_ivf_topk that
    the ``label`` column 'plays the trained coarse quantizer' — this IS
    the training step."""
    cent, assigned = _kmeans(spark, sf_dir)
    counts = assigned.groupBy("cell").agg(F.count("*").alias("n_members"))
    return (cent.select("cell", F.posexplode("cv").alias("pos", "c"))
            .join(counts, "cell")
            .select("cell", "pos", F.col("c").alias("cv"), "n_members"))


def emb_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over TRAINED cells: queries and corpus both carry
    their Lloyd-final cell; a probe is an equi-join on cell id, same
    shape as emb_ivf_topk but with the quantizer learned in-plan
    instead of read from the fixture ``label``."""
    _, assigned = _kmeans(spark, sf_dir)
    emb = assigned.withColumn("nrm", _norm(F.col("v")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("cell").alias("q_cell"),
        F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    j = emb.join(F.broadcast(q), (F.col("cell") == F.col("q_cell"))
                 & (F.col("vec_id") != F.col("q_id")))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = j.select("q_id", "cell",
                      F.col("vec_id").alias("neighbor_id"),
                      F.round(cos, 6).alias("cos6"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                           F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= IVF_TOPK)
            .select("q_id", "cell", "neighbor_id",
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


IVF_NPROBE = 2


def emb_ivf_trained_multiprobe_topk(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """IVF multiprobe over trained cells: each query probes its
    IVF_NPROBE nearest Lloyd centroids instead of one — the standard
    recall lever when cluster boundaries cut true neighborhoods (the
    IVF analogue of emb_lsh_multiprobe_topk's Hamming-1 expansion).
    Probe list construction is the same broadcast-centroid narrow map
    as assignment (sort the scored-centroid array, slice NPROBE); the
    corpus side still sees only equi-joins on cell id, now against a
    2x-larger broadcast query list. Cells are disjoint, so no
    candidate dedup is needed."""
    cent, assigned = _kmeans(spark, sf_dir)
    emb = assigned.withColumn("nrm", _norm(F.col("v")))
    centrow = cent.agg(F.array_sort(
        F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    scored_cells = F.transform(
        F.col("cents"), lambda c: F.struct(
            _dist2(F.col("v"), c["cv"]).alias("d"),
            c["cell"].alias("cell")))
    probes = F.transform(
        F.slice(F.array_sort(scored_cells), 1, IVF_NPROBE),
        lambda s: s["cell"])
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .crossJoin(F.broadcast(centrow))
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qn"),
                 F.explode(probes).alias("q_cell")))
    j = emb.join(F.broadcast(q), (F.col("cell") == F.col("q_cell"))
                 & (F.col("vec_id") != F.col("q_id")))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = j.select("q_id", "cell",
                      F.col("vec_id").alias("neighbor_id"),
                      F.round(cos, 6).alias("cos6"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                           F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= IVF_TOPK)
            .select("q_id", "cell", "neighbor_id",
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


def _km_sql_ctes(k: int = KM_K, prefix: str = "",
                 with_e: bool = True) -> str:
    """Unrolled Lloyd iterations as a CTE chain (the oracle cannot
    loop; KM_ITERS is fixed precisely so this stays finite).
    ``k``/``prefix`` let consumers unroll SEVERAL independent Lloyd
    chains (different K) in one statement — the elbow sweep's
    device; ``with_e`` controls whether the shared ``e`` CTE is
    emitted (only once per statement)."""
    parts = ([f"e AS (SELECT vec_id, {_SQL_VEC} AS v FROM embeddings)"]
             if with_e else [])
    parts += [
        f"{prefix}c0 AS (SELECT vec_id AS cell, v AS cv FROM e "
        f"WHERE vec_id < {k})",
    ]
    prev = f"{prefix}c0"
    for it in range(1, KM_ITERS + 1):
        parts.append(
            f"{prefix}a{it} AS (\n"
            f"  SELECT vec_id, v, cell FROM (\n"
            f"    SELECT vec_id, v, cell, ROW_NUMBER() OVER (\n"
            f"      PARTITION BY vec_id ORDER BY d, cell) AS rn\n"
            f"    FROM (SELECT e.vec_id, e.v, c.cell,\n"
            f"                 {_sql_dist2('e.v', 'c.cv')} AS d\n"
            f"          FROM e CROSS JOIN {prev} c))\n"
            f"  WHERE rn = 1)")
        parts.append(
            f"{prefix}c{it} AS (\n"
            f"  SELECT cell, list(cv ORDER BY pos) AS cv FROM (\n"
            f"    SELECT cell, u.i AS pos, ROUND(AVG(v[u.i]), {KM_ROUND})"
            f" AS cv\n"
            f"    FROM {prefix}a{it}, generate_series(1, {DIM}) AS u(i)\n"
            f"    GROUP BY cell, u.i)\n"
            f"  GROUP BY cell)")
        prev = f"{prefix}c{it}"
    parts.append(
        f"{prefix}af AS (\n"
        f"  SELECT vec_id, v, cell FROM (\n"
        f"    SELECT vec_id, v, cell, ROW_NUMBER() OVER (\n"
        f"      PARTITION BY vec_id ORDER BY d, cell) AS rn\n"
        f"    FROM (SELECT e.vec_id, e.v, c.cell,\n"
        f"                 {_sql_dist2('e.v', 'c.cv')} AS d\n"
        f"          FROM e CROSS JOIN {prev} c))\n"
        f"  WHERE rn = 1)")
    return ("WITH " + ",\n".join(parts) if with_e
            else ",\n".join(parts)), prev


_KM_CTES, _KM_FINAL = _km_sql_ctes()

_KMEANS_TRAIN_SQL = f"""
{_KM_CTES},
cnt AS (SELECT cell, COUNT(*) AS n_members FROM af GROUP BY cell)
SELECT c.cell, u.i - 1 AS pos, c.cv[u.i] AS cv, cnt.n_members
FROM {_KM_FINAL} c JOIN cnt USING (cell),
     generate_series(1, {DIM}) AS u(i)
"""


ELBOW_KS = (2, 4, 8, 16)   # cluster counts evaluated by the elbow


def emb_kmeans_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inertia-vs-K model-selection curve for the coarse quantizer —
    the elbow plot that justifies (or indicts) KM_K: one full Lloyd
    training per candidate K (same deterministic first-K init, same
    fixed iterations), with the within-cluster sum of squares and
    the per-vector mean reported per K. Monotone nonincreasing by
    more-centroids-can-only-help; where the curve flattens is where
    extra cells stop buying quantization fidelity — on the
    measured-unclustered driver embeddings it flattens slowly
    everywhere, which is the same "no structure" diagnosis
    emb_silhouette reads, now visible as a curve.

    Determinism: per-row squared distances round to integer
    micro-units before the BIGINT sum (the silhouette convention),
    so the inertia never touches float aggregation.

    Scale shape: ELBOW_KS independent Lloyd subplans (each the
    bounded-shuffle iterate-on-broadcast shape), then per K one
    narrow map + 1-row reduce. The K sweep multiplies the training
    cost by |ELBOW_KS| — the honest price of model selection, paid
    on a sample in production."""
    slices = []
    for k in ELBOW_KS:
        cent, assigned = _kmeans(spark, sf_dir, k)
        centrow = cent.agg(F.array_sort(
            F.collect_list(F.struct("cell", "cv"))).alias("cents"))
        own = F.element_at(
            F.filter("cents", lambda c: c["cell"] == F.col("cell")), 1)
        a2 = _dist2(F.col("v"), own["cv"])
        rowd = (assigned.crossJoin(F.broadcast(centrow))
                .select("cell",
                        F.round(a2 * 1e6).cast("long").alias("d_micro")))
        slices.append(rowd.agg(
            F.countDistinct("cell").cast("long").alias("n_cells_used"),
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum("d_micro").cast("long").alias("inertia_micro"))
            .withColumn("k", F.lit(k)))
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    return (out.select(
        "k", "n_cells_used", "n_vectors",
        F.round(F.col("inertia_micro") / 1e6, 6).alias("inertia"),
        F.round(F.col("inertia_micro") / F.col("n_vectors") / 1e6, 6)
        .alias("mean_inertia"))
        .orderBy("k"))


def _kmeans_elbow_sql() -> str:
    chains = []
    selects = []
    for i, k in enumerate(ELBOW_KS):
        pfx = f"k{k}_"
        ctes, final = _km_sql_ctes(k, pfx, with_e=(i == 0))
        chains.append(ctes)
        selects.append(f"""
SELECT {k} AS k,
       CAST(COUNT(DISTINCT af.cell) AS BIGINT) AS n_cells_used,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(CAST(ROUND({_sql_dist2('af.v', 'c.cv')} * 1e6)
                AS BIGINT)) AS BIGINT) AS inertia_micro
FROM {pfx}af af JOIN {final} c ON c.cell = af.cell""")
    union = " UNION ALL ".join(selects)
    all_chains = ",\n".join(chains)
    return f"""
{all_chains},
curve AS ({union})
SELECT k, n_cells_used, n_vectors,
       round(inertia_micro / 1e6, 6) AS inertia,
       round(inertia_micro / CAST(n_vectors AS DOUBLE) / 1e6, 6)
         AS mean_inertia
FROM curve ORDER BY k
"""


NPROBE_SWEEP = (1, 2, 4)   # probe budgets evaluated by the sweep


def emb_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-vs-probe-budget curve for the trained IVF index — the
    tuning table an operator reads to pick IVF_NPROBE (the offline
    BENCH/recall.json sweep promoted to an oracle-checked query, so
    the curve ships with every corpus instead of living in a bench
    artifact): for each probe budget, every demo query retrieves
    top-K through its nearest cells and recall@K is measured against
    the exact brute-force ranking. Monotone by construction (probe
    sets nest), and the gap to 1.0 at the top budget is the recall
    genuinely lost to quantization — the honest ceiling.

    Determinism: per-query recalls are integer micro-units
    (hits·10⁶ DIV K) summed as BIGINT and divided once; rankings tie-
    break on neighbor id everywhere.

    Scale shape: the Lloyd subplan, a broadcast probe list bounded by
    queries × max-budget, cell-keyed equi-joins for candidates, and
    (budget, query)-keyed ranking windows; the brute-force side
    exists only for the eval and is bounded by queries × corpus —
    the thing the IVF index exists to avoid paying per query."""
    cent, assigned = _kmeans(spark, sf_dir)
    emb = assigned.withColumn("nrm", _norm(F.col("v")))
    q_base = (emb.filter(F.col("vec_id") < N_QUERIES)
              .select(F.col("vec_id").alias("q_id"),
                      F.col("v").alias("qv"), F.col("nrm").alias("qn")))
    # exact brute-force top-K per query
    jx = emb.join(F.broadcast(q_base), F.col("vec_id") != F.col("q_id"))
    cosx = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    wx = Window.partitionBy("q_id").orderBy(
        F.desc("cos6"), F.asc("neighbor_id"))
    exact = (jx.select("q_id", F.col("vec_id").alias("neighbor_id"),
                       F.round(cosx, 6).alias("cos6"))
             .withColumn("rank", F.row_number().over(wx))
             .filter(F.col("rank") <= IVF_TOPK)
             .select("q_id", "neighbor_id"))
    # probe ranks per (query, cell), then one row per (budget, q, cell)
    centrow = cent.agg(F.array_sort(
        F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    scored_cells = F.transform(
        F.col("cents"), lambda c: F.struct(
            _dist2(F.col("qv"), c["cv"]).alias("d"),
            c["cell"].alias("cell")))
    max_np = max(NPROBE_SWEEP)
    pr = (q_base.crossJoin(F.broadcast(centrow))
          .select("q_id", "qv", "qn",
                  F.posexplode(F.transform(
                      F.slice(F.array_sort(scored_cells), 1, max_np),
                      lambda s: s["cell"])).alias("pr0", "q_cell")))
    budgets = F.explode(F.array(*[F.lit(b) for b in NPROBE_SWEEP])) \
        .alias("nprobe")
    probed = (pr.select(budgets, "q_id", "qv", "qn", "pr0", "q_cell")
              .filter(F.col("pr0") < F.col("nprobe")))
    jc = emb.join(F.broadcast(probed),
                  (F.col("cell") == F.col("q_cell"))
                  & (F.col("vec_id") != F.col("q_id")))
    cosc = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    wc = Window.partitionBy("nprobe", "q_id").orderBy(
        F.desc("cos6"), F.asc("neighbor_id"))
    got = (jc.select("nprobe", "q_id",
                     F.col("vec_id").alias("neighbor_id"),
                     F.round(cosc, 6).alias("cos6"))
           .withColumn("rank", F.row_number().over(wc))
           .filter(F.col("rank") <= IVF_TOPK)
           .select("nprobe", "q_id", "neighbor_id"))
    hits = (got.join(exact, ["q_id", "neighbor_id"])
            .groupBy("nprobe", "q_id")
            .agg(F.count(F.lit(1)).alias("n_hit")))
    grid = (q_base.select("q_id")
            .crossJoin(F.broadcast(
                probed.select("nprobe").distinct())))
    per_q = (grid.join(hits, ["nprobe", "q_id"], "left")
             .select("nprobe", "q_id",
                     F.expr(f"COALESCE(n_hit, 0) * 1000000 "
                            f"DIV {IVF_TOPK}").alias("rec_micro")))
    return (per_q.groupBy("nprobe")
            .agg(F.count(F.lit(1)).cast("long").alias("n_queries"),
                 F.expr("CAST(SUM(rec_micro) AS BIGINT) DIV COUNT(*)")
                 .alias("mr"))
            .select("nprobe", "n_queries",
                    F.round(F.col("mr") / 1e6, 6).alias("mean_recall"))
            .orderBy("nprobe"))


def _nprobe_sweep_sql() -> str:
    budgets = ", ".join(f"({b})" for b in NPROBE_SWEEP)
    max_np = max(NPROBE_SWEEP)
    return f"""
{_KM_CTES},
n AS (
  SELECT af.vec_id, af.cell, af.v, {_sql_norm('af.v')} AS nrm FROM af
), qb AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn
  FROM n WHERE vec_id < {N_QUERIES}
), exact AS (
  SELECT q_id, neighbor_id FROM (
    SELECT qb.q_id, n.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY qb.q_id
             ORDER BY ROUND({_sql_dot('qb.qv', 'n.v')}
                            / (qb.qn * n.nrm), 6) DESC,
                      n.vec_id ASC) AS rank
    FROM qb CROSS JOIN n WHERE n.vec_id <> qb.q_id
  ) WHERE rank <= {IVF_TOPK}
), pr AS (
  SELECT q_id, qv, qn, cell AS q_cell, pr0 FROM (
    SELECT qb.q_id, qb.qv, qb.qn, c.cell,
           row_number() OVER (
             PARTITION BY qb.q_id
             ORDER BY {_sql_dist2('qb.qv', 'c.cv')}, c.cell) - 1 AS pr0
    FROM qb CROSS JOIN {_KM_FINAL} c
  ) WHERE pr0 < {max_np}
), budgets(nprobe) AS (VALUES {budgets}),
probed AS (
  SELECT b.nprobe, p.q_id, p.qv, p.qn, p.q_cell
  FROM pr p CROSS JOIN budgets b
  WHERE p.pr0 < b.nprobe
), got AS (
  SELECT nprobe, q_id, neighbor_id FROM (
    SELECT p.nprobe, p.q_id, n.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY p.nprobe, p.q_id
             ORDER BY ROUND({_sql_dot('p.qv', 'n.v')}
                            / (p.qn * n.nrm), 6) DESC,
                      n.vec_id ASC) AS rank
    FROM probed p JOIN n ON n.cell = p.q_cell
    WHERE n.vec_id <> p.q_id
  ) WHERE rank <= {IVF_TOPK}
), hits AS (
  SELECT g.nprobe, g.q_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM got g JOIN exact e
    ON e.q_id = g.q_id AND e.neighbor_id = g.neighbor_id
  GROUP BY g.nprobe, g.q_id
), per_q AS (
  SELECT b.nprobe, q.q_id,
         (COALESCE(h.n_hit, 0) * 1000000) // {IVF_TOPK} AS rec_micro
  FROM qb q CROSS JOIN budgets b
  LEFT JOIN hits h ON h.nprobe = b.nprobe AND h.q_id = q.q_id
)
SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_queries,
       round((CAST(SUM(rec_micro) AS BIGINT) // COUNT(*)) / 1e6, 6)
         AS mean_recall
FROM per_q GROUP BY nprobe ORDER BY nprobe
"""


def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified-silhouette quality score for the trained quantizer
    (Kaufman & Rousseeuw's silhouette with centroid distances in
    place of all-pairs — the O(n·k) published variant, the only one
    that survives 10^12 vectors): per vector s = (b − a)/max(a, b)
    with a = distance to its OWN Lloyd centroid and b = distance to
    the nearest OTHER centroid; per-cell and corpus-level means tell
    an operator whether the trained cells are real clusters or
    arbitrary Voronoi tiles (the embedding-space twin of
    hosts_modularity's partition diagnosis). On the driver fixture it
    correctly reads ≈0.037 — the embeddings table is measured
    near-uniform (k-means cell purity ≈ chance), so "no structure" IS
    the right answer here, and the test pins that the same metric
    scores the clustered mixture fixture an order of magnitude
    higher.

    Determinism: per-row silhouettes round to integer micro-units
    BEFORE any aggregate, so cell means are BIGINT sums divided once
    at readout — float summation order never matters; distances use
    the same left-to-right fold and KM_ROUND-rounded centroids as
    every k-means consumer.

    Scale shape: the Lloyd subplan, then ONE narrow map against the
    broadcast centroid array (a and b computed inline per row — no
    explode, no per-centroid join) and a cell-keyed partial
    aggregate. Nothing new touches vector volume beyond the scan."""
    cent, assigned = _kmeans(spark, sf_dir)
    centrow = cent.agg(F.array_sort(
        F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    own = F.element_at(
        F.filter("cents", lambda c: c["cell"] == F.col("cell")), 1)
    a2 = _dist2(F.col("v"), own["cv"])
    b2 = F.array_min(F.transform(
        F.filter("cents", lambda c: c["cell"] != F.col("cell")),
        lambda c: _dist2(F.col("v"), c["cv"])))
    rowd = (assigned.crossJoin(F.broadcast(centrow))
            .select("vec_id", "cell", a2.alias("a2"), b2.alias("b2")))
    sa, sb = F.sqrt("a2"), F.sqrt("b2")
    m = F.greatest(sa, sb)
    s = F.when(m > 0, (sb - sa) / m).otherwise(F.lit(0.0))
    srow = rowd.select(
        "cell", F.round(s * 1e6).cast("long").alias("s_micro"))
    per = (srow.groupBy("cell")
           .agg(F.count(F.lit(1)).cast("long").alias("n_members"),
                F.sum("s_micro").cast("long").alias("sum_s")))
    tot = per.agg(F.sum("sum_s").alias("ts"),
                  F.sum("n_members").alias("tn"))
    return (per.crossJoin(F.broadcast(tot))
            .select("cell", "n_members",
                    F.round(F.col("sum_s") / F.col("n_members")
                            / 1e6, 6).alias("mean_silhouette"),
                    F.round(F.col("ts") / F.col("tn") / 1e6, 6)
                    .alias("overall_silhouette"))
            .orderBy("cell"))


_SILHOUETTE_SQL = f"""
{_KM_CTES},
aa AS (
  SELECT af.vec_id, af.cell,
         {_sql_dist2('af.v', 'c.cv')} AS a2
  FROM af JOIN {_KM_FINAL} c ON c.cell = af.cell
), bb AS (
  SELECT af.vec_id, MIN({_sql_dist2('af.v', 'c.cv')}) AS b2
  FROM af CROSS JOIN {_KM_FINAL} c
  WHERE c.cell <> af.cell
  GROUP BY af.vec_id
), srow AS (
  SELECT aa.cell,
         CAST(ROUND(CASE WHEN greatest(sqrt(aa.a2), sqrt(bb.b2)) > 0
                         THEN (sqrt(bb.b2) - sqrt(aa.a2))
                              / greatest(sqrt(aa.a2), sqrt(bb.b2))
                         ELSE 0.0 END * 1000000) AS BIGINT) AS s_micro
  FROM aa JOIN bb USING (vec_id)
), per AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(s_micro) AS BIGINT) AS sum_s
  FROM srow GROUP BY cell
), tot AS (
  SELECT CAST(SUM(sum_s) AS BIGINT) AS ts,
         CAST(SUM(n_members) AS BIGINT) AS tn
  FROM per
)
SELECT cell, n_members,
       round(sum_s / CAST(n_members AS DOUBLE) / 1000000, 6)
         AS mean_silhouette,
       round(ts / CAST(tn AS DOUBLE) / 1000000, 6)
         AS overall_silhouette
FROM per CROSS JOIN tot
ORDER BY cell
"""

_IVF_TRAINED_MULTIPROBE_SQL = f"""
{_KM_CTES},
n AS (
  SELECT af.vec_id, af.cell, af.v, {_sql_norm('af.v')} AS nrm FROM af
), qp AS (
  SELECT q_id, qv, qn, cell AS q_cell FROM (
    SELECT e.vec_id AS q_id, e.v AS qv, {_sql_norm('e.v')} AS qn,
           c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_dist2('e.v', 'c.cv')}, c.cell) AS pr
    FROM e CROSS JOIN {_KM_FINAL} c
    WHERE e.vec_id < {N_QUERIES}
  ) WHERE pr <= {IVF_NPROBE}
), scored AS (
  SELECT qp.q_id, n.cell, n.vec_id AS neighbor_id,
         ROUND({_sql_dot('qp.qv', 'n.v')} / (qp.qn * n.nrm), 6) AS cos6
  FROM qp JOIN n ON n.cell = qp.q_cell AND n.vec_id <> qp.q_id
), ranked AS (
  SELECT q_id, cell, neighbor_id, cos6,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos6 DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, cell, neighbor_id, ROUND(cos6, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {IVF_TOPK}
"""

_IVF_TRAINED_TOPK_SQL = f"""
{_KM_CTES},
n AS (
  SELECT af.vec_id, af.cell, af.v, {_sql_norm('af.v')} AS nrm FROM af
), q AS (
  SELECT vec_id AS q_id, cell AS q_cell, v AS qv, nrm AS qn
  FROM n WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.q_id, n.cell, n.vec_id AS neighbor_id,
         ROUND({_sql_dot('q.qv', 'n.v')} / (q.qn * n.nrm), 6) AS cos6
  FROM q JOIN n ON n.cell = q.q_cell AND n.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, cell, neighbor_id, cos6,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos6 DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, cell, neighbor_id, ROUND(cos6, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {IVF_TOPK}
"""


CLUSTER_SAMPLE_CAP = 40   # per-cell keep budget: 500 vectors over
                          # KM_K=8 cells ≈ 62/cell, so the cap BINDS
                          # on this fixture (kept=false rows exist)


def emb_cluster_balanced_sample(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling (the DataComp / MetaCLIP
    balancing move): cap how many documents any one trained Lloyd cell
    contributes, so over-represented regions of embedding space cannot
    dominate the training mixture — the semantic-space analogue of
    docs_host_cap's per-host cap, and the selection step SemDeDup-style
    pipelines run after within-cell dedup. Pick order inside a cell is
    a deterministic content hash of the vector id (md5), not ingest
    order, so the kept set is reproducible and unbiased by arrival
    order; vec_id breaks md5 ties.

    Scale shape: assignment is the broadcast-centroid narrow map from
    _kmeans; the cap is ONE rank window keyed cell (partial-sort per
    cell, the docs_host_cap plan) — no new shuffle classes."""
    _, assigned = _kmeans(spark, sf_dir)
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")).asc(),
        F.col("vec_id").asc())
    return (assigned.withColumn("pick_rank", F.row_number().over(w))
            .select("vec_id", "cell", "pick_rank",
                    (F.col("pick_rank") <= CLUSTER_SAMPLE_CAP)
                    .alias("kept")))


_CLUSTER_SAMPLE_SQL = f"""
{_KM_CTES},
ranked AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (
           PARTITION BY cell
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pick_rank
  FROM af
)
SELECT vec_id, cell, pick_rank,
       pick_rank <= {CLUSTER_SAMPLE_CAP} AS kept
FROM ranked
"""


MUTUAL_K = 5
MUTUAL_BLOCK = 150


def emb_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN graph over the embedding corpus: edge (a, b) exists
    iff b is in a's top-{MUTUAL_K} AND a is in b's top-{MUTUAL_K} —
    the standard hubness fix for directed kNN graphs (a hub vector
    lands in everyone's neighbor list; mutuality prunes those
    asymmetric edges), and the substrate graph-based semantic dedup /
    clustering builds on rather than raw kNN lists. Output is one row
    per undirected mutual edge (a_id < b_id) with both ranks, so the
    asymmetry that survived is observable.

    Scale shape: the scored block (< {MUTUAL_BLOCK} vectors here)
    broadcasts while the corpus streams — production replaces the
    block self-score with the trained-IVF shortlist path
    (emb_ivf_trained_topk) and keeps ONLY the mutual join, which is an
    edge-keyed equi-join over k·N directed edges (narrow relative to
    corpus volume). The top-k election is one window keyed a_id."""
    emb = (t(spark, sf_dir)
           .select("vec_id", _vecd().alias("v"))
           .withColumn("nrm", _norm(F.col("v")))
           .filter(F.col("vec_id") < MUTUAL_BLOCK))
    right = emb.select(F.col("vec_id").alias("b_id"),
                       F.col("v").alias("bv"), F.col("nrm").alias("bn"))
    cos = _dot(F.col("v"), F.col("bv")) / (F.col("nrm") * F.col("bn"))
    scored = (emb.join(F.broadcast(right), F.col("vec_id") != F.col("b_id"))
              .select(F.col("vec_id").alias("a_id"), "b_id",
                      F.round(cos, 6).alias("cos6")))
    w = Window.partitionBy("a_id").orderBy(F.desc("cos6"), F.asc("b_id"))
    knn = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= MUTUAL_K))
    x, y = knn.alias("x"), knn.alias("y")
    return (x.join(y, (F.col("x.a_id") == F.col("y.b_id"))
                   & (F.col("x.b_id") == F.col("y.a_id")))
            .filter(F.col("x.a_id") < F.col("x.b_id"))
            .select(F.col("x.a_id").alias("a_id"),
                    F.col("x.b_id").alias("b_id"),
                    F.col("x.cos6").alias("cos_sim"),
                    F.col("x.rank").alias("rank_ab"),
                    F.col("y.rank").alias("rank_ba")))


_MUTUAL_KNN_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SQL_VEC} AS v FROM embeddings
  WHERE vec_id < {MUTUAL_BLOCK}
), n AS (
  SELECT vec_id, v, {_sql_norm('v')} AS nrm FROM e
), scored AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         ROUND({_sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm), 6) AS cos6
  FROM n a, n b WHERE a.vec_id <> b.vec_id
), knn AS (
  SELECT a_id, b_id, cos6,
         ROW_NUMBER() OVER (PARTITION BY a_id
                            ORDER BY cos6 DESC, b_id ASC) AS rank
  FROM scored
  QUALIFY rank <= {MUTUAL_K}
)
SELECT x.a_id, x.b_id,
       x.cos6 AS cos_sim,
       x.rank AS rank_ab, y.rank AS rank_ba
FROM knn x JOIN knn y ON x.a_id = y.b_id AND x.b_id = y.a_id
WHERE x.a_id < x.b_id
"""


# Per-cell target quotas — a deterministic plan-literal stand-in for
# the artifact-loaded output of mixture optimization (DoReMi-style
# semantic allocation). Varied across cells so the quota JOIN is
# load-bearing: some cells get less than the uniform cap, some more.
CLUSTER_QUOTA_SPEC: tuple[tuple[int, int], ...] = tuple(
    (c, 16 + 8 * (c % 4)) for c in range(KM_K))


def emb_cluster_quota_sample(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Per-cell QUOTAS from a mixture spec — the generalization of
    emb_cluster_balanced_sample's single global cap: each trained
    Lloyd cell carries its own target count, so the kept corpus
    realizes a chosen semantic MIXTURE rather than flat diversity
    (the embedding-space counterpart of docs_domain_mixture →
    docs_mixture_realize). The spec here is a deterministic plan
    literal; in production it is the artifact-loaded output of
    mixture optimization, through the same broadcast-side-table seam
    as docs_classifier_score's weight table.

    Scale shape: identical to the balanced sampler — broadcast-
    centroid narrow-map assignment, ONE rank window keyed cell — plus
    a k-row broadcast join for the quota column."""
    _, assigned = _kmeans(spark, sf_dir)
    spec = spark.createDataFrame(
        list(CLUSTER_QUOTA_SPEC), "cell long, quota long")
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")).asc(),
        F.col("vec_id").asc())
    return (assigned.withColumn("pick_rank", F.row_number().over(w))
            .join(F.broadcast(spec), "cell")
            .select("vec_id", "cell", "quota", "pick_rank",
                    (F.col("pick_rank") <= F.col("quota")).alias("kept")))


def _cluster_quota_sql() -> str:
    rows = ", ".join(f"({c}, {q})" for c, q in CLUSTER_QUOTA_SPEC)
    return f"""
{_KM_CTES},
spec AS (
  SELECT cell, CAST(quota AS BIGINT) AS quota
  FROM (VALUES {rows}) AS v(cell, quota)
), ranked AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (
           PARTITION BY cell
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pick_rank
  FROM af
)
SELECT vec_id, ranked.cell, quota, pick_rank,
       pick_rank <= quota AS kept
FROM ranked JOIN spec ON spec.cell = ranked.cell
"""


# --------------------------------------------------------------------------
# margin-based bitext mining (cross-lingual pair extraction)
# --------------------------------------------------------------------------

BITEXT_BLOCK = 64      # A-side mining block bound (vec_id < BLOCK, even)
BITEXT_MARGIN = 1.05   # best/second-best acceptance ratio


def emb_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (CCMatrix / Artetxe & Schwenk):
    source-language vectors are paired with their best target-language
    neighbor only when the best candidate BEATS the second-best by a
    margin — absolute cosine alone over-accepts hubs, the
    best/second-best ratio is the standard fix (this is the
    distance-ratio variant of their neighborhood-averaged margin).
    Fixture roles are deterministic: even vec_id = source side, odd =
    target side; the mined block is source vec_id < {BITEXT_BLOCK}.

    Scale shape: the mining block (≤{BITEXT_BLOCK // 2} vectors)
    broadcasts; the target corpus STREAMS through the scored join —
    production iterates blocks and prunes the target side with the
    trained IVF cells first (emb_ivf_trained_topk is that path), so
    the per-block work is shortlist-sized, not corpus-sized. The
    top-2 election is one window keyed a_id over the scored rows."""
    emb = t(spark, sf_dir).select(
        "vec_id", _vecd().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    a = (emb.filter((F.col("vec_id") % 2 == 0)
                    & (F.col("vec_id") < BITEXT_BLOCK))
         .select(F.col("vec_id").alias("a_id"), F.col("v").alias("av"),
                 F.col("nrm").alias("an")))
    b = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv"),
        F.col("nrm").alias("bn"))
    cos = _dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
    scored = b.join(F.broadcast(a)).select(
        "a_id", "b_id", F.round(cos, 6).alias("cos6"))
    w = Window.partitionBy("a_id").orderBy(F.desc("cos6"), F.asc("b_id"))
    top2 = (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2))
    per = (top2.groupBy("a_id")
           .agg(F.max(F.when(F.col("rn") == 1, F.col("b_id")))
                .alias("b_id"),
                F.max(F.when(F.col("rn") == 1, F.col("cos6")))
                .alias("cos_best"),
                F.max(F.when(F.col("rn") == 2, F.col("cos6")))
                .alias("cos_second")))
    margin = F.when(F.col("cos_second") > 0,
                    F.col("cos_best") / F.col("cos_second"))
    return per.select(
        "a_id", "b_id", "cos_best", "cos_second",
        F.round(margin, 4).alias("margin"),
        F.coalesce(margin >= BITEXT_MARGIN, F.lit(False))
        .alias("accepted"))


_BITEXT_MINE_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, v, {_sql_norm('v')} AS nrm FROM e
), a AS (
  SELECT vec_id AS a_id, v AS av, nrm AS an FROM n
  WHERE vec_id % 2 = 0 AND vec_id < {BITEXT_BLOCK}
), b AS (
  SELECT vec_id AS b_id, v AS bv, nrm AS bn FROM n WHERE vec_id % 2 = 1
), scored AS (
  SELECT a_id, b_id,
         ROUND({_sql_dot('av', 'bv')} / (an * bn), 6) AS cos6
  FROM a CROSS JOIN b
), ranked AS (
  SELECT a_id, b_id, cos6, ROW_NUMBER() OVER (
           PARTITION BY a_id ORDER BY cos6 DESC, b_id ASC) AS rn
  FROM scored
), per AS (
  SELECT a_id,
         MAX(CASE WHEN rn = 1 THEN b_id END) AS b_id,
         MAX(CASE WHEN rn = 1 THEN cos6 END) AS cos_best,
         MAX(CASE WHEN rn = 2 THEN cos6 END) AS cos_second
  FROM ranked WHERE rn <= 2 GROUP BY a_id
)
SELECT a_id, b_id, cos_best, cos_second,
       ROUND(CASE WHEN cos_second > 0 THEN cos_best / cos_second END, 4)
         AS margin,
       coalesce(CASE WHEN cos_second > 0 THEN cos_best / cos_second END
                >= CAST({BITEXT_MARGIN!r} AS DOUBLE), FALSE) AS accepted
FROM per
"""


# --------------------------------------------------------------------------
# per-cell snapshot drift (semantic distribution shift)
# --------------------------------------------------------------------------

DRIFT_ROUND = 6


def emb_cell_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic drift between crawl snapshots, measured in embedding
    space: assign BOTH snapshot halves (even vec_id = prior crawl, odd
    = new crawl — the same deterministic split docs_new_vs_snapshot
    uses) to the SAME trained Lloyd cells, then report each cell's
    population share in each snapshot and the share delta.  This is
    the embedding-space companion of docs_vocab_novelty: vocabulary
    novelty catches new WORDS, cell-share drift catches topic-mix
    shift even when the vocabulary is stable — the monitor that
    decides whether a mixture spec tuned on the old crawl still holds.

    Scale shape: cell assignment is the broadcast-centroid narrow map
    (same as emb_ivf_assign); the drift table is ONE groupBy on cell
    with conditional counts plus a broadcast 1-row totals join.
    Shares are computed from exact integer counts, so the per-row
    rounded division is bit-stable at any parallelism."""
    _, assigned = _kmeans(spark, sf_dir)
    counts = assigned.groupBy("cell").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0))
         .cast("long").alias("n_old"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0))
         .cast("long").alias("n_new"))
    tot = counts.agg(F.sum("n_old").alias("t_old"),
                     F.sum("n_new").alias("t_new"))
    j = counts.crossJoin(F.broadcast(tot))
    share_old = F.col("n_old") / F.col("t_old")
    share_new = F.col("n_new") / F.col("t_new")
    return j.select(
        "cell", "n_old", "n_new",
        F.round(share_old, DRIFT_ROUND).alias("share_old"),
        F.round(share_new, DRIFT_ROUND).alias("share_new"),
        F.round(share_new - share_old, DRIFT_ROUND).alias("share_delta"),
    )


_CELL_DRIFT_SQL = f"""
{_KM_CTES},
counts AS (
  SELECT cell,
         CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_old,
         CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new
  FROM af GROUP BY cell
), tot AS (
  SELECT SUM(n_old) AS t_old, SUM(n_new) AS t_new FROM counts
)
SELECT cell, n_old, n_new,
       round(n_old / CAST(t_old AS DOUBLE), {DRIFT_ROUND}) AS share_old,
       round(n_new / CAST(t_new AS DOUBLE), {DRIFT_ROUND}) AS share_new,
       round(n_new / CAST(t_new AS DOUBLE)
             - n_old / CAST(t_old AS DOUBLE), {DRIFT_ROUND})
         AS share_delta
FROM counts CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# Matryoshka truncation recall (prefix-dim ANN scorecard)
# --------------------------------------------------------------------------

MRL_DIMS = (16, 32, DIM)
MRL_ROUND = 4


def emb_mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation truncation scorecard (Kusupati et al.
    2022): re-run the brute-force cosine top-k with each query/corpus
    vector TRUNCATED to its prefix dims (16, 32, full 64) and report
    per-query overlap@k against the full-dim ranking.  This is the
    measurement that decides whether a deployment can shortlist at a
    fraction of the vector read/compute cost (prefix dims are free to
    slice — no re-encode) and re-rank at full width — the same
    shortlist-then-rerank economics as emb_ivfpq_topk, evaluated the
    same way as emb_ann_recall_eval. The full-dim row (recall 1.0) is
    kept as the scorecard's self-check anchor.

    Scale shape: one broadcast of the small query side per dim tier
    (the corpus side streams, never shuffles), per-query rank windows,
    then a left join of two k-row-per-query lists. Dot products fold
    left-to-right (same order as DuckDB list_reduce) so cos values are
    bit-identical cross-engine.

    Fixture note: the synthetic corpus has a FLAT spectrum (information
    spread evenly over dims), so prefix recall here sits near the d/D
    floor (~0.14 at 16/64) — real MRL-trained embeddings front-load
    variance and score far higher; the scorecard exists to measure
    exactly that property before trusting a truncated shortlist."""
    emb = t(spark, sf_dir).select("vec_id", _vecd().alias("v"))

    def topk_at(d: int) -> DataFrame:
        base = emb.select(
            "vec_id", F.slice(F.col("v"), 1, d).alias("vd"))
        base = base.withColumn("nrm", _norm(F.col("vd")))
        q = base.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("q_id"), F.col("vd").alias("qv"),
            F.col("nrm").alias("qn"))
        j = base.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        cos6 = F.round(_dot(F.col("qv"), F.col("vd"))
                       / (F.col("qn") * F.col("nrm")), 6)
        w = Window.partitionBy("q_id").orderBy(
            F.desc("cos6"), F.asc("neighbor_id"))
        return (j.select("q_id", F.col("vec_id").alias("neighbor_id"),
                         cos6.alias("cos6"))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= TOPK)
                .select(F.lit(d).cast("int").alias("dim"),
                        "q_id", "neighbor_id"))

    u = topk_at(MRL_DIMS[0])
    for d in MRL_DIMS[1:]:
        u = u.unionByName(topk_at(d))
    full = (topk_at(DIM).select("q_id", "neighbor_id")
            .withColumn("hit", F.lit(1)))
    ov = (u.join(full, ["q_id", "neighbor_id"], "left")
          .groupBy("dim", "q_id")
          .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0)))
               .cast("long").alias("n_overlap")))
    return ov.select(
        "dim", "q_id", "n_overlap",
        F.round(F.col("n_overlap") / F.lit(float(TOPK)), MRL_ROUND)
         .alias("recall_at_k"))


def _mrl_sql() -> str:
    def dot_d(a: str, b: str, d: int) -> str:
        return (f"list_reduce(list_transform(range(1, {d + 1}), "
                f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)")

    def norm_d(a: str, d: int) -> str:
        return (f"sqrt(list_reduce(list_transform({a}[1:{d}], "
                f"x -> x * x), (x, y) -> x + y))")

    parts = [f"e AS (SELECT vec_id, {_SQL_VEC} AS v FROM embeddings)",
             f"q AS (SELECT vec_id AS q_id, v AS qv FROM e "
             f"WHERE vec_id < {N_QUERIES})"]
    tops = []
    for d in MRL_DIMS:
        parts.append(
            f"r{d} AS (\n"
            f"  SELECT q_id, neighbor_id, ROW_NUMBER() OVER (\n"
            f"    PARTITION BY q_id ORDER BY cos6 DESC, neighbor_id)\n"
            f"      AS rank\n"
            f"  FROM (SELECT q.q_id, e.vec_id AS neighbor_id,\n"
            f"          ROUND({dot_d('q.qv', 'e.v', d)}\n"
            f"            / ({norm_d('q.qv', d)} * {norm_d('e.v', d)}),\n"
            f"            6) AS cos6\n"
            f"        FROM q, e WHERE e.vec_id <> q.q_id))")
        tops.append(f"SELECT CAST({d} AS INT) AS dim, q_id, neighbor_id "
                    f"FROM r{d} WHERE rank <= {TOPK}")
    parts.append("u AS (" + " UNION ALL ".join(tops) + ")")
    parts.append(f"fl AS (SELECT q_id, neighbor_id FROM r{DIM} "
                 f"WHERE rank <= {TOPK})")
    return ("WITH " + ",\n".join(parts) + f"""
, ov AS (
  SELECT u.dim, u.q_id,
         CAST(SUM(CASE WHEN fl.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_overlap
  FROM u LEFT JOIN fl
    ON u.q_id = fl.q_id AND u.neighbor_id = fl.neighbor_id
  GROUP BY u.dim, u.q_id
)
SELECT dim, q_id, n_overlap,
       round(n_overlap / CAST({TOPK} AS DOUBLE), {MRL_ROUND})
         AS recall_at_k
FROM ov
""")


# --------------------------------------------------------------------------
# embedding outlier scan (distance-to-centroid z-score)
# --------------------------------------------------------------------------

OUTLIER_Z = 2.5     # flag threshold on the within-cell z-score
_D2_SCALE = 10_000  # quantize dist² to 1e-4 before the moments


def emb_outlier_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection over the trained quantizer:
    each vector's squared distance to its Lloyd cell centroid,
    z-scored against its OWN cell's distance distribution — the
    data-quality scan that surfaces corrupted encodes, wrong-modality
    rows, and off-manifold junk before they poison training batches
    (the embedding analogue of the text side's Gopher outlier gates).
    Flag at z ≥ {OUTLIER_Z}.

    Cross-engine determinism: dist² is quantized to integer 1e-4
    units BEFORE the per-cell moments, so mean and variance come from
    EXACT integer sums (Σd, Σd²) — float summation order, which
    differs between engines and between partitionings, cannot perturb
    the z-score. Variance is the two-pass-free E[x²]−E[x]² on those
    exact sums.

    Scale shape: assignment is the broadcast-centroid narrow map from
    _kmeans; the per-cell moment rollup is ONE bounded shuffle (K
    rows out, map-side partial sums); the K-row stats table broadcasts
    back. No per-vector pairwise work anywhere."""
    cent, assigned = _kmeans(spark, sf_dir)
    d2q = F.round(_dist2(F.col("v"), F.col("cv")) * _D2_SCALE) \
        .cast("long")
    per = (assigned.join(F.broadcast(cent), "cell")
           .select("vec_id", "cell", d2q.alias("d2q")))
    stats = (per.groupBy("cell")
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("d2q").cast("long").alias("s1"),
                  F.sum(F.col("d2q") * F.col("d2q")).cast("long")
                  .alias("s2")))
    mean = F.col("s1") / F.col("n")
    sd = F.sqrt(F.greatest(
        F.col("s2") / F.col("n") - mean * mean, F.lit(0.0)))
    z = F.when(sd > 0, (F.col("d2q") - mean) / sd)
    return (per.join(F.broadcast(stats), "cell")
            .select("vec_id", "cell", F.col("d2q").alias("dist2_e4"),
                    # +0.0 folds IEEE -0.0 (a tiny negative z rounded
                    # to 4 places) onto +0.0 on both engines
                    (F.round(z, 4) + F.lit(0.0)).alias("z_score"),
                    F.coalesce(z >= OUTLIER_Z, F.lit(False))
                    .alias("is_outlier")))


_OUTLIER_SCAN_SQL = f"""
{_KM_CTES},
dj AS (
  SELECT af.vec_id, af.cell,
         CAST(ROUND({_sql_dist2('af.v', 'c.cv')} * {_D2_SCALE}) AS BIGINT)
           AS d2q
  FROM af JOIN {_KM_FINAL} c USING (cell)
), st AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d2q) AS BIGINT) AS s1,
         CAST(SUM(d2q * d2q) AS BIGINT) AS s2
  FROM dj GROUP BY cell
), st2 AS (
  SELECT cell, s1 / CAST(n AS DOUBLE) AS mean,
         sqrt(greatest(s2 / CAST(n AS DOUBLE)
              - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)),
              CAST(0.0 AS DOUBLE))) AS sd
  FROM st
)
SELECT dj.vec_id, dj.cell, dj.d2q AS dist2_e4,
       ROUND(CASE WHEN sd > 0 THEN (dj.d2q - mean) / sd END, 4) + 0
         AS z_score,
       coalesce(CASE WHEN sd > 0 THEN (dj.d2q - mean) / sd END
                >= CAST({OUTLIER_Z!r} AS DOUBLE), FALSE) AS is_outlier
FROM dj JOIN st2 USING (cell)
"""


# --------------------------------------------------------------------------
# IVF-PQ: trained-cell probe → PQ-approximate shortlist → exact re-rank
# --------------------------------------------------------------------------

PQ_SHORTLIST = 32  # ADC survivors per query handed to exact re-rank.
                   # Measured on the clustered fixture (BENCH/recall.json
                   # ivfpq.recall_at_k_by_shortlist): 8→0.37, 16→0.53,
                   # 32→0.90, 64→1.0 recall@3 — 32 is the knee with the
                   # seeded codebook. Residual-TRAINED codebooks
                   # (emb_ivfpq_residual_trained_topk) reach 1.0 at 32
                   # and 0.83 already at 16 — the measured depth saving
                   # the trained codebooks buy.


def _pq_code_arr(v: Column) -> Column:
    """PQ code array (array<int>, one code per subspace) for a vector
    column — the assignment kernel of emb_pq_codes, factored so the
    IVF-PQ query path can compute codes inline on the corpus side."""
    codes = []
    for j in range(PQ_M):
        sub = F.slice(v, j * PQ_DSUB + 1, PQ_DSUB)
        dists = F.array(*[
            F.round(F.aggregate(
                F.zip_with(sub, F.array(*[F.lit(x) for x in cb]),
                           lambda x, c: (x - c) * (x - c)),
                F.lit(0.0), lambda acc, x: acc + x), 6)
            for cb in PQ_CODEBOOKS[j]])
        codes.append((F.array_position(dists, F.array_min(dists)) - 1)
                     .cast("int"))
    return F.array(*codes)


def emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact re-rank — the full production ANN tier
    (Jégou, Douze & Schmid 2011, "Product Quantization for Nearest
    Neighbor Search"): (1) the query probes its IVF_NPROBE nearest
    Lloyd-trained cells (coarse quantizer from emb_kmeans_train);
    (2) candidates inside probed cells are scored by ASYMMETRIC
    distance — exact query subvector vs the candidate's PQ centroid
    (the candidate contributes only its PQ_M-byte code) — and the
    PQ_SHORTLIST best survive; (3) the shortlist is re-ranked by exact
    cosine for the final IVF_TOPK. Output carries both distances so
    the approximation is observable per pair.

    Scale shape (100 TB of vectors): the corpus-resident state per
    vector is (cell, codes) — the PQ codes here are 8 ints vs 64
    floats, the storage tier that makes billion-vector serving fit in
    RAM; ADC never touches candidate full vectors, so step (2) streams
    the code table through an equi-join on cell id against a broadcast
    probe list; only the PQ_SHORTLIST×|queries| survivors need their
    full-precision vectors (in production a vec_id-keyed gather join
    against the float table — here v rides along because the fixture
    is one narrow scan). Windows are keyed q_id. Codebooks/centroid
    arrays are plan literals/broadcasts — no corpus-sized shuffle
    anywhere except the cell equi-join."""
    cent, assigned = _kmeans(spark, sf_dir)
    emb = (assigned
           .withColumn("nrm", _norm(F.col("v")))
           .withColumn("codes", _pq_code_arr(F.col("v"))))
    centrow = cent.agg(F.array_sort(
        F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    scored_cells = F.transform(
        F.col("cents"), lambda c: F.struct(
            _dist2(F.col("v"), c["cv"]).alias("d"),
            c["cell"].alias("cell")))
    probes = F.transform(
        F.slice(F.array_sort(scored_cells), 1, IVF_NPROBE),
        lambda s: s["cell"])
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .crossJoin(F.broadcast(centrow))
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qn"),
                 F.explode(probes).alias("q_cell")))
    j = emb.join(F.broadcast(q), (F.col("cell") == F.col("q_cell"))
                 & (F.col("vec_id") != F.col("q_id")))
    # ADC: sum over subspaces of ||q_sub_j - codebook_j[code_j]||²,
    # summed left-to-right (j ascending) — the DuckDB mirror adds the
    # same unrolled terms in the same order.
    adc = None
    for sj in range(PQ_M):
        cb_lit = F.array(*[F.array(*[F.lit(x) for x in cb])
                           for cb in PQ_CODEBOOKS[sj]])
        chosen = F.element_at(cb_lit, F.element_at("codes", sj + 1) + 1)
        term = _dist2(F.slice("qv", sj * PQ_DSUB + 1, PQ_DSUB), chosen)
        adc = term if adc is None else adc + term
    scored = j.select(
        "q_id", F.col("vec_id").alias("neighbor_id"),
        F.round(adc, 6).alias("adc6"), "v", "nrm", "qv", "qn")
    ws = Window.partitionBy("q_id").orderBy(F.asc("adc6"),
                                            F.asc("neighbor_id"))
    short = (scored.withColumn("srn", F.row_number().over(ws))
             .filter(F.col("srn") <= PQ_SHORTLIST))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    rer = short.select("q_id", "neighbor_id", "adc6",
                       F.round(cos, 6).alias("cos6"))
    wr = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                            F.asc("neighbor_id"))
    return (rer.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= IVF_TOPK)
            .select("q_id", "neighbor_id",
                    F.round("adc6", 4).alias("adc_dist"),
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


def _sql_pq_cb_lit(j: int) -> str:
    return ("[" + ", ".join(
        "[" + ", ".join(f"{x:.6f}" for x in cb) + "]"
        for cb in PQ_CODEBOOKS[j]) + "]")


def _ivfpq_sql() -> str:
    adc_terms = " + ".join(
        f"list_reduce(list_transform(range(1, {PQ_DSUB + 1}), "
        f"i -> (qp.qv[{j * PQ_DSUB}+i] "
        f"- ({_sql_pq_cb_lit(j)})[n.codes[{j + 1}] + 1][i]) "
        f"* (qp.qv[{j * PQ_DSUB}+i] "
        f"- ({_sql_pq_cb_lit(j)})[n.codes[{j + 1}] + 1][i])), "
        f"(x, y) -> x + y)"
        for j in range(PQ_M))
    return f"""
{_KM_CTES},
cd AS (
  SELECT vec_id,
         [{", ".join(_sql_pq_sub(j) for j in range(PQ_M))}] AS codes
  FROM e
), n AS (
  SELECT af.vec_id, af.cell, af.v, {_sql_norm('af.v')} AS nrm, cd.codes
  FROM af JOIN cd ON cd.vec_id = af.vec_id
), qp AS (
  SELECT q_id, qv, qn, cell AS q_cell FROM (
    SELECT e.vec_id AS q_id, e.v AS qv, {_sql_norm('e.v')} AS qn,
           c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_dist2('e.v', 'c.cv')}, c.cell) AS pr
    FROM e CROSS JOIN {_KM_FINAL} c
    WHERE e.vec_id < {N_QUERIES}
  ) WHERE pr <= {IVF_NPROBE}
), scored AS (
  SELECT qp.q_id, n.vec_id AS neighbor_id,
         ROUND({adc_terms}, 6) AS adc6,
         n.v, n.nrm, qp.qv, qp.qn
  FROM qp JOIN n ON n.cell = qp.q_cell AND n.vec_id <> qp.q_id
), short AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY adc6 ASC, neighbor_id ASC)
              AS srn
    FROM scored
  ) WHERE srn <= {PQ_SHORTLIST}
), rer AS (
  SELECT q_id, neighbor_id, adc6,
         ROUND({_sql_dot('qv', 'v')} / (qn * nrm), 6) AS cos6
  FROM short
), ranked AS (
  SELECT q_id, neighbor_id, adc6, cos6,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos6 DESC, neighbor_id ASC) AS rank
  FROM rer
)
SELECT q_id, neighbor_id, ROUND(adc6, 4) AS adc_dist,
       ROUND(cos6, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {IVF_TOPK}
"""


def emb_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the form FAISS's IVFPQ actually
    ships (Jégou et al. 2011 §IV.B): each corpus vector stores the PQ
    codes of its residual (v − centroid(cell)) instead of the raw
    vector, and the query is residualized PER PROBED CELL before the
    asymmetric-distance scan. Residuals concentrate near the origin,
    so a fixed codebook budget spends its resolution on the
    within-cell offsets that actually discriminate candidates — the
    reason production IVF-PQ encodes residuals. The shortlist → exact
    re-rank tail is identical to emb_ivfpq_topk, so the two variants
    are directly comparable per query.

    Scale shape: unchanged from emb_ivfpq_topk — the centroid table is
    K rows (broadcast equi-join on cell to residualize the corpus
    side, once, at index-build time in production), probes broadcast,
    ADC streams the code table through the cell equi-join, and only
    shortlist survivors touch full vectors.

    Measured honestly (BENCH/residual_adc.json): with the SEEDED
    literal codebooks the fidelity gain on this fixture is ~nil
    (mean |ADC − exact L2²| 9.259 residual vs 9.268 raw over returned
    rows) — residualization pays off when the codebooks are TRAINED
    on residual statistics, which is exactly the emb_pq_train seam
    (train on (v − centroid) instead of v; the assignment plan here is
    unchanged). The operator is kept because it is the structurally
    correct production form; the codebook data swap is the tuning."""
    cent, assigned = _kmeans(spark, sf_dir)
    cent_b = cent.select(F.col("cell").alias("rcell"),
                         F.col("cv").alias("rcv"))
    emb = (assigned
           .join(F.broadcast(cent_b), F.col("cell") == F.col("rcell"))
           .withColumn("nrm", _norm(F.col("v")))
           .withColumn("codes", _pq_code_arr(
               F.zip_with("v", "rcv", lambda a, b: a - b)))
           .drop("rcell", "rcv"))
    centrow = cent.agg(F.array_sort(
        F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    scored_cells = F.transform(
        F.col("cents"), lambda c: F.struct(
            _dist2(F.col("v"), c["cv"]).alias("d"),
            c["cell"].alias("cell")))
    probes = F.transform(
        F.slice(F.array_sort(scored_cells), 1, IVF_NPROBE),
        lambda s: s["cell"])
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .crossJoin(F.broadcast(centrow))
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qn"),
                 F.explode(probes).alias("q_cell"))
         .join(F.broadcast(cent_b), F.col("q_cell") == F.col("rcell"))
         .withColumn("qrv", F.zip_with("qv", "rcv", lambda a, b: a - b))
         .drop("rcell", "rcv"))
    j = emb.join(F.broadcast(q), (F.col("cell") == F.col("q_cell"))
                 & (F.col("vec_id") != F.col("q_id")))
    adc = None
    for sj in range(PQ_M):
        cb_lit = F.array(*[F.array(*[F.lit(x) for x in cb])
                           for cb in PQ_CODEBOOKS[sj]])
        chosen = F.element_at(cb_lit, F.element_at("codes", sj + 1) + 1)
        term = _dist2(F.slice("qrv", sj * PQ_DSUB + 1, PQ_DSUB), chosen)
        adc = term if adc is None else adc + term
    scored = j.select(
        "q_id", F.col("vec_id").alias("neighbor_id"),
        F.round(adc, 6).alias("adc6"), "v", "nrm", "qv", "qn")
    ws = Window.partitionBy("q_id").orderBy(F.asc("adc6"),
                                            F.asc("neighbor_id"))
    short = (scored.withColumn("srn", F.row_number().over(ws))
             .filter(F.col("srn") <= PQ_SHORTLIST))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    rer = short.select("q_id", "neighbor_id", "adc6",
                       F.round(cos, 6).alias("cos6"))
    wr = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                            F.asc("neighbor_id"))
    return (rer.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= IVF_TOPK)
            .select("q_id", "neighbor_id",
                    F.round("adc6", 4).alias("adc_dist"),
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


def _sql_pq_sub_expr(j: int, vec: str) -> str:
    """_sql_pq_sub generalized to any vector expression (the residual
    variant encodes ``rv`` where emb_pq_codes encodes ``v``)."""
    dists = []
    for cb in PQ_CODEBOOKS[j]:
        lit = "[" + ", ".join(f"{x:.6f}" for x in cb) + "]"
        dists.append(
            f"round(list_reduce(list_transform(range(1, {PQ_DSUB + 1}), "
            f"i -> ({vec}[{j * PQ_DSUB}+i] - ({lit})[i]) "
            f"* ({vec}[{j * PQ_DSUB}+i] - ({lit})[i])), (x, y) -> x + y), 6)")
    arr = "[" + ", ".join(dists) + "]"
    return f"CAST(list_position({arr}, list_min({arr})) - 1 AS INT)"


def _ivfpq_residual_sql() -> str:
    adc_terms = " + ".join(
        f"list_reduce(list_transform(range(1, {PQ_DSUB + 1}), "
        f"i -> (qp.qrv[{j * PQ_DSUB}+i] "
        f"- ({_sql_pq_cb_lit(j)})[n.codes[{j + 1}] + 1][i]) "
        f"* (qp.qrv[{j * PQ_DSUB}+i] "
        f"- ({_sql_pq_cb_lit(j)})[n.codes[{j + 1}] + 1][i])), "
        f"(x, y) -> x + y)"
        for j in range(PQ_M))
    return f"""
{_KM_CTES},
res AS (
  SELECT af.vec_id, af.cell, af.v,
         list_transform(range(1, {DIM + 1}),
                        i -> af.v[i] - c.cv[i]) AS rv
  FROM af JOIN {_KM_FINAL} c ON c.cell = af.cell
), n AS (
  SELECT vec_id, cell, v, {_sql_norm('v')} AS nrm,
         [{", ".join(_sql_pq_sub_expr(j, 'rv') for j in range(PQ_M))}]
           AS codes
  FROM res
), qp AS (
  SELECT q_id, qv, qn, q_cell,
         list_transform(range(1, {DIM + 1}),
                        i -> qv[i] - cv[i]) AS qrv
  FROM (
    SELECT q_id, qv, qn, cell AS q_cell, cv FROM (
      SELECT e.vec_id AS q_id, e.v AS qv, {_sql_norm('e.v')} AS qn,
             c.cell, c.cv,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_sql_dist2('e.v', 'c.cv')}, c.cell) AS pr
      FROM e CROSS JOIN {_KM_FINAL} c
      WHERE e.vec_id < {N_QUERIES}
    ) WHERE pr <= {IVF_NPROBE}
  )
), scored AS (
  SELECT qp.q_id, n.vec_id AS neighbor_id,
         ROUND({adc_terms}, 6) AS adc6,
         n.v, n.nrm, qp.qv, qp.qn
  FROM qp JOIN n ON n.cell = qp.q_cell AND n.vec_id <> qp.q_id
), short AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY adc6 ASC, neighbor_id ASC)
              AS srn
    FROM scored
  ) WHERE srn <= {PQ_SHORTLIST}
), rer AS (
  SELECT q_id, neighbor_id, adc6,
         ROUND({_sql_dot('qv', 'v')} / (qn * nrm), 6) AS cos6
  FROM short
), ranked AS (
  SELECT q_id, neighbor_id, adc6, cos6,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos6 DESC, neighbor_id ASC) AS rank
  FROM rer
)
SELECT q_id, neighbor_id, ROUND(adc6, 4) AS adc_dist,
       ROUND(cos6, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {IVF_TOPK}
"""


def emb_ivfpq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with TRAINED per-subspace codebooks — the production
    operating point (round-4 verdict #3): emb_ivfpq_topk's plan with
    the seeded PQ_CODEBOOKS literals replaced by Lloyd-trained
    codebooks from emb_pq_train's shared kernel, the same upgrade
    emb_ivf_trained_topk made for the coarse cells. Measured honestly
    (BENCH/recall.json ivfpq_trained): raw-vector trained codebooks
    cut reconstruction error ~100x and produce MORE distinct codes
    (261 vs 106 on the clustered fixture) but recall-at-depth is
    mixed (+0.03 at 8, −0.13 at 32 — ±4 pairs on a 30-pair truth
    set), because ADC ranks by L2 on RAW vectors whose cluster mean
    dominates, while the final rank is cosine. The production
    operating point is therefore emb_ivfpq_residual_trained_topk
    below (codebooks trained on residuals), which wins at every
    depth; this op remains the controlled middle cell of the
    {seeded,trained}x{raw,residual} 2x2.

    Scale shape: identical to emb_ivfpq_topk — the codebooks stop
    being plan literals and become a broadcast M·K-row table (still
    ≤ M·K·DSUB = 1024 doubles, one row after the per-m rollup);
    corpus codes are a narrow map against that broadcast; the only
    corpus-sized exchange remains the cell equi-join against the
    broadcast probe list. In production the trained codebooks load
    through the artifact seam exactly like the classifier weights.

    Cross-engine determinism: codebook components round to KM_ROUND
    per training round; per-subspace ADC terms fold j-ascending on
    both engines (DuckDB: list_reduce over list(term ORDER BY m)),
    then one ROUND(.., 6) — identical doubles in identical order."""
    cent, assigned = _kmeans(spark, sf_dir)
    pqcent, _ = _pq_train_cent(_pq_subvectors(spark, sf_dir))
    # one-row broadcast: cbs[m+1] = this subspace's trained codebook,
    # sorted struct(cell, cv) — the argmin/lookup shape _km_argmin_sub
    # expects
    cbrow = (pqcent.groupBy("m")
             .agg(F.array_sort(
                 F.collect_list(F.struct("cell", "cv"))).alias("cents"))
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("m", "cents"))),
                 lambda s: s["cents"]).alias("cbs")))
    emb = (assigned.crossJoin(F.broadcast(cbrow))
           .withColumn("nrm", _norm(F.col("v")))
           .withColumn("codes", F.array(*[
               _km_argmin_sub(F.slice("v", j * PQ_DSUB + 1, PQ_DSUB),
                              F.element_at("cbs", j + 1))
               for j in range(PQ_M)])))
    centrow = cent.agg(F.array_sort(
        F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    scored_cells = F.transform(
        F.col("cents"), lambda c: F.struct(
            _dist2(F.col("v"), c["cv"]).alias("d"),
            c["cell"].alias("cell")))
    probes = F.transform(
        F.slice(F.array_sort(scored_cells), 1, IVF_NPROBE),
        lambda s: s["cell"])
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .crossJoin(F.broadcast(centrow))
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qn"),
                 F.explode(probes).alias("q_cell")))
    j = emb.join(F.broadcast(q), (F.col("cell") == F.col("q_cell"))
                 & (F.col("vec_id") != F.col("q_id")))
    # ADC against the TRAINED codebooks: the candidate's code selects
    # its centroid by cell id from the broadcast cbs, j ascending
    adc = None
    for sj in range(PQ_M):
        chosen = F.element_at(
            F.filter(F.element_at("cbs", sj + 1),
                     lambda c: c["cell"] == F.element_at("codes", sj + 1)),
            1)["cv"]
        term = _dist2(F.slice("qv", sj * PQ_DSUB + 1, PQ_DSUB), chosen)
        adc = term if adc is None else adc + term
    scored = j.select(
        "q_id", F.col("vec_id").alias("neighbor_id"),
        F.round(adc, 6).alias("adc6"), "v", "nrm", "qv", "qn")
    ws = Window.partitionBy("q_id").orderBy(F.asc("adc6"),
                                            F.asc("neighbor_id"))
    short = (scored.withColumn("srn", F.row_number().over(ws))
             .filter(F.col("srn") <= PQ_SHORTLIST))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    rer = short.select("q_id", "neighbor_id", "adc6",
                       F.round(cos, 6).alias("cos6"))
    wr = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                            F.asc("neighbor_id"))
    return (rer.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= IVF_TOPK)
            .select("q_id", "neighbor_id",
                    F.round("adc6", 4).alias("adc_dist"),
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


def _ivfpq_trained_sql() -> str:
    parts, cbname = _pq_train_ctes([
        f"s AS (SELECT vec_id, CAST(t.m AS INT) AS m,\n"
        f"              list_transform(range(1, {PQ_DSUB + 1}),\n"
        f"                  i -> v[t.m * {PQ_DSUB} + i]) AS sv\n"
        f"       FROM e, range(0, {PQ_M}) AS t(m))",
    ], pfx="tq")
    pq_ctes = ",\n".join(parts)
    return f"""
{_KM_CTES},
{pq_ctes},
cb AS (
  SELECT m, cell, cv FROM {cbname}
), cd AS (
  -- corpus PQ codes = the training chain's final assignment
  SELECT vec_id, list(CAST(cell AS BIGINT) ORDER BY m) AS codes
  FROM tqaf GROUP BY vec_id
), n AS (
  SELECT af.vec_id, af.cell, af.v, {_sql_norm('af.v')} AS nrm, cd.codes
  FROM af JOIN cd ON cd.vec_id = af.vec_id
), qp AS (
  SELECT q_id, qv, qn, cell AS q_cell FROM (
    SELECT e.vec_id AS q_id, e.v AS qv, {_sql_norm('e.v')} AS qn,
           c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_dist2('e.v', 'c.cv')}, c.cell) AS pr
    FROM e CROSS JOIN {_KM_FINAL} c
    WHERE e.vec_id < {N_QUERIES}
  ) WHERE pr <= {IVF_NPROBE}
), pairs AS (
  SELECT qp.q_id, n.vec_id AS neighbor_id, qp.qv, qp.qn,
         n.v, n.nrm, n.codes
  FROM qp JOIN n ON n.cell = qp.q_cell AND n.vec_id <> qp.q_id
), terms AS (
  SELECT p.q_id, p.neighbor_id, t.m,
         list_reduce(list_transform(range(1, {PQ_DSUB + 1}),
           i -> (p.qv[t.m * {PQ_DSUB} + i] - c.cv[i])
              * (p.qv[t.m * {PQ_DSUB} + i] - c.cv[i])),
           (x, y) -> x + y) AS term
  FROM pairs p CROSS JOIN range(0, {PQ_M}) AS t(m)
  JOIN cb c ON c.m = t.m AND c.cell = p.codes[t.m + 1]
), adc AS (
  -- fold m-ascending, mirroring the Spark plan's j-ascending sum
  SELECT q_id, neighbor_id,
         ROUND(list_reduce(list(term ORDER BY m), (x, y) -> x + y), 6)
           AS adc6
  FROM terms GROUP BY q_id, neighbor_id
), scored AS (
  SELECT a.q_id, a.neighbor_id, a.adc6, p.v, p.nrm, p.qv, p.qn
  FROM adc a JOIN pairs p
    ON p.q_id = a.q_id AND p.neighbor_id = a.neighbor_id
), short AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY adc6 ASC, neighbor_id ASC)
              AS srn
    FROM scored
  ) WHERE srn <= {PQ_SHORTLIST}
), rer AS (
  SELECT q_id, neighbor_id, adc6,
         ROUND({_sql_dot('qv', 'v')} / (qn * nrm), 6) AS cos6
  FROM short
), ranked AS (
  SELECT q_id, neighbor_id, adc6, cos6,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos6 DESC, neighbor_id ASC) AS rank
  FROM rer
)
SELECT q_id, neighbor_id, ROUND(adc6, 4) AS adc_dist,
       ROUND(cos6, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {IVF_TOPK}
"""


def emb_ivfpq_residual_trained_topk(spark: SparkSession, sf_dir: str,
                                    *, k: int = KM_K) -> DataFrame:
    """IVF-PQ, residual encoding, TRAINED residual codebooks — the
    exact composition FAISS's IVFPQ ships (Jégou et al. 2011 §IV.B:
    PQ codes the residual v − centroid(cell), with codebooks trained
    on those residuals): the coarse quantizer removes the cluster
    mean that dominates raw vectors on clustered corpora, and the
    codebooks are placed where the residual mass actually is
    (emb_pq_train_residual's measured lower reconstruction error).
    Completes the 2×2 the recall bench measures: {seeded, trained} ×
    {raw, residual} — and this cell WINS it at every shortlist depth
    (BENCH/recall.json ivfpq_residual_trained: recall@3 of
    0.63/0.83/1.0 at depths 8/16/32 vs the seeded-raw 0.37/0.53/0.9;
    full recall at HALF the seeded re-rank depth) — the production
    operating point.

    Scale shape: identical to emb_ivfpq_residual_topk — residual
    computation is a broadcast K-row join on both sides; the trained
    codebooks are a broadcast M·K-row table; the one corpus-sized
    exchange remains the cell equi-join against the broadcast probe
    list. Cross-engine determinism: KM_ROUND-rounded trained
    components, m-ascending ADC fold, one ROUND(.., 6)."""
    cent, assigned = _kmeans(spark, sf_dir, k=k)  # nlist = k: the dial
    # the 10x recall measurement says must scale with corpus size
    # (BENCH/recall.json ann_clustered_10x)
    cent_b = cent.select(F.col("cell").alias("rcell"),
                         F.col("cv").alias("rcv"))
    res = (assigned
           .join(F.broadcast(cent_b), F.col("cell") == F.col("rcell"))
           .select("vec_id", "v", "cell",
                   F.zip_with("v", "rcv", lambda a, b: a - b)
                   .alias("rv")))
    rsubs = F.array(*[
        F.struct(F.lit(j).alias("m"),
                 F.slice("rv", j * PQ_DSUB + 1, PQ_DSUB).alias("sv"))
        for j in range(PQ_M)])
    frame = (res.select("vec_id", F.explode(rsubs).alias("s"))
             .select("vec_id", F.col("s.m").alias("m"),
                     F.col("s.sv").alias("sv")))
    pqcent, _ = _pq_train_cent(frame)
    cbrow = (pqcent.groupBy("m")
             .agg(F.array_sort(
                 F.collect_list(F.struct("cell", "cv"))).alias("cents"))
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("m", "cents"))),
                 lambda s: s["cents"]).alias("cbs")))
    emb = (res.crossJoin(F.broadcast(cbrow))
           .withColumn("nrm", _norm(F.col("v")))
           .withColumn("codes", F.array(*[
               _km_argmin_sub(F.slice("rv", j * PQ_DSUB + 1, PQ_DSUB),
                              F.element_at("cbs", j + 1))
               for j in range(PQ_M)])))
    centrow = cent.agg(F.array_sort(
        F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    scored_cells = F.transform(
        F.col("cents"), lambda c: F.struct(
            _dist2(F.col("v"), c["cv"]).alias("d"),
            c["cell"].alias("cell"), c["cv"].alias("ccv")))
    probe_structs = F.slice(F.array_sort(scored_cells), 1, IVF_NPROBE)
    # per probe, the query residual is against THAT cell's centroid
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .crossJoin(F.broadcast(centrow))
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qn"),
                 F.explode(probe_structs).alias("p"))
         .select("q_id", "qv", "qn", F.col("p.cell").alias("q_cell"),
                 F.zip_with("qv", F.col("p.ccv"), lambda a, b: a - b)
                 .alias("qrv")))
    j = emb.join(F.broadcast(q), (F.col("cell") == F.col("q_cell"))
                 & (F.col("vec_id") != F.col("q_id")))
    adc = None
    for sj in range(PQ_M):
        chosen = F.element_at(
            F.filter(F.element_at("cbs", sj + 1),
                     lambda c: c["cell"] == F.element_at("codes", sj + 1)),
            1)["cv"]
        term = _dist2(F.slice("qrv", sj * PQ_DSUB + 1, PQ_DSUB), chosen)
        adc = term if adc is None else adc + term
    scored = j.select(
        "q_id", F.col("vec_id").alias("neighbor_id"),
        F.round(adc, 6).alias("adc6"), "v", "nrm", "qv", "qn")
    ws = Window.partitionBy("q_id").orderBy(F.asc("adc6"),
                                            F.asc("neighbor_id"))
    short = (scored.withColumn("srn", F.row_number().over(ws))
             .filter(F.col("srn") <= PQ_SHORTLIST))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    rer = short.select("q_id", "neighbor_id", "adc6",
                       F.round(cos, 6).alias("cos6"))
    wr = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                            F.asc("neighbor_id"))
    return (rer.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= IVF_TOPK)
            .select("q_id", "neighbor_id",
                    F.round("adc6", 4).alias("adc_dist"),
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


def _ivfpq_residual_trained_sql() -> str:
    parts, cbname = _pq_train_ctes([
        f"res AS (\n"
        f"  SELECT af.vec_id, af.cell, af.v,\n"
        f"         list_transform(range(1, {DIM + 1}),\n"
        f"                        i -> af.v[i] - c.cv[i]) AS rv\n"
        f"  FROM af JOIN {_KM_FINAL} c ON c.cell = af.cell)",
        f"s AS (SELECT vec_id, CAST(t.m AS INT) AS m,\n"
        f"              list_transform(range(1, {PQ_DSUB + 1}),\n"
        f"                  i -> rv[t.m * {PQ_DSUB} + i]) AS sv\n"
        f"       FROM res, range(0, {PQ_M}) AS t(m))",
    ], pfx="rq")
    pq_ctes = ",\n".join(parts)
    return f"""
{_KM_CTES},
{pq_ctes},
cb AS (
  SELECT m, cell, cv FROM {cbname}
), cd AS (
  SELECT vec_id, list(CAST(cell AS BIGINT) ORDER BY m) AS codes
  FROM rqaf GROUP BY vec_id
), n AS (
  SELECT res.vec_id, res.cell, res.v, {_sql_norm('res.v')} AS nrm,
         cd.codes
  FROM res JOIN cd ON cd.vec_id = res.vec_id
), qp AS (
  SELECT q_id, qv, qn, q_cell,
         list_transform(range(1, {DIM + 1}),
                        i -> qv[i] - cv[i]) AS qrv
  FROM (
    SELECT q_id, qv, qn, cell AS q_cell, cv FROM (
      SELECT e.vec_id AS q_id, e.v AS qv, {_sql_norm('e.v')} AS qn,
             c.cell, c.cv,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_sql_dist2('e.v', 'c.cv')}, c.cell) AS pr
      FROM e CROSS JOIN {_KM_FINAL} c
      WHERE e.vec_id < {N_QUERIES}
    ) WHERE pr <= {IVF_NPROBE}
  )
), pairs AS (
  SELECT qp.q_id, n.vec_id AS neighbor_id, qp.qrv, qp.qv, qp.qn,
         n.v, n.nrm, n.codes
  FROM qp JOIN n ON n.cell = qp.q_cell AND n.vec_id <> qp.q_id
), terms AS (
  SELECT p.q_id, p.neighbor_id, t.m,
         list_reduce(list_transform(range(1, {PQ_DSUB + 1}),
           i -> (p.qrv[t.m * {PQ_DSUB} + i] - c.cv[i])
              * (p.qrv[t.m * {PQ_DSUB} + i] - c.cv[i])),
           (x, y) -> x + y) AS term
  FROM pairs p CROSS JOIN range(0, {PQ_M}) AS t(m)
  JOIN cb c ON c.m = t.m AND c.cell = p.codes[t.m + 1]
), adc AS (
  SELECT q_id, neighbor_id,
         ROUND(list_reduce(list(term ORDER BY m), (x, y) -> x + y), 6)
           AS adc6
  FROM terms GROUP BY q_id, neighbor_id
), scored AS (
  SELECT a.q_id, a.neighbor_id, a.adc6, p.v, p.nrm, p.qv, p.qn
  FROM adc a JOIN pairs p
    ON p.q_id = a.q_id AND p.neighbor_id = a.neighbor_id
), short AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY adc6 ASC, neighbor_id ASC)
              AS srn
    FROM scored
  ) WHERE srn <= {PQ_SHORTLIST}
), rer AS (
  SELECT q_id, neighbor_id, adc6,
         ROUND({_sql_dot('qv', 'v')} / (qn * nrm), 6) AS cos6
  FROM short
), ranked AS (
  SELECT q_id, neighbor_id, adc6, cos6,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos6 DESC, neighbor_id ASC) AS rank
  FROM rer
)
SELECT q_id, neighbor_id, ROUND(adc6, 4) AS adc_dist,
       ROUND(cos6, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {IVF_TOPK}
"""


def emb_kcenter_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-first traversal (Gonzalez 1985) — the deterministic
    k-center seeding that replaces emb_kmeans_train's first-K init
    when cluster recovery matters: start from vec_id 0, then K−1
    times pick the point FARTHEST from the chosen set (max over the
    corpus of min-dist² to the seeds, ties to the lowest id). The
    selection radii are the k-center 2-approximation certificates and
    are provably NONINCREASING round over round — pinned in tests.
    This is also the deterministic stand-in for k-means++ (argmax D²
    instead of a D²-proportional draw; a production run swaps the
    argmax for a seeded sample, same per-round plan).

    Scale shape: each round is ONE narrow map (min-dist² against the
    ≤K-seed plan-literal array) plus a global top-1 (TakeOrdered —
    partial per partition, K·DIM doubles of driver state, the same
    bounded-metadata collect class as _pca_fit's mean vector). K
    rounds total; no corpus shuffle anywhere."""
    emb = t(spark, sf_dir).select("vec_id", _vecd().alias("v"))
    first = emb.orderBy(F.asc("vec_id")).limit(1).collect()[0]
    seeds = [(0, int(first["vec_id"]), 0.0)]
    seed_vecs = [list(first["v"])]
    for r in range(1, KM_K):
        lits = F.array(*[F.array(*[F.lit(float(x)) for x in sv])
                         for sv in seed_vecs])
        md = F.array_min(F.transform(
            lits, lambda s: _dist2(F.col("v"), s)))
        pick = (emb.select("vec_id", "v", md.alias("md"))
                .orderBy(F.desc("md"), F.asc("vec_id"))
                .limit(1).collect()[0])
        seeds.append((r, int(pick["vec_id"]), round(float(pick["md"]), 6)))
        seed_vecs.append(list(pick["v"]))
    return spark.createDataFrame(
        seeds, "round int, seed_vec_id bigint, radius2 double")


MMR_K = 5        # selections
MMR_LAMBDA = 0.7  # relevance weight (1-λ penalizes redundancy)


def emb_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998) — diversity-aware top-k, the re-ranking layer between ANN
    retrieval and what a RAG/few-shot pipeline actually shows a
    model: greedily pick the candidate maximizing
    λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), so near-duplicate
    hits cannot crowd the slate. Relevance = cosine to the query
    (vec_id 0); both terms rounded to 6 before the argmax and ties
    break to the lowest id, so selection is deterministic
    cross-engine. The emitted mmr_score is the objective at selection
    time — strictly nonincreasing round over round for λ·rel bounded
    by the previous pick (pinned looser in tests: first pick is the
    plain top-1 by relevance).

    Scale shape: identical to emb_kcenter_init — per round one narrow
    map against the ≤K-row selected-vector literal array plus a
    global top-1 (bounded driver state); no corpus shuffle."""
    emb = (t(spark, sf_dir).select("vec_id", _vecd().alias("v"))
           .withColumn("nrm", _norm(F.col("v"))))
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    qv, qn = list(qrow["v"]), float(qrow["nrm"])
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    rel = F.round(_dot(F.col("v"), qlit) / (F.col("nrm") * F.lit(qn)), 6)
    cand = emb.filter(F.col("vec_id") != 0) \
        .select("vec_id", "v", "nrm", rel.alias("rel"))
    picked: list = []
    picked_vecs: list = []
    for r in range(MMR_K):
        if picked_vecs:
            sel = F.array(*[
                F.struct(F.array(*[F.lit(float(x)) for x in sv])
                         .alias("sv"), F.lit(sn).alias("sn"))
                for sv, sn in picked_vecs])
            maxsim = F.round(F.array_max(F.transform(
                sel, lambda s: _dot(F.col("v"), s["sv"])
                / (F.col("nrm") * s["sn"]))), 6)
        else:
            maxsim = F.lit(0.0)
        score = F.round(MMR_LAMBDA * F.col("rel")
                        - (1 - MMR_LAMBDA) * maxsim, 6)
        pool = cand.filter(
            ~F.col("vec_id").isin(*[p[1] for p in picked])
            if picked else F.lit(True))
        top = (pool.select("vec_id", "v", "nrm", "rel",
                           score.alias("score"))
               .orderBy(F.desc("score"), F.asc("vec_id"))
               .limit(1).collect()[0])
        picked.append((r, int(top["vec_id"]), float(top["rel"]),
                       float(top["score"])))
        picked_vecs.append((list(top["v"]), float(top["nrm"])))
    return spark.createDataFrame(
        picked,
        "round int, vec_id bigint, relevance double, mmr_score double")


def _mmr_sql() -> str:
    lam, mu = MMR_LAMBDA, 1 - MMR_LAMBDA
    parts = [
        f"e0 AS (SELECT vec_id, {_SQL_VEC} AS v FROM embeddings)",
        f"e AS (SELECT vec_id, v, {_sql_norm('v')} AS nrm FROM e0)",
        "q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0)",
        f"cand AS (SELECT vec_id, v, nrm,\n"
        f"  round({_sql_dot('e.v', 'q.qv')} / (e.nrm * q.qn), 6) AS rel\n"
        f"  FROM e, q WHERE vec_id <> 0)",
    ]
    prev_sel: list[str] = []
    for r in range(MMR_K):
        if prev_sel:
            sims = ", ".join(
                f"round({_sql_dot('c.v', f'{s}.v')} / (c.nrm * {s}.nrm)"
                f", 6)" for s in prev_sel)
            maxsim = f"GREATEST({sims})" if len(prev_sel) > 1 \
                else f"round({_sql_dot('c.v', f'{prev_sel[0]}.v')}" \
                     f" / (c.nrm * {prev_sel[0]}.nrm), 6)"
        else:
            maxsim = "0.0"
        froms = " ".join(f"CROSS JOIN {s}" for s in prev_sel)
        excl = (" AND c.vec_id NOT IN ("
                + ", ".join(f"(SELECT vec_id FROM {s})"
                            for s in prev_sel) + ")") if prev_sel else ""
        parts.append(
            f"s{r} AS (\n"
            f"  SELECT c.vec_id, c.v, c.nrm, c.rel,\n"
            f"         round({lam} * c.rel - {mu} * {maxsim}, 6)"
            f" AS score\n"
            f"  FROM cand c {froms}\n"
            f"  WHERE TRUE{excl}\n"
            f"  ORDER BY score DESC, c.vec_id LIMIT 1)")
        prev_sel.append(f"s{r}")
    ctes = ",\n".join(parts)
    sel = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, vec_id, rel AS relevance,"
        f" score AS mmr_score FROM s{r}" for r in range(MMR_K))
    return f"WITH {ctes}\n{sel}"


def _kcenter_sql() -> str:
    parts = [f"e AS (SELECT vec_id, {_SQL_VEC} AS v FROM embeddings)",
             "s0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)"]
    for r in range(1, KM_K):
        md = "LEAST(" + ", ".join(
            _sql_dist2("e.v", f"s{j}.v") for j in range(r)) + ")" \
            if r > 1 else _sql_dist2("e.v", "s0.v")
        joins = " ".join(f"CROSS JOIN s{j}" for j in range(r))
        parts.append(
            f"s{r} AS (\n"
            f"  SELECT e.vec_id, e.v, {md} AS md\n"
            f"  FROM e {joins}\n"
            f"  ORDER BY md DESC, e.vec_id LIMIT 1)")
    ctes = ",\n".join(parts)
    sel = "\nUNION ALL\n".join(
        ["SELECT 0 AS round, vec_id AS seed_vec_id, 0.0 AS radius2 "
         "FROM s0"]
        + [f"SELECT {r}, vec_id, round(md, 6) FROM s{r}"
           for r in range(1, KM_K)])
    return f"WITH {ctes}\n{sel}"


# --------------------------------------------------------------------------
# top principal component (power iteration)
# --------------------------------------------------------------------------

PCA_ITERS = 4     # fixed power-method rounds — fixed, not
                  # converge-tested, so the unrolled-CTE oracle is
                  # finite (the emb_kmeans_train discipline)
PCA_ROUND = 6     # round mean / weights / component each round on BOTH
                  # engines so downstream arithmetic sees identical
                  # doubles
PCA_INIT = 0.125  # exact 1/sqrt(64): the deterministic unit init


def _pca_fit(spark: SparkSession, sf_dir: str):
    """Fit the top principal component; returns (centered frame,
    component as a plan-literal array column). mu and v are DIM
    doubles — bounded metadata, the same class of driver scalar as the
    kmeans/pagerank convergence collects; as plan LITERALS each round
    is one scan → one DIM-row partial-agg (no crossJoin re-derivation
    of the centering lineage per round)."""
    import math

    emb = t(spark, sf_dir).select("vec_id", _vecd().alias("v"))
    mu = [r["m"] for r in
          (emb.select(F.posexplode("v").alias("pos", "x"))
           .groupBy("pos").agg(F.round(F.avg("x"), PCA_ROUND).alias("m"))
           .orderBy("pos").collect())]
    xc = emb.select("vec_id", F.zip_with(
        "v", F.array(*[F.lit(m) for m in mu]),
        lambda a, b: a - b).alias("xc"))
    v = [float(PCA_INIT)] * DIM
    for _ in range(PCA_ITERS):
        pv = F.array(*[F.lit(x) for x in v])
        s = _dot(F.col("xc"), pv)
        w_rows = (xc.select(s.alias("s"), "xc")
                  .select(F.posexplode(
                      F.transform("xc", lambda x: x * F.col("s")))
                          .alias("pos", "wx"))
                  .groupBy("pos")
                  .agg(F.round(F.sum("wx"), PCA_ROUND).alias("w"))
                  .orderBy("pos").collect())
        w = [r["w"] for r in w_rows]
        nrm = math.sqrt(sum(x * x for x in w))
        # half-away-from-zero, matching Spark ROUND / DuckDB round —
        # Python's builtin round() is banker's and would diverge on
        # exact half cases
        v = [math.copysign(
            math.floor(abs(x / nrm) * 10**PCA_ROUND + 0.5)
            / 10**PCA_ROUND, x) for x in w]
    return xc, F.array(*[F.lit(x) for x in v])


def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by POWER
    ITERATION in pure DataFrame algebra — the whitening / dominant-
    direction stage of embedding curation (ABTT-style "all-but-the-top"
    postprocessing removes exactly this direction; drift monitors watch
    its eigenvalue between snapshots). Each round is one corpus pass:
    s_i = (x_i − μ)·v, then w = Σ s_i (x_i − μ) per dimension,
    normalize, repeat PCA_ITERS times; eigenvalue = Rayleigh quotient
    avg(s²), reported with the total variance and the explained
    fraction.

    Scale shape (100 TB): μ and each round's w are partial-aggregated
    (pos)-keyed sums — DIM rows out per round; v re-enters as a 1-row
    broadcast, never a shuffle of the corpus; the whole loop is
    O(PCA_ITERS) bounded exchanges. localCheckpoint truncates
    per-round lineage (the _kmeans discipline). The reference has no
    embedding stage at all (SURVEY §2 absent lists)."""
    xc, pv = _pca_fit(spark, sf_dir)
    scored = xc.select(_dot(F.col("xc"), pv).alias("s"),
                       _dot(F.col("xc"), F.col("xc")).alias("x2"))
    stats = scored.agg(
        F.round(F.avg(F.col("s") * F.col("s")), PCA_ROUND)
         .alias("eigenvalue"),
        F.round(F.avg("x2"), PCA_ROUND).alias("total_variance"),
        F.count(F.lit(1)).alias("n_vectors"))
    return (stats.select(
        F.posexplode(pv).alias("pos", "component"),
        "eigenvalue", "total_variance", "n_vectors")
        .select("pos", "component", "eigenvalue", "total_variance",
                F.round(F.col("eigenvalue") / F.col("total_variance"),
                        PCA_ROUND).alias("explained_frac"),
                "n_vectors"))


def _pca_sql_ctes() -> tuple[str, str]:
    parts = [
        f"e AS (SELECT vec_id, {_SQL_VEC} AS v FROM embeddings)",
        f"mu AS (SELECT list(m ORDER BY pos) AS mu FROM ("
        f"  SELECT g.i AS pos, ROUND(AVG(v[g.i]), {PCA_ROUND}) AS m"
        f"  FROM e, generate_series(1, {DIM}) AS g(i) GROUP BY g.i))",
        "xc AS (SELECT vec_id, "
        "list_transform(list_zip(v, mu), p -> p[1] - p[2]) AS xc "
        "FROM e CROSS JOIN mu)",
        f"v0 AS (SELECT list_transform(range(1, {DIM + 1}), "
        f"i -> {PCA_INIT}) AS pv)",
    ]
    prev = "v0"
    for it in range(1, PCA_ITERS + 1):
        parts.append(
            f"w{it} AS (SELECT g.i AS pos, "
            f"ROUND(SUM({_sql_dot('xc.xc', f'{prev}.pv')} * xc.xc[g.i]),"
            f" {PCA_ROUND}) AS w "
            f"FROM xc CROSS JOIN {prev}, "
            f"generate_series(1, {DIM}) AS g(i) GROUP BY g.i)")
        parts.append(
            f"v{it} AS (SELECT list_transform(wv, x -> ROUND(x / "
            f"sqrt(list_reduce(list_transform(wv, y -> y * y), "
            f"(a, b) -> a + b)), {PCA_ROUND})) AS pv FROM ("
            f"SELECT list(w ORDER BY pos) AS wv FROM w{it}))")
        prev = f"v{it}"
    return ",\n".join(parts), prev


def _pca_sql() -> str:
    ctes, prev = _pca_sql_ctes()
    return f"""
WITH {ctes},
sc AS (SELECT {_sql_dot('xc.xc', f'{prev}.pv')} AS s,
       {_sql_dot('xc.xc', 'xc.xc')} AS x2
       FROM xc CROSS JOIN {prev}),
st AS (SELECT ROUND(AVG(s * s), {PCA_ROUND}) AS eigenvalue,
       ROUND(AVG(x2), {PCA_ROUND}) AS total_variance,
       CAST(COUNT(*) AS BIGINT) AS n_vectors FROM sc)
SELECT g.i - 1 AS pos, {prev}.pv[g.i] AS component,
       st.eigenvalue, st.total_variance,
       ROUND(st.eigenvalue / st.total_variance, {PCA_ROUND})
         AS explained_frac,
       st.n_vectors
FROM {prev} CROSS JOIN st, generate_series(1, {DIM}) AS g(i)
"""


def emb_abtt_postprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top postprocessing (Mu & Viswanath 2018): subtract
    the fitted dominant direction from every centered embedding —
    x' = xc − (xc·v)v — the cheap isotropy fix that measurably improves
    cosine-similarity quality on anisotropic embedding spaces (the
    dominant component mostly encodes frequency, not meaning). Emits
    per vector the projection s, squared norms before/after, and the
    energy fraction the removal reclaimed; the Pythagorean identity
    norm²_after = norm²_before − s² is pinned in test (v is unit).

    Scale shape: the fit is _pca_fit's bounded-exchange loop; the
    postprocess itself is a pure narrow map against the literal v —
    zero additional shuffles at any corpus size."""
    xc, pv = _pca_fit(spark, sf_dir)
    s = _dot(F.col("xc"), pv)
    rows = xc.select("vec_id", s.alias("s"), "xc")
    post = F.zip_with("xc", pv,
                      lambda x, vv: x - F.col("s") * vv)
    out = rows.select("vec_id", "s",
                      _dot(F.col("xc"), F.col("xc")).alias("n2_before"),
                      post.alias("xp"))
    return out.select(
        "vec_id", F.round("s", 4).alias("projection"),
        F.round("n2_before", 4).alias("norm2_before"),
        F.round(_dot(F.col("xp"), F.col("xp")), 4).alias("norm2_after"),
        F.round((F.col("s") * F.col("s")) / F.col("n2_before"), 4)
         .alias("energy_removed_frac"))


def _abtt_sql() -> str:
    ctes, prev = _pca_sql_ctes()
    return f"""
WITH {ctes},
sc AS (SELECT vec_id, {_sql_dot('xc.xc', f'{prev}.pv')} AS s,
              xc, {prev}.pv AS pv
       FROM xc CROSS JOIN {prev}),
post AS (SELECT vec_id, s,
                {_sql_dot('xc', 'xc')} AS n2_before,
                list_transform(list_zip(xc, pv),
                               p -> p[1] - s * p[2]) AS xp
         FROM sc)
SELECT vec_id, ROUND(s, 4) AS projection,
       ROUND(n2_before, 4) AS norm2_before,
       ROUND({_sql_dot('xp', 'xp')}, 4) AS norm2_after,
       ROUND(s * s / n2_before, 4) AS energy_removed_frac
FROM post
"""


# --------------------------------------------------------------------------
# semantic decontamination (embedding-space eval overlap)
# --------------------------------------------------------------------------

SEM_DECON_EVAL_MOD = 41   # vec_id % 41 == 0 → the benchmark/eval vector
                          # set (13 vectors at sf0.01 — eval suites are
                          # thousands of items, always broadcastable)
SEM_DECON_COS = 0.30      # calibrated to the synthetic vectors (~10% of
                          # the corpus flags at sf0.01; observed max-cos
                          # p90≈0.30, max≈0.45); with real text
                          # embeddings the published operating point is
                          # ~0.95 — the knob, not the shape, changes


def emb_decontaminate_semantic(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Semantic decontamination — the embedding-space complement of the
    n-gram gate (``docs_decontaminate``): a training example is
    contaminated if its embedding's cosine to ANY benchmark/eval
    embedding reaches SEM_DECON_COS, even when no verbatim n-gram
    survives paraphrase (the failure mode n-gram decontamination
    cannot see; this is the published embedding-similarity decon
    recipe, e.g. the GPT-3/PaLM appendix variants and Phi's
    embedding-based test-set filtering). Emits, per train vector, the
    nearest eval item (smallest eval_id on exact cosine ties), the
    max cosine, and the flag.

    Scale shape (100 TB): the eval set broadcasts (benchmark suites
    are vastly smaller than the corpus); the corpus side streams
    through a BroadcastNestedLoopJoin — no shuffle of the big table —
    and the nearest-eval election is ONE partial-aggregated
    groupBy(vec_id) max over a lexicographic (cos, -eval_id) struct,
    so ties resolve without a second pass or a rank window. The
    reference has no embedding stage at all (SURVEY §2 absent lists).
    """
    emb = t(spark, sf_dir).select(
        "vec_id", _vecd().alias("v")).withColumn("nrm", _norm(F.col("v")))
    ev = emb.filter(F.col("vec_id") % SEM_DECON_EVAL_MOD == 0).select(
        F.col("vec_id").alias("eval_id"), F.col("v").alias("evv"),
        F.col("nrm").alias("evn"))
    tr = emb.filter(F.col("vec_id") % SEM_DECON_EVAL_MOD != 0)
    cos6 = F.round(_dot(F.col("v"), F.col("evv"))
                   / (F.col("nrm") * F.col("evn")), 6)
    pairs = (tr.join(F.broadcast(ev))
             .select("vec_id", "eval_id", cos6.alias("cos6")))
    best = pairs.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos6").alias("c"),
                       (-F.col("eval_id")).alias("neg"))).alias("m"))
    return (best.select(
        "vec_id",
        (-F.col("m.neg")).alias("nearest_eval_id"),
        F.round(F.col("m.c"), 4).alias("max_cos"),
        (F.col("m.c") >= SEM_DECON_COS).alias("is_contaminated"))
        )


_SEM_DECON_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, v, {_sql_norm('v')} AS nrm FROM e
), ev AS (
  SELECT vec_id AS eval_id, v AS evv, nrm AS evn FROM n
  WHERE vec_id % {SEM_DECON_EVAL_MOD} = 0
), pairs AS (
  SELECT n.vec_id, ev.eval_id,
         ROUND({_sql_dot('n.v', 'ev.evv')} / (n.nrm * ev.evn), 6) AS cos6
  FROM n CROSS JOIN ev
  WHERE n.vec_id % {SEM_DECON_EVAL_MOD} <> 0
), ranked AS (
  SELECT vec_id, eval_id, cos6,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cos6 DESC, eval_id ASC) AS rn
  FROM pairs
)
SELECT vec_id, eval_id AS nearest_eval_id,
       ROUND(cos6, 4) AS max_cos,
       cos6 >= {SEM_DECON_COS} AS is_contaminated
FROM ranked WHERE rn = 1
"""


def emb_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall scorecard — the embedding-side twin of
    docs_lsh_eval: per query and per index family, recall@k of the
    TRAINED-IVF probe and the multiprobe-LSH probe against the
    brute-force cosine truth at the same k (each method judged at its
    own depth: IVF at IVF_TOPK, LSH at MULTIPROBE_TOPK, both capped by
    the truth depth TOPK), plus one mean row per method (q_id = -1).
    This is the per-corpus QA row an ANN serving tier publishes before
    trusting an index build; BENCH/recall.json plays the sweep role,
    this query is the oracle-checked spot number.

    Scale shape: the truth side is the one honest brute-force pass
    (query side broadcasts, corpus streams — already the shape of
    emb_cosine_topk); everything downstream joins frames of
    N_QUERIES·k rows, i.e. vanishing next to the scans. At 100 TB the
    truth pass runs over a fixed sampled query set, exactly as here."""
    truth = emb_cosine_topk(spark, sf_dir)
    methods = [
        ("ivf_trained", emb_ivf_trained_topk(spark, sf_dir), IVF_TOPK),
        ("lsh_multiprobe", emb_lsh_multiprobe_topk(spark, sf_dir),
         MULTIPROBE_TOPK),
    ]
    outs = []
    for name, cand_df, k in methods:
        kk = min(k, TOPK)
        tr = (truth.filter(F.col("rank") <= kk)
              .select("q_id", "neighbor_id"))
        cand = (cand_df.filter(F.col("rank") <= kk)
                .select("q_id", "neighbor_id"))
        t_cnt = tr.groupBy("q_id").agg(F.count("*").alias("n_truth"))
        c_cnt = cand.groupBy("q_id").agg(
            F.count("*").alias("n_returned"))
        hits = (cand.join(tr, ["q_id", "neighbor_id"], "left_semi")
                .groupBy("q_id").agg(F.count("*").alias("n_hits")))
        per = (t_cnt
               .join(c_cnt, "q_id", "left")
               .join(hits, "q_id", "left")
               .select(
                   F.lit(name).alias("method"),
                   F.col("q_id").cast("long").alias("q_id"),
                   F.coalesce("n_returned", F.lit(0)).cast("long")
                    .alias("n_returned"),
                   F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                   F.round(F.coalesce("n_hits", F.lit(0))
                           / F.col("n_truth"), 4).alias("recall")))
        mean = per.agg(
            F.sum("n_returned").alias("n_returned"),
            F.sum("n_hits").alias("n_hits"),
            F.round(F.avg("recall"), 4).alias("recall"),
        ).select(F.lit(name).alias("method"),
                 F.lit(-1).cast("long").alias("q_id"),
                 "n_returned", "n_hits", "recall")
        outs.append(per.unionByName(mean))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _ann_recall_sql() -> str:
    def method(name: str, method_sql: str, k: int) -> str:
        kk = min(k, TOPK)
        return f"""
{name}_cand AS (
  SELECT q_id, neighbor_id FROM ({method_sql}) WHERE rank <= {kk}
), {name}_truth AS (
  SELECT q_id, neighbor_id FROM truth_all WHERE rank <= {kk}
), {name}_per AS (
  SELECT '{name}' AS method, CAST(t.q_id AS BIGINT) AS q_id,
         CAST(COALESCE(c.n_returned, 0) AS BIGINT) AS n_returned,
         CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         round(COALESCE(h.n_hits, 0) / CAST(t.n_truth AS DOUBLE), 4)
             AS recall
  FROM (SELECT q_id, COUNT(*) AS n_truth FROM {name}_truth
        GROUP BY q_id) t
  LEFT JOIN (SELECT q_id, COUNT(*) AS n_returned FROM {name}_cand
             GROUP BY q_id) c USING (q_id)
  LEFT JOIN (SELECT cc.q_id, COUNT(*) AS n_hits
             FROM {name}_cand cc
             WHERE EXISTS (SELECT 1 FROM {name}_truth tt
                           WHERE tt.q_id = cc.q_id
                             AND tt.neighbor_id = cc.neighbor_id)
             GROUP BY cc.q_id) h USING (q_id)
), {name}_mean AS (
  SELECT '{name}' AS method, CAST(-1 AS BIGINT) AS q_id,
         CAST(SUM(n_returned) AS BIGINT) AS n_returned,
         CAST(SUM(n_hits) AS BIGINT) AS n_hits,
         round(AVG(recall), 4) AS recall
  FROM {name}_per
)"""
    return f"""
WITH truth_all AS (
{_COSINE_TOPK_SQL}
), {method('ivf_trained', _IVF_TRAINED_TOPK_SQL, IVF_TOPK)},
{method('lsh_multiprobe', _MULTIPROBE_SQL, MULTIPROBE_TOPK)}
SELECT * FROM ivf_trained_per
UNION ALL SELECT * FROM ivf_trained_mean
UNION ALL SELECT * FROM lsh_multiprobe_per
UNION ALL SELECT * FROM lsh_multiprobe_mean
"""


# --------------------------------------------------------------------------
# contrastive hard-negative mining + label-based retrieval eval
# --------------------------------------------------------------------------

HARDNEG_K = 5   # hardest negatives kept per anchor


def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (DPR, Karpukhin
    et al. 2020; SimCSE): per anchor (the demo query set), the
    HARDNEG_K highest-cosine corpus vectors whose label DIFFERS from
    the anchor's — the near-misses that make an embedding model learn
    boundaries, mined exactly the way a retrieval-training pipeline
    does it (bulk ANN pass, keep top non-positives). Same plan as
    emb_cosine_topk with one extra broadcast-side column and a
    label-mismatch predicate pushed into the join.

    Scale shape: anchors broadcast, corpus streams through one
    BroadcastNestedLoopJoin scan; per-anchor ranking windows run over
    k-bounded frames. Production replaces the brute-force scan with
    any of the repo's ANN probes — the downstream shape is unchanged."""
    emb = t(spark, sf_dir).select(
        "vec_id", "label", _vecd().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label"),
        F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    j = emb.join(F.broadcast(q),
                 (F.col("vec_id") != F.col("q_id"))
                 & (F.col("label") != F.col("q_label")))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = j.select("q_id", "q_label",
                      F.col("vec_id").alias("neg_id"),
                      F.col("label").alias("neg_label"),
                      F.round(cos, 6).alias("cos6"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                           F.asc("neg_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= HARDNEG_K)
            .select("q_id", "q_label", "neg_id", "neg_label",
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


_HARDNEG_SQL = f"""
WITH e AS (
  SELECT vec_id, label, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, label, v, {_sql_norm('v')} AS nrm FROM e
), q AS (
  SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
  FROM n WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.q_id, q.q_label, n.vec_id AS neg_id, n.label AS neg_label,
         ROUND({_sql_dot('q.qv', 'n.v')} / (q.qn * n.nrm), 6) AS cos6
  FROM q, n
  WHERE n.vec_id <> q.q_id AND n.label <> q.q_label
), ranked AS (
  SELECT q_id, q_label, neg_id, neg_label, cos6,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos6 DESC, neg_id ASC) AS rank
  FROM scored
)
SELECT q_id, q_label, neg_id, neg_label,
       ROUND(cos6, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {HARDNEG_K}
"""


RETRIEVAL_P_AT = 5   # precision depth for the label-retrieval eval


def emb_label_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality retrieval eval with labels as relevance
    (the BEIR/MTEB protocol shrunk to the corpus's own cluster
    labels): per query, the reciprocal rank of the FIRST same-label
    neighbor and precision@RETRIEVAL_P_AT over the cosine ranking,
    plus one mean row (q_id = -1) carrying MRR and mean P@k — the
    number that decides whether an embedding build is good enough to
    index before any ANN tuning starts.

    Scale shape: one brute-force pass (queries broadcast, corpus
    streams); the ranking window is per-query; the rollup is
    N_QUERIES rows. At 100 TB the eval runs over a fixed sampled
    query set against the full corpus — the same plan."""
    emb = t(spark, sf_dir).select(
        "vec_id", "label", _vecd().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label"),
        F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    j = emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = j.select(
        "q_id",
        (F.col("label") == F.col("q_label")).alias("relevant"),
        F.col("vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos6"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                           F.asc("neighbor_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    per = (ranked.groupBy("q_id")
           .agg(F.min(F.when(F.col("relevant"), F.col("rank")))
                 .alias("first_rel_rank"),
                F.sum(F.when(F.col("relevant")
                             & (F.col("rank") <= RETRIEVAL_P_AT), 1)
                       .otherwise(0)).cast("long").alias("n_rel_at_k"))
           .select(F.col("q_id").cast("long").alias("q_id"),
                   F.coalesce("first_rel_rank", F.lit(0)).cast("long")
                    .alias("first_rel_rank"),
                   "n_rel_at_k",
                   F.round(F.when(F.col("first_rel_rank").isNotNull(),
                                  1.0 / F.col("first_rel_rank"))
                            .otherwise(F.lit(0.0)), 4)
                    .alias("reciprocal_rank"),
                   F.round(F.col("n_rel_at_k") / RETRIEVAL_P_AT, 4)
                    .alias("p_at_k")))
    mean = per.agg(
        F.sum("n_rel_at_k").alias("n_rel_at_k"),
        F.round(F.avg("reciprocal_rank"), 4).alias("reciprocal_rank"),
        F.round(F.avg("p_at_k"), 4).alias("p_at_k"),
    ).select(F.lit(-1).cast("long").alias("q_id"),
             F.lit(0).cast("long").alias("first_rel_rank"),
             "n_rel_at_k", "reciprocal_rank", "p_at_k")
    return per.unionByName(mean)


_LABEL_RETRIEVAL_SQL = f"""
WITH e AS (
  SELECT vec_id, label, {_SQL_VEC} AS v FROM embeddings
), n AS (
  SELECT vec_id, label, v, {_sql_norm('v')} AS nrm FROM e
), q AS (
  SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
  FROM n WHERE vec_id < {N_QUERIES}
), ranked AS (
  SELECT q.q_id, (n.label = q.q_label) AS relevant,
         ROW_NUMBER() OVER (
             PARTITION BY q.q_id
             ORDER BY ROUND({_sql_dot('q.qv', 'n.v')}
                            / (q.qn * n.nrm), 6) DESC,
                      n.vec_id ASC) AS rank
  FROM q, n WHERE n.vec_id <> q.q_id
), per AS (
  SELECT CAST(q_id AS BIGINT) AS q_id,
         CAST(COALESCE(MIN(CASE WHEN relevant THEN rank END), 0)
              AS BIGINT) AS first_rel_rank,
         CAST(SUM(CASE WHEN relevant AND rank <= {RETRIEVAL_P_AT}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at_k,
         round(CASE WHEN MIN(CASE WHEN relevant THEN rank END)
                        IS NOT NULL
                    THEN 1.0 / MIN(CASE WHEN relevant THEN rank END)
                    ELSE 0.0 END, 4) AS reciprocal_rank,
         round(SUM(CASE WHEN relevant AND rank <= {RETRIEVAL_P_AT}
                   THEN 1 ELSE 0 END)
               / CAST({RETRIEVAL_P_AT} AS DOUBLE), 4) AS p_at_k
  FROM ranked GROUP BY q_id
)
SELECT * FROM per
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
       CAST(SUM(n_rel_at_k) AS BIGINT),
       round(AVG(reciprocal_rank), 4), round(AVG(p_at_k), 4)
FROM per
"""


SPARK_QUERIES = {
    "emb_decontaminate_semantic": emb_decontaminate_semantic,
    "emb_pca_power": emb_pca_power,
    "emb_abtt_postprocess": emb_abtt_postprocess,
    "emb_ivfpq_topk": emb_ivfpq_topk,
    "emb_ivfpq_residual_topk": emb_ivfpq_residual_topk,
    "emb_ivfpq_trained_topk": emb_ivfpq_trained_topk,
    "emb_ivfpq_residual_trained_topk": emb_ivfpq_residual_trained_topk,
    "emb_kcenter_init": emb_kcenter_init,
    "emb_mmr_select": emb_mmr_select,
    "emb_kmeans_train": emb_kmeans_train,
    "emb_silhouette": emb_silhouette,
    "emb_ivf_nprobe_sweep": emb_ivf_nprobe_sweep,
    "emb_kmeans_elbow": emb_kmeans_elbow,
    "emb_pq_train": emb_pq_train,
    "emb_pq_train_residual": emb_pq_train_residual,
    "emb_cluster_balanced_sample": emb_cluster_balanced_sample,
    "emb_cluster_quota_sample": emb_cluster_quota_sample,
    "emb_mutual_knn": emb_mutual_knn,
    "emb_outlier_scan": emb_outlier_scan,
    "emb_cell_drift": emb_cell_drift,
    "emb_mrl_recall": emb_mrl_recall,
    "emb_bitext_mine": emb_bitext_mine,
    "emb_ivf_trained_topk": emb_ivf_trained_topk,
    "emb_ivf_trained_multiprobe_topk": emb_ivf_trained_multiprobe_topk,
    "emb_cosine_topk": emb_cosine_topk,
    "emb_range_search": emb_range_search,
    "emb_ivf_range_search": emb_ivf_range_search,
    "emb_lsh_multiprobe_topk": emb_lsh_multiprobe_topk,
    "emb_pq_codes": emb_pq_codes,
    "emb_quantization_error": emb_quantization_error,
    "emb_ann_recall_eval": emb_ann_recall_eval,
    "emb_hard_negatives": emb_hard_negatives,
    "emb_label_retrieval_eval": emb_label_retrieval_eval,
    "emb_ivf_topk": emb_ivf_topk,
    "emb_label_centroids": emb_label_centroids,
    "emb_lsh_near_dup": emb_lsh_near_dup,
    "emb_ivf_assign": emb_ivf_assign,
    "emb_scalar_quantize": emb_scalar_quantize,
    "emb_semdedup": emb_semdedup,
}

ORACLE_SQL = {
    "emb_decontaminate_semantic": _SEM_DECON_SQL,
    "emb_pca_power": _pca_sql(),
    "emb_abtt_postprocess": _abtt_sql(),
    "emb_ivfpq_topk": _ivfpq_sql(),
    "emb_ivfpq_residual_topk": _ivfpq_residual_sql(),
    "emb_ivfpq_trained_topk": _ivfpq_trained_sql(),
    "emb_ivfpq_residual_trained_topk": _ivfpq_residual_trained_sql(),
    "emb_kcenter_init": _kcenter_sql(),
    "emb_mmr_select": _mmr_sql(),
    "emb_kmeans_train": _KMEANS_TRAIN_SQL,
    "emb_silhouette": _SILHOUETTE_SQL,
    "emb_ivf_nprobe_sweep": _nprobe_sweep_sql(),
    "emb_kmeans_elbow": _kmeans_elbow_sql(),
    "emb_pq_train": _pq_train_sql(),
    "emb_pq_train_residual": _pq_train_residual_sql(),
    "emb_cluster_balanced_sample": _CLUSTER_SAMPLE_SQL,
    "emb_cluster_quota_sample": _cluster_quota_sql(),
    "emb_mutual_knn": _MUTUAL_KNN_SQL,
    "emb_outlier_scan": _OUTLIER_SCAN_SQL,
    "emb_cell_drift": _CELL_DRIFT_SQL,
    "emb_mrl_recall": _mrl_sql(),
    "emb_bitext_mine": _BITEXT_MINE_SQL,
    "emb_ivf_trained_topk": _IVF_TRAINED_TOPK_SQL,
    "emb_ivf_trained_multiprobe_topk": _IVF_TRAINED_MULTIPROBE_SQL,
    "emb_cosine_topk": _COSINE_TOPK_SQL,
    "emb_range_search": _RANGE_SEARCH_SQL,
    "emb_ivf_range_search": _IVF_RANGE_SQL,
    "emb_lsh_multiprobe_topk": _MULTIPROBE_SQL,
    "emb_pq_codes": _PQ_SQL,
    "emb_quantization_error": _QUANT_ERR_SQL,
    "emb_ann_recall_eval": _ann_recall_sql(),
    "emb_hard_negatives": _HARDNEG_SQL,
    "emb_label_retrieval_eval": _LABEL_RETRIEVAL_SQL,
    "emb_ivf_topk": _IVF_TOPK_SQL,
    "emb_label_centroids": _CENTROIDS_SQL,
    "emb_lsh_near_dup": _LSH_NEAR_DUP_SQL,
    "emb_ivf_assign": _IVF_ASSIGN_SQL,
    "emb_scalar_quantize": _SCALAR_QUANT_SQL,
    "emb_semdedup": _SEMDEDUP_SQL,
}
