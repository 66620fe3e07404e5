"""Driver-contract queries for the multimodal plumbing.

The FKIM deterministic codec (operators/multimodal.py) makes the binary
round trip oracle-checkable: every decoded value is a pure function of
doc_id, so DuckDB recomputes it without ever seeing the bytes. A value
mismatch means the Spark-side binary plumbing (synthesis → Arrow binary
transfer → batch parse → typed columns) corrupted something.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_spark.operators.multimodal import (
    FRAME_BYTES, HEADER_BYTES, decode_media_meta, sample_frames,
    synthesize_media,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def mm_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(_docs(spark, sf_dir))
    meta = decode_media_meta(media)
    return meta.select("doc_id", "format", "width", "height", "n_frames",
                       "n_bytes")


_MEDIA_META_SQL = f"""
SELECT doc_id,
       'fkim' AS format,
       CAST(64 + (doc_id * 7) % 192 AS INT) AS width,
       CAST(64 + (doc_id * 13) % 192 AS INT) AS height,
       CAST(1 + doc_id % 8 AS INT) AS n_frames,
       CAST({HEADER_BYTES} + (1 + doc_id % 8) * {FRAME_BYTES} AS BIGINT)
         AS n_bytes
FROM documents
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling; frame_md5 = md5 of the frame bytes,
    which the oracle recomputes as md5(md5('<doc_id>_<f>')) since frame
    content is the ascii-hex md5 of that key."""
    media = synthesize_media(_docs(spark, sf_dir))
    return sample_frames(media, every_k=2)


_FRAME_SAMPLE_SQL = """
WITH fr AS (
  SELECT doc_id, unnest(range(0, 1 + doc_id % 8, 2)) AS f FROM documents
)
SELECT doc_id,
       CAST(f AS INT) AS frame_idx,
       md5(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(f AS VARCHAR)))
         AS frame_md5
FROM fr
"""


def mm_frame_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational layer over decoded media: frames per doc joined back to
    doc metadata — the decode feeds normal Catalyst-planned analytics."""
    media = synthesize_media(_docs(spark, sf_dir))
    frames = sample_frames(media, every_k=2)
    meta = decode_media_meta(media)
    return (frames.groupBy("doc_id")
            .agg(F.count("*").alias("n_sampled"),
                 F.max("frame_idx").alias("last_frame"))
            .join(meta.select("doc_id", "width", "height"), "doc_id"))


_FRAME_ROLLUP_SQL = """
SELECT doc_id,
       CAST((doc_id % 8) // 2 + 1 AS BIGINT) AS n_sampled,
       CAST(((doc_id % 8) // 2) * 2 AS INT) AS last_frame,
       CAST(64 + (doc_id * 7) % 192 AS INT) AS width,
       CAST(64 + (doc_id * 13) % 192 AS INT) AS height
FROM documents
"""


EMBED_DIM = 4      # stub featurizer width; a real vision tower swaps
EMBED_ROUND = 6    # in at the mapInPandas seam with its own width


def mm_frame_embed_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame featurize-and-pool — the video-embedding plumbing between
    frame sampling and ANN/SemDeDup: every sampled frame gets an
    EMBED_DIM feature vector and frames mean-pool into one video-level
    embedding per document (emitted as per-dimension columns e0..eD-1
    for cross-engine value stability). The featurizer here is a
    deterministic hash of the frame content digest — kept as JVM
    expressions so the whole stage is codegen'd and oracle-checkable;
    a REAL vision tower replaces exactly this step with an
    Arrow-batched mapInPandas over the frame bytes
    (operators/multimodal.py documents the seam), and everything
    downstream — the pooling groupBy, the ANN tier it feeds — is
    unchanged.

    Scale shape: sampling is the existing generator (rows ~ frames/k);
    featurization is a narrow map; the ONE exchange is the
    partial-aggregated per-doc mean pool."""
    media = synthesize_media(_docs(spark, sf_dir))
    frames = sample_frames(media, every_k=2)
    feats = [
        ((F.conv(F.substring(
            F.md5(F.concat("frame_md5", F.lit(f":{j}"))), 1, 8), 16, 10)
          .cast("long") % 1000) / 1000.0).alias(f"f{j}")
        for j in range(EMBED_DIM)
    ]
    per_frame = frames.select("doc_id", *feats)
    return (per_frame.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_frames_pooled"),
                 *[F.round(F.avg(f"f{j}"), EMBED_ROUND).alias(f"e{j}")
                   for j in range(EMBED_DIM)]))


_FRAME_EMBED_SQL = f"""
WITH fr AS (
  SELECT doc_id, unnest(range(0, 1 + doc_id % 8, 2)) AS f FROM documents
), fm AS (
  SELECT doc_id,
         md5(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(f AS VARCHAR)))
           AS frame_md5
  FROM fr
), feats AS (
  SELECT doc_id,
         {", ".join(
             f"(('0x' || substring(md5(frame_md5 || ':{j}'), 1, 8))"
             f"::BIGINT % 1000) / 1000.0 AS f{j}"
             for j in range(EMBED_DIM))}
  FROM fm
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames_pooled,
       {", ".join(f"round(AVG(f{j}), {EMBED_ROUND}) AS e{j}"
                  for j in range(EMBED_DIM))}
FROM feats GROUP BY doc_id
"""


PHASH_BITS = 64       # DCT-sign bits of a real pHash
PHASH_SCENES = 101    # media with equal doc_id % PHASH_SCENES are the
                      # same underlying footage, re-encoded
PHASH_BANDS = 4
PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS
PHASH_MAX_HAM = 6     # verify threshold (re-encode noise is ≤2 bits/doc
                      # → true pairs differ by ≤4)
PHASH_BUCKET_CAP = 50  # same O(n²) guard as the SimHash/MinHash paths


def _phash() -> F.Column:
    """64-bit perceptual-hash stub: the hash of a media item is its
    SCENE's DCT-sign pattern (two md5s over the scene id → 64 hex
    digits → high bit each) with ≤2 deterministic per-doc bit flips —
    exactly the signature geometry a real pHash produces for the same
    footage re-encoded at different bitrates. A real pHash (DCT over
    decoded pixels) replaces only this column at the decode seam
    (operators/multimodal.py); the banding join below is unchanged."""
    scene = (F.col("doc_id") % PHASH_SCENES).cast("string")
    hexs = F.concat(F.md5(F.concat(F.lit("ph_"), scene)),
                    F.md5(F.concat(F.lit("ph2_"), scene)))
    p1 = (F.col("doc_id") * 7) % PHASH_BITS + 1
    f1 = (F.col("doc_id") % 3 == 1).cast("int")
    p2 = (F.col("doc_id") * 11) % PHASH_BITS + 1
    f2 = (F.col("doc_id") % 5 == 2).cast("int")
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(PHASH_BITS)),
            lambda i: F.when(
                ((F.when(F.substring(hexs, i, 1).rlike("[89a-f]"),
                         F.lit(1)).otherwise(F.lit(0))
                  + F.when(i == p1, f1).otherwise(F.lit(0))
                  + F.when(i == p2, f2).otherwise(F.lit(0))) % 2) == 1,
                F.lit("1")).otherwise(F.lit("0"))), "")


def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs over media items — the visual
    dedup stage (re-encoded / re-uploaded copies of the same footage
    that byte-digest dedup cannot see). Same LSH discipline as the
    text SimHash path: by pigeonhole, two 64-bit hashes within Hamming
    PHASH_MAX_HAM=6 agree exactly on ≥1 of 4 bands UNLESS the flips
    spread across all shared bands (the documented recall trade);
    candidates come from capped band-bucket equi-joins, then exact
    Hamming verifies.

    Scale shape: hash is a narrow map; the only shuffle is the capped
    band-bucket self-join + its count window — never an all-pairs
    scan of the media corpus."""
    fp = _docs(spark, sf_dir).select("doc_id", _phash().alias("phash"))
    from pyspark.sql.window import Window
    bands = fp.select(
        "doc_id", "phash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.substring("phash", b * PHASH_BAND_BITS + 1,
                                 PHASH_BAND_BITS).alias("bucket"))
            for b in range(PHASH_BANDS)
        ])).alias("bb"),
    ).select("doc_id", "phash", "bb.band", "bb.bucket")
    w = Window.partitionBy("band", "bucket")
    bands = (bands.withColumn("bucket_n", F.count(F.lit(1)).over(w))
             .filter(F.col("bucket_n") <= PHASH_BUCKET_CAP)
             .drop("bucket_n"))
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("phash").alias("ph_a"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("phash").alias("ph_b"), "band", "bucket")
    pairs = (a.join(b, ["band", "bucket"])
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", "ph_a", "ph_b").distinct())
    hamming = F.aggregate(
        F.zip_with(F.split("ph_a", ""), F.split("ph_b", ""),
                   lambda x, y: F.when(x == y, 0).otherwise(1)),
        F.lit(0), lambda acc, x: acc + x)
    return (pairs.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= PHASH_MAX_HAM)
            .select("doc_a", "doc_b", "hamming"))


_PHASH_EXPR = f"""list_aggregate(list_transform(range(1, {PHASH_BITS + 1}),
    i -> CASE WHEN (
           (CASE WHEN substring(md5('ph_' || CAST(doc_id % {PHASH_SCENES}
                      AS VARCHAR))
                 || md5('ph2_' || CAST(doc_id % {PHASH_SCENES} AS VARCHAR)),
                 i, 1) SIMILAR TO '[89a-f]' THEN 1 ELSE 0 END
            + CASE WHEN i = (doc_id * 7) % {PHASH_BITS} + 1
                    AND doc_id % 3 = 1 THEN 1 ELSE 0 END
            + CASE WHEN i = (doc_id * 11) % {PHASH_BITS} + 1
                    AND doc_id % 5 = 2 THEN 1 ELSE 0 END) % 2 = 1)
         THEN '1' ELSE '0' END), 'string_agg', '')"""


_PHASH_NEAR_DUP_SQL = f"""
WITH fp AS (
  SELECT doc_id, {_PHASH_EXPR} AS phash FROM documents
), bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, phash, {b} AS band, "
      f"substring(phash, {b * PHASH_BAND_BITS + 1}, "
      f"{PHASH_BAND_BITS}) AS bucket FROM fp"
      for b in range(PHASH_BANDS))}
), capped AS (
  SELECT * FROM (
    SELECT doc_id, phash, band, bucket,
           COUNT(*) OVER (PARTITION BY band, bucket) AS bucket_n
    FROM bands
  ) WHERE bucket_n <= {PHASH_BUCKET_CAP}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash AS ph_a, b.phash AS ph_b
  FROM capped a JOIN capped b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
), ham AS (
  SELECT doc_a, doc_b,
         CAST(list_sum(list_transform(range(1, {PHASH_BITS + 1}),
              i -> CASE WHEN substring(ph_a, i, 1) = substring(ph_b, i, 1)
                   THEN 0 ELSE 1 END)) AS INT) AS hamming
  FROM pairs
)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= {PHASH_MAX_HAM}
"""


SCENE_CUT_COS = 0.55   # consecutive-frame cosine below this = cut
                       # (placed inside the stub featurizer's observed
                       # spread: min 0.09 / p10 0.55 / median 0.82, so
                       # cuts genuinely fire on ~10% of pairs)


def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection from frame-embedding deltas — the shot
    segmentation every video-training pipeline runs before clip
    sampling (one training clip per shot, not per fixed stride):
    consecutive SAMPLED frames whose feature cosine drops below
    SCENE_CUT_COS mark a cut. The featurizer is the same
    deterministic hash stand-in as mm_frame_embed_pool (the real
    vision tower swaps in at the documented mapInPandas seam);
    everything downstream — the lag window, the cosine, the
    thresholding — is the real operator. One row per consecutive
    frame pair with the cosine and the verdict.

    Scale shape: frame sampling is the existing generator; features
    are a narrow map; the ONE exchange is the per-video window
    (doc_id-keyed, frames-per-video bounded by the media header)."""
    from pyspark.sql.window import Window

    media = synthesize_media(_docs(spark, sf_dir))
    frames = sample_frames(media, every_k=2)
    feats = [
        ((F.conv(F.substring(
            F.md5(F.concat("frame_md5", F.lit(f":{j}"))), 1, 8), 16, 10)
          .cast("long") % 1000) / 1000.0)
        for j in range(EMBED_DIM)
    ]
    pf = frames.select("doc_id", "frame_idx",
                       F.array(*feats).alias("fv"))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    paired = (pf.withColumn("prev_idx", F.lag("frame_idx").over(w))
              .withColumn("pv", F.lag("fv").over(w))
              .filter(F.col("pv").isNotNull()))
    dot = F.aggregate(F.zip_with("fv", "pv", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)

    def nrm(c):
        return F.sqrt(F.aggregate(
            F.transform(c, lambda x: x * x),
            F.lit(0.0), lambda acc, x: acc + x))

    cos = F.round(dot / (nrm(F.col("fv")) * nrm(F.col("pv"))), 6)
    return paired.select(
        "doc_id", F.col("prev_idx").alias("frame_a"),
        F.col("frame_idx").alias("frame_b"),
        cos.alias("cos_sim"),
        (cos < SCENE_CUT_COS).alias("is_cut"))


_SCENE_CUTS_SQL = f"""
WITH fr AS (
  SELECT doc_id, unnest(range(0, 1 + doc_id % 8, 2)) AS f FROM documents
), fm AS (
  SELECT doc_id, CAST(f AS INT) AS frame_idx,
         md5(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(f AS VARCHAR)))
           AS frame_md5
  FROM fr
), feats AS (
  SELECT doc_id, frame_idx,
         [{", ".join(
             f"(('0x' || substring(md5(frame_md5 || ':{j}'), 1, 8))"
             f"::BIGINT % 1000) / 1000.0"
             for j in range(EMBED_DIM))}] AS fv
  FROM fm
), paired AS (
  SELECT doc_id, frame_idx,
         lag(frame_idx) OVER w AS prev_idx,
         lag(fv) OVER w AS pv, fv
  FROM feats
  WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
)
SELECT doc_id, prev_idx AS frame_a, frame_idx AS frame_b,
       round(list_reduce(list_transform(range(1, {EMBED_DIM + 1}),
                 i -> fv[i] * pv[i]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(range(1, {EMBED_DIM + 1}),
                     i -> fv[i] * fv[i]), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(
                     range(1, {EMBED_DIM + 1}),
                     i -> pv[i] * pv[i]), (x, y) -> x + y))), 6)
         AS cos_sim,
       round(list_reduce(list_transform(range(1, {EMBED_DIM + 1}),
                 i -> fv[i] * pv[i]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(range(1, {EMBED_DIM + 1}),
                     i -> fv[i] * fv[i]), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(
                     range(1, {EMBED_DIM + 1}),
                     i -> pv[i] * pv[i]), (x, y) -> x + y))), 6)
         < {SCENE_CUT_COS} AS is_cut
FROM paired WHERE pv IS NOT NULL
"""


VAD_HI = 600       # enter-speech energy threshold (hysteresis high)
VAD_LO = 300       # exit-speech threshold (hysteresis low)
VAD_MIN_FRAMES = 2  # minimum segment length kept
# modeled speech burst: frames [burst_start, burst_start+3) of every
# doc_id % 3 == 0 clip carry a +700 energy boost, so both silent clips
# and clips with a genuine segment exist
_VAD_FRAMES = 8


def _vad_energy_sql(doc: str, f: str) -> str:
    """Per-frame energy as a shared integer expression: a hash noise
    floor in [0, 500) plus a planted +700 burst on three consecutive
    frames of every third clip — deterministic from (doc_id, frame)
    so DuckDB recomputes it without the bytes (the FKIM convention).
    Only the hex→int idiom differs per engine, so this emits the
    DuckDB form and the Spark side builds the same value with
    F.conv."""
    return (f"(('0x' || substring(md5(CAST({doc} AS VARCHAR) || '_' "
            f"|| CAST({f} AS VARCHAR) || ':e'), 1, 4))::BIGINT % 500"
            f" + CASE WHEN {doc} % 3 = 0 AND {f} >= {doc} % 4"
            f" AND {f} < {doc} % 4 + 3 THEN 700 ELSE 0 END)")


def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hysteresis voice-activity detection over per-frame energies —
    the segmentation every audio-training pipeline runs before
    transcription or clip sampling (speech/silence gating with TWO
    thresholds so boundary chatter cannot toggle the state: enter at
    energy ≥ VAD_HI, exit below VAD_LO, drop segments shorter than
    VAD_MIN_FRAMES). The energy extractor is a deterministic hash
    stand-in with planted speech bursts (the FKIM decode-seam
    convention — the real frontend swaps in at the mapInPandas seam);
    the state machine, hysteresis, min-duration filter, and
    per-segment energy rollup are the real operator.

    Determinism/scale: the per-clip frame walk is inherently
    sequential, so it folds ONCE per row over the frame array with
    ``F.aggregate`` (all-JVM, zero shuffle, scales with input splits);
    the oracle's recursive CTE walks the same state machine frame by
    frame. Integer energies throughout; the only division is the
    final mean readout."""
    docs = _docs(spark, sf_dir)
    n_frames = (1 + F.col("doc_id") % _VAD_FRAMES).cast("int")
    noise = (F.conv(F.substring(F.md5(F.concat(
        F.col("doc_id").cast("string"), F.lit("_"),
        F.col("f").cast("string"), F.lit(":e"))), 1, 4), 16, 10)
        .cast("long") % 500)
    burst = F.when((F.col("doc_id") % 3 == 0)
                   & (F.col("f") >= F.col("doc_id") % 4)
                   & (F.col("f") < F.col("doc_id") % 4 + 3),
                   700).otherwise(0)
    frames = (docs.select("doc_id",
                          F.explode(F.sequence(
                              F.lit(0), n_frames - 1)).alias("f"))
              .withColumn("e", noise + burst))
    clip = (frames.groupBy("doc_id")
            .agg(F.sort_array(F.collect_list(F.struct("f", "e")))
                 .alias("fe")))
    seg_t = ("ARRAY<STRUCT<s: INT, e: INT, sum_e: BIGINT>>")
    init = F.struct(
        F.lit(False).alias("in_speech"),
        F.lit(-1).cast("int").alias("start"),
        F.lit(0).cast("long").alias("acc_e"),
        F.expr(f"CAST(array() AS {seg_t})").alias("segs"))
    hi, lo = VAD_HI, VAD_LO

    def step(acc, x):
        enter = (~acc["in_speech"]) & (x["e"] >= hi)
        leave = acc["in_speech"] & (x["e"] < lo)
        emitted = F.when(
            leave,
            F.concat(acc["segs"], F.array(F.struct(
                acc["start"].alias("s"), x["f"].alias("e"),
                acc["acc_e"].alias("sum_e"))))).otherwise(acc["segs"])
        return F.struct(
            F.when(enter, F.lit(True))
            .when(leave, F.lit(False))
            .otherwise(acc["in_speech"]).alias("in_speech"),
            F.when(enter, x["f"]).otherwise(acc["start"]).alias("start"),
            F.when(enter, x["e"].cast("long"))
            .when(acc["in_speech"] & ~leave, acc["acc_e"] + x["e"])
            .otherwise(acc["acc_e"]).alias("acc_e"),
            emitted.alias("segs"))

    folded = F.aggregate(
        F.col("fe"), init, step,
        lambda acc: F.when(
            acc["in_speech"],
            F.concat(acc["segs"], F.array(F.struct(
                acc["start"].alias("s"),
                F.size("fe").cast("int").alias("e"),
                acc["acc_e"].alias("sum_e"))))).otherwise(acc["segs"]))
    segs = (clip.select("doc_id", F.explode(folded).alias("g"))
            .select("doc_id",
                    F.col("g.s").alias("seg_start"),
                    F.col("g.e").alias("seg_end"),
                    (F.col("g.e") - F.col("g.s")).alias("n_frames"),
                    F.col("g.sum_e").alias("sum_energy"))
            .filter(F.col("n_frames") >= VAD_MIN_FRAMES))
    return (segs.select(
        "doc_id",
        F.col("seg_start").cast("int").alias("seg_start"),
        F.col("seg_end").cast("int").alias("seg_end"),
        F.col("n_frames").cast("int").alias("n_frames"),
        F.col("sum_energy").cast("long").alias("sum_energy"),
        F.round(F.col("sum_energy") / F.col("n_frames"), 4)
        .alias("mean_energy"))
        .orderBy("doc_id", "seg_start"))


def _vad_sql() -> str:
    e = _vad_energy_sql("fr.doc_id", "fr.f")
    return f"""
WITH RECURSIVE clips AS (
  SELECT doc_id, CAST(1 + doc_id % {_VAD_FRAMES} AS INT) AS n
  FROM documents
), fr AS (
  SELECT c.doc_id, CAST(u.f AS INT) AS f, c.n
  FROM clips c, LATERAL unnest(range(0, c.n)) AS u(f)
), en AS (
  SELECT fr.doc_id, fr.f, fr.n, CAST({e} AS BIGINT) AS e FROM fr
), walk(doc_id, f, n, in_speech, start, acc_e, segs) AS (
  SELECT doc_id, 0, n,
         e >= {VAD_HI},
         CASE WHEN e >= {VAD_HI} THEN 0 ELSE -1 END,
         CASE WHEN e >= {VAD_HI} THEN e ELSE 0 END,
         CAST([] AS STRUCT(s INT, e INT, sum_e BIGINT)[])
  FROM en WHERE f = 0
  UNION ALL
  SELECT w.doc_id, w.f + 1, w.n,
         CASE WHEN NOT w.in_speech AND en.e >= {VAD_HI} THEN true
              WHEN w.in_speech AND en.e < {VAD_LO} THEN false
              ELSE w.in_speech END,
         CASE WHEN NOT w.in_speech AND en.e >= {VAD_HI} THEN en.f
              ELSE w.start END,
         CASE WHEN NOT w.in_speech AND en.e >= {VAD_HI} THEN en.e
              WHEN w.in_speech AND en.e >= {VAD_LO}
                THEN w.acc_e + en.e
              ELSE w.acc_e END,
         CASE WHEN w.in_speech AND en.e < {VAD_LO}
              THEN list_append(w.segs,
                     {{'s': w.start, 'e': en.f, 'sum_e': w.acc_e}})
              ELSE w.segs END
  FROM walk w JOIN en ON en.doc_id = w.doc_id AND en.f = w.f + 1
  WHERE w.f + 1 < w.n
), final AS (
  SELECT doc_id,
         CASE WHEN in_speech
              THEN list_append(segs,
                     {{'s': start, 'e': n, 'sum_e': acc_e}})
              ELSE segs END AS segs
  FROM walk WHERE f = n - 1
), seg AS (
  SELECT doc_id, u.g.s AS seg_start, u.g.e AS seg_end,
         u.g.e - u.g.s AS n_frames, u.g.sum_e AS sum_energy
  FROM final, LATERAL unnest(segs) AS u(g)
)
SELECT doc_id, CAST(seg_start AS INT) AS seg_start,
       CAST(seg_end AS INT) AS seg_end,
       CAST(n_frames AS INT) AS n_frames,
       CAST(sum_energy AS BIGINT) AS sum_energy,
       round(sum_energy / CAST(n_frames AS DOUBLE), 4) AS mean_energy
FROM seg WHERE n_frames >= {VAD_MIN_FRAMES}
ORDER BY doc_id, seg_start
"""


SPARK_QUERIES = {
    "mm_phash_near_dup": mm_phash_near_dup,
    "mm_media_meta": mm_media_meta,
    "mm_frame_sample": mm_frame_sample,
    "mm_frame_rollup": mm_frame_rollup,
    "mm_frame_embed_pool": mm_frame_embed_pool,
    "mm_scene_cuts": mm_scene_cuts,
    "mm_audio_vad": mm_audio_vad,
}

ORACLE_SQL = {
    "mm_phash_near_dup": _PHASH_NEAR_DUP_SQL,
    "mm_media_meta": _MEDIA_META_SQL,
    "mm_frame_sample": _FRAME_SAMPLE_SQL,
    "mm_frame_rollup": _FRAME_ROLLUP_SQL,
    "mm_frame_embed_pool": _FRAME_EMBED_SQL,
    "mm_scene_cuts": _SCENE_CUTS_SQL,
    "mm_audio_vad": _vad_sql(),
}
