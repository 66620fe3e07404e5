"""End-to-end extraction job: Iceberg-shim scan → salted mapInPandas
extraction → snapshot write → per-wave checkpoint/lineage/metrics commit.

Execution model (SURVEY.md §3.4): one Catalyst-planned job per commit wave —

    input snapshot scan (url, html only — column pruning)
      → [resume filter: skip checkpointed buckets — partition-level skip]
      → salted repartition                    [the ONE shuffle]
      → mapInPandas(extract)                  [Arrow boundary]
      → snapshot write partitioned by bucket  [shuffle-free]
      → bookkeeping appends                   [JVM-side aggregation]

Buckets are grouped into ``waves``; each wave commits atomically through the
shim pointer + a checkpoint append, so a killed run resumes at wave
granularity without reprocessing committed buckets — the cluster-scale
version of the reference's processed-files dedup sets
(/root/reference/service/api/main.py:21-48).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_spark.operators.bookkeeping import (
    checkpointed_out_snapshots, commit_bucket_bookkeeping, completed_buckets,
)
from ocr_spark.operators.extraction import (
    DEFAULT_BIG_THRESHOLD, DEFAULT_BUCKETS, run_extraction,
)
from ocr_spark.sources import iceberg_shim as shim


def output_root(work_dir: str) -> str:
    return os.path.join(work_dir, "extracted")


# meta-robots noindex, matched against raw page bytes (same directive
# surface as plans/webops.py::pages_robots_filter — kept as a plain
# pattern here so the job layer does not import the query plans)
_ROBOTS_NOINDEX = r'name="robots" content="[^"]*noindex'


def _roll_forward_orphans(spark: SparkSession, work_dir: str) -> int:
    """Crash recovery for the bookkeeping→publish window: any output
    snapshot referenced by a checkpoint row but not yet visible in the
    output table's history is published now (idempotent pointer swap).
    The inverse window (staged data, no checkpoint yet) needs nothing —
    the staged snapshot is unreachable and its buckets simply re-run."""
    root = output_root(work_dir)
    published = 0
    for sid in checkpointed_out_snapshots(spark, work_dir):
        if not shim.is_published(root, sid):
            shim.publish_snapshot(root, sid)
            published += 1
    return published


def run_extraction_job(spark: SparkSession, input_table_root: str,
                       work_dir: str, partitions: int = 128,
                       big_partitions: int = 8,
                       big_threshold: int = DEFAULT_BIG_THRESHOLD,
                       n_buckets: int = DEFAULT_BUCKETS,
                       waves: int = 4,
                       respect_robots: bool = False,
                       route_filter: bool = False,
                       fail_after_waves: int | None = None,
                       fail_point: str = "after_wave") -> dict:
    """Run (or resume) extraction of the input table's full logical
    content at CURRENT — the whole snapshot chain, processed
    per-snapshot (oldest first) so checkpoints stay (snapshot, bucket)
    granular and already-processed ancestors are skipped, not
    re-extracted.

    ``respect_robots=True`` drops pages whose meta-robots directive
    contains ``noindex`` BEFORE the Arrow boundary (a narrow JVM regexp
    filter fused into the scan stage) — the crawl-politeness gate a
    production pipeline applies at ingest so excluded pages never cost
    kernel CPU. Default off: the driver-contract corpora are extracted
    in full, and the robots signal stays queryable via
    plans/webops.py::pages_robots_filter.

    ``route_filter=True`` applies the pages_extract_router decision
    (plans/htmlfeat.py::route_for_html — the SAME expression the query
    table publishes) as a pre-Arrow JVM filter: link-farm and
    low-text-density pages are dropped before costing kernel CPU, the
    oversized and normal routes proceed. At 100 TB this is the router
    table acting as the job planner it documents. Default off — the
    driver-contract corpora extract in full.

    ``fail_after_waves``/``fail_point`` are test hooks simulating a
    mid-job crash for the resume tests (SURVEY.md §5.2.5): raise after N
    waves, either ``after_wave`` (full commit done), ``after_stage``
    (data staged, no bookkeeping, no publish) or ``after_bookkeeping``
    (bookkeeping appended, publish skipped → exercises roll-forward).

    Returns a summary dict (snapshot ids, bucket/doc counts, skipped).
    """
    input_sid = shim.current_snapshot_id(input_table_root)
    if input_sid is None:
        raise FileNotFoundError(f"no input snapshot at {input_table_root}")
    # The LOGICAL table at CURRENT = the whole snapshot chain (append-
    # chain model), but resume bookkeeping is bucket-granular PER
    # SNAPSHOT — so the chain is processed one snapshot at a time,
    # oldest first, each keyed on its own sid. A first-ever run on a
    # multi-snapshot table covers every ancestor's rows; a rerun after
    # an append skips fully-processed ancestors through their own
    # checkpoints instead of re-extracting them (which would duplicate
    # every ancestor document in the output).
    return _run_chain(
        spark, input_table_root, work_dir, shim.history(input_table_root),
        input_sid, partitions=partitions, big_partitions=big_partitions,
        big_threshold=big_threshold, n_buckets=n_buckets, waves=waves,
        respect_robots=respect_robots, route_filter=route_filter,
        fail_after_waves=fail_after_waves, fail_point=fail_point)


def _run_chain(spark: SparkSession, input_table_root: str, work_dir: str,
               sids: list[str], input_sid: str, *, partitions: int,
               big_partitions: int, big_threshold: int, n_buckets: int,
               waves: int, respect_robots: bool = False,
               route_filter: bool = False,
               fail_after_waves: int | None = None,
               fail_point: str = "after_wave") -> dict:
    """Process ``sids`` (oldest → newest), each snapshot's own data dir
    keyed on its own sid — the uniform (snapshot, bucket) checkpoint
    granularity that lets full runs, incremental runs, and reruns
    compose without ever re-extracting (duplicating) a processed
    snapshot's rows.

    Chain-invariant bookkeeping happens ONCE per job, not per snapshot:
    one roll-forward pass, one checkpoint-table scan (grouped by
    snapshot), one run_id shared by every snapshot's metrics rows."""
    from ocr_spark.operators.bookkeeping import completed_buckets_by_snapshot
    from ocr_spark.sources import PAGES_SCHEMA

    rolled_forward = _roll_forward_orphans(spark, work_dir)
    done_by_sid = completed_buckets_by_snapshot(spark, work_dir)
    run_id = uuid.uuid4().hex[:12]
    combined: dict = {"run_id": run_id, "input_snapshot": input_sid,
                      "output_snapshots": [], "buckets_skipped": 0,
                      "buckets_processed": 0, "docs": 0,
                      "rolled_forward": rolled_forward,
                      "snapshots_processed": 0}
    if respect_robots:
        combined["respect_robots"] = True
    if route_filter:
        combined["route_filter"] = True
    for sid in sids:
        data_dir = shim.read_manifest(input_table_root, sid)["data_dir"]
        pages = spark.read.schema(PAGES_SCHEMA).parquet(data_dir)
        if respect_robots:
            pages = pages.filter(
                ~F.col("html").cast("string").rlike(_ROBOTS_NOINDEX))
        if route_filter:
            from ocr_spark.plans.htmlfeat import route_for_html
            # route census FIRST (the streaming router_sink's
            # nothing-silently-vanishes discipline): condemned pages
            # never reach the kernel, but their counts are committed
            # per snapshot — idempotent overwrite keyed on sid
            census = (pages
                      .groupBy(route_for_html(F.col("html"))
                               .alias("route"))
                      .agg(F.count("*").cast("long").alias("n_pages"),
                           F.sum(F.length("html")).cast("long")
                           .alias("bytes_in")))
            census.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(work_dir, "route_census",
                             f"snapshot={sid}"))
            pages = pages.filter(route_for_html(F.col("html"))
                                 .isin("extract", "oversized"))
        s = _run_waves(
            spark, pages, work_dir, sid, [data_dir],
            run_id=run_id, done=done_by_sid.get(sid, set()),
            partitions=partitions, big_partitions=big_partitions,
            big_threshold=big_threshold, n_buckets=n_buckets, waves=waves,
            fail_after_waves=fail_after_waves, fail_point=fail_point)
        combined["output_snapshots"] += s["output_snapshots"]
        combined["buckets_skipped"] += s["buckets_skipped"]
        combined["buckets_processed"] += s["buckets_processed"]
        combined["docs"] += s["docs"]
        combined["snapshots_processed"] += 1
    return combined


def _run_waves(spark: SparkSession, pages: DataFrame, work_dir: str,
               input_sid: str, input_files: list[str], *,
               partitions: int, big_partitions: int, big_threshold: int,
               n_buckets: int, waves: int,
               run_id: str | None = None,
               done: set[int] | None = None,
               fail_after_waves: int | None = None,
               fail_point: str = "after_wave") -> dict:
    """One snapshot's waves. ``run_id``/``done`` are normally provided
    by _run_chain (shared id, single checkpoint scan); standalone calls
    fall back to computing them here."""
    if done is None:
        _roll_forward_orphans(spark, work_dir)
        done = completed_buckets(spark, work_dir, input_sid)
    run_id = run_id or uuid.uuid4().hex[:12]

    all_buckets = list(range(n_buckets))
    todo = [b for b in all_buckets if b not in done]
    wave_size = max(1, (len(all_buckets) + waves - 1) // waves)
    wave_groups = [todo[i:i + wave_size] for i in range(0, len(todo), wave_size)]

    out_sids: list[str] = []
    docs_total = 0
    for w, bucket_group in enumerate(wave_groups):
        if not bucket_group:
            continue
        wave_pages = pages.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int"),
        ).filter(F.col("bucket").isin(bucket_group)).drop("bucket")

        extracted = run_extraction(
            wave_pages, partitions=partitions, big_partitions=big_partitions,
            big_threshold=big_threshold, n_buckets=n_buckets,
        )
        # two-phase commit: stage data (invisible) → bookkeeping append →
        # publish (atomic pointer swap). Crash between stage and
        # bookkeeping: snapshot unreachable, buckets re-run. Crash between
        # bookkeeping and publish: rolled forward at next job start.
        out_sid = shim.prepare_snapshot(
            extracted, output_root(work_dir), partition_by=["bucket"],
            snapshot_id=f"{input_sid[:8]}-{run_id}-w{w}",
        )
        if fail_after_waves is not None and (w + 1) >= fail_after_waves \
                and fail_point == "after_stage":
            raise RuntimeError(f"injected failure after stage, wave {w}")

        from ocr_spark.operators.extraction import EXTRACT_RESULT_SCHEMA
        staged = shim.read_snapshot(spark, output_root(work_dir), out_sid,
                                    schema=EXTRACT_RESULT_SCHEMA)
        docs_total += commit_bucket_bookkeeping(
            spark, staged, work_dir, snapshot_id=input_sid, run_id=run_id,
            input_files=input_files,
            big_threshold=big_threshold, skew_salt=big_partitions,
            buckets=bucket_group, out_snapshot_id=out_sid,
        )
        if fail_after_waves is not None and (w + 1) >= fail_after_waves \
                and fail_point == "after_bookkeeping":
            raise RuntimeError(
                f"injected failure after bookkeeping, wave {w}")

        shim.publish_snapshot(output_root(work_dir), out_sid)
        out_sids.append(out_sid)

        if fail_after_waves is not None and (w + 1) >= fail_after_waves \
                and fail_point == "after_wave":
            raise RuntimeError(f"injected failure after wave {w}")

    return {
        "run_id": run_id,
        "input_snapshot": input_sid,
        "output_snapshots": out_sids,
        "buckets_skipped": len(done),
        "buckets_processed": len(todo),
        "docs": docs_total,
    }


def run_incremental_extraction_job(spark: SparkSession,
                                   input_table_root: str, work_dir: str,
                                   partitions: int = 128,
                                   big_partitions: int = 8,
                                   big_threshold: int = DEFAULT_BIG_THRESHOLD,
                                   n_buckets: int = DEFAULT_BUCKETS,
                                   waves: int = 4,
                                   respect_robots: bool = False) -> dict:
    """Process ONLY the input data added since the last processed
    snapshot (shim.added_since diff) — Trigger.AvailableNow semantics
    over the snapshot chain, without Structured Streaming.

    Logic: walk the input table's parent chain from CURRENT back to the
    most recent snapshot whose bucket set is FULLY checkpointed (a
    snapshot with only partial checkpoints is NOT a valid base — its
    unfinished buckets would be silently lost); process everything
    after it, each snapshot keyed on its own sid (so bucket-level resume
    works within the increment too). Falls back to the full job when no
    fully-processed ancestor exists — and the full job walks the ENTIRE
    chain, skipping completed buckets per snapshot; no-ops when CURRENT
    (and its ancestors) are already fully processed.
    """
    input_sid = shim.current_snapshot_id(input_table_root)
    if input_sid is None:
        raise FileNotFoundError(f"no input snapshot at {input_table_root}")

    from ocr_spark.operators.bookkeeping import completed_buckets_by_snapshot
    done_by_sid = completed_buckets_by_snapshot(spark, work_dir)

    def fully_done(sid: str) -> bool:
        return len(done_by_sid.get(sid, ())) >= n_buckets

    # newest FULLY-processed ancestor (or CURRENT itself)
    base = None
    sid = input_sid
    while sid is not None:
        if fully_done(sid):
            base = sid
            break
        sid = shim.read_manifest(input_table_root, sid).get("parent_id")
    if base is None:
        return run_extraction_job(
            spark, input_table_root, work_dir, partitions=partitions,
            big_partitions=big_partitions, big_threshold=big_threshold,
            n_buckets=n_buckets, waves=waves,
            respect_robots=respect_robots)

    # the snapshots strictly after base, oldest → newest, each processed
    # keyed on ITS OWN sid (same (snapshot, bucket) checkpoint unit as
    # the full job, so the two paths compose: a later full run sees the
    # increment's per-snapshot checkpoints and skips them). base being
    # fully done makes excluding it safe; any PARTIALLY-done snapshot is
    # after base by construction and gets its remaining buckets resumed.
    chain = shim.history(input_table_root)
    added_sids = chain[chain.index(base) + 1:]
    summary = _run_chain(
        spark, input_table_root, work_dir, added_sids, input_sid,
        partitions=partitions, big_partitions=big_partitions,
        big_threshold=big_threshold, n_buckets=n_buckets, waves=waves,
        respect_robots=respect_robots)
    summary["incremental_base"] = base
    summary["added_dirs"] = len(added_sids)
    return summary


def compact_snapshots(spark: SparkSession, work_dir: str) -> dict:
    """Rewrite the whole output history as ONE snapshot (small-file /
    manifest compaction). After thousands of incremental commits the
    snapshot chain itself becomes metadata overhead; compaction reads
    the union (one multi-path scan), stages it as a fresh-chain snapshot
    whose manifest records ``compacted_from``, and publishes atomically.

    Crash-safe: a crash before publish leaves the old chain CURRENT and
    the staged compaction unreachable (rerun simply re-compacts).
    Roll-forward-safe: ``is_published`` treats compacted-away snapshot
    ids as published, so checkpoint bookkeeping referencing them never
    rewinds CURRENT to a pre-compaction snapshot. Orphans are rolled
    forward FIRST: a checkpointed-but-unpublished wave snapshot is
    committed data, so it must be published (and thus absorbed) before
    the chain is rewritten — otherwise the next job's roll-forward
    would swap CURRENT to the orphan, whose parent chain is the
    pre-compaction history, silently undoing the compaction."""
    _roll_forward_orphans(spark, work_dir)
    root = output_root(work_dir)
    sids = shim.history(root) if shim.current_snapshot_id(root) else []
    if len(sids) <= 1:
        return {"compacted": 0, "snapshot": sids[0] if sids else None}
    absorbed = []
    for sid in sids:
        absorbed.append(sid)
        absorbed.extend(shim.read_manifest(root, sid)
                        .get("compacted_from") or [])
    # repartition ON the partition column before the partitionBy write:
    # without it every task writes a sliver into every bucket dir
    # (tasks × buckets small files — the problem compaction exists to
    # fix); with it each bucket's rows land in one task → one file.
    df = read_extracted(spark, work_dir).repartition("bucket")
    new_sid = shim.prepare_snapshot(
        df, root, partition_by=["bucket"],
        snapshot_id=f"compact-{uuid.uuid4().hex[:12]}",
        parent_id=None, extra={"compacted_from": sorted(set(absorbed))})
    shim.publish_snapshot(root, new_sid)
    return {"compacted": len(sids), "snapshot": new_sid}


def curation_root(work_dir: str) -> str:
    return os.path.join(work_dir, "curated")


def run_curation_job(spark: SparkSession, work_dir: str, *,
                     shard_token_budget: int = 2000,
                     dedup: str = "para",
                     neardup: bool = False,
                     line_corrections: bool = False) -> dict:
    """Corpus-wide curation stage over the committed extraction output:
    C4-style corpus dedup → quality + line-format + repetition
    filters → keep/drop verdict with drop reason → token-budget shard packing of the kept
    set → ONE published snapshot + a metrics row.

    ``neardup=True`` prepends a DOCUMENT-level near-dup collapse
    (MinHash-LSH + signature-overlap verify + connected components,
    keep-the-longest keeper) before the content-level pass — the
    re-crawl/mirror case exact url-keyed dedup cannot see.

    ``line_corrections=True`` applies the RefinedWeb line-wise edit
    rules BEFORE dedup (plans/webops.py::line_corrections_frame — the
    same kernel the oracle-checked pages_line_corrections query pins):
    bullet / teaser-ellipsis / mostly-numeric lines are stripped and
    the text reassembled; documents losing more than
    LC_MAX_REMOVED_FRAC of their characters are dropped outright.
    Editing before dedup means the dedup keys see CLEANED text (two
    pages differing only in boilerplate lines dedup as the same
    content — the reason RefinedWeb orders it this way).

    ``dedup`` picks the corpus-dedup granularity: ``"para"`` (default)
    removes repeated paragraphs (the common line/paragraph-hash form);
    ``"span"`` applies C4's LITERAL three-sentence-span rule
    (plans/webops.py::span_dedup_frame); ``"substr"`` applies Lee et
    al. 2022's exact-substring removal (every duplicated K-token
    window keeps only its global first occurrence, case-preserving —
    plans/webops.py::substring_dedup_frame). In span/substr mode the
    n_paras / n_kept columns count SENTENCES / TOKENS respectively —
    same schema, different unit, recorded in the snapshot manifest.

    Deliberately NOT wave/bucket-resumable: paragraph dedup and
    repetition are cross-bucket GLOBAL operators (the first occurrence
    of a paragraph may be in any bucket), so partial commits could
    change which copy survives. The input is immutable committed
    extraction output, so a crashed run simply reruns deterministically;
    the stage commits atomically through the same two-phase
    prepare/publish as the extraction waves.

    Filter thresholds are shared with the oracle-checked query surface
    (plans/dataops.py Gopher constants, plans/webops.py repetition
    bound) — the queries are the unit-verifiable form, this job is the
    pipeline form."""
    from ocr_spark.plans.dataops import (
        _GF_MIN_ALPHA_FRAC, _GF_MIN_MEAN_WLEN, _GF_MIN_STOP_HITS,
        _GF_MIN_WORDS, _GF_MAX_MEAN_WLEN, _GF_MAX_WORDS, _GF_STOPWORDS,
    )
    from ocr_spark.plans.webops import (
        DUP_2GRAM_MAX_FRAC, GLF_MAX_BULLET_FRAC, GLF_MAX_ELLIPSIS_FRAC,
    )
    from pyspark.sql.window import Window

    if dedup not in ("para", "span", "substr"):
        raise ValueError(
            f"dedup must be 'para', 'span' or 'substr', got {dedup!r}")
    run_id = uuid.uuid4().hex[:12]
    input_sids = shim.history(output_root(work_dir))
    docs = (read_extracted(spark, work_dir)
            .filter(F.col("error").isNull() & F.col("text").isNotNull()
                    & (F.col("text") != ""))
            .select("url", "text"))

    # ---- stage 0 (optional): DOCUMENT-level near-dup dedup — the
    # re-crawl/mirror collapse that runs before any content-level
    # dedup: MinHash-LSH candidates (bucket-capped) → signature-overlap
    # Jaccard estimate (the no-gram-recompute production verifier) →
    # connected components → keep the LONGEST member per cluster
    # (Dolma-style; ties to the lexicographically smallest url). Node
    # ids for label propagation are 60-bit md5 prefixes of the url
    # (the convergence test sums labels, so ids must be numeric).
    n_neardup_dropped = 0
    if neardup:
        from ocr_spark.plans.dataops import (
            NEAR_DUP_JACCARD, lsh_pairs_frame, minhash_sigs_frame,
            near_dup_clusters)
        nid = F.conv(F.substring(F.md5("url"), 1, 15), 16, 10) \
            .cast("long")
        ids = docs.select("url", nid.alias("nid"))
        sigs = minhash_sigs_frame(docs, key="url", text_col="text")
        verified = (lsh_pairs_frame(sigs, key="url")
                    .filter(F.col("jaccard_est") >= NEAR_DUP_JACCARD))
        pairs = (verified
                 .join(ids.select(F.col("url").alias("key_a"),
                                  F.col("nid").alias("doc_a")), "key_a")
                 .join(ids.select(F.col("url").alias("key_b"),
                                  F.col("nid").alias("doc_b")), "key_b")
                 .select("doc_a", "doc_b"))
        clusters = near_dup_clusters(pairs, spark=spark) \
            .select(F.col("doc_id").alias("nid"), "cluster_id")
        members = (docs.select("url", F.length("text").alias("nch"))
                   .join(ids, "url").join(clusters, "nid"))
        wk = Window.partitionBy("cluster_id").orderBy(
            F.desc("nch"), F.asc("url"))
        losers = (members.withColumn("rn", F.row_number().over(wk))
                  .filter(F.col("rn") > 1).select("url")
                  .localCheckpoint())
        n_neardup_dropped = losers.count()
        docs = docs.join(losers, "url", "left_anti")

    # ---- stage 0.5 (optional): RefinedWeb line-wise edit rules over
    # the extracted text, BEFORE dedup so dedup keys see cleaned text;
    # narrow per-row array ops + one count of over-corrected docs
    n_linefix_dropped = 0
    n_lines_removed = 0
    if line_corrections:
        from ocr_spark.plans.webops import line_corrections_frame
        lc = line_corrections_frame(docs, key="url").localCheckpoint()
        lc_stats = lc.agg(
            F.sum("n_removed").alias("nr"),
            F.sum((~F.col("keep_line_corrected")).cast("long")).alias("nd")
        ).collect()[0]
        n_lines_removed = int(lc_stats.nr or 0)
        n_linefix_dropped = int(lc_stats.nd or 0)
        docs = (lc.filter("keep_line_corrected")
                .select("url", F.col("text_clean").alias("text")))

    # ---- stage 1: corpus-wide dedup (global first occurrence)
    if dedup == "span":
        from ocr_spark.plans.webops import span_dedup_frame
        sd = span_dedup_frame(docs)
        deduped = sd.select(
            "url",
            F.col("n_sents").alias("n_paras"),
            (F.col("n_sents") - F.col("n_removed")).alias("n_kept"),
            F.col("text_span_deduped").alias("text_deduped"))
    elif dedup == "substr":
        from ocr_spark.plans.webops import substring_dedup_frame
        sd = substring_dedup_frame(docs, key="url")
        deduped = sd.select(
            "url",
            F.col("n_tokens").alias("n_paras"),
            (F.col("n_tokens") - F.col("n_removed_tokens"))
            .alias("n_kept"),
            "text_deduped")
    else:
        paras = docs.select(
            "url",
            F.posexplode(F.split("text", "\n\n")).alias("para_idx", "para"))
        w_first = Window.partitionBy(F.md5("para")).orderBy("url", "para_idx")
        ranked = paras.withColumn("rn", F.row_number().over(w_first))
        kept_struct = F.when(F.col("rn") == 1, F.struct("para_idx", "para"))
        deduped = (ranked.groupBy("url")
                   .agg(F.count("*").alias("n_paras"),
                        F.sum((F.col("rn") == 1).cast("long"))
                        .alias("n_kept"),
                        F.array_join(
                            F.transform(
                                F.array_sort(F.collect_list(kept_struct)),
                                lambda s: s["para"]),
                            "\n\n").alias("text_deduped")))

    # ---- stage 2: quality (Gopher bounds) over the DEDUPED text
    toks = F.split(F.lower(F.trim(F.col("text_deduped"))), r"\s+")
    base = deduped.withColumn("toks", toks).withColumn(
        "n_words",
        F.when((F.size("toks") == 1) & (F.col("toks")[0] == ""), F.lit(0))
        .otherwise(F.size("toks")))
    mean_wlen = F.when(
        F.col("n_words") > 0,
        F.aggregate("toks", F.lit(0).cast("bigint"),
                    lambda a, x: a + F.length(x)) / F.col("n_words")
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        F.col("n_words") > 0,
        F.size(F.filter("toks", lambda x: x.rlike("^[a-z]+$")))
        / F.col("n_words")).otherwise(F.lit(0.0))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct("toks"),
        F.array(*[F.lit(w) for w in _GF_STOPWORDS])))
    quality_ok = ((F.col("n_words") >= _GF_MIN_WORDS)
                  & (F.col("n_words") <= _GF_MAX_WORDS)
                  & (mean_wlen >= _GF_MIN_MEAN_WLEN)
                  & (mean_wlen <= _GF_MAX_MEAN_WLEN)
                  & (alpha_frac >= _GF_MIN_ALPHA_FRAC)
                  & (stop_hits >= _GF_MIN_STOP_HITS))
    with_quality = base.withColumn("quality_ok", quality_ok)

    # ---- stage 2.5: Gopher LINE-level format gate over the deduped
    # text (bullet-start / ellipsis-end line ratios — same thresholds
    # as the oracle-checked docs_gopher_line_filters); narrow map
    lines = F.filter(F.split("text_deduped", "\n"), lambda x: x != "")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(
        lines, lambda x: x.startswith("\u2022 ") | x.startswith("- ")
        | x.startswith("* ")))
    n_ellipsis = F.size(F.filter(
        lines, lambda x: x.endswith("...") | x.endswith("\u2026")))
    line_ok = F.when(n_lines == 0, F.lit(True)).otherwise(
        (F.round(n_bullet / n_lines, 4) <= GLF_MAX_BULLET_FRAC)
        & (F.round(n_ellipsis / n_lines, 4) <= GLF_MAX_ELLIPSIS_FRAC))
    with_quality = with_quality.withColumn("line_ok", line_ok)

    # ---- stage 3: 2-gram repetition over the deduped text
    grams = F.when(
        F.size("toks") >= 2,
        F.transform(F.sequence(F.lit(0), F.size("toks") - 2),
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 2))),
    ).otherwise(F.array().cast("array<string>"))
    gcounts = (with_quality.select("url", F.explode(grams).alias("g"))
               .groupBy("url", "g").agg(F.count("*").alias("c"))
               .groupBy("url")
               .agg((F.sum(F.col("c") - 1) / F.sum("c"))
                    .alias("dup_2gram_frac")))
    verdict = (with_quality.join(gcounts, "url", "left")
               .withColumn("dup_2gram_frac",
                           F.coalesce("dup_2gram_frac", F.lit(0.0)))
               .withColumn("repetition_ok",
                           F.col("dup_2gram_frac") <= DUP_2GRAM_MAX_FRAC)
               .withColumn("keep", F.col("quality_ok")
                           & F.col("line_ok") & F.col("repetition_ok"))
               .withColumn("drop_reason",
                           F.when(~F.col("quality_ok"), "quality")
                           .when(~F.col("line_ok"), "line_format")
                           .when(~F.col("repetition_ok"), "repetition")))

    # ---- stage 4: token-budget shard packing of the kept set, windowed
    # per url-hash stratum (16 parallel streams; production packs per
    # output partition — same shape)
    stratum = F.substring(F.md5("url"), 1, 1)
    w_pack = (Window.partitionBy("stratum").orderBy("url")
              .rowsBetween(Window.unboundedPreceding, -1))
    prefix = F.coalesce(F.sum("n_words").over(w_pack), F.lit(0))
    kept = (verdict.filter("keep").withColumn("stratum", stratum)
            .withColumn("shard_id",
                        F.concat_ws("-", "stratum",
                                    F.floor(prefix / shard_token_budget)
                                    .cast("string"))))
    out = (verdict.join(kept.select("url", "shard_id"), "url", "left")
           .select("url", "text_deduped", "n_paras", "n_kept", "n_words",
                   F.round("dup_2gram_frac", 4).alias("dup_2gram_frac"),
                   "quality_ok", "line_ok", "repetition_ok", "keep",
                   "drop_reason", "shard_id"))

    out_sid = shim.prepare_snapshot(
        out, curation_root(work_dir), snapshot_id=f"cur-{run_id}",
        extra={"curated_from": input_sids, "dedup_mode": dedup,
               "neardup": neardup,
               "neardup_dropped": int(n_neardup_dropped),
               "line_corrections": line_corrections,
               "linefix_dropped": int(n_linefix_dropped),
               "lines_removed": int(n_lines_removed)})
    shim.publish_snapshot(curation_root(work_dir), out_sid)

    stats = (shim.read_snapshot(spark, curation_root(work_dir), out_sid)
             .agg(F.count("*").alias("docs"),
                  F.sum("n_paras").alias("paras_total"),
                  F.sum("n_kept").alias("paras_kept"),
                  F.sum(F.col("keep").cast("long")).alias("docs_kept"),
                  F.sum((F.col("drop_reason") == "quality").cast("long"))
                  .alias("dropped_quality"),
                  F.sum((F.col("drop_reason") == "repetition").cast("long"))
                  .alias("dropped_repetition"),
                  F.sum((F.col("drop_reason") == "line_format")
                        .cast("long")).alias("dropped_line_format"),
                  F.countDistinct("shard_id").alias("shards"))
             .collect()[0])
    metrics = spark.createDataFrame(
        [(run_id, out_sid, int(stats.docs), int(stats.paras_total),
          int(stats.paras_kept), int(stats.docs_kept),
          int(stats.dropped_quality), int(stats.dropped_repetition),
          int(stats.dropped_line_format), int(stats.shards))],
        "run_id string, snapshot string, docs long, paras_total long, "
        "paras_kept long, docs_kept long, dropped_quality long, "
        "dropped_repetition long, dropped_line_format long, shards long")
    metrics.coalesce(1).write.mode("append").parquet(
        os.path.join(work_dir, "curation_metrics"))

    return {"run_id": run_id, "snapshot": out_sid, "dedup": dedup,
            "neardup_dropped": int(n_neardup_dropped),
            "linefix_dropped": int(n_linefix_dropped),
            "lines_removed": int(n_lines_removed),
            "input_snapshots": input_sids,
            "docs": int(stats.docs), "docs_kept": int(stats.docs_kept),
            "paras_removed": int(stats.paras_total - stats.paras_kept),
            "dropped_quality": int(stats.dropped_quality),
            "dropped_repetition": int(stats.dropped_repetition),
            "dropped_line_format": int(stats.dropped_line_format),
            "shards": int(stats.shards)}


def export_root(work_dir: str) -> str:
    return os.path.join(work_dir, "export")


def run_export_job(spark: SparkSession, work_dir: str, *,
                   snapshot: str | None = None) -> dict:
    """Training-data export stage — the pipeline's end product: the
    KEPT, shard-packed curation output written as one parquet dataset
    partitioned by shard_id, plus a per-shard manifest row (doc count,
    token sum, order-pinned content digest over the per-doc text
    digests in url order).

    The manifest is the reproducibility contract: re-exporting the
    same curated snapshot must reproduce every digest bit-for-bit on
    any cluster size (sort_array pins the order collect_list leaves
    unspecified), and a consumer can verify a downloaded shard against
    its manifest row without trusting the transport —
    ``verify_export`` below is exactly that check, run from the
    published data. Atomic via the same two-phase prepare/publish as
    the other stages; the manifest rides INSIDE the snapshot manifest
    json (small: one entry per shard), so data + digests commit
    together or not at all.

    Scale shape: one groupBy(shard_id) for the manifest (groups are
    token-budget-bounded by construction) and a partitionBy(shard_id)
    write fed by one repartition on the same key — each shard lands as
    one file, no small-files explosion, no second shuffle."""
    run_id = uuid.uuid4().hex[:12]
    cur_root = curation_root(work_dir)
    sid = snapshot or shim.current_snapshot_id(cur_root)
    if sid is None:
        raise FileNotFoundError(f"no curated snapshot under {cur_root}")
    kept = (shim.read_snapshot(spark, cur_root, sid)
            .filter(F.col("keep") & F.col("shard_id").isNotNull())
            .select("url", "text_deduped", "n_words", "shard_id"))
    manifest_rows = shard_digest_rows(kept, ["url"]).collect()
    shard_manifest = _manifest_dict(manifest_rows)
    out_sid = shim.prepare_snapshot(
        kept.repartition("shard_id"), export_root(work_dir),
        partition_by=["shard_id"],
        snapshot_id=f"exp-{run_id}", parent_id=None,
        extra={"exported_from": sid, "shards": shard_manifest})
    shim.publish_snapshot(export_root(work_dir), out_sid)
    return {"run_id": run_id, "snapshot": out_sid, "exported_from": sid,
            "shards": len(shard_manifest),
            "docs": sum(m["n_docs"] for m in shard_manifest.values()),
            "tokens": sum(m["n_tokens"] for m in shard_manifest.values())}


def shard_digest_rows(df: DataFrame, key_cols: list[str],
                      text_col: str = "text_deduped") -> DataFrame:
    """Per-shard manifest rows (n_docs, n_tokens, content_digest) —
    the ONE digest definition shared by the export, sampling, and SFT
    producers and by consumer-side verification, so a digest mismatch
    can only ever mean the data changed, never that two stages
    digested differently. ``key_cols`` pins the within-shard order
    (export: url; sampling: url + copy_idx — two copies of one doc
    are distinct manifest entries); ``text_col`` names the payload
    column (export/sampling: text_deduped; SFT: the rendered
    example)."""
    return (df.withColumn("dg", F.md5(text_col))
            .groupBy("shard_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_words").alias("n_tokens"),
                 F.md5(F.concat_ws(",", F.transform(
                     F.sort_array(
                         F.collect_list(F.struct(*key_cols, "dg"))),
                     lambda s: s["dg"]))).alias("content_digest"),
                 # zone map: the url key range this shard covers, so a
                 # consumer can prune shards from the manifest alone
                 # (prune_export_shards) without scanning any data
                 F.min("url").alias("min_url"),
                 F.max("url").alias("max_url")))


def _manifest_dict(rows) -> dict:
    """Manifest-row dict shared by every producer AND the verifier —
    one definition so a verify mismatch can only mean the data
    changed, never that two stages serialized different fields."""
    return {r.shard_id: {"n_docs": r.n_docs,
                         "n_tokens": int(r.n_tokens),
                         "content_digest": r.content_digest,
                         "min_url": r.min_url,
                         "max_url": r.max_url}
            for r in rows}


def prune_export_shards(work_dir: str, lo: str, hi: str, *,
                        snapshot: str | None = None) -> list:
    """Zone-map shard pruning — plan which export shards a url-range
    predicate ``lo <= url <= hi`` can possibly touch, FROM THE
    MANIFEST ALONE: no Spark job, no file listing, no data scan. A
    shard survives iff its [min_url, max_url] zone intersects the
    query range; everything else is provably empty for the predicate
    and is never read (the parquet row-group min/max idea lifted to
    the shard level, where it also skips whole-file network fetches).
    The returned ids feed a ``shard_id IN (...)`` filter, which Spark
    turns into partition pruning over the shard_id-partitioned layout
    — tests pin that the pruned read equals the full-scan filter
    row-for-row while touching strictly fewer shards."""
    root = export_root(work_dir)
    sid = snapshot or shim.current_snapshot_id(root)
    if sid is None:
        raise FileNotFoundError(f"no export snapshot under {root}")
    shards = shim.read_manifest(root, sid).get("shards") or {}
    return sorted(
        shard for shard, m in shards.items()
        if not (m["max_url"] < lo or m["min_url"] > hi))


def _verify_shards(spark: SparkSession, root: str, sid: str,
                   key_cols: list[str],
                   text_col: str = "text_deduped") -> dict:
    manifest = shim.read_manifest(root, sid)
    expected = manifest.get("shards") or {}
    actual_rows = shard_digest_rows(
        shim.read_snapshot(spark, root, sid), key_cols,
        text_col=text_col).collect()
    actual = _manifest_dict(actual_rows)
    mismatches: dict = {}
    for shard in set(expected) | set(actual):
        if shard not in expected:
            mismatches[shard] = "not in manifest"
        elif shard not in actual:
            mismatches[shard] = "missing from data"
        elif expected[shard] != actual[shard]:
            mismatches[shard] = (f"manifest {expected[shard]}"
                                 f" != data {actual[shard]}")
    return {"snapshot": sid, "shards_checked": len(expected),
            "mismatches": mismatches}


def verify_export(spark: SparkSession, work_dir: str,
                  snapshot: str | None = None) -> dict:
    """Consumer-side shard verification: recompute every shard's doc
    count, token sum, and content digest FROM THE PUBLISHED DATA and
    diff against the manifest committed with the snapshot. Returns
    {"snapshot", "shards_checked", "mismatches": {shard_id: reason}} —
    an empty mismatches dict is the integrity proof."""
    root = export_root(work_dir)
    sid = snapshot or shim.current_snapshot_id(root)
    if sid is None:
        raise FileNotFoundError(f"no export snapshot under {root}")
    return _verify_shards(spark, root, sid, ["url"])


def verify_sampling(spark: SparkSession, work_dir: str,
                    snapshot: str | None = None) -> dict:
    """verify_export's twin for the mixture-sampled corpus: same
    digest definition, (url, copy_idx) order keys because realized
    copies are distinct rows."""
    root = sampling_root(work_dir)
    sid = snapshot or shim.current_snapshot_id(root)
    if sid is None:
        raise FileNotFoundError(f"no sampling snapshot under {root}")
    return _verify_shards(spark, root, sid, ["url", "copy_idx"])


def sft_root(work_dir: str) -> str:
    return os.path.join(work_dir, "sft")


def run_sft_job(spark: SparkSession, work_dir: str, *,
                examples_per_shard: int = 200,
                snapshot: str | None = None) -> dict:
    """SFT-export stage — the instruction-tuning end product beside
    run_export_job's pretraining shards: render every KEPT curated
    document into a chat-template example with its loss-mask span
    (the SAME kernel as the oracle-checked docs_sft_format, keyed by
    url — plans/curation.py::sft_format_frame, so the pipeline
    artifact and the correctness gate render identically by
    construction), shard the examples, and commit them atomically
    with the standard per-shard content-digest manifest over the
    RENDERED bytes (the artifact a trainer consumes and must be able
    to verify).

    Shard assignment is a deterministic md5-hash bucket over url with
    the bucket count sized from the example count (ceil(n / target)) —
    no global sort window, so assignment parallelizes at any corpus
    size and re-runs land every example in the same shard; per-shard
    counts are binomial around the target and the manifest records
    actuals. n_tokens in the manifest counts RESPONSE whitespace
    tokens (the loss-bearing tokens — what an SFT run budgets by).

    Scale shape: render is the kernel's zero-shuffle narrow map; one
    1-row count broadcast; one repartition on shard_id feeding the
    partitioned write; one groupBy(shard_id) for the manifest."""
    run_id = uuid.uuid4().hex[:12]
    from ocr_spark.plans.curation import sft_format_frame

    cur_root = curation_root(work_dir)
    sid = snapshot or shim.current_snapshot_id(cur_root)
    if sid is None:
        raise FileNotFoundError(f"no curation snapshot under {cur_root}")
    kept = (shim.read_snapshot(spark, cur_root, sid)
            .filter(F.col("keep"))
            .select("url", F.col("text_deduped").alias("text")))
    rendered = sft_format_frame(kept, "url")
    n = rendered.count()
    n_shards = max(1, -(-n // examples_per_shard))
    resp_toks = F.size(F.split(F.trim("response"), r"\s+"))
    examples = rendered.select(
        "url", "rendered", "prompt_chars", "response_chars",
        "truncated", "loss_start", "loss_end",
        resp_toks.cast("long").alias("n_words"),
        F.format_string(
            "sft-%05d",
            (F.conv(F.substring(F.md5("url"), 1, 13), 16, 10)
             .cast("long") % n_shards).cast("int")).alias("shard_id"))
    manifest_rows = shard_digest_rows(
        examples, ["url"], text_col="rendered").collect()
    shard_manifest = _manifest_dict(manifest_rows)
    out_sid = shim.prepare_snapshot(
        examples.repartition("shard_id"), sft_root(work_dir),
        partition_by=["shard_id"],
        snapshot_id=f"sft-{run_id}", parent_id=None,
        extra={"rendered_from": sid,
               "examples_per_shard_target": examples_per_shard,
               "shards": shard_manifest})
    shim.publish_snapshot(sft_root(work_dir), out_sid)
    return {"run_id": run_id, "snapshot": out_sid,
            "rendered_from": sid, "shards": len(shard_manifest),
            "examples": n,
            "response_tokens": sum(m["n_tokens"]
                                   for m in shard_manifest.values())}


def verify_sft(spark: SparkSession, work_dir: str,
               snapshot: str | None = None) -> dict:
    """verify_export's twin for the SFT corpus: identical digest
    definition over the RENDERED example bytes."""
    root = sft_root(work_dir)
    sid = snapshot or shim.current_snapshot_id(root)
    if sid is None:
        raise FileNotFoundError(f"no sft snapshot under {root}")
    return _verify_shards(spark, root, sid, ["url"],
                          text_col="rendered")


def index_root(work_dir: str) -> str:
    return os.path.join(work_dir, "ann_index")


def run_index_job(spark: SparkSession, work_dir: str,
                  sf_dir: str) -> dict:
    """ANN index BUILD stage — the build/serve separation a 100 TB
    vector deployment actually runs: train the coarse quantizer once
    (the oracle-checked Lloyd loop of emb_kmeans_train), assign every
    corpus vector to its cell, PQ-encode it, and COMMIT the index —
    centroids + a posting table of (vec_id, cell, nrm, codes) — as an
    atomic snapshot with a content digest in the manifest. Queries
    then run against the committed index (``ivf_topk_from_index``)
    without re-deriving the quantizer, and only shortlist survivors
    gather their full vectors from the source table by vec_id.

    The posting row is the storage tier: cell id + norm + PQ code
    string per vector, NOT the vector itself — the float table stays
    wherever it lives and is touched only by the re-rank gather.

    Scale shape: the build is emb_kmeans_train's audited iterative
    shape plus one narrow encode map; the commit is one snapshot
    write partitioned by cell (probes prune to probed cells at read
    time — partition pruning is the IVF inverted list)."""
    from ocr_spark.plans.simsearch import (
        _kmeans, _norm, _pq_code_arr)

    run_id = uuid.uuid4().hex[:12]
    cent, assigned = _kmeans(spark, sf_dir)
    postings = assigned.select(
        "vec_id", "cell",
        F.round(_norm(F.col("v")), 6).alias("nrm"),
        F.array_join(F.transform(_pq_code_arr(F.col("v")),
                                 lambda c: c.cast("string")), ",")
         .alias("codes"))
    cent_rows = (cent.select("cell", F.posexplode("cv")
                             .alias("pos", "cv_val")))
    digest = postings.agg(F.md5(F.concat_ws("|", F.sort_array(
        F.collect_list(F.concat_ws(":", "vec_id", "cell", "codes"))))
    ).alias("d")).collect()[0]["d"]
    root = index_root(work_dir)
    csid = shim.prepare_snapshot(
        cent_rows.coalesce(1), os.path.join(root, "centroids"),
        snapshot_id=f"idxc-{run_id}", extra={"indexed_from": sf_dir})
    shim.publish_snapshot(os.path.join(root, "centroids"), csid)
    psid = shim.prepare_snapshot(
        postings.repartition("cell"), os.path.join(root, "postings"),
        partition_by=["cell"],
        snapshot_id=f"idxp-{run_id}",
        extra={"indexed_from": sf_dir, "content_digest": digest,
               "centroids_snapshot": csid})
    shim.publish_snapshot(os.path.join(root, "postings"), psid)
    return {"run_id": run_id, "centroids_snapshot": csid,
            "postings_snapshot": psid, "content_digest": digest}


def verify_index(spark: SparkSession, work_dir: str) -> dict:
    """Consumer-side index verification: recompute the posting-table
    digest from the published data and diff against the manifest."""
    root = os.path.join(index_root(work_dir), "postings")
    sid = shim.current_snapshot_id(root)
    if sid is None:
        raise FileNotFoundError(f"no index snapshot under {root}")
    manifest = shim.read_manifest(root, sid)
    got = shim.read_snapshot(spark, root, sid).agg(F.md5(F.concat_ws(
        "|", F.sort_array(F.collect_list(F.concat_ws(
            ":", "vec_id", "cell", "codes"))))).alias("d")) \
        .collect()[0]["d"]
    ok = got == manifest.get("content_digest")
    return {"snapshot": sid, "ok": ok,
            "expected": manifest.get("content_digest"), "actual": got}


def ivf_topk_from_index(spark: SparkSession, work_dir: str,
                        sf_dir: str) -> DataFrame:
    """SERVE path over the committed index: queries assign to their
    nearest committed centroid (broadcast K-row array — never
    retrained), probe = cell equi-join against the posting table
    (partition-pruned to probed cells), survivors gather full vectors
    from the SOURCE table by vec_id for the exact re-rank. Output
    contract is identical to the in-plan emb_ivf_trained_topk —
    pinned row-for-row in tests, which is the proof that build/serve
    separation loses nothing."""
    from pyspark.sql.window import Window

    from ocr_spark.plans.simsearch import (
        IVF_TOPK, N_QUERIES, _dot, _km_argmin, _norm, _vecd, t as emb_t)

    root = index_root(work_dir)
    croot, proot = os.path.join(root, "centroids"), \
        os.path.join(root, "postings")
    cent_rows = shim.read_snapshot(spark, croot,
                                   shim.current_snapshot_id(croot))
    postings = shim.read_snapshot(spark, proot,
                                  shim.current_snapshot_id(proot)) \
        .select("vec_id", "cell")
    cent = (cent_rows.groupBy("cell")
            .agg(F.transform(F.array_sort(F.collect_list(
                F.struct("pos", "cv_val"))), lambda s: s.cv_val)
                .alias("cv")))
    centrow = cent.agg(F.array_sort(
        F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    src = emb_t(spark, sf_dir).select("vec_id", _vecd().alias("v")) \
        .withColumn("nrm", _norm(F.col("v")))
    q = (src.filter(F.col("vec_id") < N_QUERIES)
         .crossJoin(F.broadcast(centrow))
         .select(F.col("vec_id").alias("q_id"),
                 F.col("v").alias("qv"), F.col("nrm").alias("qn"),
                 _km_argmin(F.col("v"), F.col("cents")).alias("q_cell")))
    cand = postings.join(F.broadcast(q),
                         (F.col("cell") == F.col("q_cell"))
                         & (F.col("vec_id") != F.col("q_id")))
    gathered = cand.join(src, "vec_id")
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = gathered.select("q_id", "cell",
                             F.col("vec_id").alias("neighbor_id"),
                             F.round(cos, 6).alias("cos6"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos6"),
                                           F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= IVF_TOPK)
            .select("q_id", "cell", "neighbor_id",
                    F.round("cos6", 4).alias("cos_sim"), "rank"))


def verify_all(spark: SparkSession, work_dir: str) -> dict:
    """One consumer-side integrity call over every published shard
    stage: verifies the export snapshot and, when the sampling or SFT
    stages have run, those corpora too. ``ok`` is True iff every
    present stage verifies clean; stages that never ran are reported
    absent, not failed."""
    out: dict = {"stages": {}, "ok": True}
    for name, fn in (("export", verify_export),
                     ("sampling", verify_sampling),
                     ("sft", verify_sft),
                     ("labeling", verify_labeling_all)):
        try:
            res = fn(spark, work_dir)
        except FileNotFoundError:
            out["stages"][name] = {"present": False}
            continue
        res["present"] = True
        out["stages"][name] = res
        if res["mismatches"]:
            out["ok"] = False
    return out


def sampling_root(work_dir: str) -> str:
    return os.path.join(work_dir, "sampled")


def run_sampling_job(spark: SparkSession, work_dir: str, *,
                     shard_token_budget: int = 2000,
                     snapshot: str | None = None) -> dict:
    """Mixture-sampling stage between curation and the trainer — the
    pipeline form of the oracle-checked docs_mixture_realize /
    docs_training_set composition: language-ID the KEPT curated text
    (the production order — CCNet detects language downstream of
    extraction, using the SAME kernel as the oracle-checked
    docs_langid via plans/dataops.py::langid_hit_cols), derive each
    language's temperature-mixture effective epochs, give every
    document floor(e) guaranteed copies plus a deterministic
    md5-hash-selected fractional copy, explode the copies, and RE-pack
    them into token-budget shards ((url, copy_idx) in the pack key so
    two copies of one document land in independent shards). Committed
    atomically with an export-style per-shard content-digest manifest,
    so the sampled corpus is consumer-verifiable and bit-reproducible.

    Scale shape: langid + copy realization are narrow maps over the
    kept set; the mixture table is |langs| rows (broadcast); the only
    exchanges are the per-language token-total partial agg and the
    per-stratum packing window (16 parallel streams, same as the
    curation packer)."""
    from pyspark.sql.window import Window

    from ocr_spark.plans.curation import MIXTURE_ALPHA, _EPOCH_SCALE
    from ocr_spark.plans.dataops import langid_hit_cols, langid_pred_col

    run_id = uuid.uuid4().hex[:12]
    cur_root = curation_root(work_dir)
    sid = snapshot or shim.current_snapshot_id(cur_root)
    if sid is None:
        raise FileNotFoundError(f"no curation snapshot under {cur_root}")
    kept = (shim.read_snapshot(spark, cur_root, sid)
            .filter(F.col("keep"))
            .select("url", "text_deduped", "n_words"))

    toks = F.split(F.lower(F.trim(F.col("text_deduped"))), r"\s+")
    with_lang = kept.select(
        "url", "text_deduped", "n_words", *langid_hit_cols(toks)
    ).withColumn("lang", langid_pred_col()) \
     .select("url", "text_deduped", "n_words", "lang")

    per = with_lang.groupBy("lang").agg(F.sum("n_words").alias("n_tokens"))
    tot = per.agg(F.sum("n_tokens").alias("tot_tokens"),
                  F.sum(F.pow("n_tokens", MIXTURE_ALPHA)).alias("z"))
    e = (F.pow("n_tokens", MIXTURE_ALPHA) / F.col("z")
         * F.col("tot_tokens") / F.col("n_tokens"))
    mix = (per.crossJoin(F.broadcast(tot))
           .select("lang", F.round(e * _EPOCH_SCALE).cast("long")
                   .alias("e_micro")))
    h = (F.conv(F.substring(F.md5(F.concat(F.lit("mix:"), F.col("url"))),
                            1, 8), 16, 10).cast("long") % _EPOCH_SCALE)
    extra = (h < F.col("e_micro") % _EPOCH_SCALE).cast("long")
    copies = (with_lang.join(F.broadcast(mix), "lang")
              .withColumn("n_copies",
                          (F.floor(F.col("e_micro") / _EPOCH_SCALE)
                           + extra).cast("long"))
              .filter(F.col("n_copies") > 0)
              .select("url", "lang", "text_deduped", "n_words",
                      F.explode(F.sequence(
                          F.lit(1), F.col("n_copies"))).alias("copy_idx")))

    stratum = F.substring(
        F.md5(F.concat("url", F.lit(":"), F.col("copy_idx").cast("string"))),
        1, 1)
    w_pack = (Window.partitionBy("stratum").orderBy("url", "copy_idx")
              .rowsBetween(Window.unboundedPreceding, -1))
    prefix = F.coalesce(F.sum("n_words").over(w_pack), F.lit(0))
    packed = (copies.withColumn("stratum", stratum)
              .withColumn("shard_id",
                          F.concat_ws("-", "stratum",
                                      F.floor(prefix / shard_token_budget)
                                      .cast("string"))))

    manifest_rows = shard_digest_rows(
        packed, ["url", "copy_idx"]).collect()
    shard_manifest = _manifest_dict(manifest_rows)
    out = packed.select("url", "copy_idx", "lang", "text_deduped",
                        "n_words", "shard_id")
    out_sid = shim.prepare_snapshot(
        out.repartition("shard_id"), sampling_root(work_dir),
        partition_by=["shard_id"],
        snapshot_id=f"smp-{run_id}", parent_id=None,
        extra={"sampled_from": sid, "alpha": MIXTURE_ALPHA,
               "shards": shard_manifest})
    shim.publish_snapshot(sampling_root(work_dir), out_sid)
    docs_in = with_lang.count()
    rows_out = sum(m["n_docs"] for m in shard_manifest.values())
    return {"run_id": run_id, "snapshot": out_sid, "sampled_from": sid,
            "kept_docs": int(docs_in), "sampled_rows": int(rows_out),
            "shards": len(shard_manifest),
            "tokens": sum(m["n_tokens"] for m in shard_manifest.values())}


def read_extracted(spark: SparkSession, work_dir: str) -> DataFrame:
    """All committed extraction output across snapshots. The union is
    exact: within one input snapshot, checkpointed buckets are never
    reprocessed (two-phase commit); across input snapshots, both the
    full-chain and incremental paths process each input snapshot's own
    data dir keyed on its own sid, so their documents are disjoint by
    construction."""
    root = output_root(work_dir)
    sids = shim.history(root) if shim.current_snapshot_id(root) else []
    if not sids:
        raise FileNotFoundError(
            f"no extraction output committed yet under {root}")
    dirs = [shim.read_manifest(root, sid)["data_dir"] for sid in sids]
    # each snapshot dir is its own partitioned table root (bucket=N leaves);
    # PUBLISHED snapshots hold disjoint buckets (two-phase commit: a
    # bucket is only checkpointed together with its snapshot, and only
    # checkpointed buckets are skipped), so a union is exact.
    # ONE multi-path scan (recursiveFileLookup skips per-dir partition
    # discovery, which rejects the snap-X level between root and
    # bucket=N): the plan stays a single scan node after thousands of
    # incremental commits, instead of a union chain that grows per
    # snapshot. The bucket partition column is recovered from the file
    # path — exact for any n_buckets.
    from ocr_spark.operators.extraction import EXTRACT_RESULT_SCHEMA
    from pyspark.sql.types import StructType
    data_schema = StructType(
        [f for f in EXTRACT_RESULT_SCHEMA if f.name != "bucket"])
    out = (spark.read.schema(data_schema)
           .option("recursiveFileLookup", "true").parquet(*dirs)
           .withColumn("bucket",
                       F.regexp_extract(F.input_file_name(),
                                        r"bucket=(\d+)", 1).cast("int")))
    return out.select(*[f.name for f in EXTRACT_RESULT_SCHEMA])


class ValidationError(RuntimeError):
    """Raised by run_validation_job(gate=True) when a constraint fails."""


VALIDATION_MAX_ERROR_FRAC = 0.05


def validation_root(work_dir: str) -> str:
    return os.path.join(work_dir, "validation")


def constraint_suite(out: DataFrame,
                     max_error_frac: float = VALIDATION_MAX_ERROR_FRAC,
                     ) -> list[tuple[str, int, int]]:
    """The Deequ-style shared-scan constraint suite over an extraction
    output frame: ONE aggregate pass, one driver row, returns
    [(constraint, checked, violations)]. Shared by the batch
    validation job below AND the streaming per-micro-batch gate
    (streaming/ingest.py validation_gate_sink), so a batch failing
    the streaming gate is EXACTLY a table the batch gate would block
    — one suite, two triggers."""
    ok = F.col("error").isNull()
    row = out.agg(
        F.count(F.lit(1)).alias("checked"),
        F.count_distinct(F.col("url")).alias("n_urls"),
        F.sum((F.col("url").isNull() | (F.length("url") == 0))
              .cast("long")).alias("url_bad"),
        F.sum((ok & (F.col("text").isNull() | (F.length("text") == 0)))
              .cast("long")).alias("text_missing"),
        F.sum((ok & (F.col("n_blocks").isNull() | (F.col("n_blocks") <= 0)))
              .cast("long")).alias("blocks_bad"),
        F.sum((F.col("bytes_in").isNull() | (F.col("bytes_in") <= 0))
              .cast("long")).alias("bytes_bad"),
        F.sum((~ok).cast("long")).alias("n_errors"),
    ).collect()[0]
    checked = row["checked"] or 0
    n_success = checked - (row["n_errors"] or 0)
    err_over = ((row["n_errors"] or 0)
                if (row["n_errors"] or 0) > max_error_frac * checked
                else 0)
    return [
        ("url_complete", checked, row["url_bad"] or 0),
        ("url_unique", checked, checked - (row["n_urls"] or 0)),
        ("text_present_on_success", n_success, row["text_missing"] or 0),
        ("blocks_positive_on_success", n_success, row["blocks_bad"] or 0),
        ("bytes_in_positive", checked, row["bytes_bad"] or 0),
        ("error_rate_bounded", checked, err_over),
    ]


def run_validation_job(spark: SparkSession, work_dir: str, *,
                       max_error_frac: float = VALIDATION_MAX_ERROR_FRAC,
                       gate: bool = False) -> dict:
    """Deequ-style pre-promote validation gate over the committed
    extraction output (Schelter et al., VLDB 2018 — run the constraint
    suite BEFORE downstream stages consume a snapshot; the query-side
    twin over the driver's documents table is
    plans/curation.py::docs_quality_constraints).

    Constraints (each a completeness / uniqueness / consistency /
    rate predicate over the full committed table):

      * ``url_complete``              — url never null/empty
      * ``url_unique``                — the idempotency invariant: the
        two-phase bucket commit must make re-runs exact, so ANY
        duplicate url in the committed union is a pipeline bug
      * ``text_present_on_success``   — error-free rows carry text
      * ``blocks_positive_on_success``— error-free rows have ≥1 block
      * ``bytes_in_positive``         — input accounting sane
      * ``error_rate_bounded``        — failed-row fraction ≤
        ``max_error_frac`` (violations reported only past the bound)

    ALL constraints evaluate in ONE scan as conditional partial
    aggregates (the Deequ shared-scan design); the only driver-side
    data is the single aggregate row. The per-constraint report is
    committed under ``validation/run=<id>/`` so lineage keeps every
    gate decision; ``gate=True`` raises ValidationError on any failure
    — the mode a scheduled pipeline runs between extract and
    curate/export."""
    out = read_extracted(spark, work_dir)
    constraints = constraint_suite(out, max_error_frac)
    checked = constraints[0][1]  # url_complete checks every row
    run_id = uuid.uuid4().hex[:12]
    report = spark.createDataFrame(
        [(run_id, name, int(n), int(v), v == 0)
         for name, n, v in constraints],
        "run_id string, constraint string, checked long, "
        "violations long, passed boolean")
    dest = os.path.join(validation_root(work_dir), f"run={run_id}")
    report.coalesce(1).write.mode("overwrite").parquet(dest)
    failed = {name: int(v) for name, _n, v in constraints if v}
    result = {"run_id": run_id, "checked": int(checked),
              "passed": not failed, "failed": failed,
              "report_path": dest}
    if gate and failed:
        raise ValidationError(
            f"extraction output failed validation: {failed} "
            f"(report at {dest})")
    return result


def eval_root(work_dir: str) -> str:
    return os.path.join(work_dir, "eval_metrics")


def run_eval_job(spark: SparkSession, work_dir: str,
                 gold: DataFrame) -> dict:
    """Extraction-quality regression gate: score the committed
    extraction output against a gold-labeled eval set (url, text) with
    the token-multiset P/R/F1 kernel (plans/extract_queries.py::
    token_prf — the oracle-checked extract_eval_tokenf1 scoring), and
    append per-doc rows plus one run-level summary row to the job's
    eval metrics tables. Run after every extractor change: macro-F1 /
    min-F1 drops are the regression alarm the byte-identity goldens
    can't give you on pages whose gold is NOT a fixture.

    A gold url the extraction dropped or errored still gets a per-doc
    row (n_pred = 0, null precision/F1) and is counted in
    ``n_unextracted`` — silent extraction loss on the eval set is the
    failure mode this stage exists to surface.

    Scale shape: the eval set is small by construction (gold labels
    are hand-made), so its url list broadcasts to restrict the
    extraction scan, and the token-level full-outer join shuffles only
    eval-set token volume."""
    from ocr_spark.plans.extract_queries import token_prf

    run_id = uuid.uuid4().hex[:12]
    gold = gold.select("url", "text")
    pred = (read_extracted(spark, work_dir)
            .filter(F.col("error").isNull() & F.col("text").isNotNull())
            .select("url", "text")
            .join(F.broadcast(gold.select("url")), "url"))
    per_doc = token_prf(gold, pred).withColumn("run_id", F.lit(run_id))
    per_doc.coalesce(1).write.mode("append").parquet(
        os.path.join(eval_root(work_dir), "per_doc"))
    row = per_doc.agg(
        F.count("*").alias("n_gold"),
        F.count("token_f1").alias("n_scored"),
        F.sum((F.col("n_pred") == 0).cast("long")).alias("n_unextracted"),
        F.avg("token_f1").alias("macro_f1"),
        F.min("token_f1").alias("min_f1"),
        F.avg((F.col("token_recall") == 1.0).cast("double"))
         .alias("full_recall_frac"),
    ).collect()[0]
    summary = {"run_id": run_id, **row.asDict()}
    spark.createDataFrame([summary]).coalesce(1).write.mode(
        "append").parquet(os.path.join(eval_root(work_dir), "summary"))
    return summary


def stats_root(work_dir: str) -> str:
    return os.path.join(work_dir, "stats")


def _snapshot_texts(spark: SparkSession, work_dir: str,
                    sid: str) -> DataFrame:
    """Extracted text of ONE committed extraction snapshot's own rows
    (snapshot dirs are disjoint by the two-phase bucket commit, so
    per-snapshot sketch frames tile the corpus with no overlap)."""
    from pyspark.sql.types import StructType

    from ocr_spark.operators.extraction import EXTRACT_RESULT_SCHEMA
    data_schema = StructType(
        [f for f in EXTRACT_RESULT_SCHEMA if f.name != "bucket"])
    d = shim.read_manifest(output_root(work_dir), sid)["data_dir"]
    return (spark.read.schema(data_schema)
            .option("recursiveFileLookup", "true").parquet(d)
            .filter(F.col("error").isNull() & F.col("text").isNotNull())
            .select("text"))


def _sketch_long_frame(texts: DataFrame) -> DataFrame:
    """(kind, k1, k2, v): the three mergeable sketch frames of a text
    slice in one long-form table — HLL registers (combine = max v),
    CMS counters (combine = sum v), KMV bottom-k hashes (combine =
    bottom-k of the k1 union). One schema so a stats snapshot is one
    dataset; each frame is bounded (≤256 / ≤1024 / ≤KMV_K rows)."""
    from ocr_spark.plans.sketches import (
        KMV_K, _cms_frame, _kmv_frame, _register_frame, _tok_col,
    )

    occ = texts.select(_tok_col())
    hll = _register_frame(texts).select(
        F.lit("hll").alias("kind"), F.col("reg").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("m_reg").cast("long").alias("v"))
    cms = _cms_frame(occ).select(
        F.lit("cms").alias("kind"), F.col("r").cast("string").alias("k1"),
        F.col("b").alias("k2"), F.col("counter").alias("v"))
    kmv = _kmv_frame(occ, KMV_K).select(
        F.lit("kmv").alias("kind"), F.col("h").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.lit(None).cast("long").alias("v"))
    return hll.unionByName(cms).unionByName(kmv)


def run_stats_job(spark: SparkSession, work_dir: str) -> dict:
    """Corpus-statistics stage: persist the mergeable sketch frames
    per EXTRACTION SNAPSHOT as committed stats snapshots — the
    write-path half of the sketch family (the query half lives in
    plans/sketches.py, where every combine algebra is oracle-pinned
    and property-tested). Each run covers exactly the extraction
    snapshots no stats snapshot records yet (lineage: ``stats_for``
    in the manifest), so the stage is incremental and idempotent:
    corpus-stat reporting over a growing crawl folds the ≤~1300-row
    frames (combined_sketches below) and never rescans history —
    the delta-job shape docs_{hll,cms}_snapshot_merge pin.

    Scale shape per new snapshot: one narrow tokenize feeding three
    bounded aggregates (each executor emits ≤256 / ≤1024 / ≤KMV_K
    partial rows) — no data-volume shuffle at any input size."""
    run_id = uuid.uuid4().hex[:12]
    sroot = stats_root(work_dir)
    done = set()
    if shim.current_snapshot_id(sroot):
        for s in shim.history(sroot):
            done.add(shim.read_manifest(sroot, s).get("stats_for"))
    root = output_root(work_dir)
    sids = shim.history(root) if shim.current_snapshot_id(root) else []
    if not sids:
        raise FileNotFoundError(
            f"no extraction output committed yet under {root}")
    new = [sid for sid in sids if sid not in done]
    committed = []
    for sid in new:
        frame = _sketch_long_frame(_snapshot_texts(spark, work_dir, sid))
        # parent_id="auto" chains onto the current stats snapshot so
        # history() reaches every committed frame
        out_sid = shim.prepare_snapshot(
            frame.coalesce(1), sroot,
            snapshot_id=f"stats-{run_id}-{sid}",
            extra={"stats_for": sid})
        shim.publish_snapshot(sroot, out_sid)
        committed.append(out_sid)
    return {"run_id": run_id, "snapshots": committed,
            "covered": sorted(done - {None}) + new, "skipped": len(done)}


def combined_sketches(spark: SparkSession,
                      work_dir: str) -> dict[str, DataFrame]:
    """Fold every committed stats snapshot into the corpus-level
    sketches WITHOUT touching document text: HLL registers by
    elementwise max, CMS counters by elementwise add, KMV by bottom-k
    of the hash union — each a bounded aggregate over n_snapshots ×
    ≤~1300 stored rows."""
    from ocr_spark.plans.sketches import KMV_K

    sroot = stats_root(work_dir)
    sids = shim.history(sroot) if shim.current_snapshot_id(sroot) else []
    if not sids:
        raise FileNotFoundError(f"no stats snapshots under {sroot}")
    dirs = [shim.read_manifest(sroot, s)["data_dir"] for s in sids]
    allf = spark.read.parquet(*dirs)
    return {
        "hll": (allf.filter(F.col("kind") == "hll")
                .groupBy(F.col("k1").alias("reg"))
                .agg(F.max("v").alias("m_reg"))),
        "cms": (allf.filter(F.col("kind") == "cms")
                .groupBy(F.col("k1").cast("int").alias("r"),
                         F.col("k2").alias("b"))
                .agg(F.sum("v").alias("counter"))),
        "kmv": (allf.filter(F.col("kind") == "kmv")
                .select(F.col("k1").alias("h")).distinct()
                .orderBy("h").limit(KMV_K)),
    }


def verify_stats(spark: SparkSession, work_dir: str) -> dict:
    """Consumer-side check of the stats store: the folded sketches
    must equal the from-scratch frames over ALL extracted text — the
    merge-exactness the sketch queries pin per algebra, here asserted
    over the actually-published artifacts. Returns per-sketch mismatch
    counts (all zero on a healthy store)."""
    from ocr_spark.plans.sketches import (
        KMV_K, _cms_frame, _kmv_frame, _register_frame, _tok_col,
    )

    texts = read_extracted(spark, work_dir) \
        .filter(F.col("error").isNull() & F.col("text").isNotNull()) \
        .select("text")
    occ = texts.select(_tok_col())
    folded = combined_sketches(spark, work_dir)

    def n_diff(a: DataFrame, b: DataFrame) -> int:
        return a.exceptAll(b).count() + b.exceptAll(a).count()

    return {
        "hll_mismatches": n_diff(folded["hll"], _register_frame(texts)),
        "cms_mismatches": n_diff(folded["cms"], _cms_frame(occ)),
        "kmv_mismatches": n_diff(folded["kmv"], _kmv_frame(occ, KMV_K)),
    }


def labeling_root(work_dir: str) -> str:
    return os.path.join(work_dir, "labeling")


def _labeling_batch(spark: SparkSession, work_dir: str,
                    k: int) -> tuple[list, dict[str, str]]:
    """Pure batch computation shared by run_labeling_job (which
    commits) and verify_labeling (which must NOT): returns the
    rank-ordered batch rows and the per-language digests."""
    import hashlib

    from pyspark.sql.window import Window

    from ocr_spark.plans.curation import (
        SCORE_ROUND, classifier_score_frame)
    from ocr_spark.plans.dataops import langid_hit_cols, langid_pred_col

    out = (read_extracted(spark, work_dir)
           .filter(F.col("error").isNull() & F.col("text").isNotNull()
                   & (F.length("text") > 0))
           .select("url", "text"))
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    with_lang = out.select(
        "url", "text", *langid_hit_cols(toks)) \
        .withColumn("lang", langid_pred_col()).select("url", "text", "lang")
    # THE classifier score, via the shared recipe (lang is
    # url-functional, so joining it back preserves the ranking)
    scored = (with_lang.select("url", "lang")
              .join(classifier_score_frame(with_lang.select("url", "text")),
                    "url")
              .select("url", "lang", "score")
              .withColumn("margin",
                          F.round(F.abs(F.col("score") - 0.5),
                                  SCORE_ROUND)))
    w = Window.partitionBy("lang").orderBy(F.asc("margin"), F.asc("url"))
    batch = (scored.withColumn("rank_in_lang", F.row_number().over(w))
             .filter(F.col("rank_in_lang") <= k)
             .select("lang", "rank_in_lang", "url", "score", "margin"))
    rows = sorted(batch.collect(),
                  key=lambda r: (r.lang, r.rank_in_lang))
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.url)
    digests = {lang: hashlib.md5("\x1e".join(urls).encode()).hexdigest()
               for lang, urls in sorted(per_lang.items())}
    return rows, digests


def run_labeling_job(spark: SparkSession, work_dir: str, *,
                     batch_per_lang: int | None = None) -> dict:
    """Active-learning annotation-batch stage — the pipeline form of
    the oracle-checked docs_uncertainty_sample: score EVERY committed
    successfully-extracted document with the quality classifier
    (broadcast weight table, the docs_classifier_score recipe; drops
    as well as keeps sit near the boundary, so the batch draws from
    the FULL extraction output, not the kept set), language-ID the
    text with the shared langid kernel, and nominate each language's
    ``batch_per_lang`` smallest-margin documents as the next human
    annotation batch. The batch is committed under
    ``labeling/run=<id>/`` with a per-language content digest (md5
    over the rank-ordered url list), so the annotation vendor's
    received batch is verifiable against lineage and a re-run on the
    same snapshot is bit-reproducible — the same consumer-side
    discipline as the export/sampling manifests.

    Determinism: margins rank the SCORE_ROUND-rounded score (the
    cross-engine convention), ties break on url; the digest is
    derived from the ordered batch, never from partition order.

    Scale shape: the classifier's broadcast-join + per-doc partial
    aggregate (token volume touched once), a langid narrow map, ONE
    lang-keyed top-k window, and a batch of |langs|·K rows — the
    only driver-side data is that bounded batch."""
    from ocr_spark.plans.curation import UNC_SAMPLE_K

    k = batch_per_lang or UNC_SAMPLE_K
    rows, digests = _labeling_batch(spark, work_dir, k)
    run_id = uuid.uuid4().hex[:12]
    report = spark.createDataFrame(
        [(run_id, r.lang, int(r.rank_in_lang), r.url,
          float(r.score), float(r.margin), digests[r.lang])
         for r in rows],
        "run_id string, lang string, rank_in_lang int, url string, "
        "score double, margin double, lang_digest string")
    # two-phase commit, same discipline as export/sampling/sft: stage
    # under a _tmp name (invisible to verify_labeling_all's run=* glob),
    # then os.replace into run=<id> — a crash mid-write leaves only the
    # _tmp dir, never a partial run that a later verify would read
    dest = os.path.join(labeling_root(work_dir), f"run={run_id}")
    tmp = os.path.join(labeling_root(work_dir), f"_tmp_run={run_id}")
    report.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.replace(tmp, dest)  # atomic on POSIX
    per_lang = {r.lang for r in rows}
    return {"run_id": run_id, "batch_path": dest,
            "n_langs": len(per_lang), "n_docs": len(rows),
            "digests": digests}


def verify_labeling(spark: SparkSession, work_dir: str,
                    run_id: str) -> dict:
    """Consumer-side check of a committed annotation batch: re-derive
    the batch from the same committed extraction output and compare
    the per-language digests — any drift (extraction re-run changed
    text, classifier artifact changed, nondeterminism crept into the
    ranking) shows up as a digest mismatch before a vendor labels a
    single stale row."""
    dest = os.path.join(labeling_root(work_dir), f"run={run_id}")
    stored = spark.read.parquet(dest)
    stored_digests = {r.lang: r.lang_digest
                      for r in stored.select("lang", "lang_digest")
                      .distinct().collect()}
    k = stored.agg(F.max("rank_in_lang")).collect()[0][0]
    _, fresh = _labeling_batch(spark, work_dir, int(k))
    mismatches = {lang: (stored_digests.get(lang), d)
                  for lang, d in fresh.items()
                  if stored_digests.get(lang) != d}
    mismatches.update({lang: (d, None)
                       for lang, d in stored_digests.items()
                       if lang not in fresh})
    return {"run_id": run_id, "mismatches": mismatches,
            "ok": not mismatches}


def verify_labeling_all(spark: SparkSession, work_dir: str) -> dict:
    """verify_all-shaped wrapper over every committed annotation
    batch: re-derives each run's batch from the current extraction
    output and aggregates digest mismatches (a mismatch after an
    extraction re-run means the batch is stale — exactly what the
    vendor handoff must catch). Raises FileNotFoundError when the
    labeling stage never ran, matching the other stages' absent
    semantics."""
    import glob as _glob

    root = labeling_root(work_dir)
    runs = sorted(_glob.glob(os.path.join(root, "run=*")))
    if not runs:
        raise FileNotFoundError(root)
    mismatches: dict = {}
    for dest in runs:
        run_id = os.path.basename(dest).split("=", 1)[1]
        try:
            res = verify_labeling(spark, work_dir, run_id)
        except Exception as exc:  # unreadable/partial run dir → a
            # mismatch to report, not a crash: verify_all's stage
            # semantics are present/absent/failed, never raise
            mismatches[run_id] = {"_unreadable": (type(exc).__name__, None)}
            continue
        if res["mismatches"]:
            mismatches[run_id] = res["mismatches"]
    return {"runs": len(runs), "mismatches": mismatches}
