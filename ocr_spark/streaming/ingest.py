"""Structured Streaming ingestion for the extraction pipeline.

The reference has NO streaming surface (synchronous request/response,
SURVEY.md §2.10), and the batch job covers the north rule's resumability
via snapshot diff + checkpoint anti-join. This module adds the
Spark-native incremental path a production crawl ingest would use:

  * ``stream_extract`` — a file-source stream over the pages table
    driven with ``Trigger.AvailableNow``: each invocation processes
    exactly the files that arrived since the last run, exactly once,
    tracked by Spark's own streaming checkpoint (offsets + commits).
    The transformation is the SAME salted-partition-free mapInPandas
    extraction kernel as the batch job — streaming micro-batches are
    already bounded, so the explicit two-level salting of the batch job
    is replaced by ``maxFilesPerTrigger``-bounded batches.
  * ``stream_page_metrics`` — event-time windowed aggregation with a
    watermark: pages/minute per lang over ``warc_ts``, late rows beyond
    the watermark dropped — the standard late-data pattern.
  * ``stream_host_counters`` — ``applyInPandasWithState``: a custom
    stateful per-host running counter (docs + bytes seen so far),
    emitting one update row per host per micro-batch. This is the
    streaming-state analogue of the batch job's per-bucket checkpoint
    bookkeeping.

All sinks here are parquet/memory for testability; swapping the sink
for the Iceberg-shim writer is a one-line change at the writeStream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ocr_spark.sources import PAGES_SCHEMA

HOST_STATE_SCHEMA = StructType([
    StructField("docs", LongType()),
    StructField("bytes", LongType()),
])

HOST_OUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("docs_total", LongType()),
    StructField("bytes_total", LongType()),
])


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a directory of pages parquet files. New
    files are discovered per micro-batch; ``maxFilesPerTrigger`` bounds
    batch size (the streaming analogue of the batch job's salting —
    micro-batches can't grow unbounded)."""
    return (spark.readStream
            .schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(input_dir))


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str) -> Any:
    """Incremental extraction: AvailableNow drains all pending files in
    bounded micro-batches, then stops — rerunning after new files land
    processes ONLY the new files (exactly-once via the streaming
    checkpoint). Returns the query handle (caller awaits termination)."""
    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )

    pages = read_pages_stream(spark, input_dir)
    extracted = pages.select("url", "html").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    ).mapInPandas(_extract_batches_fn("full"), schema=EXTRACT_RESULT_SCHEMA)

    return (extracted.writeStream
            .format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def stream_extract_dedup(spark: SparkSession, input_dir: str,
                         output_dir: str, checkpoint_dir: str,
                         dedup_window: str = "10 minutes") -> Any:
    """``stream_extract`` with a streaming re-crawl dedup stage: a url
    seen again within ``dedup_window`` of event time (warc_ts) is
    dropped BEFORE the expensive Python extraction kernel runs.

    ``dropDuplicatesWithinWatermark`` keys state by url and — unlike
    plain ``dropDuplicates`` on a streaming frame, whose state grows
    forever — evicts each key once the watermark passes its event time,
    so state is bounded by (crawl rate × window) regardless of how long
    the stream runs. That bounded-state property is the 100 TB
    requirement: a continuous crawl ingests the same hot urls
    repeatedly, and unbounded url state would OOM the state store in
    days. Duplicates arriving FARTHER apart than the window are handled
    by the batch layer's exact dedup (plans/queries.py
    docs_exact_dedup / docs_dedup_keepers) — the classic
    streaming-approximate + batch-exact split."""
    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )

    pages = read_pages_stream(spark, input_dir)
    deduped = (pages
               .withWatermark("warc_ts", dedup_window)
               .dropDuplicatesWithinWatermark(["url"]))
    extracted = deduped.select("url", "html").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    ).mapInPandas(_extract_batches_fn("full"), schema=EXTRACT_RESULT_SCHEMA)

    return (extracted.writeStream
            .format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def stream_extract_with_lineage(spark: SparkSession, input_dir: str,
                                output_dir: str, lineage_dir: str,
                                checkpoint_dir: str) -> Any:
    """``stream_extract`` plus per-micro-batch lineage rows — parity
    with the batch job's checkpoint/lineage tables (batch_id, doc/error
    counts, bytes, wall time). Both the data and the lineage row are
    written under ``batch_id=<id>`` directories with mode=overwrite, so
    a batch replayed after a crash overwrites its own output
    idempotently (exactly-once at the batch_id granularity, the
    foreachBatch analogue of the batch job's two-phase bucket commit)."""
    import time as _time

    from pyspark.sql.types import (
        DoubleType as _D, LongType as _L, StructField as _F,
        StructType as _S,
    )

    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )

    pages = read_pages_stream(spark, input_dir)
    extracted = pages.select("url", "html").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    ).mapInPandas(_extract_batches_fn("full"), schema=EXTRACT_RESULT_SCHEMA)

    # batch_id lives in the partition directory name, not the data —
    # partition discovery restores it on read without a column clash
    lineage_schema = _S([
        _F("docs", _L()), _F("errors", _L()),
        _F("bytes_in", _L()), _F("wall_sec", _D()),
    ])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t0 = _time.perf_counter()
        batch_df.persist()
        try:
            batch_df.write.mode("overwrite").parquet(
                f"{output_dir}/batch_id={batch_id}")
            stats = batch_df.agg(
                F.count(F.lit(1)).alias("docs"),
                F.count("error").alias("errors"),
                F.coalesce(F.sum("bytes_in"), F.lit(0)).alias("bytes_in"),
            ).collect()[0]
            row = [(stats["docs"], stats["errors"],
                    int(stats["bytes_in"]),
                    round(_time.perf_counter() - t0, 3))]
            (batch_df.sparkSession.createDataFrame(row, lineage_schema)
             .coalesce(1).write.mode("overwrite")
             .parquet(f"{lineage_dir}/batch_id={batch_id}"))
        finally:
            batch_df.unpersist()

    return (extracted.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def stream_page_metrics(spark: SparkSession, input_dir: str,
                        checkpoint_dir: str,
                        watermark: str = "10 minutes",
                        window: str = "1 minute") -> Any:
    """Event-time windowed counts per lang with a watermark: rows later
    than ``watermark`` behind the max seen ``warc_ts`` are dropped; the
    aggregation state for closed windows is evicted — bounded state at
    any input volume. Sink = in-memory table ``page_metrics``."""
    pages = read_pages_stream(spark, input_dir)
    agg = (pages
           .withWatermark("warc_ts", watermark)
           .groupBy(F.window("warc_ts", window).alias("w"), "lang")
           .agg(F.count("*").alias("n_pages"),
                F.sum(F.length("html")).alias("bytes_in"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "lang", "n_pages", "bytes_in"))
    return (agg.writeStream
            .format("memory")
            .queryName("page_metrics")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def stream_host_sessions(spark: SparkSession, input_dir: str,
                         output_dir: str, checkpoint_dir: str,
                         watermark: str = "10 minutes",
                         gap: str = "5 minutes") -> Any:
    """Gap-based sessionization in STREAMING mode via the native
    ``session_window`` — the stateful shape the batch ``ev_sessionize``
    family computes with a lag-window, done here with Spark's built-in
    session state: a host's session closes when no page arrives for
    ``gap``, and the closed session emits (append mode) once the
    watermark passes its end. State is bounded by open sessions per
    host — the watermark evicts closed ones — so this runs indefinitely
    on an unbounded crawl feed. Sink = parquet via foreachBatch (the
    memory sink cannot recover from a checkpoint, and session closure
    spans restarts by design)."""
    pages = read_pages_stream(spark, input_dir)
    hosts = pages.select(
        F.col("warc_ts"),
        F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
        F.length("html").alias("page_bytes"))
    agg = (hosts
           .withWatermark("warc_ts", watermark)
           .groupBy(F.session_window("warc_ts", gap).alias("s"), "host")
           .agg(F.count("*").alias("n_pages"),
                F.sum("page_bytes").alias("bytes_in"))
           .select(F.col("s.start").alias("session_start"),
                   F.col("s.end").alias("session_end"),
                   "host", "n_pages", "bytes_in"))
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    return (agg.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def _update_host_state_fn(ttl_ms: int | None):
    """Build the stateful kernel: accumulate (docs, bytes) per host
    across micro-batches; emit the running totals once per batch.

    With ``ttl_ms`` set, a host whose state saw no data for ``ttl_ms``
    of processing time is EVICTED (``state.remove()``) on the timeout
    callback — the state store stays bounded by the *active* host
    population instead of growing monotonically with every host ever
    seen (the one unbounded-state surface flagged in round 1)."""

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()          # idle host: drop its counters
            return                  # nothing to emit for an eviction
        docs, nbytes = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            docs += len(pdf)
            nbytes += int(pdf["page_bytes"].sum())
        state.update((docs, nbytes))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"host": [key[0]], "docs_total": [docs],
                            "bytes_total": [nbytes]})

    return update


def stream_host_counters(spark: SparkSession, input_dir: str,
                         output_dir: str, checkpoint_dir: str,
                         ttl_ms: int | None = None,
                         trigger_interval: str | None = None) -> Any:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-host running (docs, bytes) counters surviving across
    micro-batches AND across restarts in the state store. Update mode:
    one row per host per batch with the new totals, appended to parquet
    via foreachBatch (the memory sink cannot recover from a checkpoint;
    foreachBatch is the production pattern for update-mode state).

    ``ttl_ms``: idle-state TTL. None keeps state forever (exact
    all-time totals — correct when the host universe is bounded);
    setting it switches to ProcessingTimeTimeout and evicts hosts idle
    longer than the TTL, bounding state under a rolling host population
    (totals then restart from zero if an evicted host returns).

    ``trigger_interval``: None → Trigger.AvailableNow (drain-and-stop);
    a string like ``'1 second'`` → a continuous processing-time trigger
    (caller stops the query). TTL REQUIRES the continuous trigger:
    processing-time timeouts schedule follow-up batches, which keeps an
    AvailableNow drain from ever terminating (measured on this Spark —
    the pairing is rejected below rather than left to hang)."""
    if ttl_ms is not None and trigger_interval is None:
        raise ValueError(
            "ttl_ms requires trigger_interval (ProcessingTimeTimeout "
            "never terminates under Trigger.AvailableNow)")
    pages = read_pages_stream(spark, input_dir)
    hosts = pages.select(
        # no trailing slash in the pattern: a path-less url like
        # 'https://example.com' must still attribute to its host
        F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
        F.length("html").alias("page_bytes"))
    counters = hosts.groupBy("host").applyInPandasWithState(
        _update_host_state_fn(ttl_ms),
        outputStructType=HOST_OUT_SCHEMA,
        stateStructType=HOST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                     if ttl_ms is not None else GroupStateTimeout.NoTimeout),
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(output_dir))

    ws = (counters.writeStream
          .foreachBatch(sink)
          .option("checkpointLocation", checkpoint_dir)
          .outputMode("update"))
    ws = (ws.trigger(processingTime=trigger_interval) if trigger_interval
          else ws.trigger(availableNow=True))
    return ws.start()


def stream_extract_near_dup(spark: SparkSession, input_dir: str,
                            output_dir: str, sigstore_dir: str,
                            checkpoint_dir: str,
                            compact_every: int = 0) -> Any:
    """Streaming NEAR-dup dedup against an accumulating signature
    store — the incremental form of the batch curation job's neardup
    stage (job.py run_curation_job): each micro-batch extracts its
    pages, MinHash-signs the extracted text, LSH-probes the signatures
    of EVERYTHING ACCEPTED SO FAR (the parquet signature store), drops
    arrivals whose best signature-overlap Jaccard estimate clears
    NEAR_DUP_JACCARD, and commits the survivors' output rows AND
    signatures under batch_id-keyed partitions with overwrite — the
    canonical foreachBatch exactly-once recipe: Spark re-delivers a
    crashed epoch with the SAME batch_id, the overwrite replaces the
    partial partition with identical content, and the store probe
    excludes the current batch's own partition so a re-delivered batch
    never collides with its own half-committed signatures
    (test_stream_near_dup_sink_idempotent pins both halves).

    Exact-url revisits are handled upstream by
    dropDuplicatesWithinWatermark (stream_extract_dedup); THIS stage
    catches the content-drift case (re-crawl with edits, mirrors under
    new urls) that url state can never see.

    Scale shape: the probe is the frame-level lsh_pairs machinery
    restricted new×store via the (band, bucket) equi-join with the
    LSH_BUCKET_CAP guard; the store holds one K-long signature row per
    accepted doc (bytes per doc ~ 8·K — 10^9 docs ≈ 100 GB parquet, a
    normal Spark table, pruned by the bucket join and the batch
    partition filter, never the raw text); batch-internal duplicates
    are collapsed within the batch first (cheapest work wins)."""
    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )

    pages = read_pages_stream(spark, input_dir)
    extracted = pages.select("url", "html").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    ).mapInPandas(_extract_batches_fn("full"), schema=EXTRACT_RESULT_SCHEMA)

    return (extracted.writeStream
            .foreachBatch(near_dup_sink(output_dir, sigstore_dir,
                                        compact_every=compact_every))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def near_dup_sink(output_dir: str, sigstore_dir: str,
                  compact_every: int = 0):
    """The foreachBatch body of stream_extract_near_dup, exposed so the
    exactly-once property (same batch_id twice → identical output) is
    directly testable.

    ``compact_every`` > 0 runs the signature-store small-files
    maintenance (compact_near_dup_store) inline every N batches, after
    the batch's own commits, with ``keep_last=1`` so the partition
    just written for THIS batch_id is never folded into ``batch=-1``
    — a crash-replay of the triggering epoch must still find its own
    signatures excluded by the ``batch != batch_id`` probe filter, and
    folding them into the consolidated partition would make the replay
    near-dup-collide with itself. The trigger predicate depends only
    on batch_id, so replays re-run (idempotent) compaction
    deterministically."""
    import os as _os

    from ocr_spark.plans.dataops import (
        LSH_BUCKET_CAP, MINHASH_K, NEAR_DUP_JACCARD, lsh_bands_frame,
        minhash_sigs_frame,
    )
    from pyspark.sql.window import Window as W

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bdf = batch_df.filter(
            F.col("error").isNull() & F.col("text").isNotNull()
            & (F.col("text") != "")).persist()
        try:
            sigs = minhash_sigs_frame(bdf, key="url", text_col="text") \
                .persist()
            # (1) collapse batch-internal near-dups (keep min url)
            bands = lsh_bands_frame(sigs, "url")
            wcap = W.partitionBy("band", "bucket")
            capped = (bands.withColumn("n", F.count("*").over(wcap))
                      .filter(F.col("n") <= LSH_BUCKET_CAP).drop("n"))
            a, c = capped.alias("a"), capped.alias("c")
            internal = (a.join(c, ["band", "bucket"])
                        .filter(F.col("a.url") < F.col("c.url"))
                        .select(F.col("a.url").alias("keep_url"),
                                F.col("c.url").alias("drop_url"))
                        .distinct())
            sa = sigs.select(F.col("url").alias("keep_url"),
                             F.col("minvec").alias("va"))
            sb = sigs.select(F.col("url").alias("drop_url"),
                             F.col("minvec").alias("vb"))
            est = F.aggregate(
                F.zip_with("va", "vb", lambda x, y: (x == y).cast("int")),
                F.lit(0), lambda acc, x: acc + x) / MINHASH_K
            internal_drops = (internal.join(sa, "keep_url")
                              .join(sb, "drop_url")
                              .filter(est >= NEAR_DUP_JACCARD)
                              .select(F.col("drop_url").alias("url"))
                              .distinct())
            survivors = sigs.join(internal_drops, "url", "left_anti")
            # (2) probe the accumulated store — excluding the current
            # batch's own partition, so a re-delivered batch never
            # probes its own half-committed signatures (partition
            # pruning makes the exclusion free)
            spark_l = batch_df.sparkSession
            has_store = _os.path.isdir(sigstore_dir) and any(
                f.startswith("batch=") and f != f"batch={batch_id}"
                for f in _os.listdir(sigstore_dir))
            if has_store:
                store = (spark_l.read.parquet(sigstore_dir)
                         .filter(F.col("batch") != batch_id)
                         .select("url", "minvec"))
                nb = lsh_bands_frame(survivors, "url")
                sb2 = lsh_bands_frame(store, "url") \
                    .withColumnRenamed("url", "store_url")
                cand = (nb.join(sb2, ["band", "bucket"])
                        .select("url", "store_url").distinct())
                va = survivors.select("url", F.col("minvec").alias("va"))
                vb = store.select(F.col("url").alias("store_url"),
                                  F.col("minvec").alias("vb"))
                est2 = F.aggregate(
                    F.zip_with("va", "vb",
                               lambda x, y: (x == y).cast("int")),
                    F.lit(0), lambda acc, x: acc + x) / MINHASH_K
                store_drops = (cand.join(va, "url").join(vb, "store_url")
                               .filter(est2 >= NEAR_DUP_JACCARD)
                               .select("url").distinct())
                survivors = survivors.join(store_drops, "url", "left_anti")
            kept = bdf.join(survivors.select("url"), "url")
            # batch_id-keyed overwrite: re-delivery of the same epoch
            # replaces the partition with identical content instead of
            # appending duplicates — exactly-once output
            kept.write.mode("overwrite").parquet(
                _os.path.join(output_dir, f"batch={batch_id}"))
            (survivors.select("url", "minvec")
             .write.mode("overwrite").parquet(
                 _os.path.join(sigstore_dir, f"batch={batch_id}")))
            if compact_every > 0 and (batch_id + 1) % compact_every == 0:
                compact_near_dup_store(spark_l, sigstore_dir, keep_last=1)
        finally:
            bdf.unpersist()

    return sink


def stream_wet_export(spark: SparkSession, input_dir: str,
                      output_dir: str, checkpoint_dir: str) -> Any:
    """Streaming WET export — the incremental form of
    plans/webops.py::pages_wet_export: pages stream in, extraction
    runs per micro-batch, and each page leaves as one
    Common-Crawl-WET-shaped conversion record (WARC/1.0 headers +
    UTF-8-byte Content-Length + extracted text) in a text sink. The
    record-building expressions are shared with the oracle-checked
    batch query by construction (same header literals, same
    octet_length), so streaming and batch WET output are
    byte-identical for the same page.

    Scale shape: extraction's own exchange per micro-batch, then a
    narrow string build into an append-only text sink — Structured
    Streaming's checkpoint gives exactly-once file output natively
    (the manifest-tracked file sink), no foreachBatch needed."""
    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )

    pages = read_pages_stream(spark, input_dir)
    extracted = pages.select("url", "html").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    ).mapInPandas(_extract_batches_fn("full"), schema=EXTRACT_RESULT_SCHEMA)
    ok = extracted.filter(F.col("error").isNull()
                          & F.col("text").isNotNull())
    clen = F.octet_length("text")
    record = F.concat(
        F.concat_ws(
            "\r\n",
            F.lit("WARC/1.0"),
            F.lit("WARC-Type: conversion"),
            F.concat(F.lit("WARC-Target-URI: "), F.col("url")),
            F.lit("WARC-Date: 2025-01-01T00:00:00Z"),
            F.lit("Content-Type: text/plain"),
            F.concat(F.lit("Content-Length: "), clen.cast("string"))),
        F.lit("\r\n\r\n"), F.col("text"))
    return (ok.select(record.alias("value"))
            .writeStream.format("text")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def stream_cdx_index(spark: SparkSession, input_dir: str,
                     output_dir: str, checkpoint_dir: str) -> Any:
    """Streaming CDXJ capture-index sink — the incremental form of
    plans/indexing.py::pages_cdx_index: pages stream in and each
    micro-batch writes a (surt_key, ts14)-sorted index RUN under a
    batch_id-keyed partition with overwrite (the near_dup_sink
    exactly-once discipline: crash re-delivery replaces the partition
    with identical content). The record columns come from the SAME
    builder as the batch query (cdx_columns), so batch and streaming
    index rows are byte-identical for the same page. Cross-batch
    consolidation into one globally-ordered index is deliberately NOT
    done here — merging sorted runs incrementally is
    pages_cdx_merge's job, exactly how CC accumulates per-crawl CDX
    shards into the cumulative index."""
    import os as _os

    from ocr_spark.plans.indexing import cdx_columns

    pages = read_pages_stream(spark, input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        run = (cdx_columns(batch_df)
               .repartitionByRange(8, "surt_key", "ts14")
               .sortWithinPartitions("surt_key", "ts14"))
        run.write.mode("overwrite").parquet(
            _os.path.join(output_dir, f"batch={batch_id}"))

    return (pages.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def stream_wat_export(spark: SparkSession, input_dir: str,
                      output_dir: str, checkpoint_dir: str) -> Any:
    """Streaming WAT metadata export — completes the incremental CC
    artifact trio (WET: stream_wet_export, CDX: stream_cdx_index):
    pages stream in and each leaves as one WAT JSON line in a text
    sink, built by the SAME column map as the batch query
    (plans/indexing.py::wat_columns) so streaming and batch records
    are byte-identical for the same page. Zero per-batch shuffle —
    the record is a narrow JVM map — and the native file sink's
    manifest gives exactly-once output."""
    from ocr_spark.plans.indexing import wat_columns

    pages = read_pages_stream(spark, input_dir)
    return (wat_columns(pages).select(F.col("wat_record").alias("value"))
            .writeStream.format("text")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def stream_quality_gate(spark: SparkSession, input_dir: str,
                        output_dir: str, checkpoint_dir: str) -> Any:
    """Incremental filter stage: pages stream in, extraction runs per
    micro-batch, and each extracted page gets the Gopher quality
    verdict + detected language through the SAME frame kernels as the
    batch queries (dataops.gopher_gate_frame / langid_hit_cols), so a
    page admitted by the streaming gate is exactly the page the batch
    pipeline would keep. Output is all pages WITH their feature
    columns and verdict (the audit row), not just the survivors — the
    downstream sink filters on ``keep``. Everything past extraction
    is a narrow JVM map; the parquet sink is natively exactly-once."""
    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )
    from ocr_spark.plans.dataops import (
        gopher_gate_frame, langid_hit_cols, langid_pred_col,
    )

    pages = read_pages_stream(spark, input_dir)
    extracted = pages.select("url", "html").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    ).mapInPandas(_extract_batches_fn("full"), schema=EXTRACT_RESULT_SCHEMA)
    ok = extracted.filter(F.col("error").isNull()
                          & F.col("text").isNotNull())
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    with_lang = (ok.select("url", "text", *langid_hit_cols(toks))
                 .withColumn("lang", langid_pred_col())
                 .select("url", "text", "lang"))
    out = gopher_gate_frame(with_lang, "url", carry=("lang",))
    return (out.writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


PSI_FLAG = 0.25   # the standard PSI rule of thumb: >0.25 = investigate


def quality_reference_counts(extracted: DataFrame) -> DataFrame:
    """(bin, n_ref): the quality classifier's score histogram over a
    reference extraction output — the committed yardstick
    stream_quality_psi monitors drift against. Counts, not shares, so
    the streaming side can apply the same Laplace smoothing as
    docs_quality_psi with exact integers."""
    from ocr_spark.plans.curation import (
        PSI_BINS, classifier_score_frame,
    )

    ok = extracted.filter(F.col("error").isNull()
                          & F.col("text").isNotNull()
                          & (F.length("text") > 0))
    scored = classifier_score_frame(ok.select("url", "text"))
    b = F.least(F.lit(PSI_BINS - 1),
                F.floor(F.col("score") * PSI_BINS)).cast("int")
    return (scored.select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_ref")))


def psi_sink(reference_dir: str, out_dir: str):
    """foreachBatch body of stream_quality_psi: extract the batch,
    score it with the SHARED classifier recipe
    (curation.classifier_score_frame — the same scores the batch
    queries and the labeling job see), histogram the scores into
    PSI_BINS, and compute the Population Stability Index against the
    committed reference histogram with docs_quality_psi's exact
    discipline (Laplace +1 over the union of observed bins, integer
    micro-unit terms). One row per micro-batch (batch_id-keyed
    overwrite): doc count, bin count, PSI, and the >0.25 flag — the
    alarm that tells an operator the CRAWL changed before a bad batch
    trains anything."""
    import os as _os

    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )
    from ocr_spark.plans.curation import (
        PSI_BINS, classifier_score_frame,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ref = spark.read.parquet(reference_dir)  # ≤ PSI_BINS rows
        extracted = batch_df.select("url", "html").withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
        ).mapInPandas(_extract_batches_fn("full"),
                      schema=EXTRACT_RESULT_SCHEMA)
        ok = extracted.filter(F.col("error").isNull()
                              & F.col("text").isNotNull()
                              & (F.length("text") > 0))
        scored = classifier_score_frame(ok.select("url", "text"))
        b = F.least(F.lit(PSI_BINS - 1),
                    F.floor(F.col("score") * PSI_BINS)).cast("int")
        per = (scored.select(b.alias("bin"))
               .groupBy("bin")
               .agg(F.count(F.lit(1)).cast("long").alias("n_new")))
        u = (ref.join(per, "bin", "full_outer")
             .select("bin",
                     F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                     F.coalesce("n_new", F.lit(0)).alias("n_new")))
        tot = u.agg(F.sum("n_ref").cast("long").alias("tr"),
                    F.sum("n_new").cast("long").alias("tn"),
                    F.count(F.lit(1)).cast("long").alias("nb"))
        j = u.crossJoin(F.broadcast(tot))
        p = (F.col("n_ref") + 1) / (F.col("tr") + F.col("nb"))
        q = (F.col("n_new") + 1) / (F.col("tn") + F.col("nb"))
        term_micro = F.round((q - p) * F.log(q / p) * 1e6).cast("long")
        row = (j.select(term_micro.alias("tm"),
                        F.col("tn").alias("n_docs"),
                        F.col("nb").alias("n_bins"))
               .groupBy("n_docs", "n_bins")
               .agg(F.sum("tm").cast("long").alias("psi_micro")))
        out = row.select(
            "n_docs", "n_bins",
            F.round(F.col("psi_micro") / 1e6, 6).alias("psi"),
            (F.col("psi_micro") > int(PSI_FLAG * 1e6)).alias("flagged"))
        (out.coalesce(1).write.mode("overwrite")
         .parquet(_os.path.join(out_dir, f"batch_id={batch_id}")))

    return sink


def stream_quality_psi(spark: SparkSession, input_dir: str,
                       reference_dir: str, out_dir: str,
                       checkpoint_dir: str) -> Any:
    """Per-micro-batch score-distribution drift monitor — the
    streaming twin of docs_quality_psi: every arriving batch is
    extracted, scored with the shared classifier, and PSI'd against
    the committed reference histogram (quality_reference_counts).
    Exactly-once via batch_id-keyed overwrite; deterministic, so
    epoch re-delivery reproduces the identical verdict row."""
    pages = read_pages_stream(spark, input_dir)
    return (pages.writeStream
            .foreachBatch(psi_sink(reference_dir, out_dir))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def dlq_reason_col() -> Column:
    """FIRST-failing-constraint classifier over extraction output rows
    — the row-level form of job.run_validation_job's table-level suite
    (same predicates, same order), shared by the streaming DLQ sink so
    a row quarantined in streaming is exactly a row the batch gate
    would count as a violation. NULL = row is clean."""
    return (
        F.when(F.col("url").isNull() | (F.length("url") == 0),
               "url_missing")
        .when(F.col("error").isNotNull(), "extract_error")
        .when(F.col("text").isNull() | (F.length("text") == 0),
              "empty_text")
        .when(F.col("n_blocks").isNull() | (F.col("n_blocks") <= 0),
              "no_blocks")
        .when(F.col("bytes_in").isNull() | (F.col("bytes_in") <= 0),
              "bad_bytes_in")
    )


def dlq_sink(output_dir: str, quarantine_dir: str):
    """foreachBatch body of stream_extract_dlq, exposed so exactly-once
    (same batch_id twice → identical output AND quarantine) is directly
    testable. Clean rows land in ``output_dir``; violating rows are NOT
    dropped — they land in ``quarantine_dir`` tagged with the first
    failing constraint (the dead-letter-queue pattern: a malformed page
    must stay inspectable and replayable, silently vanishing rows are
    how crawl pipelines lose corpus mass unaccounted). Both sides are
    batch_id-keyed overwrites, so epoch re-delivery replaces partitions
    with identical content instead of appending duplicates."""
    import os as _os

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        tagged = batch_df.withColumn("dlq_reason", dlq_reason_col()) \
            .persist()
        try:
            (tagged.filter(F.col("dlq_reason").isNull())
             .drop("dlq_reason")
             .write.mode("overwrite")
             .parquet(_os.path.join(output_dir, f"batch={batch_id}")))
            (tagged.filter(F.col("dlq_reason").isNotNull())
             .write.mode("overwrite")
             .parquet(_os.path.join(quarantine_dir,
                                    f"batch={batch_id}")))
        finally:
            tagged.unpersist()

    return sink


def stream_extract_dlq(spark: SparkSession, input_dir: str,
                       output_dir: str, quarantine_dir: str,
                       checkpoint_dir: str) -> Any:
    """Incremental extraction with a dead-letter queue: every
    micro-batch extracts, then routes rows through the shared
    row-level constraint classifier — clean rows to the output table,
    violating rows (extract errors, empty text, missing blocks, bad
    byte accounting) to the quarantine table with their reason.
    Exactly-once on both sides via batch_id-keyed overwrite commits."""
    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )

    pages = read_pages_stream(spark, input_dir)
    extracted = pages.select("url", "html").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    ).mapInPandas(_extract_batches_fn("full"), schema=EXTRACT_RESULT_SCHEMA)
    return (extracted.writeStream
            .foreachBatch(dlq_sink(output_dir, quarantine_dir))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def validation_gate_sink(output_dir: str, lineage_dir: str,
                         max_error_frac: float | None = None):
    """foreachBatch body of stream_extract_validated: run the batch
    job's FULL Deequ-style constraint suite (job.constraint_suite —
    literally the same function run_validation_job commits reports
    from) over each micro-batch, with a FAIL-THE-BATCH policy: a
    batch with any violated constraint is NOT committed to the output
    table at all (vs dlq_sink's row routing) — its rows stay
    replayable at the source, and the gate decision itself is
    lineage: every batch writes a per-constraint report row set under
    ``lineage_dir/batch_id=<id>`` with a ``batch_committed`` flag.

    Exactly-once: both sides are batch_id-keyed overwrites and the
    suite is deterministic, so crash re-delivery of an epoch
    re-evaluates to the identical verdict and replaces both the data
    partition (if committed) and the lineage partition with identical
    content."""
    import os as _os

    from ocr_spark.job import VALIDATION_MAX_ERROR_FRAC, constraint_suite

    frac = (VALIDATION_MAX_ERROR_FRAC
            if max_error_frac is None else max_error_frac)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            constraints = constraint_suite(batch_df, frac)
            failed = {n: int(v) for n, _c, v in constraints if v}
            if not failed:
                batch_df.write.mode("overwrite").parquet(
                    _os.path.join(output_dir, f"batch_id={batch_id}"))
            rows = [(name, int(checked), int(viol), viol == 0,
                     not failed)
                    for name, checked, viol in constraints]
            (batch_df.sparkSession.createDataFrame(
                rows, "constraint string, checked long, "
                      "violations long, passed boolean, "
                      "batch_committed boolean")
             .coalesce(1).write.mode("overwrite")
             .parquet(_os.path.join(lineage_dir,
                                    f"batch_id={batch_id}")))
        finally:
            batch_df.unpersist()

    return sink


def stream_extract_validated(spark: SparkSession, input_dir: str,
                             output_dir: str, lineage_dir: str,
                             checkpoint_dir: str,
                             max_error_frac: float | None = None) -> Any:
    """Incremental extraction behind the promotion gate: every
    micro-batch extracts, then the batch validation job's constraint
    suite decides whether the WHOLE batch commits (round-4 verdict
    #6 — the streaming twin of run_validation_job(gate=True), closing
    the loop that dlq_sink's per-row routing leaves open: a
    systemically bad batch must not promote even one row). Gate
    verdicts land in the lineage table either way; exactly-once on
    both sides via batch_id-keyed overwrite commits."""
    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )

    pages = read_pages_stream(spark, input_dir)
    extracted = pages.select("url", "html").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    ).mapInPandas(_extract_batches_fn("full"), schema=EXTRACT_RESULT_SCHEMA)
    return (extracted.writeStream
            .foreachBatch(validation_gate_sink(output_dir, lineage_dir,
                                               max_error_frac))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def router_sink(output_dir: str, lineage_dir: str):
    """foreachBatch body of stream_extract_routed: apply the published
    pre-extraction router (plans/htmlfeat.py::route_for_html — the
    SAME Column expression the batch job's route_filter and the
    pages_extract_router query table use, so the three surfaces
    cannot drift) to each micro-batch BEFORE extraction: only
    'extract' and 'oversized' pages proceed through the kernel and
    commit; condemned pages ('link_heavy' / 'low_text') are not
    extracted at all — the whole point: at crawl scale the router
    must refuse to pay Arrow + Python for pages a JVM regexp already
    condemned — and their counts land in a per-batch route-census
    lineage row so corpus mass stays accounted (the dlq_sink
    nothing-silently-vanishes discipline, at the routing stage).

    Exactly-once: extraction output and lineage are batch_id-keyed
    overwrites; the router expression is deterministic, so epoch
    re-delivery reproduces both partitions byte-identically."""
    import os as _os

    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )
    from ocr_spark.plans.htmlfeat import route_for_html

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        routed = batch_df.withColumn(
            "route", route_for_html(F.col("html"))).persist()
        try:
            census = (routed.groupBy("route")
                      .agg(F.count("*").cast("long").alias("n_pages"),
                           F.sum(F.length("html")).cast("long")
                           .alias("bytes_in")))
            keep = routed.filter(F.col("route")
                                 .isin("extract", "oversized"))
            extracted = keep.select("url", "html").withColumn(
                "bucket",
                F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
            ).mapInPandas(_extract_batches_fn("full"),
                          schema=EXTRACT_RESULT_SCHEMA)
            extracted.write.mode("overwrite").parquet(
                _os.path.join(output_dir, f"batch_id={batch_id}"))
            census.coalesce(1).write.mode("overwrite").parquet(
                _os.path.join(lineage_dir, f"batch_id={batch_id}"))
        finally:
            routed.unpersist()

    return sink


def stream_extract_routed(spark: SparkSession, input_dir: str,
                          output_dir: str, lineage_dir: str,
                          checkpoint_dir: str) -> Any:
    """Incremental extraction behind the pre-extraction router: the
    streaming twin of run_extraction_job(route_filter=True), with the
    per-batch route census committed as lineage. Note the routing
    runs INSIDE foreachBatch so the census and the kept-set are
    computed from the same epoch's rows under one persist."""
    pages = read_pages_stream(spark, input_dir)
    return (pages.writeStream
            .foreachBatch(router_sink(output_dir, lineage_dir))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stream_hll_sketch(spark: SparkSession, input_dir: str,
                      store_dir: str, checkpoint_dir: str) -> Any:
    """Streaming corpus-stat sketch sink: each micro-batch extracts
    its pages and writes the 256-register HLL frame of its token
    stream under a batch_id-keyed partition with overwrite (the
    near_dup_sink exactly-once discipline: crash re-delivery replaces
    the partition with identical content). The frame comes from the
    SAME builder as the batch sketch queries
    (plans/sketches.py::_register_frame), so a page contributes
    identical registers on both paths, and the consolidated store
    (hll_store_registers: elementwise max across batch partitions)
    equals the from-scratch frame over everything ingested — the merge
    property docs_hll_snapshot_merge pins. Vocabulary cardinality over
    an accumulating crawl thus needs only ≤256 stored rows per batch,
    never a rescan of history."""
    import os as _os

    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )
    from ocr_spark.plans.sketches import _register_frame

    pages = read_pages_stream(spark, input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        extracted = batch_df.select("url", "html").withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
        ).mapInPandas(_extract_batches_fn("full"),
                      schema=EXTRACT_RESULT_SCHEMA)
        ok = extracted.filter(F.col("error").isNull()
                              & F.col("text").isNotNull())
        _register_frame(ok).write.mode("overwrite").parquet(
            _os.path.join(store_dir, f"batch={batch_id}"))

    return (pages.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def hll_store_registers(spark: SparkSession, store_dir: str) -> DataFrame:
    """Consolidated HLL register frame over every batch partition the
    streaming sink has committed: elementwise max on the reg key —
    a ≤256-row aggregate no matter how many batches accumulated."""
    return (spark.read.parquet(store_dir)
            .groupBy("reg").agg(F.max("m_reg").alias("m_reg")))


def stream_cms_sketch(spark: SparkSession, input_dir: str,
                      store_dir: str, checkpoint_dir: str) -> Any:
    """Streaming count-min sink — the counter-ADD twin of
    stream_hll_sketch: each micro-batch extracts its pages and writes
    the depth×256 CMS counter frame of its token stream under a
    batch_id-keyed partition with overwrite (exactly-once by
    replacement: crash re-delivery rewrites the partition with
    identical content). The frame comes from the SAME builder as the
    batch sketch queries (plans/sketches.py::_cms_frame), so a page
    contributes identical counters on both paths, and the consolidated
    store (cms_store_counters: elementwise SUM across batch
    partitions) equals the from-scratch frame over everything ingested
    — the counter-add algebra docs_cms_snapshot_merge pins.
    Heavy-hitter frequency estimates over an accumulating crawl thus
    need only ≤ depth·256 stored rows per batch, never a rescan of
    history."""
    import os as _os

    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )
    from ocr_spark.plans.sketches import _cms_frame, _tok_col

    pages = read_pages_stream(spark, input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        extracted = batch_df.select("url", "html").withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
        ).mapInPandas(_extract_batches_fn("full"),
                      schema=EXTRACT_RESULT_SCHEMA)
        ok = extracted.filter(F.col("error").isNull()
                              & F.col("text").isNotNull())
        _cms_frame(ok.select(_tok_col())).write.mode("overwrite").parquet(
            _os.path.join(store_dir, f"batch={batch_id}"))

    return (pages.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def cms_store_counters(spark: SparkSession, store_dir: str) -> DataFrame:
    """Consolidated CMS counter frame over every batch partition the
    streaming sink has committed: elementwise SUM on the (row, bucket)
    key — a ≤ depth·256-row aggregate regardless of batch count."""
    return (spark.read.parquet(store_dir)
            .groupBy("r", "b")
            .agg(F.sum("counter").cast("long").alias("counter")))


def stream_kmv_sketch(spark: SparkSession, input_dir: str,
                      store_dir: str, checkpoint_dir: str) -> Any:
    """Streaming KMV sink — completes the streaming sketch trio
    (register-MAX HLL, counter-ADD CMS, bottom-k KMV): each
    micro-batch extracts its pages and writes the k smallest distinct
    token hashes of its stream under a batch_id-keyed partition with
    overwrite (exactly-once by replacement). The frame comes from the
    SAME builder as the batch queries (plans/sketches.py::_kmv_frame),
    and bottom-k is a semilattice combine: the global k smallest
    hashes are each inside their own batch's k smallest, so the
    consolidated store (kmv_store_frame: bottom-k of the union of
    batch frames) equals the from-scratch frame over everything
    ingested — the algebra docs_kmv_distinct pins batch-side.
    Distinct-vocabulary estimates over an accumulating crawl thus need
    only ≤k stored rows per batch."""
    import os as _os

    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )
    from ocr_spark.plans.sketches import KMV_K, _kmv_frame, _tok_col

    pages = read_pages_stream(spark, input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        extracted = batch_df.select("url", "html").withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
        ).mapInPandas(_extract_batches_fn("full"),
                      schema=EXTRACT_RESULT_SCHEMA)
        ok = extracted.filter(F.col("error").isNull()
                              & F.col("text").isNotNull())
        _kmv_frame(ok.select(_tok_col()), KMV_K).write.mode(
            "overwrite").parquet(
            _os.path.join(store_dir, f"batch={batch_id}"))

    return (pages.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def kmv_store_frame(spark: SparkSession, store_dir: str) -> DataFrame:
    """Consolidated KMV frame over every batch partition the streaming
    sink has committed: bottom-k of the union (distinct, since the
    same hash can appear in several batches) — ≤ k·batches rows in,
    ≤ k rows out."""
    from ocr_spark.plans.sketches import KMV_K

    return (spark.read.parquet(store_dir).select("h").distinct()
            .orderBy("h").limit(KMV_K))


def compact_near_dup_store(spark: SparkSession, sigstore_dir: str,
                           keep_last: int = 0) -> dict:
    """Collapse the signature store's per-batch partitions into one
    consolidated ``batch=-1`` partition — the small-files maintenance
    a per-micro-batch append pattern needs at scale (one parquet
    footer per batch per core adds up at 10^5 batches; the probe's
    scan cost follows file count, not byte count).

    Crash-safe by idempotence, not locking: the consolidated partition
    is written FIRST (overwrite), old batch dirs are removed after. A
    crash between the two leaves duplicate signatures in the store,
    which the probe tolerates (candidate pairs are ``distinct``-ed and
    verdicts are per-pair, so duplicates change nothing), and the next
    compaction run completes the removal. ``keep_last`` leaves the N
    highest batch ids unconsolidated so an in-flight replaying batch's
    partition is never touched."""
    import os as _os
    import shutil as _shutil

    if not _os.path.isdir(sigstore_dir):
        return {"compacted_batches": 0, "rows": 0}
    batches = sorted(
        int(d.split("=", 1)[1]) for d in _os.listdir(sigstore_dir)
        if d.startswith("batch=") and d.split("=", 1)[1].lstrip("-").isdigit()
        and int(d.split("=", 1)[1]) >= 0)
    to_merge = batches[:len(batches) - keep_last] if keep_last else batches
    if not to_merge and not _os.path.isdir(
            _os.path.join(sigstore_dir, "batch=-1")):
        return {"compacted_batches": 0, "rows": 0}
    store = (spark.read.parquet(sigstore_dir)
             .filter(F.col("batch").isin([-1] + to_merge))
             .select("url", "minvec"))
    tmp = _os.path.join(sigstore_dir, "_compact_tmp")
    store.coalesce(max(1, store.rdd.getNumPartitions() // 8)) \
         .write.mode("overwrite").parquet(tmp)
    rows = spark.read.parquet(tmp).count()
    base = _os.path.join(sigstore_dir, "batch=-1")
    if _os.path.isdir(base):
        _shutil.rmtree(base)
    _os.rename(tmp, base)
    for b in to_merge:
        d = _os.path.join(sigstore_dir, f"batch={b}")
        if _os.path.isdir(d):
            _shutil.rmtree(d)
    return {"compacted_batches": len(to_merge), "rows": rows}


NEAR_DUP_STATE_SCHEMA = StructType([
    StructField("urls", StringType()),   # '\x1f'-joined accepted urls
    StructField("sigs", StringType()),   # '\x1e'-joined '|'-joined sigs
])

NEAR_DUP_OUT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("band", LongType()),
    StructField("bucket", StringType()),
    StructField("best_est", StringType()),     # 4-dp decimal string
    StructField("matched_url", StringType()),
    StructField("is_dup", StringType()),       # 'true'/'false'
])


def _near_dup_state_fn(bucket_cap: int, threshold: float):
    """Per-(band, bucket) stateful comparator: state holds the MinHash
    signatures of every url ACCEPTED into this bucket so far (capped at
    ``bucket_cap`` — the same O(n²)/state-size guard as the batch
    LSH_BUCKET_CAP, and the same recall trade: a hot bucket stops
    admitting comparators once full). Batch rows process in url order
    for determinism; a row is a dup when its signature-overlap estimate
    against any stored signature clears ``threshold``."""
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        band, bucket = key
        if state.exists:
            urls_s, sigs_s = state.get
            urls = urls_s.split("\x1f") if urls_s else []
            sigs = [[int(x) for x in s.split("|")]
                    for s in sigs_s.split("\x1e")] if sigs_s else []
        else:
            urls, sigs = [], []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("url", kind="mergesort")
        out = []
        for _, r in rows.iterrows():
            vec = list(r["minvec"])
            best, match = 0.0, None
            for u, s in zip(urls, sigs):
                est = sum(1 for a, b in zip(vec, s) if a == b) / len(vec)
                if est > best:
                    best, match = est, u
            dup = best >= threshold
            if not dup and len(urls) < bucket_cap:
                urls.append(r["url"])
                sigs.append(vec)
            out.append((r["url"], band, bucket, f"{best:.4f}",
                        match, "true" if dup else "false"))
        state.update(("\x1f".join(urls),
                      "\x1e".join("|".join(str(x) for x in s)
                                  for s in sigs)))
        yield pd.DataFrame(out, columns=[
            "url", "band", "bucket", "best_est", "matched_url", "is_dup"])
    return fn


def stream_near_dup_state(spark: SparkSession, input_dir: str,
                          output_dir: str, checkpoint_dir: str) -> Any:
    """Streaming near-dup dedup with the signature store IN THE STATE
    STORE — the sub-batch-latency variant of stream_extract_near_dup:
    instead of re-probing an external parquet signature table every
    micro-batch (a scan whose cost grows with everything accepted so
    far), each LSH (band, bucket) keeps its accepted signatures as
    keyed state via applyInPandasWithState, so a batch's probe cost is
    exactly its own rows × their buckets' residents, independent of
    corpus age. Run it under the RocksDB state-store provider (see
    test_stream_dedup_under_rocksdb_state_store) and state lives on
    executor-local disk — memory-bounded at crawl scale.

    Emits one verdict row per (url, band); a url is a near-dup iff ANY
    of its bands flags (consumers aggregate max(best_est) — the same
    OR-amplification semantics as the batch lsh_pairs path). State per
    bucket is capped at LSH_BUCKET_CAP signatures — simultaneously the
    O(n²) comparator guard and the state-size bound; MINHASH_K longs
    per signature ≈ 200 bytes, so worst-case state per bucket ~10 KB.

    Exactly-once: the stateful operator's output commits through the
    streaming checkpoint; a re-delivered epoch replays against the
    checkpointed state version, yielding identical verdicts."""
    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches_fn,
    )
    from ocr_spark.plans.dataops import (
        LSH_BUCKET_CAP, NEAR_DUP_JACCARD, lsh_bands_frame,
        minhash_sigs_frame,
    )

    pages = read_pages_stream(spark, input_dir)
    extracted = pages.select("url", "html").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    ).mapInPandas(_extract_batches_fn("full"), schema=EXTRACT_RESULT_SCHEMA)
    ok = extracted.filter(
        F.col("error").isNull() & F.col("text").isNotNull()
        & (F.col("text") != ""))
    sigs = minhash_sigs_frame(ok, key="url", text_col="text")
    bands = lsh_bands_frame(sigs, key="url", carry=("minvec",))
    verdicts = bands.groupBy("band", "bucket").applyInPandasWithState(
        _near_dup_state_fn(LSH_BUCKET_CAP, NEAR_DUP_JACCARD),
        outputStructType=NEAR_DUP_OUT_SCHEMA,
        stateStructType=NEAR_DUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(output_dir))

    return (verdicts.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
