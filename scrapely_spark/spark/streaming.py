"""Structured Streaming operators.

The reference has no streaming surface (SURVEY.md §2.8) and the crawl loop
is deliberately iterative-batch (byte-identical ordering needs
batch-synchronous rounds), but the engine's event-side operators are also
available as streams: the same aggregations run over ``readStream`` with
watermarked event-time windows, so a deployment can tail a landing zone
(files / Kafka) instead of re-running batch jobs.

``available_now=True`` triggers process-everything-then-stop — which is
also how the parity test checks the streaming plan agrees with its batch
twin on identical input.
"""

from __future__ import annotations

from pyspark.sql import (DataFrame, SparkSession, Window,
                         functions as F)


def _read_parquet_stream(spark: SparkSession, directory: str,
                         max_files_per_trigger: int = 8,
                         schema=None) -> DataFrame:
    """Tail a parquet landing zone.

    Without an explicit ``schema`` it is inferred from the files
    already present (which requires at least one); pass the schema to
    start the tailer on a zone that is still empty.
    """
    if schema is None:
        schema = spark.read.parquet(directory).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(directory))


def read_events_stream(spark: SparkSession, events_dir: str,
                       max_files_per_trigger: int = 8) -> DataFrame:
    """Tail a parquet landing zone of events (schema inferred from data).

    ``max_files_per_trigger=1`` gives one micro-batch per file in
    arrival (mtime) order — the session-window parity test uses that to
    drive watermark advancement deterministically.
    """
    return _read_parquet_stream(spark, events_dir, max_files_per_trigger)


def hourly_counts_stream(events: DataFrame,
                         watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts by event type.

    In append output mode the watermark bounds state and drops late
    rows; in complete mode (the drain-and-compare path) all windows are
    retained — see :func:`run_available_now`.
    """
    with_ts = events.withColumn("ets", F.col("ts").cast("timestamp"))
    return (with_ts
            .withWatermark("ets", watermark)
            .groupBy(F.window("ets", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                 .alias("total_value"))
            .select(F.col("win.start").alias("hour"), "event_type", "n",
                    "total_value"))


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Per-user session rows via Spark's native session windows.

    Sessionization is stateful streaming Spark already expresses —
    ``F.session_window`` merges events closer than ``gap`` into one
    growing window per key, and the watermark both bounds the state
    store and decides when a session is final (append mode emits a
    session only once no on-time event can extend it).  No custom
    state handler needed: the built-in operator is the 100 TB shape
    (state is per open session, sharded by the grouping key).

    The same expression runs on a static DataFrame (no watermark
    needed) — the batch twin the parity test compares against.
    """
    with_ts = events.withColumn("ets", F.col("ts").cast("timestamp"))
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("ets", watermark)
    return (with_ts
            .groupBy(F.session_window("ets", gap).alias("win"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.col("win.start").alias("session_start"),
                    F.col("win.end").alias("session_end"),
                    "n_events"))


def dedup_stream(events: DataFrame, keys=("user_id", "event_type"),
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: first arrival per key wins.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key and
    evicts it once the watermark passes — the bounded-state streaming
    twin of the batch ``dedup.exact`` family.  Within the watermark the
    guarantee is exact; a duplicate arriving after its key's state was
    evicted re-emits (the deliberate state/completeness trade — at
    frontier scale an unbounded key set cannot live in the state store,
    and the downstream exact batch dedup catches stragglers).
    """
    with_ts = events.withColumn("ets", F.col("ts").cast("timestamp"))
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("ets", watermark)
        return with_ts.dropDuplicatesWithinWatermark(list(keys))
    return with_ts.dropDuplicates(list(keys))


def run_available_now(stream_df: DataFrame, query_name: str,
                      checkpoint_dir: str, output_mode: str = "complete"):
    """Drain the stream into an in-memory sink; returns the query handle.

    ``complete`` (default here) is the drain-everything-then-compare mode
    used by the batch-parity test: note that under it the watermark does
    NOT evict state or drop late rows.  A continuous production tail
    should use ``append``, where only watermark-finalized windows emit
    and state stays bounded.
    """
    return (stream_df.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def running_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running totals as a CUSTOM stateful operator.

    The one streaming shape the built-in operators don't cover:
    arbitrary per-key state with user code deciding what to keep and
    emit.  Implemented with ``applyInPandasWithState`` — state is one
    fixed-size row per user (count, sum, last-event micros), each
    micro-batch updates it from Arrow record batches (vectorized
    ``len``/``sum``/``max``, no per-row Python) and emits the key's new
    cumulative row.  State is sharded by the grouping key across
    executors exactly like the built-in session_window state store, so
    the operator scales with key cardinality, not event volume.

    Checkpoint compatibility: the state row widened in round 5 from
    3 fields (n, total, last_us) to 5 (n, n_vals, n_ts, total,
    last_us).  A stream restarted from a checkpoint written by the
    3-field version will fail to deserialize its state — restart such
    streams from a fresh checkpoint (state rebuilds from the source on
    replay); there is no in-place migration.

    On a static DataFrame the same result is one ``groupBy().agg()`` —
    that batch twin is what the correctness oracle checks; the
    streaming/batch parity test drives this operator file-by-file
    through ``availableNow`` and compares final rows.
    """
    import pandas as pd

    out_schema = ("user_id long, n_events long, total_value double, "
                  "last_ts timestamp")

    # event-time operator contract, BOTH paths: an event with no
    # timestamp has no event time — the stream's watermark would drop
    # it before the state op anyway, so the batch twin must drop it
    # too or streaming/batch parity breaks on NULL-ts rows
    events = events.where(F.col("ts").isNotNull())
    if not events.isStreaming:
        return (events.groupBy("user_id")
                .agg(F.count("*").alias("n_events"),
                     F.sum("value").alias("total_value"),
                     F.max(F.col("ts").cast("timestamp")).alias("last_ts")))

    def update(key, pdfs, state):
        # n_vals/n_ts track whether ANY non-null value/ts was ever
        # seen: the batch twin's sum/max return NULL for an all-NULL
        # key, and seeding (0, 0.0, epoch) here would fabricate a
        # 0.0 total and a 1970 timestamp the oracle never emits
        n, n_vals, n_ts, total, last_us = (
            state.get if state.exists else (0, 0, 0, 0.0, 0))
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            vals = pdf["value"].dropna()
            n_vals += len(vals)
            total += float(vals.sum())
            ets = pdf["ets"].dropna()
            if len(ets):
                n_ts += len(ets)
                # unit-explicit epoch micros (Arrow hands us ns or µs)
                e = ets.to_numpy(dtype="datetime64[us]").astype("int64")
                last_us = max(last_us, int(e.max()))
        state.update((n, n_vals, n_ts, total, last_us))
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n],
            "total_value": pd.array(
                [total if n_vals else None], dtype="Float64"),
            "last_ts": [pd.Timestamp(last_us, unit="us")
                        if n_ts else None],
        })

    with_ts = (events
               .withColumn("ets", F.col("ts").cast("timestamp"))
               .withWatermark("ets", watermark))
    return (with_ts.groupBy("user_id").applyInPandasWithState(
        update, out_schema,
        "n long, n_vals long, n_ts long, total double, last_us long",
        "update", "NoTimeout"))


def minhash_dedup_stream(spark: SparkSession, docs_dir: str,
                         index_dir: str, pairs_dir: str,
                         checkpoint_dir: str,
                         max_files_per_trigger: int = 1,
                         schema=None, available_now: bool = True):
    """Streaming incremental near-dup detection over a docs landing zone.

    The streaming twin of ``dedup.minhash_candidates_delta`` — the
    production dedup loop of a continuously-ingesting corpus:  each
    micro-batch (1) computes MinHash bands for its new documents only,
    (2) probes the accumulated on-disk band index for candidate pairs
    (new-vs-index AND new-vs-new; the historical index is never
    re-paired against itself), (3) appends the pairs and its own bands.
    State lives in storage (the parquet/Iceberg band index), not the
    executor state store, so the deduped corpus can grow without bound
    — the same state-table pattern as the crawl's URL-seen set.

    Exactly-once across failures: both writes land in a
    ``batch_id=N`` subdirectory with ``mode("overwrite")``, so a
    replayed micro-batch (foreachBatch's at-least-once contract)
    overwrites its own previous attempt instead of duplicating rows,
    and the index probe reads only ``batch_id < N`` — a replay sees
    the exact index the first attempt saw.

    Returns the started streaming query handle (``availableNow`` by
    default — the drain-and-compare mode the parity test uses; pass
    ``available_now=False`` for a continuous tail).
    """
    from scrapely_spark.spark import dedup

    stream = _read_parquet_stream(spark, docs_dir,
                                  max_files_per_trigger, schema)

    def _batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        # compute the batch's bands ONCE: the persisted frame feeds
        # both the delta probe and the index write — the
        # shingle-explode + double-md5 pipeline is the dominant
        # per-batch cost and must not run twice
        bands = dedup.minhash_bands(batch_df).persist()
        try:
            prior = [p for p in _index_batches(sess, index_dir)
                     if p[0] < batch_id]
            if prior:
                index = sess.read.parquet(*[p[1] for p in prior])
            else:
                index = bands.limit(0)
            pairs = dedup.minhash_candidates_delta(batch_df, index,
                                                   new_bands=bands)
            (pairs.withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .parquet("%s/batch_id=%d" % (pairs_dir, batch_id)))
            (bands.write.mode("overwrite")
             .parquet("%s/batch_id=%d" % (index_dir, batch_id)))
        finally:
            bands.unpersist()

    writer = (stream.writeStream
              .foreachBatch(_batch)
              .option("checkpointLocation", checkpoint_dir)
              .queryName("minhash_dedup_stream"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def phash_dedup_stream(spark: SparkSession, images_dir: str,
                       index_dir: str, pairs_dir: str,
                       checkpoint_dir: str,
                       max_files_per_trigger: int = 1,
                       schema=None, available_now: bool = True,
                       max_hamming: int = 3):
    """Streaming incremental IMAGE dedup over an images landing zone —
    the payload twin of :func:`minhash_dedup_stream`, built on
    ``multimodal.phash_delta_dups``: each micro-batch chunks its new
    images' perceptual hashes, probes the accumulated on-disk chunk
    index (new-vs-index AND new-vs-new; history never re-pairs), and
    appends verified pairs plus its own chunks.  Same storage-resident
    state and same exactly-once ``batch_id=N`` overwrite contract as
    the text stream; see that docstring for the replay argument.
    """
    from scrapely_spark.spark import multimodal

    stream = _read_parquet_stream(spark, images_dir,
                                  max_files_per_trigger, schema)

    def _batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        # chunk the batch's hashes ONCE: the persisted frame feeds
        # both the delta probe and the index write
        chunks = multimodal.phash_chunks(batch_df).persist()
        try:
            prior = [p for p in _index_batches(sess, index_dir)
                     if p[0] < batch_id]
            if prior:
                index = sess.read.parquet(*[p[1] for p in prior])
            else:
                index = chunks.limit(0)
            pairs = multimodal.phash_delta_dups(batch_df, index,
                                                max_hamming=max_hamming,
                                                new_chunks=chunks)
            (pairs.withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .parquet("%s/batch_id=%d" % (pairs_dir, batch_id)))
            (chunks.write.mode("overwrite")
             .parquet("%s/batch_id=%d" % (index_dir, batch_id)))
        finally:
            chunks.unpersist()

    writer = (stream.writeStream
              .foreachBatch(_batch)
              .option("checkpointLocation", checkpoint_dir)
              .queryName("phash_dedup_stream"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_index(spark: SparkSession, index_dir: str) -> int:
    """Compact an append-only ``batch_id=N`` index (the MinHash band /
    phash chunk state the delta streams probe) — the maintenance job a
    per-micro-batch index needs at production cadence, or every probe
    eventually reads thousands of small files.

    All batches EXCEPT the newest merge into one directory named after
    the second-newest id; the newest batch is deliberately left alone
    because it is the only batch foreachBatch may still replay
    (checkpointing commits everything older), and a replay of batch N
    must keep seeing exactly the ``batch_id < N`` rows it saw the
    first time — which the compacted directory, carrying an id < N,
    still provides.  Row multiset is preserved verbatim; only file
    layout changes.  (On Iceberg this is ``rewrite_data_files``; here
    the staging dir becomes AUTHORITATIVE the instant it is complete —
    marked by a ``_merged_ids.json`` manifest naming exactly which
    batch ids it replaces, written only after the parquet write
    returns — so a kill at ANY point
    is recoverable: an incomplete staging is discarded with every
    source intact, a complete one is finished (delete the manifest's
    source dirs, rename into place) on the next call.  The unsafe
    order — deleting sources while the merged rows live only in a
    discardable staging dir — never occurs.)

    Returns the number of batch directories merged (0 = nothing to do).
    """
    import json
    import os

    _recover_compaction(index_dir)
    batches = _index_batches(spark, index_dir)
    if len(batches) <= 2:
        return 0
    to_merge = batches[:-1]
    target_id = to_merge[-1][0]
    staging = os.path.join(index_dir, "_compacting")
    # pin the schema to one batch's real columns: a multi-path read can
    # INFER a batch_id partition column from the directory names, which
    # must not leak into the compacted files
    cols = spark.read.parquet(to_merge[0][1]).columns
    (spark.read.parquet(*[p for _, p in to_merge]).select(*cols)
     .write.mode("overwrite").parquet(staging))
    # the manifest is the commit record: from here on the staging dir
    # is the authoritative copy and recovery FINISHES rather than
    # discards ("_"-prefixed files are invisible to parquet readers)
    with open(os.path.join(staging, "_merged_ids.json"), "w") as f:
        json.dump({"target_id": target_id,
                   "ids": [i for i, _ in to_merge]}, f)
    _finish_compaction(index_dir, staging)
    return len(to_merge)


def _recover_compaction(index_dir: str) -> None:
    """Resolve a staging dir left by a killed :func:`compact_index`:
    complete (manifest present — it is only ever written AFTER the
    parquet write returns, so its presence alone proves the data is
    whole) → finish it; incomplete → discard it (every source dir is
    still intact in that case)."""
    import os
    import shutil

    staging = os.path.join(index_dir, "_compacting")
    if not os.path.isdir(staging):
        return
    if os.path.exists(os.path.join(staging, "_merged_ids.json")):
        _finish_compaction(index_dir, staging)
    else:
        shutil.rmtree(staging)


def _finish_compaction(index_dir: str, staging: str) -> None:
    """Promote a complete staging dir: delete exactly the source batch
    dirs its manifest names (the target id's original dir among them),
    then atomically rename the staging dir into the target's place.
    Idempotent under kill/retry at every step."""
    import json
    import os
    import shutil

    with open(os.path.join(staging, "_merged_ids.json")) as f:
        manifest = json.load(f)
    for i in manifest["ids"]:
        p = os.path.join(index_dir, "batch_id=%d" % int(i))
        if os.path.isdir(p):
            shutil.rmtree(p)
    os.rename(staging, os.path.join(
        index_dir, "batch_id=%d" % int(manifest["target_id"])))


def _index_batches(spark: SparkSession, index_dir: str):
    """(batch_id, path) pairs already committed under ``index_dir``.

    Resolves any half-finished compaction FIRST: a compact_index kill
    between deleting its source dirs and the final rename leaves the
    merged rows only in ``_compacting``, which the ``batch_id=*`` glob
    would skip — a restarted stream would then probe an index missing
    those batches and silently never emit their near-dup pairs.
    """
    import os
    import re
    if not os.path.isdir(index_dir):
        return []
    _recover_compaction(index_dir)
    out = []
    for name in os.listdir(index_dir):
        m = re.fullmatch(r"batch_id=(\d+)", name)
        if m:
            out.append((int(m.group(1)),
                        os.path.join(index_dir, name)))
    return sorted(out)


def curate_images_stream(spark: SparkSession, images_dir: str,
                         max_files_per_trigger: int = 8,
                         schema=None, **gate_kwargs) -> DataFrame:
    """Ingest-time (image, caption) curation: tail a parquet landing
    zone of the input_hint table and apply
    :func:`multimodal.curate_image_captions` per micro-batch.

    The gate is stateless (projection + filter), so streaming output
    equals the batch gate on the same files by construction — pinned by
    a parity test — and there is no watermark or state store to size.
    Schema pruning applies per micro-batch: the binary column is never
    read.  Pass ``schema`` to start tailing a zone no file has reached
    yet (inference needs at least one).
    """
    from scrapely_spark.spark import multimodal

    stream = _read_parquet_stream(spark, images_dir,
                                  max_files_per_trigger, schema)
    return multimodal.curate_image_captions(stream, **gate_kwargs)


def warc_records_stream(spark: SparkSession, segments_dir: str,
                        max_files_per_trigger: int = 8,
                        schema=None) -> DataFrame:
    """Archive-ingest shape: tail a parquet landing zone of WARC
    segments and parse each micro-batch through
    :func:`warc.parse_warc_segments`.

    The parser is a stateless per-segment kernel (records never span
    segments — ISO 28500 makes the segment file the container), so the
    streamed record set equals the batch parse of the same files by
    construction, pinned by the parity test; no watermark or state
    store exists to size.  This is how a 100 TB Common-Crawl-style
    drop ingests: segments land, records append.
    """
    from scrapely_spark.spark import warc

    stream = _read_parquet_stream(spark, segments_dir,
                                  max_files_per_trigger, schema)
    return warc.parse_warc_segments(stream)


def ingest_gates_stream(spark: SparkSession, images_dir: str,
                        max_files_per_trigger: int = 8,
                        schema=None, **gate_kwargs) -> DataFrame:
    """Ingest-time format-sniff + size gating: tail a parquet landing
    zone of crawled image rows and run
    :func:`multimodal.ingest_gates` per micro-batch.

    This is the gate's production position — at the landing zone,
    BEFORE anything downstream reads blobs: rows failing the fused
    sniff/size verdict never reach decode, dedup, or storage
    compaction.  The gate is a stateless single Project, so the
    streamed verdicts equal the batch gate over the same files by
    construction (pinned by the parity test); no watermark or state
    store exists to size, and each micro-batch prunes its own scan.
    """
    from scrapely_spark.spark import multimodal

    stream = _read_parquet_stream(spark, images_dir,
                                  max_files_per_trigger, schema)
    return multimodal.ingest_gates(stream, **gate_kwargs)


def revalidation_stream(spark: SparkSession, fetch_log_dir: str,
                        now_us: int, max_files_per_trigger: int = 8,
                        schema=None, **plan_kwargs) -> DataFrame:
    """Cache-revalidation planning over a streaming fetch log: tail the
    parquet landing zone the fetch stage appends to and classify each
    newly-logged URL with :func:`revalidation.revalidation_plan` per
    micro-batch — the production position for the planner, where a
    fetch's caching metadata becomes the NEXT round's skip/conditional
    verdict the moment the log lands.

    The planner is a stateless single Project (integer-µs CASE
    ladder), so streamed verdicts equal the batch plan over the same
    files by construction — no watermark, no state store; parity is
    pinned by the availableNow test.  ``now_us`` is the round's
    decision time, passed explicitly (streams must not read the
    wall clock, or replays would diverge).
    """
    from scrapely_spark.frontier import revalidation

    stream = _read_parquet_stream(spark, fetch_log_dir,
                                  max_files_per_trigger, schema)
    return revalidation.revalidation_plan(stream, now_us, **plan_kwargs)


def page_ingest_stream(spark: SparkSession, pages_dir: str,
                       index_dir: str, kept_dir: str,
                       checkpoint_dir: str,
                       max_files_per_trigger: int = 1,
                       schema=None, available_now: bool = True,
                       min_content_chars: int = 100):
    """Streaming twin of ``htmlmeta.page_ingest`` — the continuously-
    ingesting crawl→corpus front door.

    Per micro-batch: main-content extraction + the length gate run as
    the same shuffle-free Project as the batch operator; exact-dup
    election then happens in two legs — within the batch (min-url per
    content fingerprint, identical to the batch rule) and against the
    accumulated ON-DISK fingerprint index (left anti-join), after
    which the batch appends its own fingerprints.  Same
    storage-resident state and exactly-once ``batch_id=N`` overwrite
    contract as :func:`minhash_dedup_stream` (a replayed micro-batch
    overwrites its own previous attempt and probes only
    ``batch_id < N``).

    Semantics note: across batches the election is FIRST-ARRIVED —
    the only causal option a stream has — where the batch operator
    elects the globally-minimal url.  Within any single batch the two
    agree exactly; the parity test pins both facts.
    """
    from scrapely_spark.frontier.htmlmeta import main_content

    stream = _read_parquet_stream(spark, pages_dir,
                                  max_files_per_trigger, schema)

    def _batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        extracted = main_content(
            batch_df.select("url", "html"),
            min_chars=25).where(
            F.col("content_chars") >= min_content_chars)
        ok = extracted.withColumn("content_fp", F.md5("content")) \
            .persist()
        try:
            prior = [p for p in _index_batches(sess, index_dir)
                     if p[0] < batch_id]
            if prior:
                index = sess.read.parquet(*[p[1] for p in prior])
            else:
                index = ok.select("content_fp").limit(0)
            w = Window.partitionBy("content_fp")
            kept = (ok
                    .withColumn("_min_url", F.min("url").over(w))
                    .where(F.col("url") == F.col("_min_url"))
                    .drop("_min_url")
                    .join(index, "content_fp", "left_anti")
                    .select("url", "n_blocks", "n_kept",
                            "content_chars", "content_fp", "content"))
            (kept.withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .parquet("%s/batch_id=%d" % (kept_dir, batch_id)))
            (ok.select("content_fp").distinct()
             .write.mode("overwrite")
             .parquet("%s/batch_id=%d" % (index_dir, batch_id)))
        finally:
            ok.unpersist()

    writer = (stream.writeStream
              .foreachBatch(_batch)
              .option("checkpointLocation", checkpoint_dir)
              .queryName("page_ingest_stream"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
