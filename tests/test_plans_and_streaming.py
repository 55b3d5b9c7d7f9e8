"""Physical-plan shape assertions + streaming/batch agreement.

The 100 TB questions, asked of the actual executed plans at test scale:
does the scan prune columns and push filters, is the small side broadcast,
does the embarrassingly-parallel stage stay shuffle-free, and does the
streaming twin of an aggregation agree with its batch plan?
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as contract

SF_DIR = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_tpch_pricing_pushdown_and_pruning(spark):
    df = contract.queries()["tpch_pricing_summary"](spark, SF_DIR)
    plan = _physical(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"\
        in plan.replace("\n", " "), plan
    # column pruning: the 16-column table scans only what the query needs
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_comment" not in read_schema[0]
    assert "l_partkey" not in read_schema[0]


def test_join_top_nations_broadcasts_dimension(spark):
    df = contract.queries()["join_top_nations"](spark, SF_DIR)
    plan = _physical(df)
    assert "BroadcastHashJoin" in plan, plan


def test_dedup_exact_single_shuffle(spark):
    df = contract.queries()["dedup_exact"](spark, SF_DIR)
    plan = _physical(df)
    # partial aggregation map-side, then exactly one exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "HashAggregate" in plan


def test_textstats_stay_jvm_side(spark):
    df = contract.queries()["text_quality"](spark, SF_DIR)
    plan = _physical(df)
    # higher-order array functions aren't codegen'd, but the whole stage
    # must remain a single JVM Project over a pruned scan — no Python eval
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "ArrowEvalPython" not in plan  # not even a pandas UDF
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_politeness_two_phase_shape(spark):
    df = contract.queries()["politeness_topk"](spark, SF_DIR)
    plan = _physical(df)
    # phase 1 partitions by (host, salt)? — this query is the plain
    # (unsalted) window; the salted variant lives in frontier.politeness
    assert "Window" in plan
    from scrapely_spark.frontier.politeness import select_fetch_batch
    from scrapely_spark.frontier.canonical import canonicalize_df
    urls = canonicalize_df(
        spark.read.parquet(SF_DIR + "/orders.parquet")
        .selectExpr("%s AS url" % contract._SPARK_RAW_URL,
                    "CAST(o_orderkey % 5 AS INT) AS priority")) \
        .withColumn("crawl_delay", F.lit(1.0))
    salted_plan = _physical(select_fetch_batch(urls))
    assert salted_plan.count("Window") >= 2  # two-phase top-k
    assert "salt" in salted_plan


def test_extract_stage_shuffle_free(spark):
    from scrapely_spark.spark import datagen
    from scrapely_spark.spark.extract import extract_records, \
        plan_from_templates
    df = extract_records(datagen.pages_df(spark, 8),
                         plan_from_templates([datagen.template_body()]))
    assert "Exchange" not in _physical(df)


def test_streaming_hourly_agrees_with_batch(spark, tmp_path):
    import os
    from scrapely_spark.spark import streaming
    # the file-stream source tails a directory (landing zone); stage the
    # single-file table into one
    events_dir = str(tmp_path / "events_zone")
    os.makedirs(events_dir)
    os.symlink(os.path.abspath(SF_DIR + "/events.parquet"),
               os.path.join(events_dir, "part-0.parquet"))
    stream = streaming.hourly_counts_stream(
        streaming.read_events_stream(spark, events_dir))
    q = streaming.run_available_now(stream, "hourly_stream",
                                    str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # the batch twin renders hour as 'yyyy-MM-dd HH:mm:ss' and the sum
    # as round(double, 6) for engine-stable driver hashing — normalize
    # the stream side to the same representations
    got = {(r.hour.replace(tzinfo=None).strftime("%Y-%m-%d %H:%M:%S"),
            r.event_type): (r.n, "%.6f" % float(r.total_value))
           for r in spark.sql("select * from hourly_stream").collect()}
    batch = {(r.hour, r.event_type): (r.n, "%.6f" % float(r.total_value))
             for r in contract.queries()["events_hourly"](
                 spark, SF_DIR).collect()}
    assert got == batch


def test_streaming_session_windows_agree_with_batch(spark, tmp_path):
    """Native session_window over a watermarked stream == batch twin.

    Append mode only emits a session once the watermark proves no
    on-time event can extend it, so the zone is fed as one file per
    micro-batch (mtime order) followed by two far-future sentinel
    events: the first advances the watermark past every real session,
    the second's batch flushes them.  The sentinels' own sessions never
    finalize and are filtered from the comparison.
    """
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrapely_spark.spark import streaming

    zone = str(tmp_path / "sessions_zone")
    os.makedirs(zone)
    src = SF_DIR + "/events.parquet"
    shutil.copy(src, os.path.join(zone, "part-0.parquet"))
    schema = pq.read_schema(src)

    import datetime as dt

    def sentinel(name, uid, when, mtime):
        tbl = pa.table({
            "event_id": pa.array([10**9 - uid], pa.int64()),
            "ts": pa.array([when], pa.timestamp("us")),
            "user_id": pa.array([uid], pa.int64()),
            "event_type": pa.array(["sentinel"]),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array(["{}"]),
        })
        path = os.path.join(zone, name)
        pq.write_table(tbl.cast(schema), path)
        os.utime(path, (mtime, mtime))

    t0 = os.path.getmtime(os.path.join(zone, "part-0.parquet"))
    sentinel("part-1.parquet", -1, dt.datetime(2024, 3, 1), t0 + 10)
    sentinel("part-2.parquet", -2, dt.datetime(2024, 3, 2), t0 + 20)

    stream = streaming.sessionize_stream(
        streaming.read_events_stream(spark, zone, max_files_per_trigger=1))
    q = streaming.run_available_now(stream, "session_stream",
                                    str(tmp_path / "ckpt_sessions"),
                                    output_mode="append")
    q.awaitTermination(180)

    fmt = "%Y-%m-%d %H:%M:%S"
    got = {(r.user_id,
            r.session_start.replace(tzinfo=None).strftime(fmt),
            r.session_end.replace(tzinfo=None).strftime(fmt),
            r.n_events)
           for r in spark.sql("select * from session_stream"
                              " where user_id >= 0").collect()}
    batch = {(r.user_id, r.session_start, r.session_end, r.n_events)
             for r in contract.queries()["events_session_windows"](
                 spark, SF_DIR).collect()}
    assert got == batch
    assert len(got) > 100  # real sessions, not a vacuous comparison


def test_streaming_dedup_agrees_with_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark == batch dropDuplicates when every
    duplicate arrives inside the watermark (here: watermark > corpus
    span, so the guarantee is total and the comparison exact)."""
    import os

    from scrapely_spark.spark import streaming

    zone = str(tmp_path / "dedup_zone")
    os.makedirs(zone)
    os.symlink(os.path.abspath(SF_DIR + "/events.parquet"),
               os.path.join(zone, "part-0.parquet"))

    stream = streaming.dedup_stream(
        streaming.read_events_stream(spark, zone), watermark="40 days")
    q = streaming.run_available_now(stream, "dedup_stream_q",
                                    str(tmp_path / "ckpt_dedup"),
                                    output_mode="append")
    q.awaitTermination(120)

    got = spark.sql("select user_id, event_type from dedup_stream_q")
    got_keys = sorted((r.user_id, r.event_type) for r in got.collect())
    batch = spark.read.parquet(SF_DIR + "/events.parquet") \
        .select("user_id", "event_type").distinct()
    want_keys = sorted((r.user_id, r.event_type) for r in batch.collect())
    assert got_keys == want_keys  # one emission per key, set-identical


def test_spark_submit_py_files_deployment(tmp_path):
    """The north rule's deployment mode, actually exercised: a job
    script with no repo on sys.path receives the engine via
    ``spark-submit --py-files <package-zip>``, trains a template,
    extracts a page distributed, and runs one crawl round."""
    import shutil
    import subprocess
    import sys

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest
        pytest.skip("no spark-submit on PATH")

    from scrapely_spark.spark.session import _package_zip

    job = tmp_path / "job.py"
    job.write_text(
        "import json\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[2]')\n"
        "         .config('spark.sql.shuffle.partitions', '2')\n"
        "         .appName('pyfiles-smoke').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "# the engine must be importable ONLY via --py-files\n"
        "from scrapely_spark.spark import datagen\n"
        "from scrapely_spark.spark.extract import extract_records, \\\n"
        "    plan_from_templates\n"
        "plan = plan_from_templates([datagen.template_body()])\n"
        "n = extract_records(datagen.pages_df(spark, 64), plan).count()\n"
        "print('RESULT ' + json.dumps({'extracted': n}))\n"
        "spark.stop()\n")
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--py-files", _package_zip(), str(job)],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path))  # cwd far from the repo: no implicit import
    out = [ln for ln in proc.stdout.splitlines()
           if ln.startswith("RESULT ")]
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out, (proc.stdout[-2000:], proc.stderr[-1000:])
    import json
    assert json.loads(out[0][len("RESULT "):]) == {"extracted": 64}


def test_streaming_running_totals_custom_state_op(spark, tmp_path):
    """applyInPandasWithState running totals == batch groupBy twin.

    The zone is fed as three event_id-range files, one micro-batch each
    (maxFilesPerTrigger=1), so the operator genuinely accumulates state
    across batches; update mode emits one cumulative row per touched
    key per batch, and the final row per key (max n_events — emissions
    are monotone in it) must equal the batch aggregate.  Also asserts
    the intermediate emissions existed: a key seen in all three batches
    emits three rows, proof the state survived batch boundaries.
    """
    import os

    import duckdb

    from scrapely_spark.spark import streaming

    zone = str(tmp_path / "totals_zone")
    os.makedirs(zone)
    src = os.path.abspath(SF_DIR + "/events.parquet")
    con = duckdb.connect()
    for i, (lo, hi) in enumerate([(0, 300), (300, 700), (700, 10**9)]):
        path = os.path.join(zone, "part-%d.parquet" % i)
        con.execute(
            "COPY (SELECT * FROM read_parquet('%s') WHERE event_id >= %d "
            "AND event_id < %d) TO '%s' (FORMAT PARQUET)"
            % (src, lo, hi, path))
        os.utime(path, (os.path.getmtime(path) + 10 * i,) * 2)

    stream = streaming.running_totals(
        streaming.read_events_stream(spark, zone, max_files_per_trigger=1))
    q = streaming.run_available_now(stream, "totals_stream",
                                    str(tmp_path / "ckpt_totals"),
                                    output_mode="update")
    q.awaitTermination(120)

    emitted = spark.sql("select * from totals_stream").collect()
    final = {}
    for r in emitted:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    fmt = "%Y-%m-%d %H:%M:%S"
    got = {u: (r.n_events, "%.4f" % r.total_value,
               r.last_ts.replace(tzinfo=None).strftime(fmt))
           for u, r in final.items()}
    batch = {r.user_id: (r.n_events, "%.4f" % r.total_value,
                         r.last_ts.strftime(fmt))
             for r in streaming.running_totals(
                 spark.read.parquet(src)).collect()}
    assert got == batch
    # every user occurs in all three event_id ranges at this sf, so the
    # per-key emission count proves cross-batch state accumulation
    per_key = {}
    for r in emitted:
        per_key[r.user_id] = per_key.get(r.user_id, 0) + 1
    assert max(per_key.values()) == 3 and min(per_key.values()) >= 1


def test_repetition_stats_jvm_side_with_partial_agg(spark):
    df = contract.queries()["text_repetition"](spark, SF_DIR)
    plan = _physical(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the (doc_id, gram) counts must combine map-side before shuffling
    assert "partial_count" in plan or "HashAggregate" in plan, plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "lang" not in read_schema[0]  # pruned scan


def test_streaming_curation_agrees_with_batch(spark, tmp_path):
    """The (image, caption) gate is stateless, so the streamed result
    over a landing zone equals the batch gate on the same files — the
    ingest-time shape for the input_hint table."""
    import os

    from scrapely_spark.spark import multimodal, streaming

    zone = str(tmp_path / "img_zone")
    os.makedirs(zone)
    imgs = spark.createDataFrame(
        [(str(i), 32 + (i * 37) % 200, 32 + (i * 61) % 200,
          b"\x01" * 8, "caption words for image %d ok" % i)
         for i in range(300)],
        "image_id string, w int, h int, bytes binary, caption string")
    imgs.repartition(3).write.parquet(zone, mode="overwrite")

    q = streaming.run_available_now(
        streaming.curate_images_stream(spark, zone,
                                       max_files_per_trigger=1),
        "curate_stream_q", str(tmp_path / "ckpt_curate"),
        output_mode="append")
    q.awaitTermination(120)

    got = {tuple(r) for r in spark.sql(
        "select * from curate_stream_q").collect()}
    want = {tuple(r) for r in multimodal.curate_image_captions(
        spark.read.parquet(zone)).collect()}
    assert got == want and want


def test_streaming_minhash_dedup_agrees_with_batch(spark, tmp_path):
    """foreachBatch incremental MinHash dedup over a landing zone ==
    batch candidates over the union — the streaming twin of
    dedup.minhash_candidates_delta's invariant (valid while no band
    bucket crosses the hot cap).  Cross-batch pairs carry
    vs_index=true, within-batch pairs false; a full replay (fresh
    checkpoint, same zone) overwrites its own batch_id subdirs and
    leaves the result identical — the exactly-once contract.
    """
    import os
    import time

    from scrapely_spark.spark import dedup, streaming

    def text(i):
        k = i % 10
        return " ".join("t%d_%d" % (k, j) for j in range(12))

    zone = str(tmp_path / "docs_zone")
    os.makedirs(zone)
    batches = [[100 * b + j for j in range(30)] for b in range(3)]
    for b, ids in enumerate(batches):
        df = spark.createDataFrame([(i, text(i)) for i in ids],
                                   "doc_id long, text string")
        df.coalesce(1).write.mode("append").parquet(zone)
        # one file per write; distinct mtimes pin micro-batch order
        newest = max((os.path.join(zone, f) for f in os.listdir(zone)
                      if f.endswith(".parquet")),
                     key=os.path.getmtime)
        os.utime(newest, (time.time() + b, time.time() + b))

    index_dir = str(tmp_path / "band_index")
    pairs_dir = str(tmp_path / "pairs")
    q = streaming.minhash_dedup_stream(
        spark, zone, index_dir, pairs_dir,
        str(tmp_path / "ckpt_dedup"), max_files_per_trigger=1)
    q.awaitTermination(180)

    got = {(r.doc_a, r.doc_b): r.vs_index
           for r in spark.read.parquet(pairs_dir).collect()}
    all_docs = spark.read.parquet(zone)
    want = {(r.doc_a, r.doc_b)
            for r in dedup.minhash_candidates(all_docs).collect()}
    assert set(got) == want and want
    batch_of = {i: b for b, ids in enumerate(batches) for i in ids}
    for (a, b), vs_index in got.items():
        assert vs_index == (batch_of[a] != batch_of[b])

    # replay: fresh checkpoint, same zone — batch ids restart at 0 and
    # every write overwrites its own subdir; the result is unchanged
    q2 = streaming.minhash_dedup_stream(
        spark, zone, index_dir, pairs_dir,
        str(tmp_path / "ckpt_dedup_2"), max_files_per_trigger=1)
    q2.awaitTermination(180)
    again = {(r.doc_a, r.doc_b): r.vs_index
             for r in spark.read.parquet(pairs_dir).collect()}
    assert again == got


def test_streaming_phash_dedup_agrees_with_batch(spark, tmp_path):
    """The image-payload twin: foreachBatch incremental phash dedup
    over a landing zone == batch phash_near_dups over the union, with
    vs_index marking cross-batch pairs and the replay contract
    holding.  Twins are planted both within and across micro-batches.
    """
    import hashlib
    import os
    import time

    from scrapely_spark.spark import multimodal, streaming

    def ph(i):
        h = int(hashlib.md5(str(i // 2).encode()).hexdigest()[:16], 16)
        if i % 2:
            h ^= 32
        return h - (1 << 64) if h >= 1 << 63 else h

    zone = str(tmp_path / "img_zone")
    os.makedirs(zone)
    # batch 0: 0..20 (twin 20,21 crosses into batch 1), batch 1: 21..40
    batches = [list(range(0, 21)), list(range(21, 41))]
    for b, ids in enumerate(batches):
        df = spark.createDataFrame(
            [("img%04d" % i, ph(i)) for i in ids],
            "image_id string, phash long")
        df.coalesce(1).write.mode("append").parquet(zone)
        newest = max((os.path.join(zone, f) for f in os.listdir(zone)
                      if f.endswith(".parquet")),
                     key=os.path.getmtime)
        os.utime(newest, (time.time() + b, time.time() + b))

    index_dir = str(tmp_path / "chunk_index")
    pairs_dir = str(tmp_path / "img_pairs")
    q = streaming.phash_dedup_stream(
        spark, zone, index_dir, pairs_dir,
        str(tmp_path / "ckpt_ph"), max_files_per_trigger=1)
    q.awaitTermination(180)

    got = {(r.id_a, r.id_b): (r.hamming, r.vs_index)
           for r in spark.read.parquet(pairs_dir).collect()}
    want = {(r.id_a, r.id_b): r.hamming
            for r in multimodal.phash_near_dups(
                spark.read.parquet(zone), 3).collect()}
    assert {k: v[0] for k, v in got.items()} == want and want
    batch_of = {("img%04d" % i): b
                for b, ids in enumerate(batches) for i in ids}
    for (a, b), (_, vs_index) in got.items():
        assert vs_index == (batch_of[a] != batch_of[b])
    assert got[("img0020", "img0021")][1] is True

    q2 = streaming.phash_dedup_stream(
        spark, zone, index_dir, pairs_dir,
        str(tmp_path / "ckpt_ph_2"), max_files_per_trigger=1)
    q2.awaitTermination(180)
    again = {(r.id_a, r.id_b): (r.hamming, r.vs_index)
             for r in spark.read.parquet(pairs_dir).collect()}
    assert again == got


def test_compact_index_preserves_delta_semantics(spark, tmp_path):
    """Compacting all-but-the-newest batch dirs preserves the index row
    multiset and the next delta batch's output exactly; the newest
    batch stays replayable."""
    import os

    from scrapely_spark.spark import dedup, streaming

    def text(i):
        return " ".join("t%d_%d" % (i % 7, j) for j in range(12))

    index_dir = str(tmp_path / "idx")
    # three committed index batches, written the way the stream does
    for b in range(3):
        df = spark.createDataFrame(
            [(100 * b + j, text(100 * b + j)) for j in range(20)],
            "doc_id long, text string")
        (dedup.minhash_bands(df).write.mode("overwrite")
         .parquet("%s/batch_id=%d" % (index_dir, b)))

    before = sorted(map(tuple, spark.read.parquet(
        *[p for _, p in streaming._index_batches(spark, index_dir)])
        .select("doc_id", "band_id", "band_key").collect()))
    new_docs = spark.createDataFrame(
        [(900 + j, text(900 + j)) for j in range(20)],
        "doc_id long, text string")
    idx_df = spark.read.parquet(
        *[p for _, p in streaming._index_batches(spark, index_dir)])
    want_pairs = sorted(map(tuple, dedup.minhash_candidates_delta(
        new_docs, idx_df).collect()))

    merged = streaming.compact_index(spark, index_dir)
    assert merged == 2
    names = sorted(os.listdir(index_dir))
    assert names == ["batch_id=1", "batch_id=2"]

    after_batches = streaming._index_batches(spark, index_dir)
    after = sorted(map(tuple, spark.read.parquet(
        *[p for _, p in after_batches])
        .select("doc_id", "band_id", "band_key").collect()))
    assert after == before
    # no inferred batch_id column leaked into the compacted files
    assert "batch_id" not in spark.read.parquet(
        index_dir + "/batch_id=1").columns
    idx2 = spark.read.parquet(*[p for _, p in after_batches])
    got_pairs = sorted(map(tuple, dedup.minhash_candidates_delta(
        new_docs, idx2).collect()))
    assert got_pairs == want_pairs
    # idempotent / nothing left to do at <= 2 dirs
    assert streaming.compact_index(spark, index_dir) == 0


def test_compact_index_recovers_from_kill(spark, tmp_path):
    """A compaction killed at the two dangerous points must never lose
    index rows: (a) after the merged write + manifest but before any
    source deletion — recovery FINISHES the promotion; (b) mid source
    deletion — ditto, the staging dir is authoritative; (c) before the
    manifest exists — recovery discards the staging with every source
    intact."""
    import json
    import os
    import shutil

    from scrapely_spark.spark import dedup, streaming

    def text(i):
        return " ".join("t%d_%d" % (i % 7, j) for j in range(12))

    def build(index_dir):
        for b in range(4):
            df = spark.createDataFrame(
                [(100 * b + j, text(100 * b + j)) for j in range(10)],
                "doc_id long, text string")
            (dedup.minhash_bands(df).write.mode("overwrite")
             .parquet("%s/batch_id=%d" % (index_dir, b)))
        return sorted(map(tuple, spark.read.parquet(
            *[p for _, p in streaming._index_batches(spark, index_dir)])
            .select("doc_id", "band_id", "band_key").collect()))

    def rows(index_dir):
        return sorted(map(tuple, spark.read.parquet(
            *[p for _, p in streaming._index_batches(spark, index_dir)])
            .select("doc_id", "band_id", "band_key").collect()))

    # (a)+(b): write a complete staging (merge of batches 0..2, the
    # way compact_index does), then simulate the kill by deleting TWO
    # of the three sources and never renaming — the pre-fix code
    # rmtree'd this staging on the next run, losing batches 0-1
    idx = str(tmp_path / "idx_a")
    before = build(idx)
    staging = os.path.join(idx, "_compacting")
    cols = spark.read.parquet(idx + "/batch_id=0").columns
    (spark.read.parquet(*[idx + "/batch_id=%d" % b for b in range(3)])
     .select(*cols).write.mode("overwrite").parquet(staging))
    with open(os.path.join(staging, "_merged_ids.json"), "w") as f:
        json.dump({"target_id": 2, "ids": [0, 1, 2]}, f)
    shutil.rmtree(idx + "/batch_id=0")
    shutil.rmtree(idx + "/batch_id=1")
    # next maintenance call finds and finishes the killed run
    assert streaming.compact_index(spark, idx) == 0  # recovery, then <=2 dirs
    assert sorted(os.listdir(idx)) == ["batch_id=2", "batch_id=3"]
    assert rows(idx) == before

    # (c): staging without a manifest = incomplete write; it is
    # discarded and a fresh compaction proceeds from intact sources
    idx2 = str(tmp_path / "idx_c")
    before2 = build(idx2)
    staging2 = os.path.join(idx2, "_compacting")
    os.makedirs(staging2)
    with open(os.path.join(staging2, "part-junk.parquet"), "w") as f:
        f.write("not parquet")
    assert streaming.compact_index(spark, idx2) == 3
    assert sorted(os.listdir(idx2)) == ["batch_id=2", "batch_id=3"]
    assert rows(idx2) == before2


def test_cuckoo_probe_cogroups_per_shard(spark):
    """The cuckoo probe cogroups candidates with the shard table on the
    shard key (the r6 shape): each shard's 2 KiB state crosses the
    Python boundary once per shard instead of being join-duplicated
    onto every candidate row, and no join of any kind multiplies the
    state bytes into the candidate stream."""
    from scrapely_spark.frontier import cuckoo as ck
    from scrapely_spark.frontier.cuckoo import CuckooSpec

    spec = CuckooSpec(n_shards=8, shard_buckets=64)
    keys = spark.range(500).select(
        F.hash(F.col("id").cast("string")).alias("url_key"))
    state = ck.insert(None, keys, spec)
    probe = ck.might_contain(keys, state, spec)
    plan = _physical(probe)
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the state blob columns must never appear in the probe's output
    # stream (they would ride every candidate row through Arrow)
    assert "maybe_seen" in probe.columns
    assert "slots" not in probe.columns and "stash" not in probe.columns


def test_recall_at_k_is_one_small_join(spark):
    """recall_at_k must not rescan the corpus: its plan joins two
    already-limited top-k subtrees (TakeOrderedAndProject) and
    aggregates — no extra Exchange beyond the top-k machinery."""
    from scrapely_spark.spark import simsearch

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    vec = [float(x) for x in
           emb.where("vec_id = 0").select("embedding").first().embedding]
    df = simsearch.recall_at_k(
        simsearch.sq8_topk(emb, vec, 20),
        simsearch.cosine_topk(emb, vec, 20), 20)
    plan = _physical(df)
    assert plan.count("TakeOrderedAndProject") == 2, plan


def test_streaming_warc_ingest_agrees_with_batch(spark, tmp_path):
    """Stateless length-driven record parse: streamed records over a
    segment landing zone == batch parse of the same files."""
    import os

    from scrapely_spark.spark import streaming, warc

    zone = str(tmp_path / "warc_zone")
    os.makedirs(zone)
    segs = []
    for s in range(9):
        recs = [("response", "http://h%d/u%d" % (s, i),
                 "payload WARC/1.0\r\n fake %d:%d " % (s, i) * (i + 1))
                for i in range(s % 4 + 1)]
        segs.append(("seg%d" % s, warc.build_warc_segment(recs)))
    df = spark.createDataFrame(segs, "segment_id string, segment string")
    df.repartition(3).write.parquet(zone, mode="overwrite")

    q = streaming.run_available_now(
        streaming.warc_records_stream(spark, zone,
                                      max_files_per_trigger=1),
        "warc_stream_q", str(tmp_path / "ckpt_warc"),
        output_mode="append")
    q.awaitTermination(120)

    got = {tuple(r) for r in spark.sql(
        "select * from warc_stream_q").collect()}
    want = {tuple(r) for r in warc.parse_warc_segments(
        spark.read.parquet(zone)).collect()}
    assert got == want and want
    assert all(not r[-1] for r in want)  # nothing truncated


# ---------------------------------------------------------------------------
# rendezvous (HRW) fetch-shard assignment
# ---------------------------------------------------------------------------

def _hrw_hosts(spark, n=500):
    return spark.range(n).selectExpr(
        "'h' || CAST(id AS STRING) || '.example.com' AS host")


def test_rendezvous_matches_python_twin(spark):
    """The Spark argmax replays hashlib md5 bit-for-bit."""
    import hashlib
    from scrapely_spark.frontier.politeness import rendezvous_shards

    rows = rendezvous_shards(_hrw_hosts(spark, 64), n_shards=8).collect()
    assert len(rows) == 64
    for r in rows:
        weights = [
            (int(hashlib.md5(("%s:%d" % (r.host, s)).encode())
                 .hexdigest()[:12], 16), -s)
            for s in range(8)]
        w, neg = max(weights)
        assert (r.shard, r.hrw_weight) == (-neg, w), r


def test_rendezvous_minimal_remapping(spark):
    """Growing the fleet n->n+1 only moves hosts to the NEW shard."""
    from scrapely_spark.frontier.politeness import rendezvous_shards

    hosts = _hrw_hosts(spark, 500)
    a = {r.host: r.shard
         for r in rendezvous_shards(hosts, n_shards=8).collect()}
    b = {r.host: r.shard
         for r in rendezvous_shards(hosts, n_shards=9).collect()}
    moved = {h for h in a if a[h] != b[h]}
    assert moved, "some hosts must move to the new shard"
    assert all(b[h] == 8 for h in moved)  # only ever TO the new shard
    # ~1/9 of hosts move; allow generous binomial slack
    assert len(moved) < 500 * 2.5 / 9


def test_rendezvous_balance_and_shuffle_free(spark):
    """Loads are near-uniform and the plan has no exchange at all."""
    from scrapely_spark.frontier.politeness import rendezvous_shards

    df = rendezvous_shards(_hrw_hosts(spark, 512), n_shards=16)
    assert "Exchange" not in _physical(df)  # pure map-side projection
    loads = [r["cnt"] for r in
             df.groupBy("shard").count()
               .selectExpr("count AS cnt").collect()]
    assert len(loads) == 16
    assert max(loads) < 2 * (512 / 16)  # binomial tail, mean 32


def test_streaming_ingest_gates_agree_with_batch(spark, tmp_path):
    """The fused sniff+size gate is a stateless Project, so streamed
    verdicts over a landing zone equal the batch gate on the same
    files — the gate's production position at the ingest zone."""
    import os

    from scrapely_spark.spark import multimodal, streaming

    zone = str(tmp_path / "gate_zone")
    os.makedirs(zone)
    hdr = {"jpeg": bytes.fromhex("FFD8FFE000104A46494600"),
           "png": bytes.fromhex("89504E470D0A1A0A"),
           "bmp": b"BM\x36\x00"}
    fmts = ["jpeg", "png", "bmp"]
    rows = []
    for i in range(240):
        declared = fmts[i % 3]
        actual = fmts[(i + (1 if i % 7 == 0 else 0)) % 3]
        w, h = 32 + (i * 37) % 500, 32 + (i * 61) % 500
        nb = 50 if i % 29 == 0 else (w * h * 3 * 2) // 50 + 600
        rows.append((str(i), declared, bytearray(hdr[actual] + b"xx"),
                     w, h, nb))
    spark.createDataFrame(
        rows, "image_id string, fmt string, bytes binary, w int,"
              " h int, n_bytes long") \
        .repartition(3).write.parquet(zone, mode="overwrite")

    q = streaming.run_available_now(
        streaming.ingest_gates_stream(spark, zone,
                                      max_files_per_trigger=1),
        "gates_stream_q", str(tmp_path / "ckpt_gates"),
        output_mode="append")
    q.awaitTermination(120)

    got = {tuple(r) for r in spark.sql(
        "select * from gates_stream_q").collect()}
    want = {tuple(r) for r in multimodal.ingest_gates(
        spark.read.parquet(zone)).collect()}
    assert got == want and want
    # both verdict polarities present in the parity set
    keeps = {r[-1] for r in want}
    assert keeps == {True, False}


def test_streaming_revalidation_agrees_with_batch(spark, tmp_path):
    """The revalidation planner is a stateless Project, so streamed
    verdicts over a fetch-log landing zone equal the batch plan on the
    same files; now_us is passed explicitly so a replay of the stream
    can never drift from the batch twin."""
    import os

    from scrapely_spark.frontier import revalidation
    from scrapely_spark.spark import streaming

    zone = str(tmp_path / "fetchlog_zone")
    os.makedirs(zone)
    day = 86_400_000_000
    now = 400 * day
    rows = []
    for i in range(180):
        fetched = now - (i % 50 - 3) * day  # includes future fetches
        rows.append((
            "http://h%d/u%d" % (i % 9, i), fetched,
            3600 * (1 + i % 20) if i % 4 == 0 else None,
            'W/"%d"' % i if i % 3 == 0 else None,
            fetched - (1 + i % 40) * day if i % 5 != 0 else None))
    spark.createDataFrame(
        rows, "url string, fetched_us long, max_age_s long, "
              "etag string, last_modified_us long") \
        .repartition(3).write.parquet(zone, mode="overwrite")

    q = streaming.run_available_now(
        streaming.revalidation_stream(spark, zone, now,
                                      max_files_per_trigger=1),
        "reval_stream_q", str(tmp_path / "ckpt_reval"),
        output_mode="append")
    q.awaitTermination(120)

    got = {tuple(r) for r in spark.sql(
        "select * from reval_stream_q").collect()}
    want = {tuple(r) for r in revalidation.revalidation_plan(
        spark.read.parquet(zone), now).collect()}
    assert got == want and want
    # all four actions represented in the parity set
    assert {r[3] for r in want} == {
        "fresh", "revalidate_etag", "revalidate_lastmod", "refetch"}


def test_streaming_page_ingest_agrees_with_batch(spark, tmp_path):
    """Streaming crawl→corpus ingest == batch page_ingest within one
    batch; across batches the election is first-arrived (pinned),
    the fingerprint index dedups later re-crawls of the same prose,
    and the batch_id=N replay contract holds."""
    import os
    import time

    from scrapely_spark.frontier.htmlmeta import page_ingest
    from scrapely_spark.spark import streaming

    prose_a = ("Shared article text long enough to clear the "
               "minimum content gate without any trouble at all, "
               "padded with a second sentence for good measure.")
    prose_b = ("A different but equally long article body that "
               "also clears the minimum content gate comfortably, "
               "likewise padded with one extra closing sentence.")
    nav = '<nav><a href="/x">Home</a> <a href="/y">About</a></nav>'
    mk = lambda p: "<html><body>%s<p>%s</p></body></html>" % (nav, p)
    zone = str(tmp_path / "pages_zone")
    batches = [
        # batch 0: dup pair within the batch + a unique
        [("http://s/5", mk(prose_a)), ("http://s/7", mk(prose_a)),
         ("http://s/9", mk(prose_b))],
        # batch 1: SMALLER url re-crawls prose_a — batch semantics
        # would elect it; streaming must keep batch 0's winner
        [("http://s/1", mk(prose_a)),
         ("http://s/8", mk("tiny"))],
    ]
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, "url string, html string") \
            .coalesce(1).write.mode("append").parquet(zone)
        newest = max((os.path.join(zone, f) for f in os.listdir(zone)
                      if f.endswith(".parquet")),
                     key=os.path.getmtime)
        os.utime(newest, (time.time() + b, time.time() + b))

    index_dir = str(tmp_path / "fp_index")
    kept_dir = str(tmp_path / "kept")
    q = streaming.page_ingest_stream(
        spark, zone, index_dir, kept_dir,
        str(tmp_path / "ckpt_ingest"), max_files_per_trigger=1)
    q.awaitTermination(180)

    kept = {r["url"]: r
            for r in spark.read.parquet(kept_dir).collect()}
    # within-batch election identical to the batch operator
    b0 = spark.createDataFrame(batches[0], "url string, html string")
    batch_kept = {r["url"] for r in page_ingest(b0).collect()
                  if r["kept"]}
    assert {u for u, r in kept.items() if r["batch_id"] == 0} \
        == batch_kept == {"http://s/5", "http://s/9"}
    # cross-batch: first-arrived wins; the later smaller url is a dup
    assert "http://s/1" not in kept
    assert "http://s/8" not in kept          # gated short
    # replay with a fresh checkpoint: identical result
    q2 = streaming.page_ingest_stream(
        spark, zone, index_dir, kept_dir,
        str(tmp_path / "ckpt_ingest_2"), max_files_per_trigger=1)
    q2.awaitTermination(180)
    again = {r["url"] for r in spark.read.parquet(kept_dir).collect()}
    assert again == set(kept)


def test_index_batches_recovers_killed_compaction(spark, tmp_path):
    """The STREAM path must self-heal a killed compaction: a restart
    that goes straight into a micro-batch (never calling
    compact_index) reads the index through _index_batches, which now
    finishes the promotion — without it the probe would silently skip
    every merged band."""
    import json
    import os
    import shutil

    from scrapely_spark.spark import dedup, streaming

    def text(i):
        return " ".join("w%d_%d" % (i % 5, j) for j in range(12))

    idx = str(tmp_path / "idx_stream")
    for b in range(3):
        df = spark.createDataFrame(
            [(100 * b + j, text(100 * b + j)) for j in range(8)],
            "doc_id long, text string")
        (dedup.minhash_bands(df).write.mode("overwrite")
         .parquet("%s/batch_id=%d" % (idx, b)))
    before = sorted(map(tuple, spark.read.parquet(
        *[p for _, p in streaming._index_batches(spark, idx)])
        .select("doc_id", "band_id", "band_key").collect()))

    staging = os.path.join(idx, "_compacting")
    cols = spark.read.parquet(idx + "/batch_id=0").columns
    (spark.read.parquet(idx + "/batch_id=0", idx + "/batch_id=1")
     .select(*cols).write.mode("overwrite").parquet(staging))
    with open(os.path.join(staging, "_merged_ids.json"), "w") as f:
        json.dump({"target_id": 1, "ids": [0, 1]}, f)
    shutil.rmtree(idx + "/batch_id=0")  # killed mid-promotion

    got = streaming._index_batches(spark, idx)
    assert [b for b, _ in got] == [1, 2]
    after = sorted(map(tuple, spark.read.parquet(
        *[p for _, p in got])
        .select("doc_id", "band_id", "band_key").collect()))
    assert after == before


def test_running_totals_all_null_user_matches_batch(spark, tmp_path):
    """NULL-ts events have no event time: the stream's watermark drops
    them, so the batch twin must drop them too (parity), and a user
    surviving with NULL values must emit NULL total_value — never a
    fabricated 0.0 or a 1970 timestamp."""
    import os

    from pyspark.sql import functions as F

    from scrapely_spark.spark import streaming

    zone = str(tmp_path / "null_zone")
    os.makedirs(zone)
    rows = [(1, 7, None, None), (2, 7, None, None),
            (3, 8, 2.5, "2026-01-02 03:04:05"),
            (4, 8, None, "2026-01-02 03:04:06"),
            (5, 9, None, "2026-01-02 03:04:07")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts string")
    # one FLAT parquet file (spark's .write makes a subdirectory the
    # stream's file glob would not descend into)
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "ts": pa.array([r[3] for r in rows], pa.string()),
        }), os.path.join(zone, "part-0.parquet"))

    schema = df.schema
    stream = streaming.running_totals(
        spark.readStream.schema(schema).parquet(zone))
    q = streaming.run_available_now(stream, "null_totals",
                                    str(tmp_path / "ckpt_null"),
                                    output_mode="update")
    q.awaitTermination(120)
    got = {r.user_id: (r.n_events, r.total_value, r.last_ts)
           for r in spark.sql("select * from null_totals").collect()}
    want = {r.user_id: (r.n_events, r.total_value, r.last_ts)
            for r in streaming.running_totals(df).collect()}
    assert got == want
    assert 7 not in got          # no event time on either path
    assert got[8][:2] == (2, 2.5) and got[8][2] is not None
    assert got[9][:2] == (1, None)  # survives, but value stays NULL
