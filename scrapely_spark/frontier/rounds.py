"""Deterministic, resumable crawl rounds (the north rule's frontier loop).

One round = one batch-synchronous Spark job over the state store:

    frontier view (Σ enqueued − Σ fetched)
       ──broadcast-join robots──► politeness top-k (salted windows)
                                            │ fetch batch
                            batch ⋈ pages store (replay fetch, AQE join)
                                            │ hits
                           extraction kernel (broadcast plan, Arrow)
                                            │ records + outlinks
               canonicalize ─ min-depth dedup ─ bloom prefilter ─ exact
               anti-join vs seen ─ robots gate ─► enqueued delta rN

Every ordered decision is made on an explicit total key
``(priority, canonical_url)`` — never on partition arrival order — which
is what makes the fetch order and the final URL-seen set byte-identical
to the single-threaded oracle (oracle.py) under any parallelism.

State is **append-only per-round deltas** (the Iceberg MERGE shape): the
frontier is never rewritten — it is the view ``union(enqueued deltas)
anti-join union(fetch_log deltas)``, exact because the seen set
guarantees a URL is enqueued at most once and fetched URLs are a subset
of enqueued.  The bloom filter is likewise per-round delta bitmaps,
OR-merged at read time (4096·rounds tiny rows).  At 10^10 URLs a full
frontier/bloom rewrite per round is O(state) cumulative I/O — deltas
make each round's writes O(new URLs); a long-running crawl compacts the
delta chains periodically (``crawl(..., compact_every=N)`` →
StateStore.compact_rounds, the Iceberg ``rewrite_data_files``), which
changes no reader.

Scale notes: the pages store and the seen set are the big sides and are
only ever probed with joins that shuffle on their keys; the bloom filter
short-circuits the seen anti-join for definitively-new URLs; politeness
selection is salted two-phase top-k (politeness.py) so a mega-host cannot
serialize a stage.  State commits are atomic per round via the ledger —
a killed job resumes from the last committed round (test_crawl_resume).

Rounds are **pipelined**: round k+1's wave 1 (frontier increment +
politeness selection + fetch-log staging — the control plane whose cost
is roughly constant in executor count) runs while round k's wave-3 delta
writes drain, so the per-round floor is max(w1, w3), not w1+w3.  The
ledger commit barrier is untouched, and the politeness batch is staged
then read back as a plain file scan so plan depth stays constant across
rounds — see ``crawl`` and ``_politeness_wave``.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Observation, functions as F

from scrapely_spark.frontier.bloom import BloomSpec
from scrapely_spark.frontier.seenfilter import BloomSeenFilter
from scrapely_spark.frontier.canonical import canonicalize_df
from scrapely_spark.frontier.politeness import select_fetch_batch
from scrapely_spark.frontier.robots import DEFAULT_CRAWL_DELAY, gate
from scrapely_spark.frontier.state import StateStore
from scrapely_spark.html.lexer import Tag, TAG_OPEN
from scrapely_spark.html.page import HtmlPage

ENQUEUED = "enqueued"   # per-round frontier additions (gated, never-seen)
SEEN = "seen"
BLOOM = "bloom"      # default seen-filter table (BloomSeenFilter.table)
FETCH_LOG = "fetch_log"
EXTRACTED = "extracted"
LINKS = "links"         # per-round host-level link edges (src, dst) —
                        # the graph spark.graph.pagerank scores for
                        # authority-driven prioritization
REPLAY = "replay"

_FRONTIER_COLS = ["canonical_url", "url_key", "host", "priority"]

# opt-in per-wave wall-clock trace (stderr), for locating fixed round cost
_TRACE = bool(os.environ.get("SPARK_GRAFT_TRACE_ROUNDS"))


def _trace(round_id: int, label: str, t0: float) -> float:
    now = time.time()
    if _TRACE:
        print("[round %d] %-18s %6.2fs" % (round_id, label, now - t0),
              file=sys.stderr, flush=True)
    return now

_EXTRACT_SCHEMA = ("canonical_url string, priority int, title string, "
                   "image_url string, caption string, price string, "
                   "links array<string>, partition_id int")


def discover_links(page: HtmlPage, base_url: str | None = None) -> list:
    """Crawlable hrefs of <a> open tags, in document order.

    Relative hrefs resolve against the page URL (urljoin) and only
    http(s) targets survive — mailto:/javascript:/fragment-only links
    never reach the frontier.

    Already-absolute http(s) hrefs skip the resolver entirely: urljoin
    is identity for them (modulo a lone trailing '#', which
    canonicalization strips anyway) and it was ~20% of per-page kernel
    time — most links on the web are absolute.
    """
    from urllib.parse import urljoin

    base = base_url if base_url is not None else page.url
    out = []
    for frag in page.parsed_body:
        if isinstance(frag, Tag) and frag.kind == TAG_OPEN \
                and frag.name == "a":
            href = frag.attributes.get("href")
            if not href:
                continue
            href = href.strip()
            if href.startswith(("http://", "https://")):
                out.append(href)
                continue
            try:
                resolved = urljoin(base, href)
            except ValueError:
                continue  # e.g. '//[' — urljoin's parser rejects it;
                #           one bad href must never kill the kernel
            if resolved.startswith(("http://", "https://")):
                out.append(resolved)
    return out


def _extract_kernel(plan_bc):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        plan = plan_bc.value
        for batch in batches:
            rows = []
            for canon, prio, body in zip(batch["canonical_url"],
                                         batch["priority"], batch["body"]):
                page = HtmlPage(url=canon, body=body)
                items, _tpl = plan.extract_page(page)
                record = {}
                for r in items or []:
                    if r:
                        record = r
                        break

                def first(field):
                    vals = record.get(field)
                    return str(vals[0]) if vals else None

                rows.append({
                    "canonical_url": canon,
                    "priority": int(prio),
                    "title": first("title"),
                    "image_url": first("image_url"),
                    "caption": first("caption"),
                    "price": first("price"),
                    "links": discover_links(page),
                    "partition_id": pid,
                })
            yield pd.DataFrame(rows, columns=[
                "canonical_url", "priority", "title", "image_url",
                "caption", "price", "links", "partition_id"])

    return kernel


def seed_round(spark, store: StateStore, seed_urls, robots: DataFrame,
               spec: BloomSpec, seen_filter=None) -> None:
    """Round 0: enqueue the seed list (idempotent if already committed).

    ``seed_urls`` is a Python list or a DataFrame with a ``url`` column —
    the DataFrame path keeps a multi-million seed list distributed
    instead of shipping it through the driver.
    """
    flt = seen_filter or BloomSeenFilter(spec)
    if store.ledger()["rounds"]:
        return
    if isinstance(seed_urls, DataFrame):
        seeds, n_seeded = seed_urls.select("url"), None
    else:
        seeds = spark.createDataFrame([(u,) for u in seed_urls],
                                      "url string")
        n_seeded = len(seed_urls)
    canon = (canonicalize_df(seeds, spread=False)
             # same malformed-URL drop as discovered links in
             # _round_body: an unparseable seed ('http://[') must not
             # plant an empty-key row in SEEN/ENQUEUED/the filter
             .where((F.col("canonical_url") != "")
                    & (F.col("host") != ""))
             .groupBy("canonical_url")
             .agg(F.min("url_key").alias("url_key"),
                  F.min("host").alias("host"))
             .withColumn("priority", F.lit(0)))
    canon = canon.cache()
    enqueued = gate(canon, robots).drop("crawl_delay") \
        .select(*_FRONTIER_COLS)
    seen = canon.select("canonical_url", "url_key")
    delta = flt.round_delta(seen, None, 0)

    n_canon = canon.count()  # materialize once; the writes below share it
    if n_seeded is None:
        n_seeded = n_canon  # DataFrame path: distinct canonical seeds
    staged = {}
    with ThreadPoolExecutor(max_workers=3) as pool:
        futures = {
            ENQUEUED: pool.submit(store.stage_round, enqueued, ENQUEUED, 0),
            flt.table: pool.submit(store.stage_round, delta, flt.table, 0),
            SEEN: pool.submit(store.stage_round, seen, SEEN, 0),
        }
        for table, fut in futures.items():
            _, staged[table] = fut.result()
    store.commit_round(0, staged, {"seeded": n_seeded})
    canon.unpersist()


def frontier_view(spark, store: StateStore) -> DataFrame:
    """The current frontier: Σ enqueued deltas − Σ fetched deltas.

    Exact (not approximate): the seen set guarantees every canonical URL
    is enqueued at most once across all rounds, and only frontier URLs
    are ever fetched, so the anti-join reconstructs precisely the state
    a full per-round rewrite would have produced — without the O(state)
    write each round.
    """
    enqueued = store.read_rounds(spark, ENQUEUED)
    fetched = store.read_rounds(spark, FETCH_LOG)
    if fetched is None:
        return enqueued.select(*_FRONTIER_COLS)
    return (enqueued.join(fetched.select("canonical_url"),
                          "canonical_url", "left_anti")
            .select(*_FRONTIER_COLS))


def prepare_replay_store(pages: DataFrame) -> DataFrame:
    """Key the fetch store by canonical URL (the frontier's join key).

    The synthetic corpus happens to emit pre-canonical URLs, but a real
    store may hold any equivalent spelling (default ports, case,
    unsorted queries) — the oracle keys by canonicalize(url), so must we.
    """
    canon = canonicalize_df(pages.select("url", "body"),
                        spread=False)
    # equivalent spellings collapse to ONE row per canonical key — a
    # duplicate would double-fire the replay join and the extraction
    # kernel.  min(body) is a deterministic election (the synthetic
    # corpus never collides, so any stable rule preserves oracle
    # parity); one map-side-combined shuffle over the store.
    return (canon.groupBy(F.col("canonical_url").alias("page_url"))
            .agg(F.min("body").alias("body")))


def _politeness_wave(spark, store: StateStore, frontier: DataFrame,
                     robots: DataFrame, round_id: int,
                     round_seconds: float,
                     auth: DataFrame | None = None,
                     levels: int = 1,
                     adaptive: DataFrame | None = None,
                     budget_fetches: int = 0) -> dict:
    """Wave 1: select and stage ``round_id``'s fetch batch.

    ``frontier`` is the round's frontier view — either the store-derived
    plan (sequential path / first round) or the previous round's
    incremental plan (pipelined path, see ``crawl``).  Both produce the
    same row *set*, and every downstream decision orders on the explicit
    total key, so the staged batch is identical either way.

    The staging write job materializes the politeness batch AND carries
    the fetched count via an Observation (no separate count() job).  A
    drained round leaves the staged file as an uncommitted orphan
    (overwritten if the crawl ever resumes here).

    The returned ``batch`` is the staged file READ BACK, not the
    selection plan: downstream plans (the replay join, the next round's
    frontier increment) then hang off a plain file scan — constant plan
    depth across pipelined rounds (a cached plan keeps its whole
    lineage, so chaining increments through caches grows the logical
    plan by one round-pipeline per round until plan stringification
    itself OOMs), and the planner sees the batch's true on-disk size.
    """
    t = time.time()
    if levels > 1:
        # authority-weighted ordering: effective priority is the
        # composite (depth, auth_bucket) encoded as one int — depth
        # still dominates, but inside a depth wave authoritative hosts
        # fetch (and are RECORDED) first.  Hosts the link graph has not
        # scored yet get the worst bucket.  Per-host selection is
        # unchanged (one host = one bucket); what changes — and what
        # the oracle parity re-verifies — is that both engines computed
        # the identical integer PageRank buckets.
        # no broadcast hint: the host-authority table is tiny at
        # sandbox scale (AQE broadcasts it on its own) but a 10^8-host
        # web graph would OOM a forced driver broadcast — let AQE pick
        if auth is not None:
            frontier = (frontier
                        .join(auth, "host", "left")
                        .withColumn("auth_bucket",
                                    F.coalesce("auth_bucket",
                                               F.lit(levels - 1))))
        else:
            frontier = frontier.withColumn("auth_bucket",
                                           F.lit(levels - 1))
        frontier = (frontier
                    .withColumn("priority",
                                (F.col("priority") * levels
                                 + F.col("auth_bucket")).cast("int"))
                    .drop("auth_bucket"))
    # politeness selection (broadcast robots supplies crawl_delay)
    with_delay = (frontier.join(F.broadcast(robots.select(
        "host", "crawl_delay")), "host", "left")
        .withColumn("crawl_delay", F.coalesce(
            F.col("crawl_delay"), F.lit(DEFAULT_CRAWL_DELAY))))
    if adaptive is not None:
        # latency-adaptive backoff (adaptive_crawl_delay over the
        # committed fetch log): the LARGER of robots Crawl-delay and
        # the observed-load delay wins — a slow host never gets more
        # than robots allows, and a fast host never less.  No
        # broadcast hint: tiny here, unbounded on the real web (AQE
        # decides), same discipline as the authority view.
        with_delay = (with_delay
                      .join(adaptive, "host", "left")
                      .withColumn("crawl_delay", F.greatest(
                          F.col("crawl_delay"),
                          F.coalesce(
                              F.col("crawl_delay_us").cast("double")
                              / F.lit(1e6), F.lit(0.0))))
                      .drop("crawl_delay_us"))
    cap_col = None
    if budget_fetches > 0:
        # global per-round fetch budget: water-fill + largest-
        # remainder caps (politeness.budget_caps) over the host
        # demand table.  demand = min(pending, politeness budget) and
        # weight = politeness budget, so a cap can never exceed what
        # politeness alone would grant — the global budget only ever
        # tightens the schedule.
        from scrapely_spark.frontier.politeness import (budget_caps,
                                                        host_budget_expr)
        pb = host_budget_expr(round_seconds).cast("long")
        per_host = (with_delay.groupBy("host", "crawl_delay")
                    .agg(F.count(F.lit(1)).alias("_n"))
                    .select("host",
                            F.least(F.col("_n"), pb).alias("demand"),
                            pb.alias("weight_micro")))
        caps = (budget_caps(per_host, budget_fetches)
                .select("host", F.col("cap_fetches").alias("_cap")))
        with_delay = with_delay.join(caps, "host", "left")
        cap_col = "_cap"
    batch = select_fetch_batch(with_delay, round_seconds=round_seconds,
                               cap_col=cap_col) \
        .drop("crawl_delay", *([cap_col] if cap_col else []))
    fetch_log = batch.select(
        F.lit(round_id).alias("round_id"), "priority", "canonical_url")
    obs_fetched = Observation()
    path, staged_fl = store.stage_round(
        fetch_log.observe(obs_fetched, F.count(F.lit(1)).alias("n")),
        FETCH_LOG, round_id)
    fetched = int(obs_fetched.get["n"])
    batch_scan = (spark.read.parquet(path)
                  .select("priority", "canonical_url"))
    _trace(round_id, "wave1 fetch_log", t)
    return {"batch": batch_scan, "staged_fetch_log": staged_fl,
            "fetched": fetched}


def _commit_drained(store: StateStore, round_id: int, w1: dict) -> dict:
    store.commit_round(round_id, {}, {"fetched": 0, "drained": True})
    return {"fetched": 0}


def run_round(spark, store: StateStore, pages: DataFrame, robots: DataFrame,
              plan_bc, round_id: int, spec: BloomSpec,
              round_seconds: float = 10.0,
              auth: DataFrame | None = None, levels: int = 1,
              template_budget: int = 0, seen_filter=None,
              adaptive: DataFrame | None = None,
              budget_fetches: int = 0) -> dict:
    """Execute one committed crawl round; returns its metrics.

    ``pages`` must be keyed by canonical URL (see prepare_replay_store).
    (The crawl loop pipelines rounds instead of calling this directly —
    same waves, with round k+1's wave 1 overlapped into round k's wave 3;
    this sequential form is the parity/teaching shape.)
    """
    frontier = frontier_view(spark, store)
    w1 = _politeness_wave(spark, store, frontier, robots, round_id,
                          round_seconds, auth=auth, levels=levels,
                          adaptive=adaptive,
                          budget_fetches=budget_fetches)
    if w1["fetched"] == 0:
        return _commit_drained(store, round_id, w1)
    finish, _enqueue = _round_body(spark, store, pages, robots, plan_bc,
                                   round_id, spec, w1, levels=levels,
                                   template_budget=template_budget,
                                   seen_filter=seen_filter)
    return finish()


def _round_body(spark, store: StateStore, pages: DataFrame,
                robots: DataFrame, plan_bc, round_id: int, spec: BloomSpec,
                w1: dict, levels: int = 1, template_budget: int = 0,
                seen_filter=None):
    """Waves 2-3 of a round whose fetch batch is non-empty.

    Returns ``(finish, enqueue_ready)``: ``enqueue_ready()`` waits for
    the round's ENQUEUED delta write alone (one of the four concurrent
    wave-3 jobs) and returns that staged file as a plain scan, so the
    pipelined crawl can fold the round's frontier additions into the
    next round's view without waiting for the other writes — and
    without re-evaluating the candidate pipeline if the executor
    storage pool evicted its caches (the scan is also what keeps the
    incremental frontier's plan depth constant).  ``finish()`` blocks on
    all wave-3 writes, commits the round, frees the round's caches and
    returns its metrics.
    """
    t = time.time()
    batch, fetched = w1["batch"], w1["fetched"]
    staged = {FETCH_LOG: w1["staged_fetch_log"]}

    # replay fetch: probe the pages store with the batch.  No broadcast
    # hint: a politeness batch is usually small (AQE broadcasts it
    # anyway) but a seed-list-replay round can carry 10^5..10^8 URLs,
    # where a forced broadcast serializes on the driver — let AQE pick.
    hits = (pages.select("page_url", "body")
            .join(batch, F.col("page_url") == F.col("canonical_url"),
                  "inner")
            .select("canonical_url", "priority", "body"))

    ext = hits.mapInPandas(_extract_kernel(plan_bc), _EXTRACT_SCHEMA).cache()

    # discovered links → new frontier candidates (min-depth dedup).
    # src_host rides along so the same canonicalized frame also yields
    # the round's host-level link edges — no second pass over `links`.
    from scrapely_spark.frontier.canonical import host_of_canonical
    # in authority mode the batch carries the composite priority
    # (depth·levels + bucket); outlink depth derives from the base depth
    base_depth = (F.floor(F.col("priority") / levels).cast("int")
                  if levels > 1 else F.col("priority"))
    links = (ext.select(
        host_of_canonical(F.col("canonical_url")).alias("src_host"),
        F.explode("links").alias("url"),
        (base_depth + 1).alias("depth")))
    # cached: two consumers (frontier candidates + LINKS edges) must
    # not each re-run the explode + Arrow canonicalize kernel — the
    # round's heaviest Python work; freed in finish()
    canon_links = (canonicalize_df(links, spread=False)
                   .where((F.col("canonical_url") != "")
                          & (F.col("host") != ""))
                   .cache())
    candidates = (canon_links
                  .groupBy("canonical_url")
                  .agg(F.min("depth").alias("priority"),
                       F.min("url_key").alias("url_key"),
                       F.min("host").alias("host")))
    if template_budget > 0:
        # spider-trap budget: cap each (host, path-template) family
        # BEFORE the seen set sees it — dropped URLs stay eligible for
        # later rounds and never consume seen/bloom state
        from scrapely_spark.frontier.canonical import \
            cap_template_families
        candidates = cap_template_families(candidates, template_budget)
    # slim by construction: distinct (src_host, dst_host) is bounded by
    # the host graph, not the page count — the table PageRank reads.
    # src guards mirror the dst-side filter (a canonical_url the
    # slow-path canonicalizer kept but java.net URI parsing rejects
    # yields a NULL host; NULL nodes must not absorb rank)
    link_edges = (canon_links
                  .where(F.col("src_host").isNotNull()
                         & (F.col("src_host") != ""))
                  .select(F.lit(round_id).alias("round_id"),
                          F.col("src_host").alias("src"),
                          F.col("host").alias("dst"))
                  .distinct())

    # URL-seen: filter prefilter (bloom or cuckoo — the seenfilter
    # seam), exact string anti-join only on maybes
    flt = seen_filter or BloomSeenFilter(spec)
    seen = store.read_rounds(spark, SEEN)  # union of per-round deltas
    # bloom reads OR-merge the per-round delta bitmaps; cuckoo reads
    # take the latest bytes per shard — both slim, both broadcastable
    filter_rounds = store.read_rounds(spark, flt.table)
    flagged = flt.prefilter(candidates, filter_rounds).cache()
    certain_new = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(seen.select("canonical_url"),
                               "canonical_url", "left_anti")
    new_urls = certain_new.unionByName(confirmed_new).cache()

    # robots gate at enqueue (rejected URLs stay in the seen set)
    enqueue = gate(new_urls, robots).drop("crawl_delay") \
        .select(*_FRONTIER_COLS)

    seen_delta = new_urls.select("canonical_url", "url_key")
    filter_delta = flt.round_delta(new_urls, filter_rounds, round_id)

    extracted = ext.select(
        F.lit(round_id).alias("round_id"), "canonical_url", "priority",
        "title", "image_url", "caption", "price")

    # Wave 2: stage the seen delta.  This single write job drives the
    # whole fetch→extract→discover→dedup pipeline, populating the ext
    # and new_urls caches for wave 3, and its Observation yields the
    # new-URL count for free — no separate count() job.
    obs_new = Observation()
    _, staged[SEEN] = store.stage_round(
        seen_delta.observe(obs_new, F.count(F.lit(1)).alias("n")),
        SEEN, round_id)
    t = _trace(round_id, "wave2 seen+extract", t)

    # Wave 3: everything left reads only cached inputs — the remaining
    # three delta writes and the per-partition lineage aggregation run
    # concurrently so their fixed per-job costs overlap instead of
    # summing (~the round's whole fixed budget at sandbox round sizes).
    # All three are O(new URLs this round), never O(total state).  The
    # futures are submitted here and awaited in finish(), so the caller
    # can run the NEXT round's wave 1 while these writes drain.
    pool = ThreadPoolExecutor(max_workers=5)
    futures = {
        table: pool.submit(store.stage_round, df, table, round_id)
        for df, table in ((enqueue, ENQUEUED),
                          (filter_delta, flt.table),
                          (link_edges, LINKS))}
    futures[EXTRACTED] = pool.submit(
        store.stage_round, extracted, EXTRACTED, round_id)
    lineage_fut = pool.submit(
        lambda: ext.groupBy("partition_id").agg(
            F.count("*").alias("n")).collect())

    def enqueue_ready() -> DataFrame:
        path, _tag = futures[ENQUEUED].result()
        return spark.read.parquet(path).select(*_FRONTIER_COLS)

    def finish() -> dict:
        try:
            for table, fut in futures.items():
                _, staged[table] = fut.result()
            lineage = [
                {"partition_id": int(r["partition_id"]),
                 "output_rows": int(r["n"])} for r in lineage_fut.result()]
        finally:
            pool.shutdown(wait=False)
        _trace(round_id, "wave3 state writes", t)

        metrics = {
            "fetched": fetched,
            # hits derived from the lineage agg — one fewer job/round
            "hits": sum(entry["output_rows"] for entry in lineage),
            "new_urls": int(obs_new.get["n"]),
            "partition_lineage": lineage,
        }
        store.commit_round(round_id, staged, metrics)

        ext.unpersist()
        canon_links.unpersist()
        flagged.unpersist()
        new_urls.unpersist()
        return metrics

    return finish, enqueue_ready


REPLAY_BUCKETS = 64


def _ensure_replay_table(spark, store: StateStore, pages: DataFrame,
                         n_buckets: int = REPLAY_BUCKETS) -> DataFrame:
    """The replay page store as a parquet table BUCKETED by ``page_url``.

    The per-round replay join probes this table with the politeness
    batch.  Unbucketed, a sort-merge join shuffles the entire body-heavy
    corpus once per round — O(corpus) shuffle write+read every round is
    the dominant I/O of a seed-list-replay crawl (measured: ~12 GB/round
    at the 12M-page scaling point, ~5× the batch's own bytes).  Bucketing
    by the join key makes the big side's existing on-disk layout satisfy
    the join's required distribution: only the small batch shuffles (into
    ``n_buckets`` partitions), and bodies flow scan→join→extract without
    touching shuffle disk.  This is the 10^10-URL design: the page store
    is written once, hash-clustered by URL, and every subsequent join
    against it is co-located.

    Catalog + resume: parquet files carry no bucket metadata, so the
    table must live in the session catalog.  The files sit at the state
    store's committed REPLAY path (ledger commit = completion marker,
    idempotent across kills), and a resume in a fresh session
    re-registers the existing files with CREATE TABLE ... CLUSTERED BY
    ... LOCATION.  Like ``spec``, ``n_buckets`` is part of the crawl's
    resume contract (same arguments ⇒ same state).

    The ``repartition(n_buckets, page_url)`` before the write aligns the
    writer partitioning with the bucket function (both murmur3), so each
    bucket is exactly one file — large sequential reads instead of
    writers-per-bucket fragments.
    """
    import hashlib

    tbl = "replay_pages_" + hashlib.md5(
        store.root.encode()).hexdigest()[:10]
    if store.exists(REPLAY):
        path = store.path_of(REPLAY)
        if not spark.catalog.tableExists(tbl):
            spark.sql(
                "CREATE TABLE %s (page_url STRING, body STRING) "
                "USING PARQUET CLUSTERED BY (page_url) "
                "SORTED BY (page_url) INTO %d BUCKETS LOCATION '%s'"
                % (tbl, n_buckets, path))
        return spark.table(tbl)
    path = store.path_of(REPLAY, 1)
    if spark.catalog.tableExists(tbl):
        spark.sql("DROP TABLE %s" % tbl)  # external: files untouched
    if os.path.exists(path):  # orphan from a killed run — overwrite
        import shutil
        shutil.rmtree(path)
    (prepare_replay_store(pages)
     .repartition(n_buckets, "page_url")
     .write.bucketBy(n_buckets, "page_url").sortBy("page_url")
     .option("path", path).saveAsTable(tbl))
    store.publish(REPLAY, 1)
    return spark.table(tbl)


def crawl(spark, store: StateStore, pages: DataFrame, robots: DataFrame,
          plan, seed_urls, max_rounds: int = 50,
          spec: BloomSpec | None = None,
          round_seconds: float = 10.0,
          compact_every: int | None = None,
          replay_buckets: int = REPLAY_BUCKETS,
          authority_levels: int = 1,
          authority_iters: int = 3,
          template_budget: int = 0,
          seen_filter=None,
          adaptive_delay: bool = False,
          adaptive_multiplier: int = 2,
          budget_fetches: int = 0) -> StateStore:
    """Run (or resume) a crawl to completion or ``max_rounds``.

    Resume: everything is derived from the store's ledger — a killed job
    restarted with the same arguments continues from the last committed
    round and produces the identical final state.

    ``compact_every``: fold each state table's delta chain into one base
    snapshot after every N committed rounds (StateStore.compact_rounds).
    Row-set-invariant, so fetch order and the seen set are unchanged; it
    bounds the per-round union chain a months-long crawl would otherwise
    accumulate.

    ``authority_levels > 1`` enables PageRank-driven prioritization: each
    round recomputes integer-domain PageRank (graph.pagerank_micro —
    exact, order-independent, replayed bit-identically by the oracle's
    pure-Python twin) over the committed LINKS host graph, buckets hosts
    into ``authority_levels`` ordinal quantiles, and schedules on the
    composite priority ``depth·levels + bucket``.  This mode runs rounds
    sequentially: round r's signal must include round r-1's committed
    edges, which pipelining would race.  (At 10^10 scale, refresh the
    signal every K rounds instead and keep the overlap — the signal ages
    gracefully; the per-round recompute here is the parity-checkable
    worst case.)

    ``template_budget > 0`` caps each (host, digit-normalized path
    template) candidate family per round — the spider-trap/calendar
    guard (canonical.cap_template_families), oracle-mirrored.

    ``adaptive_delay=True`` closes the load-feedback loop: each round
    computes the per-host nearest-rank p95 of the committed fetch
    log's latencies (politeness.adaptive_crawl_delay; latencies are
    the deterministic datagen stand-in — no network in the sandbox)
    and the LARGER of robots Crawl-delay and the adaptive delay sets
    the host's politeness budget.  ``budget_fetches > 0`` closes the
    budget loop: a global per-round fetch budget is water-filled
    across hosts with exact integer spend (politeness.budget_caps,
    demand = pending∧politeness, weight = politeness budget).  Both
    signals derive from committed state, so resume reproduces them,
    and both run rounds sequentially like authority mode (round r's
    signal must include round r−1's committed log).  Both are
    replayed bit-identically by the oracle's pure-python twins
    (adaptive_crawl_delay_py / budget_caps_py).
    """
    # Let AQE size the partitions of CACHED plans for the crawl's
    # lifetime (restored on exit).  Every round caches four round-delta
    # frames (ext, canon_links, flagged, new_urls); with the upstream
    # default (false — a plan-compatibility choice, not a performance
    # one) those materialize at the full shuffle-partition count, and
    # the round's many small stages go task-dispatch-bound (profiled:
    # ~0.7s per 64-task stage over KB-sized partitions at the sandbox
    # round size — flipping this measured 2297 → 2886 urls/s, same
    # fetched/extracted counts).  Deltas at 10^10-URL scale are exactly
    # what AQE's advisory partition size is for, so the setting is
    # scale-neutral; queries outside the crawl keep the session default.
    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    try:
        prev = spark.conf.get(key)
    except Exception:  # pragma: no cover - config always defined
        prev = None
    spark.conf.set(key, "true")
    try:
        return _crawl_impl(
            spark, store, pages, robots, plan, seed_urls,
            max_rounds=max_rounds, spec=spec,
            round_seconds=round_seconds, compact_every=compact_every,
            replay_buckets=replay_buckets,
            authority_levels=authority_levels,
            authority_iters=authority_iters,
            template_budget=template_budget, seen_filter=seen_filter,
            adaptive_delay=adaptive_delay,
            adaptive_multiplier=adaptive_multiplier,
            budget_fetches=budget_fetches)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _crawl_impl(spark, store: StateStore, pages: DataFrame,
                robots: DataFrame, plan, seed_urls, max_rounds: int,
                spec: BloomSpec | None, round_seconds: float,
                compact_every: int | None, replay_buckets: int,
                authority_levels: int, authority_iters: int,
                template_budget: int, seen_filter,
                adaptive_delay: bool, adaptive_multiplier: int,
                budget_fetches: int) -> StateStore:
    spec = spec or BloomSpec()
    flt = seen_filter or BloomSeenFilter(spec)
    plan_bc = spark.sparkContext.broadcast(plan)
    robots = robots.cache()
    try:
        return _crawl_rounds(spark, store, pages, robots, plan_bc,
                             seed_urls, max_rounds, spec, round_seconds,
                             compact_every, replay_buckets,
                             authority_levels, authority_iters,
                             template_budget, flt, adaptive_delay,
                             adaptive_multiplier, budget_fetches)
    finally:
        # the crawl must not leak session state into whatever runs
        # next: the robots cache and the executor copies of the plan
        # broadcast are crawl-scoped (every output table is parquet in
        # the store, so nothing returned evaluates them lazily)
        robots.unpersist()
        plan_bc.unpersist()


def _crawl_rounds(spark, store: StateStore, pages: DataFrame,
                  robots: DataFrame, plan_bc, seed_urls,
                  max_rounds: int, spec, round_seconds: float,
                  compact_every: int | None, replay_buckets: int,
                  authority_levels: int, authority_iters: int,
                  template_budget: int, flt,
                  adaptive_delay: bool, adaptive_multiplier: int,
                  budget_fetches: int) -> StateStore:
    # The replay page store is a *table*, not a cache (at 10^10 URLs it
    # can never live in executor memory), and it is bucketed by the join
    # key so per-round replay joins never shuffle it — see
    # _ensure_replay_table.  Idempotent across resumes.
    t = time.time()
    replay = _ensure_replay_table(spark, store, pages,
                                  n_buckets=replay_buckets)
    t = _trace(0, "replay store prep", t)
    seed_round(spark, store, seed_urls, robots, spec, seen_filter=flt)
    _trace(0, "seed round", t)
    rounds_so_far = store.round_metrics()
    if rounds_so_far and rounds_so_far[-1].get("drained"):
        return store  # previous run already drained the frontier
    round_id = store.last_round()
    # Pipelined rounds: round k+1's wave 1 (frontier increment +
    # politeness + fetch-log staging) runs on the driver thread while
    # round k's wave-3 delta writes drain in the background pool, so the
    # two constant-ish control-plane costs overlap instead of summing.
    # The ledger commit barrier is preserved — round k commits before
    # round k+1 does; the overlapped wave 1 only STAGES its fetch log
    # (per-round-tagged, overwritten on resume).  The incremental
    # frontier (view_k ∖ batch_k ∪ enqueue_k) equals the store-derived
    # view as a row set, and the politeness batch orders on the explicit
    # total key (priority, canonical_url), so the staged batch is
    # byte-identical to the sequential schedule's — pinned by the
    # oracle fetch-order/seen-set parity tests.
    def _authority_view():
        if authority_levels <= 1:
            return None
        from scrapely_spark.spark import graph
        links = store.read_rounds(spark, LINKS)
        if links is None:
            return None
        ranks = graph.pagerank_micro(links.select("src", "dst"),
                                     iterations=authority_iters)
        return (graph.authority_buckets(ranks, authority_levels)
                .withColumnRenamed("node", "host"))

    def _adaptive_view():
        if not adaptive_delay:
            return None
        from scrapely_spark.frontier.canonical import host_of_canonical
        from scrapely_spark.frontier.politeness import (
            adaptive_crawl_delay)
        from scrapely_spark.spark.datagen import fetch_latency_us_expr
        fl = store.read_rounds(spark, FETCH_LOG)
        if fl is None:
            return None
        lat = fl.select(
            host_of_canonical(F.col("canonical_url")).alias("host"),
            fetch_latency_us_expr(F.col("canonical_url"))
            .alias("latency_us"))
        return (adaptive_crawl_delay(lat,
                                     multiplier=adaptive_multiplier)
                .select("host", "crawl_delay_us"))

    next_w1 = None
    frontier = None
    while round_id < max_rounds:
        round_id += 1
        if next_w1 is None:
            frontier = frontier_view(spark, store)
            w1 = _politeness_wave(spark, store, frontier, robots,
                                  round_id, round_seconds,
                                  auth=_authority_view(),
                                  levels=authority_levels,
                                  adaptive=_adaptive_view(),
                                  budget_fetches=budget_fetches)
        else:
            # frontier was rebuilt from the store after the previous
            # round committed (constant plan depth — increments never
            # chain across rounds)
            w1, next_w1 = next_w1, None
        if w1["fetched"] == 0:
            _commit_drained(store, round_id, w1)
            break
        finish, enqueue_ready = _round_body(spark, store, replay, robots,
                                            plan_bc, round_id, spec, w1,
                                            levels=authority_levels,
                                            template_budget=template_budget,
                                            seen_filter=flt)
        will_compact = bool(compact_every
                            and round_id % compact_every == 0)
        if (round_id < max_rounds and not will_compact
                and authority_levels <= 1 and not adaptive_delay
                and budget_fetches <= 0):
            # compaction rewrites state files, so an already-planned
            # increment must not straddle it — those rounds fall back
            # to the sequential schedule
            incr = (frontier.join(w1["batch"].select("canonical_url"),
                                  "canonical_url", "left_anti")
                    .select(*_FRONTIER_COLS)
                    .unionByName(enqueue_ready()))
            next_w1 = _politeness_wave(spark, store, incr, robots,
                                       round_id + 1, round_seconds)
        finish()
        if will_compact:
            for table in (ENQUEUED, SEEN, FETCH_LOG, flt.table, EXTRACTED):
                store.compact_rounds(spark, table)
        if next_w1 is not None:
            frontier = frontier_view(spark, store)
    return store
