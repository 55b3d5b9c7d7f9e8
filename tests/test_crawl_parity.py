"""Crawl parity: the Spark frontier loop vs the single-threaded oracle.

The north rule's acceptance: fetch order and the final URL-seen set must
be byte-identical to the reference scheduler under the same seed list and
politeness budget.  Also covers: murmur3 == F.hash on the real URL
population, bloom-vs-exact equivalence, and kill/resume determinism.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from oracle import OracleCrawl
from scrapely_spark.frontier import politeness, rounds
from scrapely_spark.frontier.bloom import BloomSpec
from scrapely_spark.frontier.canonical import canonicalize, murmur3_32
from scrapely_spark.frontier.state import StateStore
from scrapely_spark.spark import datagen
from scrapely_spark.spark.extract import plan_from_templates

N = 400
MAX_ROUNDS = 30


@pytest.fixture(scope="module")
def oracle_run():
    return OracleCrawl(N, datagen.seeds(N)).run(MAX_ROUNDS)


@pytest.fixture(scope="module")
def spark_run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawlstate"))
    store = StateStore(root)
    pages = datagen.pages_df(spark, N).cache()
    robots = datagen.robots_df(spark)
    plan = plan_from_templates([datagen.template_body()])
    rounds.crawl(spark, store, pages, robots, plan, datagen.seeds(N),
                 max_rounds=MAX_ROUNDS, spec=BloomSpec(n_blocks=64))
    return store


def test_fetch_order_byte_identical(spark, oracle_run, spark_run):
    log = (spark_run.read_rounds(spark, rounds.FETCH_LOG)
           .orderBy("round_id", "priority", "canonical_url").collect())
    got = [(r.round_id, r.priority, r.canonical_url) for r in log]
    assert got == oracle_run.fetch_order()


def test_seen_set_byte_identical(spark, oracle_run, spark_run):
    seen = spark_run.read_rounds(spark, rounds.SEEN).collect()
    assert sorted(r.canonical_url for r in seen) == oracle_run.seen_urls()
    assert sorted(r.url_key for r in seen) == oracle_run.seen_keys()
    # and the keys really are Spark's murmur3: recompute JVM-side
    recomputed = (spark_run.read_rounds(spark, rounds.SEEN)
                  .where(F.hash("canonical_url") != F.col("url_key"))
                  .count())
    assert recomputed == 0


def test_frontier_drained(spark, oracle_run, spark_run):
    assert rounds.frontier_view(spark, spark_run).count() == \
        len(oracle_run.frontier)


def test_extraction_during_crawl(spark, oracle_run, spark_run):
    ext = spark_run.read_rounds(spark, rounds.EXTRACTED)
    assert ext.count() == oracle_run.extracted
    # every extracted record carries a caption equal to the ground truth
    with_truth = (ext.withColumn(
        "i", F.regexp_extract("image_url", r"img-(\d+)", 1).cast("int")))
    rows = with_truth.select("i", "caption").collect()
    for r in rows:
        assert r.caption == datagen.caption_for(r.i)


def test_robots_never_fetched(spark, spark_run):
    log = spark_run.read_rounds(spark, rounds.FETCH_LOG)
    assert log.where(F.col("canonical_url").contains("/private/")) \
        .count() == 0


def test_politeness_budget_respected(spark, spark_run):
    """No host exceeds its per-round budget in any round."""
    log = spark_run.read_rounds(spark, rounds.FETCH_LOG).withColumn(
        "host", F.parse_url("canonical_url", F.lit("HOST")))
    robots = datagen.robots_df(spark).select("host", "crawl_delay")
    per_round = (log.groupBy("round_id", "host").count()
                 .join(robots, "host", "left"))
    over = per_round.where(
        F.col("count") > F.greatest(
            F.lit(1), F.floor(F.lit(10.0) / F.col("crawl_delay")))).count()
    assert over == 0


def test_lineage_and_metrics_recorded(spark_run):
    metrics = spark_run.round_metrics()
    assert metrics[0].get("seeded")
    fetch_rounds = [m for m in metrics if m.get("fetched")]
    assert fetch_rounds
    assert all("partition_lineage" in m for m in fetch_rounds)
    assert all(m["fetched"] >= m["hits"] for m in fetch_rounds)


def test_seeds_df_matches_list(spark):
    """The distributed seed generator is value- and order-identical to
    the python list twin the oracle consumes."""
    for n, k, h in ((N, 8, 50), (60000, 4096, 800)):
        want = datagen.seeds(n, n_seeds=k, n_hosts=h)
        got = [r.url for r in datagen.seeds_df(spark, n, k, h).collect()]
        assert got == want


def test_dataframe_seed_path_byte_identical(spark, tmp_path_factory,
                                            oracle_run):
    """Seeding from a DataFrame (the 10^10-scale path) produces the same
    crawl as seeding from the oracle's list."""
    root = str(tmp_path_factory.mktemp("dfseeds"))
    store = StateStore(root)
    pages = datagen.pages_df(spark, N).cache()
    robots = datagen.robots_df(spark)
    plan = plan_from_templates([datagen.template_body()])
    seeds_df = datagen.seeds_df(spark, N, 8)
    rounds.crawl(spark, store, pages, robots, plan, seeds_df,
                 max_rounds=MAX_ROUNDS, spec=BloomSpec(n_blocks=64))
    log = (store.read_rounds(spark, rounds.FETCH_LOG)
           .orderBy("round_id", "priority", "canonical_url").collect())
    assert [(r.round_id, r.priority, r.canonical_url) for r in log] == \
        oracle_run.fetch_order()
    shutil.rmtree(root)


def test_resume_after_kill(spark, tmp_path_factory, oracle_run):
    """Kill after round 2; a restarted job must converge identically."""
    root = str(tmp_path_factory.mktemp("resume"))
    store = StateStore(root)
    pages = datagen.pages_df(spark, N).cache()
    robots = datagen.robots_df(spark)
    plan = plan_from_templates([datagen.template_body()])
    spec = BloomSpec(n_blocks=64)

    # run only 2 rounds, then "kill" (also leave an orphan staging dir
    # around, as a crash mid-write would)
    rounds.crawl(spark, store, pages, robots, plan, datagen.seeds(N),
                 max_rounds=2, spec=spec)
    import os
    orphan = os.path.join(root, rounds.ENQUEUED,
                          "r%d" % (store.last_round() + 1))
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "garbage.parquet"), "w") as fh:
        fh.write("not parquet")

    # resume to completion
    resumed = StateStore(root)
    rounds.crawl(spark, resumed, pages, robots, plan, datagen.seeds(N),
                 max_rounds=MAX_ROUNDS, spec=spec)

    seen = resumed.read_rounds(spark, rounds.SEEN).collect()
    assert sorted(r.canonical_url for r in seen) == oracle_run.seen_urls()
    log = (resumed.read_rounds(spark, rounds.FETCH_LOG)
           .orderBy("round_id", "priority", "canonical_url").collect())
    assert [(r.round_id, r.priority, r.canonical_url) for r in log] == \
        oracle_run.fetch_order()
    shutil.rmtree(root)


def test_resume_reregisters_bucketed_replay_table(spark, tmp_path_factory,
                                                  oracle_run):
    """A resume in a *fresh session* re-registers the bucketed replay
    table from the files at the store's committed path (parquet carries
    no bucket metadata, so the catalog entry must be rebuilt via CREATE
    TABLE ... CLUSTERED BY ... LOCATION) and still converges to the
    oracle's seen set.  A fresh session is simulated by dropping the
    catalog entry between runs — exactly what a new SparkSession's empty
    in-memory catalog looks like to the resume path."""
    import hashlib
    root = str(tmp_path_factory.mktemp("rereg"))
    store = StateStore(root)
    pages = datagen.pages_df(spark, N).cache()
    robots = datagen.robots_df(spark)
    plan = plan_from_templates([datagen.template_body()])
    spec = BloomSpec(n_blocks=64)

    rounds.crawl(spark, store, pages, robots, plan, datagen.seeds(N),
                 max_rounds=2, spec=spec)
    tbl = "replay_pages_" + hashlib.md5(root.encode()).hexdigest()[:10]
    assert spark.catalog.tableExists(tbl)
    spark.sql("DROP TABLE %s" % tbl)  # external table: files survive

    resumed = StateStore(root)
    rounds.crawl(spark, resumed, pages, robots, plan, datagen.seeds(N),
                 max_rounds=MAX_ROUNDS, spec=spec)
    # re-registered with bucket metadata intact (not a plain scan)
    assert spark.catalog.tableExists(tbl)
    ddl = spark.sql("SHOW CREATE TABLE %s" % tbl).first()[0]
    assert "CLUSTERED BY" in ddl and "64 BUCKETS" in ddl
    seen = resumed.read_rounds(spark, rounds.SEEN).collect()
    assert sorted(r.canonical_url for r in seen) == oracle_run.seen_urls()
    shutil.rmtree(root)


def test_compaction_preserves_crawl(spark, tmp_path_factory, oracle_run):
    """Folding delta chains into base snapshots every 2 rounds changes
    neither the fetch order nor the seen set, and a kill after a
    compaction still resumes to the identical final state."""
    root = str(tmp_path_factory.mktemp("compact"))
    store = StateStore(root)
    pages = datagen.pages_df(spark, N).cache()
    robots = datagen.robots_df(spark)
    plan = plan_from_templates([datagen.template_body()])
    spec = BloomSpec(n_blocks=64)

    # run 3 rounds (a compaction fires after round 2), then "kill"
    rounds.crawl(spark, store, pages, robots, plan, datagen.seeds(N),
                 max_rounds=3, spec=spec, compact_every=2)
    assert store.ledger().get("compacted", {}) \
        .get(rounds.SEEN, {}).get("through_round") == 2

    # resume to completion, compacting as it goes
    resumed = StateStore(root)
    rounds.crawl(spark, resumed, pages, robots, plan, datagen.seeds(N),
                 max_rounds=MAX_ROUNDS, spec=spec, compact_every=2)

    seen = resumed.read_rounds(spark, rounds.SEEN).collect()
    assert sorted(r.canonical_url for r in seen) == oracle_run.seen_urls()
    log = (resumed.read_rounds(spark, rounds.FETCH_LOG)
           .orderBy("round_id", "priority", "canonical_url").collect())
    assert [(r.round_id, r.priority, r.canonical_url) for r in log] == \
        oracle_run.fetch_order()
    # the chain really is bounded: the seen reader unions base + only
    # rounds after through_round
    base = resumed.ledger()["compacted"][rounds.SEEN]
    assert base["through_round"] >= 2
    shutil.rmtree(root)


def test_canonicalize_fast_path_matches_slow_path(spark):
    """The plain-URL regex fast path must agree with the urlsplit path
    on every URL shape, including the adversarial ones."""
    from scrapely_spark.frontier.canonical import (canonicalize_df,
                                                   canonicalize_with_host)

    urls = [
        "http://h1.example.com/item/1",           # plain — fast path
        "http://h1.example.com/item/1?b=2&a=1",   # query → sort
        "http://h1.example.com/item/1#frag",      # fragment → strip
        "HTTP://H1.Example.COM/Item/1",           # case folding
        "http://h1.example.com:80/x",             # default port
        "https://h1.example.com:8443/x",          # explicit port
        "http://h1.example.com",                  # empty path → '/'
        "http://h1.example.com/",                 # plain with bare slash
        "http://user:pw@h1.example.com/x",        # userinfo
        "http://h1.example.com/UPPER/Case.html",  # uppercase path (kept)
        "http://h1.example.com/x%20y",            # percent-encoding kept
        "http://h1.example.com/x y",              # raw space → slow path
        " http://h1.example.com/x ",              # surrounding whitespace
        "http://h1.example.com/#",                # lone fragment
        "http://h1.example.com/x?",               # lone query
        "http://[::1]:8080/x",                    # IPv6 literal
        "http://h1.example.com:99999/x",          # out-of-range port
        "http://h1.example.com:not-a-port/x",     # non-numeric port
        "ftp://h1.example.com/x",                 # non-http scheme
        "",                                       # empty
        None,                                     # null
        "http://h1.example.com/item/%d" % 7,
        "http://h1.example.com/x\n",              # trailing newline (re '$' trap)
        "http://h1.example.com/x\r\n",            # CRLF tail
        "http://h1.example.com/a\nb",             # embedded newline
        "\nhttp://h1.example.com/x",              # leading newline
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url: (r.canonical_url, r.host)
           for r in canonicalize_df(df).collect()}
    for u in urls:
        want = canonicalize_with_host(u)
        assert got[u] == want, (u, got[u], want)


def test_crawl_emits_image_bytes_and_captions_end_to_end(spark, spark_run):
    """The north-star acceptance sentence, as one pipeline: crawl →
    extracted records → join the image store on the extracted image URL
    → decode the joined bytes → decoded pixels hit PSNR ≥ 40 dB vs the
    regenerable ground truth (exact for lossless) AND the caption
    equals the ground truth, for every fetched page."""
    from pyspark.sql import functions as F

    from scrapely_spark.spark import codec

    ext = (spark_run.read_rounds(spark, rounds.EXTRACTED)
           .withColumn("image_id",
                       F.regexp_extract("image_url", r"(img-\d+)", 1)))
    images = datagen.images_df(spark, N).select("image_id", "bytes", "fmt")
    joined = ext.join(F.broadcast(images), "image_id", "inner")

    rows = joined.select("image_id", "caption", "bytes", "fmt").collect()
    assert len(rows) == ext.count()  # every extracted page found its image
    assert len(rows) > 300
    page_of = {}  # image_id -> page index (image_meta is 1:1 with pages)
    for i in range(N):
        page_of[datagen.image_meta(i)[0]] = i
    for r in rows:
        pixels, w, h, fmt = codec.decode_image(bytes(r.bytes))
        truth = codec.pixels_for(r.image_id, w, h)
        if fmt == "png":
            assert (pixels == truth).all(), r.image_id
        else:
            assert codec.psnr(pixels, truth) >= 40.0, r.image_id
        assert r.caption == datagen.caption_for(page_of[r.image_id])


def test_robots_txt_roundtrip_and_parser_semantics(spark):
    """Raw robots.txt text → parse_robots_df → exactly the rules table
    the gate consumes; plus parser group/edge semantics."""
    from scrapely_spark.frontier.robots import (parse_robots_body,
                                                parse_robots_df)

    n = 40
    bodies = spark.createDataFrame(
        [(datagen.robots_record(h)["host"], datagen.robots_txt(h))
         for h in range(n)], "host string, body string")
    got = {r.host: (list(r.allow), list(r.disallow), r.crawl_delay)
           for r in parse_robots_df(bodies).collect()}
    for h in range(n):
        rec = datagen.robots_record(h)
        assert got[rec["host"]] == (rec["allow"], rec["disallow"],
                                    rec["crawl_delay"]), h

    # group selection: exact agent beats *, * beats nothing
    body = ("User-agent: goodbot\nDisallow: /only-good\n\n"
            "User-agent: *\nDisallow: /everyone\nCrawl-delay: 5\n")
    assert parse_robots_body(body, "goodbot")["disallow"] == ["/only-good"]
    assert parse_robots_body(body)["disallow"] == ["/everyone"]
    assert parse_robots_body(body)["crawl_delay"] == 5.0
    assert parse_robots_body(body, "otherbot")["disallow"] == ["/everyone"]

    # multi-agent group header; empty Disallow means allow-all;
    # junk crawl-delay falls back to the default
    body2 = ("User-agent: a\nUser-agent: b\nDisallow:\n"
             "Crawl-delay: soon\n")
    parsed = parse_robots_body(body2, "b")
    assert parsed["disallow"] == []
    assert parsed["crawl_delay"] == 1.0
    # no matching group at all → allow everything
    assert parse_robots_body("User-agent: x\nDisallow: /\n", "y") == {
        "allow": [], "disallow": [], "crawl_delay": 1.0}
    # empty / None bodies
    assert parse_robots_body("")["disallow"] == []
    assert parse_robots_body(None)["disallow"] == []


def test_canonicalize_fast_path_fuzz():
    """Hypothesis fuzz: the batch kernel's regex split must agree with
    the urlsplit twin on arbitrary URL-ish strings (no Spark needed —
    this drives the same code the kernel body runs per batch)."""
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from scrapely_spark.frontier import canonical

    def kernel_twin(urls):
        col = pd.Series(urls, dtype=object)
        ext = col.str.extract(canonical._PLAIN_RE)
        out = col.to_numpy(dtype=object, copy=True)
        host = ext[1].to_numpy(dtype=object)
        for i in np.flatnonzero(ext[1].isna().to_numpy()):
            out[i], host[i] = canonical.canonicalize_with_host(out[i])
        return list(zip(out, host))

    alphabet = st.sampled_from(list("abAB019./:?#@&=%~ _-[]\t\n\r"))
    frag = st.text(alphabet=alphabet, max_size=12)
    url = st.one_of(
        frag,
        st.tuples(st.sampled_from(["http", "https", "HTTP", "ftp"]),
                  frag).map(lambda t: "%s://%s" % t),
        st.tuples(frag, frag, frag).map(
            lambda t: "http://%s/%s?%s" % t))

    @settings(max_examples=300, deadline=None)
    @given(st.lists(url, min_size=1, max_size=8))
    def check(urls):
        got = kernel_twin(urls)
        want = [canonical.canonicalize_with_host(u) for u in urls]
        assert got == want, (urls, got, want)

    check()


def test_discover_links_survives_hostile_hrefs():
    """No href shape may crash the extraction kernel."""
    from scrapely_spark.html.page import HtmlPage
    from scrapely_spark.frontier.rounds import discover_links

    body = "".join('<a href="%s">x</a>' % h for h in [
        "http://ok.example.com/a",
        "//[",                       # urljoin raises ValueError on this
        "http://[",                  # unparseable but absolute — kept,
                                     # canonicalization drops it later
        "relative/path",
        "mailto:x@example.com",
        "javascript:void(0)",
        "#frag-only",
        "",
    ])
    page = HtmlPage(url="http://base.example.com/dir/", body=body)
    links = discover_links(page)
    assert "http://ok.example.com/a" in links
    assert "http://base.example.com/dir/relative/path" in links
    assert not any(l.startswith(("mailto", "javascript")) for l in links)


def test_host_pagerank_over_crawled_link_graph(spark, spark_run):
    # crawl → persisted host link graph → authority: the composition
    # the scheduler would use for priority.  Checked against the pure-
    # Python power iteration on the exact same collected edge list.
    from scrapely_spark.spark import graph
    from test_graph_and_search import _pagerank_twin

    edges = (spark_run.read_rounds(spark, rounds.LINKS)
             .select("src", "dst"))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    assert pairs, "crawl produced no link edges"
    # every edge endpoint is a crawled-corpus host (canonicalized form)
    hosts = {h for e in pairs for h in e}
    assert all(h == h.lower() and "." in h for h in hosts)
    got = {r.node: r.rank for r in graph.pagerank(edges).collect()}
    want = _pagerank_twin(pairs)
    assert set(got) == set(want)
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_url_template_mining_finds_trap_families(spark):
    # a calendar trap (same template, unbounded numbers) collapses to
    # one row whose n_urls exposes it; distinct static pages stay apart
    from scrapely_spark.frontier.canonical import (canonicalize_df,
                                                   url_template_stats)
    urls = ["http://t.example.com/cal/2026/%d/%d" % (m, d)
            for m in range(1, 5) for d in range(1, 11)]
    urls += ["http://t.example.com/about", "http://t.example.com/faq9"]
    df = canonicalize_df(spark.createDataFrame(
        [(u,) for u in urls], "url string"))
    got = {r.path_template: (r.n_urls, r.example_url)
           for r in url_template_stats(df).collect()}
    assert got["/cal/N/N/N"][0] == 40
    assert got["/cal/N/N/N"][1] == "http://t.example.com/cal/2026/1/1"
    assert got["/about"][0] == 1
    assert got["/faqN"][0] == 1
    assert len(got) == 3


def test_url_template_mining_random_twin(spark):
    # seeded random URL families vs the direct python definition
    import random
    import re
    from collections import defaultdict
    from scrapely_spark.frontier.canonical import (canonicalize,
                                                   canonicalize_df,
                                                   url_template_stats)
    rng = random.Random(9)
    segs = ["item", "cal", "page", "u42x", "x"]
    urls = []
    for _ in range(300):
        path = "/".join(
            rng.choice(segs) if rng.random() < 0.6
            else str(rng.randrange(10_000))
            for _ in range(rng.randint(1, 4)))
        urls.append("http://h%d.example.com/%s" % (rng.randrange(3), path))
    want = defaultdict(lambda: [0, None])
    for u in urls:
        c = canonicalize(u)
        host = c.split("://")[1].split("/")[0]
        path = re.match(r"^[a-z]+://[^/]+(/[^?#]*)", c).group(1)
        tpl = re.sub(r"[0-9]+", "N", path)
        slot = want[(host, tpl)]
        slot[0] += 1
        slot[1] = c if slot[1] is None else min(slot[1], c)
    got = {(r.host, r.path_template): [r.n_urls, r.example_url]
           for r in url_template_stats(canonicalize_df(
               spark.createDataFrame([(u,) for u in urls],
                                     "url string"))).collect()}
    assert got == dict(want)


# --------------------------------------------------------------------------
# round 4: PageRank-driven prioritization + template budget (oracle parity)
# --------------------------------------------------------------------------

AUTH_N = 300
AUTH_ROUNDS = 18
AUTH_LEVELS = 4
AUTH_BUDGET = 5   # bites hard: item-page families per host exceed it


@pytest.fixture(scope="module")
def auth_oracle_run():
    return OracleCrawl(AUTH_N, datagen.seeds(AUTH_N),
                       authority_levels=AUTH_LEVELS,
                       template_budget=AUTH_BUDGET).run(AUTH_ROUNDS)


@pytest.fixture(scope="module")
def auth_spark_run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("authcrawl"))
    store = StateStore(root)
    pages = datagen.pages_df(spark, AUTH_N).cache()
    robots = datagen.robots_df(spark)
    plan = plan_from_templates([datagen.template_body()])
    rounds.crawl(spark, store, pages, robots, plan, datagen.seeds(AUTH_N),
                 max_rounds=AUTH_ROUNDS, spec=BloomSpec(n_blocks=64),
                 authority_levels=AUTH_LEVELS,
                 template_budget=AUTH_BUDGET)
    return store


def test_authority_fetch_order_byte_identical(spark, auth_oracle_run,
                                              auth_spark_run):
    """The loop closure: integer PageRank over the crawled host graph
    feeds the politeness priority, and the recorded composite
    priorities (depth·levels + auth_bucket) match the pure-Python
    oracle bit for bit — i.e. both engines computed identical ranks."""
    got = (auth_spark_run.read_rounds(spark, rounds.FETCH_LOG)
           .orderBy("round_id", "priority", "canonical_url").collect())
    assert [(r.round_id, r.priority, r.canonical_url) for r in got] == \
        auth_oracle_run.fetch_order()


def test_authority_seen_set_byte_identical(spark, auth_oracle_run,
                                           auth_spark_run):
    seen = auth_spark_run.read_rounds(spark, rounds.SEEN).collect()
    assert sorted(r.canonical_url for r in seen) == \
        auth_oracle_run.seen_urls()


def test_authority_actually_discriminates(auth_oracle_run):
    # the composite priorities must show more than one bucket in use —
    # otherwise the PageRank feedback was vacuous in this corpus
    buckets = {p % AUTH_LEVELS for _, p, _ in
               auth_oracle_run.fetch_order()}
    assert len(buckets) > 1, buckets


def test_template_budget_caps_families(auth_oracle_run):
    # with budget=5, no round enqueues more than 5 URLs of one
    # (host, template) family — verified on the oracle's own seen set
    # growth (the Spark side is byte-identical by the tests above)
    from scrapely_spark.frontier.canonical import path_template_of
    from urllib.parse import urlsplit
    fams: dict = {}
    for canon in auth_oracle_run.seen_urls():
        host = (urlsplit(canon).hostname or "").lower()
        fams.setdefault((host, path_template_of(canon)), []).append(canon)
    # seeds bypass the budget (they are enqueued, not discovered); any
    # family containing only discovered URLs grew ≤ budget·rounds
    n_rounds = max(r for r, _, _ in auth_oracle_run.fetch_order())
    seeds = {canonicalize(u) for u in datagen.seeds(AUTH_N)}
    for (host, tpl), members in fams.items():
        discovered = [m for m in members if m not in seeds]
        assert len(discovered) <= AUTH_BUDGET * n_rounds, (host, tpl)


# --------------------------------------------------------------------------
# round 5: adaptive crawl-delay + global fetch budget in the loop
# (oracle parity — the operators that existed standalone now govern
# the actual fetch schedule, closed the same way authority mode was)
# --------------------------------------------------------------------------

ADAPT_N = 240
ADAPT_ROUNDS = 12
ADAPT_BUDGET = 40   # global per-round fetches: well under the
#                     unconstrained batch, so the water-fill bites


@pytest.fixture(scope="module")
def adapt_oracle_run():
    return OracleCrawl(ADAPT_N, datagen.seeds(ADAPT_N),
                       adaptive_delay=True,
                       budget_fetches=ADAPT_BUDGET).run(ADAPT_ROUNDS)


@pytest.fixture(scope="module")
def adapt_spark_run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("adaptcrawl"))
    store = StateStore(root)
    pages = datagen.pages_df(spark, ADAPT_N).cache()
    robots = datagen.robots_df(spark)
    plan = plan_from_templates([datagen.template_body()])
    rounds.crawl(spark, store, pages, robots, plan,
                 datagen.seeds(ADAPT_N), max_rounds=ADAPT_ROUNDS,
                 spec=BloomSpec(n_blocks=64),
                 adaptive_delay=True, budget_fetches=ADAPT_BUDGET)
    return store


def test_adaptive_budget_fetch_order_byte_identical(spark,
                                                    adapt_oracle_run,
                                                    adapt_spark_run):
    """The loop closure: the p95-latency adaptive delay AND the
    water-filled global budget both feed the politeness selection, and
    the recorded fetch order matches the pure-python oracle bit for
    bit — i.e. both engines computed identical p95 ranks, identical
    water levels, and identical largest-remainder top-ups."""
    got = (adapt_spark_run.read_rounds(spark, rounds.FETCH_LOG)
           .orderBy("round_id", "priority", "canonical_url").collect())
    assert [(r.round_id, r.priority, r.canonical_url) for r in got] == \
        adapt_oracle_run.fetch_order()


def test_adaptive_budget_seen_set_byte_identical(spark,
                                                 adapt_oracle_run,
                                                 adapt_spark_run):
    seen = adapt_spark_run.read_rounds(spark, rounds.SEEN).collect()
    assert sorted(r.canonical_url for r in seen) == \
        adapt_oracle_run.seen_urls()


def test_adaptive_delay_actually_bites(adapt_oracle_run):
    # with adaptive off (same budget), the schedule must differ —
    # otherwise the latency signal never moved a single fetch and the
    # parity above would be vacuous
    base = OracleCrawl(ADAPT_N, datagen.seeds(ADAPT_N),
                       budget_fetches=ADAPT_BUDGET).run(ADAPT_ROUNDS)
    assert base.fetch_order() != adapt_oracle_run.fetch_order()


def test_budget_spends_exactly(adapt_oracle_run):
    # exact integer spend: no round exceeds the global budget, and
    # while the frontier has demand the budget is spent in full (a
    # bare floor of the water-fill would strand fractional budget —
    # the largest-remainder top-up is what makes this equality hold)
    from collections import Counter
    per_round = Counter(r for r, _, _ in adapt_oracle_run.fetch_order())
    assert max(per_round.values()) <= ADAPT_BUDGET
    assert ADAPT_BUDGET in per_round.values()


def test_budget_huge_is_identity():
    # a global budget at least the total demand must reproduce the
    # unconstrained schedule byte-for-byte (alloc == demand clears
    # every host to its politeness budget)
    n, r = 120, 6
    a = OracleCrawl(n, datagen.seeds(n), budget_fetches=10**9).run(r)
    b = OracleCrawl(n, datagen.seeds(n)).run(r)
    assert a.fetch_order() == b.fetch_order()
    assert a.seen_urls() == b.seen_urls()


def test_budget_caps_py_matches_spark(spark):
    # the python twin and the Spark budget_caps agree on a table with
    # hot/zero/fractional hosts — including who wins the top-up
    rows = [("a", 50, 10), ("b", 3, 10), ("c", 7, 1),
            ("d", 0, 5), ("e", 9, 0), ("f", 11, 3)]
    df = spark.createDataFrame(
        rows, "host string, demand long, weight_micro long")
    for budget in (1, 2, 7, 23, 60, 500):
        got = {r["host"]: r["cap_fetches"] for r in
               politeness.budget_caps(df, budget).collect()}
        want = politeness.budget_caps_py(rows, budget)
        assert got == want, budget
        spent = sum(got.values())
        total_d = sum(d for _, d, w in rows if w > 0)
        # exact spend: Σ cap == min(B, Σ demand over positive weight)
        assert spent == min(budget, total_d), budget
        # a zero-weight host never wins a fetch, even from the top-up
        assert got["e"] == 0, budget


def test_adaptive_budget_resume_after_kill(spark, tmp_path_factory,
                                           adapt_oracle_run):
    """Both signals derive from committed state (fetch log rounds),
    so a killed job resumed mid-crawl recomputes identical p95 delays
    and identical caps and converges to the same artifacts."""
    root = str(tmp_path_factory.mktemp("adaptresume"))
    store = StateStore(root)
    pages = datagen.pages_df(spark, ADAPT_N).cache()
    robots = datagen.robots_df(spark)
    plan = plan_from_templates([datagen.template_body()])
    kwargs = dict(spec=BloomSpec(n_blocks=64), adaptive_delay=True,
                  budget_fetches=ADAPT_BUDGET)
    rounds.crawl(spark, store, pages, robots, plan,
                 datagen.seeds(ADAPT_N), max_rounds=4, **kwargs)
    resumed = StateStore(root)
    rounds.crawl(spark, resumed, pages, robots, plan,
                 datagen.seeds(ADAPT_N), max_rounds=ADAPT_ROUNDS,
                 **kwargs)
    log = (resumed.read_rounds(spark, rounds.FETCH_LOG)
           .orderBy("round_id", "priority", "canonical_url").collect())
    assert [(r.round_id, r.priority, r.canonical_url) for r in log] == \
        adapt_oracle_run.fetch_order()
    shutil.rmtree(root)


def test_cap_template_families_calendar_trap(spark):
    """The calendar-trap fixture: an unbounded /cal/Y/M/D family is
    cut to the budget on the total key while static pages survive."""
    from scrapely_spark.frontier.canonical import (canonicalize_df,
                                                   cap_template_families)
    urls = ["http://t.example.com/cal/2026/%d/%d" % (m, d)
            for m in range(1, 5) for d in range(1, 11)]          # 40 trap
    urls += ["http://t.example.com/about", "http://t.example.com/faq9"]
    cands = (canonicalize_df(spark.createDataFrame(
        [(u,) for u in urls], "url string"))
        .withColumn("priority", F.lit(1)))
    got = sorted(r.canonical_url for r in
                 cap_template_families(cands, 3).collect())
    trap = sorted(u for u in urls if "/cal/" in u)[:3]
    assert got == sorted(trap + ["http://t.example.com/about",
                                 "http://t.example.com/faq9"])


def test_authority_resume_after_kill(spark, tmp_path_factory,
                                     auth_oracle_run):
    """Authority mode derives its signal from committed LINKS state, so
    a killed job resumed mid-crawl recomputes the identical PageRank
    buckets and converges to the same byte-identical artifacts."""
    root = str(tmp_path_factory.mktemp("authresume"))
    store = StateStore(root)
    pages = datagen.pages_df(spark, AUTH_N).cache()
    robots = datagen.robots_df(spark)
    plan = plan_from_templates([datagen.template_body()])
    spec = BloomSpec(n_blocks=64)
    kwargs = dict(spec=spec, authority_levels=AUTH_LEVELS,
                  template_budget=AUTH_BUDGET)
    rounds.crawl(spark, store, pages, robots, plan, datagen.seeds(AUTH_N),
                 max_rounds=3, **kwargs)
    resumed = StateStore(root)
    rounds.crawl(spark, resumed, pages, robots, plan,
                 datagen.seeds(AUTH_N), max_rounds=AUTH_ROUNDS, **kwargs)
    seen = resumed.read_rounds(spark, rounds.SEEN).collect()
    assert sorted(r.canonical_url for r in seen) == \
        auth_oracle_run.seen_urls()
    log = (resumed.read_rounds(spark, rounds.FETCH_LOG)
           .orderBy("round_id", "priority", "canonical_url").collect())
    assert [(r.round_id, r.priority, r.canonical_url) for r in log] == \
        auth_oracle_run.fetch_order()
    shutil.rmtree(root)


# ----------------------------------------------------------- sitemaps

def test_sitemap_urls_extracts_and_classifies(spark):
    from scrapely_spark.frontier import sitemaps
    rows = [
        ("https://a/s.xml",
         "<urlset><url><loc>https://a/p1</loc></url>"
         "<url><loc>\n   https://a/p2 \t</loc></url></urlset>"),
        ("https://b/idx.xml",
         "<sitemapindex><sitemap><loc>https://b/s1.xml</loc></sitemap>"
         "<sitemap><loc> https://b/s2.xml</loc></sitemap>"
         "</sitemapindex>"),
        ("https://c/empty.xml", "<urlset></urlset>"),
    ]
    df = spark.createDataFrame(rows, "sitemap_url string, body string")
    out = {(r.sitemap_url, r.url, r.is_index)
           for r in sitemaps.sitemap_urls(df).collect()}
    assert out == {
        ("https://a/s.xml", "https://a/p1", False),
        ("https://a/s.xml", "https://a/p2", False),
        ("https://b/idx.xml", "https://b/s1.xml", True),
        ("https://b/idx.xml", "https://b/s2.xml", True),
    }


# ------------------------------------------------------- retry_schedule

def test_retry_schedule_trailing_runs_and_backoff(spark):
    from datetime import datetime
    from scrapely_spark.frontier import politeness

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # u1: fail, success, fail, fail -> trailing run of 2
        ("u1", t(1), False), ("u1", t(2), True),
        ("u1", t(3), False), ("u1", t(4), False),
        # u2: never succeeded, 7 failures -> give_up, delay capped
        *[("u2", t(i), False) for i in range(1, 8)],
        # u3: latest fetch succeeded -> healthy, not emitted
        ("u3", t(1), False), ("u3", t(2), True),
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, "
                                     "ok boolean")
    out = {r.url: r for r in politeness.retry_schedule(
        df, base_delay_s=60, max_retries=5).collect()}
    assert set(out) == {"u1", "u2"}
    u1 = out["u1"]
    assert (u1.n_failures, u1.give_up) == (2, False)
    # last failure at :04, backoff 60s * 2^(2-1) = 120s
    assert u1.next_attempt_us - u1.last_failure_us == 120 * 1_000_000
    u2 = out["u2"]
    assert (u2.n_failures, u2.give_up) == (7, True)
    # exponent capped at max_retries: 60s * 2^4
    assert u2.next_attempt_us - u2.last_failure_us == 960 * 1_000_000


# ----------------------------------------------------- recrawl_schedule

def test_recrawl_schedule_change_rates_and_clamps(spark):
    from datetime import datetime, timedelta
    from scrapely_spark.frontier import politeness

    t0 = datetime(2024, 1, 1)
    rows = []
    # hot: changes every fetch, 1h apart -> interval 1h/1.1 clamps UP
    # to min_interval (1h)
    for i in range(5):
        rows.append(("hot", t0 + timedelta(hours=i), "h%d" % i))
    # static: never changes, 1h apart -> 1h/0.1 = 10h
    for i in range(5):
        rows.append(("static", t0 + timedelta(hours=i), "same"))
    # lazy: never changes, 20d apart -> 200d clamps DOWN to 30d max
    for i in range(3):
        rows.append(("lazy", t0 + timedelta(days=20 * i), "same"))
    # once: single fetch -> excluded
    rows.append(("once", t0, "x"))
    df = spark.createDataFrame(rows, "url string, ts timestamp, "
                                     "content_hash string")
    out = {r.url: r for r in politeness.recrawl_schedule(df).collect()}
    assert set(out) == {"hot", "static", "lazy"}
    from pyspark.sql import functions as SF
    last = {r.url: r.l for r in df.groupBy("url").agg(
        SF.max(SF.unix_micros(SF.col("ts"))).alias("l")).collect()}
    hour_us = 3600 * 1_000_000
    hot = out["hot"]
    assert (hot.n_fetches, hot.n_changes, hot.change_ratio) == (5, 4, 1.0)
    assert hot.next_fetch_us - last["hot"] == hour_us  # clamped to min
    st = out["static"]
    assert (st.n_changes, st.change_ratio) == (0, 0.0)
    assert st.next_fetch_us - last["static"] == 10 * hour_us
    lz = out["lazy"]
    assert lz.next_fetch_us - last["lazy"] == 30 * 24 * hour_us


# ------------------------------------------------------ robots_sitemaps

def test_robots_sitemaps_extraction(spark):
    from scrapely_spark.frontier import robots
    rows = [
        ("a", "User-agent: *\nDisallow: /x\n"
              "Sitemap: https://a/s1.xml\n"
              "  SITEMAP :  https://a/s2.xml   # trailing comment\n"
              "# Sitemap: https://a/commented.xml"),
        ("b", "User-agent: bot\nDisallow: /"),
        ("c", "sitemap:https://c/s.xml"),
    ]
    df = spark.createDataFrame(rows, "host string, body string")
    out = {(r.host, r.sitemap_url)
           for r in robots.robots_sitemaps(df).collect()}
    assert out == {
        ("a", "https://a/s1.xml"),
        ("a", "https://a/s2.xml"),
        ("c", "https://c/s.xml"),
    }


# ------------------------------------------------- adaptive_crawl_delay

def test_adaptive_crawl_delay_nearest_rank_and_clamp(spark):
    rows = (
        # h_fast: 20 fetches at 1..20ms — p95 = rank ceil(19)=19 → 19ms;
        # 2×19ms = 38ms clamps UP to the 500ms floor
        [("h_fast", i * 1000) for i in range(1, 21)]
        # h_slow: 10 fetches at 1..10s — p95 = rank ceil(9.5)=10 → 10s;
        # 2×10s = 20s clamps DOWN to the 10s ceiling
        + [("h_slow", i * 1_000_000) for i in range(1, 11)]
        # h_one: a single 3s fetch — p95 = rank 1 → 3s; 2×3s = 6s passes
        + [("h_one", 3_000_000)]
    )
    df = spark.createDataFrame(rows, "host string, latency_us long")
    out = {r.host: r for r in
           politeness.adaptive_crawl_delay(df).collect()}
    assert out["h_fast"].p95_latency_us == 19_000
    assert out["h_fast"].crawl_delay_us == 500_000
    assert out["h_slow"].p95_latency_us == 10_000_000
    assert out["h_slow"].crawl_delay_us == 10_000_000
    assert out["h_one"].n_fetches == 1
    assert out["h_one"].crawl_delay_us == 6_000_000


def test_adaptive_crawl_delay_rank_is_integer_exact(spark):
    # n=100: rank (95*100+99) div 100 = 95 exactly (no float ceil)
    df = spark.createDataFrame([("h", i) for i in range(1, 101)],
                               "host string, latency_us long")
    r, = politeness.adaptive_crawl_delay(df).collect()
    assert (r.n_fetches, r.p95_latency_us) == (100, 95)


# --------------------------------------------- crawl_budget_allocation

def test_crawl_budget_weighted_water_filling(spark):
    # B=100 over three hosts: big (demand 1000, w 1), hot (demand 10,
    # w 10), mid (demand 60, w 2).  hot caps at 10 (ratio 1);
    # remaining 90 split 1:2 by weight → big 30, mid 60 (mid exactly
    # caps).  Σ alloc == B.
    df = spark.createDataFrame(
        [("big", 1000, 1), ("hot", 10, 10), ("mid", 60, 2)],
        "host string, demand long, weight_micro long")
    out = {r.host: r.alloc_fetches for r in
           politeness.crawl_budget_allocation(df, 100).collect()}
    assert out == {"hot": 10.0, "mid": 60.0, "big": 30.0}
    assert abs(sum(out.values()) - 100) < 1e-9


def test_crawl_budget_zero_weight_hosts_sidelined(spark):
    # a weight-0 host takes no share and must not poison the water
    # level (its demand/weight ratio is NULL in Spark and would sort
    # first, entering every prefix sum): with 'a' at weight 0 the
    # level over (b, c) is 9 — b caps at 1, c takes 9, Σ == B
    df = spark.createDataFrame(
        [("a", 100, 0), ("b", 1, 1), ("c", 50, 1)],
        "host string, demand long, weight_micro long")
    out = {r.host: r.alloc_fetches for r in
           politeness.crawl_budget_allocation(df, 10).collect()}
    assert out == {"a": 0.0, "b": 1.0, "c": 9.0}
    # all-zero weights: nobody is eligible, nothing is spent
    df0 = spark.createDataFrame(
        [("a", 5, 0), ("b", 7, 0)],
        "host string, demand long, weight_micro long")
    out0 = {r.host: r.alloc_fetches for r in
            politeness.crawl_budget_allocation(df0, 10).collect()}
    assert out0 == {"a": 0.0, "b": 0.0}


def test_crawl_budget_surplus_serves_all_demand(spark):
    df = spark.createDataFrame(
        [("a", 5, 1), ("b", 7, 3)],
        "host string, demand long, weight_micro long")
    out = {r.host: r.alloc_fetches for r in
           politeness.crawl_budget_allocation(df, 1000).collect()}
    assert out == {"a": 5.0, "b": 7.0}


def test_crawl_budget_matches_simulation(spark):
    # property vs a direct bisection solve of Σ min(d, L·w) = B
    import random
    rng = random.Random(7)
    rows = [(f"h{i}", rng.randint(1, 500), rng.randint(1, 20))
            for i in range(40)]
    B = 3000
    lo, hi = 0.0, 1e9
    for _ in range(200):
        mid = (lo + hi) / 2
        if sum(min(d, mid * w) for _, d, w in rows) < B:
            lo = mid
        else:
            hi = mid
    want = {h: min(d, hi * w) for h, d, w in rows}
    df = spark.createDataFrame(rows,
                               "host string, demand long, "
                               "weight_micro long")
    got = {r.host: r.alloc_fetches for r in
           politeness.crawl_budget_allocation(df, B).collect()}
    for h in want:
        assert abs(got[h] - want[h]) < 1e-3, (h, got[h], want[h])
    assert abs(sum(got.values()) - B) < 1e-3


# ------------------------------------------------------- rfc9309_gate

def test_rfc9309_wildcard_and_anchor_semantics(spark):
    from scrapely_spark.frontier import robots as rb
    rules = spark.createDataFrame(
        [("h", "disallow", "/private/*"),
         ("h", "allow", "/private/pub*"),      # longer → wins inside
         ("h", "disallow", "/*.pdf$"),          # anchored extension ban
         ("h", "disallow", "")],                # empty: ignored
        "host string, rule_type string, pattern string")
    urls = spark.createDataFrame(
        [("h", "http://h/private/secret"),     # blocked
         ("h", "http://h/private/pub/ok"),     # allow overrides
         ("h", "http://h/doc/report.pdf"),     # blocked ($ anchor)
         ("h", "http://h/doc/report.pdfx"),    # NOT blocked ($ anchor)
         ("h", "http://h/open/page"),          # no rule → allowed
         ("h", "http://h")],                   # empty path → "/"
        "host string, url string")
    out = {r.url: (r.allowed, r.rule_len)
           for r in rb.rfc9309_gate(urls, rules).collect()}
    assert out["http://h/private/secret"] == (False, 10)
    assert out["http://h/private/pub/ok"] == (True, 13)
    assert out["http://h/doc/report.pdf"] == (False, 7)
    assert out["http://h/doc/report.pdfx"] == (True, 0)
    assert out["http://h/open/page"] == (True, 0)
    assert out["http://h"] == (True, 0)


def test_rfc9309_gate_matches_query_strings(spark):
    # RFC match target is path + query (fragment stripped): the
    # standard '/*?sessionid=' DUST ban must fire, and a bare '?'
    # after the authority normalizes to '/?...'
    from scrapely_spark.frontier import robots as rb
    rules = spark.createDataFrame(
        [("h", "disallow", "/*?sessionid="),
         ("h", "disallow", "/?lang=*")],
        "host string, rule_type string, pattern string")
    urls = spark.createDataFrame(
        [("h", "http://h/page?sessionid=abc"),   # blocked via query
         ("h", "http://h/page?other=1"),          # allowed
         ("h", "http://h?lang=en"),               # empty path + query
         ("h", "http://h/page?sessionid=x#frag")],  # fragment stripped
        "host string, url string")
    out = {r.url: r.allowed
           for r in rb.rfc9309_gate(urls, rules).collect()}
    assert out["http://h/page?sessionid=abc"] is False
    assert out["http://h/page?other=1"] is True
    assert out["http://h?lang=en"] is False
    assert out["http://h/page?sessionid=x#frag"] is False


def test_robots_groups_merge_rfc9309(spark):
    # RFC 9309 2.2.1 across every twin: two exact-agent groups merge
    # their rules; crawl-delay resolves to the FIRST numeric line of
    # the merged groups in document order
    from scrapely_spark.frontier import robots as rb
    body = ("User-agent: bot\nDisallow: /a\n\n"
            "User-agent: *\nDisallow: /star\n\n"
            "User-agent: bot\nDisallow: /never\nCrawl-delay: 7\n")
    rec = rb.parse_robots_body(body, "bot")
    assert rec["disallow"] == ["/a", "/never"]
    assert rec["crawl_delay"] == 7.0
    assert sorted(rb.wildcard_rules_py(body, "bot")) == [
        ("disallow", "/a"), ("disallow", "/never")]
    bodies = spark.createDataFrame([("h", body)],
                                   "host string, body string")
    got = sorted((r.rule_type, r.pattern) for r in
                 rb.wildcard_rules_df(bodies, "bot").collect())
    assert got == [("disallow", "/a"), ("disallow", "/never")]
    delays = {r.host: r.crawl_delay for r in
              rb.crawl_delay_df(bodies, "bot").collect()}
    assert delays == {"h": 7.0}
    # star agents merge star groups only
    assert rb.wildcard_rules_py(body, "unknown") == [
        ("disallow", "/star")]


def test_rfc9309_gate_matches_python_twin_randomized(spark):
    import random
    from scrapely_spark.frontier import robots as rb
    rng = random.Random(11)
    segs = ["a", "bb", "c1", "img", "cal", "x.y", "p+q"]
    pats = []
    for _ in range(25):
        p = "/" + "/".join(rng.choice(segs)
                           for _ in range(rng.randint(1, 3)))
        if rng.random() < 0.5:
            p = p.replace("/", "/*", 1) if rng.random() < 0.5 else p + "*"
        if rng.random() < 0.3:
            p += "$"
        pats.append((rng.choice(["allow", "disallow"]), p))
    paths = ["/" + "/".join(rng.choice(segs)
                            for _ in range(rng.randint(1, 4)))
             for _ in range(60)]
    rules = spark.createDataFrame([("h", t, p) for t, p in pats],
                                  "host string, rule_type string, "
                                  "pattern string")
    urls = spark.createDataFrame([("h", "http://h" + p) for p in paths],
                                 "host string, url string")
    got = {r.url: r.allowed
           for r in rb.rfc9309_gate(urls, rules).collect()}
    for p in paths:
        assert got["http://h" + p] == rb.is_allowed_rfc9309(p, pats), p


# --------------------------------------------------- wildcard_rules_df

_ROBOTS_BODY = (
    "# synthetic robots\r\n"
    "User-agent: scrapelybot\n"
    "User-agent: otherbot\n"          # consecutive UA lines: one group
    "Disallow: /private/*   # inline comment\n"
    "Allow: /private/pub*\n"
    "Crawl-delay: 5\n"
    "User-agent: scrapelybot\n"       # later exact group: MERGED (RFC)
    "Disallow: /never\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /*.pdf$\n"
    "Disallow:\n"                     # empty value: dropped
    "noise line without separator\n")


def test_wildcard_rules_group_selection(spark):
    from scrapely_spark.frontier import robots as rb
    bodies = spark.createDataFrame([("h", _ROBOTS_BODY)],
                                   "host string, body string")
    got = sorted((r.rule_type, r.pattern) for r in
                 rb.wildcard_rules_df(bodies, "ScrapelyBot").collect())
    # RFC 9309 2.2.1: BOTH scrapelybot groups merge (the later group's
    # /never ban applies too); the * group is excluded
    assert got == [("allow", "/private/pub*"),
                   ("disallow", "/never"),
                   ("disallow", "/private/*")]
    star = sorted((r.rule_type, r.pattern) for r in
                  rb.wildcard_rules_df(bodies, "unknownbot").collect())
    assert star == [("disallow", "/*.pdf$")]
    # python twin agrees on both agents
    assert sorted(rb.wildcard_rules_py(_ROBOTS_BODY, "ScrapelyBot")) == got
    assert sorted(rb.wildcard_rules_py(_ROBOTS_BODY, "unknownbot")) == star


def test_wildcard_rules_crawl_delay_splits_groups(spark):
    from scrapely_spark.frontier import robots as rb
    # crawl-delay counts as a rule for boundaries (parse_robots_body
    # parity): UA after it starts a NEW group
    body = ("User-agent: a\nCrawl-delay: 2\n"
            "User-agent: b\nDisallow: /x\n")
    bodies = spark.createDataFrame([("h", body)],
                                   "host string, body string")
    assert rb.wildcard_rules_df(bodies, "a").count() == 0
    got = [(r.rule_type, r.pattern) for r in
           rb.wildcard_rules_df(bodies, "b").collect()]
    assert got == [("disallow", "/x")]
    assert rb.wildcard_rules_py(body, "a") == []
    assert rb.wildcard_rules_py(body, "b") == [("disallow", "/x")]
    # no group at all -> no rows (allow-all at the gate)
    none = spark.createDataFrame([("h", "Disallow: /pre-group\n")],
                                 "host string, body string")
    assert rb.wildcard_rules_df(none, "a").count() == 0


def test_wildcard_rules_randomized_parity(spark):
    import random
    from scrapely_spark.frontier import robots as rb
    rng = random.Random(23)
    agents = ["alpha", "beta", "*"]
    keys = ["Allow", "Disallow", "Crawl-delay"]
    bodies = []
    for h in range(30):
        lines = []
        for _ in range(rng.randint(0, 14)):
            roll = rng.random()
            if roll < 0.3:
                lines.append("User-agent: %s" % rng.choice(agents))
            elif roll < 0.85:
                val = rng.choice(["/a/*", "/b$", "", "/c/d", "/*.gif$"])
                lines.append("%s: %s" % (rng.choice(keys), val))
            else:
                lines.append(rng.choice(["# comment", "junk", ""]))
        bodies.append(("h%d" % h, "\n".join(lines)))
    df = spark.createDataFrame(bodies, "host string, body string")
    got = {}
    for r in rb.wildcard_rules_df(df, "beta").collect():
        got.setdefault(r.host, []).append((r.rule_type, r.pattern))
    for h, body in bodies:
        want = rb.wildcard_rules_py(body, "beta")
        assert sorted(got.get(h, [])) == sorted(want), (h, body)


def test_wildcard_rules_feed_gate_end_to_end(spark):
    from scrapely_spark.frontier import robots as rb
    bodies = spark.createDataFrame([("h", _ROBOTS_BODY)],
                                   "host string, body string")
    urls = spark.createDataFrame(
        [("h", "http://h/private/pub/ok"), ("h", "http://h/private/x"),
         ("h", "http://h/never")],
        "host string, url string")
    rules = rb.wildcard_rules_df(bodies, "scrapelybot")
    out = {r.url: r.allowed
           for r in rb.rfc9309_gate(urls, rules).collect()}
    assert out == {"http://h/private/pub/ok": True,
                   "http://h/private/x": False,
                   # RFC 9309 2.2.1: the second scrapelybot group's
                   # rule merges in and blocks /never
                   "http://h/never": False}


# -------------------------------------------------- revalidation_plan

def test_revalidation_plan_actions_and_headers(spark):
    from scrapely_spark.frontier.revalidation import revalidation_plan
    day = 86_400_000_000
    now = 200 * day
    rows = [
        # max-age 1h, fetched 10 days ago -> stale, has etag
        ("a", now - 10 * day, 3600, 'W/"a"', now - 50 * day),
        # max-age huge -> fresh despite age (clamped to 7d... age 1d)
        ("b", now - 1 * day, 10 * 86400, None, None),
        # no max-age, lastmod 30 days before fetch -> heuristic 3d,
        # age 1d -> fresh
        ("c", now - 1 * day, None, None, now - 31 * day),
        # same but age 5d > 3d heuristic -> stale, no etag -> lastmod
        ("d", now - 5 * day, None, None, now - 35 * day),
        # nothing at all, age 2d > default 1d -> refetch
        ("e", now - 2 * day, None, None, None),
        # fetched in the FUTURE (clock skew) -> age clamps to 0, fresh
        ("f", now + day, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetched_us long, max_age_s long, "
              "etag string, last_modified_us long")
    got = {r.url: r for r in revalidation_plan(df, now).collect()}
    assert got["a"].action == "revalidate_etag"
    assert got["a"].if_none_match == 'W/"a"'
    assert got["a"].if_modified_since_us is None
    assert got["b"].action == "fresh"
    # max-age clamps to the 7-day ceiling
    assert got["b"].ttl_s == 7 * 86400
    assert got["c"].action == "fresh"
    assert got["c"].ttl_s == 3 * 86400  # 10% of 30 days
    assert got["d"].action == "revalidate_lastmod"
    assert got["d"].if_modified_since_us == now - 35 * day
    assert got["d"].if_none_match is None
    assert got["e"].action == "refetch"
    assert got["e"].ttl_s == 86400
    assert got["f"].action == "fresh" and got["f"].age_s == 0


# --------------------------------------------------- dust_param_rules

def test_dust_param_rules_semantics(spark):
    from scrapely_spark.frontier.canonical import dust_param_rules
    # sessionid never changes content; page does; ref is irrelevant
    # but has only singleton groups on host h2 (no witness -> not a rule)
    rows = []
    for page in range(3):
        for sess in range(3):
            rows.append(("h1",
                         "http://h1/p?page=%d&sessionid=%d" % (page, sess),
                         "fp-%d" % page))
    rows += [("h2", "http://h2/p?ref=%d&x=%d" % (i, i), "fp") for i in
             range(3)]
    rows.append(("h2", "http://h2/noquery", "fp"))  # dropped (no '?')
    df = spark.createDataFrame(rows, "host string, url string, "
                                     "fingerprint string")
    got = {(r.host, r.param): r for r in dust_param_rules(df).collect()}
    sess = got[("h1", "sessionid")]
    assert (sess.n_groups, sess.n_witness, sess.n_clean,
            sess.irrelevant) == (3, 3, 3, True)
    page = got[("h1", "page")]
    assert (page.n_groups, page.n_witness, page.n_clean,
            page.irrelevant) == (3, 3, 0, False)
    # h2: ref/x residuals are all distinct -> no witness groups
    assert got[("h2", "ref")].irrelevant is False
    assert got[("h2", "ref")].n_witness == 0
    assert ("h2", "") not in got  # the no-query row contributed nothing


def test_dust_param_rules_mixed_and_repeated(spark):
    from scrapely_spark.frontier.canonical import dust_param_rules
    rows = [
        # repeated key in one URL: both values strip to one residual
        ("h", "http://h/p?a=1&a=2&b=7", "f1"),
        ("h", "http://h/p?a=3&b=7", "f1"),
        # b witnesses with DIFFERENT fingerprints -> dirty witness
        ("h", "http://h/q?b=1&c=5", "g1"),
        ("h", "http://h/q?b=2&c=5", "g2"),
    ]
    df = spark.createDataFrame(rows, "host string, url string, "
                                     "fingerprint string")
    got = {(r.host, r.param): r for r in dust_param_rules(df).collect()}
    a = got[("h", "a")]
    assert a.n_witness == 1 and a.n_clean == 1 and a.irrelevant
    b = got[("h", "b")]
    # b has one dirty witness group (the /q pair) and one clean
    # non-witness (/p group has b=7 twice -> 1 distinct value)
    assert b.n_witness == 1 and b.n_clean == 0 and not b.irrelevant


# ------------------------------------------------------- crawl_tiers

def test_crawl_tiers_assignment_and_shares(spark):
    from scrapely_spark.frontier.politeness import crawl_tiers
    rows = [("h%d" % i, float(100 - i)) for i in range(8)]
    df = spark.createDataFrame(rows, "host string, score double")
    got = {r.host: (r.tier, r.tier_share)
           for r in crawl_tiers(df, n_tiers=4).collect()}
    # 8 hosts into 4 tiers of 2, in score order
    assert got["h0"][0] == 1 and got["h1"][0] == 1
    assert got["h6"][0] == 4 and got["h7"][0] == 4
    # geometric shares: 8/15, 4/15, 2/15, 1/15
    assert abs(got["h0"][1] - 8 / 15) < 1e-12
    assert abs(got["h7"][1] - 1 / 15) < 1e-12
    shares = {t: s for t, s in got.values()}
    assert abs(sum(shares.values()) - 1.0) < 1e-12
    # tie on score -> host ascending breaks it deterministically
    tied = spark.createDataFrame([("b", 1.0), ("a", 1.0)],
                                 "host string, score double")
    t = {r.host: r.tier for r in crawl_tiers(tied, n_tiers=2).collect()}
    assert t == {"a": 1, "b": 2}


# ----------------------------------------------------- snapshot_diff

def test_snapshot_diff_statuses(spark):
    from scrapely_spark.frontier.politeness import snapshot_diff
    old = spark.createDataFrame(
        [("u1", "h", "a"), ("u2", "h", "b"), ("u3", "h", "c")],
        "url string, host string, content_hash string")
    new = spark.createDataFrame(
        [("u1", "h", "a"), ("u2", "h", "B2"), ("u4", "h", "d")],
        "url string, host string, content_hash string")
    got = {r.url: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed",
                   "u3": "removed", "u4": "added"}
    # host survives on both exclusive sides
    hosts = {r.url: r.host for r in snapshot_diff(old, new).collect()}
    assert hosts["u3"] == "h" and hosts["u4"] == "h"


# ---------------------------------------------------- crawl_delay_df

def test_crawl_delay_group_resolution(spark):
    from scrapely_spark.frontier import robots as rb
    bodies = spark.createDataFrame([
        # exact group carries delay 2.5; * group carries 9 — exact wins
        ("h1", "User-agent: bot\nCrawl-delay: 2.5\nDisallow: /x\n"
               "User-agent: *\nCrawl-delay: 9\n"),
        # first crawl-delay line in the group wins
        ("h2", "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 7\n"),
        # non-numeric -> default
        ("h3", "User-agent: *\nCrawl-delay: fast\n"),
        # no directive at all -> default
        ("h4", "User-agent: *\nDisallow: /y\n"),
        # no group for us -> default
        ("h5", "User-agent: elsebot\nCrawl-delay: 4\n"),
    ], "host string, body string")
    got = {r.host: r.crawl_delay
           for r in rb.crawl_delay_df(bodies, "bot").collect()}
    assert got == {"h1": 2.5, "h2": 3.0, "h3": 1.0, "h4": 1.0,
                   "h5": 1.0}
    # parse_robots_body agreement on the exact-group case
    body1 = bodies.collect()[0].body
    assert rb.parse_robots_body(body1, "bot")["crawl_delay"] == 2.5


# --------------------------------------------------------- htmlmeta

def test_meta_robots_flags(spark):
    from scrapely_spark.frontier import htmlmeta
    rows = [
        ("p1", '<html><META NAME="robots" content="NOINDEX, nofollow">'),
        ("p2", "<meta content='nofollow' name=robots><p>x</p>"),
        ("p3", '<meta name="robots" content="index, follow">'),
        ("p4", '<meta name="viewport" content="w=1"><p>no robots</p>'),
        ("p5", "<meta name=robots content=none>"),
        # first tag wins over a later contradictory one
        ("p6", '<meta name=robots content="noindex">'
               '<meta name=robots content="index">'),
        # DOCUMENT order decides, not attribute-order precedence: the
        # first tag spells content-before-name and must still win
        ("p7", '<meta content="noindex" name="robots">'
               '<meta name="robots" content="index">'),
        ("p8", '<meta name=robots content=noindex>'
               '<meta name="robots" content="index">'),
        # name value matched exactly: a prefixed name never fires
        ("p9", '<meta name="robotsdb" content="noindex">'),
        ("p10", "<meta name=robotsdb content=noindex>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r.url: (r.noindex, r.nofollow)
           for r in htmlmeta.meta_robots(df).collect()}
    assert got == {"p1": (True, True), "p2": (False, True),
                   "p3": (False, False), "p4": (False, False),
                   "p5": (True, True), "p6": (True, False),
                   "p7": (True, False), "p8": (True, False),
                   "p9": (False, False), "p10": (False, False)}


def test_rel_canonical_and_chain(spark):
    from scrapely_spark.frontier import htmlmeta
    from scrapely_spark.spark.graph import resolve_redirects
    rows = [
        ("http://h/a", '<link rel="canonical" href="http://h/b">'),
        ("http://h/b", "<link href='http://h/c' rel=canonical>"),
        ("http://h/c", "<p>terminal</p>"),
        ("http://h/d", '<link rel="stylesheet" href="http://h/css">'),
        # rel is a space-separated token LIST: multi-token values count
        ("http://h/e", '<link rel="alternate canonical" '
                       'href="http://h/master">'),
        # ... but a rel token merely PREFIXED with canonical does not
        ("http://h/f", '<link rel="canonicalized" href="http://h/x">'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {r.url: r.canonical_href
           for r in htmlmeta.rel_canonical(df).collect()}
    assert out == {"http://h/a": "http://h/b",
                   "http://h/b": "http://h/c",
                   "http://h/c": None, "http://h/d": None,
                   "http://h/e": "http://h/master",
                   "http://h/f": None}
    edges = (htmlmeta.rel_canonical(df)
             .where("canonical_href IS NOT NULL")
             .selectExpr("url AS src", "canonical_href AS dst"))
    chased = {r.url: (r.final_url, r.hops, r.resolved)
              for r in resolve_redirects(edges).collect()}
    assert chased["http://h/a"] == ("http://h/c", 2, True)


# ------------------------------------------- sitemap_lastmod_refetch

def test_sitemap_lastmod_refetch(spark):
    from scrapely_spark.frontier.sitemaps import sitemap_lastmod_refetch
    body = ("<urlset>"
            "<url><loc> http://h/a </loc>"
            "<lastmod>2024-03-01T00:00:00</lastmod></url>"
            "<url><loc>http://h/b</loc>"
            "<lastmod>2024-01-01T00:00:00</lastmod></url>"
            "<url><loc>http://h/c</loc></url>"          # no lastmod
            "<url><loc>http://h/d</loc>"
            "<lastmod>garbage</lastmod></url>"          # unparsable
            "<url><loc>http://h/e</loc>"
            "<lastmod>2024-03-01T00:00:00</lastmod></url>"
            "</urlset>")
    bodies = spark.createDataFrame([("http://h/sm.xml", body)],
                                   "sitemap_url string, body string")
    state = spark.createDataFrame(
        [("http://h/a", "2024-02-01 00:00:00"),   # stale (lastmod newer)
         ("http://h/b", "2024-02-01 00:00:00"),   # fresh -> dropped
         ("http://h/c", "2024-02-01 00:00:00"),   # no lastmod -> dropped
         ("http://h/d", "2024-02-01 00:00:00")],  # junk lastmod -> dropped
        "url string, fetched_at string")
    got = {r.url: r.reason
           for r in sitemap_lastmod_refetch(bodies, state).collect()}
    assert got == {"http://h/a": "stale", "http://h/e": "new"}


def test_registrable_domain_psl_semantics(spark):
    from scrapely_spark.frontier.canonical import registrable_domain

    hosts = spark.createDataFrame(
        [("www.example.co.uk",), ("shop.example.co.uk",),
         ("a.blogspot.com",), ("b.blogspot.com",),
         ("foo.github.io",), ("github.io",),
         ("a.b.c.deep.org",), ("corp.internal",), ("internal",),
         ("example.com",)], "host string")
    out = {r["host"]: r for r in registrable_domain(hosts).collect()}

    # multi-label suffix: one registrant across subdomains
    assert out["www.example.co.uk"]["public_suffix"] == "co.uk"
    assert out["www.example.co.uk"]["registrable_domain"] \
        == "example.co.uk"
    assert out["shop.example.co.uk"]["registrable_domain"] \
        == "example.co.uk"
    # private-registry suffix: each subdomain its OWN registrant
    assert out["a.blogspot.com"]["public_suffix"] == "blogspot.com"
    assert out["a.blogspot.com"]["registrable_domain"] \
        == "a.blogspot.com"
    assert out["b.blogspot.com"]["registrable_domain"] \
        == "b.blogspot.com"
    assert out["foo.github.io"]["registrable_domain"] == "foo.github.io"
    # a bare public suffix has no registrant
    assert out["github.io"]["registrable_domain"] is None
    # deep chains: registrable is exactly eTLD+1
    assert out["a.b.c.deep.org"]["registrable_domain"] == "deep.org"
    # unknown TLD: the PSL implicit * rule (last label is the suffix)
    assert out["corp.internal"]["public_suffix"] == "internal"
    assert out["corp.internal"]["registrable_domain"] == "corp.internal"
    assert out["internal"]["registrable_domain"] is None
    assert out["example.com"]["registrable_domain"] == "example.com"


def test_registrable_domain_plan_is_broadcast_only(spark):
    from scrapely_spark.frontier.canonical import registrable_domain

    hosts = spark.createDataFrame([("a.example.com",)], "host string")
    plan = registrable_domain(hosts)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_subdomain_explosion_flags_wildcard_farm(spark):
    from scrapely_spark.frontier.canonical import subdomain_explosion

    rows = [("sub%d.spam-farm.com" % i,) for i in range(150)]
    rows += [("www.example.com",), ("mail.example.com",),
             ("github.io",)]
    hosts = spark.createDataFrame(rows, "host string")
    out = {r["registrable_domain"]: r
           for r in subdomain_explosion(
               hosts, max_hosts_per_domain=100).collect()}
    assert out["spam-farm.com"]["n_hosts"] == 150
    assert out["spam-farm.com"]["suspect"] is True
    assert out["example.com"]["n_hosts"] == 2
    assert out["example.com"]["suspect"] is False
    assert "github.io" not in out  # bare suffix: nothing to budget


def test_template_families_group_by_structure_not_content(spark):
    from scrapely_spark.frontier.htmlmeta import (layout_fingerprint,
                                                  template_families)

    art = "<html><body><h1>%s</h1><p>%s</p></body></html>"
    lst = "<html><body><ul><li>%s</li><li>%s</li></ul></body></html>"
    rows = [("h1", 1, art % ("A", "aaa")),
            ("h1", 2, art % ("B", "bbb")),
            ("h1", 3, art % ("C", "ccc")),
            ("h1", 4, lst % ("x", "y")),
            ("h2", 5, art % ("D", "ddd"))]
    pages = spark.createDataFrame(
        rows, "host string, page_id long, html string")

    fps = {r["page_id"]: r["layout_fp"]
           for r in layout_fingerprint(pages).collect()}
    # same template, different text → same fingerprint
    assert fps[1] == fps[2] == fps[3] == fps[5]
    assert fps[1] != fps[4]

    fams = template_families(pages).collect()
    byhost = {}
    for r in fams:
        byhost.setdefault(r["host"], []).append(r)
    h1 = sorted(byhost["h1"], key=lambda r: r["family_rank"])
    assert len(h1) == 2
    assert h1[0]["n_pages"] == 3 and h1[0]["example_id"] == 1
    assert h1[0]["share_ppm"] == 750000
    assert h1[1]["n_pages"] == 1 and h1[1]["share_ppm"] == 250000
    assert [r["family_rank"] for r in h1] == [1, 2]
    assert byhost["h2"][0]["share_ppm"] == 1000000


def test_layout_fingerprint_is_shuffle_free(spark):
    from scrapely_spark.frontier.htmlmeta import layout_fingerprint

    pages = spark.createDataFrame(
        [("h", 1, "<html><body></body></html>")],
        "host string, page_id long, html string")
    plan = layout_fingerprint(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_soft404_probe_signature_and_phrase(spark):
    from scrapely_spark.frontier.htmlmeta import soft404

    err = "<html><title>Welcome</title><body>redirecting…</body></html>"
    rows = [
        # probe establishes h1's error signature (content says Welcome!)
        ("http://h1/__probe_zzz", "h1", 200, err, True),
        # dead URL served with the same template + 200 → soft404 via
        # signature even though no phrase matches
        ("http://h1/gone", "h1", 200, err, False),
        # real page, unique content → clean
        ("http://h1/ok", "h1", 200,
         "<html><title>Doc</title><body>text</body></html>", False),
        # phrase arm: no probe needed
        ("http://h2/missing", "h2", 200,
         "<html><title>404 Not Found</title></html>", False),
        # honest 404: status gate keeps it out
        ("http://h2/honest", "h2", 404,
         "<html><title>404 Not Found</title></html>", False),
        # h2's template matching h1's signature must NOT fire (per-host)
        ("http://h2/other", "h2", 200, err, False),
        # a probe answered with a real 404 contributes no signature
        ("http://h3/__probe_zzz", "h3", 404, err, True),
        ("http://h3/page", "h3", 200, err, False),
    ]
    pages = spark.createDataFrame(
        rows, "url string, host string, status int, html string, "
              "is_probe boolean")
    out = {r["url"]: r for r in soft404(pages).collect()}

    assert "http://h1/__probe_zzz" not in out      # probes excluded
    assert out["http://h1/gone"]["sig_match"] is True
    assert out["http://h1/gone"]["is_soft404"] is True
    assert out["http://h1/gone"]["phrase_hit"] is False
    assert out["http://h1/ok"]["is_soft404"] is False
    assert out["http://h2/missing"]["phrase_hit"] is True
    assert out["http://h2/missing"]["is_soft404"] is True
    assert out["http://h2/honest"]["is_soft404"] is False
    assert out["http://h2/other"]["sig_match"] is False
    assert out["http://h3/page"]["sig_match"] is False


def test_soft404_plan_broadcasts_signatures(spark):
    from scrapely_spark.frontier.htmlmeta import soft404

    pages = spark.createDataFrame(
        [("u", "h", 200, "<html></html>", False)],
        "url string, host string, status int, html string, "
        "is_probe boolean")
    plan = soft404(pages)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_main_content_density_rule(spark):
    from scrapely_spark.frontier.htmlmeta import main_content

    html = (
        '<html><body>'
        '<nav><a href="/a">Home</a> <a href="/b">About us</a></nav>'
        '<p>This is the long main article text that we want to keep '
        'intact.</p>'
        '<p>Second paragraph with an inline <a href="/x">reference '
        'link</a> inside a mostly-text block that survives the '
        'density rule.</p>'
        '<div>ok</div>'
        '<footer><a href="/c">Privacy</a> <a href="/d">Terms</a> '
        'legal</footer></body></html>')
    df = spark.createDataFrame([("u1", html)],
                               "url string, html string")
    row = main_content(df).collect()[0]
    assert row["n_blocks"] == 5
    assert row["n_kept"] == 2
    lines = row["content"].split("\n")
    assert lines[0].startswith("This is the long main article")
    # inline tags stripped, whitespace collapsed, anchor text kept
    assert "reference link" in lines[1]
    assert "<a" not in row["content"]
    assert "Privacy" not in row["content"]   # footer dropped
    assert "Home" not in row["content"]      # nav dropped
    assert row["content_chars"] == len(row["content"])


def test_main_content_card_anchor_across_blocks(spark):
    """A card-style anchor wraps block elements (<a><div>..</div></a>
    — nav rails, related-article cards): the block split severs it, so
    the complete-pair regex sees neither half.  The open-anchor state
    carried across blocks must still count that text as anchored, and
    the density gate must drop it."""
    from scrapely_spark.frontier.htmlmeta import main_content

    html = (
        '<html><body>'
        '<a href="/card"><div>Breaking: the card teaser text that is '
        'long enough to pass the length gate</div></a>'
        '<p>The genuine article body text that the page is actually '
        'about, which must survive.</p>'
        # anchor opens in one block and closes in the NEXT block:
        # the pre-close text of the second block is anchored, the
        # post-close text keeps the block mostly prose
        '<div>short tail</div>'
        '</body></html>')
    df = spark.createDataFrame([("u1", html)],
                               "url string, html string")
    row = main_content(df).collect()[0]
    assert "card teaser" not in row["content"]
    assert "genuine article body" in row["content"]
    # open-anchor carry must not leak past the closing </a>: the
    # following blocks are plain prose again
    html2 = (
        '<html><body>'
        '<a href="/c"><div>all of this teaser text is inside a card '
        'anchor and must drop</div></a>'
        '<p>Prose after the card has closed is plain text again and '
        'long enough to keep.</p></body></html>')
    df2 = spark.createDataFrame([("u2", html2)],
                                "url string, html string")
    row2 = main_content(df2).collect()[0]
    assert row2["n_kept"] == 1
    assert row2["content"].startswith("Prose after the card")


def test_main_content_threshold_boundaries(spark):
    from scrapely_spark.frontier.htmlmeta import main_content

    # exactly min_chars survives; one below does not
    t25 = "x" * 25
    t24 = "y" * 24
    # anchor share exactly at the per-mille cap survives (<=):
    # 10 anchor chars in 30 text chars with cap 334 → 10000 <= 10020
    body = "<p>%s</p><p>%s</p><p><a>aaaaaaaaaa</a>%s</p>" % (
        t25, t24, "z" * 19)
    df = spark.createDataFrame(
        [("u", "<html><body>%s</body></html>" % body)],
        "url string, html string")
    out = main_content(df, min_chars=25, max_link_ppt=334) \
        .collect()[0]
    kept = out["content"].split("\n")
    assert t25 in kept
    assert all(t24 not in k for k in kept)
    # anchor text is part of the block text ("aaaaaaaaaa zzz…")
    assert any(k.startswith("aaaaaaaaaa") for k in kept)
    assert out["n_kept"] == 2

    # one per-mille over the cap → dropped
    out2 = main_content(df, min_chars=25, max_link_ppt=333) \
        .collect()[0]
    assert out2["n_kept"] == 1


def test_main_content_empty_and_tagless(spark):
    from scrapely_spark.frontier.htmlmeta import main_content

    df = spark.createDataFrame(
        [("e", ""), ("t", "no markup at all but a perfectly long "
                          "plain text sentence here")],
        "url string, html string")
    out = {r["url"]: r for r in main_content(df).collect()}
    assert out["e"]["n_blocks"] == 0
    assert out["e"]["content"] == ""
    assert out["t"]["n_kept"] == 1   # whole page is one block


def test_main_content_block_heavy_page(spark):
    """A template-heavy page (thousands of block splits — large
    tables, list rails) must be linear in the block count: the
    anchor-localize pre-pass replaced the per-block prefix-sum folds
    that made this O(blocks²).  4,000 blocks, half of them card
    anchors spanning the block boundary, completes in seconds and
    counts exactly."""
    from scrapely_spark.frontier.htmlmeta import main_content

    n = 2000
    cards = "".join(
        '<a href="/c%d"><div>card teaser number %d dropped by the '
        'density gate as boilerplate</div></a>' % (i, i)
        for i in range(n))
    prose = "".join(
        "<p>Genuine paragraph %d with enough plain prose text to "
        "clear the length gate comfortably.</p>" % i
        for i in range(n))
    df = spark.createDataFrame(
        [("u", "<html><body>%s%s</body></html>" % (cards, prose))],
        "url string, html string")
    row = main_content(df).collect()[0]
    assert row["n_blocks"] == 2 * n
    assert row["n_kept"] == n
    assert "card teaser" not in row["content"]
    assert row["content"].count("Genuine paragraph") == n


def test_main_content_is_shuffle_free(spark):
    from scrapely_spark.frontier.htmlmeta import main_content

    df = spark.createDataFrame([("u", "<p>x</p>")],
                               "url string, html string")
    plan = main_content(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


def test_retry_plan_classes_and_backoff(spark):
    from scrapely_spark.frontier.retry import retry_plan

    rows = [
        ("u200", "h", 200, 1, 1_000_000, None),
        ("u301", "h", 301, 2, 1_000_000, None),
        ("u404", "h", 404, 1, 1_000_000, None),
        ("u403", "h", 403, 1, 1_000_000, None),
        ("u500", "h", 500, 1, 1_000_000, None),      # 60s backoff
        ("u503", "h", 503, 3, 1_000_000, None),      # 240s backoff
        ("u429", "h", 429, 1, 1_000_000, 600),       # Retry-After wins
        ("u408", "h", 408, 2, 1_000_000, 30),        # backoff wins
        ("unet", "h", None, 1, 1_000_000, None),     # network error
        ("uexh", "h", 500, 5, 1_000_000, None),      # budget exhausted
        ("ucap", "h", 500, 4, 1_000_000, None),      # hits 480 < 3600
    ]
    df = spark.createDataFrame(
        rows, "url string, host string, status int, attempt int, "
              "t_us long, retry_after_s int")
    out = {r["url"]: r for r in retry_plan(df).collect()}

    assert out["u200"]["action"] == "done"
    assert out["u200"]["retry_at_us"] is None
    assert out["u301"]["err_class"] == "redirect"
    assert out["u404"]["action"] == "dead"
    assert out["u403"]["err_class"] == "permanent"
    assert out["u500"]["action"] == "retry"
    assert out["u500"]["backoff_s"] == 60
    assert out["u500"]["retry_at_us"] == 1_000_000 + 60 * 1_000_000
    assert out["u503"]["backoff_s"] == 240          # 60 << 2
    assert out["u429"]["backoff_s"] == 600          # server lower bound
    assert out["u408"]["backoff_s"] == 120          # 60 << 1 > 30
    assert out["unet"]["status"] == 0
    assert out["unet"]["err_class"] == "transient"
    assert out["unet"]["action"] == "retry"
    assert out["uexh"]["action"] == "dead"
    assert out["uexh"]["retry_at_us"] is None


def test_retry_plan_clamps_at_max_delay(spark):
    from scrapely_spark.frontier.retry import retry_plan

    df = spark.createDataFrame(
        [("u", "h", 500, 9, 0, None)],
        "url string, host string, status int, attempt int, "
        "t_us long, retry_after_s int")
    out = retry_plan(df, max_attempts=20).collect()[0]
    assert out["backoff_s"] == 3600     # 60 << 8 = 15360 clamped


def test_retry_plan_is_shuffle_free(spark):
    from scrapely_spark.frontier.retry import retry_plan

    df = spark.createDataFrame(
        [("u", "h", 500, 1, 0, None)],
        "url string, host string, status int, attempt int, "
        "t_us long, retry_after_s int")
    plan = retry_plan(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


def test_host_circuit_thresholds(spark):
    from scrapely_spark.frontier.retry import host_circuit

    rows = []
    # hdown: 20 attempts, 11 failures → 550 ppt → suspended
    rows += [("u%d" % i, "hdown", 500 if i < 11 else 200, 1, 0, None)
             for i in range(20)]
    # hedge: 20 attempts, exactly 10 failures → 500 ppt, not > 500
    rows += [("u%d" % i, "hedge", 500 if i < 10 else 200, 1, 0, None)
             for i in range(20)]
    # hfew: 2 attempts, both failures → under the attempts floor
    rows += [("u%d" % i, "hfew", 0, 1, 0, None) for i in range(2)]
    df = spark.createDataFrame(
        rows, "url string, host string, status int, attempt int, "
              "t_us long, retry_after_s int")
    out = {r["host"]: r for r in host_circuit(df).collect()}
    assert out["hdown"]["suspended"] is True
    assert out["hdown"]["failure_ppt"] == 550
    assert out["hedge"]["suspended"] is False
    assert out["hedge"]["failure_ppt"] == 500
    assert out["hfew"]["suspended"] is False
    assert out["hfew"]["failure_ppt"] == 1000


def test_charset_sniff_precedence(spark):
    from scrapely_spark.frontier.htmlmeta import charset_sniff

    rows = [
        # BOM beats a lying header AND a lying meta
        ("bom8", bytearray(b"\xef\xbb\xbf<meta charset=latin1>"),
         "text/html; charset=shift_jis"),
        ("bom16le", bytearray(b"\xff\xfex\x00"), None),
        ("bom16be", bytearray(b"\xfe\xffx\x00"), None),
        # header beats meta
        ("http", bytearray(b'<meta charset="EUC-KR">'),
         "text/html; charset=Windows-1252"),
        # meta (both spellings), alias-normalized
        ("meta1", bytearray(b'<html><META CHARSET="Shift_JIS">'), None),
        ("meta2", bytearray(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=gb2312">'), "text/html"),
        # xml declaration
        ("xml", bytearray(
            b'<?xml version="1.0" encoding="ISO8859-1"?><doc/>'), None),
        # nothing → default
        ("none", bytearray(b"<html><body>plain</body></html>"), None),
    ]
    df = spark.createDataFrame(
        rows, "url string, body binary, content_type string")
    out = {r["url"]: (r["charset"], r["charset_source"])
           for r in charset_sniff(df).collect()}
    assert out["bom8"] == ("utf-8", "bom")
    assert out["bom16le"] == ("utf-16le", "bom")
    assert out["bom16be"] == ("utf-16be", "bom")
    assert out["http"] == ("windows-1252", "http")
    assert out["meta1"] == ("shift_jis", "meta")
    assert out["meta2"] == ("gbk", "meta")
    assert out["xml"] == ("iso-8859-1", "xml")
    assert out["none"] == ("utf-8", "default")


def test_charset_sniff_prescan_window_and_plan(spark):
    from scrapely_spark.frontier.htmlmeta import charset_sniff

    # a meta tag BEYOND the prescan window must not be seen —
    # exactly what a streaming parser cannot buffer for
    far = b"<html>" + b" " * 1100 + b'<meta charset="big5">'
    near = b"<html>" + b" " * 100 + b'<meta charset="big5">'
    df = spark.createDataFrame(
        [("far", bytearray(far), None), ("near", bytearray(near), None)],
        "url string, body binary, content_type string")
    out = {r["url"]: (r["charset"], r["charset_source"])
           for r in charset_sniff(df).collect()}
    assert out["far"] == ("utf-8", "default")
    assert out["near"] == ("big5", "meta")

    plan = charset_sniff(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


def test_page_ingest_composition(spark):
    from scrapely_spark.frontier.htmlmeta import page_ingest

    prose = ("This is a long and perfectly reasonable article body "
             "with enough characters to clear the minimum content "
             "gate comfortably, twice over.")
    nav = '<nav><a href="/a">Home</a> <a href="/b">About</a></nav>'
    mk = lambda body: "<html><body>%s<p>%s</p></body></html>" % (nav,
                                                                 body)
    rows = [
        ("http://s/1", mk(prose)),            # canonical (min url)
        ("http://s/2", mk(prose)),            # exact dup after extract
        # same prose but different chrome — still a dup: dedup runs
        # on the EXTRACTED content, not the raw html
        ("http://s/3", "<html><body><footer><a href='/x'>Terms</a>"
                       "</footer><p>%s</p></body></html>" % prose),
        ("http://s/4", mk("unique and long enough body text that is "
                          "clearly distinct from the shared prose and "
                          "also clears the minimum-length content "
                          "gate")),
        ("http://s/5", mk("tiny")),           # short → gated
        ("http://s/6", nav),                  # chrome only → short
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {r["url"]: r for r in page_ingest(df).collect()}

    assert out["http://s/1"]["kept"] is True
    assert out["http://s/1"]["drop_reason"] is None
    assert out["http://s/2"]["drop_reason"] == "duplicate"
    assert out["http://s/2"]["canonical_url"] == "http://s/1"
    assert out["http://s/3"]["drop_reason"] == "duplicate"
    assert out["http://s/4"]["kept"] is True
    assert out["http://s/5"]["drop_reason"] == "short"
    assert out["http://s/5"]["content_fp"] is None
    assert out["http://s/6"]["drop_reason"] == "short"
    # exactly one Exchange (the fingerprint window); extraction and
    # the gate ride the scan
    plan = page_ingest(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert plan.count("Exchange") <= 2   # window exchange (+AQE read)


def test_punycode_matches_stdlib_reference():
    import random

    from scrapely_spark.frontier.canonical import (idn_ascii_host,
                                                   punycode_encode)

    # RFC 3492-pinned well-known encodings
    assert punycode_encode("münchen") == "mnchen-3ya"
    assert punycode_encode("bücher") == "bcher-kva"
    assert punycode_encode("中国") == "fiqs8s"
    assert punycode_encode("рф") == "p1ai"
    assert punycode_encode("ドメイン") == "eckwd4c7c"

    # property parity vs the stdlib punycode codec (the reference
    # implementation shipped with CPython)
    random.seed(11)
    pool = (list(range(97, 123))
            + [0xFC, 0xE9, 0x4E2D, 0x56FD, 0x440, 0x444, 0x3B1,
               0x30C9, 0x1F600])
    for _ in range(1500):
        s = "".join(chr(random.choice(pool))
                    for _ in range(random.randint(1, 12)))
        assert punycode_encode(s) == \
            s.encode("punycode").decode("ascii"), s

    # host canonicalizer: case fold, per-label, idempotent
    assert idn_ascii_host("MÜNCHEN.Example.COM") \
        == "xn--mnchen-3ya.example.com"
    assert idn_ascii_host("www.example.com") == "www.example.com"
    h = idn_ascii_host("рф.ru")
    assert idn_ascii_host(h) == h


def test_idn_hosts_kernel_over_spark(spark):
    from scrapely_spark.frontier.canonical import idn_hosts

    df = spark.createDataFrame(
        [("münchen.de",), ("Plain.Example.COM",), ("中国.cn",)],
        "host string")
    out = {r["host"]: r for r in idn_hosts(df).collect()}
    assert out["münchen.de"]["ascii_host"] == "xn--mnchen-3ya.de"
    assert out["münchen.de"]["is_idn"] is True
    assert out["Plain.Example.COM"]["ascii_host"] == "plain.example.com"
    assert out["Plain.Example.COM"]["is_idn"] is False
    assert out["中国.cn"]["ascii_host"] == "xn--fiqs8s.cn"


def test_retry_backoff_no_shift_overflow(spark):
    from scrapely_spark.frontier.retry import retry_plan

    # attempt numbers past the 6-bit JVM shift mask must still clamp
    # at max_delay, never wrap to tiny/negative backoff
    df = spark.createDataFrame(
        [("u", "h", 500, 60, 0, None), ("v", "h", 500, 200, 0, None)],
        "url string, host string, status int, attempt int, "
        "t_us long, retry_after_s int")
    out = {r["url"]: r
           for r in retry_plan(df, max_attempts=1000).collect()}
    assert out["u"]["backoff_s"] == 3600
    assert out["v"]["backoff_s"] == 3600
    assert out["v"]["retry_at_us"] == 3600 * 1_000_000


def test_idn_hosts_null_and_empty_rows(spark):
    from scrapely_spark.frontier.canonical import idn_hosts

    df = spark.createDataFrame(
        [(None,), ("",), ("ok.example",)], "host string")
    out = idn_hosts(df).collect()
    by = {r["host"]: r for r in out}
    assert by[None]["ascii_host"] is None
    assert by[None]["is_idn"] is False
    assert by[""]["ascii_host"] == ""
    assert by["ok.example"]["ascii_host"] == "ok.example"


def test_charset_sniff_keeps_content_type(spark):
    from scrapely_spark.frontier.htmlmeta import charset_sniff

    df = spark.createDataFrame(
        [("u", bytearray(b"<html>x"), "text/html; charset=utf8")],
        "url string, body binary, content_type string")
    row = charset_sniff(df).collect()[0]
    assert row["content_type"] == "text/html; charset=utf8"
    assert row["charset"] == "utf-8"


def test_ip_budget_groups_three_classes(spark):
    from scrapely_spark.frontier.politeness import ip_budget_groups

    rows = [("d1", "10.0.0.1", 100)]                     # dedicated
    rows += [("s%d" % i, "10.0.0.2", 90) for i in range(4)]   # shared
    rows += [("c%d" % i, "10.0.0.3", 100) for i in range(70)]  # cdn
    df = spark.createDataFrame(rows, "host string, ip string, "
                                     "budget int")
    out = {r["host"]: r for r in ip_budget_groups(df).collect()}
    assert out["d1"]["ip_class"] == "dedicated"
    assert out["d1"]["host_budget"] == 100
    assert out["s0"]["ip_class"] == "shared"
    assert out["s0"]["host_budget"] == 22        # 90 div 4, floor
    assert out["c0"]["ip_class"] == "cdn"
    assert out["c0"]["host_budget"] == 100       # never split
    # shared split never starves a host to zero
    tiny = spark.createDataFrame(
        [("t%d" % i, "ip", 2) for i in range(5)],
        "host string, ip string, budget int")
    assert all(r["host_budget"] == 1
               for r in ip_budget_groups(tiny).collect())
    # fan-in is DISTINCT hosts: duplicate host rows (retries, many
    # URLs per host) must not flip dedicated->shared or split budgets
    dup = spark.createDataFrame(
        [("d1", "10.0.0.9", 100)] * 3 + [("s1", "10.0.0.8", 90),
                                         ("s2", "10.0.0.8", 90),
                                         ("s2", "10.0.0.8", 90)],
        "host string, ip string, budget int")
    got = {(r["host"], r["n_hosts_on_ip"], r["ip_class"],
            r["host_budget"]) for r in ip_budget_groups(dup).collect()}
    assert got == {("d1", 1, "dedicated", 100),
                   ("s1", 2, "shared", 45), ("s2", 2, "shared", 45)}


def test_canonical_identity_mixed_chains(spark):
    from scrapely_spark.frontier.canonical import canonical_identity

    link = lambda t: ('<html><head><link rel="canonical" href="%s">'
                      '</head><body>x</body></html>' % t)
    pages = spark.createDataFrame([
        ("http://s/0", link("http://c/master")),   # declares external
        ("http://s/3", link("http://s/3")),        # self — a no-op
        ("http://s/6", "<html><body>plain</body></html>"),
        # a page that BOTH redirects (protocol) and declares — the
        # redirect must win
        ("http://s/7", link("http://c/wrong")),
    ], "url string, html string")
    redirects = spark.createDataFrame([
        ("http://s/1", "http://s/0"),    # redirect → declaring page
        ("http://s/2", "http://s/1"),    # 2 redirects then the decl
        ("http://s/4", "http://s/5"),    # cycle pair
        ("http://s/5", "http://s/4"),
        ("http://s/7", "http://c/right"),
    ], "src string, dst string")

    out = {r["url"]: r
           for r in canonical_identity(pages, redirects).collect()}
    assert out["http://s/0"]["canonical_id"] == "http://c/master"
    assert out["http://s/0"]["hops"] == 1
    assert out["http://s/1"]["canonical_id"] == "http://c/master"
    assert out["http://s/1"]["hops"] == 2
    assert out["http://s/2"]["canonical_id"] == "http://c/master"
    assert out["http://s/2"]["hops"] == 3
    assert out["http://s/3"]["canonical_id"] == "http://s/3"
    assert out["http://s/3"]["resolved"] is True
    assert out["http://s/4"]["resolved"] is False
    assert out["http://s/4"]["canonical_id"] == "http://s/4"
    assert out["http://s/4"]["hops"] is None
    assert out["http://s/6"]["canonical_id"] == "http://s/6"
    assert out["http://s/6"]["hops"] == 0
    assert out["http://s/7"]["canonical_id"] == "http://c/right"


def test_canonical_identity_relative_hrefs(spark):
    from scrapely_spark.frontier.canonical import canonical_identity

    link = lambda t: ('<html><head><link rel="canonical" href="%s">'
                      '</head><body>x</body></html>' % t)
    pages = spark.createDataFrame([
        # root-relative SELF-declaration: must resolve then drop as
        # the no-op fixed point
        ("http://h/a", link("/a")),
        # root-relative to another path
        ("http://h/b", link("/master")),
        # protocol-relative
        ("http://h/c", link("//other.example/m")),
        # path-relative, resolved against the page's directory
        ("http://h/dir/d", link("m2")),
        # dot segments must fold (RFC 3986 §5.2.4) or the identity
        # can never equi-join the canonical keyspace
        ("http://h/a/b/e", link("../x")),
        ("http://h/dir/f", link("./y")),
        ("http://h/g", link("../z")),          # '..' above root clamps
        ("http://h/p/q/r", link("http://h/p/./../w")),  # absolute too
        # the declared target must land in the CANONICAL keyspace
        # spelling or it can never equi-join the crawl's url keys:
        ("http://h/bare", link("http://x.example")),     # empty path
        ("http://h/qs", link("http://h/p?b=2&a=1")),     # query sort
        ("http://h/frag", link("/f#sec")),               # fragment
        ("http://h/up", link("HTTP://H2.Example/P")),    # case fold
        ("http://h/loneq", link("/l?")),                 # lone '?'
    ], "url string, html string")
    redirects = spark.createDataFrame(
        [], "src string, dst string")
    out = {r["url"]: r
           for r in canonical_identity(pages, redirects).collect()}
    assert out["http://h/a"]["canonical_id"] == "http://h/a"
    assert out["http://h/a"]["hops"] == 0
    assert out["http://h/b"]["canonical_id"] == "http://h/master"
    assert out["http://h/c"]["canonical_id"] == "http://other.example/m"
    assert out["http://h/dir/d"]["canonical_id"] == "http://h/dir/m2"
    assert out["http://h/a/b/e"]["canonical_id"] == "http://h/a/x"
    assert out["http://h/dir/f"]["canonical_id"] == "http://h/dir/y"
    assert out["http://h/g"]["canonical_id"] == "http://h/z"
    assert out["http://h/p/q/r"]["canonical_id"] == "http://h/w"
    assert out["http://h/bare"]["canonical_id"] == "http://x.example/"
    assert out["http://h/qs"]["canonical_id"] == "http://h/p?a=1&b=2"
    assert out["http://h/frag"]["canonical_id"] == "http://h/f"
    assert out["http://h/up"]["canonical_id"] == "http://h2.example/P"
    assert out["http://h/loneq"]["canonical_id"] == "http://h/l"


def test_meta_refresh_extraction(spark):
    from scrapely_spark.frontier.htmlmeta import meta_refresh

    rows = [
        ("a", '<meta http-equiv="refresh" content="0; url=/next">'),
        ("b", "<meta http-equiv=refresh content='5;URL=http://x/y'>"),
        # attribute order flipped + unquoted content
        ("c", '<meta content="0;url=/z" http-equiv="refresh">'),
        # refresh without a url= part: self-reload, NULL target
        ("d", '<meta http-equiv="refresh" content="30">'),
        # not a refresh tag at all
        ("e", '<meta http-equiv="content-type" content="text/html">'),
        # first tag in document order wins
        ("f", '<meta http-equiv="refresh" content="0;url=/first">'
              '<meta http-equiv="refresh" content="0;url=/second">'),
        # 'content=' must not match inside another attribute NAME
        # (data-content) — the readout anchors on a delimiter
        ("g", '<meta http-equiv=refresh data-content="99" '
              'content="0;url=/x">'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {r["url"]: (r["refresh_delay_s"], r["refresh_url"])
           for r in meta_refresh(df).collect()}
    assert out["a"] == (0, "/next")
    assert out["b"] == (5, "http://x/y")
    assert out["c"] == (0, "/z")
    assert out["d"] == (30, None)
    assert out["e"] == (None, None)
    assert out["f"] == (0, "/first")
    assert out["g"] == (0, "/x")

    plan = meta_refresh(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


def test_strip_tracking_params(spark):
    from scrapely_spark.frontier.canonical import strip_tracking_params

    rows = [
        ("http://h/p?a=1&utm_source=nl&z=2",),
        ("http://h/p?utm_campaign=x&utm_medium=y",),  # all tracking
        ("http://h/p?fbclid=abc&gclid=def&real=1",),
        ("http://h/p?a=1",),                          # untouched
        ("http://h/p",),                              # no query
        # prefix must not over-match: 'utm_sourcey' is not in the
        # list (regexp is anchored ^...=), but 'autm_source' is a
        # DIFFERENT param and must survive
        ("http://h/p?autm_source=keep",),
        # string-changing rewrites with NO tracking: the accounting
        # flag must come from the filter delta, not rebuilt != url
        ("http://h/p?a=1&&b=2",),                     # empty member
        ("http://h/p?",),                             # bare '?'
    ]
    df = spark.createDataFrame(rows, "canonical_url string")
    out = {r["canonical_url"]: (r["stripped_url"], r["had_tracking"])
           for r in strip_tracking_params(df).collect()}
    assert out["http://h/p?a=1&utm_source=nl&z=2"] \
        == ("http://h/p?a=1&z=2", True)
    assert out["http://h/p?utm_campaign=x&utm_medium=y"] \
        == ("http://h/p", True)
    assert out["http://h/p?fbclid=abc&gclid=def&real=1"] \
        == ("http://h/p?real=1", True)
    assert out["http://h/p?a=1"] == ("http://h/p?a=1", False)
    assert out["http://h/p"] == ("http://h/p", False)
    assert out["http://h/p?autm_source=keep"] \
        == ("http://h/p?autm_source=keep", False)
    assert out["http://h/p?a=1&&b=2"] == ("http://h/p?a=1&b=2", False)
    assert out["http://h/p?"] == ("http://h/p", False)


def test_retry_plan_zero_attempt_never_hammers(spark):
    """attempt<=0 (corrupt/1-off upstream) must clamp the shift count
    low — the JVM masks a negative count to 63 and base<<63 wraps to
    ZERO backoff, the exact hammering the cap exists to prevent."""
    from scrapely_spark.frontier.retry import retry_plan

    df = spark.createDataFrame(
        [("u0", "h", 500, 0, 1_000_000, None),
         ("uneg", "h", 500, -3, 1_000_000, None)],
        "url string, host string, status int, attempt int, "
        "t_us long, retry_after_s int")
    out = {r["url"]: r for r in retry_plan(df).collect()}
    for u in ("u0", "uneg"):
        assert out[u]["action"] == "retry"
        assert out[u]["backoff_s"] >= 60  # base backoff, never 0


def test_sitemap_refetch_multi_fetch_log_no_spurious_stale(spark):
    """An accumulated fetch LOG carries one row per fetch: the newest
    fetch is the state, so a URL refetched after the lastmod must NOT
    re-emit 'stale' against its older fetch (nor duplicate rows)."""
    from scrapely_spark.frontier.sitemaps import sitemap_lastmod_refetch

    body = ("<urlset><url><loc>http://h/a</loc>"
            "<lastmod>2024-03-10T00:00:00</lastmod></url></urlset>")
    bodies = spark.createDataFrame([("http://h/sm.xml", body)],
                                   "sitemap_url string, body string")
    log = spark.createDataFrame(
        [("http://h/a", "2024-03-01 00:00:00"),
         ("http://h/a", "2024-03-20 00:00:00")],
        "url string, fetched_at string")
    assert sitemap_lastmod_refetch(bodies, log).count() == 0
