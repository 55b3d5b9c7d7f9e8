"""PageRank and BM25: structural cases + independent pure-Python twins."""

import math

import pytest

from scrapely_spark.spark import graph, search


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _ranks(spark, rows, **kw):
    out = graph.pagerank(_edges(spark, rows), **kw)
    return {r.node: r.rank for r in out.collect()}


def _pagerank_twin(edges, iterations=5, d=0.85):
    """Independent dict-based power iteration (the executable spec)."""
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    out = {n: [] for n in nodes}
    for s, t in edges:
        out[s].append(t)
    n = len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(iterations):
        dangling = sum(rank[u] for u in nodes if not out[u])
        contrib = {u: 0.0 for u in nodes}
        for s, t in edges:
            contrib[t] += rank[s] / len(out[s])
        rank = {u: (1 - d) / n + d * (contrib[u] + dangling / n)
                for u in nodes}
    return rank


def test_pagerank_matches_twin_on_random_graph(spark):
    import random
    rng = random.Random(11)
    edges = [("h%d" % rng.randrange(30), "h%d" % rng.randrange(30))
             for _ in range(120)]
    got = _ranks(spark, edges)
    want = _pagerank_twin(edges)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)


def test_pagerank_is_a_distribution(spark):
    # dangling-mass redistribution keeps Σ rank = 1 exactly
    edges = [("a", "b"), ("b", "c"), ("a", "c")]  # c is dangling
    got = _ranks(spark, edges)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    # c receives from two in-links and leaks back uniformly: it must
    # out-rank a (which nothing links to)
    assert got["c"] > got["a"]


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # a directed cycle is rank-regular: every node exactly 1/n
    n = 5
    edges = [("n%d" % i, "n%d" % ((i + 1) % n)) for i in range(n)]
    got = _ranks(spark, edges)
    for v in got.values():
        assert v == pytest.approx(1.0 / n, abs=1e-12)


def test_pagerank_dedups_multi_edges(spark):
    base = [("a", "b"), ("b", "a")]
    got_single = _ranks(spark, base)
    got_multi = _ranks(spark, base + [("a", "b"), ("a", "b")])
    assert got_single == got_multi


def _bm25_twin(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.lower().strip().split() for d, t in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    terms = sorted(set(t.lower() for t in terms))
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    scores = {}
    for doc, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(tk) / avgdl))
        if s:
            scores[doc] = round(s, 6)
    return scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_matches_twin(spark):
    rows = [(1, "spark join fast join"),
            (2, "slow scan table scan scan"),
            (3, "join spark spark spark filter"),
            (4, "window agg group"),
            (5, "spark")]
    got = {r.doc_id: r.score
           for r in search.bm25_topk(_docs(spark, rows),
                                     ["spark", "join"], k=10).collect()}
    assert got == _bm25_twin(rows, ["spark", "join"])


def test_bm25_short_doc_beats_long_doc_at_equal_tf(spark):
    # length normalization: same tf, shorter document scores higher
    rows = [(1, "spark " + "pad " * 50), (2, "spark pad")]
    got = search.bm25_topk(_docs(spark, rows), ["spark"], k=2).collect()
    assert [r.doc_id for r in got] == [2, 1]


def test_bm25_topk_cut_and_tiebreak(spark):
    # identical docs tie on score; the cut keeps the smallest doc_ids
    rows = [(i, "spark scan") for i in range(10)]
    got = search.bm25_topk(_docs(spark, rows), ["spark"], k=3).collect()
    assert [r.doc_id for r in got] == [0, 1, 2]
    assert len({r.score for r in got}) == 1


def test_bm25_nonmatching_docs_absent_and_term_dedup(spark):
    rows = [(1, "spark"), (2, "table only")]
    got = search.bm25_topk(_docs(spark, rows),
                           ["spark", "SPARK", "spark"], k=10).collect()
    assert [r.doc_id for r in got] == [1]


def test_bm25_empty_terms_raises(spark):
    with pytest.raises(ValueError):
        search.bm25_topk(_docs(spark, [(1, "x")]), [])


# ----------------------------------------------------------- plan shapes


def test_bm25_term_filter_sits_below_every_exchange(spark):
    # the `term IN (query)` predicate must run inside the scan stage —
    # at 10^10 docs a shuffle of non-query tokens is the difference
    # between a |matches| job and a |corpus| job
    rows = [(i, "spark join table scan") for i in range(10)]
    df = search.bm25_topk(_docs(spark, rows), ["spark"], k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the 1-row corpus-stats cross join broadcasts (BNLJ BuildRight is
    # that broadcast); what must NOT appear is a non-broadcast cartesian
    assert "CartesianProduct" not in plan
    assert "Exchange" in plan  # the (doc_id, term) groupBy shuffle
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # the IN-filter is in the optimized plan (Catalyst keeps it adjacent
    # to the generator, below the aggregate that forces the exchange)
    assert "spark" in optimized and "Generate" in optimized


def test_pagerank_iteration_has_no_nested_loop_join(spark):
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    df = graph.pagerank(edges, iterations=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only cartesian products are the intended 1-row broadcast
    # stat joins; the edgesxranks join must be hash-based
    assert "CartesianProduct" not in plan


def test_host_graph_derivation(spark):
    ext = spark.createDataFrame(
        [("http://a.example.com/x",
          ["http://B.Example.com/y", "http://a.example.com/z",
           "not a url", ""])],
        "canonical_url string, links array<string>")
    got = sorted((r.src, r.dst) for r in graph.host_graph(ext).collect())
    # dst hosts are canonicalized (lowercased); junk links drop;
    # intra-host self-loop kept
    assert got == [("a.example.com", "a.example.com"),
                   ("a.example.com", "b.example.com")]


def test_host_graph_ipv6_and_unparseable_src(spark):
    # src host spelling must match canonicalize's (bare IPv6, no
    # brackets), and pages whose canonical_url the JVM URI parser
    # rejects must drop rather than emit NULL src nodes
    ext = spark.createDataFrame(
        [("http://[::1]:8080/x", ["http://[::1]:8080/y"]),
         ("http://h.example.com/a b", ["http://ok.example.com/z"])],
        "canonical_url string, links array<string>")
    got = sorted((r.src, r.dst) for r in graph.host_graph(ext).collect())
    assert got == [("::1", "::1")]


def test_tfidf_keywords_hand_computed(spark):
    import math
    from scrapely_spark.spark import search
    docs = spark.createDataFrame(
        [(0, "apple apple banana"),
         (1, "banana cherry"),
         (2, "cherry cherry cherry durian")],
        "doc_id long, text string")
    rows = search.tfidf_keywords(docs, k=2).collect()
    got = {(r.doc_id, r.rank): (r.term, r.score) for r in rows}
    def s(tf, df):
        return round(tf * math.log(3 / df), 6)
    # doc 0: apple tf=2 df=1 -> top; banana tf=1 df=2
    assert got[(0, 1)] == ("apple", s(2, 1))
    assert got[(0, 2)] == ("banana", s(1, 2))
    # doc 1: banana and cherry tie at tf=1 df=2 -> term tie-break
    assert got[(1, 1)] == ("banana", s(1, 2))
    assert got[(1, 2)] == ("cherry", s(1, 2))
    # doc 2: durian (tf=1, df=1) beats cherry (tf=3, df=2)?
    exp = sorted([("cherry", s(3, 2)), ("durian", s(1, 1))],
                 key=lambda t: (-t[1], t[0]))
    assert [got[(2, 1)], got[(2, 2)]] == exp
    # k caps the output per doc
    assert all(r.rank <= 2 for r in rows) and len(rows) == 6


# ------------------------------------------------ integer-domain PageRank

def test_pagerank_micro_exact_twin_random_graph(spark):
    """Spark vs pure-Python integer PageRank: EXACT equality (not
    approx) — the property the crawl's authority feedback rests on."""
    import random
    rng = random.Random(11)
    hosts = ["h%d" % i for i in range(30)]
    edges = sorted({(rng.choice(hosts), rng.choice(hosts))
                    for _ in range(150)})
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank_micro
           for r in graph.pagerank_micro(df, 4).collect()}
    assert got == graph.pagerank_micro_py(edges, 4)


def test_pagerank_micro_partitioning_invariance(spark):
    """Integer sums are exact under any partitioning — rerunning with a
    different layout yields identical ranks (floats would drift)."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
             ("d", "a"), ("e", "a"), ("x", "y")]
    df1 = spark.createDataFrame(edges, "src string, dst string")
    df32 = df1.repartition(32)
    r1 = {r.node: r.rank_micro for r in graph.pagerank_micro(df1, 5).collect()}
    r32 = {r.node: r.rank_micro for r in graph.pagerank_micro(df32, 5).collect()}
    assert r1 == r32 == graph.pagerank_micro_py(edges, 5)


def test_authority_buckets_quantiles_and_ties(spark):
    ranks = {"a": 500, "b": 400, "c": 400, "d": 100}
    df = spark.createDataFrame(list(ranks.items()),
                               "node string, rank_micro long")
    got = {r.node: r.auth_bucket
           for r in graph.authority_buckets(df, 2).collect()}
    want = graph.authority_buckets_py(ranks, 2)
    # tie between b and c broken by node asc: b joins the top half
    assert got == want == {"a": 0, "b": 0, "c": 1, "d": 1}


def test_authority_buckets_distributed_ordinal_matches_twin(spark):
    """The two-pass distributed rank (range repartition + per-partition
    offsets) equals the pure-Python ordinal on a larger random table,
    and the plan contains no single-partition global window."""
    import random
    rng = random.Random(23)
    ranks = {"host%04d" % i: rng.randrange(1, 1_000_000)
             for i in range(3000)}
    df = spark.createDataFrame(list(ranks.items()),
                               "node string, rank_micro long")
    for levels in (2, 4, 10):
        got = {r.node: r.auth_bucket
               for r in graph.authority_buckets(df, levels).collect()}
        assert got == graph.authority_buckets_py(ranks, levels), levels
    plan = graph.authority_buckets(df, 4)._jdf \
        .queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_authority_buckets_empty_ranks(spark):
    df = spark.createDataFrame([], "node string, rank_micro long")
    assert graph.authority_buckets(df, 4).count() == 0


# ---------------------------------------------------- resolve_redirects

def test_resolve_redirects_chains_cycles_terminals(spark):
    from scrapely_spark.spark import graph
    # a->b->c->T (T terminal), s->T, cycle x<->y, long chain 9 hops
    edges = [("a", "b"), ("b", "c"), ("c", "T"), ("s", "T"),
             ("x", "y"), ("y", "x")]
    edges += [("l%d" % i, "l%d" % (i + 1)) for i in range(9)]  # l0..l9
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.url: (r.final_url, r.hops, r.resolved)
           for r in graph.resolve_redirects(df, max_hops=8).collect()}
    assert out["a"] == ("T", 3, True)
    assert out["b"] == ("T", 2, True)
    assert out["s"] == ("T", 1, True)
    # cycle: after exactly 2^3 hops back at itself, unresolved
    assert out["x"] == ("x", 8, False)
    assert out["y"] == ("y", 8, False)
    # chain of 9 from l0: 8 hops reaches l8, which still redirects
    assert out["l0"] == ("l8", 8, False)
    assert out["l1"] == ("l9", 8, True)


def test_resolve_redirects_nonpow2_cap_never_claims_resolved(spark):
    # the doubling rounds reach the next power of two, but resolved
    # must honor the caller's cap exactly: with max_hops=5 a 7-hop
    # chain terminates inside the 8-hop reach yet is NOT resolved
    from scrapely_spark.spark import graph
    edges = [("m%d" % i, "m%d" % (i + 1)) for i in range(7)]  # m0..m7
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.url: (r.final_url, r.hops, r.resolved)
           for r in graph.resolve_redirects(df, max_hops=5).collect()}
    assert out["m0"] == ("m7", 7, False)   # terminal, but past the cap
    assert out["m2"] == ("m7", 5, True)    # exactly at the cap
    assert out["m3"] == ("m7", 4, True)


def test_resolve_redirects_partitioning_invariant(spark):
    from scrapely_spark.spark import graph
    edges = [("u%d" % n, "u%d" % (n // 3)) for n in range(10, 200)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, graph.resolve_redirects(df, 8).collect()))
    b = sorted(map(tuple,
                   graph.resolve_redirects(df.repartition(13), 8)
                   .collect()))
    assert a == b
    # every chain here is short; all resolved at a terminal (n < 10)
    assert all(r[3] for r in a)
    assert all(int(r[1][1:]) < 10 for r in a)


# ----------------------------------------------------------- mirror_hosts

def test_mirror_hosts_finds_planted_mirror(spark):
    rows = (
        # h0 and m0: identical 4-fingerprint sets (a true mirror)
        [("h0", f"f{i}") for i in range(4)]
        + [("m0", f"f{i}") for i in range(4)]
        # h1 shares one fingerprint with h0 (jaccard 1/7) — below gate
        + [("h1", "f0")] + [("h1", f"g{i}") for i in range(3)]
        # duplicate (host, fp) rows must not inflate set sizes
        + [("h0", "f0"), ("m0", "f3")]
    )
    df = spark.createDataFrame(rows, "host string, fingerprint string")
    out = graph.mirror_hosts(df, min_jaccard=0.9).collect()
    assert [(r.host_a, r.host_b, r.shared_fp, r.n_a, r.n_b, r.jaccard)
            for r in out] == [("h0", "m0", 4, 4, 4, 1.0)]
    # lowering the gate surfaces the weak pair with the exact ratio
    low = {(r.host_a, r.host_b): r.jaccard
           for r in graph.mirror_hosts(df, min_jaccard=0.1).collect()}
    assert low[("h0", "h1")] == round(1 / 7, 6)


def test_mirror_hosts_hot_fingerprint_capped(spark):
    # one fingerprint on 30 hosts is boilerplate: with the cap at 20
    # it must produce NO pairs (the quadratic blow-up is the point)
    rows = [(f"h{i:02d}", "boiler") for i in range(30)]
    rows += [("h00", "x"), ("h01", "x")]
    df = spark.createDataFrame(rows, "host string, fingerprint string")
    out = graph.mirror_hosts(df, min_jaccard=0.3, max_hosts_per_fp=20)
    got = [(r.host_a, r.host_b, r.shared_fp) for r in out.collect()]
    # the surviving pair comes only from the cold fingerprint 'x'
    assert got == [("h00", "h01", 1)]


# ----------------------------------------------------- anchor_text

def test_anchor_profile_distinct_source_weighting(spark):
    from scrapely_spark.spark.search import anchor_text_profile
    # one page spamming the same anchor 5x counts ONCE; three distinct
    # pages with a messier casing of the same phrase count three
    rows = ([("spam", "t", "Buy Now")] * 5
            + [("p1", "t", "buy   now"), ("p2", "t", "BUY NOW"),
               ("p3", "t", "buy now"),
               ("p1", "t", "click here"),      # stoplisted
               ("p2", "t", "   "),             # empty after trim
               ("p1", "t", "great product"),
               ("p2", "t", "great product")])
    df = spark.createDataFrame(rows, "src string, dst string, anchor string")
    got = anchor_text_profile(df, k=3).collect()
    by_anchor = {(r.dst, r.anchor): (r.n_sources, r.rank) for r in got}
    assert by_anchor[("t", "buy now")] == (4, 1)       # spam + p1..p3
    assert by_anchor[("t", "great product")] == (2, 2)
    assert len(got) == 2


def test_anchor_profile_k_cut_and_tiebreak(spark):
    from scrapely_spark.spark.search import anchor_text_profile
    rows = [("p%d" % i, "t", a) for a in ("aa", "bb", "cc", "dd")
            for i in range(2)]
    df = spark.createDataFrame(rows, "src string, dst string, anchor string")
    got = sorted(anchor_text_profile(df, k=3).collect(),
                 key=lambda r: r.rank)
    # all tie at n_sources=2: deterministic lexicographic cut at k=3
    assert [(r.anchor, r.rank) for r in got] == [
        ("aa", 1), ("bb", 2), ("cc", 3)]


# ------------------------------------------------------- hits_micro

def test_hits_micro_exact_twin_random_graph(spark):
    import random
    rng = random.Random(23)
    hosts = ["h%d" % i for i in range(25)]
    edges = sorted({(rng.choice(hosts), rng.choice(hosts))
                    for _ in range(120)})
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.auth_micro, r.hub_micro)
           for r in graph.hits_micro(df, 3).collect()}
    assert got == graph.hits_micro_py(edges, 3)


def test_hits_micro_hub_authority_separation(spark):
    # bipartite star: d is the only hub (points at everything), the
    # a* nodes are pure authorities (no out-edges -> hub 0); d has no
    # in-edges -> auth 0.  Max-normalization pins the tops at 10^6.
    edges = [("d", "a1"), ("d", "a2"), ("d", "a3")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.auth_micro, r.hub_micro)
           for r in graph.hits_micro(df, 2).collect()}
    assert got["d"] == (0, 1_000_000)
    for a in ("a1", "a2", "a3"):
        assert got[a] == (1_000_000, 0)


def test_hits_micro_partitioning_invariance(spark):
    import random
    rng = random.Random(7)
    hosts = ["h%d" % i for i in range(20)]
    edges = sorted({(rng.choice(hosts), rng.choice(hosts))
                    for _ in range(90)})
    df1 = spark.createDataFrame(edges, "src string, dst string")
    df32 = df1.repartition(32)
    r1 = {r.node: (r.auth_micro, r.hub_micro)
          for r in graph.hits_micro(df1, 3).collect()}
    r32 = {r.node: (r.auth_micro, r.hub_micro)
           for r in graph.hits_micro(df32, 3).collect()}
    assert r1 == r32


def test_opic_matches_python_twin_exactly(spark):
    import random

    from scrapely_spark.spark.graph import opic_micro, opic_micro_py

    random.seed(23)
    edges = list({("n%d" % random.randint(0, 30),
                   "n%d" % random.randint(0, 40))
                  for _ in range(150)})
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["importance_micro"], r["cash_micro"])
           for r in opic_micro(df, rounds=3).collect()}
    want = opic_micro_py(edges, rounds=3)
    assert got == want
    # partitioning invariance: exact integer sums under any layout
    got2 = {r["node"]: (r["importance_micro"], r["cash_micro"])
            for r in opic_micro(df.repartition(7), rounds=3).collect()}
    assert got2 == want


def test_opic_cash_conservation_and_dangling(spark):
    from scrapely_spark.spark.graph import opic_micro

    # a → b → (dangling); c isolated-as-dangling via only in-edge
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string")
    rows = {r["node"]: r for r in opic_micro(df, rounds=2).collect()}
    # all importance positive; total cash stays within floor leak of
    # 3 * RANK_ONE_MICRO
    total_cash = sum(r["cash_micro"] for r in rows.values())
    assert 3_000_000 - 10 <= total_cash <= 3_000_000
    # the dangling sink c accumulates the most importance
    assert rows["c"]["importance_micro"] \
        == max(r["importance_micro"] for r in rows.values())
