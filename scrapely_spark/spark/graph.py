"""Link-graph analytics over the crawl's edge lists.

A frontier at 10^10 URLs is also a link graph, and the classic signal a
crawl scheduler wants from it is link authority: PageRank over the
host graph drives fetch prioritization (authoritative hosts first) the
same way depth drives it in the seed rounds.  The operator here is
payload-agnostic — any (src, dst) edge DataFrame works: host→host link
edges from extraction, doc→doc citation edges, image→page containment
edges.

PageRank (Page et al., "The PageRank citation ranking", 1998), power
iteration with the standard damping + dangling-mass treatment:

    rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) + D/N)

where D is the total rank mass sitting on dangling nodes (no
out-edges), redistributed uniformly so rank stays a probability
distribution (Σ rank = 1 at every iteration — pinned by tests).

Scale shape: edges are deduplicated and hash-partitioned on ``src``
once, up front; ranks live partitioned on ``node``; each iteration is
then ONE co-partitioned join (edge.src = rank.node reuses the edge
exchange) + ONE groupBy(dst) shuffle of slim (dst, contrib) rows with
map-side partial sums.  The dangling mass and N are 1-row aggregates
cross-joined back (broadcast, never a driver collect), and every
iteration ``localCheckpoint``s the rank table so iteration k's plan
does not embed iterations 1..k-1 (same lineage-truncation discipline
as dedup.dup_clusters).  The checkpoints are EAGER: lazy checkpoints
(``eager=False``) measured 2.7× less fixed overhead on a small graph
(one job submission for the whole unrolled loop), but a lazy
checkpoint whose first materialization happens inside a
broadcast-exchange thread — here, the 1-row dangling-mass aggregate
the loop broadcasts each iteration — deadlocks against the DAG
scheduler on the (RDDCheckpointData, RDD) monitor pair:
``RDD.markCheckpointed`` and ``DAGScheduler.getCacheLocs`` take the
two locks in opposite order (observed live as a Java-level deadlock
under the full test suite).  Eager checkpoints materialize on the
driver thread before any broadcast job can race them; the extra cost
is one small job submission per iteration, invisible at scale where
the groupBy shuffle — the minimum any distributed PageRank pays —
dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scrapely_spark.spark.dedup import _unpersist_on_gc


def host_graph(extracted: DataFrame) -> DataFrame:
    """(src, dst) host-level link edges from crawl extraction output.

    ``extracted`` is the crawl's per-round extraction table
    (frontier.rounds.EXTRACTED): fetched ``canonical_url`` plus the
    ``links`` discovered on the page.  src is the fetched page's host;
    dst the host of each outlink after the SAME canonicalization the
    frontier applies at enqueue time — so the graph PageRank scores is
    exactly the graph the scheduler walks.  Intra-host self-loops are
    kept (they are real link mass); duplicate edges collapse in
    :func:`pagerank`.
    """
    from scrapely_spark.frontier.canonical import (canonicalize_df,
                                                   host_of_canonical)
    links = extracted.select(
        host_of_canonical(F.col("canonical_url")).alias("src"),
        F.explode("links").alias("url"))
    return (canonicalize_df(links)
            .where(F.col("src").isNotNull() & (F.col("src") != "")
                   & (F.col("host") != ""))
            .select("src", F.col("host").alias("dst")))


def pagerank(edges: DataFrame, iterations: int = 5,
             damping: float = 0.85) -> DataFrame:
    """(node, rank) after ``iterations`` power steps over ``edges``.

    ``edges`` must have ``src``/``dst`` columns; duplicate edges are
    collapsed (simple-graph semantics) and self-loops kept (a page may
    link to itself).  Nodes are everything appearing as src or dst.
    Rank starts uniform at 1/N and stays a distribution throughout.
    """
    e = (edges.select("src", "dst").distinct()
         .repartition("src").cache())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # static per-node frame: (node, outdeg) with 0 for dangling nodes —
    # carried alongside rank so the per-iteration join is single
    base = (nodes.join(deg.withColumnRenamed("src", "node"), "node",
                       "left")
            .select("node",
                    F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
            .localCheckpoint(eager=True))
    n_total = F.broadcast(base.agg(F.count("*").alias("_n")))
    ranks = (base.crossJoin(n_total)
             .select("node", "outdeg",
                     (F.lit(1.0) / F.col("_n")).alias("rank"))
             .localCheckpoint(eager=True))
    d = float(damping)
    for _ in range(iterations):
        contribs = (e.join(ranks.where(F.col("outdeg") > 0),
                           e["src"] == F.col("node"))
                    .groupBy("dst")
                    .agg(F.sum(F.col("rank") / F.col("outdeg"))
                         .alias("contrib")))
        dangling = F.broadcast(
            ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("outdeg") == 0, F.col("rank"))),
                    F.lit(0.0)).alias("_dm"),
                F.count("*").alias("_n")))
        ranks = (ranks.join(contribs,
                            ranks["node"] == contribs["dst"], "left")
                 .crossJoin(dangling)
                 .select(
                     "node", "outdeg",
                     ((1.0 - d) / F.col("_n")
                      + d * (F.coalesce("contrib", F.lit(0.0))
                             + F.col("_dm") / F.col("_n")))
                     .alias("rank"))
                 .localCheckpoint(eager=True))
    return _unpersist_on_gc(ranks.select("node", "rank"), [e])


# --------------------------------------------------------------------------
# integer-domain PageRank — the frontier-feedback variant
# --------------------------------------------------------------------------
#
# The float pagerank above is the analytics operator; feeding authority
# back into the crawl SCHEDULER needs something stronger than "close":
# the politeness ordering must be byte-identical between the Spark
# pipeline and the single-threaded oracle (oracle.py), and IEEE float
# sums are order-dependent across partitionings.  pagerank_micro runs
# the same power iteration entirely in 64-bit integer micro-units
# (1.0 ≡ 1_000_000): per-edge contributions are integer divisions and
# the per-node sums are exact under ANY summation order, so a pure
# Python replay (pagerank_micro_py) reproduces every rank bit for bit.
# Floor division leaks a few micro-units of mass per iteration — fine:
# this is a priority SIGNAL with a spec, not a probability estimate.

RANK_ONE_MICRO = 1_000_000


def pagerank_micro(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """(node, rank_micro) — order-independent integer PageRank.

    Same join/groupBy shape (and scale behavior) as :func:`pagerank`;
    see module docstring.  d = 0.85 fixed: the damping enters as the
    integer expression ``(85 · x) div 100``.
    """
    e = edges.select("src", "dst").distinct().repartition("src").cache()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = (nodes.join(deg.withColumnRenamed("src", "node"), "node",
                       "left")
            .select("node",
                    F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
            .localCheckpoint(eager=True))
    n_total = F.broadcast(base.agg(F.count("*").alias("_n")))
    ranks = (base.crossJoin(n_total)
             .select("node", "outdeg", "_n",
                     (F.lit(RANK_ONE_MICRO) / F.col("_n"))
                     .cast("long").alias("rank_micro"))
             .localCheckpoint(eager=True))
    for _ in range(iterations):
        contribs = (e.join(ranks.where(F.col("outdeg") > 0),
                           e["src"] == F.col("node"))
                    .groupBy("dst")
                    .agg(F.sum(F.floor(F.col("rank_micro")
                                       / F.col("outdeg")))
                         .alias("contrib")))
        dangling = F.broadcast(
            ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("outdeg") == 0,
                                 F.col("rank_micro"))),
                    F.lit(0)).cast("long").alias("_dm")))
        ranks = (ranks.join(contribs,
                            ranks["node"] == contribs["dst"], "left")
                 .crossJoin(dangling)
                 .select(
                     "node", "outdeg", "_n",
                     (F.floor(F.lit(150_000) / F.col("_n"))
                      + F.floor(F.lit(85)
                                * (F.coalesce("contrib", F.lit(0))
                                   + F.floor(F.col("_dm") / F.col("_n")))
                                / F.lit(100)))
                     .cast("long").alias("rank_micro"))
                 .localCheckpoint(eager=True))
    return _unpersist_on_gc(ranks.select("node", "rank_micro"), [e])


def pagerank_micro_py(edges, iterations: int = 3) -> dict:
    """Pure-Python twin of :func:`pagerank_micro` — the oracle side.

    ``edges`` is any iterable of (src, dst); duplicates collapse.
    Returns {node: rank_micro}.  Every operation below maps 1:1 onto an
    integer expression in the Spark plan, so the results are identical
    by construction, not by tolerance.
    """
    es = sorted(set((s, d) for s, d in edges))
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    if not nodes:
        return {}
    n = len(nodes)
    outdeg: dict = {}
    for s, _ in es:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: RANK_ONE_MICRO // n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for s, d in es:
            contrib[d] += rank[s] // outdeg[s]
        dm = sum(rank[v] for v in nodes if outdeg.get(v, 0) == 0)
        rank = {v: 150_000 // n
                + (85 * (contrib[v] + dm // n)) // 100
                for v in nodes}
    return rank


def authority_buckets(ranks: DataFrame, levels: int) -> DataFrame:
    """(node, auth_bucket) — ordinal-quantile buckets of rank_micro.

    Bucket 0 is the MOST authoritative ``1/levels`` of nodes; ties and
    boundaries are decided on the exact total key
    ``(rank_micro desc, node asc)``, so the assignment is deterministic
    and engine-portable.

    Global ordinal ranking without a single-partition window (which
    would serialize a 10^8-host table onto one task): the classic
    two-pass distributed rank — range-repartition on the total key,
    count each partition (one slim aggregate; the per-partition counts
    are the ONLY driver-side data, bounded by the partition count),
    broadcast the cumulative offsets back, and take
    ``offset[pid] + row_number within pid``.  The result is exact and
    independent of where the range sampler happens to place partition
    boundaries — offsets come from actual counts, and range
    partitioning guarantees partition i's keys all precede
    partition i+1's.
    """
    from pyspark.sql import Window
    order = [F.desc("rank_micro"), F.asc("node")]
    # localCheckpoint (eager) pins the range boundaries: the frame is
    # consumed twice (partition counts, then the ranked output), and a
    # re-executed range sampler could legally pick different
    # boundaries — the offsets below must describe the SAME
    # partitioning the window sees.  persist() alone is not a pin:
    # an evicted/lost partition recomputes through the sampler and
    # can silently shift rows across _pid; the checkpoint truncates
    # lineage so recomputation is impossible (executor loss fails
    # loudly instead) — the repo-wide convention for this hazard.
    ranged = (ranks.repartitionByRange(*order)
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint(eager=True))
    sizes = {r._pid: r.n for r in
             ranged.groupBy("_pid").agg(F.count("*").alias("n"))
             .collect()}
    total = sum(sizes.values())
    if total == 0:
        ranged.unpersist()
        return ranks.select(
            "node", F.lit(0).cast("int").alias("auth_bucket"))
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off_df = ranks.sparkSession.createDataFrame(
        offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order)
    pos = F.col("_off") + F.row_number().over(w) - 1
    out = (ranged.join(F.broadcast(off_df), "_pid")
           .select("node",
                   F.floor(pos * levels / F.lit(total)).cast("int")
                   .alias("auth_bucket")))
    return _unpersist_on_gc(out, [ranged])


def authority_buckets_py(ranks: dict, levels: int) -> dict:
    """Pure-Python twin of :func:`authority_buckets`."""
    order = sorted(ranks, key=lambda v: (-ranks[v], v))
    h = len(order)
    return {v: (i * levels) // h for i, v in enumerate(order)}


def resolve_redirects(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Redirect-chain resolution by pointer doubling: every source URL
    follows its redirect chain to the terminal target in
    ``ceil(log2(max_hops))`` self-joins instead of ``max_hops``
    sequential ones — the only join shape that survives 10^10 URLs,
    where redirect chains are short but the table is not.

    ``edges`` is the functional redirect map ``(src, dst)`` — one
    outgoing redirect per src (a crawl's 3xx table after
    canonicalization).  Returns ``(url, final_url, hops, resolved)``:
    after round i each row holds the node reached after
    ``min(2^i, chain length)`` hops with its exact hop count (the
    doubling join adds the tail half's hops through the coalesce, so
    counts stay exact, not powers of two); ``resolved`` is false when
    the final node still has an outgoing redirect OR the chain took
    more than ``max_hops`` hops to terminate — a too-long chain and a
    redirect cycle both read as resolved=false, which a scheduler
    drops rather than follows.  (The doubling rounds reach
    ``2^ceil(log2(max_hops))`` nodes — for a non-power-of-two
    ``max_hops`` the reported final_url/hops may describe a terminal
    a few hops past the cap, but ``resolved`` never claims it was
    within budget.)

    Scale shape: each round is ONE equi-join of the reach table with
    itself on the destination key (co-partitioned after the first
    exchange) — log(max_hops) shuffles total; the terminal check is a
    slim left join against the distinct src column.  Nothing iterates
    per hop and nothing touches the driver.
    """
    import math

    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    # ONE lineage truncation at entry: every doubling round references
    # `reach` on BOTH join sides, so an untruncated input plan would
    # re-execute ~2^rounds times (the canonical-identity edge build —
    # a wide declaration-normalization projection — measurably so).
    # The rounds themselves stay lazy: their inputs are checkpoint
    # block re-reads, and per-round eager checkpoints would serialize
    # log(hops) blocking jobs for no saved work.
    reach = (edges.select("src", "dst",
                          F.lit(1).cast("int").alias("hops"))
             .localCheckpoint(eager=True))
    # round-0 reach holds exactly the edge rows: derive heads from the
    # checkpoint so the edges lineage never re-runs
    heads = reach.select(F.col("src").alias("_head")).distinct()
    for _ in range(rounds):
        hop = reach.select(F.col("src").alias("_s"),
                           F.col("dst").alias("_d"),
                           F.col("hops").alias("_h"))
        reach = (reach.join(hop, reach["dst"] == hop["_s"], "left")
                 .select(reach["src"],
                         F.coalesce(hop["_d"], reach["dst"]).alias("dst"),
                         (reach["hops"]
                          + F.coalesce(hop["_h"], F.lit(0)))
                         .cast("int").alias("hops")))
    return (reach.join(heads, reach["dst"] == heads["_head"], "left")
            .select(F.col("src").alias("url"),
                    F.col("dst").alias("final_url"),
                    "hops",
                    (F.col("_head").isNull()
                     & (F.col("hops") <= F.lit(int(max_hops))))
                    .alias("resolved")))


def mirror_hosts(docs: DataFrame, host_col: str = "host",
                 fp_col: str = "fingerprint",
                 min_jaccard: float = 0.9,
                 max_hosts_per_fp: int = 20) -> DataFrame:
    """Mirror detection: host pairs serving (near-)identical content.

    A crawl scheduler at 10^10 URLs wastes its politeness budget
    re-fetching mirrors — the same site under several hostnames (CDN
    aliases, country TLDs, scraped re-hosts).  The signal is set
    overlap of per-host content fingerprints: Jaccard(host_a, host_b)
    over their DISTINCT fingerprint sets at or above ``min_jaccard``
    flags the pair for budget collapse (crawl one, map the others).

    Scale shape — the inverted-index pattern shared with the dedup
    family, never a host×host cross product:

    * one scan → distinct (host, fp) pairs (map-side combine);
    * fingerprints on more than ``max_hosts_per_fp`` hosts are dropped
      BEFORE the self-join — those are boilerplate (empty pages, error
      templates) shared planet-wide, and they alone make the join
      quadratic; dropping them only lowers Jaccard for pairs that
      share nothing distinctive (same cap discipline as the LSH
      hot-bucket caps and boilerplate line removal);
    * host pairs are generated INSIDE each fingerprint's collected
      host array (sorted, then all i<j combinations via a JVM-side
      nested ``transform``/``flatten`` — at most cap·(cap-1)/2 pairs
      per fingerprint), so candidate generation costs no second
      shuffle; pair counts combine map-side, and per-host set sizes
      arrive by two slim joins Spark broadcasts at real scale
      (|hosts| rows, orders of magnitude under the doc count).

    Emits ``(host_a, host_b, shared_fp, n_a, n_b, jaccard)`` with
    ``host_a < host_b``, Jaccard rounded to 6 decimals (the
    engine-portable score contract).
    """
    hf = (docs.select(F.col(host_col).alias("_h"),
                      F.col(fp_col).alias("_fp"))
          .distinct())
    sizes = hf.groupBy("_h").agg(F.count("*").alias("_n"))
    inv = (hf.groupBy("_fp")
           .agg(F.sort_array(F.collect_list("_h")).alias("_hosts"))
           .where((F.size("_hosts") <= max_hosts_per_fp)
                  & (F.size("_hosts") >= 2)))
    combos = F.flatten(F.transform(
        "_hosts",
        lambda h, i: F.filter(
            F.transform("_hosts",
                        lambda g, j: F.when(j > i, F.struct(
                            h.alias("host_a"), g.alias("host_b")))),
            lambda s: s.isNotNull())))
    shared = (inv.select(F.explode(combos).alias("_p"))
              .groupBy(F.col("_p.host_a").alias("host_a"),
                       F.col("_p.host_b").alias("host_b"))
              .agg(F.count("*").alias("shared_fp")))
    out = (shared
           .join(sizes.withColumnRenamed("_h", "host_a")
                 .withColumnRenamed("_n", "n_a"), "host_a")
           .join(sizes.withColumnRenamed("_h", "host_b")
                 .withColumnRenamed("_n", "n_b"), "host_b")
           .withColumn(
               "jaccard",
               F.round(F.col("shared_fp").cast("double")
                       / (F.col("n_a") + F.col("n_b")
                          - F.col("shared_fp")).cast("double"), 6))
           .where(F.col("jaccard") >= min_jaccard))
    return out.select("host_a", "host_b", "shared_fp",
                      "n_a", "n_b", "jaccard")


# --------------------------------------------------------------------------
# HITS hubs/authorities — integer micro domain
# --------------------------------------------------------------------------

def hits_micro(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """(node, auth_micro, hub_micro) — Kleinberg HITS, order-independent.

    HITS (Kleinberg, "Authoritative Sources in a Hyperlinked
    Environment", JACM 1999) is the other classic link-analysis score:
    a good *authority* is pointed to by good hubs, a good *hub* points
    to good authorities.  For a crawl scheduler the two scores split
    roles PageRank conflates — authorities are pages worth fetching
    and re-fetching, hubs (directories, sitemaps, link lists) are
    pages worth fetching because they DISCOVER the rest.

    Same exactness discipline as :func:`pagerank_micro`: all scores
    live on a 64-bit integer micro grid (1.0 ≡ 1_000_000) and the
    per-iteration max-normalization is an integer floor division, so
    every per-node sum is exact under ANY partitioning / summation
    order and the DuckDB oracle (unrolled CTEs) matches bit for bit —
    classic L2 normalization is replaced by max-normalization (also
    standard, converges to the same principal eigenvector direction)
    because it stays in the integer domain.

    Per iteration: ``auth_raw(v) = Σ_{(u,v)∈E} hub(u)`` then
    ``auth = auth_raw·10^6 div max(auth_raw)``; symmetrically for
    hubs over out-edges with the fresh auth scores.  Nodes without
    in-edges get auth 0, without out-edges hub 0.

    Scale shape: each iteration is two edge⋈score joins each followed
    by a slim groupBy on one endpoint (identical to pagerank's
    contribution step — no all-pairs, partial aggregation map-side)
    plus a 1-row broadcast max.  ``localCheckpoint`` truncates the
    unrolled lineage.  Overflow bound: ``auth_raw·10^6 < 2^63`` caps
    exact in-degree mass at ~9.2·10^6 max-weight in-edges per node;
    beyond that rescale the grid (divide raws by 2^k before
    normalizing) — the 10^10-URL host graph has ~10^8 hosts with
    in-degrees well under that after edge-dedup.
    """
    e = edges.select("src", "dst").distinct().cache()
    # nodes is joined TWICE per iteration — cache it, or each use
    # re-runs the union+distinct over e
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().cache())
    # the loop carries only the NONZERO score rows: a node absent from
    # the hub (auth) frame contributes exactly 0 to the next join's
    # sums, so materializing zero rows per iteration (a nodes-sized
    # left join, twice per iteration) buys nothing — zeros are filled
    # in ONCE at the end.  This halves the loop's join count.
    hub = nodes.select(
        "node", F.lit(RANK_ONE_MICRO).cast("long").alias("hub")) \
        .localCheckpoint(eager=True)
    if iterations <= 0:       # match hits_micro_py: initial scores
        out0 = nodes.select(
            "node",
            F.lit(RANK_ONE_MICRO).cast("long").alias("auth_micro"),
            F.lit(RANK_ONE_MICRO).cast("long").alias("hub_micro"))
        return _unpersist_on_gc(out0, [e, nodes])
    auth = None
    for _ in range(iterations):
        ar = (e.join(hub.select(F.col("node").alias("_s"), "hub"),
                     e["src"] == F.col("_s"))
              .groupBy("dst").agg(F.sum("hub").alias("raw")))
        am = F.broadcast(ar.agg(
            F.greatest(F.max("raw"), F.lit(1)).alias("_am")))
        auth = (ar.crossJoin(am)
                .select(F.col("dst").alias("node"),
                        F.expr("raw * 1000000 div _am").alias("auth"))
                # EAGER, not lazy: the next iteration's 1-row max is a
                # broadcast whose exchange thread would otherwise be
                # the first to materialize this checkpoint — the
                # documented RDDCheckpointData/DAGScheduler lock-order
                # deadlock (see the pagerank module docstring)
                .localCheckpoint(eager=True))
        hr = (e.join(auth.select(F.col("node").alias("_d"), "auth"),
                     e["dst"] == F.col("_d"))
              .groupBy("src").agg(F.sum("auth").alias("raw")))
        hm = F.broadcast(hr.agg(
            F.greatest(F.max("raw"), F.lit(1)).alias("_hm")))
        hub = (hr.crossJoin(hm)
               .select(F.col("src").alias("node"),
                       F.expr("raw * 1000000 div _hm").alias("hub"))
               .localCheckpoint(eager=True))
    out = (nodes
           .join(auth, "node", "left")
           .join(hub, "node", "left")
           .select("node",
                   F.coalesce("auth", F.lit(0)).cast("long")
                   .alias("auth_micro"),
                   F.coalesce("hub", F.lit(0)).cast("long")
                   .alias("hub_micro")))
    return _unpersist_on_gc(out, [e, nodes])


def hits_micro_py(edges, iterations: int = 3) -> dict:
    """Pure-Python twin of :func:`hits_micro` — {node: (auth, hub)}."""
    es = sorted(set((s, d) for s, d in edges))
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    auth = {v: RANK_ONE_MICRO for v in nodes}
    hub = {v: RANK_ONE_MICRO for v in nodes}
    for _ in range(iterations):
        araw = {v: 0 for v in nodes}
        for s, d in es:
            araw[d] += hub[s]
        am = max(max(araw.values(), default=0), 1)
        auth = {v: (araw[v] * RANK_ONE_MICRO) // am for v in nodes}
        hraw = {v: 0 for v in nodes}
        for s, d in es:
            hraw[s] += auth[d]
        hm = max(max(hraw.values(), default=0), 1)
        hub = {v: (hraw[v] * RANK_ONE_MICRO) // hm for v in nodes}
    return {v: (auth[v], hub[v]) for v in nodes}


def opic_micro(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """(node, importance_micro, cash_micro) — OPIC, order-independent.

    Adaptive On-line Page Importance Computation (Abiteboul, Preda,
    Cobena, WWW 2003): every node holds CASH; each round it
    distributes its cash equally over its out-edges and banks the
    amount into its HISTORY; dangling cash routes through the virtual
    root — redistributed uniformly.  Importance after R rounds is
    ``history + cash``.  What OPIC buys over PageRank for a CRAWLER:
    the estimate is meaningful after any number of rounds and updates
    incrementally as pages are fetched — the scheduler reads cash as
    "importance accumulated since last visit", which is exactly the
    refetch-priority signal, without iterating a full power method to
    convergence.

    Same exactness discipline as :func:`pagerank_micro`: all amounts
    on the 64-bit integer micro grid, per-edge shares and the
    virtual-root split are floor divisions, so every sum is exact
    under ANY partitioning and the DuckDB oracle (unrolled CTEs)
    matches bit for bit.  Floor leaks a few micro-units per round —
    a priority signal with a spec, not a probability estimate.

    Scale shape per round: ONE co-partitioned edge⋈cash join + ONE
    slim groupBy(dst) with map-side partials (identical to the
    pagerank contribution step), a 1-row dangling broadcast, and an
    EAGER localCheckpoint (the broadcast-thread lazy-checkpoint
    deadlock discipline documented above).
    """
    e = edges.select("src", "dst").distinct() \
        .repartition("src").cache()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = (nodes.join(deg.withColumnRenamed("src", "node"),
                       "node", "left")
            .select("node",
                    F.coalesce("outdeg", F.lit(0)).cast("long")
                    .alias("outdeg"))
            .localCheckpoint(eager=True))
    n_total = F.broadcast(base.agg(F.count("*").alias("_n")))
    s = base.select(
        "node", "outdeg",
        F.lit(RANK_ONE_MICRO).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist")) \
        .localCheckpoint(eager=True)
    for _ in range(rounds):
        inflow = (e.join(s.where(F.col("outdeg") > 0)
                         .select(F.col("node").alias("_s"), "cash",
                                 F.col("outdeg").alias("_od")),
                         e["src"] == F.col("_s"))
                  .select(F.col("dst").alias("node"),
                          F.expr("cash div _od").alias("_c"))
                  .groupBy("node").agg(F.sum("_c").alias("inflow")))
        dang = F.broadcast(s.agg(
            F.coalesce(F.sum(F.when(F.col("outdeg") == 0,
                                    F.col("cash"))), F.lit(0))
            .alias("_d")))
        s = (s.join(inflow, "node", "left")
             .crossJoin(dang).crossJoin(n_total)
             .select("node", "outdeg",
                     (F.coalesce("inflow", F.lit(0))
                      + F.expr("_d div _n")).cast("long")
                     .alias("cash"),
                     (F.col("hist") + F.col("cash")).cast("long")
                     .alias("hist"))
             .localCheckpoint(eager=True))
    out = s.select("node",
                   (F.col("hist") + F.col("cash")).cast("long")
                   .alias("importance_micro"),
                   F.col("cash").alias("cash_micro"))
    return _unpersist_on_gc(out, [e])


def opic_micro_py(edges, rounds: int = 3) -> dict:
    """Pure-python twin of :func:`opic_micro` (exact integer replay)."""
    es = sorted(set(edges))
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    out = {}
    for s, d in es:
        out.setdefault(s, []).append(d)
    n = len(nodes)
    cash = {v: RANK_ONE_MICRO for v in nodes}
    hist = {v: 0 for v in nodes}
    for _ in range(rounds):
        inflow = {v: 0 for v in nodes}
        dang = 0
        for v in nodes:
            if v in out:
                share = cash[v] // len(out[v])
                for d in out[v]:
                    inflow[d] += share
            else:
                dang += cash[v]
        g = dang // n
        for v in nodes:
            hist[v] += cash[v]
        cash = {v: inflow[v] + g for v in nodes}
    return {v: (hist[v] + cash[v], cash[v]) for v in nodes}
