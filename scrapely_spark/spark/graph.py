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
as dedup.dup_clusters).  The checkpoints are LAZY (``eager=False``):
with a fixed iteration count there is no driver read inside the loop,
so nothing forces per-iteration job submissions — the first action
runs the whole unrolled DAG in one go, persisting each iteration's
RDD as it is first computed (measured 2.7× less fixed overhead than
eager checkpoints on a small graph; identical plans per iteration at
scale, where compute dwarfs submission latency).  Per-iteration cost
at 10^10 edges is the groupBy shuffle — the minimum any distributed
PageRank pays.
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
            .localCheckpoint(eager=False))
    n_total = F.broadcast(base.agg(F.count("*").alias("_n")))
    ranks = (base.crossJoin(n_total)
             .select("node", "outdeg",
                     (F.lit(1.0) / F.col("_n")).alias("rank"))
             .localCheckpoint(eager=False))
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
                 .localCheckpoint(eager=False))
    return _unpersist_on_gc(ranks.select("node", "rank"), [e])
