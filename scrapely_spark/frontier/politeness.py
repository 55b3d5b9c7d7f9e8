"""Per-host politeness scheduling: salted two-phase top-k per host.

Each crawl round models a fixed politeness window of ``ROUND_SECONDS``;
a host with ``crawl_delay`` d gets ``max(1, floor(ROUND_SECONDS/d))``
fetches per round.  Selection within a host is by the total order
``(priority asc, canonical_url asc)`` — a deterministic key, never
partition arrival order, which is what makes the crawl ordering
byte-identical to the single-threaded oracle.

Skew: a mega-host (30% of the synthetic frontier) would serialize a naive
``Window.partitionBy(host)`` onto one task.  The selection runs in two
phases:

1. rank inside ``(host, salt)`` where ``salt = pmod(url_key, S)`` — S
   parallel partial top-k's, each keeping at most ``budget`` rows;
2. rank the ≤ S·budget survivors inside ``host`` — now tiny per host.

Phase 1 bounds any task's sort to ~|host|/S rows; phase 2's skew is gone
because its input per host is capped.  Both phases are pure window
functions (JVM, whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ROUND_SECONDS = 10.0
N_SALTS = 16


_MIN_DELAY = 0.001  # 'Crawl-delay: 0' is legal; clamp so both twins agree


def host_budget_expr(round_seconds: float = ROUND_SECONDS):
    delay = F.greatest(F.col("crawl_delay"), F.lit(_MIN_DELAY))
    return F.greatest(
        F.lit(1), F.floor(F.lit(round_seconds) / delay)).cast("int")


def host_budget(crawl_delay: float,
                round_seconds: float = ROUND_SECONDS) -> int:
    """Pure-python twin for the oracle."""
    return max(1, int(round_seconds / max(crawl_delay, _MIN_DELAY)))


def select_fetch_batch(candidates: DataFrame, n_salts: int = N_SALTS,
                       round_seconds: float = ROUND_SECONDS,
                       cap_col: str | None = None) -> DataFrame:
    """Pick each host's politeness budget of URLs for this round.

    Requires columns: host, crawl_delay, priority, canonical_url, url_key.
    ``cap_col`` (optional): a per-host integer column that further caps
    the budget (global budget allocation — see ``budget_caps``); a host
    missing a cap keeps its plain politeness budget.
    """
    order = [F.col("priority").asc(), F.col("canonical_url").asc()]

    salted = candidates.withColumn(
        "salt", F.pmod(F.col("url_key"), F.lit(n_salts)))
    budget = host_budget_expr(round_seconds)
    if cap_col is not None:
        budget = F.least(
            budget,
            F.coalesce(F.col(cap_col).cast("int"),
                       budget).cast("int"))
    phase1 = (
        salted.withColumn(
            "r1",
            F.row_number().over(
                Window.partitionBy("host", "salt").orderBy(*order)))
        .where(F.col("r1") <= budget)
        .drop("salt", "r1"))

    phase2 = (
        phase1.withColumn(
            "r2",
            F.row_number().over(Window.partitionBy("host").orderBy(*order)))
        .where(F.col("r2") <= budget)
        .drop("r2"))
    return phase2


def retry_schedule(fetch_log: DataFrame, base_delay_s: int = 60,
                   max_retries: int = 5,
                   url_col: str = "url", ts_col: str = "ts",
                   ok_col: str = "ok") -> DataFrame:
    """Exponential-backoff retry queue from the fetch log — the
    transient-failure half of frontier scheduling (politeness covers
    the polite half).

    For every URL whose TRAILING fetches failed (every failure after
    its last success; a URL whose latest fetch succeeded is healthy
    and emits nothing):

    * ``n_failures`` — the length of the trailing failure run,
    * ``next_attempt_us`` — ``last_failure + base · 2^(min(n,cap)−1)``
      (the classic doubling schedule, exponent capped so the delay
      stops growing at ``max_retries``),
    * ``give_up`` — true past ``max_retries``; the scheduler parks the
      URL instead of retrying.

    All arithmetic is integer microseconds (``unix_micros`` /
    ``shiftleft``), so the schedule is bit-stable across engines.

    Scale shape: one shuffle — the window partitions by URL and the
    groupBy reuses the same key's partitioning; only (url, ts, ok)
    ever moves.  The trailing-run filter drops healthy URLs BEFORE the
    aggregate, so the retry queue is bounded by currently-failing
    URLs, not log size.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(url_col)
    logged = fetch_log.select(
        F.col(url_col).alias("url"), us.alias("_us"),
        F.col(ok_col).cast("boolean").alias("_ok"))
    logged = logged.withColumn(
        "_ls", F.max(F.when(F.col("_ok"), F.col("_us"))).over(w))
    trailing = logged.where(
        (~F.col("_ok"))
        & (F.col("_ls").isNull() | (F.col("_us") > F.col("_ls"))))
    base_us = int(base_delay_s) * 1_000_000
    n = F.count("*")
    return (trailing.groupBy("url")
            .agg(n.alias("n_failures"),
                 F.max("_us").alias("last_failure_us"))
            .select(
                "url", "n_failures", "last_failure_us",
                (F.col("last_failure_us")
                 + F.lit(base_us)
                 * F.expr("CAST(shiftleft(1, CAST(least(n_failures, %d)"
                          " AS INT) - 1) AS BIGINT)" % max_retries))
                .alias("next_attempt_us"),
                (F.col("n_failures") > max_retries).alias("give_up")))


def recrawl_schedule(fetch_history: DataFrame,
                     min_interval_s: int = 3600,
                     max_interval_s: int = 30 * 24 * 3600,
                     url_col: str = "url", ts_col: str = "ts",
                     hash_col: str = "content_hash") -> DataFrame:
    """Change-rate-driven recrawl scheduling — the freshness half of
    frontier scheduling (cf. Cho & Garcia-Molina, "Synchronizing a
    database to improve freshness", 2000: revisit frequency should
    track the page's observed change frequency).

    From the fetch history ``(url, ts, content_hash)``, for every URL
    fetched at least twice:

    * ``n_changes`` — observed content transitions (hash differs from
      the previous fetch's, in time order; ties broken by hash so the
      count is total-order deterministic),
    * ``change_ratio`` — ``n_changes / (n_fetches − 1)``,
    * ``next_fetch_us`` — last fetch + the average observed interval
      stretched by ``1 / (change_ratio + 0.1)`` (a page that changed
      every visit is refetched at ~0.9× its observed cadence, a page
      that never changed at ~10×), clamped to
      ``[min_interval_s, max_interval_s]``.

    Determinism: counts and spans are integer microseconds; the two
    divisions and the floor back onto the integer grid are the same
    correctly-rounded IEEE ops in both engines (floor is explicit —
    Spark's double→long cast truncates while DuckDB's rounds, so a
    bare cast is the classic cross-engine trap).

    Scale shape: one shuffle — the lag window partitions by URL and
    the groupBy reuses the key; only (url, ts, hash) moves, and the
    output is one row per multi-fetch URL.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (Window.partitionBy(url_col)
         .orderBy(F.asc("_us"), F.asc("_h")))
    rows = fetch_history.select(
        F.col(url_col).alias("url"), us.alias("_us"),
        F.col(hash_col).alias("_h"))
    changed = (F.lag("_h").over(w).isNotNull()
               & (F.col("_h") != F.lag("_h").over(w)))
    agg = (rows.withColumn("_chg", changed.cast("long"))
           .groupBy("url")
           .agg(F.count("*").alias("n_fetches"),
                F.sum("_chg").alias("n_changes"),
                F.min("_us").alias("_first_us"),
                F.max("_us").alias("_last_us"))
           .where(F.col("n_fetches") >= 2))
    avg_iv = ((F.col("_last_us") - F.col("_first_us")).cast("double")
              / (F.col("n_fetches") - 1).cast("double"))
    ratio = (F.col("n_changes").cast("double")
             / (F.col("n_fetches") - 1).cast("double"))
    iv = F.floor(avg_iv / (ratio + F.lit(0.1))).cast("long")
    iv = F.greatest(F.lit(int(min_interval_s) * 1_000_000),
                    F.least(F.lit(int(max_interval_s) * 1_000_000), iv))
    return agg.select(
        "url", "n_fetches", "n_changes",
        ratio.alias("change_ratio"),
        (F.col("_last_us") + iv).alias("next_fetch_us"))


def adaptive_crawl_delay(fetch_log: DataFrame,
                         multiplier: int = 2,
                         min_delay_us: int = 500_000,
                         max_delay_us: int = 10_000_000,
                         host_col: str = "host",
                         latency_col: str = "latency_us") -> DataFrame:
    """Latency-adaptive per-host crawl delay — the server-load half of
    politeness.  A polite crawler backs off hosts that answer slowly
    (slow responses mean the crawl IS the load): the next round's
    delay is ``clamp(p95_latency · multiplier)``, the AIMD-flavored
    rule production crawlers pair with robots.txt ``Crawl-delay``
    (the larger of the two wins downstream).

    The p95 is NEAREST-RANK on integer microseconds — rank
    ``ceil(95·n/100)`` in the per-host latency order, computed as
    ``(95·n + 99) div 100`` so no floating-point enters the schedule
    and the output is bit-stable across engines (the same contract as
    retry_schedule's integer-µs arithmetic).

    Scale shape: ONE shuffle on host — the rank window and the per-host
    count share the same partitioning, and only (host, latency) ever
    moves.  Per-host row counts are bounded by politeness itself (a
    host yields at most round_budget fetches per round), so the window
    sort cannot skew the way a raw-log window would.
    """
    w = Window.partitionBy("_h")
    # timeouts/errors may log NULL latencies; they carry no load
    # signal and must not enter the rank (NULLs sort first, shifting
    # the nearest-rank p95 onto a lower real latency — or onto NULL)
    log = fetch_log.select(
        F.col(host_col).alias("_h"),
        F.col(latency_col).cast("long").alias("_lat")).where(
        F.col("_lat").isNotNull())
    ranked = (log
              .withColumn("_rn", F.row_number().over(
                  Window.partitionBy("_h").orderBy("_lat")))
              .withColumn("_n", F.count("*").over(w)))
    p95 = ranked.where(F.col("_rn") == F.expr("(95 * _n + 99) div 100"))
    delay = F.greatest(
        F.lit(int(min_delay_us)).cast("long"),
        F.least(F.lit(int(max_delay_us)).cast("long"),
                F.col("_lat") * int(multiplier)))
    return p95.select(
        F.col("_h").alias("host"),
        F.col("_n").alias("n_fetches"),
        F.col("_lat").alias("p95_latency_us"),
        delay.alias("crawl_delay_us"))


def crawl_budget_allocation(hosts: DataFrame, budget_fetches: int,
                            host_col: str = "host",
                            demand_col: str = "demand",
                            weight_col: str = "weight_micro"
                            ) -> DataFrame:
    """Weighted water-filling of a global per-round fetch budget across
    hosts — the scheduler step between authority scoring and the
    politeness top-k: spend ``budget_fetches`` proportionally to each
    host's weight (authority × freshness, on an integer micro grid),
    but never give a host more than its ``demand`` (pending URLs).

    Exact closed form, no iterative loop (the weighted sibling of
    corpus.unimax_allocation's capped-simplex projection): sort hosts
    by ``demand/weight`` ascending; with demand prefix sums ``P_k``
    and weight prefix sums ``W_k``, the water level is
    ``L = max_k (B − P_{k−1}) / (W_N − W_{k−1})`` and each host takes
    ``alloc = min(demand, L · weight)``.  When ``B ≥ Σ demand`` every
    host is fully served (the last candidate clears every ratio).

    Determinism: demands and weights are integers; the sort ratio, the
    level candidates and the final ``L·w`` are single IEEE ops the
    oracle performs in the same order, ties broken by host — so the
    emitted doubles hash exactly.

    Scale shape: the input here is the HOST table (one row per host —
    already orders of magnitude under the URL count), so the global
    windows sort a bounded-small table, the same discipline as the
    mixing allocators; upstream demand/weight aggregation is the
    callers' one groupBy(host).
    """
    b = float(int(budget_fetches))
    w_order = Window.orderBy(
        F.asc(F.col("_d").cast("double") / F.col("_w").cast("double")),
        F.asc("_h"))
    everything = Window.partitionBy()
    staged = hosts.select(F.col(host_col).alias("_h"),
                          F.col(demand_col).cast("long").alias("_d"),
                          F.col(weight_col).cast("long").alias("_w"))
    # zero-weight hosts take no share and must not enter the
    # water-fill: their NULL demand/weight ratio would sort first and
    # poison every prefix-sum level candidate (Spark's x/0.0 is NULL)
    zero = staged.where(F.col("_w") <= 0).select(
        F.col("_h").alias("host"),
        F.col("_d").alias("demand"),
        F.col("_w").alias("weight_micro"),
        F.lit(0.0).alias("alloc_fetches"),
        F.lit(0).cast("long").alias("alloc_floor"),
        F.lit(0.0).alias("alloc_frac"))
    staged = staged.where(F.col("_w") > 0)
    pre_d = F.coalesce(
        F.sum("_d").over(w_order.rowsBetween(Window.unboundedPreceding,
                                             -1)),
        F.lit(0).cast("long"))
    pre_w = F.coalesce(
        F.sum("_w").over(w_order.rowsBetween(Window.unboundedPreceding,
                                             -1)),
        F.lit(0).cast("long"))
    w_tot = F.sum("_w").over(everything)
    cand = ((F.lit(b) - pre_d.cast("double"))
            / (w_tot - pre_w).cast("double"))
    staged = staged.select("_h", "_d", "_w", cand.alias("_cand"))
    level = F.max("_cand").over(everything)
    alloc = F.least(F.col("_d").cast("double"),
                    level * F.col("_w").cast("double"))
    # integer consumption path (budget_caps / the crawl scheduler):
    # floor + fractional remainder of the UNROUNDED alloc — round()
    # half-way ties break differently across engines, floor of the
    # same IEEE double never does
    return staged.select(
        F.col("_h").alias("host"),
        F.col("_d").alias("demand"),
        F.col("_w").alias("weight_micro"),
        F.round(alloc, 6).alias("alloc_fetches"),
        F.floor(alloc).cast("long").alias("alloc_floor"),
        (alloc - F.floor(alloc)).alias("alloc_frac")).unionByName(zero)


def budget_caps(hosts: DataFrame, budget_fetches: int,
                host_col: str = "host", demand_col: str = "demand",
                weight_col: str = "weight_micro") -> DataFrame:
    """Integer per-host fetch caps that spend a global round budget
    EXACTLY: water-fill (:func:`crawl_budget_allocation`), floor each
    allocation, then hand the leftover ``B − Σ floor`` out one fetch
    each to the hosts with the largest fractional remainders
    (largest-remainder method, ties by host) — only to hosts whose
    demand is not already met AND whose weight is positive, so no
    host is topped up past its pending URLs and a zero-weight host
    (excluded from the water-fill by contract) can never win a
    top-up fetch either.  ``Σ cap == min(B, Σ demand over
    positive-weight hosts)`` exactly: a bare floor could strand the
    whole budget (every alloc < 1 floors to 0 and the round fetches
    nothing), and any rounding rule would over- or under-spend.

    Determinism: the remainders are the unrounded IEEE doubles from
    the water-fill; the top-up rank orders on (eligible desc,
    remainder desc, host asc) — a total key both engines sort
    identically (oracle twin :func:`budget_caps_py`).

    Scale shape: the input is the host table; one extra global window
    over it (same bounded-small discipline as the water-fill itself).

    Returns (host, demand, weight_micro, cap_fetches).
    """
    a = crawl_budget_allocation(hosts, budget_fetches,
                                host_col=host_col,
                                demand_col=demand_col,
                                weight_col=weight_col)
    everything = Window.partitionBy()
    eligible = ((F.col("demand") > F.col("alloc_floor"))
                & (F.col("weight_micro") > 0))
    left = (F.lit(int(budget_fetches)).cast("long")
            - F.sum("alloc_floor").over(everything))
    rk = F.row_number().over(
        Window.orderBy(F.desc(eligible), F.desc("alloc_frac"),
                       F.asc("host")))
    cap = (F.col("alloc_floor")
           + (eligible & (rk <= left)).cast("long"))
    return a.select("host", "demand", "weight_micro",
                    cap.alias("cap_fetches"))


def crawl_budget_allocation_py(hosts: list, budget_fetches: int) -> dict:
    """Pure-python twin of :func:`crawl_budget_allocation` for the
    crawl oracle: same sort key, same prefix-sum level candidates in
    the same order, every division the identical single IEEE op.
    ``hosts`` is [(host, demand, weight_micro)]; returns
    host → (demand, weight, alloc_exact)."""
    b = float(int(budget_fetches))
    pos = [(h, int(d), int(w)) for h, d, w in hosts if int(w) > 0]
    out = {h: (int(d), int(w), 0.0) for h, d, w in hosts
           if int(w) <= 0}
    if not pos:
        return out
    pos.sort(key=lambda t: (t[1] / t[2], t[0]))
    w_tot = sum(w for _, _, w in pos)
    pre_d = pre_w = 0
    level = None
    for _, d, w in pos:
        cand = (b - float(pre_d)) / float(w_tot - pre_w)
        level = cand if level is None else max(level, cand)
        pre_d += d
        pre_w += w
    for h, d, w in pos:
        out[h] = (d, w, min(float(d), level * float(w)))
    return out


def budget_caps_py(hosts: list, budget_fetches: int) -> dict:
    """Pure-python twin of :func:`budget_caps`: floor + largest-
    remainder top-up on the same unrounded doubles.  Returns
    host → cap_fetches (int)."""
    import math

    alloc = crawl_budget_allocation_py(hosts, budget_fetches)
    floors = {h: int(math.floor(a)) for h, (_, _, a) in alloc.items()}
    left = int(budget_fetches) - sum(floors.values())
    ranked = sorted(
        alloc.items(),
        key=lambda kv: (not (kv[1][0] > floors[kv[0]]
                             and kv[1][1] > 0),            # eligible first
                        -(kv[1][2] - floors[kv[0]]),      # frac desc
                        kv[0]))                           # host asc
    caps = dict(floors)
    for h, (d, w, _) in ranked:
        if left <= 0:
            break
        if d > caps[h] and w > 0:
            caps[h] += 1
            left -= 1
    return caps


def adaptive_crawl_delay_py(latencies_by_host: dict,
                            multiplier: int = 2,
                            min_delay_us: int = 500_000,
                            max_delay_us: int = 10_000_000) -> dict:
    """Pure-python twin of :func:`adaptive_crawl_delay` for the crawl
    oracle: nearest-rank p95 at rank ``(95·n + 99) div 100`` over the
    per-host integer-µs latency order, then ``clamp(p95·multiplier)``.
    Returns host → crawl_delay_us (int)."""
    out = {}
    for host, lats in latencies_by_host.items():
        lats = sorted(int(x) for x in lats if x is not None)
        if not lats:
            continue
        n = len(lats)
        p95 = lats[(95 * n + 99) // 100 - 1]
        out[host] = max(int(min_delay_us),
                        min(int(max_delay_us), p95 * int(multiplier)))
    return out


def crawl_tiers(hosts: DataFrame, n_tiers: int = 4,
                score_col: str = "score",
                host_col: str = "host") -> DataFrame:
    """Tiered crawl scheduling: rank hosts by a composite score and
    split them into ``n_tiers`` crawl tiers with geometric budget
    shares — tier 1 (the head: high-authority, high-quality hosts)
    gets half the fetch budget, tier 2 a quarter, and so on
    (share(t) = 2^(n−t) / (2^n − 1), an exact double for small n).

    The caller supplies the composite ``score`` (e.g. PageRank
    authority × mean document quality — see the ``url_crawl_tiers``
    driver row); this function owns only the deterministic ranking:
    ``ntile(n_tiers)`` over the total order (score desc, host asc) —
    ties broken by host so the assignment is engine-portable.

    Scale note: the ntile window is a single global sort — correct
    here because the input is HOST-level (bounded ~10^7 rows, a few
    hundred MB), never URL-level; feeding URLs through this would be
    the wrong plan.  Per-URL budgeting stays in
    :func:`crawl_budget_allocation` / :func:`select_fetch_batch`.
    """
    w = Window.orderBy(F.col(score_col).desc(), F.col(host_col).asc())
    denom = float(2 ** n_tiers - 1)
    return (hosts
            .withColumn("tier", F.ntile(n_tiers).over(w))
            .withColumn("tier_share",
                        F.pow(F.lit(2.0),
                              (F.lit(n_tiers) - F.col("tier"))
                              .cast("double")) / F.lit(denom)))


def snapshot_diff(old: DataFrame, new: DataFrame,
                  url_col: str = "url", hash_col: str = "content_hash",
                  host_col: str = "host") -> DataFrame:
    """Classify per-URL churn between two crawl snapshots: ``added``
    (new round only), ``removed`` (old only), ``changed`` (both, hash
    differs), ``unchanged``.  The churn feed for
    :func:`recrawl_schedule` and for host-level freshness analytics
    (a host whose content churns every round wants a faster recrawl
    tier; one that never changes wants the slow tier).

    One full-outer sort-merge join on the URL key is the whole plan —
    and when both snapshots come from the crawl's bucketed replay
    store (CLUSTERED BY url) it is exchange-free on both sides.
    Output carries (url, host, status); rates are one grouped count
    away and stay bounded by hosts.
    """
    o = old.select(F.col(url_col).alias("url"),
                   F.col(host_col).alias("_host_o"),
                   F.col(hash_col).alias("_old"))
    n = new.select(F.col(url_col).alias("url"),
                   F.col(host_col).alias("_host_n"),
                   F.col(hash_col).alias("_new"))
    status = (F.when(F.col("_old").isNull(), F.lit("added"))
              .when(F.col("_new").isNull(), F.lit("removed"))
              .when(F.col("_old") == F.col("_new"), F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return (o.join(n, "url", "full_outer")
            .select("url",
                    F.coalesce("_host_n", "_host_o").alias("host"),
                    status.alias("status")))


def rendezvous_shards(hosts: DataFrame, n_shards: int = 16,
                      host_col: str = "host") -> DataFrame:
    """Assign each host to a fetch shard by rendezvous (HRW) hashing.

    At cluster scale the fetch fleet is a fixed set of ``n_shards``
    worker groups, and every URL of a host must land on the SAME group
    so per-host politeness (one connection, one delay clock) is
    enforced locally instead of through a global coordination service.
    Highest-random-weight hashing gives that mapping two properties a
    plain ``hash(host) % n_shards`` lacks:

    * **minimal remapping** — growing the fleet to ``n_shards + 1``
      moves only the hosts whose new shard's weight wins (~1/(n+1) of
      them); a modulo remaps almost everything, invalidating every
      warm robots/DNS/connection cache in the fleet;
    * **no coordination state** — the assignment is a pure function of
      (host, shard), so any executor recomputes it locally; nothing is
      stored, nothing can go stale.

    Plan shape: the weight argmax is computed map-side with an
    ``array_max`` over ``n_shards`` literal structs — zero shuffle, no
    explode, no window.  The 48-bit weight space is the engine's
    standard ``conv(substr(md5(..),1,12),16,10)`` so a SQL oracle can
    replay it bit-for-bit.  Struct comparison is lexicographic, so
    ``(weight, -shard)`` makes the argmax total even on 48-bit ties.

    Returns (host, shard, hrw_weight) — one row per input row.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1, got %d" % n_shards)

    def weight(i: int):
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(host_col), F.lit(i))),
                1, 12),
            16, 10).cast("long")

    best = F.array_max(F.array(*[
        F.struct(weight(i).alias("w"),
                 F.lit(-i).cast("int").alias("neg_shard"))
        for i in range(n_shards)]))
    return hosts.select(
        F.col(host_col).alias("host"),
        (-best["neg_shard"]).cast("int").alias("shard"),
        best["w"].alias("hrw_weight"))


def ip_budget_groups(hosts: DataFrame, budget_col: str = "budget",
                     cdn_threshold: int = 64) -> DataFrame:
    """Shared-IP politeness: hosts that resolve to one address share
    one origin server — fetch budgets must merge or the crawler is
    polite per NAME while hammering the BOX.

    Classification per IP by distinct-host fan-in:

    * ``dedicated`` (1 host) — the host keeps its full budget;
    * ``shared`` (2..``cdn_threshold``) — classic shared hosting: the
      per-IP budget is the budget, split evenly across its hosts
      (floor division, minimum 1 so no host starves to zero);
    * ``cdn`` (> threshold) — anycast/CDN front doors host thousands
      of names and absorb per-host load by design; splitting would
      starve every site behind the CDN, so hosts keep full budgets
      and the class is surfaced for rate monitoring instead.

    The cdn arm is why this cannot be "just divide": the two failure
    modes (hammering a shared box / starving everything behind
    Cloudflare) pull in opposite directions and the fan-in count is
    what separates them.

    Fan-in is the DISTINCT-host count per IP, not a row count: the
    natural input is one row per (ip, host), but an upstream that
    emits duplicate host rows (retries, multiple URLs per host) must
    not inflate the fan-in and flip dedicated→shared — a flipped
    class silently halves real budgets through the even split.

    Plan: ONE ip-keyed window over the host dimension (host
    cardinality, slim columns) — no join-back, no second shuffle; the
    distinct count is ``size(collect_set(host))`` inside that window,
    whose per-group memory is bounded by the fan-in (a 10^5-name CDN
    IP is a few MB of hostnames — fine at executor scale).  Integer
    arithmetic throughout.

    Returns input columns + (n_hosts_on_ip, ip_class, host_budget).
    """
    w = Window.partitionBy("ip")
    n = F.size(F.collect_set(F.col("host")).over(w))
    staged = hosts.withColumn("n_hosts_on_ip", n.cast("long"))
    cls = (F.when(F.col("n_hosts_on_ip") == 1, F.lit("dedicated"))
           .when(F.col("n_hosts_on_ip") <= cdn_threshold,
                 F.lit("shared"))
           .otherwise(F.lit("cdn")))
    split = F.greatest(
        F.expr("%s div n_hosts_on_ip" % budget_col),
        F.lit(1).cast("long"))
    return staged.select(
        *hosts.columns, "n_hosts_on_ip", cls.alias("ip_class"),
        F.when(cls == "shared", split)
        .otherwise(F.col(budget_col).cast("long"))
        .alias("host_budget"))
