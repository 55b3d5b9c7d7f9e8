"""Oracle crawl scheduler: the single-threaded executable spec.

The reference library (scrapely) contains no crawler — its only fetch is a
blocking urlopen (scrapely/htmlpage.py:183) — so crawl parity needs a
definition (SURVEY.md §7.4).  This module IS that definition: a pure
Python, deterministic scheduler over the same synthetic corpus, seed list
and politeness budget as the Spark pipeline.  The Spark job must reproduce

* the per-round fetch order (sorted by ``(priority, canonical_url)``), and
* the final URL-seen key set

byte-identically (tests/test_crawl_parity.py).

Protocol (shared with scrapely_spark.frontier.rounds):

* every URL is canonicalized; its key is murmur3_32(canonical) == F.hash;
* enqueue(url, depth): unseen keys are marked seen, robots-disallowed
  URLs are dropped (but stay seen), others enter the frontier with
  priority = depth;
* each round, every host fetches its politeness budget
  ``max(1, floor(ROUND_SECONDS / crawl_delay))`` of frontier URLs in
  ``(priority, canonical_url)`` order;
* fetched pages are replayed from the synthetic store; their outlinks are
  enqueued at depth+1; fetched entries leave the frontier;
* stop when the frontier is empty or max_rounds is reached.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from scrapely_spark.frontier.canonical import canonicalize, murmur3_32
from scrapely_spark.frontier.politeness import (adaptive_crawl_delay_py,
                                                budget_caps_py,
                                                host_budget)
from scrapely_spark.frontier.robots import DEFAULT_CRAWL_DELAY, is_allowed
from scrapely_spark.spark import datagen


class OracleCrawl:
    def __init__(self, n_pages: int, seeds: list[str],
                 robots: dict[str, dict] | None = None,
                 n_hosts: int = datagen.N_HOSTS_DEFAULT,
                 round_seconds: float = 10.0,
                 authority_levels: int = 1,
                 authority_iters: int = 3,
                 template_budget: int = 0,
                 adaptive_delay: bool = False,
                 adaptive_multiplier: int = 2,
                 budget_fetches: int = 0):
        self.n = n_pages
        self.n_hosts = n_hosts
        self.round_seconds = round_seconds
        # PageRank-driven prioritization twins (rounds.crawl kwargs of
        # the same names); levels == 1 disables (identity priority)
        self.authority_levels = authority_levels
        self.authority_iters = authority_iters
        self.template_budget = template_budget
        # adaptive-scheduling twins (rounds.crawl kwargs of the same
        # names): latency-adaptive per-host delay off the accumulated
        # fetch log, and the global water-filled fetch budget
        self.adaptive_delay = adaptive_delay
        self.adaptive_multiplier = adaptive_multiplier
        self.budget_fetches = budget_fetches
        self.latencies_by_host: dict[str, list] = {}
        self.host_edges: set = set()   # accumulated (src_host, dst_host)
        self.robots = robots if robots is not None else {
            r["host"]: r for r in
            (datagen.robots_record(h) for h in range(n_hosts))}
        # dedup is by canonical-string equality (collision-free at any
        # scale); murmur3 keys exist for bloom blocks / salting only
        self.seen: set[str] = set()
        self.frontier: dict[str, tuple] = {}  # canon → (prio, host)
        self.fetch_log: list[tuple] = []      # (round, priority, canon)
        self.extracted = 0
        self.pages_by_canon = {}
        for i in range(n_pages):
            rec = datagen.page_record(i, n_pages, n_hosts)
            self.pages_by_canon[canonicalize(rec["url"])] = (i, rec)
        for url in seeds:
            self.enqueue(url, depth=0)

    def enqueue(self, url: str, depth: int):
        self.enqueue_canonical(canonicalize(url), depth)

    def enqueue_canonical(self, canon: str, depth: int):
        if not canon:
            return  # unparseable URL: same drop as the engine's
        host = (urlsplit(canon).hostname or "").lower()
        if not host:
            return  # hostless canonical (e.g. 'ftp:' oddities)
        if canon in self.seen:
            return
        self.seen.add(canon)
        rules = self.robots.get(host)
        if rules and not is_allowed(urlsplit(canon).path,
                                    rules["disallow"]):
            return  # disallowed: seen but never fetched
        self.frontier[canon] = (depth, host)

    def crawl_delay(self, host: str) -> float:
        rules = self.robots.get(host)
        return rules["crawl_delay"] if rules else DEFAULT_CRAWL_DELAY

    def _authority_buckets(self) -> dict | None:
        """Round-start host→bucket map from the accumulated link graph
        (the twin of rounds.crawl's ``_authority_view``)."""
        if self.authority_levels <= 1 or not self.host_edges:
            return None
        from scrapely_spark.spark.graph import (authority_buckets_py,
                                                pagerank_micro_py)
        ranks = pagerank_micro_py(self.host_edges, self.authority_iters)
        return authority_buckets_py(ranks, self.authority_levels)

    def run_round(self, round_id: int) -> int:
        # per-host top-budget selection in (priority, canonical_url)
        # order, where priority is the recorded composite
        # depth·levels + auth_bucket when authority mode is on
        # (levels == 1 makes it plain depth)
        levels = self.authority_levels
        buckets = self._authority_buckets()

        def eff(depth: int, host: str) -> int:
            if levels <= 1:
                return depth
            b = buckets.get(host, levels - 1) if buckets else levels - 1
            return depth * levels + b

        by_host: dict[str, list] = {}
        for canon, (prio, host) in self.frontier.items():
            by_host.setdefault(host, []).append((eff(prio, host), canon))
        # effective per-host delay: the larger of robots Crawl-delay
        # and the adaptive p95-latency delay (twin of the
        # _politeness_wave greatest(); delays come from rounds < this
        # one — the Spark side reads only COMMITTED fetch-log rounds)
        adelay = (adaptive_crawl_delay_py(
            self.latencies_by_host,
            multiplier=self.adaptive_multiplier)
            if self.adaptive_delay else {})

        def budget_of(host: str) -> int:
            d = max(self.crawl_delay(host),
                    adelay.get(host, 0) / 1e6)
            return host_budget(d, self.round_seconds)

        if self.budget_fetches > 0:
            # global water-filled budget: demand = pending∧politeness,
            # weight = politeness budget (twin of the _politeness_wave
            # budget_caps wiring)
            host_rows = [(h, min(len(es), budget_of(h)), budget_of(h))
                         for h, es in by_host.items()]
            caps = budget_caps_py(host_rows, self.budget_fetches)
        else:
            caps = None
        batch = []
        for host, entries in by_host.items():
            entries.sort()
            take = caps[host] if caps is not None else budget_of(host)
            batch.extend(entries[:take])
        batch.sort()  # the recorded fetch order
        # candidate collection is BATCHED per round (the Spark round
        # aggregates all discovered links before the seen check):
        # first-wins keeps each canonical's min depth — the earliest
        # fetcher in (priority, url) order has the round's min depth
        cands: dict[str, tuple] = {}  # canon → (depth, host)
        for prio, canon in batch:
            self.fetch_log.append((round_id, prio, canon))
            if self.adaptive_delay:
                # every response has a latency, misses included (the
                # Spark side derives it from the fetch-log canonical)
                h = (urlsplit(canon).hostname or "").lower()
                self.latencies_by_host.setdefault(h, []).append(
                    datagen.fetch_latency_us(canon))
            depth = self.frontier[canon][0]
            del self.frontier[canon]
            hit = self.pages_by_canon.get(canon)
            if hit is None:
                continue  # fetch miss (e.g. query-noise link)
            i, _rec = hit
            self.extracted += 1
            src_host = (urlsplit(canon).hostname or "").lower()
            for link in datagen.link_targets(i, self.n, self.n_hosts):
                c = canonicalize(link)
                if not c:
                    continue
                h = (urlsplit(c).hostname or "").lower()
                if not h:
                    continue
                if src_host:
                    self.host_edges.add((src_host, h))
                if c not in cands:
                    cands[c] = (depth + 1, h)
        if self.template_budget > 0:
            from scrapely_spark.frontier.canonical import path_template_of
            fams: dict[tuple, list] = {}
            for c, (d, h) in cands.items():
                fams.setdefault((h, path_template_of(c)), []).append((d, c))
            kept = set()
            for lst in fams.values():
                lst.sort()
                kept.update(c for _, c in lst[:self.template_budget])
            cands = {c: dh for c, dh in cands.items() if c in kept}
        for c, (d, _h) in sorted(cands.items()):
            self.enqueue_canonical(c, depth=d)
        return len(batch)

    def run(self, max_rounds: int = 50) -> "OracleCrawl":
        round_id = 0
        while self.frontier and round_id < max_rounds:
            round_id += 1
            self.run_round(round_id)
        return self

    # -- comparison views ----------------------------------------------------

    def seen_urls(self) -> list[str]:
        return sorted(self.seen)

    def seen_keys(self) -> list[int]:
        return sorted(murmur3_32(c.encode("utf-8")) for c in self.seen)

    def fetch_order(self) -> list[tuple]:
        return list(self.fetch_log)


if __name__ == "__main__":
    n = 500
    oracle = OracleCrawl(n, datagen.seeds(n)).run(max_rounds=20)
    print("fetched:", len(oracle.fetch_log), "seen:", len(oracle.seen),
          "extracted:", oracle.extracted,
          "frontier left:", len(oracle.frontier))
