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
from scrapely_spark.frontier.politeness import host_budget
from scrapely_spark.frontier.robots import DEFAULT_CRAWL_DELAY, is_allowed
from scrapely_spark.spark import datagen


class OracleCrawl:
    def __init__(self, n_pages: int, seeds: list[str],
                 robots: dict[str, dict] | None = None,
                 n_hosts: int = datagen.N_HOSTS_DEFAULT,
                 round_seconds: float = 10.0):
        self.n = n_pages
        self.n_hosts = n_hosts
        self.round_seconds = round_seconds
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
        canon = canonicalize(url)
        if canon in self.seen:
            return
        self.seen.add(canon)
        host = (urlsplit(canon).hostname or "").lower()
        rules = self.robots.get(host)
        if rules and not is_allowed(urlsplit(canon).path,
                                    rules["disallow"]):
            return  # disallowed: seen but never fetched
        self.frontier[canon] = (depth, host)

    def crawl_delay(self, host: str) -> float:
        rules = self.robots.get(host)
        return rules["crawl_delay"] if rules else DEFAULT_CRAWL_DELAY

    def run_round(self, round_id: int) -> int:
        # per-host top-budget selection in (priority, canonical_url) order
        by_host: dict[str, list] = {}
        for canon, (prio, host) in self.frontier.items():
            by_host.setdefault(host, []).append((prio, canon))
        batch = []
        for host, entries in by_host.items():
            entries.sort()
            batch.extend(entries[:host_budget(self.crawl_delay(host), self.round_seconds)])
        batch.sort()  # the recorded fetch order
        for prio, canon in batch:
            self.fetch_log.append((round_id, prio, canon))
            del self.frontier[canon]
            hit = self.pages_by_canon.get(canon)
            if hit is None:
                continue  # fetch miss (e.g. query-noise link)
            i, _rec = hit
            self.extracted += 1
            for link in datagen.link_targets(i, self.n, self.n_hosts):
                self.enqueue(link, depth=prio + 1)
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
