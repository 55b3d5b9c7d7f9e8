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
                       round_seconds: float = ROUND_SECONDS) -> DataFrame:
    """Pick each host's politeness budget of URLs for this round.

    Requires columns: host, crawl_delay, priority, canonical_url, url_key.
    """
    order = [F.col("priority").asc(), F.col("canonical_url").asc()]

    salted = candidates.withColumn(
        "salt", F.pmod(F.col("url_key"), F.lit(n_salts)))
    budget = host_budget_expr(round_seconds)
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
