"""Fetch failure handling: retry/backoff planning and host circuit
breaking.

`revalidation.py` plans the refetch schedule for URLs that fetched
SUCCESSFULLY; this module is its failure-side twin.  A 10^10-URL crawl
sees hundreds of millions of failed fetches per day — timeouts, 429s,
5xx bursts, dead links — and what it does next decides both corpus
completeness (give up too early) and fleet waste + host abuse (retry
too eagerly).  Two operators:

* :func:`retry_plan` — per-attempt verdict: classify the outcome,
  honor ``Retry-After``, schedule truncated binary exponential backoff
  on the integer-second grid, and declare URLs dead when the error is
  permanent or the attempt budget is exhausted.  Shuffle-free: one
  CASE-ladder Project over the fetch-log scan.
* :func:`host_circuit` — per-host failure-rate circuit breaker: a
  host whose recent attempts mostly fail gets its whole queue
  suspended for a cool-off, so a dying origin stops burning politeness
  budget one timeout at a time.  One host-keyed aggregation — output
  is host-cardinality, broadcast territory for the scheduler join.

Relationship to ``politeness.retry_schedule``: that operator
AGGREGATES a boolean fetch log (trailing-failure runs → one queue row
per currently-failing URL) and knows nothing about status semantics;
:func:`retry_plan` is the per-attempt decision that feeds it —
status-class aware (permanent vs transient), Retry-After aware, and
the place where "don't retry a 404" is decided.  A scheduler runs
retry_plan on each fetch wave and retry_schedule over the
accumulated log.

Everything is integer arithmetic (bit-shift backoff, per-mille rates
with floor division), so the DuckDB oracles replay both bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: outcome classes, in spec order
SUCCESS, REDIRECT, PERMANENT, TRANSIENT = (
    "success", "redirect", "permanent", "transient")


def _err_class(status):
    """HTTP status (0/NULL = network error) → outcome class.

    429 (rate limited) and 408 (request timeout) are the two 4xx codes
    that mean "try later", not "gone"; 404/410 and the rest of 4xx are
    permanent.  All 5xx and network-level failures are transient.
    """
    s = F.coalesce(status, F.lit(0))
    return (F.when((s >= 200) & (s < 300), F.lit(SUCCESS))
            .when((s >= 300) & (s < 400), F.lit(REDIRECT))
            .when((s == 429) | (s == 408), F.lit(TRANSIENT))
            .when((s >= 400) & (s < 500), F.lit(PERMANENT))
            .otherwise(F.lit(TRANSIENT)))


def retry_plan(fetches: DataFrame, base_delay_s: int = 60,
               max_delay_s: int = 3600,
               max_attempts: int = 5) -> DataFrame:
    """Per-attempt retry verdicts for a fetch log.

    Input columns: ``url``, ``host``, ``status`` (int; 0 or NULL for
    network-level failures), ``attempt`` (1-based), ``t_us``
    (attempt time, integer µs), ``retry_after_s`` (nullable int, the
    server's Retry-After header).

    Rules, in order:

    * success / redirect → action ``done`` (revalidation.py owns the
      refetch schedule from here);
    * permanent error (404/410 and other non-retryable 4xx) → ``dead``;
    * transient error with ``attempt >= max_attempts`` → ``dead``
      (budget exhausted — the URL stays eligible for rediscovery, it
      just stops consuming scheduler slots);
    * transient otherwise → ``retry`` at
      ``t_us + max(backoff, retry_after) seconds``, where backoff is
      truncated binary exponential: ``min(base << (attempt-1), max)``.
      ``Retry-After`` is a server-imposed LOWER bound, so the larger
      of the two wins — an origin asking for a longer wait than our
      backoff always gets it.

    No jitter by design: determinism is what lets the oracle replay
    the schedule, and at fleet scale the politeness queue (not the
    retry timestamp) already spreads load within a host.

    Plan: one shuffle-free CASE-ladder Project over the fetch-log
    scan — integer bit-shift and compare, whole-stage codegen.

    Returns (url, host, status, attempt, err_class, action,
    backoff_s, retry_at_us).
    """
    cls = _err_class(F.col("status"))
    exhausted = F.col("attempt") >= F.lit(max_attempts)
    # cap the shift exponent BEFORE shifting: the smallest shift whose
    # backoff already meets/exceeds the clamp.  Without it the JVM
    # masks shift counts to 6 bits and the BIGINT wraps for large
    # attempt numbers, turning maximal backoff into 0-second hammering
    shift_cap = max(0, (max_delay_s // max(base_delay_s, 1))
                    .bit_length())
    # the python shiftleft() wrapper wants a literal bit count, so the
    # column-shift goes through the SQL function directly
    # clamp BOTH sides of the shift count: the JVM masks a NEGATIVE
    # count to 63 too, so a corrupt attempt<=0 row would wrap
    # base<<63 to 0 and retry with zero wait — the exact hammering
    # the upper cap exists to prevent
    backoff = F.least(
        F.expr("shiftleft(CAST(%d AS BIGINT), "
               "greatest(least(attempt - 1, %d), 0))"
               % (base_delay_s, shift_cap)),
        F.lit(max_delay_s).cast("long"))
    wait_s = F.greatest(
        backoff, F.coalesce(F.col("retry_after_s").cast("long"),
                            F.lit(0).cast("long")))
    retrying = (cls == TRANSIENT) & ~exhausted
    action = (F.when((cls == SUCCESS) | (cls == REDIRECT),
                     F.lit("done"))
              .when(retrying, F.lit("retry"))
              .otherwise(F.lit("dead")))
    return fetches.select(
        "url", "host",
        F.coalesce(F.col("status"), F.lit(0)).cast("int")
        .alias("status"),
        F.col("attempt").cast("int").alias("attempt"),
        cls.alias("err_class"), action.alias("action"),
        F.when(retrying, wait_s).alias("backoff_s"),
        F.when(retrying, F.col("t_us").cast("long")
               + wait_s * 1000000).alias("retry_at_us"))


def host_circuit(fetches: DataFrame, min_attempts: int = 20,
                 max_failure_ppt: int = 500) -> DataFrame:
    """Per-host failure-rate circuit breaker.

    A host whose origin is down fails every fetch the slow way — each
    attempt holds a politeness slot for a full timeout.  Rather than
    discovering that URL by URL, trip the breaker on the host: count
    attempts and failures (anything non-2xx/3xx, including network
    errors) over the supplied log window, and suspend hosts with at
    least ``min_attempts`` observations whose failure rate exceeds
    ``max_failure_ppt`` per mille.  The minimum-attempts floor keeps
    one unlucky timeout from suspending a host observed twice.

    Plan: one host-keyed partial-aggregated shuffle; output is
    host-cardinality, which the scheduler consumes as a broadcast
    anti-join against the candidate wave.

    Returns (host, n_attempts, n_failures, failure_ppt, suspended).
    """
    s = F.coalesce(F.col("status"), F.lit(0))
    fail = F.when((s >= 200) & (s < 400), F.lit(0)).otherwise(F.lit(1))
    agg = (fetches
           .groupBy("host")
           .agg(F.count(F.lit(1)).alias("n_attempts"),
                F.sum(fail).alias("n_failures")))
    ppt = F.expr("n_failures * 1000 div n_attempts")
    return agg.select(
        "host", F.col("n_attempts").cast("long").alias("n_attempts"),
        F.col("n_failures").cast("long").alias("n_failures"),
        ppt.cast("long").alias("failure_ppt"),
        ((F.col("n_attempts") >= F.lit(min_attempts))
         & (ppt > F.lit(max_failure_ppt))).alias("suspended"))
