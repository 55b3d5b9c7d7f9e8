"""HTTP cache revalidation planning — which URLs the next round may
skip, which it can revalidate cheaply, and which it must refetch.

A 10^10-URL frontier spends most of its steady-state budget on
RE-fetching pages it already has; HTTP caching metadata (RFC 9111)
is the crawler's biggest bandwidth lever.  Per fetched URL the fetch
log carries the response's ``Cache-Control: max-age``, ``ETag`` and
``Last-Modified``; from those this planner derives, entirely in
integer-µs column arithmetic (shuffle-free, one Project over the
fetch-log scan):

* a **freshness lifetime**: ``max-age`` when the server sent one,
  else the RFC 9111 §4.2.2 heuristic (a percentage — default 10% —
  of the Last-Modified age at fetch time), else a default TTL;
  clamped into ``[min_ttl, max_ttl]``,
* an **action** for the round at ``now_us``:
  - ``fresh``              — age < lifetime: do not fetch at all,
  - ``revalidate_etag``    — stale but an ETag exists: conditional GET
    with ``If-None-Match`` (a 304 costs headers, not the body),
  - ``revalidate_lastmod`` — stale, no ETag, but Last-Modified exists:
    conditional GET with ``If-Modified-Since``,
  - ``refetch``            — stale with no validator: full fetch,
* the **request headers** a fetch stage would send (``if_none_match``,
  ``if_modified_since_us``), NULL when the action carries none.

The output joins back to the frontier on url; ``fresh`` rows drop out
of the round's fetch batch, the two revalidate classes keep politeness
slots but are budgeted as header-sized.  Composes with
``sitemaps.sitemap_lastmod_refetch`` (sitemap-declared staleness) and
``politeness.recrawl_schedule`` (observed change rates): sitemap and
change-rate signals pick WHAT to refresh, this planner picks HOW
cheaply each refresh can be done.

Determinism: every derivation is integer µs (no floats anywhere), so
the plan hashes bit-identically against the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_TTL_S = 86_400            # no validator, no max-age: 1 day
HEURISTIC_PCT = 10                # RFC 9111 4.2.2 suggested fraction
MIN_TTL_S = 60
MAX_TTL_S = 7 * 86_400


def revalidation_plan(fetch_log: DataFrame, now_us: int,
                      default_ttl_s: int = DEFAULT_TTL_S,
                      heuristic_pct: int = HEURISTIC_PCT,
                      min_ttl_s: int = MIN_TTL_S,
                      max_ttl_s: int = MAX_TTL_S) -> DataFrame:
    """Classify each fetched URL for the round at ``now_us``.

    ``fetch_log`` columns: ``url``, ``fetched_us`` (last fetch time),
    and the response caching metadata ``max_age_s`` / ``etag`` /
    ``last_modified_us`` (each NULL when the server omitted it).
    Emits one row per input row: (url, age_s, ttl_s, action,
    if_none_match, if_modified_since_us).

    Scale shape: a single shuffle-free Project — the CASE ladder and
    the clamps fuse into one whole-stage-codegen pass over the scan,
    so the planner adds zero I/O to whatever reads the fetch log.
    Rows fetched in the future of ``now_us`` (clock skew between
    executors that stamped the log) clamp to age 0 and come out
    ``fresh`` instead of underflowing.
    """
    us = 1_000_000
    fetched = F.col("fetched_us").cast("long")
    lastmod = F.col("last_modified_us").cast("long")
    # heuristic lifetime: pct% of the Last-Modified age AT FETCH TIME,
    # never negative (a Last-Modified in the fetch's future is bogus).
    # Integer `div` end to end — a long→double round-trip loses µs
    # above 2^53 (a 1994 Last-Modified read in 2026 crosses it), and
    # the clamp-BEFORE-divide keeps every operand non-negative so
    # Spark's div and the oracle's // agree trivially.
    staged = (fetch_log
              .withColumn("_delta_us",
                          F.greatest(fetched - lastmod,
                                     F.lit(0).cast("long")))
              .withColumn("_heur_us",
                          F.expr("_delta_us * %d div 100"
                                 % int(heuristic_pct))))
    ttl_us = (F.when(F.col("max_age_s").isNotNull(),
                     F.col("max_age_s").cast("long") * us)
              .when(lastmod.isNotNull(), F.col("_heur_us"))
              .otherwise(F.lit(int(default_ttl_s) * us)))
    ttl_us = F.greatest(F.lit(int(min_ttl_s) * us),
                        F.least(F.lit(int(max_ttl_s) * us), ttl_us))
    age_us = F.greatest(F.lit(int(now_us)) - fetched,
                        F.lit(0).cast("long"))
    action = (F.when(age_us < ttl_us, F.lit("fresh"))
              .when(F.col("etag").isNotNull(),
                    F.lit("revalidate_etag"))
              .when(lastmod.isNotNull(), F.lit("revalidate_lastmod"))
              .otherwise(F.lit("refetch")))
    staged = (staged.withColumn("_age_us", age_us)
              .withColumn("_ttl_us", ttl_us))
    return staged.select(
        "url",
        F.expr("_age_us div %d" % us).alias("age_s"),
        F.expr("_ttl_us div %d" % us).alias("ttl_s"),
        action.alias("action"),
        F.when(action == "revalidate_etag", F.col("etag"))
        .alias("if_none_match"),
        F.when(action == "revalidate_lastmod", lastmod)
        .alias("if_modified_since_us"))
