"""robots.txt gating as a broadcast-joined rules table (north rule).

Rules table: ``robots(host, allow array<string>, disallow array<string>,
crawl_delay double)``.  The gate stays entirely JVM-side: a broadcast hash
join on host plus an ``exists(disallow, prefix-match)`` array predicate —
no Python in the hot path.  Unknown hosts are allowed with the default
crawl delay (oracle implements the identical rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_CRAWL_DELAY = 1.0


def gate(candidates: DataFrame, robots: DataFrame,
         url_col: str = "canonical_url") -> DataFrame:
    """Filter robots-disallowed candidates; attach ``crawl_delay``.

    Disallowed iff any ``disallow`` entry is a prefix of the URL path.
    The path comes from a pure string expression, NOT ``parse_url``:
    the JVM URI parser returns NULL for URLs Python's urlsplit accepts
    (e.g. spaces), and a NULL path would silently drop allowed rows
    through three-valued ``exists`` — diverging from :func:`is_allowed`.
    """
    path = F.coalesce(
        F.regexp_extract(F.col(url_col),
                         r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1),
        F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    joined = candidates.join(F.broadcast(robots), "host", "left")
    blocked = F.exists(
        F.coalesce(F.col("disallow"), F.array()),
        lambda rule: path.startswith(rule))
    return (joined
            .where(~blocked)
            .withColumn("crawl_delay",
                        F.coalesce(F.col("crawl_delay"),
                                   F.lit(DEFAULT_CRAWL_DELAY)))
            .drop("allow", "disallow"))


def is_allowed(path: str, disallow: list) -> bool:
    """Pure-python twin of :func:`gate` for the oracle scheduler."""
    return not any(path.startswith(rule) for rule in (disallow or []))
