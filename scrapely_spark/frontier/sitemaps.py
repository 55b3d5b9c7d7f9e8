"""Sitemap ingestion for the crawl frontier.

The sitemap protocol (sitemaps.org) is the seed-expansion channel a
production crawler drains alongside link extraction: robots.txt names
sitemap files, each file is EITHER an index (``<sitemapindex>`` of
nested ``<sitemap><loc>`` entries) OR a URL set (``<urlset>`` of
``<url><loc>`` entries) — never both, which is what lets a single
vectorized pass classify every extracted URL by its *document's* kind
instead of re-parsing XML structure per entry.

Everything here is JVM-side (``regexp_extract_all`` + ``explode`` —
whole-stage codegen, no Python in the hot path), because at frontier
scale sitemap drains arrive millions of files per round.  Feed page
URLs to ``frontier.rounds``' candidate merge (they enter the same
canonicalize → seen-filter → politeness path as extracted links) and
nested index URLs back into the next round's sitemap fetch wave — one
level per round, the same bounded-depth discipline as the frontier's
depth counter.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_LOC_RE = r"<loc>\s*([^<]+?)\s*</loc>"


def sitemap_urls(bodies: DataFrame, url_col: str = "sitemap_url",
                 body_col: str = "body") -> DataFrame:
    """Extract every ``<loc>`` URL from fetched sitemap bodies.

    Emits ``(sitemap_url, url, is_index)`` — one row per extracted
    URL; ``is_index`` is true when the SOURCE document is a
    ``<sitemapindex>`` (so ``url`` names another sitemap to fetch, not
    a page to crawl).  Empty or loc-less bodies emit nothing.

    Scale shape: one projection (``regexp_extract_all``) + one explode
    — no shuffle at all; the classification is a per-document
    ``contains`` computed once, before the explode multiplies rows.
    """
    locs = F.regexp_extract_all(F.col(body_col), F.lit(_LOC_RE), 1)
    is_index = F.col(body_col).contains("<sitemapindex")
    return (bodies
            .select(F.col(url_col).alias("sitemap_url"),
                    is_index.alias("is_index"),
                    F.explode(locs).alias("url"))
            # the regex already strips surrounding whitespace; the trim
            # is belt-and-braces so lazy-quantifier corner semantics can
            # never differ between engines
            .select("sitemap_url", F.trim("url").alias("url"),
                    "is_index"))


_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"


def sitemap_lastmod_refetch(bodies: DataFrame, fetch_state: DataFrame,
                            url_col: str = "sitemap_url",
                            body_col: str = "body") -> DataFrame:
    """lastmod-driven refetch selection: parse ``<url><loc>/<lastmod>``
    entry pairs out of urlset sitemaps and join them against the crawl
    state ``(url, fetched_at)`` — a URL needs (re)fetching when it was
    never fetched (``reason = 'new'``) or its declared ``lastmod``
    post-dates the stored fetch (``'stale'``).  Fresh URLs are NOT
    emitted: at frontier scale the refetch set is the small side.

    Entry-pair extraction is JVM-side: explode the ``<url>`` blocks
    (entry-scoped, so a loc can never pair with a neighbor's lastmod),
    then extract loc + optional lastmod per block; a missing or
    unparsable lastmod is treated as unknown → refetch only if never
    fetched (the conservative read of the protocol, which makes
    lastmod advisory).  One shuffle: the left join on the URL key.
    """
    blocks = F.regexp_extract_all(F.col(body_col),
                                  F.lit(_URL_BLOCK_RE), 1)
    entry = (bodies
             .select(F.col(url_col).alias("sitemap_url"),
                     F.explode(blocks).alias("_b"))
             .select("sitemap_url",
                     F.trim(F.regexp_extract("_b", _LOC_RE, 1))
                     .alias("url"),
                     F.expr("try_cast(regexp_extract(_b, "
                            "'<lastmod>\\\\s*([^<]+?)\\\\s*</lastmod>',"
                            " 1) AS TIMESTAMP)").alias("lastmod"))
             .where(F.col("url") != ""))
    # one row per URL — an accumulated fetch LOG has one row per
    # fetch, and joining it raw would fan out and emit a spurious
    # 'stale' against an old fetch even when a newer one already
    # covers the lastmod; the latest fetch is the state
    st = (fetch_state
          .select(F.col("url"),
                  F.col("fetched_at").cast("timestamp")
                  .alias("_fetched"))
          .groupBy("url")
          .agg(F.max("_fetched").alias("_fetched")))
    j = entry.join(st, "url", "left")
    reason = (F.when(F.col("_fetched").isNull(), F.lit("new"))
              .when(F.col("lastmod").isNotNull()
                    & (F.col("lastmod") > F.col("_fetched")),
                    F.lit("stale")))
    return (j.withColumn("reason", reason)
            .where(F.col("reason").isNotNull())
            .select("sitemap_url", "url", "lastmod",
                    F.col("_fetched").alias("fetched_at"), "reason"))
