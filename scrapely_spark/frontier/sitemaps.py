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
