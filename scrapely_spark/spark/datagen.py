"""Deterministic synthetic corpus: images, product pages, links, robots.

Per ``BASELINE.json`` ``input_hint`` the payload table is
``images(image_id, bytes binary, w, h, fmt, caption, phash)``; pages embed
each image URL + caption in a scrapely-style product layout.  Everything
is a pure function of the row id (seeded, no external data), exposed two
ways:

* pure-python row builders (used by the oracle scheduler and tests);
* Spark generators built on ``spark.range(n)`` + ``mapInPandas`` — the
  generation itself is distributed and embarrassingly parallel, so the
  same code stands in for the 10^10-row frontier at any scale.

Host assignment is deliberately skewed (one mega-host receives ~30% of
URLs) so politeness partitioning and skew handling are exercised, and a
slice of link URLs carry fragments / unsorted query strings so URL
canonicalization has real work to do.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from scrapely_spark.spark.codec import average_hash, encode_image, pixels_for

_WORDS = (
    "amber brass cedar denim ebony fern garnet hazel indigo jade kelp "
    "linen maple noble ochre pearl quartz rowan slate teak umber velvet "
    "walnut yarrow zinc azure bronze coral dune ember flint"
).split()

N_HOSTS_DEFAULT = 50
_MEGA_HOST_SHARE = 10  # i % 10 < 3 → host 0 (≈30% of pages)


def caption_for(i: int) -> str:
    """Deterministic 6-word caption for image i."""
    h = zlib.crc32(b"caption-%d" % i)
    return " ".join(
        _WORDS[(h >> (k * 5)) % len(_WORDS)] for k in range(5)
    ) + " item %d" % i


def image_meta(i: int) -> tuple[str, int, int, str]:
    image_id = "img-%08d" % i
    w = 24 + (i * 7) % 40
    h = 24 + (i * 11) % 32
    fmt = "png" if i % 2 == 0 else "jpeg"
    return image_id, w, h, fmt


def image_record(i: int) -> dict:
    image_id, w, h, fmt = image_meta(i)
    pixels = pixels_for(image_id, w, h)
    return {
        "image_id": image_id,
        "bytes": encode_image(pixels, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_for(i),
        "phash": average_hash(pixels),
    }


def host_of(i: int, n_hosts: int = N_HOSTS_DEFAULT) -> str:
    if i % _MEGA_HOST_SHARE < 3:
        hid = 0  # the mega-host
    else:
        hid = 1 + (zlib.crc32(b"host-%d" % i) % (n_hosts - 1))
    return "h%03d.example.com" % hid


def url_of(i: int, n: int, n_hosts: int = N_HOSTS_DEFAULT) -> str:
    path = "/private/item/%d" if i % 13 == 0 else "/item/%d"
    return "http://%s%s" % (host_of(i, n_hosts), path % i)


def link_targets(i: int, n: int, n_hosts: int = N_HOSTS_DEFAULT) -> list[str]:
    """Deterministic outlinks of page i, with canonicalization noise."""
    out = []
    for k in range(1, 4):
        j = (i * 7 + k * 131) % n
        url = url_of(j, n, n_hosts)
        if (i + k) % 5 == 0:
            url += "#frag%d" % k
        if (i + k) % 7 == 0:
            url += "?b=2&a=1"
        out.append(url)
    return out


_PAGE_LAYOUT = """<html><body>
<h1 class="title">Product %(i)d</h1>
<div class="product">
<img class="main" src="/img/%(image_id)s.%(ext)s"/>
<p class="caption">%(caption)s</p>
<span class="price">%(price)s</span>
</div>
<ul class="links">
%(links)s</ul>
</body></html>
"""

_ANNOTATED_LAYOUT = _PAGE_LAYOUT % {
    "i": 0,
    "image_id": "img-00000000",
    "ext": "png",
    "caption": "template caption",
    "price": "9.99",
    "links": '<li><a href="http://h000.example.com/item/1">more</a></li>\n',
}


def template_body() -> str:
    """The annotated template matching the synthetic product layout."""
    q = "&quot;"

    def ann(payload: str) -> str:
        return ' data-scrapy-annotate="{%s}"' % payload.replace('"', q)

    body = _ANNOTATED_LAYOUT
    body = body.replace(
        '<h1 class="title">',
        '<h1 class="title"%s>' % ann('"annotations": {"content": "title"}'))
    body = body.replace(
        '<img class="main"',
        '<img class="main"%s' % ann('"annotations": {"src": "image_url"}'))
    body = body.replace(
        '<p class="caption">',
        '<p class="caption"%s>' % ann('"annotations": {"content": "caption"}'))
    body = body.replace(
        '<span class="price">',
        '<span class="price"%s>' % ann('"annotations": {"content": "price"}'))
    return body


def page_record(i: int, n: int, n_hosts: int = N_HOSTS_DEFAULT) -> dict:
    image_id, _w, _h, fmt = image_meta(i)
    links = link_targets(i, n, n_hosts)
    body = _PAGE_LAYOUT % {
        "i": i,
        "image_id": image_id,
        "ext": "png" if fmt == "png" else "jpg",
        "caption": caption_for(i),
        "price": "%d.%02d" % (9 + i % 500, i % 100),
        "links": "".join('<li><a href="%s">more</a></li>\n' % u
                         for u in links),
    }
    url = url_of(i, n, n_hosts)
    return {
        "url": url,
        "host": host_of(i, n_hosts),
        "body": body,
        "encoding": "utf-8",
        "image_id": image_id,
    }


def fetch_latency_us(canonical_url: str) -> int:
    """Deterministic stand-in for a fetch's measured latency.

    The sandbox has no network, so the latency a real fetcher would
    record per response is replayed as a closed form of the canonical
    URL: 100ms + murmur3(canonical) mod 900ms — the same murmur3 the
    seen keys use, so the Spark twin is one ``F.hash`` expression
    (``fetch_latency_us_expr``) and the adaptive-delay crawl loop is
    byte-parity-checkable against the pure-python oracle."""
    from scrapely_spark.frontier.canonical import murmur3_32
    return 100_000 + murmur3_32(canonical_url.encode("utf-8")) % 900_000


def fetch_latency_us_expr(col):
    """Spark twin of :func:`fetch_latency_us` (F.hash == murmur3_32)."""
    from pyspark.sql import functions as F
    return (F.lit(100_000)
            + F.pmod(F.hash(col), F.lit(900_000))).cast("long")


def robots_record(hid: int) -> dict:
    return {
        "host": "h%03d.example.com" % hid,
        "allow": ["/"],
        "disallow": ["/private"],
        "crawl_delay": float(1 + hid % 3),
    }


def robots_txt(hid: int) -> str:
    """The robots.txt text a fetch of host hid would return.

    Rendered from :func:`robots_record` (plus realistic noise: comments,
    case variance, a bot-specific group, blank lines) so parsing it back
    must reproduce the record exactly — the round-trip property test.
    """
    rec = robots_record(hid)
    lines = ["# robots for %s" % rec["host"], ""]
    if hid % 3 == 0:  # a more specific group our agent must NOT take
        lines += ["User-agent: evilbot", "Disallow: /", ""]
    lines += ["User-Agent: *"]
    lines += ["Allow: %s" % p for p in rec["allow"]]
    lines += ["disallow: %s" % p for p in rec["disallow"]]
    lines += ["Crawl-delay: %s  # seconds" % rec["crawl_delay"]]
    return "\n".join(lines) + "\n"


# --------------------------------------------------------------------------
# Spark generators (distributed; pure function of the row id)
# --------------------------------------------------------------------------

_IMAGES_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                  "caption string, phash long")
_PAGES_SCHEMA = ("url string, host string, body string, encoding string, "
                 "image_id string")
_LINKS_SCHEMA = "src_url string, dst_url string, ord int"


def images_df(spark, n: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame([image_record(int(i)) for i in batch["id"]])

    return spark.range(n).mapInPandas(gen, _IMAGES_SCHEMA)


def pages_df(spark, n: int, n_hosts: int = N_HOSTS_DEFAULT):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                [page_record(int(i), n, n_hosts) for i in batch["id"]])

    return spark.range(n).mapInPandas(gen, _PAGES_SCHEMA)


def links_df(spark, n: int, n_hosts: int = N_HOSTS_DEFAULT):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for i in batch["id"]:
                src = url_of(int(i), n, n_hosts)
                for ordinal, dst in enumerate(link_targets(int(i), n, n_hosts)):
                    rows.append(
                        {"src_url": src, "dst_url": dst, "ord": ordinal})
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, _LINKS_SCHEMA)


def robots_df(spark, n_hosts: int = N_HOSTS_DEFAULT):
    return spark.createDataFrame(
        [robots_record(h) for h in range(n_hosts)],
        "host string, allow array<string>, disallow array<string>, "
        "crawl_delay double")


def seeds(n: int, n_seeds: int = 8, n_hosts: int = N_HOSTS_DEFAULT):
    """Deterministic seed URLs (first pages of distinct hosts)."""
    out = []
    i = 0
    while len(out) < n_seeds and i < n:
        if i % 13 != 0:  # don't seed robots-disallowed paths
            out.append(url_of(i, n, n_hosts))
        i += 3
    return out


def seeds_df(spark, n: int, n_seeds: int, n_hosts: int = N_HOSTS_DEFAULT):
    """Distributed twin of :func:`seeds` — same URLs, generated as a
    DataFrame so a multi-million seed list never round-trips through the
    driver (at 10^10-frontier scale the seed list is itself a table).
    """
    from pyspark.sql import functions as F

    # i = 3k; i % 13 == 0 ⇔ k % 13 == 0 (gcd(3,13)=1), so 12 of every 13
    # k survive.  The k-cutoff for exactly n_seeds survivors is closed
    # form (binary search on the driver, no data) — a global LIMIT would
    # funnel millions of rows through a single task instead.
    def survivors(k):  # |{j in [0,k) : j % 13 != 0}|
        return k - (k + 12) // 13

    lo, hi = 0, 13 * n_seeds // 12 + 13
    while lo < hi:
        mid = (lo + hi) // 2
        if survivors(mid) >= n_seeds:
            hi = mid
        else:
            lo = mid + 1
    k_max = min(lo, (n + 2) // 3)
    cand = (spark.range(k_max).withColumn("i", F.col("id") * 3)
            .where((F.col("i") % 13 != 0) & (F.col("i") < n)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {"url": [url_of(int(i), n, n_hosts) for i in batch["i"]]})

    return cand.mapInPandas(gen, "url string")
