"""URL canonicalization + murmur3 keying (the frontier's join key).

The URL-seen set and the crawl ordering are both keyed by
``murmur3(canonical_url)`` (north rule).  Spark's ``F.hash`` *is*
Murmur3_x86_32 with seed 42; :func:`murmur3_32` is the bit-identical pure
Python implementation so the single-threaded oracle scheduler and the
Spark job operate in the same key space (verified by test against
``F.hash``).

Canonicalization rule (deterministic, shared by oracle + Spark kernels):
lowercase scheme+host, drop default ports, strip fragments, sort query
parameters, collapse empty path to '/'.
"""

from __future__ import annotations

import re
from typing import Iterator
from urllib.parse import urlsplit, urlunsplit

import numpy as np
import pandas as pd

_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonicalize_with_host(url: str) -> tuple[str, str]:
    """(canonical form, lowercased host) in one parse.

    Malformed input (None, out-of-range or non-numeric ports) degrades to
    a deterministic result instead of raising — one bad href on one page
    must never kill a crawl round's kernel.
    """
    if not url:
        return "", ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        # urlsplit itself rejects some inputs (e.g. an unbalanced IPv6
        # bracket 'http://['): an unparseable href never reaches the
        # frontier — empty canonical form is dropped by the candidate
        # filter, deterministically in both the kernel and the oracle
        return "", ""
    scheme = parts.scheme.lower()
    try:
        host = (parts.hostname or "").lower()
        port = parts.port
        netloc = host
        if port is not None and port != _DEFAULT_PORTS.get(scheme):
            netloc = "%s:%d" % (host, port)
    except ValueError:
        # invalid port text: keep its spelling but still drop userinfo,
        # matching the normal path (same credentialed resource with and
        # without a bogus port must not get two url_keys)
        bare = parts.netloc.lower().rsplit("@", 1)[-1]
        netloc = bare
        if bare.startswith("["):  # IPv6 literal, urlsplit-compatible host
            host = bare[1:].split("]", 1)[0]
        else:
            host = bare.split(":", 1)[0]
    path = parts.path or "/"
    query = parts.query
    if query:
        query = "&".join(sorted(query.split("&")))
    return urlunsplit((scheme, netloc, path, query, "")), host


def canonicalize(url: str) -> str:
    """Deterministic canonical form of a URL."""
    return canonicalize_with_host(url)[0]


# --- Murmur3_x86_32, seed 42: bit-identical to Spark's F.hash ------------

_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def murmur3_32(data: bytes, seed: int = 42) -> int:
    """Murmur3_x86_32 returning Spark's signed-int32 convention."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _M32
    n = len(data)
    tail = n & ~3
    for i in range(0, tail, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & _M32
        k = _rotl32(k, 15)
        k = (k * c2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    # Spark (like Guava) processes the tail bytes as signed ints one at a
    # time rather than the classic murmur3 tail block
    for i in range(tail, n):
        b = data[i]
        if b >= 128:
            b -= 256  # signed byte, as in JVM implementations
        k = (b * c1) & _M32
        k = _rotl32(k, 15)
        k = (k * c2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    h = _fmix32(h ^ n)
    return h - (1 << 32) if h >= (1 << 31) else h


def url_key(url: str) -> int:
    """The frontier key: murmur3 of the canonical URL (== F.hash)."""
    return murmur3_32(canonicalize(url).encode("utf-8"))


# --- Spark kernel ---------------------------------------------------------

# a URL this shape is ALREADY canonical and its host is the netloc
# verbatim: lowercase http(s) scheme, bare lowercase reg-name host (no
# userinfo/port/uppercase), a present path, no query (nothing to sort),
# no fragment (nothing to strip), no whitespace.  Everything else takes
# the exact urlsplit path.
# NB: anchored with \Z, not $ — Python's $ also matches just before a
# trailing newline, which would let 'http://a.com/x\n' take the fast
# path verbatim while the slow path strips the newline (fast/slow
# divergence pinned by the trailing-whitespace differential tests).
_PLAIN_RE = re.compile(r"^(https?)://([a-z0-9.\-]+)(/[^?#\s]*)\Z")


def canonicalize_df(urls_df, url_col: str = "url", spread: bool = True):
    """Append (canonical_url, url_key, host) columns, keeping all others.

    The string rewrite runs inside an Arrow batch kernel: one compiled
    regex pass classifies each URL as already-canonical (most crawl
    traffic — those rows pass through untouched, ~10× cheaper than a
    parse) and only the rest go through the urlsplit rewrite.
    Equivalence of the two paths is pinned by a differential test on
    adversarial URL shapes.  The murmur3 key is computed JVM-side with
    ``F.hash``, bit-identical to the oracle's :func:`murmur3_32`
    (tested) — no hash work in Python.

    ``spread`` widens a single-split scan before the kernel (guide
    §2.5): a small single-file URL table otherwise serializes the
    whole rewrite on one core (measured 4.3s single-task at the sf0.1
    orders-derived table — the entire wall time of several url_*
    queries).  A no-op whenever the scan already yields enough splits;
    the crawl's round loop passes ``spread=False`` because its frames
    are mid-pipeline and already partitioned.
    """
    from pyspark.sql import functions as F

    if spread:
        from scrapely_spark.spark.dedup import _spread
        urls_df = _spread(urls_df)

    in_schema = ", ".join("%s %s" % (f.name, f.dataType.simpleString())
                          for f in urls_df.schema.fields)
    out_schema = in_schema + ", canonical_url string, host string"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            col = batch[url_col]
            ext = col.str.extract(_PLAIN_RE)
            canonical = col.to_numpy(dtype=object, copy=True)
            host = ext[1].to_numpy(dtype=object)
            slow = np.flatnonzero(ext[1].isna().to_numpy())
            for i in slow:
                canonical[i], host[i] = canonicalize_with_host(canonical[i])
            out = batch.copy()
            out["canonical_url"] = canonical
            out["host"] = host
            yield out

    return urls_df.mapInPandas(kernel, out_schema).withColumn(
        "url_key", F.hash("canonical_url"))


def host_of_canonical(col):
    """Host of an ALREADY-canonical URL, in canonicalize's spelling.

    ``F.parse_url(..., 'HOST')`` but normalized to agree with the host
    column :func:`canonicalize_df` emits: IPv6 netlocs lose their
    brackets ('[::1]' → '::1', the urlsplit ``hostname`` spelling), so
    a page's src node and its inbound-link dst node are the same graph
    node.  Returns NULL for URLs java.net URI parsing rejects (the
    slow-path canonicalizer is more lenient) — callers filter.
    """
    from pyspark.sql import functions as F
    # try_parse_url: ANSI parse_url THROWS on urls the slow-path
    # canonicalizer tolerates (raw spaces etc.) — NULL, not a crash
    h = F.try_parse_url(col, F.lit("HOST"))
    return F.regexp_replace(h, r"^\[|\]$", "")


def url_template_stats(urls_df):
    """Crawl-budget / spider-trap analysis: group canonical URLs by
    digit-normalized path template.

    Calendars, session ids and pagination generate unbounded URL
    families that differ only in numbers; normalizing digit runs to
    ``N`` collapses each family to one row, so a scheduler can spot a
    template whose ``n_urls`` explodes (the trap) and budget or prune
    it.  Per (host, template): URL count and the lexicographically
    smallest example.  One projection + one grouped count with
    map-side combine — at a 10^10-URL frontier the output is bounded
    by the number of distinct templates, not URLs.
    """
    from pyspark.sql import functions as F

    tpl = path_template_expr(F.col("canonical_url"))
    return (urls_df
            .select("host", tpl.alias("path_template"), "canonical_url")
            .groupBy("host", "path_template")
            .agg(F.count("*").alias("n_urls"),
                 F.min("canonical_url").alias("example_url")))


def path_template_expr(url_col):
    """Digit-normalized path template of a canonical URL (Spark expr).

    The ONE spelling of the template rule — shared by
    :func:`url_template_stats`, the crawl's per-round template budget
    (frontier.rounds) and the pure-Python oracle twin
    :func:`path_template_of`, so the three can never drift.
    """
    from pyspark.sql import functions as F
    path = F.regexp_extract(url_col, r"^[a-z]+://[^/]+(/[^?#]*)", 1)
    return F.regexp_replace(path, "[0-9]+", "N")


def path_template_of(canonical_url: str) -> str:
    """Pure-Python twin of :func:`path_template_expr` (oracle side)."""
    import re
    m = re.match(r"^[a-z]+://[^/]+(/[^?#]*)", canonical_url)
    return re.sub("[0-9]+", "N", m.group(1)) if m else ""


def cap_template_families(candidates, max_urls: int):
    """Spider-trap budget: keep at most ``max_urls`` candidates per
    (host, digit-normalized path template) family, selected on the
    crawl's total key ``(priority asc, canonical_url asc)``.

    Calendars/session-ids/pagination mint unbounded URL families whose
    members differ only in digit runs; capping each family bounds the
    frontier growth a trap can cause to O(templates · max_urls) per
    round.  One window whose partitions are template families — at a
    10^10 frontier the hottest family inside one round is the cap's
    own bound from the PREVIOUS round's enqueue, so the window never
    sees an unbounded partition after the first capped round; the salt
    trick (politeness.py) applies if a first round must swallow a
    pre-poisoned seed list.
    """
    from pyspark.sql import Window, functions as F
    w = (Window.partitionBy("host",
                            path_template_expr(F.col("canonical_url")))
         .orderBy(F.col("priority").asc(), F.col("canonical_url").asc()))
    return (candidates.withColumn("_tr", F.row_number().over(w))
            .where(F.col("_tr") <= max_urls).drop("_tr"))


def dust_param_rules(observations, url_col: str = "url",
                     fp_col: str = "fingerprint",
                     host_col: str = "host",
                     min_witness: int = 1):
    """DUST mining — learn which query parameters never change content
    ("Do Not Crawl in the DUST", Bar-Yossef et al., WWW'07 — rule form
    only; the learning here is exact witness counting, not sampling).

    Input: one row per fetched URL observation with a content
    ``fingerprint``.  For every (host, param) the URL set is grouped
    by the URL WITH THAT PARAM REMOVED (other params kept in order): a
    *witness group* is a residual URL observed with ≥2 distinct values
    of the param.  The param is ``irrelevant`` on the host iff every
    witness group shows exactly one distinct fingerprint and at least
    ``min_witness`` witness groups exist — then the crawler can strip
    it at canonicalization and collapse the whole DUST family.

    Emits per (host, param): ``n_groups`` (residual groups),
    ``n_witness``, ``n_clean`` (witness groups with one fingerprint),
    ``irrelevant``.

    Scale shape: one explode bounded by params-per-URL (single
    digits), then two slim groupBys — (host, param, residual) and
    (host, param) — both with map-side partials; output is bounded by
    distinct (host, param), never by URLs.  Entirely JVM-side; the
    oracle replays the same list algebra.
    """
    from pyspark.sql import functions as F

    base = F.substring_index(F.col(url_col), "?", 1)
    query = F.regexp_extract(F.col(url_col), r"\?(.*)$", 1)
    pairs = F.split(query, "&")
    obs = (observations
           .where(F.col(url_col).contains("?"))
           .select(F.col(host_col).alias("host"),
                   base.alias("_base"), pairs.alias("_pairs"),
                   F.col(fp_col).alias("_fp"))
           .select("host", "_base", "_pairs", "_fp",
                   F.explode("_pairs").alias("_pair"))
           .select("host", "_fp",
                   F.substring_index("_pair", "=", 1).alias("param"),
                   F.expr("substring(_pair, instr(_pair, '=') + 1)")
                   .alias("_val"),
                   F.concat(
                       F.col("_base"), F.lit("?"),
                       F.array_join(
                           F.filter(
                               "_pairs",
                               lambda p: F.substring_index(p, "=", 1)
                               != F.substring_index(F.col("_pair"),
                                                    "=", 1)),
                           "&")).alias("_residual")))
    groups = (obs.groupBy("host", "param", "_residual")
              .agg(F.countDistinct("_val").alias("_nv"),
                   F.countDistinct("_fp").alias("_nf")))
    return (groups.groupBy("host", "param")
            .agg(F.count("*").alias("n_groups"),
                 F.sum((F.col("_nv") >= 2).cast("long"))
                 .alias("n_witness"),
                 F.sum(((F.col("_nv") >= 2) & (F.col("_nf") == 1))
                       .cast("long")).alias("n_clean"))
            .withColumn("irrelevant",
                        (F.col("n_witness") >= min_witness)
                        & (F.col("n_clean") == F.col("n_witness"))))


# Default public-suffix rules for tests/benches: a deterministic,
# self-contained slice of the PSL's SHAPE (normal rules of 1–3 labels).
# Production swaps in the full publicsuffix.org list — same table shape,
# same plan (the list is ~9k rows: broadcast territory forever).
DEFAULT_SUFFIXES = (
    "com", "org", "net", "edu", "gov", "io", "dev",
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp",
    "github.io", "blogspot.com", "s3.amazonaws.com",
)


def registrable_domain(hosts_df, suffixes=DEFAULT_SUFFIXES,
                       host_col: str = "host"):
    """Public-suffix parse: (public_suffix, registrable_domain) per host.

    Politeness, crawl budgets, and robots scope all key on the
    REGISTRABLE domain (eTLD+1), not the hostname — ``a.blogspot.com``
    and ``b.blogspot.com`` are different registrants that must not
    share one politeness bucket, while ``www.example.co.uk`` and
    ``shop.example.co.uk`` are one registrant that must.  The public-
    suffix list is the standard rule table for that split.

    Plan: the suffix list is a tiny dim, so the longest-match is THREE
    chained broadcast left joins (candidate = last 3, 2, 1 labels of
    the host) coalesced longest-first — no explode, no groupBy, no
    shuffle on the host side; at a 10^10-URL frontier this rides
    whatever scan produced the hosts.  An unmatched host falls back to
    the PSL's implicit ``*`` rule (the last label is the suffix).  A
    host that IS a public suffix has no registrable domain (NULL).

    Returns ``hosts_df`` columns + ``public_suffix`` +
    ``registrable_domain``.
    """
    from pyspark.sql import functions as F

    spark = hosts_df.sparkSession
    sfx = spark.createDataFrame(
        [(s,) for s in sorted(set(suffixes))], "sfx string")
    h = F.col(host_col)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    out = hosts_df.withColumn("_labels", labels).withColumn("_n", n)
    for k in (3, 2, 1):
        cand = F.when(F.col("_n") >= k, F.array_join(
            F.slice(F.col("_labels"), F.col("_n") - k + 1, k), "."))
        alias = "sfx%d" % k
        out = out.join(
            F.broadcast(sfx.withColumnRenamed("sfx", alias)),
            cand == F.col(alias), "left")
    suffix = F.coalesce(F.col("sfx3"), F.col("sfx2"), F.col("sfx1"),
                        F.element_at(F.col("_labels"), -1))
    sfx_labels = F.size(F.split(suffix, r"\."))
    reg = F.when(
        F.col("_n") > sfx_labels,
        F.concat(F.element_at(
            F.col("_labels"),
            (F.col("_n") - sfx_labels).cast("int")),
            F.lit("."), suffix))
    return (out
            .withColumn("public_suffix", suffix)
            .withColumn("registrable_domain", reg)
            .drop("_labels", "_n", "sfx3", "sfx2", "sfx1"))


def subdomain_explosion(hosts_df, suffixes=DEFAULT_SUFFIXES,
                        host_col: str = "host",
                        max_hosts_per_domain: int = 100):
    """Wildcard-DNS / subdomain-spam detection per registrable domain.

    A crawl frontier poisoned by a wildcard-DNS host (``*.spam.com``
    resolving everything) grows one hostname per discovered link; the
    signal is a registrable domain whose DISTINCT host count explodes.
    One grouped count over the registrable domain — output bounded by
    the number of domains, never URLs — with the suspect flag the
    scheduler turns into a domain-level budget.

    Returns (registrable_domain, public_suffix, n_hosts, example_host,
    suspect) — hosts that ARE a bare public suffix are excluded (no
    registrant to budget).
    """
    from pyspark.sql import functions as F

    parsed = registrable_domain(
        hosts_df.select(host_col).distinct(), suffixes, host_col)
    return (parsed
            .where(F.col("registrable_domain").isNotNull())
            .groupBy("registrable_domain", "public_suffix")
            .agg(F.count("*").alias("n_hosts"),
                 F.min(host_col).alias("example_host"))
            .withColumn("suspect",
                        F.col("n_hosts") > F.lit(max_hosts_per_domain)))


# ---------------------------------------------------------------------------
# IDN host canonicalization (RFC 3492 punycode, RFC 5890 A-labels)

_PUNY_BASE, _PUNY_TMIN, _PUNY_TMAX = 36, 1, 26
_PUNY_SKEW, _PUNY_DAMP = 38, 700
_PUNY_INITIAL_BIAS, _PUNY_INITIAL_N = 72, 128


def _puny_adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    """Bias adaptation, RFC 3492 §6.1 — verbatim from the spec."""
    delta = delta // _PUNY_DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_PUNY_BASE - _PUNY_TMIN) * _PUNY_TMAX) // 2:
        delta //= _PUNY_BASE - _PUNY_TMIN
        k += _PUNY_BASE
    return k + (((_PUNY_BASE - _PUNY_TMIN + 1) * delta)
                // (delta + _PUNY_SKEW))


def punycode_encode(label: str) -> str:
    """RFC 3492 §6.3 encoder, implemented from the spec (and
    property-tested against Python's stdlib ``punycode`` codec, the
    reference implementation shipped with every CPython).

    Basic (ASCII) code points are copied to the front; each non-basic
    code point is then transmitted as a generalized-variable-length
    delta in the insertion-sort coordinate space, with the bias
    adapting after every encoded character.
    """
    n, delta, bias = _PUNY_INITIAL_N, 0, _PUNY_INITIAL_BIAS
    out = [c for c in label if ord(c) < 128]
    h = b = len(out)
    if b:
        out.append("-")
    codepoints = [ord(c) for c in label]
    while h < len(codepoints):
        m = min(cp for cp in codepoints if cp >= n)
        delta += (m - n) * (h + 1)
        n = m
        for cp in codepoints:
            if cp < n:
                delta += 1
            elif cp == n:
                q = delta
                k = _PUNY_BASE
                while True:
                    t = (_PUNY_TMIN if k <= bias
                         else _PUNY_TMAX if k >= bias + _PUNY_TMAX
                         else k - bias)
                    if q < t:
                        break
                    d = t + (q - t) % (_PUNY_BASE - t)
                    out.append(chr(d + 22 + 75 * (d < 26)))
                    q = (q - t) // (_PUNY_BASE - t)
                    k += _PUNY_BASE
                out.append(chr(q + 22 + 75 * (q < 26)))
                bias = _puny_adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def idn_ascii_host(host: str) -> str:
    """Unicode hostname → its ASCII (A-label) form: lowercase, then
    ``xn--`` + punycode per non-ASCII label (RFC 5890).  ASCII hosts
    pass through lowercased — the function is idempotent, which is
    what lets the politeness/seen keys treat it as a canonicalizer.
    (Full IDNA2008 mapping — bidi rules, contextual joiners — is out
    of scope; lowercase folding covers the crawl-relevant cases.)
    ``None``/empty pass through unchanged — one bad row must never
    kill a kernel (the module's convention).
    """
    if not host:
        return host
    labels = host.lower().rstrip(".").split(".")
    out = []
    for label in labels:
        if label.isascii():
            out.append(label)
        else:
            out.append("xn--" + punycode_encode(label))
    return ".".join(out)


def idn_hosts(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """Decorate a host table with its ASCII (A-label) form and a flag.

    The politeness queue, the URL-seen filter and the registrable-
    domain parse all key on the host string — an internationalized
    host must map to ONE canonical ASCII key or the same origin gets
    two budgets and two seen-entries.  Host-cardinality input by
    design (decorate the host dim, not the URL stream); the kernel is
    an Arrow batch over ``mapInPandas``.

    Returns input columns + (ascii_host, is_idn).
    """
    id_cols = list(hosts.columns)
    out_fields = (", ".join(
        "%s %s" % (f.name, f.dataType.simpleString())
        for f in hosts.schema.fields)
        + ", ascii_host string, is_idn boolean")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ascii_hosts = [idn_ascii_host(x) for x in batch[host_col]]
            out = batch[id_cols].copy()
            out["ascii_host"] = ascii_hosts
            out["is_idn"] = [
                (a != x.lower().rstrip(".")) if x else False
                for a, x in zip(ascii_hosts, batch[host_col])]
            yield out

    return hosts.mapInPandas(kernel, out_fields)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 over an already-split path string: '..' pops
    (never past the leading root marker), '.' drops, a TRAILING '.' or
    '..' keeps the directory slash.  Identity on dot-free paths.
    urljoin applies this during relative resolution; an ABSOLUTE
    declared href keeps its dot segments, so the fold runs here."""
    segs = path.split("/")
    out: list[str] = []
    n = len(segs)
    for i, s in enumerate(segs):
        if s == ".":
            if i == n - 1:
                out.append("")
            continue
        if s == "..":
            if len(out) > 1 and out[-1] != "":
                out.pop()
            if i == n - 1:
                out.append("")
            continue
        out.append(s)
    return "/".join(out)


def resolve_declared_canonical(page_url: str, href: str) -> str:
    """A page's declared rel=canonical target, resolved against the
    page URL and spelled in the canonical keyspace.

    ``urljoin`` does the full RFC 3986 §5 resolution (path-relative,
    root-relative, protocol-relative, dot segments); a residual dot
    fold covers absolute hrefs (urljoin leaves their paths verbatim);
    :func:`canonicalize` then applies the keyspace rules — lowercase
    scheme+host, query sort, fragment strip, default ports, userinfo
    drop, empty path → '/'.  Returns '' for unresolvable input (the
    caller drops those rows), never raises — one bad declaration on
    one page must never kill a kernel.
    """
    from urllib.parse import urljoin

    if not href or not (href or "").strip():
        return ""  # no declaration, no edge
    try:
        resolved = urljoin(page_url or "", href.strip())
        parts = urlsplit(resolved)
        if parts.path and ("/." in parts.path or parts.path == "."
                           or parts.path == ".."):
            resolved = urlunsplit(
                (parts.scheme, parts.netloc,
                 _remove_dot_segments(parts.path),
                 parts.query, parts.fragment))
        return canonicalize(resolved)
    except ValueError:
        return ""


def canonical_identity(pages: DataFrame, redirects: DataFrame,
                       url_col: str = "url", html_col: str = "html",
                       max_hops: int = 8) -> DataFrame:
    """Unified canonical-identity resolution: every URL folded to the
    single identity the site itself declares, across BOTH signal
    kinds — HTTP 3xx redirects and in-page ``rel=canonical``
    declarations — chased through chains that may interleave them
    (a redirect landing on a page that declares a further canonical).

    This is the identity table dedup credit, politeness accounting
    and the URL-seen set all want to key on: without it the same
    logical document holds several budget slots and several seen
    entries.  Precedence per URL: a protocol-level redirect beats an
    in-page declaration (the server spoke first; a 3xx response has
    no authoritative body).  Self-declarations are dropped (a page
    naming itself canonical is the no-op fixed point, not a cycle).

    Plan: declaration extraction rides the page scan
    (htmlmeta.rel_canonical, shuffle-free); the merged functional
    edge map resolves by pointer doubling
    (graph.resolve_redirects — log(max_hops) self-joins, the only
    join shape that survives 10^10 URLs); identity assembly is one
    left join of the URL universe against the resolved table.
    Cycles and over-long chains come back ``resolved=false`` with the
    URL keeping its own identity — a scheduler drops those rather
    than follows them.

    Returns (url, canonical_id, hops, resolved) — ``hops`` NULL when
    unresolved.
    """
    from pyspark.sql import functions as F

    from scrapely_spark.frontier.htmlmeta import rel_canonical
    from scrapely_spark.spark.graph import resolve_redirects

    decl = rel_canonical(pages.select(url_col, html_col),
                         html_col=html_col)
    # resolve the declared href against the page URL and project it
    # into the CANONICAL keyspace spelling (an identity that differs
    # from canonicalize()'s output can never equi-join the crawl's
    # url keys).  Runs as the standard Arrow batch kernel — stdlib
    # urljoin does the full RFC 3986 §5 resolution (relative paths,
    # protocol-relative, dot segments), a small fold normalizes dot
    # segments absolute hrefs keep, and canonicalize() applies the
    # keyspace rules (case, query sort, fragment strip, default
    # ports, userinfo).  A JVM-expression spelling of the same
    # pipeline compiled to a ~15 MB task binary whose codegen and
    # per-job broadcast dominated the whole query — the kernel plan
    # is a few KB and the per-row work is microseconds.
    from typing import Iterator

    import pandas as pd

    url = F.col(url_col)
    href = F.col("canonical_href")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame({
                "src": batch["src"],
                "dst": [resolve_declared_canonical(u, h)
                        for u, h in zip(batch["src"], batch["href"])],
            })

    decl_edges = (decl.where(href.isNotNull())
                  .select(url.alias("src"), href.alias("href"))
                  .mapInPandas(kernel, "src string, dst string")
                  .where((F.col("dst") != "")
                         & (F.col("dst") != F.col("src")))
                  .withColumn("_prio", F.lit(1)))
    r_edges = redirects.select("src", "dst",
                               F.lit(0).alias("_prio"))
    edges = (r_edges.unionByName(decl_edges)
             .groupBy("src")
             .agg(F.min(F.struct("_prio", "dst")).alias("_m"))
             .select("src", F.col("_m.dst").alias("dst")))
    res = resolve_redirects(edges, max_hops=max_hops)
    universe = (pages.select(F.col(url_col).alias("url"))
                .unionByName(redirects.select(F.col("src")
                                              .alias("url")))
                .distinct())
    return (universe.join(res, "url", "left")
            .select(
                "url",
                F.when(F.coalesce("resolved", F.lit(True)),
                       F.coalesce("final_url", F.col("url")))
                .otherwise(F.col("url")).alias("canonical_id"),
                F.when(F.coalesce("resolved", F.lit(True)),
                       F.coalesce("hops", F.lit(0)))
                .cast("int").alias("hops"),
                F.coalesce("resolved", F.lit(True))
                .alias("resolved")))


# ---------------------------------------------------------------------------
# static tracking-parameter stripping

# well-known cross-site tracking parameters (the static complement to
# the per-site DUST rules, which MINE what this list cannot know):
# the utm_* campaign family plus the big platforms' click ids.  The
# list is the spec, shared verbatim with the DuckDB oracle.
TRACKING_PARAM_RE = (r"^(?:utm_[a-z]+|fbclid|gclid|gclsrc|dclid|"
                     r"msclkid|mc_cid|mc_eid|igshid|twclid|yclid|"
                     r"_hsenc|_hsmi|ref_src)=")


def strip_tracking_params(urls: DataFrame,
                          url_col: str = "canonical_url") -> DataFrame:
    """Remove well-known tracking parameters from canonical URLs.

    ``utm_source=newsletter`` and friends multiply one logical URL
    into dozens of frontier entries — each holding its own seen slot
    and politeness slot — while the DUST miner needs witness traffic
    it does not yet have.  This static pass strips the parameters
    every crawler already knows are content-free, BEFORE seen-keying:
    split the query on ``&``, drop members matching
    :data:`TRACKING_PARAM_RE`, re-join (preserving the canonical
    sorted order), and drop the ``?`` entirely when nothing survives.

    Shuffle-free single Project (split / filter / array_join on the
    already-canonical URL).  Emits ``stripped_url`` plus a flag so
    budget accounting can report how much of the frontier was
    tracking inflation.  ``had_tracking`` is the actual filter delta
    (a non-empty member matched the tracking regex), NOT a string
    comparison of rebuilt-vs-input: rewrites that only drop empty
    ``&&`` members or a bare trailing ``?`` change the string without
    any tracking present and must not inflate the accounting flag.

    Returns input columns + (stripped_url, had_tracking).
    """
    from pyspark.sql import functions as F

    url = F.col(url_col)
    base = F.substring_index(url, "?", 1)
    query = F.when(url.contains("?"),
                   F.expr("substring(%s, instr(%s, '?') + 1)"
                          % (url_col, url_col))).otherwise(F.lit(""))
    parts = F.filter(F.split(query, "&"), lambda p: p != "")
    kept = F.filter(parts, lambda p: ~p.rlike(TRACKING_PARAM_RE))
    rebuilt = F.when(F.size(kept) > 0,
                     F.concat(base, F.lit("?"),
                              F.array_join(kept, "&"))) \
        .otherwise(base)
    return urls.select(
        *urls.columns,
        rebuilt.alias("stripped_url"),
        (F.size(parts) > F.size(kept)).alias("had_tracking"))
