"""In-page crawl directives: ``<meta name="robots">`` and
``<link rel="canonical">`` extraction.

robots.txt gates FETCHES; these two gate what the pipeline does with a
page it already fetched — ``noindex`` drops it from the corpus/search
index, ``nofollow`` drops its outlinks from the frontier, and
``rel=canonical`` redirects dedup credit to the page the site itself
names as the master copy (the crawl-side sibling of the DUST rules:
the site TELLS us the duplicate structure instead of us mining it).

Everything is JVM-side regexp over the raw HTML (case-insensitive,
DOTALL, attribute order handled inside ONE tag-level pattern) —
engine-portable: Java regex and RE2 agree on every construct used
here (``(?is)``, character classes, alternation; no backreferences,
no lookaround).  Shuffle-free: one projection over the pages scan.

Extraction is two-step so DOCUMENT ORDER decides conflicts: first the
earliest matching TAG is pulled (one pattern that accepts either
attribute order, so a later tag can never beat an earlier one merely
by spelling its attributes differently), then the target attribute is
read out of that single tag.  Attribute values are matched exactly —
``name="robotsdb"`` or ``rel="canonicalized"`` never fire; ``rel`` is
a space-separated token LIST per HTML, so ``rel="alternate
canonical"`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# First <meta> tag whose name attribute is EXACTLY robots, either
# attribute order: the quoted branch requires the closing quote right
# after the token; the unquoted branches require a delimiter (
# whitespace, '/', or the tag close), so prefixes never match.  The
# [\s"\x27/] before name= anchors the attribute NAME (thename= must
# not match).
_ROBOTS_TAG = (r'(?is)<meta\b[^>]*[\s"\x27/]name\s*=\s*'
               r'(?:["\x27][ \t]*robots[ \t]*["\x27][^>]*>'
               r'|robots[\s/][^>]*>'
               r'|robots[ \t]*>)')
# First <link> tag whose rel TOKEN LIST contains canonical: quoted
# values are space-separated token lists (rel="alternate canonical"),
# unquoted values are single tokens.
_CANON_TAG = (r'(?is)<link\b[^>]*[\s"\x27/]rel\s*=\s*'
              r'(?:["\x27][ \t]*(?:[^"\x27>]*[ \t])?canonical'
              r'(?:[ \t][^"\x27>]*)?[ \t]*["\x27][^>]*>'
              r'|canonical[\s/][^>]*>'
              r'|canonical[ \t]*>)')
# attribute readout WITHIN the one extracted tag (quoted beats
# unquoted — a tag carries each attribute once, so this is not a
# precedence between tags)
_CONTENT_Q = r'(?is)[\s"\x27/]content\s*=\s*["\x27]([^"\x27>]*)'
_CONTENT_U = r'(?is)[\s"\x27/]content\s*=\s*([^"\x27>\s]+)'
_HREF_Q = r'(?is)[\s"\x27/]href\s*=\s*["\x27][ \t]*([^"\x27>]+)'
_HREF_U = r'(?is)[\s"\x27/]href\s*=\s*([^"\x27>\s]+)'


def _first_nonempty(col, *pats: str):
    out = F.lit("")
    for pat in reversed(pats):
        cur = F.regexp_extract(col, pat, 1)
        out = F.when(cur != "", cur).otherwise(out)
    return out


def meta_robots(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Emit every input row + ``(noindex, nofollow)`` booleans.

    The first ``<meta name="robots">`` tag IN DOCUMENT ORDER wins
    (both attribute orders accepted by the one tag pattern, so
    position — not spelling — decides conflicts); a page without the
    tag is ``(false, false)``.  Token match is comma/space tolerant
    and case-insensitive per the robots meta spec; ``none`` is the
    defined shorthand for ``noindex, nofollow``.
    """
    tag = F.regexp_extract(F.col(html_col), _ROBOTS_TAG, 0)
    content = F.lower(_first_nonempty(tag, _CONTENT_Q, _CONTENT_U))
    toks = F.split(F.regexp_replace(content, r"\s+", ""), ",")
    has = lambda t: F.array_contains(toks, t)  # noqa: E731
    return pages.select(
        *pages.columns,
        (has("noindex") | has("none")).alias("noindex"),
        (has("nofollow") | has("none")).alias("nofollow"))


def rel_canonical(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Emit every input row + ``canonical_href`` (NULL when the page
    declares none).  First ``<link>`` whose ``rel`` token list
    contains ``canonical`` wins (document order, both attribute
    orders, multi-token ``rel="alternate canonical"`` included).
    Feed the non-null ``(url, canonical_href)`` pairs into
    ``graph.resolve_redirects`` to chase canonical chains site-wide
    in log(hops) joins.
    """
    tag = F.regexp_extract(F.col(html_col), _CANON_TAG, 0)
    href = F.trim(_first_nonempty(tag, _HREF_Q, _HREF_U))
    return pages.select(
        *pages.columns,
        F.when(href != "", href).alias("canonical_href"))


def layout_fingerprint(pages: DataFrame, html_col: str = "html"):
    """Structural fingerprint of a page: md5 over its tag-name sequence.

    Two pages rendered from the same server-side template share the
    same tag skeleton even when every text node differs — the inverse
    of content dedup, where identical TEXT is the signal.  The
    fingerprint is md5 of the comma-joined lowercase tag names in
    document order (``regexp_extract_all`` of ``<tagname`` — a
    construct Java regex and RE2 spell identically), plus the tag
    count.  One shuffle-free projection over the pages scan.
    """
    tags = F.expr(
        "regexp_extract_all(lower(%s), '<([a-z][a-z0-9]*)', 1)"
        % html_col)
    return (pages
            .withColumn("_tags", tags)
            .withColumn("layout_fp",
                        F.md5(F.array_join(F.col("_tags"), ",")))
            .withColumn("n_tags", F.size(F.col("_tags")).cast("long"))
            .drop("_tags"))


def template_families(pages: DataFrame, host_col: str = "host",
                      id_col: str = "page_id",
                      html_col: str = "html") -> DataFrame:
    """Template-family inventory per host: the routing table that makes
    instance-based extraction work at frontier scale.

    Scrapely-style IBL extraction needs ONE annotated example per
    template, not per page — the bottleneck at 10^10 pages is knowing
    HOW MANY templates a host runs and which pages belong to each.
    Grouping pages by :func:`layout_fingerprint` answers exactly that:
    each (host, layout_fp) family is one candidate template; annotate
    its ``example_id`` page, and the trained template applies to the
    whole family.  ``share_ppm`` (integer parts-per-million of the
    host's pages — exact BIGINT division, no float formatting between
    engines) and ``family_rank`` order the annotation queue: top
    families cover most of the host with the fewest annotations, the
    long tail routes to generic extraction.

    Plan: one grouped count keyed by (host, fp) — output bounded by
    distinct templates, not pages — then one host-keyed window for
    share + rank over the already-collapsed family rows.  The heavy
    input (page bodies) is touched exactly once, in the fingerprint
    projection riding the scan.
    """
    from pyspark.sql import Window

    fams = (layout_fingerprint(pages, html_col)
            .groupBy(host_col, "layout_fp")
            .agg(F.count("*").alias("n_pages"),
                 F.min(id_col).alias("example_id")))
    w = Window.partitionBy(host_col)
    order = Window.partitionBy(host_col).orderBy(
        F.col("n_pages").desc(), F.col("layout_fp"))
    return (fams
            .withColumn("host_pages", F.sum("n_pages").over(w))
            .withColumn("share_ppm",
                        F.expr("n_pages * 1000000 div host_pages"))
            .withColumn("family_rank",
                        F.row_number().over(order).cast("long"))
            .drop("host_pages"))


# phrases that mark an error page regardless of HTTP status — matched
# against the lowercased <title> ONLY (body text is deliberately out:
# a product page legitimately containing "404" or a support article
# about missing pages must not be classified by its prose; the probe
# signature is the arm that catches phrase-free error bodies).  The
# list is the heuristic's spec, shared verbatim with the DuckDB
# oracle.
SOFT404_PHRASES = (
    "404", "not found", "page not found", "no longer available",
    "does not exist", "page cannot be found",
)


def soft404(pages: DataFrame, host_col: str = "host",
            url_col: str = "url", html_col: str = "html",
            status_col: str = "status",
            probe_col: str = "is_probe") -> DataFrame:
    """Soft-404 detection: error pages served with HTTP 200.

    Misconfigured servers answer missing URLs with a rendered "not
    found" page and status 200 — the crawler marks the fetch a
    success, the corpus absorbs thousands of copies of the error
    template, and the scheduler keeps re-crawling dead URLs.  Two
    signals, combined per page:

    * **probe signature** (Bar-Yossef et al., "Sic transit gloria
      telae", WWW'04): the crawl fetches a deliberately-nonexistent
      URL per host (``is_probe``); whatever a host serves for it WITH
      status 200 is by construction that host's error template.  Any
      real page whose content fingerprint equals a probe signature of
      its host is a soft-404 — no phrase heuristics involved, so it
      catches error pages that say "Welcome" as reliably as ones that
      say "404".  (Known limitation, as in the paper: templates that
      embed the requested URL fingerprint differently per URL and
      need the similarity arm — MinHash over the same frame — instead
      of exact matching.)
    * **phrase** — the page ``<title>`` contains one of
      :data:`SOFT404_PHRASES`; catches hosts the probe wave hasn't
      reached yet.

    Plan: the signature table is one DISTINCT over the probe rows —
    bounded by hosts × error templates, broadcast territory at any
    crawl size — so the verdict is a broadcast left join decorating
    the pages scan; no shuffle ever touches the page side.

    Returns non-probe page rows: (url, host, status, phrase_hit,
    sig_match, is_soft404).
    """
    title = F.lower(F.regexp_extract(
        F.col(html_col), r"(?is)<title[^>]*>(.*?)</title>", 1))
    phrase = F.lit(False)
    for p in SOFT404_PHRASES:
        phrase = phrase | title.contains(p)

    staged = pages.select(
        F.col(url_col).alias("url"), F.col(host_col).alias("host"),
        F.col(status_col).alias("status"),
        F.md5(F.col(html_col)).alias("_fp"),
        phrase.alias("phrase_hit"),
        F.col(probe_col).alias("_probe"))
    sigs = (staged.where(F.col("_probe") & (F.col("status") == 200))
            .select(F.col("host").alias("_sig_host"),
                    F.col("_fp").alias("_sig_fp"))
            .distinct())
    joined = staged.where(~F.col("_probe")).join(
        F.broadcast(sigs),
        (F.col("host") == F.col("_sig_host"))
        & (F.col("_fp") == F.col("_sig_fp")), "left")
    sig_match = F.col("_sig_fp").isNotNull()
    is_404 = (F.col("status") == 200) & (F.col("phrase_hit")
                                         | sig_match)
    return joined.select("url", "host", "status", "phrase_hit",
                         sig_match.alias("sig_match"),
                         is_404.alias("is_soft404"))


# ---------------------------------------------------------------------------
# main-content extraction (block link-density, jusText/Readability family)

# block boundaries: opening OR closing occurrences of the HTML
# block-level elements.  Splitting on these turns a page into the flat
# block sequence density analysis works over; inline markup (<a>, <b>,
# <span>…) stays inside its block.  The pattern is the operator's spec,
# shared verbatim with the DuckDB oracle (Java regex and RE2 agree on
# every construct used).
_BLOCK_TAG_CORE = (
    r"</?(?:p|div|section|article|main|li|ul|ol|table|thead|"
    r"tbody|tr|td|th|h[1-6]|header|footer|nav|aside|blockquote|pre|"
    r"br|hr|form|fieldset)\b[^>]*>")
BLOCK_SPLIT_RE = r"(?i)" + _BLOCK_TAG_CORE
_BLOCK_GROUP_RE = r"(?i)(" + _BLOCK_TAG_CORE + r")"
_ANY_TAG_RE = r"(?s)<[^>]*>"
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
_ANCHOR_OPEN_RE = r"(?i)<a\b[^>]*>"
_ANCHOR_CLOSE_RE = r"(?i)</a\s*>"


def _block_text(col):
    """Inline tags → spaces, whitespace collapsed, trimmed."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(col, _ANY_TAG_RE, " "), r"\s+", " "))


def _localize_anchors(col):
    """Rewrite the page so no ``<a>`` element spans a block boundary.

    Card-style anchors wrap block elements (``<a><div>nav</div></a>``
    — nav rails, related-article cards); splitting on block tags
    severs the open tag from its close, so a per-block complete-pair
    counter would see neither half.  Instead of carrying open-anchor
    state across blocks with per-block prefix sums (O(blocks²) in-row
    folds), close and reopen the anchor around every block tag inside
    the anchored span ONCE, at page level: split on anchor openers;
    within each opener's segment the text up to the first ``</a>``
    (or all of it, if the anchor never closes) is anchored — rewrite
    each block tag ``T`` in that span to ``</a>T<a>`` and re-wrap the
    span in a bare pair.  One linear pass; afterwards every anchored
    char sits inside a block-local complete pair and the plain pair
    counter is exact.  Assumes non-nested anchors (HTML forbids
    nesting); on malformed nesting each opener is treated
    independently and the ``least()`` cap in the caller keeps counts
    sane.  Tag text never counts as block text (all tags collapse to
    spaces), so ``t``/``n_blocks`` are unchanged by the rewrite.
    Mirrored verbatim by the DuckDB oracle (``_BLOCK_SQL``).
    """
    segs = F.split(col, _ANCHOR_OPEN_RE)

    def _seg(s):
        parts = F.split(s, _ANCHOR_CLOSE_RE, 2)
        head = F.regexp_replace(
            F.get(parts, 0), _BLOCK_GROUP_RE, "</a>$1<a>")
        rest = F.when(F.size(parts) > 1, F.get(parts, 1)) \
            .otherwise(F.lit(""))
        return F.concat(F.lit("<a>"), head, F.lit("</a>"), rest)

    return F.concat(
        F.get(segs, 0),
        F.array_join(
            F.transform(
                F.slice(segs, F.lit(2),
                        F.greatest(F.size(segs) - 1, F.lit(0))),
                _seg), ""))


def main_content(pages: DataFrame, html_col: str = "html",
                 min_chars: int = 25,
                 max_link_ppt: int = 333) -> DataFrame:
    """Boilerplate removal by block link density (jusText family).

    Navigation bars, footers, cookie banners and related-article rails
    are short and almost entirely links; article prose is long and
    almost entirely plain text.  The page is split into blocks on
    block-level tag boundaries, each block is scored by its normalized
    text length and the share of that text that lives inside ``<a>``
    elements, and a block survives iff

        len(text) >= min_chars  AND
        anchor_chars * 1000 <= max_link_ppt * len(text)

    (per-mille integer arithmetic — no float thresholds, so the DuckDB
    oracle replays the rule exactly).  Survivors are re-joined with
    newlines as the page's main content.  This is the crawl→corpus
    step the LLM pipelines (C4, RefinedWeb, FineWeb) all run between
    fetched HTML and text dedup; the line-frequency pass
    (``textstats.remove_boilerplate_lines``) then catches the
    corpus-level chrome this local rule cannot see.

    Plan: split / transform / filter / aggregate are higher-order
    functions over the in-row block array — ONE shuffle-free Project
    riding the pages scan, no explode, no Python.  At 10^10 pages the
    cost is exactly one pass over the bodies.

    Returns (all input columns except the html) + (n_blocks, n_kept,
    content, content_chars).
    """
    anchor_chars = lambda b: F.coalesce(
        F.aggregate(
            F.regexp_extract_all(b, F.lit(_ANCHOR_RE), F.lit(1)),
            F.lit(0),
            lambda acc, m: acc + F.length(_block_text(m))),
        F.lit(0))
    # the localize pre-pass (one linear pass over the page) makes
    # every anchor block-local, so per-block complete pairs count all
    # anchored text — no cross-block state, no prefix sums
    raw = F.split(_localize_anchors(F.col(html_col)), BLOCK_SPLIT_RE)
    blocks = F.filter(
        F.transform(
            raw,
            lambda b: F.struct(
                _block_text(b).alias("t"),
                F.least(anchor_chars(b),
                        F.length(_block_text(b))).alias("a"))),
        lambda s: F.length(s["t"]) > 0)
    kept = F.filter(
        blocks,
        lambda s: (F.length(s["t"]) >= F.lit(min_chars))
        & (s["a"] * 1000 <= F.lit(max_link_ppt) * F.length(s["t"])))
    keep_cols = [c for c in pages.columns if c != html_col]
    return (pages
            .withColumn("_blocks", blocks).withColumn("_kept", kept)
            .select(*keep_cols,
                    F.size("_blocks").cast("int").alias("n_blocks"),
                    F.size("_kept").cast("int").alias("n_kept"),
                    F.array_join(F.transform("_kept",
                                             lambda s: s["t"]), "\n")
                    .alias("content"))
            .withColumn("content_chars",
                        F.length("content").cast("int")))


# ---------------------------------------------------------------------------
# charset sniffing (WHATWG encoding-detection precedence, simplified)

# charset tokens inside a <meta> tag: matches both <meta charset=X>
# and <meta http-equiv="Content-Type" content="text/html; charset=X">
# (the parameter spelling is the same either way)
_META_CHARSET_RE = (r'(?is)<meta[^>]*[\s"\x27/;]charset\s*=\s*'
                    r'["\x27]?\s*([a-zA-Z0-9_.:-]+)')
_HTTP_CHARSET_RE = r'(?i)charset\s*=\s*"?\s*([a-zA-Z0-9_.:-]+)'
_XML_DECL_RE = (r'(?is)^<\?xml[^>]*encoding\s*=\s*'
                r'["\x27]([a-zA-Z0-9_.:-]+)')

# label → canonical name for the aliases a crawl actually sees; the
# table is the spec, shared with the DuckDB oracle.  Unknown labels
# pass through lowercased (better to preserve than to guess).
CHARSET_ALIASES = {
    "utf8": "utf-8", "utf-8": "utf-8",
    "latin1": "iso-8859-1", "latin-1": "iso-8859-1",
    "iso-8859-1": "iso-8859-1", "iso8859-1": "iso-8859-1",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "euc-kr": "euc-kr", "euc_kr": "euc-kr",
    "gbk": "gbk", "gb2312": "gbk", "big5": "big5",
    "utf-16": "utf-16", "utf-16le": "utf-16le",
    "utf-16be": "utf-16be",
}


def _canon_charset(col):
    out = F.lower(col)
    for label, canon in CHARSET_ALIASES.items():
        if label != canon:
            out = F.when(F.lower(col) == label, F.lit(canon)) \
                .otherwise(out)
    return out


def charset_sniff(pages: DataFrame, body_col: str = "body",
                  content_type_col: str = "content_type",
                  prefix_bytes: int = 1024) -> DataFrame:
    """Document encoding detection, WHATWG-precedence (simplified).

    A crawl cannot trust any single signal: servers lie in the
    Content-Type header, pages lie in their meta tags, and both are
    absent often enough that a default must exist.  Detection order is
    the standard one — a BYTE ORDER MARK is authoritative (the
    document physically starts with it), then the transport-layer
    ``charset=`` parameter, then the in-page ``<meta>`` charset
    scanned over the first ``prefix_bytes`` (the spec's prescan
    window — a parser cannot buffer the whole document to decide how
    to decode it), then an XML declaration, then utf-8.  Labels are
    canonicalized through :data:`CHARSET_ALIASES`.

    This is the step in FRONT of the encoding-damage gate
    (``textstats``): mojibake is usually a page decoded with the
    WRONG winner of exactly this precedence.

    Plan: shuffle-free single Project — BOM checks are a 3-byte
    binary slice + hex compare, the prescan decodes only the bounded
    prefix as latin-1 (every byte maps; never throws), all regexp is
    JVM-side.  Returns input columns minus the body (content_type is
    kept — downstream MIME gates key on it), plus (charset,
    charset_source ∈ bom|http|meta|xml|default).
    """
    body = F.col(body_col)
    h3 = F.hex(F.substring(body, 1, 3))
    h2 = F.hex(F.substring(body, 1, 2))
    prefix = F.decode(F.substring(body, 1, prefix_bytes),
                      "ISO-8859-1")
    http = F.regexp_extract(
        F.coalesce(F.col(content_type_col), F.lit("")),
        _HTTP_CHARSET_RE, 1)
    meta = F.regexp_extract(prefix, _META_CHARSET_RE, 1)
    xml = F.regexp_extract(prefix, _XML_DECL_RE, 1)
    charset = (
        F.when(h3 == "EFBBBF", F.lit("utf-8"))
        .when(h2 == "FFFE", F.lit("utf-16le"))
        .when(h2 == "FEFF", F.lit("utf-16be"))
        .when(http != "", _canon_charset(http))
        .when(meta != "", _canon_charset(meta))
        .when(xml != "", _canon_charset(xml))
        .otherwise(F.lit("utf-8")))
    source = (
        F.when((h3 == "EFBBBF") | (h2 == "FFFE") | (h2 == "FEFF"),
               F.lit("bom"))
        .when(http != "", F.lit("http"))
        .when(meta != "", F.lit("meta"))
        .when(xml != "", F.lit("xml"))
        .otherwise(F.lit("default")))
    keep = [c for c in pages.columns
            if c != body_col]
    return pages.select(*keep, charset.alias("charset"),
                        source.alias("charset_source"))


def page_ingest(pages: DataFrame, url_col: str = "url",
                html_col: str = "html",
                min_content_chars: int = 100) -> DataFrame:
    """Raw fetched HTML → corpus-ready ingest verdicts, one lineage.

    The front half of the corpus build (``corpus.llm_corpus_build``
    picks up from extracted documents): boilerplate removal
    (:func:`main_content`), a minimum-content gate, and exact
    duplicate election on the content fingerprint — the order matters,
    and running them fused is what makes the whole step one body scan:

    * extraction first, because dedup over RAW html is nearly useless
      (every page is unique — timestamps, session ids, rotating nav),
      while the extracted prose is where true duplicates collapse;
    * the length gate before the dedup shuffle, so chrome-only pages
      never pay an exchange;
    * canonical election as ``min(url)`` per fingerprint —
      deterministic, and the same election every other dedup family
      here uses.

    Plan: extraction + gate ride the page scan (shuffle-free
    higher-order functions); the ONLY exchange is the fingerprint
    window, and since the output carries no content column, Catalyst
    prunes the bodies out of that shuffle — gate-failed rows get a
    per-row synthetic partition key (``short:url``) so they pass
    through the same window without forming a skewed NULL bucket.

    Returns (url, n_blocks, n_kept, content_chars, content_fp,
    canonical_url, is_canonical, kept, drop_reason ∈ NULL|short|
    duplicate).
    """
    from pyspark.sql import Window

    extracted = main_content(pages.select(url_col, html_col),
                             html_col=html_col)
    ok = F.col("content_chars") >= F.lit(min_content_chars)
    staged = extracted.select(
        F.col(url_col).alias("url"), "n_blocks", "n_kept",
        "content_chars",
        F.when(ok, F.md5("content")).alias("content_fp"),
        F.when(ok, F.md5("content"))
        .otherwise(F.concat(F.lit("short:"), F.col(url_col)))
        .alias("_key"))
    w = Window.partitionBy("_key")
    elected = staged.withColumn("_min_url", F.min("url").over(w))
    is_canon = F.col("content_fp").isNotNull() \
        & (F.col("url") == F.col("_min_url"))
    kept = is_canon
    reason = (F.when(F.col("content_fp").isNull(), F.lit("short"))
              .when(~is_canon, F.lit("duplicate")))
    return elected.select(
        "url", "n_blocks", "n_kept", "content_chars", "content_fp",
        F.when(F.col("content_fp").isNotNull(), F.col("_min_url"))
        .alias("canonical_url"),
        is_canon.alias("is_canonical"), kept.alias("kept"),
        reason.alias("drop_reason"))


# first <meta> whose http-equiv is EXACTLY refresh (either attribute
# order, quoted or bare), then the content attribute read out of that
# one tag — document order decides conflicts, same two-step discipline
# as the robots/canonical extractors above
_REFRESH_TAG = (r'(?is)<meta\b[^>]*[\s"\x27/]http-equiv\s*=\s*'
                r'(?:["\x27][ \t]*refresh[ \t]*["\x27][^>]*>'
                r'|refresh[\s/][^>]*>'
                r'|refresh[ \t]*>)')
# content="5; url=/target" — delay, then an optional url= part whose
# value may be quoted; whitespace and case per the WHATWG number rules
_REFRESH_DELAY = r"(?is)[\s\"\x27/]content\s*=\s*[\"\x27]?\s*(\d+)"
_REFRESH_URL = (r"(?is)[\s\"\x27/]content\s*=\s*[\"\x27]?[^\"\x27>]*?"
                r"url\s*=\s*[\"\x27]?([^\"\x27>\s;]+)")


def meta_refresh(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """Extract ``<meta http-equiv="refresh">`` soft redirects.

    The third redirect kind a crawl meets (after 3xx and
    rel=canonical): a page that client-side forwards to another URL.
    Zero-delay refreshes are treated by search engines as redirects
    (the page's identity moves); longer delays are usually interstitial
    pages worth keeping but flagging.  Emits per page the declared
    delay and target; document order decides among multiple tags, and
    a refresh without a ``url=`` part (a self-reload) yields a NULL
    target.

    Shuffle-free single Project (same regexp discipline as the
    robots/canonical extractors — one tag-level pattern accepting
    either attribute order, then attribute readout within that tag).
    Feed the zero-delay (url, refresh_url) pairs into
    :func:`canonical_identity`'s redirect side to fold identities.

    Returns input columns + (refresh_delay_s, refresh_url).
    """
    tag = F.regexp_extract(F.col(html_col), _REFRESH_TAG, 0)
    delay = F.regexp_extract(tag, _REFRESH_DELAY, 1)
    target = F.trim(F.regexp_extract(tag, _REFRESH_URL, 1))
    return pages.select(
        *pages.columns,
        F.when(delay != "", delay.cast("int"))
        .alias("refresh_delay_s"),
        F.when(target != "", target).alias("refresh_url"))
