"""In-page crawl directives: ``<meta name="robots">`` and
``<link rel="canonical">`` extraction.

robots.txt gates FETCHES; these two gate what the pipeline does with a
page it already fetched — ``noindex`` drops it from the corpus/search
index, ``nofollow`` drops its outlinks from the frontier, and
``rel=canonical`` redirects dedup credit to the page the site itself
names as the master copy (the crawl-side sibling of the DUST rules:
the site TELLS us the duplicate structure instead of us mining it).

Everything is JVM-side regexp over the raw HTML (case-insensitive,
DOTALL, attribute order handled by coalescing the two orderings) —
engine-portable: Java regex and RE2 agree on every construct used
here (``(?is)``, greedy character classes, no backtracking traps).
Shuffle-free: one projection over the pages scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# name= before content= / content= before name=, quoted and unquoted
# attribute values (greedy char classes, no lazy quantifiers —
# identical semantics in Java regex and RE2).  Quoted values may hold
# spaces/commas; unquoted ones end at whitespace or '>'
_META_NC_Q = (r'(?is)<meta\b[^>]*name\s*=\s*["\x27]?robots["\x27]?'
              r'[^>]*content\s*=\s*["\x27]([^"\x27>]*)')
_META_NC_U = (r'(?is)<meta\b[^>]*name\s*=\s*["\x27]?robots["\x27]?'
              r'[^>]*content\s*=\s*([^"\x27>\s]+)')
_META_CN_Q = (r'(?is)<meta\b[^>]*content\s*=\s*["\x27]([^"\x27>]*)'
              r'["\x27][^>]*name\s*=\s*["\x27]?robots["\x27]?')
_META_CN_U = (r'(?is)<meta\b[^>]*content\s*=\s*([^"\x27>\s]+)'
              r'[^>]*name\s*=\s*["\x27]?robots["\x27]?')
_CANON_RH = (r'(?is)<link\b[^>]*rel\s*=\s*["\x27]?canonical["\x27]?'
             r'[^>]*href\s*=\s*["\x27]?([^"\x27>\s]+)')
_CANON_HR = (r'(?is)<link\b[^>]*href\s*=\s*["\x27]?([^"\x27>\s]+)'
             r'["\x27]?[^>]*rel\s*=\s*["\x27]?canonical["\x27]?')


def _first_nonempty(col, *pats: str):
    out = F.lit("")
    for pat in reversed(pats):
        cur = F.regexp_extract(col, pat, 1)
        out = F.when(cur != "", cur).otherwise(out)
    return out


def meta_robots(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Emit every input row + ``(noindex, nofollow)`` booleans.

    The first ``<meta name="robots">`` tag wins (document order —
    ``regexp_extract`` returns the first match, matching how browsers
    and crawlers treat duplicates); a page without the tag is
    ``(false, false)``.  Token match is comma/space tolerant and
    case-insensitive per the robots meta spec; ``none`` is the
    defined shorthand for ``noindex, nofollow``.
    """
    content = F.lower(_first_nonempty(F.col(html_col), _META_NC_Q,
                                      _META_NC_U, _META_CN_Q,
                                      _META_CN_U))
    toks = F.split(F.regexp_replace(content, r"\s+", ""), ",")
    has = lambda t: F.array_contains(toks, t)  # noqa: E731
    return pages.select(
        *pages.columns,
        (has("noindex") | has("none")).alias("noindex"),
        (has("nofollow") | has("none")).alias("nofollow"))


def rel_canonical(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Emit every input row + ``canonical_href`` (NULL when the page
    declares none).  First ``<link rel="canonical">`` wins; both
    attribute orders are handled.  Feed the non-null ``(url,
    canonical_href)`` pairs into ``graph.resolve_redirects`` to chase
    canonical chains site-wide in log(hops) joins.
    """
    href = _first_nonempty(F.col(html_col), _CANON_RH, _CANON_HR)
    return pages.select(
        *pages.columns,
        F.when(href != "", href).alias("canonical_href"))
