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
    Deliberately matches the PATH ONLY (query stripped) — this arm is
    the byte-parity twin of the oracle scheduler, which evaluates
    ``urlsplit(url).path``; the RFC-conformant path+query matching
    lives in :func:`rfc9309_gate`.
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


def parse_robots_body(body: str, agent: str = "*") -> dict:
    """One robots.txt body → {allow, disallow, crawl_delay}.

    ALL groups whose ``User-agent`` lines match ``agent`` are merged
    (RFC 9309 §2.2.1; exact matches beat ``*``; a group can name
    several agents); the first numeric ``Crawl-delay`` across the
    merged groups wins.  Keys
    are case-insensitive, ``#`` starts a comment, empty rule values are
    ignored (an empty ``Disallow:`` means allow-all, per the original
    spec).  Deliberately the same prefix semantics :func:`gate`
    enforces — no %-decoding, no wildcard rules.
    """
    groups = []  # (agents, allow, disallow, crawl_delay)
    current = None
    saw_rule = True  # a UA line after rules starts a NEW group
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if current is None or saw_rule:
                current = ([], [], [], [None])
                groups.append(current)
                saw_rule = False
            current[0].append(val.lower())
        elif current is not None and key in ("allow", "disallow",
                                             "crawl-delay"):
            saw_rule = True
            if key == "allow" and val:
                current[1].append(val)
            elif key == "disallow" and val:
                current[2].append(val)
            elif key == "crawl-delay":
                # first numeric value in the group wins (document
                # order), matching crawl_delay_df's min_by(pos)
                if current[3][0] is None:
                    try:
                        current[3][0] = float(val)
                    except ValueError:
                        pass
    agent = agent.lower()
    # RFC 9309 §2.2.1: combine ALL groups naming the agent (exact
    # groups when any exist, else all '*' groups); the first numeric
    # Crawl-delay across the merged groups (document order) wins
    sel = [g for g in groups if agent != "*" and agent in g[0]]
    if not sel:
        sel = [g for g in groups if "*" in g[0]]
    allow = [a for g in sel for a in g[1]]
    disallow = [d for g in sel for d in g[2]]
    delay = next((g[3][0] for g in sel if g[3][0] is not None), None)
    return {"allow": allow, "disallow": disallow,
            "crawl_delay": delay if delay is not None
            else DEFAULT_CRAWL_DELAY}


def parse_robots_df(bodies: DataFrame, agent: str = "*") -> DataFrame:
    """(host, body) rows of fetched robots.txt files → the rules table.

    The batch kernel parses each body once per Arrow batch; the output
    is exactly the broadcast table :func:`gate` consumes, so the full
    path raw-text → rules → gate is covered by the round-trip test
    (datagen renders robots.txt text from its records; parsing it back
    reproduces the records).
    """
    from typing import Iterator

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for host, body in zip(batch["host"], batch["body"]):
                rec = parse_robots_body(body, agent)
                rec["host"] = host
                rows.append(rec)
            yield pd.DataFrame(
                rows, columns=["host", "allow", "disallow", "crawl_delay"])

    return bodies.mapInPandas(
        kernel, "host string, allow array<string>, "
                "disallow array<string>, crawl_delay double")


_SITEMAP_LINE_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^#\r\n]+)"


def robots_sitemaps(bodies: DataFrame, host_col: str = "host",
                    body_col: str = "body") -> DataFrame:
    """Extract ``Sitemap:`` directives from fetched robots.txt bodies —
    the discovery feed into :func:`sitemaps.sitemap_urls`.

    Per the robots spec the directive is GROUP-INDEPENDENT (it applies
    regardless of user-agent groups), so unlike the rules parser this
    needs no group resolution and stays entirely JVM-side: one
    multiline case-insensitive ``regexp_extract_all`` + one explode,
    comments stripped by the pattern, surrounding whitespace trimmed.
    Emits ``(host, sitemap_url)``; bodies without the directive emit
    nothing.  Shuffle-free.
    """
    urls = F.regexp_extract_all(F.col(body_col),
                                F.lit(_SITEMAP_LINE_RE), 1)
    return (bodies.select(F.col(host_col).alias("host"),
                          F.explode(urls).alias("sitemap_url"))
            .select("host", F.trim("sitemap_url").alias("sitemap_url")))


def rfc9309_gate(urls: DataFrame, rules: DataFrame,
                 url_col: str = "url") -> DataFrame:
    """RFC 9309 wildcard rule evaluation — the full robots matching the
    prefix-only :func:`gate` approximates: ``*`` matches any character
    run, a trailing ``$`` anchors the rule at the URL's end, and among
    ALL matching rules the most specific (longest pattern) wins, ties
    going to ``allow`` (RFC 9309 §2.2.2).  No matching rule → allowed.

    ``rules``: one row per rule, ``(host, rule_type 'allow'|'disallow',
    pattern)``; empty patterns are dropped (an empty Disallow means
    "allow all" at the parser level, not a match-everything rule).

    Engine-portable by construction: the pattern→regex compilation is
    pure string algebra (escape the metacharacter class, splice ``.*``
    for ``*``, re-attach ``$``) that Spark and the SQL oracle perform
    identically, and precedence is the single integer
    ``2·len(pattern) + is_allow`` whose per-URL ``max`` decides the
    verdict — allow wins length ties because of the low bit.

    Scale shape: rules broadcast (the rules table is robots.txt-sized,
    never URL-sized); one slim groupBy(url) of the matched pairs with
    map-side max; verdicts rejoin the URL set on its own key.  The
    per-row regex evaluation happens only on (url × same-host-rule)
    pairs — bounded by rules-per-host, not by the rule universe.

    Emits every input row + ``(rule_len, allowed)``.
    """
    ends = F.col("pattern").endswith("$")
    core = F.when(ends, F.expr("left(pattern, length(pattern) - 1)")) \
            .otherwise(F.col("pattern"))
    esc = F.regexp_replace(core, r"([.+?()\[\]{}|^$\\])", r"\\$1")
    rx = F.concat(F.lit("^"),
                  F.replace(esc, F.lit("*"), F.lit(".*")),
                  F.when(ends, F.lit("$")).otherwise(F.lit("")))
    key = (F.length("pattern").cast("long") * 2
           + (F.col("rule_type") == "allow").cast("long"))
    r = (rules.where(F.length("pattern") > 0)
         .select("host", rx.alias("_rx"), key.alias("_key")))
    # RFC 9309 match target: path PLUS query (stop at the fragment) —
    # '/*?sessionid=' style DUST bans must see the query string.  An
    # empty path with a query normalizes to '/?...', bare hosts to '/'.
    path = F.coalesce(
        F.regexp_extract(F.col(url_col),
                         r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)",
                         1),
        F.lit(""))
    path = (F.when(path == "", F.lit("/"))
            .when(path.startswith("?"), F.concat(F.lit("/"), path))
            .otherwise(path))
    matched = (urls.select(url_col, "host", path.alias("_path"))
               .join(F.broadcast(r), "host")
               .where(F.expr("regexp_like(_path, _rx)"))
               .groupBy(url_col)
               .agg(F.max("_key").alias("_best")))
    return (urls.join(matched, url_col, "left")
            .select(*urls.columns,
                    F.coalesce(F.expr("_best div 2"),
                               F.lit(0).cast("long")).alias("rule_len"),
                    F.coalesce(F.col("_best") % 2 == 1, F.lit(True))
                    .alias("allowed")))


def wildcard_rules_df(bodies: DataFrame, agent: str = "*",
                      host_col: str = "host",
                      body_col: str = "body") -> DataFrame:
    """Raw fetched robots.txt bodies → the per-rule table
    :func:`rfc9309_gate` consumes: ``(host, rule_type, pattern)``.

    Entirely JVM-side (no Python kernel, unlike :func:`parse_robots_df`
    which feeds the prefix gate's array schema): split lines, strip
    ``#`` comments, classify ``User-agent``/``Allow``/``Disallow``/
    ``Crawl-delay`` lines, then resolve groups with ONE window per
    host — a ``User-agent`` line following a rule line starts a new
    group, consecutive ``User-agent`` lines share one group.  Group
    selection matches :func:`parse_robots_body` (RFC 9309 §2.2.1):
    ALL groups naming ``agent`` exactly (case-insensitive) are merged,
    else all ``*`` groups; hosts with neither emit no rules (= allow
    all at the gate).  Empty rule values are dropped (empty ``Disallow:`` means
    allow-all).  ``Crawl-delay`` lines count as rules for group
    BOUNDARIES (as in :func:`parse_robots_body`) but are not emitted.

    Scale shape: the window partitions by host and robots bodies are
    bounded (500 KiB per RFC 9309 §2.4), so no partition is ever
    large; group flags and the chosen-group pick are host-bounded
    aggregations; the output is robots-sized and broadcastable
    straight into the gate.  Engine-portable: every step is string
    algebra + lag/sum windows the SQL oracle replays identically.
    """
    grouped, chosen = _robots_chosen_group(bodies, agent, host_col,
                                           body_col)
    return (grouped.join(chosen, ["host", "grp"])
            .where(~F.col("is_ua")
                   & F.col("key").isin("allow", "disallow")
                   & (F.length("val") > 0))
            .select("host", F.col("key").alias("rule_type"),
                    F.col("val").alias("pattern")))


def _robots_chosen_group(bodies: DataFrame, agent: str,
                         host_col: str, body_col: str):
    """Shared group resolution for :func:`wildcard_rules_df` and
    :func:`crawl_delay_df`: (grouped classified lines, chosen group
    per host)."""
    from pyspark.sql import Window

    lines = (bodies
             .select(F.col(host_col).alias("host"),
                     F.posexplode(F.split(
                         F.coalesce(F.col(body_col), F.lit("")),
                         r"\r?\n")).alias("pos", "raw"))
             .withColumn("line",
                         F.trim(F.regexp_replace("raw", "#.*", "")))
             .where(F.col("line").contains(":"))
             .withColumn("key", F.lower(F.trim(
                 F.substring_index("line", ":", 1))))
             .withColumn("val", F.trim(F.expr(
                 "substring(line, instr(line, ':') + 1)")))
             .withColumn("is_ua", F.col("key") == "user-agent")
             .where(F.col("is_ua")
                    | F.col("key").isin("allow", "disallow",
                                        "crawl-delay")))
    w = Window.partitionBy("host").orderBy("pos")
    grouped = (lines
               .withColumn("start",
                           F.col("is_ua")
                           & F.coalesce(~F.lag("is_ua").over(w),
                                        F.lit(True)))
               .withColumn("grp",
                           F.sum(F.col("start").cast("int")).over(w))
               .where(F.col("grp") > 0))
    flags = (grouped.groupBy("host", "grp")
             .agg(F.max((F.col("is_ua")
                         & (F.lower("val") == agent.lower()))
                        .cast("int")).alias("ex"),
                  F.max((F.col("is_ua") & (F.col("val") == "*"))
                        .cast("int")).alias("st")))
    # RFC 9309 §2.2.1: ALL groups matching the agent are combined into
    # one — exact-name groups when any exist, else all ``*`` groups.
    wh = Window.partitionBy("host")
    chosen = (flags
              .withColumn("_any_ex", F.max("ex").over(wh))
              .where(((F.col("_any_ex") == 1) & (F.col("ex") == 1))
                     | ((F.col("_any_ex") == 0) & (F.col("st") == 1)))
              .select("host", "grp"))
    return grouped, chosen


def crawl_delay_df(bodies: DataFrame, agent: str = "*",
                   host_col: str = "host", body_col: str = "body",
                   default: float = DEFAULT_CRAWL_DELAY) -> DataFrame:
    """Per-host ``Crawl-delay`` from raw robots.txt bodies, resolved
    with the SAME group selection as :func:`wildcard_rules_df` (all
    exact agent groups merged, else all ``*`` groups) — completing the
    JVM-side robots pipeline: rules feed :func:`rfc9309_gate`, delays
    feed the politeness scheduler.

    The merged groups' FIRST ``Crawl-delay`` line wins (line order,
    like the sequential reference parser); non-numeric values fall
    back to ``default`` via ``try_cast``.  Emits one row per input
    host (hosts with no usable directive carry ``default``), so the
    output joins 1:1 onto the frontier's host table.
    """
    grouped, chosen = _robots_chosen_group(bodies, agent, host_col,
                                           body_col)
    hosts = bodies.select(F.col(host_col).alias("host")).distinct()
    first = (grouped.join(chosen, ["host", "grp"])
             .where((F.col("key") == "crawl-delay")
                    & F.expr("try_cast(val AS DOUBLE)").isNotNull())
             .groupBy("host")
             .agg(F.min_by(F.expr("try_cast(val AS DOUBLE)"),
                           F.col("pos")).alias("_d")))
    return (hosts.join(first, "host", "left")
            .select("host",
                    F.coalesce("_d", F.lit(float(default)))
                    .alias("crawl_delay")))


def wildcard_rules_py(body: str, agent: str = "*") -> list:
    """Pure-python twin of :func:`wildcard_rules_df` for ONE body —
    returns ``[(rule_type, pattern), ...]`` for randomized parity
    tests; composes with :func:`is_allowed_rfc9309`.
    """
    import re

    rows = []
    for pos, raw in enumerate(re.split(r"\r?\n", body or "")):
        line = re.sub(r"#.*", "", raw).strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent" or key in ("allow", "disallow",
                                          "crawl-delay"):
            rows.append((key == "user-agent", key, val))
    grp, prev_ua, groups = 0, False, {}
    for is_ua, key, val in rows:
        if is_ua and not prev_ua:
            grp += 1
        prev_ua = is_ua
        if grp > 0:
            groups.setdefault(grp, []).append((is_ua, key, val))
    exact, star = [], []
    for g in sorted(groups):
        names = [v.lower() for ua, k, v in groups[g] if ua]
        if agent.lower() in names:
            exact.append(g)
        if "*" in names:
            star.append(g)
    # RFC 9309 §2.2.1: merge ALL matching groups (exact beats star)
    sel = exact if exact else star
    return [(k, v) for g in sel for ua, k, v in groups[g]
            if not ua and k in ("allow", "disallow") and v]


def is_allowed_rfc9309(path: str, rules: list) -> bool:
    """Pure-python twin of :func:`rfc9309_gate` for tests/oracles.

    ``rules``: (rule_type, pattern) tuples for ONE host.
    """
    import re

    best = None
    for rule_type, pattern in rules:
        if not pattern:
            continue
        ends = pattern.endswith("$")
        core = pattern[:-1] if ends else pattern
        rx = "^" + re.sub(r"([.+?()\[\]{}|^$\\])", r"\\\1",
                          core).replace("*", ".*") + ("$" if ends else "")
        if re.search(rx, path):
            k = 2 * len(pattern) + (1 if rule_type == "allow" else 0)
            best = k if best is None else max(best, k)
    return True if best is None else best % 2 == 1


ROBOTS_CACHE_MAX_AGE_DAYS = 30


def fetch_policy(fetches: DataFrame, status_col: str = "status",
                 cache_age_col: str = "cache_age_days") -> DataFrame:
    """What to do with robots.txt by its FETCH status — RFC 9309
    §2.3.1, the availability half of robots handling (the parsing half
    is :func:`wildcard_rules_df`):

    * 2xx  → ``use_live``: parse the fetched body.
    * 3xx  → ``follow_redirect``: chase the hop (crawlers MUST follow
      at least five; the redirect-chain resolution itself is
      ``graph.resolve_redirects``).
    * 4xx  → ``allow_all``: "unavailable" means no restrictions
      (§2.3.1.3) — the single most common robots outcome on the web.
    * 5xx or no response (NULL status) → "unreachable" (§2.3.1.4):
      a cached copy younger than :data:`ROBOTS_CACHE_MAX_AGE_DAYS`
      MAY be reused (``use_cached``); with no usable cache the host is
      treated as completely disallowed (``disallow_all``) so a flaky
      origin is never hammered by a crawler that cannot read its
      rules.

    ``cache_age_days`` is NULL when no cached copy exists.  Emits
    every input row + ``policy``; ``fetchable`` is the downstream
    shortcut (true unless ``disallow_all``).  Shuffle-free CASE ladder
    over the per-host fetch table — robots-sized, never URL-sized.
    """
    st = F.col(status_col).cast("int")
    cached_ok = (F.col(cache_age_col).isNotNull()
                 & (F.col(cache_age_col)
                    <= ROBOTS_CACHE_MAX_AGE_DAYS))
    policy = (F.when((st >= 200) & (st < 300), F.lit("use_live"))
              .when((st >= 300) & (st < 400), F.lit("follow_redirect"))
              .when((st >= 400) & (st < 500), F.lit("allow_all"))
              .when(cached_ok, F.lit("use_cached"))
              .otherwise(F.lit("disallow_all")))
    return fetches.select(
        *fetches.columns, policy.alias("policy"),
        (policy != "disallow_all").alias("fetchable"))
