"""Text-analysis operators over a documents table (JVM-side, no UDFs).

Large-scale training-data pipeline primitives: token counting, quality
scoring, language identification, document fingerprinting.  Every operator
is pure `pyspark.sql.functions` — whole-stage-codegen friendly, no Python
in the hot path — and each has an exact ANSI-SQL twin used as the DuckDB
oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from scrapely_spark.spark.dedup import _unpersist_on_gc

# deterministic marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "von", "mit"],
    "es": ["el", "la", "de", "que", "en"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate + punctuation counts."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(words).alias("n_words"),
        # a BPE-ish proxy: words + one extra token per 4 chars of long words
        (F.size(words) + F.aggregate(
            words, F.lit(0),
            lambda acc, w: acc + F.when(F.length(w) > 8,
                                        (F.length(w) / 4).cast("int"))
            .otherwise(0))).alias("n_tokens_est"),
        F.size(F.split(F.col("text"), r"[.!?]")).alias("n_sentences"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristics.

    Empty text scores 0 ratios (the divisor clamps to 1 — under
    Spark's default ANSI mode a bare ``x / length(text)`` would throw
    DIVIDE_BY_ZERO and one empty extraction would kill the whole
    corpus build); ``n_words`` is never 0 because ``split`` of an
    empty string yields ``['']``.
    """
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(words)
    stop_hits = F.size(F.filter(
        words, lambda w: F.lower(w).isin(STOPWORDS)))
    punct = F.length(F.regexp_replace(F.col("text"), r"[^\.,;:!?]", ""))
    alpha = F.length(F.regexp_replace(F.col("text"), r"[^a-zA-Z]", ""))
    tlen = F.greatest(F.length("text"), F.lit(1))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(stop_hits / n_words, 6).alias("stopword_ratio"),
        F.round(punct / tlen, 6).alias("punct_ratio"),
        F.round(alpha / tlen, 6).alias("alpha_ratio"),
        F.round(
            F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.5
            + (stop_hits / n_words) * 0.3
            + (alpha / tlen) * 0.2, 6).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-word language guess with deterministic tie-break.

    Scores each language by marker-word hits; ties (including the
    all-zero case) resolve to the alphabetically first language.
    """
    words = F.split(F.lower(F.col("text")), r"\s+")

    def _hits(markers):
        # NB: a two-arg lambda would be read by F.filter as (elem, index)
        return F.size(F.filter(words, lambda w: w.isin(markers)))

    scored = docs.select(
        "doc_id", "lang",
        *[_hits(markers).alias("score_%s" % lang)
          for lang, markers in sorted(LANG_MARKERS.items())])
    best = F.greatest(*[F.col("score_%s" % lang)
                        for lang in sorted(LANG_MARKERS)])
    pred = F.coalesce(
        *[F.when(F.col("score_%s" % lang) == best, F.lit(lang))
          for lang in sorted(LANG_MARKERS)])
    return scored.select("doc_id", "lang",
                         pred.alias("predicted_lang"), best.alias("score"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, appendix A1.1).

    Per document: the duplicate-word fraction (1 - distinct/total) and
    the occurrence share of the most frequent word bigram and trigram —
    the standard "repetitious document" signals an LLM-corpus cleaner
    thresholds on.  The paper's line-based variants are omitted: the
    synthetic corpus is single-line, so they are degenerate here.

    Scale shape: one explode per n-gram size, then count on
    ``(doc_id, gram)`` and max/sum per doc — both aggregations get
    map-side partial combine, and per-doc work is linear in document
    length (no quadratic distinct×tokens array scan).
    """
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select(
        "doc_id", words.alias("w"),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"))

    def _top_frac(n: int, alias: str) -> DataFrame:
        # sequence() counts DOWN when stop < start, so guard short docs
        # with an explicit empty array instead.
        starts = F.when(
            F.col("n_words") >= n,
            F.sequence(F.lit(1), (F.col("n_words") - (n - 1)).cast("int"))
        ).otherwise(F.array().cast("array<int>"))
        grams = F.transform(
            starts, lambda i: F.array_join(F.slice("w", i, n), " "))
        return (base
                .select("doc_id", F.explode(grams).alias("g"))
                .groupBy("doc_id", "g").count()
                .groupBy("doc_id")
                .agg(F.round(F.max("count") / F.sum("count"), 6)
                     .alias(alias)))

    bi = _top_frac(2, "top_bigram_frac")
    tri = _top_frac(3, "top_trigram_frac")
    return (base
            .join(bi, "doc_id", "left").join(tri, "doc_id", "left")
            .select(
                "doc_id", "n_words",
                F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6)
                .alias("dup_word_frac"),
                F.coalesce("top_bigram_frac", F.lit(0.0))
                .alias("top_bigram_frac"),
                F.coalesce("top_trigram_frac", F.lit(0.0))
                .alias("top_trigram_frac")))


# PII patterns, spelled to behave identically under Java regex (Spark)
# and RE2 (DuckDB oracle): explicit ASCII classes (never \d/\s, whose
# unicode semantics differ between the engines), shared {m,n} bounds,
# ASCII \b word boundaries.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3,4}-[0-9]{4,7}\b"


def pii_mask(col) -> "F.Column":
    """The masking expression: replacements in a fixed order (email,
    ip, phone) so the passes cannot eat each other's spans."""
    red = F.col(col) if isinstance(col, str) else col
    for pat, tag in ((PII_EMAIL, "<EMAIL>"), (PII_IPV4, "<IP>"),
                     (PII_PHONE, "<PHONE>")):
        red = F.regexp_replace(red, pat, tag)
    return red


def redact_pii(docs: DataFrame) -> DataFrame:
    """Count and mask emails / IPv4s / intl phone numbers per document.

    The standard pre-release corpus-scrubbing pass.  Counts come from
    the ORIGINAL text; masking order is fixed (see pii_mask).  Pure
    `pyspark.sql.functions` — one projection, no shuffle, whole
    row-set streams through codegen.
    """
    red = pii_mask("text")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count("text", F.lit(PII_IPV4)).alias("n_ipv4"),
        F.regexp_count("text", F.lit(PII_PHONE)).alias("n_phones"),
        red.alias("text_redacted"),
    )


def lm_perplexity(docs: DataFrame, n_buckets: int = 3,
                  approx_thresholds: bool = False) -> DataFrame:
    """CCNet-style n-gram LM perplexity bucketing (Wenzek et al. 2020).

    The canonical quality-stratification pass of a pretraining corpus
    cleaner: score every document under a language model and split each
    language into head/middle/tail perplexity buckets.  CCNet uses a
    pre-trained 5-gram KenLM; this engine trains the model in-plan — an
    add-one-smoothed bigram LM over the corpus itself:

        p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)

    with V the distinct-vocabulary size.  Per document, the score is
    the mean negative log-probability over its bigram positions and
    the perplexity its exp; documents with fewer than two tokens carry
    no bigram and are dropped.

    Determinism at any partitioning: the model's per-bigram log-prob is
    rounded once to integer micro-nats (``round(ln(p)·1e6)`` BIGINT) at
    the model level — a bounded table, one row per distinct bigram —
    and per-document totals are exact integer sums of those micro-nats,
    so no floating-point accumulation order can leak into the result
    (the same integer-domain trick as corpus.mixing_rates).

    Scale shape: two explode+groupBy passes build the model (both get
    map-side partial combine and carry the *vocabulary*, never the
    corpus); per-doc bigrams pre-aggregate to (doc_id, bigram, c) before
    joining the model on the bigram key — a plain hash join whose build
    side is the model (broadcastable when small, shuffled co-partitioned
    at 10^10 docs).  The final per-language ntile is a sorted window per
    language; ``approx_thresholds=True`` is the 100 TB path — bucket
    boundaries from ``percentile_approx`` (one agg onto |langs| rows,
    broadcast back; no per-language sort ever happens).  The approx
    buckets are engine-specific (no cross-engine oracle), so the driver
    query uses the exact path and the bench exercises the approx one.
    """
    # drop the '' token split() yields for empty/whitespace-only docs
    # (the bpe_train tokenizer contract) — it would otherwise add a
    # phantom '' row to the vocabulary V and shift every smoothed
    # probability
    from scrapely_spark.spark.dedup import _spread

    words = F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                     lambda x: F.length(x) > 0)
    # widen a single-split scan before the two corpus-sized explodes
    # below — they are the job's map cost and otherwise run as one
    # task each (guide §2.5)
    docs = _spread(docs.select("doc_id", "lang", "text"))
    base = docs.select("doc_id", "lang", words.alias("w"),
                       F.size(words).alias("n"))
    starts = F.when(F.col("n") >= 2,
                    F.sequence(F.lit(1), F.col("n") - 1)
                    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts, lambda i: F.concat_ws(" ", F.element_at("w", i),
                                      F.element_at("w", i + 1)))
    # doc_bi and uni each feed TWO consumers (the model-training agg and
    # the scoring join / vocab total); cache the slim aggregated frames
    # so the tokenize+explode scans run once, not twice — freed when the
    # result is dropped (the LSH _unpersist_on_gc convention)
    doc_bi = (base.select("doc_id", "lang", F.explode(grams).alias("bigram"))
              .groupBy("doc_id", "lang", "bigram")
              .agg(F.count("*").alias("c"))).persist()
    uni = (docs.select(F.explode(words).alias("word"))
           .groupBy("word").agg(F.count("*").alias("c_w"))).persist()
    vocab = F.broadcast(uni.agg(F.count("*").alias("v")))
    bi = (doc_bi.groupBy("bigram").agg(F.sum("c").alias("c_ab")))
    model = (bi
             .join(uni.withColumnRenamed("word", "_w1"),
                   F.split(F.col("bigram"), " ").getItem(0) == F.col("_w1"))
             .crossJoin(vocab)
             .select("bigram",
                     F.round(F.log((F.col("c_ab") + F.lit(1.0))
                                   / (F.col("c_w") + F.col("v"))) * 1e6)
                     .cast("long").alias("lp_micro")))

    scored = (doc_bi.join(model, "bigram")
              .groupBy("doc_id", "lang")
              .agg(F.sum(F.col("c") * F.col("lp_micro")).alias("s_micro"),
                   F.sum("c").alias("n_bigrams")))
    avg_nll = -(F.col("s_micro").cast("double") / 1e6) / F.col("n_bigrams")
    names = (["head", "middle", "tail"] if n_buckets == 3 else
             ["b%d" % i for i in range(1, n_buckets + 1)])
    name_arr = F.array(*[F.lit(x) for x in names])
    if approx_thresholds:
        # the scale path: per-language quantile boundaries from one
        # sketch agg (|langs| rows), broadcast back — a doc's bucket is
        # 1 + how many boundaries its score exceeds.  No sort, no
        # window; ties at a boundary fall to the lower bucket.
        scored = scored.withColumn("_nll", avg_nll)
        probs = [i / n_buckets for i in range(1, n_buckets)]
        thr = F.broadcast(scored.groupBy("lang").agg(
            F.percentile_approx("_nll", probs, 10_000).alias("_thr")))
        bucket = F.element_at(
            name_arr,
            (F.lit(1) + F.size(F.filter(
                "_thr", lambda t: t < F.col("_nll")))).cast("int"))
        out = (scored.join(thr, "lang")
               .select("doc_id", "lang", "n_bigrams",
                       F.col("_nll").alias("avg_nll"),
                       F.round(F.exp("_nll"), 4).alias("ppl"),
                       bucket.alias("bucket")))
        return _unpersist_on_gc(out, [doc_bi, uni])
    win = Window.partitionBy("lang").orderBy(avg_nll.asc(),
                                             F.col("doc_id").asc())
    bucket = F.element_at(name_arr, F.ntile(n_buckets).over(win))
    # avg_nll is emitted UNROUNDED: micro-nat sums divided by small
    # bigram counts land exactly on 1e-6 decimal midpoints, where
    # Spark's string-based HALF_UP round and a binary-value round (e.g.
    # DuckDB's) disagree by one grid step.  The raw double is the same
    # bits in every engine (two correctly-rounded divisions in a fixed
    # order), so it is the *more* reproducible spelling.
    out = scored.select(
        "doc_id", "lang", "n_bigrams",
        avg_nll.alias("avg_nll"),
        F.round(F.exp(avg_nll), 4).alias("ppl"),
        bucket.alias("bucket"))
    return _unpersist_on_gc(out, [doc_bi, uni])


def fingerprints(docs: DataFrame, shingle_chars: int = 16) -> DataFrame:
    """Rolling-hash document fingerprint: min/max md5 over char shingles.

    The (min, max) pair over all ``shingle_chars``-grams is a cheap,
    order-independent sketch usable for containment checks.
    """
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - shingle_chars, F.lit(0)))
    hashes = F.transform(
        starts,
        lambda i: F.md5(F.col("text").substr(i + 1, F.lit(shingle_chars))))
    return docs.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
    )


def remove_boilerplate_lines(docs: DataFrame, min_docs: int = 60,
                             text_col: str = "text") -> DataFrame:
    """CCNet-style line-level boilerplate removal.

    A line that appears in at least ``min_docs`` DISTINCT documents is
    boilerplate (cookie banners, footers, nav chrome — the dominant
    noise in crawled corpora) and is stripped from every document;
    document order of the surviving lines is preserved exactly.

    Scale shape: one posexplode projection (no Python), one
    map-side-combined count-distinct per line, and ONE reassembly
    groupBy — the hot-line set is bounded by the amount of true
    boilerplate (tiny relative to the corpus), so it broadcasts into a
    left-anti join rather than shuffling the lines again.  At 10^10
    docs you would count over md5(line) first (8× slimmer shuffle keys)
    and resolve the hot hashes back to strings before the anti-join;
    the raw-string form here keeps the operator bit-exact against the
    SQL oracle.

    Returns (doc_id, text_clean, n_lines_kept) — one row per input
    document, ``text_clean = ''``/``n_lines_kept = 0`` when every line
    was boilerplate.
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "line"))
    hot = (lines.groupBy("line")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .where(F.col("nd") >= min_docs)
           .select("line"))
    kept = lines.join(F.broadcast(hot), "line", "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("pos", "line"))),
                            lambda s: s["line"]),
                        "\n").alias("text_clean"),
                    F.count("*").alias("n_lines_kept")))
    return (docs.select("doc_id").join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                    F.coalesce("n_lines_kept", F.lit(0))
                    .cast("long").alias("n_lines_kept")))


def quality_classifier(docs: DataFrame, n_buckets: int = 1024,
                       text_col: str = "text",
                       passthrough: tuple = ()) -> DataFrame:
    """Hashed bag-of-words linear quality classifier (fastText shape).

    The CCNet/GPT-3-style quality filter is a linear classifier over
    hashed token features: each token is hashed into one of
    ``n_buckets`` feature buckets and the document score is the mean
    bucket weight.  Here the weight table itself is derived
    deterministically from the bucket id (a 48-bit md5 slice mapped to
    the integer grid [-1000, 1000]) so both engines — and the DuckDB
    oracle — materialize the SAME model without shipping one: the
    point under test is the feature-hashing plumbing, not the weights.

    Plan shape: token hashing, bucket lookup and the weight sum all
    run inside ONE higher-order ``aggregate`` over the split-array —
    a single JVM Project over a pruned (doc_id, text) scan, no
    explode, no shuffle, no Python.  At 100 TB the classifier is a
    map-only pass; the weight table of a real model would ride along
    as a broadcast literal array exactly like the derived one here.

    Integer-exact: the raw score is a BIGINT sum of integer weights
    and the exposed ``score`` is that sum put on the integer micro
    grid (``raw_score·1000 div n_tokens``, truncation toward zero —
    identical semantics in Spark ``div`` and DuckDB ``//``) divided by
    1e6.  No round-to-nearest anywhere: a ``round(x, 6)`` on an IEEE
    quotient has half-way ties that Spark and DuckDB break
    differently (observed at sf0.01: -0.0640625 → -0.064063 vs
    -0.064062), while the micro grid is bit-identical at every scale.
    This is also the exact per-document grid :func:`host_quality`
    aggregates, so the two operators compose without re-rounding.

    Returns (doc_id, n_tokens, raw_score, score, keep).
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")

    def _w(tok):
        bucket = F.pmod(
            F.conv(F.substring(F.md5(tok), 1, 12), 16, 10).cast("long"),
            F.lit(n_buckets))
        return (F.pmod(
            F.conv(F.substring(
                F.md5(F.concat(F.lit("w:"), bucket.cast("string"))),
                1, 12), 16, 10).cast("long"),
            F.lit(2001)) - F.lit(1000))

    raw = F.aggregate(words, F.lit(0).cast("long"),
                      lambda acc, tok: acc + _w(tok))
    n = F.size(words)
    return (docs.select(
                "doc_id", *passthrough,
                n.cast("long").alias("n_tokens"),
                raw.alias("raw_score"))
            .select(
                "doc_id", *passthrough, "n_tokens", "raw_score",
                (F.expr("raw_score * 1000 div n_tokens")
                 .cast("double") / F.lit(1000000.0)).alias("score"),
                (F.col("raw_score") >= 0).alias("keep")))


def c4_filters(docs: DataFrame, min_words_per_line: int = 5,
               min_sentences: int = 3,
               text_col: str = "text") -> DataFrame:
    """The C4 cleaning battery (Raffel et al., "Exploring the Limits
    of Transfer Learning with a Unified Text-to-Text Transformer",
    JMLR 2020, §2.2) — the other canonical web-corpus filter stack
    next to Gopher's (:func:`repetition_stats`):

    * keep only lines that end in terminal punctuation,
    * drop lines with fewer than ``min_words_per_line`` words,
    * drop any page containing "lorem ipsum" placeholder text,
    * drop any page containing a curly brace (code, not prose),
    * drop pages left with fewer than ``min_sentences`` sentences
      (counted as terminal-punctuation marks in the cleaned text).

    Everything is one JVM Project over a pruned (doc_id, text) scan:
    the line split, the per-line word/punctuation tests and the
    rejoin all run inside higher-order array functions — no explode,
    no shuffle, no Python — so at 100 TB the battery rides the ingest
    scan exactly like :func:`quality_classifier`.

    Returns (doc_id, n_lines, n_lines_kept, n_sentences, has_lorem,
    has_brace, keep, text_clean); downstream filters on ``keep`` and
    carries ``text_clean`` forward.
    """
    lines = F.split(F.col(text_col), "\n")

    def _good(l):
        t = F.trim(l)
        return ((F.size(F.split(t, r"\s+")) >= min_words_per_line)
                & t.rlike('[.!?"]$'))

    kept = F.filter(lines, _good)
    clean = F.array_join(kept, "\n")
    n_sent = F.length(F.regexp_replace(clean, r"[^.!?]", ""))
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sent.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        ((F.size(kept) >= 1) & (n_sent >= min_sentences)
         & ~has_lorem & ~has_brace).alias("keep"),
        clean.alias("text_clean"))


# UTF-8-decoded-as-Latin-1 signatures: the high-frequency mojibake
# digraphs (é → Ã©, ’ → â€™, « → Â«, …).  Literal alternation, no
# regex classes, so Java regex and RE2 read it identically.
MOJIBAKE_PATTERN = "Ã©|Ã¨|Ã¤|Ã¶|Ã¼|Ã±|â€™|â€œ|Â«|Â»"
_CONTROL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def encoding_gate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-damage gate: U+FFFD, control chars, mojibake digraphs.

    Web text arrives through charset guessing, and the failures leave
    three fingerprints: U+FFFD replacement characters (a decoder gave
    up), C0/C1 control characters (binary junk or wrong codepage), and
    mojibake digraphs (UTF-8 bytes decoded as Latin-1 — ``é``
    becoming ``Ã©``).  Damaged documents poison tokenizers (every
    mojibake digraph fragments into rare tokens), so every production
    corpus pipeline gates on them before training.

    All three counters are JVM ``regexp_count`` calls over patterns
    spelled for Java-regex == RE2 parity (literal alternations and
    explicit ``\\x`` ranges, no ``\\p`` classes) — one shuffle-free
    Project, same 100 TB shape as :func:`c4_filters`.  The gate is
    strict (keep = all three counters zero): repair is a separate
    concern (ftfy-style fixers are transcoders, not filters) and at
    corpus scale dropping the damaged tail is the standard call.

    Returns (doc_id, n_chars, n_replacement, n_control, n_mojibake,
    keep).
    """
    t = F.col(text_col)
    n_repl = F.regexp_count(t, F.lit("�"))
    n_ctrl = F.regexp_count(t, F.lit(_CONTROL_PATTERN))
    n_moji = F.regexp_count(t, F.lit(MOJIBAKE_PATTERN))
    return docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        n_repl.cast("long").alias("n_replacement"),
        n_ctrl.cast("long").alias("n_control"),
        n_moji.cast("long").alias("n_mojibake"),
        ((n_repl == 0) & (n_ctrl == 0) & (n_moji == 0)).alias("keep"))


def host_quality(docs: DataFrame, host_col: str = "host",
                 n_buckets: int = 1024) -> DataFrame:
    """Host-level quality rollup of :func:`quality_classifier` — the
    table that closes the curation→scheduler loop.

    A crawl spends its budget per HOST, not per document, so the
    per-document classifier only steers the frontier once it is rolled
    up: hosts whose documents consistently score low get demoted a
    tier (or dropped), hosts that score high earn deeper crawls.  This
    is the "quality" half of the composite score ``url_crawl_tiers``
    multiplies with PageRank authority.

    Exactness discipline: each document's normalized score is put on
    an integer micro grid FIRST (``raw_score·1000 div n_tokens`` —
    exact per row), so the host aggregate is a BIGINT sum and the
    rollup is independent of partitioning and summation order; the
    host mean is one floor division at the end.  One shuffle, keyed by
    host, with map-side partials; output is host-cardinality.

    Returns (host, n_docs, n_keep, keep_rate_micro, mean_score_micro).
    """
    # classifier columns recomputed inline (same expressions as
    # quality_classifier) so host rides the SAME scan — no self-join
    scored = quality_classifier(
        docs.select("doc_id", host_col, "text"), n_buckets=n_buckets,
        passthrough=(host_col,))
    micro = F.expr("raw_score * 1000 div n_tokens")
    return (scored
            .groupBy(host_col)
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col("keep").cast("long")).alias("n_keep"),
                 F.sum(micro).alias("_sum_micro"))
            .select(F.col(host_col).alias("host"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_keep").cast("long").alias("n_keep"),
                    F.expr("n_keep * 1000000 div n_docs")
                    .alias("keep_rate_micro"),
                    F.expr("_sum_micro div n_docs")
                    .alias("mean_score_micro")))
