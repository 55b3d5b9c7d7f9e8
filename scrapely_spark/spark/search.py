"""Ranked full-text retrieval over the documents table.

The query side of a training-data pipeline: given terms, return the
best-matching documents.  BM25 (Robertson & Zaragoza, "The
Probabilistic Relevance Framework: BM25 and Beyond", 2009) is the
standard lexical ranking function:

    score(D, Q) = Σ_{t∈Q} idf(t) · tf(t,D)·(k1+1)
                              / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    idf(t) = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

Tokenization is the corpus-wide convention shared with the dedup
shingles: lowercase, split on whitespace — so BM25, MinHash and the
token stats all agree on what a term is.

Scale shape: the explode is filtered to the query's terms BEFORE any
shuffle (Catalyst pushes ``term IN (...)`` into the generator's
output, so non-query tokens never leave the scan stage); the per-term
document frequencies are a |Q|-row aggregate joined back as a
broadcast; corpus stats (N, avgdl) are a 1-row broadcast cross join.
The only real shuffle carries (doc_id, term) counts for matching docs
only, and the final top-k is a TakeOrderedAndProject — no global sort.
Scores are rounded BEFORE ranking so the top-k cut is reproducible
across engines and summation orders (ties broken by doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ROUND = 6


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` documents for ``terms``: (doc_id, score).

    ``terms`` are deduplicated; per BM25 each distinct query term
    contributes once.  Documents matching no term are not returned.
    """
    from scrapely_spark.spark.corpus import _words

    terms = sorted(set(t.lower() for t in terms))
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = docs.select("doc_id", _words().alias("_toks"))
    stats = F.broadcast(
        toks.select(F.size("_toks").alias("dl"))
        .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")))
    # dl rides the explode as a grouping key (it is functionally
    # dependent on doc_id, so the extra key is free) — one tokenize
    # pass feeds tf AND length normalization; no corpus-side join back
    # tf feeds BOTH the df broadcast and the scored join; the lineage
    # therefore runs twice, and that is the MEASURED-faster choice: a
    # cache here forces full materialization before the broadcast
    # build can start, serializing stages that otherwise overlap
    # (A/B at sf0.1: cached 1.5s vs uncached 0.83s warm).  Contrast
    # tfidf_keywords, whose reused frame is corpus-sized per-doc
    # counts — there the cache wins and is kept.
    tf = (toks.select("doc_id", F.size("_toks").alias("dl"),
                      F.explode("_toks").alias("term"))
          .where(F.col("term").isin(terms))
          .groupBy("doc_id", "dl", "term")
          .agg(F.count("*").alias("tf")))
    df_t = F.broadcast(
        tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df")))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
        / (F.col("df") + 0.5))
    part = (idf * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf")
               + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
    scored = (tf.join(df_t, "term")
              .crossJoin(stats)
              .groupBy("doc_id")
              .agg(F.round(F.sum(part), _ROUND).alias("score")))
    return (scored
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "score"))


def tfidf_keywords(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-``k`` keywords by tf·idf (idf = ln(N/df)).

    The document side of lexical relevance (bm25_topk is the query
    side): the terms that most distinguish each document from the
    corpus — the standard cheap topic signal for corpus exploration
    and mixing decisions.

    Scale shape: ONE tokenize+explode feeds both aggregates — document
    frequency is derived from the already-deduplicated (doc_id, term)
    counts, not a second pass over raw tokens; tf is eagerly
    materialized so its two consumers (the join side and the df
    aggregate) share one physical computation (exchange reuse alone
    does not fire across the broadcast boundary — verified on the
    executed plan).  The df join is left to AQE
    deliberately: at bench scale the aggregated vocabulary is small and
    AQE plans it as the broadcast build side (verified on the executed
    plan); at web scale a whitespace-token vocabulary can be billions
    of rows, where a forced broadcast would be wrong and the shuffled
    hash join on the already-aggregated (doc, term) counts is the
    honest cost.  N is a 1-row broadcast; the final
    cut is one row_number window per doc over scores rounded BEFORE
    ranking (ties by term), so the cut is reproducible across engines
    and summation orders.
    """
    from scrapely_spark.spark.corpus import _words
    from scrapely_spark.spark.dedup import _spread

    # widen a single-split scan before the corpus tokenize (guide
    # §2.5), and materialize tf EAGERLY: a lazy .cache() here lost the
    # race between its two consumers under concurrent AQE stage jobs
    # and was vulnerable to CacheManager's structural-match unpersist
    # (see dedup.jaccard_pairs) — the checkpointed table is the
    # aggregated (doc, term) counts, vocabulary-sized
    toks = (_spread(docs.select("doc_id", "text"))
            .select("doc_id", F.explode(_words()).alias("term")))
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count("*").alias("tf")).localCheckpoint(eager=True))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = F.broadcast(docs.agg(F.count("*").alias("n_docs")))
    scored = (tf.join(dfreq, "term").crossJoin(n_docs)
              .select("doc_id", "term",
                      F.round(F.col("tf")
                              * F.log(F.col("n_docs") / F.col("df")),
                              _ROUND).alias("score")))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("doc_id", "term", "score", "rank"))


# the classic generic-anchor stoplist: anchors that describe the ACT
# of linking, not the target, carry no relevance signal (Brin & Page
# 1998 §2.2 aggregate anchor text into the target's index entry;
# generic anchors are the noise term every production system drops)
GENERIC_ANCHORS = ("click here", "here", "read more", "more", "link",
                   "this", "next", "previous", "home")


def anchor_text_profile(links: DataFrame, k: int = 3,
                        src_col: str = "src", dst_col: str = "dst",
                        anchor_col: str = "anchor") -> DataFrame:
    """Per-target anchor-text profile: top-k anchors by distinct
    linking pages.

    Anchor text is the strongest off-page relevance signal a crawl
    produces — the web describing each page in other authors' words —
    and feeds both ranked retrieval (index-time field) and crawl
    prioritization (targets accumulating diverse anchors are worth
    fetching sooner).  Weighting by DISTINCT linking pages rather than
    raw edge count is the standard spam resistance: a link farm
    repeating one anchor a million times from one page counts once.

    Semantics: anchors are normalized (trim, lower, interior
    whitespace collapsed), empties and the generic stoplist dropped;
    per (dst, anchor) the weight is ``count(distinct src)``; the top-k
    per dst are ranked by (n_sources desc, anchor asc) so the cut is
    deterministic.

    Scale shape (plan-audited): three exchanges over strictly
    shrinking data — dedup shuffles by (src, dst, anchor) with
    map-side partials, the count shuffles the already-deduped pairs by
    (dst, anchor) — never by dst alone, so a hot target (every
    homepage) spreads across its anchor vocabulary instead of
    hot-spotting one reducer — and only the per-(dst, anchor) counts
    (one row per distinct pair) reach the per-dst window, where the
    rank cut keeps k rows per target.  No all-pairs anywhere.
    """
    from pyspark.sql import Window

    norm = F.regexp_replace(
        F.trim(F.lower(F.col(anchor_col))), r"\s+", " ")
    cleaned = (links
               .select(F.col(src_col).alias("src"),
                       F.col(dst_col).alias("dst"),
                       norm.alias("anchor"))
               .where((F.col("anchor") != "")
                      & ~F.col("anchor").isin(*GENERIC_ANCHORS)))
    counts = (cleaned.distinct()
              .groupBy("dst", "anchor")
              .agg(F.count("*").alias("n_sources")))
    w = Window.partitionBy("dst").orderBy(
        F.desc("n_sources"), F.asc("anchor"))
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("dst", "anchor",
                    F.col("n_sources").cast("long").alias("n_sources"),
                    F.col("rank").cast("int").alias("rank")))
