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
    terms = sorted(set(t.lower() for t in terms))
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("_toks"))
    stats = F.broadcast(
        toks.select(F.size("_toks").alias("dl"))
        .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")))
    # dl rides the explode as a grouping key (it is functionally
    # dependent on doc_id, so the extra key is free) — one tokenize
    # pass feeds tf AND length normalization; no corpus-side join back
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
