"""Byte-pair-encoding tokenizer training and application, Spark-first.

The corpus operators so far estimate token counts with a length
heuristic; this module learns an actual BPE merge table from the
corpus (Sennrich et al. 2016, the algorithm under GPT-2/RoBERTa-class
tokenizers) and applies it — the two halves of the tokenizer step an
LLM data pipeline runs between cleaning and packing.

Representation is the classic spaced-symbol string: a word is
``' c h a r s '`` and applying merge ``(a, b) → ab`` is the literal
string replacement ``' a b ' → ' ab '`` (left-to-right,
non-overlapping — Java and DuckDB ``replace`` share these semantics
exactly, which is what makes the whole trainer replayable as SQL).
Everything is JVM-side string/array algebra: NO Python in either the
trainer's hot path or the encoder.

Scale shape:

* the trainer aggregates the corpus ONCE into a word-frequency vocab
  (one shuffle, output bounded by |vocab|, with map-side partials);
  each merge iteration is then pair-explode + groupBy over the VOCAB
  (vocabulary-sized, not corpus-sized) and one driver-side top-1
  collect — the same bounded-collect iterative-trainer pattern as the
  k-means IVF trainer, k rows total;
* the encoder is a shuffle-free chain of k literal replaces riding
  whatever scan reads the text (plus one explode+sum if per-doc
  counts are requested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: tokenizer word pattern — lowercase alpha runs; the trainer and
#: encoder share it, and the oracle replays it verbatim
WORD_RE = r"^[a-z]+$"


def _spaced(word_col):
    """word → ``' c h a r s '`` spaced-symbol string."""
    return F.concat(
        F.lit(" "),
        F.array_join(F.regexp_extract_all(word_col, F.lit(r"(.)"), 1),
                     " "),
        F.lit(" "))


def _adjacent_pairs(spaced_col):
    """All adjacent symbol pairs of a spaced string, as ``'a b'``."""
    sym = F.split(F.trim(spaced_col), " ")
    idx = F.when(F.size(sym) >= 2,
                 F.sequence(F.lit(1), F.size(sym) - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat(F.element_at(sym, i), F.lit(" "),
                                F.element_at(sym, i + 1)))


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus aggregated once: (word, freq, spaced symbols)."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
        .alias("w"))
    return (words.where(F.col("w").rlike(WORD_RE))
            .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
            .withColumn("sp", _spaced(F.col("w"))))


def train_bpe(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> list:
    """Learn ``n_merges`` BPE merges from the corpus.

    Greedy loop: count adjacent symbol pairs over the vocabulary
    (frequency-weighted), take the most frequent (ties broken by the
    pair string ascending — a total order, so the learned table is
    deterministic under any partitioning), apply it to the vocab,
    repeat.  Each iteration's shuffle is vocabulary-sized; the single
    merge row is the only thing collected.

    Returns ``[(iteration, pair, merged, pair_count), ...]``.
    """
    vocab = word_vocab(docs, text_col).select("freq", "sp")
    vocab = vocab.localCheckpoint(eager=True)  # cut corpus lineage
    merges = []
    for it in range(n_merges):
        top = (vocab
               .select(F.explode(_adjacent_pairs(F.col("sp")))
                       .alias("pair"), "freq")
               .groupBy("pair").agg(F.sum("freq").alias("cnt"))
               .orderBy(F.desc("cnt"), F.asc("pair"))
               .limit(1).collect())
        if not top or top[0]["cnt"] <= 1:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        merged = pair.replace(" ", "")
        merges.append((it, pair, merged, cnt))
        vocab = vocab.withColumn(
            "sp", F.replace(F.col("sp"),
                            F.lit(" %s " % pair),
                            F.lit(" %s " % merged)))
        # k localCheckpoints keep each iteration's plan one replace
        # deep instead of accumulating k nested replaces over the scan
        vocab = vocab.localCheckpoint(eager=True)
    return merges


def encode_tokens(docs: DataFrame, merges: list,
                  text_col: str = "text",
                  doc_col: str = "doc_id") -> DataFrame:
    """Per-document BPE token counts under a learned merge table.

    The merge chain is k literal replaces on the spaced-symbol string
    — shuffle-free, riding the text scan; the per-doc count is one
    explode-free aggregate over the word array (token count of a word
    = symbols remaining = spaces in the spaced string minus one).
    Out-of-vocabulary characters and non-alpha words count 1 token
    each (the unknown-token convention, shared with the oracle).

    Returns (doc_col, n_words, n_bpe_tokens).
    """
    words = F.split(F.lower(F.col(text_col)), r"\s+")

    def word_tokens(w):
        sp = _spaced(w)
        for _, pair, merged, _ in merges:
            sp = F.replace(sp, F.lit(" %s " % pair),
                           F.lit(" %s " % merged))
        return F.when(w.rlike(WORD_RE),
                      F.size(F.split(F.trim(sp), " "))) \
            .otherwise(F.lit(1))

    counts = F.aggregate(
        F.filter(words, lambda w: w != ""),
        F.struct(F.lit(0).cast("long").alias("n"),
                 F.lit(0).cast("long").alias("t")),
        lambda acc, w: F.struct(
            (acc["n"] + 1).alias("n"),
            (acc["t"] + word_tokens(w).cast("long")).alias("t")))
    return docs.select(
        F.col(doc_col),
        counts["n"].alias("n_words"),
        counts["t"].alias("n_bpe_tokens"))
