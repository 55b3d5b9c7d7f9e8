"""Training-corpus assembly operators over a documents table.

The step after filtering/dedup in an LLM data pipeline: turn a cleaned
document set into model-ready training shards.  Four families:

* **sequence packing** — ``pack_chunks`` (GPT-style concat-and-chunk:
  documents are laid end to end per shard and split every ``seq_len``
  tokens; pure window cumsum, whole-stage codegen, zero Python) and
  ``pack_greedy`` (first-fit-sequential: a pack closes when the next
  document would overflow ``max_tokens``; inherently a sequential scan
  per shard, so it runs as ``applyInPandas`` with an O(#packs·log n)
  ``searchsorted`` boundary kernel, never a per-row Python loop).
* **contamination check** — distinct word n-gram overlap of a held-out
  test split against the train split, with a train-side document-
  frequency cap so ubiquitous n-grams ("of the and") neither count as
  contamination nor blow up the join (the hot-key guard every self/cross
  join in this repo carries).
* **stratified sampling** — deterministic per-language keep/drop from
  ``md5(doc_id:seed)``: reproducible across engines and runs, no RNG
  state, rebalances a multilingual corpus to target rates.
* **weighted sampling** — ``weighted_sample``: Efraimidis–Spirakis
  exponential-tickets sampling WITHOUT replacement (quality-weighted
  training mixes), on the same deterministic md5 randomness.
* **corpus statistics** — occurrence-counted top-k n-grams (map-side
  partial agg + TakeOrderedAndProject) and exact per-language token
  length quantiles (at 100 TB swap ``percentile`` for
  ``approx_percentile`` — same call shape, sketch-mergeable).

Scale notes: packing shards are independent (``doc_id % n_shards``), so
the sequential scan parallelizes embarrassingly; contamination joins on
the n-gram after the df-cap, bounding any build side; sampling and
stats are single-pass aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from scrapely_spark.spark.dedup import _unpersist_on_gc

# drop n-grams present in more than this many train documents before the
# contamination join: they are boilerplate, not leakage, and each one
# would contribute O(df) join rows per test occurrence
MAX_NGRAM_DF = 100


def _words(col: str = "text"):
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


def _ngrams(words, n: int):
    """All n-word shingles (space-joined) of an already-split column."""
    starts = F.sequence(F.lit(0), F.size(words) - n)
    return F.when(F.size(words) >= n, F.transform(
        starts, lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + k + 1) for k in range(n)])))


def pack_chunks(docs: DataFrame, seq_len: int = 256,
                n_shards: int = 8) -> DataFrame:
    """Concat-and-chunk packing: global token offsets per shard.

    Documents are ordered by ``doc_id`` inside ``doc_id % n_shards``
    shards, laid end to end, and cut every ``seq_len`` tokens (documents
    may straddle a cut — the GPT pretraining layout).  Emits per
    document its shard, starting token offset, and the first/last
    sequence index it lands in.  One window cumsum per shard; no Python.
    """
    shard = (F.col("doc_id") % n_shards).alias("shard")
    # NULL text carries 0 tokens (explicit contract — a NULL n_tokens
    # would silently poison the window cumsum for every later doc in
    # the shard)
    tok = F.coalesce(F.size(_words()), F.lit(0))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    base = docs.select("doc_id", shard, tok.alias("n_tokens"))
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (base
            .select("doc_id", "shard", "n_tokens",
                    start.alias("start_off"))
            .select("doc_id", "shard", "n_tokens", "start_off",
                    F.floor(F.col("start_off") / seq_len)
                    .cast("long").alias("begin_seq"),
                    F.floor((F.col("start_off") + F.col("n_tokens") - 1)
                            / seq_len).cast("long").alias("end_seq")))


def pack_greedy(docs: DataFrame, max_tokens: int = 256,
                n_shards: int = 8, reuse_cols: bool = True) -> DataFrame:
    """First-fit-sequential packing: a pack never exceeds ``max_tokens``.

    Scanning each shard in ``doc_id`` order, a document joins the open
    pack iff the pack total stays ≤ ``max_tokens``; otherwise it opens
    the next pack (an oversized document therefore sits alone).  The
    scan is sequential by definition, so the kernel loops over *pack
    boundaries* (``np.searchsorted`` on the token cumsum — O(#packs ·
    log n) per shard), not rows, inside ``applyInPandas``; shards run in
    parallel.  DuckDB oracle: per-shard recursive CTE (one row per
    step) — same rule, engine-independent.

    Skew: a hot shard serializes its own scan but stays O(shard) — the
    boundary kernel does one cumsum plus one binary search per *pack*,
    so a shard 100× the others costs ~100× the (tiny) kernel time, not
    100× a per-row Python loop (pinned by
    test_corpus.test_pack_greedy_hot_shard_skew).  ``n_shards`` is the
    parallelism/packing-granularity knob: raise it for skewed corpora
    so the hottest ``doc_id % n_shards`` residue class shrinks; packs
    never span shards, so more shards only adds ≤ 1 underfull trailing
    pack per shard.
    """
    import numpy as np
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        cs = pdf["n_tokens"].to_numpy(dtype="int64").cumsum()
        n = len(cs)
        pack = np.zeros(n, dtype="int64")
        start, pid = 0, 0
        while start < n:
            base = cs[start - 1] if start else 0
            nxt = int(np.searchsorted(cs, base + max_tokens, side="right"))
            nxt = max(nxt, start + 1)  # oversized doc: alone in its pack
            pack[start:nxt] = pid
            start, pid = nxt, pid + 1
        pdf["pack_id"] = pack
        return pdf

    # reuse_cols: an upstream stage's n_tokens column is reused instead
    # of re-tokenizing (the carried-column contract shared with
    # mixing_rates/temperature_rates).  Pass reuse_cols=False when the
    # input happens to carry an unrelated n_tokens column — reuse is an
    # explicit opt-out, not an unavoidable magic-name inference.
    tok_col = (F.col("n_tokens").cast("int")
               if reuse_cols and "n_tokens" in docs.columns
               else F.size(_words()))
    # NULL-safe (same contract as pack_chunks): a NULL count would
    # reach the pandas kernel as NaN and crash the shard's task with
    # an opaque 'cannot convert non-finite values' error
    base = docs.select(
        "doc_id", (F.col("doc_id") % n_shards).alias("shard"),
        F.coalesce(tok_col, F.lit(0)).alias("n_tokens"))
    return (base.groupBy("shard")
            .applyInPandas(kernel,
                           "doc_id long, shard long, n_tokens int, "
                           "pack_id long")
            .select("doc_id", "shard", "pack_id", "n_tokens"))


def contamination(docs: DataFrame, n: int = 3, test_mod: int = 29,
                  max_df: int = MAX_NGRAM_DF) -> DataFrame:
    """Test-split n-gram overlap against the train split.

    The held-out split is ``doc_id % test_mod == 0`` (deterministic, no
    stored split table needed).  For each test document: how many train
    documents share a distinct word ``n``-gram with it, how many of its
    distinct n-grams appear anywhere in train, and that count as a
    fraction of its n-gram vocabulary.  Train n-grams with document
    frequency > ``max_df`` are dropped before the join (boilerplate
    phrases are not leakage and would each fan out O(df) rows).

    EVERY test document gets a row — one with fewer than ``n`` words
    has no n-grams and reports (0, 0, 0, 0.0) rather than silently
    vanishing, so an auditor can check output cardinality == test
    split cardinality and "not contaminated" never masquerades as
    "not evaluated".
    """
    grams = F.explode(_ngrams(_words(), n)).alias("ngram")
    test_ids = (docs.where(F.col("doc_id") % test_mod == 0)
                .select("doc_id").distinct())
    test = (docs.where(F.col("doc_id") % test_mod == 0)
            .select("doc_id", grams).distinct())
    train_grams = (docs.where(F.col("doc_id") % test_mod != 0)
                   .select("doc_id", grams).distinct())
    # df cap as a window count (the `_cap_buckets` pattern): one lineage,
    # one shuffle on ngram, and the join below reuses that partitioning —
    # a groupBy+join formulation would explode the train side twice
    train = (train_grams
             .withColumn("df", F.count("*").over(
                 Window.partitionBy("ngram")))
             .where(F.col("df") <= max_df)
             .drop("df"))

    test_sizes = test.groupBy("doc_id").agg(
        F.count("*").alias("n_test_ngrams"))
    hits = (test.join(train.withColumnRenamed("doc_id", "train_doc"),
                      "ngram")
            .groupBy("doc_id")
            .agg(F.countDistinct("train_doc").alias("n_train_docs"),
                 F.countDistinct("ngram").alias("n_shared")))
    return (test_ids.join(test_sizes, "doc_id", "left")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_test_ngrams", F.lit(0))
                    .alias("n_test_ngrams"),
                    F.coalesce("n_train_docs", F.lit(0))
                    .alias("n_train_docs"),
                    F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
                    F.coalesce(
                        F.round(F.coalesce("n_shared", F.lit(0))
                                / F.col("n_test_ngrams"), 6),
                        F.lit(0.0))
                    .alias("contamination")))


def _ticket_md5(seed: int):
    """The corpus sampling ticket: ``md5(doc_id:seed)``.

    The ONE spelling of the deterministic randomness both samplers (and
    their DuckDB oracles) rely on — stratified_sample compares its
    first 8 hex chars against a rate threshold, weighted_sample maps
    its first 48 bits into a U(0,1) draw.  Keep the convention here so
    it cannot drift between call sites.
    """
    return F.md5(F.concat(F.col("doc_id").cast("string"),
                          F.lit(":" + str(seed))))


def sample_threshold(rate: float) -> str:
    """8-hex-char keep threshold for ``stratified_sample`` at ``rate``.

    Comparing the first 8 md5 hex chars lexicographically equals
    comparing the top 32 digest bits numerically, so the literal is
    engine-portable (same trick as the MinHash signature slices).
    """
    return format(min(int(rate * 2 ** 32), 2 ** 32 - 1), "08x")


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      seed: int = 0,
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-language downsampling to target keep rates.

    Keeps a document iff ``md5(doc_id || ':' || seed)``'s first 8 hex
    chars fall below the language's rate threshold — a reproducible,
    state-free coin flip that any engine can replay exactly.  Changing
    ``seed`` draws an independent sample; a document's fate never
    depends on partitioning or row order.
    """
    ticket = F.substring(_ticket_md5(seed), 1, 8)

    def _keep(rate: float):
        # rate >= 1.0 keeps EVERY row (same guard as
        # apply_mixing_rates): the clamped 'ffffffff' threshold with a
        # strict < would drop the 2^-32 tickets equal to it
        if rate >= 1.0:
            return F.lit(True)
        return ticket < F.lit(sample_threshold(rate))

    cond = _keep(default_rate)
    for lang, rate in sorted(rates.items()):
        cond = F.when(F.col("lang") == lang, _keep(rate)).otherwise(cond)
    return (docs.where(cond)
            .select("doc_id", "lang", ticket.alias("ticket")))


_TICKET_SPACE = float(2 ** 48)


def weighted_sample(docs: DataFrame, k: int, weight,
                    group_col: str | None = None,
                    seed: int = 0) -> DataFrame:
    """Weighted sampling WITHOUT replacement: ``k`` rows (per group).

    Efraimidis & Spirakis ("Weighted random sampling with a
    reservoir", IPL 2006): draw u ~ U(0,1) per row, keep the k rows
    with the largest u^(1/w) — equivalently the k SMALLEST
    ``-ln(u)/w`` (the exponential-race form used here: each row's key
    is an Exp(w) arrival time, and lighter rows arrive later).
    Inclusion follows the weights exactly; heavier rows win more
    often, and a weight twice as large doubles the arrival rate.

    u is deterministic — ``(md5_48(doc_id:seed) + 0.5) / 2^48``, the
    corpus-wide md5 ticket convention shared with
    :func:`stratified_sample` and the KMV sketch — so the sample is
    reproducible across engines, runs and partitionings; a different
    ``seed`` draws an independent sample.  Rows with NULL or
    non-positive weight are never sampled.

    Scale shape: one projection computes the key; without
    ``group_col`` the cut is a global ``orderBy().limit(k)`` —
    TakeOrderedAndProject, per-partition partial top-k, no global
    sort; with ``group_col`` it is one window rank per group.  Either
    way the full corpus is scanned once and only keys move.
    """
    w = weight if not isinstance(weight, str) else F.col(weight)
    h = (F.conv(F.substring(_ticket_md5(seed), 1, 12), 16, 10)
         .cast("double"))
    u = (h + F.lit(0.5)) / F.lit(_TICKET_SPACE)
    keyed = (docs.withColumn("_w", w.cast("double"))
             .where(F.col("_w") > 0)
             .withColumn("_key", -F.log(u) / F.col("_w")))
    if group_col is None:
        out = keyed.orderBy(F.asc("_key"), F.asc("doc_id")).limit(k)
    else:
        win = Window.partitionBy(group_col).orderBy(
            F.asc("_key"), F.asc("doc_id"))
        out = (keyed.withColumn("_r", F.row_number().over(win))
               .where(F.col("_r") <= k))
    cols = ["doc_id"] + ([group_col] if group_col else [])
    return out.select(*cols, F.col("_w").alias("weight"))


def dsir_weights(docs: DataFrame, target_source: str,
                 n_buckets: int = 256) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023).

    Scores every document by how target-like its hashed unigram
    profile is: features are md5-hashed word buckets (the paper's
    hashed n-grams), the target distribution is estimated from the
    documents of ``target_source``, the raw distribution from the
    whole corpus, both add-one smoothed:

        log w(doc) = Σ_words  ln( p_target(b(word)) / p_raw(b(word)) )

    Selecting the top-weight documents (or Gumbel-resampling on these
    log-weights) is the paper's domain-targeting step.

    Determinism at any partitioning: the per-bucket log-ratio is
    rounded once to integer micro-nats at the model level (``n_buckets``
    rows), and per-document totals are exact integer sums — the same
    integer-micro trick as mixing_rates / lm_perplexity.

    Scale shape: the bucket id is one md5+conv projection (the corpus
    ticket idiom — engine-portable); both distributions are one
    explode+groupBy with map-side combine onto at most ``n_buckets``
    rows; the scoring join hits that tiny table (broadcast) keyed by
    bucket after pre-aggregating each document's bucket counts.
    Nothing grows with corpus size except the two linear passes.
    """
    bucket = (F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10)
              .cast("long") % n_buckets).alias("bucket")
    from scrapely_spark.spark.dedup import _spread
    # widen a single-split scan before the corpus explode + per-token
    # md5 bucketing (guide §2.5; no-op at real scale)
    toks = (_spread(docs.select("doc_id", "source", "text"))
            .select("doc_id", "source",
                    F.explode(_words()).alias("word"))
            # empty/whitespace-only docs yield one '' token from
            # split(): no feature, not a phantom bucket hit
            .where(F.length("word") > 0))
    doc_b = (toks.select("doc_id", "source", bucket)
             .groupBy("doc_id", "source", "bucket")
             .agg(F.count("*").alias("c")))
    raw = doc_b.groupBy("bucket").agg(F.sum("c").alias("c_raw"))
    tgt = (doc_b.where(F.col("source") == target_source)
           .groupBy("bucket").agg(F.sum("c").alias("c_tgt")))
    totals = F.broadcast(
        raw.agg(F.sum("c_raw").alias("n_raw")).crossJoin(
            tgt.agg(F.sum("c_tgt").alias("n_tgt"))))
    model = F.broadcast(
        raw.join(tgt, "bucket", "left").crossJoin(totals)
        .select("bucket", F.round(F.log(
            ((F.coalesce("c_tgt", F.lit(0)) + F.lit(1.0))
             / (F.col("n_tgt") + n_buckets))
            / ((F.col("c_raw") + F.lit(1.0))
               / (F.col("n_raw") + n_buckets))) * 1e6)
            .cast("long").alias("lr_micro")))
    return (doc_b.join(model, "bucket")
            .groupBy("doc_id", "source")
            .agg(F.sum(F.col("c") * F.col("lr_micro")).alias("s_micro"),
                 F.sum("c").alias("n_words"))
            .select("doc_id", "source", "n_words",
                    # log_weight sits ON the 1e-6 grid (integer micro
                    # sum / 1e6), so round(6) is the identity; the
                    # per-word average is emitted UNROUNDED because a
                    # micro-grid value divided by a small word count
                    # lands on decimal midpoints where string-based and
                    # binary-value round() implementations disagree —
                    # the raw double is bit-identical across engines
                    F.round(F.col("s_micro") / 1e6, 6).alias("log_weight"),
                    ((F.col("s_micro").cast("double") / 1e6)
                     / F.col("n_words")).alias("avg_log_ratio")))


def _apply_merge(syms, x: str, y: str):
    """Left-to-right single-pass merge of adjacent (x, y) → x+y over a
    symbol array — the re.sub semantics of the original BPE code
    (non-overlapping, scan order), as one ``aggregate`` fold: the
    accumulator holds the emitted prefix plus one held-back symbol."""
    init = F.struct(F.array().cast("array<string>").alias("out"),
                    F.lit("").alias("prev"))

    def step(acc, s):
        hit = (acc["prev"] == x) & (s == y)
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(F.lit(x + y))))
            .when(acc["prev"] == "", acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["prev"])))
            .alias("out"),
            F.when(hit, F.lit("")).otherwise(s).alias("prev"))

    def finish(acc):
        return F.when(acc["prev"] == "", acc["out"]) \
                .otherwise(F.concat(acc["out"], F.array(acc["prev"])))

    return F.aggregate(syms, init, step, finish)


def bpe_train(docs: DataFrame, n_merges: int = 8,
              max_vocab_words: int = 50_000,
              driver_max_words: int = 200_000) -> "tuple[list, DataFrame]":
    """Byte-pair-encoding merge training (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units").

    The tokenizer-training pass of a pretraining pipeline: the corpus
    is scanned ONCE into a (word, count) table; every merge iteration
    then runs on that bounded vocabulary — explode each word's adjacent
    symbol pairs weighted by word count, pick the most frequent pair
    (ties lexicographic, so training is deterministic under any
    partitioning), and apply it left-to-right to every segmentation.
    Returns ``(merges, vocab)``: the ordered merge list
    ``[(x, y, support), ...]`` and the final segmented vocabulary.

    Scale shape: corpus-sized work is the single word count (map-side
    combined); everything after it touches only the capped vocabulary.
    Like ``dedup.dup_clusters``, the iterations are HYBRID — and here
    the bound needs no probe, because ``limit(max_vocab_words)`` proves
    it by construction:

    * ``max_vocab_words <= driver_max_words`` (default): collect the
      capped ``(word, n)`` table once and run the merge loop driver-side
      — one Spark job total instead of one per merge, the same bounded
      driver action as the union-find fast path.  This is also what
      production tokenizer trainers do: the corpus-sized pass is the
      word count; training itself is vocabulary-sized.
    * larger caps: the in-plan loop — each iteration's pair explode +
      argmax runs on executors and moves ONE row to the driver.

    Both paths are pinned equal to the same pure-Python twin (and to
    each other) by the test suite, on random corpora and under
    repartitioning.  Though the loop is data-dependent in WHICH pair
    each iteration merges, the argmax itself is computable inside a
    query, so a fixed iteration count unrolls to SQL exactly
    (``__spark_entry__._bpe_oracle_sql`` — same trick as the kmeans
    trainer oracle, one replace-based merge stage per iteration).
    """
    from scrapely_spark.spark.dedup import _spread
    # widen a single-split scan before the corpus-sized word explode +
    # map-side partial count (guide §2.5 — otherwise one task does the
    # whole corpus pass; a no-op whenever the scan yields enough splits)
    vocab = (_spread(docs.select("text"))
             .select(F.explode(_words()).alias("word"))
             .where(F.length("word") > 0)
             .groupBy("word").agg(F.count("*").alias("n"))
             .orderBy(F.desc("n"), F.asc("word"))
             .limit(max_vocab_words)
             .select("word", "n",
                     F.transform(
                         F.sequence(F.lit(1), F.length("word")),
                         lambda i: F.col("word").substr(i, F.lit(1)))
                     .alias("syms"))
             .persist())
    if max_vocab_words <= driver_max_words:
        return _bpe_train_driver(docs.sparkSession, vocab, n_merges)
    merges = []
    cached = [vocab]
    for _ in range(n_merges):
        pair_starts = F.when(
            F.size("syms") >= 2,
            F.sequence(F.lit(1), F.size("syms") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = (vocab.select(
            "n", F.explode(F.transform(
                pair_starts,
                lambda i: F.struct(
                    F.element_at("syms", i).alias("x"),
                    F.element_at("syms", i + 1).alias("y"))))
            .alias("p"))
            .groupBy("p.x", "p.y").agg(F.sum("n").alias("support"))
            .orderBy(F.desc("support"), F.asc("x"), F.asc("y"))
            .limit(1).collect())
        if not pairs:
            break
        x, y, support = pairs[0].x, pairs[0].y, int(pairs[0].support)
        merges.append((x, y, support))
        vocab = vocab.select(
            "word", "n", _apply_merge(F.col("syms"), x, y).alias("syms")
        ).persist()
        cached.append(vocab)
    return merges, _unpersist_on_gc(vocab, cached)


def _bpe_train_driver(spark, vocab: DataFrame,
                      n_merges: int) -> "tuple[list, DataFrame]":
    """Driver-side merge loop over the (provably capped) vocabulary.

    Semantics are the in-plan loop's exactly: pair support weighted by
    word count, argmax by (support desc, pair lexicographic), single
    left-to-right non-overlapping merge pass per word (the ``re.sub``
    order of the original BPE code).  Integer arithmetic throughout,
    so the two paths are bit-equal — asserted by the cross-path test.
    """
    rows = [(r["word"], int(r["n"]))
            for r in vocab.select("word", "n").collect()]
    vocab.unpersist()
    weight = dict(rows)
    segs = {w: list(w) for w, _ in rows}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, syms in segs.items():
            nw = weight[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + nw
        if not counts:
            break
        (x, y), support = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((x, y, int(support)))
        for w, syms in segs.items():
            out, prev = [], ""
            for s in syms:
                if prev == x and s == y:
                    out.append(x + y)
                    prev = ""
                else:
                    if prev:
                        out.append(prev)
                    prev = s
            if prev:
                out.append(prev)
            segs[w] = out
    out_df = spark.createDataFrame(
        [(w, weight[w], segs[w]) for w, _ in rows],
        "word string, n long, syms array<string>")
    return merges, out_df


def bpe_merge_table(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """The trained merge list as a DataFrame — ``(rank, x, y, merged,
    support)``; deterministic under any partitioning, so it
    hash-checks against the unrolled SQL oracle."""
    merges, vocab = bpe_train(docs, n_merges)
    spark = docs.sparkSession
    rows = [(r + 1, x, y, x + y, s) for r, (x, y, s) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, x string, y string, merged string, support long")


def unimax_allocation(docs: DataFrame, budget_tokens: int,
                      max_epochs: float = 4.0) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): spend a total token budget as UNIFORMLY as possible
    across sources, subject to no source repeating more than
    ``max_epochs`` epochs — exact water-filling in closed form, no
    iterative loop.

    With caps ``c_i = n_tokens_i · max_epochs`` sorted ascending and
    prefix sums ``P_k``, the water level is
    ``L = max_k (B − P_{k−1}) / (N − k + 1)`` (the max-form of the
    capped-simplex projection: every candidate under-estimates the true
    level except the one whose capped set is exactly right), and each
    source takes ``alloc_i = min(c_i, L)``.  When ``B ≥ Σ c_i`` the
    last candidate already exceeds ``c_N``, so every source is fully
    capped — no special case.  Emits ``(source, n_tokens,
    alloc_tokens, epochs)``.

    Determinism: counts, caps and prefix sums live on the integer
    micro-token grid; the two divisions (level candidates, epochs) are
    single correctly-rounded IEEE ops the oracle performs in the same
    order, so the doubles hash exactly.  (Past ~2^53 micro-tokens per
    source the long→double cast would round; at that point switch the
    grid to whole tokens.)

    Scale shape: one corpus scan → groupBy(source) with map-side
    combine; everything after runs on the source table (tens to
    thousands of rows — the global windows are vocabulary-sized, the
    same bounded-small-table discipline as the mixing allocator).
    """
    eps_micro = int(round(max_epochs * 1e6))
    b_micro = int(budget_tokens) * 1_000_000
    per = (docs.select("source", F.size(_words()).alias("t"))
           .groupBy("source").agg(F.sum("t").alias("n_tokens")))
    caps = per.select(
        "source", "n_tokens",
        (F.col("n_tokens") * F.lit(eps_micro)).alias("cap_micro"))
    w = Window.orderBy(F.asc("cap_micro"), F.asc("source"))
    everything = Window.partitionBy()
    pre = F.coalesce(
        F.sum("cap_micro").over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"))
    i = F.row_number().over(w)
    n = F.count("*").over(everything)
    cand = ((F.lit(b_micro) - pre).cast("double")
            / (n - i + 1).cast("double"))
    staged = caps.select("source", "n_tokens", "cap_micro",
                         cand.alias("_cand"))
    alloc_micro = F.least(F.col("cap_micro").cast("double"),
                          F.max("_cand").over(everything))
    return (staged
            .select("source", "n_tokens",
                    (alloc_micro / F.lit(1e6)).alias("alloc_tokens"))
            .withColumn("epochs",
                        F.col("alloc_tokens")
                        / F.col("n_tokens").cast("double")))


def global_shuffle(docs: DataFrame, n_shards: int = 64,
                   seed: int = 0) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the training
    export primitive: a reproducible epoch order over the whole corpus,
    written as ``n_shards`` independently readable shards.

    Every doc draws the corpus-wide md5 ticket (:func:`_ticket_md5`,
    shared with both samplers and their oracles); ``shard`` is the
    ticket's first 60 bits mod ``n_shards`` and ``pos`` is the ticket
    order within the shard (ties by doc_id — total order, so the
    output is bit-stable across engines, runs and partitionings).
    Reading shards ``0..n-1`` in ``pos`` order replays one global
    permutation; a different ``seed`` draws an independent epoch.

    Scale shape: ONE shuffle, keyed by shard.  md5 uniformity makes
    shard sizes binomial(N, 1/n_shards) — skew-free by construction —
    and at 10^10 docs you raise ``n_shards`` (100k+) so each window
    sorts ~10^5 rows; no global sort, no driver involvement, only
    (doc_id, ticket) ever moves.
    """
    t = _ticket_md5(seed)
    keyed = docs.select(
        "doc_id",
        t.alias("_ticket"),
        (F.conv(F.substring(t, 1, 15), 16, 10).cast("long")
         % n_shards).cast("int").alias("shard"))
    win = Window.partitionBy("shard").orderBy(
        F.asc("_ticket"), F.asc("doc_id"))
    return keyed.select(
        "doc_id", "shard",
        F.row_number().over(win).cast("int").alias("pos"))


def bpe_tokenize_counts(docs: DataFrame, n_merges: int = 8,
                        max_vocab_words: int = 50_000) -> DataFrame:
    """Apply the trained BPE segmentation back to the corpus: per-doc
    token counts under the learned merges — the train→apply loop of a
    tokenizer pipeline, and the unit every packing / budget / mixing
    operator downstream actually wants (true subword tokens, not the
    whitespace proxy).

    Emits ``(doc_id, n_words, bpe_tokens)``.  A word outside the capped
    training vocabulary falls back to character-level tokens (its
    untrained symbol count), so the count is total and deterministic.

    Scale shape: ``bpe_train`` is vocabulary-sized after its one corpus
    scan; application is a BROADCAST join of the capped ``(word,
    size(syms))`` table onto the exploded corpus — no shuffle enters
    until the final ``groupBy(doc_id)``, whose integer sums combine
    map-side.  One corpus-sized shuffle total, keyed by doc_id (unique,
    skew-free).
    """
    from scrapely_spark.spark.dedup import _spread
    _, vocab = bpe_train(docs, n_merges, max_vocab_words)
    seg = vocab.select("word", F.size("syms").alias("n_syms"))
    # widen a single-split scan before the corpus-sized apply explode
    # (guide §2.5; no-op at real scale)
    words = (_spread(docs.select("doc_id", "text"))
             .select("doc_id", F.explode(_words()).alias("word"))
             .where(F.length("word") > 0))
    return (words.join(F.broadcast(seg), "word", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_words"),
                 F.sum(F.coalesce(F.col("n_syms"),
                                  F.length("word")).cast("long"))
                 .alias("bpe_tokens")))


def clean_corpus(docs: DataFrame, min_quality: float = 0.4) -> DataFrame:
    """End-to-end cleaned-training-set selection.

    The composition every pretraining corpus goes through, as one
    declarative plan: exact-duplicate keeper election (min doc_id per
    ``md5(text)``, a window over the hash), language agreement (the
    marker-word heuristic must confirm the labeled language), and a
    quality floor.  Survivors emit ``(doc_id, lang, quality)``.

    All three stages join on ``doc_id``, so Catalyst plans one scan per
    stage and co-partitioned joins; nothing here is a new primitive —
    the point is that the filter stack stays a single optimizable plan
    rather than three materialized passes.
    """
    from scrapely_spark.spark.dedup import _spread
    return _clean_impl(_spread(docs), min_quality)


def _clean_impl(docs: DataFrame, min_quality: float) -> DataFrame:
    """clean_corpus body over an already-widened docs frame.

    Split out so scrub_corpus can widen docs ONCE and share the same
    exchange across every per-doc map pass (the three passes below plus
    its own repetition/PII legs) — identical spread subtrees reuse one
    physical exchange, while nested ``_spread`` calls would stack a
    second repartition (the file probe can't see an earlier widening).
    """
    from scrapely_spark.spark import textstats

    quality = textstats.quality_scores(docs).select("doc_id", "quality")
    lang = textstats.language_id(docs).select(
        "doc_id", "lang", "predicted_lang")
    keepers = (docs
               .select("doc_id", F.md5("text").alias("content_hash"))
               .withColumn("keeper", F.min("doc_id").over(
                   Window.partitionBy("content_hash")))
               .where(F.col("doc_id") == F.col("keeper"))
               .select("doc_id"))
    return (keepers.join(quality, "doc_id").join(lang, "doc_id")
            .where((F.col("quality") >= min_quality)
                   & (F.col("predicted_lang") == F.col("lang")))
            .select("doc_id", "lang", "quality"))


def scrub_corpus(docs: DataFrame, min_quality: float = 0.4,
                 max_dup_word_frac: float = 0.62,
                 max_top_bigram_frac: float = 0.08) -> DataFrame:
    """The full pretraining scrub: ``clean_corpus`` (dedup keeper ∧
    langid agreement ∧ quality floor) extended with the Gopher
    repetition thresholds and PII masking — the RefinedWeb/Gopher-rules
    stack as ONE declarative plan.

    Survivors emit their repetition metrics plus the redacted body, so
    the output is directly trainable-on.  Every stage keys on
    ``doc_id``; Catalyst fuses the filter stack into co-partitioned
    joins rather than five materialized passes.
    """
    from scrapely_spark.spark import textstats
    from scrapely_spark.spark.dedup import _spread

    # widen once and reuse the SAME frame for every leg: the identical
    # exchange subtree is physically reused, so the repetition and PII
    # legs ride the one widening clean's passes already pay for
    docs = _spread(docs)
    kept = _clean_impl(docs, min_quality)
    # repetition metrics are doc-local, so compute them only for docs
    # that survived the cheap filters: the bigram/trigram explode (the
    # dominant cost here) never runs on documents dedup/langid/quality
    # already dropped
    rep = textstats.repetition_stats(
        docs.join(kept.select("doc_id"), "doc_id")).select(
        "doc_id", "dup_word_frac", "top_bigram_frac")
    survivors = (kept.join(rep, "doc_id")
                 .where((F.col("dup_word_frac") <= max_dup_word_frac)
                        & (F.col("top_bigram_frac")
                           <= max_top_bigram_frac)))
    # mask AFTER the filters: redaction cost scales with the kept
    # corpus, not the raw crawl
    return (survivors.join(docs.select("doc_id", "text"), "doc_id")
            .select("doc_id", "lang", "quality", "dup_word_frac",
                    "top_bigram_frac",
                    textstats.pii_mask("text").alias("text_redacted")))


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 50) -> DataFrame:
    """Corpus-wide top-k word n-grams by occurrence count.

    Partial aggregation map-side, then a global top-k
    (TakeOrderedAndProject — no full sort); ties broken by the n-gram
    string so the cut is deterministic.
    """
    grams = F.explode(_ngrams(_words(), n)).alias("ngram")
    return (docs.select(grams)
            .groupBy("ngram").agg(F.count("*").alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
            .limit(k))


def top_pmi_bigrams(docs: DataFrame, k: int = 50,
                    min_count: int = 5) -> DataFrame:
    """Top-k collocations by pointwise mutual information.

    The classic phrase-mining pass (Church & Hanks, "Word association
    norms, mutual information, and lexicography", 1990): for each
    bigram ab, PMI = ln( p(ab) / (p(a)·p(b)) ) with p(ab) over bigram
    occurrences and p(·) over unigram occurrences.  ``min_count``
    suppresses the low-frequency bigrams whose PMI estimates are pure
    noise (the standard guard — a hapax pair maxes the statistic).

    Plan shape: ONE corpus pass — unigrams and bigrams ride the same
    tagged explode into one map-side-combined groupBy, and the
    resulting vocabulary-sized count table is checkpointed once for
    its five consumers (two unigram joins, the bigram side, two
    1-row totals).  The joins carry the vocabulary, never the corpus;
    totals are a 1-row broadcast cross join; the cut is
    TakeOrderedAndProject over the rounded score (round-before-rank,
    ties by bigram — deterministic across engines and summation
    orders).
    """
    from scrapely_spark.spark.dedup import _spread

    # drop the '' token split() yields for empty/whitespace-only docs
    # (bpe_train's tokenizer contract) — it would otherwise count one
    # phantom unigram per empty doc and shift every PMI denominator
    w = F.filter(_words(), lambda x: F.length(x) > 0)
    # widen a single-split scan before the corpus-sized explode: the
    # tagged explode + partial agg is the job's entire map cost and
    # otherwise runs as ONE task (guide §2.5 input skew — measured 7s
    # single-task at sf0.1, the whole query's wall time)
    docs = _spread(docs.select("text"))
    # _ngrams is NULL below 2 words — coalesce to empty or concat()
    # nulls out the whole array and a 1-word doc loses its UNIGRAM
    tagged = docs.select(F.explode(F.concat(
        F.transform(w, lambda x: F.concat(F.lit("u:"), x)),
        F.transform(F.coalesce(_ngrams(w, 2),
                               F.array().cast("array<string>")),
                    lambda g: F.concat(F.lit("b:"), g)))).alias("g"))
    # vocabulary-sized; EAGER checkpoint — the totals below are
    # BROADCAST 1-row aggregates over this frame, and a lazy
    # checkpoint first materialized inside a broadcast-exchange
    # thread hits the documented RDDCheckpointData/DAGScheduler
    # lock-order deadlock (see the pagerank module docstring in
    # spark/graph.py); the price is one vocabulary-sized job at
    # plan-build time
    counts = (tagged.groupBy("g").agg(F.count("*").alias("c"))
              .localCheckpoint(eager=True))
    uni = counts.where(F.col("g").startswith("u:")) \
        .select(F.expr("substring(g, 3)").alias("w"), "c")
    bi_all = counts.where(F.col("g").startswith("b:")) \
        .select(F.expr("substring(g, 3)").alias("bigram"),
                F.col("c").alias("c_ab"))
    # totals over the FULL distributions (p(ab) is relative to every
    # bigram occurrence, not just the ones above min_count)
    totals = F.broadcast(
        uni.agg(F.sum("c").alias("n_uni"))
        .crossJoin(bi_all.agg(F.sum("c_ab").alias("n_bi"))))
    bi = bi_all.where(F.col("c_ab") >= min_count)
    parts = F.split(F.col("bigram"), " ")
    pmi = F.log((F.col("c_ab") / F.col("n_bi"))
                / ((F.col("c_a") / F.col("n_uni"))
                   * (F.col("c_b") / F.col("n_uni"))))
    return (bi
            .join(uni.select(F.col("w").alias("_wa"),
                             F.col("c").alias("c_a")),
                  parts.getItem(0) == F.col("_wa"))
            .join(uni.select(F.col("w").alias("_wb"),
                             F.col("c").alias("c_b")),
                  parts.getItem(1) == F.col("_wb"))
            .crossJoin(totals)
            .select("bigram", "c_ab", F.round(pmi, 6).alias("pmi"))
            .orderBy(F.desc("pmi"), F.asc("bigram"))
            .limit(k))


def length_quantiles(docs: DataFrame,
                     qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
                     approx: bool = False,
                     accuracy: int = 10_000) -> DataFrame:
    """Per-language token-length quantiles (linear interpolation).

    ``percentile`` (the default) is exact — sort-based within each
    language — to stay hash-checkable against DuckDB's
    ``quantile_cont``.  ``approx=True`` is the 100 TB variant with the
    SAME call shape: ``approx_percentile``'s mergeable sketch replaces
    the per-group sort, so the aggregate is one map-side-combining pass
    regardless of group size (bench-only — the approximation is
    engine-specific, so there is no cross-engine oracle for it).
    """
    tok = F.size(_words()).cast("double")
    base = docs.select("lang", tok.alias("n_tokens"))
    aggs = [F.count("*").alias("n_docs")]
    for q in qs:
        name = "p%02d" % int(round(q * 100))
        if approx:
            aggs.append(F.percentile_approx(
                "n_tokens", F.lit(q), F.lit(accuracy)).alias(name))
        else:
            aggs.append(F.round(F.percentile("n_tokens", F.lit(q)), 6)
                        .alias(name))
    return base.groupBy("lang").agg(*aggs).orderBy("lang")


def mixing_rates(docs: DataFrame, budget_tokens: int = 10_000,
                 reuse_cols: bool = True) -> DataFrame:
    """Quality-weighted static data mix: per-source sampling rates that
    spend a token budget proportionally to each source's quality mass.

    The standard pretraining-mix decision (cf. the DoReMi family's
    static baseline): weight every source by the SUM of its documents'
    quality scores, allocate ``budget_tokens`` proportionally, convert
    to a per-source keep-rate capped at 1.0.  Feed the rates to
    :func:`stratified_sample` keyed by source to materialize the mix.

    Determinism note: quality mass is summed in the integer domain
    (micro-quality = round(quality·1e6) as BIGINT) so the aggregate is
    exact under any partitioning/order — a double sum would be
    last-ulp order-dependent and break the cross-engine hash check.
    One scan, one groupBy(source) with map-side combine, one 1-row
    broadcast of the total.

    If ``docs`` already carries ``quality`` and/or ``n_tokens`` columns
    (an upstream scrub/tokenize stage computed them), they are reused
    verbatim instead of recomputed — at 100 TB, re-tokenizing the
    corpus for every downstream stage is the dominant avoidable cost.
    """
    from scrapely_spark.spark import textstats

    tok_col = (F.col("n_tokens")
               if reuse_cols and "n_tokens" in docs.columns
               else F.size(_words()))
    if reuse_cols and "quality" in docs.columns:
        # carried column: ONE projection — a doc_id self-join here
        # would shuffle the whole corpus to reattach a column the
        # frame already holds
        joined = docs.select("doc_id", "source",
                             tok_col.alias("n_tokens"), "quality")
    else:
        q = textstats.quality_scores(docs).select("doc_id", "quality")
        joined = (docs.select("doc_id", "source",
                              tok_col.alias("n_tokens"))
                  .join(q, "doc_id"))
    per = (joined
           .groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
                F.sum(F.round(F.col("quality") * 1e6).cast("long"))
                .alias("weight_micro")))
    tot = F.broadcast(per.agg(F.sum("weight_micro").alias("total_micro")))
    alloc = (F.lit(float(budget_tokens)) * F.col("weight_micro")
             / F.col("total_micro"))
    return (per.crossJoin(tot).select(
        "source", "n_docs", "n_tokens",
        F.round(F.col("weight_micro") / 1e6, 6).alias("quality_mass"),
        F.round(alloc, 4).alias("alloc_tokens"),
        F.round(F.least(F.lit(1.0), alloc / F.col("n_tokens")), 6)
        .alias("rate")))


def temperature_rates(docs: DataFrame, budget_tokens: int = 10_000,
                      reuse_cols: bool = True) -> DataFrame:
    """Temperature-scaled source mixing at α = ½ — the multilingual
    sampling rule (mBERT/XLM-R/mT5 exponential smoothing, public):
    source ``s`` gets budget share ∝ ``n_s^α``, boosting low-resource
    sources relative to proportional sampling.

    α is fixed at ½ and spelled ``sqrt`` on purpose: ``pow(x, α)`` is
    not guaranteed correctly rounded across engines, ``sqrt`` is — so
    the weight is ONE exact IEEE op everywhere.  Weights are then
    summed in the integer micro domain (``round(sqrt(n)·1e6)`` as
    BIGINT — the same order-independence trick as
    :func:`mixing_rates`), keeping the output hash-checkable.  Same
    plan shape as :func:`mixing_rates`: one scan, one
    map-side-combined groupBy(source), a 1-row broadcast total; feed
    the rates to :func:`apply_mixing_rates` to materialize.
    """
    tok_col = (F.col("n_tokens")
               if reuse_cols and "n_tokens" in docs.columns
               else F.size(_words()))
    toks = docs.select("doc_id", "source", tok_col.alias("n_tokens"))
    per = (toks.groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens")))
    per = per.withColumn(
        "weight_micro",
        F.round(F.sqrt(F.col("n_tokens")) * 1e6).cast("long"))
    tot = F.broadcast(per.agg(F.sum("weight_micro").alias("total_micro")))
    alloc = (F.lit(float(budget_tokens)) * F.col("weight_micro")
             / F.col("total_micro"))
    return (per.crossJoin(tot).select(
        "source", "n_docs", "n_tokens",
        F.round(alloc, 4).alias("alloc_tokens"),
        F.round(F.least(F.lit(1.0), alloc / F.col("n_tokens")), 6)
        .alias("rate")))


def apply_mixing_rates(docs: DataFrame, rates: DataFrame,
                       seed: int = 0) -> DataFrame:
    """Materialize a static data mix: keep each document with its
    source's rate, via the deterministic md5 ticket.

    ``rates`` is :func:`mixing_rates` output (or any tiny
    ``(source, rate)`` table) — broadcast, never shuffled.  A document
    survives iff its 8-hex-char ticket falls below
    ``floor(rate · 2³²)`` rendered as zero-padded lowercase hex — the
    same top-32-bits comparison :func:`stratified_sample` uses, except
    the threshold is computed in-plan from the data-dependent rate
    (engine-portable: pure IEEE arithmetic on the already-rounded
    rate).  ``rate ≥ 1.0`` keeps everything (its hex rendering would be
    9 chars and break the string comparison).

    Output keeps every ``docs`` column plus the joined ``rate``.
    """
    ticket = F.substring(_ticket_md5(seed), 1, 8)
    thr = F.lower(F.lpad(F.hex(
        F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long")),
        8, "0"))
    return (docs.join(F.broadcast(rates.select("source", "rate")),
                      "source")
            .where((F.col("rate") >= 1.0) | (ticket < thr)))


def llm_corpus_build(docs: DataFrame, extracted: DataFrame,
                     budget_tokens: int = 10_000,
                     seed: int = 42) -> DataFrame:
    """The end-to-end pretraining-corpus build, operators composed:

    crawl/extract (``extracted`` — the IBL extraction output carrying
    one caption per fetched document) → MinHash-LSH candidate pairs →
    connected-component clusters → canonical-survivor election →
    scrub (exact-dup keeper ∧ langid agreement ∧ quality floor ∧
    Gopher repetition thresholds) → quality-weighted mixing rates →
    mix materialization (md5 tickets) → first-fit sequence packing.

    Each stage is the SAME operator verified piecewise elsewhere
    (``dedup.minhash_candidates``/``dup_clusters``, ``scrub_corpus``,
    ``mixing_rates``/``apply_mixing_rates``, ``pack_greedy``); this
    function is the integration point proving they compose in one
    lineage.  One row per packed document:
    ``(doc_id, source, lang, shard, pack_id, n_tokens, quality, rate,
    caption)``.

    Scan discipline: the scrub output (with the corpus tokenized ONCE
    into ``n_tokens``) is local-checkpointed — it feeds three
    consumers (rate computation, mix filter, packing), and without the
    checkpoint each would re-run the dedup+scrub lineage end to end.
    ``mixing_rates``/``pack_greedy`` reuse the carried ``quality`` /
    ``n_tokens`` columns instead of re-tokenizing (their documented
    contract), so the text column is read exactly twice overall: once
    by the scrub stage, once for the PII-masked payload the survivors
    carry.  The PII leg is pruned here (the packed record is metadata
    + caption), which is Catalyst column pruning doing its job.
    """
    from scrapely_spark.spark import dedup

    clusters = dedup.dup_clusters(docs, dedup.minhash_candidates(docs))
    keepers = (clusters
               .where(F.col("doc_id") == F.col("canonical_doc_id"))
               .select("doc_id"))
    scrubbed = scrub_corpus(docs.join(keepers, "doc_id"))
    # one tokenize pass; localCheckpoint: three consumers below would
    # otherwise each replay LSH banding + clustering + the scrub stack
    kept = (docs.select("doc_id", "source", "text")
            .join(scrubbed.select("doc_id", "lang", "quality"), "doc_id")
            .withColumn("n_tokens", F.size(_words()))
            .drop("text")
            .localCheckpoint(eager=True))
    rates = mixing_rates(kept, budget_tokens=budget_tokens)
    sampled = apply_mixing_rates(kept, rates.select("source", "rate"),
                                 seed=seed)
    packed = pack_greedy(sampled.select("doc_id", "n_tokens"))
    return (packed.drop("n_tokens")
            .join(sampled, "doc_id")
            .join(extracted.select("doc_id", "caption"), "doc_id")
            .select("doc_id", "source", "lang", "shard", "pack_id",
                    F.col("n_tokens").cast("int").alias("n_tokens"),
                    "quality", F.round("rate", 6).alias("rate"),
                    "caption"))


def shard_manifest(docs: DataFrame, n_shards: int = 16,
                   seed: int = 0, text_col: str = "text") -> DataFrame:
    """Per-shard export manifest: counts, byte totals, and an
    order-independent content checksum — the validation artifact a
    resumable export writes next to each shard.

    A 10^10-document export (:func:`global_shuffle` → shard files) has
    to be verifiable without re-reading itself in order: after a
    resume, a re-run, or a storage migration, "is shard 37 intact and
    complete?" must be answerable from a manifest.  Three invariants
    per shard: ``n_docs``, ``n_bytes`` (total text bytes), and
    ``checksum`` — the BIGINT sum of each document's 32-bit md5 slice.
    Summation commutes, so the checksum is independent of row order
    and partitioning (unlike a hash-of-concatenation, which would need
    an ordered collect per shard); a missing, duplicated, or corrupted
    document moves it with probability ~1-2^-32 per incident.  The
    int64 headroom bounds exact shards at ~2^31 documents each —
    raise ``n_shards`` long before that.

    Shard assignment is ``global_shuffle``'s exact key (the shared
    md5 ticket's first 60 bits mod ``n_shards``), so the manifest
    describes precisely the shards that export writes.  One shuffle,
    keyed by shard, map-side partials; output is n_shards rows.

    Returns (shard, n_docs, n_bytes, checksum).
    """
    t = _ticket_md5(seed)
    shard = (F.conv(F.substring(t, 1, 15), 16, 10).cast("long")
             % n_shards).cast("int")
    h32 = F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10) \
        .cast("long")
    return (docs.select(shard.alias("shard"),
                        F.octet_length(F.col(text_col)).cast("long")
                        .alias("_len"),
                        h32.alias("_h32"))
            .groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_len").alias("n_bytes"),
                 F.sum("_h32").alias("checksum"))
            .select("shard",
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_bytes").cast("long").alias("n_bytes"),
                    F.col("checksum").cast("long").alias("checksum")))
