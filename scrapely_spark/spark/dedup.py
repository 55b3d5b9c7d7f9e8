"""Deduplication operators for a documents table at training-data scale.

Five families, all shuffle-conscious:

* exact (hash-groupBy on md5 of the body — one shuffle on a 32-byte key);
* normalized-exact (case/whitespace canonicalization first);
* MinHash + LSH banding (shingle → k independent min-hashes → band key;
  candidate pairs only ever meet inside a band partition, so the
  all-pairs O(n²) never materializes);
* n-gram Jaccard verification of banded candidates (exact similarity on
  the survivors only);
* SimHash (vectorized numpy kernel — 64 voting bits over token hashes);
* exact shared substrings (ExactSubstr of Lee et al. 2021 recast from
  suffix arrays to capped hash joins — catches partial copies whole-doc
  similarity misses);
* embedding near-dup (cosine within coarse buckets, see simsearch).

MinHash hashes are ``md5(shingle || seed)`` — chosen because md5 of a
string is bit-identical in Spark and DuckDB, which lets the correctness
driver validate the whole signature pipeline against a pure-SQL oracle.
"""

from __future__ import annotations

import re
import weakref
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

N_HASHES = 8
BAND_SIZE = 2  # hashes per band → N_HASHES/BAND_SIZE bands

# LSH buckets above this size are dropped before any self-join: a
# degenerate bucket (boilerplate pages, near-constant docs) otherwise
# produces O(|bucket|²) candidate pairs — one hot band_key at 10^10 docs
# is a cartesian bomb.  Dropped mega-buckets lose nothing that matters:
# near-identical documents also collide in `exact`/`normalized_exact`,
# which is the cheap recovery path for them.
MAX_BUCKET = 50


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a too-narrow input before CPU-heavy per-row work.

    A small single-file table arrives as one split and would serialize
    the md5/fingerprint kernels on one core.  Only widens (never
    coalesces): at real scale the scan already yields >= parallelism
    splits and this is a no-op.  The width probe is ``inputFiles()``
    (a driver-side file listing — each parquet file is at least one
    split) rather than ``df.rdd.getNumPartitions()``, which forces a
    full plan→RDD conversion on the driver per call.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files < target:
        return df.repartition(target)
    return df


def _unpersist_on_gc(result: DataFrame, cached: list) -> DataFrame:
    """Free cached intermediates when the result DataFrame is dropped.

    The LSH functions cache shared intermediates (band buckets, shingle
    sets) so self-join sides compute them once.  The returned DataFrame
    is lazy, so the cache must outlive this call — but a long session
    issuing many dedup calls must not accumulate cached plans forever.
    Tying ``unpersist`` to the result's garbage collection frees each
    cache exactly when no caller can evaluate a plan that reuses it
    (CPython refcounting makes this deterministic; pinned by
    test_dedup_scale's long-session cache test).
    """
    def _free(caches=cached):
        for c in caches:
            try:
                c.unpersist()
            except Exception:  # session already stopped — nothing to free
                pass
    weakref.finalize(result, _free)
    return result


def _cap_buckets(df: DataFrame, key_cols: list, max_bucket: int
                 ) -> DataFrame:
    """Drop rows in over-sized buckets before a bucket self-join.

    One window count over the bucket key; the hash partitioning it
    introduces is the same one the following self-join needs, so AQE
    reuses the exchange instead of adding a shuffle.
    """
    w = Window.partitionBy(*key_cols)
    return (df.withColumn("_bn", F.count("*").over(w))
            .where(F.col("_bn") <= max_bucket)
            .drop("_bn"))


def exact(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups: md5(text) → keeper + group size."""
    return (docs
            .select("doc_id", F.md5("text").alias("content_hash"))
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count("*").alias("n_dups")))


def normalized_exact(docs: DataFrame) -> DataFrame:
    """Duplicates after lowercasing + whitespace collapse."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")),
                                         r"\s+", " "))
    return (docs
            .select("doc_id", F.md5(normalized).alias("content_hash"))
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count("*").alias("n_dups")))


def _words():
    """The lowercased whitespace-token array of the text column."""
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def _shingles_of(words_col, n: int = 3):
    """Word n-gram shingles from a BOUND token-array column.

    ``words_col`` must be a plain column reference (bind ``_words()``
    in its own projection first): expressions inside higher-order
    function lambdas are not subexpression-eliminated, so an inline
    ``split()`` here would re-run the regex tokenization once per
    array access — O(words x text_len) per document (measured as the
    dominant corpus CPU cost before the split was hoisted).
    """
    idx = F.sequence(F.lit(0),
                     F.greatest(F.size(words_col) - n, F.lit(0)))
    # F.get is null-safe out of bounds (element_at raises under ANSI mode)
    return F.transform(
        idx, lambda i: F.concat(
            *sum([[F.get(words_col, i + k)]
                  + ([F.lit(" ")] if k < n - 1 else [])
                  for k in range(n)], [])))


def _check_digest_budget(n_hashes: int) -> None:
    if n_hashes > 8:
        # the two md5s give 64 hex chars = eight 8-hex (32-bit) slices;
        # slice 8+ would start past the digest end and F.substring
        # would return '' for every doc — constant sig columns, every
        # band containing them degenerate (one global bucket)
        raise ValueError("n_hashes > 8 exceeds the 2-md5 digest budget "
                         "of eight 32-bit slices")


def _digests(shingle_arr):
    """``md5(s) || md5(s || '#')`` per element of a shingle array."""
    return F.transform(
        shingle_arr,
        lambda s: F.concat(F.md5(s), F.md5(F.concat(s, F.lit("#")))))


def _sig_cols(hs_col, n_hashes: int):
    """sig_k columns from a bound digest-array column (array-local min:
    each 8-hex slice family takes ``array_min`` over the digests — the
    lexicographic min the exploded groupBy used to compute, with zero
    shuffle)."""
    return [
        F.array_min(F.transform(
            hs_col, lambda h: F.substring(h, k * 8 + 1, 8)))
        .alias("sig_%d" % k)
        for k in range(n_hashes)]


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES
                       ) -> DataFrame:
    """Per-document MinHash signature.

    sig_k is the lexicographic min over distinct shingles of the k-th
    8-hex-char slice of ``md5(s) || md5(s || '#')`` — two md5s per
    shingle instead of one per (shingle, k), with the k independent
    32-bit hash families carved out of the 256 digest bits.  md5 is the
    hash because it is bit-identical in Spark and DuckDB, which lets the
    correctness driver validate the whole signature pipeline against a
    pure-SQL oracle.

    Computed ARRAY-LOCALLY: the digest array is bound once per doc in
    its own projection (multi-referenced non-cheap expressions survive
    CollapseProject, the shared_substring_pairs convention) and each
    sig_k is an ``array_min`` over it — the whole signature pipeline is
    a map-only scan.  The previous explode → groupBy(doc_id) shape
    planned as TWO SortAggregates around a hash exchange (string min
    has no hash-agg fast path), sorting every exploded shingle row
    twice; removing it cut dedup_minhash_bands' plan to scan + project
    (guide §2.4 — remove shuffles outright).
    """
    _check_digest_budget(n_hashes)  # validate before touching docs
    # docs shorter than one shingle would all hash to the same NULL-band
    # bucket and quadratically blow up the candidate join — drop them
    # (they can't be near-dups by n-gram similarity anyway)
    long_enough = docs.where(
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 3)
    base = _spread(long_enough.select("doc_id", "text")).select(
        "doc_id", _words().alias("_w")).select(
        "doc_id", F.array_distinct(_shingles_of(F.col("_w"))).alias("_sh"))
    bound = base.select("doc_id", _digests(F.col("_sh")).alias("_hs"))
    return bound.select("doc_id", *_sig_cols(F.col("_hs"), n_hashes))


def _bands_from_sigs(sigs: DataFrame, n_hashes: int = N_HASHES,
                     band_size: int = BAND_SIZE) -> DataFrame:
    """(doc_id, band_id, band_key) from a signature frame — one explode
    over a struct array instead of a per-band union (a union re-runs
    the signature pipeline once per band)."""
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws(
                "|", *[F.col("sig_%d" % (b * band_size + k))
                       for k in range(band_size)])).alias("band_key"))
        for b in range(n_hashes // band_size)])
    return (sigs.select("doc_id", F.explode(bands).alias("b"))
            .select("doc_id", "b.band_id", "b.band_key"))


def minhash_bands(docs: DataFrame, n_hashes: int = N_HASHES,
                  band_size: int = BAND_SIZE) -> DataFrame:
    """(doc_id, band_id, band_key): LSH bucketing of the signatures.

    Map-only end to end: array-local signatures + the band explode —
    no exchange anywhere in the plan (the one repartition is
    ``_spread`` widening a single-file scan)."""
    return _bands_from_sigs(minhash_signatures(docs, n_hashes),
                            n_hashes, band_size)


def _candidates_impl(docs: DataFrame, max_bucket: int,
                     bands: DataFrame | None = None,
                     materialize: bool = False):
    """(candidate pairs, [cached intermediates]) — see minhash_candidates.

    ``materialize=True`` eagerly localCheckpoints the capped band table
    before the self-join.  Needed when the band lineage is expensive
    (jaccard_pairs' digest chain): the self-join plans as a broadcast
    hash join whose build side RE-EXECUTES the whole
    explode→exchange→window chain instead of reusing the streamed
    side's exchange (broadcast-thread subqueries are not
    exchange-reused — measured: the duplicated chain ran the full
    tokenize+digest pipeline a second time, once as a single-task scan
    stage).  The checkpoint computes the slim (doc_id, band_id,
    band_key) table once, serially, and both join sides read blocks.
    """
    capped = _cap_buckets(bands if bands is not None
                          else minhash_bands(docs),
                          ["band_id", "band_key"], max_bucket)
    if materialize:
        capped = capped.localCheckpoint(eager=True)
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (a.join(b, ["band_id", "band_key"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    return pairs, []


def minhash_candidates(docs: DataFrame, max_bucket: int = MAX_BUCKET
                       ) -> DataFrame:
    """Candidate near-dup pairs: documents sharing any LSH band bucket.

    Buckets larger than ``max_bucket`` are dropped before the self-join
    (see MAX_BUCKET) — the standard LSH hot-bucket guard.
    """
    pairs, cached = _candidates_impl(docs, max_bucket)
    return _unpersist_on_gc(pairs, cached)


def minhash_candidates_delta(new_docs: DataFrame,
                             index_bands: DataFrame,
                             max_bucket: int = MAX_BUCKET,
                             new_bands: DataFrame | None = None
                             ) -> DataFrame:
    """Incremental LSH dedup: a new batch against an existing index.

    The production shape at crawl scale — each increment dedups against
    the accumulated corpus WITHOUT re-pairing the historical index
    against itself.  ``index_bands`` is a materialized
    ``(doc_id, band_id, band_key)`` table (minhash_bands output
    appended per increment, e.g. an Iceberg state table); only the new
    batch's signatures are computed here.

    Emits ``(doc_a, doc_b, vs_index)`` where every pair involves at
    least one new document — exactly one row per pair; ``vs_index`` is
    true only when the pair is NOT discoverable within the batch alone
    (i.e. one endpoint exists solely in the index).
    The hot-bucket cap counts BOTH sides of the union (a boilerplate
    bucket is hot regardless of arrival time), so
    ``candidates(old ∪ new) == candidates(old) ∪ delta(new, bands(old))``
    whenever no bucket crosses the cap between increments; a bucket
    that grows past the cap stops emitting from that increment on
    (emission is append-only — already-emitted old pairs are never
    retracted).

    ``new_bands``: a caller that has ALREADY materialized the batch's
    bands (the streaming loop, which also writes them to the index)
    passes them here so the shingle-explode + double-md5 pipeline is
    not computed twice per micro-batch; the caller owns their
    persistence.
    """
    # no cache on either side: the new batch's band pipeline is now
    # map-only (array-local signatures), and the cap window over the
    # union introduces ONE exchange that both self-join sides reuse —
    # the signature work runs once in the map stage regardless.
    if new_bands is None:
        nb = (minhash_bands(new_docs)
              .withColumn("is_new", F.lit(True)))
    else:
        nb = (new_bands.select("doc_id", "band_id", "band_key")
              .withColumn("is_new", F.lit(True)))
    owned = []
    idx = (index_bands.select("doc_id", "band_id", "band_key")
           .withColumn("is_new", F.lit(False)))
    allb = _cap_buckets(nb.unionByName(idx),
                        ["band_id", "band_key"], max_bucket)
    a = allb.where("is_new").alias("a")
    b = allb.alias("b")
    # a.doc_id != b.doc_id also guards re-ingestion: a doc present in
    # BOTH the batch and the index must not pair with itself.  A pair
    # can reach here through two arms when one endpoint is re-ingested
    # (new-vs-new AND new-vs-index); the min() collapse keeps ONE row
    # and prefers vs_index=false — the pair is discoverable within the
    # batch alone, so it is not an index hit.
    pairs = (a.join(b, ["band_id", "band_key"])
             .where((F.col("a.doc_id") != F.col("b.doc_id"))
                    & ((~F.col("b.is_new"))
                       | (F.col("a.doc_id") < F.col("b.doc_id"))))
             .groupBy(F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                      F.greatest("a.doc_id", "b.doc_id").alias("doc_b"))
             .agg(F.min(~F.col("b.is_new")).alias("vs_index")))
    return _unpersist_on_gc(pairs, owned) if owned else pairs


def jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                  max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Exact n-gram Jaccard for banded candidates (verify stage).

    The per-doc DISTINCT shingle array is computed (and eagerly
    materialized) once;
    the banding pipeline derives its signatures from it array-locally,
    and the verify stage attaches the two shingle arrays to each
    candidate pair by doc_id and scores |A∩B| / |A∪B| with
    ``array_intersect`` — the exploded shingle table (and the two
    corpus-sized joins through the shingle VALUE it used to require)
    is gone: candidate pairs are orders of magnitude fewer than
    shingle rows, so the intersection work moves to exactly the rows
    that need it (guide §2.3 — shuffle keys and metadata, not
    payloads).  No per-row Python anywhere.
    """
    # per-doc distinct shingles, materialized EAGERLY (localCheckpoint,
    # not cache): three consumers (banding, both pair-attach sides)
    # must not re-run the regex tokenization — the corpus's dominant
    # CPU cost.  A lazy .cache() measured 3-6x slower here for two
    # reasons: (a) concurrent AQE stage jobs racing a cold cache each
    # recomputed the full tokenization, and (b) CacheManager matches
    # plans structurally, so a previous call's deferred unpersist
    # (fired by GC mid-query) dropped the CURRENT call's identical-plan
    # cache and every consumer fell back to the raw scan.  The eager
    # checkpoint is computed once, serially, owns its blocks (no
    # cross-call plan matching), and frees them when the plan is GC'd.
    perdoc = _spread(docs.select("doc_id", "text")).select(
        "doc_id", _words().alias("_w")).select(
        "doc_id", F.array_distinct(_shingles_of(F.col("_w"))).alias("sh")) \
        .localCheckpoint(eager=True)
    # sub-shingle docs carry [NULL] shingle arrays (the long_enough
    # guard's role in the signature path): keep them OUT of banding so
    # they can't fold into one degenerate band bucket
    eligible = perdoc.where(F.get("sh", 0).isNotNull())
    sigs = (eligible.select("doc_id", _digests(F.col("sh")).alias("_hs"))
            .select("doc_id", *_sig_cols(F.col("_hs"), N_HASHES)))
    cands, cached = _candidates_impl(docs, max_bucket,
                                     bands=_bands_from_sigs(sigs),
                                     materialize=True)
    a = perdoc.select(F.col("doc_id").alias("doc_a"),
                      F.col("sh").alias("_sha"))
    b = perdoc.select(F.col("doc_id").alias("doc_b"),
                      F.col("sh").alias("_shb"))
    out = (cands.join(a, "doc_a").join(b, "doc_b")
           .select("doc_a", "doc_b",
                   F.size(F.array_intersect("_sha", "_shb"))
                   .alias("n_common"),
                   F.size("_sha").alias("n_a"),
                   F.size("_shb").alias("n_b"))
           .select("doc_a", "doc_b",
                   F.round(F.col("n_common")
                           / (F.col("n_a") + F.col("n_b")
                              - F.col("n_common")), 6).alias("jaccard"))
           .where(F.col("jaccard") >= threshold))
    # perdoc/capped are localCheckpoints, not cache entries — their
    # blocks are freed by the ContextCleaner when the plan is GC'd
    return _unpersist_on_gc(out, cached) if cached else out


def shared_substring_pairs(docs: DataFrame, n_chars: int = 32,
                           min_shared: int = 2, gram_frac: int = 1,
                           winnow: int = 1,
                           max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Exact shared-substring pairs (the ExactSubstr method of Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models
    Better", recast from suffix arrays to hash joins).

    Returns ``(doc_a, doc_b, n_shared)``: pairs of documents sharing at
    least ``min_shared`` distinct ``n_chars``-character substrings.
    This is the exact-overlap complement of the MinHash/Jaccard family
    (whole-document similarity): quotation, boilerplate injection and
    partial copies surface here even when whole-doc similarity is low.

    Shape: one projection turns each doc into its distinct gram md5s
    (bit-identical in DuckDB, so the driver oracle replays the whole
    construction); explode; hot grams (site chrome, license blocks)
    above ``max_bucket`` are dropped by the standard window cap whose
    exchange the self-join reuses; the pair count is a groupBy with
    map-side combine.  Row volume is O(total chars / gram_frac) — the
    cost model of the reference method's suffix-array build.

    Two 100 TB volume knobs, both CONTENT-defined (a positional stride
    would never align across documents), mutually exclusive:

    * ``gram_frac``: keep only grams whose first hex digit falls in the
      lowest ``16/gram_frac`` values.  A shared gram is kept or dropped
      identically on both sides; a shared span of length L surfaces
      with probability 1 - (1 - 1/gram_frac)^(L - n_chars + 1).
    * ``winnow``: Schleimer et al. 2003 winnowing — keep the minimum
      gram hash of every ``winnow``-gram window (a doc shorter than one
      window keeps its global minimum).  ~1/winnow the volume with a
      deterministic GUARANTEE: identical gram windows select identical
      minima, so every shared span of length >= n_chars + winnow - 1
      is caught — the fingerprint density/guarantee trade the paper
      proves optimal.  Array-local (`array_min` over slices), so the
      selection adds no shuffle.
    """
    if gram_frac not in (1, 2, 4, 8, 16):
        raise ValueError("gram_frac must divide 16 (hex-prefix selector)")
    if winnow < 1:
        raise ValueError("winnow must be >= 1")
    if winnow > 1 and gram_frac > 1:
        raise ValueError("winnow and gram_frac are alternative selectors")
    starts = F.when(
        F.length("text") >= n_chars,
        F.sequence(F.lit(1), F.length("text") - (n_chars - 1))
    ).otherwise(F.array().cast("array<int>"))
    positional = F.transform(
        starts, lambda i: F.md5(F.col("text").substr(i, F.lit(n_chars))))
    # bind the positional gram array to a column in its own projection:
    # inlining it into every window slice would re-run the md5 transform
    # per window (measured 23x at sf0.1).  CollapseProject keeps the
    # split — the bound array is non-cheap and multi-referenced.
    base = _spread(docs.select("doc_id", "text")).select(
        "doc_id", positional.alias("pg"))
    if winnow > 1:
        grams = F.when(F.size("pg") > 0, F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(
                    F.size("pg") - (winnow - 1), F.lit(1))),
                lambda p: F.array_min(F.slice("pg", p, winnow))))
        ).otherwise(F.array().cast("array<string>"))
    else:
        grams = F.array_distinct("pg")
    g = base.select("doc_id", F.explode(grams).alias("g"))
    if gram_frac > 1:
        g = g.where(
            F.substring("g", 1, 1) < F.lit("0123456789abcdef"[16 // gram_frac]))
    # shuffle the 16-byte binary digest, not its 32-char hex rendering:
    # unhex is injective, so grouping/joining on the binary form yields
    # identical pairs at half the exchange and cache bytes (guide §2.3
    # — narrower types)
    g = g.select("doc_id", F.unhex("g").alias("g"))
    g = _cap_buckets(g, ["g"], max_bucket).cache()
    pairs = (g.alias("a").join(g.alias("b"), "g")
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("n_shared"))
             .where(F.col("n_shared") >= min_shared))
    return _unpersist_on_gc(pairs, [g])


_SIMHASH_SCHEMA = "doc_id long, simhash long"

# the token class is exactly RE2's \s complement ([\t\n\f\r ]) so the
# kernel splits identically to the DuckDB oracle's
# string_split_regex(text, '\s+'); Python's unicode-aware str.split()
# would diverge on non-ASCII whitespace
_TOKEN_RE = re.compile(r"[^ \t\n\f\r]+")

# per-process lazily-created DuckDB connection for vectorized token
# hashing (False once probing failed — fall back to hashlib)
_DUCK = None


def _md5_u64(uniq: np.ndarray) -> np.ndarray:
    """``int(md5(token).hexdigest()[:16], 16)`` for a token array.

    The engine-portable md5-slice convention every dedup family uses —
    but hashed as one vectorized batch: DuckDB's multithreaded
    ``md5_number_upper`` (the first 8 digest bytes read little-endian;
    byteswap yields the big-endian hexdigest-slice value) is ~6× faster
    than a per-token ``hashlib`` loop at a 1M-distinct-token batch.
    Falls back to ``hashlib`` when DuckDB is absent in the worker
    environment; bit-identity of the two paths is pinned by
    test_dedup_scale's differential test.
    """
    global _DUCK
    if _DUCK is None:
        try:
            import duckdb
            _DUCK = duckdb.connect()
            # the Spark python worker already runs one task per core —
            # don't let every worker fan out to all cores again
            _DUCK.execute("SET threads=2")
        except Exception:  # pragma: no cover - duckdb always in sandbox
            _DUCK = False
    if _DUCK is not False and len(uniq) >= 4096:
        import pyarrow as pa
        tok_tbl = pa.table({"t": pa.array(uniq, pa.string())})
        got = _DUCK.execute(
            "SELECT md5_number_upper(t) AS h FROM tok_tbl").arrow()
        return got["h"].to_numpy().astype(np.uint64).byteswap()
    import hashlib
    buf = b"".join(hashlib.md5(t.encode()).digest()[:8] for t in uniq)
    return np.frombuffer(buf, dtype=">u8").astype(np.uint64)


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per document (vectorized numpy batch kernel).

    Each token votes its 64 hash bits weighted ±1; the sign pattern of
    the vote vector is the fingerprint.  The token hash is the first 16
    hex chars of md5(token) — the same engine-portable md5-slice
    convention the MinHash families use, which is what lets the
    correctness driver check this operator against a full DuckDB oracle
    (unnest tokens → nibble-decode vote bits → per-bit sums → sign
    pack), not just a row count.  NULL/NaN text fingerprints to 0
    (matching the oracle's LEFT JOIN + coalesce), and tokenization
    splits on exactly RE2's ``\\s`` class — see ``_TOKEN_RE``.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys
        for batch in batches:
            if len(batch) == 0:
                continue
            token_lists = [
                [] if t is None or (isinstance(t, float) and t != t)
                else _TOKEN_RE.findall(str(t).lower())
                for t in batch["text"]]
            counts = np.fromiter((len(t) for t in token_lists),
                                 dtype=np.int64, count=len(token_lists))
            n_docs = len(counts)
            flat = np.array(
                [tok for toks in token_lists for tok in toks],
                dtype=object)
            if len(flat) == 0:
                yield pd.DataFrame({
                    "doc_id": batch["doc_id"].astype("int64"),
                    "simhash": np.zeros(n_docs, dtype=np.int64)})
                continue
            # hash each DISTINCT token once (web text repeats tokens
            # heavily), unpack its 64 bits once, and keep every bulk op
            # in float64: this numpy build's integer ufuncs and any
            # first-touch of a large fresh buffer are an order of
            # magnitude slower than float kernels on warm pages, so the
            # shape to avoid is a (n_tokens, 64) integer matrix.
            uniq, inv = np.unique(flat, return_inverse=True)
            # one vectorized md5 batch over the DISTINCT tokens (the
            # repeated-token mass still hits the vectorized path below)
            h_u = _md5_u64(uniq)
            if sys.byteorder != "little":  # pragma: no cover
                h_u = h_u.byteswap()
            signs_u = np.unpackbits(
                h_u.view(np.uint8).reshape(-1, 8), axis=1,
                bitorder="little").astype(np.float64) * 2.0 - 1.0
            n_uniq = len(uniq)
            if n_docs * n_uniq <= 4_000_000:
                # dense (docs × vocab) count matrix @ (vocab × 64) signs
                doc_idx = np.repeat(np.arange(n_docs), counts)
                cm = np.bincount(
                    doc_idx * n_uniq + inv,
                    minlength=n_docs * n_uniq).astype(np.float64)
                votes = cm.reshape(n_docs, n_uniq) @ signs_u
            else:
                # vocab too wide for a dense count matrix: chunked
                # gather + segmented reduce, ~32 MB working set
                votes = np.zeros((n_docs, 64))
                ends = np.cumsum(counts)
                starts = ends - counts
                step = 1 << 16
                for a in range(0, len(inv), step):
                    b = min(a + step, len(inv))
                    g = signs_u[inv[a:b]]
                    d0 = int(np.searchsorted(ends, a, side="right"))
                    d1 = int(np.searchsorted(starts, b, side="left"))
                    offs = np.clip(starts[d0:d1], a, b - 1) - a
                    part = np.add.reduceat(g, offs, axis=0)
                    votes[d0:d1] += part
                votes[counts == 0] = 0
            # pack sign bits via two exact float dot products (powers of
            # two < 2^53 are exact; a 64-bit int shift ufunc is not
            # worth its cost here)
            pow32 = 2.0 ** np.arange(32)
            lo = ((votes[:, :32] > 0).astype(np.float64) @ pow32) \
                .astype(np.uint64)
            hi = ((votes[:, 32:] > 0).astype(np.float64) @ pow32) \
                .astype(np.uint64)
            fps = lo | (hi << np.uint64(32))
            yield pd.DataFrame({
                "doc_id": batch["doc_id"].astype("int64"),
                "simhash": fps.astype(np.int64)})

    return _spread(docs.select("doc_id", "text")).mapInPandas(
        kernel, _SIMHASH_SCHEMA)


def dup_clusters(docs: DataFrame, pairs: DataFrame,
                 max_iter: int = 25,
                 driver_max_edges: int = 2_000_000) -> DataFrame:
    """(doc_id, canonical_doc_id, cluster_size): duplicate clusters.

    The step after pair generation every dedup pipeline needs: candidate
    pairs (from any of the families above) form a graph; connected
    components of that graph are the duplicate clusters, and the keeper
    per cluster is its minimum doc_id.  Docs in no pair are their own
    canonical with cluster_size 1.

    Hybrid execution.  Capped-LSH pair sets are orders of magnitude
    smaller than the corpus (bucket caps bound pairs per bucket, and
    near-dups are the exception, not the rule), so the edge list usually
    fits on the driver even when the corpus never could.  A single
    ``limit(driver_max_edges+1)`` probe — one job, no separate count —
    fetches the edges; if they all arrived, components are solved with
    an O(E α(E)) union-find and the (doc_id → canonical, size) mapping
    is **broadcast**-joined back, so the only full-corpus work is one
    scan with a map-side hash join: no iterative shuffles and no
    corpus-wide window.  2M edges ≈ 32 MB of int64 pairs — comfortably
    a broadcast.  Graphs above the threshold (or ``driver_max_edges=0``)
    take the distributed path below, whose per-round cost is what a
    10^10-node graph actually needs.

    Distributed path: min-label propagation with pointer jumping.
    Each round every node takes the min label over itself and its
    neighbors (one edges⋈labels shuffle + a map-side-combining groupBy),
    then compresses paths by looking its own label up in the new mapping
    (label(u) ← label(label(u)), a self-join).  The jump step makes long
    chains converge in O(log diameter) rounds instead of O(diameter) —
    the large-star/small-star result (Kiveris et al., "Connected
    Components in MapReduce and Beyond") in its simplest shape.  Labels
    are monotone non-increasing, so the fixpoint is exact, detected by a
    changed-row count (one bounded driver action per round).

    Scale shape: edges are materialized once, symmetric, pre-partitioned
    on the probe key; every round ``localCheckpoint``s the label table so
    round k's plan does not embed rounds 1..k-1 (lineage truncation —
    without it the plan tree doubles per round).  Near-dup graphs from
    capped LSH buckets have tiny diameter (bucket co-membership is a
    clique), so rounds ≈ 2-4 in practice; ``max_iter`` is a guard, and
    hitting it raises rather than returning a half-converged clustering.
    """
    # restrict the graph to ids actually present in docs BEFORE either
    # path: pairs are derived from docs in every pipeline, but a stray
    # foreign id must not inflate driver-path cluster sizes while the
    # distributed window (which counts docs rows) ignores it — the two
    # semi-joins shuffle only the slim pair list and make both paths
    # compute the same graph.  (docs must carry unique doc_ids — every
    # caller's docs is a keyed table.)
    ids = docs.select("doc_id")
    pairs = (pairs
             .join(ids.withColumnRenamed("doc_id", "doc_a"), "doc_a",
                   "left_semi")
             .join(ids.withColumnRenamed("doc_id", "doc_b"), "doc_b",
                   "left_semi"))
    if driver_max_edges > 0:
        # the probe executes the (expensive) pair lineage — persist the
        # slim edge list first so the distributed fallback reuses it
        # instead of regenerating every LSH candidate from scratch
        slim = pairs.select("doc_a", "doc_b").persist()
        probe = slim.limit(driver_max_edges + 1).toPandas()
        if len(probe) <= driver_max_edges:
            slim.unpersist()
            return _dup_clusters_driver(docs, probe)
        return _unpersist_on_gc(
            _dup_clusters_distributed(docs, slim, max_iter), [slim])
    return _dup_clusters_distributed(docs, pairs, max_iter)


def _dup_clusters_driver(docs: DataFrame, edges: pd.DataFrame
                         ) -> DataFrame:
    """Union-find on a driver-resident edge list + broadcast label join."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges["doc_a"].tolist(), edges["doc_b"].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps roots canonical as we go
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = list(parent)
    roots = [find(n) for n in nodes]
    sizes: dict = {}
    for r in roots:
        sizes[r] = sizes.get(r, 0) + 1
    for r in list(sizes):
        sizes[r] += 1  # the root node itself carries no parent entry
    # id type follows the input (the operator is payload-agnostic —
    # long doc ids, string urls, ... all order and union-find the same)
    id_type = docs.schema["doc_id"].dataType.simpleString()
    mapping = pd.DataFrame({
        "doc_id": nodes + list(sizes),
        "canonical_doc_id": roots + list(sizes),
        "cluster_size": np.asarray(
            [sizes[r] for r in roots] + [sizes[r] for r in sizes],
            dtype=np.int64)})
    spark = docs.sparkSession
    lab = spark.createDataFrame(
        mapping, schema="doc_id %s, canonical_doc_id %s, "
                        "cluster_size long" % (id_type, id_type))
    return (docs.select("doc_id")
            .join(F.broadcast(lab), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("canonical_doc_id", F.col("doc_id"))
                .alias("canonical_doc_id"),
                F.coalesce("cluster_size", F.lit(1).cast("long"))
                .alias("cluster_size")))


def _dup_clusters_distributed(docs: DataFrame, pairs: DataFrame,
                              max_iter: int) -> DataFrame:
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .union(pairs.select(F.col("doc_b").alias("src"),
                                 F.col("doc_a").alias("dst")))
             .distinct()
             .repartition("dst")
             .cache())
    labels = (edges.select(F.col("src").alias("node"))
              .union(edges.select(F.col("dst").alias("node")))
              .distinct()
              .select("node", F.col("node").alias("label"))
              .localCheckpoint(eager=True))
    converged = labels.isEmpty()  # no pairs → nothing to propagate
    for _ in range(max_iter):
        if converged:
            break
        prop = (edges.join(labels, edges["dst"] == labels["node"])
                .select(F.col("src").alias("node"), "label"))
        merged = (labels.unionByName(prop)
                  .groupBy("node").agg(F.min("label").alias("label")))
        # pointer jump: every label value is itself a node key in
        # `merged` (labels are node ids and merged covers all nodes),
        # so the lookup always hits; coalesce guards the empty frame
        jumped = (merged.join(
            merged.select(F.col("node").alias("label"),
                          F.col("label").alias("_l2")),
            "label", "left")
            .select("node", F.coalesce("_l2", "label").alias("label")))
        new_labels = jumped.localCheckpoint(eager=True)
        changed = (new_labels
                   .join(labels.withColumnRenamed("label", "_old"), "node")
                   .where(F.col("label") < F.col("_old"))
                   .count())
        labels = new_labels
        converged = changed == 0
    if not converged:
        raise RuntimeError(
            "dup_clusters did not converge in %d rounds — pathological "
            "graph diameter; raise max_iter" % max_iter)
    out = (docs.select("doc_id")
           .join(labels.withColumnRenamed("node", "doc_id"), "doc_id",
                 "left")
           .select("doc_id",
                   F.coalesce("label", F.col("doc_id"))
                   .alias("canonical_doc_id")))
    out = out.withColumn(
        "cluster_size",
        F.count("*").over(Window.partitionBy("canonical_doc_id")))
    return _unpersist_on_gc(out, [edges])


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       n_chunks: int = 4, best_effort: bool = False,
                       max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, chunk-banded.

    Pigeonhole: two fingerprints within hamming k share at least one of
    ``n_chunks`` equal-width chunks exactly whenever ``k < n_chunks``,
    so candidates meet in chunk buckets instead of all-pairs.  The
    defaults (k=3, 4 chunks of 16 bits) are an *honest* pairing — full
    recall, and 16-bit buckets keep sizes at n/65536.  Asking for a
    larger k either needs more chunks (narrower buckets of 64/n_chunks
    bits — mind the n/2^width bucket size at scale) or an explicit
    ``best_effort=True`` acknowledging the missing recall guarantee.
    Chunk buckets above ``max_bucket`` are dropped before the self-join
    (same hot-bucket guard as the MinHash path).
    """
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    if max_hamming >= n_chunks and not best_effort:
        raise ValueError(
            "max_hamming=%d exceeds the recall guarantee of %d chunks "
            "(guaranteed only for hamming < n_chunks); pass more chunks "
            "or best_effort=True" % (max_hamming, n_chunks))
    width = 64 // n_chunks
    mask = (1 << width) - 1
    fps = simhash(docs)
    # one explode, not a per-chunk union (a union would re-run the
    # Python fingerprint kernel once per chunk); cache so the self-join
    # sides share one kernel pass
    chunk_arr = F.array(*[
        F.struct(F.lit(c).alias("chunk_id"),
                 F.shiftright(F.col("simhash"), c * width)
                 .bitwiseAND(F.lit(mask)).alias("chunk_val"))
        for c in range(n_chunks)])
    banded = (fps.select("doc_id", "simhash",
                         F.explode(chunk_arr).alias("c"))
              .select("doc_id", "simhash", "c.chunk_id", "c.chunk_val"))
    banded = _cap_buckets(banded, ["chunk_id", "chunk_val"],
                          max_bucket).cache()
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (a.join(b, ["chunk_id", "chunk_val"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("a.simhash").alias("fp_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("b.simhash").alias("fp_b"))
             .distinct())
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    out = pairs.select("doc_a", "doc_b",
                       hamming.alias("hamming")) \
        .where(F.col("hamming") <= max_hamming)
    return _unpersist_on_gc(out, [banded])


def leakage_free_split(clusters: DataFrame, train_frac: float = 0.9,
                       seed: int = 0) -> DataFrame:
    """Cluster-aware train/validation split — the leakage guard.

    Splitting documents independently leaks: two near-duplicates can
    land one in train and one in validation, and the model is then
    evaluated on (a paraphrase of) its own training data.  Assigning
    the SPLIT to the duplicate cluster — a deterministic md5 coin flip
    on ``canonical_doc_id`` alone — makes straddling impossible by
    construction: every member inherits its canonical's draw.

    Pure projection over :func:`dup_clusters` output (zero additional
    shuffles); the 8-hex-char lexicographic threshold is the same
    engine-portable U(0,1) convention as corpus.stratified_sample, so
    any engine replays the identical split.
    """
    thr = format(min(int(train_frac * 2 ** 32), 2 ** 32 - 1), "08x")
    ticket = F.substring(
        F.md5(F.concat(F.lit("split%d:" % seed),
                       F.col("canonical_doc_id").cast("string"))), 1, 8)
    return clusters.select(
        "doc_id", "canonical_doc_id",
        F.when(ticket < thr, F.lit("train"))
        .otherwise(F.lit("valid")).alias("split"))
