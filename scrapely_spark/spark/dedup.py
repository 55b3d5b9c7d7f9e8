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
* embedding near-dup (cosine within coarse buckets, see simsearch).

MinHash hashes are ``md5(shingle || seed)`` — chosen because md5 of a
string is bit-identical in Spark and DuckDB, which lets the correctness
driver validate the whole signature pipeline against a pure-SQL oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

N_HASHES = 8
BAND_SIZE = 2  # hashes per band → N_HASHES/BAND_SIZE bands


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


def _shingles(n: int = 3):
    """Word n-gram shingles of the text column (JVM array expr)."""
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    # F.get is null-safe out of bounds (element_at raises under ANSI mode)
    return F.transform(
        idx, lambda i: F.concat(
            *sum([[F.get(words, i + k)] + ([F.lit(" ")] if k < n - 1 else [])
                  for k in range(n)], [])))


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES
                       ) -> DataFrame:
    """Per-document MinHash signature: sig_k = min(md5(shingle||'#k'))."""
    # docs shorter than one shingle would all hash to the same NULL-band
    # bucket and quadratically blow up the candidate join — drop them
    # (they can't be near-dups by n-gram similarity anyway)
    long_enough = docs.where(
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 3)
    # materialize the shingle array in its own projection: inlining the
    # expression into all k signature columns would re-run the regex
    # split + n-gram build k times per row
    with_shingles = long_enough.select("doc_id", _shingles().alias("shingles"))

    def _sig(k):
        # NB: a two-arg lambda would be read by F.transform as (elem, index)
        return F.array_min(F.transform(
            F.col("shingles"),
            lambda s: F.md5(F.concat(s, F.lit("#%d" % k)))))

    return with_shingles.select(
        "doc_id", *[_sig(k).alias("sig_%d" % k) for k in range(n_hashes)])


def minhash_bands(docs: DataFrame, n_hashes: int = N_HASHES,
                  band_size: int = BAND_SIZE) -> DataFrame:
    """(doc_id, band_id, band_key): LSH bucketing of the signatures."""
    sigs = minhash_signatures(docs, n_hashes)
    bands = []
    for b in range(n_hashes // band_size):
        key = F.md5(F.concat_ws(
            "|", *[F.col("sig_%d" % (b * band_size + k))
                   for k in range(band_size)]))
        bands.append(sigs.select(
            "doc_id", F.lit(b).alias("band_id"), key.alias("band_key")))
    out = bands[0]
    for df in bands[1:]:
        out = out.unionByName(df)
    return out


def minhash_candidates(docs: DataFrame) -> DataFrame:
    """Candidate near-dup pairs: documents sharing any LSH band bucket."""
    # cache: a self-join of an unmaterialized plan computes the whole
    # signature pipeline once per side
    bands = minhash_bands(docs).cache()
    a = bands.alias("a")
    b = bands.alias("b")
    return (a.join(b, ["band_id", "band_key"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard for banded candidates (verify stage).

    Explode shingles once, join candidates to shingle sets, compute
    |A∩B| / |A∪B| with groupBy counts — no per-row Python anywhere.
    """
    # the exploded shingle set feeds three consumers (sizes, both join
    # sides); cache it so the regex tokenization runs once
    sh = docs.select("doc_id", F.explode(F.array_distinct(_shingles()))
                     .alias("shingle")).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    cands = minhash_candidates(docs)
    # count common shingles by joining candidates through the shingle value
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle"))
    common = (cands.join(sh_a, "doc_a").join(sh_b, ["doc_b", "shingle"])
              .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_common")))
    return (common
            .join(sizes.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("n", "n_a"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b")
                  .withColumnRenamed("n", "n_b"), "doc_b")
            .select("doc_a", "doc_b",
                    F.round(F.col("n_common")
                            / (F.col("n_a") + F.col("n_b")
                               - F.col("n_common")), 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


_SIMHASH_SCHEMA = "doc_id long, simhash long"


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per document (vectorized numpy batch kernel).

    Each token votes its 64 hash bits weighted ±1; the sign pattern of
    the vote vector is the fingerprint.  Not SQL-expressible (bit voting),
    so the correctness driver records the rows-only check for this one.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib
        for batch in batches:
            out = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                tokens = str(text).lower().split()
                votes = np.zeros(64, dtype=np.int64)
                for t in tokens:
                    h = (zlib.crc32(t.encode()) << 32) | zlib.crc32(
                        (t + "#").encode())
                    bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)
                            ) & np.uint64(1)
                    votes += np.where(bits.astype(bool), 1, -1)
                fp = np.uint64(0)
                for i in np.flatnonzero(votes > 0):
                    fp |= np.uint64(1) << np.uint64(i)
                out.append({"doc_id": int(doc_id),
                            "simhash": int(fp.astype(np.int64))})
            yield pd.DataFrame(out, columns=["doc_id", "simhash"])

    return docs.select("doc_id", "text").mapInPandas(kernel, _SIMHASH_SCHEMA)


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded by 16-bit chunks.

    Two fingerprints within hamming k share at least one of 4 16-bit
    chunks exactly (pigeonhole, k<=3 guarantees; larger k is best-effort),
    so candidates meet in chunk buckets instead of all-pairs.
    """
    fps = simhash(docs)
    chunks = []
    for c in range(4):
        chunk = (F.shiftright(F.col("simhash"), c * 16)
                 .bitwiseAND(F.lit(0xFFFF)))
        chunks.append(fps.select("doc_id", "simhash",
                                 F.lit(c).alias("chunk_id"),
                                 chunk.alias("chunk_val")))
    banded = chunks[0]
    for df in chunks[1:]:
        banded = banded.unionByName(df)
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
    return pairs.select("doc_a", "doc_b",
                        hamming.alias("hamming")) \
        .where(F.col("hamming") <= max_hamming)
