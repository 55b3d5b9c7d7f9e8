"""Partitioned blocked-bloom filter for URL-seen membership at 10^10 scale.

State shape (north rule): a table ``url_seen_bloom(block_id int, bitmap
binary)`` keyed by ``murmur3(canonical_url)``.  Each key maps to exactly
one block (cache-friendly, mergeable per-partition) and k bit positions
inside it derived from the key by an splitmix64 mix — everything is a pure
function of the int32 key, so driver, executors and the oracle agree.

Scale design:

* blocks are built as per-round **deltas** with ``applyInPandas`` grouped
  by block_id (map-side combine: each partition contributes only the
  blocks it touched), then OR-merged into state — a MERGE INTO on Iceberg;
* membership tests join candidate keys to their block (one int key join,
  broadcastable while the filter is small, shuffle-hash at full scale)
  and test bits vectorized in numpy;
* the bloom is a *prefilter*: a negative answer is definitive (drop fast,
  no exact lookup), a positive falls through to the exact key anti-join,
  so false positives cost work but never correctness — the final decision
  stays byte-identical to the oracle's exact set.

Sizing: with 2^20 blocks × 4 KiB the filter holds ~10^10 keys at ~3.4
bits/key with k=3; the sandbox default is tiny (tests) but the layout is
scale-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


class BloomSpec:
    def __init__(self, n_blocks: int = 1024, block_bytes: int = 256,
                 k: int = 3):
        self.n_blocks = n_blocks
        self.block_bytes = block_bytes
        self.k = k

    @property
    def block_bits(self) -> int:
        return self.block_bytes * 8


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized) — uniform bits from int32 keys."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def key_block_ids(keys: np.ndarray, spec: BloomSpec) -> np.ndarray:
    return (keys.astype(np.int64) % spec.n_blocks).astype(np.int32)


def key_bit_positions(keys: np.ndarray, spec: BloomSpec) -> np.ndarray:
    """(len(keys), k) bit positions inside each key's block.

    Each mix round yields four independent 16-bit lanes; k > 4 re-mixes
    for the next four lanes so every shift stays < 64 (a uint64 shift
    >= the bit width is undefined in numpy) and build/probe sides agree
    for ANY k.  Lanes 0-3 are unchanged from the original derivation.
    """
    words = _mix64(np.asarray(keys, dtype=np.int64))
    cols = []
    for i in range(spec.k):
        lane = i % 4
        if i and lane == 0:
            words = _mix64(words.astype(np.int64))
        cols.append(((words >> np.uint64(16 * lane))
                     % np.uint64(spec.block_bits)).astype(np.int64))
    return np.stack(cols, axis=1)


def _or_reduce_blocks(block_ids: np.ndarray, bitmaps: np.ndarray
                      ) -> pd.DataFrame:
    """OR together bitmaps sharing a block id (vectorized reduceat)."""
    order = np.argsort(block_ids, kind="stable")
    ids = block_ids[order]
    stacked = bitmaps[order]
    boundaries = np.flatnonzero(np.diff(ids)) + 1
    starts = np.concatenate(([0], boundaries))
    merged = np.bitwise_or.reduceat(stacked, starts, axis=0)
    return pd.DataFrame({
        "block_id": ids[starts].astype("int32"),
        "bitmap": [row.tobytes() for row in merged],
    })


def build_delta(keys_df: DataFrame, spec: BloomSpec,
                key_col: str = "url_key") -> DataFrame:
    """Keys → per-block delta bitmaps: (block_id int, bitmap binary).

    Two partition-level kernels (NOT per-group applyInPandas — thousands
    of tiny groups pay ~ms of Arrow overhead each): every partition emits
    its partial block bitmaps (map-side combine), then partials are
    shuffled on block_id and OR-merged within partitions.
    """
    def partials(batches):
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            if not len(keys):
                continue
            blocks = key_block_ids(keys, spec)
            positions = key_bit_positions(keys, spec)
            # allocate only the touched blocks (n_blocks can be 2^20+)
            touched, inverse = np.unique(blocks, return_inverse=True)
            bits = np.zeros((len(touched), spec.block_bits), dtype=bool)
            bits[np.repeat(inverse, spec.k), positions.reshape(-1)] = True
            packed = np.packbits(bits, axis=1)
            yield pd.DataFrame({
                "block_id": touched.astype("int32"),
                "bitmap": [row.tobytes() for row in packed],
            })

    partial_df = keys_df.select(key_col).mapInPandas(
        partials, "block_id int, bitmap binary")
    return _merge_bitmap_rows(partial_df, spec)


def _merge_bitmap_rows(blocks_df: DataFrame, spec: BloomSpec) -> DataFrame:
    def merge(batches):
        # accumulate across ALL Arrow batches of the partition first —
        # a partition larger than the Arrow batch size arrives split,
        # and emitting per batch would leave duplicate partial blocks
        ids = []
        maps = []
        for pdf in batches:
            if len(pdf):
                ids.append(pdf["block_id"].to_numpy())
                maps.append(np.stack([
                    np.frombuffer(bytes(b), dtype=np.uint8)
                    for b in pdf["bitmap"]]))
        if ids:
            yield _or_reduce_blocks(np.concatenate(ids),
                                    np.concatenate(maps))

    return blocks_df.repartition(F.col("block_id")).mapInPandas(
        merge, "block_id int, bitmap binary")


def merge_blocks(state_df: DataFrame | None, delta_df: DataFrame,
                 spec: BloomSpec) -> DataFrame:
    """OR-merge delta bitmaps into state (the MERGE INTO equivalent)."""
    both = delta_df if state_df is None else state_df.unionByName(delta_df)
    return _merge_bitmap_rows(both, spec)


def might_contain(candidates: DataFrame, state_df: DataFrame,
                  spec: BloomSpec, key_col: str = "url_key") -> DataFrame:
    """Append ``maybe_seen`` (bool) to candidates via a block join.

    False is definitive (the key was never added); True falls through to
    the exact check.  Keys whose block doesn't exist yet are definitively
    unseen (left join → null bitmap → False).  The bit test is one
    vectorized partition-level kernel after a broadcast block join.
    """
    # F.pmod, NOT %: the JVM remainder is negative for negative keys,
    # while the build-side numpy kernel uses positive modulo
    with_block = candidates.withColumn(
        "block_id",
        F.pmod(F.col(key_col).cast("long"), F.lit(spec.n_blocks))
        .cast("int"))
    # broadcast only while the whole filter is small; a production-sized
    # filter (2^20 × 4 KiB ≈ 4 GiB) must shuffle-hash join instead
    state_bytes = spec.n_blocks * spec.block_bytes
    if state_bytes <= 64 * 1024 * 1024:
        state_side = F.broadcast(state_df)
    else:
        state_side = state_df.hint("shuffle_hash")
    joined = with_block.join(state_side, "block_id", "left")
    out_schema = ", ".join(
        "%s %s" % (f.name, f.dataType.simpleString())
        for f in candidates.schema.fields) + ", maybe_seen boolean"
    out_cols = [f.name for f in candidates.schema.fields] + ["maybe_seen"]

    def check(batches):
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=bool)
            have = pdf["bitmap"].notna().to_numpy()
            if have.any():
                keys = pdf[key_col].to_numpy()[have]
                positions = key_bit_positions(keys, spec)
                bitmaps = np.stack([
                    np.unpackbits(np.frombuffer(bytes(b), dtype=np.uint8))
                    for b in pdf["bitmap"][have]])
                out[have] = np.take_along_axis(
                    bitmaps, positions, axis=1).all(axis=1)
            result = pdf.drop(columns=["bitmap", "block_id"])
            result["maybe_seen"] = out
            yield result[out_cols]

    return joined.mapInPandas(check, out_schema)
