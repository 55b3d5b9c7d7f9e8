"""Pluggable URL-seen prefilter backends for the crawl round loop.

The north rule names a "blocked-bloom/cuckoo filter" for URL-seen
membership.  Both arms exist (bloom.py, cuckoo.py); this module is the
seam that lets the round loop (rounds.py) run either without caring
which.  The contract mirrors how the loop consumes the filter:

* ``round_delta(new_keys, rounds_df, round_id)`` — the per-round rows
  to append to the filter's state table.  Bloom deltas are fresh
  bitmaps that OR-merge associatively at read time (rounds_df unused);
  cuckoo deltas are the new full bytes of only the shards that received
  keys — the Iceberg MERGE INTO shape, O(touched shards) per round.
* ``prefilter(candidates, rounds_df)`` — append ``maybe_seen``; False
  is definitive, True falls through to the loop's exact anti-join, so
  either backend preserves byte-parity with the oracle scheduler by
  construction.
* ``table`` — the state-table name the deltas append to, kept distinct
  per backend so a crawl switching backends mid-life cannot mix
  incompatible row schemas.

Both backends keep the loop's O(new URLs)-per-round write discipline;
the difference is read-side merge (bloom ORs all deltas, cuckoo takes
the latest bytes per shard) and that only the cuckoo can later evict a
key for the recrawl scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scrapely_spark.frontier import bloom as bloomlib
from scrapely_spark.frontier import cuckoo as cuckoolib
from scrapely_spark.frontier.bloom import BloomSpec
from scrapely_spark.frontier.cuckoo import CuckooSpec


class BloomSeenFilter:
    """Append-only blocked-bloom arm (the default)."""

    table = "bloom"

    def __init__(self, spec: BloomSpec | None = None):
        self.spec = spec or BloomSpec()

    def round_delta(self, new_keys: DataFrame, rounds_df: DataFrame | None,
                    round_id: int) -> DataFrame:
        return bloomlib.build_delta(new_keys, self.spec)

    def prefilter(self, candidates: DataFrame,
                  rounds_df: DataFrame | None) -> DataFrame:
        if rounds_df is None:
            # no prior state: every key is definitively unseen (the
            # left join in might_contain sees only null bitmaps) —
            # mirrors the cuckoo arm's empty-state behaviour
            state = candidates.sparkSession.createDataFrame(
                [], "block_id int, bitmap binary")
        else:
            state = bloomlib.merge_blocks(None, rounds_df, self.spec)
        return bloomlib.might_contain(candidates, state, self.spec)


class CuckooSeenFilter:
    """Deletable cuckoo arm — MERGE-shaped per-round shard rewrites."""

    table = "cuckoo"

    def __init__(self, spec: CuckooSpec | None = None):
        self.spec = spec or CuckooSpec()

    def _latest(self, rounds_df: DataFrame | None) -> DataFrame | None:
        """Current filter bytes: the highest-(round, seq) row per shard.
        One slim shuffle over O(shards · rounds) rows, never the key
        data.  ``seq`` orders writes WITHIN a round (insert=0, evict=1)
        so a round that both inserts and evicts the same shard resolves
        deterministically; pre-seq state rows order as seq=0."""
        if rounds_df is None:
            return None
        if "seq" not in rounds_df.columns:
            rounds_df = rounds_df.withColumn("seq", F.lit(0))
        key = F.struct(F.col("round_id"), F.col("seq"))
        return rounds_df.groupBy("shard").agg(
            F.max_by("slots", key).alias("slots"),
            F.max_by("stash", key).alias("stash"))

    def round_delta(self, new_keys: DataFrame, rounds_df: DataFrame | None,
                    round_id: int) -> DataFrame:
        prev = self._latest(rounds_df)
        if prev is not None:
            # rewrite only shards receiving keys this round
            touched = new_keys.select(
                F.pmod(F.col("url_key").cast("long"),
                       F.lit(self.spec.n_shards)).cast("int")
                .alias("shard")).distinct()
            prev = prev.join(touched, "shard", "left_semi")
        return cuckoolib.insert(prev, new_keys, self.spec) \
            .withColumn("round_id", F.lit(round_id)) \
            .withColumn("seq", F.lit(0))

    def prefilter(self, candidates: DataFrame,
                  rounds_df: DataFrame | None) -> DataFrame:
        state = self._latest(rounds_df)
        if state is None:
            state = candidates.sparkSession.createDataFrame(
                [], cuckoolib._STATE_SCHEMA)
        return cuckoolib.might_contain(candidates, state, self.spec)

    def evict_delta(self, evict_keys: DataFrame,
                    rounds_df: DataFrame | None,
                    round_id: int) -> DataFrame:
        """Recrawl eviction: delete previously-seen keys from the filter
        so a re-enqueued URL passes the prefilter again.  Same MERGE
        shape as round_delta — only touched shards are rewritten."""
        prev = self._latest(rounds_df)
        if prev is None:
            raise ValueError("evict_delta needs prior filter state; "
                             "nothing has been inserted yet")
        touched = evict_keys.select(
            F.pmod(F.col("url_key").cast("long"),
                   F.lit(self.spec.n_shards)).cast("int")
            .alias("shard")).distinct()
        prev = prev.join(touched, "shard", "left_semi")
        return cuckoolib.delete(prev, evict_keys, self.spec) \
            .withColumn("round_id", F.lit(round_id)) \
            .withColumn("seq", F.lit(1))
