"""Partitioned (blocked) cuckoo filter — the deletable URL-seen variant.

The north rule names "blocked-bloom/cuckoo filter" for URL-seen
membership; bloom.py is the append-only arm, this module is the cuckoo
arm.  What the cuckoo buys over the bloom is **deletion**: a recrawl
scheduler (see canonical.recrawl_schedule) that re-enqueues a URL must
first evict it from the seen filter, and a bloom cannot unset bits
shared with other keys.  The price is a different state-maintenance
shape: bloom deltas OR-merge associatively (append-only writes), cuckoo
shards must be read-modify-written (the Iceberg MERGE INTO pattern —
per-round writes touch only the shards receiving keys).

Layout (partial-key cuckoo hashing, Fan et al., CoNEXT'14):

* the key space is split into ``n_shards`` independent sub-filters so
  insertion — inherently sequential under eviction chains — is
  embarrassingly parallel across shards while staying deterministic
  within one;
* a shard row is ``(shard int, slots binary, stash binary)``: ``slots``
  is a ``shard_buckets × bucket_slots`` little-endian uint16 fingerprint
  array (0 = empty), ``stash`` a sorted uint16 overflow list that keeps
  the no-false-negative guarantee even past the load knee (empty when
  the filter is sized right);
* every placement is a pure function of the int32 ``url_key``
  (murmur3(canonical_url), the same key the bloom uses): the shard is
  ``pmod(url_key, n_shards)`` — plain JVM column math, like the bloom's
  block routing, so the shuffle needs no wrap-around arithmetic ANSI
  mode would reject — while fingerprint and home bucket come from one
  splitmix64 mix of the key; the alternate bucket is
  ``i ^ (mix(fp) % shard_buckets)`` — computable from (bucket, fp) alone,
  which is what lets an eviction relocate a resident fingerprint without
  knowing its key.  ``shard_buckets`` is a power of two so the xor stays
  in range and the involution ``alt(alt(i)) == i`` holds.

Probe semantics match the bloom's prefilter contract: **False is
definitive** (never inserted), True falls through to the exact anti-join,
so false positives cost work but never correctness.  With 16-bit
fingerprints and 4 slots the FPR is ~2·4/2^16 ≈ 0.012% at 95% load —
~18 bits/key of state for a 10^10-URL frontier ≈ 21 GiB sharded across
executors.

Determinism: inserts within a shard are applied in ascending
``url_key`` order regardless of partitioning, and eviction victims are
chosen by a deterministic rotation, so the final state bytes are a pure
function of (prior state bytes, inserted key multiset) — pinned by
tests/test_cuckoo.py::test_partitioning_invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from scrapely_spark.frontier.bloom import _mix64

_STATE_SCHEMA = "shard int, slots binary, stash binary"


class CuckooSpec:
    def __init__(self, n_shards: int = 64, shard_buckets: int = 256,
                 bucket_slots: int = 4, max_kicks: int = 500):
        if shard_buckets & (shard_buckets - 1):
            raise ValueError("shard_buckets must be a power of two "
                             "(the alternate-bucket xor must stay in "
                             "range); got %d" % shard_buckets)
        self.n_shards = n_shards
        self.shard_buckets = shard_buckets
        self.bucket_slots = bucket_slots
        self.max_kicks = max_kicks
        self._fp_alt = None

    def __getstate__(self):
        # the alt table is derived state — recompute on the worker
        # instead of shipping 512 KiB inside every serialized task
        state = self.__dict__.copy()
        state["_fp_alt"] = None
        return state

    @property
    def n_slots(self) -> int:
        return self.shard_buckets * self.bucket_slots

    @property
    def fp_alt(self) -> np.ndarray:
        """``mix(fp) % shard_buckets`` for every 16-bit fingerprint —
        the xor offset to the partner bucket.  Precomputed once (128 KiB)
        so the sequential insert/eviction loop does scalar table lookups
        instead of building a numpy array per kick."""
        if self._fp_alt is None:
            self._fp_alt = (_mix64(np.arange(65536, dtype=np.int64))
                            % np.uint64(self.shard_buckets)).astype(
                                np.int64)
        return self._fp_alt


def key_parts(keys: np.ndarray, spec: CuckooSpec
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(shard, home bucket, fingerprint) for each int32 key — the whole
    placement, vectorized, from one splitmix64 mix (same mixer as the
    bloom, so the two filters share no correlated structure with the
    murmur3 key itself)."""
    keys64 = np.asarray(keys, dtype=np.int64)
    mixed = _mix64(keys64)
    fp = (mixed & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks an empty slot
    # numpy's % floors like Spark's pmod, so negative keys agree
    shard = (keys64 % spec.n_shards).astype(np.int32)
    bucket = ((mixed >> np.uint64(16)) % np.uint64(spec.shard_buckets)) \
        .astype(np.int64)
    return shard, bucket, fp


def alt_bucket(bucket: np.ndarray, fp: np.ndarray, spec: CuckooSpec
               ) -> np.ndarray:
    """The partner bucket — from (bucket, fp) alone, an involution."""
    return bucket ^ spec.fp_alt[np.asarray(fp, dtype=np.int64)]


def _empty_shard(spec: CuckooSpec) -> np.ndarray:
    return np.zeros(spec.n_slots, dtype=np.uint16)


def _insert_into_shard(slots: np.ndarray, stash: list,
                       buckets: np.ndarray, fps: np.ndarray,
                       spec: CuckooSpec) -> None:
    """Insert (bucket, fp) pairs into one shard's slot array, in the
    order given (callers sort by url_key for determinism).  Mutates
    ``slots``/``stash`` in place.

    Per-key work is the classic sequential cuckoo insert: try a free
    slot in the home bucket, then the alternate, then kick a resident —
    the victim slot rotates deterministically with the kick count so
    re-runs reproduce the same bytes.  A chain past ``max_kicks`` lands
    the wandering fingerprint in the stash (kept sorted at pack time),
    preserving no-false-negatives instead of failing the job at the
    load knee.
    """
    view = slots.reshape(spec.shard_buckets, spec.bucket_slots)
    bs = spec.bucket_slots
    fp_alt = spec.fp_alt
    alts = np.asarray(buckets, dtype=np.int64) ^ fp_alt[
        np.asarray(fps, dtype=np.int64)]
    for b, a, f in zip(buckets.tolist(), alts.tolist(), fps.tolist()):
        placed = False
        for cand in (b, a):
            row = view[cand]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = f
                placed = True
                break
        if placed:
            continue
        # both buckets full: evict.  Deterministic victim rotation —
        # slot index cycles with the kick count, bucket alternates via
        # the partial-key xor of the *evicted* fingerprint (scalar
        # table lookup — no array construction inside the chain).
        cur_b, cur_f = b, f
        for kick in range(spec.max_kicks):
            row = view[cur_b]
            victim = kick % bs
            cur_f, row[victim] = int(row[victim]), cur_f
            cur_b = cur_b ^ int(fp_alt[cur_f])
            row = view[cur_b]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = cur_f
                break
        else:
            stash.append(cur_f)


def _unpack_shard(row, spec: CuckooSpec) -> tuple[np.ndarray, list]:
    slots = np.frombuffer(bytes(row["slots"]), dtype="<u2").copy()
    stash = np.frombuffer(bytes(row["stash"]), dtype="<u2").tolist() \
        if len(row["stash"]) else []
    if len(slots) != spec.n_slots:
        raise ValueError(
            "shard %s has %d slots; spec says %d — the filter must be "
            "probed/updated with the spec it was built with"
            % (row["shard"], len(slots), spec.n_slots))
    return slots, stash


def _pack_shard(shard: int, slots: np.ndarray, stash: list) -> dict:
    return {"shard": int(shard),
            "slots": slots.astype("<u2").tobytes(),
            "stash": np.sort(np.asarray(stash, dtype="<u2")).tobytes()}


def insert(state_df: DataFrame | None, keys_df: DataFrame,
           spec: CuckooSpec, key_col: str = "url_key") -> DataFrame:
    """New filter state with ``keys_df``'s keys inserted.

    The MERGE INTO shape: keys shuffle to their shard, each touched
    shard is read-modify-written in one ``cogroup.applyInPandas`` group
    (sequential *within* the shard — the cuckoo invariant — parallel
    across shards), untouched shards pass through byte-identical.  The
    per-round write cost is O(touched shards), not O(total state): a
    round inserting k keys touches ≤ min(k, n_shards) shard rows.

    Keys are deduplicated per call (a seen-filter is a set); inserting
    a key already present from a *prior* call adds a second fingerprint
    copy — callers route only never-seen URLs here (the frontier's
    exact anti-join guarantees that), and delete() removes one copy.
    """
    spark = keys_df.sparkSession
    shard_of = F.pmod(F.col(key_col).cast("long"),
                      F.lit(spec.n_shards)).cast("int").alias("shard")
    keyed = keys_df.select(F.col(key_col).alias("url_key"), shard_of)
    if state_df is None:
        state_df = spark.createDataFrame([], _STATE_SCHEMA)

    def merge_shard(pdf_keys: pd.DataFrame, pdf_state: pd.DataFrame
                    ) -> pd.DataFrame:
        if len(pdf_state) > 1:
            raise ValueError("duplicate state rows for shard %s"
                             % pdf_state["shard"].iloc[0])
        if len(pdf_state):
            slots, stash = _unpack_shard(pdf_state.iloc[0], spec)
            shard = int(pdf_state["shard"].iloc[0])
        else:
            slots, stash = _empty_shard(spec), []
            shard = int(pdf_keys["shard"].iloc[0])
        if len(pdf_keys):
            keys = np.unique(pdf_keys["url_key"].to_numpy(np.int64))
            _, buckets, fps = key_parts(keys, spec)
            _insert_into_shard(slots, stash, buckets, fps, spec)
        return pd.DataFrame([_pack_shard(shard, slots, stash)])

    return (keyed.groupBy("shard")
            .cogroup(state_df.groupBy("shard"))
            .applyInPandas(merge_shard, _STATE_SCHEMA))


def delete(state_df: DataFrame, keys_df: DataFrame, spec: CuckooSpec,
           key_col: str = "url_key") -> DataFrame:
    """Remove one fingerprint copy per key — the recrawl-eviction path.

    Classic cuckoo-filter contract: deleting a key that was previously
    inserted (and not yet deleted) is safe; deleting a never-inserted
    key may remove a colliding key's fingerprint and break that key's
    no-false-negative guarantee — callers only evict URLs the recrawl
    scheduler took *from the seen set*, which satisfies it.  A key whose
    fingerprint is absent from both buckets and the stash is a no-op.
    """
    shard_of = F.pmod(F.col(key_col).cast("long"),
                      F.lit(spec.n_shards)).cast("int").alias("shard")
    keyed = keys_df.select(F.col(key_col).alias("url_key"), shard_of)

    def evict_shard(pdf_keys: pd.DataFrame, pdf_state: pd.DataFrame
                    ) -> pd.DataFrame:
        if not len(pdf_state):
            return pd.DataFrame(
                [], columns=["shard", "slots", "stash"])
        slots, stash = _unpack_shard(pdf_state.iloc[0], spec)
        shard = int(pdf_state["shard"].iloc[0])
        if len(pdf_keys):
            view = slots.reshape(spec.shard_buckets, spec.bucket_slots)
            keys = np.unique(pdf_keys["url_key"].to_numpy(np.int64))
            _, buckets, fps = key_parts(keys, spec)
            alts = alt_bucket(buckets, fps, spec)
            for b, a, f in zip(buckets.tolist(), alts.tolist(),
                               fps.tolist()):
                hit = np.flatnonzero(view[b] == f)
                if len(hit):
                    view[b][hit[0]] = 0
                    continue
                hit = np.flatnonzero(view[a] == f)
                if len(hit):
                    view[a][hit[0]] = 0
                elif f in stash:
                    stash.remove(f)
        return pd.DataFrame([_pack_shard(shard, slots, stash)])

    return (keyed.groupBy("shard")
            .cogroup(state_df.groupBy("shard"))
            .applyInPandas(evict_shard, _STATE_SCHEMA))


def might_contain(candidates: DataFrame, state_df: DataFrame,
                  spec: CuckooSpec, key_col: str = "url_key"
                  ) -> DataFrame:
    """Append ``maybe_seen`` (bool): fingerprint present in either
    bucket or the stash.  Same contract as bloom.might_contain — False
    is definitive, True falls through to the exact anti-join.

    Shape: one ``cogroup.applyInPandas`` on the shard key — the same
    MERGE-style grouping insert/delete use — so each shard's 2 KiB
    state crosses the Python boundary ONCE per shard instead of being
    join-duplicated onto every candidate row (the previous shape
    shipped |candidates| × 2 KiB through Arrow — ~300 MB at the sf0.1
    frontier — and probed row-at-a-time in Python; this one is a
    single vectorized gather per shard).  Per-shard candidate groups
    must fit in worker memory, the constraint insert/delete already
    impose; ``n_shards`` scales with the frontier exactly as it must
    for their insert parallelism.
    """
    with_shard = candidates.withColumn(
        "shard",
        F.pmod(F.col(key_col).cast("long"),
               F.lit(spec.n_shards)).cast("int"))
    out_schema = ", ".join(
        "%s %s" % (f.name, f.dataType.simpleString())
        for f in candidates.schema.fields) + ", maybe_seen boolean"
    out_cols = [f.name for f in candidates.schema.fields] + ["maybe_seen"]

    def check_shard(pdf_cand: pd.DataFrame, pdf_state: pd.DataFrame
                    ) -> pd.DataFrame:
        result = pdf_cand.drop(columns=["shard"])
        out = np.zeros(len(pdf_cand), dtype=bool)
        if len(pdf_cand) and len(pdf_state):
            row = pdf_state.iloc[0]
            slots = np.frombuffer(bytes(row["slots"]), dtype="<u2")
            view = slots.reshape(spec.shard_buckets, spec.bucket_slots)
            keys = pdf_cand[key_col].to_numpy()
            _, buckets, fps = key_parts(keys, spec)
            alts = alt_bucket(buckets, fps, spec)
            hit = ((view[buckets] == fps[:, None]).any(axis=1)
                   | (view[alts] == fps[:, None]).any(axis=1))
            st = b"" if row["stash"] is None else bytes(row["stash"])
            if len(st):
                stash = np.frombuffer(st, dtype="<u2")
                hit |= np.isin(fps, stash)
            out[:] = hit
        result = result.copy()
        result["maybe_seen"] = out
        return result[out_cols]

    return (with_shard.groupBy("shard")
            .cogroup(state_df.groupBy("shard"))
            .applyInPandas(check_shard, out_schema))


def load_factor(state_df: DataFrame, spec: CuckooSpec) -> DataFrame:
    """(shard, occupied, capacity, load, stash_len) — the resize signal.
    Slim: one row per shard, aggregated in a vectorized kernel."""
    def stats(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            occ = [int((np.frombuffer(bytes(b), dtype="<u2") != 0).sum())
                   for b in pdf["slots"]]
            stl = [len(bytes(b)) // 2 for b in pdf["stash"]]
            yield pd.DataFrame({
                "shard": pdf["shard"].astype("int32"),
                "occupied": pd.Series(occ, dtype="int32"),
                "capacity": np.int32(spec.n_slots),
                "load": [o / spec.n_slots for o in occ],
                "stash_len": pd.Series(stl, dtype="int32"),
            })

    return state_df.mapInPandas(
        stats, "shard int, occupied int, capacity int, load double, "
               "stash_len int")
