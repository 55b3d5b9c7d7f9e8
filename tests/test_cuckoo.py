"""Cuckoo-filter invariants: no false negatives, working deletion,
bounded false positives, partitioning-independent state bytes.

The cuckoo arm of the URL-seen pair (bloom.py is the append-only arm)
must uphold the same prefilter contract — False is definitive — plus
the one property the bloom cannot offer: deleting a previously-inserted
key removes it without disturbing other keys' guarantees.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapely_spark.frontier import cuckoo as ck
from scrapely_spark.frontier.cuckoo import CuckooSpec


@pytest.fixture(scope="module")
def spec():
    # 16 shards × 128 buckets × 4 slots = 8192 slots for 5000 keys
    # (~61% load) — realistic headroom, still forces some evictions
    return CuckooSpec(n_shards=16, shard_buckets=128, bucket_slots=4)


@pytest.fixture(scope="module")
def inserted(spark, spec):
    # F.hash produces negative keys too — guards the pmod/uint64
    # alignment between the JVM shard routing and the numpy kernel
    keys = spark.range(5000).select(
        F.hash(F.col("id").cast("string")).alias("url_key")).cache()
    state = ck.insert(None, keys, spec).cache()
    return keys, state


def test_state_one_row_per_shard(inserted, spec):
    _keys, state = inserted
    rows = state.collect()
    assert len(rows) == len({r["shard"] for r in rows})
    assert all(0 <= r["shard"] < spec.n_shards for r in rows)
    assert all(len(r["slots"]) == spec.n_slots * 2 for r in rows)


def test_no_false_negatives(inserted, spec):
    keys, state = inserted
    flagged = ck.might_contain(keys, state, spec)
    assert flagged.where(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark, inserted, spec):
    _keys, state = inserted
    fresh = spark.range(5000, 25000).select(
        F.hash(F.col("id").cast("string")).alias("url_key"))
    fp = ck.might_contain(fresh, state, spec) \
        .where(F.col("maybe_seen")).count()
    # 16-bit fingerprints at ~61% load: expected FPR ≈ 2·4·0.61/2^16
    # ≈ 0.007%; anything under 1% proves the fingerprinting works
    assert fp / 20000 < 0.01


def test_delete_then_probe(spark, inserted, spec):
    keys, state = inserted
    evicted = keys.where("url_key % 4 = 0").cache()
    kept = keys.where("url_key % 4 != 0")
    after = ck.delete(state, evicted, spec).cache()
    # survivors keep the hard guarantee
    assert ck.might_contain(kept, after, spec) \
        .where(~F.col("maybe_seen")).count() == 0
    # evicted keys are really gone (up to fingerprint collisions with
    # surviving keys, which are FPs by construction — bound them)
    n_ev = evicted.count()
    still = ck.might_contain(evicted, after, spec) \
        .where(F.col("maybe_seen")).count()
    assert still / max(n_ev, 1) < 0.01
    # state row count unchanged: deletion rewrites shards, never drops
    assert after.count() == state.count()


def test_partitioning_invariant(spark, spec):
    """Final state bytes are a pure function of the key multiset —
    the property that makes checkpoint replay byte-stable."""
    keys = spark.range(3000).select(
        F.hash(F.col("id").cast("string")).alias("url_key"))

    def state_bytes(df):
        rows = ck.insert(None, df, spec).collect()
        return sorted((r["shard"], bytes(r["slots"]), bytes(r["stash"]))
                      for r in rows)

    a = state_bytes(keys.repartition(1))
    b = state_bytes(keys.repartition(13, "url_key"))
    assert a == b


def test_stash_overflow_keeps_guarantee(spark):
    """Past the load knee the wandering fingerprint lands in the stash
    instead of failing the job — and stays findable."""
    tiny = CuckooSpec(n_shards=2, shard_buckets=4, bucket_slots=1,
                      max_kicks=8)
    keys = spark.range(14).select(
        F.hash(F.col("id").cast("string")).alias("url_key")).cache()
    state = ck.insert(None, keys, tiny).cache()
    stash_len = sum(len(r["stash"]) // 2 for r in state.collect())
    assert stash_len > 0  # 14 keys into 8 slots must overflow
    assert ck.might_contain(keys, state, tiny) \
        .where(~F.col("maybe_seen")).count() == 0


def test_incremental_insert_keeps_guarantee(spark, inserted, spec):
    keys, _ = inserted
    first = keys.where("url_key % 2 = 0")
    second = keys.where("url_key % 2 != 0")
    state = ck.insert(None, first, spec)
    state = ck.insert(state, second, spec)
    assert ck.might_contain(keys, state, spec) \
        .where(~F.col("maybe_seen")).count() == 0


def test_untouched_shards_pass_through_byte_identical(spark, spec):
    keys = spark.range(2000).select(
        F.hash(F.col("id").cast("string")).alias("url_key"))
    state = ck.insert(None, keys, spec).cache()
    before = {r["shard"]: (bytes(r["slots"]), bytes(r["stash"]))
              for r in state.collect()}
    # route one key; its shard changes, every other shard must not
    one = spark.createDataFrame([(987654321,)], "url_key int")
    shard, _, _ = ck.key_parts(np.array([987654321]), spec)
    touched = int(shard[0])
    after = {r["shard"]: (bytes(r["slots"]), bytes(r["stash"]))
             for r in ck.insert(state, one, spec).collect()}
    for s, blob in before.items():
        if s != touched:
            assert after[s] == blob


def test_load_factor_stats(inserted, spec):
    keys, state = inserted
    stats = ck.load_factor(state, spec).collect()
    total_occ = sum(r["occupied"] for r in stats)
    total_stash = sum(r["stash_len"] for r in stats)
    assert total_occ + total_stash == keys.distinct().count()
    assert all(0.0 <= r["load"] <= 1.0 for r in stats)


def test_bad_geometry_raises():
    with pytest.raises(ValueError, match="power of two"):
        CuckooSpec(shard_buckets=100)


def test_probe_with_mismatched_spec_raises(spark, inserted, spec):
    keys, state = inserted
    other = CuckooSpec(n_shards=spec.n_shards,
                       shard_buckets=spec.shard_buckets * 2,
                       bucket_slots=spec.bucket_slots)
    with pytest.raises(Exception, match="spec"):
        ck.insert(state, keys, other).collect()


# -- the cuckoo arm driving the real crawl loop -----------------------------

def test_crawl_parity_with_cuckoo_backend(spark, tmp_path_factory):
    """The round loop with seen_filter='cuckoo' reproduces the oracle's
    fetch order and seen set byte-for-byte — the prefilter swap must be
    invisible (False definitive, True exact-checked)."""
    from oracle import OracleCrawl
    from scrapely_spark.frontier import rounds
    from scrapely_spark.frontier.seenfilter import CuckooSeenFilter
    from scrapely_spark.frontier.state import StateStore
    from scrapely_spark.spark import datagen
    from scrapely_spark.spark.extract import plan_from_templates

    n, max_rounds = 200, 20
    oracle = OracleCrawl(n, datagen.seeds(n)).run(max_rounds)
    store = StateStore(str(tmp_path_factory.mktemp("cuckoocrawl")))
    pages = datagen.pages_df(spark, n)
    robots = datagen.robots_df(spark)
    plan = plan_from_templates([datagen.template_body()])
    flt = CuckooSeenFilter(CuckooSpec(n_shards=8, shard_buckets=64))
    rounds.crawl(spark, store, pages, robots, plan, datagen.seeds(n),
                 max_rounds=max_rounds, seen_filter=flt)

    log = (store.read_rounds(spark, rounds.FETCH_LOG)
           .orderBy("round_id", "priority", "canonical_url").collect())
    got = [(r.round_id, r.priority, r.canonical_url) for r in log]
    assert got == oracle.fetch_order()
    seen = store.read_rounds(spark, rounds.SEEN).collect()
    assert sorted(r.canonical_url for r in seen) == oracle.seen_urls()
    # the filter's state table really is the cuckoo one
    assert store.read_rounds(spark, "cuckoo") is not None
    assert store.read_rounds(spark, "bloom") is None


def test_evict_delta_reopens_urls(spark, spec):
    """Recrawl eviction: after evict_delta, the evicted keys pass the
    prefilter as definitively-new again (no-false-positive not required,
    bound it), while survivors stay flagged."""
    from scrapely_spark.frontier.seenfilter import CuckooSeenFilter

    flt = CuckooSeenFilter(spec)
    keys = spark.range(4000).select(
        F.hash(F.col("id").cast("string")).alias("url_key")).cache()
    r1 = flt.round_delta(keys, None, 1).cache()
    recrawl = keys.where("url_key % 3 = 0").cache()
    r2 = flt.evict_delta(recrawl, r1, 2)
    state_rounds = r1.unionByName(r2)
    flagged = flt.prefilter(recrawl, state_rounds)
    # evicted keys mostly read as new again (residual = fp collisions)
    still = flagged.where(F.col("maybe_seen")).count()
    assert still / max(recrawl.count(), 1) < 0.01
    survivors = keys.where("url_key % 3 != 0")
    kept = flt.prefilter(survivors, state_rounds)
    assert kept.where(~F.col("maybe_seen")).count() == 0


def test_random_insert_delete_model(spark, spec):
    """Model check: after any interleaved insert/delete batch sequence,
    every key the model says is present must probe True (the hard
    guarantee); keys the model says are absent probe True only at FP
    rates.  Deterministic key streams (fixed seed equivalents via
    F.hash of structured strings)."""
    rng_batches = [
        ("ins", "a", 0, 1500), ("ins", "b", 1000, 2600),  # overlap-free
        ("del", "a", 0, 700),
        ("ins", "c", 5000, 6200),
        ("del", "b", 1500, 2600),
        ("del", "c", 5000, 5400),
    ]
    present: set[int] = set()

    def keys_df(tag, lo, hi):
        return spark.range(lo, hi).select(
            F.hash(F.concat(F.lit(tag + ":"),
                            F.col("id").cast("string"))).alias("url_key"))

    def keys_py(tag, lo, hi):
        df = keys_df(tag, lo, hi)
        return {r["url_key"] for r in df.collect()}

    state = None
    for op, tag, lo, hi in rng_batches:
        df = keys_df(tag, lo, hi)
        if op == "ins":
            state = ck.insert(state, df, spec)
            present |= keys_py(tag, lo, hi)
        else:
            state = ck.delete(state, df, spec)
            present -= keys_py(tag, lo, hi)
        state = state.cache()
        state.count()  # materialize each step like a committed round

    still = spark.createDataFrame([(k,) for k in sorted(present)],
                                  "url_key int")
    flagged = ck.might_contain(still, state, spec)
    assert flagged.where(~F.col("maybe_seen")).count() == 0
    gone_keys = sorted(keys_py("a", 0, 700) | keys_py("b", 1500, 2600)
                       | keys_py("c", 5000, 5400))
    gone = spark.createDataFrame([(k,) for k in gone_keys],
                                 "url_key int")
    fp = ck.might_contain(gone, state, spec) \
        .where(F.col("maybe_seen")).count()
    assert fp / max(len(gone_keys), 1) < 0.02


def test_cuckoo_backend_survives_compaction(spark, tmp_path_factory):
    """compact_every folds the per-round delta chain into one base
    snapshot; the cuckoo reader takes max_by(round_id) per shard, so
    compaction must preserve the round_id column and the row set —
    crawl results must be unchanged (reader-invariance contract)."""
    from oracle import OracleCrawl
    from scrapely_spark.frontier import rounds
    from scrapely_spark.frontier.seenfilter import CuckooSeenFilter
    from scrapely_spark.frontier.state import StateStore
    from scrapely_spark.spark import datagen
    from scrapely_spark.spark.extract import plan_from_templates

    n, max_rounds = 150, 15
    oracle = OracleCrawl(n, datagen.seeds(n)).run(max_rounds)
    store = StateStore(str(tmp_path_factory.mktemp("cuckoocompact")))
    flt = CuckooSeenFilter(CuckooSpec(n_shards=8, shard_buckets=64))
    rounds.crawl(spark, store, datagen.pages_df(spark, n),
                 datagen.robots_df(spark),
                 plan_from_templates([datagen.template_body()]),
                 datagen.seeds(n), max_rounds=max_rounds,
                 compact_every=2, seen_filter=flt)
    log = (store.read_rounds(spark, rounds.FETCH_LOG)
           .orderBy("round_id", "priority", "canonical_url").collect())
    assert [(r.round_id, r.priority, r.canonical_url)
            for r in log] == oracle.fetch_order()
    seen = store.read_rounds(spark, rounds.SEEN).collect()
    assert sorted(r.canonical_url for r in seen) == oracle.seen_urls()


# -- pure-numpy kernel properties (no Spark) --------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=0xFFFF),
                min_size=0, max_size=200),
       st.integers(min_value=2, max_value=6))
def test_shard_insert_conserves_fingerprints(fps, log_buckets):
    """Every inserted fingerprint ends up in exactly one slot or the
    stash — cuckoo relocation moves fingerprints, never drops or
    duplicates them (the multiset-conservation invariant behind
    no-false-negatives)."""
    spec = CuckooSpec(n_shards=1, shard_buckets=1 << log_buckets,
                      bucket_slots=2, max_kicks=16)
    fps_arr = np.asarray(fps, dtype=np.uint16)
    _, buckets, _ = ck.key_parts(
        np.arange(len(fps), dtype=np.int64), spec)
    # use hypothesis fps with kernel-derived buckets
    slots, stash = ck._empty_shard(spec), []
    ck._insert_into_shard(slots, stash, buckets, fps_arr, spec)
    from collections import Counter
    got = Counter(slots[slots != 0].tolist()) + Counter(stash)
    assert got == Counter(fps)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=0xFFFF),
       st.integers(min_value=2, max_value=10))
def test_alt_bucket_involution(fp, log_buckets):
    spec = CuckooSpec(n_shards=1, shard_buckets=1 << log_buckets)
    b = np.arange(spec.shard_buckets, dtype=np.int64)
    f = np.full_like(b, fp).astype(np.uint16)
    a = ck.alt_bucket(b, f, spec)
    assert (ck.alt_bucket(a, f, spec) == b).all()
    assert ((a >= 0) & (a < spec.shard_buckets)).all()


def test_same_round_insert_then_evict_is_deterministic(spark, spec):
    """A round that both inserts and evicts rows of the SAME shard must
    resolve deterministically: the evict delta (seq=1) outranks the
    insert delta (seq=0) in _latest, so inserted-then-evicted keys read
    new again and inserted keys are never lost to an arbitrary max_by
    tie on round_id alone."""
    from scrapely_spark.frontier.seenfilter import CuckooSeenFilter

    flt = CuckooSeenFilter(spec)
    keys = spark.range(2000).select(
        F.hash(F.col("id").cast("string")).alias("url_key")).cache()
    r1 = flt.round_delta(keys, None, 1).cache()
    evicted = keys.where("url_key % 4 = 0").cache()
    # SAME round id as a hypothetical concurrent insert write
    r2a = flt.round_delta(
        spark.range(2000, 2500).select(
            F.hash(F.col("id").cast("string")).alias("url_key")),
        r1, 2).cache()
    r2b = flt.evict_delta(evicted, r1.unionByName(r2a), 2)
    state = r1.unionByName(r2a).unionByName(r2b)
    # evicted keys re-open (minus fp collisions)
    reopened = flt.prefilter(evicted, state)
    assert (reopened.where(F.col("maybe_seen")).count()
            / max(evicted.count(), 1)) < 0.01
    # round-1 survivors AND the round-2 inserts survive the tie
    survivors = keys.where("url_key % 4 != 0").unionByName(
        spark.range(2000, 2500).select(
            F.hash(F.col("id").cast("string")).alias("url_key")))
    assert flt.prefilter(survivors, state) \
        .where(~F.col("maybe_seen")).count() == 0
