"""Blocked-bloom invariants: no false negatives, bounded false positives.

A false negative would re-enqueue a seen URL (protocol violation); false
positives only cost an exact-check fallthrough.  Also guards the
JVM-vs-numpy modulo alignment (pmod) and duplicate-block merging.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrapely_spark.frontier import bloom as bl
from scrapely_spark.frontier.bloom import BloomSpec


@pytest.fixture(scope="module")
def spec():
    return BloomSpec(n_blocks=64, block_bytes=64, k=3)


@pytest.fixture(scope="module")
def inserted(spark, spec):
    # F.hash produces negative keys too — the pmod alignment regression
    keys = spark.range(5000).select(
        F.hash(F.col("id").cast("string")).alias("url_key")).cache()
    state = bl.merge_blocks(None, bl.build_delta(keys, spec), spec).cache()
    return keys, state


def test_state_has_one_row_per_block(inserted, spec):
    _keys, state = inserted
    assert state.count() == state.select("block_id").distinct().count()
    assert state.where((F.col("block_id") < 0)
                       | (F.col("block_id") >= spec.n_blocks)).count() == 0


def test_no_false_negatives(inserted, spec):
    keys, state = inserted
    flagged = bl.might_contain(keys, state, spec)
    assert flagged.where(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark, inserted, spec):
    _keys, state = inserted
    fresh = spark.range(5000, 15000).select(
        F.hash(F.col("id").cast("string")).alias("url_key"))
    fp = bl.might_contain(fresh, state, spec) \
        .where(F.col("maybe_seen")).count()
    # 5000 keys in 64*512 bits ≈ 1.5 bits/key is deliberately tight;
    # anything under 15% proves the hash spread works
    assert fp / 10000 < 0.15


def test_incremental_merge_equals_bulk(spark, inserted, spec):
    keys, _ = inserted
    first = keys.where("url_key % 2 = 0")
    second = keys.where("url_key % 2 != 0")
    state = bl.merge_blocks(None, bl.build_delta(first, spec), spec)
    state = bl.merge_blocks(state, bl.build_delta(second, spec), spec)
    flagged = bl.might_contain(keys, state, spec)
    assert flagged.where(~F.col("maybe_seen")).count() == 0
