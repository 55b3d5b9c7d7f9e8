"""Contract tests for the CatalogStateStore interface.

Written against the ABC (``scrapely_spark.frontier.state.
CatalogStateStore``), not the parquet implementation: ``store_factory``
is the only binding point, so an Iceberg-backed implementation drops in
by adding itself to the fixture's param list and runs the identical
suite.  The invariants here are exactly the ones the crawl rounds rely
on (atomic round visibility, kill-anywhere resume, reader-invisible
compaction) — see the ABC docstring for the Iceberg operation mapping.
"""

from __future__ import annotations

import json
import os

import pytest

from scrapely_spark.frontier.state import CatalogStateStore, StateStore


@pytest.fixture(params=["parquet"])
def store_factory(request, tmp_path):
    # future: add "iceberg" here; the suite below must pass unchanged
    def make() -> CatalogStateStore:
        root = tmp_path / ("store-%d" % make.counter)
        make.counter += 1
        return StateStore(str(root))
    make.counter = 0
    return make


def _df(spark, rows, schema="canonical_url string, n int"):
    return spark.createDataFrame(rows, schema)


def _rows(df):
    if df is None:
        return set()
    return {tuple(r) for r in df.collect()}


def test_is_a_catalog_state_store(store_factory):
    assert isinstance(store_factory(), CatalogStateStore)


def test_staged_is_invisible_until_published(spark, store_factory):
    store = store_factory()
    _, v = store.stage(_df(spark, [("a", 1)]), "t")
    assert not store.exists("t")        # staged ≠ committed
    store.publish("t", v)
    assert store.exists("t")
    assert _rows(store.read(spark, "t")) == {("a", 1)}


def test_publish_flips_versions_atomically(spark, store_factory):
    store = store_factory()
    _, v1 = store.stage(_df(spark, [("a", 1)]), "t")
    store.publish("t", v1)
    _, v2 = store.stage(_df(spark, [("b", 2)]), "t")
    # the old snapshot stays visible while v2 is only staged
    assert _rows(store.read(spark, "t")) == {("a", 1)}
    store.publish("t", v2)
    assert _rows(store.read(spark, "t")) == {("b", 2)}


def test_staged_round_is_invisible_until_committed(spark, store_factory):
    store = store_factory()
    staged = {}
    _, staged["t"] = store.stage_round(_df(spark, [("a", 1)]), "t", 1)
    assert store.read_rounds(spark, "t") is None     # nothing committed
    assert store.last_round() == 0
    store.commit_round(1, staged, {"fetched": 1})
    assert _rows(store.read_rounds(spark, "t")) == {("a", 1)}
    assert store.last_round() == 1


def test_commit_round_is_all_or_nothing(spark, store_factory):
    """A round staging several tables becomes visible as a unit — the
    crawl's frontier view must never see an enqueued delta without the
    matching seen delta."""
    store = store_factory()
    staged = {}
    _, staged["enqueued"] = store.stage_round(
        _df(spark, [("a", 1)]), "enqueued", 1)
    _, staged["seen"] = store.stage_round(_df(spark, [("a", 1)]), "seen", 1)
    # kill before commit: neither table shows anything
    assert store.read_rounds(spark, "enqueued") is None
    assert store.read_rounds(spark, "seen") is None
    store.commit_round(1, staged, {})
    assert _rows(store.read_rounds(spark, "enqueued")) == {("a", 1)}
    assert _rows(store.read_rounds(spark, "seen")) == {("a", 1)}


def test_killed_run_orphan_is_overwritten_on_restage(spark, store_factory):
    store = store_factory()
    store.stage_round(_df(spark, [("stale", 9)]), "t", 1)   # killed run
    _, tag = store.stage_round(_df(spark, [("fresh", 1)]), "t", 1)
    store.commit_round(1, {"t": tag}, {})
    assert _rows(store.read_rounds(spark, "t")) == {("fresh", 1)}


def test_commit_round_replay_is_idempotent(spark, store_factory):
    store = store_factory()
    _, tag = store.stage_round(_df(spark, [("a", 1)]), "t", 1)
    store.commit_round(1, {"t": tag}, {"fetched": 1})
    store.commit_round(1, {"t": tag}, {"fetched": 999})   # resumed replay
    assert len(store.round_metrics()) == 1
    assert store.round_metrics()[0]["fetched"] == 1


def test_uncommitted_later_round_invisible(spark, store_factory):
    """The exact kill-window of the pipelined crawl: round k committed,
    round k+1 staged only — readers see precisely round k's state."""
    store = store_factory()
    _, t1 = store.stage_round(_df(spark, [("a", 1)]), "t", 1)
    store.commit_round(1, {"t": t1}, {})
    store.stage_round(_df(spark, [("b", 2)]), "t", 2)   # killed here
    assert _rows(store.read_rounds(spark, "t")) == {("a", 1)}
    assert store.last_round() == 1


def test_compaction_preserves_visible_rows(spark, store_factory):
    store = store_factory()
    for r in (1, 2, 3):
        _, tag = store.stage_round(_df(spark, [("u%d" % r, r)]), "t", r)
        store.commit_round(r, {"t": tag}, {})
    before = _rows(store.read_rounds(spark, "t"))
    store.compact_rounds(spark, "t")
    assert _rows(store.read_rounds(spark, "t")) == before
    # deltas after the compaction point still union in
    _, tag = store.stage_round(_df(spark, [("u4", 4)]), "t", 4)
    store.commit_round(4, {"t": tag}, {})
    assert _rows(store.read_rounds(spark, "t")) == before | {("u4", 4)}


def test_time_travel_read_as_of_round(spark, store_factory):
    store = store_factory()
    for r in (1, 2, 3):
        _, tag = store.stage_round(_df(spark, [("u%d" % r, r)]), "t", r)
        store.commit_round(r, {"t": tag}, {})
    assert _rows(store.read_rounds(spark, "t", as_of_round=1)) == \
        {("u1", 1)}
    assert _rows(store.read_rounds(spark, "t", as_of_round=2)) == \
        {("u1", 1), ("u2", 2)}
    # as-of the latest round == the current read
    assert _rows(store.read_rounds(spark, "t", as_of_round=3)) == \
        _rows(store.read_rounds(spark, "t"))
    assert store.read_rounds(spark, "t", as_of_round=0) is None


def test_time_travel_survives_compaction(spark, store_factory):
    """Historical reads bypass the compacted base: a snapshot older
    than through_round must still reconstruct from the kept deltas."""
    store = store_factory()
    for r in (1, 2, 3, 4):
        _, tag = store.stage_round(_df(spark, [("u%d" % r, r)]), "t", r)
        store.commit_round(r, {"t": tag}, {})
    asof2 = _rows(store.read_rounds(spark, "t", as_of_round=2))
    store.compact_rounds(spark, "t")  # through_round = 4
    assert _rows(store.read_rounds(spark, "t", as_of_round=2)) == asof2
    assert _rows(store.read_rounds(spark, "t", as_of_round=3)) == \
        asof2 | {("u3", 3)}


def test_interrupted_ledger_write_preserves_previous_state(
        spark, store_factory):
    """A crash mid-commit (partial temp ledger on disk) must leave the
    previous committed state exactly — the parquet impl's write-temp +
    atomic-rename discipline (Iceberg: metadata-file swap)."""
    store = store_factory()
    _, tag = store.stage_round(_df(spark, [("a", 1)]), "t", 1)
    store.commit_round(1, {"t": tag}, {})
    if not isinstance(store, StateStore):
        pytest.skip("crash injection is implementation-specific")
    # simulate the torn temp file a kill during the next commit leaves
    with open(store._ledger_path + ".tmp.999", "w") as fh:
        fh.write('{"torn":')
    assert store.last_round() == 1
    assert _rows(store.read_rounds(spark, "t")) == {("a", 1)}
    # and a later commit still succeeds
    _, tag2 = store.stage_round(_df(spark, [("b", 2)]), "t", 2)
    store.commit_round(2, {"t": tag2}, {})
    assert store.last_round() == 2


def test_ledger_survives_reopen(spark, store_factory):
    """Durability across process restarts: a second handle on the same
    root sees the identical committed state (the crawl's resume path)."""
    store = store_factory()
    _, tag = store.stage_round(_df(spark, [("a", 1)]), "t", 1)
    store.commit_round(1, {"t": tag}, {"fetched": 7})
    reopened = StateStore(store.root) if isinstance(store, StateStore) \
        else pytest.skip("reopen is implementation-specific")
    assert reopened.last_round() == 1
    assert reopened.round_metrics()[0]["fetched"] == 7
    assert _rows(reopened.read_rounds(spark, "t")) == {("a", 1)}


def test_compaction_does_not_publish_full_table_pointer(spark,
                                                        store_factory):
    """compact_rounds must not flip exists()/read() on for a per-round
    table: the full-table API would return a view frozen at
    through_round that silently diverges from read_rounds as later
    rounds commit."""
    store = store_factory()
    for r in (1, 2):
        _, tag = store.stage_round(_df(spark, [("u%d" % r, r)]), "t", r)
        store.commit_round(r, {"t": tag}, {})
    assert not store.exists("t")
    store.compact_rounds(spark, "t")
    assert not store.exists("t")
    _, tag = store.stage_round(_df(spark, [("u3", 3)]), "t", 3)
    store.commit_round(3, {"t": tag}, {})
    assert _rows(store.read_rounds(spark, "t")) == \
        {("u1", 1), ("u2", 2), ("u3", 3)}


def test_repeated_compaction_allocates_fresh_versions(spark,
                                                      store_factory):
    """A second compaction must stage into a NEW version, not
    overwrite the base it is reading (the version allocator sees the
    compacted pointer even though the full-table pointer stays
    unpublished)."""
    store = store_factory()
    rows = set()
    for r in (1, 2):
        _, tag = store.stage_round(_df(spark, [("u%d" % r, r)]), "t", r)
        store.commit_round(r, {"t": tag}, {})
        rows.add(("u%d" % r, r))
    v1 = store.compact_rounds(spark, "t")
    _, tag = store.stage_round(_df(spark, [("u3", 3)]), "t", 3)
    store.commit_round(3, {"t": tag}, {})
    rows.add(("u3", 3))
    v2 = store.compact_rounds(spark, "t")
    assert v2 > v1
    assert _rows(store.read_rounds(spark, "t")) == rows
