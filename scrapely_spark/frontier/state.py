"""Versioned table state with an atomic ledger — the Iceberg stand-in.

The design calls for Iceberg state tables (snapshot isolation, MERGE INTO,
time travel for resume).  No Iceberg runtime jar exists in this offline
sandbox, so this module provides the same *contract* over parquet:

* every table write lands in a fresh ``<root>/<table>/v<N>/`` directory
  (immutable, like an Iceberg snapshot's data files);
* the ledger (``<root>/_ledger.json``) maps table → committed version and
  records per-round metadata (counts, per-partition lineage, wall time);
  it is replaced atomically (write-temp + rename), so a kill at any point
  leaves the previous committed state intact;
* a restart reads the ledger and resumes from the last committed round —
  exactly-once semantics per round (idempotent: a re-run of a committed
  round is a no-op, an uncommitted round's orphan directories are ignored
  and overwritten).

Swapping in real Iceberg = replacing ``write``/``read`` with
``writeTo(...).createOrReplace()`` / ``MERGE INTO`` and the ledger with
snapshot ids; the round protocol does not change.
"""

from __future__ import annotations

import abc
import json
import os
import shutil
import time


class CatalogStateStore(abc.ABC):
    """The state-catalog contract the crawl rounds rely on.

    Each operation maps 1:1 onto an Iceberg catalog, so an Iceberg-backed
    store is a drop-in behind this interface:

    =================  ====================================================
    this contract      Iceberg equivalent
    =================  ====================================================
    stage(df, t)       write new data files (no snapshot commit yet)
    publish(t, v)      snapshot commit (``writeTo(...).createOrReplace``)
    stage_round(...)   write the data files of an append partition
    commit_round(...)  one atomic multi-table commit of the round's
                       staged tables + round metadata (an Iceberg
                       transaction / REST-catalog multi-table commit)
    read/read_rounds   snapshot-isolated reads (versions = time travel)
    compact_rounds(t)  ``rewrite_data_files`` + metadata pointer update
    last_round() &c.   snapshot-history inspection
    =================  ====================================================

    Invariants every implementation must satisfy — pinned by
    tests/test_state_contract.py, which is written against this ABC so
    an Iceberg-backed implementation runs the identical suite:

    * **Staged is invisible**: rows written by ``stage``/``stage_round``
      appear in no read until published/committed — a reader never sees
      a half-written round.
    * **Commit is atomic**: after ``commit_round`` returns, all of the
      round's tables are visible together; a kill at any earlier point
      (including mid-ledger-write) leaves exactly the previous committed
      state.
    * **Idempotent replay**: re-committing a committed round is a no-op;
      re-staging over a killed run's orphan files succeeds.
    * **Compaction changes no reader**: the visible row set of
      ``read_rounds`` is identical before and after ``compact_rounds``.
    """

    @abc.abstractmethod
    def stage(self, df, table: str) -> tuple:
        """Write an uncommitted full-table version; return (path, version)."""

    @abc.abstractmethod
    def publish(self, table: str, version) -> None:
        """Commit a staged version outside the round protocol."""

    @abc.abstractmethod
    def read(self, spark, table: str):
        """The committed snapshot of a published table."""

    @abc.abstractmethod
    def exists(self, table: str) -> bool:
        """Whether the table has a committed version."""

    @abc.abstractmethod
    def stage_round(self, df, table: str, round_id: int) -> tuple:
        """Write an uncommitted per-round append; return (path, tag)."""

    @abc.abstractmethod
    def commit_round(self, round_id: int, staged: dict,
                     metrics: dict) -> None:
        """Atomically publish a round's staged tables + metadata."""

    @abc.abstractmethod
    def read_rounds(self, spark, table: str,
                    as_of_round: int | None = None):
        """All committed rows of a per-round table (None if empty);
        ``as_of_round`` = snapshot-as-of time travel."""

    @abc.abstractmethod
    def compact_rounds(self, spark, table: str):
        """Fold the delta chain into one base snapshot (reader-invisible)."""

    @abc.abstractmethod
    def last_round(self) -> int:
        """Highest committed round id (0 before any round)."""

    @abc.abstractmethod
    def round_metrics(self) -> list:
        """Committed rounds' metadata, in commit order."""


class StateStore(CatalogStateStore):
    """Parquet + atomic-JSON-ledger implementation of the contract."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- ledger ------------------------------------------------------------

    @property
    def _ledger_path(self) -> str:
        return os.path.join(self.root, "_ledger.json")

    def ledger(self) -> dict:
        if not os.path.exists(self._ledger_path):
            return {"tables": {}, "rounds": [], "created_at": time.time()}
        with open(self._ledger_path) as fh:
            return json.load(fh)

    def _commit_ledger(self, ledger: dict):
        tmp = self._ledger_path + ".tmp.%d" % os.getpid()
        with open(tmp, "w") as fh:
            json.dump(ledger, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._ledger_path)  # atomic commit point

    # -- tables ------------------------------------------------------------

    def version_of(self, table: str) -> int:
        return self.ledger()["tables"].get(table, {}).get("version", 0)

    def path_of(self, table: str, version: int | None = None) -> str:
        v = self.version_of(table) if version is None else version
        return os.path.join(self.root, table, "v%d" % v)

    def exists(self, table: str) -> bool:
        return self.version_of(table) > 0

    def read(self, spark, table: str):
        return spark.read.parquet(self.path_of(table))

    def _max_version(self, table: str) -> int:
        """Highest version any pointer references — the FULL-TABLE
        pointer or the compacted-base pointer.  The allocator must see
        both: a compacted base advances the version space without
        publishing the full-table pointer, and allocating from
        version_of alone would stage INTO the base being read."""
        led = self.ledger()
        return max(led["tables"].get(table, {}).get("version", 0),
                   led.get("compacted", {}).get(table, {})
                   .get("version", 0))

    def stage(self, df, table: str) -> tuple[str, int]:
        """Write a new uncommitted version; return (path, version)."""
        v = self._max_version(table) + 1
        path = self.path_of(table, v)
        if os.path.exists(path):  # orphan from a killed run — overwrite
            shutil.rmtree(path)
        df.write.mode("overwrite").parquet(path)
        return path, v

    def publish(self, table: str, version: int):
        """Commit a staged table version outside the round protocol.

        Used for one-time reference tables (e.g. the replay page store)
        that rounds read but never rewrite.
        """
        ledger = self.ledger()
        ledger["tables"][table] = {"version": version}
        self._commit_ledger(ledger)

    def stage_round(self, df, table: str, round_id: int) -> tuple[str, str]:
        """Write a per-round append partition (committed via the ledger)."""
        tag = "r%d" % round_id
        path = os.path.join(self.root, table, tag)
        if os.path.exists(path):  # orphan from a killed run — overwrite
            shutil.rmtree(path)
        df.write.mode("overwrite").parquet(path)
        return path, tag

    def read_rounds(self, spark, table: str,
                    as_of_round: int | None = None):
        """All committed rows of a per-round table: compacted base (if
        one exists) plus the deltas of every round after it.

        ``as_of_round``: time travel — the row set as it stood after
        that round committed (the Iceberg snapshot-as-of read).  A
        historical read never consults the compacted base (whose
        ``through_round`` may postdate the asked-for snapshot); it
        unions the original per-round delta directories directly, which
        compaction deliberately keeps (immutable history — expiring
        them is the operator's ``expire_snapshots`` decision).
        """
        ledger = self.ledger()
        base = (None if as_of_round is not None
                else ledger.get("compacted", {}).get(table))
        paths = []
        if base is not None:
            paths.append(self.path_of(table, base["version"]))
        for entry in ledger["rounds"]:
            if as_of_round is not None \
                    and entry["round_id"] > as_of_round:
                continue
            if base is not None \
                    and entry["round_id"] <= base["through_round"]:
                continue
            tag = entry["tables"].get(table)
            if isinstance(tag, str):
                paths.append(os.path.join(self.root, table, tag))
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def compact_rounds(self, spark, table: str):
        """Fold the table's delta chain into one base snapshot.

        The Iceberg ``rewrite_data_files`` analogue: ``read_rounds``
        unions one file group per round, so a months-long crawl pays
        O(rounds) listing/scan setup every round — compaction rewrites
        the chain (prior base + all committed deltas) as a single
        versioned snapshot and records ``through_round`` in the ledger,
        after which readers see base ∪ later-deltas.  The visible row
        set is identical, so no reader changes.  Crash-safe like every
        write here: an interrupted compaction leaves an orphan version
        directory the ledger never references.  Old delta directories
        are kept (immutable history — expiring them is the operator's
        Iceberg ``expire_snapshots`` decision), so a killed job still
        resumes from any committed round.
        """
        df = self.read_rounds(spark, table)
        if df is None:
            return None
        _, v = self.stage(df, table)
        ledger = self.ledger()
        # only the 'compacted' pointer: publishing the snapshot under
        # the FULL-TABLE pointer too would flip exists()/read() on for
        # a per-round table with a view frozen at through_round —
        # silently diverging from read_rounds as later rounds commit
        ledger.setdefault("compacted", {})[table] = {
            "version": v, "through_round": self.last_round()}
        self._commit_ledger(ledger)
        return v

    # -- round protocol ------------------------------------------------------

    def last_round(self) -> int:
        rounds = self.ledger()["rounds"]
        return rounds[-1]["round_id"] if rounds else 0

    def commit_round(self, round_id: int, staged: dict, metrics: dict):
        """Atomically publish staged table versions + round metadata.

        ``staged`` maps table name → version (from :meth:`stage`).
        """
        ledger = self.ledger()
        if any(r["round_id"] == round_id for r in ledger["rounds"]):
            return  # idempotent replay of a committed round
        for table, version in staged.items():
            if isinstance(version, int):  # str tags are per-round appends
                ledger["tables"][table] = {"version": version}
        entry = {"round_id": round_id, "tables": dict(staged),
                 "committed_at": time.time()}
        entry.update(metrics)
        ledger["rounds"].append(entry)
        self._commit_ledger(ledger)

    def round_metrics(self) -> list:
        return self.ledger()["rounds"]
