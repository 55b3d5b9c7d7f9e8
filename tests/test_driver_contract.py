"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry through Spark and its ``oracle_sql()``
twin through DuckDB on the same sf0.001 parquet tables and compares
row count, column-name set, and an order-insensitive value hash —
the same checks CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import pytest

import __spark_entry__ as contract

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _pd_cell(v):
    """Normalize a pandas cell the way the driver's compare sees it.

    Crucially, int-typed and float-typed renderings of the same value
    must NOT collide: the driver fetches both sides through pandas, so
    a DuckDB HUGEINT column arrives as float64 ("1435.000000") while a
    Spark BIGINT arrives as int64 ("1435").  Round 4 shipped three
    oracles whose values were bit-identical but whose DuckDB output
    type was HUGEINT; ``fetchall()`` erased the difference locally and
    the driver flagged them.  This path reproduces the driver's view.
    """
    import numpy as np
    if v is None:
        return "∅"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            # pandas renders SQL NULL as NaN in float/object columns
            # while Spark's toPandas leaves None in object columns —
            # the driver treats both as null, so collapse them
            return "∅"
        return "%.6f" % float(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_pd_cell(x) for x in v) + "]"
    return str(v)


def _pd_hash(pdf):
    cols = sorted(pdf.columns)
    lines = sorted(
        "\x1f".join(_pd_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None))
    digest = hashlib.sha256()
    for line in lines:
        digest.update(line.encode("utf-8"))
        digest.update(b"\n")
    return digest.hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
            % (t, SF_DIR, t))
    return con


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "title", "image_url", "caption",
                          "price"]


def test_every_query_has_callable():
    qs = contract.queries()
    assert len(qs) >= 25
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", sorted(contract.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    # Both sides travel through pandas DataFrames — the driver's fetch
    # path — so output-TYPE divergence (HUGEINT→float64 vs BIGINT)
    # fails here exactly as it fails in CORRECTNESS_r{N}.json.
    spdf = contract.queries()[name](spark, SF_DIR).toPandas()
    dpdf = duck.execute(contract.oracle_sql()[name]).df()

    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        "column mismatch: %s vs %s"
        % (list(spdf.columns), list(dpdf.columns)))
    assert len(spdf) == len(dpdf), (
        "row count mismatch: %d vs %d" % (len(spdf), len(dpdf)))
    assert _pd_hash(spdf) == _pd_hash(dpdf), (
        "value hash mismatch for %s\nspark: %s\nduck:  %s" % (
            name, spdf.head(3).to_dict("records"),
            dpdf.head(3).to_dict("records")))


def test_pandas_path_is_type_sensitive(duck):
    # the class-closure guard: a HUGEINT-emitting SQL (SUM over BIGINT)
    # must hash differently from its BIGINT-cast twin through this
    # fetch path — if pandas/duckdb ever start erasing the distinction,
    # this fails loudly and the replica is no longer the driver's twin
    huge = duck.execute(
        "SELECT SUM(x) AS n FROM (SELECT CAST(1 AS BIGINT) x"
        " FROM range(3))").df()
    big = duck.execute(
        "SELECT CAST(SUM(x) AS BIGINT) AS n FROM"
        " (SELECT CAST(1 AS BIGINT) x FROM range(3))").df()
    assert str(huge["n"].dtype) != str(big["n"].dtype)
    assert _pd_hash(huge) != _pd_hash(big)
    assert _pd_cell(big["n"].iloc[0]) == "3"


def test_no_rows_only_queries_remain():
    # every queries() entry has a full DuckDB oracle — the driver's
    # weaker rows-only fallback path is unused since round 3 (the last
    # holdout, ann_ivf_kmeans_topk, gained a trainer-recomputing oracle)
    assert set(contract.oracle_sql()) == set(contract.queries())


# The six queries below were value-identical but hash-mismatched in the
# round-1 driver run: its compare goes through pandas, where DuckDB
# renders DECIMAL sums / HUGEINT as float64 while Spark yields
# decimal.Decimal / int64 objects — str() hashing hides that.  This
# stricter twin hashes the *pandas* cell values with their type names so
# any engine-side type divergence fails locally too.
_TYPE_SENSITIVE = [
    "agg_rollup_events", "tpch_pricing_summary", "join_top_nations",
    "window_top_orders", "events_hourly", "events_sessionize",
]


def _typed_cell(v):
    import numpy as np
    if v is None or v != v:  # None / NaN
        return "∅"
    if isinstance(v, (float, np.floating)):
        return "float:%.6f" % float(v)
    if isinstance(v, (int, np.integer)):
        return "int:%d" % int(v)
    return "%s:%s" % (type(v).__name__, v)


@pytest.mark.parametrize("name", _TYPE_SENSITIVE)
def test_pandas_path_types_align(spark, duck, name):
    sdf = contract.queries()[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(contract.oracle_sql()[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    norm = lambda df: sorted(  # noqa: E731
        "\x1f".join(_typed_cell(row[c]) for c in cols)
        for _, row in df.iterrows())
    assert norm(sdf) == norm(ddf)
