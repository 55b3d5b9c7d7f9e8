"""Mergeable sketches with engine-portable determinism.

Production engines answer "how many distinct X per group" at 10^10 rows
with sketches (HLL, theta), not exact distincts.  Library HLLs are
implementation-defined (Spark's approx_count_distinct and DuckDB's
approx_count_distinct disagree), which would leave the operator outside
the hash-checked correctness gate.  The KMV (K-minimum-values / bottom-k
theta) sketch here is built on an explicit md5 hash space instead: both
engines derive the exact same 48-bit integer per value, so even the
*approximate* estimate is bit-identical and the DuckDB oracle is a full
value check, not rows-only.

KMV estimator: keep the k smallest distinct hash values per group; if
fewer than k distinct values exist the count is exact; otherwise the
k-th smallest hash h_(k), normalized into (0,1], estimates density and
(k-1) / (h_(k)/2^48) estimates the distinct count (Bar-Yossef et al.,
"Counting distinct elements in a data stream", RANDOM 2002).  Relative
error ≈ 1/√(k−2).

The sketch is mergeable (union of bottom-k sets → bottom-k of union),
which is what makes it a one-pass distributed operator — partitions
sketch locally and the combine keeps the k smallest; the test suite
pins merge(two halves) == sketch(whole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 12 hex chars = 48 bits: fits a BIGINT in both engines
# (Spark conv(hex,16,10) / DuckDB CAST('0x…' AS BIGINT))
_HASH_SPACE = float(2 ** 48)


def kmv_hash(value_col) -> "F.Column":
    """The shared 48-bit hash: first 12 hex chars of md5(value)."""
    return (F.conv(F.substring(F.md5(value_col.cast("string")), 1, 12),
                   16, 10).cast("long"))


def kmv_distinct(df: DataFrame, group_cols: list[str], value_col,
                 k: int = 64) -> DataFrame:
    """Estimated distinct ``value_col`` per group via a bottom-k sketch.

    Plan shape: project to (group, hash) → distinct (one exchange, with
    map-side partial dedup) → per-group bottom-k via a window rank →
    tiny aggregate.  The window's sort input is already deduped, so the
    second exchange moves at most |groups|·|distinct| slim rows and the
    rank truncates to k per group immediately.  At real scale the
    distinct's partial aggregation is what bounds the shuffle — the
    full value column never moves, only 8-byte hashes.
    """
    hashed = (df.where(value_col.isNotNull())
              .select(*group_cols, kmv_hash(value_col).alias("_h"))
              .distinct())
    w = Window.partitionBy(*group_cols).orderBy(F.asc("_h"))
    topk = (hashed.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k))
    est = (F.when(F.col("_n") < k, F.col("_n").cast("double"))
           .otherwise(F.lit(float(k - 1))
                      / (F.col("_hk") / F.lit(_HASH_SPACE))))
    return (topk.groupBy(*group_cols)
            .agg(F.count("*").alias("_n"), F.max("_h").alias("_hk"))
            .select(*group_cols, F.round(est, 4).alias("est_distinct")))


def _kmv_check_k(sketch: DataFrame, k: int) -> DataFrame:
    """Fail loudly (at execution, distributed) when a sketch built
    with one k is consumed with another — a larger consume-time k
    would read a saturated bottom-64 set as an 'exact' count of ~64.
    The assertion is tied to ``_h`` so column pruning can't drop it;
    pre-stamp sketches (no ``_k`` column) pass through unchecked.
    Same geometry discipline as cms_build's _depth/_width stamps.
    """
    if "_k" not in sketch.columns:
        return sketch
    guard = F.assert_true(
        F.col("_k") == k,
        F.concat(F.lit("KMV sketch was built with k="),
                 F.col("_k").cast("string"),
                 F.lit(", consumed with k=%d" % k)))
    return (sketch.withColumn(
        "_h", F.when(guard.isNull(), F.col("_h"))).drop("_k"))


def kmv_merge(sketch_a: DataFrame, sketch_b: DataFrame,
              group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge two bottom-k hash sets (columns: group_cols + ``_h``).

    Union → distinct → keep the k smallest per group.  This is the
    combine step a tree aggregation runs between partitions; exposed
    for tests and for incremental (per-day sketch, merge at query
    time) pipelines.
    """
    merged = (_kmv_check_k(sketch_a, k)
              .unionByName(_kmv_check_k(sketch_b, k)).distinct())
    w = Window.partitionBy(*group_cols).orderBy(F.asc("_h"))
    return (merged.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k).drop("_r")
            .withColumn("_k", F.lit(k)))


def kmv_bottom_k(df: DataFrame, group_cols: list[str], value_col,
                 k: int = 64) -> DataFrame:
    """The raw sketch (group_cols + ``_h`` + ``_k`` rows) for merge
    pipelines.  NULL values carry no identity and are excluded, the
    COUNT(DISTINCT) convention; the ``_k`` stamp lets every consumer
    reject a k mismatch loudly instead of mis-estimating.

    Schema note (round 5): the ``_k`` column is new — sketch tables
    persisted by the pre-r5 version lack it.  ``kmv_merge`` handles
    legacy sketches, so combine stored old and new sketches through
    :func:`kmv_merge`, never a raw ``unionByName``."""
    hashed = (df.where(value_col.isNotNull())
              .select(*group_cols, kmv_hash(value_col).alias("_h"))
              .distinct())
    w = Window.partitionBy(*group_cols).orderBy(F.asc("_h"))
    return (hashed.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k).drop("_r")
            .withColumn("_k", F.lit(k)))


def kmv_estimate(sketch: DataFrame, group_cols: list[str],
                 k: int = 64) -> DataFrame:
    """Estimate from a raw bottom-k sketch (same formula as
    :func:`kmv_distinct`)."""
    sketch = _kmv_check_k(sketch, k)
    est = (F.when(F.col("_n") < k, F.col("_n").cast("double"))
           .otherwise(F.lit(float(k - 1))
                      / (F.col("_hk") / F.lit(_HASH_SPACE))))
    return (sketch.groupBy(*group_cols)
            .agg(F.count("*").alias("_n"), F.max("_h").alias("_hk"))
            .select(*group_cols, F.round(est, 4).alias("est_distinct")))


# --------------------------------------------------------------- Count-Min

def cms_hash(value_col, row: int, width: int) -> "F.Column":
    """Row-``row``'s cell index for a value: md5(value || '#row') folded
    into [0, width) — independent per row, bit-identical in DuckDB."""
    return (F.conv(F.substring(
        F.md5(F.concat(value_col.cast("string"), F.lit("#%d" % row))),
        1, 12), 16, 10).cast("long") % width)


def cms_build(df: DataFrame, value_col, depth: int = 4,
              width: int = 256) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a
    ``(row, col, cnt)`` cell table of at most depth·width rows.

    Frequency estimation at 10^10 rows without an exact groupBy on a
    high-cardinality key: the input shuffles ONLY by (row, col) — a
    bounded keyspace with map-side partial counts — never by the key
    itself, so a skewed hot key costs nothing extra.  Cell counts are
    pure sums, hence deterministic under any partitioning/arrival
    order, and the sketch is mergeable cell-wise
    (:func:`cms_merge`; merge(halves) == build(whole) is pinned by a
    test).  Estimates are upper bounds: est >= true count always,
    within εN with probability 1-δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
    """
    cells = F.array(*[
        F.struct(F.lit(r).alias("row"),
                 cms_hash(value_col, r, width).alias("col"))
        for r in range(depth)])
    # the sketch carries its own (depth, width) so a point query with
    # mismatched params fails loudly instead of silently returning 0s
    return (df.select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.col").alias("col"))
            .agg(F.count("*").alias("cnt"))
            .withColumn("_depth", F.lit(depth))
            .withColumn("_width", F.lit(width)))


def cms_merge(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Cell-wise sum — the combine step between partitions / days.

    Merging sketches of different (depth, width) is meaningless; the
    param columns ride the groupBy so a mismatch surfaces as rows with
    conflicting ``_depth``/``_width`` that :func:`cms_estimate` rejects.
    """
    return (sketch_a.unionByName(sketch_b)
            .groupBy("row", "col", "_depth", "_width")
            .agg(F.sum("cnt").alias("cnt")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, value_col: str,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point-query the sketch: min over the key's depth cells.

    A (row, col) absent from the cell table means zero observations —
    the left join's NULL coalesces to 0, so unseen keys estimate 0.
    Raises ``ValueError`` when ``depth``/``width`` disagree with the
    params stamped on the sketch at build time — a mismatch would
    silently hash probes into the wrong cells and break the
    never-underestimates guarantee.
    """
    stamped = sketch.select("_depth", "_width").distinct().collect()
    # an empty sketch (no observations in the partition/day) is valid:
    # there is no stamped geometry to contradict, and the left join
    # below coalesces every probe to the correct estimate of 0
    if stamped and (len(stamped) != 1
                    or (stamped[0]._depth, stamped[0]._width)
                    != (depth, width)):
        raise ValueError(
            "sketch was built with %s, queried with depth=%d width=%d"
            % ([(r._depth, r._width) for r in stamped], depth, width))
    sketch = sketch.drop("_depth", "_width")
    cells = F.array(*[
        F.struct(F.lit(r).alias("row"),
                 cms_hash(F.col(value_col), r, width).alias("col"))
        for r in range(depth)])
    probes = (keys.select(value_col, F.explode(cells).alias("c"))
              .select(value_col, "c.row", "c.col"))
    return (probes.join(F.broadcast(sketch), ["row", "col"], "left")
            .groupBy(value_col)
            .agg(F.min(F.coalesce("cnt", F.lit(0)))
                 .alias("est_count")))


# --------------------------------------------------------- HyperLogLog

_HLL_P = 8                      # 2^8 = 256 registers
_HLL_M = 1 << _HLL_P
_HLL_REM_BITS = 48 - _HLL_P     # 40-bit remainder per hash
_HLL_RHO_MAX = _HLL_REM_BITS + 1
# alpha_m * m^2 * 2^RHO_MAX for m=256, embedded as ONE literal so both
# engines parse the identical double and the estimate's only float ops
# are a single divide (+ the rounded ln in the linear-counting branch)
_HLL_NUMERATOR = 1.0351398986589102e+17


def hll_registers(df: DataFrame, group_cols: list[str],
                  value_col) -> DataFrame:
    """HLL register table per group: ``(group…, _reg, _rho)``.

    The classic HLL layout (Flajolet et al., "HyperLogLog: the analysis
    of a near-optimal cardinality estimation algorithm", AofA 2007) on
    the repo's explicit 48-bit md5 hash space: the top ``p=8`` bits
    pick one of 256 registers, and rho is the 1-based position of the
    remainder's highest set bit counted from the top — computed as
    ``41 − bit_length(remainder)`` entirely on integers (bit_length
    via base-2 ``conv``, no log), so Spark and DuckDB derive identical
    registers.

    Mergeable by construction: ``max(_rho)`` per (group, register) —
    union of sketches is elementwise max, which is what makes this a
    one-pass distributed operator (partials combine map-side; the only
    shuffle key is (group, register), at most 256 rows per group no
    matter how many billions of values arrived).
    """
    vcol = F.col(value_col) if isinstance(value_col, str) else value_col
    # COUNT(DISTINCT) convention: NULL carries no identity — an
    # unfiltered NULL would mint a phantom (_reg NULL, _rho NULL)
    # register that inflates the estimate
    df = df.where(vcol.isNotNull())
    h = kmv_hash(vcol)
    rem = h % F.lit(1 << _HLL_REM_BITS)
    rho = (F.when(rem == 0, F.lit(_HLL_RHO_MAX))
           .otherwise(F.lit(_HLL_RHO_MAX)
                      - F.length(F.conv(rem.cast("string"), 10, 2))))
    return (df.select(*group_cols,
                      F.shiftright(h, _HLL_REM_BITS).alias("_reg"),
                      rho.cast("int").alias("_rho"))
            .groupBy(*group_cols, "_reg")
            .agg(F.max("_rho").alias("_rho")))


def hll_estimate(registers: DataFrame,
                 group_cols: list[str]) -> DataFrame:
    """Cardinality estimate per group from an HLL register table.

    Integer-exact harmonic sum: every float-order trap in HLL's
    ``Σ 2^−M_j`` is avoided by scaling to ``Σ 2^(41−M_j)`` — each term
    a BIGINT power of two, the empty registers contributing ``2^41``
    apiece, the whole sum ≤ 2^49 so it is exact in both engines.  The
    estimate is then ONE double division of a shared literal
    (``alpha·m²·2^41``) by that integer, plus the standard
    linear-counting correction ``m·ln(m/V)`` when the raw estimate is
    under ``2.5m`` with empty registers (ln rounded to 6 decimals —
    the micro-nat discipline the perplexity oracle uses); the result
    rounds to 4 decimals.  Relative error ≈ 1.04/√m ≈ 6.5% at m=256.
    """
    g = (registers.groupBy(*group_cols)
         .agg(F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), %d - _rho)"
                           % _HLL_RHO_MAX))
              .alias("_s_present"),
              F.count("*").alias("_n_present")))
    empty = F.lit(_HLL_M) - F.col("_n_present")
    s = (F.col("_s_present")
         + empty * F.lit(1 << _HLL_RHO_MAX).cast("long"))
    raw = F.lit(_HLL_NUMERATOR) / s.cast("double")
    corrected = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (empty > 0),
        F.lit(float(_HLL_M))
        * F.round(F.log(F.lit(float(_HLL_M)) / empty.cast("double")), 6)
    ).otherwise(raw)
    return g.select(*group_cols,
                    F.round(corrected, 4).alias("hll_distinct"))
