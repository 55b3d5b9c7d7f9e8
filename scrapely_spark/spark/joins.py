"""Temporal join operators the built-in DataFrame API lacks.

As-of joins ("for each left row, the latest right row at-or-before its
timestamp, per key") are a staple of event analytics that Spark has no
native operator for.  The naive encoding — an inequality theta-join plus
a per-left-row max — materializes O(|L|·|R|/keys) intermediate rows; at
a 10^10-row frontier's event volume that join never finishes.

The implementation here is the single-shuffle union trick:

1. tag left rows side=1 and right rows side=0 over a common
   ``(key, ts)`` spine (one ``unionByName`` — no join node at all);
2. one window per key ordered by ``(ts, side, order_col)`` carrying
   ``last(right_payload, ignorenulls=True)`` — a streaming frame, so
   each partition is a single forward pass with O(1) state;
3. keep the left rows and unpack the carried payload struct.

Cost: ONE hash exchange of |L|+|R| rows on the key — the same price as
a co-partitioned equi-join — and no intermediate blow-up.  Skewed keys
behave like any window skew (a hot key serializes its partition); the
politeness family's two-phase salting applies unchanged if a key is hot
enough to matter, and AQE's skew handling sees a plain exchange.

Semantics are pinned to DuckDB's native ``ASOF LEFT JOIN`` (the
correctness oracle): inclusive match (``l.ts >= r.ts``), left rows with
no earlier right row survive with NULLs.  DuckDB leaves ties among
right rows at the identical (key, ts) unspecified, so callers who need
cross-engine determinism dedupe the right side first (the driver query
keeps the max ``order_col`` per (key, ts) on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              right_cols: list[str], order_col: str,
              direction: str = "backward") -> DataFrame:
    """As-of join: latest ``right`` row with ``r.ts <= l.ts`` per key.

    ``right_cols`` are the right-side payload columns carried onto each
    left row (NULL when no right row precedes it).  ``order_col`` is a
    right-side column that breaks ties among right rows sharing one
    (key, ts) — the largest wins, deterministically.  Only
    ``direction="backward"`` (the common as-of) is implemented;
    "forward" is the same plan with the window reversed.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")
    # the tie-break orders on the column's OWN type (no cast — a long
    # cast truncated 1.9 vs 1.2 to a tie; a double cast would lose
    # longs above 2^53); a non-numeric order_col would still order,
    # but the determinism promise is documented for numerics only.
    # Exact-match against Spark's simpleString() names: prefix checks
    # are wrong in both directions (they reject 'tinyint'/'smallint'
    # and accept 'interval day to second', which starts with 'int').
    _NUMERIC = {"tinyint", "smallint", "int", "integer", "bigint",
                "long", "float", "double"}
    ord_type = right.schema[order_col].dataType.simpleString()
    if ord_type not in _NUMERIC and not ord_type.startswith("decimal("):
        raise ValueError(
            "order_col %r has type %s; as-of tie-break requires a "
            "numeric column" % (order_col, ord_type))
    reserved = {"_k", "_ts", "_side", "_ord", "_payload", "_match"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            "input columns %s collide with asof_join's reserved "
            "internal names" % sorted(clash))
    payload = F.struct(*[F.col(c) for c in right_cols])
    # a NULL right timestamp can never satisfy l.ts >= r.ts, and a
    # NULL right KEY must not enrich NULL-key left rows (SQL equi-join
    # semantics, which DuckDB's ASOF oracle follows: NULL = NULL never
    # matches — but partitionBy groups NULLs together) — drop both
    # before they sort into a partition and get carried
    right = right.where(F.col(ts).isNotNull() & F.col(key).isNotNull())
    r = right.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(order_col).alias("_ord"),
        payload.alias("_payload"))
    l = left.withColumn("_k", F.col(key)) \
            .withColumn("_ts", F.col(ts)) \
            .withColumn("_side", F.lit(1)) \
            .withColumn("_ord",
                        F.lit(None).cast(
                            right.schema[order_col].dataType)) \
            .withColumn("_payload",
                        F.lit(None).cast(r.schema["_payload"].dataType))
    both = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at the same ts (side 0 < 1), so
    # the carried payload is inclusive of r.ts == l.ts; among right rows
    # at one (key, ts) the largest _ord is seen last and wins.
    # NULLS FIRST on _ord: a right row with a NULL order_col must be
    # overwritten by every ranked row at the same (key, ts), not sort
    # after the maximum and steal the tie (left rows order by _side
    # alone, so their NULL _ord position is irrelevant)
    w = (Window.partitionBy("_k")
         .orderBy(F.col("_ts").asc(), F.col("_side").asc(),
                  F.col("_ord").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = both.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(c, F.col("_match").getField(c))
    keep = [c for c in left.columns] + list(right_cols)
    return out.select(*keep)


def range_join(points: DataFrame, intervals: DataFrame, key: str,
               ts: str, start_col: str, end_col: str,
               bucket: str = "6 hours",
               max_span_buckets: int = 4096) -> DataFrame:
    """Point-in-interval join: each ``points`` row × every ``intervals``
    row of the same key whose ``[start, end)`` contains its timestamp.

    The naive encoding is an inequality theta-join — Spark executes it
    as BroadcastNestedLoopJoin (O(|P|·|I|) comparisons) or refuses.
    The scalable encoding bucketizes time: each interval explodes into
    the fixed-width buckets it covers (``sequence`` + ``explode``,
    bounded by span/width rows), each point computes its single bucket,
    and an ordinary equi-join on ``(key, bucket)`` plus an exact
    containment filter finishes the job.  A point lives in exactly one
    bucket, so no pair is produced twice and no dedup pass is needed.

    ``bucket`` trades explosion factor against join selectivity: width
    ≈ median interval span keeps the blow-up ~2× while pruning nearly
    all non-overlapping comparisons.  Overlapping intervals are fine —
    each containing interval emits its own output row.

    Open-ended sentinel intervals (the common "still active" encoding:
    end = 9999-12-31) would explode into millions of bucket rows each
    and OOM the executor, so intervals spanning more than
    ``max_span_buckets`` buckets skip the explode entirely and go
    through a plain key equi-join + containment filter instead — for
    an interval that wide the candidate pairs ARE (close to) the true
    matches, so the bucket pruning buys nothing there anyway.  Both
    paths are hash equi-joins (never BroadcastNestedLoopJoin), no pair
    is produced twice (the two interval sets are disjoint), and the
    exact containment filter keeps results identical.
    """
    reserved = {"_bucket", "_w", "_us", "_us0", "_us1", "_first", "_last"}
    clash = reserved & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(
            "input columns %s collide with range_join's reserved "
            "internal names" % sorted(clash))
    width = F.expr("INTERVAL %s" % bucket)
    # unix_micros keeps sub-second widths exact — a cast("long") of
    # the shifted timestamp floors to whole seconds, so e.g. a
    # "500 milliseconds" bucket would silently become width 0 and
    # pmod-by-zero would NULL every bucket (an empty join, no error)
    w_us = F.unix_micros(F.lit(0).cast("timestamp") + width)
    w_us = F.when(w_us > 0, w_us).otherwise(F.raise_error(F.lit(
        "range_join bucket must be a positive interval, got: %s"
        % bucket)))

    # exact floor division on longs: pmod is non-negative, so
    # (x − pmod(x, w)) is an exact multiple of w, and integer `div` of
    # that multiple is the exact floor quotient — entirely in the long
    # domain.  A double `/` would round once |x| exceeds 2^53 µs
    # (years beyond ~2255, e.g. a 9999-12-31 sentinel end date) and
    # land one bucket low; a bare cast("long") of `/` would
    # additionally truncate toward zero and mis-bucket pre-1970
    # (negative-epoch) timestamps by one.
    _FLOORDIV = "({x} - pmod({x}, _w)) div _w"

    p = (points
         .withColumn("_us", F.unix_micros(F.col(ts).cast("timestamp")))
         .withColumn("_w", w_us)
         .withColumn("_bucket", F.expr(_FLOORDIV.format(x="_us")))
         .drop("_us", "_w"))
    # end is exclusive: the bucket of (end − 1µs) is the last covered,
    # under the SAME floor semantics as the point bucket
    staged = (intervals
              .withColumn("_us0",
                          F.unix_micros(F.col(start_col)
                                        .cast("timestamp")))
              .withColumn("_us1",
                          F.unix_micros(F.col(end_col)
                                        .cast("timestamp"))
                          - F.lit(1))
              .withColumn("_w", w_us)
              .withColumn("_first", F.expr(_FLOORDIV.format(x="_us0")))
              .withColumn("_last", F.expr(_FLOORDIV.format(x="_us1"))))
    span_ok = (F.col("_last") - F.col("_first")
               < F.lit(int(max_span_buckets)))
    containment = ((F.col(ts) >= F.col(start_col))
                   & (F.col(ts) < F.col(end_col)))
    i = (staged.where(span_ok)
         .withColumn("_bucket",
                     F.explode(F.sequence(
                         F.col("_first"),
                         F.greatest("_first", "_last"))))
         .drop("_us0", "_us1", "_w", "_first", "_last"))
    joined = p.join(i, on=[key, "_bucket"]) \
        .where(containment) \
        .drop("_bucket")
    wide = staged.where(~span_ok) \
        .drop("_us0", "_us1", "_w", "_first", "_last")
    joined_wide = p.drop("_bucket").join(wide, on=[key]) \
        .where(containment)
    return joined.unionByName(joined_wide)
