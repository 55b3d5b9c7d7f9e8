"""As-of join, KNN join, and SQ8 quantized-search semantics.

Each operator is checked against an independent in-process twin
(brute-force Python/numpy), not against its own plan — the DuckDB
hash oracle in test_driver_contract covers the cross-engine side.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as contract
from scrapely_spark.spark import simsearch, sketches
from scrapely_spark.spark.joins import asof_join, range_join

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# as-of join
# --------------------------------------------------------------------------

def _ts(s):
    return dt.datetime.fromisoformat(s)


def _brute_asof(left, right):
    """Reference semantics: latest right (ts <= l.ts) per key; ties on
    ts go to the largest ord."""
    out = []
    for lk, lts, lid in left:
        best = None
        for rk, rts, rid, payload in right:
            if rk != lk or rts > lts:
                continue
            if best is None or (rts, rid) > (best[0], best[1]):
                best = (rts, rid, payload)
        out.append((lid, best[2] if best else None))
    return dict(out)


def test_asof_join_matches_brute_force(spark):
    left_rows = [
        (1, _ts("2024-01-01T10:00:00"), 100),
        (1, _ts("2024-01-01T12:00:00"), 101),
        (1, _ts("2024-01-01T09:00:00"), 102),   # before every right row
        (2, _ts("2024-01-01T11:00:00"), 200),
        (3, _ts("2024-01-01T11:00:00"), 300),   # key with no right rows
    ]
    right_rows = [
        (1, _ts("2024-01-01T10:00:00"), 1, "r-eq"),    # equal ts: inclusive
        (1, _ts("2024-01-01T11:30:00"), 2, "r-late"),
        (2, _ts("2024-01-01T11:00:00"), 3, "r-tie-lo"),
        (2, _ts("2024-01-01T11:00:00"), 4, "r-tie-hi"),  # tie: max ord wins
    ]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        right_rows, "k long, ts timestamp, rid long, payload string")
    got = asof_join(left, right, key="k", ts="ts",
                    right_cols=["payload"], order_col="rid")
    by_lid = {r.lid: r.payload for r in got.collect()}
    want = _brute_asof([(k, t, i) for k, t, i in left_rows],
                       [(k, t, i, p) for k, t, i, p in right_rows])
    assert by_lid == want
    # the specific semantics the cases above encode:
    assert by_lid[100] == "r-eq"        # equal-ts match is inclusive
    assert by_lid[102] is None          # nothing at-or-before -> NULL
    assert by_lid[200] == "r-tie-hi"    # same-ts tie -> max order_col
    assert by_lid[300] is None          # unseen key survives (left join)


def test_asof_join_null_right_ts_never_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 10)], "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        [(1, None, 1, "null-ts")], "k long, ts timestamp, rid long, payload string")
    got = asof_join(left, right, key="k", ts="ts",
                    right_cols=["payload"], order_col="rid").collect()
    assert got[0].payload is None


def test_asof_join_single_shuffle(spark):
    """The union+window plan has exactly one exchange (on the key) —
    the whole point vs an inequality theta-join."""
    left = spark.range(10).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit("2024-01-01 10:00:00")).alias("ts"),
        F.col("id").alias("lid"))
    right = spark.range(10).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit("2024-01-01 09:00:00")).alias("ts"),
        F.col("id").alias("rid"), F.lit("p").alias("payload"))
    got = asof_join(left, right, key="k", ts="ts",
                    right_cols=["payload"], order_col="rid")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # no join node at all


def test_asof_driver_query_left_rows_preserved(spark):
    q = contract.queries()["asof_purchase_view"](spark, SF_DIR)
    n_purchases = (spark.read.parquet(SF_DIR + "/events.parquet")
                   .where("event_type = 'purchase'").count())
    rows = q.collect()
    assert len(rows) == n_purchases            # left join: no row lost
    matched = [r for r in rows if r.view_id is not None]
    assert matched and all(r.gap_s >= 0 for r in matched)


# --------------------------------------------------------------------------
# KNN join
# --------------------------------------------------------------------------

def test_knn_join_equals_per_query_topk(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    queries = emb.where("vec_id < 4")
    got = simsearch.knn_join(queries, emb, k=5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, -r.score, r.vec_id)):
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.score))
    assert sorted(by_q) == [0, 1, 2, 3]
    for qid in by_q:
        vec = emb.where(F.col("vec_id") == qid).first()["embedding"]
        want = [(r.vec_id, r.score)
                for r in simsearch.cosine_topk(emb, list(vec), 5).collect()]
        assert by_q[qid] == want, "query %d" % qid


def test_knn_join_partial_topk_is_exact_across_tiny_batches(spark):
    """Force many small Arrow batches: the per-batch top-k truncation
    must not change the global result (it selects by the final sort
    key, so it cannot)."""
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    baseline = {(r.query_id, r.vec_id, r.score)
                for r in simsearch.knn_join(
                    emb.where("vec_id < 3"), emb, k=4).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        tiny = {(r.query_id, r.vec_id, r.score)
                for r in simsearch.knn_join(
                    emb.where("vec_id < 3").repartition(5),
                    emb.repartition(5), k=4).collect()}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert tiny == baseline


def test_knn_join_query_cap_raises(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    with pytest.raises(ValueError, match="max_queries"):
        simsearch.knn_join(emb, emb, k=2, max_queries=10)


# --------------------------------------------------------------------------
# SQ8 scalar quantization
# --------------------------------------------------------------------------

def test_sq8_minmax_matches_numpy(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    X = np.array([list(r.embedding) for r in emb.collect()],
                 dtype=np.float64)
    mins, maxs = simsearch.sq8_minmax(emb, X.shape[1])
    assert np.allclose(mins, X.min(axis=0))
    assert np.allclose(maxs, X.max(axis=0))


def test_sq8_topk_high_recall_vs_exact(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    vec = list(emb.where("vec_id = 0").first()["embedding"])
    exact = [r.vec_id for r in simsearch.cosine_topk(emb, vec, 10).collect()]
    sq8 = [r.vec_id for r in simsearch.sq8_topk(emb, vec, 10).collect()]
    # 8-bit quantization on 64-dim vectors: near-lossless ranking
    assert len(set(exact) & set(sq8)) >= 8
    assert sq8[0] == 0                       # self is still the best match


def test_sq8_degenerate_constant_dimension(spark):
    rows = [(0, [1.0, 5.0]), (1, [1.0, 7.0]), (2, [1.0, 6.0])]
    emb = spark.createDataFrame(
        [(i, v, 0) for i, v in rows],
        "vec_id long, embedding array<double>, label int")
    out = simsearch.sq8_topk(emb, [1.0, 6.0], 3).collect()
    assert [r.vec_id for r in out] == [2, 1, 0]  # ordering survives rng=0


def test_sq8_dequant_error_bounded_by_half_step(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet").limit(50)
    X = np.array([list(r.embedding) for r in emb.collect()],
                 dtype=np.float64)
    mins, maxs = simsearch.sq8_minmax(emb, X.shape[1])
    xhat_df = emb.select(
        "vec_id",
        simsearch._sq8_dequant("embedding", mins, maxs).alias("xhat"))
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    xhat = {r.vec_id: np.array(r.xhat) for r in xhat_df.collect()}
    step = (np.array(maxs) - np.array(mins)) / 255.0
    for i, vid in enumerate(ids):
        assert np.all(np.abs(xhat[vid] - X[i]) <= step / 2 + 1e-12)


# --------------------------------------------------------------------------
# range join
# --------------------------------------------------------------------------

def _brute_range(points, intervals):
    out = []
    for pk, pts, pid in points:
        for ik, s, e, iid in intervals:
            if ik == pk and s <= pts < e:
                out.append((pid, iid))
    return sorted(out)


def test_range_join_matches_brute_force(spark):
    T = _ts
    points = [
        (1, T("2024-01-01T10:00:00"), 1),
        (1, T("2024-01-01T12:00:00"), 2),    # == interval start: inclusive
        (1, T("2024-01-01T13:00:00"), 3),    # == interval end: exclusive
        (1, T("2024-01-02T09:30:00"), 4),    # inside a 2-day interval
        (2, T("2024-01-01T10:00:00"), 5),    # right key, overlapping ivals
        (3, T("2024-01-01T10:00:00"), 6),    # key with no intervals
    ]
    intervals = [
        (1, T("2024-01-01T09:00:00"), T("2024-01-01T11:00:00"), 10),
        (1, T("2024-01-01T12:00:00"), T("2024-01-01T13:00:00"), 11),
        (1, T("2024-01-01T00:00:00"), T("2024-01-03T00:00:00"), 12),
        (2, T("2024-01-01T09:00:00"), T("2024-01-01T11:00:00"), 13),
        (2, T("2024-01-01T09:30:00"), T("2024-01-01T10:30:00"), 14),
    ]
    from scrapely_spark.spark.joins import range_join
    p = spark.createDataFrame(points, "k long, ts timestamp, pid long")
    i = spark.createDataFrame(
        intervals, "k long, s timestamp, e timestamp, iid long")
    for bucket in ["6 hours", "30 minutes", "3 days"]:
        got = sorted((r.pid, r.iid) for r in range_join(
            p, i, key="k", ts="ts", start_col="s", end_col="e",
            bucket=bucket).collect())
        assert got == _brute_range(points, intervals), bucket


def test_range_join_subsecond_bucket(spark):
    # a sub-second bucket width must stay exact (unix_micros), not
    # floor to zero seconds and silently produce an empty join
    T = _ts
    points = [(1, T("2024-01-01T10:00:00.200"), 1),
              (1, T("2024-01-01T10:00:01.700"), 2)]
    intervals = [(1, T("2024-01-01T10:00:00"),
                  T("2024-01-01T10:00:01"), 10)]
    from scrapely_spark.spark.joins import range_join
    p = spark.createDataFrame(points, "k long, ts timestamp, pid long")
    i = spark.createDataFrame(
        intervals, "k long, s timestamp, e timestamp, iid long")
    got = sorted((r.pid, r.iid) for r in range_join(
        p, i, key="k", ts="ts", start_col="s", end_col="e",
        bucket="500 milliseconds").collect())
    assert got == [(1, 10)]


def test_range_join_sentinel_interval_no_explosion(spark):
    # an open-ended "still active" interval (9999-12-31 sentinel end)
    # must not explode into millions of bucket rows: it takes the
    # key-equi-join path, results identical to brute force
    T = _ts
    points = [
        (1, T("2024-01-01T10:00:00"), 1),
        (1, T("2030-06-15T00:00:00"), 2),
        (1, T("2023-12-31T23:59:59"), 3),   # before the sentinel start
        (2, T("2024-01-01T10:00:00"), 4),   # other key: no interval
    ]
    intervals = [
        (1, T("2024-01-01T00:00:00"), T("9999-12-31T00:00:00"), 10),
        (1, T("2024-01-01T09:00:00"), T("2024-01-01T11:00:00"), 11),
    ]
    from scrapely_spark.spark.joins import range_join
    p = spark.createDataFrame(points, "k long, ts timestamp, pid long")
    i = spark.createDataFrame(
        intervals, "k long, s timestamp, e timestamp, iid long")
    df = range_join(p, i, key="k", ts="ts", start_col="s",
                    end_col="e", bucket="6 hours")
    got = sorted((r.pid, r.iid) for r in df.collect())
    assert got == _brute_range(points, intervals)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_is_equi_join_not_nested_loop(spark):
    from scrapely_spark.spark.joins import range_join
    e = spark.read.parquet(SF_DIR + "/events.parquet")
    p = e.where("event_type='purchase'").select("event_id", "user_id", "ts")
    i = e.where("event_type='view'").select(
        "user_id", F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"))
    plan = range_join(p, i, "user_id", "ts", "s", "e")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning" in plan or "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# KMV sketch
# --------------------------------------------------------------------------

def test_kmv_exact_below_k(spark):
    from scrapely_spark.spark.sketches import kmv_distinct
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)], "g string, v long")
    got = kmv_distinct(df, ["g"], F.col("v"), k=64).collect()
    assert len(got) == 1 and got[0].est_distinct == 7.0


def test_kmv_estimate_accuracy(spark):
    from scrapely_spark.spark.sketches import kmv_distinct
    n = 5000
    df = spark.range(n * 2).select(
        F.lit("g").alias("g"), (F.col("id") % n).alias("v"))
    est = kmv_distinct(df, ["g"], F.col("v"), k=256).first().est_distinct
    # relative error ~1/sqrt(k-2): 256 -> ~6%; allow 4 sigma
    assert abs(est - n) / n < 0.25, est


def test_kmv_sketch_is_mergeable(spark):
    """sketch(A) ⊎ sketch(B) == sketch(A ∪ B) — the property that makes
    the operator a one-pass distributed aggregation."""
    from scrapely_spark.spark import sketches
    e = spark.read.parquet(SF_DIR + "/events.parquet")
    val = F.concat_ws(":", F.col("user_id").cast("string"),
                      F.date_format(F.col("ts").cast("timestamp"),
                                    "yyyy-MM-dd"))
    half_a = e.where("event_id % 2 = 0")
    half_b = e.where("event_id % 2 = 1")
    merged = sketches.kmv_merge(
        sketches.kmv_bottom_k(half_a, ["event_type"], val, k=64),
        sketches.kmv_bottom_k(half_b, ["event_type"], val, k=64),
        ["event_type"], k=64)
    got = {(r.event_type, r.est_distinct)
           for r in sketches.kmv_estimate(
               merged, ["event_type"], k=64).collect()}
    want = {(r.event_type, r.est_distinct)
            for r in sketches.kmv_distinct(
                e, ["event_type"], val, k=64).collect()}
    assert got == want


# --------------------------------------------------------------------------
# product quantization
# --------------------------------------------------------------------------

def test_pq_train_deterministic_and_shapes(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    b1 = simsearch.pq_train(emb)
    b2 = simsearch.pq_train(emb)
    assert b1 == b2
    assert len(b1) == 8 and all(len(b) == 16 for b in b1)
    assert all(len(c) == 8 for b in b1 for c in b)


def test_pq_topk_self_first_and_rerank_recall(spark):
    """Raw PQ on incompressible random vectors is coarse by design
    (4-bit codes); the invariants that must hold anyway: the query
    itself wins rank 1, and the shortlist→exact-rerank composition
    recovers most of brute-force top-10."""
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    vec = list(emb.where("vec_id = 0").first()["embedding"])
    books = simsearch.pq_train(emb)
    pq = [r.vec_id for r in
          simsearch.pq_topk(emb, vec, 10, codebooks=books).collect()]
    assert pq[0] == 0
    exact = [r.vec_id for r in simsearch.cosine_topk(emb, vec, 10).collect()]
    rerank = [r.vec_id for r in simsearch.pq_rerank_topk(
        emb, vec, 10, shortlist=50, codebooks=books).collect()]
    assert len(set(exact) & set(rerank)) >= 6
    # the reranked scores are EXACT cosines: wherever ids agree with
    # brute force, scores must agree too
    exact_scores = {r.vec_id: r.score
                    for r in simsearch.cosine_topk(emb, vec, 10).collect()}
    for r in simsearch.pq_rerank_topk(emb, vec, 10, shortlist=50,
                                      codebooks=books).collect():
        if r.vec_id in exact_scores:
            assert r.score == exact_scores[r.vec_id]


def test_pq_encode_reconstruction_quality(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    books = simsearch.pq_train(emb)
    B = [np.array(b, dtype=np.float64) for b in books]
    rows = simsearch.pq_encode(emb.limit(100), books).collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xh = np.array([np.concatenate([B[j][r["codes"][j]] for j in range(8)])
                   for r in rows])
    cos = (X * xh).sum(1) / (np.linalg.norm(X, axis=1)
                             * np.linalg.norm(xh, axis=1))
    # random 64-dim data at 64x compression: centroids still carry the
    # signal direction (measured ~0.66 mean; structured real
    # embeddings compress far better)
    assert cos.mean() > 0.6 and cos.min() > 0.4
    assert all(0 <= c < 16 for r in rows for c in r["codes"])


# --------------------------------------------------------------------------
# seeded randomized twins (bigger than the hand cases; fixed seed so
# the run is deterministic)
# --------------------------------------------------------------------------

def test_asof_join_randomized_vs_brute(spark):
    rng = np.random.RandomState(11)
    base = dt.datetime(2024, 1, 1)
    # coarse second-resolution to force plenty of equal-ts ties
    left_rows = [(int(rng.randint(8)),
                  base + dt.timedelta(seconds=int(rng.randint(2000))),
                  i) for i in range(600)]
    right_rows = [(int(rng.randint(8)),
                   base + dt.timedelta(seconds=int(rng.randint(2000))),
                   i, "p%d" % i) for i in range(600)]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        right_rows, "k long, ts timestamp, rid long, payload string")
    got = {r.lid: r.payload
           for r in asof_join(left, right, key="k", ts="ts",
                              right_cols=["payload"],
                              order_col="rid").collect()}
    want = _brute_asof(left_rows, right_rows)
    assert got == want


def test_range_join_randomized_vs_brute(spark):
    from scrapely_spark.spark.joins import range_join
    rng = np.random.RandomState(13)
    base = dt.datetime(2024, 1, 1)
    points = [(int(rng.randint(6)),
               base + dt.timedelta(seconds=int(rng.randint(3000))),
               i) for i in range(500)]
    intervals = []
    for i in range(300):
        s = base + dt.timedelta(seconds=int(rng.randint(3000)))
        intervals.append((int(rng.randint(6)), s,
                          s + dt.timedelta(seconds=int(rng.randint(1, 900))),
                          i))
    p = spark.createDataFrame(points, "k long, ts timestamp, pid long")
    i_df = spark.createDataFrame(
        intervals, "k long, s timestamp, e timestamp, iid long")
    got = sorted((r.pid, r.iid) for r in range_join(
        p, i_df, key="k", ts="ts", start_col="s", end_col="e",
        bucket="5 minutes").collect())
    assert got == _brute_range(points, intervals)
    assert len(got) > 500  # overlapping intervals produce multi-matches


# --------------------------------------------------------------------------
# binary quantization
# --------------------------------------------------------------------------

def test_bq_topk_matches_numpy_sign_counting(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    rows = emb.collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = X[ids == 0][0]
    ham = ((X >= 0) != (q >= 0)).sum(axis=1)
    order = np.lexsort((ids, ham))[:10]
    want = [(int(ids[i]), int(ham[i])) for i in order]
    got = [(r.vec_id, r.hamming)
           for r in simsearch.bq_topk(emb, list(q), 10).collect()]
    assert got == want
    assert got[0] == (0, 0)  # self signature distance is zero


def test_cms_upper_bound_and_exactness(spark):
    from pyspark.sql import functions as F
    from scrapely_spark.spark import sketches
    # skewed frequencies: key i appears i+1 times
    rows = [(k,) for k in range(40) for _ in range(k + 1)]
    df = spark.createDataFrame(rows, "k long")
    sk = sketches.cms_build(df, F.col("k"), depth=4, width=4096)
    keys = spark.createDataFrame([(k,) for k in range(42)], "k long")
    got = {r.k: r.est_count for r in
           sketches.cms_estimate(sk, keys, "k", depth=4,
                                 width=4096).collect()}
    for k in range(40):
        assert got[k] >= k + 1            # CMS never underestimates
        assert got[k] == k + 1            # width 4096 >> 40: no collision
    assert got[40] == 0 and got[41] == 0  # unseen keys estimate zero


def test_cms_merge_equals_whole(spark):
    from pyspark.sql import functions as F
    from scrapely_spark.spark import sketches
    rows = [(k % 13,) for k in range(500)]
    df = spark.createDataFrame(rows, "k long")
    whole = {(r.row, r.col): r.cnt for r in
             sketches.cms_build(df, F.col("k"), width=32).collect()}
    merged = {(r.row, r.col): r.cnt for r in sketches.cms_merge(
        sketches.cms_build(df.where("k < 7"), F.col("k"), width=32),
        sketches.cms_build(df.where("k >= 7"), F.col("k"), width=32),
    ).collect()}
    assert merged == whole and whole


def test_cms_random_twin(spark):
    # seeded random stream vs a direct python Count-Min with the same
    # md5 cell hashes: cells AND estimates must match exactly
    import hashlib
    import random
    from collections import Counter
    from pyspark.sql import functions as F
    from scrapely_spark.spark import sketches
    rng = random.Random(5)
    stream = [rng.randrange(30) for _ in range(800)]
    depth, width = 4, 64
    def cell(k, r):
        h = hashlib.md5(("%d#%d" % (k, r)).encode()).hexdigest()
        return int(h[:12], 16) % width
    cells = Counter((r, cell(k, r)) for k in stream for r in range(depth))
    df = spark.createDataFrame([(k,) for k in stream], "k long")
    got_cells = {(r.row, r.col): r.cnt for r in
                 sketches.cms_build(df, F.col("k"), depth, width).collect()}
    assert got_cells == dict(cells)
    keys = spark.createDataFrame([(k,) for k in range(32)], "k long")
    got_est = {r.k: r.est_count for r in sketches.cms_estimate(
        sketches.cms_build(df, F.col("k"), depth, width),
        keys, "k", depth, width).collect()}
    want_est = {k: min(cells.get((r, cell(k, r)), 0)
                       for r in range(depth)) for k in range(32)}
    assert got_est == want_est


def test_cms_param_mismatch_raises(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F
    from scrapely_spark.spark import sketches
    df = spark.createDataFrame([(1,), (2,)], "k long")
    sk = sketches.cms_build(df, F.col("k"), depth=4, width=1024)
    keys = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError, match="built with"):
        sketches.cms_estimate(sk, keys, "k")          # default width=256
    with _pytest.raises(ValueError, match="built with"):
        sketches.cms_estimate(sk, keys, "k", depth=2, width=1024)
    # matching params still work
    [r] = sketches.cms_estimate(sk, keys, "k", depth=4,
                                width=1024).collect()
    assert r.est_count == 1


# --------------------------------------------------------------------------
# round-4 advice regressions
# --------------------------------------------------------------------------

def test_asof_join_rejects_non_numeric_order_col(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100)], "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), "a", "p")],
        "k long, ts timestamp, name string, v string")
    with pytest.raises(ValueError, match="numeric"):
        asof_join(left, right, key="k", ts="ts",
                  right_cols=["v"], order_col="name")


def test_asof_join_rejects_reserved_column_clash(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 9)], "k long, ts timestamp, _ord long")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 1, "p")],
        "k long, ts timestamp, rid long, v string")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, key="k", ts="ts",
                  right_cols=["v"], order_col="rid")


def test_range_join_pre1970_bucket_boundary(spark):
    """Negative-epoch end timestamps must use floor (not truncate-to-zero)
    bucketing: an interval ending exactly on a bucket boundary before
    1970 previously lost its last covered bucket and dropped matches."""
    from scrapely_spark.spark.joins import range_join
    T = _ts
    points = [
        (1, T("1969-12-31T22:30:00"), 1),   # inside, pre-epoch
        (1, T("1969-12-31T23:59:59"), 2),   # just before an end boundary
        (1, T("1970-01-01T00:00:00"), 3),   # == end: exclusive
    ]
    intervals = [
        (1, T("1969-12-31T18:00:00"), T("1970-01-01T00:00:00"), 10),
    ]
    p = spark.createDataFrame(points, "k long, ts timestamp, pid long")
    i = spark.createDataFrame(
        intervals, "k long, s timestamp, e timestamp, iid long")
    for bucket in ["6 hours", "30 minutes", "1 days"]:
        got = sorted((r.pid, r.iid) for r in range_join(
            p, i, key="k", ts="ts", start_col="s", end_col="e",
            bucket=bucket).collect())
        assert got == _brute_range(points, intervals), bucket


def test_knn_join_empty_queries_returns_empty(spark):
    corpus = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    empty_q = corpus.where("vec_id < 0")
    out = simsearch.knn_join(empty_q, corpus, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == \
        ["query_id", "vec_id", "score"]


def test_pq_train_empty_sample_raises(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    with pytest.raises(ValueError, match="non-empty"):
        simsearch.pq_train(emb.where("vec_id < 0"))


def test_cms_estimate_empty_sketch_estimates_zero(spark):
    from scrapely_spark.spark import sketches
    df = spark.createDataFrame([], "k long")
    sk = sketches.cms_build(df, F.col("k"), depth=4, width=256)
    keys = spark.createDataFrame([(1,), (2,)], "k long")
    got = {r.k: r.est_count for r in
           sketches.cms_estimate(sk, keys, "k", depth=4,
                                 width=256).collect()}
    assert got == {1: 0, 2: 0}


def test_asof_join_accepts_small_int_order_col(spark):
    # simpleString() of ShortType is 'smallint' — a prefix-based guard
    # rejected it even though the long cast is lossless; exact-name
    # matching must accept every integral width
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100)],
        "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 7, "lo"),
         (1, _ts("2024-01-01T09:00:00"), 9, "hi")],
        "k long, ts timestamp, rid smallint, v string")
    out = asof_join(left, right, key="k", ts="ts",
                    right_cols=["v"], order_col="rid").collect()
    assert out[0].v == "hi"          # largest tie-break wins


def test_asof_join_rejects_interval_order_col(spark):
    # 'interval day to second'.startswith('int') is True — the old
    # prefix guard let it through and the long cast NULLed every row
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100)],
        "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), "p")],
        "k long, ts timestamp, v string").selectExpr(
            "k", "ts", "v", "INTERVAL '1' DAY AS dur")
    with pytest.raises(ValueError, match="numeric"):
        asof_join(left, right, key="k", ts="ts",
                  right_cols=["v"], order_col="dur")


def test_range_join_far_future_sentinel_end_exact(spark):
    # |unix_micros| beyond 2^53 (years ≳ 2255) is not representable in
    # a double: the old (a - pmod)/b double quotient rounded one bucket
    # low and dropped genuinely contained pairs.  A 9999-12-31 sentinel
    # end date is the common open-interval spelling, so the bucketing
    # must stay exact in the long domain.
    p = spark.createDataFrame(
        [(1, _ts("9998-12-31T23:59:59"), 1)],
        "k long, ts timestamp, pid long")
    i = spark.createDataFrame(
        [(1, _ts("9998-12-31T00:00:00"), _ts("9999-12-31T00:00:00"), 10)],
        "k long, start timestamp, end timestamp, iid long")
    out = range_join(p, i, key="k", ts="ts",
                     start_col="start", end_col="end").collect()
    assert [(r.pid, r.iid) for r in out] == [(1, 10)]


def test_range_join_rejects_reserved_column_clash(spark):
    p = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 5)],
        "k long, ts timestamp, _bucket long")
    i = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), _ts("2024-01-01T11:00:00"))],
        "k long, start timestamp, end timestamp")
    with pytest.raises(ValueError, match="reserved"):
        range_join(p, i, key="k", ts="ts",
                   start_col="start", end_col="end")


# ---------------------------------------------------------- HyperLogLog

def test_hll_estimate_within_error_bound(spark):
    # 5000 distinct values, m=256 → stderr ≈ 6.5%; assert within 4σ
    df = spark.createDataFrame([(i % 2, f"v{i}") for i in range(5000)],
                               "g int, v string")
    out = {r.g: r.hll_distinct for r in sketches.hll_estimate(
        sketches.hll_registers(df, ["g"], "v"), ["g"]).collect()}
    for g in (0, 1):
        assert abs(out[g] - 2500) / 2500 < 0.26, out


def test_hll_registers_merge_is_elementwise_max(spark):
    # sketch(whole) == max-merge(sketch(half1), sketch(half2)) — the
    # property that makes HLL a one-pass distributed operator
    import pyspark.sql.functions as F
    rows = [(0, f"v{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g int, v string")
    whole = sketches.hll_registers(df, ["g"], "v")
    h1 = sketches.hll_registers(df.where("substring(v,2) % 2 = 0"),
                                ["g"], "v")
    h2 = sketches.hll_registers(df.where("substring(v,2) % 2 = 1"),
                                ["g"], "v")
    merged = (h1.unionByName(h2).groupBy("g", "_reg")
              .agg(F.max("_rho").alias("_rho")))
    assert (sorted(map(tuple, whole.collect()))
            == sorted(map(tuple, merged.collect())))


def test_hll_linear_counting_small_range(spark):
    # 3 distinct values: raw estimate far under 2.5m with empty
    # registers → the m·ln(m/V) correction fires and lands near 3
    df = spark.createDataFrame([(0, v) for v in "abc"],
                               "g int, v string")
    r, = sketches.hll_estimate(
        sketches.hll_registers(df, ["g"], "v"), ["g"]).collect()
    assert 2.9 <= r.hll_distinct <= 3.1


def test_sketches_ignore_nulls(spark):
    """COUNT(DISTINCT) semantics: NULL carries no identity — it must
    not steal a bottom-k slot or mint a phantom HLL register."""
    df = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", None), ("g", "a")],
        "g string, v string")
    got = sketches.kmv_distinct(df, ["g"], F.col("v")).first()
    assert got.est_distinct == 2.0
    regs = sketches.hll_registers(df, ["g"], "v").collect()
    assert all(r._reg is not None for r in regs)
    clean = df.where("v IS NOT NULL")
    a = sketches.hll_estimate(
        sketches.hll_registers(df, ["g"], "v"), ["g"]).first()
    b = sketches.hll_estimate(
        sketches.hll_registers(clean, ["g"], "v"), ["g"]).first()
    assert a.hll_distinct == b.hll_distinct


def test_kmv_k_mismatch_fails_loudly(spark):
    """A bottom-64 sketch consumed with k=128 would read saturation as
    an 'exact' count of ~64; the _k stamp turns that into an error."""
    df = spark.createDataFrame(
        [("g", str(i)) for i in range(5000)], "g string, v string")
    sk = sketches.kmv_bottom_k(df, ["g"], F.col("v"), k=64)
    est = sketches.kmv_estimate(sk, ["g"], k=64).first()
    assert est.est_distinct > 3000  # saturated estimate, not ~64
    with pytest.raises(Exception, match="built with k=64"):
        sketches.kmv_estimate(sk, ["g"], k=128).collect()
    with pytest.raises(Exception, match="built with k=64"):
        sketches.kmv_merge(sk, sk, ["g"], k=32).collect()


def test_asof_join_float_ties_and_null_semantics(spark):
    # (1) double order_col ties break on the REAL value (a long cast
    # collapsed 1.9 vs 1.2 into a tie); (2) a NULL order_col row loses
    # to every ranked row; (3) NULL keys never match NULL keys (the
    # DuckDB ASOF equi-join rule the docstring pins)
    left = spark.createDataFrame(
        [("k", 10), (None, 10)], "k string, ts long")
    right = spark.createDataFrame(
        [("k", 5, 1.2, "low"), ("k", 5, 1.9, "high"),
         ("k", 5, None, "unranked"), (None, 5, 9.9, "nullkey")],
        "k string, ts long, o double, payload string")
    got = {(r.k, r.ts): r.payload
           for r in asof_join(left, right, key="k", ts="ts",
                              right_cols=["payload"],
                              order_col="o").collect()}
    assert got[("k", 10)] == "high"
    assert got[(None, 10)] is None


def test_asof_join_long_order_not_truncated(spark):
    # longs above 2^53 must keep exact ordering (a double cast would
    # round them together)
    a, b = (1 << 60) + 3, (1 << 60) + 1
    left = spark.createDataFrame([("k", 10)], "k string, ts long")
    right = spark.createDataFrame(
        [("k", 5, b, "small"), ("k", 5, a, "big")],
        "k string, ts long, o long, payload string")
    got = asof_join(left, right, key="k", ts="ts",
                    right_cols=["payload"], order_col="o").first()
    assert got.payload == "big"


def test_topk_null_and_zero_embeddings(spark):
    # a NULL embedding row must not rank first in bq_topk (NULL
    # hamming sorts last), and a zero vector must score 0 in
    # cosine_topk, not throw DIVIDE_BY_ZERO under ANSI mode
    rows = [(0, 0, [1.0, 0.0, 0.0, 0.0]),
            (1, 0, [0.9, 0.1, 0.0, 0.0]),
            (2, 0, None),
            (3, 0, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    q = [1.0, 0.0, 0.0, 0.0]
    top = simsearch.bq_topk(df, q, k=2, vec_col="embedding").collect()
    assert [r.vec_id for r in top] == [0, 1]
    cos = {r.vec_id: r.score
           for r in simsearch.cosine_topk(df, q, k=4,
                                          vec_col="embedding").collect()}
    assert cos[3] == 0.0


def test_empty_embeddings_fail_loudly(spark):
    empty = spark.createDataFrame(
        [], "vec_id long, label int, embedding array<double>")
    with pytest.raises(ValueError, match="at least one embedding"):
        simsearch.kmeans_cells(empty)
    with pytest.raises(ValueError, match="empty embeddings table"):
        simsearch.hyperplane_near_dups(empty)
