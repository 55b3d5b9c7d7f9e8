"""Similarity search over an embedding column (array<float>).

Two paths, per the scale playbook:

* brute-force cosine top-k — the correctness baseline; one narrow scan,
  a JVM-side ``aggregate``/``zip_with`` dot product (no Python), and a
  global top-k (``orderBy + limit`` → Spark's TakeOrdered, which does a
  per-partition partial top-k before the single reduce — no full sort
  shuffle);
* IVF-style bucketed search — restrict the scan to the query's coarse
  cell (here the ``label`` column stands in for a learned coarse
  quantizer; swap in kmeans cell ids at scale) so a 10^10-row table
  probes ~1/n_cells of the data;
* near-dup pairs — bucketed self-join with a cosine threshold.

Scores are rounded to 6 decimals so results hash identically across
engines (the DuckDB oracle uses list_cosine_similarity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# hot-bucket guard for LSH self-joins — see dedup.MAX_BUCKET
MAX_BUCKET = 200


def _l2norm(v):
    """Clamped column-side L2 norm (>= 1e-12): a zero vector — the
    common failed-embedding sentinel — must score 0, not throw
    DIVIDE_BY_ZERO under Spark's default ANSI mode (the same guard
    semdedup and the numpy kernels already apply)."""
    return F.greatest(
        F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0),
                           lambda acc, x: acc + x)),
        F.lit(1e-12))


def _cosine(vec_col, query: list):
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm_q = max(float(sum(x * x for x in query)) ** 0.5, 1e-12)
    return dot / (_l2norm(v) * F.lit(norm_q))


def cosine_topk(embeddings: DataFrame, query: list, k: int = 10,
                vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k (deterministic tie-break on vec_id)."""
    return (embeddings
            .select("vec_id", "label",
                    F.round(_cosine(vec_col, query), 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(k))


def ivf_topk(embeddings: DataFrame, query: list, query_label: int,
             k: int = 10, vec_col: str = "embedding") -> DataFrame:
    """IVF-style: probe only the query's coarse cell (label column)."""
    return cosine_topk(
        embeddings.where(F.col("label") == query_label), query, k, vec_col)


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Recall@k of an approximate top-k against the exact one.

    The ANN ladder's evaluation harness: ``|approx ∩ exact| / k`` over
    the ``vec_id`` result sets — how much of the true neighborhood a
    compressed or cell-probing scan keeps.  One semi-join over two
    k-row inputs (driver-free, trivially cheap); both inputs are
    deterministic top-k DataFrames, so the number is reproducible and
    hash-checkable cross-engine.  Returns one row
    ``(k int, n_overlap bigint, recall double)``.
    """
    overlap = exact.select("vec_id").join(
        approx.select("vec_id"), "vec_id", "left_semi")
    return (overlap.agg(F.count("*").alias("n_overlap"))
            .select(F.lit(k).cast("int").alias("k"),
                    "n_overlap",
                    F.round(F.col("n_overlap") / F.lit(float(k)), 6)
                    .alias("recall")))


def kmeans_cells(embeddings: DataFrame, n_cells: int = 16,
                 sample: int = 4096, iters: int = 5, seed: int = 7,
                 vec_col: str = "embedding") -> list:
    """Fit IVF coarse-quantizer centroids (spherical k-means on a sample).

    The standard IVF trainer shape: training runs on a bounded,
    deterministic sample (lowest ``vec_id``s — at 10^10 rows a
    quantizer is always fit on a sample, never the table), assignment
    runs distributed (:func:`assign_cells`).  Lloyd's iterations with
    cosine assignment (rows and centroids L2-normalized); deterministic
    sample + init → identical centroids every run.  The init picks the
    ``n_cells`` sample rows ranking lowest by ``md5(seed:vec_id)`` — a
    seed-keyed pseudo-random draw chosen over ``RandomState.choice``
    because it is *engine-portable*: the correctness driver's DuckDB
    oracle re-runs this whole trainer (init, five unrolled Lloyd
    iterations, assignment, probe fan-out, top-k) in pure SQL, the same
    way the hyperplane-LSH oracle re-derives its plane bucketing.
    Returns plain float lists so centroids can be broadcast into plans
    or persisted next to the index.
    """
    import hashlib

    rows = (embeddings.select("vec_id", vec_col).orderBy("vec_id")
            .limit(sample).collect())
    if not rows:
        # same loud contract as pq_train — an empty table would die
        # deep in numpy with an unrelated AxisError otherwise
        raise ValueError("kmeans_cells needs at least one embedding "
                         "row to fit centroids")
    vec_ids = [r[0] for r in rows]
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    keys = [hashlib.md5(("%d:%d" % (seed, v)).encode()).hexdigest()
            for v in vec_ids]
    order = sorted(range(len(keys)), key=lambda i: (keys[i], vec_ids[i]))
    C = X[order[:min(n_cells, len(X))]].copy()
    for _ in range(iters):
        owner = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[owner == j]
            if len(members):
                c = members.sum(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return [[float(x) for x in c] for c in C]


def assign_cells(embeddings: DataFrame, centroids: list,
                 vec_col: str = "embedding") -> DataFrame:
    """Add each row's nearest-centroid ``cell`` id (cosine argmax).

    Vectorized Arrow batches: one ``X @ C.T`` matmul per batch, no
    per-row Python.  Row norms don't change the argmax, so vectors are
    used as-is against the normalized centroids.
    """
    C = np.array(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def nearest(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int32")
        X = np.array([np.asarray(v, dtype=np.float64) for v in col])
        return pd.Series(np.argmax(X @ C.T, axis=1).astype("int32"))

    return embeddings.withColumn("cell", nearest(vec_col))


def ivf_kmeans_topk(embeddings: DataFrame, query: list, k: int = 10,
                    n_cells: int = 16, n_probe: int = 2,
                    centroids: list | None = None,
                    vec_col: str = "embedding") -> DataFrame:
    """IVF top-k over learned k-means cells (the real coarse quantizer).

    Probes the ``n_probe`` cells whose centroids are closest to the
    query, so only ~n_probe/n_cells of the table is scored — the same
    shape as :func:`ivf_topk` but with cells learned from the data
    instead of the trusted ``label`` column.  Approximate by design
    (recall grows with n_probe); the recall test pins it against
    :func:`cosine_topk`.  In production the ``cell`` column is
    materialized once by :func:`assign_cells` and the table is
    partitioned by it; here assignment runs inline.
    """
    if centroids is None:
        centroids = kmeans_cells(embeddings, n_cells, vec_col=vec_col)
    C = np.array(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    # stable sort: ties break toward the lower cell id, matching the
    # oracle's ORDER BY dot DESC, cell ASC
    probes = np.argsort(-(C @ q), kind="stable")[:n_probe].tolist()
    cells = assign_cells(embeddings, centroids, vec_col)
    return cosine_topk(cells.where(F.col("cell").isin(probes)),
                       query, k, vec_col)


def near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                   max_bucket: int = MAX_BUCKET,
                   vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicates: cosine ≥ threshold within label buckets.

    The label bucket is the blocking key (the all-pairs join never
    materializes across buckets), and — like every LSH sibling — label
    buckets above ``max_bucket`` are dropped before the self-join: one
    hot label is otherwise O(|bucket|²).  This remains the trusted-label
    baseline; :func:`hyperplane_near_dups` is the label-free scale path.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    slim = embeddings.select(
        "vec_id", "label", v.alias("v"),
        _l2norm(v).alias("norm"))
    from scrapely_spark.spark.dedup import _cap_buckets
    slim = _cap_buckets(slim, ["label"], max_bucket)
    a = slim.alias("a")
    b = slim.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, "label")
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"), "label",
                    F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6)
                    .alias("cosine"))
            .where(F.col("cosine") >= threshold))


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list:
    """Deterministic signed-random-projection hyperplanes.

    A fixed-seed Gaussian draw, returned as plain Python floats so the
    exact same coefficients can be inlined as literals into both the
    Spark plan and a SQL oracle (repr round-trips doubles exactly).
    """
    rng = np.random.RandomState(seed)
    return [[float(x) for x in row]
            for row in rng.standard_normal((n_planes, dim))]


def _band_keys(vec_col, planes: list, band_size: int):
    """One '0'/'1'-string bucket key per band of ``band_size`` planes."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []
    for p in planes:
        q = F.array(*[F.lit(x) for x in p])
        dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return [F.concat(*bits[b * band_size:(b + 1) * band_size])
            for b in range(len(planes) // band_size)]


def _score_pairs(pairs: DataFrame, embeddings: DataFrame,
                 a_col: str, b_col: str, vec_col: str) -> DataFrame:
    """Attach both endpoint vectors to each candidate pair and score
    cosine in ONE vectorized Arrow kernel.

    The previous JVM spelling — ``aggregate(zip_with(va, vb, *))`` per
    pair — runs interpreted (higher-order functions are excluded from
    whole-stage codegen), measured at 40-250 CPU-seconds for ~1M
    candidate pairs and unstable across runs.  The kernel computes the
    same ``round(dot / (|a|·|b|), 6)`` with a float64 einsum over each
    Arrow batch (guide §4.2) — the ``knn_join`` convention, whose
    rounded scores agree with the SQL oracle's fold.  Join shape is
    unchanged: pairs stay two longs through the shuffle; vectors
    attach by key.
    """
    emb = embeddings.select("vec_id", vec_col)
    both = (pairs
            .join(emb.select(F.col("vec_id").alias(a_col),
                             F.col(vec_col).alias("_va")), a_col)
            .join(emb.select(F.col("vec_id").alias(b_col),
                             F.col(vec_col).alias("_vb")), b_col)
            .select(a_col, b_col, "_va", "_vb"))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array([np.asarray(x, dtype=np.float64)
                          for x in pdf["_va"]])
            B = np.array([np.asarray(x, dtype=np.float64)
                          for x in pdf["_vb"]])
            an = np.maximum(np.linalg.norm(A, axis=1), 1e-12)
            bn = np.maximum(np.linalg.norm(B, axis=1), 1e-12)
            cos = np.round(np.einsum("ij,ij->i", A, B) / (an * bn), 6)
            yield pd.DataFrame({
                a_col: pdf[a_col].astype("int64"),
                b_col: pdf[b_col].astype("int64"),
                "cosine": cos})

    return both.mapInPandas(
        score, "%s long, %s long, cosine double" % (a_col, b_col))


def hyperplane_near_dups(embeddings: DataFrame, threshold: float = 0.9,
                         n_planes: int = 16, band_size: int = 4,
                         planes: list | None = None,
                         max_bucket: int = MAX_BUCKET,
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicates via signed-random-projection LSH.

    The 100 TB shape for ``near_dup_pairs``: candidates meet only when
    they agree on every sign bit of one band of random hyperplanes
    (collision prob per band = (1 - θ/π)^band_size, OR-ed over
    n_planes/band_size bands), so the all-pairs join never materializes
    and no trusted ``label`` column is needed.  Buckets above
    ``max_bucket`` are dropped before the self-join (hot-bucket guard).
    Deterministic: planes come from ``hyperplanes(dim, n_planes)``
    unless supplied, so a SQL oracle can reproduce the bucketing.
    """
    if planes is None:
        head = embeddings.select(vec_col).first()
        if head is None or head[0] is None:
            raise ValueError(
                "cannot derive the plane dimension from an "
                "empty embeddings table; pass planes= explicitly")
        planes = hyperplanes(len(head[0]), n_planes)
    keys = _band_keys(vec_col, planes, band_size)
    # one explode over a struct array, not a per-band union (a union
    # re-runs the scan + plane dot products once per band)
    band_arr = F.array(*[
        F.struct(F.lit(i).alias("band_id"), k.alias("band_key"))
        for i, k in enumerate(keys)])
    # slim-id banding (see hard_negatives for the measured audit): the
    # self-join and the pair dedup carry two longs per row, the
    # normalized vectors re-join by key, and the capped banded table
    # is cached so both join sides stop re-evaluating the n_planes
    # interpreted dot products per row
    from scrapely_spark.spark.dedup import _cap_buckets, _spread
    # widen a single-split scan before the n_planes interpreted dot
    # products per row — the banding is the map cost and otherwise
    # runs as one task (guide §2.5)
    banded = (_spread(embeddings.select("vec_id", vec_col)).select(
        "vec_id", F.explode(band_arr).alias("b"))
        .select("vec_id", "b.band_id", "b.band_key"))
    # eager localCheckpoint, not .cache(): the self-join below plans as
    # a broadcast join whose build side is a separate concurrent stage
    # job — two consumers racing a cold cache each re-ran the n_planes
    # interpreted dot products per row (and a previous call's deferred
    # unpersist can drop an identical-plan cache mid-query).  The
    # checkpoint computes the slim (vec_id, band_id, band_key) table
    # once, serially, before the fan-out.
    banded = _cap_buckets(banded, ["band_id", "band_key"],
                          max_bucket).localCheckpoint(eager=True)
    pairs = (banded.alias("a")
             .join(banded.alias("b"), ["band_id", "band_key"])
             .where(F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("vec_a"),
                     F.col("b.vec_id").alias("vec_b"))
             .distinct())
    # see hard_negatives: spread the scoring pass instead of letting
    # AQE's byte-based coalescing serialize it onto a few partitions
    pairs = pairs.repartition(
        embeddings.sparkSession.sparkContext.defaultParallelism,
        "vec_a")
    # banded is a localCheckpoint — blocks are freed by the
    # ContextCleaner when the plan is GC'd, no unpersist bookkeeping
    scored = _score_pairs(pairs, embeddings, "vec_a", "vec_b", vec_col)
    return scored.where(F.col("cosine") >= threshold)


def hard_negatives(embeddings: DataFrame, k: int = 3,
                   dup_threshold: float = 0.98,
                   n_planes: int = 16, band_size: int = 4,
                   planes: list | None = None,
                   max_bucket: int = MAX_BUCKET,
                   vec_col: str = "embedding") -> DataFrame:
    """Hard-negative mining for contrastive (CLIP-style) training:
    for every anchor embedding, the ``k`` most-similar OTHER items
    that are NOT near-duplicates (``cosine < dup_threshold`` — a
    near-dup is a false negative that would push apart two views of
    the same content).

    Same signed-random-projection bucketing as
    :func:`hyperplane_near_dups` — hard negatives are by definition
    high-similarity items, exactly what LSH buckets collide — but the
    pair set is DIRECTED (each anchor ranks its own candidates) and
    the verdict is a per-anchor top-k window over (cosine desc,
    neg_id asc) instead of a global threshold.

    Scale shape: candidates exist only inside capped buckets (the
    all-pairs matrix never materializes); the window partitions by
    anchor over a candidate list bounded by bands × max_bucket; output
    is O(anchors · k).  Anchors whose buckets hold no non-dup
    neighbor emit nothing — at training time they fall back to
    in-batch negatives.  Deterministic planes (fixed seed) keep the
    whole lineage SQL-replayable.
    """
    if planes is None:
        head = embeddings.select(vec_col).first()
        if head is None or head[0] is None:
            raise ValueError(
                "cannot derive the plane dimension from an "
                "empty embeddings table; pass planes= explicitly")
        planes = hyperplanes(len(head[0]), n_planes)
    keys = _band_keys(vec_col, planes, band_size)
    band_arr = F.array(*[
        F.struct(F.lit(i).alias("band_id"), kk.alias("band_key"))
        for i, kk in enumerate(keys)])
    # slim-id banding: unlike the undirected near-dup path, the
    # directed pair set is 2× the size, so the vectors must NOT ride
    # the band self-join — dedup (anchor, neg) on bare ids first, then
    # re-join the normalized vectors by key (the standard re-join
    # shape; cuts the band shuffle to two longs per row and computes
    # each surviving pair's dot product exactly once)
    from scrapely_spark.spark.dedup import _cap_buckets, _spread
    # widen a single-split scan before the n_planes interpreted dot
    # products per row (guide §2.5 — otherwise one task does them all)
    banded = (_spread(embeddings.select("vec_id", vec_col)).select(
        "vec_id", F.explode(band_arr).alias("b"))
        .select("vec_id", "b.band_id", "b.band_key"))
    # eager localCheckpoint: both sides of the self-join would
    # otherwise recompute the 16 interpreted hyperplane dot products
    # per row (the banding is the expensive half, the materialized
    # table is three slim columns) — see hyperplane_near_dups for why
    # a lazy .cache() loses the race against concurrent stage jobs
    banded = _cap_buckets(banded, ["band_id", "band_key"],
                          max_bucket).localCheckpoint(eager=True)
    pairs = (banded.alias("a")
             .join(banded.alias("b"), ["band_id", "band_key"])
             .where(F.col("a.vec_id") != F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("anchor_id"),
                     F.col("b.vec_id").alias("neg_id"))
             .distinct())
    # spread the scoring pass across the cluster: the pair list is
    # tiny in bytes, so AQE's byte-based coalescing would serialize
    # the whole score stage onto a handful of partitions.  anchor_id
    # is the window's partition key, so its ClusteredDistribution is
    # already satisfied and no further exchange is added.
    pairs = pairs.repartition(
        embeddings.sparkSession.sparkContext.defaultParallelism,
        "anchor_id")
    cand = (_score_pairs(pairs, embeddings, "anchor_id", "neg_id",
                         vec_col)
            .where(F.col("cosine") < dup_threshold))
    wr = (Window.partitionBy("anchor_id")
          .orderBy(F.col("cosine").desc(), F.col("neg_id").asc()))
    return (cand.withColumn("rank", F.row_number().over(wr))
            .where(F.col("rank") <= k))


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 5,
             vec_col: str = "embedding", max_queries: int = 4096) -> DataFrame:
    """KNN *join*: cosine top-k corpus neighbors for EVERY query row.

    The many-query sibling of :func:`cosine_topk` — the shape behind
    batch retrieval, dedup-against-index, and eval-set contamination
    checks.  The query side is the bounded one (an eval set, a probe
    batch); it is collected once (hard-capped at ``max_queries`` —
    this is the broadcast side, never the corpus) and shipped as a
    dense float64 matrix inside a ``mapInPandas`` kernel:

    * each Arrow batch of the corpus computes one ``X @ Q.T`` matmul
      (rows normalized on both sides) — no per-row Python;
    * the kernel emits only each batch's top-k per query, selected by
      the FINAL sort key (rounded score desc, vec_id asc), so the
      per-batch truncation is exact w.r.t. the global order;
    * a window rank per query_id over the ~#batches·|Q|·k surviving
      rows picks the global top-k.

    The corpus is scanned once with two narrow columns, the shuffle
    carries O(batches · |Q| · k) rows, and the driver never sees the
    corpus — the plan a 10^10-row table needs.
    """
    q_rows = (queries.select("vec_id", vec_col).orderBy("vec_id")
              .limit(max_queries + 1).collect())
    if len(q_rows) > max_queries:
        raise ValueError(
            "query side exceeds max_queries=%d; knn_join broadcasts the "
            "query side — flip the sides or raise the cap" % max_queries)
    if not q_rows:
        # no queries → no neighbors; short-circuit instead of handing
        # numpy a 0-d array to norm over
        return queries.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, score double")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    qn = np.maximum(np.linalg.norm(Q, axis=1), 1e-12)
    nq = len(q_ids)

    def partial_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            xn = np.maximum(np.linalg.norm(X, axis=1), 1e-12)
            # dot / (|x|·|q|) — the same op order as the SQL oracle's
            # cosine, so the rounded scores agree to the last bit
            S = np.round((X @ Q.T) / np.outer(xn, qn), 6)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            kk = min(k, len(ids))
            # exact per-batch top-k under the global (−score, vec_id)
            # order: lexsort is stable, secondary key = vec_id
            order = np.lexsort((np.broadcast_to(ids[:, None], S.shape),
                                -S), axis=0)[:kk]       # (kk, nq)
            qi = np.broadcast_to(np.arange(nq), (kk, nq)).ravel()
            ri = order.ravel()
            yield pd.DataFrame({
                "query_id": q_ids[qi],
                "vec_id": ids[ri],
                "score": S[ri, qi],
            })

    parts = corpus.select("vec_id", vec_col).mapInPandas(
        partial_topk, "query_id long, vec_id long, score double")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id"))
    return (parts.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k).drop("rnk"))


def sq8_minmax(embeddings: DataFrame, dim: int,
               vec_col: str = "embedding") -> tuple[list, list]:
    """Per-dimension min/max for scalar (int8-range) quantization.

    One aggregate pass with 2·dim JVM expressions (map-side partial
    min/max — no shuffle of vectors, one reduced row to the driver).
    Exact extrema, so the result is deterministic regardless of
    partitioning or fp summation order.
    """
    aggs = []
    for i in range(dim):
        # F.get (NULL out of bounds), not element_at (throws under
        # ANSI): one ragged vector must not kill the aggregate
        e = F.get(F.col(vec_col), i).cast("double")
        aggs.append(F.min(e).alias("mn%d" % i))
        aggs.append(F.max(e).alias("mx%d" % i))
    row = embeddings.agg(*aggs).first()
    mins = [float(row["mn%d" % i]) for i in range(dim)]
    maxs = [float(row["mx%d" % i]) for i in range(dim)]
    return mins, maxs


def _sq8_dequant(vec_col, mins: list, maxs: list):
    """Quantize-then-dequantize expression: x → code∈[0,255] → x̂.

    ``floor(t + 0.5)`` instead of round() — explicit half-up semantics
    that Spark and DuckDB evaluate identically on the same doubles.
    """
    mn = F.array(*[F.lit(float(x)) for x in mins])
    mx = F.array(*[F.lit(float(x)) for x in maxs])
    def dq(x, i):
        # F.get: a vector longer than dim would drive element_at
        # past the literal arrays and throw under ANSI mode
        lo = F.get(mn, i)
        hi = F.get(mx, i)
        rng = hi - lo
        t = (x.cast("double") - lo) * F.lit(255.0) / rng
        code = F.least(F.lit(255.0),
                       F.greatest(F.lit(0.0), F.floor(t + F.lit(0.5))))
        return F.when(rng > 0, lo + code * rng / F.lit(255.0)) \
                .otherwise(lo)
    return F.transform(F.col(vec_col), dq)


def sq8_topk(embeddings: DataFrame, query: list, k: int = 10,
             mins: list | None = None, maxs: list | None = None,
             vec_col: str = "embedding") -> DataFrame:
    """Cosine top-k over scalar-quantized (SQ8) vectors.

    The compressed-scan path: at 10^10 rows the embedding column
    dominates scan bytes, and SQ8 stores 1 byte/dimension (4× less
    than float32, 8× less than float64) at a recall cost the test
    suite pins against :func:`cosine_topk`.  Here the codes are
    derived inline from the same closed-form rule both engines can
    compute (train = one min/max aggregate, :func:`sq8_minmax`); a
    production table materializes the code column once at ingest and
    scans only it.  Scoring dequantizes per element inside a JVM
    ``transform`` — zero Python, whole-stage codegen end to end.
    """
    if mins is None or maxs is None:
        dim = len(query)
        mins, maxs = sq8_minmax(embeddings, dim, vec_col)
    xhat = _sq8_dequant(vec_col, mins, maxs)
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(F.zip_with(xhat, q, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = F.greatest(
        F.sqrt(F.aggregate(F.transform(xhat, lambda x: x * x),
                           F.lit(0.0), lambda acc, x: acc + x)),
        F.lit(1e-12))
    qnorm = max(float(sum(x * x for x in query)) ** 0.5, 1e-12)
    return (embeddings
            .select("vec_id", "label",
                    F.round(dot / (norm * F.lit(qnorm)), 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(k))


def pq_train(embeddings: DataFrame, m: int = 8, ksub: int = 16,
             sample: int = 1024, iters: int = 3, seed: int = 7,
             vec_col: str = "embedding") -> list:
    """Train product-quantization codebooks (one k-means per subspace).

    PQ splits each vector into ``m`` contiguous subvectors and learns a
    ``ksub``-centroid codebook per subspace; a vector is then stored as
    ``m`` small codes (m·log2(ksub) bits — 4 bytes here vs 256 for
    float32, a 64× compression) and scored against a query through
    per-subspace lookup tables (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011).

    Engine-portable determinism, like :func:`kmeans_cells`: bounded
    lowest-vec_id sample, per-subspace md5(seed:sub:vec_id)-ranked
    init, a fixed number of plain-L2 Lloyd iterations with assignment
    by argmax(dot(x,c) − ||c||²/2) and lowest-centroid tie-break,
    empty cells keeping their previous centroid.  The driver's DuckDB
    oracle re-runs this whole trainer in SQL (unrolled CTE chains per
    subspace), so the codebooks are checked, not trusted.

    Returns ``codebooks[m][ksub][dim/m]`` as plain floats.
    """
    import hashlib

    rows = (embeddings.select("vec_id", vec_col).orderBy("vec_id")
            .limit(sample).collect())
    if not rows:
        raise ValueError(
            "pq_train needs a non-empty training sample; the embeddings "
            "DataFrame produced no rows")
    vec_ids = [r[0] for r in rows]
    X = np.array([r[1] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError("dim %d not divisible by m=%d" % (dim, m))
    ds = dim // m
    books = []
    for j in range(m):
        S = X[:, j * ds:(j + 1) * ds]
        keys = [hashlib.md5(("%d:%d:%d" % (seed, j, v)).encode())
                .hexdigest() for v in vec_ids]
        order = sorted(range(len(keys)),
                       key=lambda i: (keys[i], vec_ids[i]))
        C = S[order[:min(ksub, len(S))]].copy()
        for _ in range(iters):
            # argmin ||x−c||² == argmax dot(x,c) − ||c||²/2; ties break
            # toward the lower centroid id (argmax returns the first)
            score = S @ C.T - 0.5 * (C * C).sum(axis=1)
            owner = np.argmax(score, axis=1)
            for c in range(len(C)):
                members = S[owner == c]
                if len(members):
                    C[c] = members.sum(axis=0) / len(members)
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_encode(embeddings: DataFrame, codebooks: list,
              vec_col: str = "embedding") -> DataFrame:
    """Add the ``codes`` column (array<int>, one code per subspace).

    Vectorized Arrow batches: per subspace one matmul + argmax over the
    same assignment rule the trainer used.  At production scale this
    runs once at ingest and the 4-byte code column replaces the 256-byte
    vector in every scan.
    """
    B = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    ds = B[0].shape[1]

    @F.pandas_udf("array<int>")
    def enc(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        X = np.array([np.asarray(v, dtype=np.float64) for v in col])
        codes = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            S = X[:, j * ds:(j + 1) * ds]
            score = S @ B[j].T - 0.5 * (B[j] * B[j]).sum(axis=1)
            codes[:, j] = np.argmax(score, axis=1)
        return pd.Series(list(codes))

    return embeddings.withColumn("codes", enc(vec_col))


def pq_topk(embeddings: DataFrame, query: list, k: int = 10,
            codebooks: list | None = None,
            vec_col: str = "embedding") -> DataFrame:
    """Cosine top-k via PQ asymmetric distance (ADC).

    Scoring never touches the vectors: ``dot(q, x̂) = Σ_m LUT_m[code_m]``
    and ``||x̂||² = Σ_m ||c_m[code_m]||²`` (subspaces are orthogonal
    blocks), where both lookup tables are tiny literals computed once
    from the query and codebooks.  After the one-off encode stage the
    per-row work is m integer-indexed array lookups in whole-stage
    codegen — the scan shape a 10^10-row compressed index needs.
    """
    if codebooks is None:
        codebooks = pq_train(embeddings, vec_col=vec_col)
    B = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    ds = B[0].shape[1]
    q = np.asarray(query, dtype=np.float64)
    dot_lut = [B[j] @ q[j * ds:(j + 1) * ds] for j in range(m)]
    n2_lut = [(B[j] * B[j]).sum(axis=1) for j in range(m)]
    coded = pq_encode(embeddings, codebooks, vec_col)
    dots = sum(
        F.element_at(F.array(*[F.lit(float(x)) for x in dot_lut[j]]),
                     F.element_at("codes", j + 1) + 1)
        for j in range(m))
    n2s = sum(
        F.element_at(F.array(*[F.lit(float(x)) for x in n2_lut[j]]),
                     F.element_at("codes", j + 1) + 1)
        for j in range(m))
    qnorm = max(float(np.sqrt((q * q).sum())), 1e-12)
    score = F.round(
        dots / (F.greatest(F.sqrt(n2s), F.lit(1e-12)) * F.lit(qnorm)),
        6)
    return (coded.select("vec_id", "label", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(k))


def pq_rerank_topk(embeddings: DataFrame, query: list, k: int = 10,
                   shortlist: int = 50, codebooks: list | None = None,
                   vec_col: str = "embedding") -> DataFrame:
    """PQ shortlist → exact re-rank: the production ANN composition.

    ADC scores over 4-byte codes select ``shortlist`` candidates (the
    cheap scan: no vectors read), then the exact cosine runs on just
    those rows (a semi-join back to the full vectors).  Closes most of
    the PQ recall gap at ~shortlist/N of the exact cost — the recall
    test pins the two-stage result against brute force.
    """
    if codebooks is None:
        codebooks = pq_train(embeddings, vec_col=vec_col)
    short = pq_topk(embeddings, query, shortlist, codebooks, vec_col) \
        .select("vec_id")
    return cosine_topk(
        embeddings.join(F.broadcast(short), "vec_id"), query, k, vec_col)


def bq_bits(vec_col: str = "embedding", dim: int = 64):
    """Sign-bit binary signature as two 32-bit halves (lo, hi).

    One bit per dimension (x_i ≥ 0), packed into two BIGINT columns so
    no term touches the sign bit — 64 literal-shift JVM expressions,
    whole-stage codegen, and the identical closed form in SQL.
    """
    def half(lo_bit, n):
        terms = [
            (F.get(F.col(vec_col), lo_bit + i) >= 0)
            .cast("long") * F.lit(1 << i)
            for i in range(n)]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    n_lo = min(32, dim)
    return half(0, n_lo), (half(32, dim - 32) if dim > 32
                           else F.lit(0).cast("long"))


def bq_topk(embeddings: DataFrame, query: list, k: int = 10,
            vec_col: str = "embedding") -> DataFrame:
    """Binary-quantization top-k: smallest hamming distance to the
    query's sign signature.

    The cheapest ANN scan there is — 8 bytes per row, two xor +
    bit_count per comparison, TakeOrderedAndProject on (hamming,
    vec_id).  1 bit/dim keeps only direction octant information, so
    this is a candidate generator (rerank shortlists like
    :func:`pq_rerank_topk`), not a ranker; the invariant tests pin
    sign-flip counting exactly against a numpy twin.
    """
    dim = len(query)
    q_lo = sum((1 << i) for i in range(min(32, dim)) if query[i] >= 0)
    q_hi = sum((1 << (i - 32)) for i in range(32, dim) if query[i] >= 0)
    lo, hi = bq_bits(vec_col, dim)
    ham = (F.bit_count(F.lit(q_lo).cast("long")
                       .bitwiseXOR(lo.cast("long")))
           + F.bit_count(F.lit(q_hi).cast("long")
                         .bitwiseXOR(hi.cast("long"))))
    return (embeddings
            .select("vec_id", "label", ham.cast("int").alias("hamming"))
            # NULLS LAST: a NULL-embedding row yields NULL hamming, and
            # plain asc() is NULLS FIRST in Spark — the garbage row
            # would rank as the #1 neighbor (desc-ordered cosine_topk
            # is safe only because desc is NULLS LAST)
            .orderBy(F.asc_nulls_last("hamming"), F.asc("vec_id"))
            .limit(k))


def semdedup(embeddings: DataFrame, eps: float = 0.4,
             n_cells: int = 8, max_cell: int = 1024,
             centroids: list | None = None,
             vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — public): cluster the embeddings with the IVF
    k-means trainer, then within each cluster drop every vector whose
    cosine to an earlier-ranked cluster-mate is ≥ ``eps``.

    Rank within a cell is ``(centroid_cosine asc, vec_id asc)`` — the
    member FARTHEST from the centroid survives a near-dup pair, the
    paper's diversity-keeping rule.  Both the pair cosine and the
    centroid cosine are rounded to 6 decimals before comparison so the
    decision is engine-portable (same argument as the LSH/IVF family:
    a divergence needs two dot products within ~1e-13).

    Scale shape: the trainer fits on a bounded sample
    (:func:`kmeans_cells`); assignment is one Arrow matmul pass
    (:func:`assign_cells`); the near-dup test is a per-cell self-join —
    at 10^10 rows ``n_cells`` grows with the data so cells stay
    bounded, and cells above ``max_cell`` are exempted from pairing
    (kept whole) rather than exploding O(cell²), mirroring the
    hot-bucket guard of every LSH sibling.  Returns one row per input
    vector: ``(vec_id, cell, keep)``.
    """
    if centroids is None:
        centroids = kmeans_cells(embeddings, n_cells, vec_col=vec_col)
    cells = assign_cells(embeddings, centroids, vec_col)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))
    vn = F.transform(v, lambda x: x / F.greatest(norm, F.lit(1e-12)))
    cent = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                     for c in centroids])
    ccos = F.round(F.aggregate(
        F.zip_with(F.col("vn"), F.element_at(cent, F.col("cell") + 1),
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x), 6)
    # slim feeds THREE consumers (both self-join sides and the final
    # per-vector output), and its lineage is the Arrow-batch matmul
    # assignment plus the normalization fold — materialize it eagerly
    # (localCheckpoint) so that pass runs once, not three times.  A
    # lazy persist lost the race against concurrent stage jobs (see
    # hyperplane_near_dups) and CacheManager's structural plan match
    # let a previous call's deferred unpersist drop it mid-query.
    from scrapely_spark.spark.dedup import _cap_buckets

    slim = (cells.select("vec_id", "cell", vn.alias("vn"))
            .withColumn("ccos", ccos)).localCheckpoint(eager=True)
    capped = _cap_buckets(slim, ["cell"], max_cell)
    a, b = capped.alias("a"), capped.alias("b")
    cos = F.round(F.aggregate(
        F.zip_with(F.col("a.vn"), F.col("b.vn"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x), 6)
    earlier = ((F.col("a.ccos") < F.col("b.ccos"))
               | ((F.col("a.ccos") == F.col("b.ccos"))
                  & (F.col("a.vec_id") < F.col("b.vec_id"))))
    dups = (a.join(b, "cell").where(earlier)
            .select(F.col("b.vec_id").alias("vec_id"),
                    cos.alias("cos"))
            .where(F.col("cos") >= eps)
            .select("vec_id").distinct()
            .withColumn("_dup", F.lit(True)))
    return (slim.select("vec_id", "cell")
            .join(dups, "vec_id", "left")
            .select("vec_id", "cell",
                    F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep")))
