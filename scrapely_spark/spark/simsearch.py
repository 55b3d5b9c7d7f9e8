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


def _cosine(vec_col, query: list):
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm_v = F.sqrt(F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0),
        lambda acc, x: acc + x))
    norm_q = float(sum(x * x for x in query)) ** 0.5
    return dot / (norm_v * F.lit(norm_q))


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
        F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0),
                           lambda acc, x: acc + x)).alias("norm"))
    w = Window.partitionBy("label")
    slim = (slim.withColumn("_bn", F.count("*").over(w))
            .where(F.col("_bn") <= max_bucket).drop("_bn"))
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
        dim = len(embeddings.select(vec_col).first()[0])
        planes = hyperplanes(dim, n_planes)
    keys = _band_keys(vec_col, planes, band_size)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # one explode over a struct array, not a per-band union (a union
    # re-runs the scan + plane dot products once per band)
    band_arr = F.array(*[
        F.struct(F.lit(i).alias("band_id"), k.alias("band_key"))
        for i, k in enumerate(keys)])
    banded = (embeddings.select(
        "vec_id", v.alias("v"),
        F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0),
                           lambda acc, x: acc + x)).alias("norm"),
        F.explode(band_arr).alias("b"))
        .select("vec_id", "v", "norm", "b.band_id", "b.band_key"))
    w = Window.partitionBy("band_id", "band_key")
    banded = (banded.withColumn("_bn", F.count("*").over(w))
              .where(F.col("_bn") <= max_bucket).drop("_bn"))
    a = banded.alias("a")
    b = banded.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, ["band_id", "band_key"])
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6)
                    .alias("cosine"))
            .distinct()
            .where(F.col("cosine") >= threshold))
