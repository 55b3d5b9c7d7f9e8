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

from pyspark.sql import DataFrame, functions as F


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


def near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                   vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicates: cosine ≥ threshold within label buckets.

    The label bucket is the blocking key (the all-pairs join never
    materializes across buckets); at scale replace with LSH hyperplane
    buckets over the same shape.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    slim = embeddings.select(
        "vec_id", "label", v.alias("v"),
        F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0),
                           lambda acc, x: acc + x)).alias("norm"))
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
