"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, score with JVM higher-order functions
  (zip_with + aggregate → sequential left-fold, bit-for-bit deterministic
  and oracle-matchable), rank with a per-query window. At 100 TB the
  corpus side stays partitioned; only queries broadcast.
* ``cosine_topk_ivf`` — IVF-style scale path: a coarse partition column
  (cluster/label id) prunes the search to matching buckets, turning the
  cross join into an equi-join on the bucket key. With balanced buckets
  this is a 1/n_buckets cost cut with identical in-bucket ranking.

All math in double precision with sequential fold order, so results are
IEEE-identical across engines (no rounding fudge needed for the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbours per query: (query_id, rank, neighbor_id, score)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = c.crossJoin(broadcast(q))
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn(
        "score", cosine_similarity_col(F.col("__qvec"), F.col("__cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "score")
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-bucketed top-k: search only the query's own coarse bucket.
    The bucket column plays the role of the IVF centroid assignment (a
    real deployment computes it with k-means once and stores it)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(bucket_col).alias("__qb"),
        F.col(vec_col).alias("__qvec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(bucket_col).alias("__cb"),
        F.col(vec_col).alias("__cvec"),
    )
    scored = c.join(broadcast(q), on=F.col("__cb") == F.col("__qb"))
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn(
        "score", cosine_similarity_col(F.col("__qvec"), F.col("__cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "score")
    )
