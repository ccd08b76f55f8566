"""Approximate-nearest-neighbor search over embedding columns.

The kNN idea of the reference (nearest scene tile to a query point,
``accessors/sen2.py:483-492``) generalized to high-dimensional embeddings —
the similarity-search component a 100 TB training-data pipeline needs.

* ``brute_force_topk`` — exact cosine top-k as the correctness baseline:
  one pass, dot products via ``F.aggregate``/``zip_with`` (JVM-side, no
  UDF), window top-k per query.
* ``signbit_bucket`` / ``lsh_topk`` — the scale path: axis-aligned
  random-hyperplane LSH (sign pattern of the first P dimensions → bucket).
  Queries probe only their own bucket → the candidate set shrinks ~2^P×.
  At 10^12 vectors the table is written bucketed/partitioned by this key so
  probes are partition-pruned scans, no shuffle.
* ``near_dup_pairs`` — embedding-cosine near-duplicate detection within
  buckets (the image-dedup analogue of text MinHash).

All math is in double precision with deterministic formulas so DuckDB
oracles reproduce values to 1e-6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SIGN_DIMS = 8  # bucket key = sign pattern of first 8 dims → 256 buckets


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: (query_id, qvec). The corpus side streams once per query
    batch (broadcast the queries — they're the small side by construction);
    ranking is a per-query window with deterministic (score desc, vec_id)
    tie-break."""
    joined = embeddings.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def signbit_bucket(vec: Column, dims: int = SIGN_DIMS) -> Column:
    """LSH bucket id: bit d set iff vec[d] > 0 (axis-aligned hyperplanes)."""
    out = F.lit(0)
    for d in range(dims):
        out = out + F.when(F.element_at(vec, d + 1) > 0, F.lit(1 << d)).otherwise(0)
    return out.cast("int")


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Bucketed ANN: candidates share the query's sign-pattern bucket.
    Same output shape as brute_force_topk (rank within bucket); recall<1 by
    design — the scale/latency trade."""
    e = embeddings.withColumn("bucket", signbit_bucket(F.col("embedding")))
    q = queries.withColumn("bucket", signbit_bucket(F.col("qvec")))
    joined = e.join(F.broadcast(q), "bucket").where(F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def near_dup_pairs(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Embedding-cosine near-duplicates via the bucket join (vec_a < vec_b).

    At planetary scale this is the image-dedup primitive: bucket join
    (256-way partition-pruned), pairwise cosine only within buckets."""
    e = embeddings.select(
        F.col("vec_id"), F.col("embedding"),
        signbit_bucket(F.col("embedding")).alias("bucket"),
    )
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, "bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def knn_join_exact(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Self kNN join (every vector's k nearest others) — exact, windowed.
    The all-pairs stage is the documented O(n²) baseline; production uses
    lsh_topk's bucket join instead."""
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    scored = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
