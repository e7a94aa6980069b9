"""Similarity search over an embedding column (array<float>).

Two strategies, same semantics where they overlap:

- ``cosine_topk``       — brute-force exact top-k (the correctness baseline);
  one pass over all vectors per query batch, cosine computed as a codegen'd
  left-to-right fold (deterministic IEEE order -> oracle-hashable after
  round(6)).
- ``bucketed_topk``     — the scale path: sign-LSH partition pruning. Vectors
  are bucketed by the sign pattern of their first ``bucket_dims`` components;
  queries probe only their own bucket. At 100 TB the bucket becomes the
  table's partition key so probes are partition-pruned scans; recall is
  traded explicitly (documented, measured in tests vs brute force).

No Python in the scoring path: `F.zip_with` + `F.aggregate` stay inside
whole-stage codegen. A vectorized pandas-UDF variant would only win once
SIMD-able matrix batching matters (many queries x one broadcast matrix);
the operator API leaves room for it (`method=` switch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..scale.salt import ensure_parallelism


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def cosine_expr(a: Column, b: Column) -> Column:
    """cos(a,b) with a fixed evaluation order: dot/(sqrt(na)*sqrt(nb)).

    Left-to-right folds over equal-length arrays — bit-identical across
    engines that evaluate the same formula (the DuckDB oracle states exactly
    this shape).
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    nb = F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v)
    return dot / (F.sqrt(na) * F.sqrt(nb))


def sign_bucket_expr(vec: Column, bucket_dims: int = 4) -> Column:
    """Sign pattern of the first ``bucket_dims`` components, e.g. '+-+-'."""
    parts = [
        F.when(F.element_at(vec, i + 1).cast("double") >= 0, F.lit("+")).otherwise(
            F.lit("-")
        )
        for i in range(bucket_dims)
    ]
    return F.concat(*parts)


def sq_dist_expr(a: Column, b: Column) -> Column:
    """Squared L2 with a fixed fold order (portable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_assign(
    embeddings: DataFrame,
    n_cells: int = 8,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid.

    Centroids are the vectors with ids 0..n_cells-1 (deterministic seeds —
    a k-means step would refine them; the assignment/probe plan is the same).
    Shape: corpus x broadcast(centroids) -> per-vector argmin. The argmin is
    expressed as min-distance + min-id-at-that-distance (two aggregations)
    rather than min_by, because min_by tie-breaking is engine-defined and the
    oracle must reproduce ties exactly.
    """
    cents = embeddings.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    dists = (
        embeddings.select(
            F.col(id_col), _as_double(F.col(vec_col)).alias("v")
        )
        .crossJoin(F.broadcast(cents))
        .select(
            id_col,
            "cell_id",
            sq_dist_expr(F.col("v"), F.col("cv")).alias("dist"),
        )
    )
    min_d = dists.groupBy(id_col).agg(F.min("dist").alias("min_dist"))
    return (
        dists.join(F.broadcast(min_d), id_col)
        .where(F.col("dist") == F.col("min_dist"))
        .groupBy(id_col)
        .agg(F.min("cell_id").alias("cell"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    n_cells: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: top-k cosine within the query's cell only.

    At rest the cell is the table's partition key, so the probe is a
    partition-pruned scan of ~1/n_cells of the corpus (recall traded for
    fan-in, measured vs brute force in tests).
    """
    cells = ivf_assign(embeddings, n_cells, vec_col=vec_col, id_col=id_col)
    corpus = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).join(cells, id_col)
    q = corpus.where(F.col(id_col) == query_vec_id).select(
        F.col("v").alias("qv"), F.col("cell").alias("qcell")
    )
    return (
        corpus.where(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q), F.col("cell") == F.col("qcell"))
        .select(
            F.col(id_col),
            F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of the vector with ``query_vec_id``.

    The query vector is a 1-row broadcast cross join (no collect on the
    driver, no closure capture of data): at scale this generalizes to a
    broadcast of the whole (small) query set against the (huge) corpus.
    Deterministic tiebreak: (cosine desc, vec_id asc).
    """
    q = embeddings.where(F.col(id_col) == query_vec_id).select(
        _as_double(F.col(vec_col)).alias("qv")
    )
    corpus = ensure_parallelism(embeddings).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).where(F.col(id_col) != query_vec_id)
    return (
        corpus.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def batch_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Many-queries kNN — the realistic serving shape: the (small) query set
    broadcasts against the (huge) corpus; one pass computes every query's
    scores, a rank-over-query window takes top-k per query.

    Output: (query_id, vec_id, cosine, rank) with deterministic tiebreak
    (cosine desc, vec_id asc) — one shuffle (the per-query window), corpus
    scanned once regardless of |queries|.
    """
    from pyspark.sql import Window

    queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    corpus = ensure_parallelism(embeddings).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def bucketed_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_dims: int = 2,
) -> DataFrame:
    """Sign-LSH-pruned top-k: probe only the query's sign bucket.

    Same output contract as ``cosine_topk`` restricted to the bucket — the
    approximate/scale variant (bucket = partition key at rest -> the probe is
    a partition-pruned scan instead of a full sweep).
    """
    keyed = embeddings.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
        sign_bucket_expr(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    q = keyed.where(F.col(id_col) == query_vec_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        keyed.where(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            F.col(id_col),
            F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
