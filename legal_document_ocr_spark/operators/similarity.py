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

from pyspark.sql import Column, DataFrame, Window
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


def sign_bucket_expr(vec: Column, bucket_dims: int = 4, offset: int = 0) -> Column:
    """Sign pattern of components [offset, offset+bucket_dims), e.g. '+-+-'.

    ``offset`` lets banded sign-LSH key each band on a disjoint coordinate
    range (band b -> offset b*bucket_dims), so one sign flip in a near-dup
    only kills that band's bucket match, not the pair.
    """
    parts = [
        F.when(
            F.element_at(vec, offset + i + 1).cast("double") >= 0, F.lit("+")
        ).otherwise(F.lit("-"))
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


def _assign_to_centroids(
    corpus: DataFrame, cents: DataFrame, id_col: str
) -> DataFrame:
    """Per-vector argmin over a broadcast centroid table -> (id, cell).

    ``corpus``: (id, v double[]); ``cents``: (cell_id, cv double[]) — the
    centroid side is bounded (n_cells rows), the ONLY broadcast here. The
    argmin is ONE aggregation: ``min(struct(dist, cell_id))`` orders by dist
    first, then cell_id — the same deterministic min-distance /
    min-id-at-that-distance tie-break as two aggregations, without joining a
    corpus-sized min-distance frame back (the round-1 plan broadcast one row
    per corpus vector through the driver — the named 100 TB failure mode).
    """
    dists = corpus.crossJoin(F.broadcast(cents)).select(
        id_col,
        "cell_id",
        sq_dist_expr(F.col("v"), F.col("cv")).alias("dist"),
    )
    return (
        dists.groupBy(id_col)
        .agg(F.min(F.struct("dist", "cell_id")).alias("m"))
        .select(id_col, F.col("m.cell_id").alias("cell"))
    )


def _refine_centroids(
    corpus: DataFrame, assigned: DataFrame, id_col: str
) -> DataFrame:
    """One k-means update: new centroid = component-wise mean per cell.

    posexplode -> groupBy(cell, pos) -> exact decimal mean -> re-assemble the
    array ordered by pos. Sums go through DECIMAL(28,12) of the 12-dp-rounded
    component so the mean is order-independent (parallel double summation is
    not) — the oracle states the identical computation. Output is n_cells
    rows: bounded, broadcastable.
    """
    comp = (
        corpus.join(assigned, id_col)
        .select("cell", F.posexplode("v").alias("pos", "comp"))
        .groupBy("cell", "pos")
        .agg(
            (
                F.sum(F.round(F.col("comp"), 12).cast("decimal(28,12)"))
                .cast("double")
                / F.count("*")
            ).alias("cv_i")
        )
    )
    return comp.groupBy(F.col("cell").alias("cell_id")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv_i"))),
            lambda s: s["cv_i"],
        ).alias("cv")
    )


def ivf_assign(
    embeddings: DataFrame,
    n_cells: int = 8,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid.

    Seed centroids are the vectors with ids 0..n_cells-1 (deterministic);
    ``refine_iters`` k-means iterations re-estimate them (assign -> mean ->
    re-assign) — every step is corpus x broadcast(n_cells), one shuffle on
    the short (id, cell) key; nothing corpus-sized is ever broadcast.
    """
    corpus = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    cents = embeddings.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    for _ in range(refine_iters):
        assigned = _assign_to_centroids(corpus, cents, id_col)
        cents = _refine_centroids(corpus, assigned, id_col)
    return _assign_to_centroids(corpus, cents, id_col)


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
    scores, two-phase partial top-k merges them per query.

    Output: (query_id, vec_id, cosine, rank) with deterministic tiebreak
    (cosine desc, vec_id asc) — corpus scanned once regardless of |queries|;
    no task ever holds more than k rows per (query, partition).
    """
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
    # two-phase top-k (replaces a rank window partitioned by query_id, which
    # routed ALL corpus scores for one query through a single reducer): each
    # input partition keeps its local top-k per query (map-side combined
    # collect_list -> sort -> slice), the final merge per query sees at most
    # k x n_partitions rows. Sort key struct(-cosine, id) = (cosine desc,
    # id asc) — the same deterministic order as the window formulation.
    item = F.struct((-F.col("cosine")).alias("neg"), F.col(id_col).alias("vid"))
    partial = scored.groupBy(
        "query_id", F.spark_partition_id().alias("_pid")
    ).agg(F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("topk"))
    final = partial.groupBy("query_id").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("topk"))), 1, k
        ).alias("topk")
    )
    return (
        final.select("query_id", F.posexplode("topk").alias("pos", "item"))
        .select(
            "query_id",
            F.col("item.vid").alias(id_col),
            (-F.col("item.neg")).alias("cosine"),
            (F.col("pos") + 1).alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    m: int = 4,
    codes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011, PQ + asymmetric distance
    computation): vectors are split into ``m`` subspaces, each sub-vector
    quantized to its nearest of ``codes`` codewords; a query scores the
    corpus from its per-(subspace, codeword) distance TABLE — m lookups +
    one sum per vector instead of a full d-dim distance.

    This is the third ANN scale path next to sign-LSH bucketing and IVF:
    the encoded corpus is m small ints per vector (~64x compression at
    d=64), so at 100 TB the scored table is code columns only — the float
    payload never rescans. Codewords are deterministically seeded from the
    vectors with ids 0..codes-1 (the ivf_assign convention).

    Plan shape: the ONLY broadcasts are the codebook (m*codes rows) and the
    query's distance table (m*codes rows) — both bounded by construction;
    encoding is corpus x broadcast(codebook) -> min(struct(dist, code)) per
    (id, subspace) (the argmin-without-join-back shape); ADC scoring sums
    6-dp-rounded DECIMAL table entries per id (exact, order-independent),
    one double cast at the end. Deterministic tiebreak: (adist asc, id asc).

    Output: (vec_id, adist) — the approximate squared-L2 top-k.
    """
    corpus = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    sd = (F.size("v") / m).cast("int")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.struct(
            s.alias("sub"), F.slice(F.col("v"), s * sd + 1, sd).alias("sv")
        ),
    )
    subrows = ensure_parallelism(corpus).select(
        id_col, F.explode(subs).alias("x")
    ).select(id_col, "x.sub", "x.sv")
    cb = subrows.where(F.col(id_col) < codes).select(
        F.col("sub").alias("csub"),
        F.col(id_col).alias("code"),
        F.col("sv").alias("cv"),
    )
    enc = (
        subrows.join(F.broadcast(cb), F.col("sub") == F.col("csub"))
        .select(
            id_col,
            "sub",
            "code",
            sq_dist_expr(F.col("sv"), F.col("cv")).alias("dist"),
        )
        .groupBy(id_col, "sub")
        .agg(F.min(F.struct("dist", "code")).alias("mn"))
        .select(id_col, "sub", F.col("mn.code").alias("code"))
    )
    qsub = subrows.where(F.col(id_col) == query_vec_id).select(
        F.col("sub").alias("qs"), F.col("sv").alias("qv")
    )
    dtable = qsub.join(F.broadcast(cb), F.col("qs") == F.col("csub")).select(
        F.col("qs").alias("sub"),
        "code",
        F.round(sq_dist_expr(F.col("qv"), F.col("cv")), 6)
        .cast("decimal(28,12)")
        .alias("qd"),
    )
    return (
        enc.where(F.col(id_col) != query_vec_id)
        .join(F.broadcast(dtable), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.sum("qd").alias("s"))
        .select(id_col, F.col("s").cast("double").alias("adist"))
        .orderBy(F.col("adist").asc(), F.col(id_col))
        .limit(k)
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


def ivf_inertia(
    embeddings: DataFrame,
    n_cells: int = 8,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cell k-means INERTIA (sum of squared distances to the assigned
    centroid) — the clustering-quality gauge that decides whether an IVF
    index needs more cells or another refinement round. Same corpus x
    broadcast(n_cells) argmin as ivf_assign, but the min distance is KEPT
    and summed per cell as round(·,12) decimals (double sums are
    order-dependent; the fixed-fold dist itself is engine-identical).
    Output: (cell, n_vecs, inertia_micro).
    """
    corpus = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    cents = embeddings.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    dists = corpus.crossJoin(F.broadcast(cents)).select(
        id_col,
        "cell_id",
        sq_dist_expr(F.col("v"), F.col("cv")).alias("dist"),
    )
    per_vec = (
        dists.groupBy(id_col)
        .agg(F.min(F.struct("dist", "cell_id")).alias("m"))
        .select(
            F.col("m.cell_id").alias("cell"),
            F.round(F.col("m.dist"), 12).cast("decimal(28,12)").alias("d"),
        )
    )
    return per_vec.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.floor(F.sum("d").cast("double") * 1000000.0)
        .cast("long")
        .alias("inertia_micro"),
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_cells: int = 8,
    threshold: float = 0.99,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by embedding — cluster the corpus into k-means cells,
    compare pairs only WITHIN a cell, and for every pair whose cosine
    clears ``threshold`` drop the member CLOSER to its centroid (the
    published keep-the-outlier rule: the point nearer the cell center is
    the more redundant one). Exact ties on distance (true byte-copies)
    drop the larger id. This is the embedding-space complement of
    MinHash near-dup: it removes paraphrases/translations/re-renders
    that share no n-grams.

    Scale shape: cell assignment is corpus x broadcast(n_cells) (the only
    broadcast — bounded); the within-cell pair join is an equi-join on
    the short (cell) key with both corpus-sized sides pinned
    ``shuffle_hash``. Within-cell pairing is the algorithm's published
    cost — at 100 TB, n_cells scales with the corpus (n / target cell
    size ~1e4) so cells stay bounded and skew-free; nothing corpus-sized
    is ever broadcast or collected.

    Determinism/portability: distances and cosines are fixed-order
    left-to-right folds (engine-identical bit patterns); the emitted
    distance is floor(dist * 1e6). Output: (vec_id, cell, dist_micro,
    kept) — one row per input vector.
    """
    corpus = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    cents = embeddings.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    assigned = (
        corpus.crossJoin(F.broadcast(cents))
        .select(
            id_col,
            "cell_id",
            sq_dist_expr(F.col("v"), F.col("cv")).alias("dist"),
        )
        .groupBy(id_col)
        .agg(F.min(F.struct("dist", "cell_id")).alias("m"))
        .select(id_col, F.col("m.cell_id").alias("cell"), F.col("m.dist").alias("dist"))
    )
    av = assigned.join(corpus.hint("shuffle_hash"), id_col)
    left = av.select(
        F.col(id_col).alias("id_a"),
        F.col("cell").alias("cell_a"),
        F.col("dist").alias("dist_a"),
        F.col("v").alias("va"),
    )
    right = av.select(
        F.col(id_col).alias("id_b"),
        F.col("cell").alias("cell_b"),
        F.col("dist").alias("dist_b"),
        F.col("v").alias("vb"),
    )
    pairs = left.hint("shuffle_hash").join(
        right.hint("shuffle_hash"),
        (F.col("cell_a") == F.col("cell_b")) & (F.col("id_a") < F.col("id_b")),
    ).where(F.round(cosine_expr(F.col("va"), F.col("vb")), 6) >= threshold)
    losers = pairs.select(
        F.when(F.col("dist_a") < F.col("dist_b"), F.col("id_a"))
        .when(F.col("dist_b") < F.col("dist_a"), F.col("id_b"))
        .otherwise(F.greatest("id_a", "id_b"))
        .alias(id_col)
    ).distinct()
    return (
        av.join(losers.hint("shuffle_hash").withColumn("dropped", F.lit(True)),
                id_col, "left")
        .select(
            id_col,
            F.col("cell").cast("long").alias("cell"),
            F.floor(F.col("dist") * 1000000.0).cast("long").alias("dist_micro"),
            F.col("dropped").isNull().alias("kept"),
        )
    )


def bucketed_batch_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    bucket_dims: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Many-queries ANN under the sign-LSH bucket index: each query only
    scores corpus vectors in ITS bucket (the serving shape of
    ``bucketed_topk``, batched the way ``batch_topk`` batches the exact
    scan). The bucket equi-join replaces the cross join — at 1e9 vectors
    with b sign dims the candidate set shrinks ~2^b-fold while the scan
    stays one pass; the (tiny) query set broadcasts, the corpus never
    moves.

    Output: (query_id, vec_id, cosine, rank) — deterministic tiebreak
    (cosine desc, vec_id asc); queries whose bucket holds fewer than k
    candidates return fewer rows (recall is measured by ``ann_recall``).
    """
    bucket = sign_bucket_expr(F.col(vec_col), bucket_dims)
    queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        bucket.alias("qbucket"),
    )
    corpus = ensure_parallelism(embeddings).select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
        bucket.alias("bucket"),
    )
    scored = (
        corpus.join(
            F.broadcast(queries), F.col("bucket") == F.col("qbucket")
        )
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
    )
    item = F.struct((-F.col("cosine")).alias("neg"), F.col(id_col).alias("vid"))
    partial = scored.groupBy(
        "query_id", F.spark_partition_id().alias("_pid")
    ).agg(F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("topk"))
    final = partial.groupBy("query_id").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("topk"))), 1, k
        ).alias("topk")
    )
    return (
        final.select("query_id", F.posexplode("topk").alias("pos", "item"))
        .select(
            "query_id",
            F.col("item.vid").alias(id_col),
            (-F.col("item.neg")).alias("cosine"),
            (F.col("pos") + 1).alias("rank"),
        )
    )


def ann_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    bucket_dims: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of the sign-LSH bucketed index against the exact scan —
    the eval harness every ANN deployment needs before trusting the
    approximate path (the embedding-retrieval counterpart of
    ``neardup_eval``'s LSH-tuning sweep): per query, how many of the
    true top-k does the bucket actually surface?

    Scale shape: both sides are the batched one-pass formulations
    (``batch_topk`` / ``bucketed_batch_topk`` — query set broadcasts,
    corpus scanned once each); the comparison joins two k-row-per-query
    tables (k*|Q| rows total, trivially small) and aggregates. At eval
    time |Q| is a sample (hundreds), so the whole harness costs two
    corpus scans regardless of corpus size.

    Output per query: (query_id, n_exact, n_approx, n_overlap,
    recall_ppm = floor(1e6 * n_overlap / n_exact)). All-integer.
    """
    exact = batch_topk(
        embeddings, query_ids, k, vec_col=vec_col, id_col=id_col
    ).select("query_id", F.col(id_col).alias("_ar_id"))
    approx = bucketed_batch_topk(
        embeddings,
        query_ids,
        k,
        bucket_dims=bucket_dims,
        vec_col=vec_col,
        id_col=id_col,
    ).select(
        "query_id", F.col(id_col).alias("_ar_id"), F.lit(1).alias("_ar_hit")
    )
    joined = exact.join(approx.hint("shuffle_hash"), ["query_id", "_ar_id"], "left")
    per_q = joined.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact"),
        F.sum(F.coalesce(F.col("_ar_hit"), F.lit(0))).cast("long").alias("n_overlap"),
    )
    approx_n = approx.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_approx")
    )
    return (
        per_q.join(approx_n.hint("shuffle_hash"), "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_approx"), F.lit(0)).cast("long").alias("n_approx"),
            "n_overlap",
            F.floor(F.col("n_overlap") * 1000000 / F.col("n_exact"))
            .cast("long")
            .alias("recall_ppm"),
        )
    )


def rrf_fuse(
    ranked_lists: DataFrame,
    *,
    rrf_k: int = 60,
    id_col: str = "vec_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) over any number of
    retrieval lists — the standard way to combine a lexical ranking
    (BM25 / token overlap) with an embedding ranking without score
    calibration: each list contributes 1/(rrf_k + rank) per item.

    Input: (list_name, id_col, rank). Contributions are computed as
    floor(1e9 / (rrf_k + rank)) and summed as INTEGERS — exact,
    order-independent, engine-portable (the float formulation would be
    summation-order-dependent).

    Scale shape: one map-side-combined groupBy over the union of the
    (k x |lists|)-row ranked lists; the lists themselves come from
    one-pass retrieval operators. Deterministic output order key
    (rrf_nano desc, id asc) via final sort columns.

    Output: (id_col, n_lists, best_rank, rrf_nano).
    """
    contrib = F.floor(F.lit(1000000000) / (F.lit(rrf_k) + F.col("rank")))
    return (
        ranked_lists.select(
            F.col(id_col),
            F.col("list_name"),
            F.col("rank"),
            contrib.alias("_rrf_c"),
        )
        .groupBy(id_col)
        .agg(
            F.countDistinct("list_name").cast("long").alias("n_lists"),
            F.min("rank").cast("long").alias("best_rank"),
            F.sum("_rrf_c").cast("long").alias("rrf_nano"),
        )
    )


def ivf_admission(
    corpus: DataFrame,
    batch: DataFrame,
    n_cells: int = 8,
    *,
    cell_cap: int = 1 << 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Incremental IVF index maintenance: assign an ARRIVING batch to the
    existing coarse cells (centroids frozen — re-training per batch would
    invalidate the whole index) and flag cells whose combined population
    exceeds ``cell_cap`` — the split/re-train trigger every streaming ANN
    index needs (a crawl's embedding inflow is never uniform across
    cells; hot cells degrade to brute-force scans unless split).

    Scale shape: both assignments are corpus x broadcast(n_cells) argmin
    scans (the ivf_assign shape — the centroid table is the ONLY
    broadcast); populations are two short-key groupBys full-outer-merged
    on the bounded cell domain. The batch never joins the corpus.

    Output: (cell, corpus_n, batch_n, total_n, overfull).
    """
    cents = corpus.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    cn = (
        _assign_to_centroids(
            corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v")),
            cents,
            id_col,
        )
        .groupBy("cell")
        .agg(F.count("*").alias("corpus_n"))
    )
    bn = (
        _assign_to_centroids(
            batch.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v")),
            cents,
            id_col,
        )
        .groupBy("cell")
        .agg(F.count("*").alias("batch_n"))
    )
    return (
        cn.join(bn, "cell", "full_outer")
        .select(
            F.col("cell").cast("long"),
            F.coalesce("corpus_n", F.lit(0)).cast("long").alias("corpus_n"),
            F.coalesce("batch_n", F.lit(0)).cast("long").alias("batch_n"),
        )
        .withColumn(
            "total_n", (F.col("corpus_n") + F.col("batch_n")).cast("long")
        )
        .withColumn(
            "overfull",
            (F.col("total_n") > cell_cap).cast("int").cast("long"),
        )
    )


def centroid_drift(
    snap_a: DataFrame,
    snap_b: DataFrame,
    group_df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-group embedding-centroid drift between two snapshots — the
    embedding-space monitoring gauge (did src7's content shift since the
    last crawl?) that catches topical/spam drift invisible to length or
    vocabulary stats. cos(centroid_A, centroid_B) per group, floored to
    micro units.

    Portability/scale: per-(group, dim) component sums are
    round(·,12)-pinned decimal(28,12) (exact, order-independent — the
    grouped-mean discipline of ivf's refine step); means divide as
    doubles; the cross-snapshot dot/norm sums run over the bounded
    (group x dim) centroid table and are ALSO decimal-pinned, so no
    float sum anywhere depends on partial-aggregation order. Raw vectors
    are scanned once per snapshot; the group join is shuffle_hash
    (group_df is corpus-sized id->group metadata, never broadcast).

    Output: (group, n_a, n_b, cos_micro, drift_micro = 1e6 - cos_micro).
    """
    def comp_means(snap: DataFrame, tag: str) -> DataFrame:
        labeled = snap.select(
            F.col(id_col), _as_double(F.col(vec_col)).alias("v")
        ).join(
            group_df.select(
                F.col(id_col), F.col(group_col).alias("grp")
            ).hint("shuffle_hash"),
            id_col,
        )
        comp = labeled.select(
            "grp", F.posexplode("v").alias("dim", "x")
        ).select(
            "grp",
            "dim",
            F.round(F.col("x"), 12).cast("decimal(28,12)").alias("xd"),
        )
        return comp.groupBy("grp", "dim").agg(
            (F.sum("xd").cast("double") / F.count("*")).alias(f"c_{tag}"),
            F.count("*").alias(f"n_{tag}"),
        )
    a = comp_means(snap_a, "a")
    b = comp_means(snap_b, "b")
    j = a.join(b.hint("shuffle_hash"), ["grp", "dim"]).select(
        "grp",
        "n_a",
        "n_b",
        F.round(F.col("c_a") * F.col("c_b"), 12)
        .cast("decimal(28,12)")
        .alias("ab"),
        F.round(F.col("c_a") * F.col("c_a"), 12)
        .cast("decimal(28,12)")
        .alias("aa"),
        F.round(F.col("c_b") * F.col("c_b"), 12)
        .cast("decimal(28,12)")
        .alias("bb"),
    )
    cos = F.col("sab").cast("double") / (
        F.sqrt(F.col("saa").cast("double")) * F.sqrt(F.col("sbb").cast("double"))
    )
    return (
        j.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.sum("ab").alias("sab"),
            F.sum("aa").alias("saa"),
            F.sum("bb").alias("sbb"),
        )
        .select(
            group_col,
            "n_a",
            "n_b",
            F.floor(cos * 1000000).cast("long").alias("cos_micro"),
        )
        .withColumn(
            "drift_micro", (F.lit(1000000) - F.col("cos_micro")).cast("long")
        )
    )


def multiprobe_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_dims: int = 4,
) -> DataFrame:
    """Multi-probe sign-LSH top-k: probe the query's sign bucket AND its
    ``bucket_dims`` Hamming-1 neighbors (one sign flipped) — the
    standard recall lever for LSH retrieval (Lv et al. 2007): a true
    neighbor whose vector straddles one hyperplane lands one flip away,
    so probing adjacent buckets recovers it WITHOUT halving the key
    width (which would double every bucket's size corpus-wide). Probe
    cost grows linearly (1 -> dims+1 buckets); bucket size shrinks
    exponentially in dims — the trade every production ANN layer makes.

    Scale shape: the probe set is dims+1 rows broadcast to an equi-join
    on the bucket key — with the corpus bucketed/partitioned by sign
    key at rest this is a partition-pruned scan of dims+1 buckets, not
    a sweep. Same output contract as ``cosine_topk`` restricted to the
    probed buckets.

    Output: (id, cosine) top-k by (cosine desc, id).
    """
    keyed = embeddings.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
        sign_bucket_expr(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    q = keyed.where(F.col(id_col) == query_vec_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    flip = [F.col("qb")]
    for i in range(bucket_dims):
        ch = F.substring("qb", i + 1, 1)
        flip.append(
            F.concat(
                F.substring("qb", 1, i),
                F.when(ch == "+", F.lit("-")).otherwise(F.lit("+")),
                F.substring("qb", i + 2, bucket_dims - i - 1),
            )
        )
    probes = q.select("qv", F.explode(F.array(*flip)).alias("bucket"))
    return (
        keyed.where(F.col(id_col) != query_vec_id)
        .join(F.broadcast(probes), "bucket")
        .select(
            F.col(id_col),
            F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# position -> round(1e6 / log2(pos+1)): the NDCG discount table as EXACT
# integer literals (computed once in Python, shared verbatim by the
# oracle) — no runtime float log anywhere, so engines cannot disagree.
NDCG_DISCOUNT_MICRO: tuple[int, ...] = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)


def ndcg_eval(
    embeddings: DataFrame,
    query_vec_id: int,
    *,
    k: int = 10,
    bucket_dims: int = 4,
) -> DataFrame:
    """NDCG@k of the bucketed ANN layer against exact brute force — the
    rank-quality eval that recall@k misses (recall says the right items
    came back; NDCG says they came back in the right ORDER, discounted
    by position). Gain of a returned item = k+1 minus its exact rank
    (0 if outside the exact top-k); discounts are the fixed
    1/log2(pos+1) table as integer-micro LITERALS, so the whole metric
    is exact integer arithmetic.

    Scale shape: both rankings are bounded k-row tables (the exact side
    one TakeOrdered sweep, the bucketed side a pruned probe); everything
    after is arithmetic on <= k rows.

    Output: one row (k, dcg_micro, idcg_micro, ndcg_ppm).
    """
    exact = cosine_topk(embeddings, query_vec_id, k=k).select(
        F.col("vec_id"),
        F.row_number()
        .over(Window.orderBy(F.col("cosine").desc(), "vec_id"))
        .alias("ex_rank"),
    )
    approx = bucketed_topk(
        embeddings, query_vec_id, k=k, bucket_dims=bucket_dims
    ).select(
        F.col("vec_id"),
        F.row_number()
        .over(Window.orderBy(F.col("cosine").desc(), "vec_id"))
        .alias("pos"),
    )
    disc = F.element_at(
        F.array(*[F.lit(d) for d in NDCG_DISCOUNT_MICRO]), F.col("pos")
    ).cast("long")
    gain = F.coalesce(
        F.lit(k + 1) - F.col("ex_rank"), F.lit(0)
    ).cast("long")
    dcg = approx.join(exact, "vec_id", "left").select(
        (gain * disc).alias("term")
    ).agg(F.sum("term").cast("long").alias("dcg_micro"))
    idcg_val = sum(
        (k + 1 - (i + 1)) * NDCG_DISCOUNT_MICRO[i] for i in range(k)
    )
    return dcg.select(
        F.lit(k).cast("long").alias("k"),
        F.coalesce(F.col("dcg_micro"), F.lit(0)).alias("dcg_micro"),
        F.lit(idcg_val).cast("long").alias("idcg_micro"),
        F.expr(
            f"(coalesce(dcg_micro, 0L) * 1000000L) div {idcg_val}L"
        )
        .cast("long")
        .alias("ndcg_ppm"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (round 4)
# ---------------------------------------------------------------------------


def jl_signs(dim: int, k: int = 16) -> list[list[int]]:
    """Deterministic ±1 JL sign matrix (Achlioptas 2003: ±1 entries
    satisfy the JL lemma with the same guarantees as Gaussians):
    sign(i, j) = parity of md5("j_i") — reproducible on any worker or
    engine with no RNG state, so Spark and the SQL oracle share the
    matrix verbatim."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:2], 16) % 2 == 0
            else -1
            for j in range(k)
        ]
        for i in range(dim)
    ]


def _jl_proj_micro(vec_col: str, signs: list[list[int]], j: int):
    """floor(1e6 · Σ_i round(x_i·s_ij, 12)) as one per-row expression:
    a zip_with against the j-th literal sign column folded with an exact
    decimal accumulator — no explode, no join, no shuffle."""
    dim = len(signs)
    sj = F.array(*[F.lit(signs[i][j]) for i in range(dim)])
    terms = F.zip_with(
        F.col(vec_col),
        sj,
        lambda x, s: F.round(x.cast("double") * s.cast("double"), 12).cast(
            "decimal(28,12)"
        ),
    )
    acc = F.aggregate(
        terms,
        F.lit(0).cast("decimal(38,12)"),
        lambda a, v: (a + v).cast("decimal(38,12)"),
    )
    return F.floor(acc * 1000000).cast("long")


def random_projection(
    emb: DataFrame,
    *,
    dim: int,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project d-dim embeddings to k dims with a deterministic ±1 JL
    matrix — the standard cheap dimensionality reduction before
    clustering / dedup at corpus scale (a 64->16 projection cuts ANN
    index memory 4x while approximately preserving pairwise distances).

    Plan shape: PER-ROW, zero exchanges — each projection is a
    ``zip_with`` of the embedding against a literal sign column folded
    with an exact decimal accumulator (per-element products round(·,12)
    so fold order can't matter), then floor(·1e6) to a bigint. No
    explode, no join, no shuffle: at 1e12 rows this runs at scan speed
    and the sign matrix lives in the plan, not in a broadcast.

    Output: (vec_id, proj_micro_0..proj_micro_{k-1}) — the quantized
    projection a downstream ANN index would store.
    """
    signs = jl_signs(dim, k)
    return emb.select(
        F.col(id_col),
        *[
            _jl_proj_micro(vec_col, signs, j).alias(f"proj_micro_{j}")
            for j in range(k)
        ],
    )


def jl_distortion(
    emb: DataFrame,
    *,
    dim: int,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Empirical JL isometry gauge: per vector, the ratio of projected
    squared norm to k × original squared norm — the quantity the JL
    lemma bounds near 1. Everything is exact integers off the
    micro-quantized projections (Σ proj_micro² and a micro-floored Σx²);
    only the final ratio divides, in one pinned double expression, so
    the oracle matches hash-exactly.

    Same zero-exchange per-row plan as ``random_projection`` — orig and
    projected norms are computed in ONE select (no self-join); repeated
    subexpressions stay inside whole-stage codegen's CSE.

    Output: (vec_id, orig_sq_micro, proj_sq_scaled, ratio_micro).
    """
    signs = jl_signs(dim, k)
    # per-term floor(x²·10¹²) bigints, NOT round(x², 12): a half-ulp
    # round tie pushed the decimal sum across the floor(·10⁶) boundary
    # between engines on one sf0.1 vector (999999 vs 1000000) — floor
    # of an IEEE product is engine-identical, round half-ties are not
    # (the repo's float-portability discipline, BASELINE round 2)
    orig = F.floor(
        F.aggregate(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(
                    x.cast("double") * x.cast("double") * 1e12
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        ).cast("decimal(38,0)")
        / 1000000
    ).cast("long")
    sq = None
    for j in range(k):
        p = _jl_proj_micro(vec_col, signs, j)
        t = p * p
        sq = t if sq is None else sq + t
    base = emb.select(
        F.col(id_col),
        orig.alias("orig_sq_micro"),
        sq.cast("long").alias("proj_sq_scaled"),
    )
    ratio = F.when(
        F.col("orig_sq_micro") > 0,
        F.floor(
            F.col("proj_sq_scaled").cast("double")
            / (F.lit(k).cast("long") * F.col("orig_sq_micro") * F.lit(1000000))
            .cast("double")
            * 1000000
        ).cast("long"),
    )
    return base.select(
        id_col, "orig_sq_micro", "proj_sq_scaled", ratio.alias("ratio_micro")
    )


# ---------------------------------------------------------------------------
# MMR diverse selection (round 4)
# ---------------------------------------------------------------------------


def mmr_select(
    docs: DataFrame,
    query_terms: list[str],
    *,
    n_candidates: int = 20,
    k: int = 8,
    lam_rel: int = 7,
    lam_div: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998) diverse
    top-k: greedily pick the doc maximizing λ·relevance − (1−λ)·max
    similarity to the already-picked set — the standard de-redundancy
    step when assembling RAG contexts or few-shot exemplar pools from a
    near-duplicate-heavy corpus. λ = lam_rel/(lam_rel+lam_div) kept as
    an integer pair so every score is an exact bigint (micro-Jaccard
    units; ties break on doc_id).

    Scale shape: relevance (token-Jaccard vs the bounded query set) is
    a per-row codegen expression over the full corpus; the top
    n_candidates come via TakeOrdered (no global sort, no
    single-partition window); the n² pairwise Jaccards are a self-join
    of the n-row candidate table. Only then does the inherently
    sequential greedy run on the driver over those n + n² bounded
    integers — the corpus is never collected, exactly the
    bounded-table-collect regime of ivf/bpe_train.

    Output: (sel_rank, doc_id, mmr_score), k rows in selection order.

    Bounds (guarded): n_candidates <= 4096 and k <= n_candidates — the
    driver holds the n-row candidate pool and its n² pairwise scores,
    so an unbounded pool would turn the bounded-table collect into a
    corpus collect; misuse fails fast instead.
    """
    if n_candidates > 4096:
        raise ValueError(
            "mmr_select is bounded to n_candidates <= 4096 (the driver "
            "collects the candidate pool and its n^2 pairwise scores)"
        )
    if k > n_candidates:
        raise ValueError(
            "mmr_select requires k <= n_candidates "
            f"(got k={k}, n_candidates={n_candidates})"
        )
    from .textops import ws_tokens

    qs = sorted(set(query_terms))
    ws = F.array_distinct(ws_tokens(F.lower(F.col(text_col))))
    qlit = F.array(*[F.lit(w) for w in qs])
    inter = F.size(F.array_intersect(ws, qlit)).cast("long")
    uni = (F.size(ws).cast("long") + F.lit(len(qs)) - inter).cast("long")
    cand = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            ws.alias("ws"),
            inter.alias("_i"),
            uni.alias("_u"),
        )
        .select(
            "doc_id", "ws", F.expr("(1000000L * _i) div _u").alias("rel_micro")
        )
        .orderBy(F.desc("rel_micro"), "doc_id")
        .limit(n_candidates)
        .cache()
    )
    a = cand.select(
        F.col("doc_id").alias("a"), F.col("ws").alias("wa")
    )
    b = cand.select(
        F.col("doc_id").alias("b"), F.col("ws").alias("wb")
    )
    pi = F.size(F.array_intersect(F.col("wa"), F.col("wb"))).cast("long")
    pu = (
        F.size(F.col("wa")).cast("long")
        + F.size(F.col("wb")).cast("long")
        - pi
    )
    sims = (
        a.crossJoin(b)
        .where(F.col("a") != F.col("b"))
        .select("a", "b", pi.alias("_i"), pu.alias("_u"))
        .select("a", "b", F.expr("(1000000L * _i) div _u").alias("sim_micro"))
    )
    rels = {
        r["doc_id"]: r["rel_micro"]
        for r in cand.select("doc_id", "rel_micro").collect()
    }
    sim = {(r["a"], r["b"]): r["sim_micro"] for r in sims.collect()}
    picked: list[tuple[int, int, int]] = []
    chosen: list[int] = []
    for step in range(min(k, len(rels))):
        best = None
        for d, rel in rels.items():
            if d in chosen:
                continue
            pen = max((sim.get((d, p), 0) for p in chosen), default=0)
            score = lam_rel * rel - lam_div * pen
            cand_key = (-score, d)
            if best is None or cand_key < best[0]:
                best = (cand_key, d, score)
        picked.append((step + 1, best[1], best[2]))
        chosen.append(best[1])
    spark = docs.sparkSession
    out = spark.createDataFrame(
        picked, "sel_rank long, doc_id long, mmr_score long"
    )
    cand.unpersist()
    return out


def grid_dbscan(
    emb: DataFrame,
    *,
    bucket_dims: int = 6,
    min_pts: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Grid-DBSCAN over the sign-LSH lattice: density clustering that
    never computes a pairwise distance — cells of the 2^dims sign grid
    with >= min_pts members are "core", adjacent (Hamming-1) core cells
    merge into clusters, sparse cells are noise. The embedding-space
    cousin of dedup_clusters: finds topic/spam blobs of ANY shape where
    k-means/IVF impose spherical cells, at a fraction of the cost.

    Scale shape: the corpus is touched by ONE map-side-combined
    groupBy(bucket); the bucket lattice is bounded by 2^dims regardless
    of corpus size, so the Hamming-adjacency edge build (dims flips per
    core cell, semi-joined back to the core set) and the
    connected-components run all operate on a sketch-sized table. No
    pairs, no windows, no broadcasts of anything corpus-derived.

    Output: (cluster_id, n_buckets, n_points) per cluster (cluster_id =
    min member bucket code) plus one noise row (cluster_id = -1)
    aggregating all sub-threshold cells; ordered by cluster_id.
    """
    from .dedup import connected_components

    code = None
    for j in range(bucket_dims):
        bit = F.when(
            F.element_at(F.col(vec_col), j + 1).cast("double") >= 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    pts = emb.select(code.cast("long").alias("bucket"))
    counts = (
        pts.groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n"))
        .persist()
    )
    core = counts.where(F.col("n") >= min_pts).persist()
    masks = F.explode(
        F.array(*[F.lit(1 << j) for j in range(bucket_dims)])
    ).alias("m")
    nbrs = core.select("bucket", masks).select(
        "bucket", F.expr("bucket ^ m").cast("long").alias("nb")
    )
    edges = (
        nbrs.join(
            core.select(F.col("bucket").alias("nb")).hint("shuffle_hash"),
            "nb",
        )
        .where(F.col("nb") > F.col("bucket"))
        .select(F.col("bucket").alias("id_a"), F.col("nb").alias("id_b"))
    )
    cc = connected_components(
        core.select(F.col("bucket").alias("doc_id")), edges
    )
    per = (
        cc.join(
            core.select(F.col("bucket").alias("doc_id"), "n"), "doc_id"
        )
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("n").cast("long").alias("n_points"),
        )
    )
    noise = counts.where(F.col("n") < min_pts).agg(
        F.lit(-1).cast("long").alias("cluster_id"),
        F.count("*").cast("long").alias("n_buckets"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_points"),
    )
    return per.unionByName(noise).orderBy("cluster_id")


def embedding_sq8_audit(emb: DataFrame) -> DataFrame:
    """Int8 scalar-quantization audit over the embedding corpus — the
    memory-4x trade every large ANN deployment measures before flipping
    it on: quantize each component to q = floor((x − lo)·255/(hi − lo))
    with corpus-global (lo, hi), reconstruct, and report per-label
    reconstruction error. Exactness discipline: the per-element squared
    error is ONE pinned double chain floored into pico-units
    (floor(err²·10^12) — a double SUM over 64 components would be
    partial-order-dependent; integer sums are not), so the oracle
    restates it bit-for-bit.

    Scale shape: one aggregate for the bounded (lo, hi) scalar pair
    (broadcast), one posexplode over components (narrow — 64 rows per
    vector, no corpus-sized shuffle until the final map-side-combined
    groupBy(label)). At 10^12 vectors the explode is the same shape the
    IVF assignment stage already carries.

    Output per label: n_vecs, dim, total_err_pico, mse_pico
    (= floor(total / (n_vecs·dim))).
    """
    mm = emb.select(F.explode("embedding").alias("x")).agg(
        F.min(F.col("x").cast("double")).alias("lo"),
        F.max(F.col("x").cast("double")).alias("hi"),
    )
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "x")
    ).crossJoin(F.broadcast(mm))
    x = F.col("x").cast("double")
    lo, hi = F.col("lo"), F.col("hi")
    q = F.floor((x - lo) * 255.0 / (hi - lo))
    xr = lo + q.cast("double") * (hi - lo) / 255.0
    err_pico = F.floor((x - xr) * (x - xr) * 1000000000000.0).cast("long")
    per = ex.groupBy("label").agg(
        F.count_distinct("vec_id").cast("long").alias("n_vecs"),
        (F.count("*") / F.count_distinct("vec_id")).cast("long").alias("dim"),
        F.sum(err_pico).cast("long").alias("total_err_pico"),
    )
    return per.select(
        "label",
        "n_vecs",
        "dim",
        "total_err_pico",
        F.floor(
            F.col("total_err_pico") / (F.col("n_vecs") * F.col("dim"))
        ).cast("long").alias("mse_pico"),
    )
