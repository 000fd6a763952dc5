"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk`` — exact cosine top-k: query×corpus equi-free
  join with the small side broadcast, dot products via ``F.zip_with``
  + ``F.aggregate`` (JVM-side, no Python), ranked per query with a
  window. The correctness baseline.
- ``lsh_topk`` — random-hyperplane LSH: sign-bit sketches from fixed
  seeded projections bucket the corpus; candidates come from an
  equi-join on the bucket key (optionally multi-probe over nearby
  buckets), then exact cosine re-ranks candidates. The 100 TB path:
  shuffle is O(n * n_tables) instead of O(n_q * n_corpus).
- ``embedding_near_duplicates`` — all pairs with cosine >= threshold,
  the embedding flavor of dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def with_unit_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize embeddings so cosine reduces to a dot product."""
    v = F.col(vec_col).cast("array<double>")
    n = _norm(v)
    return df.withColumn(
        "_unit", F.transform(v, lambda x: x / n)
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors: (query_id, neighbor_id, cosine, rank).

    The query side is broadcast (typical ANN batch << corpus); the
    corpus streams through one scan. Ties rank deterministically by
    neighbor id.
    """
    q = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("qv")
    )
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("cv")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).tolist()


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from fixed hyperplanes — pure column expr."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col, F.array(*[F.lit(float(x)) for x in p]), lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        )
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Each of ``n_tables`` independent hash tables contributes candidates
    from the query's bucket; exact cosine re-ranks the candidate union.
    Recall rises with n_tables; shuffle volume stays linear.
    """
    q = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("qv")
    )
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("cv")
    )
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        qb = q.withColumn("bucket", lsh_bucket_col(F.col("qv"), planes)).withColumn(
            "table", F.lit(t)
        )
        cb = c.withColumn("bucket", lsh_bucket_col(F.col("cv"), planes)).withColumn(
            "table", F.lit(t)
        )
        pairs = qb.join(cb, ["table", "bucket"]).filter(
            F.col("query_id") != F.col("neighbor_id")
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.withColumn("cosine", _dot(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _kmeans_centroids(
    vectors: np.ndarray, n_centroids: int, seed: int, n_iters: int = 10
) -> np.ndarray:
    """Seeded Lloyd k-means with kmeans++ init on a driver-side sample.
    Deterministic: fixed RNG, fixed iteration count, ties to the lowest
    centroid index."""
    rng = np.random.RandomState(seed)
    x = np.asarray(vectors, dtype=np.float64)
    n = x.shape[0]
    # kmeans++ seeding
    cents = [x[int(rng.randint(n))]]
    for _ in range(1, n_centroids):
        d2 = np.min(
            ((x[:, None, :] - np.asarray(cents)[None, :, :]) ** 2).sum(axis=2),
            axis=1,
        )
        total = float(d2.sum())
        if total <= 0.0:
            # every remaining vector coincides with a centroid (e.g. a
            # corpus of duplicates) — fall back to a uniform pick
            cents.append(x[int(rng.randint(n))])
            continue
        cents.append(x[int(rng.choice(n, p=d2 / total))])
    c = np.asarray(cents)
    for _ in range(n_iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for j in range(n_centroids):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
    # spherical k-means output: unit centroids make argmax-dot and
    # argmin-L2 assignments identical for unit input vectors
    norms = np.sqrt((c * c).sum(axis=1, keepdims=True))
    return c / np.maximum(norms, 1e-12)


def _cell_assign_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid assignment: one numpy matmul per
    batch (the FAISS-style inner loop). A Catalyst expression tree of
    n_centroids x dim literals plans ~50x slower for the same math."""
    from pyspark.sql.functions import pandas_udf

    c = np.ascontiguousarray(centroids.T)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        x = np.asarray(v.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(x @ c, axis=1).astype(np.int32))

    return assign


def _probe_cells_udf(centroids: np.ndarray, n_probe: int):
    """Arrow-batched top-n_probe centroid ids per query vector."""
    from pyspark.sql.functions import pandas_udf

    c = np.ascontiguousarray(centroids.T)

    @pandas_udf("array<int>")
    def probes(v: pd.Series) -> pd.Series:
        x = np.asarray(v.tolist(), dtype=np.float64)
        scores = x @ c
        top = np.argsort(-scores, kind="stable", axis=1)[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in top])

    return probes


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    train_sample: int = 4096,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer + probe lists.

    Train: seeded k-means on a bounded driver-side corpus sample (IVF's
    standard train step; the sample size, not the corpus, bounds driver
    memory). Assign: every corpus vector goes to its nearest centroid —
    a JVM-side argmax over ``n_centroids`` dot products, one linear
    scan. Search: each query probes its ``n_probe`` closest centroids'
    lists via an equi-join on the centroid id, then exact cosine
    re-ranks the candidates. Shuffle volume is O(n + q * n_probe *
    list_size) — no cross join, no per-row Python."""
    u_corpus = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("cv")
    )
    u_queries = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("qv")
    )
    # bounded training sample: hash-ordered ids pick a uniform subset,
    # then the collected rows are re-sorted by id so the kmeans RNG
    # walk sees a canonical row order (reproducible by any engine that
    # can sort by id — the oracle SQL generator relies on this)
    sample = (
        u_corpus.orderBy(F.xxhash64("neighbor_id"))
        .limit(train_sample)
        .select("neighbor_id", "cv")
        .collect()
    )
    sample.sort(key=lambda r: r["neighbor_id"])
    cents = _kmeans_centroids(
        np.asarray([r["cv"] for r in sample]), n_centroids, seed
    )

    assigned = u_corpus.withColumn("cell", _cell_assign_udf(cents)(F.col("cv")))
    probes = u_queries.withColumn(
        "cell", F.explode(_probe_cells_udf(cents, n_probe)(F.col("qv")))
    )
    cand = probes.join(assigned, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn("cosine", _dot(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine >= threshold (d1 < d2) — embedding-space
    near-dup detection, LSH-bucketed (the 100 TB path).

    Candidates come from equi-joins on random-hyperplane sign buckets
    (one self-join per table, never a cross join); exact cosine then
    verifies each candidate pair. Recall is probabilistic: a pair at
    angle theta collides per table with (1 - theta/pi)^n_planes, so for
    low thresholds use few planes + many tables. Shuffle volume is
    O(n * n_tables) plus the candidate pairs themselves."""
    u = with_unit_norm(df, vec_col).select(
        F.col(id_col).alias("d"), F.col("_unit").alias("v")
    )
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 101 * t)
        bt = u.withColumn("bucket", lsh_bucket_col(F.col("v"), planes))
        # pin fan-out parallelism before the quadratic-output self-join
        # (AQE sees only the small bucketed input)
        bt = bt.repartition(n_part, "bucket")
        a, b = bt.alias("a"), bt.alias("b")
        pairs = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.d") < F.col("b.d")),
        ).select(F.col("a.d").alias("d1"), F.col("b.d").alias("d2"))
        cand = pairs if cand is None else cand.unionByName(pairs)
    # dedupe bare id-pairs first (small rows), then attach vectors once —
    # shipping both vectors through every table's union would multiply
    # shuffle bytes by n_tables
    cand = cand.dropDuplicates(["d1", "d2"])
    v1 = u.select(F.col("d").alias("d1"), F.col("v").alias("v1"))
    v2 = u.select(F.col("d").alias("d2"), F.col("v").alias("v2"))
    return (
        cand.join(v1, "d1")
        .join(v2, "d2")
        .withColumn("cosine", _dot(F.col("v1"), F.col("v2")))
        .filter(F.col("cosine") >= threshold)
        .select("d1", "d2", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_duplicates_brute(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs exact variant — the recall oracle for the LSH path in
    tests. O(n^2): never use beyond fixture scale."""
    u = with_unit_norm(df, vec_col).select(
        F.col(id_col).alias("d"), F.col("_unit").alias("v")
    )
    a, b = u.alias("a"), u.alias("b")
    return (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .withColumn("cosine", _dot(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.d").alias("d1"),
            F.col("b.d").alias("d2"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
