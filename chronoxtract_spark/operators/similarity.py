"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk`` — exact cosine top-k. The query batch (bounded
  by contract: an ANN batch ≪ corpus — the same rows a broadcast join
  would ship to every executor anyway) is collected into a dense
  matrix and broadcast; each corpus Arrow batch scores against it with
  ONE BLAS matmul and emits only its batch-local top-k per query (all
  ties at the k-th score kept), so the shuffle carries
  O(batches * q * k) candidate rows instead of the q x n score cross
  product, and a window ranks the union. Semantics identical to the
  full cross join: every global top-k row is in its own batch's local
  top-k.
- ``lsh_topk`` — random-hyperplane LSH: sign-bit sketches from fixed
  seeded projections bucket the corpus (all tables in one Arrow pass);
  each (table, bucket) group matmuls against just the queries hashed
  to it. The 100 TB path: shuffle is O(n * n_tables) corpus rows plus
  O(groups * q * k) candidates — never the scored pair set.
- ``ivf_topk`` — k-means coarse quantizer + probe lists (FAISS shape):
  corpus grouped by nearest-centroid cell, queries probe their
  ``n_probe`` closest cells, one matmul per cell.
- ``embedding_near_duplicates`` — all pairs with cosine >= threshold,
  the embedding flavor of dedup (bucketed self-join + vectorized
  verify).

Scoring everywhere is numpy/BLAS inside Arrow-batched kernels — the
r4 rework after the 1M-vector bench showed the per-row
``F.aggregate``/``zip_with`` dot products (interpreted per element,
~6 us/row) and the q x n ranking shuffle dominating wall time ~30x
over the matmul cost. Unit-normalization stays on the JVM
(``with_unit_norm``) so kernel and SQL-oracle inputs are bit-identical;
only the dot-product summation order changed (BLAS vs sequential
fold), which is below the oracles' 6-decimal rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _stack(col: pd.Series) -> np.ndarray:
    """Arrow list column -> dense float64 matrix. After Arrow->pandas
    each cell is already a numpy array; ``np.stack`` memcpys rows,
    where ``.tolist()`` would box every element into a Python float
    (measured ~20x slower at 64-dim — it dominated the first 1M-vector
    bench run)."""
    return np.stack(col.to_numpy()).astype(np.float64, copy=False)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _cos_pairs(a, b):
    """Vectorized exact cosine for candidate pairs of already-unit
    vectors: one einsum row-dot per Arrow batch. The interpreted
    ``_dot`` fold costs ~6 us/row; this is for the hot verify paths
    where candidates number in the millions. (Built per call: a
    module-level ``pandas_udf`` would resolve its DDL return type on
    the executor, where no SparkSession exists.)"""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def cos(x: pd.Series, y: pd.Series) -> pd.Series:
        xm = _stack(x)
        ym = _stack(y)
        return pd.Series(np.einsum("ij,ij->i", xm, ym))

    return cos(a, b)


def with_unit_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize embeddings so cosine reduces to a dot product.

    Vectorized (one Arrow batch normalize per partition): the previous
    ``F.aggregate`` + ``F.transform`` expression pair was ~128
    interpreted ops per row — ~45 s per pass over 1M x 64 vectors,
    dominating ANN index builds. Zero-norm rows keep the old
    x/0.0 = Infinity semantics of the JVM expression."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def unit(v: pd.Series) -> pd.Series:
        x = _stack(v)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = x / np.sqrt(np.einsum("ij,ij->i", x, x))[:, None]
        return pd.Series(list(x))

    return df.withColumn("_unit", unit(F.col(vec_col).cast("array<double>")))


def _collect_query_matrix(queries: DataFrame, id_col: str, vec_col: str):
    """Driver-side materialization of the ANN query batch as a dense
    unit matrix. BOUNDED by contract: a query batch ≪ corpus, and these
    are exactly the rows a broadcast hash join would ship to every
    executor — collecting them once and re-broadcasting moves the same
    bytes. Normalization happens through the same JVM expression the
    SQL-visible path uses (``with_unit_norm``) so kernel inputs are
    bit-identical to what an equivalent Catalyst plan would score."""
    rows = (
        with_unit_norm(queries, vec_col)
        .select(F.col(id_col).alias("qid"), F.col("_unit").alias("qv"))
        .collect()
    )
    qids = np.asarray([r["qid"] for r in rows])
    qm = np.asarray([r["qv"] for r in rows], dtype=np.float64)
    return qids, qm


def _local_topk(S: np.ndarray, k: int):
    """Row/col indices of the per-column top-k of a score matrix
    (rows = corpus vectors, cols = queries). ALL rows tying at the
    k-th score are kept — exactness under ties is decided by the
    global rank window, never truncated here. ``-inf`` rows (masked
    self-matches) are dropped."""
    if S.shape[0] > k:
        kth = np.partition(S, S.shape[0] - k, axis=0)[S.shape[0] - k]
    else:
        kth = np.full(S.shape[1], -np.inf)
    rows, cols = np.nonzero(S >= kth[None, :])
    keep = np.isfinite(S[rows, cols])
    return rows[keep], cols[keep]


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Global rank over the (small) candidate union: deterministic
    tie-break by neighbor id, k rows per query."""
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


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors: (query_id, neighbor_id, cosine, rank).

    One BLAS matmul per corpus Arrow batch against the broadcast query
    matrix; each batch emits only its local top-k per query (ties at
    the k-th score all kept), so the exchange feeding the rank window
    carries O(batches * q * k) rows, not q x n. Self-matches are
    masked in-kernel. ``broadcast_queries`` is kept for API
    compatibility; the query batch is always broadcast now."""
    spark = corpus.sparkSession
    id_type = dict(corpus.dtypes)[id_col]
    qids, qm = _collect_query_matrix(queries, id_col, vec_col)
    bvar = spark.sparkContext.broadcast((qids, np.ascontiguousarray(qm.T)))
    kk = int(k)

    def score(batches):
        qid_arr, qmT = bvar.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = _stack(pdf["cv"])
            S = X @ qmT
            nid = pdf["neighbor_id"].to_numpy()
            S[np.equal(nid[:, None], qid_arr[None, :])] = -np.inf
            r, c = _local_topk(S, kk)
            yield pd.DataFrame(
                {
                    "query_id": qid_arr[c],
                    "neighbor_id": nid[r],
                    "cosine": S[r, c],
                }
            )

    cand = (
        with_unit_norm(corpus, vec_col)
        .select(F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("cv"))
        .mapInPandas(
            score,
            schema=f"query_id {id_type}, neighbor_id {id_type}, cosine double",
        )
    )
    return _rank_topk(cand, kk)


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


def _lsh_buckets_udf(planes_all: np.ndarray):
    """Arrow-batched sign-bit buckets for ALL hash tables in one pass:
    one (n x dim) @ (dim x tables*planes) matmul per batch, bit i set
    when the projection is strictly > 0 — the same predicate as
    ``lsh_bucket_col``, 8 tables for the price of one column scan."""
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes_all, dtype=np.float64)  # (tables, planes, dim)
    n_tables, n_planes, dim = P.shape
    flat = np.ascontiguousarray(P.reshape(n_tables * n_planes, dim).T)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        x = _stack(v)
        bits = (x @ flat > 0).reshape(len(x), n_tables, n_planes)
        b = (bits * weights[None, None, :]).sum(axis=2)
        return pd.Series(list(b))

    return buckets


def _grouped_topk_fn(bvar, k: int):
    """applyInPandas body shared by the LSH table-bucket groups and the
    IVF cells: look up the queries hashed/probed to this group, matmul
    the group's vectors against them, emit the group-local top-k per
    query (ties kept)."""

    def score(key, pdf):
        qids, qm, route = bvar.value
        qsel = route.get(tuple(int(x) for x in key))
        if qsel is None or not len(pdf):
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        X = _stack(pdf["cv"])
        S = X @ qm[qsel].T
        nid = pdf["neighbor_id"].to_numpy()
        S[np.equal(nid[:, None], qids[qsel][None, :])] = -np.inf
        r, c = _local_topk(S, k)
        return pd.DataFrame(
            {
                "query_id": qids[qsel][c],
                "neighbor_id": nid[r],
                "cosine": S[r, c],
            }
        )

    return score


def _lsh_planes(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    """The (tables, planes, dim) projection tensor — derived purely
    from the hash parameters, so index build and search recover the
    SAME planes without shipping state between them."""
    return np.asarray(
        [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    )


def lsh_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Build the LSH index relation: one row per (corpus vector, hash
    table) with its sign-bit bucket — ``(neighbor_id, cv, table,
    bucket)``. A plain DataFrame: persist it (cache / write to a
    bucketed table) and amortize the build across query batches; the
    planes regenerate deterministically from the hash parameters, so
    no side state needs storing."""
    planes_all = _lsh_planes(dim, n_planes, n_tables, seed)
    sc = corpus.sparkSession.sparkContext
    return (
        with_unit_norm(corpus, vec_col)
        .select(F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("cv"))
        .withColumn("_buckets", _lsh_buckets_udf(planes_all)(F.col("cv")))
        .select(
            "neighbor_id", "cv", F.posexplode("_buckets").alias("table", "bucket")
        )
        # leave the index hash-partitioned on the probe key: a
        # PERSISTED index then answers every future query batch with a
        # shuffle-free grouped-map (the search's groupBy(table, bucket)
        # finds its clustered distribution already satisfied), instead
        # of re-shuffling n_tables x corpus vector payloads per batch
        # (guide §2.4 bucketed-layout reuse). The one-shot path pays
        # the same single exchange it always did, just before the
        # cache point instead of after.
        .repartition(
            max(sc.defaultParallelism * 2, 16), "table", "bucket"
        )
    )


def lsh_search(
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Query an ``lsh_index`` relation: each (table, bucket) group
    matmuls against just the queries hashed there; exact cosine
    re-ranks the candidate union. A neighbor found by several tables
    carries the same cosine; the max() pre-aggregation collapses those
    float-identical duplicates deterministically before the rank
    window. Hash parameters must match the index build."""
    spark = index.sparkSession
    id_type = dict(index.dtypes)["neighbor_id"]
    qids, qm = _collect_query_matrix(queries, id_col, vec_col)
    planes_all = _lsh_planes(dim, n_planes, n_tables, seed)
    # query-side buckets driver-side (Q x tables matmul on the already
    # JVM-normalized vectors): route[(table, bucket)] -> query indices
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    route: dict = {}
    for t in range(n_tables):
        qbuckets = ((qm @ planes_all[t].T > 0) * weights[None, :]).sum(axis=1)
        for qi, bkt in enumerate(qbuckets):
            route.setdefault((t, int(bkt)), []).append(qi)
    route = {key: np.asarray(v) for key, v in route.items()}
    bvar = spark.sparkContext.broadcast((qids, qm, route))
    kk = int(k)

    cand = index.groupBy("table", "bucket").applyInPandas(
        _grouped_topk_fn(bvar, kk),
        schema=f"query_id {id_type}, neighbor_id {id_type}, cosine double",
    )
    best = cand.groupBy("query_id", "neighbor_id").agg(
        F.max("cosine").alias("cosine")
    )
    return _rank_topk(best, kk)


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
    """Approximate cosine top-k via random-hyperplane LSH buckets —
    one-shot convenience composing ``lsh_index`` + ``lsh_search``
    (build amortization is the caller's choice: persist the index
    relation to reuse it). Recall rises with n_tables; shuffle volume
    stays linear in the corpus — the scored pair set never hits an
    exchange."""
    index = lsh_index(
        corpus, id_col=id_col, vec_col=vec_col, n_planes=n_planes,
        n_tables=n_tables, dim=dim, seed=seed,
    )
    return lsh_search(
        index, queries, k=k, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, n_tables=n_tables, dim=dim, seed=seed,
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
    # kmeans++ seeding with an incremental min-distance: only the
    # NEWEST centroid's distances are computed per step (O(k n d)
    # total, not O(k^2 n d) — the full-tensor recompute dominated IVF
    # build once centroid counts grow toward the sqrt(n) a large
    # corpus wants). Each pairwise distance uses the same elementwise
    # ops and last-axis summation as the old full recompute, and min
    # is exact, so the seeding draws are bit-identical.
    cents = [x[int(rng.randint(n))]]
    d2 = ((x - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, n_centroids):
        total = float(d2.sum())
        if total <= 0.0:
            # every remaining vector coincides with a centroid (e.g. a
            # corpus of duplicates) — fall back to a uniform pick
            cents.append(x[int(rng.randint(n))])
        else:
            cents.append(x[int(rng.choice(n, p=d2 / total))])
        d2 = np.minimum(d2, ((x - cents[-1]) ** 2).sum(axis=1))
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
        x = _stack(v)
        return pd.Series(np.argmax(x @ c, axis=1).astype(np.int32))

    return assign


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    train_sample: int = 4096,
):
    """Build the IVF index: train the coarse quantizer and assign every
    corpus vector to its nearest-centroid cell. Returns ``(assigned,
    centroids)`` — the assigned relation ``(neighbor_id, cv, cell)`` is
    a plain DataFrame to persist (cache / write partitioned by cell)
    and amortize across query batches; the centroid matrix is the
    index's side state.

    Train: seeded k-means on a bounded driver-side corpus sample (IVF's
    standard train step; the sample size, not the corpus, bounds driver
    memory). Assign: an Arrow-batched argmax matmul, one linear scan."""
    u_corpus = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("cv")
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
    return assigned, cents


def ivf_search(
    index: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Query an ``ivf_index`` relation: each probed cell's list matmuls
    against just the queries probing it and emits its cell-local top-k
    (ties kept); a window ranks the candidate union. Shuffle volume is
    O(n) corpus rows for the cell grouping (amortized away when the
    index is persisted partitioned by cell) plus O(cells * q * k)
    candidates — the scored pair set (q * n_probe * list_size dot
    products) stays inside the kernels and never hits an exchange."""
    spark = index.sparkSession
    id_type = dict(index.dtypes)["neighbor_id"]
    # probe lists driver-side on the JVM-normalized query batch:
    # stable-argsort top-n_probe centroid ids (ties to the lower cell);
    # route[(cell,)] -> indices of the queries probing that cell
    qids, qm = _collect_query_matrix(queries, id_col, vec_col)
    top = np.argsort(-(qm @ centroids.T), kind="stable", axis=1)[:, :n_probe]
    route: dict = {}
    for qi, cells in enumerate(top):
        for cell in cells:
            route.setdefault((int(cell),), []).append(qi)
    route = {key: np.asarray(v) for key, v in route.items()}
    bvar = spark.sparkContext.broadcast((qids, qm, route))
    kk = int(k)

    # one matmul per probed cell (each corpus vector lives in exactly
    # one cell, so no cross-table dedup is needed before the rank)
    cand = index.groupBy("cell").applyInPandas(
        _grouped_topk_fn(bvar, kk),
        schema=f"query_id {id_type}, neighbor_id {id_type}, cosine double",
    )
    return _rank_topk(cand, kk)


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
    """IVF approximate top-k: k-means coarse quantizer + probe lists
    (FAISS shape) — one-shot convenience composing ``ivf_index`` +
    ``ivf_search`` (persist the index relation to amortize the build
    across query batches)."""
    index, cents = ivf_index(
        corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids,
        seed=seed, train_sample=train_sample,
    )
    return ivf_search(
        index, cents, queries, k=k, id_col=id_col, vec_col=vec_col,
        n_probe=n_probe,
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

    Candidates come from ONE self equi-join on the exploded (table,
    bucket) key — random-hyperplane sign buckets for every table from
    a single Arrow pass, never a cross join. Exact cosine (vectorized
    einsum over the candidate pairs) then verifies. Recall is
    probabilistic: a pair at angle theta collides per table with
    (1 - theta/pi)^n_planes, so for low thresholds use few planes +
    many tables. Shuffle volume is O(n * n_tables) bare-id rows plus
    the candidate pairs themselves — vectors never ride the
    quadratic-output join."""
    u = with_unit_norm(df, vec_col).select(
        F.col(id_col).alias("d"), F.col("_unit").alias("v")
    )
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    planes_all = np.asarray(
        [_hyperplanes(dim, n_planes, seed + 101 * t) for t in range(n_tables)]
    )
    bt = (
        u.withColumn("_buckets", _lsh_buckets_udf(planes_all)(F.col("v")))
        .select("d", F.posexplode("_buckets").alias("table", "bucket"))
        # pin fan-out parallelism before the quadratic-output self-join
        # (AQE sees only the small bucketed input)
        .repartition(n_part, "table", "bucket")
    )
    a, b = bt.alias("a"), bt.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .select(F.col("a.d").alias("d1"), F.col("b.d").alias("d2"))
        # dedupe bare id-pairs first (small rows), then attach vectors
        # once — a pair colliding in several tables verifies once
        .dropDuplicates(["d1", "d2"])
    )
    v1 = u.select(F.col("d").alias("d1"), F.col("v").alias("v1"))
    v2 = u.select(F.col("d").alias("d2"), F.col("v").alias("v2"))
    return (
        cand.join(v1, "d1")
        .join(v2, "d2")
        .withColumn("cosine", _cos_pairs(F.col("v1"), F.col("v2")))
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


def embedding_audit(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    quant: int = 10**6,
    round_digits: int | None = 6,
) -> DataFrame:
    """Embedding-space quality audit per label: cluster cohesion and
    the nearest confusing label, with NO pairwise join anywhere.

    For each label the mean pairwise cosine of its (unit-normalized)
    members — the cohesion a curation pipeline watches before trusting
    labels for dedup thresholds or ANN ground truth — comes from the
    sum-vector identity

        sum_{i != j} <u_i, u_j> = ||sum_i u_i||^2 - sum_i ||u_i||^2,

    so one component-sum per (label, dim) replaces the O(n^2) pair
    enumeration; cross-label confusability is the centroid cosine
    cos(c_a, c_b) = <S_a, S_b> / (||S_a|| ||S_b||) (the member counts
    cancel), a tiny labels x labels x dim join over the same sums.
    ``nearest_label``/``nearest_cos`` report each label's best
    confuser (ties pinned by ascending label).

    Exactness: unit components quantize to integer micro-units
    q_i = round(u_i * quant) right after the (left-fold norm, sqrt,
    divide) chain both engines share, and EVERYTHING downstream —
    component sums S_d, ||S||^2, self-dots, cross dots — is exact
    decimal(38,0)/HUGEINT integer arithmetic with one float
    expression per output column. The audit is therefore a statistic
    of the quantized vectors (documented; at quant = 1e6 the
    quantization perturbs a cosine by < 1e-4, far under any curation
    threshold). Zero-norm vectors are excluded before quantization.

    Spark-first shape: one posexplode + (label, dim) sum groupBy over
    the corpus (map-side partials; the only corpus-sized shuffle),
    one per-label aggregate, one bounded labels x labels centroid
    join. The JVM expression normalization (not the Arrow kernel
    ``with_unit_norm`` uses) keeps the fold order oracle-identical;
    for an audit pass its interpreted cost is acceptable and linear.
    Returns ``label, n_vecs, centroid_norm, cohesion, nearest_label,
    nearest_cos``.
    """
    qf = float(quant)
    arr = F.col(vec_col).cast("array<double>")
    norm2 = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
    base = df.select(
        F.col(label_col).alias("_l"), arr.alias("_v"), norm2.alias("_n2")
    ).where(F.col("_n2") > 0)
    # the lazy when guard keeps ANSI division-by-zero unreachable even
    # if Catalyst evaluates the transform alongside the norm filter
    qv = base.select(
        "_l",
        F.transform(
            F.col("_v"),
            lambda x: F.round(
                F.when(
                    F.col("_n2") > F.lit(0.0),
                    x / F.sqrt(F.col("_n2")) * F.lit(qf),
                ).otherwise(F.lit(0.0)),
                0,
            ).cast("long"),
        ).alias("_q"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    self_dot = F.aggregate(
        F.col("_q"), F.lit(0).cast("long"), lambda acc, y: acc + y * y
    )
    per_vec = qv.select("_l", "_q", self_dot.alias("_sd"))
    st = per_vec.groupBy("_l").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec(F.col("_sd"))).alias("selfsum"),
    )
    sums = (
        per_vec.select("_l", F.posexplode("_q").alias("d", "y"))
        .groupBy("_l", "d")
        .agg(F.sum("y").cast("long").alias("s"))
    )
    sq = sums.groupBy("_l").agg(
        F.sum(dec(F.col("s")) * dec(F.col("s"))).alias("ssq")
    )
    cross = (
        sums.alias("a")
        .join(sums.alias("b"), ["d"])
        .where(F.col("a._l") != F.col("b._l"))
        .groupBy(F.col("a._l").alias("la"), F.col("b._l").alias("lb"))
        .agg(F.sum(dec(F.col("a.s")) * dec(F.col("b.s"))).alias("ssab"))
    )
    # zero centroids (e.g. an exactly antipodal pair) have no
    # direction: they neither rank nor get ranked as confusers
    cosab = (
        cross.join(sq.select(F.col("_l").alias("la"),
                             F.col("ssq").alias("ssqa")), "la")
        .join(sq.select(F.col("_l").alias("lb"),
                        F.col("ssq").alias("ssqb")), "lb")
        .where((F.col("ssqa") > 0) & (F.col("ssqb") > 0))
        .select(
            "la",
            "lb",
            (
                F.col("ssab").cast("double")
                / F.sqrt(F.col("ssqa").cast("double")
                         * F.col("ssqb").cast("double"))
            ).alias("cos_ab"),
        )
    )
    wbest = Window.partitionBy("la").orderBy(
        F.col("cos_ab").desc(), F.col("lb").asc()
    )
    best = cosab.select(
        "la", "lb", "cos_ab", F.row_number().over(wbest).alias("rk")
    ).where(F.col("rk") == 1)

    nd = F.col("n").cast("double")
    cohesion = F.when(
        F.col("n") >= F.lit(2),
        (F.col("ssq") - F.col("selfsum")).cast("double")
        / ((F.col("n") * (F.col("n") - F.lit(1))).cast("double")
           * F.lit(qf * qf)),
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return (
        st.join(sq, "_l")
        .join(best, st["_l"] == best["la"], "left")
        .select(
            F.col("_l").alias(label_col),
            F.col("n").alias("n_vecs"),
            rnd(
                F.sqrt(F.col("ssq").cast("double")) / (nd * F.lit(qf))
            ).alias("centroid_norm"),
            rnd(cohesion).alias("cohesion"),
            F.col("lb").alias("nearest_label"),
            rnd(F.col("cos_ab")).alias("nearest_cos"),
        )
    )
