"""Deduplication operators for large-scale training-data pipelines.

All variants are Spark-first and shuffle-efficient:

- ``exact_duplicates`` — hash-groupBy on a content digest; one shuffle
  keyed by the digest, partial-aggregated map-side.
- ``ngram_jaccard_pairs`` — exact word-shingle Jaccard via an inverted
  shingle index (explode → self-equi-join on shingle → count): the join
  is an equi-join on the shingle hash, never an O(n²) cross join, and
  hot shingles (stopword-only shingles) can be dropped by document
  frequency before the join.
- ``minhash_lsh_pairs`` — MinHash signatures (xxhash64 with k seed
  columns, a pure column expression — no Python) banded into LSH
  buckets; candidate pairs come from an equi-join on
  ``(band, band_hash)`` and are verified with exact Jaccard. This is
  the 100 TB scale path: shuffle volume is O(n_docs * n_bands).
- ``simhash_duplicates`` — 64-bit SimHash from per-token hash bit
  votes; near-dups = equal value on any of 4 16-bit bands (Hamming
  distance ≤ 3 heuristic), again equi-join only.
- ``embedding_near_duplicates`` — cosine ≥ threshold over an
  ``array<float>`` column; brute force for small dims, LSH-bucketed via
  random hyperplanes at scale (operators.similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from chronoxtract_spark.operators._util import spread_small_scan as _spread


def exact_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "exact",
    prefix_len: int = 128,
) -> DataFrame:
    """Groups of duplicate documents: (text_hash, n_docs, doc_ids).

    ``key`` picks the dedup fingerprint:
    - ``exact``      — md5 of the full text (byte-identical dups)
    - ``normalized`` — md5 of lowercased, whitespace-collapsed text
    - ``prefix``     — md5 of the first ``prefix_len`` chars (the cheap
      head-fingerprint used to catch template/boilerplate families)
    All variants are one digest projection + one hash-partitioned
    groupBy with map-side partial aggregation.
    """
    from chronoxtract_spark.operators.text import normalized_text

    text = F.col(text_col)
    if key == "normalized":
        text = normalized_text(text)
    elif key == "prefix":
        text = F.substring(text, 1, prefix_len)
    elif key != "exact":
        raise ValueError(f"unknown dedup key: {key}")
    return (
        _spread(df).select(F.md5(text).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def word_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    spread: bool = True,
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built with ``transform`` over an index ``sequence``; the explode is
    the only row-expansion. ``spread=False`` skips the input
    repartition probe — pass it when the caller already spread the
    input (or hands in a composed plan, where the probe would execute
    upstream stages eagerly)."""
    if spread:
        df = _spread(df)
    return df.select(
        F.col(id_col),
        F.explode(_shingle_array(text_col, n)).alias("shingle"),
    )


def _shingle_array(text_col: str, n: int):
    """Column expression: the DISTINCT word n-gram shingles of a text
    as an array. Per-document dedup via ``array_distinct`` INSIDE the
    row — set-identical to a post-explode ``.distinct()`` (the id is
    the row), but the global shuffle+dedup of the exploded table is
    gone (guide §2.4 remove-shuffles: it was the largest intermediate
    in every shingle pipeline)."""
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(words) - n)
    return F.array_distinct(
        F.when(
            F.size(words) >= n,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(words, i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def _hashed_shingles(sh: DataFrame) -> DataFrame:
    """Replace the string shingle with its xxhash64: downstream
    joins/aggregations then shuffle 8-byte longs instead of multi-word
    strings. Measured performance-neutral on local[16] (the stages are
    CPU-bound there and Spark hashes join keys anyway); the point is
    the ~3x smaller shuffle KEY bytes on a network-bound cluster
    shuffle. A 64-bit collision merges two shingles with probability
    ~n^2/2^65 — immaterial against the Jaccard thresholds."""
    return sh.withColumn("shingle", F.xxhash64("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.4,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (d1 < d2, jaccard >= t).

    ``max_shingle_df`` drops shingles appearing in more than that many
    documents before the self-join — the standard guard against
    quadratic blowup on boilerplate shingles at web scale.
    """
    df = _spread(df)
    sh = _hashed_shingles(
        word_shingles(df, id_col, text_col, n, spread=False)
    ).withColumnRenamed(id_col, "d")
    if max_shingle_df:
        # one grouped posting-list relation (collect_list per shingle,
        # df-filtered) feeds BOTH the sizes aggregation and the pair
        # self-join via its re-explode: the old shape paid [groupBy
        # count + re-join with keep + repartition] — three shuffles of
        # the exploded table — where this pays one (shingle) exchange
        # that every consumer reuses (guide §2.4). The pair enumeration
        # itself stays a codegen'd self-join: an array-comprehension
        # explode of the same pairs ran ~3x slower (higher-order
        # lambdas are interpreted). Sizes count a doc's shingles AFTER
        # the df filter — the contract the oracle pins
        # (QUALIFY ... <= max_df before sizes).
        sh_f = (
            sh.groupBy("shingle")
            .agg(F.collect_list("d").alias("docs"))
            .filter(F.size("docs") <= max_shingle_df)
            .select("shingle", F.explode("docs").alias("d"))
        )
        sizes = sh_f.groupBy("d").agg(F.count("*").alias("n_sh"))
        a = sh_f.alias("a")
        b = sh_f.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.d") < F.col("b.d")),
            )
            .groupBy(F.col("a.d").alias("d1"), F.col("b.d").alias("d2"))
            .agg(F.count("*").alias("inter"))
        )
    else:
        # per-doc distinct-shingle counts straight from the pre-explode
        # array — no shuffle (the old groupBy(d) re-shuffled the whole
        # exploded table on a second key); docs with zero shingles
        # vanish from `inter` anyway, so their n_sh=0 rows are harmless
        sizes = df.select(
            F.col(id_col).alias("d"),
            F.size(_shingle_array(text_col, n)).alias("n_sh"),
        )
        # unbounded document frequency: keep the streaming self-join —
        # a grouped doc-array would hold a hot shingle's whole posting
        # list in one row. The self-join output is quadratic in shingle
        # document-frequency; AQE sees only the (small) input and would
        # coalesce the join to a handful of tasks — pin the parallelism
        # explicitly before the blowup.
        n_part = max(sh.sparkSession.sparkContext.defaultParallelism, 8)
        shp = sh.repartition(n_part, "shingle")
        a = shp.alias("a")
        b = shp.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.d") < F.col("b.d")),
            )
            .groupBy(F.col("a.d").alias("d1"), F.col("b.d").alias("d2"))
            .agg(F.count("*").alias("inter"))
        )
    out = (
        inter.join(sizes.withColumnRenamed("d", "d1").withColumnRenamed("n_sh", "n1"), "d1")
        .join(sizes.withColumnRenamed("d", "d2").withColumnRenamed("n_sh", "n2"), "d2")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def _hash64(col, seed, hash_fn: str):
    """Seeded 64-bit-ish hash column: ``xxhash64`` (fast JVM default) or
    ``md5_60`` — the low 60 bits of md5(value || 0x01 || seed), which
    DuckDB reproduces exactly (`('0x' || substr(md5(..),1,15))::BIGINT`)
    so oracle queries can verify the whole pipeline end-to-end."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    if hash_fn == "md5_60":
        return F.conv(
            F.substring(
                F.md5(F.concat(col, F.lit("\x01"), F.lit(str(seed)))), 1, 15
            ),
            16,
            10,
        ).cast("long")
    raise ValueError(f"unknown hash_fn: {hash_fn}")


#: 2^61 - 1 (Mersenne prime) — the modulus of the derived-hash family
MINHASH_P = (1 << 61) - 1


def minhash_coeffs(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) multipliers (< 2^31, odd a) for the
    universal family h_i(x) = (a_i*hi30 + b_i*lo30 + i) mod (2^61-1)
    over the 60-bit md5-prefix base hash. One md5 per value serves every
    hash function — the portable analogue of 'one xxhash64 per seed'
    at ~1/num_hashes the hashing cost. Products stay < 2^62, so the
    arithmetic is exact in int64 on both engines (no overflow under
    Spark ANSI mode)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    out = []
    for _ in range(num_hashes):
        a = int(rng.randint(1, 1 << 31)) | 1
        b = int(rng.randint(0, 1 << 31))
        out.append((a, b))
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    hash_fn: str = "xxhash64",
    spread: bool = True,
) -> DataFrame:
    """MinHash signature per document as an array<long> column.

    Each hash function is ``hash(shingle, seed_i)``; the signature is
    the per-seed minimum — one groupBy over the exploded shingles, all
    JVM-side column expressions.
    """
    sh = word_shingles(df, id_col, text_col, n, spread=spread)
    if hash_fn == "md5_60":
        # one md5 per shingle; every hash function derives from it with
        # exact int64 arithmetic (see minhash_coeffs)
        base = _hash64(F.col("shingle"), "base", hash_fn)
        sh = sh.select(
            id_col,
            F.shiftright(base, 30).alias("_hi"),
            base.bitwiseAND(F.lit((1 << 30) - 1)).alias("_lo"),
        )
        mins = [
            F.min(
                F.pmod(
                    F.lit(a) * F.col("_hi") + F.lit(b) * F.col("_lo") + F.lit(i),
                    F.lit(MINHASH_P),
                )
            ).alias(f"h{i}")
            for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
        ]
    else:
        # hash the string shingle to a long ONCE, then evaluate the k
        # seeded hash functions over the 8-byte long — k string hashes
        # per shingle row cost ~20% of this stage's wall time at k=32
        # (measured at sf0.1; the md5_60 path already amortizes via its
        # derived-coefficient family, this is the xxhash64 analogue)
        sh = _hashed_shingles(sh)
        mins = [
            F.min(_hash64(F.col("shingle"), i, hash_fn)).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float = 0.4,
    hash_fn: str = "xxhash64",
    preverify_margin: float | None = None,
) -> DataFrame:
    """MinHash + LSH banding near-duplicate pairs, exact-verified.

    Candidates = documents sharing any (band, band-signature-hash)
    bucket; each candidate pair is then verified with exact shingle
    Jaccard. At scale the verify join touches only candidate docs.

    With ``hash_fn='md5_60'`` the bucket key is the concatenated band
    values (portable, integer-exact) instead of their xxhash64 — the
    whole pipeline is then engine-independent and oracle-checkable.

    ``preverify_margin``: the corpus-scale throughput lever. The exact
    shingle-intersection join dominates wall time (BENCH/DEDUP_SCALE.md),
    but every candidate pair already carries a FREE Jaccard estimate —
    the fraction of agreeing signature positions (unbiased, std
    ``sqrt(J(1-J)/num_hashes)``). With a margin m, pairs whose estimate
    is ≥ threshold+m are accepted carrying the (rounded) estimate as
    their ``jaccard``, pairs below threshold-m are dropped, and only the
    band in between — a vanishing slice for real near-dup corpora, where
    true dups sit far above the threshold and bucket-collision noise far
    below — pays the exact join. Deterministic given the signatures, so
    the fast path is just as oracle-checkable as the exact one.
    ``None`` (default) keeps the fully exact-verified behavior.
    """
    rows_per_band = num_hashes // bands
    df = _spread(df)
    sig = minhash_signatures(
        df, id_col, text_col, n, num_hashes, hash_fn, spread=False
    )

    def band_key(b):
        vals = [
            F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)
        ]
        if hash_fn == "xxhash64":
            return F.xxhash64(*vals).cast("string")
        return F.concat_ws(":", *[v.cast("string") for v in vals])

    band_cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"), band_key(b).alias("bucket")
                )
                for b in range(bands)
            ]
        )
    ).alias("bb")
    buckets = sig.select(F.col(id_col).alias("d"), band_cols).select(
        "d", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # same quadratic-output guard as the shingle join
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    buckets = buckets.repartition(n_part, "band", "bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .select(F.col("a.d").alias("d1"), F.col("b.d").alias("d2"))
        .distinct()
    )
    pre_accepted = None
    if preverify_margin is not None:
        sigs = sig.select(F.col(id_col).alias("_pd"), "signature")
        cand_est = (
            candidates.join(
                sigs.withColumnRenamed("_pd", "d1").withColumnRenamed(
                    "signature", "_sig1"
                ),
                "d1",
            )
            .join(
                sigs.withColumnRenamed("_pd", "d2").withColumnRenamed(
                    "signature", "_sig2"
                ),
                "d2",
            )
            .withColumn(
                "est",
                F.size(
                    F.filter(
                        F.zip_with("_sig1", "_sig2", lambda x, y: x == y),
                        lambda v: v,
                    )
                )
                / F.lit(float(num_hashes)),
            )
            .select("d1", "d2", "est")
        )
        # two consumers (accept branch + exact-verify branch) read this
        # relation; persist so the signature/bucket subtree runs once.
        # The relation is O(candidate pairs) — three scalars per row,
        # negligible next to the corpus — and spills to disk if not.
        from pyspark import StorageLevel

        cand_est = cand_est.persist(StorageLevel.MEMORY_AND_DISK)
        pre_accepted = cand_est.filter(
            F.col("est") >= verify_threshold + preverify_margin
        ).select("d1", "d2", F.round("est", 6).alias("jaccard"))
        candidates = cand_est.filter(
            (F.col("est") >= verify_threshold - preverify_margin)
            & (F.col("est") < verify_threshold + preverify_margin)
        ).select("d1", "d2")
    # exact verify per candidate PAIR: shingle both sides of each pair
    # and count the intersection with one equi-join keyed on
    # (pair, shingle). Cost is O(sum of candidate-pair shingle sizes) —
    # NOT the inverted-index self-join over the whole candidate-doc
    # subset, which degenerates toward full-Jaccard cost when candidates
    # are dense (e.g. a boilerplate-heavy corpus).
    sh = _hashed_shingles(
        word_shingles(
            df.join(
                candidates.select(F.col("d1").alias("doc"))
                .union(candidates.select("d2"))
                .distinct(),
                df[id_col] == F.col("doc"),
                "left_semi",
            ),
            id_col,
            text_col,
            n,
            spread=False,
        )
    ).withColumnRenamed(id_col, "d")
    sizes = sh.groupBy("d").agg(F.count("*").alias("n_sh"))
    s1 = sh.select(F.col("d").alias("d1"), "shingle")
    s2 = sh.select(F.col("d").alias("d2"), "shingle")
    inter = (
        candidates.join(s1, "d1")
        .join(s2, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    verified = (
        inter.join(
            sizes.withColumnRenamed("d", "d1").withColumnRenamed("n_sh", "n1"), "d1"
        )
        .join(
            sizes.withColumnRenamed("d", "d2").withColumnRenamed("n_sh", "n2"), "d2"
        )
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("d1", "d2", F.round("jaccard", 6).alias("jaccard"))
    )
    if pre_accepted is not None:
        return verified.unionByName(pre_accepted)
    return verified


def duplicate_clusters(
    pairs: DataFrame,
    d1: str = "d1",
    d2: str = "d2",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs → (doc, cluster).

    Min-label propagation: every doc starts labeled with itself; each
    round, labels flow across edges and every doc keeps the minimum it
    has seen. Converges in O(component diameter) rounds — near-dup
    clusters are shallow (template families), so a handful of rounds
    closes them. Each round is two shuffles (join + min-agg); the loop
    lives on the driver with a cheap convergence check, the data never
    does — the standard GraphX-free component pattern at scale.
    """
    edges = (
        pairs.select(F.col(d1).alias("a"), F.col(d2).alias("b"))
        .union(pairs.select(F.col(d2).alias("a"), F.col(d1).alias("b")))
        .distinct()
    )
    labels = (
        edges.select(F.col("a").alias("doc"))
        .distinct()
        .withColumn("cluster", F.col("doc"))
    )
    from pyspark.sql import Observation

    prev_ckpt: DataFrame | None = None
    for i in range(max_iters):
        # labels reachable over one hop, merged with current. The OLD
        # label rides the union as a second column (non-null only on the
        # labels branch, so min() recovers the unique old value), and the
        # changed-count is an ``observe`` metric collected by the SAME
        # checkpoint action that materializes the round — one job per
        # propagation round, no separate convergence probe.
        merged = (
            edges.join(labels, edges["b"] == labels["doc"])
            .select(
                F.col("a").alias("doc"),
                "cluster",
                F.lit(None).cast(labels.schema["cluster"].dataType).alias("old"),
            )
            .unionByName(
                labels.select("doc", "cluster", F.col("cluster").alias("old"))
            )
            .groupBy("doc")
            .agg(
                F.min("cluster").alias("cluster"),
                F.min("old").alias("old"),
            )
        )
        obs = Observation(f"cc_round_{i}")
        prop = (
            merged.observe(
                obs,
                F.sum(
                    (F.col("cluster") != F.col("old")).cast("long")
                ).alias("changed"),
            )
            .select("doc", "cluster")
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"] or 0)
        # the previous round's checkpoint blocks are dead once ``prop``
        # replaces it — free them, or max_iters label snapshots pile up
        # in executor storage for the life of the job
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt, labels = prop, prop
        if changed == 0:
            return labels
    raise RuntimeError(
        f"duplicate_clusters did not converge in {max_iters} rounds — "
        "a component's diameter exceeds the iteration budget; raise "
        "max_iters (rounds needed = longest chain in the pair graph)"
    )


def dedup_keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop all but the smallest-id doc of each near-duplicate cluster
    (deterministic representative); docs in no pair pass through."""
    clusters = duplicate_clusters(pairs)
    losers = clusters.filter(F.col("doc") != F.col("cluster")).select(
        F.col("doc").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def simhash_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_bits: int = 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-duplicate candidate pairs via banded equi-join.

    SimHash: explode tokens, each token votes its hash bits (+1/-1),
    sign of the per-bit sum is the fingerprint. Documents sharing any
    of the n_bits/band_bits bands are candidates (standard
    Hamming-distance blocking). ``hash_fn='md5_60'`` uses the portable
    60-bit md5-prefix hash (oracle-checkable; band_bits must divide 60).
    """
    n_bits = 64 if hash_fn == "xxhash64" else 60
    if n_bits % band_bits:
        raise ValueError(
            f"band_bits={band_bits} must divide {n_bits} for "
            f"hash_fn={hash_fn!r} (otherwise high fingerprint bits are "
            "silently excluded from banding)"
        )
    tokens = _spread(df).select(
        F.col(id_col).alias("d"), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    h = (
        F.xxhash64("tok")
        if hash_fn == "xxhash64"
        else _hash64(F.col("tok"), 0, hash_fn)
    )
    votes = [
        F.sum(
            F.when(h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(n_bits)
    ]
    agg = tokens.groupBy("d").agg(*votes)
    bit_terms = None
    for i in range(n_bits):
        term = F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        bit_terms = term if bit_terms is None else bit_terms.bitwiseOR(term)
    fp = agg.select("d", bit_terms.alias("simhash"))
    n_bands = n_bits // band_bits
    mask = (1 << band_bits) - 1
    bandrows = fp.select(
        "d",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("d", "simhash", "bb.band", "bb.key")
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    bandrows = bandrows.repartition(n_part, "band", "key")
    a, b = bandrows.alias("a"), bandrows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .select(
            F.col("a.d").alias("d1"),
            F.col("b.d").alias("d2"),
            F.col("a.simhash").alias("sh1"),
            F.col("b.simhash").alias("sh2"),
        )
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
        )
        .select("d1", "d2", "hamming")
    )
    return pairs


def cross_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_shared: int = 1,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Benchmark-contamination scan: flag (train_doc, eval_doc) pairs
    sharing at least ``min_shared`` word n-grams.

    The standard decontamination pass before training on scraped text:
    any train document overlapping an evaluation document's n-grams
    leaks the benchmark. Same inverted-index shape as ngram_jaccard —
    shingle both sides, one equi-join on the shingle, count per pair —
    so cost is linear in shingle volume, never |train| x |eval|. The
    eval side is the small one; ``max_shingle_df`` (applied to the
    TRAIN side) guards boilerplate shingles that would fan out.
    """
    # NO shingle hashing here, unlike the Jaccard operators: a single
    # 64-bit collision would FLAG a clean pair (min_shared defaults to
    # 1 — no threshold slack to absorb it) and diverge from the
    # string-keyed oracle; contamination verdicts stay exact
    sh_t = word_shingles(train, id_col, text_col, n).select(
        F.col(id_col).alias("train_id"), "shingle"
    )
    if max_shingle_df:  # 0/None = guard disabled, matching ngram_jaccard_pairs
        hot = (
            sh_t.groupBy("shingle")
            .count()
            .filter(F.col("count") > max_shingle_df)
            .select("shingle")
        )
        sh_t = sh_t.join(hot, "shingle", "left_anti")
    sh_e = word_shingles(eval_df, id_col, text_col, n).select(
        F.col(id_col).alias("eval_id"), "shingle"
    )
    return (
        sh_t.join(sh_e, "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
