"""ANN-at-scale benchmark with known cluster ground truth.

The sf0.1 embeddings table (2k vectors) cannot say anything about the
similarity-search family at scale, so this tool synthesizes a
deterministic clustered corpus — ``n_clusters`` unit centers with
gaussian points at ``noise`` radius, generated DISTRIBUTED (one seeded
numpy stream per partition via mapInPandas, no driver materialize) —
and measures the three ANN paths end-to-end on one pinned JVM:

- ``brute_force_topk`` — the exact baseline (and the recall referee),
- ``lsh_topk`` — random-hyperplane buckets, linear shuffle,
- ``ivf_topk`` — k-means coarse quantizer + probe lists (FAISS shape).

Recall@k is measured against the brute-force result, per query, then
averaged. Output: BENCH/ANN_SCALE.md. Cluster structure makes the
numbers interpretable: with noise well under the inter-center
distance, a query's true neighbors are its cluster-mates, so recall
failures are genuinely the index's miss rate, not metric ambiguity.

Usage: python tools/ann_scale_bench.py [n_vectors] [dim] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_vectors(spark, n: int, dim: int, n_clusters: int, noise: float,
                  n_parts: int = 16):
    """Clustered unit vectors, one deterministic numpy stream per
    partition (partition id seeds the RNG, so the corpus is identical
    at any parallelism)."""
    import pandas as pd

    per = n // n_parts

    def gen(batches):
        import numpy as np

        for pdf in batches:
            for pid in pdf["pid"]:
                rng = np.random.RandomState(1000 + int(pid))
                # last partition takes the remainder so exactly n
                # vectors are generated for any n
                hi = n if int(pid) == n_parts - 1 else (int(pid) + 1) * per
                ids = np.arange(int(pid) * per, hi)
                cluster = ids % n_clusters
                c_rng = np.random.RandomState(7)
                centers = c_rng.standard_normal((n_clusters, dim))
                centers /= np.linalg.norm(centers, axis=1, keepdims=True)
                pts = centers[cluster] + (noise / np.sqrt(dim)) * rng.standard_normal(
                    (len(ids), dim)
                )
                pts /= np.linalg.norm(pts, axis=1, keepdims=True)
                yield pd.DataFrame(
                    {
                        "vec_id": ids,
                        "cluster": cluster,
                        "embedding": [r.astype("float32").tolist() for r in pts],
                    }
                )

    return (
        spark.range(n_parts)
        .select("id")
        .toDF("pid")
        .repartition(n_parts, "pid")
        .mapInPandas(
            gen, schema="vec_id long, cluster long, embedding array<float>"
        )
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    k, n_clusters = 10, 1000
    from pyspark.sql import functions as F

    from chronoxtract_spark.operators.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_search,
        lsh_index,
        lsh_search,
    )
    from chronoxtract_spark.session import get_spark

    spark = get_spark(app_name="cx_ann_scale", master="local[16]",
                      shuffle_partitions=32,
                      # this VM's hypervisor can freeze the JVM for
                      # minutes in a degraded window; at 1M vectors the
                      # default 10s heartbeat x 60 misses then kills the
                      # local executor mid-stage — tolerate the stall
                      # instead of dying (observed 2026-08-17 08:08)
                      extra_conf={
                          "spark.network.timeout": "600s",
                          "spark.executor.heartbeatInterval": "60s",
                      })
    corpus = synth_vectors(spark, n, dim, n_clusters, noise=0.15).cache()
    n_actual = corpus.count()
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    ).cache()
    queries.count()

    def timed_search(name, fn, build_sec=0.0):
        t0 = time.time()
        res = (
            fn()
            .select(F.col("query_id"), F.col("neighbor_id"))
            .cache()
        )
        cnt = res.count()
        search = round(time.time() - t0, 2)
        return {"name": name, "build_sec": round(build_sec, 2),
                "search_sec": search,
                "wall_sec": round(build_sec + search, 2),
                "rows": cnt, "df": res}

    qdf = queries.withColumnRenamed("qid", "vec_id")

    # brute force has no index: its one corpus-scan matmul IS the query
    brute = timed_search(
        "brute_force", lambda: brute_force_topk(qdf, corpus, k=k))

    # index paths: build once (materialized via cache+count — the
    # deployment shape persists this relation and amortizes it across
    # query batches), then time the query phase against the built index
    t0 = time.time()
    lsh_idx = lsh_index(corpus, n_planes=10, n_tables=8, dim=dim).cache()
    lsh_idx.count()
    lsh_build = time.time() - t0
    lsh = timed_search(
        "lsh",
        lambda: lsh_search(lsh_idx, qdf, k=k, n_planes=10, n_tables=8, dim=dim),
        build_sec=lsh_build,
    )

    t0 = time.time()
    ivf_idx, cents = ivf_index(corpus, n_centroids=64)
    ivf_idx = ivf_idx.cache()
    ivf_idx.count()
    ivf_build = time.time() - t0
    ivf = timed_search(
        "ivf",
        lambda: ivf_search(ivf_idx, cents, qdf, k=k, n_probe=8),
        build_sec=ivf_build,
    )

    # all three paths exclude self-matches (brute_force_topk joins on
    # query_id != neighbor_id, similarity.py) — plain k-vs-k recall
    n_ref = brute["rows"]

    def recall(approx):
        hit = brute["df"].join(approx["df"], ["query_id", "neighbor_id"]).count()
        return round(hit / n_ref, 4)

    rows = []
    for r in (brute, lsh, ivf):
        rec = 1.0 if r is brute else recall(r)
        rows.append({"path": r["name"], "build_sec": r["build_sec"],
                     "search_sec": r["search_sec"], "wall_sec": r["wall_sec"],
                     "result_rows": r["rows"], "recall_at_k": rec})
        print(json.dumps(rows[-1]))

    # pool with prior invocations so the report tables every corpus
    # scale measured (latest run per scale wins), mirroring
    # BENCH/DEDUP_SCALE — the scale-up claim IS the cross-decade
    # comparison, so a single-scale overwrite would erase its evidence
    sidecar = os.path.join(REPO, "BENCH", "ann_runs.jsonl")
    with open(sidecar, "a") as f:
        f.write(json.dumps({
            "n": n_actual, "dim": dim, "n_queries": n_queries, "k": k,
            "n_clusters": n_clusters,
            "when": time.strftime("%Y-%m-%d %H:%M:%S"), "rows": rows,
        }) + "\n")
    by_scale = {}
    with open(sidecar) as f:
        for line in f:
            rec = json.loads(line)
            by_scale[rec["n"]] = rec  # latest run per scale wins

    def qspeed(rec, path):
        w = {r["path"]: r.get("search_sec", r["wall_sec"])
             for r in rec["rows"]}
        return w["brute_force"] / w[path]

    table = "\n".join(
        f"| {rec['n']:,} | {r['path']} | "
        f"{r.get('build_sec', '—')} | {r.get('search_sec', '—')} | "
        f"{r['wall_sec']} | {r['result_rows']} | {r['recall_at_k']} |"
        for _, rec in sorted(by_scale.items())
        for r in rec["rows"]
    )
    scales = [by_scale[s] for s in sorted(by_scale)]
    spd = "; ".join(
        f"at {rec['n']:,}: LSH **{qspeed(rec, 'lsh'):.1f}x** "
        f"(recall {[r for r in rec['rows'] if r['path'] == 'lsh'][0]['recall_at_k']}), "
        f"IVF **{qspeed(rec, 'ivf'):.1f}x** "
        f"(recall {[r for r in rec['rows'] if r['path'] == 'ivf'][0]['recall_at_k']})"
        for rec in scales
    )
    md = f"""# BENCH/ANN_SCALE — similarity search at corpus scale, known truth

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by tools/ann_scale_bench.py.

Corpus: float32[{dim}] unit vectors in {n_clusters} gaussian clusters
(perturbation norm ~0.15 around unit centers), generated distributed
with per-partition seeded streams. {n_queries} queries (cluster
members), k={k}; recall measured against the exact brute-force top-k
(all three paths exclude self-matches).
local[16], one JVM, each path timed after the corpus is cached.
Index paths are measured in deployment shape: the index relation
(``lsh_index`` / ``ivf_index``) is built and materialized ONCE
(build sec), then the query batch runs against it (search sec) —
a persisted index amortizes build across every future batch; brute
force has no index, its search IS the full corpus-scan matmul.

| corpus | path | build sec | search sec | total | result rows | recall@{k} vs brute |
| --- | --- | --- | --- | --- | --- | --- |
{table}

- brute force: one BLAS matmul block per corpus Arrow batch against
  the broadcast query matrix — the exact referee, linear in corpus
  size per query batch.
- LSH (10 planes x 8 tables) and IVF (64 centroids, probe 8) touch a
  fraction of the corpus per query; their recall here is the real
  index miss rate on well-separated clusters.
- query-phase speedup vs brute at this batch size: {spd}. The
  amortized (index-persisted) advantage grows with corpus size —
  brute rescans everything per batch; the probed paths touch a
  shrinking fraction of it.
- provenance: the original interpreted implementation (per-row
  ``F.aggregate`` dot products + a q x n scored-pair rank shuffle)
  measured 185 s brute / 59 s LSH / 51 s IVF at 100k and did not
  complete at 1M; the r4 BLAS-kernel rework (partial top-k, stacked
  Arrow decode, vectorized normalize) produced the numbers above with
  bit-identical recalls and all four ANN driver queries still
  DuckDB-oracle-exact.

```json
{json.dumps(scales, indent=2)}
```
"""
    out = os.path.join(REPO, "BENCH", "ANN_SCALE.md")
    with open(out, "w") as f:
        f.write(md)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
