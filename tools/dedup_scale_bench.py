"""Dedup-at-scale benchmark with measurable ground truth.

The sf0.1 documents table (5k docs) is too small to say anything about
the dedup family's scale behavior, so this tool synthesizes a
deterministic mutated-template corpus where the truth is KNOWN —
``n_families`` template families × ``variants`` near-duplicate
variants, tokens drawn through xxhash64 mixing (an affine token
formula produces shifted-copy collisions ACROSS families — measured:
precision collapsed to 0.58 — so mixing is load-bearing), each variant
mutating ~2 of 80 token positions (pairwise shingle Jaccard ≈ 0.73).

It then runs the production MinHash+LSH path end-to-end (signatures →
banded buckets → exact-Jaccard verify) at local[2] and local[8]
pinned cores in separate JVMs (the 2->8 pair sits inside this VM's
verified flat-scaling region — above ~16 busy threads the hypervisor
burns >10% system time and measures host contention, not the engine;
see BENCH/BASELINE.md methodology), and scores predicted pairs against the
family ground truth. Output: BENCH/DEDUP_SCALE.md with throughput,
the 4x-cores speedup, precision/recall, and host steal%% disclosure.

Usage: python tools/dedup_scale_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from chronoxtract_spark.session import get_spark
from chronoxtract_spark.operators.dedup import minhash_lsh_pairs
import bench as bench_mod

cpus = {cpus}
n = {n_docs}
# 2 partitions per core: one wave per stage straggles on the skewed
# partition; two waves let the scheduler rebalance
spark = get_spark(app_name=f"cx_dedup_scale_{{cpus}}",
                  master=f"local[{{cpus}}]", shuffle_partitions=2 * cpus)

def synth_docs(n, variants=10, tokens=80):
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / variants).cast("long").alias("family"),
        (F.col("id") % variants).cast("int").alias("variant"),
    )
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(tokens - 1)),
        lambda j: F.when(
            (j * 7 + F.col("variant") * 13) % 41 == 0,
            F.concat(F.lit("m"), F.pmod(
                F.xxhash64(F.col("variant"), j, F.lit(1)), F.lit(1000000)
            ).cast("string")),
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(
                F.xxhash64(F.col("family"), j), F.lit(1000000)
            ).cast("string"))
        ),
    )
    return d.withColumn("text", F.concat_ws(" ", tok))

docs = synth_docs(n).cache()
docs.count()                      # materialize corpus outside the timer
stat0 = bench_mod.read_cpu_stat()
t0 = time.time()
pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                          verify_threshold=0.5).select("d1", "d2").cache()
n_pred = pairs.count()
wall = time.time() - t0
pressure = bench_mod.cpu_pressure(stat0, bench_mod.read_cpu_stat())
fam = docs.select("doc_id", "family")
joined = (
    pairs
    .join(fam.withColumnRenamed("doc_id", "d1")
             .withColumnRenamed("family", "f1"), "d1")
    .join(fam.withColumnRenamed("doc_id", "d2")
             .withColumnRenamed("family", "f2"), "d2")
)
tp = joined.filter("f1 = f2").count()
# ground truth counts every family's C(size,2), including a partial
# final family when n is not a multiple of 10 — otherwise recall is
# inflated (and can exceed 1.0 at small n)
rem = n % 10
truth = (n // 10) * 45 + rem * (rem - 1) // 2
print("RESULT " + json.dumps({{
    "cpus": cpus, "n_docs": n, "wall_sec": round(wall, 2),
    "docs_per_sec": round(n / wall, 1), "n_pred": n_pred, "tp": tp,
    "precision": round(tp / max(n_pred, 1), 4),
    "recall": round(tp / truth, 4), "host_pressure": pressure,
}}))
spark.stop()
"""


def run_leg(cpus: int, n_docs: int) -> dict:
    cmd = ["taskset", "-c", f"0-{cpus-1}", sys.executable, "-u", "-c",
           LEG.format(repo=REPO, cpus=cpus, n_docs=n_docs)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result:\n{out.stderr[-2000:]}")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    legs = {}
    for cpus in (2, 8):
        legs[cpus] = run_leg(cpus, n_docs)
        print(json.dumps(legs[cpus]))
    speedup = legs[8]["docs_per_sec"] / legs[2]["docs_per_sec"]
    md = f"""# BENCH/DEDUP_SCALE — MinHash+LSH at corpus scale, known truth

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by tools/dedup_scale_bench.py.

Corpus: {n_docs} docs = {n_docs // 10} template families x 10
near-duplicate variants (80 tokens, ~2 mutated per variant, pairwise
shingle Jaccard ~0.73; xxhash64-mixed tokens so families share nothing).
Ground truth: every family's C(size,2) same-family pairs.
Pipeline: production xxhash64 MinHash (32 hashes, 8 bands) -> banded
bucket equi-join -> exact shingle-Jaccard verify at 0.5. Timed region
is the dedup pipeline only (corpus materialized before the timer);
separate pinned JVM per leg.

| config | wall sec | docs/sec | predicted pairs | precision | recall | steal% / sys% |
| --- | --- | --- | --- | --- | --- | --- |
""" + "\n".join(
        f"| local[{c}] | {r['wall_sec']} | {r['docs_per_sec']} | "
        f"{r['n_pred']} | {r['precision']} | {r['recall']} | "
        f"{(r['host_pressure'] or {}).get('steal_pct', '—')} / "
        f"{(r['host_pressure'] or {}).get('system_pct', '—')} |"
        for c, r in legs.items()
    ) + f"""

- 4x-cores speedup (2 -> 8): **{speedup:.2f}x**
- precision 1.0 means the exact-verify stage admits no cross-family
  pair; recall < 1 is the LSH banding miss rate at these parameters
  (more bands trade shuffle volume for recall).
- every stage is an equi-join or aggregation — shuffle-parallel; no
  all-pairs comparison anywhere (see BENCH/PLANS.md red-flag scan).

```json
{json.dumps(legs, indent=2)}
```
"""
    out = os.path.join(REPO, "BENCH", "DEDUP_SCALE.md")
    with open(out, "w") as f:
        f.write(md)
    print(f"wrote {out}; speedup {speedup:.2f}x")


if __name__ == "__main__":
    main()
