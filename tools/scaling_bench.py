"""Scaling-efficiency evidence for the north rule.

The rule's criterion — ">= 0.8 throughput scaling efficiency from N to
4N executors" — cannot use a real cluster in this sandbox, so (per the
driver instruction) we run the SAME rollup job on the SAME input at
local[8] and local[32] in separate JVMs and report throughput at both
plus efficiency = (T8 / T32) / 4 ... i.e.
(points_per_sec_32 / points_per_sec_8) / (32/8).

Writes BENCH/BASELINE.md. Usage: python tools/scaling_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from chronoxtract_spark.session import get_spark
from chronoxtract_spark.plans.rollup import RollupEngine
from chronoxtract_spark.sources.tableio import temp_warehouse

cpus = {cpus}
sf_dir = {sf_dir!r}
spark = get_spark(app_name=f"cx_scale_{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
ev = spark.read.parquet(f"{{sf_dir}}/events.parquet").select(
    F.col("user_id").cast("string").alias("conv_id"),
    F.col("event_id").cast("int").alias("turn_idx"),
    F.lit("user").alias("role"), F.col("props").alias("text"),
    F.lit(None).cast("string").alias("tool"), "ts")
ev.cache(); n = ev.count()
io = temp_warehouse(spark)
eng = RollupEngine(spark, io, kernel_features=True, compress=True)
t0 = time.time()
counts = eng.run(ev, source_snapshot="scale", resume=False)
dt = time.time() - t0
shutil.rmtree(io.root, ignore_errors=True)
total = sum(counts.values())
print(json.dumps({{"cpus": cpus, "sec": dt, "points": total,
                   "points_per_sec": total / dt, "input_rows": n}}))
spark.stop()
"""


def run_at(cpus: int, sf_dir: str) -> dict:
    code = RUNNER.format(repo=REPO, cpus=cpus, sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"run at local[{cpus}] produced no result:\n{out.stderr[-3000:]}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    r8 = run_at(8, sf_dir)
    print("local[8]:", json.dumps(r8))
    r32 = run_at(32, sf_dir)
    print("local[32]:", json.dumps(r32))
    speedup = r32["points_per_sec"] / r8["points_per_sec"]
    efficiency = speedup / (32 / 8)
    report = {
        "sf_dir": sf_dir,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — measured throughput + scaling evidence

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by tools/scaling_bench.py.

North metric: rolled-up points/sec across all retention tiers
(1m gap-filled points + 1h windows + 1d windows, with kernel feature
vectors and Gorilla chunk compression), full pipeline wall-clock
including tier writes and lineage commits.

Sandbox stand-in for the N vs 4N executor criterion (per driver
instruction): the same job, same input ({sf_dir}), separate JVMs at
local[8] vs local[32].

| config | wall sec | rolled-up points | points/sec |
| --- | --- | --- | --- |
| local[8]  | {r8['sec']:.2f} | {r8['points']} | {r8['points_per_sec']:.0f} |
| local[32] | {r32['sec']:.2f} | {r32['points']} | {r32['points_per_sec']:.0f} |

- speedup 8→32 cores (4× resources): **{speedup:.2f}×**
- scaling efficiency (speedup / 4): **{efficiency:.3f}** (north-rule bar: ≥ 0.8)

```json
{json.dumps(report, indent=2)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
