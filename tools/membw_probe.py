"""Memory-bandwidth scaling ceiling of this box, measured exogenously.

The scaling legs substitute local[2] -> local[8] threads on ONE machine
for the rule's N -> 4N executors. CPU-bound work scales ~4x across that
step (the flat region the methodology note establishes), but
bandwidth-bound work cannot scale past the socket's memory controller
— 4N real executors bring 4x memory bandwidth, 4x threads on one box
do not. This probe quantifies that ceiling so the per-phase scaling
ratios in BENCH/BASELINE.md can be read against the hardware's own
limit rather than attributed to the engine.

Workload: STREAM-triad-like numpy kernel (a = b + s*c over arrays far
larger than LLC), one single-thread worker pinned per core, run at 1,
2, and 8 workers. Reports per-worker seconds and aggregate effective
bandwidth scaling 2 -> 8 workers.

Usage: python tools/membw_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import time
import numpy as np
n = 1 << 25  # 3 arrays x 256 MiB >> LLC
b = np.full(n, 1.5)
c = np.full(n, 2.5)
a = np.empty(n)
# warm
np.add(b, c, out=a)
t0 = time.time()
reps = 8
for _ in range(reps):
    np.multiply(c, 3.0, out=a)
    a += b
dt = time.time() - t0
# bytes moved per rep: ~4 array traversals (read c, write a, read a+b, write a)
print((reps * 4 * n * 8) / dt / 1e9)
"""


#: cache-hostile analog: random 8-byte gathers over a 512 MiB table —
#: the access pattern of dictionary hashing / compression index work
#: (the parquet encode path), dominated by shared-LLC misses and
#: memory LATENCY rather than streaming bandwidth. If k workers scale
#: worse here than on the triad, parallel encode streams contend on
#: the shared last-level cache — a one-box artifact separate nodes
#: don't share.
GATHER = r"""
import time
import numpy as np
rng = np.random.RandomState(0)
table = rng.standard_normal(1 << 26)          # 512 MiB
idx = rng.randint(0, table.size, 1 << 24)     # 16M random gathers
out = np.empty(idx.size)
np.take(table, idx, out=out)                  # warm
t0 = time.time()
reps = 6
for _ in range(reps):
    np.take(table, idx, out=out)
dt = time.time() - t0
print((reps * idx.size) / dt / 1e6)           # M gathers/s
"""


def run_workers(k: int, src: str = WORKER) -> list[float]:
    k = min(k, os.cpu_count() or 1)
    procs = []
    try:
        for i in range(k):
            procs.append(
                subprocess.Popen(
                    ["taskset", "-c", str(i), sys.executable, "-c", src],
                    stdout=subprocess.PIPE,
                    text=True,
                )
            )
        return sorted(float(p.communicate()[0].strip()) for p in procs)
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()


def main() -> None:
    out = {}
    for k in (1, 2, 8):
        gbs = run_workers(k)
        out[f"workers_{k}"] = {
            "per_worker_GBps": [round(g, 2) for g in gbs],
            "aggregate_GBps": round(sum(gbs), 2),
        }
    agg2 = out["workers_2"]["aggregate_GBps"]
    agg8 = out["workers_8"]["aggregate_GBps"]
    out["bw_scaling_2_to_8"] = round(agg8 / agg2, 3)
    out["bw_ceiling_efficiency"] = round(agg8 / agg2 / 4, 3)
    for k in (2, 8):
        gs = run_workers(k, GATHER)
        out[f"gather_{k}"] = {
            "per_worker_Mgathers": [round(g, 1) for g in gs],
            "aggregate_Mgathers": round(sum(gs), 1),
        }
    g2 = out["gather_2"]["aggregate_Mgathers"]
    g8 = out["gather_8"]["aggregate_Mgathers"]
    out["gather_scaling_2_to_8"] = round(g8 / g2, 3)
    out["gather_ceiling_efficiency"] = round(g8 / g2 / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
