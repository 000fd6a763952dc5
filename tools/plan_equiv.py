"""Plan-equivalence witness for the scaling evidence's pooling key.

The scaling sidecar pools best-per-leg runs by a byte-hash of the
engine source files (scaling_bench.ENGINE_FILES). That key moves on
ANY edit — including edits that add dead code to the measured job
(e.g. the round-4 opt-in ``quantiles="tdigest"`` branch). This tool
makes the "same executed job" claim checkable: it dumps the NORMALIZED
physical plans (expr ids, temp paths, plan ids, file locations
scrubbed) of exactly the DataFrames the scaling legs execute —
observed slim, the 1h+1d kernel tier pass, the 1m dense base, and the
Gorilla chunk build — on a fixed seed-42 synthetic input.

Reproduce the round-4 witness:
    python tools/plan_equiv.py /root/repo       CUR.txt
    git worktree add /tmp/prev <rev-with-old-fingerprint>
    python tools/plan_equiv.py /tmp/prev        PREV.txt
    diff PREV.txt CUR.txt        # empty => identical measured job

Results on record (canonical dump: BENCH/MEASURED_PLANS.txt):
- d800ca5e703d vs 56eaf25c9076 — diff EMPTY (the opt-in tdigest
  branch is dead in the measured job).
- 714b84f227ab vs 56eaf25c9076 — diff EMPTY, re-run 2026-08-18 16:00
  (the r4b tableio compaction additions are never called by the
  rollup legs; 394 normalized plan lines identical).
"""

from __future__ import annotations

import re
import sys


def main() -> None:
    repo = sys.argv[1] if len(sys.argv) > 1 else "."
    out = sys.argv[2] if len(sys.argv) > 2 else "MEASURED_PLANS.txt"
    sys.path.insert(0, repo)
    from chronoxtract_spark.operators.gapfill import (
        gap_fill_minutes,
        turn_rate_1m,
    )
    from chronoxtract_spark.plans.rollup import RollupEngine
    from chronoxtract_spark.session import get_spark
    from chronoxtract_spark.sources.tableio import temp_warehouse
    from chronoxtract_spark.synth import synth_transcripts

    spark = get_spark(
        app_name="plan_equiv", master="local[2]", shuffle_partitions=8
    )
    df = synth_transcripts(
        spark, n_conversations=40, seed=42, min_turns=40, max_turns=128
    )
    eng = RollupEngine(spark, temp_warehouse(spark))
    obs = eng.build_observed(df)

    texts = []

    def cap(name, d):
        s = d._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        s = re.sub(r"#\d+L?", "#N", s)
        s = re.sub(r"/tmp/\S+", "/TMP", s)
        s = re.sub(r"\[plan_id=\d+\]", "[plan_id=N]", s)
        s = re.sub(r"Location: \S+", "Location: X", s)
        texts.append(f"===== {name} =====\n{s}\n")

    cap("observed", obs)
    cap("tiers_kernel", eng.build_rollup_tiers_kernel(obs))
    base = gap_fill_minutes(turn_rate_1m(df.select("conv_id", "ts")))
    cap("base_1m_dense", base)
    cap(
        "chunks",
        eng.build_chunks(
            base.withColumn(
                "day", base.minute_ts.cast("date").cast("string")
            )
        ),
    )
    with open(out, "w") as f:
        f.write("\n".join(texts))
    print(f"wrote {out} ({sum(t.count(chr(10)) for t in texts)} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
