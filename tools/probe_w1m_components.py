"""Component-level 2c/8c scaling probe for the write_1m phase.

Splits the phase into separately-timed sub-plans so the non-scaling
component is identified by its own 2c/8c ratio instead of guessed:

  fanout_hash  dense fan-out + interpolation + day + row_hash, drained
               by an aggregate (no sort, no parquet encode, no write)
  write_nolin  partitioned dynamic-overwrite write of the hashed rows
               (adds the per-task day sort + parquet encode + file IO)
  write_nodict same, with dictionary encoding disabled for row_hash
               (an all-distinct xxhash64 column: the dictionary
               attempt builds a futile hash table per row group, the
               exact random-gather pattern tools/membw_probe.py showed
               scales worst on this host)
  readback     the thin (day, row_hash) lineage read-back scan
  full         the production _write_with_lineage path (profiler
               baseline; sanity anchor)

Usage: python tools/probe_w1m_components.py [components...]
Input: the profiler's /tmp/cx_w1m_input (generated on first use by
tools/profile_write1m.py).
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT_DIR = "/tmp/cx_w1m_input"

LEG = r"""
import json, shutil, sys, time, os
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from chronoxtract_spark.session import get_spark
from chronoxtract_spark.plans.rollup import RollupEngine
import chronoxtract_spark.sources.tableio as tio
from chronoxtract_spark.operators.gapfill import gap_fill_minutes
from chronoxtract_spark.synth import synth_transcripts

cpus = {cpus}
component = {component!r}
conf = {{"spark.local.dir": f"/dev/shm/spark_w1mc_{{cpus}}"}}
spark = get_spark(app_name=f"w1mc_{{cpus}}_{{component}}",
                  master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  extra_conf=conf)
ev = spark.read.parquet({input_dir!r})

root = f"/dev/shm/cx_w1mc_{{cpus}}_{{os.getpid()}}"
io = tio.ParquetBackend(spark, root)
eng = RollupEngine(spark, io, kernel_features=True, compress=True)

# warm-up: pay codegen/Arrow bring-up on a tiny copy of the same plan
warm = synth_transcripts(spark, 8, seed=1, min_turns=64, max_turns=256)
wobs = eng.build_observed(warm); wobs.cache()
wdays = eng._candidate_days(wobs)
wbase = gap_fill_minutes(wobs).withColumn("day", F.date_format("minute_ts", "yyyy-MM-dd"))
eng._write_with_lineage(eng.build_rollup_1m(wbase), "warm_1m", wdays, "warm")
wobs.unpersist()

observed = eng.build_observed(ev)
observed.cache()
days = eng._candidate_days(observed)

def dense_hashed():
    base = gap_fill_minutes(observed).withColumn(
        "day", F.date_format("minute_ts", "yyyy-MM-dd"))
    tier = eng.build_rollup_1m(base).filter(F.col("day").isin(days))
    cols = sorted(tier.columns)
    return tier.withColumn(
        "row_hash",
        F.expr("xxhash64({{}})".format(
            ", ".join("cast(day as string)" if c == "day" else c
                      for c in cols))))

t0 = time.time(); n = None
if component == "fanout_hash":
    n = dense_hashed().agg(
        F.count("*"), F.bit_xor("row_hash"), F.sum("rate"), F.sum("turns"),
        F.max("conv_id"), F.max("minute_ts"), F.max("day"),
        F.max("observed")).collect()[0][0]
elif component in ("write_nolin", "write_nodict"):
    df = dense_hashed()
    w = (df.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic"))
    if component == "write_nodict":
        w = w.option("parquet.enable.dictionary#row_hash", "false")
    w.partitionBy("day").parquet(os.path.join(root, "rollup_1m"))
    n = -1
elif component == "readback":
    df = dense_hashed()
    (df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
       .partitionBy("day").parquet(os.path.join(root, "rollup_1m")))
    t0 = time.time()
    back = (spark.read.parquet(os.path.join(root, "rollup_1m"))
            .filter(F.col("day").isin(days))
            .groupBy(F.col("day").cast("string").alias("day"))
            .agg(F.count("*").alias("row_count"),
                 F.bit_xor("row_hash").alias("checksum"))
            .collect())
    n = sum(r["row_count"] for r in back)
elif component == "fanout_nohash":
    # fan-out + interpolation + day string, but no xxhash64 — isolates
    # the row_hash contribution to the compute ratio
    base = gap_fill_minutes(observed).withColumn(
        "day", F.date_format("minute_ts", "yyyy-MM-dd"))
    tier = eng.build_rollup_1m(base).filter(F.col("day").isin(days))
    n = tier.agg(
        F.count("*"), F.sum("rate"), F.sum("turns"),
        F.max("conv_id"), F.max("minute_ts"), F.max("day"),
        F.max("observed")).collect()[0][0]
elif component == "fanout_dateday":
    # day as a DATE (4-byte int, no per-row string formatting) and the
    # hash taken over the date directly — isolates the per-row
    # yyyy-MM-dd UTF8String allocation
    base = gap_fill_minutes(observed).withColumn(
        "day", F.to_date("minute_ts"))
    tier = eng.build_rollup_1m(base)
    cols = sorted(tier.columns)
    tier = tier.withColumn("row_hash", F.expr("xxhash64({{}})".format(
        ", ".join(cols))))
    n = tier.agg(
        F.count("*"), F.bit_xor("row_hash"), F.sum("rate"),
        F.sum("turns"), F.max("conv_id"), F.max("minute_ts"),
        F.max("day"), F.max("observed")).collect()[0][0]
elif component == "explode_only":
    # the bare segment explode: sequence()+explode drained by count +
    # a sum so the generate isn't pruned — the intrinsic row-generation
    # cost with no interpolation, day, or hash
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
    seg = observed.withColumn(
        "_next_ts", F.lead("minute_ts").over(
            w.partitionBy("conv_id").orderBy("minute_ts")))
    seg = seg.repartition(cpus * 2, "conv_id")
    seg_end = F.coalesce(
        F.col("_next_ts") - F.expr("interval 1 minute"), F.col("minute_ts"))
    dense = seg.select(
        "conv_id",
        F.explode(F.sequence("minute_ts", seg_end,
                             F.expr("interval 1 minute"))).alias("m"))
    n = dense.agg(F.count("*"), F.min("m"), F.max("m")).collect()[0][0]
elif component == "range_baseline":
    # platform ceiling witness: a trivial spark.range generate of the
    # same row count and a similar row width (string key + ts + double
    # + hash), no gap-fill logic at all — if THIS doesn't scale 4x on
    # this host, nothing that generates 40M rows will
    N = 40456389
    df = (spark.range(N, numPartitions=cpus * 2)
          .withColumn("conv_id", F.concat(F.lit("conv_"),
                                          (F.col("id") % 4096).cast("string")))
          .withColumn("minute_ts", F.timestamp_seconds(F.col("id") * 60))
          .withColumn("rate", F.col("id") * 0.001)
          .withColumn("day", F.date_format("minute_ts", "yyyy-MM-dd"))
          .withColumn("row_hash", F.expr(
              "xxhash64(conv_id, minute_ts, rate, day)")))
    n = df.agg(F.count("*"), F.bit_xor("row_hash"), F.sum("rate"),
               F.max("day")).collect()[0][0]
elif component == "full":
    base = gap_fill_minutes(observed).withColumn(
        "day", F.date_format("minute_ts", "yyyy-MM-dd"))
    tier = eng.build_rollup_1m(base).filter(F.col("day").isin(days))
    n = eng._write_with_lineage(tier, "rollup_1m", days, "prof")
dt = time.time() - t0
shutil.rmtree(root, ignore_errors=True)
print("RESULT " + json.dumps({{"cpus": cpus, "component": component,
    "sec": round(dt, 2), "n": n}}))
spark.stop()
"""

COMPONENTS = ("fanout_hash", "fanout_nohash", "fanout_dateday",
              "explode_only", "range_baseline", "write_nolin",
              "write_nodict", "readback", "full")


def run(component: str, cpus: int) -> dict:
    cmd = ["taskset", "-c", f"0-{cpus-1}", sys.executable, "-u", "-c",
           LEG.format(repo=REPO, cpus=cpus, component=component,
                      input_dir=INPUT_DIR)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                         cwd=REPO)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result for {component}@{cpus}:\n{out.stderr[-3000:]}")


def main():
    comps = sys.argv[1:] or list(COMPONENTS)
    recs = []
    for comp in comps:
        for cpus in (8, 2):
            r = run(comp, cpus)
            recs.append(r)
            print(json.dumps(r))
    by = {(r["component"], r["cpus"]): r["sec"] for r in recs}
    for comp in comps:
        a, b = by.get((comp, 2)), by.get((comp, 8))
        if a and b:
            print(f"{comp}: 2c {a}s  8c {b}s  ratio {a/b:.2f}")


if __name__ == "__main__":
    main()
