"""spark-submit entry point for table maintenance: small-file
compaction + retention expiry, the operational loop a deployed rollup
warehouse runs between ingest jobs.

    spark-submit --master <cluster> \
        --py-files chronoxtract_spark.zip \
        jobs/maintenance_submit.py \
        --warehouse <tier table root> \
        [--compact rollup_1m rollup_1h ...] \
        [--target-file-mb 128] [--min-files 4] \
        [--retention rollup_1m=2026-01-15 ...]

Same ship shape as jobs/rollup_submit.py: cluster topology comes from
spark-submit conf, the engine imports from the --py-files zip, and the
job emits ONE JSON line (per-table compaction stats + expired
partitions) so an orchestrator can assert on it. Compaction is safe to
run any time between rollup runs — lineage checksums are
file-layout-free (bit_xor row hashes), proven by
tests/test_compaction.py — so this job needs no coordination with the
ingest job beyond not running concurrently on the same table.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--backend", choices=("parquet", "iceberg"),
                   default="parquet")
    p.add_argument("--compact", nargs="*", default=[],
                   metavar="TABLE",
                   help="tables to compact (partitioned by day)")
    p.add_argument("--part-col", default="day")
    p.add_argument("--target-file-mb", type=int, default=128)
    p.add_argument("--min-files", type=int, default=4)
    p.add_argument("--retention", action="append", default=[],
                   metavar="TIER=CUTOFF")
    return p.parse_args(argv)


def main(argv=None, *, stop_session: bool = True) -> int:
    """``stop_session=False`` lets tests drive the job in-process
    against a shared SparkSession (the submit path owns and stops its
    own session)."""
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("chronoxtract_maintenance").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("WARN")

    from chronoxtract_spark.sources import tableio

    if args.backend == "iceberg":
        io = tableio.IcebergBackend(spark, args.warehouse)
    else:
        io = tableio.ParquetBackend(spark, args.warehouse)

    compacted = {}
    for table in args.compact:
        if not io.exists(table):
            compacted[table] = {"skipped": "absent"}
            continue
        stats = io.compact_partitions(
            table,
            args.part_col,
            target_file_bytes=args.target_file_mb << 20,
            min_files=args.min_files,
        )
        compacted[table] = {
            "partitions_rewritten": len(stats),
            "files_before": sum(s["files_before"] for s in stats),
            "files_after": sum(s["files_after"] for s in stats),
            "bytes": sum(s["bytes"] for s in stats),
        }

    expired = {}
    if args.retention:
        from chronoxtract_spark.plans.rollup import RollupEngine

        policy = {}
        for spec in args.retention:
            tier, _, cutoff = spec.partition("=")
            if not cutoff:
                raise SystemExit(f"--retention wants TIER=CUTOFF, got {spec!r}")
            policy[tier] = cutoff
        eng = RollupEngine(spark, io)
        expired = eng.apply_retention(policy)

    print(json.dumps({
        "compacted": compacted,
        "expired_partitions": {k: len(v) for k, v in expired.items()},
    }))
    if stop_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
