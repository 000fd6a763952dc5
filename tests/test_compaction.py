"""Partition compaction: file counts drop, content is bit-identical,
committed lineage checksums stay valid verbatim, and resume still
skips compacted partitions."""

import os

from pyspark.sql import functions as F

from chronoxtract_spark.plans.rollup import LINEAGE_TABLE, RollupEngine
from chronoxtract_spark.sources.tableio import temp_warehouse
from chronoxtract_spark.synth import synth_transcripts


def _content_hash(df):
    cols = ", ".join(sorted(df.columns))
    return df.agg(F.expr(f"bit_xor(xxhash64({cols}))")).collect()[0][0]


def test_backend_compaction_preserves_content(spark):
    io = temp_warehouse(spark)
    rows = [(f"d{j % 3}", i * 3 + j, float(i + j)) for i in range(40)
            for j in range(3)]
    df = spark.createDataFrame(rows, "day string, k long, v double")
    # 6 fragmented appends -> many small files per partition
    for i in range(6):
        io.append(df.where(F.col("k") % 6 == i), "t", partition_by=["day"])
    before = io.file_stats("t", "day")
    assert all(n >= 6 for n, _ in before.values())
    h0 = _content_hash(io.read("t"))
    snap0 = io.snapshot_id("t")

    stats = io.compact_partitions("t", "day", target_file_bytes=1 << 30)
    assert {s["value"] for s in stats} == set(before)
    after = io.file_stats("t", "day")
    for s in stats:
        assert s["files_after"] == 1 and s["files_before"] >= 6
        assert after[s["value"]][0] == 1
    # content identical, manifest (snapshot id) moved
    assert _content_hash(io.read("t")) == h0
    assert io.snapshot_id("t") != snap0
    # partition layout intact: pruning read still works
    one = io.read("t").where(F.col("day") == "d1")
    assert one.count() == 40
    # re-compacting is a no-op (already 1 file < min_files)
    assert io.compact_partitions("t", "day", target_file_bytes=1 << 30) == []
    io.drop("t")


def test_min_files_floor_skips(spark):
    io = temp_warehouse(spark)
    df = spark.createDataFrame([("a", 1)], "day string, k long")
    io.append(df, "t1", partition_by=["day"])
    assert io.file_stats("t1", "day")["a"][0] >= 1
    assert io.compact_partitions("t1", "day") == []  # below min_files
    io.drop("t1")


def test_rollup_lineage_survives_compaction(spark):
    io = temp_warehouse(spark)
    eng = RollupEngine(spark, io)
    eng.run(synth_transcripts(spark, 20, seed=7), source_snapshot="v1")

    lineage = {
        (r["tier"], r["partition_key"]): (r["row_count"], r["checksum"])
        for r in io.read(LINEAGE_TABLE).collect()
    }
    stats = io.compact_partitions(
        "rollup_1m", "day", target_file_bytes=1 << 30, min_files=1
    )
    # recomputed per-day checksums must equal the committed lineage
    # rows — via BOTH audit paths: the thin persisted row_hash column
    # and a full recomputation from the data columns (day hashed as
    # its epoch-day integer, the engine's canonical hash order)
    t = io.read("rollup_1m")
    from chronoxtract_spark.plans.rollup import _day_hash_term
    cols = ", ".join(
        _day_hash_term(c)
        for c in sorted(c for c in t.columns if c != "row_hash")
    )
    got = {
        r["day"]: (r["n"], r["chk"])
        for r in t.groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr(f"bit_xor(xxhash64({cols}))").alias("chk"),
        )
        .collect()
    }
    thin = {
        r["day"]: (r["n"], r["chk"])
        for r in t.groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.bit_xor("row_hash").alias("chk"),
        )
        .collect()
    }
    assert thin == got
    days = [d for (tier, d) in lineage if tier == "rollup_1m"]
    assert days and got
    for d in days:
        assert got[d] == lineage[("rollup_1m", d)], d
    # resume after compaction: lineage still matches, so a rerun of the
    # same snapshot does no tier work
    counts = eng.run(synth_transcripts(spark, 20, seed=7), source_snapshot="v1")
    assert all(v == 0 for v in counts.values()), counts
    if stats:
        assert all(s["files_after"] <= s["files_before"] for s in stats)


def test_maintenance_job_inprocess(spark, capsys):
    """jobs/maintenance_submit.py wiring: compaction stats + retention
    expiry emitted as one JSON line (the submit zip mechanics are
    exercised by tests/test_spark_submit.py on the rollup job)."""
    import json

    from jobs.maintenance_submit import main

    io = temp_warehouse(spark)
    rows = [(f"2026-01-{d:02d}", i, float(i)) for d in (1, 2) for i in range(30)]
    df = spark.createDataFrame(rows, "day string, k long, v double")
    for i in range(5):
        io.append(df.where(F.col("k") % 5 == i), "rollup_1m",
                  partition_by=["day"])
    assert all(n >= 5 for n, _ in io.file_stats("rollup_1m", "day").values())

    rc = main(
        [
            "--warehouse", io.root,
            "--compact", "rollup_1m", "ghost_table",
            "--target-file-mb", "1024",
            "--min-files", "2",
            "--retention", "rollup_1m=2026-01-02",
        ],
        stop_session=False,
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    c = out["compacted"]["rollup_1m"]
    assert c["partitions_rewritten"] == 2
    assert c["files_after"] < c["files_before"]
    assert out["compacted"]["ghost_table"] == {"skipped": "absent"}
    # retention expired the pre-cutoff day; the kept day still reads
    assert out["expired_partitions"]["rollup_1m"] == 1
    assert io.list_partitions("rollup_1m", "day") == ["2026-01-02"]
    assert io.read("rollup_1m").count() == 30
