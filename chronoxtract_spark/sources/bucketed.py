"""Bucketed-table support: pre-shuffle a table ONCE at write time so
every later join or aggregation on the bucket key runs with ZERO
exchanges — the storage-side answer to the repo's salted-repartition
runtime answer for the same 100 TB problem. At cluster scale, a
conv_id-bucketed transcript table turns the nightly
rollup-join-lineage pipeline's biggest shuffle into a local sort.

Spark only honors bucket metadata through the catalog
(``saveAsTable``), not path-based parquet — that is Spark's design,
not this repo's: bucket specs live in table metadata exactly like
Iceberg's bucket partition transform. In this sandbox the session
catalog is in-memory, so bucket metadata lives for the session; a
real deployment points the same calls at a Hive metastore or an
Iceberg catalog (``bucket(N, conv_id)`` transform) and the write code
is unchanged. The plan-shape test (zero Exchange on a bucket-key
join) exercises the exact mechanism a cluster relies on.

Correct bucketed writes REQUIRE one shuffle at write time: without
``repartition(n, key)``, every input task writes its own file per
bucket (file explosion) and reads lose the one-file-per-bucket
assumption that lets Spark skip the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog table bucketed by ``bucket_col`` into
    ``n_buckets`` (optionally sorted within buckets so merge joins
    skip the sort too). One repartition on the bucket key keeps it to
    one file per bucket per partition-write."""
    writer = (
        df.repartition(int(n_buckets), bucket_col)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(int(n_buckets), bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata rides along)."""
    return spark.table(table)


def count_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the executed plan —
    the assertion surface for bucketed-join tests and audits.
    BroadcastExchange and ReusedExchange are excluded: a broadcast
    ships no shuffle, so counting it would fail a ==0 assertion on a
    genuinely shuffle-free bucketed join whenever Spark picks a
    broadcast strategy."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines()
        if "Exchange" in line
        and "ReusedExchange" not in line
        and "BroadcastExchange" not in line
    )
