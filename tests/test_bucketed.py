"""Tests: bucketed tables eliminate the join/agg shuffle on the
bucket key — the storage-side scale mechanism for co-located joins."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    from chronoxtract_spark.sources.bucketed import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    left = spark.range(0, 2000).select(
        (F.col("id") % 50).cast("string").alias("conv_id"),
        F.col("id").alias("turn_idx"),
    )
    right = spark.range(0, 50).select(
        F.col("id").cast("string").alias("conv_id"),
        (F.col("id") * 10).alias("weight"),
    )
    write_bucketed(left, "cx_test_turns", "conv_id", 8,
                   sort_cols=["conv_id"])
    write_bucketed(right, "cx_test_convs", "conv_id", 8,
                   sort_cols=["conv_id"])
    yield "cx_test_turns", "cx_test_convs"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS cx_test_turns")
    spark.sql("DROP TABLE IF EXISTS cx_test_convs")


class TestBucketed:
    def test_bucket_join_has_zero_exchanges(self, spark, bucketed_pair):
        from chronoxtract_spark.sources.bucketed import (
            count_exchanges, read_table,
        )

        t, c = bucketed_pair
        joined = read_table(spark, t).join(read_table(spark, c), "conv_id")
        assert count_exchanges(joined) == 0
        assert joined.count() == 2000

        # the same join on plain parquet DOES shuffle — the comparison
        # that proves the bucketing (not AQE luck) removed it
        plain_l = read_table(spark, t).repartition(4)
        plain_r = read_table(spark, c).repartition(4)
        assert count_exchanges(plain_l.join(plain_r, "conv_id")) > 0

    def test_bucket_groupby_has_zero_exchanges(self, spark, bucketed_pair):
        from chronoxtract_spark.sources.bucketed import (
            count_exchanges, read_table,
        )

        t, _ = bucketed_pair
        agg = read_table(spark, t).groupBy("conv_id").agg(
            F.count("*").alias("n")
        )
        assert count_exchanges(agg) == 0
        assert agg.count() == 50

    def test_join_results_match_unbucketed(self, spark, bucketed_pair):
        from chronoxtract_spark.sources.bucketed import read_table

        t, c = bucketed_pair
        got = (
            read_table(spark, t).join(read_table(spark, c), "conv_id")
            .groupBy("conv_id").agg(F.sum("weight").alias("w"))
        )
        rows = {r.conv_id: r.w for r in got.collect()}
        # every conv has 40 turns, weight = conv*10 each
        assert rows["7"] == 40 * 70
        assert len(rows) == 50
