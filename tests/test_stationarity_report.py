"""q_stationarity_report must equal its constituents joined by hand,
and the ADF x KPSS quadrant must land the canonical verdicts on
series engineered into each cell."""

import os
import tempfile

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as entry
from chronoxtract_spark.operators.armodel import (
    adf_test,
    ess_autocorr,
    kpss_test,
)
from chronoxtract_spark.operators.structure import hurst_rs


def _verdict(a, s):
    if a is None or s is None:
        return None
    if a and s:
        return "stationary"
    if not a and not s:
        return "unit_root"
    if a and not s:
        return "trend_or_longmemory"
    return "inconclusive"


def test_matches_constituents_on_testdata(spark):
    sf = "/root/testdata/sf0.001"
    got = {r.conv_id: r.asDict()
           for r in entry.q_stationarity_report(spark, sf).collect()}
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select(
            F.col("user_id").cast("string").alias("conv_id"),
            F.col("event_id").cast("int").alias("turn_idx"),
            "ts",
            "value",
        )
    )
    adf = {r.conv_id: r for r in adf_test(ev).collect()}
    kp = {r.conv_id: r for r in kpss_test(ev).collect()}
    hu = {r.conv_id: r for r in hurst_rs(ev).collect()}
    es = {r.conv_id: r for r in ess_autocorr(ev).collect()}
    assert set(got) == set(adf) & set(kp)
    for k, row in got.items():
        assert row["adf_t"] == adf[k].t_stat
        assert row["kpss_eta"] == kp[k].eta
        assert row["hurst"] == (hu[k].hurst if k in hu else None)
        assert row["tau_int"] == (es[k].tau_int if k in es else None)
        assert row["verdict"] == _verdict(
            adf[k].stationary, kp[k].stationary
        ), (k, row["verdict"])


def test_quadrant_verdicts(spark):
    rng = np.random.default_rng(19)
    n = 1500
    series = {
        # iid noise: ADF rejects the unit root, KPSS accepts
        "noise": rng.normal(0, 5, n),
        # random walk: both tests agree on the unit root
        "walk": np.cumsum(rng.normal(0, 1, n)),
        # slow level cycle + fast noise: deviations mean-revert in a
        # few steps (ADF rejects) but the partial sums accumulate the
        # cycle (level-KPSS rejects) -> the contradiction cell
        "cycle": 40.0 * np.sin(2 * np.pi * np.arange(n) / n)
        + rng.normal(0, 5, n),
    }
    rows = [
        (i, k, float(v), j)
        for k, vals in series.items()
        for i, (j, v) in enumerate(enumerate(vals))
    ]
    rows = [(gi, k, v, ts) for gi, (i, k, v, ts) in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, value double, ts long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
        got = {r.conv_id: r
               for r in entry.q_stationarity_report(spark, tmp).collect()}
    assert got["noise"].verdict == "stationary", got["noise"]
    assert got["walk"].verdict == "unit_root", got["walk"]
    assert got["cycle"].verdict == "trend_or_longmemory", got["cycle"]
    # long-memory readings ride along and order correctly
    assert got["walk"].tau_int > got["noise"].tau_int
    assert got["walk"].hurst > got["noise"].hurst
