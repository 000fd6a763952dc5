"""Structural invariants of the round-4b batteries over a broad
randomized key population — one Spark pass per battery, 200 keys of
wildly varied shape (bursty, periodic, tiny, constant-value, heavy
duplicates), asserting the mathematical ranges every output row must
satisfy regardless of input."""

import math
import random

import pytest
from pyspark.sql import functions as F

from chronoxtract_spark.operators.cadence import interarrival_stats
from chronoxtract_spark.operators.divergence import slice_divergence
from chronoxtract_spark.operators.extremes import drawdown_stats
from chronoxtract_spark.operators.markov import transition_entropy
from chronoxtract_spark.operators.survival import survival_curve


@pytest.fixture(scope="module")
def zoo(spark):
    """200 keys spanning pathological shapes, one row per event."""
    rng = random.Random(20260818)
    rows = []
    for ki in range(200):
        shape = ki % 5
        n = rng.randrange(1, 40)
        t = rng.randrange(0, 10**6)
        for i in range(n):
            if shape == 0:  # bursty
                t += int(math.exp(rng.uniform(0, 8))) + 1
            elif shape == 1:  # periodic
                t += 600
            elif shape == 2:  # same-second ties
                t += rng.randrange(0, 2)
            else:
                t += rng.randrange(1, 5000)
            rows.append(
                (
                    f"k{ki}",
                    i,
                    t,
                    rng.choice("ABC"),
                    rng.choice([0.0, 1.25, -3.5, 100.0]),
                )
            )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, role string, value double"
    )
    df.cache()
    df.count()
    return df


def test_cadence_ranges(zoo):
    for r in interarrival_stats(zoo).collect():
        if r["burstiness"] is not None:
            assert -1.0 <= r["burstiness"] < 1.0
        if r["cv"] is not None:
            assert r["cv"] >= 0.0
        if r["memory_coef"] is not None:
            assert -1.0 - 1e-9 <= r["memory_coef"] <= 1.0 + 1e-9
        assert r["fano_hourly"] is not None and r["fano_hourly"] >= 0.0
        assert r["n_gaps"] == r["n_events"] - 1


def test_drawdown_ranges(zoo):
    for r in drawdown_stats(zoo).collect():
        assert r["max_drawdown"] >= 0.0
        assert 0 <= r["max_drawdown_len"] < r["n_obs"]
        assert 1 <= r["n_records"] <= r["n_obs"]
        assert r["peak_cum"] >= r["final_cum"]
        # peak - max_drawdown is the trough floor reached at least once
        assert r["peak_cum"] - r["max_drawdown"] <= r["final_cum"] + 1e-9


def test_markov_ranges(zoo):
    for r in transition_entropy(zoo).collect():
        assert r["entropy_rate_nats"] >= 0.0
        assert r["marginal_entropy_nats"] >= -1e-12
        # conditioning can't exceed the log alphabet size
        assert r["entropy_rate_nats"] <= math.log(3) + 1e-9
        assert r["marginal_entropy_nats"] <= math.log(
            r["n_from_states"]) + 1e-9
        assert 1 <= r["n_transitions"]


def test_survival_ranges(zoo):
    rows = sorted(
        survival_curve(zoo, censor_window_s=3600).collect(),
        key=lambda r: r["lifetime_s"],
    )
    assert rows
    prev_s, prev_n = 1.0 + 1e-12, None
    for r in rows:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev_s + 1e-9  # monotone nonincreasing
        assert r["n_deaths"] >= 1 and r["n_risk"] >= r["n_deaths"]
        if prev_n is not None:
            assert r["n_risk"] <= prev_n  # risk set shrinks
        prev_s, prev_n = r["survival"], r["n_risk"]
        assert r["greenwood_se"] >= 0.0


def test_divergence_ranges(zoo, spark):
    docs = zoo.select(
        F.col("role").alias("lang"),
        F.concat_ws(
            " ", F.col("conv_id"), F.col("role"),
            F.col("turn_idx").cast("string")
        ).alias("text"),
    )
    for r in slice_divergence(docs, vocab_k=25).collect():
        assert 0.0 <= r["jsd_nats"] <= math.log(2) + 1e-9
        assert 0.0 <= r["tv_dist"] <= 1.0 + 1e-9
        assert r["n_vocab"] <= 26  # closed support: k + <other>
        assert r["n_tokens"] > 0
