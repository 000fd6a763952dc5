"""Seasonal-profile baselining: learn the hour-of-day (or any cyclic
slot) profile of a count series and score each observation against
its slot — the "is Tuesday 3pm unusually quiet for a Tuesday 3pm"
operator every alerting tier runs. This is the cheap periodic
baseline that complements the repo's STL decomposition
(kernel/seasonality.py): no trend model, just slot statistics —
robust, exact, and embarrassingly parallel.

Scale shape: ONE (key, slot) aggregation for the profile (map-side
combinable exact integer sums), then the slot profile joins back on
the SAME (key, slot) grouping — co-located, no extra exchange beyond
the count build. Scoring is a per-row expression.

Oracle determinism: inputs are integer counts, so slot mean and
population std are single float chains over exact integers; the
z-score adds one subtraction and division — identical IEEE trees in
both engines, bit-exact, no rounding. Zero-variance slots yield null
z (pinned) and are never flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronoxtract_spark.operators._util import keylist as _keylist


def seasonal_profile(
    counts: DataFrame,
    keys: list[str] | str,
    slot_col: str,
    value_col: str,
) -> DataFrame:
    """Per (key, slot): observation count, exact mean, population std
    of ``value_col``. Returns ``keys..., slot, n_obs, mean, std``."""
    keys = _keylist(keys)
    v = F.col(value_col).cast("double")
    g = counts.groupBy(*keys, F.col(slot_col).alias("slot")).agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
    )
    n = F.col("n_obs").cast("double")
    mean = F.col("s1") / n
    std = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / n) / n)
    return g.select(
        *keys, "slot", "n_obs", mean.alias("mean"), std.alias("std")
    )


def seasonal_anomalies(
    counts: DataFrame,
    keys: list[str] | str,
    slot_col: str,
    order_col: str,
    value_col: str,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Observations whose value deviates more than ``z_threshold``
    population standard deviations from THEIR OWN slot's profile.
    The profile is learned from the same input (self-baselining — the
    standard first-pass; exclude-self refinements change little at
    30+ observations per slot and cost a second pass).

    Returns ``keys..., slot, order_col, value, slot_mean, slot_std,
    z`` for flagged rows only; zero-variance slots never flag.
    """
    keys = _keylist(keys)
    prof = seasonal_profile(counts, keys, slot_col, value_col)
    v = F.col(value_col).cast("double")
    joined = counts.select(
        *keys, F.col(slot_col).alias("slot"), F.col(order_col), v.alias("v")
    ).join(prof, [*keys, "slot"])
    z = F.when(
        F.col("std") > 0, (F.col("v") - F.col("mean")) / F.col("std")
    )
    return (
        joined.withColumn("z", z)
        .where(F.abs(F.col("z")) > F.lit(float(z_threshold)))
        .select(
            *keys, "slot", order_col,
            F.col("v").alias("value"),
            F.col("mean").alias("slot_mean"),
            F.col("std").alias("slot_std"),
            "z",
        )
    )
