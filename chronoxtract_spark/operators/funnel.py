"""Ordered-funnel analysis over event streams: how many entities
completed step 1, then step 2 STRICTLY AFTER their step-1 time, then
step 3 after that — the product-analytics primitive (the
match_recognize / windowFunnel shape) an event tier serves constantly.

Scale shape: ONE shuffle on the entity key. Step times resolve as
chained conditional window minima over the same entity partition —
``t_k = min(ts where type = step_k and ts > t_{k-1})`` — so k steps
are k window passes with no self-joins and no per-entity explosion
(the naive k-way self-join is quadratic under hot entities). The
final per-step rollup is a driver-sized aggregation.

Oracle determinism: step times are exact integer microseconds
(min over ints), reach counts are exact, and the mean seconds-to-step
is one division of exact integer sums. Strictly-greater chaining is
pinned (a same-microsecond repeat of the next step does NOT count —
documented; ties in real streams are sub-microsecond-rare and the pin
keeps both engines identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Per funnel step: entities reaching it (in order, strictly
    increasing timestamps), conversion from step 1, and the mean
    seconds from the entity's step-1 time.

    Returns one row per step: ``step (1-based), event_type, n_reached,
    conversion, mean_s_from_first`` (``conversion`` = n_reached /
    n_reached(step 1); step 1's mean is 0).
    """
    if len(steps) < 2:
        raise ValueError("need at least 2 steps")
    wp = Window.partitionBy("ent")
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cur = df.select(
        F.col(entity_col).alias("ent"),
        F.col(type_col).alias("typ"),
        t_us.alias("t_us"),
    )
    prev = None
    for i, s in enumerate(steps, 1):
        cond = F.col("typ") == s
        if prev is not None:
            cond = cond & (F.col("t_us") > F.col(prev))
        cur = cur.withColumn(
            f"t{i}", F.min(F.when(cond, F.col("t_us"))).over(wp)
        )
        prev = f"t{i}"

    per_ent = cur.groupBy("ent").agg(
        *[F.max(f"t{i}").alias(f"t{i}") for i in range(1, len(steps) + 1)]
    )
    step_aggs = per_ent.agg(
        *[
            F.count(f"t{i}").cast("long").alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ],
        *[
            F.sum(F.col(f"t{i}") - F.col("t1")).alias(f"d{i}")
            for i in range(1, len(steps) + 1)
        ],
    )
    rows = []
    for i, s in enumerate(steps, 1):
        rows.append(
            F.struct(
                F.lit(i).cast("long").alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"n{i}").alias("n_reached"),
                (F.col(f"n{i}").cast("double")
                 / F.col("n1").cast("double")).alias("conversion"),
                (F.col(f"d{i}").cast("double")
                 / F.col(f"n{i}").cast("double") / F.lit(1e6))
                .alias("mean_s_from_first"),
            )
        )
    return step_aggs.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.*")
