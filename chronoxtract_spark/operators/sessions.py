"""Inactivity-gap sessionization of transcript streams.

Splits each conversation's turn stream into sessions wherever the gap
between consecutive turns exceeds a threshold — the standard first
step for per-sitting analytics (session length/duration distributions,
turn cadence) over chat transcripts. The reference repo operates on a
single pre-extracted series and has no notion of sessions; this is
engine-native table machinery like the rollup tiers.

Spark-first shape: one window pass per conversation (a single shuffle
on ``conv_id``, the same partitioning every other per-conversation
operator uses, so it co-locates with them in a multi-stage plan):
``lag`` marks gap starts, a running ``sum`` over the marks numbers the
sessions — the textbook gaps-and-islands formulation, entirely
whole-stage-codegen column expressions (no UDF, no Python). Session
numbering is deterministic: ordering is by ``(ts, *order_cols)`` with
a unique tiebreaker column, so reruns and different partition layouts
produce identical session ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
    gap_s: int = 1800,
) -> DataFrame:
    """Add ``session_idx`` (0-based per conversation) and
    ``session_id`` (``conv_id/session_idx``) to every row.

    The window orders by the SAME floored-second value the gaps are
    measured in (plus the unique tiebreakers), not the raw sub-second
    timestamp — so same-second ties are ordered by the tiebreaker
    alone, identically in any engine that only has whole seconds
    (the ``turn_latency`` pattern). ``ts_col`` may be a timestamp or
    an already-floored numeric epoch column.
    """
    from pyspark.sql.types import NumericType

    if isinstance(df.schema[ts_col].dataType, NumericType):
        sec = F.col(ts_col).cast("long")
    else:
        sec = F.unix_timestamp(F.col(ts_col))
    d = df.withColumn("__sess_ts_s", sec)
    w = Window.partitionBy(conv_col).orderBy("__sess_ts_s", *order_cols)
    prev_s = F.lag(F.col("__sess_ts_s")).over(w)
    is_new = (
        prev_s.isNull() | (F.col("__sess_ts_s") - prev_s > gap_s)
    ).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (F.sum(is_new).over(run) - F.lit(1)).cast("long")
    out = d.withColumn("session_idx", sess).drop("__sess_ts_s")
    return out.withColumn(
        "session_id",
        F.concat_ws("/", F.col(conv_col), F.col("session_idx").cast("string")),
    )


def session_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
    gap_s: int = 1800,
) -> DataFrame:
    """Per-session aggregate row: turn count, start/end epoch seconds,
    duration. One extra partial-aggregated shuffle on the session key
    (which nests inside the conversation key, so with AQE it often
    collapses into the same exchange)."""
    s = sessionize(df, conv_col, ts_col, order_cols, gap_s)
    return s.groupBy(conv_col, "session_idx").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.min(F.unix_timestamp(F.col(ts_col))).alias("start_s"),
        F.max(F.unix_timestamp(F.col(ts_col))).alias("end_s"),
        (F.max(F.unix_timestamp(F.col(ts_col))) - F.min(F.unix_timestamp(F.col(ts_col))))
        .alias("duration_s"),
    )


def turn_latency(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    role_col: str = "role",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """Latency between consecutive turns, grouped by the role
    transition (prev_role -> role): count, mean, p50, p95 in seconds.

    The dialog-analytics staple ("how long until the assistant answers
    a user turn"), generalized over whatever the role column holds.
    Same single conv_id window pass as sessionize; the mean is the
    division of an exact int64 second-sum by the count (no float
    accumulation order to diverge between engines or partitionings).

    Ordering is by the SAME whole-second value the gaps are measured
    in (plus the unique tiebreakers), not the raw sub-second
    timestamp — so which transition a same-second tie pairs with is
    decided by the tiebreaker alone, identically in any engine that
    only has the floored seconds. ``ts_col`` may be a timestamp or an
    already-floored numeric epoch column.
    """
    from pyspark.sql.types import NumericType

    if isinstance(df.schema[ts_col].dataType, NumericType):
        sec = F.col(ts_col).cast("long")
    else:
        sec = F.unix_timestamp(F.col(ts_col))
    d = df.withColumn("_ts_s", sec)
    w = Window.partitionBy(conv_col).orderBy("_ts_s", *order_cols)
    lat = d.select(
        F.col(role_col).alias("role"),
        F.lag(F.col(role_col)).over(w).alias("prev_role"),
        (F.col("_ts_s") - F.lag(F.col("_ts_s")).over(w)).alias("gap_s"),
    ).where(F.col("prev_role").isNotNull())
    return lat.groupBy("prev_role", "role").agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.sum("gap_s").cast("double") / F.count("*").cast("double"), 6
        ).alias("mean_s"),
        F.round(F.percentile(F.col("gap_s"), F.lit(0.5)), 6).alias("p50_s"),
        F.round(F.percentile(F.col("gap_s"), F.lit(0.95)), 6).alias("p95_s"),
    )
