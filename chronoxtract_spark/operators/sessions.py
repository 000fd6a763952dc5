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
    ``session_id`` (``conv_id/session_idx``) to every row."""
    w = Window.partitionBy(conv_col).orderBy(ts_col, *order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_s)
    ).cast("int")
    run = Window.partitionBy(conv_col).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (F.sum(is_new).over(run) - F.lit(1)).alias("session_idx")
    out = df.withColumn("session_idx", sess)
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
