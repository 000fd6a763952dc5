"""Counter / state / heartbeat aggregates over irregular event
streams — the Prometheus-``rate`` / TimescaleDB-``counter_agg`` /
``state_agg`` / ``heartbeat_agg`` family, re-expressed as pure window
algebra (no UDF anywhere).

The reference repo analyzes a single regular series; an event engine
also has to answer "how much did this monotonic counter really
advance across resets", "how long was each entity in each state", and
"what fraction of the window was this stream alive" — the operational
triad every metrics tier serves.

Scale shape
-----------
Each operator is ONE shuffle on its series key followed by window /
aggregate expressions inside whole-stage codegen:

- ``counter_agg``: lag-delta per row, reset = negative delta (the
  counter restarted; the true advance is the new value), one
  aggregation over the adjusted deltas.
- ``state_durations``: each event opens a state interval closed by the
  entity's next event (``lead``); durations are exact integer
  microseconds, so every output is either an integer or a single
  division of exact integers — bit-exact across engines.
- ``heartbeat_agg``: classic gaps-and-islands on the liveness-extended
  stream: an island starts where the heartbeat arrives after the
  running ``max(ts + liveness)`` of all earlier heartbeats (cummax
  window, exact integers). Uptime is the summed island extent.

Oracle determinism
------------------
``state_durations`` and ``heartbeat_agg`` are exact integer arithmetic
end-to-end. ``counter_agg``'s reset count and extrema are exact; its
``total_delta`` is a float prefix sum (engine-internal association)
and rounds to 4 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from chronoxtract_spark.operators._util import keylist as _keylist


def counter_agg(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    value_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Monotonic-counter aggregation with reset detection (Prometheus
    ``increase`` / TimescaleDB ``counter_agg`` semantics): within each
    key, ordered by ``(ts, *tie_cols)``, a drop in the raw value is a
    counter reset, and the true advance of that step is the new value
    itself (the counter restarted from zero).

    Returns per key: ``n_obs``, ``n_resets``, ``total_delta`` (sum of
    reset-adjusted deltas, rounded to 4), ``first_value``,
    ``last_value``, ``max_value``.
    """
    keys = _keylist(keys)
    tie_cols = tie_cols or []
    w = Window.partitionBy(*keys).orderBy("_ts", *tie_cols)
    delta = F.col("v") - F.lag("v").over(w)
    adj = F.when(delta.isNull(), F.lit(0.0)).when(
        delta < 0, F.col("v")
    ).otherwise(delta)

    stepped = df.select(
        *keys, F.col(ts_col).alias("_ts"), *tie_cols,
        F.col(value_col).alias("v"),
    ).select(
        *keys,
        F.col("v"),
        F.row_number().over(w).alias("rn"),
        adj.alias("adj"),
        F.when(delta < 0, 1).otherwise(0).alias("is_reset"),
    )
    return (
        stepped.groupBy(*keys)
        .agg(
            F.max("rn").cast("long").alias("n_obs"),
            F.sum("is_reset").cast("long").alias("n_resets"),
            F.round(
                F.sum("adj"), 4
            ).alias("total_delta"),
            F.min_by("v", "rn").alias("first_value"),
            F.max_by("v", "rn").alias("last_value"),
            F.max("v").alias("max_value"),
        )
    )


def state_durations(
    df: DataFrame,
    entity_col: str,
    state_col: str,
    ts_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Time spent in each state (TimescaleDB ``state_agg``): each
    event puts its entity into ``state_col`` until the entity's next
    event. The entity's last event closes no interval (open-ended
    residence is not counted — the conservative convention).

    Returns per state: ``n_intervals``, ``total_s``, ``mean_s``,
    ``max_s`` — all exact integer-microsecond arithmetic (the ``_s``
    columns are single divisions of exact integers, bit-exact across
    engines).
    """
    tie_cols = tie_cols or []
    w = Window.partitionBy(entity_col).orderBy(ts_col, *tie_cols)
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    iv = (
        df.select(
            entity_col, F.col(state_col).alias("state"),
            F.col(ts_col), *tie_cols, t_us.alias("t_us"),
        )
        .withColumn("dur_us", F.lead("t_us").over(w) - F.col("t_us"))
        .where(F.col("dur_us").isNotNull())
    )
    return iv.groupBy("state").agg(
        F.count("*").cast("long").alias("n_intervals"),
        (F.sum("dur_us").cast("double") / F.lit(1e6)).alias("total_s"),
        (
            (F.sum("dur_us").cast("double") / F.count("*").cast("double"))
            / F.lit(1e6)
        ).alias("mean_s"),
        (F.max("dur_us").cast("double") / F.lit(1e6)).alias("max_s"),
    )


def heartbeat_agg(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    liveness_s: int,
) -> DataFrame:
    """Liveness accounting from heartbeats (TimescaleDB
    ``heartbeat_agg``): each event keeps its key "live" for
    ``liveness_s`` seconds; overlapping liveness intervals merge into
    islands. An island starts where a heartbeat arrives strictly after
    the running maximum of all earlier heartbeats' expiry.

    Returns per key: ``n_heartbeats``, ``n_live_segments``,
    ``uptime_s`` (summed island extent, last island credited its full
    trailing liveness), ``max_gap_s`` (longest dead stretch between
    islands, 0.0 for a single island) — all exact integer-microsecond
    arithmetic.
    """
    keys = _keylist(keys)
    live_us = int(liveness_s) * 1_000_000
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*keys).orderBy("t_us")
    # expiry of all STRICTLY EARLIER heartbeats
    prev_end = F.max(F.col("t_us") + live_us).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = df.select(*keys, t_us.alias("t_us")).select(
        *keys,
        "t_us",
        F.when(prev_end.isNull() | (F.col("t_us") > prev_end), 1)
        .otherwise(0)
        .alias("is_start"),
        (F.col("t_us") - prev_end).alias("gap_us"),
    )
    isl = marked.select(
        *keys, "t_us",
        F.when(F.col("is_start") == 1, F.col("gap_us")).alias("start_gap_us"),
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("island"),
    )
    per_island = isl.groupBy(*keys, "island").agg(
        F.count("*").alias("n_hb"),
        (F.max("t_us") + live_us - F.min("t_us")).alias("extent_us"),
        F.max("start_gap_us").alias("start_gap_us"),
    )
    return per_island.groupBy(*keys).agg(
        F.sum("n_hb").cast("long").alias("n_heartbeats"),
        F.count("*").cast("long").alias("n_live_segments"),
        (F.sum("extent_us").cast("double") / F.lit(1e6)).alias("uptime_s"),
        (
            F.coalesce(F.max("start_gap_us"), F.lit(0)).cast("double")
            / F.lit(1e6)
        ).alias("max_gap_s"),
    )
