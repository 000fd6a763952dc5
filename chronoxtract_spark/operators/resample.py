"""Irregular-to-regular resampling: linear grid interpolation and
trapezoidal time-weighted averaging — the continuous-aggregate
primitives (TimescaleDB ``interpolate`` / ``time_weighted_average``
hyperfunction shapes) a time-series tier needs between raw irregular
events and the fixed 1m/1h/1d rollup tiers.

The reference repo's kernels all assume an already-regular series
(``SURVEY.md §2.5``); these operators PRODUCE that regular series from
irregular observations, so every downstream kernel (rolling windows,
FFT/Welch, STL) can run on event data without a bespoke gap story.

Scale shape
-----------
``interpolate_grid``: one shuffle on the series key. Grid instants are
generated per key with ``sequence()`` + ``explode`` (bounded by
span/step, independent of input row count), unioned with the
observations, and bracketed by one backward ``last(ignorenulls)`` and
one forward ``first(ignorenulls)`` window over the SAME key ordering —
no range join, no per-key blow-up, all whole-stage-codegen
expressions.

``time_weighted_avg``: one shuffle on the key. The trapezoid terms are
per-row expressions; the integral is taken as the LAST element of the
ordered prefix sum rather than a ``groupBy`` sum so the float
association order is pinned left-to-right... which window engines do
not actually guarantee (segment-tree association), hence the outputs
round to 6 decimals like every prefix-sum surface in this repo.

Oracle determinism
------------------
``interpolate_grid`` is bit-exact: bracketing is integer-microsecond
arithmetic, and the interpolated value is one division + one
multiply-add of doubles — the same IEEE expression tree in both
engines. Duplicate timestamps within a key are pre-collapsed to their
MIN value (pinned, documented) so bracketing is unambiguous. A grid
instant that coincides with an observation reproduces that observation
exactly (its bracket distance is 0, so the lerp degenerates to the
left value with no rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from chronoxtract_spark.operators._util import keylist as _keylist


def _grid_union(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    step_s: int,
):
    """Shared scaffold for grid resamplers: null-valued rows dropped
    up front (a null is no observation — carrying its timestamp into
    the bracket columns while ignorenulls skips its value would desync
    bracket time and bracket value), duplicate timestamps collapsed to
    their MIN value (pinned), per-key epoch-aligned grid instants via
    sequence()+explode bounded by the observed span, and the
    observation/grid union ordered so an observation sorts BEFORE a
    coinciding grid row. Returns the union frame
    ``keys..., t_us, is_grid, v``."""
    step_us = int(step_s) * 1_000_000
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))

    obs = (
        df.where(F.col(value_col).isNotNull())
        .select(*keys, t_us.alias("t_us"), F.col(value_col).alias("v"))
        .groupBy(*keys, "t_us")
        .agg(F.min("v").alias("v"))
    )

    # per-key grid: ceil(min) .. floor(max) in step_us multiples.
    # Exact integer DIV (epoch_us is positive, so truncation == floor
    # and the +step-1 trick gives ceil) — a double round-trip would
    # lose microsecond precision above 2^53.
    span = obs.groupBy(*keys).agg(
        F.min("t_us").alias("t_lo"), F.max("t_us").alias("t_hi")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(
                F.expr(f"((t_lo + {step_us - 1}) DIV {step_us}) * {step_us}"),
                F.expr(f"(t_hi DIV {step_us}) * {step_us}"),
                F.lit(step_us),
            )
        ).alias("t_us"),
    )
    return obs.select(
        *keys, "t_us", F.lit(0).alias("is_grid"), "v"
    ).unionByName(
        grid.select(*keys, "t_us", F.lit(1).alias("is_grid"),
                    F.lit(None).cast(obs.schema["v"].dataType).alias("v"))
    )



def interpolate_grid(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    value_col: str,
    step_s: int,
) -> DataFrame:
    """Resample an irregular series onto a regular ``step_s``-second
    grid by linear interpolation between the bracketing observations.

    Grid instants are the multiples of ``step_s`` (epoch-aligned)
    inside each key's observed span ``[min(ts), max(ts)]`` — every grid
    point therefore HAS both brackets, and no extrapolation is ever
    produced. Observations sharing a timestamp collapse to their
    minimum value first (deterministic pin).

    Returns one row per (key, grid instant): ``keys..., grid_ts,
    value``.
    """
    keys = _keylist(keys)
    # session TZ is UTC (session.py), so the NTZ->LTZ cast is identity
    u = _grid_union(df, keys, ts_col, value_col, step_s)
    w = Window.partitionBy(*keys).orderBy("t_us", "is_grid")
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    wf = w.rowsBetween(0, Window.unboundedFollowing)
    prev_t = F.last(F.when(F.col("is_grid") == 0, F.col("t_us")), True).over(wb)
    prev_v = F.last("v", True).over(wb)
    next_t = F.first(F.when(F.col("is_grid") == 0, F.col("t_us")), True).over(wf)
    next_v = F.first("v", True).over(wf)

    frac = (F.col("t_us") - F.col("tp")).cast("double") / (
        F.col("tn") - F.col("tp")
    ).cast("double")
    val = F.when(F.col("tp") == F.col("t_us"), F.col("vp")).otherwise(
        F.col("vp") + (F.col("vn") - F.col("vp")) * frac
    )
    return (
        u.select(
            *keys, "t_us", "is_grid",
            prev_t.alias("tp"), prev_v.alias("vp"),
            next_t.alias("tn"), next_v.alias("vn"),
        )
        .where(F.col("is_grid") == 1)
        .select(
            *keys,
            F.timestamp_micros(F.col("t_us")).alias("grid_ts"),
            val.alias("value"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    value_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Trapezoidal time-weighted average per key over the key's
    observed span: ``integral = sum (v_i + v_{i+1})/2 * dt_i`` with the
    row order pinned by ``(ts, *tie_cols)``, ``twa = integral /
    (t_last - t_first)``.

    Keys with a single observation (or zero span) return ``twa =
    value`` of the first pinned row and ``integral = 0`` — the
    point-mass convention TimescaleDB's ``time_weight('Linear')`` uses.

    Returns ``keys..., n_obs, duration_s, integral, twa``. The
    ``twa``/``duration_s`` columns round to 6 decimals; ``integral``
    rounds to 2 because its magnitude is ~duration x value (1e8 at one
    key-month of seconds) and association-order noise (~N*eps*mag)
    sits above the 6-decimal grid there (prefix-sum association order
    is engine-internal; see module docstring).
    """
    keys = _keylist(keys)
    tie_cols = tie_cols or []
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*keys).orderBy(ts_col, *tie_cols)

    base = df.select(*keys, F.col(ts_col), *tie_cols,
                     t_us.alias("t_us"), F.col(value_col).alias("v"))
    nxt_t = F.lead("t_us").over(w)
    nxt_v = F.lead("v").over(w)
    term = F.when(
        nxt_t.isNotNull(),
        (F.col("v") + nxt_v) * F.lit(0.5)
        * ((nxt_t - F.col("t_us")).cast("double") / F.lit(1e6)),
    ).otherwise(F.lit(0.0))

    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    stepped = base.select(
        *keys,
        F.col("t_us"),
        F.col("v"),
        F.row_number().over(w).alias("rn"),
        F.sum(term).over(wc).alias("cum"),
    )
    return (
        stepped.groupBy(*keys)
        .agg(
            F.max("rn").alias("n_obs"),
            ((F.max("t_us") - F.min("t_us")).cast("double") / F.lit(1e6))
            .alias("duration_s"),
            F.max_by("cum", "rn").alias("integral"),
            F.min_by("v", "rn").alias("v_first"),
        )
        .select(
            *keys,
            F.col("n_obs").cast("long").alias("n_obs"),
            F.round("duration_s", 6).alias("duration_s"),
            F.round("integral", 2).alias("integral"),
            F.round(
                F.when(F.col("duration_s") > 0,
                       F.col("integral") / F.col("duration_s"))
                .otherwise(F.col("v_first")),
                6,
            ).alias("twa"),
        )
    )


def locf_grid(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    value_col: str,
    step_s: int,
) -> DataFrame:
    """Last-observation-carried-forward resampling onto the same
    epoch-aligned grid ``interpolate_grid`` uses (TimescaleDB
    ``locf``): each grid instant takes the most recent observation at
    or before it. Same single-shuffle union + backward-ignorenulls
    window plan as the lerp variant — no forward pass needed, so it is
    strictly cheaper. Duplicate timestamps collapse to MIN value
    first (same pin); grid instants are bounded to the observed span,
    so a carried value always exists. Bit-exact by construction: the
    output IS an input value, no arithmetic at all.

    Returns ``keys..., grid_ts, value``.
    """
    keys = _keylist(keys)
    u = _grid_union(df, keys, ts_col, value_col, step_s)
    w = Window.partitionBy(*keys).orderBy("t_us", "is_grid")
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        u.select(
            *keys, "t_us", "is_grid",
            F.last("v", True).over(wb).alias("vp"),
        )
        .where(F.col("is_grid") == 1)
        .select(
            *keys,
            F.timestamp_micros(F.col("t_us")).alias("grid_ts"),
            F.col("vp").alias("value"),
        )
    )
