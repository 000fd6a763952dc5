"""Time-decay (irregular-interval) exponential moving average as pure
window algebra — a sequential recurrence made embarrassingly
distributable with no UDF.

The recurrence (per series, rows ordered by time)::

    a_i = 1 - exp(-dt_i / tau)          (a_1 = 1)
    y_i = (1 - a_i) * y_{i-1} + a_i * x_i

looks inherently sequential, but its decay factor telescopes:
``prod_{k=j+1..n} exp(-dt_k/tau) = exp(-(t_n - t_j)/tau)``, giving the
closed form ``y_n = exp(-t_n/tau) * sum_{j<=n} a_j x_j exp(t_j/tau)``
— an attenuated prefix sum. Applied naively that overflows once a
series spans more than ~700 time constants (``exp(709)`` is the double
ceiling), so the operator runs it BLOCKED:

1. Rows are bucketed into per-series time blocks of width ``45 * tau``
   (block index from exact integer-microsecond arithmetic). Within a
   block, times rebase to the block start, so every ``exp`` argument is
   in [0, 45] — no overflow at ANY series span.
2. ``y_local`` (the within-block part of y) is the attenuated prefix
   sum over one (series, block) window.
3. The cross-block carry is the block-level recurrence
   ``y_end(b) = L_b + exp(-gap/tau) * y_end(b-1)``. Because two blocks
   that are >= 2 indices apart are >= 45*tau apart in time, the chain
   is SHORT-RANGE: a 2-lag unroll of the block summary table captures
   every contribution down to a relative ``e^-45`` (~3e-20, two orders
   below double epsilon) — the same information the sequential
   recurrence itself loses to rounding. No recursion, no iteration:
   one window over the (tiny) per-block summary, one key-aligned join
   back.

Total cost: one shuffle on the series key for the row windows, a
block-summary aggregation that is ~(span / 45 tau) rows per series,
and a same-key join. Everything is built-in expressions inside
whole-stage codegen.

Determinism: rows order by (ts, tie columns); a row at dt = 0 from its
predecessor has weight exactly 0 (the recurrence ignores it), so only
ties at a series' FIRST timestamp need the pinned ordering at all.
An oracle can restate the semantics with the UNBLOCKED closed form
whenever its span/tau stays under ~700 — agreement then checks the
blocked decomposition against an independent formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: block width in units of tau: exp arguments stay <= _BLOCK_TAUS and
#: skipping a whole block decays by at least exp(-_BLOCK_TAUS)
_BLOCK_TAUS = 45


def ewma_irregular(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    value_col: str,
    tau_s: float,
    out_col: str = "ewma",
    tie_cols: list[str] | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """Append ``out_col``: the irregular-interval EWMA of ``value_col``
    with time constant ``tau_s`` seconds, per ``keys`` series, in time
    order. ``tie_cols`` pins ordering among identical timestamps
    (defaults to ``value_col``). ``round_digits`` rounds the output
    (None to disable) — the prefix sums are mathematically exact but
    their float association order is engine-internal, so cross-engine
    comparisons need a rounding coarser than the last ulp."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    tie = tie_cols if tie_cols is not None else [value_col]
    order = [F.col("_cx_tu").asc()] + [F.col(c).asc() for c in tie]
    tau = float(tau_s)
    w_series = Window.partitionBy(*keys).orderBy(*order)
    w_u = int(round(_BLOCK_TAUS * tau * 1_000_000))

    tu = F.unix_micros(F.col(ts_col).cast("timestamp"))
    staged = df.withColumn("_cx_tu", tu)
    # block index and block-rebased seconds, from exact integer micros
    d0 = F.col("_cx_tu") - F.first("_cx_tu").over(w_series)
    staged = staged.withColumn(
        "_cx_blk", F.floor(d0 / F.lit(w_u)).cast("long")
    ).withColumn("_cx_d0", d0)
    tb = (F.col("_cx_d0") - F.col("_cx_blk") * F.lit(w_u)) / F.lit(1e6)
    dt = (F.col("_cx_tu") - F.lag("_cx_tu").over(w_series)) / F.lit(1e6)
    a = F.when(
        F.lag("_cx_tu").over(w_series).isNull(), F.lit(1.0)
    ).otherwise(F.lit(1.0) - F.exp(-dt / F.lit(tau)))
    staged = staged.withColumn("_cx_tb", tb).withColumn(
        "_cx_term", a * F.col(value_col) * F.exp(tb / F.lit(tau))
    )
    # within-block attenuated prefix sum
    w_blk = Window.partitionBy(*keys, "_cx_blk").orderBy(*order)
    s_blk = w_blk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = staged.withColumn(
        "_cx_ylocal",
        F.exp(-F.col("_cx_tb") / F.lit(tau))
        * F.sum("_cx_term").over(s_blk),
    )
    # block summary: last row's (end time, local y) per (series, block)
    w_blk_full = w_blk.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    summary = (
        staged.withColumn("_cx_tuE", F.last("_cx_tu").over(w_blk_full))
        .withColumn("_cx_L", F.last("_cx_ylocal").over(w_blk_full))
        .select(*keys, "_cx_blk", "_cx_tuE", "_cx_L")
        .dropDuplicates(keys + ["_cx_blk"])
    )
    # 2-lag unroll of the block chain (error <= ~e^-45, see module doc)
    w_chain = Window.partitionBy(*keys).orderBy("_cx_blk")

    def _decay_to(prev_tu):
        return F.exp(
            -((F.col("_cx_tuE") - prev_tu) / F.lit(1e6)) / F.lit(tau)
        )

    yend = (
        F.col("_cx_L")
        + F.coalesce(
            _decay_to(F.lag("_cx_tuE", 1).over(w_chain))
            * F.lag("_cx_L", 1).over(w_chain),
            F.lit(0.0),
        )
        + F.coalesce(
            _decay_to(F.lag("_cx_tuE", 2).over(w_chain))
            * F.lag("_cx_L", 2).over(w_chain),
            F.lit(0.0),
        )
    )
    chain = (
        summary.withColumn("_cx_yend", yend)
        .withColumn("_cx_prev_tuE", F.lag("_cx_tuE", 1).over(w_chain))
        .withColumn("_cx_prev_yend", F.lag("_cx_yend", 1).over(w_chain))
        .select(*keys, "_cx_blk", "_cx_prev_tuE", "_cx_prev_yend")
    )
    # carry: everything before this block arrives through the previous
    # block's end state, decayed by the actual time gap (Markov)
    carry = F.coalesce(
        F.exp(
            -(
                (F.col("_cx_tu") - F.col("_cx_prev_tuE")) / F.lit(1e6)
            )
            / F.lit(tau)
        )
        * F.col("_cx_prev_yend"),
        F.lit(0.0),
    )
    y = F.col("_cx_ylocal") + carry
    if round_digits is not None:
        y = F.round(y, round_digits)
    out = staged.join(chain, keys + ["_cx_blk"], "left").withColumn(
        out_col, y
    )
    return out.drop(
        "_cx_tu", "_cx_d0", "_cx_blk", "_cx_tb", "_cx_term",
        "_cx_ylocal", "_cx_prev_tuE", "_cx_prev_yend",
    )
