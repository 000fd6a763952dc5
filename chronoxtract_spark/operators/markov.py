"""First-order Markov structure of per-key categorical sequences.

``transition_entropy`` treats each key's ordered state sequence (event
types, dialog roles, page ids...) as a first-order Markov chain and
reports, per key:

- ``n_transitions`` — N, the number of consecutive state pairs.
- ``n_from_states`` — distinct states that ever transition out.
- ``entropy_rate_nats`` — the conditional entropy
  H(X_t | X_{t-1}) = -sum_ij (c_ij / N) ln(c_ij / c_i.)
  of the empirical transition matrix: the per-step unpredictability
  AFTER seeing the previous state.
- ``marginal_entropy_nats`` — H(X) = -sum_i (c_i. / N) ln(c_i. / N)
  of the same conditioning marginal.
- ``predictability_gain_nats`` — their difference: how many nats the
  previous state buys you (0 for an i.i.d. stream; equals the full
  marginal entropy for a deterministic cycle).

Complements the cadence battery (operators/cadence.py): cadence
characterizes WHEN events arrive, this characterizes WHAT follows
what. The reference's entropy family (sample/approximate/permutation,
src/entropy/mod.rs) works on one numeric series; this is its
engine-native categorical-stream counterpart over the keyed table.

Exactness: every probability is a ratio of int64 counts, and both
entropy sums are sequential left folds over arrays sorted by state
label — the same sorted-array-fold contract the energy/quantile
oracles use — so a DuckDB oracle folding the identically-ordered term
lists matches bit-for-bit before round(6). No float whose value
depends on partitioning exists anywhere in the plan.

Spark-first shape: one lag window per key (the shared key shuffle),
then a (key, from, to) count groupBy, a nested (key, from) rollup, a
broadcast-friendly per-key join, and one final groupBy whose
collect_list feeds the sorted folds. All built-ins, no UDF; every
aggregation partial-aggregates map-side. State cardinality per key is
the only memory dimension (vocabulary-bounded, not stream-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._util import epoch_seconds


def transition_entropy(
    df: DataFrame,
    key_col: str = "conv_id",
    state_col: str = "role",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
    round_digits: int | None = 6,
) -> DataFrame:
    d = df.select(
        F.col(key_col).alias("_k"),
        F.col(state_col).cast("string").alias("_st"),
        epoch_seconds(df, ts_col).alias("_s"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    trans = d.select(
        "_k",
        F.lag("_st").over(w).alias("_from"),
        F.col("_st").alias("_to"),
    ).where(F.col("_from").isNotNull())

    cij = trans.groupBy("_k", "_from", "_to").agg(
        F.count("*").cast("long").alias("c")
    )
    ci = cij.groupBy("_k", "_from").agg(F.sum("c").cast("long").alias("ci"))
    n = ci.groupBy("_k").agg(F.sum("ci").cast("long").alias("n"))

    # conditional-entropy terms c_ij * ln(c_ij / c_i.), folded in
    # (from, to) label order
    tij = cij.join(ci, ["_k", "_from"]).select(
        "_k",
        "_from",
        "_to",
        (
            F.col("c").cast("double")
            * F.log(F.col("c").cast("double") / F.col("ci").cast("double"))
        ).alias("term"),
    )
    hcond = tij.groupBy("_k").agg(
        F.array_sort(
            F.collect_list(F.struct("_from", "_to", "term"))
        ).alias("arr")
    ).select(
        "_k",
        F.aggregate(
            "arr", F.lit(0.0), lambda acc, x: acc + x["term"]
        ).alias("sum_cond"),
    )

    # marginal terms c_i. * ln(c_i. / N), folded in label order
    ti = ci.join(n, "_k").select(
        "_k",
        "_from",
        (
            F.col("ci").cast("double")
            * F.log(F.col("ci").cast("double") / F.col("n").cast("double"))
        ).alias("term"),
    )
    hmarg = ti.groupBy("_k").agg(
        F.count("*").cast("long").alias("n_from_states"),
        F.array_sort(F.collect_list(F.struct("_from", "term"))).alias("arr"),
    ).select(
        "_k",
        "n_from_states",
        F.aggregate(
            "arr", F.lit(0.0), lambda acc, x: acc + x["term"]
        ).alias("sum_marg"),
    )

    j = n.join(hcond, "_k").join(hmarg, "_k")
    nd = F.col("n").cast("double")
    hc = -F.col("sum_cond") / nd
    hm = -F.col("sum_marg") / nd

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return j.select(
        F.col("_k").alias(key_col),
        F.col("n").alias("n_transitions"),
        "n_from_states",
        rnd(hc).alias("entropy_rate_nats"),
        rnd(hm).alias("marginal_entropy_nats"),
        rnd(hm - hc).alias("predictability_gain_nats"),
    )
