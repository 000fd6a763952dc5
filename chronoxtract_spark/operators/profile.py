"""Table profiling: per-column null counts, exact distinct counts,
min/max, and a type-appropriate mean — the data-quality snapshot every
ingestion tier runs before trusting a new drop (the Deequ/
great-expectations "profile" shape, exact rather than sketched).

Scale shape: ONE aggregation pass over the table producing a single
row (count/sum/min/max are map-side-combinable; the exact distinct
counts expand internally — that is the stated cost of an EXACT
profile; swap in approx_count_distinct when a sketch is acceptable),
then a ``stack()`` unpivot of that one row into per-column rows —
driver-sized, zero extra scans.

Oracle determinism: counts and distincts are exact integers; min/max
are exact values rendered as strings (numeric renderings are pinned
by explicit casts); string means are averages of exact integer
lengths (single division); double means round to 6 (association
order). Nulls sort out of min/max identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType,
    StringType,
)

_INT_TYPES = (ByteType, ShortType, IntegerType, LongType)


def profile_table(
    df: DataFrame, columns: list[str] | None = None, preview_chars: int = 40
) -> DataFrame:
    """One profile row per column: ``column, n_rows, n_null,
    n_distinct, min_str, max_str, mean``.

    ``min_str``/``max_str`` are the extreme values rendered as strings
    (strings truncated to ``preview_chars``; integers rendered
    exactly; doubles via explicit double->string cast). ``mean`` is
    the average of the value for numeric columns (exact for integers,
    rounded to 6 for doubles) and the average LENGTH for string
    columns; non-numeric non-string columns profile counts only.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    columns = list(columns) if columns is not None else list(schema)
    aggs = [F.count("*").cast("long").alias("_n_rows")]
    for c in columns:
        dt = schema[c]
        col = F.col(c)
        aggs.append(
            (F.count("*") - F.count(col)).cast("long").alias(f"_null_{c}")
        )
        aggs.append(F.count_distinct(col).cast("long").alias(f"_dist_{c}"))
        if isinstance(dt, StringType):
            render_min = F.substring(F.min(col), 1, preview_chars)
            render_max = F.substring(F.max(col), 1, preview_chars)
            mean = F.avg(F.length(col))
        elif isinstance(dt, _INT_TYPES):
            render_min = F.min(col).cast("string")
            render_max = F.max(col).cast("string")
            mean = F.avg(col.cast("double"))
        elif isinstance(dt, (DoubleType, FloatType)):
            render_min = F.min(col).cast("string")
            render_max = F.max(col).cast("string")
            mean = F.round(F.avg(col.cast("double")), 6)
        else:
            render_min = F.min(col).cast("string")
            render_max = F.max(col).cast("string")
            mean = F.lit(None).cast("double")
        aggs.append(render_min.alias(f"_min_{c}"))
        aggs.append(render_max.alias(f"_max_{c}"))
        aggs.append(mean.cast("double").alias(f"_mean_{c}"))

    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}, _min_{c}, _max_{c}, _mean_{c}"
        for c in columns
    )
    return one.select(
        F.expr(
            f"stack({len(columns)}, {stacked}) AS "
            "(column, n_null, n_distinct, min_str, max_str, mean)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_null", "n_distinct",
        "min_str", "max_str", "mean",
    )


#: chi-square 0.95 quantile at 8 degrees of freedom — the Benford
#: first-digit test's 5% critical value, shared with the oracle SQL.
BENFORD_CHI2_CRIT_5PCT = 15.507313


def benford_test(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str = "value",
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Benford first-digit conformance test per group — the classic
    fabricated-/truncated-data screen: naturally occurring
    scale-spanning magnitudes put digit d first with probability
    log10(1 + 1/d), and a chi-square distance from that law flags
    slices whose values were capped, binned, defaulted or invented.
    Complements ``profile_table`` (shape) and ``check_expectations``
    (declared contracts) with a distributional forensic.

    The first significant digit is read from the DECIMAL STRING of
    the value fixed to integer units of ``10^-scale`` — pure string
    arithmetic on an exact integer (leading digit is scale-invariant,
    so the cents representation has the value's own first digit), no
    log10 float anywhere near the data. Zero and null values carry no
    first digit and are excluded (reported as ``n_excluded``).

    Exactness: digit counts are exact int64 off one (group, digit)
    aggregation; the nine expected proportions are Python double
    literals injected identically into this plan and the oracle SQL,
    and the chi-square statistic folds the nine (o_d - n p_d)^2 /
    (n p_d) terms in one pinned left-associated chain. ``conforms``
    is the 5% verdict at 8 dof; null when n = 0.

    Scale shape: one partial-agg (group, digit) count + one per-group
    conditional-sum groupBy — nine bounded columns, no UDF. Returns
    ``group_cols..., n_obs, n_excluded, d1_frac, chi2, conforms``.
    """
    import math

    from ._util import keylist

    groups = keylist(group_cols)
    unit = 10 ** scale
    probs = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]

    cents = F.round(F.col(value_col) * F.lit(unit), 0).cast("long")
    d = df.select(
        *[F.col(g) for g in groups],
        F.when(
            cents.isNotNull() & (cents != 0),
            F.substring(F.abs(cents).cast("string"), 1, 1).cast("int"),
        ).alias("_d"),
    )
    counts = d.groupBy(*groups, "_d").agg(
        F.count("*").cast("long").alias("c")
    )
    agg = counts.groupBy(*groups).agg(
        F.sum(F.when(F.col("_d").isNotNull(), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n"),
        F.sum(F.when(F.col("_d").isNull(), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_excluded"),
        *[
            F.sum(F.when(F.col("_d") == dd, F.col("c")).otherwise(0))
            .cast("long")
            .alias(f"o{dd}")
            for dd in range(1, 10)
        ],
    )
    nd = F.col("n").cast("double")
    chain = None
    for dd in range(1, 10):
        exp_d = nd * F.lit(probs[dd - 1])
        od = F.col(f"o{dd}").cast("double")
        term = (od - exp_d) * (od - exp_d) / exp_d
        chain = term if chain is None else chain + term
    chi2 = F.when(F.col("n") > 0, chain)

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        *[F.col(g) for g in groups],
        F.col("n").alias("n_obs"),
        "n_excluded",
        rnd(
            F.when(F.col("n") > 0, F.col("o1").cast("double") / nd)
        ).alias("d1_frac"),
        rnd(chi2).alias("chi2"),
        F.when(
            chi2.isNotNull(), chi2 <= F.lit(BENFORD_CHI2_CRIT_5PCT)
        ).alias("conforms"),
    )
