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
