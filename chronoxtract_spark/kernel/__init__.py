"""Numpy kernel library — the parity-critical mirror of the reference's
~60 per-series functions (reference: src/lib.rs:142-248 registers them).

Every kernel takes dense float64 numpy arrays and reproduces the
reference's numerics bit-for-bit where the reference is deterministic
(SURVEY.md §5.2). Spark executes these inside ``applyInPandas`` /
Arrow-batched pandas UDFs; none of them are ever called per-row.
"""

from chronoxtract_spark.kernel import (  # noqa: F401
    correlation,
    entropy,
    fda,
    higherorder,
    matrices,
    misc,
    peaks,
    rolling,
    seasonality,
    shape,
    stats,
)
