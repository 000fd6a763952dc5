"""Shared operator-package helpers."""

from __future__ import annotations


def keylist(keys: list[str] | str) -> list[str]:
    """Normalize the ``keys`` argument every operator accepts: a bare
    string becomes a one-element list; any iterable is copied."""
    return [keys] if isinstance(keys, str) else list(keys)


def epoch_seconds(df, ts_col: str):
    """THE canonical timestamp -> whole-second column every per-key
    stream operator orders and differences by: numeric columns are
    taken as epoch seconds (cast long), timestamps floor through
    ``unix_timestamp``. One shared definition so the cadence /
    extremes / markov / survival batteries and their DuckDB oracles
    (``CAST(floor(epoch(ts)) AS BIGINT)``) can never disagree on the
    flooring."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import NumericType

    if isinstance(df.schema[ts_col].dataType, NumericType):
        return F.col(ts_col).cast("long")
    return F.unix_timestamp(F.col(ts_col))
