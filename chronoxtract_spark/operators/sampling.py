"""Deterministic hash-based sampling and dataset splitting.

Corpus curation at 10^12 rows needs sampling that is (a) a map-only
predicate — no shuffle, no RNG state, no driver coordination between
executors — and (b) reproducible: the same document lands in the same
split on every rerun, at every scale, on every engine. Both come from
deciding membership with a content-stable hash of a key column instead
of `rand()` (whose per-task seeding makes results depend on partition
layout). The reference repo has no sampling subsystem (it is a
single-series feature library); this module is engine-native, like the
dedup/similarity family it sits beside.

Decisions are made in pure int64: the 60-bit hash ``u`` is compared
against ``floor(rate * 2^60)`` thresholds, so there is no float
rounding anywhere — a DuckDB oracle reproduces every decision
bit-for-bit with the same integer literals (the ``md5_60`` portable
family from operators.dedup; ``xxhash64`` is the fast JVM-side
production default, mapped to [0, 2^60) via an unsigned shift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _hash64

#: denominator of every sampling decision: u < floor(rate * 2^60)
U60 = 1 << 60


def rate_threshold(rate: float) -> int:
    """``floor(rate * 2^60)`` as an exact int (rate given as a Python
    float/str; computed via Fraction so 0.1 doesn't inherit binary-float
    error beyond what the caller wrote)."""
    from fractions import Fraction

    if not 0.0 <= float(rate) <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(Fraction(str(rate)) * U60)


def hash_u60(col, salt: str = "cx", hash_fn: str = "md5_60"):
    """Uniform 60-bit integer column derived from ``col`` (cast to
    string) and ``salt``. ``md5_60`` is already in [0, 2^60);
    ``xxhash64`` (signed 64-bit) is shifted to the same range so both
    families share the thresholds."""
    u = _hash64(F.col(col).cast("string") if isinstance(col, str) else col,
                salt, hash_fn)
    if hash_fn == "xxhash64":
        u = F.shiftrightunsigned(u, 4)
    return u


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "sample",
    hash_fn: str = "md5_60",
) -> DataFrame:
    """Keep rows whose hash fraction falls below ``rate``. Map-only:
    the predicate is a column expression over existing columns, so it
    pushes below any downstream shuffle and never materializes the
    rejected rows."""
    return df.where(hash_u60(key_col, salt, hash_fn) < F.lit(rate_threshold(rate)))


def with_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
    hash_fn: str = "md5_60",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one of ``weights``
    (e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``) by cumulative
    integer thresholds over the key hash. Weights must sum to 1 (the
    final bucket takes the remainder, so hash range coverage is total).
    Deterministic in the key alone — adding or removing *other* rows
    never moves a document between splits (critical for avoiding
    train/test leakage across dataset versions)."""
    from fractions import Fraction

    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    u = hash_u60(key_col, salt, hash_fn)
    names = list(weights)
    # cumulative boundaries in exact arithmetic: 0.9 + 0.05 in binary
    # floats is 0.9500000000000001, whose threshold is 115 hash values
    # off the literal 0.95 an oracle would use — Fractions keep every
    # boundary identical to rate_threshold(<written literal>)
    cum = Fraction(0)
    expr = None
    for name in names[:-1]:
        cum += Fraction(str(weights[name]))
        cond = u < F.lit(rate_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strata",
    hash_fn: str = "md5_60",
) -> DataFrame:
    """Per-stratum hash sampling (e.g. language rebalancing: keep 5% of
    English, 100% of low-resource languages). ``rates`` maps stratum
    value -> keep rate; strata absent from the map get
    ``default_rate``. Still map-only — the per-row threshold is a
    chained CASE over the stratum column, not a join."""
    if not rates:
        raise ValueError("rates must be non-empty")
    thr = None
    for val, rate in rates.items():
        cond = F.col(strata_col) == F.lit(val)
        lit = F.lit(rate_threshold(rate))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = thr.otherwise(F.lit(rate_threshold(default_rate)))
    return df.where(hash_u60(key_col, salt, hash_fn) < thr)


def temperature_mixture(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.6,
    salt: str = "mixture",
    hash_fn: str = "md5_60",
) -> DataFrame:
    """Temperature-flattened mixture resampling: resample so each
    stratum's share of the output approaches ``c_i^alpha / sum c_j^alpha``
    (alpha < 1 flattens a skewed source/language distribution — the
    standard multilingual / multi-source pre-training mixing rule),
    subject to a total budget of ``floor(budget_frac * N)`` rows and a
    no-upsampling cap (keep rate <= 1).

    The stratum histogram is collected driver-side — bounded metadata,
    one row per stratum (languages/domains number in the hundreds, not
    the billions), the same pattern as a broadcast dimension. The
    per-row decision stays a map-only integer-threshold CASE over the
    60-bit key hash, identical machinery to :func:`stratified_sample`.

    Reproducibility: the weight denominator is folded in sorted-stratum
    order, thresholds are ``floor(rate * 2^60)`` where the 2^60 scaling
    is exact (power of two), so for ``alpha = 0.5`` (sqrt is correctly
    rounded in every IEEE libm) a DuckDB oracle reproduces every
    per-row decision bit-for-bit. Other alphas go through ``pow``,
    whose last-ulp rounding is engine-specific — decisions remain
    deterministic per engine but cross-engine exactness is only
    guaranteed at 0.5. Unlike :func:`hash_sample`, membership depends
    on the stratum histogram: adding rows can change every rate.
    """
    import math

    counts = {
        r[0]: r[1] for r in df.groupBy(strata_col).count().collect()
    }
    if not counts:
        return df.where(F.lit(False))
    if not 0.0 < budget_frac <= 1.0:
        raise ValueError(f"budget_frac must be in (0, 1], got {budget_frac}")

    def weigh(c: int) -> float:
        return math.sqrt(c) if alpha == 0.5 else float(c) ** alpha

    total = sum(counts.values())
    n_tgt = math.floor(budget_frac * total)
    denom = 0.0
    for s in sorted(counts):  # pinned fold order (see docstring)
        denom += weigh(counts[s])
    thr = None
    for s in sorted(counts):
        c = counts[s]
        rate = min(1.0, ((weigh(c) / denom) * n_tgt) / c)
        lit = F.lit(math.floor(rate * U60))
        cond = F.col(strata_col) == F.lit(s)
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = thr.otherwise(F.lit(-1))  # unseen stratum (impossible) drops
    return df.where(hash_u60(key_col, salt, hash_fn) < thr)


# -- oracle SQL helpers ------------------------------------------------------


def sql_u60(key_expr: str, salt: str) -> str:
    """DuckDB expression for the md5_60 hash of ``key_expr`` with
    ``salt`` — textually the same family the Spark side computes
    (dedup._hash64 'md5_60'), verified cross-engine by the portable-hash
    property test."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || chr(1) || "
        f"'{salt}'), 1, 15))::BIGINT)"
    )
