"""SAX symbolization (Lin, Keogh et al. 2003): z-normalize each
fixed-length series, reduce it by piecewise aggregate approximation
(PAA), and map each segment mean to a letter through the equiprobable
N(0,1) breakpoints — the standard discretization behind symbolic
time-series indexing, motif discovery, and HOT SAX anomaly mining.

The reference repo's GASF/MTF matrices (kernel/matrices.py) are the
image-shaped encodings of a series; SAX is the string-shaped one, and
the natural mate of this repo's text dedup stack (a SAX word feeds the
same shingle/fingerprint machinery documents do).

Scale shape: one (key) shuffle; segment sums ride a (key, segment)
pre-aggregation, series mean/std come from the SAME partial sums
re-aggregated per key (no second scan of the raw rows), and the word
is one sorted array fold — all whole-stage-codegen expressions, no
UDF.

Oracle determinism: inputs are integer counts, so segment sums and
the series' sum/sum-of-squares are exact; mean, population std, each
PAA z-score, and the breakpoint comparisons are one shared IEEE chain
over those exact integers in both engines. Breakpoints are computed
once driver-side (kernel/tdist.py, bisection on erf) and embedded as
identical literals in the Spark plan and the oracle SQL. A segment's
letter index is ``#{breakpoints < z}`` with z exactly on a breakpoint
taking the LOWER letter (strict comparison, pinned); a zero-variance
series z-scores to all-zeros and reads as the middle letter repeated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chronoxtract_spark.operators._util import keylist as _keylist

from chronoxtract_spark.kernel.tdist import sax_breakpoints

_ALPHA_CHARS = "abcdefghijklmnopqrstuvwxyz"


def sax_words(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    value_col: str,
    series_n: int,
    word_len: int,
    alphabet: int = 4,
) -> DataFrame:
    """SAX word per fixed-length-``series_n`` series: ``word_len``
    PAA segments of exactly ``series_n // word_len`` samples
    (``series_n`` must divide evenly; series with a different row
    count are dropped), alphabet size up to 26.

    Returns per key: ``keys..., word, mean, std`` (population std;
    both rounded columns left exact — they are short float chains
    over exact integer sums).
    """
    keys = _keylist(keys)
    if series_n % word_len != 0:
        raise ValueError("word_len must divide series_n")
    if not 2 <= alphabet <= 26:
        raise ValueError("alphabet must be in [2, 26]")
    seg_len = series_n // word_len
    bps = sax_breakpoints(alphabet)

    wp = Window.partitionBy(*keys)
    base = (
        df.select(
            *keys,
            F.col(order_col).alias("ord"),
            F.col(value_col).cast("double").alias("v"),
        )
        .withColumn("_n", F.count("*").over(wp))
        .where(F.col("_n") == series_n)
        .withColumn(
            "seg",
            ((F.row_number().over(Window.partitionBy(*keys).orderBy("ord")) - 1)
             / seg_len).cast("int"),
        )
    )
    segs = base.groupBy(*keys, "seg").agg(
        F.sum("v").alias("s1"), F.sum(F.col("v") * F.col("v")).alias("s2")
    )
    nn = F.lit(float(series_n))
    stats = segs.groupBy(*keys).agg(
        F.collect_list(F.struct("seg", "s1")).alias("segsums"),
        (F.sum("s1") / nn).alias("mean"),
        F.sqrt(
            (F.sum("s2") - F.sum("s1") * F.sum("s1") / nn) / nn
        ).alias("std"),
    )
    # letter per segment: #{breakpoints < z}, strict, via a fold over
    # literal breakpoints; zero-variance series pin z = 0
    bp_arr = F.array(*[F.lit(float(b)) for b in bps])
    word = F.array_join(
        F.transform(
            F.array_sort(F.col("segsums")),
            lambda s: F.element_at(
                F.split(F.lit(" ".join(_ALPHA_CHARS[:alphabet])), " "),
                F.aggregate(
                    bp_arr,
                    F.lit(0),
                    lambda acc, b: acc
                    + F.when(
                        b
                        < F.when(
                            F.col("std") > 0,
                            (s["s1"] / F.lit(float(seg_len)) - F.col("mean"))
                            / F.col("std"),
                        ).otherwise(F.lit(0.0)),
                        1,
                    ).otherwise(0),
                )
                + 1,
            ),
        ),
        "",
    )
    return stats.select(*keys, word.alias("word"), "mean", "std")
