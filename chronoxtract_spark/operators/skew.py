"""Key-skew diagnostics: the pre-flight report this repo's own salted
repartitioning (plans/rollup.py) and AQE skew-join settings are tuned
from. Before shuffling 100 TB on a key, you measure the key: top-share
concentration, the p99/p50 key-size ratio, and the Gini coefficient
of the key-size distribution tell you whether plain hash partitioning
will strand a straggler.

Scale shape: one (key) count aggregation over the raw rows (map-side
combinable) — everything after runs on the KEY-SIZE table, which is
smaller than the data by the mean key size. That table takes one
global rank sort (single partition by construction; it is the small
side — the same pattern as every top-k window in this repo) and one
final aggregation. Gini comes from the rank-weighted exact integer
sum ``2*sum(i*c_i)/(n*sum(c)) - (n+1)/n``; percentiles are exact
``ceil(p*n)`` order statistics — no interpolation.

Oracle determinism: every output is an exact integer or a single
float chain over exact integers — bit-exact, no rounding. Rank ties
pin by (size, key...) ascending; ties do not change any output (equal
sizes swap equal weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chronoxtract_spark.operators._util import keylist as _keylist


def skew_report(
    df: DataFrame,
    keys: list[str] | str,
    top_k: int = 5,
) -> DataFrame:
    """One-row skew report for the key distribution of ``keys``:
    ``n_rows, n_keys, max_key_rows, top_share`` (row fraction in the
    ``top_k`` largest keys), exact ``p50_key_rows / p99_key_rows``
    order statistics, ``p99_p50_ratio``, and ``gini`` of key sizes
    (0 = uniform, -> 1 = one mega-key)."""
    keys = _keylist(keys)
    sizes = df.groupBy(*keys).agg(F.count("*").alias("c"))
    w = Window.orderBy(F.asc("c"), *[F.asc(k) for k in keys])
    wall = Window.partitionBy()
    ranked = sizes.select("c", F.row_number().over(w).alias("i")).select(
        "c", "i", F.count("*").over(wall).alias("nk")
    )
    agg = ranked.agg(
        F.max("nk").cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_key_rows"),
        # decimal accumulation: sum(i*c) ~ avg_c * n_keys^2 / 2 blows
        # past int64 near a billion keys — exactly the advertised
        # scale. DECIMAL(38,0) stays exact to 1e38 (the oracle's
        # HUGEINT mirror is exact to 1e38 too), and only the final
        # gini expression drops to double.
        F.sum(
            F.col("i").cast("decimal(38,0)")
            * F.col("c").cast("decimal(38,0)")
        ).alias("swx"),
        F.sum(
            F.when(F.col("i") > F.col("nk") - F.lit(int(top_k)), F.col("c"))
        ).cast("long").alias("top_rows"),
        F.max(
            F.when(F.col("i") == F.ceil(F.lit(0.5) * F.col("nk")), F.col("c"))
        ).cast("long").alias("p50_key_rows"),
        F.max(
            F.when(F.col("i") == F.ceil(F.lit(0.99) * F.col("nk")),
                   F.col("c"))
        ).cast("long").alias("p99_key_rows"),
    )
    n = F.col("n_keys").cast("double")
    gini = (
        F.lit(2.0) * F.col("swx").cast("double")
        / (n * F.col("n_rows").cast("double"))
        - (n + F.lit(1.0)) / n
    )
    return agg.select(
        "n_rows", "n_keys", "max_key_rows",
        (F.col("top_rows").cast("double")
         / F.col("n_rows").cast("double")).alias("top_share"),
        "p50_key_rows", "p99_key_rows",
        (F.col("p99_key_rows").cast("double")
         / F.col("p50_key_rows").cast("double")).alias("p99_p50_ratio"),
        gini.alias("gini"),
    )
