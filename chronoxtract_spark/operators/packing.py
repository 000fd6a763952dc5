"""Sequence packing: fill fixed-token-budget training sequences.

Training pipelines batch short documents into fixed-capacity sequences
(e.g. 2k/8k tokens) to avoid padding waste. The global problem is bin
packing; at 10^12 documents nobody solves it globally — production
packers shard the corpus and pack within shards, because a sequence
only needs to be full, not optimally composed. This module is that
design, Spark-first:

- **grouping** is a deterministic hash of the doc id (portable md5-60
  family, so an oracle reproduces the shards bit-for-bit) — one
  shuffle, shards are independent and bounded;
- **within a shard**, documents are packed next-fit in doc-id order —
  a sequential recurrence, so it runs as a per-group Arrow kernel
  (``applyInPandas``); O(shard size) per task, shards sized by
  ``n_groups`` so a task stays ~100k docs;
- a document larger than the capacity gets its own bin (the caller
  decides whether to truncate or split upstream).

Next-fit (not first-fit-decreasing) is the deliberate choice: it is
single-pass, order-deterministic, and its waste bound (each closed bin
is more than half full when docs are ≤ capacity) is acceptable for
training batches — while FFD's bin search is a data-dependent loop
that parallelizes poorly and makes oracle reproduction fragile.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .sampling import hash_u60

PACK_SCHEMA = (
    "doc_id long, grp int, bin_idx long, n_tokens long, fill_after long"
)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    capacity: int = 2048,
    n_groups: int = 64,
    salt: str = "pack",
    hash_fn: str = "md5_60",
) -> DataFrame:
    """Assign every document to a (group, bin) training sequence.

    Returns one row per document: its shard ``grp``, the ``bin_idx``
    next-fit assigned within the shard, the document's token count,
    and the bin's running fill after placing it. Deterministic in the
    ids alone — rerunning, repartitioning, or adding other shards
    never moves a document."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_groups < 1:
        raise ValueError("n_groups must be >= 1")
    grp = (hash_u60(id_col, salt, hash_fn) % n_groups).cast("int")
    slim = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        grp.alias("grp"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["n_tokens"].isna().any():
            raise ValueError(
                "pack_sequences: null token counts — filter or fill them "
                "before packing (a null would silently become NaN here)"
            )
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills = [], []
        bin_idx, fill = 0, 0
        # anchor-style recurrence, identical to the oracle's recursive
        # CTE in every case (including zero-token docs before an
        # oversized one): first doc seeds (bin 0, fill=tok); after
        # that, overflow opens a bin and resets fill to tok
        first = True
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if first:
                fill = tok
                first = False
            elif fill + tok > capacity:
                bin_idx += 1
                fill = tok
            else:
                fill += tok
            bins.append(bin_idx)
            fills.append(fill)
        return pdf.assign(bin_idx=bins, fill_after=fills)

    return slim.repartition(n_groups, "grp").groupBy("grp").applyInPandas(
        pack, schema=PACK_SCHEMA
    )


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-group utilization: bins, docs, mean fill fraction of CLOSED
    bins. The last bin of a group counts as closed when it is at (or
    past — one oversized doc) capacity; otherwise it is headroom, not
    padding waste. Every group appears in the output — a group whose
    only bin is still open reports closed_bins=0 with a null fill
    fraction, rather than vanishing."""
    per_bin = packed.groupBy("grp", "bin_idx").agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("fill"),
    )
    last = packed.groupBy("grp").agg(F.max("bin_idx").alias("last_bin"))
    closed = per_bin.join(last, "grp").filter(
        (F.col("bin_idx") < F.col("last_bin"))
        | (F.col("fill") >= F.lit(int(capacity)))
    )
    agg = closed.groupBy("grp").agg(
        F.count("*").cast("long").alias("closed_bins"),
        F.sum("docs").cast("long").alias("docs"),
        F.round(F.avg(F.col("fill") / F.lit(float(capacity))), 6).alias(
            "mean_fill_frac"
        ),
    )
    groups = packed.select("grp").distinct()
    return groups.join(agg, "grp", "left").fillna(
        {"closed_bins": 0, "docs": 0}
    )
