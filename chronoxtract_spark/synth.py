"""Deterministic transcript-table synthesizer.

Generates the BASELINE.json:input_hint table shape —
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` — entirely with Spark SQL expressions (``sequence`` +
``explode`` + hash-derived columns), so generation itself distributes:
no driver-side loops, no Python UDFs, scales to any row count by
partitioned range generation.

Determinism: every column is a pure function of ``(conv_id, turn_idx)``
via xxhash64 with fixed seeds, so two runs (or two cluster sizes)
produce identical tables. Conversation lengths follow a Zipf-ish
power-law so a small set of mega-threads exercises the skew-handling
path (salting + AQE skew splits) the north rule requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "python", "browser", "calculator")

#: power-law exponent for turns-per-conversation
ZIPF_ALPHA = 1.2
MIN_TURNS = 4
MAX_TURNS = 8192  # mega-thread cap; bounded so one task can't run away


def synth_transcripts(
    spark: SparkSession,
    n_conversations: int = 1000,
    seed: int = 42,
    start_ts: str = "2026-01-01 00:00:00",
    partitions: int | None = None,
    min_turns: int = MIN_TURNS,
    max_turns: int = MAX_TURNS,
    length_scale: int = 4,
) -> DataFrame:
    """Build the deterministic transcripts DataFrame.

    Inter-turn gaps are 5s..~20min (hash-derived), so minute-bucketed
    series have holes and the gap-fill join does real work.
    ``min_turns``/``max_turns``/``length_scale`` control the Zipf length
    distribution (larger values → long-span conversations for the
    compute-heavy scaling benchmark).
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    conv = spark.range(0, n_conversations, 1, partitions).select(
        F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_seq"),
    )

    # Zipf-ish length: u in (0,1] from a hash, n_turns ~ u^(-1/alpha)
    u = (F.abs(F.xxhash64("conv_id", F.lit(seed))) % 1000000 + 1) / 1000000.0
    n_turns = F.least(
        F.lit(max_turns),
        (
            F.lit(min_turns) + F.pow(u, F.lit(-1.0 / ZIPF_ALPHA)) * length_scale
        ).cast("int"),
    )
    conv = conv.withColumn("n_turns", n_turns)

    turns = conv.select(
        "conv_id",
        "conv_seq",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    h = F.abs(F.xxhash64("conv_id", "turn_idx", F.lit(seed)))
    # irregular inter-turn gap seconds in [5, 1205); cumulative via a
    # running sum over the turn order (window within conversation)
    gap = (h % 1200 + 5).cast("long")
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    turns = turns.withColumn("gap_s", gap).withColumn(
        "offset_s",
        F.sum("gap_s").over(w) - F.col("gap_s")
        # conversations start staggered across ~30 days
        + (F.abs(F.xxhash64("conv_id", F.lit(seed + 1))) % (30 * 86400)),
    )

    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (F.col("turn_idx") % 3 + 1).cast("int")
    )
    tool = F.when(
        (h % 7 == 0) & (F.col("turn_idx") % 3 == 2),
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]), ((h / 7) % 4 + 1).cast("int")
        ),
    )
    text = F.format_string(
        "msg %s#%d :: %s",
        F.col("conv_id"),
        F.col("turn_idx"),
        F.hex(F.xxhash64("conv_id", "turn_idx", F.lit(seed + 2))),
    )

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        (F.to_timestamp(F.lit(start_ts)) + F.make_interval(secs=F.col("offset_s"))).alias(
            "ts"
        ),
    )
