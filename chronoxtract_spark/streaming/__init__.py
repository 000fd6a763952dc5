"""Batch-incremental continuous aggregates + optional Structured
Streaming front-end.

The north rule's "continuous aggregates" are incremental **batch**
recomputations keyed by lineage checkpoints (SURVEY.md §2.10): when new
transcript rows arrive, only the (conv-day) partitions they touch are
re-rolled; everything else is served from the committed tiers.
"""

from chronoxtract_spark.streaming.incremental import (  # noqa: F401
    affected_days,
    incremental_rollup,
)
