"""chronoxtract_spark — a PySpark-native time-series rollup, downsample
and retention engine with ChronoXtract's feature-extraction surface.

Layers:

- ``kernel``     — numpy mirrors of the reference's per-series functions
                   (bit-for-bit fixture parity; run inside Arrow UDFs)
- ``functions``  — Spark Column expression builders (SQL-native features)
- ``operators``  — DataFrame-level operators (rolling windows, gap-fill,
                   DCF range join, dedup, similarity, text analysis)
- ``sources``    — TableIO shim (Parquet directory backend; Iceberg
                   backend when the runtime jar is on the classpath)
- ``plans``      — the north-rule rollup pipeline: turn-rate series →
                   gap-fill → 1m/1h/1d continuous-aggregate tiers with
                   Gorilla-compressed chunks, lineage rows, retention
                   deletes, and checkpoint resume
- ``compression``— Gorilla XOR / delta-of-delta codec (vectorized numpy
                   bit-packing inside an Arrow UDF)
"""

__version__ = "0.1.0"
