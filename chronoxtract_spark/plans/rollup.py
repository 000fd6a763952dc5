"""The north-rule rollup pipeline.

``transcripts → turn-rate 1m series → gap-fill → feature tiers
(1m/1h/1d) + Gorilla chunks → lineage → retention`` — the full
lifecycle of BASELINE.json:north_star, expressed as one declarative
Spark plan per tier.

Scale design (10^12 turns, 1000 executors):

- The only wide operations are groupBy shuffles keyed on
  ``(conv_id, <time bucket>)``; every tier reuses the same conv_id
  hash partitioning so AQE can pipeline exchanges.
- Mega-thread skew: the turn-rate aggregation key includes the minute
  bucket, so a 10M-turn conversation spreads over its minutes; the
  optional ``salt`` adds ``pmod(xxhash64(conv_id), salts)`` to
  pre-split pathological single-minute hot keys, and AQE skew-join
  splitting is on session-wide (session.get_spark).
- 1h and 1d moment features derive from **summed raw-moment state**
  (functions.moment_state_exprs), never from re-scanning the base —
  the reference's own algebraic trick (src/stats/mod.rs:25-43)
  distributed (SURVEY.md §4.3).
- Each day partition commits with a lineage row (row count, checksum,
  source snapshot); re-runs skip partitions whose lineage matches —
  the checkpoint/resume contract.
"""

from __future__ import annotations

import time
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronoxtract_spark import compression as cxc
from chronoxtract_spark import functions as cxf
from chronoxtract_spark.kernel import gapfill as k_gapfill
from chronoxtract_spark.operators import features as ops_features
from chronoxtract_spark.operators.gapfill import (
    gap_fill_minutes,
    gap_fill_minutes_day_keyed,
    turn_rate_1m,
)

TIERS = ("rollup_1m", "rollup_1h", "rollup_1d")
LINEAGE_TABLE = "lineage"
CHUNK_TABLE = "chunks_1m"

_TDIGEST_QAGG = None


def _tdigest_qagg_udf():
    """Arrow grouped-agg UDF: the window's five tier quantiles from a
    t-digest (kernel/tdigest.py, compression 200 — the same accuracy
    class as the percentile_approx(200) alternative, but the sketch the
    north star names, and deterministic: the kernel sorts, so shuffle
    arrival order cannot change an output bit). Built lazily and cached
    so importing this module never touches UDF registration."""
    global _TDIGEST_QAGG
    if _TDIGEST_QAGG is None:
        from pyspark.sql.types import ArrayType, DoubleType

        @F.pandas_udf(ArrayType(DoubleType()))
        def td_q(v: pd.Series) -> list:
            from chronoxtract_spark.kernel.tdigest import (
                tdigest_build,
                tdigest_quantiles,
            )

            x = v.to_numpy(np.float64)
            x = x[~np.isnan(x)]
            if not x.size:
                return [float("nan")] * 5
            m, w = tdigest_build(x, compression=200.0)
            return tdigest_quantiles(m, w, [0.05, 0.25, 0.5, 0.75, 0.95])

        _TDIGEST_QAGG = td_q
    return _TDIGEST_QAGG

#: per-day lineage metrics ride the write action itself (df.observe)
#: up to this many day partitions per commit; beyond it the engine
#: falls back to a post-write read-back aggregation. The cutover is a
#: measured cost model, not a safety valve: CollectMetrics evaluates
#: its aggregate expressions per input row (~5 ns per expr per row
#: measured on this host), so a D-day commit costs ~2·D·5 ns/row —
#: at D=350 that quadrupled the dense-tier write, while one read-back
#: scan of the just-written (page-cache-warm) files costs a flat
#: ~0.14 µs/row. Breakeven ≈ 14 days of metrics exprs. Incremental
#: daily loads — the regime a 100 TB deployment actually commits in —
#: always ride the observe path; bulk backfills pay one re-scan.
#: SMALL tiers (1h/1d/chunks: a few rows per conv-day) pass a higher
#: cap because rows, not days, dominate their metric cost.
MAX_OBSERVE_DAYS = 16
MAX_OBSERVE_DAYS_SMALL = 366

def _day_hash_term(c: str) -> str:
    """SQL term for one column inside the canonical ``row_hash``.

    ``day`` hashes as its epoch-day integer so the digest is invariant
    to the column's physical type (string 'yyyy-MM-dd' on the small
    tiers, DATE on the dense 1m tier and on every partition-inferred
    read-back) and so the dense write never renders per-row strings —
    date→string formatting is the worst-scaling expression on this
    host (BENCH/W1M_COMPONENTS.md: date_format scales 1.29x from 2c to
    8c vs 2.9x+ for integer/date arithmetic)."""
    return "unix_date(cast(day as date))" if c == "day" else c


def _day_dates(days: list[str]):
    """'yyyy-MM-dd' strings → datetime.date literals, so day filters
    compare 4-byte dates instead of coercing the column to string."""
    import datetime

    return [datetime.date.fromisoformat(d) for d in days]


CHUNK_SCHEMA = (
    "conv_id string, day string, chunk_id string, t0 long, n long, "
    "ts_bytes binary, val_bytes binary, checksum long, raw_size long, "
    "enc_size long"
)


class RollupEngine:
    def __init__(
        self,
        spark: SparkSession,
        io,
        salts: int = 0,
        kernel_features: bool = True,
        compress: bool = True,
        feature_mode: str = "core",
        quantiles: str = "exact",
        verify_readback: bool = False,
    ):
        self.spark = spark
        self.io = io
        # serializes lineage commits for callers that drive tier writes
        # from concurrent driver threads (guide §2.6): two appends into
        # the same parquet directory would race in the shared
        # _temporary staging dir. run() itself is sequential — an
        # overlapped dense-write variant measured 1.6x SLOWER (all legs
        # are CPU/membw-bound on the same cores) and was reverted.
        import threading

        self._lineage_lock = threading.Lock()
        self.salts = salts
        self.kernel_features = kernel_features
        self.compress = compress
        # 'core' = the north-star window features vectorized across
        # windows; 'full' = the whole kernel battery per window
        self.feature_mode = feature_mode
        # 'exact' = sort-based interpolated percentile (windows are
        # bounded, oracle-checkable); 'approx' = Spark's built-in
        # Greenwald-Khanna percentile_approx; 'tdigest' = the north
        # star's named sketch (kernel/tdigest.py, Arrow grouped-agg UDF,
        # deterministic k-space-bucketing construction) for deployments
        # that re-merge window quantiles across tiers
        self.quantiles = quantiles
        # opt-in audit: after each tier write, re-read the written files
        # and check their per-day checksums against the in-flight
        # (observe) metrics — full write verification at the cost of one
        # extra scan per tier (OFF by default: at 100 TB a dense-tier
        # read-back doubles the biggest table's IO)
        self.verify_readback = verify_readback

    # -- lineage ------------------------------------------------------------

    def committed_days(self, tier: str, source_snapshot: str) -> set[str]:
        """Day partitions already committed for this tier against this
        exact source snapshot."""
        if not self.io.exists(LINEAGE_TABLE):
            return set()
        rows = (
            self.io.read(LINEAGE_TABLE)
            .filter(
                (F.col("tier") == tier)
                & (F.col("source_snapshot") == source_snapshot)
            )
            .select("partition_key")
            .distinct()
            .collect()
        )
        return {r[0] for r in rows}

    def _write_with_lineage(
        self,
        df: DataFrame,
        table: str,
        days: list[str],
        source_snapshot: str,
        day_repartition: bool = False,
        observe_day_cap: int | None = None,
    ) -> int:
        """Partitioned dynamic-overwrite write whose per-day lineage
        metrics (row count + an order-insensitive bit_xor(xxhash64)
        content checksum — commutative, so shuffle order can't change
        it, and overflow-free under ANSI mode) are collected by the write
        action itself via ``df.observe`` — ONE scan produces both the
        tier files and the lineage commit; the written table is never
        re-read. The day partitions are known up front (the gap-fill
        span union), so per-day metrics are fixed conditional aggregates
        keyed on an integer epoch-day — no grouping needed.

        Every written tier carries a ``row_hash`` column —
        ``xxhash64`` over the name-sorted data columns (day as string)
        — so content digests are a COLUMN of the table, not a
        recomputation: the bulk-backfill fallback past
        ``observe_day_cap`` (default MAX_OBSERVE_DAYS — see the cost
        model there) re-reads only ``(day, row_hash)`` (a thin
        column-pruned scan, ~8 bytes/row, instead of decoding and
        re-hashing every column of the dense tier), and any later audit
        can checksum a partition without touching the wide columns.
        ``verify_readback=True`` additionally re-reads the written
        files, RECOMPUTES the hash from the data columns, and asserts
        equality with the committed checksums (opt-in write audit).

        Returns the total committed row count."""
        if observe_day_cap is None:
            observe_day_cap = MAX_OBSERVE_DAYS
        if day_repartition:
            # collapse tasks-x-days small files (guide §6: a 30-day x
            # 64-task commit writes ~2000 tiny files and the write
            # spends 5x longer opening/committing files than encoding
            # rows — measured 20.3s plain vs 3.3s day-keyed for the
            # sf0.1 chunk tier); only for the SMALL tiers — on the
            # dense 1m tier the day-keyed fan-out (gapfill) already
            # owns the layout. When the commit window has fewer days
            # than cores (the incremental daily load), a conv_id salt
            # keeps the write parallel while bounding files per day to
            # the salt width.
            k = max(
                1,
                self.spark.sparkContext.defaultParallelism
                // max(len(days), 1),
            )
            if k > 1 and "conv_id" in df.columns:
                df = df.repartition(
                    F.col("day"), F.pmod(F.xxhash64("conv_id"), F.lit(k))
                )
            else:
                df = df.repartition(F.col("day"))
        if not days:
            return 0
        # name-sorted hash order: a read-back re-appends the partition
        # column last, so positional order is not canonical. The day
        # term is canonicalized to its epoch-day INTEGER
        # (unix_date(cast(day as date))) — identical for a string
        # 'yyyy-MM-dd' column (small tiers) and a DATE column (the dense
        # 1m tier), and it keeps per-row string formatting out of the
        # hash: date_format/cast-to-string is the single worst-scaling
        # expression on the dense path (BENCH/W1M_COMPONENTS.md).
        cols = sorted(df.columns)
        hashed = df.withColumn(
            "row_hash",
            F.expr(
                "xxhash64({})".format(
                    ", ".join(_day_hash_term(c) for c in cols)
                )
            ),
        )

        if len(days) > observe_day_cap:
            # bulk backfill: per-day metrics from a thin (day, row_hash)
            # read-back of the files just written (page-cache warm).
            # Partition inference returns day as DATE, so the filter
            # uses date literals and the group key stays an integer-
            # backed date — the string render happens once per DAY on
            # the driver, never per row.
            self.io.overwrite_partitions(hashed, table, ["day"])
            back = (
                self.io.read(table)
                .filter(F.to_date(F.col("day")).isin(_day_dates(days)))
                .groupBy(F.to_date(F.col("day")).alias("day"))
                .agg(
                    F.count("*").alias("row_count"),
                    F.bit_xor("row_hash").alias("checksum"),
                )
                .collect()
            )
            now = int(time.time() * 1000)
            rows = [
                (table, str(r["day"]), source_snapshot, r["row_count"],
                 r["checksum"], now)
                for r in back
            ]
        else:
            from pyspark.sql import Observation

            day_ints = {
                d: int(np.datetime64(d, "D").astype(np.int64)) for d in days
            }
            hashed = hashed.withColumn(
                "_di", F.unix_date(F.to_date(F.col("day")))
            )
            exprs = []
            for d, di in day_ints.items():
                m = F.col("_di") == F.lit(di)
                exprs.append(
                    F.sum(F.when(m, 1).otherwise(0)).alias(f"c{di}")
                )
                exprs.append(
                    F.bit_xor(F.when(m, F.col("row_hash"))).alias(f"x{di}")
                )
            obs = Observation(f"lineage_{table}")
            out = hashed.observe(obs, *exprs).drop("_di")
            self.io.overwrite_partitions(out, table, ["day"])
            vals = obs.get
            now = int(time.time() * 1000)
            rows = [
                (table, d, source_snapshot, int(vals[f"c{di}"]),
                 int(vals[f"x{di}"]), now)
                for d, di in day_ints.items()
                if vals[f"c{di}"]
            ]
        if rows:
            lineage = self.spark.createDataFrame(
                rows,
                "tier string, partition_key string, source_snapshot string, "
                "row_count long, checksum long, committed_at long",
            )
            with self._lineage_lock:
                self.io.append(lineage, LINEAGE_TABLE)
        if self.verify_readback:
            written = self.io.read(table).filter(
                F.to_date(F.col("day")).isin(_day_dates(days))
            )
            back_chk = {
                str(r["day"]): (r["row_count"], r["checksum"])
                for r in written.groupBy(
                    F.to_date(F.col("day")).alias("day")
                ).agg(
                    F.count("*").alias("row_count"),
                    F.expr(
                        "bit_xor(xxhash64({}))".format(
                            ", ".join(_day_hash_term(c) for c in cols)
                        )
                    ).alias("checksum"),
                ).collect()
            }
            expect = {r[1]: (r[3], r[4]) for r in rows}
            if back_chk != expect:
                raise RuntimeError(
                    f"write verification failed for {table}: "
                    f"readback={back_chk} != committed={expect}"
                )
        return sum(r[3] for r in rows)

    # -- tier builders --------------------------------------------------------

    def build_observed(self, transcripts: DataFrame) -> DataFrame:
        """transcripts → per-(conv, minute) turn counts (pre-gap-fill).

        Mega-thread skew: the aggregation key includes the minute bucket,
        so a 10M-turn conversation spreads over its minutes, and Spark's
        partial (map-side) aggregation collapses even a single hot
        (conv, minute) cell before the shuffle — a count is algebraic, so
        no value-salting is needed on this path. ``salts`` > 0 adds an
        explicit pre-aggregation salted repartition for inputs whose
        *file layout* clusters one conversation into one input split
        (the north rule's salting clause); AQE skew-join splitting
        (session default) covers the join-side case.
        """
        df = transcripts
        if self.salts:
            df = df.repartition(
                max(df.sparkSession.sparkContext.defaultParallelism * 2, 16),
                F.col("conv_id"),
                F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(self.salts)),
            )
        return turn_rate_1m(df)

    def build_base_series(self, transcripts: DataFrame) -> DataFrame:
        """transcripts → gap-filled per-minute turn-rate series with a
        ``day`` partition column (north_star steps 2-3)."""
        observed = self.build_observed(transcripts)
        filled = gap_fill_minutes(observed)
        # DATE, not a formatted string: to_date is integer arithmetic
        # per dense row; the 'yyyy-MM-dd' render happens once per day
        # at the surfaces that need text (lineage keys, partition dirs)
        return filled.withColumn("day", F.to_date("minute_ts"))

    @staticmethod
    def _observed_slim(observed: DataFrame) -> DataFrame:
        """(conv_id, epoch minute, count) — the only data the dense-series
        kernels need; ~1000x smaller than the gap-filled table."""
        return observed.select(
            "conv_id",
            F.unix_timestamp("minute_ts").alias("t"),
            F.col("turns").cast("double").alias("v"),
        )

    def _candidate_days(self, observed: DataFrame) -> list[str]:
        """All day partitions the gap-filled output will contain: the
        union of per-conversation [first, last] observed-day ranges
        (gap days between observations count; tiny aggregation)."""
        spans = observed.groupBy("conv_id").agg(
            F.min(F.to_date("minute_ts")).alias("d0"),
            F.max(F.to_date("minute_ts")).alias("d1"),
        )
        days = spans.select(
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
            ).alias("d")
        ).distinct()
        return sorted(str(r[0]) for r in days.collect())

    def build_rollup_1m(self, base: DataFrame) -> DataFrame:
        """1m tier = the gap-filled series itself (one point per
        conversation-minute) — the finest retention tier."""
        return base.select(
            "conv_id",
            "minute_ts",
            F.col("turns").cast("long").alias("turns"),
            F.col("rate").cast("double").alias("rate"),
            "observed",
            "day",
        )

    def _window_tier(
        self,
        base: DataFrame,
        trunc: str,
        out_bucket: str,
        observed: DataFrame | None = None,
    ) -> DataFrame:
        """Shared 1h/1d builder: mergeable moment state + exact summary
        features + (optionally) whole-series kernel features per
        (conv_id, bucket) window.

        The kernel-feature pass ships only ``(conv_id, epoch, rate)``
        through Arrow (12 bytes/row — no timestamp objects) and buckets
        on integer epoch inside the kernel; the bucket timestamp is
        reconstructed JVM-side for the join with the SQL state."""
        bucketed = base.withColumn(out_bucket, F.date_trunc(trunc, "minute_ts"))
        keys = ["conv_id", out_bucket]

        qprobs = F.array(*[F.lit(q) for q in (0.05, 0.25, 0.5, 0.75, 0.95)])
        if self.quantiles == "tdigest":
            # Spark disallows grouped-agg pandas UDFs beside JVM
            # aggregates in one .agg() (INVALID_PANDAS_UDF_PLACEMENT),
            # so the digest rides a sibling aggregation joined on the
            # tier keys — both sides leave their exchange hash-
            # partitioned on those keys, so the join adds a sort but no
            # third shuffle of the base
            state = bucketed.groupBy(*keys).agg(
                *cxf.moment_state_exprs("rate"),
                F.first("day").alias("day"),
            )
            qdf = bucketed.groupBy(*keys).agg(
                _tdigest_qagg_udf()("rate").alias("q_sketch")
            )
            state = state.join(qdf, keys)
        else:
            if self.quantiles == "exact":
                # tier windows are bounded (<= 1440 points), so the
                # exact sort-based percentile is cheap AND
                # oracle-checkable; the sketch modes exist for
                # deployments that re-merge window quantiles across
                # tiers
                qagg = F.percentile("rate", qprobs)
            else:
                qagg = F.percentile_approx("rate", qprobs, F.lit(200))
            state = bucketed.groupBy(*keys).agg(
                *cxf.moment_state_exprs("rate"),
                qagg.alias("q_sketch"),
                F.first("day").alias("day"),
            )
        derived = cxf.moments_from_state()
        for name, col in derived.items():
            state = state.withColumn(name, col)
        state = (
            state.withColumn("median", F.col("q_sketch")[2])
            .withColumn("q05", F.col("q_sketch")[0])
            .withColumn("q25", F.col("q_sketch")[1])
            .withColumn("q75", F.col("q_sketch")[3])
            .withColumn("q95", F.col("q_sketch")[4])
        )

        if not self.kernel_features:
            return state

        if observed is None:
            slim = bucketed.select(
                "conv_id",
                F.unix_timestamp("minute_ts").alias("t"),
                F.col("rate").cast("double").alias("rate"),
            )
            regen = False
        else:
            slim = self._observed_slim(observed).withColumnRenamed("v", "rate")
            regen = True
        bucket_seconds = {"hour": 3600, "day": 86400}[trunc]
        kf = ops_features.kernel_features_epoch_bucketed(
            slim,
            bucket_seconds=bucket_seconds,
            mode=self.feature_mode,
            regenerate_dense=regen,
        ).withColumn(
            out_bucket, F.timestamp_seconds(F.col("bucket_epoch"))
        ).drop("bucket_epoch")
        return state.join(kf, keys)

    def build_rollup_1h_kernel(self, observed: DataFrame) -> DataFrame:
        """Fast path: the whole 1h tier (mergeable moment state, exact
        window quantiles, north-star features) from ONE kernel pass over
        the observed rows — the dense series never exists Spark-side for
        this tier (kernel.gapfill regeneration + batched window math).

        Requires feature_mode='core'. Output schema matches the SQL-path
        tier (moments derived from state by column math)."""
        slim = self._observed_slim(observed).withColumnRenamed("v", "rate")
        kf = ops_features.kernel_features_epoch_bucketed(
            slim,
            bucket_seconds=3600,
            mode="core",
            regenerate_dense=True,
            with_state=True,
        )
        tier = kf.withColumn(
            "hour_ts", F.timestamp_seconds(F.col("bucket_epoch"))
        ).drop("bucket_epoch")
        derived = cxf.moments_from_state()
        for name, col in derived.items():
            tier = tier.withColumn(name, col)
        return tier.withColumn("day", F.to_date("hour_ts"))

    def build_rollup_tiers_kernel(self, observed: DataFrame) -> DataFrame:
        """BOTH window tiers (1h + 1d) — mergeable moment state, exact
        window quantiles, north-star features — from ONE kernel pass
        over the observed rows. The in-kernel dense regeneration happens
        once and both tiers' windows are cut from the same array
        (operators.features multi-tier mode), so the 1d tier's full
        feature vector costs only its window math — no second shuffle,
        no base re-scan, and no quantile columns silently vanishing at
        the coarsest retention tier (the reference computes the same
        statistics at every tier, src/stats/mod.rs:81-114).

        Output: one row per (conv_id, bucket_seconds∈{3600,86400},
        bucket_epoch) with state + derived moments + features + day."""
        slim = self._observed_slim(observed).withColumnRenamed("v", "rate")
        kf = ops_features.kernel_features_epoch_bucketed(
            slim,
            bucket_seconds=(3600, 86400),
            mode="core",
            regenerate_dense=True,
            with_state=True,
        )
        tier = kf.withColumn(
            "bucket_ts", F.timestamp_seconds(F.col("bucket_epoch"))
        )
        derived = cxf.moments_from_state()
        for name, col in derived.items():
            tier = tier.withColumn(name, col)
        return tier.withColumn("day", F.to_date("bucket_ts"))

    def build_rollup_1h(
        self, base: DataFrame, observed: DataFrame | None = None
    ) -> DataFrame:
        return self._window_tier(base, "hour", "hour_ts", observed=observed)

    def build_rollup_1d_from_1h(self, tier_1h: DataFrame) -> DataFrame:
        """1d tier from 1h **state sums** — no base re-scan for the
        moment features (hierarchical re-aggregation, SURVEY.md §4.3).

        This is the SQL-path fallback (and the mergeability
        demonstration: summed state reproduces direct aggregation
        bit-for-bit modulo summation order, test_moment_state_merge_exact).
        It carries moments only; the DEFAULT kernel path instead builds
        the 1d tier with full parity — exact window quantiles and the
        north-star features — from the same single kernel pass that
        produces the 1h tier (build_rollup_tiers_kernel), so no tier
        loses columns at coarser retention."""
        keys = ["conv_id", "day"]
        agg = tier_1h.groupBy(*keys).agg(
            F.sum("n").alias("n"),
            F.sum("s1").alias("s1"),
            F.sum("s2").alias("s2"),
            F.sum("s3").alias("s3"),
            F.sum("s4").alias("s4"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
        )
        derived = cxf.moments_from_state()
        for name, col in derived.items():
            agg = agg.withColumn(name, col)
        return agg.withColumn(
            "day_ts", F.col("day").cast("timestamp")
        )

    def build_chunks(
        self, observed: DataFrame, interpolate: str = "linear"
    ) -> DataFrame:
        """Gorilla-compressed chunk structs per (conv_id, day): the
        vectorized Arrow UDF emitting binary-packed chunks
        (chronoxtract_spark.compression).

        Consumes the **observed** per-minute rows only and regenerates
        the dense gap-filled series inside the kernel
        (kernel.gapfill.dense_from_observed, bit-identical to the 1m
        tier) — the shuffle and Arrow transfer carry ~1000x fewer rows
        than the dense table. Grouped by conversation; the per-day chunk
        split happens on the regenerated int64 epochs.

        ``interpolate`` selects the in-kernel gap value ('linear' =
        the 1m tier's rate; 'zero' = observed counts, gaps at 0 — what
        a caller feeding the dense *turns* column would get, since a
        dense input makes every minute an observation)."""

        def encode(pdf: pd.DataFrame) -> pd.DataFrame:
            conv_raw = pdf["conv_id"].to_numpy()
            t_raw = pdf["t"].to_numpy(np.int64)
            v_raw = pdf["v"].to_numpy(np.float64)
            conv_vals, codes = np.unique(conv_raw, return_inverse=True)
            order = np.lexsort((t_raw, codes))  # stable, like the old
            codes, t_raw, v_raw = codes[order], t_raw[order], v_raw[order]
            cchange = np.flatnonzero(codes[1:] != codes[:-1]) + 1
            cstarts = np.concatenate(([0], cchange))
            cends = np.concatenate((cchange, [len(codes)]))
            cols: dict[str, list] = {
                k: []
                for k in (
                    "conv_id", "day", "chunk_id", "t0", "n", "ts_bytes",
                    "val_bytes", "checksum", "raw_size", "enc_size",
                )
            }
            for cs, ce in zip(cstarts, cends):
                conv = conv_vals[codes[cs]]
                t, v, _turns, _obs = k_gapfill.dense_from_observed(
                    t_raw[cs:ce], v_raw[cs:ce], interpolate=interpolate
                )
                day_idx = t // 86400
                change = np.flatnonzero(day_idx[1:] != day_idx[:-1]) + 1
                starts = np.concatenate(([0], change))
                ends = np.concatenate((change, [len(t)]))
                for s, e in zip(starts, ends):
                    ch = cxc.encode_chunk(t[s:e], v[s:e])
                    day = str(np.datetime64(int(day_idx[s]) * 86400, "s"))[:10]
                    cols["conv_id"].append(conv)
                    cols["day"].append(day)
                    cols["chunk_id"].append(f"{conv}/{day}")
                    cols["t0"].append(ch["t0"])
                    cols["n"].append(ch["n"])
                    cols["ts_bytes"].append(ch["ts_bytes"])
                    cols["val_bytes"].append(ch["val_bytes"])
                    cols["checksum"].append(ch["checksum"])
                    cols["raw_size"].append(ch["raw_size"])
                    cols["enc_size"].append(ch["enc_size"])
            return pd.DataFrame(cols)

        slim = self._observed_slim(observed)
        # BUCKETED grouping (one Arrow group per conversation hash
        # bucket): at many conversations the per-group pandas frame
        # machinery rivals the encode cost. Parallelism stays pinned —
        # the tiny observed input would otherwise be AQE-coalesced into
        # one task while the kernel regenerates the ~1000x dense
        # series; 8x-cores buckets keep Zipf-skewed conversations from
        # straggling a coarse granule.
        par = max(slim.sparkSession.sparkContext.defaultParallelism, 8)
        n_bkt = par * 8
        slim = slim.withColumn(
            "_bkt", F.pmod(F.xxhash64("conv_id"), F.lit(n_bkt))
        ).repartition(max(par * 2, 32), "_bkt")
        return (
            slim.groupBy("_bkt")
            .applyInPandas(encode, schema=CHUNK_SCHEMA)
        )

    # -- orchestration --------------------------------------------------------

    def run(
        self,
        transcripts: DataFrame,
        source_snapshot: str = "adhoc",
        resume: bool = True,
    ) -> dict:
        """Full pipeline run. Returns per-tier row counts.

        Resume contract: day partitions whose lineage row exists for
        (tier, source_snapshot) are skipped; partition writes are
        dynamic-overwrite so a partially-written partition from a killed
        run is replaced, never duplicated.

        Action economy (the thing the scaling rule actually measures):
        each tier is ONE Spark action — the partitioned write — whose
        per-day lineage metrics ride the same pass via ``df.observe``
        (``_write_with_lineage``); nothing is counted, checksummed, or
        read back in a separate job. Per run that is one action for the
        dense 1m tier, one for the Gorilla chunks, one that also
        materializes the shared two-tier kernel cache (1h), and one for
        1d, plus the tiny planning collect.
        """
        timings: dict[str, float] = {}

        def mark(name, t0):
            timings[name] = round(time.time() - t0, 2)
            return time.time()

        t = time.time()
        observed = self.build_observed(transcripts)
        observed.cache()
        counts: dict[str, int] = {}

        skips = {
            tier: (self.committed_days(tier, source_snapshot) if resume else set())
            for tier in TIERS
        }
        all_days = self._candidate_days(observed)  # materializes the cache
        new_1m = [d for d in all_days if d not in skips["rollup_1m"]]
        new_1h = [d for d in all_days if d not in skips["rollup_1h"]]
        new_1d = [d for d in all_days if d not in skips["rollup_1d"]]
        t = mark("plan_and_skip", t)

        def _day_filter(df, new_days, col="day"):
            """Resume filter, skipped entirely on a fresh run: the
            gap-fill fan-out only emits days inside the candidate span
            union, so when nothing is committed yet the isin is a
            per-row no-op that still costs real time on the dense tier
            (BENCH/W1M_COMPONENTS.md: ~3s/40M rows at 8c). Date
            literals, so a DATE column compares integers."""
            if len(new_days) == len(all_days):
                return df
            return df.filter(F.to_date(F.col(col)).isin(_day_dates(new_days)))

        # -- 1m tier: stream the dense plan straight into the partitioned
        # write (never cached — the dense fan-out only exists in this one
        # pass); per-day counts + checksums come from the write action.
        # DAY-KEYED fan-out (guide §8): the observed-scale segment rows
        # shuffle on (day, salt) BEFORE the ~1000x minute explode, so
        # each write task owns ~one day partition — no per-task sort by
        # partition key, no hundred-writer memory pressure, and day
        # files come out task-sized (row set identical to the conv-keyed
        # fan-out; tests pin the equivalence).
        #
        # (An overlapped variant — dense write on a pool thread while
        # the chunk/kernel legs run, guide §2.6 — was measured and
        # REVERTED: all legs here are CPU/memory-bandwidth-bound on the
        # same cores, and the interleaving ran the whole pipeline
        # 1.6x SLOWER than sequential legs at sf1.0.)
        if new_1m:
            base = gap_fill_minutes_day_keyed(observed, len(all_days))
            tier_1m = _day_filter(self.build_rollup_1m(base), new_1m)
            counts["rollup_1m"] = self._write_with_lineage(
                tier_1m, "rollup_1m", new_1m, source_snapshot
            )
        else:
            counts["rollup_1m"] = 0
        t = mark("write_1m", t)

        if new_1m and self.compress:
            chunks = _day_filter(self.build_chunks(observed), new_1m)
            self._write_with_lineage(
                chunks, CHUNK_TABLE, new_1m, source_snapshot,
                day_repartition=True,
                observe_day_cap=MAX_OBSERVE_DAYS_SMALL,
            )
            t = mark("chunks", t)

        # -- 1h + 1d tiers: one shared kernel pass (core mode)
        # computes both tiers' windows from the same in-kernel dense
        # series; the SQL path aggregates the dense plan for 1h and
        # re-sums 1h state for 1d (hierarchical, moments-only — full
        # 1d quantiles/features are the kernel path's job)
        need = sorted(set(new_1h) | set(new_1d))
        cached = None
        if need and self.kernel_features and self.feature_mode == "core":
            combined = _day_filter(
                self.build_rollup_tiers_kernel(observed), need
            ).cache()
            cached = combined
            tier_1h = (
                combined.filter(F.col("bucket_seconds") == 3600)
                .drop("bucket_seconds", "bucket_epoch")
                .withColumnRenamed("bucket_ts", "hour_ts")
            )
            tier_1h = (
                _day_filter(tier_1h, new_1h) if new_1h
                else tier_1h.filter(F.lit(False))
            )
            tier_1d = (
                combined.filter(F.col("bucket_seconds") == 86400)
                .drop("bucket_seconds", "bucket_epoch")
                .withColumnRenamed("bucket_ts", "day_ts")
            )
            tier_1d = (
                _day_filter(tier_1d, new_1d) if new_1d
                else tier_1d.filter(F.lit(False))
            )
        elif need:
            base = gap_fill_minutes(observed).withColumn(
                "day", F.to_date("minute_ts")
            )
            tier_1h_all = _day_filter(
                self.build_rollup_1h(
                    base, observed=observed if self.kernel_features else None
                ),
                need,
            ).cache()
            cached = tier_1h_all
            tier_1h = (
                _day_filter(tier_1h_all, new_1h) if new_1h
                else tier_1h_all.filter(F.lit(False))
            )
            tier_1d = self.build_rollup_1d_from_1h(tier_1h_all)
            tier_1d = (
                _day_filter(tier_1d, new_1d) if new_1d
                else tier_1d.filter(F.lit(False))
            )
        else:
            tier_1h = tier_1d = None

        counts["rollup_1h"] = (
            self._write_with_lineage(
                tier_1h, "rollup_1h", new_1h, source_snapshot,
                day_repartition=True,
                observe_day_cap=MAX_OBSERVE_DAYS_SMALL,
            )
            if tier_1h is not None and new_1h
            else 0
        )
        t = mark("write_1h", t)
        counts["rollup_1d"] = (
            self._write_with_lineage(
                tier_1d, "rollup_1d", new_1d, source_snapshot,
                day_repartition=True,
                observe_day_cap=MAX_OBSERVE_DAYS_SMALL,
            )
            if tier_1d is not None and new_1d
            else 0
        )
        t = mark("write_1d", t)

        if cached is not None:
            cached.unpersist()
        observed.unpersist()
        self.last_timings = timings
        return counts

    # -- retention ------------------------------------------------------------

    def apply_retention(self, policy: dict[str, str]) -> dict[str, list[str]]:
        """Partition-level retention deletes: drop day partitions older
        than each tier's cutoff (``policy = {"rollup_1m": "2026-01-15"}``)
        and record the expiry in lineage.

        Interplay with resume: the original commit lineage rows remain,
        so a re-run against the same source snapshot SKIPS expired
        partitions rather than rebuilding them — retention wins over
        resume by design (rebuild intentionally requires a new
        source_snapshot)."""
        dropped: dict[str, list[str]] = {}
        for tier, cutoff in policy.items():
            days = [
                d
                for d in self.io.list_partitions(tier, "day")
                if d < cutoff
            ]
            if days:
                self.io.delete_partitions(tier, "day", days)
                expiry = self.spark.createDataFrame(
                    [(tier, d, "retention-expired", 0, 0, int(time.time() * 1000))
                     for d in days],
                    "tier string, partition_key string, source_snapshot string, "
                    "row_count long, checksum long, committed_at long",
                )
                self.io.append(expiry, LINEAGE_TABLE)
            dropped[tier] = days
        return dropped
