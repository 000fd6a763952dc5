"""Structured Streaming front-end for the rollup pipeline.

The batch-incremental path (streaming/incremental.py) re-rolls touched
day partitions; this module is the true streaming face of the same
semantics (SURVEY.md §2.10):

- ``watermarked_minute_counts`` — the streaming form of
  operators.gapfill.turn_rate_1m: event-time 1-minute tumbling windows
  with a watermark, so late turns within the allowed lateness still
  land in their window and older ones are dropped instead of corrupting
  closed windows.
- ``watermarked_hour_state`` — the streaming form of the 1h tier's
  mergeable moment state (functions.moment_state_exprs): per
  (conv, hour window) n/s1..s4/min/max in one watermarked agg. A batch
  job derives the moment features from the state exactly like
  plans.rollup does — state columns are engine-wide currency.
- ``watermarked_session_stats`` — streaming sessionization via the
  native ``session_window`` (merging session state in the agg), the
  streaming face of operators.sessions.session_stats.
- ``watermarked_dedup`` — streaming exact deduplication via
  ``dropDuplicatesWithinWatermark``: state for a key is held only for
  the lateness horizon, so the dedup state store is bounded by the
  watermark instead of growing with the stream (the streaming face of
  operators.dedup.exact_duplicates' key normalization).
- ``stateful_ema`` — custom stateful operator via
  ``applyInPandasWithState``: per-conversation EMA of per-batch turn
  counts carried in GroupState across micro-batches (the reference's
  sequential recurrence, src/rollingstats/mod.rs:45-66, lifted to a
  streaming group state).

All three run on any streaming source (file, Kafka, rate); tests drive
them with a file source + checkpoints so watermark advancement and
state recovery across restarts are exercised for real.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from chronoxtract_spark import functions as cxf


def watermarked_minute_counts(
    events: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-(conversation, minute-window) turn counts over event time.

    Append-mode compatible: a window only emits once the watermark
    passes its end, and turns later than ``watermark`` are dropped —
    the streaming contract for the 1m tier.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(conv_col),
            F.window(F.col(ts_col), "1 minute").alias("w"),
        )
        .agg(F.count("*").alias("turns"))
        .select(
            conv_col,
            F.col("w.start").alias("minute_ts"),
            F.col("turns").cast("long").alias("turns"),
        )
    )


def watermarked_hour_state(
    events: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming 1h-tier moment state: per (conv, hour window)
    ``n, s1..s4, min, max`` over the value column (turn count weight 1.0
    when ``value_col`` is None). The same mergeable state the batch tier
    sums (plans.rollup), so downstream tiers and the moment-derivation
    column math apply unchanged.
    """
    v = (
        F.lit(1.0)
        if value_col is None
        else F.col(value_col).cast("double")
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(conv_col),
            F.window(F.col(ts_col), "1 hour").alias("w"),
        )
        .agg(*cxf.moment_state_exprs_for(v))
        .select(
            conv_col,
            F.col("w.start").alias("hour_ts"),
            "n",
            "s1",
            "s2",
            "s3",
            "s4",
            "min",
            "max",
        )
    )


def watermarked_session_stats(
    events: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming counterpart of operators.sessions.session_stats:
    per-(conversation, session) turn count, start/end epoch seconds,
    duration — using Spark's native ``session_window`` (dynamic-gap
    merging session state inside the streaming agg) instead of the
    batch gaps-and-islands window pass. A session emits once the
    watermark passes ``gap`` beyond its last event (the window closes),
    so append mode streams final per-session rows.

    Session extent note: ``session_window`` spans [first_event,
    last_event + gap); the batch operator reports observed turn
    extent, so ``end_s`` here subtracts the gap back out to agree
    with ``session_stats`` on closed sessions. Boundary divergence:
    the batch operator compares FLOORED whole-second gaps with a
    strict ``>``, while ``session_window`` merges on full-precision
    event time with half-open windows — so the two can disagree
    whenever a real gap lands within ~1 s of the threshold (an exact
    whole-second gap of ``gap`` stays in-session in batch but splits
    here, and sub-second timestamp parts can tip either way). Treat
    rows whose gap is that close to the threshold as
    implementation-defined, as with any floating boundary.
    """
    gap_expr = F.expr(f"INTERVAL {gap}")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(conv_col),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.min(F.unix_timestamp(F.col(ts_col))).alias("start_s"),
            F.max(F.unix_timestamp(F.col(ts_col))).alias("end_s"),
        )
        .select(
            conv_col,
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - gap_expr).alias("session_end"),
            "n_turns",
            "start_s",
            "end_s",
            (F.col("end_s") - F.col("start_s")).alias("duration_s"),
        )
    )


def watermarked_dedup(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    normalized_text_col: str | None = None,
) -> DataFrame:
    """Streaming exact dedup: emit the first arrival of each key,
    drop re-arrivals within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes the key's event time + horizon — bounded
    state, unlike a plain ``dropDuplicates`` whose store grows with
    every key ever seen (the difference between a pipeline that runs
    for a year and one that OOMs in a week). With
    ``normalized_text_col``, the dedup key is the canonical text
    normalization shared with the batch dedup family
    (operators.text.normalized_text), so batch backfills and the
    stream agree on what counts as a duplicate."""
    df = events
    keys = list(key_cols or [])
    helper = None
    if normalized_text_col is not None:
        from chronoxtract_spark.operators.text import normalized_text

        helper = "_cx_dedup_key"
        if helper in df.columns:
            raise ValueError(f"input already has a {helper} column")
        df = df.withColumn(helper, normalized_text(normalized_text_col))
        keys = keys + [helper]
    if not keys:
        raise ValueError("need key_cols and/or normalized_text_col")
    out = df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    # the helper key is an implementation detail (and carries the full
    # normalized text) — never leak it into the caller's sink schema
    return out.drop(helper) if helper else out


EMA_STATE_SCHEMA = "ema double, n long"
EMA_OUT_SCHEMA = "conv_id string, batch_rows long, ema double"


def stateful_ema(
    minute_counts: DataFrame,
    alpha: float = 0.2,
    conv_col: str = "conv_id",
    order_col: str = "minute_ts",
    value_col: str = "turns",
) -> DataFrame:
    """Per-conversation streaming EMA via ``applyInPandasWithState``.

    GroupState carries (ema, n) across micro-batches; each batch folds
    its rows in event-time order through the same recurrence as the
    batch kernel (kernel.rolling.exponential_moving_average), so a
    restart from checkpoint resumes mid-series with identical values.
    """

    def fn(key, pdfs, state: GroupState):
        ema = None
        n = 0
        if state.exists:
            ema, n = state.get
        rows = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            for v in pdf[value_col].astype(float):
                ema = v if ema is None or n == 0 else alpha * v + (1 - alpha) * ema
                n += 1
                rows += 1
        state.update((float(ema) if ema is not None else 0.0, int(n)))
        yield pd.DataFrame(
            [{"conv_id": key[0], "batch_rows": rows, "ema": ema}]
        )

    return minute_counts.groupBy(conv_col).applyInPandasWithState(
        fn,
        outputStructType=EMA_OUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Drive a streaming DataFrame to a memory sink with availableNow —
    one call processes everything currently in the source and stops.
    Returns the in-memory table name (== query_name). The memory sink
    is NOT checkpoint-recoverable; for restart tests use
    ``run_collect``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return query_name


def run_collect(
    stream_df: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> list:
    """Drive a streaming DataFrame with availableNow through
    ``foreachBatch``, collecting every micro-batch's rows driver-side.
    foreachBatch is checkpoint-recoverable, so consecutive calls with
    the same checkpoint resume watermark + operator state — the restart
    path the tests exercise."""
    rows: list = []

    def sink(batch_df, _batch_id):
        rows.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def streaming_chunks(
    stream_events: DataFrame,
    engine,
    checkpoint_dir: str,
    base_table: str = "stream_base",
    chunk_table: str = "chunks_1m_stream",
):
    """Streaming face of the Gorilla chunk stage (north_star step 4):
    each micro-batch lands in the base table under a batch-id partition
    (dynamic overwrite — a checkpoint REPLAY of the same batch rewrites
    the identical partition instead of duplicating rows), then every
    touched conversation's FULL observed series is re-encoded through
    the same ``RollupEngine.build_chunks`` kernel the batch path uses
    and dynamic-overwritten at (day, conv_id) granularity.

    Re-encoding the whole conversation (not just the new day) is what
    keeps cross-day gap-fill exact: one new turn can extend a dense
    span across day boundaries, changing chunks for days the batch
    never mentioned. Both commits are idempotent partition overwrites,
    so the terminal state is byte-identical to one batch
    ``build_chunks`` over the same events
    (tests/test_streaming_live.py::TestStreamingChunks).

    Scale notes: touched conversations ride a broadcast semi-join (no
    driver-side id list); at 10^12-turn scale the per-(day, conv)
    directory layout becomes the IcebergBackend's overwritePartitions /
    MERGE — the parquet stand-in keeps the same commit unit.
    """

    def sink(batch_df, batch_id):
        io = engine.io
        b = batch_df.withColumn("_batch", F.lit(int(batch_id)))
        io.overwrite_partitions(b, base_table, ["_batch"])
        touched = batch_df.select("conv_id").distinct()
        base = (
            io.read(base_table)
            .drop("_batch")
            .join(F.broadcast(touched), "conv_id", "semi")
        )
        chunks = engine.build_chunks(engine.build_observed(base))
        io.overwrite_partitions(chunks, chunk_table, ["day", "conv_id"])

    q = (
        stream_events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


MOMENT_STATE_SCHEMA = (
    "n long, s1 double, s2 double, s3 double, s4 double, "
    "mn double, mx double"
)
MOMENT_OUT_SCHEMA = (
    "conv_id string, n long, s1 double, s2 double, s3 double, s4 double, "
    "min double, max double, mean double, variance double"
)


def stateful_moment_state(
    minute_counts: DataFrame,
    conv_col: str = "conv_id",
    value_col: str = "turns",
) -> DataFrame:
    """Per-conversation RUNNING mergeable moment state via
    ``transformWithStateInPandas`` — Spark 4's arbitrary-state v2
    (StatefulProcessor + ValueState), the successor API to
    ``applyInPandasWithState`` used by ``stateful_ema``.

    The state tuple IS the engine-wide currency
    (functions.moment_state_exprs: n, s1..s4, min, max — the
    reference's fused accumulator, src/stats/mod.rs:25-43), so the
    streaming running state merges with batch tier state by plain
    addition, and a restart from checkpoint resumes with identical
    values (tested in tests/test_streaming_live.py).

    REQUIRES (a) the RocksDB state store (transformWithState is a
    state-v2-only operator):
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
    — set here if unset (existing checkpoints pin their own provider);
    and (b) ``google.protobuf`` on the python path (Spark's state-v2
    python protocol is protobuf-based). This sandbox ships no protobuf,
    so the test is import-gated and ``stateful_ema``
    (applyInPandasWithState) is the runtime-validated stateful path
    here — same fencing discipline as the Iceberg backend."""
    import numpy as np
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MomentProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("moments", MOMENT_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, s1, s2, s3, s4 = 0, 0.0, 0.0, 0.0, 0.0
            mn, mx = float("inf"), float("-inf")
            if self._state.exists():
                got = self._state.get()
                if got is not None:
                    n, s1, s2, s3, s4, mn, mx = got
            batch_rows = 0
            for pdf in rows:
                v = pdf[value_col].to_numpy(np.float64)
                if v.size == 0:
                    continue
                batch_rows += int(v.size)
                n += int(v.size)
                v2 = v * v
                s1 += float(v.sum())
                s2 += float(v2.sum())
                s3 += float((v2 * v).sum())
                s4 += float((v2 * v2).sum())
                mn = min(mn, float(v.min()))
                mx = max(mx, float(v.max()))
            self._state.update((n, s1, s2, s3, s4, mn, mx))
            mean = s1 / n if n else float("nan")
            var = s2 / n - mean * mean if n else float("nan")
            yield pd.DataFrame(
                [
                    {
                        "conv_id": key[0],
                        "n": n,
                        "s1": s1,
                        "s2": s2,
                        "s3": s3,
                        "s4": s4,
                        "min": mn if n else float("nan"),
                        "max": mx if n else float("nan"),
                        "mean": mean,
                        "variance": var,
                    }
                ]
            )

        def close(self) -> None:
            pass

    spark = minute_counts.sparkSession
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    if "RocksDB" not in (spark.conf.get(provider_key, "") or ""):
        spark.conf.set(
            provider_key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    return minute_counts.groupBy(conv_col).transformWithStateInPandas(
        statefulProcessor=MomentProcessor(),
        outputStructType=MOMENT_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def watermarked_heartbeats(
    events: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    liveness_s: int = 900,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming counterpart of operators.counters.heartbeat_agg's
    island pass: heartbeats within ``liveness_s`` of each other merge
    into liveness islands via native ``session_window`` (gap =
    liveness), emitting one final row per closed island in append
    mode — ``key, island_start, n_hb, first_s, last_s, extent_s``
    with ``extent_s = last - first + liveness`` (the batch operator's
    full-trailing-credit extent).

    Boundary divergence (same class as watermarked_session_stats): a
    heartbeat landing EXACTLY at ``prev + liveness`` stays in-island
    in batch (strict ``>`` starts islands) but splits here
    (half-open session windows) — implementation-defined at the
    boundary, identical everywhere else.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(
                F.col(ts_col), f"{int(liveness_s)} seconds"
            ).alias("w"),
        )
        .agg(
            F.count("*").cast("long").alias("n_hb"),
            F.min(F.unix_timestamp(F.col(ts_col))).alias("first_s"),
            F.max(F.unix_timestamp(F.col(ts_col))).alias("last_s"),
        )
        .select(
            key_col,
            F.col("w.start").alias("island_start"),
            "n_hb", "first_s", "last_s",
            (F.col("last_s") - F.col("first_s") + F.lit(int(liveness_s)))
            .alias("extent_s"),
        )
    )


TDIGEST_STATE_SCHEMA = "n long, means array<double>, weights array<double>"
TDIGEST_OUT_SCHEMA = (
    "conv_id string, n long, n_centroids int, "
    "q05 double, q25 double, q50 double, q75 double, q95 double"
)


def stateful_tdigest(
    values: DataFrame,
    conv_col: str = "conv_id",
    value_col: str = "turns",
    compression: float = 100.0,
) -> DataFrame:
    """Per-key streaming t-digest via ``applyInPandasWithState`` — the
    streaming face of operators.sketches' tiered digest rollup.

    GroupState carries the digest's centroid arrays (means, weights)
    across micro-batches; each batch is digested with the SAME kernel
    as the batch path (kernel.tdigest, k-space bucketing) and merged
    into the state digest, so a restart from checkpoint resumes with
    the identical sketch. State size is O(compression) floats per key
    REGARDLESS of stream length — the property that makes a quantile
    sketch streamable at all (exact quantiles would need unbounded
    state). Emits the current q05..q95 estimates per batch (update
    mode).

    Stream ≡ batch: merging per-batch digests is the same operation as
    merging per-hour digests, so in the singleton regime
    (compression ≫ πn) the streamed digest's quantiles EQUAL a batch
    tdigest_build over all values seen — tested exactly, like
    streaming_chunks' byte-for-byte contract; at production
    compression the merge carries the paper's error bound (pinned by
    the kernel tests)."""
    comp = float(compression)

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        from chronoxtract_spark.kernel.tdigest import (
            tdigest_build,
            tdigest_merge,
            tdigest_quantiles,
        )

        digest = None
        n0 = 0
        if state.exists:
            n0, means0, weights0 = state.get
            if means0:
                digest = (
                    np.asarray(means0, dtype=float),
                    np.asarray(weights0, dtype=float),
                )
        chunks = []
        for pdf in pdfs:
            v = pdf[value_col].to_numpy(np.float64)
            v = v[~np.isnan(v)]
            if v.size:
                chunks.append(v)
        if chunks:
            batch = tdigest_build(np.concatenate(chunks), compression=comp)
            digest = (
                batch
                if digest is None
                else tdigest_merge([digest, batch], compression=comp)
            )
            n0 += int(sum(c.size for c in chunks))
        means = digest[0].tolist() if digest is not None else []
        weights = digest[1].tolist() if digest is not None else []
        state.update((int(n0), means, weights))
        if digest is not None:
            q = tdigest_quantiles(digest[0], digest[1], [0.05, 0.25, 0.5, 0.75, 0.95])
        else:
            q = [None] * 5
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "n": int(n0),
                    "n_centroids": len(means),
                    "q05": q[0], "q25": q[1], "q50": q[2],
                    "q75": q[3], "q95": q[4],
                }
            ]
        )

    return values.groupBy(conv_col).applyInPandasWithState(
        fn,
        outputStructType=TDIGEST_OUT_SCHEMA,
        stateStructType=TDIGEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_STATE_SCHEMA = "n long, terms array<string>, cnts array<long>, thr long"
MG_OUT_SCHEMA = (
    "conv_id string, rank int, term string, n long, "
    "cnt_lb long, cnt_ub long, thr long"
)


def stateful_heavy_hitters(
    turns: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    budget: int = 1 << 12,
    k: int = 10,
) -> DataFrame:
    """Per-key streaming heavy hitters via ``applyInPandasWithState`` —
    the streaming face of operators.sketches' Misra-Gries summary,
    completing the sketch suite's streaming coverage (t-digest:
    stateful_tdigest; exact distinct: dropDuplicatesWithinWatermark).

    GroupState carries the key's term->count accumulator bounded at
    ``budget`` counters plus the running truncation threshold; each
    micro-batch is counted exactly (one vectorized value_counts over
    the batch's whitespace tokens — same tokenization as the batch
    sketch), added to the state, and the accumulator is truncated back
    to ``budget`` (count DESC, term ASC — the repo's deterministic
    ranked pin) with the largest dropped count accumulated into
    ``thr``. The lossy-counting invariant is the batch kernel's:
    every kept count is a LOWER bound and true <= cnt + thr — the
    per-row sandwich [cnt_lb, cnt_ub] emitted with each top-k row.
    State is O(budget) REGARDLESS of stream length; with
    budget >= the key's true vocabulary nothing ever truncates,
    thr == 0, and the streamed top-k EQUALS the exact batch counts —
    the stream == batch contract the test pins across a checkpoint
    restart. Emits the current top-``k`` per batch (update mode)."""
    bud = int(budget)
    topk = int(k)

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        n0 = 0
        acc = None
        thr = 0
        if state.exists:
            n0, terms0, cnts0, thr = state.get
            if terms0:
                acc = pd.Series(
                    np.asarray(cnts0, dtype="int64"), index=list(terms0)
                )
        chunks = []
        for pdf in pdfs:
            toks = (
                pdf[text_col]
                .dropna()  # null text is DROPPED, as the batch
                .astype(str)  # sketch's JVM tokenizer does — never
                .str.strip()  # counted as a literal "none" token
                .str.lower()
                .str.split()
            )
            flat = [t for row in toks for t in row]
            if flat:
                chunks.append(pd.Series(flat))
        if chunks:
            vc = pd.concat(chunks).value_counts().astype("int64")
            n0 += int(vc.sum())
            acc = vc if acc is None else acc.add(vc, fill_value=0).astype(
                "int64"
            )
            if len(acc) > bud:
                tab = acc.rename_axis("term").reset_index(name="cnt")
                tab = tab.sort_values(
                    ["cnt", "term"], ascending=[False, True], kind="mergesort"
                )
                thr += int(tab["cnt"].iloc[bud])
                kept = tab.iloc[:bud]
                acc = pd.Series(
                    kept["cnt"].to_numpy(), index=kept["term"], dtype="int64"
                )
        terms = list(acc.index) if acc is not None else []
        cnts = [int(x) for x in acc.to_numpy()] if acc is not None else []
        state.update((int(n0), terms, cnts, int(thr)))
        if acc is None:
            return
        tab = acc.rename_axis("term").reset_index(name="cnt")
        tab = tab.sort_values(
            ["cnt", "term"], ascending=[False, True], kind="mergesort"
        ).head(topk)
        yield pd.DataFrame(
            {
                "conv_id": key[0],
                "rank": range(1, len(tab) + 1),
                "term": tab["term"].to_numpy(),
                "n": int(n0),
                "cnt_lb": tab["cnt"].to_numpy(),
                "cnt_ub": tab["cnt"].to_numpy() + int(thr),
                "thr": int(thr),
            }
        )

    return turns.groupBy(conv_col).applyInPandasWithState(
        fn,
        outputStructType=MG_OUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_STATE_SCHEMA = "n long, hs array<long>"
KMV_OUT_SCHEMA = (
    "conv_id string, n_rows long, n_kept long, saw_all boolean, est double"
)


def stateful_kmv(
    values: DataFrame,
    conv_col: str = "conv_id",
    value_col: str = "turns",
    k: int = 1 << 12,
) -> DataFrame:
    """Per-key streaming distinct-count sketch via
    ``applyInPandasWithState`` — the streaming face of
    operators.sketches.kmv_distinct, completing streaming coverage for
    all three sketches (t-digest: stateful_tdigest; Misra-Gries:
    stateful_heavy_hitters).

    Hashing happens BEFORE the stateful operator, on the JVM
    (``xxhash64`` — the identical hash family the batch sketch uses),
    so the streamed sketch is not merely approximately right: because
    bottom-k composes losslessly and order-insensitively
    (bottomk(A u B) == bottomk(bottomk(A) u B)), the streamed state
    EQUALS the batch sketch over all rows seen, in BOTH regimes — the
    exact count below k (saw_all) and the (k-1)/u_k estimator above it
    — which the test pins as exact equality against batch kmv_distinct
    across a checkpoint restart. State is the bounded sorted bottom-k
    hash array, O(k) regardless of stream length. Emits the current
    estimate per batch (update mode)."""
    kk = int(k)
    hashed = values.select(
        F.col(conv_col).alias("conv_id"),
        F.xxhash64(F.col(value_col)).alias("h"),
    ).where(F.col("h").isNotNull())

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        n0 = 0
        hs = np.empty(0, dtype=np.int64)
        if state.exists:
            n0, hs0 = state.get
            hs = np.asarray(hs0, dtype=np.int64)
        chunks = [pdf["h"].to_numpy(np.int64) for pdf in pdfs if len(pdf)]
        if chunks:
            n0 += int(sum(c.size for c in chunks))
            hs = np.unique(np.concatenate([hs] + chunks))[:kk]
        state.update((int(n0), [int(x) for x in hs]))
        n_kept = int(hs.size)
        saw_all = n_kept < kk
        if saw_all:
            est = float(n_kept)
        else:
            u_k = (float(hs[kk - 1]) + 2.0**63) / 2.0**64
            est = float(kk - 1) / u_k
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "n_rows": int(n0),
                    "n_kept": n_kept,
                    "saw_all": saw_all,
                    "est": est,
                }
            ]
        )

    return hashed.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
