"""Structured Streaming surface: the engine's stream-shaped operators.

The reference's incremental mode is a hand-rolled micro-batch loop
(poll MySQL every 10 s, batch of 32, checkpoint id — ST1-ST4,
ReplicationServer.java:348-506). Structured Streaming provides the
same semantics natively: file/Kafka sources, offset checkpointing,
bounded triggers, idempotent foreachBatch sinks. Beyond parity, the
engine exposes the stream-time operators the reference lacks (ST8):
event-time tumbling windows with watermarks and session windows.

For local verification the events parquet drives a bounded stream
(memory sink + processAllAvailable) — the documented pattern for
testing streaming queries without a live bus.

API note: Spark 4's `transformWithStateInPandas` (the successor
arbitrary-state API — typed value/list/map state, timers) needs the
`google.protobuf` state-server protocol, which this container lacks
(worker crashes with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
on import); custom stateful operators here therefore use
`applyInPandasWithState`, which is wire-compatible with the same
state-store files and carries the same semantics.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reair_spark.io import load_table


_EVENTS_SCHEMA_CACHE: dict[str, object] = {}

_STREAM_DF_CACHE: dict = {}


def _memo_stream_df(spark: SparkSession, sf_dir: str, key: str, build):
    """Reuse the BUILT streaming DataFrame across calls of one gate.

    A streaming DataFrame is an immutable logical plan: every
    ``writeStream.start()`` creates a fresh IncrementalExecution that
    re-lists the source and recomputes from the parquet input, so this
    caches plan CONSTRUCTION (a few hundred py4j round-trips per gate
    call, ~0.2-0.45 s measured on the sessionize shape) and never data,
    offsets, or results (r14, guide §1.2). Keyed by applicationId like
    every template memo in this engine; all cached gates read only the
    immutable bench inputs."""
    k = (spark.sparkContext.applicationId, sf_dir, key)
    df = _STREAM_DF_CACHE.get(k)
    if df is None:
        df = build()
        _STREAM_DF_CACHE[k] = df
    return df


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """events table as a file stream, ts normalized to TIMESTAMP.

    The parquet has carried ts as TIMESTAMP(NANOS) (readable only as
    long via nanosAsLong) in some generations and TIMESTAMP(MICROS)
    (NTZ) in others; load_table first (sets the nanosAsLong conf so
    the nanos generation reads at all), then convert whatever arrived
    — long nanos → µs instant, NTZ → instant (session pinned UTC, so
    the cast is value-preserving). Downstream operators always see an
    event-time TIMESTAMP they can watermark directly. The inferred
    schema is cached per sf_dir (r14): inference is a 1-task Spark
    job every one of the 16 streaming gates paid per call, and the
    bench inputs are immutable."""
    load_table(spark, sf_dir, "events")
    raw_schema = _EVENTS_SCHEMA_CACHE.get(sf_dir)
    if raw_schema is None:
        raw_schema = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).schema
        _EVENTS_SCHEMA_CACHE[sf_dir] = raw_schema
    # file-stream sources need a directory; select the one file by glob
    ev = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    import pyspark.sql.types as T

    if isinstance(raw_schema["ts"].dataType, T.LongType):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def _run_to_memory(
    stream_df: DataFrame, mode: str, state_partitions: int = 8
) -> DataFrame:
    """Drain a bounded stream into a memory sink.

    Two floor-dominating confs are pinned for the query's lifetime
    (a streaming query's state partitioning is fixed at its first
    checkpoint, so they must be set at START, not on the session
    factory):

    - ``shuffle.partitions`` → ``state_partitions``: every stateful
      operator materializes one state store per shuffle partition per
      sub-operator; 32 stores × setup cost dominates a bounded run's
      wall clock. Size to key cardinality / executor balance, not the
      relational shuffle width.
    - ``noDataMicroBatches`` off: the extra empty batch exists to
      advance watermarks for append-mode FINALIZATION (e.g. windowed
      aggs in append mode) and timed state cleanup. Every operator
      here emits eagerly (complete-mode aggs, inner joins,
      within-watermark dedup, processing-time state), so the empty
      batch only adds a full state-store load/commit cycle per store.
      An append-mode windowed agg must NOT use this helper with the
      flag off — it would drain before emitting finalized windows.
    """
    spark = stream_df.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            stream_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
    return spark.table(name)


def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window + watermark over the event stream;
    bounded run via memory sink. Complete mode → the final state equals
    the batch groupBy, making this streaming operator oracle-checkable."""
    def build():
        ev = stream_events(spark, sf_dir, max_files_per_trigger=1)
        return (
            ev.select("ts")
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("window_start"), "cnt")
        )

    agg = _memo_stream_df(spark, sf_dir, "hourly_counts", build)
    return _run_to_memory(agg, "complete")


def stream_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized latest-per-key view maintained by the stream — the
    CDC "current state" table (what a MERGE upsert produces) as a
    streaming aggregation: per user, max_by over the (ts, event_id)
    order keeps exactly the newest event's attributes, and complete
    mode serves the whole snapshot each batch.

    Scale shape: state is ONE row per key (not a buffer of events —
    max_by folds incrementally), so the store size is the key
    cardinality regardless of stream volume; ties on ts break on
    event_id, making the snapshot engine-deterministic."""
    def build():
        ev = stream_events(spark, sf_dir, max_files_per_trigger=1)
        last = F.max_by(
            F.struct("ts", "event_id", "event_type", "value"),
            F.struct("ts", "event_id"),
        ).alias("lv")
        return ev.groupBy("user_id").agg(last).select("user_id", "lv.*")

    agg = _memo_stream_df(spark, sf_dir, "latest_state", build)
    out = _run_to_memory(agg, "complete")
    return out.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.round("value", 4).alias("last_value"),
    )


def running_stats(events: DataFrame) -> DataFrame:
    """Custom stateful running statistics per event_type via
    ``applyInPandasWithState``: state carries (n, sum, sumsq) across
    micro-batches — O(1) per key, never a buffer of events — and each
    batch emits the type's totals-so-far (update mode, CDC-style).
    The batch reduction is vectorized numpy; the merge is three adds.

    This is the second custom stateful operator (funnel_detect is
    CEP-shaped: per-key chain state; this one is aggregation-shaped:
    per-key commutative accumulators) — together they cover the two
    state disciplines applyInPandasWithState is for."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        n, s, ss = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdf_iter:
            v = pdf["value"].to_numpy(dtype="float64")
            n += len(v)
            s += float(v.sum())
            ss += float((v * v).sum())
        state.update((n, s, ss))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "s": [s], "ss": [ss]}
        )

    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            outputStructType="event_type string, n long, s double, ss double",
            stateStructType="n long, s double, ss double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-type (count, mean, population variance) over the
    bounded stream; the final emitted totals per type equal the batch
    aggregate. mean/var are derived OUTSIDE the stateful operator from
    the exact (n, Σv, Σv²) sums, so the state stays 3 numbers."""
    from pyspark.sql import Window as W

    agg = _memo_stream_df(
        spark, sf_dir, "running_stats",
        lambda: running_stats(
            stream_events(spark, sf_dir, max_files_per_trigger=1)
        ),
    )
    out = _run_to_memory(agg, "update")
    # last update per type = the row with the largest n
    wl = W.partitionBy("event_type").orderBy(F.desc("n"))
    final = out.withColumn("rn", F.row_number().over(wl)).where(F.col("rn") == 1)
    from reair_spark.datapipe.common import round_like_duckdb

    mean = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - mean * mean
    return final.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        # Σv/n over few-decimal values is a rational that can sit on a
        # decimal tie — round with DuckDB's exact convention
        round_like_duckdb(mean, 4).alias("mean"),
        round_like_duckdb(var, 4).alias("var_pop"),
    ).orderBy("event_type")


def stream_topk_trending(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Trending top-k per tumbling hour: windowed per-type counts run
    as the stateful streaming agg (watermark + tumbling window, same
    state shape as `stream_hourly_counts` but keyed on
    (window, event_type)); the per-window rank is a finalize step over
    the drained complete-mode state — |windows|×|types| rows, metadata-
    sized at any stream volume, so ranking there instead of inside the
    stream avoids a second stateful operator (flatMapGroupsWithState
    top-k) whose per-batch state churn dwarfs the table it maintains."""
    from pyspark.sql import Window as W

    def build():
        ev = stream_events(spark, sf_dir, max_files_per_trigger=1)
        return (
            ev.select("event_type", "ts")
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"))
            .select(
                F.col("w.start").alias("window_start"), "event_type", "cnt"
            )
        )

    agg = _memo_stream_df(spark, sf_dir, "topk_trending", build)
    out = _run_to_memory(agg, "complete")
    wk = W.partitionBy("window_start").orderBy(F.desc("cnt"), "event_type")
    return (
        out.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= k)
        .select(
            "window_start", "event_type", "cnt",
            F.col("rk").cast("long").alias("rk"),
        )
    )


def stream_sessionize(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Session windows per user (ST8 — absent in the reference's
    totally-ordered stream; native in Spark)."""
    def build():
        ev = stream_events(spark, sf_dir, max_files_per_trigger=1)
        return (
            ev.select("user_id", "ts")
            .withWatermark("ts", "1 hour")
            .groupBy("user_id", F.session_window("ts", gap).alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )

    agg = _memo_stream_df(spark, sf_dir, f"sessionize:{gap}", build)
    return _run_to_memory(agg, "complete")


def funnel_detect(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Ordered-funnel detection per user — CEP-lite pattern matching,
    which Spark has no built-in for (no MATCH_RECOGNIZE) and the
    reference's totally-ordered single stream never needed. Custom
    stateful operator via ``applyInPandasWithState``: state carries
    (stage, bound) per user across micro-batches; a user completes at
    the first ``steps[-1]`` event strictly after the greedy-earliest
    chain of prior steps. Emits one row per user at completion.

    Greedy-earliest is exact for first-completion semantics: the
    minimal valid completion time is reached by taking, at each stage,
    the minimal event time strictly greater than the previous stage's
    bound (exchange argument) — so each batch advances with vectorized
    per-step ``min`` instead of a per-row scan.

    Cross-batch correctness assumes per-key in-order delivery (batch
    N+1 events not earlier than batch N), the reference's audit-log
    contract (id-ordered stream, ReplicationServer.java:348-420). For
    out-of-order buses, compose with a watermark-sorted pre-stage.

    ``events`` must be a streaming DataFrame with columns
    (user_id long, event_type string, ts long) — ts in any monotone
    integer unit (µs-epoch here).

    ``ttl_minutes`` bounds state: a key idle that long is dropped
    (processing-time timeout). Unbounded key spaces — the 100 TB
    reality — MUST set it or per-user state grows forever; the trade
    is that a funnel spanning a gap longer than the TTL restarts.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    n_steps = len(steps)
    step_list = list(steps)

    def fn(key, pdf_iter, state):
        import pandas as pd

        if ttl_minutes is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            stage, bound = state.get
        else:
            stage, bound = 0, -(1 << 62)
        rows = []
        if stage < n_steps:
            pdf = pd.concat(list(pdf_iter), ignore_index=True)
            while stage < n_steps:
                cand = pdf.loc[
                    (pdf["event_type"] == step_list[stage]) & (pdf["ts"] > bound),
                    "ts",
                ]
                if cand.empty:
                    break
                bound = int(cand.min())
                stage += 1
            if stage == n_steps:
                rows.append((key[0], bound))
        else:
            for _ in pdf_iter:  # drain; user already completed
                pass
        state.update((stage, bound))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "completed_ts_long"])

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "event_type", "ts")
        .where(F.col("event_type").isin(step_list))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, completed_ts_long long",
            stateStructType="stage int, bound long",
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )


def stream_funnel(
    spark: SparkSession, sf_dir: str, state_partitions: int = 8
) -> DataFrame:
    """view→click→purchase funnel over the bounded event stream; the
    normalized event-time TIMESTAMP is lowered to long µs for the
    stateful operator (its state schema wants a monotone integer) and
    raised back to a timestamp only at the output edge.

    ``state_partitions`` pins the stateful operator's store count for
    THIS query (see ``_run_to_memory`` — fixed at first checkpoint, so
    it must be sized deliberately)."""
    agg = _memo_stream_df(
        spark, sf_dir, "funnel",
        lambda: funnel_detect(
            stream_events(spark, sf_dir, max_files_per_trigger=1)
            .withColumn("ts", F.unix_micros("ts"))
        ),
    )
    out = _run_to_memory(agg, "update", state_partitions)
    return out.select(
        "user_id",
        F.timestamp_micros("completed_ts_long").alias("completed_ts"),
    )


def stream_order_event_join(
    spark: SparkSession, sf_dir: str, state_partitions: int = 8
) -> DataFrame:
    """Stream-stream interval inner join — orders stream ⋈ events
    stream on (customer, event-time ∈ [order-time, +2 days)), both
    sides watermarked so the join state is bounded: an order's buffer
    entry is dropped once the event watermark passes its 2-day window
    (Spark derives the state cleanup from the time-range predicate).
    Inner joins emit eagerly, so draining the bounded streams yields
    exactly the batch join — oracle-checkable. Event days are remapped
    onto the order date domain exactly as `asof_orders_events` does
    (deterministic event_id → day mapping)."""
    def build():
        ev = stream_events(spark, sf_dir).select(
            "event_id",
            "user_id",
            (
                F.lit("1992-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(F.col("event_id") % 2400) * 86400)
            ).alias("ets"),
        )
        raw_orders = spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        ).schema
        orders = (
            spark.readStream.schema(raw_orders)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "orders.parquet")
            .parquet(sf_dir)
            # parquet NTZ → TIMESTAMP: watermarks require an instant
            # type; the session is pinned UTC so the cast is
            # value-preserving
            .select(
                "o_orderkey", "o_custkey",
                F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            )
        )
        return (
            orders.withWatermark("o_orderdate", "1 day")
            .join(
                ev.withWatermark("ets", "1 day"),
                (F.col("o_custkey") == F.col("user_id"))
                & (F.col("ets") >= F.col("o_orderdate"))
                & (F.col("ets")
                   < F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS")),
            )
            .select("o_orderkey", "event_id", "ets")
        )

    j = _memo_stream_df(spark, sf_dir, "order_event_join", build)
    # state-store count pinned by _run_to_memory (a stream-stream join
    # materializes ~4 state sub-stores per shuffle partition)
    return _run_to_memory(j, "append", state_partitions)


def stream_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joined to the
    static customer dimension (user_id → c_custkey), aggregated per
    market segment. Stream-static joins are stateless — the static
    side broadcasts into every micro-batch, no watermark, no state
    store — which is why dimension enrichment is the FIRST join to
    reach for on a stream; the drained result equals the batch join
    exactly."""
    def build():
        ev = stream_events(spark, sf_dir).select("event_id", "user_id")
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        return (
            ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    agg = _memo_stream_df(spark, sf_dir, "enrich_events", build)
    return _run_to_memory(agg, "complete")


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup — ``dropDuplicatesWithinWatermark`` keyed
    on event_id, with the dedup state evicted once the watermark passes
    (bounded memory on an infinite stream; plain dropDuplicates would
    hold every key forever). Duplicate delivery is simulated by
    unioning two independent readers of the same source — the at-least-
    once shape of any real bus — and the drained output equals the
    batch distinct."""
    def build():
        def one_reader():
            return stream_events(spark, sf_dir).select(
                "event_id", "user_id", "ts"
            )

        return (
            one_reader().union(one_reader())
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id", "user_id")
        )

    out = _memo_stream_df(spark, sf_dir, "dedup_events", build)
    return _run_to_memory(out, "append")


def stream_replicate(
    spark: SparkSession,
    events_stream: DataFrame,
    src_root: str,
    dest_root: str,
    state_dir: str,
    checkpoint_dir: str,
) -> None:
    """The full incremental replication loop AS a Structured Streaming
    query: each micro-batch compiles audit events to jobs, persists the
    PENDING transitions, executes targeted replication, and persists
    the terminal transitions (ST1-ST7 end-to-end).

    Delivery semantics: the checkpoint gives at-least-once batch
    delivery; `execute_jobs` is idempotent (targeted replication
    re-reads the current src object and the JobStore is append-only
    last-writer-wins), so a replayed batch converges to the same dest
    state — the same exactly-once-ish contract the reference builds by
    hand (ReplicationServer.restoreReplicationJob:240-328). On a real
    bus this is `readStream.format("kafka")` + `trigger(processingTime=
    ...)` with NO code change in the sink."""
    from reair_spark.events import _job_cols, compile_jobs, execute_jobs
    from reair_spark.state import JobStore

    job_store = JobStore(spark, f"{state_dir}/replication_jobs")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # one computation, three sequential consumers (pending
        # persist, execute's collect, terminal persist) — same
        # race-free lazy-persist discipline as run_incremental
        jobs = compile_jobs(batch_df).persist()
        job_store.append(jobs.select(*_job_cols()))
        executed = execute_jobs(spark, jobs, src_root, dest_root)
        job_store.append(executed.select(*_job_cols()))
        jobs.unpersist()

    q = (
        events_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_compile_jobs_foreachbatch(
    spark: SparkSession,
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """ST4 exactly-once-ish sink: the compile step inside foreachBatch,
    writing job rows partitioned by batch id — replays of a batch
    overwrite the same directory (idempotent), matching the persisted-
    job semantics of PersistedJobInfoStore."""
    from reair_spark.events import compile_jobs

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        jobs = compile_jobs(batch_df)
        # the hive-style directory name IS the batch_id column on
        # read-back (partition discovery); writing it as a data column
        # too would shadow-duplicate it
        (
            jobs.write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    q = (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# streaming cross-corpus dedup: the production shape of continuous
# crawl ingestion — micro-batches of new documents deduped against a
# PERSISTED digest corpus the stream itself maintains across batches
# (the streaming twin of datapipe.dedup.dedup_against_corpus)
# ---------------------------------------------------------------------------


def seed_digest_corpus(
    spark: SparkSession, reference: DataFrame, corpus_dir: str
) -> None:
    """Write the reference corpus's digest table as the initial state
    of a streaming dedup corpus: one (fp, doc_id) row per DISTINCT
    content digest, under the ``batch_id=-1`` partition (candidate
    batches land at batch_id ≥ 0, so seed rows are filterable on
    read). Digests are 0.03% of corpus bytes — the persisted state is
    file-count-sized, never content-sized."""
    (
        reference.select(F.md5("text").alias("fp"),
                         F.col("doc_id").cast("long").alias("doc_id"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .write.mode("overwrite")
        .parquet(os.path.join(corpus_dir, "batch_id=-1"))
    )


def dedup_corpus_sink(spark: SparkSession, corpus_dir: str):
    """foreachBatch body: anti-join the micro-batch against EVERY
    digest the corpus already holds (seed + all previously accepted
    batches), then append the batch's accepted digests so they
    suppress later batches. Per-batch work is digest-sized: the batch
    collapses to (fp, min doc_id) before the join, and the corpus side
    is a digest column scan. Idempotent under ST4 batch replay: the
    corpus read EXCLUDES the batch's own ``batch_id=N`` partition —
    without that filter a crash-replayed batch would anti-join against
    its own previous output, accept nothing, and overwrite the
    partition with empty rows; with it the replay recomputes exactly
    the original accepted set and the overwrite is a no-op. The
    partition-column predicate prunes at the directory level."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        known = (
            spark.read.parquet(corpus_dir)
            .where(F.col("batch_id") != batch_id)
            .select("fp")
        )
        batch = (
            batch_df.select(
                F.md5("text").alias("fp"),
                F.col("doc_id").cast("long").alias("doc_id"),
            )
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        accepted = batch.join(known, "fp", "left_anti")
        (
            accepted.write.mode("overwrite")
            .parquet(os.path.join(corpus_dir, f"batch_id={batch_id}"))
        )

    return sink


def stream_dedup_against_corpus(
    spark: SparkSession,
    candidates: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
) -> None:
    """Run the checkpointed dedup stream to exhaustion (availableNow;
    on a real bus: format('kafka') + processingTime trigger, no sink
    change). ``corpus_dir`` must be seeded first."""
    q = (
        candidates.writeStream
        .foreachBatch(dedup_corpus_sink(spark, corpus_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def accepted_candidates(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The stream's survivors: every candidate digest accepted by some
    batch (batch_id ≥ 0 — the seed partition is the reference)."""
    return (
        spark.read.parquet(corpus_dir)
        .where(F.col("batch_id") >= 0)
        .select("doc_id", "fp")
    )


# ---------------------------------------------------------------------------
# streaming CDC → SCD2: maintain a slowly-changing-dimension type-2
# history table from a change stream, as a VERSIONED copy-on-write
# parquet table (Delta-style: one full snapshot per micro-batch →
# replay idempotency and batch-level time travel for free)
# ---------------------------------------------------------------------------

SCD2_SCHEMA = (
    "key long, val double, valid_from timestamp_ntz, from_seq long, "
    "valid_to timestamp_ntz, is_current boolean"
)


def scd2_apply_batch(
    spark: SparkSession, state: DataFrame, changes: DataFrame
) -> DataFrame:
    """Pure SCD2 merge: current history + a batch of changes
    (key, ts, seq, val) → new history. Each change opens a version
    row valid [its ts, next change's ts); the key's previously-open
    row closes at the batch's first change. Ties on ts break by seq —
    the (ts, event_id) total order every stateful op here uses.

    Contract: per-key IN-ORDER delivery across batches (each change's
    ts ≥ the key's open valid_from) — the guarantee a keyed CDC bus
    provides per partition; within a batch any order is fine (the
    window sorts). Scale: one window over the BATCH (batch-sized),
    one join against current rows keyed by key; untouched history
    passes through untouched."""
    from pyspark.sql import Window as W

    ch = changes.select(
        F.col("key").cast("long").alias("key"),
        F.col("val").cast("double").alias("val"),
        F.col("ts").alias("valid_from"),
        F.col("seq").cast("long").alias("from_seq"),
    )
    w = W.partitionBy("key").orderBy("valid_from", "from_seq")
    new_rows = ch.select(
        "key", "val", "valid_from", "from_seq",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.lead("valid_from").over(w).isNull().alias("is_current"),
    )
    first_change = ch.groupBy("key").agg(
        F.min(F.struct("valid_from", "from_seq")).alias("fc")
    ).select("key", F.col("fc.valid_from").alias("close_at"))
    closed = (
        state.where(F.col("is_current"))
        .join(first_change, "key")
        .select(
            "key", "val", "valid_from", "from_seq",
            F.col("close_at").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    untouched = state.join(
        first_change.select("key"), "key", "left_anti"
    ).unionByName(state.where(~F.col("is_current")).join(
        first_change.select("key"), "key", "left_semi"
    ))
    return untouched.unionByName(closed).unionByName(new_rows)


def _scd2_versions(table_dir: str) -> list[int]:
    import os as _os

    try:
        return sorted(
            int(d[1:]) for d in _os.listdir(table_dir)
            if d.startswith("v") and d[1:].isdigit()
        )
    except FileNotFoundError:
        return []


def scd2_state(
    spark: SparkSession, table_dir: str, before: int | None = None
) -> DataFrame:
    """The table at its latest committed version (or the latest
    version < ``before`` — what a replaying batch must read). Absent
    table = empty history."""
    versions = [
        v for v in _scd2_versions(table_dir)
        if before is None or v < before
    ]
    if not versions:
        from reair_spark.io import rows_df

        return rows_df(spark, [], SCD2_SCHEMA)
    return spark.read.parquet(f"{table_dir}/v{versions[-1]:09d}")


def scd2_as_of(spark: SparkSession, table_dir: str, ts) -> DataFrame:
    """Validity-time AS OF read over the latest snapshot: the row
    version live at ``ts`` per key ([valid_from, valid_to) interval
    containment — the read side of SCD2)."""
    s = scd2_state(spark, table_dir)
    return s.where(
        (F.col("valid_from") <= F.lit(ts))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ts)))
    )


def stream_cdc_scd2(
    spark: SparkSession,
    changes: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
) -> None:
    """Run the CDC stream to exhaustion, committing one copy-on-write
    snapshot per micro-batch (``v{batch_id}``). Replays read the same
    predecessor version and overwrite their own — idempotent under
    ST4 at-least-once batch delivery — and the version chain is
    batch-level time travel. COW rewrites the whole dimension per
    batch: right-sized for dimension tables (small relative to facts
    — the reason SCD2 applies at all); a 100 TB-fact deployment
    partitions the snapshot by key bucket and rewrites only touched
    buckets, same protocol."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        state = scd2_state(spark, table_dir, before=batch_id)
        out = scd2_apply_batch(spark, state, batch_df)
        out.write.mode("overwrite").parquet(
            f"{table_dir}/v{batch_id:09d}"
        )

    q = (
        changes.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# streaming zone-map ingestion: continuous clustered ingestion with
# incremental manifest maintenance — the streaming twin of
# sources.write_zonemapped. Each micro-batch appends its data under
# ingest=<batch_id> (dynamic partition overwrite ⇒ replay-idempotent)
# and publishes one metadata-sized manifest delta; zonemap_scan merges
# deltas at plan time, and because every per-bucket statistic is a
# monoid the merged view is batch-boundary-INVARIANT (pytest-enforced:
# 1-batch == N-batch == one-shot write_zonemapped).
# ---------------------------------------------------------------------------


def stream_zonemap_ingest(
    spark: SparkSession,
    stream_df: DataFrame,
    location: str,
    bucket_col: str,
    stat_cols: list,
    checkpoint_dir: str,
    bloom_cols: list | None = None,
    compact_every: int | None = None,
    fold_every: int | None = None,
) -> None:
    """Run the clustered-ingestion stream to exhaustion (availableNow;
    on a real bus: format('kafka') + processingTime trigger, no sink
    change). Exactly-once lands on idempotence: a replayed batch
    rewrites its OWN ingest partition and its OWN manifest delta.

    ``compact_every`` is the auto-OPTIMIZE policy (VERDICT r9 ask #8):
    without it, continuous ingestion grows one manifest delta and one
    small-file layer per batch FOREVER — plan-time merge keeps answers
    right, but file and delta counts grow without bound. With it, the
    sink invokes :func:`sources.zonemap_compact` from foreachBatch
    whenever the delta count reaches the threshold, collapsing history
    to one ingest. Replay safety across the compaction boundary comes
    from the layout descriptor's ``compacted_through`` high-water
    mark: a replayed batch whose ingest was already folded is a no-op,
    never a duplication (pytest-pinned batch-boundary invariance
    ACROSS a mid-stream compaction).

    ``fold_every`` is the cheap half of the Iceberg maintenance split
    (rewrite_manifests often, rewrite_data_files rarely): when the
    delta count reaches it, the sink folds the MANIFEST only
    (:func:`sources.zonemap_rewrite_manifests`) — metadata-sized work
    every N batches keeps plan cost flat in stream lifetime, while
    the data files wait for the (much rarer, data-sized)
    ``compact_every`` pass. Replay safety is the same
    ``compacted_through`` no-op; crash-at-any-point convergence is
    the fold's own refuse-only horizon discipline. With both set,
    fold_every should be the smaller — folds keep the delta count
    low, so size compact_every against small-FILE growth instead.
    The two policies watch DIFFERENT metrics for exactly that reason:
    folds trigger on the manifest delta count (what folding bounds),
    compaction on the ``data/ingest=*`` layer count (what compaction
    bounds) — a fold resets the former to 1 but never the latter, so
    compaction still fires under an aggressive fold cadence."""
    from reair_spark.fs import fs_for
    from reair_spark.sources import (
        append_zonemapped,
        zonemap_compact,
        zonemap_rewrite_manifests,
    )

    loc = location.rstrip("/")

    def feed(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_zonemapped(
            batch_df,
            location,
            bucket_col,
            stat_cols,
            bloom_cols=bloom_cols,
            ingest_id=int(batch_id),
        )
        if compact_every is not None or fold_every is not None:
            fs = fs_for(loc)

            def n_ingest_layers(sub: str) -> int:
                try:
                    return sum(
                        1 for e in fs.scandir(f"{loc}/{sub}")
                        if e.name.startswith("ingest=")
                    )
                except FileNotFoundError:
                    return 0

            # compaction triggers on the DATA ingest-layer count, not
            # the manifest delta count: every fold resets the delta
            # count to 1, so with the recommended fold_every <
            # compact_every a delta-count trigger could NEVER reach
            # compact_every and data-file compaction was silently
            # disabled (ADVICE r12 #2). Small-FILE growth — the thing
            # compact_every exists to bound — lives in the data layer,
            # which folds never touch and compaction collapses to one.
            if (compact_every is not None
                    and n_ingest_layers("data") >= int(compact_every)):
                zonemap_compact(batch_df.sparkSession, location)
            elif (fold_every is not None
                    and n_ingest_layers("manifest") >= int(fold_every)):
                zonemap_rewrite_manifests(batch_df.sparkSession, location)

    q = (
        stream_df.writeStream
        .foreachBatch(feed)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_zonemap_upsert(
    spark: SparkSession,
    stream_df: DataFrame,
    location: str,
    key_cols: list,
    checkpoint_dir: str,
    compact_every: int | None = None,
    fold_every: int | None = None,
) -> None:
    """Streaming merge-on-read UPSERT sink (the Flink→Iceberg
    upsert-mode shape): each micro-batch lands through
    :func:`sources.zonemap_upsert_mor` as ONE atomic commit — a plain
    append of the batch plus its equality-delete key set — so a CDC
    stream of key updates costs O(batch) writes per trigger instead
    of :func:`sources.zonemap_merge`'s copy-on-write rewrite of every
    touched bucket (at 100 TB: kilobytes of keys every 10 s versus
    re-shuffling hot buckets every 10 s forever). Latest-version
    reads fall out of the scan's key-mask; the read-side join debt is
    cleared by the same ``compact_every`` policy as the append sink
    (compaction reads post-mask rows and drops the delete files).

    Exactly-once lands on the same idempotence as every sink here:
    the batch id IS the ingest id, so a replayed batch rewrites its
    own data dir, its own delete files, and its own manifest delta.
    The layout must already exist (a CDC upsert stream starts from an
    initial snapshot — write it with :func:`sources.write_zonemapped`
    first); the clustering column must be functionally dependent on
    ``key_cols``, MERGE's contract."""
    from reair_spark.fs import fs_for
    from reair_spark.sources import (
        zonemap_compact,
        zonemap_rewrite_manifests,
        zonemap_upsert_mor,
    )

    import reair_spark.sources as _S

    loc = location.rstrip("/")

    def feed(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # batch ids start at 0 but the layout pre-exists (the initial
        # snapshot owns ingest 0), so the stream's ingest ids are
        # batch_id + a base RECORDED in the descriptor on first use —
        # persisted, so a replay after restart maps the same batch to
        # the same ingest (the idempotence identity), instead of
        # re-deriving a different base from whatever ids exist then.
        meta = _S._read_layout_meta(loc) or {}
        base = meta.get("upsert_stream_base")
        if base is None:
            cand = _S._next_ingest_id(loc)
            meta = _S._meta_cas_update(
                loc,
                lambda m: (dict(m or {}, upsert_stream_base=int(cand))
                           if (m or {}).get("upsert_stream_base")
                           is None else None),
            ) or {}
            base = meta.get("upsert_stream_base", cand)
        zonemap_upsert_mor(
            batch_df.sparkSession, loc, batch_df, list(key_cols),
            ingest_id=int(base) + int(batch_id),
        )
        if compact_every is not None or fold_every is not None:
            fs = fs_for(loc)

            def n_ingest_layers(sub: str) -> int:
                try:
                    return sum(
                        1 for e in fs.scandir(f"{loc}/{sub}")
                        if e.name.startswith("ingest=")
                    )
                except FileNotFoundError:
                    return 0

            # same maintenance split as stream_zonemap_ingest; for an
            # upsert stream compaction ALSO clears the accumulated
            # key masks (the read-side join debt), so compact_every
            # matters more here than on the append sink
            if (compact_every is not None
                    and n_ingest_layers("data") >= int(compact_every)):
                zonemap_compact(batch_df.sparkSession, loc)
            elif (fold_every is not None
                    and n_ingest_layers("manifest") >= int(fold_every)):
                zonemap_rewrite_manifests(batch_df.sparkSession, loc)

    q = (
        stream_df.writeStream
        .foreachBatch(feed)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def zonemap_cdf_apply(
    spark: SparkSession,
    src_location: str,
    dest_location: str,
    from_ingest: int,
    to_ingest: int | None = None,
) -> dict:
    """Apply one change-feed RANGE of a source layout to a dest layout
    (the Delta-CDF→downstream-sync primitive, factored out of the
    cdf_incremental_sync gate so the streaming pump and any batch
    syncer share one implementation): the change rows of
    ``(from_ingest, to_ingest]`` identify WHICH buckets moved — cost
    proportional to the diff — and those dest buckets are then set to
    the source's as-of(``to_ingest``) STATE of exactly those buckets
    via ``zonemap_replace_buckets``. At 100 TB a day of commits ships
    a day's touched buckets, never a snapshot.

    State-based on purpose: replaying the same range (the
    crash-between-apply-and-offset window) rewrites the same buckets
    to the same as-of state, so the apply is idempotent for EVERY
    commit mix — a delta-based ``dest + inserts − deletes`` replay
    would double-apply inserts whose first application already
    landed (the exactly-once discipline every sink here builds on).
    Requires src and dest to share the clustering column (the sync
    seeds dest FROM src, so that holds by construction).

    Returns {"n_commits", "n_changes", "n_buckets_synced"}."""
    from pyspark.sql import functions as F

    from reair_spark.sources import (
        _read_layout_meta,
        zonemap_changes,
        zonemap_replace_buckets,
        zonemap_scan,
    )

    ch, st = zonemap_changes(
        spark, src_location, from_ingest=from_ingest,
        to_ingest=to_ingest,
    )
    if st["n_commits"] == 0:
        return {"n_commits": 0, "n_changes": 0, "n_buckets_synced": 0}
    bcol = (_read_layout_meta(dest_location.rstrip("/")) or {})[
        "bucket_col"
    ]
    # ONE action: the change count and the affected-bucket set come
    # from the same aggregate over the feed — its ONLY consumer, so
    # the eager localCheckpoint the multi-consumer r13 shape needed
    # was a pure extra materialization job once the count and bucket
    # set fused into this aggregate (r14). collect_set skips
    # NULLs, which is safe here by construction: the clustering column
    # is non-null on every zonemap layout (write_zonemapped derives it
    # from key expressions and partitionBy would otherwise route the
    # row to __HIVE_DEFAULT_PARTITION__, which no manifest delta ever
    # records — such a row could not have entered the feed). A null
    # bucket would have been equally unsyncable under the prior
    # distinct().collect(): str(None) matches no partition directory.
    head = ch.agg(
        F.count(F.lit(1)).alias("__n"),
        F.collect_set(F.col(bcol).cast("string")).alias("__b"),
    ).collect()[0]
    n_changes = int(head["__n"])
    buckets = sorted(head["__b"])
    to = st["commit_ingests"][-1] if to_ingest is None else to_ingest
    src_state, _ = zonemap_scan(spark, src_location, buckets=buckets,
                                max_ingest=int(to))
    # no caller-side checkpoint: zonemap_replace_buckets eagerly
    # checkpoints its input itself (the commit pin), so one here was a
    # second materialization of the same frame (r14)
    rb = zonemap_replace_buckets(spark, dest_location,
                                 src_state.drop("ingest"), buckets)
    return {
        "n_commits": st["n_commits"],
        "n_changes": n_changes,
        "n_buckets_synced": rb["n_buckets_written"]
        + rb["n_buckets_tombstoned"],
    }


def _cdf_offset_read(checkpoint_dir: str) -> int | None:
    import json

    from reair_spark.fs import fs_for

    cp = checkpoint_dir.rstrip("/")
    try:
        with fs_for(cp).open_read(f"{cp}/cdf-offset.json") as fh:
            return int(json.loads(fh.read().decode("utf-8"))[
                "last_ingest"
            ])
    except (FileNotFoundError, ValueError, KeyError):
        return None


def _cdf_offset_write(checkpoint_dir: str, last_ingest: int) -> None:
    import json
    import uuid

    from reair_spark.fs import fs_for

    cp = checkpoint_dir.rstrip("/")
    fs = fs_for(cp)
    fs.mkdirs(cp)
    tmp = f"{cp}/cdf-offset.json.tmp_{uuid.uuid4().hex[:8]}"
    fh = fs.create(tmp)
    fh.write(json.dumps({"last_ingest": int(last_ingest)})
             .encode("utf-8"))
    fs.flush_and_sync(fh)
    fh.close()
    fs.rename(tmp, f"{cp}/cdf-offset.json")


def stream_zonemap_changes(
    spark: SparkSession,
    location: str,
    checkpoint_dir: str,
    apply_fn,
    initial: str | int = "snapshot",
) -> dict:
    """Incrementally CONSUME a zonemap layout's change feed — the
    streaming CDF source (Delta's ``readChangeFeed`` streaming shape,
    expressed as the same micro-batch pump every external-offset
    source here uses): each call reads the commits that landed since
    the checkpointed offset, hands them to ``apply_fn(changes_df,
    from_ingest, to_ingest)``, and advances the offset — AFTER the
    apply, so a crash between the two replays the range and
    exactly-once lands on the apply's idempotence (the same contract
    as every foreachBatch sink in this module; pair with
    :func:`zonemap_cdf_apply`, which is idempotent per range).

    ``initial`` picks the first batch when no offset exists yet:
    ``"snapshot"`` hands the current table state as one all-inserts
    batch stamped with the current commit id (Delta's
    startingVersion=0 semantics without replaying expired history);
    ``"latest"`` skips existing data and consumes only future
    commits; an int starts right after that ingest id (refused by
    the feed itself when that history has been folded/vacuumed away
    — the expireSnapshots contract).

    The offset is a tiny JSON under ``checkpoint_dir`` written via
    tmp+rename through the fs seam; the current head is the layout's
    newest COMMITTED id (staged write-audit-publish commits are
    invisible here exactly as they are to every reader — they enter
    the feed only when published, at their publish order).

    Returns {"from_ingest", "to_ingest", "n_commits"} for the call
    (n_commits 0 = caught up; schedule the next call on the
    ingestion cadence)."""
    from pyspark.sql import functions as F

    from reair_spark.sources import (
        _dmanifest_delta_ids,
        _manifest_delta_ids,
        _read_layout_meta,
        zonemap_changes,
        zonemap_scan,
    )

    loc = location.rstrip("/")
    # list BEFORE the descriptor read (the stage-race pin): a commit
    # staged after this listing cannot enter `committed` through a
    # staged list that predates it
    listed = set(_manifest_delta_ids(loc)) | set(
        _dmanifest_delta_ids(loc)
    )
    meta = _read_layout_meta(loc) or {}
    staged = {int(i) for i in meta.get("staged_ingests") or []}
    committed = listed - staged
    head = max(committed) if committed else -1
    offset = _cdf_offset_read(checkpoint_dir)
    if offset is None:
        if initial == "snapshot":
            cur, _ = zonemap_scan(spark, loc)
            batch = cur.drop("ingest").select(
                "*",
                F.lit("insert").alias("_change_type"),
                F.lit(head).cast("int").alias("_commit_ingest"),
            )
            apply_fn(batch, -1, head)
            _cdf_offset_write(checkpoint_dir, head)
            return {"from_ingest": -1, "to_ingest": head,
                    "n_commits": len(committed)}
        if initial == "latest":
            _cdf_offset_write(checkpoint_dir, head)
            return {"from_ingest": head, "to_ingest": head,
                    "n_commits": 0}
        offset = int(initial)
    if head < offset:
        # the source's newest commit sits BELOW our checkpoint: the
        # table was rolled back (freed ids may be reused for NEW
        # data the monotone cursor would silently skip). Fail loudly
        # — the Delta/Iceberg streaming contract for non-append
        # table rewrites — and let the operator reset the checkpoint
        # or reseed the downstream.
        raise ValueError(
            f"zonemap change stream on {loc}: checkpointed offset "
            f"{offset} is above the newest committed ingest {head} — "
            "the source was rolled back; delete the checkpoint and "
            "re-seed (initial='snapshot') or restart from an "
            "explicit ingest"
        )
    if head == offset:
        return {"from_ingest": offset, "to_ingest": offset,
                "n_commits": 0}
    ch, st = zonemap_changes(spark, loc, from_ingest=offset,
                             to_ingest=head)
    apply_fn(ch, offset, head)
    _cdf_offset_write(checkpoint_dir, head)
    return {"from_ingest": offset, "to_ingest": head,
            "n_commits": st["n_commits"]}
