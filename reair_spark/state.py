"""Persisted engine state: checkpoint KV + job-state tables.

Port of the reference's MySQL state (main/src/main/resources/
create_tables.sql:1-33 — ``key_value`` + ``replication_jobs``;
PersistedJobInfoStore incremental/db/PersistedJobInfoStore.java:
107-320, DbKeyValueStore):

- KeyValueStore: single-writer driver-side map (carries
  ``last_persisted_id`` — ST1's source offset, ReplicationServer
  .java:63-65). Atomic-rename JSON; a cluster deployment swaps this
  for a metastore/JDBC-backed class with the same three methods.
- JobStore: append-only parquet log of job-state transitions
  (PENDING→RUNNING→{SUCCESSFUL,FAILED,NOT_COMPLETABLE,ABORTED});
  current state = latest transition per job id (window), so recovery
  re-queues everything non-terminal (ST4 — ReplicationServer
  .restoreReplicationJob:240-328). Append-only + last-writer-wins
  makes retries idempotent without transactions.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

TERMINAL_STATES = ("SUCCESSFUL", "FAILED", "NOT_COMPLETABLE", "ABORTED")

JOB_SCHEMA = (
    "job_id long, seq long, operation string, status string, "
    "db string, table string, partition_names array<string>, "
    "rename_to_db string, rename_to_table string, src_event_id long, "
    "create_time timestamp"
)


class KeyValueStore:
    """key_value table port: get/set with atomic-rename persistence."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as fh:
            return json.load(fh)

    def get(self, key: str, default: str | None = None) -> str | None:
        return self._load().get(key, default)

    def set(self, key: str, value: str) -> None:
        data = self._load()
        data[key] = value
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as fh:
            json.dump(data, fh)
        os.replace(tmp, self.path)


class JobStore:
    """replication_jobs port: append-only transition log in parquet."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._recover_compaction()
        # resume seq after the persisted log's max: a fresh store writing
        # seq=1 over a log whose rows reach seq=N would lose every
        # latest-transition race, leaving requeued jobs PENDING forever
        self._seq = 0
        if os.path.exists(path):
            row = spark.read.schema(JOB_SCHEMA).parquet(path)\
                .agg(F.max("seq")).collect()[0]
            self._seq = int(row[0] or 0)

    def _recover_compaction(self) -> None:
        """Finish an interrupted compact(). The two-rename swap has a
        window — after ``log → .__old`` and before
        ``.__compacting → log`` — where the canonical path is ABSENT;
        since an absent log otherwise reads as an empty store, a crash
        there would silently drop every job (including non-terminal
        ones ST4 must re-queue) and reset max seq. Recovery rule: if
        the canonical path is missing, promote the complete snapshot
        (``.__compacting``, fully written before either rename) when
        present, else fall back to the untouched old log; only then
        delete leftovers. If the canonical path exists, the leftovers
        are stale (crash after the second rename) and are removed."""
        import shutil

        tmp = f"{self.path}.__compacting"
        old = f"{self.path}.__old"
        if not os.path.exists(self.path):
            if os.path.exists(tmp):
                os.replace(tmp, self.path)
            elif os.path.exists(old):
                os.replace(old, self.path)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

    def append(self, jobs: DataFrame) -> None:
        self._seq += 1
        jobs = jobs.withColumn("seq", F.lit(self._seq).cast("long"))
        if "create_time" not in jobs.columns:
            jobs = jobs.withColumn("create_time", F.current_timestamp())
        jobs.write.mode("append").parquet(self.path)

    def append_rows(self, rows: list) -> None:
        """Driver-side micro-append for already-collected row sets.

        The transition log's appends are metadata-scale by
        construction (≤ one audit batch of jobs), so a full Spark job
        + parquet commit protocol per append is pure scheduling floor
        — two of the ~20 jobs in the incremental e2e profile (VERDICT
        r12 ask #4). One pyarrow file write lands the same columns in
        the same directory, readable by every existing consumer
        (current / incomplete / status_summary / compact). ``rows``
        may be pyspark Rows or plain dicts; a missing ``create_time``
        is stamped here exactly as :meth:`append` stamps it."""
        import datetime as _dt
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        if not rows:
            return
        self._seq += 1
        now = _dt.datetime.now(_dt.timezone.utc)
        dicts = [
            dict(r) if isinstance(r, dict) else r.asDict() for r in rows
        ]
        schema = pa.schema([
            ("job_id", pa.int64()),
            ("seq", pa.int64()),
            ("operation", pa.string()),
            ("status", pa.string()),
            ("db", pa.string()),
            ("table", pa.string()),
            ("partition_names", pa.list_(pa.string())),
            ("rename_to_db", pa.string()),
            ("rename_to_table", pa.string()),
            ("src_event_id", pa.int64()),
            ("create_time", pa.timestamp("us", tz="UTC")),
        ])
        cols: dict[str, list] = {f.name: [] for f in schema}
        for d in dicts:
            for name in cols:
                if name == "seq":
                    cols[name].append(self._seq)
                elif name == "create_time":
                    ct = d.get("create_time")
                    cols[name].append(ct if ct is not None else now)
                elif name == "partition_names":
                    v = d.get(name)
                    cols[name].append(
                        list(v) if v is not None else None
                    )
                else:
                    cols[name].append(d.get(name))
        table = pa.Table.from_pydict(cols, schema=schema)
        os.makedirs(self.path, exist_ok=True)
        pq.write_table(
            table,
            os.path.join(self.path, f"part-{uuid.uuid4().hex}.parquet"),
        )

    def current(self) -> DataFrame:
        """Latest transition per job_id."""
        if not os.path.exists(self.path):
            from reair_spark.io import rows_df

            return rows_df(self.spark, [], JOB_SCHEMA)
        # explicit schema: the log is engine-written JOB_SCHEMA by
        # construction — inference costs a footer-sampling job per read
        log = self.spark.read.schema(JOB_SCHEMA).parquet(self.path)
        w = W.partitionBy("job_id").orderBy(F.desc("seq"))
        return (
            log.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    def exists(self) -> bool:
        """Whether any transition has ever been persisted — a DRIVER
        path probe, so restart bookkeeping on a fresh store (every
        first run) skips its would-be re-queue scan without paying
        even an empty-relation Spark job."""
        return os.path.exists(self.path)

    def incomplete(self) -> DataFrame:
        """Jobs to re-queue on restart (ST4)."""
        return self.current().filter(~F.col("status").isin(*TERMINAL_STATES))

    def retired(self) -> DataFrame:
        """Terminal jobs (getRetiredJobs parity)."""
        return self.current().filter(F.col("status").isin(*TERMINAL_STATES))

    def status_summary(
        self, now_ts: float | None = None
    ) -> tuple[dict[str, int], float]:
        """(status_counts, lag_seconds) in ONE log pass — the loop's
        exit bookkeeping previously cost four jobs (current → counts,
        then a second current + first-seen join for lag); one
        per-job aggregate (latest status via max_by(seq), first
        transition via min(create_time)) collapsed to ≤ |statuses|
        rows serves both. Same semantics as
        ``current().groupBy(status).count()`` + :meth:`lag_seconds`
        (lag = age of the oldest in-flight job's FIRST transition;
        0.0 when everything is terminal)."""
        import time as _time

        if not os.path.exists(self.path):
            return {}, 0.0
        # explicit schema: the log is engine-written JOB_SCHEMA by
        # construction — inference costs a footer-sampling job per read
        log = self.spark.read.schema(JOB_SCHEMA).parquet(self.path)
        rows = (
            log.groupBy("job_id")
            .agg(
                F.expr("max_by(status, seq)").alias("status"),
                F.min("create_time").alias("first_seen"),
            )
            .groupBy("status")
            .agg(F.count("*").alias("n"), F.min("first_seen").alias("oldest"))
            .collect()
        )
        counts = {r["status"]: r["n"] for r in rows}
        oldest = [
            r["oldest"]
            for r in rows
            if r["status"] not in TERMINAL_STATES and r["oldest"] is not None
        ]
        if not oldest:
            return counts, 0.0
        now = _time.time() if now_ts is None else now_ts
        o = min(oldest)
        o_s = o.timestamp() if hasattr(o, "timestamp") else float(o)
        return counts, max(0.0, now - o_s)

    def compact(self, keep_terminal: bool = True) -> int:
        """Rewrite the transition log down to ONE row per job (its
        latest state) — the retention story an append-only log needs
        at production scale: a long-lived loop appends two transitions
        per job per batch forever, and every current()/summary pass
        re-windows the whole history. The reference's MySQL store
        rewrites rows in place (UPDATE) and never grows per retry;
        this is the parquet equivalent, run at operator cadence (e.g.
        after each loop exit or N batches).

        ``keep_terminal=False`` additionally drops retired jobs —
        the aggressive form, keeping only in-flight state needed for
        restart re-queueing (ST4).

        Crash-safe: the snapshot is written BESIDE the log and swapped
        in with two renames (log → .old, snapshot → log); a crash
        between the renames leaves either the intact old log or the
        intact snapshot — never a half state. The max seq is
        preserved, so post-compaction appends keep winning
        last-writer-wins races. Returns rows in the compacted log.

        Single-writer, like every state mutation here (the driver owns
        the state dir; a cluster deployment swaps JobStore for a
        JDBC-backed twin with the same methods). The ``compact-state``
        CLI command is the operator entry point."""
        import shutil

        self._recover_compaction()
        if not os.path.exists(self.path):
            return 0
        snap = self.current()
        if not keep_terminal:
            snap = snap.filter(~F.col("status").isin(*TERMINAL_STATES))
        snap = snap.cache()
        n = snap.count()
        if n == 0:
            # nothing to keep: an absent log IS the empty store
            snap.unpersist()
            shutil.rmtree(self.path, ignore_errors=True)
            return 0
        tmp = f"{self.path}.__compacting"
        old = f"{self.path}.__old"
        shutil.rmtree(tmp, ignore_errors=True)
        snap.write.mode("overwrite").parquet(tmp)
        snap.unpersist()
        shutil.rmtree(old, ignore_errors=True)
        os.replace(self.path, old)
        os.replace(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        return int(n)

    def lag_seconds(self, now_ts: float | None = None) -> float:
        """A7 lag gauge (StatsTracker.java:35-57): age of the oldest
        in-flight job, measured from its FIRST persisted transition
        (job creation), not its latest retry."""
        from reair_spark.metrics import lag_seconds as _lag

        if not os.path.exists(self.path):
            return 0.0
        # explicit schema: the log is engine-written JOB_SCHEMA by
        # construction — inference costs a footer-sampling job per read
        log = self.spark.read.schema(JOB_SCHEMA).parquet(self.path)
        first_seen = log.groupBy("job_id").agg(
            F.min("create_time").alias("create_time")
        )
        inflight = self.incomplete().select("job_id")
        return _lag(first_seen.join(inflight, "job_id"), now_ts)


def status_snapshot(
    spark: SparkSession, state_dir: str, max_active: int = 100
) -> dict:
    """Monitoring snapshot over a persisted state dir — the engine's
    answer to the reference's Thrift monitoring service
    (thrift/src/main/resources/reair.thrift: getActiveJobs /
    getRetiredJobs / getLag; served by ReplicationServer.java:515-590
    and the web UI). pause/resume are service-lifecycle calls with no
    analog in a batch-driven loop, so the read side is the parity
    surface. Everything comes from the JobStore transition log plus
    the checkpoint KV — no running engine required, which is exactly
    how an operator inspects a crashed or in-flight deployment."""
    store = JobStore(spark, f"{state_dir}/replication_jobs")
    kv = KeyValueStore(f"{state_dir}/key_value.json")

    active_rows = (
        store.incomplete()
        .orderBy("job_id")
        .limit(max_active)
        .select("job_id", "operation", "status", "db", "table", "src_event_id")
        .collect()
    )
    status_counts = {
        r["status"]: r["count"]
        for r in store.current().groupBy("status").count().collect()
    }
    n_active = sum(
        v for k, v in status_counts.items() if k not in TERMINAL_STATES
    )
    n_retired = sum(v for k, v in status_counts.items() if k in TERMINAL_STATES)
    return {
        "last_persisted_id": int(kv.get("last_persisted_id", "0") or 0),
        "n_active": n_active,
        "n_retired": n_retired,
        "status_counts": status_counts,
        "lag_seconds": round(store.lag_seconds(), 1),
        "active_jobs": [r.asDict() for r in active_rows],
    }
