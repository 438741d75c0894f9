"""Single-pass job metrics via Spark's Observation API — the S10/A6/A7
surface of the reference (incremental/ReplicationCounters.java counters,
ReplicationServer.java:128-147 Thrift monitoring getters, and
StatsTracker.java:35-57 lag gauge) re-expressed Spark-first.

The reference increments thread-local counters while worker threads run
and serves them over a Thrift service. Here the counters are declared as
aggregate *expressions* attached to the result DataFrame with
``df.observe(...)``: Spark computes them **during the action that
materializes the results** — map-side, merged on the driver — so the
metrics cost zero extra jobs and zero extra scans, which is what you
want when the result being observed is a 100 TB copy manifest.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

# Outcome vocabulary shared by copy (COPIED/SKIPPED/FAILED) and commit
# (SUCCESSFUL/NOT_COMPLETABLE/FAILED) result tables — union of both so
# one metric set serves either (RunInfo.java:24-31 status enum analog).
_SUCCESS = ("COPIED", "SUCCESSFUL")
_FAILURE = ("FAILED",)


def _count_if(cond) -> F.Column:
    return F.sum(F.when(cond, 1).otherwise(0))


def copy_metric_exprs() -> dict[str, F.Column]:
    """ReplicationCounters analog for the per-file copy results:
    counts by outcome + bytes moved (EXPECTED_COPIES/SUCCESSFUL_TASKS/
    FAILED_TASKS/BYTES_COPIED in the reference)."""
    status = F.col("status")
    return {
        "n_files": F.count(F.lit(1)),
        "n_success": _count_if(status.isin(*_SUCCESS)),
        "n_skipped": _count_if(status == "SKIPPED"),
        "n_failed": _count_if(status.isin(*_FAILURE)),
        "bytes_copied": F.coalesce(F.sum("bytes_copied"), F.lit(0)),
    }


def commit_metric_exprs() -> dict[str, F.Column]:
    """Stage-3 commit outcome counters (Stage3CommitChangeMapper logs +
    MR counters; failures are per-row, not fatal)."""
    status = F.col("status")
    return {
        "n_actions": F.count(F.lit(1)),
        "n_applied": _count_if(status.isin(*_SUCCESS)),
        "n_skipped": _count_if(status.isin("SKIPPED", "NOOP", "NOT_COMPLETABLE")),
        "n_failed": _count_if(status.isin(*_FAILURE)),
    }


def observe_results(
    df: DataFrame, name: str, exprs: dict[str, F.Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach an Observation to a result DataFrame. Returns the
    observed frame (use it in place of ``df``) and the Observation;
    read ``observation.get`` AFTER an action has materialized the
    frame. Defaults to copy metrics for 'copy*' names, commit metrics
    for 'commit*' names."""
    if exprs is None:
        exprs = commit_metric_exprs() if name.startswith("commit") else copy_metric_exprs()
    obs = Observation(name)
    observed = df.observe(obs, *[e.alias(k) for k, e in exprs.items()])
    return observed, obs


class JobMetrics:
    """Driver-side metrics registry — the monitoring surface the
    reference exposes over Thrift (getActiveJobs/getRetiredJobs/getLag,
    ReplicationServer.java:515-590) minus the wire protocol. Collects
    named Observation results plus wall-clock timings and renders one
    plain-dict snapshot (serve it however you like: log line, REST
    endpoint, status table)."""

    def __init__(self) -> None:
        self._observations: dict[str, Observation] = {}
        self._started: dict[str, float] = {}
        self._elapsed: dict[str, float] = {}

    def observe(
        self, df: DataFrame, name: str, exprs: dict[str, F.Column] | None = None
    ) -> DataFrame:
        observed, obs = observe_results(df, name, exprs)
        self._observations[name] = obs
        self._started[name] = time.monotonic()
        return observed

    def mark_done(self, name: str) -> None:
        if name in self._started and name not in self._elapsed:
            self._elapsed[name] = time.monotonic() - self._started[name]

    def snapshot(self) -> dict[str, dict]:
        """One dict per observed stage. Reading Observation.get blocks
        until that stage's action has run, so call after materializing."""
        out: dict[str, dict] = {}
        for name, obs in self._observations.items():
            stage = dict(obs.get)
            if name in self._elapsed:
                stage["wall_s"] = round(self._elapsed[name], 3)
            out[name] = stage
        return out


def lag_seconds(incomplete_jobs: DataFrame, now_ts: float | None = None) -> float:
    """A7: age of the oldest in-flight job (StatsTracker.java:35-57 —
    ``now - create_time`` of the job with the smallest id). Returns 0.0
    when nothing is in flight."""
    row = incomplete_jobs.agg(F.min("create_time").alias("oldest")).collect()[0]
    if row is None or row["oldest"] is None:
        return 0.0
    now = time.time() if now_ts is None else now_ts
    oldest = row["oldest"]
    oldest_s = oldest.timestamp() if hasattr(oldest, "timestamp") else float(oldest)
    return max(0.0, now - oldest_s)
