"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same config block is what we'd
ship for a 1000-executor cluster (AQE, skew-join handling, coalesced
shuffle partitions) — only memory/parallelism sizing changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "reair_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    AQE is on so runtime statistics re-plan joins (broadcast demotion/
    promotion, skew-join splitting, partition coalescing) — this is the
    100 TB scale story: plans written here are declarative and AQE
    fixes sizing at runtime.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    shuffle_parts = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # match shuffle width to cores locally; a real cluster would set
        # this ~2-3x total cores (AQE coalesces the excess anyway)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # scan-split + post-shuffle sizing: 256 MB splits keep scan
        # tasks at the parquet row-group sweet spot; AQE coalesces
        # toward 128 MB partitions so reducers neither spill nor
        # proliferate — the two knobs that keep a 100 TB scan at
        # ~400k tasks instead of millions
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
        # AQE coalescing is parallelism-first, but its 1 MB default
        # partition-size FLOOR serializes CPU-heavy small-byte
        # shuffles: a 6 MB compressed shuffle of 2M string-keyed rows
        # coalesced to 6 tasks on 32 cores (replication_orphan_gc's
        # path join, measured 4.9 s -> 3.1 s at 256k; compact_plan
        # 3.6 -> 2.4, q13 1.0 -> 0.74). The floor only bounds shuffles
        # under cores x 1 MB, so byte-bound exchanges still coalesce
        # toward the 128 MB advisory above; on a real cluster the same
        # floor keeps sub-32 MB shuffles parallelism-first, which is
        # exactly AQE's documented intent (r14, guide §2.2)
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # multi-path reads (zonemap bucket scans) list their dirs at
        # DataFrame-build time; the default threshold (32 paths) spins
        # up a whole Spark JOB to list a few hundred directories —
        # measured 0.3-0.5 s per scan at bench scale. Driver-side
        # threaded listing handles O(1k) paths in milliseconds on any
        # fs; the distributed job only pays off at ~10k+ paths.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # copy/commit tasks are side-effecting; never speculate
        # (reference: MetastoreReplicationJob.java:251-258)
        .config("spark.speculation", "false")
    )
    # measurement harnesses (shufflemeasure.py) flip UI/retention knobs
    # without forking the engine config block above
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
