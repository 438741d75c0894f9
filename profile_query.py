"""Per-query profiler: run selected registry queries and report
wall time, Spark job count, stage count, and (optionally) the
formatted plan. Job/stage counts come from the status store REST-free
path (statusTracker) and are deterministic — valid even on a noisy
box; wall times are only meaningful when the box is quiet.

Usage:
    python profile_query.py [--sf DIR] [--cpus N] [--explain DIR]
        [--runs N] query1 query2 ...
    python profile_query.py --all           # every registry query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--runs", type=int, default=2, help="timed runs after 1 warmup")
    ap.add_argument("--explain", default=None, help="dir to dump explain('formatted') per query")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--json", default=None, help="write results as json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from reair_spark.session import get_spark

    SparkSession.builder.config("spark.ui.showConsoleProgress", "false")
    spark = get_spark("reair_profile", cpus=args.cpus)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = sorted(queries) if args.all else args.queries
    missing = [n for n in names if n not in queries]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    from reair_spark.io import load_table

    load_table(spark, args.sf, "nation").count()  # JVM warm-up

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        sc.setJobDescription(f"profile:{name}")
        # warm-up (uncounted for time; jobs counted from 2nd run on)
        fn(spark, args.sf).collect()
        # nextJobId is the DAGScheduler's monotone job counter — no
        # UI-store eviction can skew the diff
        n_jobs_before = sc._jsc.sc().dagScheduler().nextJobId().get() if hasattr(sc._jsc.sc().dagScheduler().nextJobId(), "get") else sc._jsc.sc().dagScheduler().nextJobId()
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.collect()
            times.append(time.perf_counter() - t0)
        n_jobs_after = sc._jsc.sc().dagScheduler().nextJobId().get() if hasattr(sc._jsc.sc().dagScheduler().nextJobId(), "get") else sc._jsc.sc().dagScheduler().nextJobId()
        njobs = (n_jobs_after - n_jobs_before) / args.runs
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(fn(spark, args.sf)._jdf.queryExecution().explainString(mode))
        out[name] = {
            "min_s": round(min(times), 3),
            "med_s": round(sorted(times)[len(times) // 2], 3),
            "jobs_per_run": round(njobs, 1),
        }
        print(f"{min(times):7.2f}s  {njobs:6.1f} jobs  {name}", flush=True)
        sc.setJobDescription(None)

    total = round(sum(v["min_s"] for v in out.values()), 2)
    tjobs = round(sum(v["jobs_per_run"] for v in out.values()), 1)
    print(f"TOTAL {total}s  {tjobs} jobs over {len(out)} queries")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
