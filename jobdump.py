"""Per-JOB attribution for one registry query: job id, wall, task count,
and the callsite/description Spark recorded — reads the JVM AppStatusStore
directly (works with the UI disabled). Warm-up run first, then one
measured run; prints each job in the measured window.

Usage: python jobdump.py [--sf DIR] [--cpus N] query [query...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from reair_spark.session import get_spark

    SparkSession.builder.config("spark.ui.showConsoleProgress", "false")
    spark = get_spark("reair_jobdump", cpus=args.cpus)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    from reair_spark.io import load_table

    load_table(spark, args.sf, "nation").count()

    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()

    def next_job_id():
        v = sc._jsc.sc().dagScheduler().nextJobId()
        return v.get() if hasattr(v, "get") else v
    for name in args.queries:
        fn = queries[name]
        fn(spark, args.sf).collect()  # warm-up (builds memoized templates)
        j0 = next_job_id()
        t0 = time.perf_counter()
        fn(spark, args.sf).collect()
        wall = time.perf_counter() - t0
        j1 = next_job_id()
        jobs = store.jobsList(None)
        print(f"\n=== {name}: wall {wall:.2f}s, jobs {j1 - j0} ===")
        rows = []
        it = jobs.iterator()
        while it.hasNext():
            jd = it.next()
            jid = jd.jobId()
            if jid < j0 or jid >= j1:
                continue
            sub = jd.submissionTime()
            comp = jd.completionTime()
            dur = None
            if sub.isDefined() and comp.isDefined():
                dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
            desc = jd.description()
            d = desc.get() if desc.isDefined() else jd.name()
            rows.append((jid, dur, jd.numTasks(), str(d)[:150]))
        for jid, dur, ntasks, d in sorted(rows):
            ds = f"{dur:6.3f}s" if dur is not None else "   ?   "
            print(f"  job {jid:5d}  {ds}  {ntasks:4d} tasks  {d}")
        tot = sum(d for _, d, _, _ in rows if d is not None)
        print(f"  summed job wall: {tot:.2f}s over {len(rows)} jobs")


if __name__ == "__main__":
    main()
