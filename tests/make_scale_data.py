"""Dev utility: replicate an sf directory K× into a scratch dir for
scale-up measurements (the PLANS.md "round-4 10× study").

Usage: python tests/make_scale_data.py [src_sf_dir] [dest_dir] [K]

Replication semantics (chosen so the scaled corpus exercises the
operators realistically rather than degenerately):
- documents: doc_id offset per replica; replica 0 keeps its text,
  others append a per-replica suffix token → replicas form NEAR-dup
  clusters of K (what dedup finds in a real crawl);
- embeddings: vec_id offset; +rep·1e-3 elementwise drift → near-dup
  vector clusters;
- lineitem: orderkey offset (new orders, same dims);
- events: event_id/user_id offset, written as ONE parquet file (the
  streaming source globs `events.parquet` as a single file);
- dims (region..orders) copied verbatim.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from reair_spark.session import get_spark

    spark = get_spark("make_scale_data")
    os.makedirs(dst, exist_ok=True)
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")

    d = spark.read.parquet(f"{src}/documents.parquet")
    text = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.concat("text", F.lit(" rep"), F.col("rep").cast("string"))
    )
    d.select(reps, "*").select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        text.alias("text"), "lang", "source", F.length(text).alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    e = spark.read.parquet(f"{src}/embeddings.parquet")
    e.select(reps, "*").select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x + F.col("rep").cast("double") * 1e-3
        ).alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    li.select(reps, "*").select(
        (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    ).write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")

    ev = spark.read.parquet(f"{src}/events.parquet")
    tmp = f"{dst}/_events_build"
    ev.select(reps, "*").select(
        (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
        (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
        *[c for c in ev.columns if c not in ("event_id", "user_id")],
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    target = f"{dst}/events.parquet"
    if os.path.isdir(target):
        shutil.rmtree(target)
    elif os.path.exists(target):
        os.remove(target)
    shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], target)
    shutil.rmtree(tmp)

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    for t in ("documents", "embeddings", "lineitem"):
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n}")
    print(f"events: {spark.read.parquet(target).count()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
