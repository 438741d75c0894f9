"""Dev utility: run every registered query vs its oracle, report all
mismatches in one pass (faster feedback than pytest -x).

Usage: python tests/run_oracle_sweep.py [sf_dir] [name_filter...]
       --json PATH  write a machine-readable per-query result map
                    (the SWEEP_r{N}.json artifact, VERDICT r5 ask #9)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from reair_spark.session import get_spark  # noqa: E402
from tests.oracle_check import compare, duck_con  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    filters = args[1:]
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("oracle_sweep")
    con = duck_con(sf_dir)
    failures = 0
    results: dict[str, dict] = {}
    for name in sorted(queries):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  {name}: rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                results[name] = {
                    "status": "rows_only", "rows": n,
                    "sec": round(time.time() - t0, 2),
                }
                continue
            r = compare(df, con, oracles[name])
            ok = r["rows_match"] and r["cols_match"] and r["hash_match"]
            flag = "OK " if ok else "FAIL"
            print(f"  {name}: {flag} [{time.time()-t0:.1f}s]")
            results[name] = {
                "status": "ok" if ok else "fail",
                "sec": round(time.time() - t0, 2),
            }
            if not ok:
                failures += 1
                results[name]["spark"] = str(r["spark"])
                results[name]["duckdb"] = str(r["duckdb"])
                print(f"    spark : {r['spark']}")
                print(f"    duckdb: {r['duckdb']}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            results[name] = {
                "status": "error",
                "err": f"{type(e).__name__}: {str(e)[:300]}",
            }
            print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
    print(f"done: {failures} failures")
    if json_path:
        # rotation-staleness metadata (VERDICT r6 ask #8): with ~160
        # queries and a 50-row driver sample, each green row is driver-
        # re-checked every ~3 rounds; record each query's last green
        # driver round + the sample order so nobody's check ages
        # silently (all_queries front-loads oldest-verified-first).
        from reair_spark.registry import _driver_history, all_queries

        latest_red, last_green = _driver_history()
        sample_order = {n: i for i, n in enumerate(all_queries())}
        for name, row in results.items():
            row["last_driver_green_round"] = last_green.get(name)
            row["driver_red_latest"] = name in latest_red
            row["next_sample_rank"] = sample_order.get(name)
        n_ok = sum(1 for v in results.values() if v["status"] == "ok")
        payload = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_ok": n_ok,
            "n_failures": failures,
            "rotation": {
                "driver_sample_size": 50,
                "oldest_green_round": min(
                    (v for v in last_green.values()), default=None
                ),
                "never_driver_checked": sorted(
                    n for n in results
                    if n not in last_green and n not in latest_red
                ),
            },
            "results": results,
        }
        with open(json_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
