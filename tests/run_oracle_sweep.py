"""Dev utility: run every registered query vs its oracle, report all
mismatches in one pass (faster feedback than pytest -x).

Usage: python tests/run_oracle_sweep.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from reair_spark.session import get_spark  # noqa: E402
from tests.oracle_check import compare, duck_con  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("oracle_sweep")
    con = duck_con(sf_dir)
    failures = 0
    for name in sorted(queries):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  {name}: rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                continue
            r = compare(df, con, oracles[name])
            ok = r["rows_match"] and r["cols_match"] and r["hash_match"]
            flag = "OK " if ok else "FAIL"
            print(f"  {name}: {flag} [{time.time()-t0:.1f}s]")
            if not ok:
                failures += 1
                print(f"    spark : {r['spark']}")
                print(f"    duckdb: {r['duckdb']}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
    print(f"done: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
