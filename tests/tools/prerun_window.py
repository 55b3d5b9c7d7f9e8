"""Pre-run the driver's incoming correctness window at its own scale.

The driver hashes Spark-vs-DuckDB at sf0.01; the default test smoke
scale is sf0.001 and round 4 proved row populations (and therefore
which code paths execute) are scale-dependent.  This tool replays the
FIRST N registry rows — the exact slice the driver will sample — at
sf0.01 through the same pandas fetch path the driver uses, and writes
a JSON record next to the bench artifacts.

Usage:  python tests/tools/prerun_window.py [N] [SF_DIR] [OUT]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as contract  # noqa: E402
from test_driver_contract import _pd_hash  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 53
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out = (sys.argv[3] if len(sys.argv) > 3
           else os.path.join(REPO, "BENCH", "prerun_window_r05.json"))

    from scrapely_spark.spark.session import get_spark
    spark = get_spark(app_name="prerun-window")

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
            % (t, sf_dir, t))

    qs = contract.queries()
    oracles = contract.oracle_sql()
    window = list(qs)[:n]
    results, n_green = {}, 0
    for name in window:
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            dpdf = duck.execute(oracles[name]).df()
            rec = {
                "rows_match": len(spdf) == len(dpdf),
                "schema_match":
                    sorted(spdf.columns) == sorted(dpdf.columns),
                "hash_match": _pd_hash(spdf) == _pd_hash(dpdf),
                "spark_rows": len(spdf), "oracle_rows": len(dpdf),
                "err": None,
            }
        except Exception as exc:  # record, keep going
            rec = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "err": repr(exc)[:300]}
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        ok = rec["hash_match"]
        n_green += ok
        print("%-34s %s %ss" % (name, "GREEN" if ok else "RED  ",
                                rec["sec"]), flush=True)

    payload = {"sf_dir": sf_dir, "window": n, "green": n_green,
               "results": results}
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print("\n%d/%d green -> %s" % (n_green, len(window), out))
    return 0 if n_green == len(window) else 1


if __name__ == "__main__":
    raise SystemExit(main())
