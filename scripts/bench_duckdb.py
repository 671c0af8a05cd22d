"""Reference-side timing: run the bench queries' DuckDB oracles on the
same parquet at the same scale factor.

The reference engine (ywelsch/duckdb-psql) delegates execution to DuckDB,
so "the reference's single-node throughput" on any query equals DuckDB's.
This script times each bench query's oracle SQL (from the inventory) in
embedded DuckDB — best of two runs, same convention as bench.py — and
prints one JSON line comparable to bench.py's output.

Usage: python scripts/bench_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import bench
    import __spark_entry__ as entrymod

    osql = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    timings: dict[str, float] = {}
    total = 0.0
    for name in bench.HEADLINE + bench.EXTENDED:
        if name not in osql:
            timings[name] = -1.0  # no oracle: engine-specific hashing
            continue
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(osql[name]).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best

    print(json.dumps({
        "metric": "duckdb_oracle_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
