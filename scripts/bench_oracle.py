"""Time the DuckDB oracles for the bench headline queries — the local
stand-in for BASELINE.md's "within 2x at the same scale factor" bound.

Usage: python scripts/bench_oracle.py [sf_dir]
Prints one JSON line mirroring bench.py's shape so the two are directly
comparable.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    from bench import EXTENDED, HEADLINE

    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF}/{t}.parquet"
        # Spark writes a directory of part files; plain testdata is a file
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    timings: dict[str, float] = {}
    for name in HEADLINE + EXTENDED:
        if name not in oracles:
            timings[name] = -1.0  # no oracle: engine-specific hashing
            continue
        best = None
        for _ in range(2):  # best-of-two, same convention as bench.py
            t0 = time.perf_counter()
            con.sql(oracles[name]).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    m = re.search(r"sf([0-9.]+)", SF)
    print(json.dumps({
        "metric": "duckdb_oracle_total",
        "value": round(sum(v for v in timings.values() if v > 0), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(m.group(1)) if m else -1.0,
    }))


if __name__ == "__main__":
    main()
