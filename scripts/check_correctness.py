"""Differential checker mirroring the driver's t2 gate.

Runs every queries() entry on Spark and its oracle on DuckDB at the given
sf dir, compares row count, column names, and order-insensitive values
(exact, plus a 1e-9-tolerance float diagnosis so we can tell "real bug"
from "float hash risk").

Usage: python scripts/check_correctness.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
FILT = sys.argv[2] if len(sys.argv) > 2 else ""

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _sort_key(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def main() -> int:
    import __spark_entry__ as entrymod
    from duckdb_psql_spark.session import default_spark

    spark = default_spark(app_name="check-correctness", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if FILT and not any(f in name for f in FILT.split(",")):
            continue
        try:
            df = fn(spark, SF)
            spark_cols = sorted(df.columns)
            spark_rows = sorted(
                (
                    tuple(norm(v) for v in row)
                    for row in (tuple(r[c] for c in spark_cols) for r in df.collect())
                ),
                key=_sort_key,
            )
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(spark_rows)} rows, no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            o_cols = sorted(rel.columns)
            idx = [rel.columns.index(c) for c in o_cols]
            o_rows = sorted(
                (tuple(norm(row[i]) for i in idx) for row in rel.fetchall()),
                key=_sort_key,
            )
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if spark_cols != o_cols:
            failures.append(name)
            print(f"FAIL {name}: columns differ spark={spark_cols} duckdb={o_cols}")
            continue
        if len(spark_rows) != len(o_rows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duckdb={len(o_rows)}")
            continue
        if spark_rows == o_rows:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            continue
        # diagnose: exact mismatch — float-tolerant retry
        n_bad = sum(1 for a, b in zip(spark_rows, o_rows) if a != b)
        sample = next((a, b) for a, b in zip(spark_rows, o_rows) if a != b)
        failures.append(name)
        print(f"FAIL {name}: {n_bad}/{len(spark_rows)} rows differ; e.g. spark={sample[0]} duckdb={sample[1]}")
    spark.stop()
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
