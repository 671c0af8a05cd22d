"""Engine-level bucketed-twin bench (VERDICT r5 item 5).

Round 5 proved bucketing removes the q03/q05-class join exchanges at the
DataFrame level (scripts/bench_bucketed.py). Round 6 promoted it into the
engine: `cluster by` materializes bucketed twins and _with_bucketed_twins
recompiles shuffling statements against them. This script measures the
full engine path on q05 (the worst sf10 shuffle residual): raw engine vs
twin-substituted engine vs embedded DuckDB, all in ONE session on the
same host, so the ratio is a same-session pair, not a cross-round guess.

Usage: python scripts/bench_cluster_engine.py [sf_dir] [buckets]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 32

TABLES = "region nation customer supplier part orders lineitem".split()


def timed(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best or 9e9, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from duckdb_psql_spark.inventory import _psql, queries, oracle_sql
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark(app_name="bench-cluster-engine")
    tune_for_input(spark, SF)
    # the SAME session the inventory's queries() callables compile through,
    # so the cluster verb's twin registration is visible to them
    psql = _psql(spark)
    qs = queries()
    spark.read.parquet(f"{SF}/lineitem.parquet").count()  # warm listings

    def run_q05():
        qs["q05_nation_volume"](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()

    t_plain = timed(run_q05)

    t0 = time.perf_counter()
    psql.sql(
        f"from '{SF}/lineitem.parquet' |> cluster by l_orderkey "
        f"buckets={BUCKETS} name=bench_li_b sort=l_orderkey"
    )
    psql.sql(
        f"from '{SF}/orders.parquet' |> cluster by o_orderkey "
        f"buckets={BUCKETS} name=bench_od_b sort=o_orderkey"
    )
    t_write = round(time.perf_counter() - t0, 3)

    df = qs["q05_nation_volume"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bucketed_in_plan = "Bucketed: true" in plan
    t_twin = timed(run_q05)

    # DuckDB same-session comparator on the same parquet
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    osql = oracle_sql()["q05_nation_volume"]
    t_duck = timed(lambda: con.sql(osql).fetchall())

    print(
        json.dumps(
            {
                "metric": "engine_bucketed_q05",
                "sf_dir": SF,
                "buckets": BUCKETS,
                "q05_plain_sec": t_plain,
                "q05_twin_sec": t_twin,
                "one_time_cluster_write_sec": t_write,
                "twin_plan_bucketed": bucketed_in_plan,
                "duckdb_sec": t_duck,
                "ratio_plain": round(t_plain / t_duck, 2),
                "ratio_twin": round(t_twin / t_duck, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
