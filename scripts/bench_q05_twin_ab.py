"""Interleaved A/B: q05 at sf10, raw-path vs bucketed-twin engine path.

q05's sf10 wall-clock has ~2x run-to-run variance on this host
(r5 verdict: 8.7-20.9s, config-independent), so single-shot pairs are
uninformative; this interleaves the two variants rep-by-rep in ONE
session and reports the per-rep pairs plus medians.

Usage: python scripts/bench_q05_twin_ab.py [sf_dir] [reps] [buckets]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from duckdb_psql_spark.inventory import _psql, queries
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark(app_name="bench-q05-twin-ab")
    tune_for_input(spark, sf)
    psql = _psql(spark)
    qs = queries()
    spark.read.parquet(f"{sf}/lineitem.parquet").count()
    psql.sql(
        f"from '{sf}/lineitem.parquet' |> cluster by l_orderkey "
        f"buckets={buckets} name=ab_li sort=l_orderkey"
    )
    psql.sql(
        f"from '{sf}/orders.parquet' |> cluster by o_orderkey "
        f"buckets={buckets} name=ab_od sort=o_orderkey"
    )
    res = psql._compiler.resolver
    twins = dict(res.bucketed_twins)

    def run():
        qs["q05_nation_volume"](spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()

    plain, twin = [], []
    for _ in range(reps):
        res.bucketed_twins.clear()
        t0 = time.perf_counter()
        run()
        plain.append(round(time.perf_counter() - t0, 2))
        res.bucketed_twins.update(twins)
        t0 = time.perf_counter()
        run()
        twin.append(round(time.perf_counter() - t0, 2))
    print(
        json.dumps(
            {
                "metric": "q05_twin_ab",
                "sf_dir": sf,
                "buckets": buckets,
                "plain": plain,
                "twin": twin,
                "plain_median": statistics.median(plain),
                "twin_median": statistics.median(twin),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
