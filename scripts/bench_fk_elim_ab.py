"""Interleaved A/B: q05 with vs without DECLAREd keys (FK-join
elimination, round 10).

The orders⋈lineitem leg of q05 is a payload-free pure-FK inner join —
the r9 sf1 anatomy pinned it as the query's dominant residual (~0.6 s
of 1.1 s at sf1; a 60 M-row exchange at sf10). With
``DECLARE PRIMARY KEY … / FOREIGN KEY …`` the compiler drops the join
outright (compiler._eliminate_fk_joins). This interleaves the two
variants rep-by-rep in ONE session (q05 wall-clock has ~2x run-to-run
variance on this host, r5 verdict) and reports per-rep pairs + medians.

Usage: python scripts/bench_fk_elim_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from duckdb_psql_spark.inventory import _psql, queries
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark(app_name="bench-fk-elim-ab")
    tune_for_input(spark, sf)
    psql = _psql(spark)
    qs = queries()
    spark.read.parquet(f"{sf}/lineitem.parquet").count()  # warm FS cache

    psql.sql(f"declare primary key on '{sf}/orders.parquet' (o_orderkey)")
    psql.sql(
        f"declare foreign key on '{sf}/lineitem.parquet' (l_orderkey) "
        f"references '{sf}/orders.parquet' (o_orderkey)"
    )
    comp = psql._compiler

    def run():
        qs["q05_nation_volume"](spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()

    # correctness gate first: both variants, identical rows
    spark.conf.set("spark.psql.keyJoinElimination", "false")
    comp._plan_cache.clear()
    base_rows = [tuple(r) for r in qs["q05_nation_volume"](spark, sf).collect()]
    spark.conf.set("spark.psql.keyJoinElimination", "true")
    comp._plan_cache.clear()
    elim_rows = [tuple(r) for r in qs["q05_nation_volume"](spark, sf).collect()]
    assert base_rows == elim_rows, "value divergence under elimination"

    plain, elim = [], []
    for _ in range(reps):
        spark.conf.set("spark.psql.keyJoinElimination", "false")
        comp._plan_cache.clear()
        t0 = time.perf_counter()
        run()
        plain.append(round(time.perf_counter() - t0, 2))
        spark.conf.set("spark.psql.keyJoinElimination", "true")
        comp._plan_cache.clear()
        t0 = time.perf_counter()
        run()
        elim.append(round(time.perf_counter() - t0, 2))

    out = {
        "metric": "fk_elim_ab_q05",
        "sf_dir": sf,
        "rows_equal": True,
        "plain": plain,
        "elim": elim,
        "plain_median": round(statistics.median(plain), 2),
        "elim_median": round(statistics.median(elim), 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
