"""Interleaved A/B: q21 with vs without the declared-key EXISTS→window
rewrite (compiler._exists_window_rewrite, round 10).

The manual window formulation (q21_window_fast) measured ~2x faster at
every SF but could not ship as an automatic rewrite without the FK
facts (r4 verdict); DECLARE PRIMARY/FOREIGN KEY supplies them. This
interleaves the two compilations of the SAME q21 text rep-by-rep in
one session and value-checks them against each other first.

Usage: python scripts/bench_exists_window_ab.py [sf_dir] [reps]
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

    spark = default_spark(app_name="bench-exists-window-ab")
    tune_for_input(spark, sf)
    psql = _psql(spark)
    qs = queries()
    spark.read.parquet(f"{sf}/lineitem.parquet").count()

    psql.sql(f"declare primary key on '{sf}/orders.parquet' (o_orderkey)")
    psql.sql(f"declare primary key on '{sf}/supplier.parquet' (s_suppkey)")
    psql.sql(
        f"declare foreign key on '{sf}/lineitem.parquet' (l_orderkey) "
        f"references '{sf}/orders.parquet' (o_orderkey)"
    )
    psql.sql(
        f"declare foreign key on '{sf}/lineitem.parquet' (l_suppkey) "
        f"references '{sf}/supplier.parquet' (s_suppkey)"
    )
    comp = psql._compiler

    def run():
        qs["q21_waiting_supplier"](spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()

    spark.conf.set("spark.psql.existsWindowRewrite", "false")
    comp._plan_cache.clear()
    base_rows = [
        tuple(r) for r in qs["q21_waiting_supplier"](spark, sf).collect()
    ]
    spark.conf.set("spark.psql.existsWindowRewrite", "true")
    comp._plan_cache.clear()
    win_rows = [
        tuple(r) for r in qs["q21_waiting_supplier"](spark, sf).collect()
    ]
    n_rw = len(comp.last_window_rewrites)
    assert base_rows == win_rows, "value divergence under window rewrite"

    native, window = [], []
    for _ in range(reps):
        spark.conf.set("spark.psql.existsWindowRewrite", "false")
        comp._plan_cache.clear()
        t0 = time.perf_counter()
        run()
        native.append(round(time.perf_counter() - t0, 2))
        spark.conf.set("spark.psql.existsWindowRewrite", "true")
        comp._plan_cache.clear()
        t0 = time.perf_counter()
        run()
        window.append(round(time.perf_counter() - t0, 2))

    print(
        json.dumps(
            {
                "metric": "exists_window_ab_q21",
                "sf_dir": sf,
                "rows_equal": True,
                "rewrites": n_rw,
                "native": native,
                "window": window,
                "native_median": round(statistics.median(native), 2),
                "window_median": round(statistics.median(window), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
