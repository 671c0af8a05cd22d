"""Attribute the r10→r11 sf0.1 driver-bench move (VERDICT r11 item 3).

The three movers (q08 +31%, q_window_rank +28%, q01 +18%) are timed
EXECUTION only (bench.py compiles outside the timer), so the five
round-11 compile-time passes can only be responsible if they changed
the PLANS. This runner (a) compiles each mover with the round-11 passes
ON and OFF in the same process and diffs the executed-plan strings, and
(b) interleaves timed runs pass-on/pass-off, best-of-N each. Identical
plans + overlapping timings = the regression is ambient/noise, not the
passes.

Usage: python scripts/bench_r11_passes_ab.py [sf_dir] [reps=5]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
MOVERS = ("q08_market_share", "q_window_rank", "q01_pricing_summary")
OFF_CONFS = {
    "spark.psql.countDistFold": "false",
    "spark.psql.distinctElimination": "false",
    "spark.psql.keyedGroupByElimination": "false",
}


def norm(plan: str) -> str:
    # strip expression ids / view names — only the shape matters
    plan = re.sub(r"#\d+[A-Z]*", "#", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=", plan)
    plan = re.sub(r"_pyspark_[0-9a-f]+", "_view_", plan)
    plan = re.sub(r"__cd_\w+|__kg\w*|__pipe\w*", "_tmp_", plan)
    return plan


def main() -> None:
    from bench import _jit_warmup

    import __spark_entry__ as entrymod
    from duckdb_psql_spark.inventory import _psql
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark()
    tune_for_input(spark, SF)
    queries = entrymod.queries()
    p = _psql(spark)
    for _t, _k in [
        ("region", "r_regionkey"), ("nation", "n_nationkey"),
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
    ]:
        p.sql(f"declare primary key on '{SF}/{_t}.parquet' ({_k})")
    for _t, _c, _rt, _rk in [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]:
        p.sql(
            f"declare foreign key on '{SF}/{_t}.parquet' ({_c}) "
            f"references '{SF}/{_rt}.parquet' ({_rk})"
        )
    _jit_warmup(spark, SF)

    def set_passes(on: bool) -> None:
        for k, v in OFF_CONFS.items():
            if on:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        p._compiler._plan_cache.clear()

    out: dict = {}
    for name in MOVERS:
        set_passes(True)
        df_on = queries[name](spark, SF)
        plan_on = df_on._jdf.queryExecution().executedPlan().toString()
        set_passes(False)
        df_off = queries[name](spark, SF)
        plan_off = df_off._jdf.queryExecution().executedPlan().toString()
        same = norm(plan_on) == norm(plan_off)
        # interleaved timed runs
        df_on.write.format("noop").mode("overwrite").save()
        df_off.write.format("noop").mode("overwrite").save()
        best_on = best_off = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            df_on.write.format("noop").mode("overwrite").save()
            best_on = min(best_on, time.time() - t0)
            t0 = time.time()
            df_off.write.format("noop").mode("overwrite").save()
            best_off = min(best_off, time.time() - t0)
        out[name] = {
            "plans_identical": same,
            "best_on": round(best_on, 3),
            "best_off": round(best_off, 3),
        }
        set_passes(True)
    print(json.dumps({
        "metric": "r11_passes_mover_ab",
        "sf_dir": SF,
        "reps": REPS,
        "passes_toggled": sorted(OFF_CONFS),
        "queries": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
