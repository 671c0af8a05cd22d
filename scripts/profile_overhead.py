"""Decompose the tiny-SF per-query cost: planning vs scan vs execution.

Answers three questions for the slowest headline queries at sf0.1:
1. How long does Catalyst planning alone take (no job run)?
2. Does splitting the 11 MB lineitem scan into more input partitions help?
3. What's the floor for a no-op job (pure scheduling cost)?
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_psql_spark.session import default_spark  # noqa: E402
from duckdb_psql_spark import inventory  # noqa: E402


def t(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    spark = default_spark(app_name="profile-overhead")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    qs = inventory.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm

    # floor: empty job
    df0 = spark.range(1)
    print(f"noop floor (range(1) write):      {t(lambda: df0.write.format('noop').mode('overwrite').save()):.3f}s")

    # scan-only at various input split sizes
    for mpb in ["128m", "8m", "2m", "1m"]:
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        n = li.rdd.getNumPartitions()
        secs = t(lambda: li.write.format("noop").mode("overwrite").save())
        # and a q01-shaped agg over it
        agg = li.groupBy("l_returnflag", "l_linestatus").count()
        asecs = t(lambda: agg.write.format("noop").mode("overwrite").save())
        print(f"lineitem scan mpb={mpb:>5} parts={n:>3}: scan={secs:.3f}s  groupBy={asecs:.3f}s")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")

    for name in ["q01_pricing_summary", "q03_shipping_priority",
                 "q05_nation_volume", "q21_waiting_supplier", "x_text_quality"]:
        df = qs[name](spark, sf_dir)
        jdf = df._jdf
        # compile-side cost: PSQL text -> DataFrame (lexer+compiler, py-side)
        compile_s = t(lambda: qs[name](spark, sf_dir), 3)
        # planning: analyzed -> executedPlan (fresh copy each time to defeat cache)
        def plan():
            d = qs[name](spark, sf_dir)
            d._jdf.queryExecution().executedPlan()
        plan_s = t(plan, 3)
        exec_s = t(lambda: df.write.format("noop").mode("overwrite").save(), 3)
        print(f"{name:26s} compile={compile_s:.3f}s  compile+plan={plan_s:.3f}s  exec(total)={exec_s:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
