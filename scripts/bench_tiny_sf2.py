"""Round-2 tiny-SF sweep: refine the winning combo + core-conf variants.

Part A (same JVM, runtime confs): broadcast threshold sizing (don't
broadcast lineitem), input split size, shuffle partitions 2 vs 4.
Part B is run via env flags (core confs need a fresh JVM):
  TINY_CORE=1 python scripts/bench_tiny_sf2.py   # locality.wait=0 + kryo
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q01_pricing_summary", "q03_shipping_priority", "q05_nation_volume",
    "q06_revenue_forecast", "q08_market_share", "q13_customer_distribution",
    "q21_waiting_supplier", "q_window_rank", "q_semi_join",
    "q_left_join_nulls", "q_asof_join", "q_doc_stats", "q_union_distinct",
    "x_minhash_dedup", "x_simhash_dedup", "x_knn_bruteforce",
    "x_text_quality", "x_tumbling_window",
]

BASE = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "4",
    "spark.sql.autoBroadcastJoinThreshold": str(8 * 1024 * 1024),
}

VARIANTS = {
    "best_r1(parts4_aqeoff_b64)": {**BASE, "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024)},
    "b8m": BASE,
    "b8m_mpb4m": {**BASE, "spark.sql.files.maxPartitionBytes": "4m"},
    "b8m_mpb2m": {**BASE, "spark.sql.files.maxPartitionBytes": "2m"},
    "b8m_mpb1m": {**BASE, "spark.sql.files.maxPartitionBytes": "1m"},
    "b8m_mpb4m_parts2": {**BASE, "spark.sql.files.maxPartitionBytes": "4m", "spark.sql.shuffle.partitions": "2"},
    "b8m_mpb4m_parts8": {**BASE, "spark.sql.files.maxPartitionBytes": "4m", "spark.sql.shuffle.partitions": "8"},
}


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    core = os.environ.get("TINY_CORE") == "1"
    b = (
        SparkSession.builder.appName("tiny2").master("local[32]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
    )
    if core:
        b = (b.config("spark.locality.wait", "0")
              .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
              .config("spark.rdd.compress", "false")
              .config("spark.shuffle.compress", "false")
              .config("spark.shuffle.spill.compress", "false"))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from duckdb_psql_spark import inventory

    qs = inventory.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    defaults = {k: spark.conf.get(k, None) for v in VARIANTS.values() for k in v}
    results = {}
    variants = VARIANTS if not core else {"core+" + k: v for k, v in list(VARIANTS.items())[1:4]}
    for vname, confs in variants.items():
        for k, val in defaults.items():
            if val is not None:
                spark.conf.set(k, val)
        for k, val in confs.items():
            spark.conf.set(k, val)
        times = {}
        for name in HEADLINE:
            df = qs[name](spark, sf_dir)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
        results[vname] = times
        print(f"RESULT {vname:30s} total={sum(times.values()):6.2f}s", flush=True)

    print("\nper-query:")
    print("query".ljust(26) + "".join(v[:16].rjust(17) for v in variants))
    for name in HEADLINE:
        print(name.ljust(26) + "".join(f"{results[v][name]:17.3f}" for v in variants))
    spark.stop()


if __name__ == "__main__":
    main()
