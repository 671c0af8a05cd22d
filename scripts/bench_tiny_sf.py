"""Config-sweep experiment for the tiny-SF fixed-overhead gap.

At sf0.1 (~17 MB total input) every headline query is dominated by JVM
job-scheduling / AQE stage-wave overhead, not data. This sweep runs the
headline set under several *runtime-settable* config variants in one JVM
to find which knobs actually move the floor. Output: per-variant totals.

Usage: python scripts/bench_tiny_sf.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_psql_spark.session import default_spark  # noqa: E402
from duckdb_psql_spark import inventory  # noqa: E402

HEADLINE = [
    "q01_pricing_summary", "q03_shipping_priority", "q05_nation_volume",
    "q06_revenue_forecast", "q08_market_share", "q13_customer_distribution",
    "q21_waiting_supplier", "q_window_rank", "q_semi_join",
    "q_left_join_nulls", "q_asof_join", "q_doc_stats", "q_union_distinct",
    "x_minhash_dedup", "x_simhash_dedup", "x_knn_bruteforce",
    "x_text_quality", "x_tumbling_window",
]

VARIANTS: dict[str, dict[str, str]] = {
    "baseline(r4)": {},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "parts8": {"spark.sql.shuffle.partitions": "8"},
    "parts4_aqe_off": {
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.adaptive.enabled": "false",
    },
    "bcast64m": {"spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024)},
    "combo(parts8+bcast64m)": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    },
    "combo+aqe_off": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.adaptive.enabled": "false",
    },
    "combo+parts1": {
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.adaptive.enabled": "false",
    },
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = default_spark(app_name="tiny-sf-sweep")
    qs = inventory.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm

    defaults = {k: spark.conf.get(k, None) for v in VARIANTS.values() for k in v}

    results: dict[str, dict[str, float]] = {}
    for vname, confs in VARIANTS.items():
        for k, val in defaults.items():
            if val is not None:
                spark.conf.set(k, val)
        for k, val in confs.items():
            spark.conf.set(k, val)
        times: dict[str, float] = {}
        for name in HEADLINE:
            df = qs[name](spark, sf_dir)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
        results[vname] = times
        print(f"{vname:28s} total={sum(times.values()):6.2f}s", flush=True)

    print("\nper-query breakdown:")
    header = "query".ljust(26) + "".join(v[:14].rjust(15) for v in VARIANTS)
    print(header)
    for name in HEADLINE:
        row = name.ljust(26) + "".join(
            f"{results[v][name]:15.3f}" for v in VARIANTS
        )
        print(row)
    spark.stop()


if __name__ == "__main__":
    main()
