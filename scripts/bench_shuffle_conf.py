"""Sweep core shuffle confs for the sf10 join-heavy queries.

spark.shuffle.compress / spark.shuffle.spill.compress are SparkContext-
static, so each variant runs in its own JVM (this script re-execs itself
as a child per variant). Shuffle files already live on tmpfs
(session.py _local_scratch_dir), so compression buys no IO on this rig —
only CPU — making "off" a plausible local-mode win. On a real cluster
with disk+network shuffle, compression stays on (these confs are
local-bench tuning, not shipped defaults, unless the win is decisive).

Usage: python scripts/bench_shuffle_conf.py [sf_dir] [rounds]
Child: python scripts/bench_shuffle_conf.py --child <sf_dir> <conf_json>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["q01_pricing_summary", "q03_shipping_priority",
           "q05_nation_volume", "q21_waiting_supplier"]

VARIANTS = {
    "baseline": {},
    "no_compress": {"spark.shuffle.compress": "false",
                    "spark.shuffle.spill.compress": "false"},
    "p64": {"spark.sql.shuffle.partitions": "64"},
}


def child(sf_dir: str, confs: dict) -> None:
    # mirror default_spark's confs (session.py) + the variant's — core
    # shuffle confs must be present before the SparkContext starts
    from pyspark.sql import SparkSession

    from duckdb_psql_spark.session import (
        _driver_java_options, _local_scratch_dir, tune_for_input,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    b = (
        SparkSession.builder.appName("shuffle-sweep")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.local.dir", _local_scratch_dir())
        .config("spark.driver.extraJavaOptions", _driver_java_options())
        .config("spark.ui.enabled", "false")
    )
    for k, v in confs.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, sf_dir)
    # sql-level confs are runtime-settable; re-apply over the profile
    for k, v in confs.items():
        if k.startswith("spark.sql."):
            spark.conf.set(k, v)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    out = {}
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print("CHILD_RESULT " + json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], json.loads(sys.argv[3]))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    results: dict[str, list[float]] = {}
    for r in range(rounds):
        order = list(VARIANTS) if r % 2 == 0 else list(reversed(VARIANTS))
        for name in order:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 sf_dir, json.dumps(VARIANTS[name])],
                capture_output=True, text=True, timeout=900, cwd=REPO,
            )
            for line in p.stdout.splitlines():
                if line.startswith("CHILD_RESULT "):
                    d = json.loads(line[len("CHILD_RESULT "):])
                    tot = round(sum(d.values()), 3)
                    results.setdefault(name, []).append(tot)
                    print(f"rep{r} {name}: {tot} {d}", flush=True)
                    break
            else:
                print(f"rep{r} {name}: FAILED\n{p.stderr[-1000:]}", flush=True)
    print(json.dumps({k: {"runs": v, "best": min(v)} for k, v in results.items()}))


if __name__ == "__main__":
    main()
