"""A/B the scan-reuse co-partitioned persist on q21 at a given SF.

Interleaved within one JVM (the conf is runtime-settable and the pass
re-fires per compile), warm best-of-N per variant per round, alternating
order each round so JVM warm-up drift doesn't flatter one variant.

Usage: python scripts/bench_q21_copart.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    from duckdb_psql_spark import PsqlSession
    from duckdb_psql_spark.session import default_spark, tune_for_input

    import duckdb_psql_spark.inventory as inv

    spark = default_spark(app_name="q21-copart-ab")
    tune_for_input(spark, SF)
    psql = PsqlSession(spark)
    text = inv.PAIRS["q21_waiting_supplier"][0].replace("$SF", SF)

    def run(copart: bool) -> float:
        spark.conf.set("spark.psql.scanReuse.copartition", str(copart).lower())
        df = psql.sql(text)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        # drop the cached bases so the next compile re-persists fresh
        spark.catalog.clearCache()
        return round(best, 3)

    results = {"on": [], "off": []}
    for r in range(ROUNDS):
        order = ["on", "off"] if r % 2 == 0 else ["off", "on"]
        for v in order:
            results[v].append(run(v == "on"))
        print(f"round {r}: " + ", ".join(f"{v}={results[v][-1]}" for v in order),
              flush=True)
    print(json.dumps({k: {"runs": v, "best": min(v)} for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
