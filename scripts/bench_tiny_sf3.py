"""Round-5 tiny-SF sweep #3: broadcast-build jobs vs in-job shuffles.

FLOOR_ANALYSIS.md attributes q05's cost to six jobs — five broadcast
exchange builds plus the main job, each paying the ~0.1s job floor.
Hypothesis: at tiny SF, turning broadcast OFF entirely (threshold -1)
folds the dim joins into the single main job as 4-partition shuffled-hash
joins — more stages, fewer jobs. This sweep measures that directly on
the four most expensive headline queries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["q01_pricing_summary", "q03_shipping_priority",
           "q05_nation_volume", "q21_waiting_supplier"]

TINY = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "4",
    "spark.sql.autoBroadcastJoinThreshold": str(8 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
}

VARIANTS = {
    "tiny(b8m)": TINY,
    "tiny_nobcast": {**TINY, "spark.sql.autoBroadcastJoinThreshold": "-1"},
    "tiny_nobcast_p2": {**TINY, "spark.sql.autoBroadcastJoinThreshold": "-1",
                        "spark.sql.shuffle.partitions": "2"},
    "tiny_b64m": {**TINY, "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024)},
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from duckdb_psql_spark.session import default_spark

    import __spark_entry__ as entry

    spark = default_spark(app_name="tiny3", cpus=32)
    qs = entry.queries()
    # warm the JVM/codegen paths once so cycle 1 isn't systematically slow
    for qname in QUERIES:
        qs[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # interleave variants round-robin: JVM warm-up drift hits all variants
    # equally instead of flattering whichever config happens to run last
    best: dict[str, dict[str, float]] = {v: {q: float("inf") for q in QUERIES} for v in VARIANTS}
    for _cycle in range(4):
        for vname, conf in VARIANTS.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            for qname in QUERIES:
                t0 = time.monotonic()
                qs[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                best[vname][qname] = min(best[vname][qname], dt)
    results: dict[str, dict[str, float]] = {}
    for vname, per in best.items():
        out = {q: round(t, 3) for q, t in per.items()}
        out["TOTAL"] = round(sum(per.values()), 3)
        results[vname] = out
        print(vname, out, flush=True)
    spark.stop()
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
