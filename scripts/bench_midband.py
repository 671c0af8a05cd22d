"""Mid-band (64 MB..1 GiB) profile sweep, interleaved in one session.

VERDICT r6 #3: sf1 (~208 MB) is the worst committed scale point (4.4x,
q13 18.6x) and the only band never swept. Suspect: the scale profile's
128 MB maxPartitionBytes makes the 125 MB sf1 lineitem a SINGLE scan
task on a 32-core host, serializing every scan-bound query.

Profiles share the scale profile's AQE/broadcast settings and vary scan
split size / reduce partitions. Per query, execution order interleaves
profiles within each rep so host drift lands on all profiles equally.

Usage: python scripts/bench_midband.py [sf_dir] [reps] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = 1024 * 1024

PROFILES = {
    # control: today's scale profile at sf1
    "ctl": {},
    "s16": {"spark.sql.files.maxPartitionBytes": str(16 * MB)},
    "s8": {"spark.sql.files.maxPartitionBytes": str(8 * MB)},
    "s8_p8": {
        "spark.sql.files.maxPartitionBytes": str(8 * MB),
        "spark.sql.shuffle.partitions": "8",
    },
    "s8_p8_noaqe": {
        "spark.sql.files.maxPartitionBytes": str(8 * MB),
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "false",
    },
    "s4_p4_noaqe": {
        "spark.sql.files.maxPartitionBytes": str(4 * MB),
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.adaptive.enabled": "false",
    },
}

QUERIES = [
    "q01_pricing_summary",
    "q05_nation_volume",
    "q13_customer_distribution",
    "q21_waiting_supplier",
    "q_union_distinct",
    "x_tumbling_window",
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from duckdb_psql_spark.inventory import queries
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark(app_name="bench-midband")
    base_total = tune_for_input(spark, sf)
    base = {
        k: spark.conf.get(k)
        for k in sorted({k for p in PROFILES.values() for k in p})
    }
    qs = queries()
    spark.read.parquet(f"{sf}/lineitem.parquet").count()

    def set_profile(p):
        for k, v in base.items():
            spark.conf.set(k, p.get(k, v))

    results = {name: {p: [] for p in PROFILES} for name in QUERIES}
    for name in QUERIES:
        if name not in qs:
            continue
        df = qs[name](spark, sf)
        df.write.format("noop").mode("overwrite").save()  # warm, untimed
        for _ in range(reps):
            for pname, p in PROFILES.items():
                set_profile(p)
                # conf changes only affect NEW plans — recompose per run
                d = qs[name](spark, sf)
                t0 = time.perf_counter()
                d.write.format("noop").mode("overwrite").save()
                results[name][pname].append(round(time.perf_counter() - t0, 3))
    set_profile({})

    medians = {
        name: {p: statistics.median(v) for p, v in r.items() if v}
        for name, r in results.items()
        if any(r.values())
    }
    totals = {
        p: round(sum(medians[n][p] for n in medians), 3) for p in PROFILES
    }
    payload = {
        "metric": "midband_profile_sweep",
        "sf_dir": sf,
        "input_bytes": base_total,
        "reps": reps,
        "totals": totals,
        "medians": medians,
        "raw": results,
    }
    line = json.dumps(payload)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
