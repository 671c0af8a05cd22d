"""Interleaved raw/clustered A/B over the headline set in ONE session.

VERDICT r6 "what's wrong" #2: the committed whole-run pairs disagree
(early r6 pair: clustered wins 45.9->39.5s; r6b pair hours later:
clustered LOSES 37.3->42.1s). Those runs were separate sessions hours
apart on a host with ~2x run-to-run variance, so they answer nothing.

This script settles it the way BENCH_Q05_TWIN_AB does, but per QUERY:
twins for lineitem/orders are materialized once, then every query runs
reps x (raw, twin, raw, twin, ...) back-to-back inside one session —
alternation per execution, so slow host drift hits both modes equally.
Reports per-query medians for both modes plus the one-time write cost.

Usage: python scripts/bench_cluster_ab.py [sf_dir] [reps] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# headline queries whose plans can touch the lineitem/orders twins, plus
# the three x_ rows that moved in the r6b clustered pair (regression
# suspects) — everything else is twin-invariant by construction.
QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_nation_volume",
    "q08_market_share",
    "q13_customer_distribution",
    "q21_waiting_supplier",
    "q_union_distinct",
    "x_simhash_dedup",
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from duckdb_psql_spark.inventory import _psql, queries
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark(app_name="bench-cluster-ab")
    tune_for_input(spark, sf)
    psql = _psql(spark)
    qs = queries()

    spark.read.parquet(f"{sf}/lineitem.parquet").count()

    t0 = time.perf_counter()
    psql.sql(
        f"from '{sf}/lineitem.parquet' |> cluster by l_orderkey "
        "name=ab_li sort=l_orderkey"
    )
    psql.sql(
        f"from '{sf}/orders.parquet' |> cluster by o_orderkey "
        "name=ab_od sort=o_orderkey"
    )
    cluster_write_sec = round(time.perf_counter() - t0, 2)

    res = psql._compiler.resolver
    twins = dict(res.bucketed_twins)

    def run(name):
        t = time.perf_counter()
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t, 2)

    per_query = {}
    for name in QUERIES:
        if name not in qs:
            continue
        raw, twin = [], []
        run(name)  # untimed warm-up: codegen/compile paid before either mode
        for _ in range(reps):
            res.bucketed_twins.clear()
            raw.append(run(name))
            res.bucketed_twins.update(twins)
            twin.append(run(name))
        per_query[name] = {
            "raw": raw,
            "twin": twin,
            "raw_median": statistics.median(raw),
            "twin_median": statistics.median(twin),
        }
        print(
            f"{name}: raw {per_query[name]['raw_median']}s "
            f"twin {per_query[name]['twin_median']}s",
            file=sys.stderr,
        )

    payload = {
        "metric": "cluster_ab_interleaved",
        "sf_dir": sf,
        "reps": reps,
        "cluster_write_sec": cluster_write_sec,
        "raw_total_median": round(
            sum(v["raw_median"] for v in per_query.values()), 2
        ),
        "twin_total_median": round(
            sum(v["twin_median"] for v in per_query.values()), 2
        ),
        "queries": per_query,
    }
    line = json.dumps(payload)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
