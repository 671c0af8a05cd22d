"""Tuning probe for the CLUSTER DECLARED KEYS bucketed path (round 12).

Variants measured on q03/q08 at sf10, all with twins present:
  A. as-written twins (bucketBy from the scan's natural partitioning —
     many files per bucket, so SMJ cannot assume sortedness)
  B. one-file-per-bucket twins (repartition(buckets, key) before the
     bucketed write — FileSourceScanExec then reports outputOrdering and
     sort-merge joins skip their sorts)
  C. B + preferSortMergeJoin=false (shuffled-hash join over co-located
     buckets: no sort at all, hash build per bucket)
Prints one JSON line with per-variant best-of-3 and the executed join
node names.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
REPS = 3
QUERIES = ("q03_shipping_priority", "q08_market_share")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    from bench import _jit_warmup

    import __spark_entry__ as entrymod
    from duckdb_psql_spark.inventory import _psql
    from duckdb_psql_spark.operators.scale import write_bucketed
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark()
    tune_for_input(spark, SF)
    queries = entrymod.queries()
    p = _psql(spark)
    for _t, _k in [("orders", "o_orderkey")]:
        p.sql(f"declare primary key on '{SF}/{_t}.parquet' ({_k})")
    p.sql(
        f"declare foreign key on '{SF}/lineitem.parquet' (l_orderkey) "
        f"references '{SF}/orders.parquet' (o_orderkey)"
    )
    _jit_warmup(spark, SF)
    res: dict = {}

    def measure(tag: str) -> None:
        out = {}
        for name in QUERIES:
            queries[name](spark, SF).write.format("noop").mode(
                "overwrite"
            ).save()
            best = float("inf")
            for _ in range(REPS):
                t0 = time.time()
                queries[name](spark, SF).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            plan = plan_of(queries[name](spark, SF))
            out[name] = {
                "sec": round(best, 3),
                "joins": sorted(set(re.findall(r"(\w*Join\w*)", plan)))[:4],
                "sorts": plan.count("Sort "),
                "fact_ex": len(re.findall(
                    r"Exchange hashpartitioning\([^)]*\b[lo]_orderkey#", plan
                )),
            }
        res[tag] = out

    buckets = 64
    reg = p._compiler.resolver

    # A: natural-partitioning twins (what _run_cluster_declared writes today)
    for path, key in ((f"{SF}/lineitem.parquet", "l_orderkey"),
                      (f"{SF}/orders.parquet", "o_orderkey")):
        df = reg.resolve(path)
        name = f"tuneA_{os.path.basename(path).split('.')[0]}"
        write_bucketed(df, name, keys=[key], buckets=buckets, sort_cols=[key])
        reg.register_bucketed_twin(path, name, (key,))
    p._compiler._plan_cache.clear()
    measure("A_natural")

    # B: one-file-per-bucket twins
    for path, key in ((f"{SF}/lineitem.parquet", "l_orderkey"),
                      (f"{SF}/orders.parquet", "o_orderkey")):
        df = reg.resolve(path).repartition(buckets, key)
        name = f"tuneB_{os.path.basename(path).split('.')[0]}"
        write_bucketed(df, name, keys=[key], buckets=buckets, sort_cols=[key])
        reg.register_bucketed_twin(path, name, (key,))
    p._compiler._plan_cache.clear()
    measure("B_onefile")

    # C: B + shuffled-hash preference
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    p._compiler._plan_cache.clear()
    measure("C_onefile_shj")
    spark.conf.unset("spark.sql.join.preferSortMergeJoin")

    print(json.dumps({"metric": "cluster_tune", "sf_dir": SF,
                      "buckets": buckets, "variants": res}))
    for t in ("tuneA_lineitem", "tuneA_orders", "tuneB_lineitem",
              "tuneB_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
