"""A/B for the engine-driven co-location statement (VERDICT r11 #1).

Measures the two anatomy-proven fact-exchange-bound queries (q03, q08)
at a scaled dir, interleaved with DuckDB, in BOTH layouts within one
process: raw paths first, then after ``CLUSTER DECLARED KEYS`` (the
engine materializes bucketed twins of the FK edges' big endpoints and
routes later compiles to them). Also asserts, from the executed plans,
that the bucketed layout deleted fact-side ``Exchange
hashpartitioning`` nodes — the co-location claim is plan-verified, not
inferred from timings.

Usage: python scripts/bench_cluster_declared_ab.py [sf_dir] [reps=3]
Prints one JSON line; commit as BENCH_CLUSTER_DECLARED_AB_<sf>.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
QUERIES = ("q03_shipping_priority", "q08_market_share")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def fact_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(
        re.findall(r"Exchange hashpartitioning\([^)]*\b[lo]_orderkey#", plan)
    )


def measure(queries, con, oracles, spark) -> dict:
    out: dict = {}
    for name in QUERIES:
        sql = oracles[name]
        queries[name](spark, SF).write.format("noop").mode("overwrite").save()
        con.execute(sql).fetchall()
        best_s = best_d = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            con.execute(sql).fetchall()
            best_d = min(best_d, time.time() - t0)
            t0 = time.time()
            queries[name](spark, SF).write.format("noop").mode(
                "overwrite"
            ).save()
            best_s = min(best_s, time.time() - t0)
        out[name] = {
            "spark": round(best_s, 3),
            "duck": round(best_d, 3),
            "ratio": round(best_s / best_d, 2),
            "fact_exchanges": fact_exchanges(queries[name](spark, SF)),
        }
    return out


def main() -> None:
    from bench import _jit_warmup

    import __spark_entry__ as entrymod
    from duckdb_psql_spark.inventory import _psql
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark()
    tune_for_input(spark, SF)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
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
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    _jit_warmup(spark, SF)

    raw = measure(queries, con, oracles, spark)

    t0 = time.time()
    twins = p.sql("cluster declared keys").collect()
    write_sec = round(time.time() - t0, 3)

    bucketed = measure(queries, con, oracles, spark)

    print(json.dumps({
        "metric": "cluster_declared_keys_ab",
        "sf_dir": SF,
        "reps": REPS,
        "twins": [
            {"source": r.source, "twin": r.twin, "keys": r.keys,
             "buckets": r.buckets} for r in twins
        ],
        "cluster_write_sec": write_sec,
        "raw": raw,
        "bucketed": bucketed,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
