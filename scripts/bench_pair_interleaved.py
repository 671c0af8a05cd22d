"""Interleaved Spark-vs-DuckDB pair bench: variance-robust ratios.

Whole-run pairs (bench.py then bench_oracle.py) are minutes apart — on
a shared host the load can shift in between and the ratio moves 2x for
reasons that have nothing to do with plan quality (observed round 7:
the same commit measured 1.55x and 2.02x at sf10 hours apart). This
runner alternates PER QUERY — duck, spark, duck, spark — so ambient
load hits both engines symmetrically, and reports best-of-N for each.

Usage: python scripts/bench_pair_interleaved.py [sf_dir] [reps=2]
Prints one JSON line: {"metric": "interleaved_pair", "sf_dir": …,
"queries": {name: {"spark": s, "duck": s, "ratio": r}},
"spark_total": s, "duck_total": s, "ratio": r}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> None:
    from bench import EXTENDED, HEADLINE, _jit_warmup

    import __spark_entry__ as entrymod
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark()
    if os.environ.get("SPARK_GRAFT_NO_TUNE") != "1":
        tune_for_input(spark, SF)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # same declared-keys setup as bench.py (round 10): the PK/FK facts
    # a deployment declares at ingest; off: SPARK_GRAFT_NO_DECLARED_KEYS=1
    declared_keys = os.environ.get("SPARK_GRAFT_NO_DECLARED_KEYS") != "1"
    if declared_keys:
        from duckdb_psql_spark.inventory import _psql

        _p = _psql(spark)
        for _t, _k in [
            ("region", "r_regionkey"), ("nation", "n_nationkey"),
            ("customer", "c_custkey"), ("supplier", "s_suppkey"),
            ("part", "p_partkey"), ("orders", "o_orderkey"),
        ]:
            _p.sql(f"declare primary key on '{SF}/{_t}.parquet' ({_k})")
        for _t, _c, _rt, _rk in [
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
            ("lineitem", "l_partkey", "part", "p_partkey"),
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("customer", "c_nationkey", "nation", "n_nationkey"),
            ("supplier", "s_nationkey", "nation", "n_nationkey"),
            ("nation", "n_regionkey", "region", "r_regionkey"),
        ]:
            _p.sql(
                f"declare foreign key on '{SF}/{_t}.parquet' ({_c}) "
                f"references '{SF}/{_rt}.parquet' ({_rk})"
            )
    # SPARK_GRAFT_CLUSTER=1: same pay-once co-location lever bench.py
    # exposes — the engine materializes bucketed twins from the declared
    # FK graph, and the timed queries then ride the twin substitution.
    # DuckDB keeps reading the raw parquet (its own engine; co-locating
    # its inputs is not ours to do), so the artifact is labeled.
    cluster = declared_keys and os.environ.get("SPARK_GRAFT_CLUSTER") == "1"
    cluster_write_sec = None
    if cluster:
        t0 = time.time()
        _p.sql("cluster declared keys")
        cluster_write_sec = round(time.time() - t0, 3)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF}/{t}.parquet"
        # Spark writes a directory of part files; plain testdata is a file
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    _jit_warmup(spark, SF)
    out: dict = {}
    s_total = d_total = 0.0
    for name in HEADLINE + EXTENDED:
        sql = oracles.get(name)
        # one untimed warm round each (page cache, codegen)
        queries[name](spark, SF).write.format("noop").mode("overwrite").save()
        if sql is not None:
            con.execute(sql).fetchall()
        best_s = best_d = float("inf")
        for _ in range(REPS):
            if sql is not None:
                t0 = time.time()
                con.execute(sql).fetchall()
                best_d = min(best_d, time.time() - t0)
            t0 = time.time()
            queries[name](spark, SF).write.format("noop").mode(
                "overwrite"
            ).save()
            best_s = min(best_s, time.time() - t0)
        rec = {"spark": round(best_s, 3)}
        if sql is not None:
            rec["duck"] = round(best_d, 3)
            rec["ratio"] = round(best_s / best_d, 2)
            s_total += best_s
            d_total += best_d
        out[name] = rec
    print(json.dumps({
        "metric": "interleaved_pair",
        "sf_dir": SF,
        "queries": out,
        "spark_total": round(s_total, 2),
        "duck_total": round(d_total, 2),
        "ratio": round(s_total / d_total, 3),
        "declared_keys": declared_keys,
        "cluster": cluster,
        "cluster_write_sec": cluster_write_sec,
    }))


if __name__ == "__main__":
    main()
