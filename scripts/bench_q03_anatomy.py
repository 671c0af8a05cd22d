"""q03 anatomy (round 8, VERDICT r7 #2): hand-plan decomposition at sf10.

q03 shape: customer(BUILDING filter, ~1/5) |> join orders on custkey
|> join lineitem on orderkey |> group by l_orderkey,o_orderdate,
o_orderpriority |> top-10 by revenue.

The engine plan shuffles lineitem (60 M rows at sf10) into a
ShuffledHashJoin with the customerxorders side (~3 M rows), then
partial-aggs into the final group-by reusing the join partitioning.
DuckDB instead BUILDS an in-process hash table on the 3 M-row side and
PROBES lineitem without any exchange. Spark's equivalent is a
broadcast-hash-join of the co side - at local[32] the broadcast is a
shared in-JVM map, and at cluster scale broadcasting ~90 MB beats
shuffling the 100 TB fact by orders of magnitude.

Variants, interleaved with DuckDB per rep (duck, variant, duck, ...):
  engine      - ps.sql(q03 text) as-is
  bcast_co    - hand DataFrame plan, broadcast(customer JOIN orders side)
  aqe_thresh  - engine text, session with raised
                spark.sql.adaptive.autoBroadcastJoinThreshold
  preagg_prj  - hand plan: narrow projection (l_orderkey, revenue term)
                before the join, broadcast co

Usage: python scripts/bench_q03_anatomy.py [sf_dir] [reps=3]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from duckdb_psql_spark.session import default_spark

    spark = default_spark(app_name="q03-anatomy")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        path = f"{SF}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    def duck():
        return con.execute(oracles["q03_shipping_priority"]).fetchall()

    def engine():
        queries["q03_shipping_priority"](spark, SF).write.format("noop").mode("overwrite").save()

    def _rd(t):
        p = f"{SF}/{t}.parquet"
        return spark.read.parquet(p)

    REV = (F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)).cast("bigint")

    def bcast_co():
        c = _rd("customer").where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
        o = _rd("orders").select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        co = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_orderdate", "o_orderpriority")
        l = _rd("lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        j = l.join(F.broadcast(co), l.l_orderkey == co.o_orderkey)
        r = (j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
               .agg(F.sum(REV).alias("revenue"))
               .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
               .orderBy(F.desc("revenue"), "l_orderkey").limit(10))
        r.write.format("noop").mode("overwrite").save()

    def preagg_prj():
        c = _rd("customer").where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
        o = _rd("orders").select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        co = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_orderdate", "o_orderpriority")
        l = _rd("lineitem").select("l_orderkey", REV.alias("rev"))
        pre = l.groupBy("l_orderkey").agg(F.sum("rev").alias("rev"))
        j = pre.join(F.broadcast(co), pre.l_orderkey == co.o_orderkey)
        r = (j.select("l_orderkey", F.col("rev").alias("revenue"), "o_orderdate", "o_orderpriority")
               .orderBy(F.desc("revenue"), "l_orderkey").limit(10))
        r.write.format("noop").mode("overwrite").save()

    variants = {"engine": engine, "bcast_co": bcast_co, "preagg_prj": preagg_prj}

    # warm each once
    duck()
    for fn in variants.values():
        fn()

    best = {k: float("inf") for k in variants}
    best["duck"] = float("inf")
    for _ in range(REPS):
        for k, fn in variants.items():
            t0 = time.time(); duck(); best["duck"] = min(best["duck"], time.time() - t0)
            t0 = time.time(); fn(); best[k] = min(best[k], time.time() - t0)
    out = {"metric": "q03_anatomy", "sf_dir": SF,
           "best": {k: round(v, 3) for k, v in best.items()},
           "ratios": {k: round(best[k] / best["duck"], 2) for k in variants}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
