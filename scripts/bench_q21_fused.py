"""q21 fused-probe experiment (VERDICT r9 next-round #2): fold the
EXISTS / NOT-EXISTS probes into ONE aggregation of lineitem, joined
back once — 1 fact shuffle instead of 3 (base + semi probe + anti
probe).

Soundness (no FD assumptions): for each l_orderkey compute
  n_supp   = count(DISTINCT l_suppkey)
  only_sk  = the single suppkey when n_supp = 1
  (c1, m1) = suppkey with the LARGEST per-supplier max(l_shipdate), m1
  m2       = second-largest per-supplier max(l_shipdate)
then for an outer row (ok, sk, od):
  EXISTS(other supplier)        <=> n_supp > 1 OR only_sk <> sk
  NOT EXISTS(other LATE suppl.) <=> other_max IS NULL OR
                                    other_max <= od + 30
  where other_max = m2 if c1 = sk else m1.
Values checked against the engine's q21_waiting_supplier each leg.

Usage: python scripts/bench_q21_fused.py [sf_dir] [reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def fused(spark, sf):
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    supp = spark.read.parquet(f"{sf}/supplier.parquet")

    # one aggregation of the fact table: per-supplier max shipdate per
    # order (partial agg collapses map-side), then per-order top-2 +
    # distinct-supplier count — a single l_orderkey shuffle
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("ms")
    )
    # top-2 via a sorted per-order struct list: per_supp rows per order
    # = distinct suppliers on the order (bounded small by the schema's
    # lines-per-order), so the array is tiny
    agg = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.min("l_suppkey").alias("only_sk"),
        F.expr(
            "sort_array(collect_list(struct(ms, l_suppkey)), false)"
        ).alias("tops"),
    ).select(
        "l_orderkey", "n_supp", "only_sk",
        F.col("tops")[0]["l_suppkey"].alias("c1"),
        F.col("tops")[0]["ms"].alias("m1"),
        F.expr("get(tops, 1).ms").alias("m2"),
    )

    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            (F.col("o_orderstatus") == "F")
            & (F.col("l_shipdate") > F.expr("o_orderdate + interval 30 day"))
        )
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").alias("sk"),
            F.col("o_orderdate").alias("od"),
        )
    )
    j = base.join(agg, base.ok == agg.l_orderkey)
    other_max = F.when(F.col("c1") == F.col("sk"), F.col("m2")).otherwise(
        F.col("m1")
    )
    keep = (
        ((F.col("n_supp") > 1) | (F.col("only_sk") != F.col("sk")))
        & (
            other_max.isNull()
            | (other_max <= F.expr("od + interval 30 day"))
        )
    )
    c = j.where(keep).join(supp, F.col("sk") == supp.s_suppkey)
    return (
        c.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


def main() -> None:
    import __spark_entry__ as entrymod
    from duckdb_psql_spark.session import default_spark

    spark = default_spark(app_name="q21-fused")
    qs = entrymod.queries()

    # value parity first
    eng = [tuple(r) for r in qs["q21_waiting_supplier"](spark, SF).collect()]
    fus = [tuple(r) for r in fused(spark, SF).collect()]
    ok = eng == fus
    print("values match:", ok)
    if not ok:
        print("engine:", eng[:5])
        print("fused :", fus[:5])
        sys.exit(1)

    legs = {"engine": lambda: qs["q21_waiting_supplier"](spark, SF),
            "fused": lambda: fused(spark, SF)}
    for name, fn in legs.items():
        fn().write.format("noop").mode("overwrite").save()  # warm
    times = {k: [] for k in legs}
    for _ in range(REPS):
        for name, fn in legs.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    out = {"sf_dir": SF, "reps": REPS,
           "times": times,
           "best": {k: min(v) for k, v in times.items()}}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
