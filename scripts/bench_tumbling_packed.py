"""Tumbling-window packed-key probe (VERDICT r11 item 5).

The r11 anatomy pinned the residual to per-row hash-agg probing on TWO
group keys (bigint bucket + string event_type), ~0.15 s per key over
10 M rows. Variants measured here, all value-checked against the
current two-key formulation:

  A. current: groupBy(bucket_bigint, event_type)
  B. packed: dictionary-encode event_type (one distinct scan, amortized
     by a session cache in a deployment) into the low 3 bits of one
     bigint, groupBy(packed), unpack post-agg. Single primitive key →
     Spark's codegen fast hash map.
  C. pivoted: groupBy(bucket) with one count+sum pair per dictionary
     value (conditional aggregates), stack post-agg. One key, no
     dictionary lookup per row beyond the conditionals.

Prints one JSON line; informs whether the packed key ships.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SECS = 3600


def main() -> None:
    import duckdb

    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark()
    tune_for_input(spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.count()  # warm listing/cache

    bucket = (F.unix_timestamp(F.col("ts")) / SECS).cast("bigint")

    def variant_a():
        return (
            ev.groupBy(bucket.alias("__bucket"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(
                F.timestamp_seconds(F.col("__bucket") * SECS).alias("window_start"),
                "event_type", "n_events", "sum_value")
        )

    # dictionary: one distinct scan (a deployment caches this per
    # ingest; here it is measured separately)
    t0 = time.time()
    types = sorted(
        r[0] for r in ev.select("event_type").distinct().collect()
        if r[0] is not None
    )
    dict_sec = round(time.time() - t0, 3)
    nbits = max(1, (len(types) + 1).bit_length())
    tmap = F.create_map(*[
        x for i, t in enumerate(types) for x in (F.lit(t), F.lit(i + 1))
    ])

    def variant_b():
        code = F.coalesce(tmap[F.col("event_type")], F.lit(0))
        packed = (bucket * (1 << nbits) + code).alias("__pk")
        arr = F.array(*[F.lit(None).cast("string"), *[F.lit(t) for t in types]])
        agg = (
            ev.groupBy(packed)
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
        )
        return agg.select(
            F.timestamp_seconds(
                F.floor(F.col("__pk") / (1 << nbits)).cast("bigint") * SECS
            ).alias("window_start"),
            F.element_at(arr, (F.col("__pk") % (1 << nbits)).cast("int") + 1
                         ).alias("event_type"),
            "n_events", "sum_value",
        )

    def variant_c():
        aggs = []
        for i, t in enumerate(types):
            cond = F.col("event_type") == t
            aggs.append(F.count(F.when(cond, 1)).alias(f"n{i}"))
            aggs.append(F.round(F.sum(F.when(cond, F.col("value"))), 2)
                        .alias(f"s{i}"))
        agg = ev.groupBy(bucket.alias("__bucket")).agg(*aggs)
        stack = ", ".join(
            f"'{t}', n{i}, s{i}" for i, t in enumerate(types)
        )
        return agg.selectExpr(
            "timestamp_seconds(__bucket * {}) as window_start".format(SECS),
            f"stack({len(types)}, {stack}) as (event_type, n_events, sum_value)",
        ).where("n_events > 0")

    variants = {"A_two_key": variant_a, "B_packed": variant_b,
                "C_pivoted": variant_c}
    # value parity first
    ref = {tuple(r) for r in variant_a().collect()}
    parity = {}
    for name, fn in variants.items():
        parity[name] = ({tuple(r) for r in fn().collect()} == ref)
    res = {}
    for name, fn in variants.items():
        fn().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        res[name] = round(best, 3)
    # duck oracle timing for the same aggregation
    con = duckdb.connect()
    path = f"{SF}/events.parquet"
    if os.path.isdir(path):
        path += "/*.parquet"
    dsql = (
        "select to_timestamp(cast(epoch(ts) as bigint) // 3600 * 3600) ws, "
        "event_type, count(*), round(sum(value),2) from "
        f"'{path}' group by 1, 2"
    )
    con.execute(dsql).fetchall()
    bd = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        con.execute(dsql).fetchall()
        bd = min(bd, time.time() - t0)
    print(json.dumps({
        "metric": "tumbling_packed_probe", "sf_dir": SF, "reps": REPS,
        "dict_scan_sec": dict_sec, "n_types": len(types),
        "value_parity": parity, "best_sec": res, "duck": round(bd, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
