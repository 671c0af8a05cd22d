"""q01 anatomy (round 13, VERDICT r12 #4): decompose the last >2x ratio.

q01 shape at sf10: single 1.49 GB lineitem scan, ~98%-selective date
filter, nine aggregates (sum/avg over double columns, several wrapped in
round()*scale casts for bit-stable cross-engine comparison) grouped by
two low-cardinality keys. Co-location cannot help (no join); the r10
anatomy predates the cluster/conf work, so this re-measures with the
current session profile and splits the time three ways:

  scan_count  - scan the 7 referenced columns + filter + plain count()
                (pure parquet decode + filter cost; the floor any
                aggregation pays)
  plain_aggs  - same scan + groupBy + UNDECORATED sum/avg/count
                (core aggregation arithmetic on top of the scan)
  native_round- hand DataFrame decorated with SPARK-NATIVE F.round()
                (what a naive PySpark port would write)
  engine      - ps.sql(q01 text) via the entry (compile + passes + the
                engine's FLOOR-arithmetic round shim)

and the same split for DuckDB (duck_scan = count(*) with the filter,
duck = full oracle), interleaved per rep so both engines sample the
same ambient conditions. First run's finding: engine ~= plain_aggs
(the FLOOR-CASE round shim makes the decoration FREE), while
native_round pays ~2.5x — Spark's Round expression routes every double
through BigDecimal.setScale per row, and the engine's DuckDB-parity
shim (functions/shims.py round rewrite) sidesteps exactly that. The
residual vs DuckDB is therefore named by scan decode + agg arithmetic,
not expressions.

Usage: python scripts/bench_q01_anatomy.py [sf_dir] [reps=3]
Writes one JSON line; redirect to BENCH_Q01_ANATOMY_sf10.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

COLS = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate"]


def main() -> None:
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark(app_name="q01-anatomy")
    tune_for_input(spark, SF)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    path = f"{SF}/lineitem.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{path}'")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def _scan():
        return (spark.read.parquet(f"{SF}/lineitem.parquet")
                .select(*COLS)
                .where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("date")))

    variants = {}
    variants["duck"] = lambda: con.execute(oracles["q01_pricing_summary"]).fetchall()
    variants["duck_scan"] = lambda: con.execute(
        "SELECT count(*) FROM lineitem WHERE l_shipdate <= DATE '2000-09-02'"
    ).fetchall()
    variants["engine"] = lambda: noop(
        queries["q01_pricing_summary"](spark, SF))
    variants["scan_count"] = lambda: noop(_scan().agg(F.count("*")))
    variants["plain_aggs"] = lambda: noop(
        _scan().groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.sum("l_extendedprice"),
            F.avg("l_quantity"), F.avg("l_extendedprice"),
            F.avg("l_discount"), F.count("*"),
        ))

    def hand_full():
        disc = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
        ).cast("bigint")
        charge = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")) * 1000000, 0
        ).cast("bigint")
        noop(
            _scan().groupBy("l_returnflag", "l_linestatus").agg(
                F.round(F.sum("l_quantity"), 0).cast("bigint").alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.sum(disc).alias("sum_disc_price"),
                F.sum(charge).alias("sum_charge"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                F.count("*").alias("count_order"),
            ).orderBy("l_returnflag", "l_linestatus")
        )

    variants["native_round"] = hand_full

    # warm both engines once (JIT/codegen/caches), then interleave
    for fn in variants.values():
        fn()
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(REPS):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            times[k].append(round(time.perf_counter() - t0, 3))

    med = {k: statistics.median(v) for k, v in times.items()}
    decomposition = {
        "spark_scan_decode_s": med["scan_count"],
        "spark_agg_arith_s": round(med["plain_aggs"] - med["scan_count"], 3),
        "spark_engine_decoration_s": round(
            med["engine"] - med["plain_aggs"], 3),
        "spark_native_round_penalty_s": round(
            med["native_round"] - med["engine"], 3),
        "duck_scan_s": med["duck_scan"],
        "duck_agg_s": round(med["duck"] - med["duck_scan"], 3),
    }
    deltas = {
        "scan": med["scan_count"] - med["duck_scan"],
        "agg_arith": decomposition["spark_agg_arith_s"]
        - decomposition["duck_agg_s"],
        "engine_decoration": decomposition["spark_engine_decoration_s"],
    }
    residual = max(deltas, key=lambda k: deltas[k])
    print(json.dumps({
        "metric": "q01_anatomy",
        "sf_dir": SF,
        "reps": REPS,
        "median_s": med,
        "all_s": times,
        "decomposition_s": decomposition,
        "spark_minus_duck_s": {k: round(v, 3) for k, v in deltas.items()},
        "ratio_engine_vs_duck": round(med["engine"] / med["duck"], 2),
        "dominant_residual": residual,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
