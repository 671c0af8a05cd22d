"""Measure the skew-salting lever on a pathologically hot join key.

Builds a skewed fact table (half of all rows share ONE key) joined
against a small-ish dimension, and compares:
  * plain shuffle join with AQE skew-splitting (the default path),
  * salted_join (operators/scale.py) — hot key scattered across salt
    sub-keys, build side replicated.

AQE's skew join only helps sort-merge/shuffled-hash plans it can split;
salting also covers aggregations and the one-hot-key-bigger-than-any-
split case, which is what this synthetic reproduces.

Usage: python scripts/bench_skew.py [rows] [salt]
Prints one JSON line with both timings and the result-count equality check.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
SALT = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def timed(df, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best or 9e9, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from duckdb_psql_spark.operators.scale import salted_join
    from duckdb_psql_spark.session import default_spark

    spark = default_spark(app_name="bench-skew")
    # fact: half the rows hit key 0, rest uniform over 10k keys
    fact = spark.range(ROWS).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
        .alias("k"),
        (F.col("id") % 97).alias("payload"),
    )
    # dimension must NOT be broadcast-able, else there is no shuffle to
    # skew: pad it with a wide column and enough rows to exceed the
    # broadcast threshold
    dim = spark.range(2_000_000).select(
        F.pmod(F.col("id"), F.lit(10_000)).alias("k"),
        (F.col("id") * 7 % 1001).alias("attr"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    fact.count()  # materialize lineage once (not timed)

    plain = fact.join(dim, "k").groupBy("attr").agg(F.sum("payload").alias("s"))
    salted = (
        salted_join(fact, dim, ["k"], salt=SALT)
        .groupBy("attr")
        .agg(F.sum("payload").alias("s"))
    )
    t_plain = timed(plain)
    t_salted = timed(salted)
    same = plain.orderBy("attr").collect() == salted.orderBy("attr").collect()
    print(
        json.dumps(
            {
                "metric": "skew_join_hot_key",
                "rows": ROWS, "dim_rows": 2_000_000,
                "salt": SALT,
                "plain_aqe_sec": t_plain,
                "salted_sec": t_salted,
                "results_equal": same,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
