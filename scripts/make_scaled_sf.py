"""Generate a scaled-up benchmark dataset by replicating sf0.1 with key offsets.

Produces data/sf<K/10> inside the repo (testdata is read-only). Each fact
table is unioned K times; every key column is offset per replica by a
stride larger than the original key domain, and foreign keys are offset by
the SAME stride as their dimension, so each replica joins only within
itself: join/agg output cardinalities scale exactly linearly and the data
distribution (skew, value ranges, string contents) is preserved.
nation/region stay fixed (real deployments don't grow dimension tables of
countries), so group-by-nation fan-in grows 10x per key - the realistic
shape.

Usage: python scripts/make_scaled_sf.py [K] [out_dir]
  K default 10 (sf0.1 -> sf1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"

# table -> {column: stride_key}; a stride_key names the key domain whose
# max defines the offset stride, so FKs line up with their dimension.
KEYED = {
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
STRIDE_SOURCE = {  # key domain -> (table, column) holding its max
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
UNKEYED = ["nation", "region"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "data", f"sf{k / 10:g}")
    )
    from duckdb_psql_spark.session import default_spark

    spark = default_spark(app_name="make-scaled-sf")
    os.makedirs(out, exist_ok=True)

    strides = {}
    for dom, (tbl, col) in STRIDE_SOURCE.items():
        m = spark.read.parquet(f"{SRC}/{tbl}.parquet").agg(F.max(col)).first()[0]
        strides[dom] = int(m) + 1
    print("strides:", strides)

    for tbl in UNKEYED:
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        df.write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
        print(tbl, "copied")

    for tbl, keycols in KEYED.items():
        base = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        # replicate via a range cross: one narrow 0..k-1 DF, broadcast,
        # so the scan of the base table happens once per output partition
        reps = spark.range(k).withColumnRenamed("id", "__rep")
        df = base.crossJoin(F.broadcast(reps))
        for col, dom in keycols.items():
            df = df.withColumn(
                col, (F.col(col) + F.col("__rep") * F.lit(strides[dom])).cast("long")
            )
        if tbl == "documents":
            # realistic dup structure: ~10% of replicas are near-dup
            # variants of the original (tagged text), the rest get fresh
            # deterministic text of similar length. A 100%-dup corpus makes
            # every LSH bucket quadratic in k — unrealistic; real pipelines
            # dedup at single-digit duplicate rates.
            n_words = F.greatest(F.size(F.split(F.col("text"), " ")), F.lit(8))
            fresh = F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), n_words),
                    lambda i: F.substring(
                        F.md5(
                            F.concat_ws(
                                "_",
                                F.col("doc_id").cast("string"),
                                i.cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                ),
            )
            is_variant = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(10)) == 0
            df = df.withColumn(
                "text",
                F.when(F.col("__rep") == 0, F.col("text"))
                .when(
                    is_variant,
                    F.concat(
                        F.lit("variant "),
                        F.col("__rep").cast("string"),
                        F.lit(" of "),
                        F.col("text"),
                    ),
                )
                .otherwise(fresh),
            )
        if tbl == "embeddings":
            # deterministic per-replica jitter so cosine-dup groups stay
            # small; direction depends on (vec_id, rep) via xxhash64
            df = df.withColumn(
                "embedding",
                F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(
                    F.transform(
                        F.col("embedding"),
                        lambda x, i: x
                        + (
                            F.pmod(
                                F.xxhash64(F.col("vec_id"), i), F.lit(1000)
                            ).cast("double")
                            / 1000.0
                            - 0.5
                        )
                        * 0.2,
                    )
                ),
            )
        df = df.drop("__rep")
        # one file per local core: scan parallelism without tiny-file overhead
        n_files = max(1, min(32, k * 4))
        df.repartition(n_files).write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
        print(tbl, "x", k, "->", f"{out}/{tbl}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
