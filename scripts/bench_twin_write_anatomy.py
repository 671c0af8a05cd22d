"""VERDICT r13 #4: profile the CLUSTER DECLARED KEYS twin write at sf10.

Decomposes the pay-once write into shuffle / sort / parquet-encode, A/Bs
the parquet codec (snappy vs zstd), and measures overlapping the three
independent twin writes from a driver thread pool (guide §2.6) against
the sequential loop.

Usage: python scripts/bench_twin_write_anatomy.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_psql_spark.session import default_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = default_spark(app_name="twin-write-anatomy")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from duckdb_psql_spark.operators.scale import write_bucketed

    res: dict = {"sf_dir": sf_dir}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li_b = sum(
        os.path.getsize(os.path.join(f"{sf_dir}/lineitem.parquet", f))
        for f in os.listdir(f"{sf_dir}/lineitem.parquet")
        if not f.startswith(".")
    )
    # same bucket derivation as _run_cluster_declared's bytes default
    cores = spark.sparkContext.defaultParallelism
    target = 32 * 1024 * 1024
    buckets = max(cores, 8, -(-li_b // target))
    buckets = -(-buckets // cores) * cores
    res["buckets"] = buckets
    res["lineitem_bytes"] = li_b

    def t(fn, label, n=2):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
        res[label] = times
        print(label, times)

    # --- decomposition on the biggest twin (lineitem by l_orderkey) ---
    spark.sparkContext.setJobDescription("anatomy: shuffle only")
    t(
        lambda: li.repartition(buckets, F.col("l_orderkey"))
        .write.format("noop").mode("overwrite").save(),
        "li_shuffle_noop",
    )
    spark.sparkContext.setJobDescription("anatomy: shuffle+sort")
    t(
        lambda: li.repartition(buckets, F.col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.format("noop").mode("overwrite").save(),
        "li_shuffle_sort_noop",
    )

    def wb(df, name, keys):
        return lambda: write_bucketed(
            df, name, keys=keys, buckets=buckets, sort_cols=keys
        )

    for codec in ("snappy", "zstd"):
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        spark.sparkContext.setJobDescription(f"anatomy: li write {codec}")
        t(wb(li, "tw_anat_li", ["l_orderkey"]), f"li_write_{codec}")
        loc = os.path.join("spark-warehouse", "tw_anat_li")
        if os.path.isdir(loc):
            res[f"li_twin_bytes_{codec}"] = sum(
                os.path.getsize(os.path.join(loc, f))
                for f in os.listdir(loc)
                if not f.startswith(".") and not f.startswith("_")
            )

    # --- sequential vs threaded: all three sf10 twins ---
    jobs = [
        (li, "tw_anat_li", ["l_orderkey"]),
        (od, "tw_anat_o1", ["o_orderkey"]),
        (od, "tw_anat_o2", ["o_custkey"]),
    ]
    for codec in ("snappy", "zstd"):
        spark.conf.set("spark.sql.parquet.compression.codec", codec)

        def seq():
            for df, name, keys in jobs:
                spark.sparkContext.setJobDescription(f"seq write {name}")
                write_bucketed(df, name, keys=keys, buckets=buckets, sort_cols=keys)

        t(seq, f"three_twins_sequential_{codec}")

        def par():
            def one(job):
                df, name, keys = job
                spark.sparkContext.setJobDescription(f"par write {name}")
                write_bucketed(df, name, keys=keys, buckets=buckets, sort_cols=keys)

            with ThreadPoolExecutor(max_workers=3) as pool:
                list(pool.map(one, jobs))

        t(par, f"three_twins_threaded_{codec}")

    for _df, name, _k in jobs:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    res["boot_id"] = open("/proc/sys/kernel/random/boot_id").read().strip()
    if out_path:
        json.dump(res, open(out_path, "w"), indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
