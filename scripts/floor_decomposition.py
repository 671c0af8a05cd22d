"""Per-query job-floor decomposition at sf0.1 (FLOOR_ANALYSIS round-7).

For each bench query: measure warm wall time AND count the Spark jobs it
launches (job-group tagging + status tracker), then compare against the
measured per-job floor (median of 40 trivial no-op jobs). The claim under
test: the sf0.1 headline is bounded below by scheduler/job overhead that
no plan change can remove at local[32], i.e.

    sum(jobs_i x per_job_floor) alone already exceeds 2x the DuckDB total.

Prints one JSON line; commit as BENCH_FLOOR_DECOMP_sf0.1.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark(app_name="floor-decomposition")
    tune_for_input(spark, sf_dir)
    sc = spark.sparkContext
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # warm once, exactly like bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    benchmod._jit_warmup(spark, sf_dir)

    # same declared-keys setup as bench.py (round 10) so the floors
    # decompose the plans the driver actually measures;
    # off: SPARK_GRAFT_NO_DECLARED_KEYS=1
    if os.environ.get("SPARK_GRAFT_NO_DECLARED_KEYS") != "1":
        from duckdb_psql_spark.inventory import _psql

        _p = _psql(spark)
        for _t, _k in [
            ("region", "r_regionkey"), ("nation", "n_nationkey"),
            ("customer", "c_custkey"), ("supplier", "s_suppkey"),
            ("part", "p_partkey"), ("orders", "o_orderkey"),
        ]:
            _p.sql(f"declare primary key on '{sf_dir}/{_t}.parquet' ({_k})")
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
                f"declare foreign key on '{sf_dir}/{_t}.parquet' ({_c}) "
                f"references '{sf_dir}/{_rt}.parquet' ({_rk})"
            )

    # per-job floor: trivial one-partition no-op actions, median of 40
    floor_samples = []
    for _ in range(40):
        t0 = time.perf_counter()
        spark.range(1, numPartitions=1).write.format("noop").mode("overwrite").save()
        floor_samples.append(time.perf_counter() - t0)
    per_job = statistics.median(floor_samples)

    # per-extra-stage floor: minimal 2-stage shuffle job (32 map + 32
    # reduce tasks over 1k rows) minus the 1-stage floor — the marginal
    # cost of ONE exchange with near-zero data at this parallelism
    from pyspark.sql import functions as F  # noqa: N812

    shuffle_samples = []
    tiny = spark.range(1000, numPartitions=32).select(
        (F.col("id") % 10).alias("k")
    )
    for _ in range(20):
        t0 = time.perf_counter()
        tiny.groupBy("k").count().write.format("noop").mode("overwrite").save()
        shuffle_samples.append(time.perf_counter() - t0)
    per_extra_stage = max(0.0, statistics.median(shuffle_samples) - per_job)

    names = benchmod.HEADLINE + benchmod.EXTENDED
    rows = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm-up run
        tracker = sc.statusTracker()
        best, jobs, stages = None, None, None
        for k in range(2):
            group = f"fd_{name}_{k}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            ids = tracker.getJobIdsForGroup(group)
            nstages = 0
            for jid in ids:
                info = tracker.getJobInfo(jid)
                if info is not None:
                    nstages += len(info.stageIds)
            if best is None or dt < best:
                best, jobs, stages = dt, len(ids), nstages
        floor = jobs * per_job + max(0, stages - jobs) * per_extra_stage
        rows[name] = {
            "warm_s": round(best, 3),
            "jobs": jobs,
            "stages": stages,
            "floor_s": round(floor, 3),
            "above_floor_s": round(max(0.0, best - floor), 3),
        }
    total_warm = round(sum(r["warm_s"] for r in rows.values()), 3)
    total_floor = round(sum(r["floor_s"] for r in rows.values()), 3)
    print(json.dumps({
        "metric": f"{os.path.basename(sf_dir.rstrip('/'))}"
                  "_floor_decomposition",
        "per_job_floor_s": round(per_job, 4),
        "per_extra_stage_floor_s": round(per_extra_stage, 4),
        "total_warm_s": total_warm,
        "total_floor_s": total_floor,
        "total_above_floor_s": round(total_warm - total_floor, 3),
        "queries": rows,
        "sf_dir": sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
