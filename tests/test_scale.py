"""Scale-toolkit tests: bucketed joins skip their shuffle; salting keeps
results identical while scattering hot keys."""

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    from duckdb_psql_spark.operators.scale import write_bucketed

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bc = write_bucketed(cust, "b_customer", keys=["c_custkey"], buckets=4)
    bo = write_bucketed(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        "b_orders", keys=["c_custkey"], buckets=4,
    )
    yield bc, bo
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    bc, bo = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = bc.join(bo, "c_custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located buckets: zero shuffles
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_no_shuffle(spark, bucketed_pair):
    from pyspark.sql import functions as F

    _, bo = bucketed_pair
    agg = bo.groupBy("c_custkey").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(agg)


def test_shuffled_hash_default_degrades_to_smj(spark, sf_dir):
    """Adversarial check on the session default
    ``preferSortMergeJoin=false`` (session.py): with a build side too big
    for a local hash map the planner must FALL BACK to sort-merge — the
    preference is a hint, not a correctness cliff. A comfortably small
    build side should still pick shuffled-hash (the 1.8-1.9x sf10 win),
    and both shapes must agree with each other."""
    from pyspark.sql import functions as F

    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    try:
        # small positive threshold: below every side here (no broadcast
        # escape hatch) but nonzero so canBuildLocalHashMap — which is
        # threshold × shuffle partitions — can still admit a SMALL build
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        # hot build: 50% of rows share key 0, fat payload → per-partition
        # build size far above the local-hash-map budget
        n = 400_000
        build = (
            spark.range(n)
            .withColumn(
                "k",
                F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id") % 500),
            )
            .withColumn("pay", F.concat(F.lit("x" * 400), F.col("id").cast("string")))
        )
        probe = spark.range(50_000).withColumn("k", F.col("id") % 500)
        j = probe.join(build, "k")
        plan = _plan(j)
        assert "SortMergeJoin" in plan and "ShuffledHashJoin" not in plan, (
            "oversized hot build side must degrade to sort-merge"
        )
        smj_count = j.count()

        # small build side: the preference applies → shuffled-hash
        small_build = spark.range(2_000).withColumn("k", F.col("id") % 500)
        j2 = probe.join(small_build, "k")
        plan2 = _plan(j2)
        assert "ShuffledHashJoin" in plan2, "small build side should hash-join"

        # equality of the two physical shapes on the same logical join
        forced = spark.conf.get("spark.sql.join.preferSortMergeJoin")
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        try:
            assert probe.join(build, "k").count() == smj_count
        finally:
            spark.conf.set("spark.sql.join.preferSortMergeJoin", forced)
    finally:
        for key, val in old.items():
            spark.conf.set(key, val)


def test_salted_join_matches_plain(spark, sf_dir):
    from duckdb_psql_spark.operators.scale import salted_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_name")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_custkey as c_custkey", "o_orderkey"
    )
    plain = orders.join(cust, "c_custkey").count()
    salted = salted_join(orders, cust, ["c_custkey"], salt=8)
    assert salted.count() == plain
    left_only = salted_join(
        cust, orders, ["c_custkey"], how="left", salt=4
    ).count()
    assert left_only == cust.join(orders, "c_custkey", "left").count()
