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
