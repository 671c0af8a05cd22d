"""CLUSTER DECLARED KEYS — the engine-driven co-location statement
(VERDICT r11 item 1): from the declared FK graph, materialize bucketed
twins of each large join edge's endpoints so later statements compile
to co-located (exchange-free) joins, with values identical to the
raw-path plan."""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def clustered(spark, sf_dir):
    from duckdb_psql_spark import PsqlSession

    p = PsqlSession(spark)  # fresh session: constraints/twins isolated
    for t, k in [("orders", "o_orderkey"), ("customer", "c_custkey")]:
        p.sql(f"declare primary key on '{sf_dir}/{t}.parquet' ({k})")
    for t, c, rt, rk in [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
    ]:
        p.sql(
            f"declare foreign key on '{sf_dir}/{t}.parquet' ({c}) "
            f"references '{sf_dir}/{rt}.parquet' ({rk})"
        )
    yield p
    p._compiler.resolver.bucketed_twins.clear()
    for t in (
        "lineitem_by_l_orderkey", "orders_by_o_orderkey",
        "customer_by_c_custkey",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cluster_declared_materializes_edge_endpoints(clustered, sf_dir):
    rows = {
        r.source: r
        for r in clustered.sql(
            "cluster declared keys minbytes=0 buckets=4"
        ).collect()
    }
    # biggest edge (lineitem->orders) claims both endpoints on the join
    # keys; the orders->customer edge then only adds customer (orders is
    # already claimed by the bigger edge — one layout per path)
    assert rows[f"{sf_dir}/lineitem.parquet"].keys == "l_orderkey"
    assert rows[f"{sf_dir}/orders.parquet"].keys == "o_orderkey"
    assert rows[f"{sf_dir}/customer.parquet"].keys == "c_custkey"
    assert all(r.buckets == 4 for r in rows.values())
    tw = clustered._compiler.resolver.bucketed_twins
    assert tw[f"{sf_dir}/orders.parquet"][1] == ("o_orderkey",)


def test_cluster_declared_minbytes_floor_skips_all(clustered):
    # default floor is 64 MB; every sf0.001 table is far below it
    assert clustered.sql("cluster declared keys").count() == 0
    assert not clustered._compiler.resolver.bucketed_twins


def test_cluster_declared_unknown_option(clustered):
    from duckdb_psql_spark.errors import PsqlCompileError

    with pytest.raises(PsqlCompileError, match="unknown option"):
        clustered.sql("cluster declared keys shards=3")


def test_cluster_declared_join_goes_exchange_free(clustered, sf_dir):
    """After CLUSTER DECLARED KEYS, the q03-class fact join compiles
    against both twins and the join-side exchanges disappear; values
    match the raw-path plan exactly."""
    spark = clustered.spark
    stmt = (
        f"from '{sf_dir}/lineitem.parquet' |> as l "
        f"join '{sf_dir}/orders.parquet' as o on l.l_orderkey = o.o_orderkey "
        "|> select o_orderpriority, "
        "cast(round(sum(l_extendedprice), 2) as double) as rev, "
        "count() as n group by o_orderpriority |> order by o_orderpriority"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.psql.broadcastHint.maxBytes", "0")
    try:
        base = clustered.sql(stmt)
        base_rows = [tuple(r) for r in base.collect()]
        base_ex = _plan(base).count("Exchange hashpartitioning")
        assert base_ex >= 3
        clustered.sql("cluster declared keys minbytes=0 buckets=4")
        tw = clustered.sql(stmt)
        tw_plan = _plan(tw)
        assert "Bucketed: true" in tw_plan
        assert tw_plan.count("Exchange hashpartitioning") <= base_ex - 2
        assert [tuple(r) for r in tw.collect()] == base_rows
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.psql.broadcastHint.maxBytes")


def test_cluster_declared_idempotent(clustered):
    first = clustered.sql("cluster declared keys minbytes=0 buckets=4")
    assert first.count() == 3
    # second invocation: every path already claimed -> nothing rewritten
    assert clustered.sql("cluster declared keys minbytes=0").count() == 0
