"""Property-based differential testing: random pipelines vs the DuckDB oracle.

The reference has no property-based tests (SURVEY.md §5.1); this suite
generates random-but-valid pipelines from a small AST (filters → optional
aggregation → order → optional limit) over the ``orders`` table, renders
BOTH a PSQL pipeline (our engine) and an ANSI SELECT (DuckDB), and checks
order-insensitive value equality. Aggregate expressions follow the
float-stability conventions from duckdb_psql_spark.inventory.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ORDERS = None  # set in fixture


PREDICATES = [
    ("o_totalprice > 150000", "o_totalprice > 150000"),
    ("o_totalprice <= 50000", "o_totalprice <= 50000"),
    ("o_orderstatus = 'F'", "o_orderstatus = 'F'"),
    ("o_orderpriority in ('1-URGENT', '2-HIGH')", "o_orderpriority IN ('1-URGENT', '2-HIGH')"),
    ("o_orderdate >= date '1995-06-01'", "o_orderdate >= DATE '1995-06-01'"),
    ("o_orderdate < date '1993-01-01'", "o_orderdate < DATE '1993-01-01'"),
    ("o_custkey % 7 = 0", "o_custkey % 7 = 0"),
    ("length(o_orderpriority) > 6", "length(o_orderpriority) > 6"),
    # newly-shimmed dialect forms: quoted identifiers, //, bare ::varchar
    ('"o_orderstatus" <> \'P\'', "\"o_orderstatus\" <> 'P'"),
    ("o_orderkey // 10 % 2 = 0", "o_orderkey // 10 % 2 = 0"),
    ("o_custkey::varchar like '%7'", "o_custkey::VARCHAR LIKE '%7'"),
]

GROUP_KEYS = ["o_orderstatus", "o_orderpriority"]

AGGS = [
    ("count() as n", "count(*) AS n"),
    ("cast(round(sum(o_totalprice), 0) as bigint) as sum_price_int",
     "CAST(round(sum(o_totalprice), 0) AS BIGINT) AS sum_price_int"),
    ("round(avg(o_totalprice), 2) as avg_price", "round(avg(o_totalprice), 2) AS avg_price"),
    ("min(o_orderkey) as min_key", "min(o_orderkey) AS min_key"),
    ("max(o_orderkey) as max_key", "max(o_orderkey) AS max_key"),
    ("count(distinct o_custkey) as n_cust", "count(DISTINCT o_custkey) AS n_cust"),
]


@st.composite
def pipelines(draw):
    preds = draw(st.lists(st.sampled_from(range(len(PREDICATES))), max_size=3, unique=True))
    grouped = draw(st.booleans())
    if grouped:
        keys = draw(st.lists(st.sampled_from(GROUP_KEYS), min_size=1, max_size=2, unique=True))
        aggs = draw(st.lists(st.sampled_from(range(len(AGGS))), min_size=1, max_size=3, unique=True))
        limit = None
    else:
        keys, aggs = [], []
        limit = draw(st.sampled_from([None, 10, 100]))
    return preds, keys, aggs, limit


def render(preds, keys, aggs, limit, sf_dir):
    psql = [f"from '{sf_dir}/orders.parquet'"]
    where_sql = []
    for i in preds:
        psql.append(f"where {PREDICATES[i][0]}")
        where_sql.append(PREDICATES[i][1])
    if keys:
        sel = ", ".join(keys) + ", " + ", ".join(AGGS[i][0] for i in aggs)
        psql.append(f"select {sel} group by {', '.join(keys)}")
        psql.append(f"order by {', '.join(keys)}")
        sql = (
            "SELECT " + ", ".join(keys) + ", " + ", ".join(AGGS[i][1] for i in aggs)
            + " FROM orders"
            + (" WHERE " + " AND ".join(where_sql) if where_sql else "")
            + f" GROUP BY {', '.join(keys)} ORDER BY {', '.join(keys)}"
        )
    else:
        psql.append("select o_orderkey, o_custkey, o_orderstatus")
        psql.append("order by o_orderkey")
        sql = (
            "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders"
            + (" WHERE " + " AND ".join(where_sql) if where_sql else "")
            + " ORDER BY o_orderkey"
        )
        if limit:
            psql.append(f"limit {limit}")
            sql += f" LIMIT {limit}"
    return " |> ".join(psql), sql


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    from duckdb_psql_spark import PsqlSession

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    return PsqlSession(spark), con


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pipelines())
def test_random_pipeline_matches_duckdb(engines, sf_dir, pipe):
    psql_session, con = engines
    preds, keys, aggs, limit = pipe
    psql_text, sql = render(preds, keys, aggs, limit, sf_dir)
    df = psql_session.sql(psql_text)
    spark_cols = sorted(df.columns)
    spark_rows = sorted(
        tuple(_norm(r[c]) for c in spark_cols) for r in df.collect()
    )
    rel = con.sql(sql)
    idx = [rel.columns.index(c) for c in sorted(rel.columns)]
    duck_rows = sorted(tuple(_norm(row[i]) for i in idx) for row in rel.fetchall())
    assert sorted(rel.columns) == spark_cols
    assert spark_rows == duck_rows, f"\nPSQL: {psql_text}\nSQL: {sql}"
