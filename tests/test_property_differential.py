"""Property-based differential testing: random pipelines vs the DuckDB oracle.

The reference has no property-based tests (SURVEY.md §5.1); this suite
generates random-but-valid pipelines from a small AST — filters →
optional join (orders ⋈ customer) → optional aggregation OR window
column (+ optional QUALIFY) → order → optional limit — renders BOTH a
PSQL pipeline (our engine) and an ANSI SELECT (DuckDB), and checks
order-insensitive value equality. Aggregate expressions follow the
float-stability conventions from duckdb_psql_spark.inventory.

The pytest run keeps a small example budget; scripts/property_sweep.py
drives the same generator for 250+ pipelines as the pre-round sweep.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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

# predicates over the joined customer side (only valid when join is on)
JOIN_PREDICATES = [
    ("c_mktsegment = 'BUILDING'", "c_mktsegment = 'BUILDING'"),
    ("c_acctbal > 0", "c_acctbal > 0"),
    ("c_nationkey < 13", "c_nationkey < 13"),
]

GROUP_KEYS = ["o_orderstatus", "o_orderpriority"]
JOIN_GROUP_KEYS = ["c_mktsegment"]

AGGS = [
    ("count() as n", "count(*) AS n"),
    ("cast(round(sum(o_totalprice), 0) as bigint) as sum_price_int",
     "CAST(round(sum(o_totalprice), 0) AS BIGINT) AS sum_price_int"),
    # avg is kept float-stable per the inventory convention: exact integer
    # cents sum, one IEEE-deterministic division, round to integer cents
    ("round(sum(cast(round(o_totalprice * 100, 0) as bigint)) * 1.0 / count(), 0) as avg_cents",
     "round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) * 1.0 / count(*), 0) AS avg_cents"),
    ("min(o_orderkey) as min_key", "min(o_orderkey) AS min_key"),
    ("max(o_orderkey) as max_key", "max(o_orderkey) AS max_key"),
    ("count(distinct o_custkey) as n_cust", "count(DISTINCT o_custkey) AS n_cust"),
]

# window columns: all deterministic (unique tie-break key or frame-ordered
# accumulation), both dialects render identically
WINDOWS = [
    (
        "rank() over (partition by o_orderstatus order by o_totalprice desc, o_orderkey) as rk",
        "rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rk",
    ),
    (
        "row_number() over (partition by o_orderstatus order by o_orderkey) as rn",
        "row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn",
    ),
    (
        "round(sum(o_totalprice) over (partition by o_orderstatus order by o_orderkey "
        "rows between unbounded preceding and current row), 2) as running",
        "round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running",
    ),
    (
        "lag(o_orderkey, 1) over (partition by o_orderstatus order by o_orderkey) as prev_key",
        "lag(o_orderkey, 1) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS prev_key",
    ),
]


@st.composite
def pipelines(draw):
    join = draw(st.booleans())
    preds = draw(st.lists(st.sampled_from(range(len(PREDICATES))), max_size=3, unique=True))
    jpreds = (
        draw(st.lists(st.sampled_from(range(len(JOIN_PREDICATES))), max_size=2, unique=True))
        if join
        else []
    )
    grouped = draw(st.booleans())
    win = qualify = None
    if grouped:
        pool = GROUP_KEYS + (JOIN_GROUP_KEYS if join else [])
        keys = draw(st.lists(st.sampled_from(pool), min_size=1, max_size=2, unique=True))
        aggs = draw(st.lists(st.sampled_from(range(len(AGGS))), min_size=1, max_size=3, unique=True))
        limit = None
    else:
        keys, aggs = [], []
        win = draw(st.sampled_from([None] + list(range(len(WINDOWS)))))
        if win is not None and win in (0, 1):  # rank/row_number → maybe QUALIFY
            qualify = draw(st.sampled_from([None, 5, 20]))
        limit = draw(st.sampled_from([None, 10, 100]))
    return join, preds, jpreds, keys, aggs, win, qualify, limit


def render(pipe, sf_dir):
    join, preds, jpreds, keys, aggs, win, qualify, limit = pipe
    psql = [f"from '{sf_dir}/orders.parquet'"]
    where_sql = []
    for i in preds:
        psql.append(f"where {PREDICATES[i][0]}")
        where_sql.append(PREDICATES[i][1])
    sql_from = "orders"
    if join:
        psql.append(
            f"as o join '{sf_dir}/customer.parquet' as c on o.o_custkey = c.c_custkey"
        )
        sql_from = "orders JOIN customer ON o_custkey = c_custkey"
        for i in jpreds:
            psql.append(f"where {JOIN_PREDICATES[i][0]}")
            where_sql.append(JOIN_PREDICATES[i][1])
    where_clause = " WHERE " + " AND ".join(where_sql) if where_sql else ""
    if keys:
        sel = ", ".join(keys) + ", " + ", ".join(AGGS[i][0] for i in aggs)
        psql.append(f"select {sel} group by {', '.join(keys)}")
        psql.append(f"order by {', '.join(keys)}")
        sql = (
            "SELECT " + ", ".join(keys) + ", " + ", ".join(AGGS[i][1] for i in aggs)
            + f" FROM {sql_from}{where_clause}"
            + f" GROUP BY {', '.join(keys)} ORDER BY {', '.join(keys)}"
        )
    else:
        base_cols = "o_orderkey, o_custkey, o_orderstatus"
        sel_p, sel_s = base_cols, base_cols
        if win is not None:
            sel_p += ", " + WINDOWS[win][0]
            sel_s += ", " + WINDOWS[win][1]
        psql.append(f"select {sel_p}")
        qual_sql = ""
        if qualify is not None:
            col = "rk" if win == 0 else "rn"
            psql.append(f"qualify {col} <= {qualify}")
            qual_sql = f" QUALIFY {col} <= {qualify}"
        psql.append("order by o_orderkey")
        sql = (
            f"SELECT {sel_s} FROM {sql_from}{where_clause}{qual_sql}"
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


def check_one(psql_session, con, pipe, sf_dir):
    psql_text, sql = render(pipe, sf_dir)
    df = psql_session.sql(psql_text)
    spark_cols = sorted(df.columns)
    spark_rows = sorted(
        tuple(_norm(r[c]) for c in spark_cols) for r in df.collect()
    )
    rel = con.sql(sql)
    idx = [rel.columns.index(c) for c in sorted(rel.columns)]
    duck_rows = sorted(tuple(_norm(row[i]) for i in idx) for row in rel.fetchall())
    assert sorted(rel.columns) == spark_cols, f"\nPSQL: {psql_text}\nSQL: {sql}"
    assert spark_rows == duck_rows, f"\nPSQL: {psql_text}\nSQL: {sql}"


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    from duckdb_psql_spark import PsqlSession

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    return PsqlSession(spark), con


@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pipelines())
def test_random_pipeline_matches_duckdb(engines, sf_dir, pipe):
    psql_session, con = engines
    check_one(psql_session, con, pipe, sf_dir)
