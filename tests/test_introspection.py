"""Catalog introspection (introspection.py): duckdb_* table functions,
information_schema / pg_catalog virtual schemas, SHOW ALL TABLES, CALL,
COMMENT ON, current_setting().

Column SETS mirror DuckDB 1.4 exactly (probe-pinned in the module);
VALUES describe the Spark session catalog, so cross-engine value checks
don't apply — shapes and engine-side semantics are locked here instead.
"""

import duckdb
import pytest


@pytest.fixture()
def cat(psql):
    psql.sql("create or replace temp table is_t (i int primary key, v varchar)")
    psql.sql("comment on table is_t is 'a table'")
    psql.sql("comment on column is_t.v is 'the value'")
    return psql


def test_duckdb_tables_columns_match_duckdb_shape(cat):
    con = duckdb.connect()
    for fn in ("duckdb_tables()", "duckdb_columns()", "duckdb_functions()",
               "duckdb_settings()", "duckdb_views()", "duckdb_schemas()",
               "duckdb_databases()"):
        ours = cat.sql(f"select * from {fn} limit 0").columns
        theirs = con.sql(f"select * from {fn} limit 0").columns
        assert ours == theirs, fn


def test_duckdb_tables_values(cat):
    row = cat.sql(
        "select temporary, has_primary_key, comment, column_count "
        "from duckdb_tables() where table_name = 'is_t'"
    ).collect()[0]
    assert tuple(row) == (True, True, "a table", 2)
    cols = cat.sql(
        "select column_name, data_type, comment from duckdb_columns() "
        "where table_name = 'is_t' order by column_index"
    ).collect()
    assert [tuple(r) for r in cols] == [
        ("i", "INTEGER", None), ("v", "VARCHAR", "the value"),
    ]


def test_information_schema_and_pg_catalog(cat):
    con = duckdb.connect()
    for q in ("information_schema.tables", "information_schema.columns",
              "information_schema.schemata", "pg_catalog.pg_tables"):
        ours = cat.sql(f"select * from {q} limit 0").columns
        theirs = con.sql(f"select * from {q} limit 0").columns
        assert ours == theirs, q
    rows = cat.sql(
        "select column_name, data_type, ordinal_position "
        "from information_schema.columns where table_name = 'is_t' order by 3"
    ).collect()
    assert [tuple(r) for r in rows] == [("i", "INTEGER", 1), ("v", "VARCHAR", 2)]


def test_show_all_tables_and_call(cat):
    con = duckdb.connect()
    df = cat.sql("show all tables")
    assert df.columns == con.sql("show all tables").columns
    row = [r for r in df.collect() if r.name == "is_t"][0]
    assert row.column_names == ["i", "v"]
    assert row.column_types == ["INTEGER", "VARCHAR"]
    # CALL f() == SELECT * FROM f()
    assert cat.sql("call duckdb_settings()").columns == [
        "name", "value", "description", "input_type", "scope",
    ]


def test_comment_on_null_clears(cat):
    cat.sql("comment on table is_t is null")
    assert cat.sql(
        "select comment from duckdb_tables() where table_name='is_t'"
    ).collect()[0][0] is None


def test_current_setting(cat):
    assert cat.sql(
        "select current_setting('spark.sql.session.timeZone') as tz"
    ).collect()[0].tz == "UTC"


def test_vacuum_analyze_noops(psql):
    assert psql.sql("vacuum").count() == 0
    assert psql.sql("analyze").count() == 0
