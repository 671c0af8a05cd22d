"""1:1 port of the reference test suite (/root/reference/test/sql/psql.test)
to pytest, per SURVEY.md §5.2.1: every ``statement ok`` must compile and
execute; every ``statement error`` must raise with a matching message.
"""

import pytest

from duckdb_psql_spark.errors import PsqlCompileError, PsqlParseError


def test_basic_pipe(psql):
    # psql.test:18-19
    rows = psql.sql("from t1 |> order by i").collect()
    assert len(rows) == 4


def test_trailing_semicolon(psql):
    # psql.test:21-23
    rows = psql.sql("from t1 |> order by i;").collect()
    assert len(rows) == 4


def test_comments_in_pipeline(psql):
    # improvement over the reference (README.md:91 admits its regexes are
    # comment-blind): a |> inside a comment must not split, and a line
    # comment inside a stage must not swallow generated SQL
    rows = psql.sql(
        "from t1 |> where i is not null -- a |> trap\n|> select i |> order by i"
    ).collect()
    assert [r.i for r in rows] == [1, 2, 3]
    rows = psql.sql("from t1 /* block |> comment */ |> where i = 2").collect()
    assert len(rows) == 1
    rows = psql.sql(
        "from t1 |> -- leading comment line\nwhere i > 1 |> select i"
    ).collect()
    assert len(rows) == 2


def test_block_in_expression_position(psql):
    # blocks are legal anywhere a subquery is (cpp:55-73); IN-lists and
    # scalar positions are subqueries
    rows = psql.sql(
        "from t1 |> where i in (| from t1 |> where j >= 20 |> select i |) |> "
        "select i |> order by i"
    ).collect()
    assert [r.i for r in rows] == [2, 3]
    rows = psql.sql(
        "from t1 |> select i, (| from t1 |> select max(j) |) as mx |> order by i"
    ).collect()
    assert all(r.mx == 40 for r in rows)


def test_quoted_identifiers_translate_to_backticks(psql):
    # DuckDB double-quoted identifiers; Spark wants backticks
    rows = psql.sql('from t1 |> as "my t" select "my t".i |> order by i').collect()
    assert len(rows) == 4
    rows = psql.sql('from (select 1 as "a b") t |> select "a b" + 1 as c').collect()
    assert rows[0].c == 2


def test_duckdb_type_names_map(psql):
    rows = psql.sql("from t1 |> select i::varchar as s |> where s = '1'").collect()
    assert len(rows) == 1
    rows = psql.sql("from t1 |> select cast(j as text) as s |> limit 1").collect()
    assert isinstance(rows[0].s, str)
    # parameterized lengths are valid Spark and pass through untouched
    rows = psql.sql("from t1 |> select cast(i as varchar(5)) as s |> limit 1").collect()
    assert isinstance(rows[0].s, str)


def test_head_source_keeps_implicit_name(psql, sf_dir):
    # DuckDB names a table head by itself and a file scan by its basename
    # stem — qualified references in the SAME stage must resolve (later
    # stages hide the name inside a subquery, in DuckDB too)
    rows = psql.sql("from t1 where t1.i > 1 |> select i |> order by i").collect()
    assert [r.i for r in rows] == [2, 3]
    rows = psql.sql(
        f"from '{sf_dir}/region.parquet' where region.r_regionkey < 2 |> "
        "select r_name |> order by r_name"
    ).collect()
    assert len(rows) == 2


def test_bare_join_source_keeps_its_name(psql, spark, tmp_path):
    # DuckDB implicitly names a bare join source: `join m on … m.mj …`
    # must resolve without an explicit `as m`
    rows = psql.sql(
        "with m as (select max(j) as mj from t1) "
        "from t1 |> as t join m on t.j = m.mj |> select i"
    ).collect()
    assert [r.i for r in rows] == [None]  # j=40 row has i NULL in fixture
    # file scans are named by their basename stem
    p = str(tmp_path / "dims.parquet")
    spark.createDataFrame([(10, "x"), (20, "y")], "j int, tag string").write.parquet(p)
    rows = psql.sql(
        f"from t1 |> as t join '{p}' on t.j = dims.j |> select i, tag |> order by i"
    ).collect()
    assert [(r.i, r.tag) for r in rows] == [(1, "x"), (2, "y")]


def test_bad_stage_errors(psql):
    # psql.test:25-29 — error at or near "j"
    with pytest.raises(PsqlParseError, match='syntax error at or near "j"'):
        psql.sql("from t1 |> srt j")


def test_concat_not_split(psql):
    # psql.test:31-33
    rows = psql.sql("from t1 |> select i || ',' || j;").collect()
    assert len(rows) == 4
    vals = {r[0] for r in rows}
    assert "1,10" in vals


def test_as_stage_named_access(psql):
    # psql.test:35-37
    rows = psql.sql("from t1 |> select i || ',' || j as bar |> as foo select foo.bar;").collect()
    assert len(rows) == 4


def test_create_table_as_block(psql):
    # psql.test:39-41
    psql.sql("create table t2 as (| from t1 |> select i || ',' || j as bar |> as foo select foo.bar |);")
    rows = psql.spark.table("t2").collect()
    assert len(rows) == 4


def test_multiple_blocks_cte_union(psql):
    # psql.test:43-45
    rows = psql.sql(
        "with x as (| from t1 |> select i || ',' || j as bar |> as foo |), "
        "y as (| from t1 |> select i || ',' || j as bar |> as foo |) "
        "from x union from y;"
    ).collect()
    # UNION (distinct) of two identical 4-row inputs (one NULL-derived row)
    assert len(rows) == 4


def test_passthrough_sql(psql):
    # psql.test:5-12 — non-piped statements go to the host engine untouched
    rows = psql.sql("select count(*) as n from t1").collect()
    assert rows[0]["n"] == 4


def test_full_readme_query_shape(psql):
    # psql.test:54-55 run against the local copies of the example CSVs
    # (https shim exercised separately; container is offline).
    inv = "/root/reference/example/invoices.csv"
    cust = "/root/reference/example/customers.csv"
    q = f"""
    from '{inv}' |>
    where invoice_date >= date '1970-01-16' |>
    select
      *,
      0.8 as transaction_fees,
      total - transaction_fees as income |>
    where income > 1 |>
    select
      customer_id,
      avg(total),
      sum(income) as sum_income,
      count() as ct
      group by customer_id |>
    order by sum_income desc |>
    limit 10 |>
    as invoices
      join '{cust}'
        as customers
      on invoices.customer_id = customers.customer_id |>
    select
      customer_id,
      last_name || ', ' || first_name as name,
      sum_income,
      version() as db_version
    """
    df = psql.sql(q)
    rows = df.collect()
    assert len(rows) == 10
    assert [f.name for f in df.schema.fields] == ["customer_id", "name", "sum_income", "db_version"]


def test_read_csv_with_options(psql, tmp_path):
    p = tmp_path / "opts.csv"
    p.write_text("a|b\n1|x\n2|y\n")
    rows = psql.sql(
        f"from read_csv('{p}', delim='|', header=true) |> where a > 1 |> select a, b"
    ).collect()
    assert [(r.a, r.b) for r in rows] == [(2, "y")]


def test_pivot_on_simplified_form(psql):
    psql.spark.sql(
        "create or replace temp view pv as "
        "select 'a' as k, 'x' as s union all select 'a', 'y' union all select 'b', 'x'"
    )
    df = psql.sql("from pv |> pivot on s using count(*) |> order by k")
    rows = df.collect()
    assert df.columns == ["k", "x", "y"]
    # DuckDB 0-fills absent count cells (probe-verified): pivot pv on s
    # using count(*) → (b, 1, 0), not NULL
    assert [tuple(r) for r in rows] == [("a", 1, 1), ("b", 1, 0)]


def test_https_source_shim(psql, tmp_path, monkeypatch):
    """B2: https:// CSV sources fetch through the download shim (offline:
    urlretrieve is faked with a local copy)."""
    import shutil
    import urllib.request

    local = tmp_path / "remote.csv"
    local.write_text("x,y\n1,a\n2,b\n")

    def fake_retrieve(url, filename):
        shutil.copy(local, filename)

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    rows = psql.sql(
        "from 'https://example.invalid/data/remote.csv' |> where x > 1"
    ).collect()
    assert [(r.x, r.y) for r in rows] == [(2, "b")]


def test_install_load_noop(psql):
    # psql.test:48-51 — INSTALL/LOAD accepted (extension management is a
    # no-op here: the resolver needs no extensions)
    psql.sql("INSTALL httpfs;")
    psql.sql("LOAD httpfs;")


def test_two_sessions_no_view_collision(spark, psql):
    from duckdb_psql_spark import PsqlSession

    other = PsqlSession(spark)
    a = psql.sql("create view s1v as (| from t1 |> select i |)")
    b = other.sql("create view s2v as (| from t1 |> select j |)")
    assert psql.sql("from s1v").count() == 4
    assert other.sql("from s2v").count() == 4


def test_verb_error_messages(psql):
    from duckdb_psql_spark.errors import PsqlCompileError

    with pytest.raises(PsqlCompileError, match="dedup"):
        psql.sql("from t1 |> dedup")


def test_full_readme_query_golden_values(psql):
    """SURVEY §5.2.3: the README pipeline's published result values
    (/root/reference/README.md:37-53) — modulo db_version and row order
    (sum_income has duplicates; the reference shows one arbitrary order)."""
    inv = "/root/reference/example/invoices.csv"
    cust = "/root/reference/example/customers.csv"
    q = f"""
    from '{inv}' |>
    where invoice_date >= date '1970-01-16' |>
    select *, 0.8 as transaction_fees, total - transaction_fees as income |>
    where income > 1 |>
    select customer_id, avg(total), sum(income) as sum_income, count() as ct
      group by customer_id |>
    order by sum_income desc |>
    limit 10 |>
    as invoices join '{cust}' as customers
      on invoices.customer_id = customers.customer_id |>
    select customer_id, last_name || ', ' || first_name as name, sum_income
    """
    got = {
        (r.customer_id, r.name, round(r.sum_income, 2))
        for r in psql.sql(q).collect()
    }
    assert got == {
        (6, "Holý, Helena", 43.83),
        (7, "Gruber, Astrid", 36.83),
        (24, "Ralston, Frank", 37.83),
        (25, "Stevens, Victor", 36.83),
        (26, "Cunningham, Richard", 41.83),
        (28, "Barnett, Julia", 37.83),
        (37, "Zimmermann, Fynn", 37.83),
        (45, "Kovács, Ladislav", 39.83),
        (46, "O'Reilly, Hugh", 39.83),
        (57, "Rojas, Luis", 40.83),
    }


def test_read_parquet_function_head(psql, sf_dir):
    n = psql.sql(f"from read_parquet('{sf_dir}/region.parquet') |> select r_name").count()
    assert n == 5


def test_concurrent_sessions_threads(psql, sf_dir):
    import concurrent.futures

    def run(i):
        return psql.sql(
            f"from '{sf_dir}/nation.parquet' |> where n_nationkey % 5 = {i} |> select count() as n"
        ).first()["n"]

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        counts = list(ex.map(run, range(5)))
    assert sum(counts) == 25


def test_transaction_statements_are_noops(psql):
    # DuckDB accepts these; Spark is autocommit — observable `statement ok`
    for stmt in ["begin transaction", "commit", "rollback", "checkpoint",
                 "pragma version"]:
        psql.sql(stmt)  # must not raise
    # SET passes through to Spark natively
    assert psql.sql("set spark.sql.cbo.enabled").collect()


def test_explain_piped_statement(psql):
    rows = psql.sql("explain from t1 |> where i = 1 |> select i").collect()
    plan = "\n".join(r.plan for r in rows)
    assert "Filter" in plan
    rows = psql.sql("explain analyze from t1 |> select count() as n").collect()
    assert rows


def test_describe_piped_and_path(psql, sf_dir):
    rows = psql.sql("describe from t1 |> select i, j * 2 as d").collect()
    # DuckDB type spellings + the 6-column DESCRIBE shape
    assert [(r.column_name, r.column_type, r.null) for r in rows] == [
        ("i", "INTEGER", "YES"), ("d", "INTEGER", "YES"),
    ]
    rows = psql.sql(f"describe '{sf_dir}/region.parquet'").collect()
    assert rows[0].column_name == "r_regionkey"
    # bare table names keep Spark's native DESCRIBE
    rows = psql.sql("describe t1").collect()
    assert rows[0][0] == "i"


def test_insert_into_view_and_values(psql):
    # delegated-dialect DML: INSERT INTO appends to a temp view
    psql.sql("create or replace temp view ins_t as (| from t1 |> select i, j |)")
    n0 = psql.sql("from ins_t").count()
    r = psql.sql("insert into ins_t values (7, 70)")
    assert r.collect()[0][0] == 1  # Count
    assert psql.sql("from ins_t").count() == n0 + 1
    # BY NAME matches reordered columns
    psql.sql("insert into ins_t by name (select 80 as j, 8 as i)")
    row = psql.sql("from ins_t |> where i = 8").collect()
    assert len(row) == 1 and row[0]["j"] == 80
    # column list: unlisted target columns become NULL
    psql.sql("insert into ins_t (i) values (9)")
    row = psql.sql("from ins_t |> where i = 9").collect()
    assert len(row) == 1 and row[0]["j"] is None
    # self-referencing insert doubles matching rows, no infinite recursion
    psql.sql("insert into ins_t (from ins_t |> where i = 7)")
    assert psql.sql("from ins_t |> where i = 7").count() == 2


def test_insert_into_missing_target_errors(psql):
    import pytest as _pytest

    from duckdb_psql_spark.errors import PsqlCompileError

    with _pytest.raises(PsqlCompileError, match="not found"):
        psql.sql("insert into no_such_table values (1)")


def test_multi_file_sources(psql, spark, tmp_path):
    """DuckDB multi-file forms: `from ['a','b']`, `read_parquet([...])`,
    `read_csv([...], opts)` — union of same-schema files; globs pass
    through to the Spark reader natively."""
    d = str(tmp_path)
    spark.range(3).write.parquet(f"{d}/a.parquet")
    spark.range(3, 7).write.parquet(f"{d}/b.parquet")
    assert psql.sql(
        f"from ['{d}/a.parquet', '{d}/b.parquet'] |> select count() as n"
    ).first()[0] == 7
    assert psql.sql(
        f"from read_parquet(['{d}/a.parquet', '{d}/b.parquet']) |> select count() as n"
    ).first()[0] == 7
    (tmp_path / "c1.csv").write_text("i|s\n1|x\n")
    (tmp_path / "c2.csv").write_text("i|s\n2|y\n")
    rows = psql.sql(
        f"from read_csv(['{d}/c1.csv', '{d}/c2.csv'], delim='|') |> order by i"
    ).collect()
    assert [tuple(r) for r in rows] == [(1, "x"), (2, "y")]
    assert psql.sql(f"from '{d}/*.parquet' |> select count() as n").first()[0] == 7


def test_update_delete_truncate(psql, spark):
    """DuckDB row DML as copy-on-write: UPDATE/DELETE/TRUNCATE re-point
    temp views (or rewrite catalog tables) and return affected counts."""
    import pytest as _pytest

    from duckdb_psql_spark.errors import PsqlCompileError

    psql.sql(
        "create or replace temp view dml_t as "
        "(| from (values (1,'a'),(2,'b'),(3,'c'),(4,null)) v(i,s) |)"
    )
    assert psql.sql("update dml_t set s = s || '!' where i <= 2").first()[0] == 2
    assert psql.sql("delete from dml_t where i = 3").first()[0] == 1
    rows = sorted(tuple(r) for r in psql.sql("from dml_t").collect())
    assert rows == [(1, "a!"), (2, "b!"), (4, None)]
    # NULL-condition rows are untouched (not treated as true)
    assert psql.sql("update dml_t set i = 99 where s = 'zzz'").first()[0] == 0
    assert psql.sql("truncate table dml_t").first()[0] == 3
    assert psql.sql("from dml_t").count() == 0
    with _pytest.raises(PsqlCompileError, match="nope"):
        psql.sql("update dml_t set nope = 1")
    with _pytest.raises(PsqlCompileError, match="not found"):
        psql.sql("delete from no_such_dml_t")
    # catalog-table branch: rewrite through an eager checkpoint
    spark.sql("DROP TABLE IF EXISTS dml_cat")
    spark.range(5).selectExpr("id as i").write.saveAsTable("dml_cat")
    try:
        assert psql.sql("delete from dml_cat where i >= 3").first()[0] == 2
        assert psql.sql("from dml_cat").count() == 3
        assert psql.sql("update dml_cat set i = i * 10 where i = 1").first()[0] == 1
        vals = sorted(r[0] for r in psql.sql("from dml_cat").collect())
        assert vals == [0, 2, 10]
    finally:
        spark.sql("DROP TABLE IF EXISTS dml_cat")


def test_copy_from_roundtrip(psql, spark, tmp_path):
    """COPY t FROM 'path' — DuckDB's import direction: the target schema
    drives the read (no re-inference), rows append positionally."""
    import pytest as _pytest

    from duckdb_psql_spark.errors import PsqlCompileError

    psql.sql("create or replace temp view cf_t as (| from t1 |> select i, j |)")
    n0 = psql.sql("from cf_t").count()
    out = str(tmp_path / "cf_out")
    psql.sql(f"copy (from cf_t) to '{out}' (format csv, header true)")
    r = psql.sql(f"copy cf_t from '{out}' (format csv, header true)")
    assert r.collect()[0][0] == n0  # Count row
    assert psql.sql("from cf_t").count() == 2 * n0
    # schema comes from the target, not inference: ints stay ints
    assert dict(psql.sql("from cf_t").dtypes)["i"] == "int"
    with _pytest.raises(PsqlCompileError, match="not found"):
        psql.sql(f"copy no_such_tbl from '{out}' (format csv)")


def test_insert_by_name_unmatched_column_errors(psql):
    """DuckDB errors on BY NAME / listed columns with no target match —
    silently dropping them would lose a typo'd column's data."""
    import pytest as _pytest

    from duckdb_psql_spark.errors import PsqlCompileError

    psql.sql("create or replace temp view ins_err_t as (| from t1 |> select i, j |)")
    with _pytest.raises(PsqlCompileError, match="jj"):
        psql.sql("insert into ins_err_t by name (select 1 as i, 2 as jj)")
    with _pytest.raises(PsqlCompileError, match="zz"):
        psql.sql("insert into ins_err_t (i, zz) values (1, 2)")


def test_scalar_array_fns_not_arrayish(psql):
    """len() over scalar-returning array_*/list_* calls is a string/plain
    length, not a size() rewrite (ADVICE r4)."""
    row = psql.sql(
        "select len(array_to_string([1,2,3], ',')) as a, "
        "array_contains([1,2], 2) as b, "
        "list_position([5,6,7], 6) as c, "
        "'hello'[2] as d, "
        "len([1,2,3]) as e"
    ).collect()[0]
    assert row.a == 5  # length of '1,2,3'
    assert row.b is True
    assert row.c == 2
    assert row.d == "e"  # 1-based single-char string subscript
    assert row.e == 3  # arrays still take size()


def test_dialect_probe_batch_round4(psql):
    """Open-ended slices, len() overload, date-date, extract(epoch/dow)."""
    row = psql.sql(
        "select 'hello'[2:] as a, 'hello'[:3] as b, [1,2,3,4][2:] as c, "
        "len([1,2,3]) as d, len('abc') as e, "
        "date '1995-06-01' - date '1995-05-01' as f, "
        "extract(epoch from timestamp '1970-01-02 00:00:00') as g, "
        "extract(dow from date '2026-08-13') as h, "
        "extract(isodow from date '2026-08-13') as i"
    ).collect()[0]
    assert row["a"] == "ello" and row["b"] == "hel"
    assert list(row["c"]) == [2, 3, 4]
    assert row["d"] == 3 and row["e"] == 3
    assert row["f"] == 31
    assert row["g"] == 86400.0
    assert row["h"] == 4 and row["i"] == 4  # 2026-08-13 is a Thursday


def test_dialect_probe_batch_round4b(psql):
    """List comprehensions, list fn arg orders, fdiv/fmod, typeof, struct_extract."""
    row = psql.sql(
        "select [x * 2 for x in [1,2,3]] as a, "
        "[x for x in [1,2,3,4] if x > 2] as b, "
        "list_reverse([1,2,3]) as c, "
        "list_prepend(0, [1,2]) as d, "
        "fdiv(7, 2) as e, fmod(7.5, 2) as f, "
        "typeof(1) as g, typeof('x') as h, "
        "struct_extract({'a': 41}, 'a') as i"
    ).collect()[0]
    assert list(row["a"]) == [2, 4, 6]
    assert list(row["b"]) == [3, 4]
    assert list(row["c"]) == [3, 2, 1]
    assert list(row["d"]) == [0, 1, 2]
    assert row["e"] == 3.0 and row["f"] == 1.5
    assert row["g"] == "INTEGER" and row["h"] == "VARCHAR"
    assert row["i"] == 41


def test_insert_into_catalog_table(spark):
    """INSERT INTO a real (materialized) table goes through the
    distributed insertInto append path."""
    from duckdb_psql_spark import PsqlSession

    p = PsqlSession(spark, materialize_tables=True)
    spark.sql("DROP TABLE IF EXISTS ins_cat_t")
    try:
        p.sql("create table ins_cat_t as (| from (values (1, 10), (2, 20)) as t(i, j) |)")
        assert p.sql("insert into ins_cat_t values (3, 30)").collect()[0][0] == 1
        assert p.sql("insert into ins_cat_t by name (select 40 as j, 4 as i)").collect()[0][0] == 1
        rows = sorted((r.i, r.j) for r in spark.table("ins_cat_t").collect())
        assert rows == [(1, 10), (2, 20), (3, 30), (4, 40)]
    finally:
        spark.sql("DROP TABLE IF EXISTS ins_cat_t")


def test_dialect_probe_batch_round4c(psql):
    """List-agg family, 2-arg sorts, seeded reduce, ordered DISTINCT agg."""
    row = psql.sql(
        "select list_sum([1,2,3]) as a, list_avg([1.0,2.0,3.0]) as b, "
        "list_min([3,1,2]) as c, list_max([3,1,2]) as d, "
        "list_sort([3,1,2], 'DESC') as e, array_reverse_sort([1,3,2]) as f, "
        "list_reduce([1,2,3], (x, y) -> x + y) as g, "
        "list_any_value([null, 5]) as h"
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (6.0, 2.0, 1, 3)
    assert list(row.e) == [3, 2, 1] and list(row.f) == [3, 2, 1]
    assert row.g == 6 and row.h == 5
    agg = psql.sql(
        "select array_agg(distinct x order by x) as up, "
        "array_agg(distinct x order by x desc) as down "
        "from (select explode(array(2, 1, 2)) as x)"
    ).collect()[0]
    assert list(agg.up) == [1, 2] and list(agg.down) == [2, 1]


def test_doubled_quote_escape(psql):
    """ANSI '' escape inside string literals: escapedStringLiterals=true
    makes Spark keep both quotes, so the shim re-emits via char(39)."""
    row = psql.sql(
        "select 'it''s' as a, '''' as b, 'a''b''c' as c, length('it''s') as l"
    ).collect()[0]
    assert (row.a, row.b, row.c, row.l) == ("it's", "'", "a'b'c", 4)


def test_where_bare_boolean_column(psql, sf_dir):
    # Spark 4.1 mis-parses `WHERE (x)` for a lone boolean identifier as a
    # parenthesized subquery (ASSIGNMENT_ARITY_MISMATCH); the compiler
    # emits lone identifiers bare (compiler._paren_pred)
    rows = psql.sql(
        f"from '{sf_dir}/nation.parquet' |>"
        " select n_nationkey, n_nationkey < 5 as small |>"
        " where small |> order by n_nationkey"
    ).collect()
    assert [r.n_nationkey for r in rows] == [0, 1, 2, 3, 4]


def test_insert_view_row_guard(psql, sf_dir):
    # temp-view inserts pin rows in executor storage; the conf caps it
    import pytest as _pytest

    from duckdb_psql_spark.errors import PsqlCompileError

    psql.sql(
        f"create or replace temp view guard_v as (| from '{sf_dir}/nation.parquet' |>"
        " where n_nationkey < 2 |> select n_nationkey |)"
    )
    psql.spark.conf.set("spark.psql.insertView.maxRows", "3")
    try:
        with _pytest.raises(PsqlCompileError, match="exceeds"):
            psql.sql(
                f"insert into guard_v (from '{sf_dir}/nation.parquet' |>"
                " select n_nationkey)"
            )
        # under the cap still works
        psql.sql("insert into guard_v values (99)")
        assert psql.sql("from guard_v").count() == 3
    finally:
        psql.spark.conf.unset("spark.psql.insertView.maxRows")
        psql.spark.catalog.dropTempView("guard_v")


def test_glob_and_range_table_functions(psql, sf_dir):
    import duckdb

    # glob(): value-for-value against DuckDB's own listing
    got = [r.file for r in psql.sql(
        f"from glob('{sf_dir}/*.parquet') |> order by file").collect()]
    exp = [r[0] for r in duckdb.sql(
        f"from glob('{sf_dir}/*.parquet') order by file").fetchall()]
    assert got == exp and got
    assert psql.sql("from glob('/nonexistent/*.xyz')").count() == 0
    # range(): end-exclusive, column named `range`, scalar form an array
    assert [r.range for r in psql.sql(
        "from range(2, 6) |> order by range").collect()] == [2, 3, 4, 5]
    assert psql.sql("select range(3) as l").collect()[0].l == [0, 1, 2]


def test_unnest_output_labels_match_duckdb(psql):
    """Unaliased unnest items carry DuckDB's output labels: list unnests
    are labeled `unnest(<expr>)` (single and zipped), struct unnests by
    field name, and explicit aliases win (r5 gap 4)."""
    psql.spark.sql(
        "select array(1,2) as la, array('x','y','z') as lb, "
        "named_struct('f1', 1, 'f2', 'a') as st"
    ).createOrReplaceTempView("t_unl")
    assert psql.sql("from t_unl |> select unnest(la)").columns == ["unnest(la)"]
    assert psql.sql("from t_unl |> select unnest(la), unnest(lb)").columns == [
        "unnest(la)",
        "unnest(lb)",
    ]
    assert psql.sql("from t_unl |> select unnest(la) as v").columns == ["v"]
    assert psql.sql("from t_unl |> select unnest(st)").columns == ["f1", "f2"]
    psql.spark.catalog.dropTempView("t_unl")


def test_create_temp_table_roundtrip(psql):
    """CREATE [OR REPLACE] TEMP TABLE AS — Spark has no TEMP TABLE
    spelling, so the engine pins rows behind a temp view (the contract
    INSERT/UPDATE/DELETE then mutate). Plain and piped bodies both."""
    psql.sql("create or replace temp table ctt as select 1 as i")
    psql.sql("insert into ctt values (2)")
    assert sorted(r.i for r in psql.sql("select * from ctt").collect()) == [1, 2]
    import pytest as _pytest
    from duckdb_psql_spark.errors import PsqlCompileError
    with _pytest.raises(PsqlCompileError, match="already exists"):
        psql.sql("create temp table ctt as select 9 as i")
    psql.sql("create or replace temp table ctt as (| from ctt |> select i*2 as j |)")
    assert sorted(r.j for r in psql.sql("select * from ctt").collect()) == [2, 4]


def test_pivot_unpivot_statements(psql, sf_dir):
    """DuckDB top-level PIVOT/UNPIVOT statements (delegated dialect).
    Cross-checked against DuckDB in the differential (q_pivot_stmt,
    q_unpivot_stmt); here: shapes and the count→0 fill convention."""
    import duckdb

    n = f"{sf_dir}/nation.parquet"
    df = psql.sql(f"pivot '{n}' on n_regionkey using count(*)")
    exp = duckdb.sql(f"pivot '{n}' on n_regionkey using count(*)")
    assert df.columns == exp.columns
    assert sorted(map(tuple, df.collect())) == sorted(exp.fetchall())
    # USING-less form counts; IN-list + GROUP BY pins columns
    df2 = psql.sql(f"pivot '{n}' on n_regionkey in (0, 1) using sum(n_nationkey) group by n_name")
    exp2 = duckdb.sql(f"pivot '{n}' on n_regionkey in (0, 1) using sum(n_nationkey) group by n_name")
    assert df2.columns == exp2.columns
    assert sorted(map(tuple, df2.collect())) == sorted(exp2.fetchall())
    # UNPIVOT with and without INTO NAME/VALUE
    q = f"unpivot (select n_nationkey as a, n_regionkey as b from '{n}' limit 3) on a, b"
    for suffix in ("", " into name k value v"):
        got = psql.sql(q + suffix)
        want = duckdb.sql(q + suffix)
        assert got.columns == want.columns
        assert sorted(map(tuple, got.collect())) == sorted(want.fetchall())


def test_plain_sample_clause(psql, sf_dir):
    """USING SAMPLE / TABLESAMPLE in plain SQL → Spark TABLESAMPLE.
    The rows form returns exactly N rows (both engines); percent forms
    are statistical — count bounds only."""
    n = f"{sf_dir}/nation.parquet"
    assert psql.sql(f"select count(*) as c from '{n}' using sample 10 rows").collect()[0].c == 10
    assert psql.sql(f"select count(*) as c from '{n}' tablesample reservoir(7 rows)").collect()[0].c == 7
    c = psql.sql(f"select count(*) as c from '{n}' using sample 50%").collect()[0].c
    assert 0 <= c <= 25


def test_plain_special_joins_route_to_operators(psql, sf_dir):
    """Plain-SQL POSITIONAL/ASOF joins must hit the pipe operators —
    Spark alone parses the keyword as a table alias and silently
    degrades the join (cross/inner). Value-checked vs DuckDB."""
    import duckdb

    n, r = f"{sf_dir}/nation.parquet", f"{sf_dir}/region.parquet"
    q = (
        f"select * from (select n_nationkey from '{n}' order by n_nationkey limit 3) "
        f"positional join (select r_name from '{r}' order by r_name limit 3)"
    )
    assert sorted(map(tuple, psql.sql(q).collect())) == sorted(duckdb.sql(q).fetchall())
    q2 = (
        f"select n_nationkey, r_regionkey from "
        f"(select n_nationkey from '{n}' where n_nationkey < 4) l "
        f"asof join (select r_regionkey from '{r}') rr "
        f"on l.n_nationkey >= rr.r_regionkey order by 1, 2"
    )
    assert sorted(map(tuple, psql.sql(q2).collect())) == sorted(duckdb.sql(q2).fetchall())


def test_mode_deterministic_shim(psql):
    """mode(x) → mode(x, true): lowest value wins ties (DuckDB's tie is
    scan order — non-reproducible distributed; unique modes agree)."""
    assert psql.sql(
        "select mode(x) as m from (values (4),(4),(4),(0),(0),(1)) t(x)"
    ).collect()[0].m == 4  # unique mode — engines agree
    assert psql.sql(
        "select mode(x) as m from (values (4),(4),(0),(0)) t(x)"
    ).collect()[0].m == 0  # tie — deterministic lowest


def test_limit_percent(psql, sf_dir):
    """DuckDB `LIMIT n%` — row-fraction limit (floor), piped and plain."""
    n = f"{sf_dir}/nation.parquet"
    rows = psql.sql(f"select n_nationkey from '{n}' order by n_nationkey limit 25%").collect()
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4, 5]  # floor(25 * 0.25) = 6
    rows = psql.sql(f"from '{n}' |> select n_nationkey |> order by n_nationkey |> limit 28%").collect()
    assert len(rows) == 7


def test_groups_window_frames(psql):
    """GROUPS frame mode (DuckDB 1.4 dialect; Spark lacks it) via the
    dense_rank pre-projection. The container's DuckDB 1.0 oracle predates
    GROUPS too, so expectations are hand-computed: group sizes for
    k=[10,10,20,30,30,30,40] are {10:2, 20:1, 30:3, 40:1}."""
    psql.spark.sql(
        "create or replace temp view gw as select * from "
        "(values (1,10),(2,10),(3,20),(4,30),(5,30),(6,30),(7,40)) v(id, k)"
    )
    rows = psql.sql(
        "from gw |> select id, count(*) over (order by k groups between 1 "
        "preceding and current row) as c |> order by id"
    ).collect()
    assert [r.c for r in rows] == [2, 2, 3, 4, 4, 4, 4]
    # partitioned + following bound
    rows = psql.sql(
        "from gw |> select id, sum(k) over (partition by k % 20 order by k "
        "groups between current row and 1 following) as s |> order by id"
    ).collect()
    # partition k%20==10: k groups {10,10},{30,30,30} -> 10s see 110, 30s see 90
    # partition k%20==0:  groups {20},{40} -> 20 sees 60, 40 sees 40
    assert [r.s for r in rows] == [110, 110, 60, 90, 90, 90, 40]
    # desc order + unbounded
    rows = psql.sql(
        "from gw |> select id, count(*) over (order by k desc groups between "
        "unbounded preceding and current row) as c |> order by id"
    ).collect()
    assert [r.c for r in rows] == [7, 7, 5, 4, 4, 4, 1]


def test_session_variables_and_topn_aggs(psql):
    """SET VARIABLE / getvariable() (DuckDB 1.1 dialect; compile-time
    splice) and min(x,n)/max(x,n) top-n list aggregates (DuckDB 1.1+;
    the 1.0 oracle predates both — documented-semantics tests)."""
    psql.sql("set variable tv = 40 + 2")
    assert psql.sql("select getvariable('tv') as v").collect()[0].v == 42
    psql.sql("set variable ts = 'x'")
    assert psql.sql("select getvariable('ts') as v").collect()[0].v == "x"
    psql.sql("reset variable tv")
    assert psql.sql("select getvariable('tv') as v").collect()[0].v is None
    row = psql.sql(
        "select min(x, 2) as mn, max(x, 2) as mx "
        "from (values (3),(1),(2),(5)) t(x)"
    ).collect()[0]
    assert row.mn == [1, 2] and row.mx == [5, 3]


def test_timestamp_range_tvf(psql, sf_dir):
    """range(ts, ts, interval): end-exclusive (sequence is inclusive —
    the shim stops 1µs short). generate_series stays inclusive."""
    import duckdb

    q = "select * from range(timestamp '2024-01-01', timestamp '2024-01-03', interval 1 day)"
    assert [str(r[0]) for r in psql.sql(q).collect()] == \
        [str(r[0]) for r in duckdb.sql(q).fetchall()]
    q2 = "select * from generate_series(timestamp '2024-01-01', timestamp '2024-01-03', interval 1 day)"
    assert len(psql.sql(q2).collect()) == len(duckdb.sql(q2).fetchall()) == 3


def test_copy_to_partition_by(psql, tmp_path):
    """COPY … TO (FORMAT PARQUET, PARTITION_BY (a, b)): hive-layout
    directory write — the 100 TB sink layout. Multi-column option
    parsing is paren-aware (top-level commas only)."""
    import os

    out = str(tmp_path / "part_out")
    psql.sql(
        "copy (select n_regionkey, n_nationkey % 2 as par, n_name from "
        "(select id as n_nationkey, id % 5 as n_regionkey, "
        "concat('N', id) as n_name from range(10) r(id))) "
        f"to '{out}' (format parquet, partition_by (n_regionkey, par))"
    )
    dirs = sorted(d for d in os.listdir(out) if d.startswith("n_regionkey="))
    assert dirs == [f"n_regionkey={i}" for i in range(5)]
    sub = sorted(
        d for d in os.listdir(os.path.join(out, dirs[0])) if d.startswith("par=")
    )
    assert sub == ["par=0", "par=1"] or sub == ["par=0"] or sub == ["par=1"]
    back = psql.spark.read.parquet(out)
    assert back.count() == 10
    assert sorted(back.columns) == ["n_name", "n_regionkey", "par"]


def test_alter_table_copy_on_write(psql):
    """ALTER TABLE over session relations: rename/add/drop/retype
    columns and rename table, copy-on-write; PRIMARY KEY bookkeeping
    follows renames; CREATE/DROP INDEX are observable no-ops."""
    import pytest as _pytest
    from duckdb_psql_spark.errors import PsqlCompileError

    psql.sql("create or replace temp table alt_t (i int primary key, s varchar)")
    psql.sql("insert into alt_t values (1, 'x')")
    psql.sql("alter table alt_t rename column s to label")
    assert psql.sql("select * from alt_t").columns == ["i", "label"]
    psql.sql("alter table alt_t add column v double default 1.5")
    assert psql.sql("select v from alt_t").collect()[0].v == 1.5
    psql.sql("alter table alt_t alter column v set data type varchar")
    assert dict(psql.sql("select * from alt_t").dtypes)["v"] == "string"
    psql.sql("alter table alt_t drop column label")
    psql.sql("alter table alt_t rename to alt_t2")
    assert sorted(map(tuple, psql.sql("select * from alt_t2").collect())) == [(1, "1.5")]
    with _pytest.raises(PsqlCompileError, match="Constraint"):
        psql.sql("insert into alt_t2 values (1, 'dup')")  # keys moved with rename
    psql.sql("create index idx_alt on alt_t2 (i)")
    psql.sql("drop index idx_alt")
    psql.sql("alter table if exists missing_t rename to nn")  # no-op
    with _pytest.raises(PsqlCompileError, match="not found"):
        psql.sql("alter table missing_t add column x int")


def test_timestamptz_literal(psql):
    """TIMESTAMPTZ '<s>' → LTZ timestamp cast: same instant, offset
    parsed (session runs UTC). Cross-checked against DuckDB."""
    import duckdb

    q = "select cast(epoch(timestamptz '1995-06-17 10:30:00+02') as bigint) as e"
    assert psql.sql(q).collect()[0].e == duckdb.sql(q).fetchall()[0][0] == 803377800


def test_plain_order_by_nulls_last_default(psql):
    """Plain-SQL ORDER BY: DuckDB sorts NULLs LAST on ascending keys
    (Spark's default is FIRST) — including subqueries under LIMIT,
    where the divergence silently changes the row SET."""
    import duckdb

    q = "select x from (values (2),(null),(1)) t(x) order by x"
    assert [r.x for r in psql.sql(q).collect()] == [r[0] for r in duckdb.sql(q).fetchall()]
    q2 = "select * from (select x from (values (2),(null),(1)) t(x) order by x limit 1) s"
    assert [r.x for r in psql.sql(q2).collect()] == [1]
    # explicit NULLS FIRST still honored
    q3 = "select x from (values (2),(null),(1)) t(x) order by x nulls first"
    assert [r.x for r in psql.sql(q3).collect()][0] is None


def test_window_order_nulls_last_default(psql):
    """Window over(...) ORDER BY also takes DuckDB's NULLS LAST
    ascending default (Spark numbers NULLs first)."""
    import duckdb

    q = ("select x, row_number() over (order by x) as rn "
         "from (values (2),(null),(1)) t(x) order by rn")
    assert [tuple(r) for r in psql.sql(q).collect()] == duckdb.sql(q).fetchall()


def test_setop_trailing_clauses_bind_to_union(psql):
    """Trailing ORDER BY / LIMIT after a set operation bind to the WHOLE
    union (standard SQL; DuckDB-verified) — previously the engine applied
    them to the last branch only, silently changing the row set."""
    q = "select 1 as a union all select 2 as a union all select 3 as a limit 2"
    assert len(psql.sql(q).collect()) == 2
    q2 = "select 3 as a union all select 1 as a order by a"
    assert [r.a for r in psql.sql(q2).collect()] == [1, 3]
    # a parenthesized branch keeps its own clauses
    q3 = "select 5 as a union all (select 8 as a order by a) order by a desc limit 1"
    assert [r.a for r in psql.sql(q3).collect()] == [8]


def test_union_by_name_pads_missing_columns(psql):
    """UNION [ALL] BY NAME with differing column sets NULL-pads the
    missing side (DuckDB widening; Spark SQL alone rejects it)."""
    q = ("select 1 as a union all by name select 2 as b "
         "order by a nulls first, b nulls first")
    rows = [tuple(r) for r in psql.sql(q).collect()]
    assert rows == [(None, 2), (1, None)]


def test_batch9_scalar_shims(psql):
    """Round-7 batch 9 probe fixes (scripts/probe_statements_r7.py):
    bin() over VARCHAR bytes, BIT-string functions, era, multi-arg
    grouping, current_schema, datesub, timezone naive direction."""
    import duckdb

    q = ("select bin('1010') as b1, bin(255) as b2, "
         "get_bit('0110'::BIT, 1) as gb, set_bit('0110'::BIT, 0, 1) as sb, "
         "bit_position('11'::BIT, '0110101'::BIT) as bp, "
         "bitstring('0101011', 12) as bs, "
         "era(date '2001-01-01') as e1, extract(era from date '2001-01-01') as e2, "
         "current_schema() as cs, "
         "datesub('month', date '2022-01-15', date '2022-03-16') as ds")
    assert [tuple(r) for r in psql.sql(q).collect()] == duckdb.sql(q).fetchall()


def test_map_concat_last_wins(psql):
    """DuckDB map_concat overwrites earlier keys with later maps' values;
    the session's LAST_WIN dedup policy matches (Spark default errors)."""
    q = "select map_concat(map([1],['a']), map([2],['b']), map([1],['c'])) as m"
    got = psql.sql(q).collect()[0].m
    assert got == {1: "c", 2: "b"}


def test_reader_flags_hive_filename_union_by_name(psql, tmp_path):
    """DuckDB read_parquet flags: hive_partitioning (key=value dirs,
    glob + basePath anchoring), union_by_name (schema merge), and
    filename (provenance column, plain path text like DuckDB's)."""
    import duckdb

    base = tmp_path / "hive"
    (base / "lang=en").mkdir(parents=True)
    (base / "lang=fr").mkdir(parents=True)
    duckdb.sql(f"copy (select 1 as id, 'hello' as t) to '{base}/lang=en/a.parquet'")
    duckdb.sql(f"copy (select 2 as id, 'salut' as t) to '{base}/lang=fr/b.parquet'")
    q1 = (f"select id, t, cast(lang as varchar) as lang from "
          f"read_parquet('{base}/*/*.parquet', hive_partitioning=true) order by id")
    assert [tuple(r) for r in psql.sql(q1).collect()] == duckdb.sql(q1).fetchall()

    merge = tmp_path / "merge"
    merge.mkdir()
    duckdb.sql(f"copy (select 1 as id) to '{merge}/x.parquet'")
    duckdb.sql(f"copy (select 2 as id, 'y' as extra) to '{merge}/y.parquet'")
    q2 = (f"select id, extra from read_parquet('{merge}/*.parquet', "
          "union_by_name=true) order by id")
    assert [tuple(r) for r in psql.sql(q2).collect()] == duckdb.sql(q2).fetchall()

    q3 = (f"select id, filename from "
          f"read_parquet('{base}/lang=en/a.parquet', filename=true)")
    assert [tuple(r) for r in psql.sql(q3).collect()] == duckdb.sql(q3).fetchall()


def test_batch10_operator_tail(psql):
    """Round-7 batch 10 operators. The binary `^` case is the silent-
    wrong class: DuckDB `^` is POWER, Spark reads XOR (2 ^ 10 = 8 — a
    wrong value, not an error)."""
    import duckdb

    q = ("select 2 ^ 10 as pw, 7 // 2 as idiv, -7 // 2 as tdiv, "
         "7.5 // 2 as fdiv, 5! as fact, 'abc' ^@ 'ab' as sw, "
         "'abc' ~~ 'a%' as lk, 'abc' ~ 'a.c' as rx, 'abc' !~ 'x' as nrx, "
         "'abc' !~~ 'x%' as nlk, array_slice('hello', 2, 4) as ssl, "
         "apply([1,2], x -> x + 1) as ap, list_any_value([null, 3]) as lav")
    got = psql.sql(q).collect()[0]
    want = duckdb.sql(q).fetchone()
    assert (got.pw, got.idiv, got.tdiv, got.fdiv) == want[:4]
    assert int(got.fact) == want[4]  # hugeint → decimal(38,0) convention
    assert tuple(got)[5:] == want[5:]


def test_operator_precedence_round8(psql):
    """Round-8 ADVICE fixes, every case probe-verified against the 1.0
    oracle: postfix `!` binds BELOW arithmetic (2 * 3! = 720, the old
    nearest-primary binding gave 12); unary minus binds TIGHTER than
    power (-2 ^ 2 = 4, old: -4); `//` with a division- or double-
    function-derived operand is plain division ((7/2) // 3 = 1.166…,
    old: 1); json_object stringifies non-string keys."""
    import duckdb

    qs = [
        "select 2 * 3! as v",
        "select 1 + 3! as v",
        "select 10 - 3! as v",
        "select 7 // 3! as v",
        "select case when 1=1 then 3! end as v",
        "select 3! = 6 as v",
        "select -2 ^ 2 as v",
        "select -2 ^ 3 as v",
        "select -abs(3) ^ 2 as v",
        "select 5 - 2 ^ 2 as v",
        "select 2 * 3 ^ 2 as v",
        "select 2 ^ 3 ^ 2 as v",
        "select (7/2) // 3 as v",
        "select sqrt(16) // 3 as v",
        "select abs(-7.5) // 2 as v",
        "select cast(7/2 as int) // 3 as v",
        "select json_object(1, 'a') as v",
        "select json_object('k', 5, 'j', 'x') as v",
        # fuzzer-found (seed 808): NULL-key pairs are dropped; `~` is a
        # FULL regex match in DuckDB ('abc' ~ 'b' = FALSE), not partial
        "select json_object(cast(null as int), 'x', 'k', 1) as v",
        "select json_object('k', cast(null as int)) as v",
        "select 'abc' ~ 'b' as v",
        "select 'abc' ~ 'a.*' as v",
        "select 'abcx' ~ 'a.c' as v",
        "select 'abc' !~ 'b' as v",
        "select 'héllo' ~ '[a-z]+' as v",
    ]
    for q in qs:
        got = psql.sql(q).collect()[0][0]
        want = duckdb.sql(q).fetchone()[0]
        if isinstance(want, (int, float)) and not isinstance(want, bool):
            assert float(got) == float(want), (q, got, want)
        else:
            assert got == want, (q, got, want)


def test_function_tail_round8(psql):
    """Round-8 catalog-diff probe fixes: regr_avgx/avgy over DECIMAL
    inputs must widen BEFORE the average (Spark's decimal avg truncates
    at scale 5 for DECIMAL(2,1) inputs — an outer cast can't restore the
    lost digits); array_value, current_database, constant_or_null were
    unimplemented; DuckDB's to_binary is an alias of bin (binary-digit
    string), not Spark's hex decoder."""
    import duckdb

    qs = [
        "select round(regr_avgx(a, b), 6) as v "
        "from (values (1.0, 2.0), (2.0, 4.0), (3.0, 5.0)) t(a, b)",
        "select round(regr_avgy(b, a), 6) as v "
        "from (values (1.0, 2.0), (2.0, 4.0), (3.0, 5.0)) t(a, b)",
        "select current_database() as v",
        "select to_binary('abc') as v",
        "select to_binary(42) as v",
        "select constant_or_null(7, 1) as v",
        "select constant_or_null(7, null) as v",
        "select constant_or_null(7, 1, null, 2) as v",
    ]
    for q in qs:
        got = psql.sql(q).collect()[0][0]
        want = duckdb.sql(q).fetchone()[0]
        if isinstance(want, (int, float)) and not isinstance(want, bool):
            assert float(got) == float(want), (q, got, want)
        else:
            assert got == want, (q, got, want)
    q = "select array_value(1, 2, 3) as v"
    assert list(psql.sql(q).collect()[0][0]) == list(
        duckdb.sql(q).fetchone()[0]
    )


def test_subscript_out_of_range_and_string_agg_default(psql):
    """DuckDB out-of-range subscripts yield NULL ([1,2][5], [1,2][0]);
    Spark's ANSI element_at throws — r8 guard. 1-arg string_agg defaults
    to ',' (Spark's concatenates bare)."""
    import duckdb

    qs = [
        "select [1,2][5] as v",
        "select [1,2][0] as v",
        "select [1,2][-1] as v",
        "select [10,20,30][2] as v",
        "select string_agg(x) as v from (values ('a'),('b'),('c')) t(x)",
        "select string_agg(x, '|') as v from (values ('a'),('b')) t(x)",
    ]
    for q in qs:
        got = psql.sql(q).collect()[0][0]
        want = duckdb.sql(q).fetchone()[0]
        assert got == want, (q, got, want)


def test_like_backslash_is_literal(psql):
    """DuckDB LIKE has no default escape — a pattern backslash is a
    LITERAL (r8 silent-wrong find: '50%' like '50\\%' is FALSE in
    DuckDB, TRUE under Spark's default backslash-escape). Explicit
    ESCAPE clauses are honored identically by both engines."""
    import duckdb

    qs = [
        r"select 'a%b' like 'a\%b' as v",
        r"select 'a\b' like 'a\b' as v",
        r"select '50%' like '50\%' as v",
        r"select 'a\xb' like 'a\_b' as v",
        "select '100%' like '100!%' escape '!' as v",
        r"select 'A\B' ilike 'a\b' as v",
        r"select 'a\b' ~~ 'a\b' as v",
        r"select 'a%b' not like 'a\%b' as v",
    ]
    for q in qs:
        got = psql.sql(q).collect()[0][0]
        want = duckdb.sql(q).fetchone()[0]
        assert got == want, (q, got, want)


def test_age_calendar_decomposition(psql):
    """age(a, b) is the CALENDAR interval (years/months/days borrowed
    from the EARLIER timestamp's month), not raw subtraction — r8
    silent-wrong find: age('2001-04-10','1957-06-13') = 43y 9m 27d
    (15777 flattened days) where subtraction gives 16007 days. Collected
    values flatten at 30 d/month exactly like DuckDB's Python client."""
    import duckdb

    cases = [
        ("2001-04-10", "1957-06-13"),
        ("2020-03-31", "2020-01-31"),
        ("2020-03-30", "2020-01-31"),
        ("2020-02-29", "2020-01-31"),
        ("2020-01-31", "2020-03-31"),
        ("2020-03-31 10:30:00", "2020-01-31 12:00:00"),
        ("2020-01-31 12:00:00", "2020-03-31 10:30:00"),
        ("2024-02-29", "2023-02-28"),
    ]
    for a, b in cases:
        q = f"select age(timestamp '{a}', timestamp '{b}') as v"
        got = psql.sql(q).collect()[0][0]
        want = duckdb.sql(q).fetchone()[0]
        assert got == want, (a, b, got, want)


def test_json_bit_interval_r10_batch(psql):
    """Round-10 probe-batch surface, value-checked vs DuckDB: json path
    extensions ([#-N] back-index, .*/[*] wildcards, list-of-paths,
    bare-pointer paths, 2-arg json_keys), json_group_structure (both
    the ::JSON merge and the VARCHAR-as-string-value implicit cast),
    BIT-carrier bitwise aggregates, epoch(interval), and the
    timestamp-difference ::VARCHAR rendering."""
    import duckdb

    qs = [
        "select json_extract('[1,2,3]', '$[#-1]') as v",
        "select json_extract('{\"a\":[1,2,3]}', '$.a[#-2]') as v",
        "select json_extract('[[1,2],[3,4]]', '$[#-1][0]') as v",
        "select json_extract('[1,2]', '$[#-5]') as v",
        "select json_extract('{\"a\":{\"b\":1},\"c\":{\"b\":2}}', '$.*.b') as v",
        "select json_extract('{\"a\":{\"b\":1},\"c\":{\"x\":2}}', '$.*.b') as v",
        "select json_extract('{\"a\":{\"x\":1}}', '$.b.*') as v",
        "select json_extract('[{\"x\":1},{\"x\":2}]', '$[*].x') as v",
        "select json_extract_string('{\"a\":{\"b\":\"hi\"},\"c\":{\"b\":2}}',"
        " '$.*.b') as v",
        "select json_extract('{\"a\":1,\"b\":2}', ['$.a','$.b']) as v",
        "select json_extract_path('{\"a\":{\"b\":7}}', 'a/b') as v",
        "select json_keys('{\"a\":{\"x\":1,\"y\":2}}', '$.a') as v",
        "select json_keys('{\"a\":1}', '$.missing') as v",
        "select json_keys('{\"a\":[1]}', '$.a') as v",
        "select json_keys('[1,2]') as v",
        "select json_group_structure(j) as v from"
        " (values ('{\"a\":1}'),('{\"a\":2,\"b\":\"x\"}')) t(j)",
        "select json_group_structure(j::JSON) as v from"
        " (values ('{\"a\":1}'),('{\"a\":2,\"b\":\"x\"}'),(NULL)) t(j)",
        "select json_group_structure(x) as v from (values (1),(2)) t(x)",
        "select ('{\"a\":1}'::JSON)::VARCHAR as v",
        "select bit_and(x::BIT)::VARCHAR as v from"
        " (values ('0110'),(NULL),('0101')) t(x)",
        "select bit_or(x::BIT)::VARCHAR as v from"
        " (values ('0110'),('0101')) t(x)",
        "select bit_xor(x::BIT)::VARCHAR as v from"
        " (values ('0110'),('0101')) t(x)",
        "select bit_and(x) as v from (values (6),(5)) t(x)",
        "select epoch(interval '1 day 2 hours') as v",
        "select epoch(interval '1.5 seconds') as v",
        "select epoch(interval '-14 months') as v",
        "select (timestamp '2021-03-02 01:00:00'"
        " - timestamp '2021-02-27 23:30:00')::VARCHAR as v",
    ]
    for q in qs:
        got = psql.sql(q).collect()[0][0]
        want = duckdb.sql(q).fetchone()[0]
        if isinstance(got, float) or isinstance(want, float):
            assert got is not None and abs(float(got) - float(want)) < 1e-6, (
                q, got, want,
            )
        else:
            assert (list(got) if isinstance(got, list) else got) == (
                list(want) if isinstance(want, list) else want
            ), (q, got, want)


def test_json_transform_and_current_query(psql):
    """json_transform(_strict) are DuckDB aliases of the literal-structure
    from_json translation; strict errors where lenient yields NULL; a
    scalar top-level structure casts via the '$' path. current_query()
    splices the statement's own text (value-checked directly — the
    DuckDB Python API reports '' for it)."""
    import duckdb
    import pytest as _pytest

    from duckdb_psql_spark.errors import PsqlCompileError  # noqa: F401

    qs = [
        """select json_transform('{"a": 5, "b": "x"}',"""
        """ '{"a":"INTEGER","b":"VARCHAR"}') as v""",
        """select json_transform('{"a": "bad"}', '{"a":"INTEGER"}') as v""",
        """select json_transform('{"a": 5}', '"INTEGER"') as v""",
        """select json_transform('"hi"', '"VARCHAR"') as v""",
        """select json_transform_strict('{"a": 5}', '{"a":"INTEGER"}') as v""",
    ]
    for q in qs:
        got = psql.sql(q).collect()[0][0]
        want = duckdb.sql(q).fetchone()[0]
        if hasattr(got, "asDict"):
            got = got.asDict()
        assert got == want, (q, got, want)
    with _pytest.raises(Exception):
        psql.sql(
            """select json_transform_strict('{"a": "bad"}',"""
            """ '{"a":"INTEGER"}') as v"""
        ).collect()
    stmt = "select current_query() as q, 1 as x"
    assert psql.sql(stmt).collect()[0].q == stmt


def test_window_exclude_frames(psql):
    """Window EXCLUDE TIES/GROUP/CURRENT ROW — Spark parses none of it;
    the frame-arithmetic rewrite matches DuckDB exactly, including the
    NULL on an emptied sum frame and non-prefix RANGE frames."""
    import duckdb

    F = "range between unbounded preceding and current row"
    qs = [
        f"select x, sum(x) over (order by x {F} exclude group) as s "
        "from (values (1),(1),(2)) t(x) order by x, s nulls first",
        f"select x, sum(x) over (order by x {F} exclude ties) as s "
        "from (values (1),(1),(2)) t(x) order by x, s",
        "select x, sum(x) over (order by x rows between 1 preceding and 1 "
        "following exclude current row) as s from (values (1),(2),(3)) t(x) order by x",
        f"select x, count(x) over (order by x {F} exclude ties) as c "
        "from (values (1),(1),(null)) t(x) order by x nulls last, c",
        f"select x, avg(x) over (order by x {F} exclude current row) as a "
        "from (values (1),(2),(4)) t(x) order by x",
        "select x, sum(x) over (order by x range between 1 preceding and 1 "
        "following exclude ties) as s from (values (1),(1),(2),(3)) t(x) order by x, s",
        f"select x, sum(x) over (order by x {F} exclude no others) as s "
        "from (values (1),(2)) t(x) order by x",
        # min/max via frame-split (round 8): ROWS + EXCLUDE CURRENT ROW
        # splits at ±1 row; RANGE unbounded/current bounds + EXCLUDE
        # GROUP/TIES split at ±1 peer group (GROUPS frames over a
        # dense_rank pre-projection). DuckDB 1.0 value-checks all of it
        # with explicit frames.
        "select x, min(x) over (order by x rows between 2 preceding and 2 "
        "following exclude current row) as m from (values (5),(1),(4),(2),(3)) t(x) order by x",
        "select x, max(x) over (order by x rows between 1 preceding and "
        "current row exclude current row) as m from (values (1),(3),(2)) t(x) order by x",
        f"select x, min(x) over (order by x {F} exclude group) as m "
        "from (values (1),(1),(2),(3),(3)) t(x) order by x, m nulls first",
        f"select x, max(x) over (order by x {F} exclude ties) as m "
        "from (values (1),(1),(2),(3),(3)) t(x) order by x, m",
        "select x, min(x) over (order by x range between unbounded preceding "
        "and unbounded following exclude group) as m "
        "from (values (1),(1),(2)) t(x) order by x, m",
    ]
    def norm(rows):
        return [tuple(None if v is None else float(v) for v in r) for r in rows]
    for q in qs:
        assert norm([tuple(r) for r in psql.sql(q).collect()]) == norm(duckdb.sql(q).fetchall()), q
    # round 10 closed the matrix: numeric-RANGE peer exclusion and ROWS
    # TIES/GROUP shapes value-check via the in-frame peer multiset rewrite
    # (formerly loud).
    qs_r10 = [
        "select x, min(x) over (order by x range between 1 preceding and 1 "
        "following exclude group) as m from (values (1),(1),(2),(4)) t(x) "
        "order by x, m",
        "select x, min(x) over (order by x range between unbounded preceding "
        "and current row exclude current row) as m from (values (1),(2),(3)) "
        "t(x) order by x, m nulls first",
        "select x, sum(x) over (order by x rows between 1 preceding and "
        "current row exclude group) as s from (values (1),(1),(2)) t(x) "
        "order by x, s nulls first",
    ]
    for q in qs_r10:
        assert norm([tuple(r) for r in psql.sql(q).collect()]) == norm(
            duckdb.sql(q).fetchall()
        ), q
    # round 9: DISTINCT (and FILTER) joined the rewrite — value-check
    # instead of raising
    qd = ("select x, sum(distinct x) over (order by x range between unbounded "
          "preceding and current row exclude ties) as s "
          "from (values (1),(1),(2),(2),(3)) t(x) order by x, s nulls first")
    assert norm([tuple(r) for r in psql.sql(qd).collect()]) == norm(
        duckdb.sql(qd).fetchall()
    ), qd
    qf = ("select x, sum(x) filter (where x > 1) over (order by x rows between "
          "2 preceding and 2 following exclude current row) as s "
          "from (values (1),(2),(3),(4)) t(x) order by x, s nulls first")
    assert norm([tuple(r) for r in psql.sql(qf).collect()]) == norm(
        duckdb.sql(qf).fetchall()
    ), qf


def test_glob_read_text_read_blob(psql, tmp_path):
    """File-corpus ingestion functions, DuckDB-shape: glob('pattern')
    (one `file` column), read_text / read_blob (filename, content,
    size, last_modified — whole-file rows via Spark's distributed
    binaryFile source)."""
    import duckdb

    (tmp_path / "a.txt").write_text("hello world\n")
    (tmp_path / "b.txt").write_text("second doc\n")
    q1 = f"select file from glob('{tmp_path}/*.txt') order by file"
    assert [tuple(r) for r in psql.sql(q1).collect()] == duckdb.sql(q1).fetchall()
    q2 = (f"select filename, content, size from read_text('{tmp_path}/*.txt') "
          "order by filename")
    assert [tuple(r) for r in psql.sql(q2).collect()] == duckdb.sql(q2).fetchall()
    q3 = f"select filename, size from read_blob('{tmp_path}/a.txt')"
    assert [tuple(r) for r in psql.sql(q3).collect()] == duckdb.sql(q3).fetchall()
    # piped head form + downstream text ops (the corpus-ingestion shape)
    q4 = (f"from read_text('{tmp_path}/*.txt') |> "
          "select filename, length(content) as n |> order by filename")
    got = [tuple(r) for r in psql.sql(q4).collect()]
    assert got == duckdb.sql(
        f"select filename, length(content) as n from read_text('{tmp_path}/*.txt') "
        "order by filename").fetchall()


def test_syntax_sugar_batch12(psql):
    """DuckDB sugar: (expr).fn(args) method chaining, trailing select-
    list commas, FILTER without WHERE, columns(* EXCLUDE (...))."""
    import duckdb

    qs = [
        "select ('ab' || 'c').length() as n, [1,2,3].list_sum() as s",
        "select [4,1,3].list_sort().list_reverse() as l",
        "select 1 as a, 2 as b,",
        "select min(columns(* exclude (b))) from (values (1, 5), (2, 3)) t(a, b)",
        "select count(*) filter (x > 1) as c from (values (1),(2)) t(x)",
        "select list_filter([1,2,3], x -> x > 1) as lf",  # unaffected fn
    ]
    for q in qs:
        assert [tuple(r) for r in psql.sql(q).collect()] == duckdb.sql(q).fetchall(), q


def test_describe_query_duckdb_shape(psql):
    """DESCRIBE <query> returns DuckDB's 6-column shape with DuckDB
    type names (query-derived columns always report null=YES)."""
    import duckdb

    q = "describe select 1 as x, 'a' as s, 1.5 as d"
    assert [tuple(r) for r in psql.sql(q).collect()] == duckdb.sql(q).fetchall()


def test_arg_min_max_top_n(psql):
    """arg_min/arg_max(val, key, N) — the DuckDB 1.1+ top-N form (the
    container's 1.0 oracle predates it; values hand-computed). NULL keys
    are ignored; the 2-arg forms keep their min_by/max_by mapping."""
    q = ("select arg_min(s, x, 2) as amin, arg_max(s, x, 2) as amax, "
         "arg_min(s, x) as a1 "
         "from (values ('a', 3), ('b', 1), ('c', 2), ('d', null)) t(s, x)")
    r = psql.sql(q).collect()[0]
    assert r.amin == ["b", "c"] and r.amax == ["a", "c"] and r.a1 == "b"


def test_insert_by_position_and_default_values(psql):
    """DuckDB statement forms: `INSERT INTO t BY POSITION VALUES …`
    (the explicit spelling of the positional default) and `INSERT INTO
    t DEFAULT VALUES` (one all-defaults row; with no declared defaults
    every column is NULL — oracle-probed). A column list with DEFAULT
    VALUES is an error, like DuckDB."""
    import pytest
    from duckdb_psql_spark.errors import PsqlCompileError, PsqlParseError

    psql.sql("create or replace temp table ins_dv as "
             "select * from (values (1, 'a')) v(i, s) where false")
    psql.sql("insert into ins_dv default values")
    psql.sql("insert into ins_dv by position values (5, 'x')")
    rows = sorted(
        map(tuple, psql.sql("select * from ins_dv").collect()),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert rows == [(5, "x"), (None, None)]
    with pytest.raises((PsqlCompileError, PsqlParseError)):
        psql.sql("insert into ins_dv (i) default values")


def test_dml_update_from_delete_using_returning(psql):
    """Round-9 DML batch: UPDATE … FROM (join-scoped SET expressions),
    DELETE … USING (NOT EXISTS — exact under source duplicates), and
    RETURNING on both (UPDATE returns the post-image, DELETE the
    deleted rows' old image). Copy-on-write like the plain forms."""
    psql.sql(
        "create or replace temp view dmlf_t as "
        "(| from (values (1, 10), (2, 20), (3, 30)) v(id, v) |)"
    )
    psql.sql(
        "create or replace temp view dmlf_u as "
        "(| from (values (1, 99), (1, 77), (3, 55)) v(id, nv) |)"
    )
    # UPDATE FROM: rows 1 and 3 match (row 1 twice — one arbitrary
    # match applies, DuckDB semantics); row 2 untouched
    assert psql.sql(
        "update dmlf_t set v = nv from dmlf_u where dmlf_t.id = dmlf_u.id"
    ).first()[0] == 2
    rows = {r.id: r.v for r in psql.sql("from dmlf_t").collect()}
    assert rows[2] == 20 and rows[3] == 55 and rows[1] in (99, 77)
    # DELETE USING with duplicate source rows deletes each target once
    assert psql.sql(
        "delete from dmlf_t using dmlf_u where dmlf_t.id = dmlf_u.id"
    ).first()[0] == 2
    assert [tuple(r) for r in psql.sql("from dmlf_t").collect()] == [(2, 20)]
    # RETURNING: UPDATE post-image, DELETE old image
    ret = psql.sql("update dmlf_t set v = v + 1 returning id, v").collect()
    assert [tuple(r) for r in ret] == [(2, 21)]
    ret = psql.sql("delete from dmlf_t where id = 2 returning id, v").collect()
    assert [tuple(r) for r in ret] == [(2, 21)]
    assert psql.sql("from dmlf_t").count() == 0
    for v in ("dmlf_t", "dmlf_u"):
        psql.spark.catalog.dropTempView(v)


def test_create_or_replace_table_as_on_existing(psql, spark):
    """CREATE OR REPLACE TABLE … AS over an EXISTING v1 catalog table:
    raw Spark raises UNSUPPORTED_FEATURE (REPLACE TABLE AS SELECT), so
    the engine's DDL path must take it (round-9 probe find)."""
    spark.sql("DROP TABLE IF EXISTS cor_t")
    try:
        psql.sql("create or replace table cor_t as select 1 as a")
        assert psql.sql("from cor_t").count() == 1
        psql.sql("create or replace table cor_t as (| from (values (1),(2)) v(a) |)")
        assert psql.sql("from cor_t").count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS cor_t")


def test_insert_returning_and_ctas_no_data(psql):
    """INSERT … RETURNING returns the inserted batch's projection;
    CREATE TABLE AS … WITH NO DATA keeps the schema, drops the rows
    (standard semantics — DuckDB 1.0's parser silently ignores the
    clause, probe-pinned quirk)."""
    psql.sql(
        "create or replace temp view ins_ret_t as "
        "(| from (values (0, 'z')) v(id, s) |> where id < 0 |)"
    )
    ret = psql.sql(
        "insert into ins_ret_t values (7, 'a'), (8, 'b') returning id * 2 as d, s"
    ).collect()
    assert sorted(tuple(r) for r in ret) == [(14, "a"), (16, "b")]
    assert psql.sql("from ins_ret_t").count() == 2
    psql.sql(
        "create or replace temp table ctas_nd as "
        "select 1 as a, 'x' as b with no data"
    )
    out = psql.sql("from ctas_nd")
    assert out.count() == 0 and out.columns == ["a", "b"]
    psql.spark.catalog.dropTempView("ins_ret_t")
    psql.spark.catalog.dropTempView("ctas_nd")


def test_named_window_clause(psql, sf_dir):
    """`WINDOW w AS (…)` named windows (round-9 probe find: the
    default-null-order pass mis-classified the definition paren as a
    subquery and spliced `nulls last` INTO the frame spec)."""
    import duckdb

    n = f"'{sf_dir}/nation.parquet'"
    q = (
        f"select n_nationkey, rank() over w1 as r, sum(n_nationkey) over w2 as s"
        f" from {n} window w1 as (order by n_regionkey, n_nationkey),"
        f" w2 as (partition by n_regionkey order by n_nationkey"
        f" rows between 1 preceding and current row)"
        f" order by n_nationkey limit 6"
    )
    assert [tuple(r) for r in psql.sql(q).collect()] == duckdb.sql(q).fetchall()


def test_recursive_union_distinct_and_cte_column_lists(psql):
    """Round-9 CTE batch: WITH RECURSIVE … UNION (distinct) runs as a
    semi-naive fixpoint (Spark's native recursion is UNION ALL only) —
    set semantics double as the cycle guard; CTE column-alias lists
    `v(a)` rename the body's columns (they were skipped unread)."""
    rows = psql.sql(
        "with recursive r(x) as (select 1 union select x + 1 from r"
        " where x < 5) select * from r order by x"
    ).collect()
    assert [r.x for r in rows] == [1, 2, 3, 4, 5]
    # a cyclic step terminates through set semantics
    rows = psql.sql(
        "with recursive r(x) as (select 1 union select (x % 3) + 1 from r)"
        " select * from r order by x"
    ).collect()
    assert [r.x for r in rows] == [1, 2, 3]
    assert psql.sql(
        "with v(a) as (values (1), (2)) select sum(a) as s from v"
    ).collect()[0].s == 3
    # nested WITH shadows the outer CTE of the same name
    assert psql.sql(
        "with t(x) as (select 1), u as (with t(x) as (select 9)"
        " select x from t) select * from u"
    ).collect()[0].x == 9


def test_update_where_returning_preimage_cond(psql):
    """UPDATE … WHERE … RETURNING: the WHERE condition must be evaluated
    on the PRE-update image (ADVICE r9 high). `SET v = v+1 WHERE v = 10`
    returns the updated rows' post-image (v = 11) — filtering the
    post-image by the condition would return 0 rows."""
    psql.sql(
        "create or replace temp view uret_t as "
        "(| from (values (1, 10), (2, 10), (3, 7)) v(id, v) |)"
    )
    try:
        ret = psql.sql(
            "update uret_t set v = v + 1 where v = 10 returning id, v"
        ).collect()
        assert sorted(tuple(r) for r in ret) == [(1, 11), (2, 11)]
        rows = {r.id: r.v for r in psql.sql("from uret_t").collect()}
        assert rows == {1: 11, 2: 11, 3: 7}
        # RETURNING * must not leak internal columns
        psql.sql("update uret_t set v = 0 where id = 3")
        ret = psql.sql(
            "update uret_t set v = v + 5 where v = 0 returning *"
        ).collect()
        assert [tuple(r) for r in ret] == [(3, 5)]
        assert ret[0].asDict().keys() == {"id", "v"}
    finally:
        psql.spark.catalog.dropTempView("uret_t")


def test_multi_source_dml_fails_loud(psql):
    """UPDATE … FROM u, w / DELETE … USING u JOIN v would silently
    compile against `u` alone (ADVICE r9 medium) — must raise."""
    psql.sql(
        "create or replace temp view mdml_t as "
        "(| from (values (1, 10)) v(id, v) |)"
    )
    try:
        for stmt in (
            "update mdml_t set v = 0 from mdml_t u, mdml_t w"
            " where mdml_t.id = u.id",
            "delete from mdml_t using mdml_t u join mdml_t v on u.id = v.id"
            " where mdml_t.id = u.id",
        ):
            with pytest.raises(PsqlCompileError, match="single table"):
                psql.sql(stmt)
        # single source with alias still works
        assert psql.sql(
            "update mdml_t set v = 99 from mdml_t as u where mdml_t.id = u.id"
        ).first()[0] == 1
    finally:
        psql.spark.catalog.dropTempView("mdml_t")
