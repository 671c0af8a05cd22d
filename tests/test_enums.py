"""ENUM type surface (enums.py): every behavior probe-pinned against the
container's DuckDB (see module docstring) — casts, functions, positional
contexts, VARCHAR-degradation corners, and the loud boundaries."""

import pytest

from duckdb_psql_spark.errors import PsqlCompileError


@pytest.fixture(scope="module")
def epsql(spark):
    from duckdb_psql_spark import PsqlSession

    p = PsqlSession(spark)
    p.sql("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    return p


def test_enum_cast_and_validation(epsql):
    assert epsql.sql("select 'ok'::mood as v").collect()[0].v == "ok"
    # invalid literal: compile-time Conversion Error (DuckDB wording)
    with pytest.raises(PsqlCompileError, match="Conversion Error"):
        epsql.sql("select 'zzz'::mood")
    # invalid runtime value raises through raise_error
    with pytest.raises(Exception, match="Conversion Error"):
        epsql.sql(
            "select x::mood as m from (values ('zzz')) t(x)"
        ).collect()
    # try_cast yields NULL instead
    r = epsql.sql(
        "select try_cast('zzz' as mood) as a, try_cast('ok' as mood) as b"
    ).collect()[0]
    assert r.a is None and r.b == "ok"
    # NULL propagates
    assert epsql.sql("select NULL::mood as v").collect()[0].v is None


def test_enum_functions(epsql):
    r = epsql.sql(
        "select enum_first(NULL::mood) as f, enum_last(NULL::mood) as l, "
        "enum_range(NULL::mood) as r, enum_code('happy'::mood) as c, "
        "enum_range_boundary(NULL, 'ok'::mood) as b1, "
        "enum_range_boundary('ok'::mood, 'happy'::mood) as b2"
    ).collect()[0]
    assert (r.f, r.l) == ("sad", "happy")
    assert r.r == ["sad", "ok", "happy"]
    assert r.c == 2  # 0-based declaration code
    assert r.b1 == ["sad", "ok"] and r.b2 == ["ok", "happy"]


def test_enum_positional_contexts(epsql):
    # enum-enum comparison: positional; enum-varchar: lexicographic
    # (probe-pinned container behavior — the enum degrades to VARCHAR)
    r = epsql.sql(
        "select 'sad'::mood < 'ok'::mood as p1, "
        "'happy'::mood < 'ok' as p2, "
        "'ok'::mood between 'sad'::mood and 'happy'::mood as bt"
    ).collect()[0]
    assert r.p1 is True  # sad(0) < ok(1)
    assert r.p2 is True  # lexicographic 'happy' < 'ok'
    assert r.bt is True  # 1 between 0 and 2 (lexicographic would be False)
    # ORDER BY: declaration position, both directions
    rows = epsql.sql(
        "select x from (values ('happy'),('sad'),('ok')) t(x) "
        "order by x::mood"
    ).collect()
    assert [r.x for r in rows] == ["sad", "ok", "happy"]
    rows = epsql.sql(
        "select x from (values ('happy'),('sad'),('ok')) t(x) "
        "order by x::mood desc"
    ).collect()
    assert [r.x for r in rows] == ["happy", "ok", "sad"]


def test_enum_aggregates(epsql):
    # min/max: positional pick, VALUE result
    r = epsql.sql(
        "select min(x::mood) as mn, max(x::mood) as mx "
        "from (values ('happy'),('sad'),('ok')) t(x)"
    ).collect()[0]
    assert (r.mn, r.mx) == ("sad", "happy")
    # least/greatest and arg_min's BY arg degrade to VARCHAR (container
    # probes: 'happy' wins lexicographically)
    r = epsql.sql(
        "select least('happy'::mood, 'sad'::mood) as l, "
        "arg_min(x, x::mood) as am "
        "from (values ('happy'),('sad'),('ok')) t(x) group by 1"
    ).collect()[0]
    assert r.l == "happy" and r.am == "happy"


def test_enum_grouped_order_by_alias(epsql):
    rows = epsql.sql(
        "select x::mood as m, count(*) as n "
        "from (values ('ok'),('ok'),('sad')) t(x) "
        "group by x::mood order by x::mood"
    ).collect()
    assert [(r.m, r.n) for r in rows] == [("sad", 1), ("ok", 2)]


def test_enum_inline_anonymous(epsql):
    r = epsql.sql(
        "select 'b'::ENUM('a','b','c') as v, "
        "enum_code('b'::ENUM('a','b','c')) as c, "
        "'a'::ENUM('b','a') > 'b'::ENUM('b','a') as p"
    ).collect()[0]
    assert r.v == "b" and r.c == 1 and r.p is True


def test_enum_in_pipe(epsql, sf_dir):
    rows = epsql.sql(
        f"from '{sf_dir}/documents.parquet' |> "
        "select lang::ENUM('zh','fr','es','de','en') as le |> "
        "select le, count() as n group by le |> "
        "order by le::ENUM('zh','fr','es','de','en') |> limit 2"
    ).collect()
    assert [r.le for r in rows] == ["zh", "fr"]


def test_enum_ddl_and_boundaries(epsql):
    # duplicate create fails; OR REPLACE and DROP work
    with pytest.raises(PsqlCompileError, match="already exists"):
        epsql.sql("CREATE TYPE mood AS ENUM ('x')")
    epsql.sql("CREATE OR REPLACE TYPE tmp_t AS ENUM ('a','b')")
    assert epsql.sql("select 'a'::tmp_t as v").collect()[0].v == "a"
    epsql.sql("DROP TYPE tmp_t")
    with pytest.raises(PsqlCompileError, match="does not exist"):
        epsql.sql("DROP TYPE tmp_t")
    # enum-typed table columns: LOUD documented boundary
    with pytest.raises(PsqlCompileError, match="enum-typed table columns"):
        epsql.sql("create temp table bad_enum_tbl (m mood)")
    # non-enum CREATE TYPE: loud
    with pytest.raises(PsqlCompileError, match="AS ENUM"):
        epsql.sql("CREATE TYPE pt AS STRUCT(a int)")


def test_union_type_function_family(epsql):
    """UNION-type functions: compile-time folds for visible construction
    (probe-pinned vs the container's DuckDB); dynamic unions stay loud."""
    r = epsql.sql(
        "select union_value(num := 2) as v, "
        "union_tag(union_value(num := 2)) as t, "
        "union_extract(union_value(num := 7), 'num') as x"
    ).collect()[0]
    assert (r.v, r.t, r.x) == (2, "num", 7)
    with pytest.raises(PsqlCompileError, match='Could not find key "str"'):
        epsql.sql("select union_extract(union_value(num := 7), 'str')")
    with pytest.raises(PsqlCompileError, match="dynamic UNION"):
        epsql.sql("select union_tag(x) from (values (1)) t(x)")


def test_enum_stored_item_boundary(epsql):
    """CTAS/CREATE VIEW over an enum-typed SELECT item is loud (DuckDB
    would persist the ENUM type; the string carrier can't) — but enum
    casts in the body's WHERE are fine (nothing enum-typed stored)."""
    with pytest.raises(PsqlCompileError, match="CREATE TABLE/VIEW AS"):
        epsql.sql("create temp table te as select 'ok'::mood as m")
    with pytest.raises(PsqlCompileError, match="CREATE TABLE/VIEW AS"):
        epsql.sql("create or replace view ve as select 'ok'::mood as m")
    epsql.sql(
        "create or replace temp view ve_ok as "
        "select 1 as k where 'ok'::mood = 'ok'::mood"
    )
    assert epsql.sql("select k from ve_ok").collect()[0].k == 1


def test_enum_reserved_type_names(epsql):
    with pytest.raises(PsqlCompileError, match="built-in type name"):
        epsql.sql("CREATE TYPE int AS ENUM ('a')")
    with pytest.raises(PsqlCompileError, match="built-in type name"):
        epsql.sql("CREATE TYPE VARCHAR AS ENUM ('a')")


def test_enum_review_findings_r10(epsql):
    """Round-10 code-review findings, each pinned (container-verified):
    mixed BETWEEN coerces ALL operands to VARCHAR (no per-pair split);
    NOT BETWEEN keeps subject and negation; nondeterministic operands
    and deep nesting are loud; a CTAS implicit alias named like an enum
    is NOT a typed column."""
    # mixed BETWEEN: duckdb pins FALSE for all of sad/ok/happy
    r = epsql.sql(
        "select 'ok'::mood between 'sad'::mood and 'ok' as m1, "
        "'sad'::mood between 'sad'::mood and 'ok' as m2"
    ).collect()[0]
    assert r.m1 is False and r.m2 is False  # lexicographic throughout
    # NOT BETWEEN: positional when all-enum
    r = epsql.sql(
        "select 'ok'::mood not between 'sad'::mood and 'happy'::mood as nb, "
        "'sad'::mood not between 'ok'::mood and 'happy'::mood as nb2"
    ).collect()[0]
    assert r.nb is False and r.nb2 is True
    # nondeterministic operand: loud
    with pytest.raises(PsqlCompileError, match="non-deterministic"):
        epsql.sql(
            "select (case when random() < 2 then 'ok' else 'sad' end)::mood"
        )
    # nesting cap: loud, not a hang
    with pytest.raises(PsqlCompileError, match="nested more than 6"):
        epsql.sql("select 'ok'" + "::mood" * 12 + " as v")
    # CTAS implicit alias named like the enum: NOT a typed column
    epsql.sql("create or replace temp view enum_alias_src as select 1 as x, 2 as y")
    epsql.sql("create or replace temp table enum_alias_t as "
              "select x mood, y from enum_alias_src")
    assert epsql.sql("select mood from enum_alias_t").collect()[0].mood == 1


def test_enum_advice_findings_r11(epsql):
    """Round-11 advice findings, each pinned (container-verified):
    min/max over a WRAPPED enum expression degrades to the outer value
    (min(length(x::mood)) is a numeric min, not a positional pick);
    a parenthesized ORDER BY operand still sorts positionally;
    min(x::mood) OVER (...) splices the OVER inside the positional pick."""
    # wrapped expression: numeric min/max, not a positional enum pick
    r = epsql.sql(
        "select min(length(x::mood)) as lo, max(length(x::mood)) as hi "
        "from (values ('sad'),('happy'),('ok')) t(x)"
    ).collect()[0]
    assert (r.lo, r.hi) == (2, 5)
    # bare primary unchanged: positional pick, value result
    r = epsql.sql(
        "select min(x::mood) as v, max(x::mood) as w "
        "from (values ('sad'),('happy'),('ok')) t(x)"
    ).collect()[0]
    assert (r.v, r.w) == ("sad", "happy")
    # parenthesized ORDER BY operand: positional sort (duckdb-pinned)
    rows = epsql.sql(
        "select x from (values ('happy'),('sad'),('ok')) t(x) "
        "order by (x::mood)"
    ).collect()
    assert [r.x for r in rows] == ["sad", "ok", "happy"]
    rows = epsql.sql(
        "select x from (values ('happy'),('sad'),('ok')) t(x) "
        "order by ((x::mood)) desc"
    ).collect()
    assert [r.x for r in rows] == ["happy", "ok", "sad"]
    # windowed min over enum: OVER spliced inside element_at
    rows = epsql.sql(
        "select x, min(x::mood) over (partition by g) as m from "
        "(values ('happy',1),('sad',1),('ok',2)) t(x,g) order by x"
    ).collect()
    assert {(r.x, r.m) for r in rows} == {
        ("happy", "sad"), ("sad", "sad"), ("ok", "ok")
    }
