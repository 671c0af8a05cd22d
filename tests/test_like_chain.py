"""``col [NOT] LIKE '%a%b%'`` → locate-chain rewrite (round 12).

Spark compiles multi-wildcard LIKE to a per-row java.util.regex matcher
(LikeSimplification only folds single-part shapes); the chain keeps the
filter in codegen string intrinsics. Equivalence argument in
functions/shims.py:_rewrite_like_contains_chain; these tests pin the
rewrite's gates and check values against DuckDB on real data."""

from __future__ import annotations

from duckdb_psql_spark.functions.shims import _rewrite_like_contains_chain as R


def test_rewrites_basic_and_not():
    out = R("where o_comment not like '%special%requests%'")
    assert "locate('special', o_comment)" in out
    assert "locate('requests', o_comment, locate('special', o_comment) + 7)" in out
    assert out.startswith("where (not (")
    out2 = R("where x like '%a%b%c%'")
    assert out2.count("locate") == 6  # 1 + 2 + 3 nested


def test_gates_leave_sql_untouched():
    for sql in (
        "where x like '%only%'",            # single part: Spark Contains
        "where a || b like '%a%b%'",        # LHS is a tighter-binding op
        "where x like '%a%b%' escape '#'",  # explicit ESCAPE clause
        "where x like '%a%b%' || y",        # operator binds into pattern
        "where x like '%a_%b%'",            # _ wildcard
        "where x like '%a\\b%c%'",          # backslash (escape ambiguity)
        "where x ilike '%a%b%'",            # case-insensitive variant
        "where x like '%a%%b%'",            # empty interior part
        "where x like 'a%b%'",              # anchored prefix
        "where x like '%a%b%c%d%e%'",       # >4 parts
    ):
        assert R(sql) == sql


def test_quote_escape_length():
    out = R("where x like '%it''s%ok%'")
    # the '' collapses to one character when computing the next start
    assert "locate('it''s', x) + 4" in out


def test_qualified_column_and_select_context():
    out = R("select t.c like '%a%b%' as m")
    assert "locate('a', t.c)" in out and " as m" in out


def test_values_match_duckdb(psql, sf_dir):
    import duckdb

    preds = [
        "o_orderpriority like '%1%URGENT%'",
        "o_orderpriority not like '%-%T%'",
        "o_orderpriority like '%R%R%'",     # self-overlapping part
        "o_orderpriority like '%1%1%'",     # repeated part
    ]
    for pred in preds:
        a = psql.sql(
            f"from '{sf_dir}/orders.parquet' |> where {pred} "
            "|> select count(*) as n"
        ).collect()[0].n
        b = duckdb.sql(
            f"select count(*) n from '{sf_dir}/orders.parquet' where {pred}"
        ).fetchone()[0]
        assert a == b, pred
    # rewrite actually fired (plan contains no LIKE for the chain shape)
    df = psql.sql(
        f"from '{sf_dir}/orders.parquet' "
        "|> where o_orderpriority like '%1%URGENT%'"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "locate" in plan.lower()
