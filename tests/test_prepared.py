"""PREPARE / EXECUTE / DEALLOCATE (prepared.py): compile-time binding."""

import pytest

from duckdb_psql_spark.errors import PsqlCompileError


def test_positional_question_marks(psql, sf_dir):
    psql.sql(
        f"prepare p_qty as from '{sf_dir}/lineitem.parquet' |>"
        " where l_quantity > ? |> select count() as n"
    )
    n_45 = psql.sql("execute p_qty(45)").collect()[0].n
    n_49 = psql.sql("execute p_qty(49)").collect()[0].n
    assert n_45 > n_49 > 0
    psql.sql("deallocate p_qty")


def test_numbered_and_named_params(psql):
    psql.sql("prepare p_num as select $2 - $1 as d, $1 + $2 as s")
    row = psql.sql("execute p_num(3, 10)").collect()[0]
    assert (row.d, row.s) == (7, 13)
    psql.sql("prepare p_named as select $hi - $lo as spread")
    row = psql.sql("execute p_named(lo := 4, hi := 20)").collect()[0]
    assert row.spread == 16
    psql.sql("deallocate p_num")
    psql.sql("deallocate prepare p_named")


def test_placeholder_never_binds_inside_string(psql):
    psql.sql("prepare p_str as select '$1 costs ?' as label, $1 as v")
    row = psql.sql("execute p_str(9)").collect()[0]
    assert row.label == "$1 costs ?"
    assert row.v == 9
    psql.sql("deallocate p_str")


def test_argument_is_expression_with_own_precedence(psql):
    psql.sql("prepare p_sq as select $1 * $1 as v")
    assert psql.sql("execute p_sq(1 + 2)").collect()[0].v == 9
    psql.sql("deallocate p_sq")


def test_errors(psql):
    with pytest.raises(PsqlCompileError, match="does not exist"):
        psql.sql("execute p_missing(1)")
    with pytest.raises(PsqlCompileError, match="does not exist"):
        psql.sql("deallocate p_missing")
    psql.sql("prepare p_err as select ? + ? as v")
    with pytest.raises(PsqlCompileError, match="not enough arguments"):
        psql.sql("execute p_err(1)")
    psql.sql("deallocate p_err")
    psql.sql("prepare p_err2 as select $3 as v")
    with pytest.raises(PsqlCompileError, match="has no argument"):
        psql.sql("execute p_err2(1, 2)")
    psql.sql("deallocate p_err2")


def test_rebind_runs_fresh_plan(psql, sf_dir):
    # the bound value reaches Catalyst as a literal: partition pruning /
    # constant folding see it, and two EXECUTEs yield independent plans
    psql.sql(
        f"prepare p_nat as from '{sf_dir}/nation.parquet' |>"
        " where n_nationkey = $1 |> select n_name"
    )
    a = psql.sql("execute p_nat(1)").collect()[0].n_name
    b = psql.sql("execute p_nat(2)").collect()[0].n_name
    assert a != b
    psql.sql("deallocate p_nat")


def test_prepared_args_bind_into_pipe_verb_options(psql, sf_dir):
    # binding splices values parenthesized (`k=$1` -> `k=(5)`); verb
    # option parsing must strip the parens before int()/float()
    psql.sql(
        f"prepare p_verb as from '{sf_dir}/documents.parquet' |>"
        " contamination '" + sf_dir + "/documents.parquet' k=$1 threshold=$2 |>"
        " where contaminated |> select count() as n"
    )
    n_docs = psql.sql(f"from '{sf_dir}/documents.parquet'").count()
    assert psql.sql("execute p_verb(5, 0.9)").collect()[0].n == n_docs
    psql.sql("deallocate p_verb")
