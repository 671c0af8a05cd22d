"""DuckDB CREATE SEQUENCE / nextval / currval (sequences.py).

Delegated-dialect surface (/root/reference/README.md:3 — every DuckDB
statement works through the rewriter). Session-state semantics: unique
consecutive values per statement, continuation across statements, an
eager count job advancing the counter (documented in sequences.py).
"""

import pytest

from duckdb_psql_spark.errors import PsqlCompileError
from tests.conftest import SF_DIR

NATION = f"{SF_DIR}/nation.parquet"


def test_sequence_basic_and_continuation(psql):
    psql.sql("create sequence t_seq_a")
    ids = sorted(
        r.id
        for r in psql.sql(
            f"from '{NATION}' |> select nextval('t_seq_a') as id"
        ).collect()
    )
    assert ids == list(range(1, 26))
    ids2 = sorted(
        r.id
        for r in psql.sql(
            f"from '{NATION}' |> select nextval('t_seq_a') as id"
        ).collect()
    )
    assert ids2 == list(range(26, 51))
    assert psql.sql("select currval('t_seq_a') as c").collect()[0].c == 50
    psql.sql("drop sequence t_seq_a")


def test_sequence_start_increment_and_two_sites(psql):
    psql.sql("create sequence t_seq_b start with 100 increment by 5")
    r = psql.sql("select nextval('t_seq_b') as a, nextval('t_seq_b') as b").collect()[0]
    assert (r.a, r.b) == (100, 105)
    assert psql.sql("select nextval('t_seq_b') as v").collect()[0].v == 110
    # two call sites across many rows stay globally unique
    vals = []
    for row in psql.sql(
        f"from '{NATION}' |> select nextval('t_seq_b') as a, nextval('t_seq_b') as b"
    ).collect():
        vals += [row.a, row.b]
    assert len(set(vals)) == 50
    psql.sql("drop sequence t_seq_b")


def test_sequence_errors(psql):
    psql.sql("create sequence t_seq_c")
    with pytest.raises(PsqlCompileError, match="already exists"):
        psql.sql("create sequence t_seq_c")
    psql.sql("create sequence if not exists t_seq_c")  # ok
    with pytest.raises(PsqlCompileError, match="has not been used"):
        psql.sql("select currval('t_seq_c')")
    psql.sql("drop sequence t_seq_c")
    with pytest.raises(PsqlCompileError, match="does not exist"):
        psql.sql("drop sequence t_seq_c")
    psql.sql("drop sequence if exists t_seq_c")  # ok
    with pytest.raises(PsqlCompileError, match="does not exist"):
        psql.sql("select nextval('t_seq_c') as v")


def test_sequence_or_replace_resets(psql):
    psql.sql("create sequence t_seq_d start with 7")
    assert psql.sql("select nextval('t_seq_d') as v").collect()[0].v == 7
    psql.sql("create or replace sequence t_seq_d start with 1000")
    assert psql.sql("select nextval('t_seq_d') as v").collect()[0].v == 1000
    psql.sql("drop sequence t_seq_d")
