"""MERGE INTO (operators/merge_into.py + compiler._run_merge).

The container's DuckDB oracle is 1.0 (MERGE landed in 1.4, the version the
reference pins), so parity here is locked by hand-computed expectations:
each scenario's result state was worked out from DuckDB 1.4's documented
clause semantics (first matching WHEN wins; BY SOURCE sees target-only rows;
Count = updated + deleted + inserted).
"""

import pytest

from duckdb_psql_spark.errors import PsqlCompileError, PsqlParseError
from duckdb_psql_spark.operators.merge_into import parse_merge


def _state(psql, table):
    return sorted(map(tuple, psql.sql(f"select * from {table}").collect()))


@pytest.fixture()
def merged(psql):
    psql.sql(
        "create or replace temp table m_t as select * from "
        "(values (0, 0), (1, 10), (2, 20), (3, 30), (4, 40)) v(i, v)"
    )
    psql.sql(
        "create or replace temp table m_s as select * from "
        "(values (3, 99), (4, 99), (5, 99), (6, 99)) v(i, nv)"
    )
    return psql


def test_upsert(merged):
    r = merged.sql(
        "merge into m_t using m_s on m_t.i = m_s.i "
        "when matched then update set v = m_s.nv "
        "when not matched then insert values (m_s.i, m_s.nv)"
    )
    assert r.collect()[0][0] == 4  # 2 updates + 2 inserts
    assert _state(merged, "m_t") == [
        (0, 0), (1, 10), (2, 20), (3, 99), (4, 99), (5, 99), (6, 99),
    ]


def test_all_clause_kinds(merged):
    r = merged.sql(
        """merge into m_t using m_s on m_t.i = m_s.i
        when matched and m_s.i = 3 then delete
        when matched then update set v = -1
        when not matched by source then update set v = v + 1
        when not matched by target then insert (i, v) values (m_s.i, -5)"""
    )
    # 1 delete + 1 update + 3 by-source updates + 2 inserts
    assert r.collect()[0][0] == 7
    assert _state(merged, "m_t") == [
        (0, 1), (1, 11), (2, 21), (4, -1), (5, -5), (6, -5),
    ]


def test_bare_insert_by_name_and_do_nothing(psql):
    psql.sql(
        "create or replace temp table m_t3 as select * from (values (1, 5)) v(i, v)"
    )
    psql.sql(
        "create or replace temp table m_s3 as select * from "
        "(values (1, 6), (2, 7)) v(i, v)"
    )
    r = psql.sql(
        "merge into m_t3 using m_s3 on m_t3.i = m_s3.i "
        "when not matched then insert when matched then do nothing"
    )
    assert r.collect()[0][0] == 1
    assert _state(psql, "m_t3") == [(1, 5), (2, 7)]


def test_multi_match_updates_once(psql):
    # two source rows match target row 1 — the row is updated ONCE
    psql.sql(
        "create or replace temp table m_t4 as select * from (values (1, 0)) v(i, v)"
    )
    psql.sql(
        "create or replace temp table m_s4 as select * from "
        "(values (1, 100), (1, 200)) v(i, nv)"
    )
    r = psql.sql(
        "merge into m_t4 using m_s4 on m_t4.i = m_s4.i "
        "when matched then update set v = v + 1"
    )
    assert r.collect()[0][0] == 1
    assert _state(psql, "m_t4") == [(1, 1)]


def test_subquery_source_and_null_fill(psql):
    psql.sql(
        "create or replace temp table m_t5 as select * from "
        "(values (1, 'a', 5)) v(i, s, v)"
    )
    r = psql.sql(
        "merge into m_t5 using (select 2 as i) src on m_t5.i = src.i "
        "when not matched then insert (i) values (src.i)"
    )
    assert r.collect()[0][0] == 1
    assert _state(psql, "m_t5") == [(1, "a", 5), (2, None, None)]


def test_errors(psql):
    psql.sql("create or replace temp table m_t6 as select 1 as i")
    with pytest.raises(PsqlCompileError, match="not found"):
        psql.sql(
            "merge into no_such_table using m_t6 on 1=1 when matched then delete"
        )
    with pytest.raises(PsqlCompileError, match="not in"):
        psql.sql(
            "merge into m_t6 using (select 1 as i) s on m_t6.i = s.i "
            "when matched then update set zz = 1"
        )
    with pytest.raises((PsqlParseError, PsqlCompileError)):
        psql.sql(
            "merge into m_t6 using (select 1 as i) s on m_t6.i = s.i "
            "when matched then insert values (1)"
        )


def test_parse_merge_non_merge_returns_none():
    assert parse_merge("select 1") is None
    assert parse_merge("update t set x = 1") is None


class TestOnConflict:
    """INSERT … ON CONFLICT / OR REPLACE / OR IGNORE over keyed temp
    tables (compiler._insert_with_keys → the MERGE executor)."""

    @pytest.fixture()
    def keyed(self, psql):
        psql.sql("create or replace temp table oc_t (i int primary key, v varchar)")
        psql.sql("insert into oc_t values (1, 'a'), (2, 'b')")
        return psql

    def test_pk_enforced(self, keyed):
        with pytest.raises(PsqlCompileError, match="Constraint Error"):
            keyed.sql("insert into oc_t values (1, 'dup')")
        with pytest.raises(PsqlCompileError, match="Constraint Error"):
            keyed.sql("insert into oc_t values (7, 'x'), (7, 'y')")

    def test_do_update(self, keyed):
        r = keyed.sql(
            "insert into oc_t values (1, 'u'), (3, 'c') "
            "on conflict do update set v = excluded.v"
        )
        assert r.collect()[0][0] == 2
        assert _state(keyed, "oc_t") == [(1, "u"), (2, "b"), (3, "c")]

    def test_do_nothing_and_shorthands(self, keyed):
        assert keyed.sql(
            "insert into oc_t values (1, 'z'), (4, 'd') on conflict do nothing"
        ).collect()[0][0] == 1
        assert keyed.sql(
            "insert or replace into oc_t values (2, 'B')"
        ).collect()[0][0] == 1
        assert keyed.sql(
            "insert or ignore into oc_t values (2, 'n'), (5, 'e')"
        ).collect()[0][0] == 1
        assert _state(keyed, "oc_t") == [
            (1, "a"), (2, "B"), (4, "d"), (5, "e"),
        ]

    def test_conditional_update(self, keyed):
        r = keyed.sql(
            "insert into oc_t values (1, 'A2'), (2, 'B2') "
            "on conflict (i) do update set v = excluded.v where oc_t.v = 'a'"
        )
        assert r.collect()[0][0] == 1  # only the row whose old v was 'a'
        assert _state(keyed, "oc_t") == [(1, "A2"), (2, "b")]

    def test_conflict_requires_keys(self, psql):
        psql.sql("create or replace temp table oc_nokey as select 1 as i")
        with pytest.raises(PsqlCompileError, match="no PRIMARY KEY"):
            psql.sql("insert into oc_nokey values (2) on conflict do nothing")
        # explicit conflict target works without a declared key
        assert psql.sql(
            "insert into oc_nokey values (1), (2) on conflict (i) do nothing"
        ).collect()[0][0] == 1

    def test_replace_drops_keys(self, keyed):
        keyed.sql("create or replace temp table oc_t as select 9 as i")
        # no constraint anymore: duplicate insert is a plain append
        keyed.sql("insert into oc_t values (9)")
        assert [r[0] for r in keyed.sql("select * from oc_t order by i").collect()] == [9, 9]


def test_equi_merge_dedups_source_not_target(psql):
    """Pure equi-conjunct ON conditions dedup the SOURCE by join key
    (small shuffle) instead of windowing the whole target — same
    first-by-source-order semantics, exercised with duplicate source
    keys; non-equi conditions keep the target-window path."""
    psql.sql("create or replace temp table eq_t as select * from (values (1, 0), (2, 0)) v(i, v)")
    psql.sql("create or replace temp table eq_s as select * from (values (1, 9), (1, 8)) v(i, nv)")
    r = psql.sql(
        "merge into eq_t using eq_s on eq_t.i = eq_s.i "
        "when matched then update set v = eq_s.nv"
    )
    assert r.collect()[0][0] == 1
    assert _state(psql, "eq_t") == [(1, 9), (2, 0)]
    # non-equi: target-window fallback, still updates once
    psql.sql("create or replace temp table eq_t2 as select * from (values (1, 0)) v(i, v)")
    r2 = psql.sql(
        "merge into eq_t2 using eq_s on eq_t2.i <= eq_s.i "
        "when matched then update set v = v + 1"
    )
    assert r2.collect()[0][0] == 1
    assert _state(psql, "eq_t2") == [(1, 1)]


def test_returning_all_actions(merged):
    """RETURNING with every clause kind: post-image rows for UPDATE and
    INSERT, pre-image for DELETE, merge_action tags each (DuckDB 1.4
    documented semantics, hand-computed — the 1.0 oracle predates MERGE)."""
    r = merged.sql(
        """merge into m_t using m_s on m_t.i = m_s.i
        when matched and m_s.i = 3 then delete
        when matched then update set v = m_s.nv
        when not matched then insert values (m_s.i, m_s.nv)
        returning merge_action, *"""
    )
    rows = sorted(map(tuple, r.collect()), key=lambda t: (t[0], t[1]))
    assert r.columns == ["merge_action", "i", "v"]
    assert rows == [
        ("DELETE", 3, 30),       # pre-image of the deleted row
        ("INSERT", 5, 99),
        ("INSERT", 6, 99),
        ("UPDATE", 4, 99),       # post-image of the updated row
    ]
    # the table mutation still happened exactly as without RETURNING
    assert _state(merged, "m_t") == [
        (0, 0), (1, 10), (2, 20), (4, 99), (5, 99), (6, 99),
    ]


def test_returning_expressions(merged):
    r = merged.sql(
        "merge into m_t using m_s on m_t.i = m_s.i "
        "when matched then update set v = m_s.nv "
        "returning i + 100 as i2, v * 2 as v2"
    )
    assert r.columns == ["i2", "v2"]
    assert sorted(map(tuple, r.collect())) == [(103, 198), (104, 198)]


def test_returning_empty_affected_set(psql):
    psql.sql(
        "create or replace temp table m_e as select * from (values (1, 1)) v(i, v)"
    )
    psql.sql(
        "create or replace temp table m_es as select * from "
        "(values (9, 9)) v(i, nv)"
    )
    r = psql.sql(
        "merge into m_e using m_es on m_e.i = m_es.i "
        "when matched then delete returning merge_action, i"
    )
    assert r.columns == ["merge_action", "i"]
    assert r.collect() == []


class TestOnConflictReturning:
    """INSERT … ON CONFLICT … RETURNING (round-10, VERDICT r9 #5): the
    last loud DML combination — RETURNING rides the MERGE executor's
    tail, returning the post-image of rows actually written (inserted
    plus DO-UPDATE-hit; DO-NOTHING-skipped conflicts excluded)."""

    @pytest.fixture()
    def keyed(self, psql):
        psql.sql(
            "create or replace temp table ocr_t (i int primary key, v varchar)"
        )
        psql.sql("insert into ocr_t values (1, 'a'), (2, 'b')")
        return psql

    def test_do_update_returning(self, keyed):
        ret = keyed.sql(
            "insert into ocr_t values (1, 'u'), (3, 'c') "
            "on conflict do update set v = excluded.v "
            "returning i, v"
        ).collect()
        assert sorted(tuple(r) for r in ret) == [(1, "u"), (3, "c")]
        assert _state(keyed, "ocr_t") == [(1, "u"), (2, "b"), (3, "c")]

    def test_do_nothing_returning_only_inserted(self, keyed):
        ret = keyed.sql(
            "insert into ocr_t values (1, 'z'), (4, 'd') "
            "on conflict do nothing returning *"
        ).collect()
        assert [tuple(r) for r in ret] == [(4, "d")]
        assert ret[0].asDict().keys() == {"i", "v"}
        assert _state(keyed, "ocr_t") == [(1, "a"), (2, "b"), (4, "d")]

    def test_conditional_update_returning(self, keyed):
        # only the conflict row whose OLD v = 'a' is written; the other
        # conflicting row is skipped and must not appear in RETURNING
        ret = keyed.sql(
            "insert into ocr_t values (1, 'A2'), (2, 'B2'), (9, 'i') "
            "on conflict (i) do update set v = excluded.v "
            "where ocr_t.v = 'a' returning i, v"
        ).collect()
        assert sorted(tuple(r) for r in ret) == [(1, "A2"), (9, "i")]
        assert _state(keyed, "ocr_t") == [(1, "A2"), (2, "b"), (9, "i")]

    def test_or_replace_returning(self, keyed):
        ret = keyed.sql(
            "insert or replace into ocr_t values (2, 'B') returning i, v"
        ).collect()
        assert [tuple(r) for r in ret] == [(2, "B")]

    def test_plain_keyed_insert_returning(self, keyed):
        ret = keyed.sql(
            "insert into ocr_t values (7, 'g') returning i * 10 as d"
        ).collect()
        assert [tuple(r) for r in ret] == [(70,)]
