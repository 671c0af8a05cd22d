"""Scanner unit tests (SURVEY.md §5.2.2): stage/block splitting goldens.

Each behavior is pinned to the reference's observable rules:
whitespace-surrounded ``|>`` (/root/reference/src/psql_extension.cpp:34),
lazy non-nesting blocks (cpp:58), first-statement-only (cpp:87-89),
pass-through detection (cpp:76-79).
"""

from duckdb_psql_spark.scanner import (
    find_blocks,
    first_statement,
    has_psql_tokens,
    split_stages,
)


def test_split_basic():
    assert split_stages("from t1 |> order by i") == ["from t1", "order by i"]


def test_split_three_stages():
    assert split_stages("A |> B |> C") == ["A", "B", "C"]


def test_no_split_without_whitespace():
    # reference regex requires \s+ on both sides (cpp:34)
    assert split_stages("a|>b") == ["a|>b"]
    assert split_stages("a |>b") == ["a |>b"]
    assert split_stages("a|> b") == ["a|> b"]


def test_concat_operator_not_split():
    # psql.test:31-33
    q = "from t1 |> select i || ',' || j"
    assert split_stages(q) == ["from t1", "select i || ',' || j"]


def test_pipe_inside_string_not_split():
    # improvement over the reference (README.md:91 admits regex blindness)
    q = "from t1 |> select 'a |> b' as s"
    assert split_stages(q) == ["from t1", "select 'a |> b' as s"]


def test_pipe_inside_comment_not_split():
    q = "from t1 -- x |> y\n |> order by i"
    assert split_stages(q) == ["from t1 -- x |> y", "order by i"]


def test_pipe_inside_parens_not_split():
    q = "from t1 |> where i in (from t2 |> select i)"
    assert split_stages(q) == ["from t1", "where i in (from t2 |> select i)"]


def test_find_blocks_basic():
    blocks = find_blocks("create view v as (| from t1 |> select i |)")
    assert len(blocks) == 1
    assert blocks[0].body.strip() == "from t1 |> select i"


def test_find_blocks_multiple():
    # psql.test:45 — two blocks in one statement
    q = "with x as (| from t1 |> as foo |), y as (| from t1 |> as foo |) from x union from y"
    blocks = find_blocks(q)
    assert len(blocks) == 2
    assert blocks[0].body.strip() == "from t1 |> as foo"


def test_blocks_do_not_nest():
    # lazy regex semantics: first |) closes (README.md:91)
    blocks = find_blocks("(| a (| b |) c |)")
    assert len(blocks) == 1
    assert blocks[0].body.strip() == "a (| b"


def test_first_statement():
    assert first_statement("from t1 |> order by i;") == "from t1 |> order by i"
    assert first_statement("select 1; select 2") == "select 1"
    assert first_statement("select ';' as s; select 2") == "select ';' as s"


def test_has_psql_tokens():
    assert has_psql_tokens("from t1 |> order by i")
    assert has_psql_tokens("create table t as (| from t1 |)")
    assert not has_psql_tokens("select * from t1")
    assert not has_psql_tokens("select i || j from t1")
    assert not has_psql_tokens("select 'a |> b' from t1")


def test_strip_comments():
    from duckdb_psql_spark.lexer import strip_comments

    assert strip_comments("select 1 -- trailing\n+ 2") == "select 1 \n+ 2"
    # comments vanish; strings and quoted identifiers survive verbatim
    assert strip_comments("a /* gone */ b") == "a   b"
    assert strip_comments("select '--not a comment' as s") == "select '--not a comment' as s"
    assert strip_comments('select "a--b" from t') == 'select "a--b" from t'
    assert strip_comments("x -- eof comment") == "x  "


def test_scanner_fuzz_no_crashes():
    """Random garbage must produce PsqlParseError/PsqlCompileError (or
    parse fine) — never an unhandled internal exception type."""
    import random

    from duckdb_psql_spark.errors import PsqlCompileError, PsqlParseError
    from duckdb_psql_spark.scanner import first_statement, split_stages

    rng = random.Random(11)
    alphabet = list("abz019 '\"`(|)[]{}<>|>;:,.*-+/\\\n\t%")
    for _ in range(500):
        txt = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        try:
            stmt = first_statement(txt)
            if stmt:
                split_stages(stmt)
        except (PsqlParseError, PsqlCompileError):
            pass  # structured engine errors are fine
