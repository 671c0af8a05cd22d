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
    # r7 sixth batch: GLOB operator, COLLATE NOCASE comparison folding,
    # first-match-only 3-arg regexp_replace, case-insensitive flags
    ("o_orderpriority glob '[12]-*'", "o_orderpriority GLOB '[12]-*'"),
    ("o_orderstatus = 'f' collate nocase", "o_orderstatus = 'f' COLLATE NOCASE"),
    ("regexp_replace(o_orderpriority, '[A-Z]', 'x') like '%x%'",
     "regexp_replace(o_orderpriority, '[A-Z]', 'x') LIKE '%x%'"),
    ("regexp_matches(o_orderpriority, 'urgent|high', 'i')",
     "regexp_matches(o_orderpriority, 'urgent|high', 'i')"),
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
    # r6: per-row int-cast rounding (the branchless floor rewrite) under
    # randomized pressure — DuckDB casts double→int with ties away from
    # zero, summed exactly as integers on both sides
    ("sum(cast(o_totalprice as bigint)) as sum_cast_int",
     "CAST(sum(CAST(o_totalprice AS BIGINT)) AS BIGINT) AS sum_cast_int"),
    ("sum(cast(round(o_totalprice * 100, 0) as bigint)) as sum_cents",
     "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents"),
    # r7 (ADVICE r6): int cast of an UNHINTED decimal arithmetic expression
    # — bigint * decimal literal stays DECIMAL in DuckDB, so .5 ties cast
    # away from zero; _decimal_arith_expr must pick away-mode, not rint
    ("sum(cast(o_orderkey * 1.5 as bigint)) as sum_dec_cast",
     "CAST(sum(CAST(o_orderkey * 1.5 AS BIGINT)) AS BIGINT) AS sum_dec_cast"),
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


# --- curation-verb pipelines (round-6: the r5 surface under the same
# randomized differential pressure as filter/agg/join/window) -------------
#
# Shape: [normalize(lower?, punct?)] -> [plant-PII + redact] -> terminal in
# {none, chunk(size, overlap), cap(n), repetition}; repetition composes
# only with normalize (its oracle owns the text column end-to-end).
# Every stage has an exact DuckDB twin layered as a nested subquery, using
# the same conventions as the proven x_normalize / x_redact_pii /
# x_chunk_text / x_cap_per_group / x_repetition inventory entries.

_PLANT_PII = (
    "text || ' mail user' || doc_id || '@example.com ip 10.0.' || "
    "(doc_id % 256) || '.7 call +1 555-000-' || (1000 + doc_id % 9000)"
)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+?\d[\d \-]{7,}\d"


@st.composite
def curation_pipelines(draw):
    terminal = draw(st.sampled_from(["none", "chunk", "cap", "repetition"]))
    norm = draw(st.booleans())
    lower = draw(st.booleans()) if norm else True
    punct = draw(st.booleans()) if norm else False
    redact = draw(st.booleans()) if terminal != "repetition" else False
    size, overlap = draw(st.sampled_from([(20, 0), (20, 5), (50, 10)]))
    capn = draw(st.sampled_from([1, 3, 5]))
    return norm, lower, punct, redact, terminal, size, overlap, capn


def render_curation(pipe, sf_dir):
    norm, lower, punct, redact, terminal, size, overlap, capn = pipe
    psql = [f"from '{sf_dir}/documents.parquet'"]
    layer = "SELECT doc_id, source, text FROM documents"
    if norm:
        psql.append(
            f"normalize lower={str(lower).lower()} punct={str(punct).lower()}"
        )
        expr = "nfc_normalize(text)"
        if lower:
            expr = f"lower({expr})"
        if punct:
            expr = f"regexp_replace({expr}, '[^\\pL\\pN\\s]', '', 'g')"
        expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
        layer = f"SELECT doc_id, source, {expr} AS text FROM ({layer})"
    extra_cols = ""
    if redact:
        psql.append(f"select doc_id, source, {_PLANT_PII} as text")
        psql.append("redact")
        layer = f"SELECT doc_id, source, {_PLANT_PII} AS text FROM ({layer})"
        red = (
            f"regexp_replace(regexp_replace(regexp_replace(text, "
            f"'{_PII_EMAIL}', '[EMAIL]', 'g'), "
            f"'{_PII_IP}', '[IP]', 'g'), "
            f"'{_PII_PHONE}', '[PHONE]', 'g')"
        )
        layer = (
            f"SELECT doc_id, source, "
            f"len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email, "
            f"len(regexp_extract_all(text, '{_PII_IP}')) AS n_ip, "
            f"len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone, "
            f"{red} AS text FROM ({layer})"
        )
        extra_cols = ", n_email, n_ip, n_phone"
    if terminal == "chunk":
        step = size - overlap
        psql.append(f"chunk size={size} overlap={overlap}")
        psql.append("select doc_id, chunk_idx, md5(chunk) as h, length(chunk) as n")
        psql.append("order by doc_id, chunk_idx")
        sql = (
            f"SELECT doc_id, chunk_idx, "
            f"md5(array_to_string(w[chunk_idx*{step}+1:chunk_idx*{step}+{size}], ' ')) AS h, "
            f"length(array_to_string(w[chunk_idx*{step}+1:chunk_idx*{step}+{size}], ' ')) AS n "
            f"FROM (SELECT doc_id, unnest(generate_series(0, "
            f"greatest(CAST(ceil((len(w) - {overlap}) / {step}.0) AS INT), 1) - 1)) AS chunk_idx, w "
            f"FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w "
            f"FROM ({layer}))) ORDER BY doc_id, chunk_idx"
        )
    elif terminal == "cap":
        psql.append(f"cap by source n={capn} order=doc_id")
        psql.append(f"select doc_id, source, md5(text) as h{extra_cols}")
        psql.append("order by doc_id")
        sql = (
            f"SELECT doc_id, source, md5(text) AS h{extra_cols} FROM ({layer}) "
            f"QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= {capn} "
            f"ORDER BY doc_id"
        )
    elif terminal == "repetition":
        psql.append("select doc_id, replace(text, ' the ', chr(10)) as text")
        psql.append("repetition")
        psql.append(
            "select doc_id, cast(n_lines as bigint) as n_lines, "
            "cast(round(dup_line_frac * 10000, 0) as bigint) as dup_line_bp, "
            "n_grams, top_gram_n, "
            "cast(round(top_ngram_frac * 10000, 0) as bigint) as top_gram_bp"
        )
        psql.append("order by doc_id")
        sql = f"""
        WITH src AS (
          SELECT doc_id, replace(text, ' the ', chr(10)) AS text FROM ({layer})),
        l AS (
          SELECT doc_id, string_split(text, chr(10)) AS ls,
                 string_split_regex(lower(trim(text)), '\\s+') AS w
          FROM src),
        g AS (
          SELECT doc_id, CASE WHEN len(w) < 2 THEN []
            ELSE list_transform(generate_series(1, len(w) - 1),
                                i -> array_to_string(w[i:i+1], ' ')) END AS grams
          FROM l),
        e AS (SELECT doc_id, unnest(grams) AS g1 FROM g),
        c AS (SELECT doc_id, g1, count(*) AS c FROM e GROUP BY doc_id, g1),
        topg AS (SELECT doc_id, max(c) AS top_gram_n,
                        CAST(sum(c) AS BIGINT) AS n_grams
                 FROM c GROUP BY doc_id)
        SELECT l.doc_id, len(l.ls) AS n_lines,
          CAST(round(((len(l.ls) - len(list_distinct(l.ls)))
                      / greatest(len(l.ls), 1)) * 10000, 0) AS BIGINT) AS dup_line_bp,
          coalesce(t.n_grams, 0) AS n_grams,
          coalesce(t.top_gram_n, 0) AS top_gram_n,
          CAST(round((coalesce(t.top_gram_n, 0)
                      / greatest(coalesce(t.n_grams, 0), 1)) * 10000, 0) AS BIGINT)
            AS top_gram_bp
        FROM l LEFT JOIN topg t USING (doc_id) ORDER BY doc_id
        """
    else:
        psql.append(f"select doc_id, md5(text) as h, length(text) as n{extra_cols}")
        psql.append("order by doc_id")
        sql = (
            f"SELECT doc_id, md5(text) AS h, length(text) AS n{extra_cols} "
            f"FROM ({layer}) ORDER BY doc_id"
        )
    return " |> ".join(psql), sql


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


def _check_texts(psql_session, con, psql_text, sql):
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


def check_one_curation(psql_session, con, pipe, sf_dir):
    psql_text, sql = render_curation(pipe, sf_dir)
    _check_texts(psql_session, con, psql_text, sql)


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


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(curation_pipelines())
def test_random_curation_pipeline_matches_duckdb(engines, sf_dir, pipe):
    psql_session, con = engines
    con.execute(
        f"CREATE VIEW IF NOT EXISTS documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    check_one_curation(psql_session, con, pipe, sf_dir)
