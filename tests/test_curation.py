"""Tests for the corpus-curation operators: repetition stats, PII
redaction, per-group caps (charter extended surface — no reference
analogue; differential twins live in inventory.py x_repetition /
x_redact_pii / x_cap_per_group)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def rep_docs(spark):
    return spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "one two three four five six"),
            (3, "a\nb\na\nb\na"),
            (4, "x"),
        ],
        "doc_id bigint, text string",
    )


def test_repetition_stats_values(rep_docs):
    from duckdb_psql_spark.operators.text import repetition_stats

    rows = {
        r["doc_id"]: r
        for r in repetition_stats(rep_docs, "text").collect()
    }
    # doc 1: grams = [spam spam] x3 -> top share 1.0
    assert rows[1]["n_grams"] == 3 and rows[1]["top_gram_n"] == 3
    assert rows[1]["top_ngram_frac"] == 1.0
    # doc 2: 5 distinct bigrams -> top share 1/5
    assert rows[2]["n_grams"] == 5 and rows[2]["top_gram_n"] == 1
    # doc 3: 5 lines, 2 distinct -> dup_line_frac 3/5
    assert rows[3]["n_lines"] == 5
    assert abs(rows[3]["dup_line_frac"] - 0.6) < 1e-12
    # doc 4: a single word has no bigrams (sequence() guard)
    assert rows[4]["n_grams"] == 0 and rows[4]["top_ngram_frac"] == 0.0


def test_repetition_no_python_in_plan(rep_docs):
    from duckdb_psql_spark.operators.text import repetition_stats

    plan = repetition_stats(rep_docs, "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redact_pii(spark):
    from duckdb_psql_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "write to bob.smith+x@corp.example.org today"),
            (2, "server at 192.168.0.12 port 80"),
            (3, "call +1 555-123-4567 now"),
            (4, "clean text, nothing to mask 1.2"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    assert rows[1]["n_email"] == 1 and "[EMAIL]" in rows[1]["text"]
    assert "bob" not in rows[1]["text"]
    assert rows[2]["n_ip"] == 1 and "[IP]" in rows[2]["text"]
    assert rows[3]["n_phone"] == 1 and "[PHONE]" in rows[3]["text"]
    assert rows[4]["n_email"] == rows[4]["n_ip"] == rows[4]["n_phone"] == 0
    assert rows[4]["text"] == "clean text, nothing to mask 1.2"


def test_cap_per_group(spark):
    from duckdb_psql_spark.operators.curate import cap_per_group

    df = spark.range(100).select(
        (F.col("id") % 4).alias("grp"), F.col("id").alias("doc_id")
    )
    out = cap_per_group(df, ["grp"], 3, "doc_id")
    assert out.count() == 12
    # lowest 3 doc_ids per group kept
    kept = sorted(r["doc_id"] for r in out.filter("grp = 1").collect())
    assert kept == [1, 5, 9]
    top = cap_per_group(df, ["grp"], 2, "doc_id", descending=True)
    kept = sorted(r["doc_id"] for r in top.filter("grp = 0").collect())
    assert kept == [92, 96]


def test_curation_pipe_verbs(psql, sf_dir):
    out = psql.sql(
        f"from '{sf_dir}/documents.parquet' |> cap by source n=2 order=doc_id"
    )
    counts = out.groupBy("source").count().collect()
    assert counts and all(r["count"] <= 2 for r in counts)

    red = psql.sql(
        f"""
        from '{sf_dir}/documents.parquet' |>
        select doc_id, text || ' x@y.io' as text |>
        redact |>
        where n_email = 1 |>
        select count() as n
        """
    ).collect()
    assert red[0]["n"] > 0

    rep = psql.sql(
        f"from '{sf_dir}/documents.parquet' |> repetition |> "
        "select doc_id, n_grams, top_ngram_frac |> order by doc_id |> limit 3"
    ).collect()
    assert len(rep) == 3 and rep[0]["n_grams"] > 0


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream equi-join drains to the same pairs as
    the identical predicate on batch inputs."""
    from duckdb_psql_spark.streaming.events import stream_stream_join

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def stream(etype):
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .select("event_id", "user_id", "ts", "event_type")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .filter(f"event_type = '{etype}'")
        )

    sj = stream_stream_join(
        stream("purchase"), stream("error"),
        on=["user_id"], within="30 minutes", watermark="1 hour",
    )
    assert sj.isStreaming
    q = (
        sj.writeStream.format("memory").queryName("ssj_stream")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.event_id, r.event_id_r)
        for r in spark.sql("select * from ssj_stream").collect()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    bj = stream_stream_join(
        ev.filter("event_type = 'purchase'"), ev.filter("event_type = 'error'"),
        on=["user_id"], within="30 minutes",
    )
    want = sorted((r.event_id, r.event_id_r) for r in bj.collect())
    assert got == want and len(got) > 0


def test_stream_stream_join_right_outer_keeps_keys(spark):
    """right_outer rows with no left match must keep the RIGHT row's key
    values (ADVICE r5: projecting only left[k] returned NULL keys and
    lost the right row's identity)."""
    from duckdb_psql_spark.streaming.events import stream_stream_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "l1")], "user_id int, ts string, lv string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:10:00", "r1"), (2, "2024-01-01 10:20:00", "r2")],
        "user_id int, ts string, rv string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = stream_stream_join(
        left, right, on=["user_id"], within="30 minutes", how="right_outer"
    )
    rows = {r.rv_r: r for r in out.collect()}
    assert set(rows) == {"r1", "r2"}
    # matched row: key from the left copy
    assert rows["r1"].user_id == 1 and rows["r1"].lv == "l1"
    # unmatched right row: key must come back 2, not NULL
    assert rows["r2"].user_id == 2 and rows["r2"].lv is None


def test_information_schema_views(psql, sf_dir):
    psql.spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView("region")
    rows = psql.sql(
        "from information_schema.tables |> where table_name = 'region' |> "
        "select table_name, table_type"
    ).collect()
    assert rows and rows[0]["table_type"] == "VIEW"
    cols = psql.sql(
        "from information_schema.columns |> where table_name = 'region' |> "
        "select column_name, ordinal_position, data_type |> order by ordinal_position"
    ).collect()
    assert cols[0]["ordinal_position"] == 1
    assert all(c["data_type"] in ("BIGINT", "INTEGER", "VARCHAR") for c in cols)


def test_attach_detach_use(psql, sf_dir):
    psql.sql(f"attach '{sf_dir}' as db1")
    n = psql.sql("from db1.region |> select count() as n").collect()[0]["n"]
    assert n > 0
    psql.sql("use db1")
    assert psql.sql("from supplier |> select count() as n").collect()[0]["n"] > 0
    psql.sql("detach db1")
    import pytest as _pytest

    from duckdb_psql_spark.errors import PsqlCompileError
    with _pytest.raises(Exception):
        psql.sql("from db1.region").collect()
    with _pytest.raises(PsqlCompileError):
        psql.sql("attach 'nope.duckdb' as z")


def test_chunk_text(spark, psql):
    from duckdb_psql_spark.operators.text import chunk_text

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(50))), (2, "short doc")],
        "doc_id bigint, text string",
    )
    out = chunk_text(df, "text", size=20, overlap=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 1
    assert by_doc[1][0]["chunk"].startswith("w0 ")
    assert by_doc[1][1]["chunk"].startswith("w15 ")
    # overlap: chunk 0's last 5 words == chunk 1's first 5
    assert by_doc[1][0]["chunk"].split()[-5:] == by_doc[1][1]["chunk"].split()[:5]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_text(df, "text", size=10, overlap=10)
    # verb path through the parser-conf-flipped session
    df.createOrReplaceTempView("chunk_src")
    n = psql.sql("from chunk_src |> chunk size=20 overlap=5").count()
    assert n == 4


def test_stratified_sample_exact_fraction(psql, spark, sf_dir):
    """stratify verb: exactly ceil(frac * |group|) rows per group, the
    SAME rows on every run (md5-order determinism), salt changes the
    draw but not the count."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sizes = {r["lang"]: r["n"] for r in base.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    q = (f"from '{sf_dir}/documents.parquet' |> stratify by lang frac=0.3 id=doc_id |> "
         "select lang, doc_id |> order by lang, doc_id")
    got = [tuple(r) for r in psql.sql(q).collect()]
    import math
    per = {}
    for lang, _ in got:
        per[lang] = per.get(lang, 0) + 1
    assert per == {k: math.ceil(0.3 * v) for k, v in sizes.items()}
    assert [tuple(r) for r in psql.sql(q).collect()] == got  # deterministic
    q2 = (f"from '{sf_dir}/documents.parquet' |> stratify by lang frac=0.3 id=doc_id salt=x |> "
          "select lang, doc_id |> order by lang, doc_id")
    got2 = [tuple(r) for r in psql.sql(q2).collect()]
    assert {l: sum(1 for g, _ in got2 if g == l) for l in per} == per
    assert got2 != got  # a different (still deterministic) draw


def test_weighted_mix_proportions_and_determinism(spark, sf_dir):
    """weighted_mix: exact 3:1 proportions at the feasibility bound,
    deterministic selection, and TakeOrderedAndProject (no global
    single-task sort) in the per-source plan."""
    from duckdb_psql_spark.operators.curate import weighted_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    en, rest = docs.filter("lang = 'en'"), docs.filter("lang <> 'en'")
    n_en, n_rest = en.count(), rest.count()
    mixed = weighted_mix({"en": en, "rest": rest}, {"en": 3, "rest": 1},
                         "doc_id", source_col="src")
    per = {r["src"]: r["n"] for r in mixed.groupBy("src").count().withColumnRenamed("count", "n").collect()}
    t = min(n_en / 0.75, n_rest / 0.25)
    assert per == {"en": int(round(0.75 * t)), "rest": int(round(0.25 * t))}
    ids = sorted(r.doc_id for r in mixed.select("doc_id").collect())
    again = weighted_mix({"en": en, "rest": rest}, {"en": 3, "rest": 1},
                         "doc_id", source_col="src")
    assert sorted(r.doc_id for r in again.select("doc_id").collect()) == ids
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_stratify_then_hash_split_independent(psql, sf_dir):
    """stratify and hash_split must use DOMAIN-SEPARATED hashes: both
    key on md5(doc_id), and without separation stratify's survivors
    (the low-hash rows) all land in the first split bucket (caught
    live: 100% train). With separation the split fractions hold."""
    q = (f"from '{sf_dir}/documents.parquet' |> "
         "stratify by lang frac=0.8 id=doc_id |> "
         "hash_split key=doc_id train=0.9 val=0.05 test=0.05 |> "
         "select split, count() as n group by split |> order by split")
    per = {r.split: r.n for r in psql.sql(q).collect()}
    total = sum(per.values())
    assert set(per) == {"train", "val", "test"}
    assert 0.8 < per["train"] / total < 0.97


def test_bm25_and_lm_score_verbs(psql, sf_dir):
    """The round-8 scoring verbs through the piped surface: bm25 ranks
    term-bearing docs above zero-match docs; lm_score is negative (log
    probs) and NULL for sub-bigram docs; both keep every input row."""
    docs = f"{sf_dir}/documents.parquet"
    n_docs = psql.sql(f"from '{docs}' |> select count() as n").collect()[0][0]
    out = psql.sql(
        f"from '{docs}' |> bm25 terms='table,hash' |> order by doc_id"
    ).collect()
    assert len(out) == n_docs
    assert any(r.bm25 > 0 for r in out) and all(r.bm25 >= 0 for r in out)
    lm = psql.sql(
        f"from '{docs}' |> lm_score '{docs}' |> order by doc_id"
    ).collect()
    assert len(lm) == n_docs
    scored = [r.lm_score for r in lm if r.lm_score is not None]
    assert scored and all(s < 0 for s in scored)


def test_strip_html(psql, spark):
    """strip_html (round 10): block-content removal, tag→space,
    entity decode, whitespace collapse — all codegen, value-pinned."""
    from duckdb_psql_spark.operators.text import strip_html

    df = spark.createDataFrame(
        [
            (1, "<html><script>var x=1;</script><p>Hello <b>world</b></p>"
                "<!-- hidden --><style>p{}</style>x &amp; y &lt;z&gt;</html>"),
            (2, "plain text, no markup"),
            (3, "<ul><li>one</li><li>two&nbsp;three</li></ul>"),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r.text for r in strip_html(df).collect()}
    assert rows[1] == "Hello world\nx & y <z>"
    assert rows[2] == "plain text, no markup"
    assert rows[3] == "one\ntwo three"
    # pipe verb spelling
    spark.createDataFrame(
        [(1, "<p>a</p>")], "doc_id int, text string"
    ).createOrReplaceTempView("html_t")
    out = psql.sql("from html_t |> strip_html |> select text").collect()
    assert out[0][0] == "a"
