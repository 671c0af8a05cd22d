"""contamination_check (operators/text.py) + pipe verb."""


def test_contamination_flags_probe_members(spark, sf_dir):
    from duckdb_psql_spark.operators.text import contamination_check

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probes = docs.where("doc_id % 25 = 0")
    out = contamination_check(docs, probes, shingle_k=5, min_overlap=0.5)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == docs.count()
    # every probe doc is 100% contaminated with itself
    for pid in [r.doc_id for r in probes.select("doc_id").collect()]:
        assert rows[pid].contaminated
        assert rows[pid].overlap_scaled == 10000
        assert rows[pid].n_hit == rows[pid].n_grams
    # and not everything is flagged
    assert sum(1 for r in rows.values() if r.contaminated) < len(rows)


def test_contamination_broadcast_plan(spark, sf_dir):
    from duckdb_psql_spark.operators.text import contamination_check

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probes = docs.where("doc_id % 25 = 0")
    out = contamination_check(docs, probes, shingle_k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # probe grams broadcast: the corpus side never shuffles gram strings
    assert "BroadcastHashJoin" in plan
    assert "PythonUDF" not in plan  # codegen end to end


def test_contamination_pipe_verb(psql, sf_dir):
    df = psql.sql(
        f"from '{sf_dir}/documents.parquet' |>"
        f" contamination '{sf_dir}/documents.parquet' k=5 threshold=0.9 |>"
        " where contaminated |> select count() as n"
    )
    # probing against the full corpus: every doc fully overlaps itself
    assert df.collect()[0].n == 500


def test_normalize_text_unicode_nfc(psql, spark):
    # decomposed e + combining acute vs precomposed é; NBSP; case; runs
    df = spark.createDataFrame(
        [(1, "Café  DU  MONDE"), (2, "café du monde")],
        "doc_id long, text string",
    )
    from duckdb_psql_spark.operators.text import normalize_text

    out = {r.doc_id: r.text for r in normalize_text(df, "text").collect()}
    assert out[1] == "café du monde"
    # NBSP is \s in Java regex? No — keep NBSP expectation explicit:
    # collapse only folds runs of whitespace; NBSP is not Java \s, so
    # doc 2 keeps its NBSP separators after NFC+lower
    assert out[2] == "café du monde"


def test_normalize_pipe_verb(psql, sf_dir):
    rows = psql.sql(
        f"from '{sf_dir}/documents.parquet' |> normalize text punct=true |>"
        " select doc_id, text |> order by doc_id |> limit 3"
    ).collect()
    assert all(r.text == r.text.lower() for r in rows)
    assert all("," not in r.text and "." not in r.text for r in rows)


def test_contamination_on_a_stream(spark, sf_dir, tmp_path):
    """Continuous decontamination: the probe side is a static broadcast
    relation, the corpus side a file stream — Spark's stream-static join
    runs the same per-microbatch plan, so an ingest pipeline can drop
    contaminated documents as they arrive. Stateless (no watermark needed:
    every document is scored independently against the static probes)."""
    from duckdb_psql_spark.operators.text import contamination_check

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probes = docs.where("doc_id % 25 = 0")
    expected = {
        r.doc_id
        for r in contamination_check(docs, probes, shingle_k=5).collect()
        if r.contaminated
    }

    src = str(tmp_path / "src")
    docs.write.mode("overwrite").parquet(src)  # readStream needs a directory
    stream = spark.readStream.schema(docs.schema).parquet(src)
    flagged = contamination_check(stream, probes, shingle_k=5).where("contaminated")
    out = str(tmp_path / "out")
    (
        flagged.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert got == expected and got
