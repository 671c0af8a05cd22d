"""EXPORT DATABASE / IMPORT DATABASE round-trip (compiler.py)."""


def test_export_import_roundtrip(psql, sf_dir, tmp_path):
    out = str(tmp_path / "dbdump")
    psql.sql(
        f"create or replace temp view exp_nations as (| from '{sf_dir}/nation.parquet' |>"
        " where n_nationkey < 6 |> select n_nationkey, n_name |)"
    )
    psql.sql(
        "create or replace temp view exp_counts as (| from exp_nations |>"
        " select count() as n |)"
    )
    exported = {r.exported for r in psql.sql(f"export database '{out}'").collect()}
    assert {"exp_nations", "exp_counts"} <= exported
    assert "_pyspark_" not in "".join(exported)

    psql.spark.catalog.dropTempView("exp_nations")
    psql.spark.catalog.dropTempView("exp_counts")
    imported = {r.imported for r in psql.sql(f"import database '{out}'").collect()}
    assert {"exp_nations", "exp_counts"} <= imported
    rows = psql.sql("from exp_nations |> order by n_nationkey").collect()
    assert [r.n_nationkey for r in rows] == [0, 1, 2, 3, 4, 5]
    assert psql.sql("from exp_counts").collect()[0].n == 6
    psql.spark.catalog.dropTempView("exp_nations")
    psql.spark.catalog.dropTempView("exp_counts")


def test_export_csv_format(psql, sf_dir, tmp_path):
    out = str(tmp_path / "dbcsv")
    psql.sql(
        f"create or replace temp view exp_csv_v as (| from '{sf_dir}/region.parquet' |>"
        " select r_regionkey, r_name |)"
    )
    psql.sql(f"export database '{out}' (format csv)")
    psql.spark.catalog.dropTempView("exp_csv_v")
    psql.sql(f"import database '{out}'")
    assert psql.sql("from exp_csv_v").count() == 5
    psql.spark.catalog.dropTempView("exp_csv_v")


def test_export_csv_falls_back_to_parquet_for_complex_types(psql, tmp_path):
    """`export database (format csv)` with an array/struct-typed view:
    that relation falls back to parquet (recorded per-table in the
    manifest) and round-trips exactly instead of failing the export."""
    out = str(tmp_path / "dbcsvc")
    psql.spark.sql(
        "select 1 as id, array(1,2) as la, named_struct('a', 'x') as st"
    ).createOrReplaceTempView("exp_complex_v")
    psql.sql(
        "create or replace temp view exp_plain_v as (| from exp_complex_v |>"
        " select id |)"
    )
    exported = {r.exported for r in psql.sql(f"export database '{out}' (format csv)").collect()}
    assert {"exp_complex_v", "exp_plain_v"} <= exported
    import json

    with open(f"{out}/manifest.json") as f:
        manifest = json.load(f)
    assert manifest["tables"]["exp_complex_v"]["format"] == "parquet"
    assert manifest["tables"]["exp_plain_v"]["format"] == "csv"
    psql.spark.catalog.dropTempView("exp_complex_v")
    psql.spark.catalog.dropTempView("exp_plain_v")
    psql.sql(f"import database '{out}'")
    row = psql.sql("from exp_complex_v").collect()[0]
    assert row.id == 1 and list(row.la) == [1, 2] and row.st.a == "x"
    psql.spark.catalog.dropTempView("exp_complex_v")
    psql.spark.catalog.dropTempView("exp_plain_v")


def test_export_survives_concurrently_rewritten_source(psql, tmp_path):
    """A relation whose underlying files are rewritten between catalog
    listing and export read (vanished part files -> FAILED_READ_FILE)
    must not kill the export: the exporter refreshes the stale file
    index and retries, exporting the NEW data (observed live in round 8:
    a concurrent pytest rewrote a bucketed twin mid-export)."""
    src = str(tmp_path / "mut_src")
    psql.spark.range(3).write.parquet(src)
    view_df = psql.spark.read.parquet(src)
    view_df.createOrReplaceTempView("exp_mut_v")
    view_df.count()  # pin the file index snapshot
    # rewrite in place: new part-file names, old ones vanish
    psql.spark.range(7).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "dbmut")
    exported = {
        r.exported for r in psql.sql(f"export database '{out}'").collect()
    }
    assert "exp_mut_v" in exported
    psql.spark.catalog.dropTempView("exp_mut_v")
    psql.sql(f"import database '{out}'")
    assert psql.sql("from exp_mut_v").count() == 7
    psql.spark.catalog.dropTempView("exp_mut_v")
