"""Demo: analytics + training-data pipeline in piped SQL on Spark.

Run: python examples/demo.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_psql_spark import PsqlSession, default_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = default_spark(app_name="psql-spark-demo")
    psql = PsqlSession(spark)

    print("== Top customers by revenue (joins + agg + top-k) ==")
    psql.sql(f"""
        from '{SF}/customer.parquet' |>
        as c join '{SF}/orders.parquet' as o on c.c_custkey = o.o_custkey |>
        select c_name, round(sum(o_totalprice), 2) as revenue, count() as n_orders
          group by c_name |>
        order by revenue desc |>
        limit 5
    """).show(truncate=False)

    print("== Monthly order volume (window over time) ==")
    psql.sql(f"""
        from '{SF}/orders.parquet' |>
        select cast(date_trunc('month', o_orderdate) as date) as month,
               count() as n group by month |>
        select month, n,
               n - lag(n, 1) over (order by month) as mom_change |>
        order by month |> limit 6
    """).show()

    print("== Training-data pipeline: dedup -> lang -> quality -> tokens -> split ==")
    curated = psql.sql(f"""
        from '{SF}/documents.parquet' |>
        dedup by text keep doc_id |>
        lang_id |>
        where lang_pred = 'en' |>
        quality_score |>
        where quality_score > 0.5 |>
        token_count |>
        hash_split key=doc_id train=0.9 val=0.05 test=0.05 |>
        select doc_id, round(quality_score, 3) as quality, n_tokens, split
    """)
    curated.show(5)
    psql.sql(f"""
        from '{SF}/documents.parquet' |>
        dedup by text keep doc_id |> hash_split key=doc_id |>
        select split, count() as n group by split |> order by split
    """).show()

    print("== Near-duplicate mining (MinHash LSH) ==")
    psql.sql(f"""
        from '{SF}/documents.parquet' |>
        minhash_dedup id=doc_id text=text num_perm=64 bands=16 threshold=0.4 |>
        order by jaccard_est desc |> limit 5
    """).show()

    out = tempfile.mkdtemp(prefix="psql_demo_") + "/curated.parquet"
    psql.sql(f"""
        copy (from '{SF}/documents.parquet' |> dedup by text keep doc_id |> token_count)
        to '{out}' (format parquet)
    """)
    print(f"wrote curated set: {spark.read.parquet(out).count()} rows at {out}")

    print("== Similarity search (knn pipe verb, Arrow-vectorized) ==")
    psql.sql(f"from '{SF}/embeddings.parquet' |> knn query_id=0 k=5").show()

    print("== DuckDB literals: structs, maps, comprehensions, slicing ==")
    psql.sql("""
        select {'name': 'demo', 'version': 4}.name as engine,
               map {'a': 1, 'b': 2}['b'][1] as map_hit,
               [x * x for x in [1,2,3,4] if x % 2 = 0] as even_squares,
               'piped sql on spark'[1:5] as sliced,
               gcd(84, 36) as g
    """).show(truncate=False)

    print("== INSERT INTO (append to a view, read back) ==")
    psql.sql(f"""create or replace temp view top_nations as
                 (| from '{SF}/nation.parquet' |> where n_nationkey < 3
                    |> select n_nationkey, n_name |)""")
    psql.sql("insert into top_nations values (99, 'ATLANTIS')")
    psql.sql("from top_nations |> order by n_nationkey").show()

    print("== Multimodal: real PNG decode (pure-stdlib codec) ==")
    from duckdb_psql_spark.operators.multimodal import synthetic_media

    media_path = tempfile.mkdtemp(prefix="psql_demo_") + "/media.parquet"
    synthetic_media(spark, 12).write.mode("overwrite").parquet(media_path)
    psql.sql(f"from '{media_path}' |> media_decode |> order by media_id").show()


    print("== Round-5 surface: macros, normalization, cluster dedup ==")
    psql.sql("create or replace macro disc_price(p, d) as p * (1 - d)")
    psql.sql(f"""
        from '{SF}/lineitem.parquet' |>
        select l_returnflag, round(sum(disc_price(l_extendedprice, l_discount)), 2)
               as net group by l_returnflag |> order by l_returnflag
    """).show()

    psql.sql(f"""
        from '{SF}/documents.parquet' |>
        normalize text punct=true |>
        dedup_canonical id=doc_id text=text threshold=0.4 |>
        select count() as docs_after_cluster_dedup
    """).show()

    psql.sql(f"""
        prepare doc_probe as from '{SF}/documents.parquet' |>
        contamination '{SF}/documents.parquet' k=$1 threshold=$2 |>
        where contaminated |> select count() as contaminated_docs
    """)
    psql.sql("execute doc_probe(5, 0.9)").show()

    print("== DML: keyed temp table, upsert, MERGE (round-7 surface) ==")
    psql.sql("create or replace temp table watchlist (c_custkey bigint primary key, tag varchar)")
    psql.sql("insert into watchlist values (1, 'new'), (2, 'new')")
    psql.sql(
        "insert into watchlist values (2, 'seen'), (3, 'new') "
        "on conflict do update set tag = excluded.tag"
    )
    psql.sql(f"""
        merge into watchlist using (
          select c_custkey from '{SF}/customer.parquet' where c_acctbal > 9900
        ) hot on watchlist.c_custkey = hot.c_custkey
        when matched then update set tag = 'hot'
        when not matched then insert values (hot.c_custkey, 'hot')
    """).show()
    psql.sql("from watchlist |> order by c_custkey |> limit 5").show()

    print("== Introspection ==")
    psql.sql(
        "select table_name, temporary, has_primary_key, column_count "
        "from duckdb_tables() order by table_name"
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
