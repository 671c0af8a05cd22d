"""Demo: a raw-text → training-shards pipeline, end to end.

The full charter path in one runnable script: ingest raw text files,
score/filter/normalize, exact + near dedup, decontaminate against an
eval set, stratify the language mix, split train/val/test
deterministically, pack into token-budget shards, and write hive-laid
parquet. Every stage is a pipe verb or piped SQL — the plan stays
declarative (Catalyst prunes/pushes), and every step is the same code
path the differential suite value-checks against DuckDB.

Run: python examples/training_pipeline_demo.py [sf_dir]
     (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_psql_spark import PsqlSession, default_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = default_spark(app_name="psql-training-pipeline-demo")
    psql = PsqlSession(spark)
    work = tempfile.mkdtemp(prefix="psql_train_demo_")

    # 0. raw ingestion: dump a few documents as loose .txt files, then
    #    read them back as whole-file rows (distributed binaryFile)
    raw_dir = os.path.join(work, "raw")
    os.makedirs(raw_dir)
    for row in (
        psql.sql(f"from '{SF}/documents.parquet' |> select doc_id, text |> limit 8")
        .collect()
    ):
        with open(os.path.join(raw_dir, f"doc_{row.doc_id}.txt"), "w") as f:
            f.write(row.text)
    print("== Raw .txt ingestion (read_text) ==")
    psql.sql(f"""
        from read_text('{raw_dir}/*.txt') |>
        select parse_filename(filename) as fname, size,
               length(content) as n_chars |>
        order by fname |> limit 3
    """).show(truncate=False)

    # 1. curation over the documents table: HTML boilerplate strip
    #    (round 10 — the regex ingestion tier), quality signals,
    #    language id, normalization, repetition stats, PII redaction.
    #    The docs are plain text, so wrap a few in markup first to show
    #    the strip is a no-op on clean text and exact on wrapped text.
    print("== Curation: strip_html -> quality score -> filter -> redact ==")
    curated = psql.sql(f"""
        from '{SF}/documents.parquet' |>
        select doc_id, lang, source, n_chars,
          case when doc_id % 3 = 0
               then concat('<html><script>x()</script><p>', text, '</p></html>')
               else text end as text |>
        strip_html |>
        quality_score |>
        where quality_score > 0.2 |>
        redact |>
        select doc_id, lang, source, text, n_chars
    """)
    curated.createOrReplaceTempView("curated")
    print(f"curated rows: {curated.count()}")

    # 2. dedup: exact first, then MinHash-LSH near-dup with the
    #    connected-components closure picking one canonical doc per
    #    duplicate cluster
    print("== Dedup: exact + MinHash near-dup canonicalization ==")
    deduped = psql.sql("""
        from curated |>
        dedup by text |>
        dedup_canonical id=doc_id threshold=0.5
    """)
    deduped.createOrReplaceTempView("deduped")
    print(f"after dedup: {deduped.count()}")

    # 3. decontamination: flag anything sharing 8-gram overlap with a
    #    (stand-in) eval set, keep the clean rows
    eval_path = os.path.join(work, "evalset.parquet")
    psql.sql(f"""
        copy (from curated |> select text |> limit 2)
        to '{eval_path}' (format parquet)
    """)
    decon = psql.sql(
        f"from deduped |> contamination '{eval_path}' k=8 |> "
        "where not contaminated"
    )
    decon.createOrReplaceTempView("decon")

    # 3b. relevance + LM quality scoring (round-8 verbs): BM25 against a
    #     topical term set, and a bigram reference-LM score — the CCNet
    #     pattern of keeping only reference-like documents
    print("== BM25 relevance + reference-LM quality score ==")
    psql.sql(f"""
        from decon |> bm25 terms='table,hash,merge,window' |>
        order by bm25 desc |> select doc_id, round(bm25, 3) as bm25 |>
        limit 3
    """).show()
    psql.sql(f"""
        from decon |> lm_score '{SF}/documents.parquet' |>
        select cast(round(avg(lm_score), 3) as varchar) as mean_lm_score
    """).show()

    # 3c. round-9 verbs: exact duplicated-substring spans (Lee et al.
    #     ExactSubstr — cut boilerplate runs shared across docs) and
    #     DSIR importance weights against a target sample
    print("== ExactSubstr span cut + DSIR importance weights ==")
    psql.sql(
        "from decon |> strip_dup_spans k=6 |> "
        "select cast(sum(n_spans_cut) as varchar) as spans_cut"
    ).show()
    target_path = os.path.join(work, "dsir_target.parquet")
    psql.sql(f"""
        copy (from decon |> where lang = 'en' |> select doc_id, text |> limit 50)
        to '{target_path}' (format parquet)
    """)
    psql.sql(f"""
        from decon |> dsir '{target_path}' buckets=1024 |>
        order by dsir_weight desc |>
        select doc_id, round(dsir_weight, 2) as w |> limit 3
    """).show()

    # 3d. SemDeDup (round-9): semantic near-dup removal over the
    #     embedding space — cluster-bounded pairwise cosine; keep the
    #     lowest-id representative of each semantic duplicate group
    print("== SemDeDup: semantic dedup over embeddings ==")
    semkept = psql.sql(f"""
        from '{SF}/embeddings.parquet' |>
        semdedup id=vec_id vec=embedding threshold=0.97 clusters=8 |>
        where not is_semdup |>
        as sd join decon as d on sd.vec_id = d.doc_id |>
        select doc_id, lang, text
    """)
    semkept.createOrReplaceTempView("semkept")
    print(f"after semdedup: {semkept.count()}")

    # 3e. the contamination -> DSIR -> pack chain: DSIR weights over the
    #     decontaminated+semdeduped corpus select the most target-like
    #     half, which flows straight into splitting/packing below
    psql.sql(f"""
        create or replace temp table dsir_sel as (|
          from semkept |> dsir '{target_path}' buckets=1024 |>
          where dsir_weight >= 0 |> select doc_id
        |)
    """)
    selected = psql.sql("""
        from semkept |>
        as s semi join dsir_sel as w on s.doc_id = w.doc_id |>
        select doc_id, lang, text
    """)
    selected.createOrReplaceTempView("selected")
    print(f"DSIR-selected rows: {selected.count()}")

    # 3f. round-10 verbs: the published-rule filter pair (Gopher rules +
    #     C4 line filter), corpus-wide CCNet paragraph dedup, and the
    #     corpus vocabulary / per-doc tf-idf analysis
    print("== Gopher rules + C4 filter + CCNet paragraph dedup ==")
    psql.sql("""
        from selected |> gopher_quality |>
        select cast(sum(cast(gopher_pass as int)) as varchar) as n_pass,
               cast(count() as varchar) as n_total
    """).show()
    psql.sql("""
        from selected |>
        select doc_id, replace(text || ' merge end', ' merge ', '.' || chr(10)) as text |>
        c4_clean |> where c4_pass |>
        select doc_id, text_clean as text |>
        paragraph_dedup |>
        select cast(sum(n_kept) as varchar) as paras_kept,
               cast(sum(n_paragraphs) as varchar) as paras_in
    """).show()
    print("== Corpus vocabulary (bigrams) + per-doc tf-idf ==")
    psql.sql("from selected |> vocab ngram=2 k=3").show()
    psql.sql(
        "from selected |> tfidf k=1 |> order by score desc |> "
        "select doc_id, term, round(score, 2) as score |> limit 3"
    ).show()

    # 4. mix shaping: exact per-language proportions, deterministic
    print("== Stratified language mix (exact fractions, md5-ordered) ==")
    psql.sql("""
        from decon |> stratify by lang frac=0.8 id=doc_id |>
        select lang, count() as n group by lang |> order by lang
    """).show()

    # 5. deterministic split + token-budget packing + hive-laid write
    out_dir = os.path.join(work, "shards")
    psql.sql(f"""
        copy (
          from selected |>
          stratify by lang frac=0.8 id=doc_id |>
          hash_split key=doc_id train=0.9 val=0.05 test=0.05 |>
          token_count |>
          pack_bins key=doc_id tokens=n_tokens target=2000 |>
          select doc_id, lang, split, bin_id, n_tokens, text
        ) to '{out_dir}' (format parquet, partition_by (split))
    """)
    print("== Shards written (hive layout by split) ==")
    psql.sql(f"""
        from read_parquet('{out_dir}/*/*.parquet', hive_partitioning=true) |>
        select cast(split as varchar) as split, count() as docs,
               sum(n_tokens) as tokens, count(distinct bin_id) as bins
          group by split |>
        order by split
    """).show()

    print(f"(work dir: {work})")


if __name__ == "__main__":
    main()
