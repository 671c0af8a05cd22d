"""Scale probe: run the extended operators on synthetic data 20-200x the
bench corpus to verify the scaling trajectory (near-linear signature cost,
no candidate-pair blowup, no driver funnels).

Usage: python scripts/scale_probe.py [n_docs] [n_vecs]
Prints one timing line per operator. Not part of the driver contract —
a development tool for the 100 TB design argument.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_VECS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_psql_spark.session import default_spark

    spark = default_spark(app_name="scale-probe")

    # synthetic docs: ~60 words drawn from a 5k vocab, seeded per row —
    # mostly unique with a 2% planted near-dup rate (doc i+1 copies doc i)
    vocab = 5000
    words_per_doc = 60
    base = spark.range(N_DOCS).withColumn(
        "words",
        F.transform(
            F.sequence(F.lit(1), F.lit(words_per_doc)),
            lambda j: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 1000 + j), F.lit(vocab))
            ),
        ),
    )
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.when(
            F.pmod(F.col("id"), 50) == 1,
            # near-dup of previous doc: same word seq with one word changed
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(words_per_doc)),
                    lambda j: F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64((F.col("id") - 1) * 1000 + j), F.lit(vocab)),
                    ),
                ),
            ),
        ).otherwise(F.concat_ws(" ", F.col("words"))).alias("text"),
    ).repartition(32).persist()
    print(f"docs: {docs.count()} rows", flush=True)

    from duckdb_psql_spark.operators.dedup import minhash_dup_pairs, simhash_dup_pairs

    t0 = time.perf_counter()
    pairs = minhash_dup_pairs(
        docs, id_col="doc_id", text_col="text", num_perm=64, bands=16,
        shingle_k=3, threshold=0.5,
    )
    n_pairs = pairs.count()
    print(f"minhash_dup_pairs n={N_DOCS}: {time.perf_counter()-t0:.1f}s, "
          f"{n_pairs} pairs", flush=True)

    t0 = time.perf_counter()
    s = simhash_dup_pairs(docs, id_col="doc_id", text_col="text", max_hamming=6)
    print(f"simhash_dup_pairs n={N_DOCS}: {time.perf_counter()-t0:.1f}s, "
          f"{s.count()} pairs", flush=True)

    from duckdb_psql_spark.operators.text import quality_score

    t0 = time.perf_counter()
    quality_score(docs).write.format("noop").mode("overwrite").save()
    print(f"quality_score n={N_DOCS}: {time.perf_counter()-t0:.1f}s", flush=True)

    # synthetic vectors, dim 64
    from duckdb_psql_spark.operators.similarity import knn_join

    vecs = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j: (F.pmod(F.xxhash64(F.col("id") * 100 + j), F.lit(2000)) / 1000.0 - 1.0),
        ).alias("embedding"),
    ).repartition(32).persist()
    vecs.count()
    qs = vecs.limit(8).selectExpr("vec_id as qid", "embedding")
    t0 = time.perf_counter()
    knn_join(qs, vecs, query_id="qid", corpus_id="vec_id",
             vec_col="embedding", k=10).write.format("noop").mode("overwrite").save()
    print(f"knn_join 8q x n={N_VECS}: {time.perf_counter()-t0:.1f}s", flush=True)

    from duckdb_psql_spark.operators.dedup import embedding_dup_pairs

    t0 = time.perf_counter()
    ep = embedding_dup_pairs(vecs, id_col="vec_id", vec_col="embedding",
                             threshold=0.9, planes=16, dim=64)
    print(f"embedding_dup_pairs n={N_VECS}: {time.perf_counter()-t0:.1f}s, "
          f"{ep.count()} pairs", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
