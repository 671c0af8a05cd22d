"""Extended-operator tests: dedup, similarity, text, multimodal, asof."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 1
        (3, "completely different content about spark query engines and distributed joins"),
        (4, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (5, "der schnelle braune fuchs springt und ist nicht ein langsamer hund"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    from duckdb_psql_spark.operators.dedup import exact_dedup

    out = exact_dedup(docs, ["text"], tie_breaker="doc_id")
    kept = {r.doc_id for r in out.collect()}
    assert 1 in kept and 4 not in kept
    assert len(kept) == 4


def test_minhash_dup_pairs(docs):
    from duckdb_psql_spark.operators.dedup import minhash_dup_pairs

    pairs = minhash_dup_pairs(
        docs, id_col="doc_id", text_col="text", num_perm=64, bands=16, shingle_k=3
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 4) in found  # exact dup always collides
    assert (1, 2) in found  # near dup
    assert all(3 not in p for p in found)  # unrelated doc never pairs
    exact = next(r for r in pairs if (r.id_a, r.id_b) == (1, 4))
    assert exact.jaccard_est == 1.0


def test_minhash_md5_mode_matches_hashlib(spark, docs):
    import hashlib

    from duckdb_psql_spark.operators.dedup import minhash_dup_pairs, minhash_signatures

    sig = (
        minhash_signatures(
            docs.filter("doc_id = 1"), id_col="doc_id", text_col="text",
            num_perm=4, shingle_k=3, hash_mode="md5",
        )
        .collect()[0]
        .signature
    )
    words = "the quick brown fox jumps over the lazy dog near the river bank today".split()
    shingles = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
    expect = [
        min(hashlib.md5(f"{p}:{s}".encode()).hexdigest() for s in shingles)
        for p in range(4)
    ]
    assert list(sig) == expect

    # the pair path behaves like the xxhash64 mode on the same fixture
    pairs = minhash_dup_pairs(
        docs, id_col="doc_id", text_col="text", num_perm=32, bands=8,
        shingle_k=3, hash_mode="md5",
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 4) in found and (1, 2) in found
    assert all(3 not in p for p in found)


def test_simhash_md5_mode_matches_hashlib(spark, docs):
    import hashlib

    from duckdb_psql_spark.operators.dedup import simhash_dup_pairs, simhash_signatures

    one = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    got = simhash_signatures(
        one, id_col="doc_id", text_col="text", hash_mode="md5"
    ).collect()[0].simhash
    # single token: every tally is ±1, so the signature IS the token's
    # 64 hash bits (bit i = hex digit i//4 of md5, shifted by i%4)
    h = hashlib.md5(b"hello").hexdigest()
    expect = 0
    for i in range(64):
        if (int(h[i // 4], 16) >> (i % 4)) & 1:
            expect |= 1 << i
    if expect >= 1 << 63:
        expect -= 1 << 64  # signed 64-bit
    assert got == expect

    pairs = simhash_dup_pairs(
        docs, id_col="doc_id", text_col="text", max_hamming=3, hash_mode="md5"
    ).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found.get((1, 4)) == 0  # exact dup → identical simhash


def test_simhash_pairs(docs):
    from duckdb_psql_spark.operators.dedup import simhash_dup_pairs

    pairs = simhash_dup_pairs(docs, id_col="doc_id", text_col="text", max_hamming=6)
    found = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert found.get((1, 4)) == 0  # exact dup → identical simhash
    assert (1, 2) in found


def test_ngram_jaccard_verification(docs, spark):
    from duckdb_psql_spark.operators.dedup import minhash_dup_pairs, ngram_jaccard

    cand = minhash_dup_pairs(
        docs, id_col="doc_id", text_col="text", num_perm=64, bands=16, shingle_k=3, threshold=0.3
    )
    verified = ngram_jaccard(cand.select("id_a", "id_b"), docs, id_col="doc_id", text_col="text", shingle_k=3)
    rows = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert rows[(1, 4)] == 1.0
    assert 0.5 < rows[(1, 2)] < 1.0


@pytest.fixture(scope="module")
def vecs(spark):
    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(16)]
    rows = []
    for i in range(50):
        if i % 10 == 0:  # cluster near `base`
            v = [b + rng.gauss(0, 0.01) for b in base]
        else:
            v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_brute_force_topk(vecs):
    from duckdb_psql_spark.operators.similarity import brute_force_topk

    df, base = vecs
    top = brute_force_topk(df, base, id_col="vec_id", vec_col="embedding", k=5).collect()
    ids = [r.vec_id for r in top]
    assert set(ids[:5]) == {0, 10, 20, 30, 40}
    assert top[0].cosine > 0.99


def test_lsh_topk_recall(vecs):
    from duckdb_psql_spark.operators.similarity import lsh_topk

    df, base = vecs
    top = lsh_topk(df, base, id_col="vec_id", vec_col="embedding", k=5, planes=8, max_hamming=2).collect()
    ids = {r.vec_id for r in top}
    # approximate: cluster members dominate the candidates it does return
    assert ids & {0, 10, 20, 30, 40}


def test_embedding_dup_pairs(vecs):
    from duckdb_psql_spark.operators.dedup import embedding_dup_pairs

    df, _ = vecs
    pairs = embedding_dup_pairs(
        df, id_col="vec_id", vec_col="embedding", threshold=0.99, planes=8, dim=16
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 10) in found or (0, 20) in found or (10, 20) in found


def test_knn_join(vecs):
    from duckdb_psql_spark.operators.similarity import knn_join

    df, _ = vecs
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = knn_join(queries, df, query_id="qid", corpus_id="vec_id", vec_col="embedding", k=3)
    rows = out.collect()
    assert len(rows) == 6  # 2 queries × 3
    self_hits = [r for r in rows if r.qid == r.vec_id]
    assert all(r.rk == 1 for r in self_hits)  # self is nearest


def test_text_stats_and_quality(docs):
    from duckdb_psql_spark.operators.text import quality_score, with_text_stats

    out = with_text_stats(docs).collect()
    r1 = next(r for r in out if r.doc_id == 1)
    assert r1.n_words == 14
    assert 0 < r1.alpha_ratio < 1
    q = quality_score(docs).collect()
    assert all(0 <= r.quality_score <= 1 for r in q)


def test_lang_id(docs):
    from duckdb_psql_spark.operators.text import lang_id

    out = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert out[1] == "en"
    assert out[5] == "de"


def test_token_count(docs):
    from duckdb_psql_spark.operators.text import token_count

    out = {r.doc_id: r.n_tokens for r in token_count(docs).collect()}
    assert all(v > 10 for v in out.values())


def test_fingerprint(docs):
    from duckdb_psql_spark.operators.text import fingerprint

    out = {r.doc_id: (r.fp_md5, tuple(r.fp_sketch)) for r in fingerprint(docs).collect()}
    assert out[1][0] == out[4][0]  # exact dups share md5
    assert out[1][1] == out[4][1]
    assert out[1][0] != out[3][0]
    # near-dups share most of the sketch
    overlap = len(set(out[1][1]) & set(out[2][1]))
    assert overlap >= 4


def test_multimodal_plumbing(spark):
    from duckdb_psql_spark.operators.multimodal import (
        extract_features,
        metadata_stats,
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, 30)
    stats = metadata_stats(media).collect()
    assert {r.kind for r in stats} == {"image", "audio", "video"}
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 30 and all(r.feature_dim == 8 for r in feats)
    frames = sample_frames(media, every_ms=10000)
    assert frames.count() > 0


def test_multimodal_resize(spark):
    import numpy as np

    from duckdb_psql_spark.operators.multimodal import (
        MEDIA_SCHEMA, resize_image_row, resize_images, synthetic_media,
    )
    from duckdb_psql_spark.operators.png import decode_png, encode_png

    media = synthetic_media(spark, 30)
    out = resize_images(media, width=32, height=32).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images and n_images > 0
    assert all(r.width == 32 and r.height == 32 for r in out)
    # the kernel is REAL: every output payload decodes to 32x32 pixels
    for r in out:
        assert r.error is None
        d = decode_png(bytes(r.content))
        assert (d["width"], d["height"]) == (32, 32)
    # nearest-neighbor exactness: a 2x2 quadrant image upscaled to 4x4
    # replicates each quadrant into a 2x2 block
    quad = bytes([255, 0, 0, 0, 255, 0,   0, 0, 255, 255, 255, 0])
    payload = encode_png(2, 2, quad, color_type=2)
    rr = resize_image_row(payload, 4, 4)
    d = decode_png(rr["content"])
    px = np.frombuffer(d["pixels"], np.uint8).reshape(4, 4, 3)
    assert tuple(px[0, 0]) == (255, 0, 0) and tuple(px[0, 1]) == (255, 0, 0)
    assert tuple(px[0, 2]) == (0, 255, 0) and tuple(px[3, 3]) == (255, 255, 0)
    # corrupt payload: one error row, not a task death
    bad = spark.createDataFrame(
        [(9, "image", "png", b"\x13\x37 junk", None, None, None, 7)],
        MEDIA_SCHEMA,
    )
    r = resize_images(bad, width=8, height=8).collect()[0]
    assert r.content is None and r.error is not None


def test_multimodal_and_embedding_pipe_verbs(spark, psql, sf_dir, tmp_path):
    from duckdb_psql_spark.operators.multimodal import synthetic_media

    media_path = str(tmp_path / "media.parquet")
    synthetic_media(spark, 30).write.mode("overwrite").parquet(media_path)

    stats = psql.sql(f"from '{media_path}' |> media_stats").collect()
    assert {r.kind for r in stats} == {"image", "audio", "video"}

    rz = psql.sql(f"from '{media_path}' |> media_resize width=16 height=16").collect()
    assert len(rz) == 10 and all(r.width == 16 for r in rz)

    fr = psql.sql(
        f"from '{media_path}' |> frame_sample every_ms=20000 |> "
        "select media_id, count() as n group by media_id |> order by media_id"
    )
    assert fr.count() > 0

    feats = psql.sql(f"from '{media_path}' |> media_features dim=4").collect()
    assert len(feats) == 30 and all(r.feature_dim == 4 for r in feats)

    pairs = psql.sql(
        f"from '{sf_dir}/embeddings.parquet' |> "
        "embedding_dedup id=vec_id vec=embedding threshold=0.3 planes=6 |> "
        "order by id_a, id_b"
    )
    cols = pairs.columns
    assert cols == ["id_a", "id_b", "cosine"]
    assert all(r.cosine >= 0.3 for r in pairs.collect())


def test_hash_split(spark, psql, sf_dir):
    import hashlib

    from duckdb_psql_spark.operators.split import hash_split

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = hash_split(orders, "o_orderkey", splits={"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r.o_orderkey: r.split for r in out.select("o_orderkey", "split").collect()}
    n = len(rows)
    from collections import Counter

    c = Counter(rows.values())
    # fractions hold to a few percent on ~6k keys (binomial noise)
    assert abs(c["train"] / n - 0.8) < 0.05 and abs(c["val"] / n - 0.1) < 0.04

    # exact per-row check against hashlib with the same boundary strings
    b1 = format(int(0.8 * 16**32), "032x")
    b2 = format(int(0.9 * 16**32), "032x")
    for k, v in list(rows.items())[:200]:
        h = hashlib.md5(str(k).encode()).hexdigest()
        expect = "train" if h < b1 else ("val" if h < b2 else "test")
        assert v == expect, (k, h, v, expect)

    # stable under repartitioning; salt changes the family
    re_rows = {
        r.o_orderkey: r.split
        for r in hash_split(
            orders.repartition(7), "o_orderkey",
            splits={"train": 0.8, "val": 0.1, "test": 0.1},
        ).collect()
    }
    assert re_rows == rows
    salted = {
        r.o_orderkey: r.split
        for r in hash_split(
            orders, "o_orderkey", splits={"train": 0.8, "val": 0.1, "test": 0.1},
            salt="exp2",
        ).collect()
    }
    assert salted != rows

    # pipe verb surface
    v = psql.sql(
        f"from '{sf_dir}/orders.parquet' |> hash_split key=o_orderkey |> "
        "select split, count() as n group by split"
    ).collect()
    assert {r.split for r in v} <= {"train", "val", "test"}


def test_streaming_batch_equivalence(spark, sf_dir):
    from duckdb_psql_spark.sources.resolver import SourceResolver
    from duckdb_psql_spark.streaming import sessionize, stream_tumbling_counts

    events = SourceResolver(spark).resolve(f"{sf_dir}/events.parquet")
    agg = stream_tumbling_counts(events).collect()
    assert sum(r.n_events for r in agg) == events.count()
    sess = sessionize(events, gap="10 minutes")
    assert sess.count() > 0


def test_streaming_file_stream(spark, sf_dir, tmp_path):
    from duckdb_psql_spark.streaming.events import run_file_stream_demo

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_file_stream_demo(spark, f"{sf_dir}/events.parquet", out, ckpt)
    result = spark.read.parquet(out)
    assert result.count() > 0


def test_ivf_topk_recall(vecs):
    from duckdb_psql_spark.operators.similarity import brute_force_topk, ivf_assign, ivf_topk

    df, base = vecs
    q = [float(x) for x in df.filter("vec_id = 0").first()["embedding"]]
    assigned, centroids = ivf_assign(df, id_col="vec_id", vec_col="embedding", n_centroids=8)
    approx = ivf_topk(assigned, centroids, q, id_col="vec_id", vec_col="embedding", k=5, nprobe=4)
    exact = brute_force_topk(df, q, id_col="vec_id", vec_col="embedding", k=5)
    a_ids = {r.vec_id for r in approx.collect()}
    e_ids = {r.vec_id for r in exact.collect()}
    assert 0 in a_ids  # query itself found
    assert len(a_ids & e_ids) >= 3  # decent recall with nprobe=half the buckets


def test_ivf_recall_floor_and_full_probe_exactness(spark, sf_dir):
    """Quantified IVF quality on the real embeddings table: sampled-fit
    quantizer, recall@10 over multiple queries has a floor at nprobe=4/16,
    and probing ALL buckets recovers brute force EXACTLY (the recall/
    latency dial's endpoint is the exact answer, not an approximation)."""
    from duckdb_psql_spark.operators.similarity import (
        brute_force_topk, ivf_assign, ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, cents = ivf_assign(
        emb, id_col="vec_id", vec_col="embedding",
        n_centroids=16, sample_fraction=0.5,
    )
    assigned = assigned.persist()
    try:
        queries = emb.filter("vec_id % 60 = 0").limit(8).collect()
        rec4 = []
        for row in queries:
            q = [float(x) for x in row["embedding"]]
            exact = [
                (r.vec_id, r.cosine)
                for r in brute_force_topk(
                    emb, q, id_col="vec_id", vec_col="embedding", k=10
                ).collect()
            ]
            a4 = {
                r.vec_id
                for r in ivf_topk(
                    assigned, cents, q, id_col="vec_id", vec_col="embedding",
                    k=10, nprobe=4,
                ).collect()
            }
            rec4.append(len(a4 & {i for i, _ in exact}) / 10)
            full = [
                (r.vec_id, r.cosine)
                for r in ivf_topk(
                    assigned, cents, q, id_col="vec_id", vec_col="embedding",
                    k=10, nprobe=16,
                ).collect()
            ]
            assert full == exact, "full probe must equal brute force exactly"
        avg = sum(rec4) / len(rec4)
        # measured 0.73 avg on this table; 0.5 is a safe regression floor
        assert avg >= 0.5, f"IVF recall@10 regressed: {avg}"
    finally:
        assigned.unpersist()


def test_interval_join_matches_inequality_join(spark, psql, sf_dir):
    """Range join: the bucketized equi-join plan must (a) exactly match
    the plain inequality join's pairs, (b) never plan a nested loop even
    with NO equi keys, (c) keep all left rows under how='left'."""
    from duckdb_psql_spark.operators.rangejoin import interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type"
    )
    views = ev.filter("event_type = 'view'")
    clicks = ev.filter("event_type = 'click'")
    j = interval_join(
        views, clicks, left_ts="ts", right_ts="ts",
        lower=0, upper=300, keys=["user_id"],
    )
    got = sorted((r.event_id, r.event_id_r) for r in j.collect())
    ref = sorted(
        (r.l, r.r)
        for r in views.alias("v").join(
            clicks.alias("c"),
            (F.col("v.user_id") == F.col("c.user_id"))
            & (F.col("c.ts") >= F.col("v.ts"))
            & (F.col("c.ts") <= F.col("v.ts") + F.expr("INTERVAL 300 SECONDS")),
        ).selectExpr("v.event_id as l", "c.event_id as r").collect()
    )
    assert got == ref and len(got) > 0

    # pure range (no keys): equi-join on the time bucket, no nested loop
    j2 = interval_join(
        views.limit(40), clicks, left_ts="ts", right_ts="ts", lower=-60, upper=60
    )
    plan = j2._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    j2.count()  # executes

    jl = interval_join(
        views, clicks, left_ts="ts", right_ts="ts",
        lower=0, upper=300, keys=["user_id"], how="left",
    )
    assert jl.select("event_id").distinct().count() == views.count()

    # pipe verb route
    out = psql.sql(
        f"from '{sf_dir}/events.parquet' |> where event_type = 'view' |> "
        f"select event_id, user_id, ts |> "
        f"range_join '{sf_dir}/events.parquet' lower=0 upper=300 by=user_id |> "
        "where event_type = 'click' |> select count() as n"
    ).first()[0]
    assert out == len(got)


def test_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join drains to the same pairs as the batch
    operator (watermarks + time-range condition bound the state)."""
    from duckdb_psql_spark.operators.rangejoin import (
        interval_join, stream_interval_join,
    )

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    def stream():
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .select("event_id", "user_id", "ts", "event_type")
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    views_s = stream().filter("event_type = 'view'")
    clicks_s = stream().filter("event_type = 'click'")
    sj = stream_interval_join(
        views_s, clicks_s, left_ts="ts", right_ts="ts",
        lower=0, upper=300, keys=["user_id"], watermark="1 hour",
    )
    q = (
        sj.writeStream.format("memory").queryName("rj_stream")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.event_id, r.event_id_r)
        for r in spark.sql("select * from rj_stream").collect()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type"
    )
    batch = interval_join(
        ev.filter("event_type = 'view'"), ev.filter("event_type = 'click'"),
        left_ts="ts", right_ts="ts", lower=0, upper=300, keys=["user_id"],
    )
    want = sorted((r.event_id, r.event_id_r) for r in batch.collect())
    assert got == want


def test_psql_stream_source(psql, sf_dir):
    """`from stream('path')` yields a Structured Streaming pipeline whose
    drained result matches the batch pipeline."""
    sdf = psql.sql(
        f"from stream('{sf_dir}/events.parquet') |> "
        "where event_type = 'purchase' |> select event_id, user_id, value"
    )
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("psql_stream_t")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    n_stream = psql.spark.sql("select count(*) n from psql_stream_t").first()["n"]
    n_batch = psql.sql(
        f"from '{sf_dir}/events.parquet' |> where event_type = 'purchase'"
    ).count()
    assert n_stream == n_batch > 0


def test_stateful_streaming_profile(spark, sf_dir):
    """applyInPandasWithState operator: drained stream totals match batch."""
    from pyspark.sql import functions as F

    from duckdb_psql_spark.sources.resolver import SourceResolver
    from duckdb_psql_spark.streaming import running_user_profile

    resolver = SourceResolver(spark)
    stream = resolver.resolve_stream(f"{sf_dir}/events.parquet")
    prof = running_user_profile(stream, high_value_threshold=50.0)
    q = (prof.writeStream.format("memory").queryName("user_prof")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    # update mode may emit several rows per user; the LAST emitted row per
    # user is the final state — with availableNow single-pass, dedup by max
    got = {
        r.user_id: (r.n_events, round(r.total_value, 3), r.n_high_value)
        for r in spark.sql(
            "select * from (select *, row_number() over "
            "(partition by user_id order by n_events desc) rn from user_prof) "
            "where rn = 1"
        ).collect()
    }
    batch = resolver.resolve(f"{sf_dir}/events.parquet")
    exp = {
        r.user_id: (r.n, round(r.total, 3), r.nh)
        for r in batch.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0)).alias("nh"),
        ).collect()
    }
    assert got == exp


def test_summarize_profile(spark, psql):
    sf = "/root/testdata/sf0.001"
    d = psql.sql(f"summarize '{sf}/orders.parquet'")
    rows = {r.column_name: r for r in d.collect()}
    assert set(rows) == {"o_orderkey", "o_custkey", "o_orderstatus",
                         "o_totalprice", "o_orderdate", "o_orderpriority"}
    assert rows["o_orderkey"].min == "0"
    assert rows["o_orderstatus"].max == "P"
    assert rows["o_orderdate"].min is not None  # timestamp_ntz is orderable
    assert rows["o_totalprice"].null_percentage == 0.0
    assert rows["o_custkey"]["count"] == 1500
    # pipe-verb form over a filtered pipeline
    d2 = psql.sql(f"from '{sf}/orders.parquet' |> where o_orderstatus = 'F' |> summarize")
    assert d2.count() == 6


def test_stream_dedup(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from duckdb_psql_spark.sources.resolver import SourceResolver
    from duckdb_psql_spark.streaming import stream_dedup

    # duplicate-delivery source: every event appears twice
    events = SourceResolver(spark).resolve(f"{sf_dir}/events.parquet").limit(500)
    src = str(tmp_path / "src")
    events.unionAll(events).write.mode("overwrite").parquet(src)

    # batch mode: plain dedup
    batch = stream_dedup(spark.read.parquet(src), ["event_id"])
    assert batch.count() == 500

    # streaming mode: dropDuplicatesWithinWatermark over a file stream
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream_dedup(stream, ["event_id"], watermark="10 minutes")
    out = str(tmp_path / "out")
    (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    result = spark.read.parquet(out)
    assert result.count() == 500
    assert result.select(F.countDistinct("event_id")).first()[0] == 500


def test_dedup_verb_routes_streaming(psql, sf_dir):
    df = psql.sql(f"from stream('{sf_dir}/events.parquet') |> dedup by event_id")
    assert df.isStreaming
    # the plan carries the watermark-evicted dedup, not a window sort
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan and "EventTimeWatermark" in plan


def test_asof_variants(spark, psql):
    spark.createDataFrame(
        [(1, 10.0), (3, 30.0), (6, 60.0)], "ts int, price double"
    ).createOrReplaceTempView("asof_px")
    spark.createDataFrame(
        [(2, "a"), (4, "b"), (5, "c"), (0, "z")], "ts int, tag string"
    ).createOrReplaceTempView("asof_ev")
    # keyless (global) backward asof, inner: row 0 has no match and drops
    rows = psql.sql(
        "from asof_ev |> as e asof join asof_px as p on e.ts >= p.ts |> "
        "select tag, price |> order by tag"
    ).collect()
    assert [(r.tag, r.price) for r in rows] == [("a", 10.0), ("b", 30.0), ("c", 30.0)]
    # left keeps the unmatched row with NULL
    rows = psql.sql(
        "from asof_ev |> as e asof left join asof_px as p on e.ts >= p.ts |> "
        "select tag, price |> order by tag"
    ).collect()
    assert [(r.tag, r.price) for r in rows] == [
        ("a", 10.0), ("b", 30.0), ("c", 30.0), ("z", None)]
    # forward direction (<=): nearest following event
    rows = psql.sql(
        "from asof_px |> as p asof join asof_ev as e on p.ts <= e.ts |> "
        "select price, tag |> order by price"
    ).collect()
    assert [(r.price, r.tag) for r in rows] == [(10.0, "a"), (30.0, "b")]


def test_png_decode_real(spark, psql, tmp_path):
    """The PNG path decodes for real: dims from IHDR, pixel bytes crc-match
    the pre-encode buffer (so a header-parrot can't pass)."""
    import zlib

    from duckdb_psql_spark.operators.multimodal import decode_images, synthetic_media
    from duckdb_psql_spark.operators.png import synthetic_pixels

    media = synthetic_media(spark, 30)
    rows = {r.media_id: r for r in decode_images(media).collect()}
    assert len(rows) == media.filter("kind = 'image'").count()
    for mid, r in rows.items():
        w, h, px = synthetic_pixels(mid)
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert r.n_pixel_bytes == len(px)
        assert r.pixel_crc == (zlib.crc32(px) & 0xFFFFFFFF)
    # pipe verb route
    media_path = str(tmp_path / "media_png.parquet")
    media.write.mode("overwrite").parquet(media_path)
    out = psql.sql(f"from '{media_path}' |> media_decode").collect()
    assert len(out) == len(rows)
    # non-PNG payloads raise the documented stub error
    import pytest as _pytest

    from duckdb_psql_spark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WAVE")


def test_decode_images_corrupt_payload_tolerance(spark):
    """One bad payload must cost one row, not the task (VERDICT r6 #1):
    truncated / bit-flipped / garbage-header / lossy-VP8 payloads yield
    NULL measurements + an error string; intact payloads of all five
    codecs still decode exactly."""
    from duckdb_psql_spark.operators.multimodal import (
        decode_image_row,
        decode_images,
        synthetic_corrupt_media,
        synthetic_corrupt_payload,
    )

    n = 40
    rows = {r.media_id: r for r in decode_images(synthetic_corrupt_media(spark, n)).collect()}
    assert len(rows) == n  # every payload produced a row; nothing raised
    n_err = 0
    for i in range(n):
        expect = decode_image_row(synthetic_corrupt_payload(i))
        got = rows[i]
        assert got.error == expect["error"], (i, got.error, expect["error"])
        if expect["error"] is None:
            assert (got.width, got.height, got.pixel_crc) == (
                expect["width"], expect["height"], expect["pixel_crc"]), i
        else:
            n_err += 1
            assert got.width is None and got.pixel_crc is None
    # the fixture really mixes both populations: intact rows survive,
    # damaged ones (3 of every 4 per codec cycle, plus VP8) error out
    assert 10 <= n_err <= n - 8, n_err
    # lossy VP8 takes the error path: with the system libwebp present
    # the garbage body is a corrupt-stream ValueError (round-11 kernel
    # swap); without it the documented NotImplementedError stands
    vp8 = rows[19]
    assert vp8.error is not None
    assert ("lossy decode failed" in vp8.error
            or "NotImplementedError" in vp8.error)


def test_similarity_functions_match_duckdb(psql):
    """damerau_levenshtein / jaro / jaro_winkler: randomized differential
    against DuckDB's implementations (incl. the jaro('','')=0 edge and
    TRUE Damerau-Levenshtein: CA->ABC costs 2, not OSA's 3)."""
    import random

    import duckdb

    from duckdb_psql_spark.functions.pyfuncs import (
        damerau_levenshtein_py, jaro_py, jaro_winkler_py,
    )

    random.seed(7)
    alpha = "abcdex"
    cases = [
        ("CA", "ABC"), ("kitten", "sitting"), ("ab", "ba"), ("", "abc"),
        ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", ""), ("a", "a"),
    ] + [
        (
            "".join(random.choice(alpha) for _ in range(random.randint(0, 12))),
            "".join(random.choice(alpha) for _ in range(random.randint(0, 12))),
        )
        for _ in range(120)
    ]
    for a, b in cases:
        dl, js, jw = duckdb.sql(
            "SELECT damerau_levenshtein(?, ?), jaro_similarity(?, ?), "
            "jaro_winkler_similarity(?, ?)",
            params=[a, b, a, b, a, b],
        ).fetchone()
        assert damerau_levenshtein_py(a, b) == dl, (a, b)
        assert abs(jaro_py(a, b) - js) < 1e-12, (a, b)
        assert abs(jaro_winkler_py(a, b) - jw) < 1e-12, (a, b)
    # registered through the session: usable in any compiled statement
    row = psql.sql(
        "select damerau_levenshtein('CA', 'ABC') as dl, "
        "round(jaro_winkler_similarity('MARTHA', 'MARHTA'), 4) as jw"
    ).collect()[0]
    assert row.dl == 2 and row.jw == 0.9611


def test_jpeg_codec_fidelity():
    """The JPEG codec is a real lossy DCT transform, not a passthrough:
    orthonormal basis, >28 dB round-trip PSNR on smooth gradients, and
    the decoder handles 4:2:0 + restart markers (the real-world shape)."""
    import numpy as np

    from duckdb_psql_spark.operators.jpeg import (
        _T, _ZZ, decode_jpeg, encode_jpeg, is_jpeg, synthetic_jpeg_pixels,
    )

    assert np.allclose(_T @ _T.T, np.eye(8), atol=1e-12)
    assert len(set(_ZZ)) == 64
    assert _ZZ[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]

    def psnr(a, b):
        x = np.frombuffer(a, np.uint8).astype(float)
        y = np.frombuffer(b, np.uint8).astype(float)
        mse = float(np.mean((x - y) ** 2))
        return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)

    for mid in range(4):
        w, h, px = synthetic_jpeg_pixels(mid)
        for kw, floor in [
            ({}, 28.0),
            ({"subsample": True}, 26.0),
            ({"subsample": True, "restart_interval": 1}, 26.0),
        ]:
            data = encode_jpeg(w, h, px, **kw)
            assert is_jpeg(data)
            d = decode_jpeg(data)
            assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
            assert psnr(px, d["pixels"]) > floor
    # the payload is NOT the raw pixels (lossy compression actually ran)
    w, h, px = synthetic_jpeg_pixels(0)
    assert len(encode_jpeg(w, h, px)) < len(px) // 2
    # arithmetic coding (SOF9) raises the documented boundary
    # (progressive SOF2 is decoded for real since round 6 —
    # test_progressive_jpeg_matches_baseline_twin)
    import pytest as _pytest

    sof9 = bytearray(encode_jpeg(w, h, px))
    sof9[sof9.index(b"\xff\xc0") + 1] = 0xC9
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(sof9))


def test_jpeg_decode_distributed(spark):
    """Distributed decode (mapInPandas) bit-matches the local reference
    decode across all encoder variants."""
    import zlib

    from duckdb_psql_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, synthetic_jpeg_pixels,
    )
    from duckdb_psql_spark.operators.multimodal import (
        decode_images, synthetic_jpeg_media,
    )

    media = synthetic_jpeg_media(spark, 12)
    rows = {r.media_id: r for r in decode_images(media).collect()}
    assert len(rows) == 12
    for mid, r in rows.items():
        w, h, px = synthetic_jpeg_pixels(mid)
        kw = [
            {},
            {"subsample": True},
            {"restart_interval": 2},
            {"subsample": True, "restart_interval": 1},
        ][mid % 4]
        ref = decode_jpeg(encode_jpeg(w, h, px, **kw))
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert r.pixel_crc == (zlib.crc32(ref["pixels"]) & 0xFFFFFFFF)


def test_knn_pipe_verb(psql, sf_dir):
    out = psql.sql(
        f"from '{sf_dir}/embeddings.parquet' |> knn query_id=0 k=5"
    ).collect()
    assert len(out) == 5
    assert out[0].vec_id == 0 and out[0].cosine == 1.0  # self is nearest
    assert [r.rk for r in out] == [1, 2, 3, 4, 5]
    lsh = psql.sql(
        f"from '{sf_dir}/embeddings.parquet' |> knn query_id=0 k=5 method=lsh"
    ).collect()
    assert 0 < len(lsh) <= 5 and lsh[0].vec_id == 0


def test_knn_inline_query_vec_no_compose_job(spark, psql, sf_dir):
    """`knn query_vec=[…]` is the scale path: the corpus is never scanned
    at compose time to find the query row."""
    import pytest as _pytest

    from duckdb_psql_spark.errors import PsqlCompileError

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    vec_text = "[" + ",".join(repr(x) for x in qvec) + "]"

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = psql.sql(f"from '{sf_dir}/embeddings.parquet' |> knn query_vec={vec_text} k=5")
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "inline query_vec ran a Spark job at compose time"
    rows = df.collect()
    # same result as the query_id form
    byid = psql.sql(f"from '{sf_dir}/embeddings.parquet' |> knn query_id=0 k=5").collect()
    assert [(r.vec_id, r.cosine) for r in rows] == [(r.vec_id, r.cosine) for r in byid]

    with _pytest.raises(PsqlCompileError, match="query_vec"):
        psql.sql(f"from '{sf_dir}/embeddings.parquet' |> knn query_vec=[a,b] k=5")
    with _pytest.raises(PsqlCompileError, match="query_id.*query_vec|query_vec.*query_id"):
        psql.sql(f"from '{sf_dir}/embeddings.parquet' |> knn k=5")


def test_pack_token_bins(spark, psql, sf_dir):
    from duckdb_psql_spark.operators.split import pack_token_bins
    from pyspark.sql import functions as F

    docs = psql.sql(f"from '{sf_dir}/documents.parquet' |> token_count")
    packed = pack_token_bins(
        docs, key_col="doc_id", token_col="n_tokens", target_tokens=3000
    )
    rows = packed.select("doc_id", "n_tokens", "bin_id").collect()
    # bins are contiguous 0..max and every bin except the last holds at
    # least the target once the boundary row lands in it
    bins = {}
    for r in rows:
        bins.setdefault(r.bin_id, 0)
        bins[r.bin_id] += r.n_tokens
    ids = sorted(bins)
    assert ids == list(range(len(ids)))
    # greedy packing invariant: if bin b+1 is nonempty, the cumulative
    # token count through bin b has crossed the (b+1)*target boundary
    # (individual bins may hold less when a boundary row overflowed in)
    cum = 0
    for b in ids[:-1]:
        cum += bins[b]
        assert cum >= (b + 1) * 3000
    # deterministic under repartitioning
    re = pack_token_bins(
        docs.repartition(7), key_col="doc_id", token_col="n_tokens",
        target_tokens=3000,
    )
    a = {r.doc_id: r.bin_id for r in rows}
    b = {r.doc_id: r.bin_id for r in re.select("doc_id", "bin_id").collect()}
    assert a == b
    # verb route
    out = psql.sql(
        f"from '{sf_dir}/documents.parquet' |> token_count |> "
        "pack_bins key=doc_id tokens=n_tokens target=3000 |> "
        "select bin_id, count() as n group by bin_id |> order by bin_id"
    )
    assert out.count() == len(ids)


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics, not just plumbing: in append mode a window only
    emits once the watermark passes it, and events arriving AFTER that are
    dropped — two micro-batches drive the state machine end to end."""
    import datetime as dt

    from duckdb_psql_spark.streaming.events import stream_tumbling_counts

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows, mode):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        ).write.mode(mode).parquet(src)

    t0 = dt.datetime(2026, 1, 1, 0, 30)
    late = dt.datetime(2026, 1, 1, 1, 0)   # hour-1 window
    flush = dt.datetime(2026, 1, 1, 12, 0)  # advances watermark far past both

    # batch 1: two on-time events + the flush event
    write_batch(
        [(1, t0, 1, "click", 1.0), (2, t0, 1, "click", 1.0), (3, flush, 1, "tick", 1.0)],
        "overwrite",
    )

    def drain():
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        (
            stream_tumbling_counts(stream, window="1 hour", watermark="2 hours")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
        return {
            (r.window_start, r.event_type): r.n_events
            for r in spark.read.parquet(out).collect()
        }

    first = drain()
    # watermark (12:00 - 2h) has passed the 00:00 window: it emitted with 2
    assert first[(dt.datetime(2026, 1, 1, 0, 0), "click")] == 2

    # batch 2: an event for the already-emitted 01:00-area window, way
    # behind the watermark -> must be DROPPED (no new 01:00 click window),
    # plus a fresh on-time event that advances nothing
    write_batch([(4, late, 1, "click", 1.0)], "append")
    second = drain()
    assert (dt.datetime(2026, 1, 1, 1, 0), "click") not in second
    # the on-time aggregate was not duplicated by the second drain
    assert second[(dt.datetime(2026, 1, 1, 0, 0), "click")] == 2


def test_gif_codec_roundtrip_and_distributed_decode(spark):
    """GIF codec (operators/gif.py): palette-indexed pixels are lossless,
    so encode->decode must be byte-exact on the RGB expansion, including
    interlaced streams and LZW dictionary resets; the distributed decode
    (decode_images) must reproduce the local reference decode."""
    import struct
    import zlib

    from duckdb_psql_spark.operators.gif import (
        _INTERLACE_PASSES,
        _lzw_decode,
        _lzw_encode,
        decode_gif,
        encode_gif,
        is_gif,
        synthetic_gif_indices,
    )
    from duckdb_psql_spark.operators.multimodal import (
        decode_images,
        synthetic_gif_media,
    )

    for i in range(8):
        w, h, idx, pal = synthetic_gif_indices(i)
        data = encode_gif(w, h, idx, pal)
        assert is_gif(data)
        d = decode_gif(data)
        want = bytes(b for j in idx for b in pal[3 * j : 3 * j + 3])
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert d["pixels"] == want

    # LZW dictionary growth + reset past 4096 codes
    long = bytes((i // 7) % 16 for i in range(50000))
    assert bytes(_lzw_decode(4, _lzw_encode(4, long))) == long

    # interlaced stream: rows stored in pass order must decode row-major
    w, h = 8, 11
    pal = bytes(b for i in range(16) for b in (i * 16, i * 8, i * 4))
    idx = bytes((x + y) % 16 for y in range(h) for x in range(w))
    pass_rows = bytearray()
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            pass_rows += idx[y * w : (y + 1) * w]
    raw = bytearray()
    raw += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 3, 0, 0) + pal
    raw += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
    raw.append(4)
    lzw = _lzw_encode(4, bytes(pass_rows))
    for i in range(0, len(lzw), 255):
        c = lzw[i : i + 255]
        raw.append(len(c))
        raw += c
    raw += b"\x00\x3b"
    want = bytes(b for j in idx for b in pal[3 * j : 3 * j + 3])
    assert decode_gif(bytes(raw))["pixels"] == want

    # distributed decode matches the local reference decode
    out = {
        r.media_id: r
        for r in decode_images(synthetic_gif_media(spark, 12)).collect()
    }
    for i in range(12):
        w, h, idx, pal = synthetic_gif_indices(i)
        want = bytes(b for j in idx for b in pal[3 * j : 3 * j + 3])
        r = out[i]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert r.pixel_crc == (zlib.crc32(want) & 0xFFFFFFFF)


def test_progressive_jpeg_matches_baseline_twin():
    """Progressive (SOF2) streams carry the same quantized coefficients
    as their baseline twin, so both must decode to IDENTICAL pixels —
    across 4:4:4, 4:2:0, and grayscale. The scan script (DC Al=1 →
    DC refine → AC band scans Al=1 → AC refinement) exercises EOB runs,
    ZRL-with-corrections, newly-nonzero coefficients, and per-scan
    Huffman table snapshots."""
    from duckdb_psql_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_progressive_jpeg,
        synthetic_jpeg_pixels,
    )

    for i in range(6):
        w, h, px = synthetic_jpeg_pixels(i)
        for sub in (False, True):
            base = decode_jpeg(encode_jpeg(w, h, px, subsample=sub))
            prog = decode_jpeg(
                encode_progressive_jpeg(w, h, px, subsample=sub)
            )
            assert prog == base, f"i={i} subsample={sub}"
    w, h = 24, 17
    gray = bytes((x * 7 + y * 3) % 256 for y in range(h) for x in range(w))
    assert decode_jpeg(encode_progressive_jpeg(w, h, gray, channels=1)) == \
        decode_jpeg(encode_jpeg(w, h, gray, channels=1))


def test_tiff_codec_roundtrip_and_distributed_decode(spark):
    """TIFF codec (operators/tiff.py): all three supported compressions
    (none / PackBits / TIFF-LZW with early change) are lossless, so
    round-trips are byte-exact across strip layouts; the distributed
    decode reproduces the original pixels."""
    import zlib

    from duckdb_psql_spark.operators.tiff import (
        _packbits_decode,
        _packbits_encode,
        _tiff_lzw_decode,
        _tiff_lzw_encode,
        decode_tiff,
        encode_tiff,
        is_tiff,
        synthetic_tiff_pixels,
    )
    from duckdb_psql_spark.operators.multimodal import (
        decode_images,
        synthetic_tiff_media,
    )

    for i in range(6):
        w, h, ch, px = synthetic_tiff_pixels(i)
        for comp in (1, 32773, 5):
            data = encode_tiff(w, h, px, channels=ch, compression=comp)
            assert is_tiff(data)
            d = decode_tiff(data)
            assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
            assert d["pixels"] == px

    # LZW dictionary reset + PackBits run/literal edge paths
    long = bytes((i // 5) % 250 for i in range(40000))
    assert _tiff_lzw_decode(_tiff_lzw_encode(long), len(long)) == long
    assert _packbits_decode(_packbits_encode(long), len(long)) == long

    out = {
        r.media_id: r
        for r in decode_images(synthetic_tiff_media(spark, 9)).collect()
    }
    for i in range(9):
        w, h, ch, px = synthetic_tiff_pixels(i)
        r = out[i]
        assert (r.width, r.height, r.channels) == (w, h, ch)
        assert r.pixel_crc == (zlib.crc32(px) & 0xFFFFFFFF)


def test_bm25_scores_hand_computed(spark):
    """Lucene-form BM25 on a 3-doc corpus, checked against the formula
    computed by hand in Python; zero-match docs score 0; broadcast +
    filtered-explode plan shape."""
    import math

    from duckdb_psql_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "dog bird"),
            (3, "fish only here"),
        ],
        "doc_id int, text string",
    )
    out = bm25_scores(docs, ["cat", "dog"])
    got = {r.doc_id: r.bm25 for r in out.collect()}
    n, avgdl = 3, (3 + 2 + 3) / 3.0
    k1, b = 1.2, 0.75

    def idf(df_):
        return math.log((n - df_ + 0.5) / (df_ + 0.5) + 1)

    def term(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    want1 = idf(1) * term(2, 3) + idf(2) * term(1, 3)
    want2 = idf(2) * term(1, 2)
    assert got[3] == 0.0
    assert abs(got[1] - want1) < 1e-12 and abs(got[2] - want2) < 1e-12
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_ngram_lm_score_hand_computed(spark):
    """Interpolated bigram LM on a 2-doc corpus with itself as the
    reference, checked against the closed-form computed by hand; a
    <2-token doc scores NULL."""
    import math

    from duckdb_psql_spark.operators.text import ngram_lm_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")],
        "doc_id int, text string",
    )
    out = ngram_lm_score(docs, docs, lam=0.8)
    got = {r.doc_id: r.lm_score for r in out.collect()}
    # reference counts over all three docs:
    # unigrams: a:3 b:3 x:1 -> T=7, V=3; bigrams: "a b":3, "b a":1
    T, V = 7, 3

    def p(cbg, cw1, cw2):
        uni = 0.2 * (cw2 + 1) / (T + V)
        return (0.8 * cbg / cw1 if cw1 else 0.0) + uni

    lp_ab = math.log(p(3, 3, 3))
    lp_ba = math.log(p(1, 3, 3))
    want1 = (lp_ab + lp_ba + lp_ab) / 3  # a b / b a / a b
    assert abs(got[1] - want1) < 1e-12
    assert abs(got[2] - lp_ab) < 1e-12
    assert got[3] is None


def test_duplicate_spans_exact_merge(spark):
    """duplicate_spans (Lee et al. ExactSubstr): a run of >= k shared
    tokens merges back into ONE maximal span in every doc that carries
    it; short docs emit nothing; within-doc repeats only count under
    scope=all."""
    from duckdb_psql_spark.operators.text import (
        duplicate_spans,
        strip_duplicate_spans,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta unique tail one"),
        (2, "prefix two alpha beta gamma delta epsilon zeta eta theta and more"),
        (3, "totally different content with no duplicated run at all here"),
        (4, "self repeat self repeat self repeat self repeat self repeat xx"),
        (5, "shorty"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    spans = sorted(
        tuple(r) for r in duplicate_spans(df, gram_k=4).collect()
    )
    # the 8-token shared run: doc1 tokens 0..7, doc2 tokens 2..9 —
    # exactly one maximal span each, nothing else
    assert spans == [(1, 0, 7, 8), (2, 2, 9, 8)]
    within = sorted(
        tuple(r)
        for r in duplicate_spans(df, gram_k=4, cross_doc_only=False).collect()
    )
    # doc4's self-repetition surfaces only in scope=all
    assert (4, 0, 9, 10) in within and (1, 0, 7, 8) in within
    cut = {
        r.doc_id: (r.text, r.n_spans_cut)
        for r in strip_duplicate_spans(df, gram_k=4).collect()
    }
    assert cut[1] == ("unique tail one", 1)
    assert cut[2] == ("prefix two and more", 1)
    assert cut[3][1] == 0 and cut[3][0].startswith("totally different")
    assert cut[5] == ("shorty", 0)
    # min_tokens above the run length suppresses the span
    assert duplicate_spans(df, gram_k=4, min_tokens=9).count() == 0


def test_semdedup_kmeans_and_fixed(spark, sf_dir):
    """semdedup: the k-means verb path flags duplicates consistently
    with the method's contract (a duplicate's dup_of is a lower id in
    the SAME cluster with cosine >= threshold), and planted near-dup
    vectors are caught regardless of clustering path."""
    import pyspark.sql.functions as F

    from duckdb_psql_spark.operators.dedup import semdedup
    from duckdb_psql_spark.operators.similarity import cosine_expr

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    # plant an exact near-dup pair: row 9001 = the lowest-id row's vector
    base = emb.orderBy("vec_id").limit(1)
    planted = emb.unionByName(
        base.select(F.lit(9001).alias("vec_id"), *[c for c in emb.columns if c != "vec_id"])
    )
    out = semdedup(
        planted, id_col="vec_id", vec_col="embedding",
        threshold=0.999, n_clusters=4, seed=1,
    )
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == planted.count()  # every input row present
    dup = rows[9001]
    assert dup.is_semdup and dup.dup_of is not None
    # contract check: dup_of shares the cluster and clears the threshold
    assert rows[dup.dup_of].cluster_id == dup.cluster_id
    pair = planted.filter(F.col("vec_id").isin([9001, dup.dup_of]))
    vecs = [r.embedding for r in pair.collect()]
    a = spark.createDataFrame([(list(map(float, vecs[0])), list(map(float, vecs[1])))], "x array<double>, y array<double>")
    cos = a.select(cosine_expr(F.col("x"), F.col("y")).alias("c")).collect()[0].c
    assert cos >= 0.999
    # non-duplicates carry NULL dup_of
    assert all(r.dup_of is None for r in rows.values() if not r.is_semdup)


def test_dsir_weights_prefer_target_like(spark, tmp_path, psql):
    """dsir_weights (Xie et al. 2023): documents sharing the target's
    hashed-bigram distribution outweigh off-distribution ones; docs
    with < 2 tokens weight 0; and the verb spelling matches the API."""
    from duckdb_psql_spark.operators.text import dsir_weights

    target = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again") for i in range(6)],
        "doc_id int, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog once more"),
            (2, "zzz qqq vvv kkk jjj xxx www uuu ttt sss"),
            (3, "single"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in dsir_weights(raw, target, buckets=256).collect()}
    assert out[1].dsir_weight > out[2].dsir_weight
    assert out[3].dsir_weight == 0.0 and out[3].n_grams == 0
    tpath = str(tmp_path / "tgt.parquet")
    target.write.parquet(tpath)
    raw.createOrReplaceTempView("dsir_raw")
    via_verb = {
        r.doc_id: r.dsir_weight
        for r in psql.sql(
            f"from dsir_raw |> dsir '{tpath}' buckets=256"
        ).collect()
    }
    assert abs(via_verb[1] - out[1].dsir_weight) < 1e-9
    psql.spark.catalog.dropTempView("dsir_raw")


def test_semdedup_arrow_string_ids(spark):
    """semdedup's Arrow path derives the applyInPandas schema from the
    input id type (ADVICE r9: hard-coded `long` broke string/int32 ids).
    String ids order lexicographically, matching the expr twin's `<`."""
    import pyspark.sql.functions as F

    from duckdb_psql_spark.operators.dedup import semdedup

    rows = [
        ("a", [1.0, 0.0, 0.0]),
        ("b", [1.0, 0.0, 0.0]),      # dup of "a"
        ("c", [0.0, 1.0, 0.0]),
        ("d", [0.0, 0.99, 0.14]),    # near-dup of "c"
        ("e", [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "doc string, vec array<double>")
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    for mode in ("arrow", "expr"):
        out = {
            r.doc: (r.is_semdup, r.dup_of)
            for r in semdedup(
                df, id_col="doc", vec_col="vec", threshold=0.95,
                centroids=cents, pairwise=mode,
            ).collect()
        }
        assert out["a"] == (False, None), mode
        assert out["b"] == (True, "a"), mode
        assert out["c"] == (False, None), mode
        assert out["d"] == (True, "c"), mode
        assert out["e"] == (False, None), mode


def test_gopher_quality_rules(spark):
    from duckdb_psql_spark.operators.text import gopher_quality

    passing = " ".join(
        ["the quick brown fox jumps over that lazy dog with style"] * 5
    )  # 55 words, mean len ~4, 3 stopwords, all-alpha
    rows = [
        (1, passing),
        (2, "short doc that fails the word-count rule"),  # < 50 words
        (3, " ".join(["#"] * 60)),  # symbol-heavy, no alpha, no stopwords
        (4, "\n".join(["- bullet line of the doc"] * 10)),  # 100% bullets
    ]
    out = {
        r.doc_id: r
        for r in gopher_quality(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1].gopher_pass
    assert out[1].g_n_words == 55 and out[1].n_stop_hits >= 2
    assert not out[2].gopher_pass  # word count
    assert not out[3].gopher_pass and out[3].alpha_word_frac == 0.0
    assert not out[4].gopher_pass and out[4].bullet_line_frac == 1.0


def test_c4_clean_line_filter(spark):
    from duckdb_psql_spark.operators.text import c4_clean

    text = "\n".join(
        [
            "This is a fine complete sentence for keeping.",  # kept
            "No terminal punctuation on this line here",  # dropped: no punct
            "Too short.",  # dropped: < 5 words
            "Please enable javascript to view this page.",  # dropped: js
            "Another proper sentence stays in the document!",  # kept
            "And one more good sentence rounds it out?",  # kept
        ]
    )
    rows = [(1, text), (2, "lorem ipsum dolor sit amet is boilerplate text."),
            (3, "var x = { a: 1 }; this page is code with five words.")]
    out = {r.doc_id: r for r in c4_clean(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert out[1].n_lines == 6 and out[1].n_lines_kept == 3
    assert out[1].c4_pass and out[1].n_sentences == 3
    assert out[1].text_clean.count("\n") == 2
    assert not out[2].c4_pass and out[2].has_lorem
    assert not out[3].c4_pass and out[3].has_brace


def test_paragraph_dedup_first_occurrence(spark):
    from duckdb_psql_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha beta\nshared boilerplate line\nunique to one"),
        (2, "shared boilerplate line\nunique to two"),
        # normalization: case + digits collapse to the same paragraph
        (3, "SHARED boilerplate LINE\nDigits 123 here"),
        (4, "digits 999 here\n\nalpha beta"),
    ]
    out = {r.doc_id: r for r in paragraph_dedup(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    # doc 1 keeps everything (first occurrence of all three paragraphs)
    assert out[1].text == "alpha beta\nshared boilerplate line\nunique to one"
    assert out[1].n_paragraphs == 3 and out[1].n_kept == 3
    # doc 2 loses the shared line
    assert out[2].text == "unique to two" and out[2].n_kept == 1
    # doc 3 loses the case-variant shared line; keeps first digits line
    assert out[3].text == "Digits 123 here" and out[3].n_kept == 1
    # doc 4: "digits 999 here" normalizes to the same as "Digits 123 here"
    # (already taken by doc 3) and "alpha beta" is doc 1's; blank line kept
    assert out[4].n_kept == 0 and out[4].text == ""
    # xxhash64 hot path agrees with the md5 oracle twin
    hot = {r.doc_id: r for r in paragraph_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"),
        hash_fn="xxhash64").collect()}
    assert all(hot[i].text == out[i].text for i in out)


def test_vocab_topk_counts(spark):
    from duckdb_psql_spark.operators.text import vocab_topk

    rows = [
        (1, "spark spark duck"),
        (2, "spark duck duck goose"),
        (3, "goose"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.gram: r for r in vocab_topk(df, k=10).collect()}
    assert out["spark"].n_total == 3 and out["spark"].n_docs == 2
    assert out["duck"].n_total == 3 and out["duck"].n_docs == 2
    assert out["goose"].n_total == 2 and out["goose"].n_docs == 2
    # deterministic cut: k=1 keeps the tie with the lower gram
    top1 = vocab_topk(df, k=1).collect()
    assert len(top1) == 1 and top1[0].gram == "duck"
    # bigrams
    big = {r.gram: r for r in vocab_topk(df, ngram=2, k=10).collect()}
    assert big["spark spark"].n_total == 1
    assert big["spark duck"].n_total == 2  # docs 1 and 2


def test_tfidf_topk_rational_and_log(spark):
    from duckdb_psql_spark.operators.text import tfidf_topk

    rows = [
        (1, "common common rare"),
        (2, "common other"),
        (3, "common third"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 'rare' (tf=1, df=1 → score 2.0) beats 'common'
    # (tf=2, df=3 → score 2.0)? tie → term asc: 'common' first
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [r.term for r in d1] == ["common", "rare"]
    assert d1[0].score == 2.0 and d1[1].score == 2.0
    # doc 2: 'other' df=1 → 1*4/2 = 2.0 beats 'common' 1*4/4 = 1.0
    d2 = sorted(by_doc[2], key=lambda r: r.rank)
    assert d2[0].term == "other" and d2[0].score == 2.0
    # log mode ranks the same here and scores differ
    lg = tfidf_topk(df, k=2, idf="log").collect()
    assert {(r.doc_id, r.term) for r in lg} >= {(2, "other"), (3, "third")}


def test_wav_codec_roundtrip_and_widths():
    import numpy as np

    from duckdb_psql_spark.operators.wav import (
        WavError, audio_features, decode_wav, encode_wav, resample_linear,
    )

    t = np.arange(400) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 220 * t)
    d = decode_wav(encode_wav(x, 8000))
    assert (d["rate"], d["channels"], d["bits"], d["n_frames"]) == (8000, 1, 16, 400)
    assert np.abs(d["samples"][:, 0] - x).max() < 1e-4
    # 32-bit stereo roundtrip is near-exact
    d2 = decode_wav(encode_wav(np.stack([x, -x], axis=1), 16000, bits=32))
    assert d2["channels"] == 2 and np.abs(d2["samples"][:, 0] - x).max() < 1e-8
    f = audio_features(d)
    assert f["duration_ms"] == 50 and abs(f["peak_abs"] - 0.5) < 1e-4
    assert -10 < f["rms_db"] < -8  # 0.5-amp sine ≈ -9.03 dBFS
    # linear resample doubles the frame count
    assert resample_linear(d, 16000).shape == (800, 1)
    # corruption raises deterministically
    good = encode_wav(x, 8000)
    try:
        decode_wav(good[:30])
        raise AssertionError("truncated WAV must raise")
    except WavError:
        pass


def test_audio_decode_distributed(spark):
    from duckdb_psql_spark.operators.multimodal import (
        decode_audio, resample_audio, synthetic_audio_media,
    )

    media = synthetic_audio_media(spark, 20)
    rows = {r.media_id: r for r in decode_audio(media).collect()}
    assert len(rows) == 20
    good = [r for r in rows.values() if r.error is None]
    bad = [r for r in rows.values() if r.error is not None]
    assert len(good) == 12 and len(bad) == 8  # kinds 0-5 intact, 6-9 corrupt
    assert all(r.pcm_crc is not None and r.n_frames > 0 for r in good)
    assert any("truncated" in r.error for r in bad)
    assert any("ADPCM" in r.error for r in bad)
    # resample path: payload out, decodable, at the target rate
    res = {r.media_id: r for r in resample_audio(media, rate=12000).collect()}
    from duckdb_psql_spark.operators.wav import decode_wav

    ok = [r for r in res.values() if r.error is None]
    assert len(ok) == 12
    d = decode_wav(bytes(ok[0].content))
    assert d["rate"] == 12000 and d["n_frames"] == ok[0].n_frames


def test_audio_pipe_verbs(spark, psql):
    from duckdb_psql_spark.operators.multimodal import synthetic_audio_media

    synthetic_audio_media(spark, 10).createOrReplaceTempView("audio_media")
    out = psql.sql(
        "from audio_media |> audio_decode |> where error is null |> "
        "select media_id, sample_rate, n_frames |> order by media_id"
    ).collect()
    assert len(out) == 6 and all(r.n_frames > 0 for r in out)
    res = psql.sql(
        "from audio_media |> audio_resample rate=16000 |> "
        "where error is null |> select media_id, sample_rate |> order by media_id"
    ).collect()
    assert len(res) == 6 and all(r.sample_rate == 16000 for r in res)


def test_blob_varchar_rendering(spark, psql):
    """BLOB→VARCHAR renders DuckDB's \\xNN escapes (probe batch 7) for
    both spellings and for binary COLUMNS via the schema hint."""
    r = psql.sql(
        "select from_hex('c3a97a')::VARCHAR as a, "
        "cast(encode('héllo') as varchar) as b, "
        "decode(encode('héllo')) as c"
    ).collect()[0]
    assert r.a == r"\xC3\xA9z"
    assert r.b == r"h\xC3\xA9llo"
    assert r.c == "héllo"  # decode = strict utf-8, not the render
    spark.createDataFrame(
        [(1, bytes([0x61, 0x5C, 0x09, 0xFF]))], "id long, payload binary"
    ).createOrReplaceTempView("blob_t")
    r = psql.sql(
        "from blob_t |> select payload::VARCHAR as s"
    ).collect()[0]
    assert r.s == r"a\x5C\x09\xFF"


def test_wav_24bit_decode():
    import struct

    import numpy as np

    from duckdb_psql_spark.operators.wav import decode_wav

    # hand-built 24-bit PCM: full-scale positive, negative, zero
    samples = [(1 << 23) - 1, -(1 << 23), 0]
    data = b"".join(
        struct.pack("<i", v)[:3] for v in samples
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    d = decode_wav(wav)
    assert d["bits"] == 24 and d["n_frames"] == 3
    got = d["samples"][:, 0]
    assert abs(got[0] - (((1 << 23) - 1) / (1 << 23))) < 1e-9
    assert got[1] == -1.0 and got[2] == 0.0
    # WAVE_FORMAT_EXTENSIBLE wrapper around the same PCM
    ext = struct.pack("<HHIIHHH", 0xFFFE, 1, 8000, 8000 * 3, 3, 24, 22)
    ext += struct.pack("<HI", 24, 4) + struct.pack("<H", 1) + b"\x00" * 14
    body2 = (b"WAVE" + b"fmt " + struct.pack("<I", len(ext)) + ext
             + b"data" + struct.pack("<I", len(data)) + data)
    d2 = decode_wav(b"RIFF" + struct.pack("<I", len(body2)) + body2)
    assert d2["bits"] == 24 and np.allclose(d2["samples"], d["samples"])


def test_image_stats_real_pixels(spark, psql):
    """image_stats computes REAL statistics from decoded pixels: a
    synthetic solid-color PNG must yield exactly its channel values."""
    import numpy as np

    from duckdb_psql_spark.operators.multimodal import (
        MEDIA_SCHEMA, image_stats, image_stats_row,
    )
    from duckdb_psql_spark.operators.png import encode_png

    # 4x2 solid color (r=200, g=100, b=50)
    px = bytes([200, 100, 50] * 8)
    payload = encode_png(4, 2, px, color_type=2)
    r = image_stats_row(payload)
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (200.0, 100.0, 50.0)
    luma = (77 * 200 + 150 * 100 + 29 * 50) >> 8
    assert r["luma_mean"] == float(luma)
    hist = [int(x) for x in r["luma_hist"].split(",")]
    assert sum(hist) == 8 and hist[min(luma // 32, 7)] == 8
    # distributed path + pipe verb, with a corrupt row alongside
    media = spark.createDataFrame(
        [(1, "image", "png", payload, 4, 2, None, len(payload)),
         (2, "image", "png", b"\x13\x37 garbage", None, None, None, 12)],
        MEDIA_SCHEMA,
    )
    media.createOrReplaceTempView("img_media")
    rows = {r.media_id: r for r in psql.sql(
        "from img_media |> image_stats"
    ).collect()}
    assert rows[1].mean_r == 200.0 and rows[1].error is None
    assert rows[2].error is not None and rows[2].mean_r is None
    assert image_stats(media).count() == 2


def test_media_features_real_luma_grid(spark):
    """Image features are now REAL: a solid-color PNG yields a constant
    luma grid; two near-identical images land nearby, a different one
    far — the aHash-family property the fake digest never had."""
    import json

    from duckdb_psql_spark.operators.multimodal import (
        MEDIA_SCHEMA, extract_features,
    )
    from duckdb_psql_spark.operators.png import encode_png

    def solid(rgb, w=8, h=8):
        return encode_png(w, h, bytes(list(rgb) * (w * h)), color_type=2)

    rows = [
        (1, "image", "png", solid((200, 100, 50)), 8, 8, None, 0),
        (2, "image", "png", solid((200, 100, 52)), 8, 8, None, 0),  # near-dup
        (3, "image", "png", solid((10, 10, 10)), 8, 8, None, 0),    # far
        (4, "audio", "wav", b"not an image", None, None, None, 0),  # fallback
    ]
    feats = {
        r.media_id: json.loads(r.feature)
        for r in extract_features(
            spark.createDataFrame(rows, MEDIA_SCHEMA), dim=4
        ).collect()
    }
    luma = ((77 * 200 + 150 * 100 + 29 * 50) >> 8) / 255.0
    assert all(abs(v - round(luma, 6)) < 1e-6 for v in feats[1])
    d12 = sum((a - b) ** 2 for a, b in zip(feats[1], feats[2]))
    d13 = sum((a - b) ** 2 for a, b in zip(feats[1], feats[3]))
    assert d12 < d13  # near-dup closer than the different image
    assert len(feats[4]) == 4  # non-image fallback keeps the shape


def test_synthetic_media_audio_is_real_wav(spark, psql, tmp_path):
    """synthetic_media's audio rows now decode for real: audio_decode
    over the media table yields matching durations with no errors."""
    from duckdb_psql_spark.operators.multimodal import (
        decode_audio, synthetic_media,
    )

    media = synthetic_media(spark, 30)
    decoded = {r.media_id: r for r in decode_audio(media).collect()}
    meta = {r.media_id: r for r in media.filter("kind = 'audio'").collect()}
    assert decoded and set(decoded) == set(meta)
    for mid, r in decoded.items():
        assert r.error is None and r.sample_rate == 8000
        assert r.duration_ms == meta[mid].duration_ms


def test_blob_chain_and_strict_decode(psql):
    """Round-10 review findings: expr::blob::varchar takes the \\xNN
    render (not a UTF-8 reinterpretation); decode(blob) ERRORS on
    invalid UTF-8 like DuckDB instead of substituting U+FFFD."""
    r = psql.sql(
        "select encode('a' || chr(92) || 'b')::BLOB::VARCHAR as s"
    ).collect()[0]
    assert r.s == r"a\x5Cb"
    with pytest.raises(Exception, match="MALFORMED_CHARACTER_CODING"):
        psql.sql("select decode(unhex('ff')) as d").collect()
