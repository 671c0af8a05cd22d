"""End-to-end training-pipeline composition guard (VERDICT r8 #10).

examples/training_pipeline_demo.py caught a real composition bug in
round 7 (hash-domain collision between stratify and hash_split made the
split fractions collapse). This test runs the same stage chain —
curation → exact+near dedup → decontamination → stratified mix →
deterministic split → token packing — and asserts the invariants that
composition bugs break, so the classes stay locked in the suite rather
than in a demo someone has to run by hand.
"""

import pytest


@pytest.fixture(scope="module")
def pipeline(psql, sf_dir):
    curated = psql.sql(f"""
        from '{sf_dir}/documents.parquet' |>
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
    curated.createOrReplaceTempView("tp_curated")
    deduped = psql.sql(
        "from tp_curated |> dedup by text |> "
        "dedup_canonical id=doc_id threshold=0.5"
    )
    deduped.createOrReplaceTempView("tp_deduped")
    yield psql
    for v in ("tp_curated", "tp_deduped"):
        psql.spark.catalog.dropTempView(v)


def test_strip_html_in_chain(pipeline, psql, sf_dir):
    """The strip is exact on wrapped docs and a no-op on clean ones:
    the curated text must equal the ORIGINAL document text for every
    surviving row (markup added to every third doc, then stripped)."""
    diff = psql.sql(f"""
        from tp_curated |>
        select doc_id, text as ctext |>
        as c join '{sf_dir}/documents.parquet' as d on c.doc_id = d.doc_id |>
        where ctext <> text |>
        select count() as n
    """).collect()[0].n
    assert diff == 0


def test_dedup_rate_band(pipeline):
    psql = pipeline
    n_cur = psql.sql("from tp_curated").count()
    n_exact = psql.sql(
        "from tp_curated |> select count(distinct text) as n"
    ).collect()[0].n
    n_dedup = psql.sql("from tp_deduped").count()
    assert n_cur > 0
    # exact dedup can only shrink to the distinct-text count; the near-
    # dup closure can only shrink further — and not to nothing
    assert n_dedup <= n_exact <= n_cur
    assert n_dedup >= max(1, n_cur // 10)


def test_decontamination_counts(pipeline, tmp_path):
    psql = pipeline
    eval_path = str(tmp_path / "evalset.parquet")
    psql.sql(
        f"copy (from tp_deduped |> select text |> limit 2) "
        f"to '{eval_path}' (format parquet)"
    )
    flagged = psql.sql(
        f"from tp_deduped |> contamination '{eval_path}' k=8"
    )
    n_total = flagged.count()
    n_contam = flagged.filter("contaminated").count()
    n_clean = flagged.filter("not contaminated").count()
    assert n_contam + n_clean == n_total
    # the two eval docs came FROM the deduped corpus: they must flag
    # themselves (8-gram self-overlap), so >= the eval docs long enough
    # to contain an 8-gram
    assert n_contam >= 1


def test_stratify_exact_fractions_and_determinism(pipeline):
    psql = pipeline
    base = {
        r.lang: r.n
        for r in psql.sql(
            "from tp_deduped |> select lang, count() as n group by lang"
        ).collect()
    }
    q = "from tp_deduped |> stratify by lang frac=0.8 id=doc_id"
    got = {
        r.lang: r.n
        for r in psql.sql(
            f"{q} |> select lang, count() as n group by lang"
        ).collect()
    }
    for lang, n in base.items():
        sel = got.get(lang, 0)
        # exact-proportion contract: floor/ceil of 0.8*n per stratum
        assert abs(sel - 0.8 * n) < 1, (lang, n, sel)
    ids_a = {r.doc_id for r in psql.sql(f"{q} |> select doc_id").collect()}
    ids_b = {r.doc_id for r in psql.sql(f"{q} |> select doc_id").collect()}
    assert ids_a == ids_b  # md5-ordered selection is deterministic


def test_split_fractions_after_stratify(pipeline):
    # the round-7 composition bug class: stratify's hash domain must not
    # correlate with hash_split's, or split fractions collapse
    psql = pipeline
    df = psql.sql(
        "from tp_deduped |> stratify by lang frac=0.8 id=doc_id |> "
        "hash_split key=doc_id train=0.9 val=0.05 test=0.05"
    )
    counts = {r.split: r.n for r in
              df.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    total = sum(counts.values())
    assert total > 0
    assert set(counts) <= {"train", "val", "test"}
    assert counts.get("train", 0) / total > 0.6
    assert counts.get("train", 0) / total < 1.0  # val/test not empty-ish
    assert counts.get("val", 0) + counts.get("test", 0) > 0


def test_pack_bins_budget_and_partition(pipeline):
    psql = pipeline
    df = psql.sql(
        "from tp_deduped |> "
        "hash_split key=doc_id train=0.9 val=0.05 test=0.05 |> "
        "token_count |> "
        "pack_bins key=doc_id tokens=n_tokens target=2000 |> "
        "select doc_id, split, bin_id, n_tokens"
    )
    rows = df.collect()
    assert rows
    # every doc lands in exactly one bin
    assert len({r.doc_id for r in rows}) == len(rows)
    # bin budget: a bin exceeds the target only via its single largest
    # doc (first-fit contract: a doc larger than target gets its own bin)
    from collections import defaultdict

    bins = defaultdict(list)
    for r in rows:
        bins[(r.split, r.bin_id)].append(r.n_tokens)
    for key, toks in bins.items():
        if len(toks) > 1:
            assert sum(toks) - max(toks) < 2000, (key, toks)


def test_semdedup_dsir_pack_chain(pipeline, sf_dir, tmp_path):
    """Round-10 (VERDICT r9 #10): semdedup and the contamination ->
    DSIR -> pack chain ride the end-to-end pipeline. Invariants:
    semdedup only shrinks and keeps exactly the non-dup rows; the
    DSIR-selected subset survives split+pack with every row assigned a
    split and a bin, and no doc duplicated across bins."""
    psql = pipeline
    semkept = psql.sql(f"""
        from '{sf_dir}/embeddings.parquet' |>
        semdedup id=vec_id vec=embedding threshold=0.97 clusters=8 |>
        where not is_semdup |>
        as sd join tp_deduped as d on sd.vec_id = d.doc_id |>
        select doc_id, lang, text
    """)
    semkept.createOrReplaceTempView("tp_semkept")
    try:
        n_dedup = psql.sql("from tp_deduped").count()
        n_sem = semkept.count()
        assert 0 < n_sem <= n_dedup
        # DSIR target = the English slice; weights must exist for every row
        target = str(tmp_path / "dsir_target.parquet")
        psql.sql(
            f"copy (from tp_semkept |> where lang = 'en' |> "
            f"select doc_id, text |> limit 50) to '{target}' (format parquet)"
        )
        psql.sql(f"""
            create or replace temp table tp_dsir_sel as (|
              from tp_semkept |> dsir '{target}' buckets=512 |>
              where dsir_weight >= 0 |> select doc_id
            |)
        """)
        packed = psql.sql("""
            from tp_semkept |>
            as s semi join tp_dsir_sel as w on s.doc_id = w.doc_id |>
            hash_split key=doc_id train=0.9 val=0.05 test=0.05 |>
            token_count |>
            pack_bins key=doc_id tokens=n_tokens target=2000 |>
            select doc_id, split, bin_id, n_tokens
        """)
        rows = packed.collect()
        n_sel = psql.sql("from tp_dsir_sel").count()
        assert len(rows) == n_sel > 0
        assert {r.split for r in rows} <= {"train", "val", "test"}
        assert all(r.bin_id is not None for r in rows)
        assert len({r.doc_id for r in rows}) == len(rows)
    finally:
        psql.spark.catalog.dropTempView("tp_semkept")


def test_round10_filter_dedup_tfidf_chain(pipeline):
    """Round-10 operators composed end-to-end: C4 line filter (over
    synthesized multi-line docs) → Gopher rules → corpus-wide paragraph
    dedup → per-doc tf-idf. Locks the invariants each stage must
    preserve through the chain."""
    psql = pipeline
    out = psql.sql("""
        from tp_deduped |>
        select doc_id, replace(text || ' merge end', ' merge ', '.' || chr(10)) as text |>
        c4_clean |>
        where n_lines_kept >= 1 |>
        select doc_id, text_clean as text |>
        gopher_quality |>
        paragraph_dedup |>
        tfidf k=2 |>
        order by doc_id, rank
    """).collect()
    assert out, "chain produced no rows"
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        ranks = sorted(r.rank for r in rows)
        # ranks are dense from 1 and capped at k
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 2
        # tf/df sanity: every scored term occurred and df >= 1
        assert all(r.tf >= 1 and r.df_t >= 1 and r.score > 0 for r in rows)
    # paragraph dedup keeps at most the paragraphs it was given and the
    # corpus-wide survivor count is unique per normalized paragraph
    stats = psql.sql("""
        from tp_deduped |>
        select doc_id, replace(text || ' merge end', ' merge ', '.' || chr(10)) as text |>
        paragraph_dedup |>
        select sum(n_kept) as kept, sum(n_paragraphs) as total
    """).collect()[0]
    assert 0 < stats.kept <= stats.total
    # gopher flags agree between the chained and standalone invocation
    joined = psql.sql("""
        from tp_deduped |>
        gopher_quality |>
        select doc_id, gopher_pass as chained |>
        as a join (| from tp_deduped |> gopher_quality |>
                   select doc_id, gopher_pass as alone |) as b
          on a.doc_id = b.doc_id |>
        where chained <> alone |>
        select count() as n
    """).collect()[0].n
    assert joined == 0


def test_gopher_c4_paradedup_dsir_pack_chain(pipeline, tmp_path):
    """Round-11 (VERDICT r10 #10): the round-10 curation trio feeds the
    DSIR→split→pack tail end-to-end. Invariants: the gopher/c4 gates only
    shrink the corpus; paragraph-dedup output flows into DSIR with every
    surviving doc weighted; split+pack assigns every selected row exactly
    one (split, bin) and respects the token budget for multi-doc bins.
    The gopher gate uses the word-count/word-length/symbol signals rather
    than the full gopher_pass conjunction: the synthetic sf0.001 docs are
    too short for the published stopword/50-word rules (all 476 fail, a
    correct rejection) and an empty chain would test nothing."""
    psql = pipeline
    target = str(tmp_path / "target_docs.parquet")
    psql.sql(
        "copy (from tp_deduped |> where doc_id % 4 = 0 |> "
        f"select doc_id, text) to '{target}' (format parquet)"
    )
    cleaned = psql.sql(f"""
        from tp_deduped |>
        gopher_quality |>
        where g_n_words >= 20 and mean_word_len between 3 and 10
          and symbol_word_ratio <= 0.1 |>
        select doc_id, lang, replace(text || ' merge end',
               ' merge ', '.' || chr(10)) as text |>
        c4_clean |> where n_lines_kept >= 1 |>
        select doc_id, lang, text_clean as text |>
        paragraph_dedup |>
        where n_kept >= 1
    """)
    cleaned.createOrReplaceTempView("tp_r11_cleaned")
    # dsir emits (doc_id, weight) — the demo's semi-join-back pattern
    chained = psql.sql(f"""
        from tp_r11_cleaned |>
        as c join (| from tp_r11_cleaned |> dsir '{target}' buckets=256 |>
                    select doc_id, dsir_weight |) as w
          on c.doc_id = w.doc_id |>
        select doc_id, text, dsir_weight |>
        hash_split key=doc_id train=0.8 val=0.1 test=0.1 |>
        token_count |>
        pack_bins key=doc_id tokens=n_tokens target=500
    """)
    rows = chained.collect()
    assert rows, "chain produced no rows"
    n_in = psql.sql("from tp_deduped |> select count() as n").collect()[0].n
    assert len(rows) <= n_in  # gates only shrink
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))  # one (split, bin) per doc
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.dsir_weight is not None for r in rows)
    assert all(r.n_tokens >= 1 and r.bin_id is not None for r in rows)
    # first-fit contract: a multi-doc bin exceeds the target only via
    # its last-added doc (same invariant as test_pack_bins_budget)
    bins: dict = {}
    for r in rows:
        bins.setdefault((r.split, r.bin_id), []).append(r.n_tokens)
    for key, toks in bins.items():
        if len(toks) > 1:
            assert sum(toks) - max(toks) < 500, (key, toks)
    # determinism: the same chain reproduces the same assignment
    again = chained.collect()
    assert sorted((r.doc_id, r.split, r.bin_id) for r in rows) == sorted(
        (r.doc_id, r.split, r.bin_id) for r in again
    )
