"""connected_components / dedup_canonical (operators/graph.py)."""

import pytest

from duckdb_psql_spark.operators.graph import connected_components, dedup_canonical


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r.id: r.component for r in rows}


def test_single_pair(spark):
    assert _cc(spark, [(1, 2)]) == {1: 1, 2: 1}


def test_path_graph_long_chain(spark):
    # a 12-hop path: naive one-hop propagation needs 12 rounds; the
    # star-contraction algorithm collapses it in O(log^2 n)
    edges = [(i, i + 1) for i in range(1, 13)]
    got = _cc(spark, edges)
    assert got == {i: 1 for i in range(1, 14)}


def test_transitive_merge_across_disjoint_pairs(spark):
    # (3,7) and (7,11) never share a pair (3,11) — closure must merge
    got = _cc(spark, [(3, 7), (7, 11), (20, 21)])
    assert got == {3: 3, 7: 3, 11: 3, 20: 20, 21: 20}


def test_direction_and_duplicates_irrelevant(spark):
    got = _cc(spark, [(5, 2), (2, 5), (5, 2), (9, 5)])
    assert got == {2: 2, 5: 2, 9: 2}


def test_star_and_cycle(spark):
    # hub-and-spoke plus a cycle closing back
    edges = [(1, 2), (1, 3), (1, 4), (4, 5), (5, 2)]
    got = _cc(spark, edges)
    assert got == {i: 1 for i in range(1, 6)}


def test_dedup_canonical_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 8)], "doc_id long, body string"
    )
    pairs = spark.createDataFrame(
        [(2, 6), (6, 3), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in dedup_canonical(docs, pairs, "doc_id").collect()
    )
    # cluster {2,3,6} -> keep 2; cluster {4,5} -> keep 4; 1 and 7 singleton
    assert kept == [1, 2, 4, 7]


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=0)


def test_components_pipe_verb(psql, sf_dir):
    df = psql.sql(
        f"from '{sf_dir}/documents.parquet' |>"
        " minhash_dedup id=doc_id text=text threshold=0.4 |> components"
    )
    assert df.columns == ["id", "component"]
    rows = df.collect()
    assert all(r.component <= r.id for r in rows)


def test_dedup_canonical_pipe_verb(psql, sf_dir):
    total = psql.sql(f"from '{sf_dir}/documents.parquet'").count()
    kept = psql.sql(
        f"from '{sf_dir}/documents.parquet' |>"
        " dedup_canonical id=doc_id text=text threshold=0.4"
    ).count()
    assert 0 < kept <= total
