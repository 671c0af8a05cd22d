"""Adversarial scale test for the collected-group aggregate shims.

mad()/product()/entropy()/top-N arg_min hold ONE GROUP's collect_list
on an executor (in-plan, never on the driver). The bound is per-group
cardinality, not table size: a 100 TB table with bounded groups is
fine; a single 10M-element group materializes one ~80 MB array inside
a task. This test proves the 10M-element case completes with the
CORRECT value (graceful, no silent wrong, no OOM) at the documented
ceiling — VERDICT r7 #8.
"""

from __future__ import annotations

import pytest


N = 10_000_000


@pytest.mark.slow
def test_mad_10m_element_group(psql):
    # values 0..N-1, one group. median = (N-1)/2; sorted |x - median|
    # = {k + 0.5 : k in 0..N/2-1} each twice; its median = N/4.
    df = psql.sql(f"select mad(cast(range as double)) as m from range({N})")
    [row] = df.collect()
    assert row.m == N / 4.0


@pytest.mark.slow
def test_product_10m_element_group(psql):
    # product over 10M elements of 1.0 with one 2.0: exact, no overflow
    df = psql.sql(
        f"select product(case when range = 12345 then 2.0 else 1.0 end) as p "
        f"from range({N})"
    )
    [row] = df.collect()
    assert row.p == 2.0


def test_arg_min_topn_large_group(psql):
    # top-N arg_min collects (key, val) pairs per group — 1M pairs here
    df = psql.sql(
        "select arg_min(range, range % 1000000, 3) as v from range(1000000)"
    )
    [row] = df.collect()
    assert list(row.v)[:3] == [0, 1, 2]


@pytest.mark.slow
def test_semdedup_arrow_oversized_cluster(spark):
    """semdedup Arrow path with ONE oversized cluster (VERDICT r9 #6):
    all rows land in a single pandas group, so the task materializes the
    whole cluster's matrix (rows x dim x 8 bytes) while the gram product
    stays block-wise (block=1024 x cluster). 200k rows x dim 16 = ~26 MB
    matrix + 1024x200k x 8 = ~1.6 GB would be the NAIVE full-gram cost —
    the block path never allocates it. Completes with correct values:
    planted dup pair found, singleton rows kept."""
    import pyspark.sql.functions as F

    from duckdb_psql_spark.operators.dedup import semdedup

    n, dim = 200_000, 16
    # distinct unit-ish vectors per row (id-seeded), plus one planted dup
    base = spark.range(n).select(
        F.col("id").alias("vid"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.cos(F.col("id") * (i + 1) * 0.7918)
        ).alias("vec"),
    )
    dup = base.where("vid = 7").select(
        F.lit(n + 1).cast("long").alias("vid"), "vec"
    )
    df = base.unionByName(dup)
    # one centroid -> one cluster holds every row
    out = semdedup(
        df, id_col="vid", vec_col="vec", threshold=0.9999,
        centroids=[[0.0] * dim], pairwise="arrow",
    )
    dups = {r.vid: r.dup_of for r in out.where("is_semdup").collect()}
    assert dups.get(n + 1) == 7
    # the planted pair is the only (or near-only) dup at this threshold
    assert len(dups) <= 3
    assert out.count() == n + 1
