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
