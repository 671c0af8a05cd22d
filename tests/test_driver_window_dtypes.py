"""Driver-window dtype gate (VERDICT r5 item 2).

The per-round driver hash compares pandas values, so a dtype divergence
(DuckDB HUGEINT -> float64/object vs Spark int64, or Spark int32 vs
DuckDB int64) flips hash_match red even when every value is equal —
this bit q_macro and x_repetition in round 5.  scripts/check_dtypes.py
existed to catch the class pre-round but was skippable; this test runs
the same side-by-side pandas-dtype comparison over EVERY current
_DRIVER_WINDOW member so window rotation can never reintroduce it.
"""

from __future__ import annotations

import numpy as np
import pytest

import duckdb

from duckdb_psql_spark import inventory

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _window_names():
    qs = inventory.queries()
    oracles = inventory.oracle_sql()
    # only hash-compared entries matter: those with an oracle get the
    # exact value-hash; rows-only entries can't dtype-red.
    return [n for n in inventory._DRIVER_WINDOW if n in qs and n in oracles]


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the classes the driver hash is sensitive
    to.  int32 vs int64 and datetime64[ns] vs [us] hash identically (r5's
    green entries include both); int64 vs float64/object (the HUGEINT
    class) does not."""
    k = np.dtype(dtype).kind if str(dtype) != "object" else "O"
    return {"i": "int", "u": "int", "f": "float", "M": "datetime",
            "m": "timedelta", "b": "bool"}.get(k, "object")


@pytest.mark.parametrize("name", _window_names())
def test_driver_window_dtype_parity(name, spark, sf_dir, duck_con):
    fn = inventory.queries()[name]
    sql = inventory.oracle_sql()[name]
    sdf = fn(spark, sf_dir).toPandas()
    odf = duck_con.sql(sql).df()

    scols = {c: str(sdf[c].dtype) for c in sdf.columns}
    ocols = {c: str(odf[c].dtype) for c in odf.columns}
    diffs = []
    for c in sorted(set(scols) | set(ocols)):
        sd, od = scols.get(c, "<missing>"), ocols.get(c, "<missing>")
        if sd == "<missing>" or od == "<missing>" or _kind(sd) != _kind(od):
            diffs.append(f"{c}: spark={sd} duckdb={od}")
    # object-dtype cells holding lists/structs are unhashable for the
    # driver's canonicalizer even when both sides agree — flag those too.
    for c in sorted(set(scols) & set(ocols)):
        if scols[c] == "object" and len(sdf):
            v = sdf[c].iloc[0]
            if isinstance(v, (list, tuple, dict, np.ndarray)):
                diffs.append(f"{c}: list/struct-typed output (unhashable)")
    assert not diffs, f"{name} dtype risk: " + "; ".join(diffs)
