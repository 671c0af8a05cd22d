"""Dtype parity checker: flags pandas-dtype mismatches between Spark and DuckDB.

The driver's value-hash is dtype/representation sensitive (e.g. DuckDB
HUGEINT surfaces as pandas `object`, Spark BIGINT as `int64` — identical
values, different hash). This script catches that class of red before the
driver does: for every queries() entry with an oracle, compare the pandas
dtype of each output column side by side.

Usage: python scripts/check_dtypes.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
FILT = sys.argv[2] if len(sys.argv) > 2 else ""

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    import __spark_entry__ as entrymod
    from duckdb_psql_spark.session import default_spark

    spark = default_spark(app_name="check-dtypes", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if FILT and not any(f in name for f in FILT.split(",")):
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, SF).toPandas()
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            bad.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        scols = {c: str(sdf[c].dtype) for c in sdf.columns}
        ocols = {c: str(odf[c].dtype) for c in odf.columns}

        def kind(dt: str) -> str:
            # the classes the driver hash is actually sensitive to:
            # int32-vs-int64 and datetime ns-vs-us hash identically
            # (r5/r6 evidence: green window entries carry both), while
            # int-vs-float/object (the HUGEINT class) reds the hash
            import numpy as np

            k = np.dtype(dt).kind if dt != "object" else "O"
            return {"i": "int", "u": "int", "f": "float", "M": "datetime",
                    "m": "timedelta", "b": "bool"}.get(k, "object")

        diffs = []
        for c in sorted(set(scols) | set(ocols)):
            sd, od = scols.get(c, "<missing>"), ocols.get(c, "<missing>")
            if sd == "<missing>" or od == "<missing>" or kind(sd) != kind(od):
                diffs.append(f"{c}: spark={sd} duckdb={od}")
        # object-dtype columns holding lists are unhashable for the driver's
        # canonicalizer even when both sides agree — flag those too.
        for c in sorted(set(scols) & set(ocols)):
            if scols[c] == "object" and len(sdf):
                import numpy as np

                v = sdf[c].iloc[0]
                if isinstance(v, (list, tuple, dict, np.ndarray)):
                    diffs.append(f"{c}: list/struct-typed output (unhashable)")
        if diffs:
            bad.append(name)
            print(f"DIFF {name}: " + "; ".join(diffs))
        else:
            print(f"ok   {name}")
    print(f"\n{len(bad)} queries with dtype risk: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
