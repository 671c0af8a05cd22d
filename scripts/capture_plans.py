"""Capture .explain("formatted") for every bench query -> plans/<tag>/.

Usage: python scripts/capture_plans.py <out_dir> [sf_dir]

Mirrors bench.py's setup exactly (tune_for_input + declared keys) so the
captured plans are the plans the driver times. One file per query:
<out_dir>/<name>_<suffix>.txt where suffix comes from the out_dir's
trailing component convention (caller picks e.g. plans/r13 and a
--suffix before/after).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
    os.makedirs(out_dir, exist_ok=True)

    from duckdb_psql_spark.session import default_spark, tune_for_input

    spark = default_spark(app_name="capture-plans")
    tune_for_input(spark, sf_dir)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # same declared-keys setup as bench.py
    from duckdb_psql_spark.inventory import _psql

    _p = _psql(spark)
    for _t, _k in [
        ("region", "r_regionkey"), ("nation", "n_nationkey"),
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
    ]:
        _p.sql(f"declare primary key on '{sf_dir}/{_t}.parquet' ({_k})")
    for _t, _c, _rt, _rk in [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]:
        _p.sql(
            f"declare foreign key on '{sf_dir}/{_t}.parquet' ({_c}) "
            f"references '{sf_dir}/{_rt}.parquet' ({_rk})"
        )

    for name in benchmod.HEADLINE + benchmod.EXTENDED:
        if name not in qs:
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"ERROR: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"captured {name}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
