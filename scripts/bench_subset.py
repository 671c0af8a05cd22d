"""Interleaved spark-vs-duck pair bench for a NAMED QUERY SUBSET and an
arbitrary engine checkout — the per-leg worker for code-version A/Bs.

The round-8 verdict flagged q05/q13 drifting 15-45% worse at sf10 across
rounds; host drift is ±30%, so the only conclusive design is alternating
the code versions rep-by-rep in separate processes on one host (the q03
lesson: round 7's "probably noise" was a real planner regression). This
script is one LEG: it loads the engine package from the given repo path
(HEAD or a worktree pinned to an older commit), runs the named queries
interleaved with their DuckDB oracles, and prints one JSON line.

Usage:
  python scripts/bench_subset.py <engine_repo> <sf_dir> <reps> <q1,q2,...>
"""

from __future__ import annotations

import json
import os
import sys
import time

ENGINE = sys.argv[1]
SF = sys.argv[2]
REPS = int(sys.argv[3])
NAMES = sys.argv[4].split(",")

sys.path.insert(0, ENGINE)
os.chdir(ENGINE)  # spark-warehouse etc. resolve per-checkout

import duckdb  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> None:
    from bench import _jit_warmup

    import __spark_entry__ as entrymod
    from duckdb_psql_spark.session import default_spark

    spark = default_spark(app_name=f"bench-subset-{os.path.basename(ENGINE)}")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    _jit_warmup(spark, SF)
    out: dict = {}
    for name in NAMES:
        sql = oracles.get(name)
        queries[name](spark, SF).write.format("noop").mode("overwrite").save()
        if sql is not None:
            con.execute(sql).fetchall()
        s_times, d_times = [], []
        for _ in range(REPS):
            if sql is not None:
                t0 = time.time()
                con.execute(sql).fetchall()
                d_times.append(round(time.time() - t0, 3))
            t0 = time.time()
            queries[name](spark, SF).write.format("noop").mode(
                "overwrite"
            ).save()
            s_times.append(round(time.time() - t0, 3))
        rec = {"spark": min(s_times), "spark_all": s_times}
        if sql is not None:
            rec["duck"] = min(d_times)
            rec["ratio"] = round(min(s_times) / min(d_times), 2)
        out[name] = rec
    spark.stop()
    print(json.dumps({"engine": ENGINE, "sf_dir": SF, "queries": out}))


if __name__ == "__main__":
    main()
