"""Large property-differential sweep: N random pipelines vs DuckDB.

Drives the same generator/renderer as tests/test_property_differential.py
(filters → optional join → agg OR window+qualify → order → limit) for a
much larger sample than the pytest budget allows.

Usage: python scripts/property_sweep.py [n=250] [sf_dir] [seed]
Exits non-zero on the first mismatch, printing the failing pipeline.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 7


def sample_pipe(rng: random.Random):
    from tests.test_property_differential import (
        AGGS,
        GROUP_KEYS,
        JOIN_GROUP_KEYS,
        JOIN_PREDICATES,
        PREDICATES,
        WINDOWS,
    )

    join = rng.random() < 0.5
    preds = rng.sample(range(len(PREDICATES)), rng.randint(0, 3))
    jpreds = rng.sample(range(len(JOIN_PREDICATES)), rng.randint(0, 2)) if join else []
    win = qualify = None
    if rng.random() < 0.5:
        pool = GROUP_KEYS + (JOIN_GROUP_KEYS if join else [])
        keys = rng.sample(pool, rng.randint(1, min(2, len(pool))))
        aggs = rng.sample(range(len(AGGS)), rng.randint(1, 3))
        limit = None
    else:
        keys, aggs = [], []
        win = rng.choice([None] + list(range(len(WINDOWS))))
        if win in (0, 1):
            qualify = rng.choice([None, 5, 20])
        limit = rng.choice([None, 10, 100])
    return join, preds, jpreds, keys, aggs, win, qualify, limit


def sample_curation_pipe(rng: random.Random):
    terminal = rng.choice(["none", "chunk", "cap", "repetition"])
    norm = rng.random() < 0.5
    lower = rng.random() < 0.5 if norm else True
    punct = rng.random() < 0.5 if norm else False
    redact = (rng.random() < 0.5) if terminal != "repetition" else False
    size, overlap = rng.choice([(20, 0), (20, 5), (50, 10)])
    capn = rng.choice([1, 3, 5])
    return norm, lower, punct, redact, terminal, size, overlap, capn


def main() -> int:
    from duckdb_psql_spark import PsqlSession
    from duckdb_psql_spark.session import default_spark
    from tests.test_property_differential import check_one, check_one_curation

    spark = default_spark(app_name="property-sweep", cpus=8)
    psql = PsqlSession(spark)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    rng = random.Random(SEED)
    for i in range(N):
        # ~1/3 of the budget goes to curation-verb pipelines (round 6:
        # the r5 surface under the same randomized pressure)
        curation = rng.random() < 0.34
        try:
            if curation:
                check_one_curation(psql, con, sample_curation_pipe(rng), SF)
            else:
                check_one(psql, con, sample_pipe(rng), SF)
        except AssertionError as e:
            print(f"MISMATCH at pipeline {i} (curation={curation}): {e}")
            return 1
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{N} ok")
    print(f"ALL {N} PIPELINES MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
