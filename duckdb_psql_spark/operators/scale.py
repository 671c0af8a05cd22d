"""Scale toolkit: bucketed co-located joins and skew salting.

These are the partitioning levers a 100 TB deployment pulls when AQE's
runtime fixes (broadcast conversion, skew-join splitting) aren't enough:

* **Bucketing** pre-shuffles a table ONCE at write time; every later join
  or aggregation on the bucket keys reads co-located buckets and skips its
  exchange entirely — the plan-level proof is the absence of ``Exchange``
  nodes over both bucketed sides (asserted in tests/test_plans.py-style
  checks in tests/test_scale.py).
* **Salting** breaks a pathological hot key across ``salt`` sub-keys:
  the probe side scatters rows uniformly (deterministic hash-based salt),
  the build side replicates each row ``salt`` times; the join key becomes
  (key, salt) so no single task owns the hot key's whole payload. AQE's
  skew-join splits oversized partitions of sort-merge joins, but salting
  also covers aggregations and works when one hot key exceeds even a
  split partition.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    keys: list[str],
    buckets: int,
    sort_cols: list[str] | None = None,
    one_file_per_bucket: bool = True,
    codec: str | None = None,
) -> DataFrame:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Joins/aggregations between tables bucketed the same way on the same
    keys execute without a shuffle. Bucket count should be sized so one
    bucket ≈ one comfortable task (e.g. 128–512 MB of data per bucket at
    the target scale).

    ``one_file_per_bucket`` (default on) repartitions by the bucket keys
    into exactly ``buckets`` partitions before the write. ``bucketBy``
    splits each WRITE TASK's rows across all buckets, so a 32-partition
    input otherwise produces 32 tiny files per bucket (2048 files for a
    64-bucket table) — the bucketed read then pays per-file open/footer
    costs and loses row-group locality. Spark's repartition hash for the
    keys is the same Murmur3 family bucketBy uses, so each task holds
    exactly one bucket and writes exactly one file. Measured at sf10
    (BENCH_CLUSTER_TUNE, round 12): q03 over one-file twins 2.62 → 1.59 s,
    q08 2.11 → 1.19 s — the difference between missing and beating the
    2.5× co-location bar. The pre-write shuffle this adds is the
    pay-once ingest shuffle co-location exists to amortize.
    """
    spark = df.sparkSession
    # simple unqualified identifiers only: the stale-directory cleanup
    # below derives a filesystem path from the name, so separators or
    # qualification (db.tbl lives under <db>.db/) must not reach rmtree
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table_name):
        raise ValueError(
            f"write_bucketed: table name must be a simple unqualified "
            f"identifier, got {table_name!r}"
        )
    # a stale managed-table directory (e.g. from a previous session whose
    # metastore is gone) makes saveAsTable fail with LOCATION_ALREADY_EXISTS
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    if one_file_per_bucket and keys:
        df = df.repartition(buckets, *[F.col(k) for k in keys])
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    )
    if codec:
        # round 14 (guide §6): zstd writes the sf10 lineitem twin as fast
        # as snappy (20.8 vs 28.9 s cold, 21.0 vs 21.7 warm) and 26%
        # smaller (826 MB vs 1.11 GB) — every later co-located scan reads
        # fewer bytes (BENCH_TWIN_WRITE_ANATOMY_sf10_r14.json)
        writer = writer.option("compression", codec)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return spark.table(table_name)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the left side's hot keys scattered across ``salt``
    sub-partitions and the right side replicated to match.

    Left rows get a deterministic salt from non-key columns' hash (falls
    back to a uniform spread via ``monotonically_increasing_id`` when the
    row is all-key); right rows explode ×``salt``. Result equals
    ``left.join(right, on, how)`` for inner/left joins.
    """
    if salt < 2:
        return left.join(right, on, how)
    non_keys = [c for c in left.columns if c not in on]
    if non_keys:
        salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in non_keys]), F.lit(salt))
    else:
        salt_expr = F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    l2 = left.withColumn("__salt", salt_expr.cast("int"))
    r2 = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l2.join(r2, [*on, "__salt"], how)
    return out.drop("__salt")
