"""POSITIONAL JOIN: DuckDB's zip-by-row-position join (SURVEY.md §2.C).

Spark has no positional join; row position is only meaningful relative to
a deterministic input order (for file sources: file/row-group order, the
same order DuckDB uses). The dense index is built entirely JVM-side:

1. tag rows with ``spark_partition_id`` + ``monotonically_increasing_id``
   (monotone within a partition),
2. per-partition position via ``row_number`` windowed on the partition id,
3. partition row-counts (a tiny aggregate) → cumulative offsets, applied
   as a literal map — global position = offset[pid] + local_pos.

Costs one small counting job and one window shuffle, but never ships rows
through Python: the ``df.rdd.zipWithIndex`` alternative serializes every
row to the Python worker and back, which at 100 TB is orders of magnitude
worse than a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_pos(df: DataFrame, idx_name: str) -> DataFrame:
    tagged = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("__pid").orderBy("__mid")
    tagged = tagged.withColumn("__local", F.row_number().over(w))
    counts = (
        tagged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["cnt"]
    if not offsets:
        offsets = {0: 0}
    off_map = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv]
    )
    return (
        tagged.withColumn(
            idx_name,
            (off_map[F.col("__pid")] + F.col("__local") - 1).cast("long"),
        )
        .drop("__pid", "__mid", "__local")
    )


def positional_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """FULL OUTER zip by position (DuckDB pads the shorter side with NULLs)."""
    lcols = left.columns
    rmap = {c: (c if c not in lcols else f"{c}_r") for c in right.columns}
    right = right.select(*[F.col(c).alias(rmap[c]) for c in right.columns])
    lz = _with_pos(left, "__lpos")
    rz = _with_pos(right, "__rpos")
    joined = lz.join(rz, lz["__lpos"] == rz["__rpos"], "full_outer")
    return joined.drop("__lpos", "__rpos")
