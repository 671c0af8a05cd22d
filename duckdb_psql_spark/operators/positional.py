"""POSITIONAL JOIN: DuckDB's zip-by-row-position join (SURVEY.md §2.C).

Spark has no positional join; row position is only meaningful relative to
a deterministic input order. We use ``zipWithIndex`` (distributed, no
single-partition window) on both sides and join on the index. At scale
this costs one count-per-partition pass plus one equi-join shuffle on the
dense index — the unavoidable price of positional semantics in a
distributed engine; the single-partition ``Window.orderBy(lit(1))``
alternative would serialize the whole dataset through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_pos(df: DataFrame, idx_name: str) -> DataFrame:
    schema = df.schema
    rdd = df.rdd.zipWithIndex().map(lambda ri: ri[0] + (ri[1],))
    from pyspark.sql.types import LongType, StructField, StructType

    new_schema = StructType(list(schema.fields) + [StructField(idx_name, LongType(), False)])
    return df.sparkSession.createDataFrame(rdd, new_schema)


def positional_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """FULL OUTER zip by position (DuckDB pads the shorter side with NULLs)."""
    lcols = left.columns
    rmap = {c: (c if c not in lcols else f"{c}_r") for c in right.columns}
    right = right.select(*[F.col(c).alias(rmap[c]) for c in right.columns])
    lz = _with_pos(left, "__lpos")
    rz = _with_pos(right, "__rpos")
    joined = lz.join(rz, lz["__lpos"] == rz["__rpos"], "full_outer")
    return joined.drop("__lpos", "__rpos")
