"""SUMMARIZE: per-column profile of a relation, DuckDB-style.

DuckDB ships a ``SUMMARIZE <table|query>`` statement that returns one row
per column with min/max/approx_unique/avg/std/quartiles/count/null %.
Spark has no equivalent statement; this operator computes the same shape
as ONE distributed aggregation pass (every stat for every column in a
single Aggregate node — one job, no driver-side per-column loops), then
pivots the single result row to per-column rows with explode(array(...)),
which stays in the plan (no collect).

Numeric quartiles use percentile_approx, mirroring DuckDB's approximate
quantiles; approx_unique uses approx_count_distinct (HLL in both engines,
different sketches — values are engine-specific, like DuckDB's own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_ORDERED = _NUMERIC + (
    T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType, T.BooleanType
)


def summarize(df: DataFrame) -> DataFrame:
    """One row per column: column_name, column_type, min, max,
    approx_unique, avg, std, q25, q50, q75, count, null_percentage."""
    aggs = []
    for f in df.schema.fields:
        c = F.col(f"`{f.name}`")
        numeric = isinstance(f.dataType, _NUMERIC)
        ordered = isinstance(f.dataType, _ORDERED)
        s = lambda col: col.cast("string")  # noqa: E731 — mixed types → string
        aggs += [
            (s(F.min(c)) if ordered else F.lit(None).cast("string")).alias(f"__min_{f.name}"),
            (s(F.max(c)) if ordered else F.lit(None).cast("string")).alias(f"__max_{f.name}"),
            F.approx_count_distinct(c).alias(f"__uniq_{f.name}"),
            (F.avg(c) if numeric else F.lit(None).cast("double")).alias(f"__avg_{f.name}"),
            (F.stddev(c) if numeric else F.lit(None).cast("double")).alias(f"__std_{f.name}"),
            (F.percentile_approx(c, 0.25) if numeric else F.lit(None)).cast("double").alias(f"__q25_{f.name}"),
            (F.percentile_approx(c, 0.50) if numeric else F.lit(None)).cast("double").alias(f"__q50_{f.name}"),
            (F.percentile_approx(c, 0.75) if numeric else F.lit(None)).cast("double").alias(f"__q75_{f.name}"),
            F.count(F.lit(1)).alias(f"__cnt_{f.name}"),
            F.count(c).alias(f"__nn_{f.name}"),
        ]
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(f.name).alias("column_name"),
            F.lit(f.dataType.simpleString()).alias("column_type"),
            F.col(f"__min_{f.name}").alias("min"),
            F.col(f"__max_{f.name}").alias("max"),
            F.col(f"__uniq_{f.name}").alias("approx_unique"),
            F.col(f"__avg_{f.name}").alias("avg"),
            F.col(f"__std_{f.name}").alias("std"),
            F.col(f"__q25_{f.name}").alias("q25"),
            F.col(f"__q50_{f.name}").alias("q50"),
            F.col(f"__q75_{f.name}").alias("q75"),
            F.col(f"__cnt_{f.name}").alias("count"),
            F.round(
                (F.col(f"__cnt_{f.name}") - F.col(f"__nn_{f.name}"))
                * 100.0
                / F.greatest(F.col(f"__cnt_{f.name}"), F.lit(1)),
                2,
            ).alias("null_percentage"),
        )
        for f in df.schema.fields
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
