"""Deterministic hash-based dataset splitting (train/val/test).

A training-data pipeline needs splits that are (a) reproducible across
runs and engines, (b) stable under re-partitioning and appends — row
membership must depend only on the row's key, never on row order,
partition layout, or an RNG stream. ``df.sample``/``USING SAMPLE`` give
none of that; the standard construction is hashing the key into [0, 1)
and cutting at the cumulative fractions.

Implementation detail that makes it cross-engine-exact: the row's
position in [0, 1) is its md5 hex digest compared LEXICOGRAPHICALLY
against precomputed 32-hex-char boundary strings — fixed-width lowercase
hex compares identically to the 128-bit integer it encodes, so the same
CASE expression runs verbatim in any engine with md5 (the DuckDB
differential oracle does exactly this). No floats anywhere.

Scale: one codegen'd md5 + string compares per row, no shuffle, no
state; the split column is partition-prunable if the output is written
``partitionBy('split')``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 32  # md5 digest length in hex chars (128 bits)


def split_boundaries(splits: dict[str, float]) -> list[tuple[str, str | None]]:
    """(name, upper-boundary hex) per split, last boundary None (catch-all).

    Fractions are normalized; boundaries are floor(cum_frac · 16^32)
    rendered as 32-char zero-padded hex.
    """
    if not splits:
        raise ValueError("splits must name at least one bucket")
    total = float(sum(splits.values()))
    if total <= 0:
        raise ValueError("split fractions must sum to a positive value")
    out: list[tuple[str, str | None]] = []
    names = list(splits)
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name] / total
        bound = min(int(cum * (1 << (4 * _HEX_WIDTH))), (1 << (4 * _HEX_WIDTH)) - 1)
        out.append((name, format(bound, f"0{_HEX_WIDTH}x")))
    out.append((names[-1], None))
    return out


def _bucket_expr(key: Column, boundaries: list[tuple[str, str | None]], salt: str) -> Column:
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    expr: Column | None = None
    for name, bound in boundaries:
        if bound is None:
            expr = F.lit(name) if expr is None else expr.otherwise(F.lit(name))
        elif expr is None:
            expr = F.when(h < F.lit(bound), F.lit(name))
        else:
            expr = expr.when(h < F.lit(bound), F.lit(name))
    return expr


def hash_split(
    df: DataFrame,
    key_col: str,
    *,
    splits: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split-assignment column.

    ``splits`` maps name → fraction (normalized; insertion order defines
    the boundary order, last bucket is the catch-all). ``salt`` yields an
    independent split family from the same keys (e.g. per experiment).
    """
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    bounds = split_boundaries(splits)
    return df.withColumn(out_col, _bucket_expr(F.col(key_col), bounds, salt))


def hash_split_sql_case(key_sql: str, splits: dict[str, float], salt: str = "") -> str:
    """The equivalent ANSI-SQL CASE expression (used by the DuckDB oracle;
    also handy for pushing the split into any other engine)."""
    bounds = split_boundaries(splits)
    h = f"md5('{salt}' || CAST({key_sql} AS VARCHAR))" if salt else f"md5(CAST({key_sql} AS VARCHAR))"
    whens = "".join(
        f" WHEN {h} < '{bound}' THEN '{name}'"
        for name, bound in bounds
        if bound is not None
    )
    return f"CASE{whens} ELSE '{bounds[-1][0]}' END"


def pack_token_bins(
    df: DataFrame,
    *,
    key_col: str,
    token_col: str,
    target_tokens: int,
    out_col: str = "bin_id",
    bucket_hex: int = 2,
) -> DataFrame:
    """Pack rows into ~``target_tokens``-sized bins (training-shard
    assignment): each row's bin is ``floor(start_offset / target)`` where
    ``start_offset`` is the cumulative token count of all rows BEFORE it
    in a deterministic global order.

    The order is ``(md5(key)[:bucket_hex], key)`` — md5-bucketing both
    shuffles rows pseudo-randomly across bins (no topic clumping from
    ingest order) and makes the distributed prefix sum scale-safe:

    * rows shuffle once on the 16^bucket_hex hash buckets; a per-bucket
      window computes the within-bucket running sum,
    * bucket start-offsets come from a bucket-totals aggregate (metadata-
      sized: 256 rows for bucket_hex=2) prefix-summed in-plan and
      broadcast back — no driver-side job, composition stays lazy,
    * everything is exact integer arithmetic on a deterministic order, so
      the assignment is reproducible across runs, partitionings, and
      engines (the DuckDB oracle is a single ORDER BY (bucket, key)
      running sum).

    ``key_col`` must be unique (it is the tie-break). Bins slightly
    overflow ``target_tokens`` when a row crosses a boundary — standard
    greedy packing; no row is split.
    """
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    bkt = F.substring(F.md5(F.col(key_col).cast("string")), 1, bucket_hex)
    dfb = df.withColumn("__bkt", bkt)
    tok = F.col(token_col).cast("long")
    totals = dfb.groupBy("__bkt").agg(F.sum(tok).alias("__tot"))
    from pyspark.sql import Window

    owin = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(owin), F.lit(0))
    ).select("__bkt", "__off")
    joined = dfb.join(F.broadcast(offsets), "__bkt")
    cwin = (
        Window.partitionBy("__bkt")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.col("__off") + F.sum(tok).over(cwin) - tok
    return joined.withColumn(
        out_col, F.floor(start / F.lit(target_tokens)).cast("long")
    ).drop("__bkt", "__off")
