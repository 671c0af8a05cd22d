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
