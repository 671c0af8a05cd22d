"""Interval (range) join — the charter's named custom-operator example.

``interval_join(L, R)`` pairs every left row with the right rows whose
timestamp falls in ``[l_ts + lower, l_ts + upper]`` (optionally also
matching equi keys). The naive Spark plan for a pure inequality join is
a broadcast-nested-loop — O(|L|·|R|) and a scale killer. This operator
uses the standard bucketized range-join strategy (the same idea behind
Databricks' range-join optimization and KDB's window joins):

1. pick a bucket width = the window span (upper - lower),
2. explode each LEFT row to the (usually 2) buckets its window overlaps,
3. tag each RIGHT row with its single bucket,
4. EQUI-join on (keys…, bucket) — a plain shuffled/broadcast hash join
   Catalyst can plan and AQE can skew-split,
5. filter the exact range predicate and drop the helper columns.

Every candidate pair is seen exactly once per overlapping bucket, and a
right row only ever carries one bucket, so no dedup is needed. Cost is
|L|·(spans/width + 1) exploded rows — bounded ×2 at the default width.

A streaming twin (`stream_interval_join`) maps the same semantics onto
Spark's native stream-stream join: watermarks on both sides + a
time-range condition (no bucketing needed — the state store bounds the
join window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch(df: DataFrame, col: str):
    """Numeric seconds for numeric or timestamp(_ntz) columns."""
    t = dict(df.dtypes).get(col, "")
    c = F.col(col)
    if t.startswith("timestamp"):
        # NTZ casts through session-tz LTZ; both sides convert identically
        # so any zone offset cancels in the range arithmetic
        return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)
    return c.cast("double")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    lower: float,
    upper: float,
    keys: list[str] | None = None,
    how: str = "inner",
    bucket_width: float | None = None,
) -> DataFrame:
    """Join rows where ``right.right_ts`` ∈ [left.left_ts+lower, +upper].

    ``keys`` adds equi-join columns (same name both sides). ``how``
    supports inner/left (left outer keeps unmatched left rows).
    ``bucket_width`` defaults to the window span; both timestamp columns
    may be TIMESTAMP or numeric (cast to epoch seconds).
    """
    if upper < lower:
        raise ValueError(f"upper ({upper}) must be >= lower ({lower})")
    span = float(upper - lower)
    w = float(bucket_width) if bucket_width else (span if span > 0 else 1.0)
    keys = keys or []

    l_ts = _epoch(left, left_ts)
    r_ts = _epoch(right, right_ts)
    lo_bucket = F.floor((l_ts + F.lit(float(lower))) / F.lit(w))
    hi_bucket = F.floor((l_ts + F.lit(float(upper))) / F.lit(w))
    lhs = left.withColumn("__rj_lts", l_ts).withColumn(
        "__rj_bucket", F.explode(F.sequence(lo_bucket, hi_bucket))
    )
    rhs = right.withColumn("__rj_rts", r_ts).withColumn(
        "__rj_bucket", F.floor(r_ts / F.lit(w))
    )

    # disambiguate overlapping right columns (keys included, suffixed _r;
    # the key copies are dropped after the join)
    overlap = [c for c in right.columns if c in left.columns]
    renames = {c: f"{c}_r" for c in overlap}
    rhs = rhs.withColumnsRenamed(renames)

    cond = lhs["__rj_bucket"] == rhs["__rj_bucket"]
    for k in keys:
        cond = cond & (lhs[k] == rhs[renames.get(k, k)])
    cond = cond & rhs["__rj_rts"].between(
        lhs["__rj_lts"] + F.lit(float(lower)),
        lhs["__rj_lts"] + F.lit(float(upper)),
    )

    inner = lhs.join(rhs, cond, "inner")
    inner = inner.drop(lhs["__rj_bucket"]).drop(rhs["__rj_bucket"])
    inner = inner.drop("__rj_lts", "__rj_rts")
    for k in keys:
        if k in renames:
            inner = inner.drop(renames[k])
    if how == "inner":
        return inner
    if how == "left":
        # left outer: inner matches plus never-matched left rows
        matched_keys = inner.select(*left.columns).distinct()
        unmatched = left.join(matched_keys, left.columns, "left_anti")
        for c, t in inner.dtypes:
            if c not in left.columns:
                unmatched = unmatched.withColumn(c, F.lit(None).cast(t))
        return inner.unionByName(unmatched)
    raise ValueError(f"how must be inner or left, got {how!r}")


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    lower: float,
    upper: float,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream interval join: watermarks on both sides + a
    time-range condition — Spark's state store evicts rows once they can
    no longer match (watermark + window span), so state stays bounded."""
    keys = keys or []
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    overlap = [c for c in right.columns if c in left.columns]
    renames = {c: f"{c}_r" for c in overlap}
    rw = rw.withColumnsRenamed(renames)
    r_ts_name = renames.get(right_ts, right_ts)
    cond = (
        F.col(r_ts_name)
        >= F.col(left_ts) + F.expr(f"INTERVAL {int(lower)} SECONDS")
    ) & (
        F.col(r_ts_name)
        <= F.col(left_ts) + F.expr(f"INTERVAL {int(upper)} SECONDS")
    )
    for k in keys:
        cond = cond & (F.col(k) == F.col(renames.get(k, k)))
    out = lw.join(rw, cond, "inner")
    return out.drop(*[renames[k] for k in keys if k in renames])
