"""Corpus-curation operators: per-group document caps.

A standard training-data step: bound how many documents any one domain /
source contributes (a handful of hosts otherwise dominate a web corpus).
Charter extended surface — no reference analogue; expressed as a ranked
window + filter so Catalyst plans one shuffle on the group key and AQE's
skew handling applies to hot domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cap_per_group(
    df: DataFrame,
    keys: list[str],
    n: int,
    order_by: str,
    *,
    descending: bool = False,
) -> DataFrame:
    """Keep at most ``n`` rows per ``keys`` group, ranked by ``order_by``.

    ``order_by`` should be a (near-)unique column — ranking ties would
    make the kept set nondeterministic, so ``row_number`` is ordered by
    (order_by, keys) to pin it. One shuffle on the group key; the window
    is rank-only (no full-partition buffering beyond the sort run).
    At 100 TB a per-domain cap is exactly the skewed-key case — AQE skew
    splitting cannot split a window partition, so very hot groups cost
    one task each; acceptable because the output is capped at ``n``.
    """
    oc = F.col(order_by).desc() if descending else F.col(order_by).asc()
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(oc)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
