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


def stratified_sample(
    df: DataFrame,
    keys: list[str],
    fraction: float,
    id_col: str,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-group EXACT-fraction sample: keep
    ``ceil(fraction * |group|)`` rows per ``keys`` group, chosen by
    md5(id || salt) order — reproducible across engines and runs (no
    RNG), re-saltable for independent draws.

    A standard training-mix step: downsample dominant languages/sources
    while keeping per-group proportions exact (Bernoulli sampling only
    hits the fraction in expectation; on small groups the variance is
    material). One shuffle on the group key; the window is rank-only.
    At 100 TB the exact variant costs a per-group sort — for very hot
    groups prefer the threshold approximation (``hash_split`` buckets),
    which is shuffle-free; this operator is the small/medium-group
    exact path.
    """
    # domain-separated hash: a bare md5(id) would be CORRELATED with
    # hash_split's md5(salt || id) assignment — stratify's survivors
    # (the low-hash rows) would all land in the first split bucket
    # (caught live: stratify |> hash_split produced 100% train)
    ordk = F.md5(F.concat(F.lit("stratify:" + salt), F.col(id_col).cast("string")))
    part = [F.col(k) for k in keys]
    w = Window.partitionBy(*part).orderBy(ordk)
    wc = Window.partitionBy(*part)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .filter(F.col("__rn") <= F.ceil(F.lit(float(fraction)) * F.col("__n")))
        .drop("__rn", "__n")
    )


def weighted_mix(
    sources: "dict[str, DataFrame]",
    weights: "dict[str, float]",
    id_col: str,
    *,
    salt: str = "",
    source_col: str = "__source",
) -> DataFrame:
    """Build a training mixture with EXACT source proportions.

    Given named sources and target weights, finds the largest total T
    such that every source can supply its share (T = min_i |src_i| /
    p_i, the standard feasibility bound), takes exactly
    ``round(p_i * T)`` rows from each source by md5(id || salt) order
    (deterministic — the same mixture every run; re-salt for an
    independent draw), tags each row with ``source_col``, and unions by
    name. The per-source counts are the only driver-side values (one
    count() per source — scalars, not data). Selection is a rank-only
    window per source: one shuffle each at 100 TB, and a source whose
    weight exceeds its share simply caps the total rather than
    repeating rows (no upsampling — duplicate documents are what the
    dedup stages exist to remove). Per-source selection is
    ``orderBy(md5).limit(n)`` — Spark plans TakeOrderedAndProject
    (distributed partial top-n, no global single-task sort), so the
    deterministic draw scales.
    """
    total_w = sum(weights[k] for k in sources)
    props = {k: weights[k] / total_w for k in sources}
    sizes = {k: df.count() for k, df in sources.items()}
    feasible_total = min(sizes[k] / props[k] for k in sources if props[k] > 0)
    out = None
    for k, df in sources.items():
        take = int(round(props[k] * feasible_total))
        if take <= 0:
            continue
        # domain-separated like stratified_sample (see note there)
        ordk = F.md5(F.concat(F.lit("mix:" + salt), F.col(id_col).cast("string")))
        picked = (
            df.orderBy(ordk)
            .limit(take)
            .withColumn(source_col, F.lit(k))
        )
        out = picked if out is None else out.unionByName(picked)
    if out is None:
        raise ValueError("weighted_mix: no source contributes rows")
    return out
