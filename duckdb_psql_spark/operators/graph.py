"""Distributed connected components for duplicate-cluster resolution.

Pair-generating dedup operators (minhash_dup_pairs / simhash_dup_pairs /
embedding_dup_pairs, operators/dedup.py) emit EDGES: (id_a, id_b) with
similarity above threshold. Turning edges into a deduplicated corpus
needs one more step — transitive closure into clusters, then one
canonical representative per cluster. (A |> B and B |> C dup pairs must
collapse A, B, C together even when (A, C) never collides in any band.)

The closure here is the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014 — public literature; PAPERS.md): each round is two groupBy/join
passes over the edge list, and the edge set converges to a star forest
where every node points at its component's minimum id in O(log^2 n)
rounds with high probability — independent of graph diameter, unlike
naive min-label propagation whose round count grows with the longest
duplicate chain. At 100 TB scale each round is a pair of key-partitioned
shuffles on the edge list (no driver-side state; the only driver action
per round is the convergence count), and rounds stay logarithmic.

Pure DataFrame ops throughout: codegen'd comparisons, map-side combine
on the min() aggregations, AQE-coalesced shuffles. localCheckpoint every
few rounds truncates the iterative lineage so plans don't grow without
bound (same pattern as operators/similarity.py's k-means).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every larger neighbor of u to u's minimum neighborhood id.

    Emits (v, m(u)) for each undirected edge (u, v) with v > u, where
    m(u) = min(neighbors(u) + {u}).
    """
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
    m = m.select("src", F.least("_mn", F.col("src")).alias("_m"))
    return (
        sym.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u to the minimum of them.

    Operates on edges oriented large→small: for each u, over
    N = {v : (u, v), v <= u} ∪ {u}, emits (x, min(N)) for x ∈ N \\ {min}.
    """
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = oriented.groupBy("src").agg(F.min("dst").alias("_m"))
    lower = (
        oriented.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    )
    self_edge = m.select(F.col("src"), F.col("_m").alias("dst"))
    return lower.union(self_edge).where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 30,
) -> DataFrame:
    """Resolve an edge list into (id, component) with component = min id.

    ``pairs`` is an undirected edge list (duplicate pairs); the result
    assigns every endpoint the minimum id reachable from it. Nodes with
    no edges are absent — callers treat them as singleton components
    (coalesce(component, id) after a left join, see dedup_canonical).
    """
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        # eager checkpoint EVERY round: one round's plan references its
        # input ~6x (sym union, three star passes), so un-truncated
        # lineage grows 6^rounds and OOMs the analyzer long before any
        # data does. localCheckpoint bounds the plan at one round's size;
        # on a cluster, set a reliable spark.checkpoint dir and swap to
        # .checkpoint() if executor loss during the iteration matters.
        .localCheckpoint(eager=True)
    )
    def _sig(e: DataFrame) -> tuple:
        # one map-side-combinable aggregation per round instead of two
        # exceptAll shuffles: (count, sum of row hashes) is an
        # order-independent set signature — equal signatures mean equal
        # edge sets up to a ~2^-64 collision, and the star operators can
        # only converge TO a fixpoint, never oscillate through one
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) accumulator: a long sum of 64-bit hashes
            # overflows under ANSI mode
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row.n, row.h)

    prev_sig = _sig(edges)
    for _it in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        sig = _sig(nxt)
        edges = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # star forest: every src points at its component min; the roots
    # themselves appear only on the dst side, so union them in
    out = edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = edges.select(F.col("dst").alias("id"), F.col("dst").alias("component"))
    result = out.union(roots).groupBy("id").agg(F.min("component").alias("component"))
    edges.unpersist()
    return result


def dedup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one canonical row (minimum id) per duplicate cluster.

    ``pairs`` are duplicate edges over ``df[id_col]``; rows absent from
    ``pairs`` are singletons and always kept. The join against the
    (small) component map broadcasts when it fits.
    """
    from . import dedup as dedup_mod

    comp = connected_components(pairs, src, dst)
    joined = df.join(comp, df[id_col] == comp["id"], "left")
    return dedup_mod.adopt_pins(
        joined.where(
            F.col("component").isNull() | (F.col("component") == F.col(id_col))
        )
        .drop("id", "component"),
        # a pair-miner `pairs` carries persisted intermediates whose
        # ownership must follow THIS result (the local `pairs` is
        # garbage-collected on return, which would unpersist them before
        # the closure ever executes)
        pairs,
    )
