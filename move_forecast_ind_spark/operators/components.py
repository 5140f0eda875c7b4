"""Connected components over duplicate-pair edge lists (dedup clustering).

The dedup cascade (operators.dedup) emits near-duplicate PAIRS; a corpus
dedup at 100 TB needs the transitive closure: A~B and B~C put all three in
one duplicate *cluster*, and exactly one keeper (the minimum doc id, the
same keeper rule as exact_dedup — reference semantics anchor
operators/dedup.py:54) survives per cluster.

Algorithm: iterative **min-label propagation with pointer-doubling
shortcuts**. Each round does

    label(v) ← min( label(v),
                    min_{u ∈ N(v)} label(u),      -- propagate one hop
                    label(label(v)) )             -- shortcut: chase the
                                                  --   current parent

Plain one-hop propagation needs O(diameter) rounds; the shortcut halves
the remaining pointer depth each round, giving the O(log n) convergence of
the MapReduce CC family (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — their alternating large-star/small-star
achieves the same bound by rewriting edges; label+shortcut keeps the edge
set immutable, which lets us checkpoint it once and re-scan).

Each round is a bounded number of equi-join/groupBy shuffles over one
(node, label) row per distinct doc appearing in any pair — orders of
magnitude smaller than the corpus. Convergence is detected with a scalar
changed-label count; iterations are capped so a pathological input cannot
loop forever (the cap raises rather than silently returning a partial
closure). The driver only ever sees the per-round scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .materialize import materialize


def connected_components(
    pairs: DataFrame,  # (doc_a, doc_b) undirected near-dup edges
    max_iter: int = 20,
) -> DataFrame:
    """Transitive closure of a pair list → ``(doc_id, cluster_id)`` with
    ``cluster_id`` = the minimum doc id reachable from ``doc_id``.
    Singletons absent from ``pairs`` carry no row — join back against the
    corpus with COALESCE(cluster_id, doc_id) for the full assignment.

    Deterministic: the min-label fixpoint is order-independent.
    """
    edges = materialize(
        pairs.select(
            F.col("doc_a").cast("long").alias("src"),
            F.col("doc_b").cast("long").alias("dst"),
        )
        .union(
            pairs.select(
                F.col("doc_b").cast("long").alias("src"),
                F.col("doc_a").cast("long").alias("dst"),
            )
        )
        .distinct(),
        "cc-edges",
    )
    # init: label(v) = min(v, min direct neighbor) — one propagation round
    # folded in, so length-≤2 chains converge with zero loop iterations.
    labels = materialize(
        edges.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select(
            F.col("src").alias("doc_id"),
            F.least(F.col("src"), F.col("mn")).alias("cluster_id"),
        ),
        "cc-labels",
    )
    for _ in range(max_iter):
        # one-hop propagation: min label over the neighborhood
        nb = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("cluster_id").alias("nb_label"),
                ),
                on="dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("nb_label").alias("nb_min"))
        )
        # pointer-doubling shortcut: resolve label(label(v)) in the same
        # round (cluster_id is always itself a node id, so the lookup hits)
        parent = labels.select(
            F.col("doc_id").alias("cluster_id"),
            F.col("cluster_id").alias("parent_label"),
        )
        stepped = (
            labels.join(nb, on="doc_id", how="left")
            .join(parent, on="cluster_id", how="left")
            .select(
                "doc_id",
                F.col("cluster_id").alias("old_label"),
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nb_min"), F.col("cluster_id")),
                    F.coalesce(F.col("parent_label"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # eager=False (r14): the changed-count probe right below is the
        # round's first action, so it materializes the checkpoint as a
        # side effect — one job per round instead of two (checkpoint job
        # + probe job). On the parquet path materialize stays eager and
        # the probe is a cheap re-scan, exactly as before.
        stepped = materialize(
            stepped.withColumn(
                "changed", F.col("cluster_id") < F.col("old_label")
            ).select("doc_id", "cluster_id", "changed"),
            "cc-step",
            eager=False,
        )
        n_changed = stepped.filter(F.col("changed")).count()
        labels = stepped.select("doc_id", "cluster_id")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "either the component diameter is astronomically large (raise "
        "max_iter; the shortcut gives log-depth convergence) or the input "
        "edge frame is non-deterministic between rounds (checkpoint it)"
    )


def dedup_clusters(
    pairs: DataFrame,  # (doc_a, doc_b) near-dup pairs from any cascade tier
    max_iter: int = 20,
) -> DataFrame:
    """Cluster roll-up for corpus dedup: one row per duplicate cluster —
    ``(cluster_id, keeper_doc_id, n_members, member_ids)`` with
    keeper = min id (exact_dedup's keeper rule) and members sorted.

    ``member_ids`` is bounded by the cluster size; clusters are near-dup
    groups (typically ≪ 1000 docs), not corpus partitions — a cluster so
    hot it OOMs an aggregation buffer indicates a degenerate similarity
    threshold upstream, not a topology problem here.
    """
    labels = connected_components(pairs, max_iter=max_iter)
    return labels.groupBy("cluster_id").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.array_sort(F.collect_list("doc_id")).alias("member_ids"),
    )
