"""Duplicate-cluster assignment: connected components over verified
near-duplicate pairs, with a deterministic representative per cluster.

This is the step that turns pair lists (minhash/simhash/embedding
near-dup output) into an actual corpus-dedup decision: every document
gets a ``cluster_rep`` (the minimum doc id in its component); keeping
``doc_id == cluster_rep`` rows deduplicates the corpus.

Scale shape: iterative min-label propagation expressed as DataFrame
joins — labels(v) := min(labels(v), min over neighbors labels(u)) —
which converges in O(component diameter) rounds.  Near-dup clusters
have tiny diameters (pairs come from shared LSH buckets), so this is
2-4 rounds in practice; for adversarial long-chain graphs the
alternating large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond") halves the round count — the
per-round dataflow here is the same join+min-aggregate shape.  Each
round is lineage-truncated with ``localCheckpoint`` so the plan does
not grow across iterations; no driver-side state beyond the
convergence counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = 'doc_id',
    a_col: str = 'a_id',
    b_col: str = 'b_id',
    max_iter: int = 25,
) -> DataFrame:
    """(id_col, cluster_rep) for every node; cluster_rep = min id in the
    node's connected component (singletons map to themselves).

    Deterministic under any partitioning: the fixpoint of a min-fold is
    order-independent.
    """
    edges = pairs.select(F.col(a_col).alias('u'), F.col(b_col).alias('v'))
    edges = edges.unionByName(edges.select(F.col('v').alias('u'), F.col('u').alias('v'))).persist()
    labels = nodes.select(F.col(id_col).alias('u'), F.col(id_col).alias('label'))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, on='u')
            .groupBy('v')
            .agg(F.min('label').alias('nbr_label'))
            .withColumnRenamed('v', 'u')
        )
        new_labels = (
            labels.join(nbr_min, on='u', how='left')
            .select('u', F.least(F.col('label'), F.coalesce('nbr_label', 'label')).alias('new_label'))
        )
        delta = (
            new_labels.join(labels, on='u')
            .where(F.col('new_label') != F.col('label'))
            .count()
        )
        labels = new_labels.withColumnRenamed('new_label', 'label').localCheckpoint(eager=True)
        if delta == 0:
            break

    edges.unpersist()
    return labels.select(F.col('u').alias(id_col), F.col('label').alias('cluster_rep'))


def neardup_clusters(
    docs: DataFrame,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    threshold: float = 0.8,
    **minhash_kw,
) -> DataFrame:
    """End-to-end corpus dedup decision: MinHash-LSH candidates →
    exact n-gram-Jaccard verify → connected components → one
    deterministic representative per duplicate cluster."""
    from .dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(docs, threshold=threshold, **minhash_kw).select('a_id', 'b_id')
    return connected_components(pairs, docs.select(id_col), id_col=id_col)
