"""Recall / precision metrics vs golden fixtures.

Dup-pair recall is measured by cluster co-membership: a golden dup pair
(a, b) is recalled iff the pipeline assigned a and b the same cluster_id.
This is the semantics that matters for dedup (does the pipeline know these
two documents are duplicates?) and it is robust to the delegate
representation: fuzzy edges attach to one representative per distinct text
(operators/exact.py), so member-level pairs are implied rather than
materialized — exactly like the reference, where duplicate blocks carry a
single backref to the earliest occurrence rather than a pairwise list
(rabin/rabin_dedup.c:1190-1245).

The companion gate — exact cluster-assignment match against the golden
components — bounds over-clustering (precision), so co-membership recall
cannot be gamed by merging everything.
"""

from __future__ import annotations

import pandas as pd


def pair_recall(assignments: pd.DataFrame, golden_pairs: pd.DataFrame) -> float:
    """Fraction of golden pairs whose two urls share a pipeline cluster."""
    if len(golden_pairs) == 0:
        return 1.0
    cl = dict(zip(assignments["url"], assignments["cluster_id"]))
    hits = sum(
        1
        for a, b in zip(golden_pairs["url_a"], golden_pairs["url_b"])
        if cl.get(a) is not None and cl.get(a) == cl.get(b)
    )
    return hits / len(golden_pairs)


def cluster_exact_match(
    assignments: pd.DataFrame, golden_clusters: pd.DataFrame
) -> tuple[int, int]:
    """(n_mismatched_docs, n_docs) comparing cluster ids per url.

    cluster_id = min doc_id of the component on both sides, so ids are
    directly comparable (no relabeling needed).
    """
    m = assignments.merge(
        golden_clusters[["url", "cluster_id"]], on="url", suffixes=("_p", "_g")
    )
    return int((m["cluster_id_p"] != m["cluster_id_g"]).sum()), len(m)


def edge_precision(
    edges: pd.DataFrame,
    golden_clusters: pd.DataFrame,
    id_col_src: str = "src",
    id_col_dst: str = "dst",
) -> float:
    """Fraction of emitted edges whose endpoints are true co-members."""
    if len(edges) == 0:
        return 1.0
    cl = dict(zip(golden_clusters["doc_id"], golden_clusters["cluster_id"]))
    ok = sum(
        1
        for s, d in zip(edges[id_col_src], edges[id_col_dst])
        if cl.get(s) is not None and cl.get(s) == cl.get(d)
    )
    return ok / len(edges)
