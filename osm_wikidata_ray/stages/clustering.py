"""Clustering stage: 1:1 conflict resolution + transitive closure.

Two shuffles (SURVEY.md §7.3):

  1. groupby (osm_type, osm_id): an OSM object chosen by >1 item disqualifies
     all of them (reference filter_candidates_more, matcher.py:1473-1475) and
     already-tagged objects are reported, not emitted (matcher.py:1477-1479).
  2. connected components over accepted pairs via iterative min-label
     propagation (distributed union-find).  With the reference's 1:1 filters
     components are size 2 and converge in one round, but the algorithm is
     general: O(log D) rounds for diameter-D components, each round a
     hash-join + groupby-min — all Ray Data ops, no driver-side graph.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray


def resolve_conflicts(candidates: "ray.data.Dataset") -> "ray.data.Dataset":
    """chosen candidates → accepted pairs after the cross-item 1:1 gate."""
    chosen = candidates.filter(expr="chosen == True")

    def gate(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) > 1:
            out = group.copy()
            out["accepted"] = False
            out["note"] = "OSM candidate matches multiple Wikidata items"
            return out
        out = group.copy()
        already = bool(out["already_tagged"].iloc[0])
        out["accepted"] = not already
        if already:
            out["note"] = "candidate already tagged"
        return out

    return chosen.groupby(["osm_type", "osm_id"]).map_groups(
        gate, batch_format="pandas"
    )


def accepted_pairs(resolved: "ray.data.Dataset") -> "ray.data.Dataset":
    return resolved.filter(expr="accepted == True")


def _edges_to_labels(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Initial labels: every node labels itself."""

    def init_labels(batch: pa.Table) -> pa.Table:
        qids = batch.column("qid").to_pylist()
        uids = [
            f"{t}/{i}"
            for t, i in zip(
                batch.column("osm_type").to_pylist(), batch.column("osm_id").to_pylist()
            )
        ]
        nodes = qids + uids
        return pa.table({"node": nodes, "label": nodes})

    return pairs.map_batches(init_labels, batch_format="pyarrow")


def connected_components(
    pairs: "ray.data.Dataset",
    max_rounds: int = 5,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """(node, cluster_id) via min-label propagation over accepted pairs.

    Scaling assumptions documented: components here are tiny (1:1 pairs), so
    rounds converge immediately; for general graphs rounds = O(log diameter).
    Each round: edges ⋈ labels (hash join on node) → messages → groupby-min.
    """

    def to_edges(batch: pa.Table) -> pa.Table:
        u = batch.column("qid").to_pylist()
        v = [
            f"{t}/{i}"
            for t, i in zip(
                batch.column("osm_type").to_pylist(), batch.column("osm_id").to_pylist()
            )
        ]
        return pa.table({"u": u, "v": v})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    labels = _edges_to_labels(pairs).groupby("node").min("label")
    labels = labels.map_batches(
        lambda b: b.rename_columns(["node", "label"]), batch_format="pyarrow"
    ).materialize()

    for _ in range(max_rounds):
        # label of u shipped to v and vice versa
        lu = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("u",), right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b.column("v"), "label": b.column("label")}),
            batch_format="pyarrow",
        )
        lv = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("v",), right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b.column("u"), "label": b.column("label")}),
            batch_format="pyarrow",
        )
        new_labels = (
            labels.union(lu, lv)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda b: b.rename_columns(["node", "label"]), batch_format="pyarrow"
            )
            .materialize()
        )
        # convergence: stop when no label changed this round
        changed = (
            new_labels.join(
                labels, join_type="inner", num_partitions=num_partitions,
                on=("node",), right_on=("node",), right_suffix="_prev",
            )
            .filter(expr="label != label_prev")
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"), "cluster_id": b.column("label")}),
        batch_format="pyarrow",
    )
