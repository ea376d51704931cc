"""Single-process oracle for the linkage pipeline.

Runs the exact rule library over a (small) doc corpus in plain Python —
decode → block → distance-gate → score → reduce → 1:1 → accepted pairs —
mirroring find_item_matches + filter_candidates_more
(matcher/matcher.py:602-917,1429-1481).  The Ray pipeline must produce the
same accepted-pair set; tests compute pairwise F1 of engine vs oracle vs the
generator's intended labels.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Any, Iterable

from ..functions.keys import osm_block_keys, wd_block_keys
from ..functions.spans import decode_doc
from ..geo import haversine_m
from ..rules.reduce import CANDIDATE_LIMIT, choose_single_candidate, score_item_candidates
from ..rules.ruleset import RuleSet
from ..rules.tags import DEFAULT_MAX_DIST_KM, get_max_dist_from_criteria

NEARBY_NODE_M = 10.0  # matcher.py:241


def decode_corpus(docs: Iterable[dict[str, Any]]) -> tuple[list[dict], list[dict]]:
    items, objs = [], []
    for d in docs:
        rec = decode_doc(d["doc_id"], d["spans"])
        if rec is None:
            continue
        if rec["side"] == "wd":
            items.append(rec["item"])
        else:
            objs.append(rec["obj"])
    return items, objs


def candidate_rows_for_items(
    items: list[dict], objs: list[dict]
) -> dict[str, list[dict]]:
    """Blocking + distance gating: per-qid candidate OSM rows.

    Distances are ONE vectorized haversine call per item over its candidate
    set — the same numpy path the engine's emit_pairs_bucket takes (a scalar
    per-pair loop here was 22 of the oracle's 32 s at 12k docs, all numpy
    call overhead)."""
    import numpy as np

    by_key: defaultdict[str, list[int]] = defaultdict(list)
    for j, o in enumerate(objs):
        for k in osm_block_keys(o["tags"], o["lat"], o["lon"], o["planet_table"]):
            by_key[k].append(j)

    o_lat = np.array([o["lat"] for o in objs], dtype=np.float64)
    o_lon = np.array([o["lon"] for o in objs], dtype=np.float64)
    o_point = np.array(
        [o["planet_table"] == "point" for o in objs], dtype=bool
    )

    per_item: dict[str, list[dict]] = {}
    for item in items:
        max_dist_m = (
            get_max_dist_from_criteria(item.get("tags") or []) or DEFAULT_MAX_DIST_KM
        ) * 1000.0
        cand_idx: set[int] = set()
        for k in wd_block_keys(item):
            cand_idx.update(by_key.get(k, ()))
        idx = np.fromiter(cand_idx, dtype=np.int64, count=len(cand_idx))
        dists = haversine_m(item["lat"], item["lon"], o_lat[idx], o_lon[idx])
        keep = (dists <= max_dist_m) | (o_point[idx] & (dists <= NEARBY_NODE_M))
        rows = [
            {**objs[j], "dist": float(d)}
            for j, d in zip(idx[keep], dists[keep])
        ]
        rows.sort(key=lambda r: (r["dist"], r["osm_type"], r["osm_id"]))
        per_item[item["qid"]] = rows[:CANDIDATE_LIMIT]
    return per_item


def oracle_tables(
    docs: Iterable[dict[str, Any]],
    ruleset: RuleSet | None = None,
    want_isa: set[str] | None = None,
    bad_qids: set[str] | None = None,
) -> dict[str, list[dict[str, Any]]]:
    """Full serial-oracle output: stored-candidate rows, accepted pairs and
    cluster labels — the same three views the Ray engine emits
    (stages/scoring.CANDIDATE_COLUMNS subset, clustering.resolve_conflicts,
    clustering.clusters_from_disjoint_pairs).  The driver's DuckDB oracles
    read a parquet dump of these tables, converting the pytest
    engine==oracle equality into the driver's hard rows+schema+hash signal.
    """
    ruleset = ruleset or RuleSet()
    items, objs = decode_corpus(docs)
    per_item = candidate_rows_for_items(items, objs)
    items_by_qid = {i["qid"]: i for i in items}

    if ruleset.hunt_for_more_place_names:  # §2.4 #38 (rules/within.py)
        from ..rules.within import collect_place_polygons, within_place_names

        polys = collect_place_polygons(objs)
        for rows in per_item.values():
            for row in rows:
                row["within_names"] = within_place_names(row, polys)

    candidates: list[dict[str, Any]] = []
    chosen: dict[str, dict] = {}
    # the 1:1 gate counts every stored candidate occurrence across all
    # items (matcher.py:1430-1443), not just chosen ones
    osm_count: Counter[tuple] = Counter()
    for qid, rows in sorted(per_item.items()):
        cands = score_item_candidates(
            items_by_qid[qid], rows, ruleset, want_isa=want_isa
        )
        if not cands:
            continue
        osm_count.update((c["osm_type"], c["osm_id"]) for c in cands)
        cand, _note = choose_single_candidate(items_by_qid[qid], cands)
        if cand is not None:
            chosen[qid] = cand
        chosen_uid = (
            (cand["osm_type"], cand["osm_id"]) if cand is not None else None
        )
        for c in cands:
            candidates.append(
                {
                    "qid": qid,
                    "osm_type": c["osm_type"],
                    "osm_id": int(c["osm_id"]),
                    "identifier_match": bool(c["identifier_match"]),
                    "chosen": (c["osm_type"], c["osm_id"]) == chosen_uid,
                    # candidate languages = name:xx tag keys (model.py:1243-1244)
                    "langs": sorted(
                        k[5:] for k in c["tags"] if k.startswith("name:")
                    ),
                }
            )

    # cross-item 1:1 constraint (matcher.py:1473-1475)
    accepted = []
    for qid, c in sorted(chosen.items()):
        if bad_qids and qid in bad_qids:  # matcher.py:1445-1447
            continue
        if osm_count[(c["osm_type"], c["osm_id"])] > 1:
            continue
        if "wikidata" in c["tags"]:  # already tagged (matcher.py:1477-1479)
            continue
        accepted.append(
            {"qid": qid, "osm_type": c["osm_type"], "osm_id": c["osm_id"], "dist": c["dist"]}
        )

    # 1:1-gated pairs are disjoint → cluster label = min endpoint (the
    # engine's clusters_from_disjoint_pairs closed form)
    clusters = []
    for a in accepted:
        uid = f"{a['osm_type']}/{a['osm_id']}"
        label = min(a["qid"], uid)
        clusters.append({"node": a["qid"], "cluster_id": label})
        clusters.append({"node": uid, "cluster_id": label})

    return {"candidates": candidates, "accepted": accepted, "clusters": clusters}


def oracle_accepted_pairs(
    docs: Iterable[dict[str, Any]],
    ruleset: RuleSet | None = None,
    want_isa: set[str] | None = None,
    bad_qids: set[str] | None = None,
) -> list[dict[str, Any]]:
    """Accepted (qid, osm) pairs after all per-item and cross-item filters."""
    return oracle_tables(docs, ruleset, want_isa=want_isa, bad_qids=bad_qids)[
        "accepted"
    ]


def blocking_recall(
    docs: Iterable[dict[str, Any]], gold_pairs: Iterable[dict[str, Any]]
) -> dict[str, Any]:
    """Fraction of gold match pairs discoverable at the blocking stage
    (share ≥1 blocking key AND pass the distance gate) — the measured
    recall ADVICE.md asked to report separately from end-to-end F1 (the
    reference's spatial candidate SQL needs no name overlap; ours must
    reach every pair through name/identifier/address/geo keys)."""
    items, objs = decode_corpus(docs)
    per_item = candidate_rows_for_items(items, objs)
    reachable = {
        (qid, r["osm_type"], r["osm_id"])
        for qid, rows in per_item.items()
        for r in rows
    }
    gold = [
        (g["qid"], g["osm_type"], g["osm_id"])
        for g in gold_pairs
        if g["label"] == "match"
    ]
    missed = [g for g in gold if g not in reachable]
    return {
        "recall": 1.0 - len(missed) / len(gold) if gold else 1.0,
        "n_gold": len(gold),
        "missed": missed,
    }


def pairwise_f1(
    predicted: set[tuple], gold: set[tuple]
) -> dict[str, float]:
    tp = len(predicted & gold)
    precision = tp / len(predicted) if predicted else 1.0
    recall = tp / len(gold) if gold else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    return {"precision": precision, "recall": recall, "f1": f1, "tp": tp,
            "fp": len(predicted - gold), "fn": len(gold - predicted)}
