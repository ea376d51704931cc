"""Scoring stage: per-item candidate scoring + reduction (actor pool).

groupby("qid").map_groups(ScorerReducer, concurrency=N) — the stateful stage
of the pipeline.  Each actor compiles the rule tables once in __init__
(SURVEY.md §2.3; the reference loads them as module globals per process,
matcher/matcher.py:50-63,112-116) and then scores each item group: dedupe
candidate rows discovered under multiple block keys, apply the global
candidate cap, run the full veto cascade and per-item preference filters,
and pick the single winning candidate.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd

from ..rules.reduce import (
    CANDIDATE_LIMIT,
    choose_single_candidate,
    score_item_candidates,
)
from ..rules.ruleset import RuleSet

CANDIDATE_COLUMNS = [
    "qid", "osm_type", "osm_id", "dist",
    "identifier_match", "address_match", "name_match", "matching_tags",
    "chosen", "note", "already_tagged",
    "wd_doc_id", "wd_checksum", "osm_doc_id", "osm_checksum",
]


class ScorerReducer:
    """Callable class for bucketed map_groups: each invocation receives one
    hash bucket of qids and loops items with a pandas groupby (cheap C
    slicing) — the rule tables compile once per actor in __init__."""

    def __init__(self, ruleset_kwargs: dict[str, Any] | None = None) -> None:
        self.ruleset = RuleSet(**(ruleset_kwargs or {}))

    def __call__(self, bucket: pd.DataFrame) -> pd.DataFrame:
        outs = [
            self.score_item(g) for _, g in bucket.groupby("qid", sort=False)
        ]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else _empty_candidates()

    def score_item(self, group: pd.DataFrame) -> pd.DataFrame:
        item = json.loads(group["wd_payload"].iloc[0])

        # dedupe pairs found under multiple block keys; global top-50 by
        # distance reproduces the reference's `order by dist limit 50`
        dedup = (
            group.sort_values(["dist", "osm_uid"], kind="stable")
            .drop_duplicates("osm_uid")
            .head(CANDIDATE_LIMIT)
        )
        osm_rows = []
        provenance: dict[str, tuple[str, str]] = {}
        for _, p in dedup.iterrows():
            obj = json.loads(p["osm_payload"])
            obj["dist"] = float(p["dist"])
            osm_rows.append(obj)
            provenance[f"{obj['osm_type']}/{obj['osm_id']}"] = (
                p["osm_doc_id"], p["osm_checksum"]
            )

        candidates = score_item_candidates(item, osm_rows, self.ruleset)
        chosen, note = (None, "")
        if candidates:
            chosen, note = choose_single_candidate(item, candidates)

        out: dict[str, list] = {c: [] for c in CANDIDATE_COLUMNS}
        for c in candidates:
            uid = f"{c['osm_type']}/{c['osm_id']}"
            osm_doc_id, osm_checksum = provenance[uid]
            is_chosen = chosen is not None and uid == (
                f"{chosen['osm_type']}/{chosen['osm_id']}"
            )
            out["qid"].append(item["qid"])
            out["osm_type"].append(c["osm_type"])
            out["osm_id"].append(int(c["osm_id"]))
            out["dist"].append(float(c["dist"]))
            out["identifier_match"].append(bool(c["identifier_match"]))
            out["address_match"].append(c["address_match"])  # tri-state, nullable
            out["name_match"].append(json.dumps(c["name_match"], ensure_ascii=False))
            out["matching_tags"].append(json.dumps(sorted(c["matching_tags"])))
            out["chosen"].append(is_chosen)
            out["note"].append("" if is_chosen else note)
            out["already_tagged"].append("wikidata" in c["tags"])
            out["wd_doc_id"].append(group["wd_doc_id"].iloc[0])
            out["wd_checksum"].append(group["wd_checksum"].iloc[0])
            out["osm_doc_id"].append(osm_doc_id)
            out["osm_checksum"].append(osm_checksum)
        df = pd.DataFrame(out)
        if df.empty:
            return _empty_candidates()
        # tri-state address_match: nullable boolean keeps a stable Arrow
        # schema across batches (all-None batches otherwise type as null)
        df["address_match"] = pd.array(out["address_match"], dtype="boolean")
        return df

    # group payloads don't carry the bucket column forward


def _empty_candidates() -> pd.DataFrame:
    dtypes = {
        "qid": "object", "osm_type": "object", "osm_id": "int64",
        "dist": "float64", "identifier_match": "bool", "address_match": "boolean",
        "name_match": "object", "matching_tags": "object", "chosen": "bool",
        "note": "object", "already_tagged": "bool",
        "wd_doc_id": "object", "wd_checksum": "object",
        "osm_doc_id": "object", "osm_checksum": "object",
    }
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in dtypes.items()})
