"""Per-item candidate-list reduction and the single-item scoring driver.

Reimplements the preference filters and reductions that run over one item's
candidate list (matcher/matcher.py:907-917,1268-1582) and the end-to-end
single-item driver find_item_matches (matcher.py:602-917) on parsed records.
The cross-item 1:1 conflict filter (matcher.py:1473-1475) lives in the
clustering stage — it needs a shuffle by OSM id.
"""

from __future__ import annotations

import re
from typing import Any

from . import item as item_rules
from .ruleset import RuleSet
from .vetoes import ItemContext, evaluate_candidate

Candidate = dict[str, Any]

re_farmhouse = re.compile("^(.*) farm ?house$", re.I)  # matcher.py:56
CANDIDATE_LIMIT = 50  # SQL `limit 50`, matcher.py:282,306


def filter_distant(candidates: list[Candidate]) -> list[Candidate]:
    """Keep a single <50 m candidate iff all others are ≥1000 m
    (matcher.py:1567-1582)."""
    if any(c["tags"].keys() & {"place", "admin_level"} for c in candidates):
        return candidates
    if len(candidates) < 2:
        return candidates
    chosen = None
    for c in candidates:
        if c["dist"] < 50:
            if chosen:
                return candidates
            chosen = c
            continue
        if c["dist"] < 1000:
            return candidates
    return [chosen] if chosen else candidates


def _image_only_match(entries: list[tuple[str, str, Any]]) -> bool:
    """matcher.py:1505-1506."""
    return (
        len(entries) == 1
        and len(entries[0][2]) == 1
        and entries[0][2][0][0] == "image"
    )


def prefer_proper_name_match(candidates: list[Candidate]) -> list[Candidate]:
    """Exactly one candidate matched on a real name tag wins (matcher.py:1509-1539)."""
    if len(candidates) == 1:
        return candidates

    def has_proper_name(c: Candidate) -> bool:
        nm = c.get("name_match")
        return bool(
            nm
            and (
                ("name" in nm and not _image_only_match(nm["name"]))
                or any(
                    k.startswith("name:") and not _image_only_match(v)
                    for k, v in nm.items()
                )
            )
        )

    best = None
    for c in candidates:
        if has_proper_name(c):
            if best:
                return candidates
            best = c
            continue
        if (
            "addr:housename" not in c["name_match"]
            and "operator" not in c["name_match"]
        ):
            return candidates
    return [best] if best else candidates


def prefer_key_over_building(candidates: list[Candidate], key: str) -> list[Candidate]:
    """Single key=value match beats building-only matches (matcher.py:1484-1502)."""
    if len(candidates) == 1:
        return candidates
    best = None
    for c in candidates:
        mt = c["matching_tags"]
        if any(t.startswith(key + "=") for t in mt):
            if best:
                return candidates
            best = c
            continue
        if len(mt) != 1 or not next(iter(mt)).startswith("building"):
            return candidates
    return [best] if best else candidates


def _is_building_only(matching_tags: set[str]) -> bool:
    return set(matching_tags).issubset({"building", "building=yes", "historic:building"})


def prefer_tag_match_over_building_only_match(
    candidates: list[Candidate],
) -> list[Candidate]:
    """matcher.py:939-962 (distance-aware)."""
    if len(candidates) == 1:
        return candidates
    more_good: list[Candidate] = []
    less_good: list[Candidate] = []
    for c in candidates:
        good = c["name_match"] and not _is_building_only(c["matching_tags"])
        (more_good if good else less_good).append(c)
    if not more_good or not less_good:
        return candidates
    # a nearby building-only match may be the right one (ref Q18160107 note)
    if all(c["dist"] > 100 for c in more_good) and any(
        c["dist"] < 10 for c in less_good
    ):
        return candidates
    return more_good


def prefer_railway_station(candidates: list[Candidate]) -> list[Candidate]:
    """matcher.py:1542-1564."""
    if len(candidates) == 1:
        return candidates
    station = [c for c in candidates if "railway=station" in c["matching_tags"]]
    if len(station) != 1:
        return candidates
    companions = {
        "railway=tram_stop", "railway=depot", "landuse=railway",
        "building=train_station", "public_transport=stop_position",
    }
    other = sum(
        1
        for c in candidates
        if "railway=station" not in c["matching_tags"]
        and set(c["matching_tags"]) & companions
    )
    return station if other + 1 == len(candidates) else candidates


def prefer_stop_area_relation(
    candidates: list[Candidate], wikidata_tags: set[str]
) -> list[Candidate]:
    """matcher.py:920-936."""
    if len(candidates) < 2 or "public_transport=stop_area" not in wikidata_tags:
        return candidates
    stop_areas = [
        c
        for c in candidates
        if c["osm_type"] == "relation"
        and c["tags"].get("public_transport") == "stop_area"
    ]
    return stop_areas or candidates


def prefer_farmhouse(candidates: list[Candidate]) -> list[Candidate]:
    """matcher.py:965-983."""
    if len(candidates) != 2:
        return candidates
    if any(not c.get("name") for c in candidates):
        return candidates
    house, farmhouse = sorted(candidates, key=lambda c: len(c["name"]))
    m = re_farmhouse.match(farmhouse["name"])
    if not m:
        return candidates
    start = m.group(1).lower()
    house_name = house["name"].lower()
    if house_name == start or house_name == start + " house":
        return [farmhouse]
    return candidates


def filter_bridge(candidates: list[Candidate]) -> list[Candidate]:
    """matcher.py:986-992."""
    if not any(c["tags"].get("man_made") == "bridge" for c in candidates):
        return candidates
    return [
        c for c in candidates if "man_made" in c["tags"] or "bridge" not in c["tags"]
    ]


# --- reduce_candidates family (matcher.py:1290-1426) ---

def filter_schools(candidates: list[Candidate]) -> Candidate | None:
    """matcher.py:1290-1308."""
    if len(candidates) < 2:
        return None
    if all("amenity=school" not in c["matching_tags"] for c in candidates):
        return None
    match = None
    for c in candidates:
        tags = sorted(c["matching_tags"])
        if "amenity=school" in tags:
            if match:
                return None
            match = c
        elif tags != ["building=school"]:
            return None
    return match


def filter_churches(candidates: list[Candidate]) -> Candidate | None:
    """matcher.py:1311-1333."""
    if len(candidates) < 2:
        return None
    if all("amenity=place_of_worship" not in c["matching_tags"] for c in candidates):
        return None
    match = None
    for c in candidates:
        tags = sorted(c["matching_tags"])
        if "amenity=place_of_worship" in tags:
            if match:
                return None
            match = c
        elif tags != ["religion=christian"]:
            return None
    return match


def filter_station(candidates: list[Candidate]) -> Candidate | None:
    """matcher.py:1336-1363."""
    if len(candidates) < 2:
        return None
    station = [c for c in candidates if "railway=station" in c["matching_tags"]]
    tram_stop = [c for c in candidates if "railway=tram_stop" in c["matching_tags"]]
    if len(station) == 1 and len(tram_stop) + 1 == len(candidates):
        return station[0]
    if all("public_transport=station" not in c["matching_tags"] for c in candidates):
        return None
    match = None
    for c in candidates:
        tags = c["matching_tags"]
        if "public_transport=station" in tags:
            if match:
                return None
            match = c
        elif "railway=tram_stop" not in tags:
            return None
    return match


def filter_building(candidates: list[Candidate]) -> Candidate | None:
    """Prefer the building way over a node (matcher.py:1366-1384)."""
    if len(candidates) < 2:
        return None
    way = [c for c in candidates if c["osm_type"] == "way"]
    node = [c for c in candidates if c["osm_type"] == "node"]
    if not (len(way) == 1 and len(node) + 1 == len(candidates)):
        return None
    building = way[0]
    return building if "building" in building["tags"] else None


def filter_reservoir(candidates: list[Candidate]) -> Candidate | None:
    """matcher.py:1387-1396."""
    if len(candidates) < 2:
        return None
    way = [c for c in candidates if c["osm_type"] == "way"]
    node = [c for c in candidates if c["osm_type"] == "node"]
    return way[0] if len(way) == 1 and len(node) + 1 == len(candidates) else None


def reduce_candidates(item: dict, candidates: list[Candidate]) -> list[Candidate]:
    """matcher.py:1399-1426."""
    school = filter_schools(candidates)
    if school:
        candidates = [school]
    station = filter_station(candidates)
    if station:
        candidates = [station]
    church = filter_churches(candidates)
    if church:
        candidates = [church]
    if item_rules.is_primarily_building(item):
        building = filter_building(candidates)
        if building:
            candidates = [building]
    if item_rules.is_reservoir(item):
        reservoir = filter_reservoir(candidates)
        if reservoir:
            candidates = [reservoir]
    return candidates


def _find_nrhp_match(
    nrhp_numbers: set[str], rows: list[dict[str, Any]]
) -> list[Candidate] | None:
    """NRHP identifier short-circuit (matcher.py:322-345)."""
    hits = [
        {
            "osm_type": row["osm_type"],
            "osm_id": row["osm_id"],
            "name": row.get("name"),
            "tags": row["tags"],
            "dist": row["dist"],
            "planet_table": row.get("planet_table"),
            "src_id": row.get("src_id"),
            "identifier_match": True,
            "address_match": None,
            "name_match": {},
            "matching_tags": set(),
        }
        for row in rows
        if row["tags"].get("ref:nrhp") in nrhp_numbers
    ]
    return hits if len(hits) == 1 else None


def score_item_candidates(
    item: dict,
    osm_rows: list[dict[str, Any]],
    ruleset: RuleSet,
    rejects: list[dict[str, Any]] | None = None,
    want_isa: set[str] | None = None,
) -> list[Candidate]:
    """Single-item end-to-end scoring: the parsed-record equivalent of
    find_item_matches (matcher.py:602-917).

    ``osm_rows``: [{osm_type, osm_id, name, tags, dist, planet_table,
    src_id}] — the blocked candidate rows, pre-gated by distance.
    ``rejects``: optional sink collecting per-pair reject reasons (the
    reference's check_item_candidate reject strings, matcher.py:995-1135).
    ``want_isa``: optional isa filter — when set, items outside it that are
    poor-quality stubs (cebwiki/svwiki-only, proposed, UK-authority) are
    skipped before matching, exactly the reference's gating
    (place.py:1198-1200 → model.py:972-1006; with no want_isa the skip
    never fires, matching the reference default).
    """
    if not item or not item.get("names"):
        return []
    if not osm_rows:
        return []
    if want_isa and not (set(item.get("isa") or []) & set(want_isa)):
        if item_rules.skip_item_during_match(item):
            return []

    nrhp = set(item.get("nrhp") or [])
    if nrhp:
        found = _find_nrhp_match(nrhp, osm_rows)
        if found:
            return found

    ctx = ItemContext(item, ruleset)
    seen: set[tuple[str, int]] = set()
    candidates: list[Candidate] = []
    for row in osm_rows:
        key = (row["osm_type"], row["osm_id"])
        if key in seen:
            continue
        seen.add(key)
        # within-polygon place names ride on the row when the flag is on
        # (#38; rules/within.py computes them, flag default off)
        extra_pn = (
            set(row["within_names"])
            if ruleset.hunt_for_more_place_names and row.get("within_names")
            else None
        )
        verdict = evaluate_candidate(
            ctx, row["osm_type"], row["tags"], row["dist"],
            extra_place_names=extra_pn,
        )
        if "reject" in verdict:
            if rejects is not None:
                rejects.append(
                    {
                        "osm_type": row["osm_type"],
                        "osm_id": row["osm_id"],
                        "dist": row["dist"],
                        "reject": verdict["reject"],
                    }
                )
            continue
        candidates.append(
            {
                "osm_type": row["osm_type"],
                "osm_id": row["osm_id"],
                "name": row.get("name"),
                "tags": row["tags"],
                "dist": row["dist"],
                "planet_table": row.get("planet_table"),
                "src_id": row.get("src_id"),
                **verdict,
            }
        )

    # line-vs-polygon dedup (reference filter_candidates,
    # matcher.py:1222-1234): a geometry loaded into both the line and the
    # polygon table keeps only its polygon row (same src_id).
    # NOTE (ADVICE r2): upstream marks filter_candidates "# unused?" and the
    # live match path does not call it — this engine applies the filter
    # deliberately (both-table rows are true duplicates of one OSM object);
    # our serial oracle (sources/oracle.py) applies the same rule, so
    # engine==oracle parity holds, but candidate sets can differ from an
    # upstream runtime that kept both rows.
    poly_src = {
        c["src_id"] for c in candidates if c.get("planet_table") == "polygon"
    }
    if poly_src:
        candidates = [
            c
            for c in candidates
            if not (
                c.get("planet_table") == "line" and c.get("src_id") in poly_src
            )
        ]

    candidates = filter_distant(candidates)
    candidates = prefer_proper_name_match(candidates)
    candidates = prefer_key_over_building(candidates, "amenity")
    candidates = prefer_tag_match_over_building_only_match(candidates)
    candidates = prefer_railway_station(candidates)
    candidates = prefer_stop_area_relation(candidates, ctx.wikidata_tags)
    if candidates and item_rules.is_farmhouse(item):
        candidates = prefer_farmhouse(candidates)
    if "man_made=bridge" in set(item.get("tags") or []):
        candidates = filter_bridge(candidates)
    return candidates


def choose_single_candidate(
    item: dict, candidates: list[Candidate]
) -> tuple[Candidate | None, str]:
    """Per-item part of filter_candidates_more (matcher.py:1445-1471).

    Returns (chosen candidate | None, note).  The cross-item 1:1 check and
    the already-tagged check run later, in the clustering stage.
    """
    for c in candidates:
        housename = c["tags"].get("addr:housename")
        if housename and housename.isdigit():
            return None, "number as house name"
        name = c["tags"].get("name")
        if name and name.isdigit():
            return None, "number as name"

    reduced = reduce_candidates(item, candidates)
    if len(reduced) != 1:
        return None, "more than one candidate found"
    return reduced[0], ""
