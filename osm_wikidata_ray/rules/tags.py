"""Category → tag expansion and entity-type tables.

Reimplements the reference's declarative rule handling: category→tag regex
expansion (matcher/matcher.py:66-150), trim-ending and max-distance lookups
(matcher.py:153-220), expected-tag calculation (model.py:495-558), tag set
algebra (matcher.py:119-138,348-357), and identifier-claim extraction
(model.py:609-669).  The rule tables live in osm_wikidata_ray/data/*.json,
re-derived from the reference's public data files by
scripts/derive_rule_tables.py.
"""

from __future__ import annotations

import json
import pathlib
import re
from collections import defaultdict
from functools import lru_cache
from typing import Any, Collection, Iterable

DATA_DIR = pathlib.Path(__file__).resolve().parent.parent / "data"

DEFAULT_MAX_DIST_KM = 4  # matcher.py:53

# P-claim → OSM-key identifier map (model.py:613-652); (claim, osm_keys, label)
IDENTIFIER_PROPERTIES: list[tuple[str, list[str], str]] = [
    ("P238", ["iata"], "IATA airport code"),
    ("P239", ["icao"], "ICAO airport code"),
    ("P240", ["faa", "ref"], "FAA airport code"),
    ("P296", ["ref", "ref:train", "railway:ref"], "station code"),
    ("P300", ["ISO3166-2"], "ISO 3166-2 code"),
    ("P359", ["ref:rce"], "Rijksmonument ID"),
    ("P590", ["ref:gnis", "GNISID", "gnis:id", "gnis:feature_id"], "USGS GNIS ID"),
    ("P649", ["ref:nrhp"], "NRHP reference number"),
    ("P722", ["uic_ref"], "UIC station code"),
    ("P757", ["ref:whc"], "World Heritage Site ID"),
    ("P782", ["ref"], "LAU (local administrative unit)"),
    ("P836", ["ref:gss"], "UK Government Statistical Service code"),
    ("P856", ["website", "contact:website", "url"], "website"),
    ("P882", ["nist:fips_code"], "FIPS 6-4 (US counties)"),
    ("P901", ["ref:fips"], "FIPS 10-4 (countries and regions)"),
    ("P954", ["uic_ref"], "IBNR ID"),
    ("P981", ["ref:woonplaatscode"], "BAG code for Dutch residencies"),
    ("P1216", ["HE_ref"], "National Heritage List for England number"),
    ("P2253", ["ref:edubase"], "EDUBase URN"),
    ("P2815", ["esr:user", "ref", "ref:train"], "ESR station code"),
    ("P3425", ["ref", "ref:SIC"], "Natura 2000 site ID"),
    ("P3562", ["seamark:light:reference"], "Admiralty number"),
    ("P4755", ["ref", "ref:train", "ref:crs", "crs", "nat_ref"], "UK railway station code"),
    ("P4803", ["ref", "ref:train"], "Amtrak station code"),
    ("P6082", ["nycdoitt:bin"], "NYC Building Identification Number"),
    ("P5086", ["ref"], "FIPS 5-2 alpha code (US states)"),
    ("P5087", ["ref:fips"], "FIPS 5-2 numeric code (US states)"),
    ("P5208", ["ref:bag"], "BAG building ID for Dutch buildings"),
]

re_lau_code = re.compile(r"^[A-Z]{2}([^A-Z].+)$")  # model.py:44

# keys that take disused:/was:/... lifecycle prefixes (model.py:61-69)
DISUSED_PREFIX_KEYS = {
    "amenity", "railway", "leisure", "tourism", "man_made", "shop", "building",
}
DISUSED_PREFIXES = (
    "disused", "was", "abandoned", "demolished", "destroyed", "ruins", "historic",
)  # model.py:513-521


@lru_cache(maxsize=1)
def load_type_rules() -> list[dict[str, Any]]:
    """Entity-type rules (reference data/entity_types.json, restructured)."""
    return json.load(open(DATA_DIR / "type_rules.json"))["rules"]


@lru_cache(maxsize=1)
def load_extra_type_tags() -> dict[str, list[str]]:
    """P31 QID → extra expected OSM tags (reference wikidata.py:66-251)."""
    return json.load(open(DATA_DIR / "extra_type_tags.json"))


@lru_cache(maxsize=1)
def build_cat_map() -> dict[str, dict[str, Any]]:
    """Lowercased category pattern → rule, " by " truncated (matcher.py:141-150)."""
    out: dict[str, dict[str, Any]] = {}
    for rule in load_type_rules():
        for cat in rule["categories"]:
            lc = cat.lower()
            if " by " in lc:
                lc = lc[: lc.find(" by ")]
            out[lc] = rule
    return out


@lru_cache(maxsize=4096)
def _cat_pattern(key: str) -> re.Pattern[str]:
    """matcher.py:59-63."""
    return re.compile(r"\b" + re.escape(key) + r"\b", re.I)


def categories_to_tags(categories: Collection[str]) -> list[str]:
    """Expected OSM tags from enwiki category names (matcher.py:66-88)."""
    cat_map = build_cat_map()
    tags: set[str] = set()
    for cat in categories:
        lc_cat = cat.lower()
        for key, rule in cat_map.items():
            if not _cat_pattern(key).search(lc_cat):
                continue
            exclude = rule.get("exclude_categories")
            if exclude:
                ex_pattern = re.compile(
                    r"\b(" + "|".join(re.escape(e) for e in exclude) + r")\b", re.I
                )
                if ex_pattern.search(lc_cat):
                    continue
            tags |= set(rule["osm_tags"])
    return sorted(tags)


def simplify_tags(tags: list[str]) -> list[str]:
    """Drop foo=bar when bare foo present (matcher.py:119-126)."""
    key_only = sorted(t for t in tags if "=" not in t)
    for k in key_only:
        for t in set(tags):
            if t.startswith(k + "="):
                tags.remove(t)
    return tags


def tag_and_key_if_possible(tags: set[str]) -> set[str]:
    """Drop bare foo when foo=bar present (matcher.py:129-138)."""
    key_only = sorted(t for t in tags if "=" not in t)
    for k in key_only:
        for t in set(tags):
            if t.startswith(k + "=") and k in tags:
                tags.remove(k)
    return tags


@lru_cache(maxsize=1)
def _endings_by_tag() -> dict[str, frozenset[str]]:
    """Inverted index: osm tag → union of trim_endings over rules carrying
    it.  `union over rules with tags∩osm_tags≠∅` == `union over t∈tags of
    per-tag unions`, so the per-call scan of every rule (the scorer's
    hottest helper) collapses to |tags| dict lookups."""
    out: defaultdict[str, set[str]] = defaultdict(set)
    for rule in load_type_rules():
        ends = rule.get("trim_endings")
        if ends:
            for t in rule["osm_tags"]:
                out[t].update(ends)
    return {t: frozenset(v) for t, v in out.items()}


def get_ending_from_criteria(tags: Collection[str]) -> set[str]:
    """Trim endings for the given expected tags (matcher.py:153-167)."""
    idx = _endings_by_tag()
    endings: set[str] = set()
    for t in tags:
        if t != "type=site":  # too generic
            endings.update(idx.get(t, ()))
    return endings


@lru_cache(maxsize=1)
def _max_dist_by_tag() -> dict[str, int]:
    """Inverted index: osm tag → max max_dist_km over rules carrying it
    (max over applicable rules == max over t∈tags of per-tag maxima)."""
    out: dict[str, int] = {}
    for rule in load_type_rules():
        d = rule.get("max_dist_km")
        if d:
            for t in rule["osm_tags"]:
                if d > out.get(t, 0):
                    out[t] = d
    return out


def get_max_dist_from_criteria(tags: Collection[str]) -> int | None:
    """Largest per-type match radius in km (matcher.py:206-220)."""
    idx = _max_dist_by_tag()
    best = 0
    for t in tags:
        d = idx.get(t, 0)
        if d > best:
            best = d
    return best or None


@lru_cache(maxsize=1)
def _housename_tags() -> frozenset[str]:
    """Union of osm_tags over housename rules (tags∩osm_tags≠∅ for ANY
    housename rule == tags ∩ this union ≠ ∅)."""
    out: set[str] = set()
    for rule in load_type_rules():
        if rule.get("housename"):
            out.update(rule["osm_tags"])
    return frozenset(out)


def could_be_building(tags: set[str], instanceof: Collection[str]) -> bool:
    """Item with these tags could be mapped as a building (matcher.py:170-203)."""
    place_tags = {
        "place", "place=neighbourhood", "landuse=residential",
        "boundary=administrative", "admin_level",
    }
    if tags.issubset(place_tags):
        return False  # human settlement
    if any(t.startswith("building") for t in tags):
        return True

    rules = load_type_rules()
    check_housename = False
    found_instanceof = False
    if instanceof:
        for rule in rules:
            if rule.get("qid") not in instanceof:
                continue
            found_instanceof = True
            if rule.get("housename"):
                check_housename = True
    if found_instanceof:
        return check_housename

    return bool(set(tags) & _housename_tags())


def get_extra_tags(instanceof: Iterable[str]) -> set[str]:
    """Extra expected tags from P31 classes (model.py:495-505)."""
    extra = load_extra_type_tags()
    tags: set[str] = set()
    for qid in instanceof:
        tags.update(extra.get(qid, []))
    return tags


def disused_tags(tags: Collection[str], is_shopping_street: bool = False) -> set[str]:
    """Lifecycle-prefixed expected tags (model.py:511-530)."""
    out: set[str] = set()
    for t in tags:
        if t == "amenity":  # too generic
            continue
        if t == "shop" and is_shopping_street:
            continue
        key = t.split("=")[0] if "=" in t else t
        if key in DISUSED_PREFIX_KEYS:
            out |= {prefix + ":" + t for prefix in DISUSED_PREFIXES}
    return out


def calculate_tags(
    item_tags: Collection[str],
    instanceof: Collection[str],
    names: Collection[str],
    nrhp_refs: Collection[str] = (),
    is_shopping_street: bool = False,
    ignore_tags: Collection[str] | None = None,
) -> set[str]:
    """Expected OSM tags for an item (model.py:532-558)."""
    ignore = set(ignore_tags or [])
    # overly generic tags dropped: facility/amenity, location, man_made
    ignore.update(("amenity", "location", "man_made"))

    tags = (get_extra_tags(instanceof) | set(item_tags)) - ignore
    if could_be_building(tags, instanceof):
        tags.add("building")
        if any(n.lower().endswith(" church") for n in names):
            tags.update({"amenity=place_of_worship", "building=church"})
    if "shop" in tags and is_shopping_street:
        tags.discard("shop")
    tags |= {f"ref:nrhp={v}" for v in nrhp_refs}
    tags |= disused_tags(tags, is_shopping_street)
    tags -= ignore
    return tags


def find_matching_tags(osm: dict[str, str], wikidata: set[str]) -> set[str]:
    """OSM tags ∩ expected tags, ';' multi-value aware (matcher.py:348-357)."""
    matching: set[str] = set()
    for wd_tag in wikidata:
        if "=" in wd_tag:
            k, _, v = wd_tag.partition("=")
            if k in osm and v in set(osm[k].split(";")):
                matching.add(wd_tag)
        elif wd_tag in osm:
            matching.add(wd_tag)
    return tag_and_key_if_possible(matching)


def identifiers_from_claims(
    claims: dict[str, list[str]],
) -> dict[str, list[tuple[tuple[str, ...], str]]]:
    """OSM-key → identifier values from P-claims (model.py:609-669).

    ``claims``: {pid: [string values]} — the flattened claim table the doc
    parser produces.
    """
    out: dict[str, list[tuple[tuple[str, ...], str]]] = {}
    for claim, osm_keys, label in IDENTIFIER_PROPERTIES:
        values = list(claims.get(claim, []))
        if not values:
            continue
        if claim == "P782":  # LAU codes also match with country prefix removed
            values += [m.group(1) for m in (re_lau_code.match(v) for v in values) if m]
        for osm_key in osm_keys:
            out.setdefault(osm_key, []).append((tuple(values), label))
    return out
