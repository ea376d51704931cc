"""Wikidata-side item record and its type predicates.

The engine's parsed item is a plain dict (Arrow-friendly); this module wraps
it with the reference Item model's predicates (matcher/model.py, cited per
function).  Expected fields:

    qid: str
    lat, lon: float
    names: dict[name, list[(source, lang)]]   # after part-of/image handling
    tags: list[str]                           # expected OSM tags (pre-calc)
    isa: list[str]                            # P31 QIDs
    isa_labels: dict[qid, dict[lang, label]]  # for ending trims
    languages: list[str]                      # label+sitelink langs
    identifiers: dict[osm_key, [(values, label)]]
    street_addresses: list[str]
    categories: list[str]
    extract: str
    place_names: list[str]
    sitelinks: list[str]
    nrhp: list[str]                           # P649 values
    p137: list[str]                           # operator-country QIDs
    p1216: bool                               # has NHLE claim
"""

from __future__ import annotations

from typing import Any

Item = dict[str, Any]

# P31 sets from model.py predicates
_STATION_ISA = {"Q55488", "Q928830", "Q4663385"}  # model.py:925-929
_STATION_CATS = {
    "railway stations", "railroad stations", "train stations",
    "metro stations", "subway stations",
}  # model.py:933-939
_STADIUM_ISA = {"Q483110", "Q641226", "Q1076486"}  # model.py:947-951
_STADIUM_CATS = {
    "football venues", "ice rinks", "stadiums", "velodromes",
    "cycling venues", "grounds",
}  # model.py:955-962
_BUILDING_ISA = {"Q41176", "Q811979", "Q47012103"}  # model.py:886-890
_SKIP_ISA = {"Q21561328", "Q21451686", "Q21451695", "Q1160920"}  # model.py:983-988
_KEEP_ISA = {"Q349084", "Q1002812", "Q1006876", "Q1187580", "Q1136601"}  # model.py:992-997


def instanceof(item: Item) -> list[str]:
    return item.get("isa") or []


def categories(item: Item) -> list[str]:
    return item.get("categories") or []


def is_a_station(item: Item) -> bool:
    """model.py:924-944."""
    if set(instanceof(item)) & _STATION_ISA:
        return True
    return any(
        any(cat in item_cat.lower() for cat in _STATION_CATS)
        for item_cat in categories(item)
    )


def is_a_stadium(item: Item) -> bool:
    """model.py:946-967."""
    if set(instanceof(item)) & _STADIUM_ISA:
        return True
    return any(
        any(cat in item_cat.lower() for cat in _STADIUM_CATS)
        for item_cat in categories(item)
    )


def is_hamlet(item: Item) -> bool:
    """model.py:848-851."""
    return "Q5084" in instanceof(item) or any(
        cat.startswith("Hamlets ") for cat in categories(item)
    )


def is_shopping_street(item: Item) -> bool:
    """model.py:853-854."""
    return any(cat.startswith("Shopping street ") for cat in categories(item))


def is_farmhouse(item: Item) -> bool:
    """model.py:864-865."""
    return "Q489357" in instanceof(item)


def is_mountain_range(item: Item) -> bool:
    """model.py:860-862."""
    return "Q46831" in instanceof(item)


def is_church_building(item: Item) -> bool:
    """model.py:867-868."""
    return "Q16970" in instanceof(item)


def is_reservoir(item: Item) -> bool:
    """model.py:870-871."""
    return "Q131681" in instanceof(item)


def is_stolperstein(item: Item) -> bool:
    """model.py:873-874."""
    return "Q26703203" in instanceof(item)


def is_primarily_building(item: Item) -> bool:
    """model.py:876-891."""
    return bool(_BUILDING_ISA & set(instanceof(item)))


def is_proposed(item: Item) -> bool:
    """model.py:893-903."""
    cats = categories(item)
    if any(cat.startswith("Disused ") for cat in cats):
        return False
    if any(cat.startswith("Proposed ") for cat in cats):
        return True
    return "Q811683" in instanceof(item)


def is_a_historic_district(item: Item) -> bool:
    """model.py:905-922."""
    cats = categories(item)
    return (
        "Q15243209" in instanceof(item)
        or any(cat.startswith("Historic district") for cat in cats)
    ) and not any(
        cat.startswith("Historic district contributing properties")
        or cat.startswith("Churches ")
        or cat.startswith("Towers ")
        or cat.startswith("Educational institutions ")
        or cat.startswith("Schools ")
        or cat.startswith("Houses ")
        or cat.startswith("Historic house ")
        or cat.startswith("Museums ")
        or " buildings " in cat
        or cat.startswith("Buildings and structures ")
        for cat in cats
    )


def is_cricket_ground(item: Item) -> bool:
    """model.py:680-681."""
    return any("cricket" in name.lower() for name in item.get("names") or {})


def is_nhle(item: Item) -> bool:
    """model.py:1115-1118."""
    return bool(item.get("p1216"))


def skip_item_during_match(item: Item) -> bool:
    """Skip poor-quality / non-physical items (model.py:972-1006)."""
    if is_proposed(item):
        return True
    isa_set = set(instanceof(item))
    if isa_set & _SKIP_ISA:
        return True
    if isa_set & _KEEP_ISA:
        return False
    sites = set(item.get("sitelinks") or [])
    if not sites:
        return False
    return sites == {"cebwiki"} or sites == {"cebwiki", "svwiki"}


_DEFUNCT_WORDS = {
    "demolish", "disestablishment", "defunct", "abandon", "mothballed",
    "decommission", "former", "dismantled", "disused", "disassembled",
    "abandoned", "disband", "scrapped", "unused", "closed", "condemned",
    "redundant",
}  # model.py:781-799
_DEFUNCT_EXCLUDE = {
    "Defunct baseball venues in the United States",
    "Defunct National Football League venues",
    "Enclosed roller coasters",
    "Former civil parishes in England",
    "Capitals of former nations",
    "Former state capitals in the United States",
}  # model.py:801-808


def defunct_cats(item: Item) -> list[str]:
    """Defunct categories the item belongs to (model.py:779-822).

    Display-side in the reference (view.py:1255) — the match-path
    disused-prefix tag expansion lives in rules/tags.calculate_tags; this
    predicate completes the §2.2 surface for downstream consumers."""
    found: list[str] = []
    for item_cat in categories(item):
        if item_cat in _DEFUNCT_EXCLUDE:
            continue
        if item_cat.startswith("Former") and item_cat.endswith("Railway stations"):
            # 'Former <operator> Railway stations' subcategories mostly
            # contain stations that still exist (model.py:813-818)
            continue
        lc = item_cat.lower()
        found += [item_cat for w in _DEFUNCT_WORDS if w in lc]
    return found


def more_endings_from_isa(item: Item) -> set[str]:
    """IsA labels in the item's languages as trim endings (model.py:455-468)."""
    endings: set[str] = set()
    langs = set(item.get("languages") or [])
    skip_isa = {"Q5783996"}  # cottage — too many mismatches
    for isa_qid, labels in (item.get("isa_labels") or {}).items():
        if isa_qid in skip_isa:
            continue
        for lang, label in (labels or {}).items():
            if lang in langs:
                endings.add(label)
    return endings
