"""Per-pair candidate evaluation: match checks + the veto catalogue.

Reimplements the per-row body of the reference's candidate generator
(matcher/matcher.py:602-917) and its standalone re-check
(matcher.py:995-1135), keeping the reference's reject-reason strings as a
column for debuggability and F1 auditing (SURVEY.md §2.8).

ItemContext performs the per-item precomputation once (matcher.py:608-660);
evaluate_candidate() is the per-pair hot path called from the scorer actor.
"""

from __future__ import annotations

from typing import Any

from . import item as item_rules
from . import names as name_rules
from . import tags as tag_rules
from .address import (
    check_for_address_in_extract,
    check_identifier,
    check_name_matches_address,
)
from .ruleset import RuleSet

OsmTags = dict[str, str]


def is_osm_bus_stop(tags: OsmTags) -> bool:
    """matcher.py:399-403."""
    return tags.get("highway") == "bus_stop" or (
        tags.get("bus") == "yes" and tags.get("public_transport") == "stop_position"
    )


def station_house_too_far(item: dict, osm_tags: OsmTags, dist: float | None) -> bool:
    """Station name alone can't claim a distant ordinary house (matcher.py:406-423)."""
    if not item_rules.is_a_station(item) or dist is None or dist <= 50:
        return False
    building = set(osm_tags.get("building", "").split(";"))
    if not building & {"house", "residential", "detached", "semidetached_house"}:
        return False
    railway = set(osm_tags.get("railway", "").split(";"))
    public_transport = set(osm_tags.get("public_transport", "").split(";"))
    return (
        not railway & {"station", "halt", "historic_station"}
        and not public_transport & {"station", "stop_area"}
        and osm_tags.get("building") != "train_station"
    )


def is_diplomatic_mission(matching_tags: set[str], osm_tags: OsmTags) -> bool:
    """matcher.py:426-439."""
    if "amenity=embassy" in matching_tags:
        return True
    if osm_tags.get("office") == "diplomatic":
        return True
    terms = ("embassy", "diplomatic", "consulate", "ambassador")
    for key, value in osm_tags.items():
        if "name" not in key or "old" in key:
            continue
        lc = value.lower()
        if any(t in lc for t in terms):
            return True
    return False


def diplomatic_mission_different_country(
    item: dict, tags: OsmTags, ruleset: RuleSet
) -> bool:
    """matcher.py:442-466 — embassy country disagrees with the item's P137."""
    name = tags.get("name:en") or tags.get("name")
    osm_country = tags.get("diplomatic:sending_country") or tags.get("country")
    item_countries = set(item.get("p137") or [])

    if name:
        name_country = ruleset.embassy_country_from_name(name)
        if name_country and name_country not in item_countries:
            return True

    if not osm_country or len(osm_country) not in (2, 3):
        return False
    codes = ruleset.country_codes(item_countries)
    return not any(code.upper() == osm_country.upper() for code in codes)


def is_building_only_match(matching_tags: set[str]) -> bool:
    """matcher.py:469-472."""
    return matching_tags.issubset({"building", "building=yes", "historic:building"})


def is_bad_match(item: dict, osm_tags: OsmTags, ruleset: RuleSet) -> bool:
    """Static incompatibility catalogue (matcher.py:475-558)."""
    item_tags = set(item.get("tags") or [])
    amenity = set(osm_tags["amenity"].split(";") if "amenity" in osm_tags else [])

    if (
        "amenity=post_office" in item_tags
        and "place_of_worship" in amenity
        and "post_office" not in amenity
    ):
        return True  # post office shouldn't match a church with a similar name

    if ruleset.bad_match_filter_hit(item_tags, osm_tags):
        return True

    building = set(osm_tags["building"].split(";") if "building" in osm_tags else [])

    if "car_rental" in amenity or "car_sharing" in amenity:
        return True  # building only not good enough

    for building_type in ("stable", "barn", "farm_auxiliary"):
        if (
            "building=" + building_type in item_tags
            and "building=house" not in item_tags
            and "house" in building
            and building_type not in building
        ):
            return True  # Wikidata stable shouldn't match OSM house

    if (
        "building=tower" in item_tags
        and "amenity=pub" not in item_tags
        and "pub" in amenity
        and "man_made" not in osm_tags
    ):
        return True  # Wikidata tower shouldn't match OSM pub

    if (
        "historic=castle" in item_tags
        and "railway=station" not in item_tags
        and (
            osm_tags.get("railway") == "station"
            or osm_tags.get("building") == "train_station"
        )
        and osm_tags.get("historic") != "castle"
    ):
        return True  # castle shouldn't match railway station

    if (
        "railway=station" in item_tags
        and "amenity=cafe" not in item_tags
        and "cafe" in amenity
        and osm_tags.get("railway") != "station"
        and osm_tags.get("building") != "train_station"
    ):
        return True  # station shouldn't match cafe

    if (
        "railway=station" in item_tags
        and "shop=supermarket" not in item_tags
        and osm_tags.get("shop") == "supermarket"
        and osm_tags.get("railway") != "station"
        and osm_tags.get("building") != "train_station"
    ):
        return True  # station shouldn't match supermarket

    if (
        "building=train_station" not in item_tags
        and osm_tags.get("building") == "train_station"
    ):
        return True  # non-station shouldn't match station

    if "amenity=fuel" not in item_tags and "fuel" in amenity:
        return True  # petrol station

    if (
        "place" in item_tags
        and not any(t.startswith("railway") for t in item_tags)
        and "place" not in osm_tags
        and "railway" in osm_tags
    ):
        return True  # place shouldn't match railway

    return False


def is_address_node(osm_type: str, osm_tags: OsmTags) -> bool:
    """matcher.py:561-571."""
    if osm_type != "node" or "addr:housename" in osm_tags:
        return False
    return all(
        key.startswith("addr:")
        or key.startswith("source:")
        or key in {"entrance", "source"}
        for key in osm_tags
    )


def osm_is_stolperstein(osm_tags: OsmTags) -> bool:
    """matcher.py:574-579."""
    return (
        osm_tags.get("memorial:type") == "stolperstein"
        or osm_tags.get("memorial") == "stolperstein"
    )


def bad_building_match(
    osm_tags: OsmTags,
    name_match: name_rules.NameMatchDict,
    item: dict,
    extract_name_good_enough: bool = True,
) -> bool:
    """Building-only name matches that don't count (matcher.py:360-396)."""
    if "amenity" in osm_tags:
        if "parking" in set(osm_tags["amenity"].split(";")):
            return True
    if not name_match:
        return False

    wd_station = item_rules.is_a_station(item)
    osm_station = any(
        k.endswith("railway") and v in {"station", "halt"} for k, v in osm_tags.items()
    )
    is_station = wd_station or osm_station

    for osm_key, detail_list in name_match.items():
        for match_type, _, source in detail_list:
            if match_type == "both_trimmed":
                continue
            if (
                not extract_name_good_enough
                and len(source) == 1
                and source[0][0] == "extract"
            ):
                continue
            if osm_key == "operator" and match_type == "wikidata_trimmed":
                continue
            if match_type == "wikidata_trimmed" and is_station:
                continue
            return False
    return True


class ItemContext:
    """Per-item precomputation shared by all its candidate pairs
    (mirrors find_item_matches's prologue, matcher.py:608-660)."""

    def __init__(self, item: dict, ruleset: RuleSet) -> None:
        self.item = item
        self.ruleset = ruleset
        self.names: dict[str, Any] = item.get("names") or {}
        self.cats: list[str] = item.get("categories") or []
        self.identifiers = item.get("identifiers") or {}
        self.nrhp = set(item.get("nrhp") or [])
        self.is_historic_district = item_rules.is_a_historic_district(item)
        ignore_tags = {"building"} if self.is_historic_district else set()

        self.wikidata_tags = tag_rules.calculate_tags(
            item.get("tags") or [],
            item.get("isa") or [],
            self.names,
            nrhp_refs=self.nrhp,
            is_shopping_street=item_rules.is_shopping_street(item),
        )
        # tags used for candidate *search* exclude ignore_tags (matcher.py:619-620)
        self.search_tags = tag_rules.calculate_tags(
            item.get("tags") or [],
            item.get("isa") or [],
            self.names,
            nrhp_refs=self.nrhp,
            is_shopping_street=item_rules.is_shopping_street(item),
            ignore_tags=ignore_tags,
        )
        self.max_dist_km = (
            tag_rules.get_max_dist_from_criteria(item.get("tags") or [])
            or tag_rules.DEFAULT_MAX_DIST_KM
        )

        endings = tag_rules.get_ending_from_criteria(set(item.get("tags") or []))
        endings |= item_rules.more_endings_from_isa(item)
        if item_rules.is_farmhouse(item):
            endings = set()
        self.is_hamlet = item_rules.is_hamlet(item)
        if self.is_hamlet:
            endings.discard("house")
        endings.discard("street")
        self.endings = endings

        self.place_names = set(item.get("place_names") or [])
        self.instanceof = set(item.get("isa") or [])
        self.is_stolperstein = item_rules.is_stolperstein(item)
        self.extract = item.get("extract") or ""


def evaluate_candidate(
    ctx: ItemContext,
    osm_type: str,
    osm_tags: OsmTags,
    dist: float,
    extra_place_names: "set[str] | None" = None,
) -> dict[str, Any]:
    """Score one (item, OSM object) pair; the per-row body of
    find_item_matches (matcher.py:662-906).

    Returns a dict with the match evidence, or {"reject": reason}.
    """
    item = ctx.item
    ruleset = ctx.ruleset
    item_tags = set(item.get("tags") or [])

    if (
        osm_tags.get("locality") == "townland"
        and "locality=townland" not in item_tags
    ):
        return {"reject": "only match townlands when searching for one"}

    if ctx.is_historic_district and "building" in osm_tags:
        return {"reject": "historic district shouldn't match building"}

    if not ruleset.match_address_nodes and is_address_node(osm_type, osm_tags):
        return {"reject": "address node"}

    if ctx.is_stolperstein and not osm_is_stolperstein(osm_tags):
        return {"reject": "stolperstein only matches stolperstein"}

    try:
        admin_level: int | None = (
            int(osm_tags["admin_level"]) if "admin_level" in osm_tags else None
        )
    except ValueError:
        admin_level = None

    identifier_match = check_identifier(osm_tags, ctx.identifiers)

    if not identifier_match:
        if any(c.startswith("Cities ") for c in ctx.cats) and admin_level == 10:
            return {"reject": "bad city match"}
        if station_house_too_far(item, osm_tags, dist):
            return {"reject": "station shouldn't match a distant house"}

    address_match = check_name_matches_address(osm_tags, ctx.names)
    if address_match is False:
        return {"reject": "OSM and Wikidata addresses differ"}
    if not address_match and check_for_address_in_extract(osm_tags, ctx.extract):
        address_match = True

    # per-candidate within-polygon names augment the item's place names
    # (#38, matcher.py:712,720 — `place_names | within`)
    place_names = (
        ctx.place_names | extra_place_names
        if extra_place_names
        else ctx.place_names
    )
    name_match = name_rules.check_for_match(
        osm_tags,
        ctx.names,
        set(ctx.endings),
        place_names=place_names,
        trim_house=not ctx.is_hamlet,
    )

    if "seamark:name" in name_match and "man_made=lighthouse" not in item_tags:
        del name_match["seamark:name"]  # not a lighthouse

    if not (identifier_match or address_match or name_match):
        return {"reject": "no match"}

    matching_tags = tag_rules.find_matching_tags(osm_tags, ctx.wikidata_tags)

    if is_diplomatic_mission(matching_tags, osm_tags) and (
        diplomatic_mission_different_country(item, osm_tags, ruleset)
    ):
        return {"reject": "embassy of wrong country"}

    building_only_match = is_building_only_match(matching_tags)
    amenity = set(osm_tags["amenity"].split(";") if "amenity" in osm_tags else [])

    if (
        "building" in item_tags
        and "amenity=car_sharing" not in item_tags
        and "building" not in osm_tags
        and "car_sharing" in amenity
    ):
        return {"reject": "building shouldn't match car sharing"}

    if building_only_match and address_match and not name_match and not identifier_match:
        if (
            "amenity=school" in item_tags
            and "amenity=restaurant" not in item_tags
            and "restaurant" in amenity
            and "school" not in amenity
        ):
            return {"reject": "school shouldn't match restaurant"}

    if (
        building_only_match
        and address_match
        and not identifier_match
        and "building=train_station" not in item_tags
        and osm_tags.get("building") == "train_station"
    ):
        return {"reject": "non-station shouldn't match station by address"}

    if (
        building_only_match
        and not address_match
        and name_match
        and not identifier_match
        and is_bad_match(item, osm_tags, ruleset)
    ):
        return {"reject": "bad match"}

    if (not matching_tags or building_only_match) and ctx.instanceof == {"Q34442"}:
        return {"reject": "nearby road match"}

    if osm_tags.get("amenity") == "parking" and "amenity=parking" not in item_tags:
        return {"reject": "parking only matches parking"}

    if is_osm_bus_stop(osm_tags) and "Q953806" not in ctx.instanceof:
        return {"reject": "bus stop only matches bus stop"}

    if (
        "leisure=park" in matching_tags
        and item_rules.is_cricket_ground(item)
        and (
            osm_tags.get("designation") == "common"
            or "common" in (osm_tags.get("name") or "").lower()
        )
    ):
        return {"reject": "cricket ground shouldn't match common"}

    if name_match and not identifier_match and not address_match and building_only_match:
        if bad_building_match(
            osm_tags, name_match, item, ruleset.extract_name_good_enough
        ):
            return {"reject": "bad building match"}
        wd_stadium = item_rules.is_a_stadium(item)
        if (
            wd_stadium
            and "amenity=restaurant" not in item_tags
            and "restaurant" in amenity
        ):
            return {"reject": "stadium shouldn't match restaurant"}
        if wd_stadium and osm_tags.get("shop") == "supermarket":
            return {"reject": "stadium shouldn't match supermarket"}

    if (
        matching_tags == {"natural=peak"}
        and item_rules.is_mountain_range(item)
        and dist > 100
    ):
        return {"reject": "mountain range shouldn't match peak"}

    if item_rules.is_nhle(item) and dist > 500:
        return {"reject": "NHLE item too far away"}

    if (
        not identifier_match
        and "railway=station" in item_tags
        and "amenity=ferry_terminal" not in item_tags
        and "ferry_terminal" in amenity
        and osm_tags.get("railway") != "station"
        and osm_tags.get("building") != "train_station"
    ):
        return {"reject": "station shouldn't match ferry terminal"}

    if (
        "amenity=place_of_worship" in item_tags
        and "man_made=bridge" not in item_tags
        and osm_tags.get("man_made") == "bridge"
        and "place_of_worship" not in amenity
    ):
        return {"reject": "place of worship shouldn't match bridge"}

    if (
        not name_match
        and address_match
        and (
            "building=apartments" in item_tags or "building=residential" in item_tags
        )
        and not any(t.startswith("shop") for t in item_tags)
        and "shop" in osm_tags
        and osm_tags.get("building") not in ("apartments", "residential")
    ):
        return {"reject": "apartment building shouldn't match shop"}

    if (
        not name_match
        and address_match
        and "studio=audio" in item_tags
        and not any(t.startswith("shop") for t in item_tags)
        and "shop" in osm_tags
        and osm_tags.get("studio") != "audio"
    ):
        return {"reject": "recording studio shouldn't match shop"}

    if (
        "artwork_type=statue" in item_tags
        and "tourism=museum" not in item_tags
        and osm_tags.get("tourism") == "museum"
        and osm_tags.get("artwork_type") != "statue"
    ):
        return {"reject": "statue shouldn't match museum"}

    if (
        "historic=memorial" not in item_tags
        and osm_tags.get("historic") == "memorial"
    ):
        return {"reject": "only memorial should match memorial"}

    return {
        "identifier_match": identifier_match,
        "address_match": address_match,
        "name_match": name_match,
        "matching_tags": matching_tags,
    }
