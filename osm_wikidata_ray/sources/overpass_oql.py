"""Overpass OQL builders (pure functions, no network).

Reimplements the reference's OSM-candidate query generation
(matcher/overpass.py:21-48,100-309): tag grouping, name-only predicates, the
point/area query templates, and per-tag union elements.  In the engine these
define the *filter semantics* of the OSM side of the doc table — which
objects are candidate-worthy (name-ish/ref/wikidata/addr:housenumber
bearers) — and remain usable to drive a live Overpass mirror.
"""

from __future__ import annotations

from collections import defaultdict

# tags for which a bare [name] filter suffices (overpass.py:21-36)
NAME_ONLY_TAGS = {
    "area=yes", "type=tunnel", "leisure=park", "leisure=garden",
    "site=aerodome", "amenity=hospital", "boundary", "amenity=pub",
    "amenity=cinema", "ruins", "retail=retail_park", "amenity=concert_hall",
    "amenity=theatre", "designation=civil_parish",
}
NAME_ONLY_KEYS = (
    "place", "landuse", "admin_level", "water", "man_made", "railway",
    "aeroway", "bridge", "natural",
)

NAME_ISH_FILTER = '[~"^(addr:housenumber|.*name.*)$"~".",i]'

# keys expected only on relations (overpass.py:227,261)
RELATION_ONLY_KEYS = {"site", "type", "route"}


def name_only(tag: str) -> bool:
    """overpass.py:100-105."""
    return tag in NAME_ONLY_TAGS or (
        "=" in tag and any(tag.startswith(k + "=") for k in NAME_ONLY_KEYS)
    )


def get_name_filter(tags: list[str]) -> str:
    """overpass.py:107-113."""
    return "[name]" if all(name_only(t) for t in tags) else NAME_ISH_FILTER


def group_tags(tags: list[str]) -> dict[str, list[str]]:
    """key → values (bare keys get []) (overpass.py:214-223)."""
    ret: defaultdict[str, list[str]] = defaultdict(list)
    for tag_or_key in tags:
        if "=" in tag_or_key:
            key, _, value = tag_or_key.partition("=")
            ret[key].append(value)
        else:
            ret[tag_or_key] = []
    return dict(ret)


def _tag_expr(key: str, values: list[str]) -> str:
    if values:
        if len(values) == 1:
            return f'"{key}"="{values[0]}"'
        return '"{}"~"^({})$"'.format(key, "|".join(values))
    return f'"{key}"'


def element_filter(key: str, values: list[str], filters: str = "area.a") -> str:
    """overpass.py:226-240."""
    t = "rel" if key in RELATION_ONLY_KEYS else "nwr"
    return "{}({})[{}];".format(t, filters, _tag_expr(key, values).replace("␣", " "))


def point_element_filter(key: str, values: list[str], filters: str = "") -> str:
    """overpass.py:242-252."""
    t = "rel" if key in RELATION_ONLY_KEYS else "nwr"
    return "{}{}[{}];".format(t, filters, _tag_expr(key, values).replace("␣", " "))


def oql_from_tag(tag: str, filters: str = "area.a") -> list[str]:
    """Per-tag union elements (overpass.py:258-281)."""
    if tag == "highway":
        return []
    relation_only = tag == "site"
    name_filter = get_name_filter([tag])
    if "=" in tag:
        k, _, v = tag.partition("=")
        if tag == "type=waterway" or k == "route" or tag == "type=route":
            return []  # multipolygon-only in the loader
        if k in RELATION_ONLY_KEYS:
            relation_only = True
        if not k.isalnum() or not v.isalnum():
            tag = f'"{k}"="{v}"'
    elif not tag.isalnum():
        tag = f'"{tag}"'
    return [
        "\n    {}({})[{}]{};".format(t, filters, tag, name_filter)
        for t in (("rel",) if relation_only else ("node", "way", "rel"))
    ]


def oql_for_point(
    lat: float, lon: float, radius: float, tags: list[str], buildings: str | None
) -> str:
    """Radius candidate query (overpass.py:109-150)."""
    union = []
    for key, values in sorted(group_tags(tags).items()):
        u = point_element_filter(key, values, filters=".a")
        if u:
            union.append(u)
    name_filter = get_name_filter(tags)
    oql_building = (
        f'nwr.a["building"][~"^(addr:housenumber|.*name.*)$"~"{buildings}",i];'
        if buildings
        else ""
    )
    return """
[timeout:600][out:xml];
nwr(around:{radius},{lat},{lon})->.a;
(
{tags}
) -> .b;
(
    nwr.a["wikidata"];
    nwr.a["addr:housenumber"];
    nwr.b{name_filter};
    nwr.b[~"^ref:"~"."];
    {oql_building}
);
(._;>;);
out;""".format(
        lat=lat, lon=lon, radius=radius, tags="\n".join(union),
        name_filter=name_filter, oql_building=oql_building,
    )


def oql_for_area(
    overpass_type: str,
    osm_id: int,
    tags: list[str],
    bbox: str,
    buildings: str | None,
    include_self: bool = True,
) -> str:
    """Area candidate query (overpass.py:152-211)."""
    union = []
    for key, values in sorted(group_tags(tags).items()):
        if not key:
            continue
        u = element_filter(key, values)
        if u:
            union.append(u)
    if overpass_type == "node":
        area_id = None
    else:
        area_id = int(osm_id) + {"way": 2400000000, "rel": 3600000000}[overpass_type]
    name_filter = get_name_filter(tags)
    oql_building = (
        'nwr(area.a)["building"]'
        + f'[~"^(addr:housenumber|.*name.*)$"~"{buildings}",i];'
        if buildings
        else ""
    )
    self_el = "    {}({});".format(overpass_type, osm_id) if include_self else ""
    return """
[timeout:600][out:xml][bbox:{bbox}];
area({area_id}) -> .a;
(
{tags}
) -> .b;
(
    {self}
    nwr(area.a)["wikidata"];
    nwr(area.a)["addr:housenumber"];
    nwr.b{name_filter};
    nwr.b[~"^ref:"~"."];
    {oql_building}
);
(._;>;);
out;""".format(
        bbox=bbox, area_id=area_id, tags="\n".join(union), self=self_el,
        name_filter=name_filter, oql_building=oql_building,
    )


def is_candidate_worthy(tags: dict[str, str]) -> bool:
    """The doc-table predicate the OQL filters imply: an OSM object is a
    match candidate iff it carries a wikidata tag, an address number, a
    name-ish tag or a ref (the union arms of the query templates)."""
    return any(
        k == "wikidata"
        or k == "addr:housenumber"
        or "name" in k
        or k.startswith("ref:")
        or k == "ref"
        for k in tags
    )
