"""Within-polygon place names (SURVEY §2.4 #38).

Reference: ``get_within_names`` (matcher/matcher.py:582-599) — when the
``HUNT_FOR_MORE_PLACE_NAMES`` config flag is on (matcher.py:658; default
OFF), every candidate OSM object is checked against the place's polygon
and relation tables: any *other* geometry that ``ST_Contains`` the
candidate and carries a ``place`` or ``tourism`` tag contributes its names
to the item's ``place_names`` for that candidate's name comparison
(matcher.py:712,720), enabling "X, <village>" ↔ "X" matches via
``strip_place_name``.

Geometry proxy: this engine's doc table carries point geometries
(centroid lat/lon; FIXTURES.md).  A polygon/relation row that carries a
``way_area`` tag (the osm2pgsql planet_osm_polygon column, in m²) is
treated as a disc of equal area centred on its centroid::

    ST_Contains(poly, obj)  ≈  haversine(centroid, obj) <= sqrt(way_area/π)

Rows without ``way_area`` have no extent and never contain anything.
The self-row exclusion mirrors the reference's
``a.src_type != src_type or a.osm_id != b.osm_id`` predicate.

Pure Python (no Ray) — the serial oracle and the Ray scorer share it.
"""

from __future__ import annotations

import math
from typing import Any

from ..geo import haversine_m
from .names import get_osm_names

#: tag keys that make a containing geometry contribute names
#: (matcher.py:596: ``osm_tags.keys() & {"place", "tourism"}``)
WITHIN_TAG_KEYS = {"place", "tourism"}


def polygon_radius_m(tags: dict[str, str]) -> float | None:
    """Equal-area disc radius for a polygon row, from its way_area tag."""
    raw = tags.get("way_area")
    if not raw:
        return None
    try:
        area = float(raw)
    except ValueError:
        return None
    return math.sqrt(area / math.pi) if area > 0 else None


def collect_place_polygons(objs: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """The broadcastable polygon index: place/tourism polygon+relation rows
    with an extent (the reference's ``{prefix}_polygon ∪ {prefix}_relation``
    scan filtered to place/tourism tags, matcher.py:585-597).

    This set is the per-place polygon table in the reference — villages,
    suburbs, parks — a tiny fraction of the corpus, so it broadcasts via
    ``ray.put`` (read once per worker from shared memory) rather than
    joining a shuffle.
    """
    polys: list[dict[str, Any]] = []
    for o in objs:
        if o.get("planet_table") not in ("polygon", "relation"):
            continue
        tags = o.get("tags") or {}
        if not (tags.keys() & WITHIN_TAG_KEYS):
            continue
        if o.get("lat") is None or o.get("lon") is None:
            continue
        radius = polygon_radius_m(tags)
        if radius is None:
            continue
        names = set(get_osm_names(tags).values())
        if not names:
            continue
        polys.append(
            {
                "lat": float(o["lat"]),
                "lon": float(o["lon"]),
                "radius_m": radius,
                "osm_type": o["osm_type"],
                "osm_id": int(o["osm_id"]),
                "names": names,
            }
        )
    return polys


def within_place_names(
    obj: dict[str, Any], polygons: list[dict[str, Any]]
) -> set[str]:
    """Names of place/tourism polygons containing ``obj`` (excluding the
    polygon row that *is* obj — matcher.py:590-591)."""
    lat, lon = obj.get("lat"), obj.get("lon")
    if lat is None or lon is None:
        return set()
    names: set[str] = set()
    for p in polygons:
        if p["osm_type"] == obj["osm_type"] and p["osm_id"] == obj["osm_id"]:
            continue
        if haversine_m(lat, lon, p["lat"], p["lon"]) <= p["radius_m"]:
            names |= p["names"]
    return names
