"""Geodesic helpers (vectorized).

Replaces the reference's PostGIS ST_Distance / ST_DWithin calls
(matcher/matcher.py:297-300) and geopy.distance (api_view.py:100) with a
numpy haversine suitable for Arrow-batch UDFs.
"""

from __future__ import annotations

import math

import numpy as np

EARTH_RADIUS_M = 6_371_008.8


def haversine_m(
    lat1: np.ndarray | float,
    lon1: np.ndarray | float,
    lat2: np.ndarray | float,
    lon2: np.ndarray | float,
) -> np.ndarray:
    """Great-circle distance in metres; broadcasts over numpy arrays."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(x, dtype=np.float64)) for x in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def offset_latlon(lat: float, lon: float, north_m: float, east_m: float) -> tuple[float, float]:
    """Move a point by metres (small-offset approximation, fixture use)."""
    dlat = north_m / 111_194.9
    dlon = east_m / (111_194.9 * max(math.cos(math.radians(lat)), 1e-6))
    return lat + dlat, lon + dlon


# ~10 m grid cells for the nearby-node blocking key (reference nearby_nodes_sql
# radius, matcher.py:240-251).  1e-4 deg latitude ≈ 11.1 m.
GEO_CELL_DEG = 1e-4
NEARBY_RADIUS_M = 10.0


def geo_cell(lat: float, lon: float) -> tuple[int, int]:
    return (int(math.floor(lat / GEO_CELL_DEG)), int(math.floor(lon / GEO_CELL_DEG)))


def geo_cell_key(cy: int, cx: int) -> str:
    return f"g:{cy}:{cx}"


def geo_cell_neighborhood(lat: float, lon: float) -> list[str]:
    """Cell neighborhood emitted on the Wikidata side so any node within
    ~10 m shares a cell key with the item.

    Longitude cells shrink to ~11.1·cos(lat) m east-west, so the east-west
    half-width grows with latitude (a fixed 3x3 block misses sub-10 m
    neighbors above ~26°).  Width is capped — past ~89.7° the nearby-node
    rule degrades gracefully rather than exploding the key count."""
    cy, cx = geo_cell(lat, lon)
    cell_w_m = 111_194.9 * GEO_CELL_DEG * max(math.cos(math.radians(lat)), 1e-6)
    nx = min(int(math.ceil(NEARBY_RADIUS_M / cell_w_m)), 200)
    return [
        geo_cell_key(cy + dy, cx + dx)
        for dy in (-1, 0, 1)
        for dx in range(-nx, nx + 1)
    ]
