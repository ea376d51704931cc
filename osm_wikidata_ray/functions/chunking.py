"""Spatial work-partitioning helpers.

Reimplements the reference's bbox chunking (matcher/place.py:100-149,
utils.py:83-86): aspect-ratio-aware grids used to split a place into
roughly-square chunks.  In the engine this drives input partitioning for
spatially-ordered doc tables (one output partition per chunk → resumable
per-chunk lineage), mirroring the reference's per-chunk SPARQL/Overpass
downloads.
"""

from __future__ import annotations

import math

BBox = tuple[float, float, float, float]  # south, north, west, east


def calc_chunk_size(area_in_sq_km: float, size: int = 22) -> int:
    """Chunks per side for a given area (utils.py:83-86)."""
    side = math.sqrt(area_in_sq_km)
    return max(1, math.ceil(side / size))


def bbox_chunk_dimensions(bbox: BBox, n: int) -> tuple[int, int]:
    """Aspect-ratio-aware (rows, columns) grid (place.py:103-129)."""
    n = max(1, n)
    if n == 1:
        return 1, 1
    south, north, west, east = map(float, bbox)
    height = abs(north - south)
    midpoint_latitude = (south + north) / 2
    width = abs(east - west) * math.cos(math.radians(midpoint_latitude))
    if not height:
        return (1, n * n) if width else (1, 1)
    if not width:
        return (n * n, 1)
    aspect_ratio = width / height
    target_count = n * n
    columns = max(1, round(math.sqrt(target_count * aspect_ratio)))
    rows = max(1, round(math.sqrt(target_count / aspect_ratio)))
    return rows, columns


def bbox_chunk(bbox: BBox, n: int) -> list[BBox]:
    """Split a bbox into the grid's chunks (place.py:132-149)."""
    south, north, west, east = bbox
    rows, columns = bbox_chunk_dimensions(bbox, n)
    ns = (north - south) / rows
    ew = (east - west) / columns
    return [
        (
            south + ns * row,
            south + ns * (row + 1),
            west + ew * col,
            west + ew * (col + 1),
        )
        for row in range(rows)
        for col in range(columns)
    ]
