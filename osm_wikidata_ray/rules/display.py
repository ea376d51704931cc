"""Display helpers (reference matcher/utils.py:105-151).

Kept for API completeness: distance formatting used by the reference's
result views, plus capfirst.  Pure functions.
"""

from __future__ import annotations

METRES_PER_MILE = 1609.344
FEET_PER_METRE = 3.28084
FEET_PER_MILE = 5280


def capfirst(value: str) -> str:
    """Uppercase first letter, leave the rest (utils.py:105-107)."""
    return value[0].upper() + value[1:] if value else value


def metric_display_distance(units: str, dist: float) -> str | None:
    """utils.py:121-130."""
    if units == "km_and_metres":
        units = "km" if dist > 500 else "metres"
    if units == "metres":
        return f"{dist:,.0f} m"
    if units == "km":
        return f"{dist / 1000:,.2f} km"
    return None


def display_distance(units: str, dist: float) -> str | None:
    """utils.py:133-151."""
    if units in ("miles_and_feet", "miles_and_yards"):
        total_feet = dist * FEET_PER_METRE
        miles = total_feet / FEET_PER_MILE
        if miles > 0.5:
            return f"{miles:,.2f} miles"
        return {
            "miles_and_feet": f"{total_feet:,.0f} feet",
            "miles_and_yards": f"{total_feet / 3:,.0f} yards",
        }[units]
    if units == "miles_and_metres":
        miles = dist / METRES_PER_MILE
        return f"{miles:,.2f} miles" if miles > 0.5 else f"{dist:,.0f} metres"
    return metric_display_distance(units, dist)
