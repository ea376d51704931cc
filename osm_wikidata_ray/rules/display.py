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


# pattern.en-equivalent rules for the vocabulary isa labels draw from
# (reference utils.py:181-191 delegates to pattern.en.pluralize; that
# library is not available here, so the classical pluralization rules it
# implements are inlined for the regular cases + common irregulars)
_PLURAL_IRREGULAR = {
    "mine": "mines",  # the reference's own override (pattern says "ours")
    "child": "children", "person": "people", "man": "men", "woman": "women",
    "foot": "feet", "tooth": "teeth", "goose": "geese", "mouse": "mice",
    "church": "churches",
    # classical -is / Latin plurals pattern.en applies (plausible isa labels)
    "analysis": "analyses", "basis": "bases", "crisis": "crises",
    "thesis": "theses", "oasis": "oases", "axis": "axes",
    "diagnosis": "diagnoses", "synopsis": "synopses", "cactus": "cacti",
    "series": "series", "species": "species",
}
_ES_ENDINGS = ("s", "x", "z", "ch", "sh")
_F_TO_VES = ("leaf", "shelf", "wolf", "half", "calf", "loaf", "scarf")
# consonant+o nouns that take -s anyway (pattern.en's exception list)
_O_TAKES_S = ("photo", "piano", "halo", "solo", "soprano", "canto", "kimono",
              "zero", "pro", "memo", "logo", "dynamo", "casino")


def pluralize_label(label: dict[str, str]) -> str:
    """Plural of an English isa label; non-English labels pass through
    (reference utils.py:181-191, used by IsA.label_best_language
    model.py:219-224)."""
    text = label["value"]
    if label["language"] != "en":
        return text
    low = text.lower()
    if low in _PLURAL_IRREGULAR:
        out = _PLURAL_IRREGULAR[low]
        return out.capitalize() if text[:1].isupper() else out
    if low.endswith("y") and len(text) > 1 and low[-2] not in "aeiou":
        return text[:-1] + "ies"
    if low.endswith(_ES_ENDINGS):
        return text + "es"
    if (
        low.endswith("o")
        and len(text) > 1
        and low[-2] not in "aeiou"
        and low not in _O_TAKES_S
    ):
        return text + "es"  # volcano→volcanoes, tomato→tomatoes
    if low in _F_TO_VES:
        return text[:-1] + "ves"
    if low.endswith("fe") and low[:-2] + "fe" in ("knife", "wife", "life"):
        return text[:-2] + "ves"
    return text + "s"
