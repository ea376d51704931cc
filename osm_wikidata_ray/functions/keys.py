"""Blocking-key generation.

The reference blocks candidates spatially (ST_DWithin + hstore tag index,
matcher/matcher.py:281-308); the engine replaces that with equi-join blocking
keys (SURVEY.md §2.4/§7.3):

  n:<token>   normalized name token (stop-tokens dropped) — both sides
  n:<full>    full normalized name — both sides
  n:<initials> initials of multi-word names — both sides (covers "TIAT")
  i:<key>=<v> identifier value key (covers identifier-only matches,
              matcher.py:727 — identifier match alone is sufficient)
  a:<norm>    normalized house-number address — both sides
  g:<cy>:<cx> ~10 m geo cell (reference nearby-node rule, matcher.py:240-251);
              OSM nodes emit their cell, items a 3x3 neighborhood

Every function is pure and deterministic; the fixture generator uses the same
functions so gold pairs are discoverable by construction ("at the same
blocking key").
"""

from __future__ import annotations

import re
from typing import Any, Iterable

from ..geo import geo_cell, geo_cell_key, geo_cell_neighborhood
from ..rules.names import (
    ABBR,
    get_osm_names,
    normalize_name,
    re_number_start,
    tidy_name,
)

# canonical road/direction expansion so "1610 E Tropicana Ave." and
# "East Tropicana Avenue" produce the same address key (the matcher itself
# handles abbreviations via re_abbr, match.py:803-826 — blocking must too)
_ABBR_EXPAND = {v: k for k, v in ABBR.items()}
re_abbr_token = re.compile(
    r"\b(" + "|".join(sorted(_ABBR_EXPAND, key=len, reverse=True)) + r")\.?\b",
    re.I,
)

# street-address phrases inside a Wikipedia extract, e.g.
# "450 West 37th Street", "1610 E Tropicana Ave."
re_extract_address = re.compile(
    r"\b(\d+[-\d]*(?: (?:[A-Z][\w'.-]*|\d+\w*)){1,4} "
    r"(?:Street|Road|Avenue|Lane|Boulevard|Drive|Square|Plaza|"
    r"Ave|St|Rd|Blvd|Dr|Ln|Sq)\.?)(?=[\s,.;)]|$)"
)


def canonical_address_key(address: str) -> str:
    """Expand road/direction abbreviations, then normalize."""
    expanded = re_abbr_token.sub(
        lambda m: _ABBR_EXPAND.get(m.group(1).lower(), m.group(1)), address
    )
    return "a:" + normalize_name(expanded)

# high-frequency tokens that would create mega-blocks; pairs relying on one
# of these alone are also discoverable via the full-name or address key
STOP_TOKENS = {
    "the", "of", "and", "a", "an", "at", "de", "di", "la", "le", "les",
    "von", "in", "on", "der", "den", "el", "al", "do", "da", "street",
    "road", "avenue", "lane", "st", "saint",
}

re_word = re.compile(r"[^\W_]+", re.U)

MAX_KEYS_PER_RECORD = 64  # cap key explosion for pathological names


def _name_keys(name: str) -> set[str]:
    keys: set[str] = set()
    full = normalize_name(name)
    if len(full) > 2:
        keys.add("n:" + full)
    # tidy-rewritten full name: recalls pairs whose every token is rewritten
    # by the tidy_name cascade ("Mount No. 3" vs "Mt Number 3" share no raw
    # token and no normalized full name, but the same tidied form —
    # match.py:103-177 makes such pairs matches, so blocking must find them)
    tidied_full = "".join(re_word.findall(tidy_name(name.lower())))
    if len(tidied_full) > 2 and tidied_full != full:
        keys.add("n:" + tidied_full)
    terms = re_word.findall(name.lower())
    for t in terms:
        if len(t) > 2 and t not in STOP_TOKENS and not t.isdigit():
            keys.add("n:" + t)
    # initials key so "TIAT" collides with "This Is A Test"
    alnum_terms = [t for t in name.split() if t and t[0].isalnum()]
    if len(alnum_terms) >= 3:
        initials = "".join(t[0] for t in alnum_terms).lower()
        if len(initials) >= 3:
            keys.add("n:" + initials)
    return keys


def _address_keys(housenumber: str, street: str) -> set[str]:
    return {canonical_address_key(f"{housenumber} {street}")}


def wd_block_keys(item: dict[str, Any], with_geo: bool = True) -> list[str]:
    """Blocking keys for a parsed Wikidata item record."""
    keys: set[str] = set()
    for name in item.get("names") or {}:
        keys |= _name_keys(name)
        m = re_number_start.match(name)
        if m:  # number-start names double as address keys
            keys.add(canonical_address_key(m.group(1)))
    for addr in item.get("street_addresses") or []:
        keys.add(canonical_address_key(addr))
    # extract-address recall: the reference accepts candidates whose OSM
    # address appears in the item's Wikipedia extract with no name overlap
    # (check_for_address_in_extract, match.py:803-826) — key those addresses
    for phrase in re_extract_address.findall(item.get("extract") or ""):
        keys.add(canonical_address_key(phrase))
    for osm_key, entries in (item.get("identifiers") or {}).items():
        for values, _label in entries:
            for v in values:
                keys.add(f"i:{osm_key}={v.replace(' ', '').lower()}")
    if with_geo and item.get("lat") is not None:
        keys.update(geo_cell_neighborhood(item["lat"], item["lon"]))
    return sorted(keys)[:MAX_KEYS_PER_RECORD]


def osm_block_keys(
    tags: dict[str, str],
    lat: float | None = None,
    lon: float | None = None,
    planet_table: str | None = None,
) -> list[str]:
    """Blocking keys for a parsed OSM object record."""
    keys: set[str] = set()
    for _key, value in get_osm_names(tags).items():
        for part in value.split(";"):
            part = part.strip()
            if part:
                keys |= _name_keys(part)
    hn, street = tags.get("addr:housenumber"), tags.get("addr:street")
    if hn and street:
        keys |= _address_keys(hn, street)
        keys |= _address_keys(street, hn)  # reversed composition (match.py:894)
    full = tags.get("addr:full")
    if full:
        keys.add(canonical_address_key(full))
    for key, value in tags.items():
        if value and key in _IDENTIFIER_OSM_KEYS:
            keys.add(f"i:{key}={value.replace(' ', '').lower()}")
    # nearby-node rule: only OSM *points* join the ~10 m geo blocks
    if lat is not None and planet_table == "point":
        keys.add(geo_cell_key(*geo_cell(lat, lon)))
    return sorted(keys)[:MAX_KEYS_PER_RECORD]


def _identifier_osm_keys() -> set[str]:
    from ..rules.tags import IDENTIFIER_PROPERTIES

    keys: set[str] = set()
    for _pid, osm_keys, _label in IDENTIFIER_PROPERTIES:
        keys.update(osm_keys)
    return keys


_IDENTIFIER_OSM_KEYS = _identifier_osm_keys()
