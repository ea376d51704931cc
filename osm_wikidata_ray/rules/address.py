"""Address and identifier checks.

Faithful reimplementation of the reference's address/identifier predicates
(matcher/match.py:765-953, matcher/utils.py:43-47,154-178).  The address
check is tri-state: True (corroborates), None (unknown), False (**veto** —
candidate dropped, matcher/matcher.py:703-704).
"""

from __future__ import annotations

import re
from typing import Any, Collection

from .names import (
    normalize_name,
    normalized_name_match,
    normalized_name_startswith,
    re_address_common_end,
    re_number_start,
    re_uk_postcode_start,
    ABBR,
    re_abbr,
)

OsmTags = dict[str, str]

re_range_start = re.compile(r"\d+ ?([-–+&]|and) ?$")  # match.py:800
re_addr_range = re.compile(r"\b(\d+) ?(?:to|-) ?(\d+)\b", re.I)
re_number_list = re.compile(r"\b([\d, ]+) (?:and|&) (\d+)\b", re.I)
re_leading_number = re.compile(r"^(?:No\.?|Number)? ?(\d+)\b")


def normalize_url(url: str) -> str:
    """Strip scheme, www and trailing slash (utils.py:43-47)."""
    for start in ("http://", "https://", "www."):
        if url.startswith(start):
            url = url[len(start):]
    return url.rstrip("/")


def is_in_range(address_range: str, address: str) -> bool:
    """Address number falls within a range/list expression (utils.py:154-178)."""
    m_number = re_leading_number.match(address)
    if not m_number:
        return False
    m_range = re_addr_range.search(address_range)
    if m_range:
        if re_addr_range.search(address):
            return False
        return int(m_range.group(1)) <= int(m_number.group(1)) <= int(m_range.group(2))
    m_list = re_number_list.search(address_range)
    if m_list:
        if re_number_list.search(address):
            return False
        numbers = {n.strip() for n in m_list.group(1).split(",")} | {m_list.group(2)}
        return m_number.group(1) in numbers
    return False


def has_address(osm_tags: OsmTags) -> bool:
    """OSM tags include an address (match.py:765-767)."""
    return any("addr:" + part in osm_tags for part in ("housenumber", "full"))


def _any_url_match(osm_value: str, values: Collection[str]) -> bool:
    """match.py:770-773."""
    osm_url = normalize_url(osm_value)
    return any(osm_url == normalize_url(v) for v in values)


def check_identifier(
    osm_tags: OsmTags, item_identifiers: dict[str, list[tuple[Any, str]]]
) -> bool:
    """OSM tag value matches a Wikidata identifier claim (match.py:776-797).

    ``item_identifiers``: {osm_key: [(values_tuple, label), ...]} as produced
    by the parser (reference model.py:609-669).
    """
    if not item_identifiers:
        return False
    for k, entries in item_identifiers.items():
        for values, label in entries:
            values = set(values) | {v.replace(" ", "") for v in values if " " in v}
            osm_value = osm_tags.get(k)
            if not osm_value:
                continue
            if osm_value in values:
                return True
            if " " in osm_value and osm_value.replace(" ", "") in values:
                return True
            if label == "website" and _any_url_match(osm_value, values):
                return True
            if osm_value.isdigit() and any(
                v.isdigit() and int(osm_value) == int(v) for v in values
            ):
                return True
    return False


def check_for_address_in_extract(osm_tags: OsmTags, extract: str | None) -> bool:
    """Wikipedia extract contains the OSM address (match.py:803-826)."""
    if not extract or not has_address(osm_tags):
        return False

    def address_in_extract(address: str) -> bool:
        pattern = re_abbr.sub(
            lambda m: "(" + m.group(1) + "|" + ABBR[m.group(1).lower()] + r"\.?)",
            re.escape(address),
        )
        m = re.search(r"\b" + pattern, extract, re.I)
        if not m:
            m = re.search(r"\b" + pattern, extract.replace(",", ""), re.I)
        # reject when the hit is the tail of a range like "27–29 Queen Square"
        return not re_range_start.search(extract[: m.start()]) if m else False

    if "addr:housenumber" in osm_tags and "addr:street" in osm_tags:
        if address_in_extract(
            osm_tags["addr:housenumber"] + " " + osm_tags["addr:street"]
        ):
            return True
    return "addr:full" in osm_tags and address_in_extract(osm_tags["addr:full"])


def name_contains_housenumber(name: str) -> bool:
    """Name has a housenumber not at the start (match.py:829-835)."""
    if not name or name[0].isdigit():
        return False
    terms = name.split()
    return len(terms) > 1 and any(t[0].isdigit() for t in terms[1:])


def check_name_matches_address(
    osm_tags: OsmTags, wikidata_names: Collection[str]
) -> bool | None:
    """Tri-state address comparison (match.py:838-953).

    True = addresses agree; None = unknown; False = addresses differ (veto).
    """
    if not has_address(osm_tags):
        return None

    number_start = {
        m.group(1)
        for m in (
            re_number_start.match(name)
            for name in wikidata_names
            if not name.lower().endswith(" building")
        )
        if m
    }
    number_end = {n for n in wikidata_names if name_contains_housenumber(n)}

    if not number_start and not number_end:
        return None

    parts4 = ("street", "housenumber", "postcode", "city")
    if all("addr:" + p in osm_tags for p in parts4):
        a = {p: osm_tags["addr:" + p] for p in parts4}
        addr = f'{a["street"]} {a["housenumber"]}, {a["postcode"]} {a["city"]}'
        if addr in wikidata_names:
            return True

    strip_comma = [n[: n.rfind(",")] for n in set(number_start) if "," in n]
    number_start.update(n for n in strip_comma if not n.isdigit())
    norm_number_start = {normalize_name(n) for n in number_start}

    postcode = osm_tags.get("addr:postcode")
    city = osm_tags.get("addr:city")
    if postcode:
        postcode = postcode.lower()

    if "addr:housenumber" in osm_tags and "addr:street" in osm_tags:
        osm_address = osm_tags["addr:housenumber"] + " " + osm_tags["addr:street"]
        norm_osm_address = normalize_name(osm_address)
        if any(normalized_name_match(osm_address, n) for n in number_start):
            return True

        if city:
            street_in = f" street in {osm_tags['addr:city']}"
            for name in number_start:
                if name.endswith(street_in) and normalized_name_match(
                    osm_address, name[: -len(street_in)]
                ):
                    return True

        osm_address2 = osm_tags["addr:street"] + " " + osm_tags["addr:housenumber"]
        if any(normalized_name_match(osm_address2, n) for n in number_end):
            return True

        if city:
            osm_address3 = " ".join(
                osm_tags[f"addr:{p}"] for p in ("street", "housenumber", "city")
            )
            if any(normalized_name_match(osm_address3, n) for n in number_end):
                return True

        for i in number_start:
            name, _, postcode_start = i.rpartition(" ")
            if postcode and not postcode.startswith(postcode_start.lower()):
                continue
            if (
                re_uk_postcode_start.match(postcode_start)
                and normalize_name(name) == norm_osm_address
            ):
                return True

        if any(
            n.startswith(norm_osm_address) or norm_osm_address.startswith(n)
            for n in norm_number_start
        ):
            return None  # not sure

        m = re_address_common_end.match(norm_osm_address)
        if m:
            short = m.group(1)
            if any(n.startswith(short) for n in norm_number_start):
                return None

    if "addr:full" in osm_tags:
        osm_full = osm_tags["addr:full"]
        osm_address = normalize_name(osm_full)
        if any(normalized_name_startswith(osm_full, n) for n in number_start):
            return True
        for i in number_start:
            name, _, postcode_start = i.rpartition(" ")
            if (
                re_uk_postcode_start.match(postcode_start)
                and normalize_name(name) == osm_address
            ):
                return True

    if not number_start:
        return None

    # relaxed when a Wikidata name exactly equals the OSM name (match.py:949-953)
    name_matches = "name" in osm_tags and any(
        n == osm_tags["name"] for n in number_start
    )
    return None if name_matches else False
