"""Wikidata entity JSON → parsed item record.

Faithful reimplementation of names_from_entity (wikidata.py:934-1015),
Item.names() (model.py:703-753), html_names (wikipedia.py:126-139, without
lxml) and the item field extraction the doc parser and tests need.  The Ray
pipeline normally consumes pre-flattened span documents; this module is the
bridge for entity-JSON inputs and for the scenario test harness.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Any

from .address import is_in_range
from .tags import identifiers_from_claims

Entity = dict[str, Any]

re_image_ext = re.compile(r"\.[a-z]{3,4}$")
_IMAGE_SUFFIXES = (r" - geograph\.org\.uk - \d+$", r"[, -]*0\d{2,}$")
re_bold = re.compile(r"<b>(.*?)</b>", re.S)
re_small = re.compile(r"<small\b.*?</small>", re.S)
re_ul = re.compile(r"<ul\b.*?</ul>", re.S)
re_tag = re.compile(r"<[^>]+>")


def claim_values(entity: Entity, pid: str) -> list[Any]:
    """Datavalues of a claim (model.py:824-829), skipping missing values."""
    return [
        c["mainsnak"]["datavalue"]["value"]
        for c in (entity.get("claims") or {}).get(pid, [])
        if "datavalue" in c.get("mainsnak", {})
    ]


def claim_ids(entity: Entity, pid: str) -> list[str]:
    """Entity-id values of a claim (e.g. P31, P137)."""
    return [v["id"] for v in claim_values(entity, pid) if isinstance(v, dict) and "id" in v]


def html_names(article: str | None) -> list[str]:
    """Bold names from extract HTML (wikipedia.py:126-139), regex-based.

    Drops <small>/<ul> regions first (pronunciation guides, lists).
    """
    if not article or not article.strip():
        return []
    cleaned = re_ul.sub("", re_small.sub("", article))
    names = [re_tag.sub("", m).strip() for m in re_bold.findall(cleaned)]
    return [n for n in names if len(n) > 1]


def names_from_entity(
    entity: Entity, skip_lang: set[str] | None = None
) -> dict[str, list[tuple[str, str | None]]]:
    """Multilingual name dict from entity JSON (wikidata.py:934-1015)."""
    if not entity or "labels" not in entity:
        return {}
    skip_lang = skip_lang or set()
    ret: defaultdict[str, list[tuple[str, str | None]]] = defaultdict(list)
    cat_start = "Category:"

    for lang, v in entity["labels"].items():
        if lang in skip_lang:
            continue
        ret[v["value"]].append(("label", lang))

    for site, v in entity.get("sitelinks", {}).items():
        if site + "wiki" in skip_lang:
            continue
        title = v["title"]
        if title.startswith(cat_start):
            title = title[len(cat_start):]
        first = title[0]
        if first.isupper():
            lc_first = first.lower() + title[1:]
            if lc_first in ret:
                title = lc_first
        ret[title].append(("sitelink", site))

    for lang, values in entity.get("aliases", {}).items():
        if lang in skip_lang or len(values) > 3:
            continue
        for name in values:
            ret[name["value"]].append(("alias", lang))

    for value in claim_values(entity, "P373"):  # commons category
        ret[value].append(("commonscat", None))

    for value in claim_values(entity, "P1448"):  # official name
        ret[value["text"]].append(("officialname", value["language"]))

    for value in claim_values(entity, "P1705"):  # native label
        ret[value["text"]].append(("nativelabel", value["language"]))

    for value in claim_values(entity, "P18"):  # image filename
        m = re_image_ext.search(value)
        if m:
            value = value[: m.start()]
        for pattern in _IMAGE_SUFFIXES:
            m = re.search(pattern, value)
            if m:
                value = value[: m.start()]
                break
        ret[value].append(("image", None))

    return dict(ret)


def item_names(
    entity: Entity,
    extract_names: list[str] | None = None,
    part_of_names: set[str] | None = None,
) -> dict[str, list[tuple[str, str | None]]]:
    """Item.names() (model.py:703-753): entity names + extract bold names +
    part-of prefix variants + P6375 street address + image-range suppression.
    """
    d = defaultdict(list, names_from_entity(entity))
    for name in extract_names or []:
        d[name].append(("extract", "enwiki"))

    for name, sources in list(d.items()):
        if len(sources) == 1 and sources[0][0] == "image":
            continue
        for part_of in part_of_names or set():
            if not name.startswith(part_of):
                continue
            prefix_removed = name[len(part_of):].strip()
            if prefix_removed not in d:
                d[prefix_removed] = sources

    for value in claim_values(entity, "P6375"):  # street address
        d[value["text"]].append(("P6375", value.get("language")))

    def has_digit(s: str) -> bool:
        return any(c.isdigit() for c in s)

    # a terrace photo filename shouldn't name a single building (model.py:730-751)
    image_names = {
        name
        for name, sources in d.items()
        if len(sources) == 1 and sources[0][0] == "image" and has_digit(name)
    }
    if image_names:
        other_names = {n for n in d if n not in image_names and has_digit(n)}
        for image_name in image_names:
            for other in other_names:
                if is_in_range(other, image_name):
                    del d[image_name]
                    break
    return dict(d)


def item_from_entity(
    entity: Entity,
    tags: list[str] | None = None,
    extract: str | None = None,
    categories: list[str] | None = None,
    place_names: list[str] | None = None,
    isa_labels: dict[str, dict[str, str]] | None = None,
    part_of_names: set[str] | None = None,
    lat: float | None = None,
    lon: float | None = None,
) -> dict[str, Any]:
    """Assemble the engine's parsed item record from entity JSON."""
    claims = entity.get("claims") or {}
    string_claims = {
        pid: [v for v in claim_values(entity, pid) if isinstance(v, str)]
        for pid in claims
    }
    labels = entity.get("labels") or {}
    sitelinks = list((entity.get("sitelinks") or {}).keys())
    languages = sorted(
        {lang for lang in labels if "-" not in lang}
        | {s[:-4] for s in sitelinks if s.endswith("wiki")}
    )  # model.py:448-453

    if lat is None or lon is None:
        for v in claim_values(entity, "P625"):
            if isinstance(v, dict) and "latitude" in v:
                lat, lon = v["latitude"], v["longitude"]
                break

    return {
        "qid": entity.get("id", ""),
        "lat": lat,
        "lon": lon,
        "names": item_names(entity, html_names(extract), part_of_names),
        "tags": list(tags or []),
        "isa": claim_ids(entity, "P31"),
        "isa_labels": isa_labels or {},
        "languages": languages,
        "identifiers": identifiers_from_claims(string_claims),
        "street_addresses": [
            v["text"] for v in claim_values(entity, "P6375") if isinstance(v, dict)
        ],
        "categories": list(categories or []),
        "extract": extract or "",
        "place_names": list(place_names or []),
        "sitelinks": sitelinks,
        "nrhp": string_claims.get("P649", []),
        "p137": claim_ids(entity, "P137"),
        "p1216": "P1216" in claims,
    }
