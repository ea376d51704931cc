"""Wikidata SPARQL query builders and result parsers (pure, no network).

Reimplements the reference's bbox item readers (matcher/wikidata.py:254-362)
and row parsers (wikidata.py:855-898): query templates for enwiki-article
items, headquarters-located items, radius search, P1282 subclass tag walk,
and the item-tag bbox query; plus parse_enwiki_query / parse_item_tag_query
which build the items IR dict {qid → {query_label, enwiki, location, tags}}.
In the engine this IR feeds the same parsed-item records the doc-table
parser produces — usable against a live SPARQL endpoint or recorded JSON.
"""

from __future__ import annotations

import re
from typing import Any
from urllib.parse import unquote

WD_ENTITY_PREFIX = "http://www.wikidata.org/entity/Q"
ENWIKI_PREFIX = "https://en.wikipedia.org/wiki/"

# overly generic or unusable tags dropped from query results (wikidata.py:40-56)
SKIP_TAGS = {
    "route:road", "route=road", "highway=primary", "highway=road",
    "highway=service", "highway=motorway", "highway=trunk",
    "highway=unclassified", "highway", "landuse" "name", "website",
    "addr:street", "type=associatedStreet", "type=waterway", "waterway=river",
}

_BOX_SERVICE = """    SERVICE wikibase:box {{
        {subject} wdt:P625 ?location .
        bd:serviceParam wikibase:cornerWest "Point({west} {south})"^^geo:wktLiteral .
        bd:serviceParam wikibase:cornerEast "Point({east} {north})"^^geo:wktLiteral .
    }}"""


def enwiki_query(south: float, north: float, west: float, east: float) -> str:
    """Items in bbox with an English Wikipedia article (wikidata.py:254-272)."""
    box = _BOX_SERVICE.format(subject="?place", west=west, south=south, east=east, north=north)
    return f"""
SELECT ?place ?placeLabel (SAMPLE(?location) AS ?location) ?article WHERE {{
{box}
    ?article schema:about ?place .
    ?article schema:inLanguage "en" .
    ?article schema:isPartOf <https://en.wikipedia.org/> .
    FILTER NOT EXISTS {{ ?place wdt:P31 wd:Q18340550 }} .
    FILTER NOT EXISTS {{ ?place wdt:P31 wd:Q13406463 }} .
    FILTER NOT EXISTS {{ ?place wdt:P31 wd:Q17362920 }} .
    FILTER NOT EXISTS {{ ?place wdt:P31/wdt:P279* wd:Q192611 }} .
    FILTER NOT EXISTS {{ ?place wdt:P31 wd:Q811683 }} .
    SERVICE wikibase:label {{ bd:serviceParam wikibase:language "en" }}
}}
GROUP BY ?place ?placeLabel ?article
"""


def enwiki_hq_query(south: float, north: float, west: float, east: float) -> str:
    """Items whose P159 headquarters lies in the bbox (wikidata.py:276-291)."""
    return f"""
SELECT ?place ?placeLabel (SAMPLE(?location) AS ?location) ?article WHERE {{
    ?place p:P159 ?statement .
    SERVICE wikibase:box {{
        ?statement pq:P625 ?location .
        bd:serviceParam wikibase:cornerWest "Point({west} {south})"^^geo:wktLiteral .
        bd:serviceParam wikibase:cornerEast "Point({east} {north})"^^geo:wktLiteral .
    }}
    ?article schema:about ?place .
    ?article schema:inLanguage "en" .
    ?article schema:isPartOf <https://en.wikipedia.org/> .
    SERVICE wikibase:label {{ bd:serviceParam wikibase:language "en" }}
}}
GROUP BY ?place ?placeLabel ?article
"""


def point_query(lat: float, lon: float, radius_km: float) -> str:
    """Radius search (wikidata.py:293-306)."""
    return f"""
SELECT ?place (SAMPLE(?location) AS ?location) ?article WHERE {{
    SERVICE wikibase:around {{
        ?place wdt:P625 ?location .
        bd:serviceParam wikibase:center "Point({lon} {lat})"^^geo:wktLiteral .
        bd:serviceParam wikibase:radius "{radius_km:.1f}" .
    }}
    ?article schema:about ?place .
    ?article schema:inLanguage "en" .
    ?article schema:isPartOf <https://en.wikipedia.org/> .
}}
GROUP BY ?place ?article
"""


def subclass_osm_tags_query(qid: str) -> str:
    """P1282 tags in the P31/P279 subclass tree (wikidata.py:306-320)."""
    return f"""
SELECT DISTINCT ?item ?itemLabel ?tag
WHERE
{{
  {{
    wd:{qid} wdt:P31/wdt:P279* ?item .
    ?item ((p:P1282/ps:P1282)|wdt:P641/(p:P1282/ps:P1282)|wdt:P140/(p:P1282/ps:P1282)|wdt:P366/(p:P1282/ps:P1282)) ?tag .
  }}
  UNION
  {{
      wd:{qid} wdt:P1435 ?item .
      ?item (p:P1282/ps:P1282) ?tag
  }}
  SERVICE wikibase:label {{ bd:serviceParam wikibase:language "en" }}
}}"""


def wd_to_qid(uri_value: dict[str, Any]) -> str | None:
    """SPARQL binding → QID (wikidata.py:847-860)."""
    value = uri_value.get("value", "")
    if uri_value.get("type") == "uri" and value.startswith(WD_ENTITY_PREFIX):
        return "Q" + value[len(WD_ENTITY_PREFIX):]
    return None


def enwiki_url_to_title(url: str) -> str:
    """wikidata.py:863-865."""
    assert url.startswith(ENWIKI_PREFIX)
    return unquote(url[len(ENWIKI_PREFIX):]).replace("_", " ")


re_point_wkt = re.compile(r"^Point\(([-0-9.eE]+) ([-0-9.eE]+)\)$")


def parse_point_wkt(wkt: str) -> tuple[float, float] | None:
    """"Point(lon lat)" → (lat, lon) (reference job_queue.py:103-107)."""
    m = re_point_wkt.match(wkt)
    return (float(m.group(2)), float(m.group(1))) if m else None


def parse_enwiki_query(rows: list[dict[str, Any]]) -> dict[str, dict[str, Any]]:
    """wikidata.py:868-877."""
    return {
        wd_to_qid(row["place"]): {
            "query_label": row["placeLabel"]["value"],
            "enwiki": enwiki_url_to_title(row["article"]["value"]),
            "location": row["location"]["value"],
            "tags": set(),
        }
        for row in rows
    }


def parse_item_tag_query(
    rows: list[dict[str, Any]], items: dict[str, dict[str, Any]]
) -> None:
    """Merge item-tag rows into the items IR in place (wikidata.py:880-898)."""
    for row in rows:
        tag_or_key = row["tag"]["value"]
        if not tag_or_key or tag_or_key in SKIP_TAGS:
            continue
        qid = wd_to_qid(row["place"])
        if not qid:
            continue
        if qid not in items:
            items[qid] = {
                "query_label": row["placeLabel"]["value"],
                "location": row["location"]["value"],
                "tags": set(),
            }
            for k in ("address", "street"):
                if k in row:
                    items[qid][k] = row[k]["value"]
        items[qid]["tags"].add(tag_or_key)
