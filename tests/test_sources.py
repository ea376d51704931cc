"""OQL / SPARQL builder-parser conformance (reference tests/test_overpass.py,
tests/test_wikidata.py behaviors)."""

from osm_wikidata_ray.sources import overpass_oql as oql
from osm_wikidata_ray.sources import wikidata_sparql as sparql


def test_name_only():
    assert oql.name_only("leisure=park")
    assert oql.name_only("place=city")
    assert oql.name_only("boundary")
    assert not oql.name_only("amenity=school")


def test_get_name_filter():
    assert oql.get_name_filter(["leisure=park"]) == "[name]"
    assert oql.get_name_filter(["amenity=school"]) == oql.NAME_ISH_FILTER


def test_group_tags():
    assert oql.group_tags(["amenity=pub", "amenity=bar", "building"]) == {
        "amenity": ["pub", "bar"],
        "building": [],
    }


def test_element_filter():
    assert oql.element_filter("amenity", ["pub"]) == 'nwr(area.a)["amenity"="pub"];'
    assert (
        oql.element_filter("amenity", ["pub", "bar"])
        == 'nwr(area.a)["amenity"~"^(pub|bar)$"];'
    )
    assert oql.element_filter("building", []) == 'nwr(area.a)["building"];'
    assert oql.element_filter("site", ["x"]).startswith("rel(")


def test_oql_from_tag():
    assert oql.oql_from_tag("highway") == []
    assert oql.oql_from_tag("type=waterway") == []
    out = oql.oql_from_tag("amenity=school")
    assert len(out) == 3 and all("amenity=school" in o for o in out)
    out = oql.oql_from_tag("site=aerodome")
    assert len(out) == 1 and out[0].strip().startswith("rel")


def test_oql_for_area_and_point():
    area = oql.oql_for_area("rel", 62422, ["amenity=school"], "52,13,53,14", None)
    assert "area(3600062422)" in area
    assert 'nwr(area.a)["wikidata"];' in area
    assert 'nwr(area.a)["addr:housenumber"];' in area
    point = oql.oql_for_point(52.5, 13.4, 1000, ["amenity=school"], None)
    assert "around:1000,52.5,13.4" in point


def test_is_candidate_worthy():
    assert oql.is_candidate_worthy({"name": "x"})
    assert oql.is_candidate_worthy({"wikidata": "Q1"})
    assert oql.is_candidate_worthy({"addr:housenumber": "4"})
    assert oql.is_candidate_worthy({"ref:nrhp": "123"})
    assert not oql.is_candidate_worthy({"highway": "residential"})


def test_sparql_builders():
    q = sparql.enwiki_query(51.0, 52.0, -1.0, 0.5)
    assert 'Point(-1.0 51.0)' in q and 'Point(0.5 52.0)' in q
    assert "Q18340550" in q  # timeline-article filter
    q = sparql.point_query(52.5, 13.4, 2.0)
    assert 'Point(13.4 52.5)' in q and '"2.0"' in q
    q = sparql.subclass_osm_tags_query("Q3914")
    assert "wd:Q3914" in q and "P1282" in q


def test_sparql_parsers():
    rows = [
        {
            "place": {
                "type": "uri",
                "value": "http://www.wikidata.org/entity/Q42",
            },
            "placeLabel": {"value": "Test Place"},
            "article": {
                "value": "https://en.wikipedia.org/wiki/Test%20Place_(thing)"
            },
            "location": {"value": "Point(-2.5 51.5)"},
        }
    ]
    items = sparql.parse_enwiki_query(rows)
    assert items["Q42"]["enwiki"] == "Test Place (thing)"
    assert items["Q42"]["query_label"] == "Test Place"
    assert sparql.parse_point_wkt(items["Q42"]["location"]) == (51.5, -2.5)

    tag_rows = [
        {
            "place": {"type": "uri", "value": "http://www.wikidata.org/entity/Q42"},
            "placeLabel": {"value": "Test Place"},
            "location": {"value": "Point(-2.5 51.5)"},
            "tag": {"value": "amenity=school"},
        },
        {
            "place": {"type": "uri", "value": "http://www.wikidata.org/entity/Q42"},
            "placeLabel": {"value": "Test Place"},
            "location": {"value": "Point(-2.5 51.5)"},
            "tag": {"value": "highway"},  # skip-tag
        },
    ]
    sparql.parse_item_tag_query(tag_rows, items)
    assert items["Q42"]["tags"] == {"amenity=school"}
