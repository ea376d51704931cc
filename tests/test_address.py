"""Address / identifier / extract conformance corpus.

Mirrors reference tests/test_match.py:96-125,594-807 and tests/test_utils.py
(is_in_range).
"""

from osm_wikidata_ray.rules import address as a


def test_has_address():
    assert not a.has_address({})
    assert a.has_address({"addr:full": "1 Station Road"})
    assert a.has_address({"addr:housenumber": "1"})


def test_check_identifiers():
    assert a.check_identifier({}, {}) is False
    identifiers = {"iata": [(("PDX",), "IATA airport code")]}
    assert a.check_identifier({"iata": "PDX"}, identifiers)
    assert not a.check_identifier({"iata": "LAX"}, identifiers)
    assert not a.check_identifier({}, identifiers)

    tag = "seamark:light:reference"
    identifiers = {tag: [(("D123",), "Admiralty number")]}
    assert a.check_identifier({tag: "D 123"}, identifiers)

    url = "http://test.org"
    identifiers = {"website": [((url,), "website")]}
    assert a.check_identifier({"website": url}, identifiers)
    assert a.check_identifier({"website": "https://www.test.org"}, identifiers)

    # digit comparison: "05000123" == "5000123"
    identifiers = {"ref:nrhp": [(("05000123",), "NRHP reference number")]}
    assert a.check_identifier({"ref:nrhp": "5000123"}, identifiers)


def test_is_in_range():
    assert a.is_in_range("1 to 10", "5")
    assert a.is_in_range("1-10", "No. 5")
    assert not a.is_in_range("1-10", "11")
    assert a.is_in_range("1, 3 and 5", "3")
    assert not a.is_in_range("1, 3 and 5", "4")
    assert not a.is_in_range("no numbers here", "5")


def test_check_name_matches_address():
    assert a.check_name_matches_address({}, []) is None

    tags = {"addr:housenumber": "12", "addr:street": "Station Road"}
    assert a.check_name_matches_address(tags, ["12 Station Road"])
    assert a.check_name_matches_address(tags, ["12, Station Road"])
    assert a.check_name_matches_address(tags, ["Number 12 Station Road"])
    tags = {"addr:housenumber": "12-14", "addr:street": "Station Road"}
    assert a.check_name_matches_address(tags, ["Nos 12-14 Station Road"])
    assert not a.check_name_matches_address(tags, ["Station Road"])

    tags = {"addr:housenumber": "24", "addr:street": "Hillhead Street"}
    assert not a.check_name_matches_address(tags, ["2, 4 Hillhead Street"])

    tags = {"addr:full": "12 Station Road"}
    assert a.check_name_matches_address(tags, ["12 Station Road"])
    tags = {"addr:full": "Station Road"}
    assert not a.check_name_matches_address(tags, ["12 Station Road"])

    tags = {
        "addr:street": "Krakowskie Przedmieście",
        "addr:housenumber": "66",
        "addr:postcode": "00-322",
        "name": "Centralna Biblioteka Rolnicza",
    }
    assert (
        a.check_name_matches_address(tags, ["66 Krakowskie Przedmieście Street in Warsaw"])
        is not False
    )

    tags = {
        "name": "100 East Wisconsin",
        "addr:state": "WI",
        "addr:street": "East Wisconsin Avenue",
        "addr:city": "Milwaukee",
        "addr:postcode": "53202",
        "addr:housenumber": "100",
    }
    assert a.check_name_matches_address(tags, ["100 East Wisconsin"]) is not False

    tags = {
        "name": "1000 Second Avenue",
        "addr:housenumber": "1000",
        "addr:street": "2nd Avenue",
        "addr:city": "Seattle",
        "addr:postcode": "98104",
    }
    assert a.check_name_matches_address(tags, ["1000 Second Avenue"]) is not False

    tags = {
        "name": "1300 Lafayette East Cooperative",
        "addr:housenumber": "1300",
        "addr:street": "Lafayette Street East",
        "addr:city": "Detroit",
    }
    assert a.check_name_matches_address(tags, ["1300 Lafayette East Cooperative"]) is not False

    tags = {
        "addr:city": "Kraków",
        "addr:country": "PL",
        "addr:housenumber": "3",
        "addr:postcode": "31-134",
        "addr:street": "Basztowa",
        "building": "apartments",
    }
    assert a.check_name_matches_address(tags, ["3 Basztowa street in Kraków"]) is True
    assert a.check_name_matches_address(tags, ["4 Basztowa street in Kraków"]) is False


def test_check_name_matches_address_postcode():
    tags = {"addr:housenumber": "12", "addr:street": "Buckingham Street"}
    assert a.check_name_matches_address(tags, ["12, Buckingham Street Wc2"])

    tags = {
        "addr:housenumber": "12",
        "addr:street": "Buckingham Street",
        "addr:postcode": "WC2N 6DF",
    }
    assert a.check_name_matches_address(tags, ["12, Buckingham Street Wc2"])

    tags = {
        "addr:housenumber": "12",
        "addr:street": "Buckingham Street",
        "addr:postcode": "EC1X 1AA",
    }
    assert not a.check_name_matches_address(tags, ["12, Buckingham Street Wc2"])

    tags = {"addr:full": "12 Buckingham Street"}
    assert a.check_name_matches_address(tags, ["12, Buckingham Street Wc2"])

    tags = {
        "name": "510 Marquette",
        "addr:housenumber": "510",
        "addr:street": "Marquette Avenue South",
    }
    assert a.check_name_matches_address(tags, ["510 Marquette Building"]) is not False

    tags = {
        "addr:street": "Poydras Street",
        "name": "Eni Building",
        "building": "yes",
        "addr:housenumber": "1250",
        "height": "104",
    }
    assert (
        a.check_name_matches_address(
            tags, ["1250 Poydras Plaza", "Mobil Building", "Eni Building"]
        )
        is not False
    )


def test_embassy_address():
    tags = {
        "name": "Consulate General of Switzerland in San Francisco",
        "amenity": "embassy",
        "country": "CH",
        "addr:city": "San Francisco",
        "addr:state": "CA",
        "addr:street": "Montgomery Street",
        "addr:postcode": "94104",
        "addr:housenumber": "456",
    }
    assert (
        a.check_name_matches_address(tags, ["456 Montgomery Street Suite #2100"])
        is not False
    )


def test_check_for_address_in_extract():
    osm_tags = {"addr:street": "West 43rd Street", "addr:housenumber": "4"}
    extract = (
        "Aeolian Hall was a concert hall in midtown Manhattan in "
        "New York City, located on the third floor of "
        "29-33 West 42nd Street (also 34 West 43rd Street, from the "
        "other side) across the street from Bryant Park."
    )
    assert not a.check_for_address_in_extract(osm_tags, extract)

    osm_tags = {"addr:street": "Station Road", "addr:housenumber": "10"}
    assert a.check_for_address_in_extract(
        osm_tags, "Test House, located at 10 Station Road is a test."
    )

    extract = (
        "The Pinball Hall of Fame is a museum for pinball machines "
        "that opened in Paradise, Nevada in January 2006. It is "
        "located at 1610 E Tropicana Ave."
    )
    osm_tags = {
        "addr:city": "Las Vegas",
        "addr:street": "East Tropicana Avenue",
        "addr:postcode": "89119",
        "addr:housenumber": "1610",
    }
    assert a.check_for_address_in_extract(osm_tags, extract)

    osm_tags = {
        "name": "Old Stone House",
        "addr:city": "Washington",
        "addr:state": "DC",
        "addr:street": "M Street Northwest",
        "addr:housenumber": "3051",
    }
    extract = (
        "Built in 1765, Old Stone House is located at 3051 M Street, "
        "Northwest in the Georgetown neighborhood."
    )
    assert a.check_for_address_in_extract(osm_tags, extract)

    osm_tags = {
        "addr:housenumber": "1264",
        "addr:street": "Wisconsin Avenue Northwest",
        "amenity": "pub",
        "name": "Billy Martin's Tavern",
    }
    extract = (
        "Martin's is located at 1264 Wisconsin Avenue, NW in the "
        "Georgetown neighborhood of Washington D.C."
    )
    assert a.check_for_address_in_extract(osm_tags, extract)

    osm_tags = {
        "height": "15.3",
        "building": "yes",
        "addr:street": "2nd Avenue",
        "addr:postcode": "10003",
        "addr:housenumber": "137",
    }
    extract = (
        "two adjoining historic buildings located at 135 and 137 2nd "
        "Avenue in the East Village neighborhood of Manhattan"
    )
    assert not a.check_for_address_in_extract(osm_tags, extract)


def test_check_for_address_range_in_extract():
    osm_tags = {"addr:street": "Queen Square", "addr:housenumber": "29"}
    extract = (
        "The Sailors Refuge is an historic house situated "
        "at 27–29 Queen Square, Bristol, England."
    )
    assert not a.check_for_address_in_extract(osm_tags, extract)


def test_normalize_url():
    assert a.normalize_url("http://test.org/") == "test.org"
    assert a.normalize_url("https://www.test.org") == "test.org"


def test_display_distance():
    from osm_wikidata_ray.rules.display import (
        capfirst,
        display_distance,
        metric_display_distance,
    )

    assert capfirst("test one") == "Test one"
    assert capfirst("") == ""
    assert metric_display_distance("metres", 450) == "450 m"
    assert metric_display_distance("km", 2500) == "2.50 km"
    assert metric_display_distance("km_and_metres", 450) == "450 m"
    assert metric_display_distance("km_and_metres", 2500) == "2.50 km"
    assert display_distance("miles_and_feet", 3218.7) == "2.00 miles"
    assert display_distance("miles_and_feet", 100) == "328 feet"
    assert display_distance("miles_and_yards", 100) == "109 yards"
    assert display_distance("miles_and_metres", 100) == "100 metres"
