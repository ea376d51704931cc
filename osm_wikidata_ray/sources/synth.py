"""Deterministic synthetic document corpus with planted gold match pairs.

Generates the interleaved text+media doc table (FIXTURES.md §1) plus the
labeled pair table (§3).  Every scenario family maps to a reference test
case family (cited in FAMILY builders).  Generation is pure-deterministic
from (seed, index) — no global RNG state — so any shard can be regenerated
independently (the property that makes 10^12-doc generation embarrassingly
parallel).

Scenarios are laid out on a >40 km lat/lon grid so cross-scenario pairs are
cut by the per-type distance gate; name stems are unique per scenario so
shared tokens are only type nouns (hot keys by design — exercised by
salting).
"""

from __future__ import annotations

import random
from typing import Any, Callable, Iterator

from ..geo import offset_latlon
from ..functions.spans import (
    encode_osm_doc,
    encode_wd_doc,
    finalize_spans,
    make_span,
    span_checksum,
)

SEED = 42

# P31-class → P279 super-classes for the synthetic corpus' two ISA families
# (railway station Q55488 → station Q719456 / transport infrastructure
# Q376799; mountain range Q46831 → landform Q271669) — deterministic rule
# data for the isa-facet P279 counting path (reference isa_facets.py:17-22)
_ISA_SUPERS = {
    "Q55488": ["Q719456", "Q376799"],
    "Q46831": ["Q271669"],
}

_W1 = (
    "alder ash aspen bay beech birch briar cedar chestnut clover crag dale "
    "dell elm fern fir glen hazel heath holly ivy juniper larch laurel linden "
    "maple moor myrtle oak olive orchid pine poplar reed rowan sage sorrel "
    "spruce sycamore tamarind teak thorn vale walnut willow wisteria yew"
).split()
_W2 = (
    "barrow bech bourne brook burgh combe cote croft dene field ford forth "
    "garth gate grange grove ham holme hurst ing lea leigh low mead mere "
    "minster ness over rigg shaw stead ster stoke thorpe thwaite ton tree "
    "wick worth wold wray"
).split()


def _stem(i: int) -> str:
    """Unique digit-free two/three-word name stem for scenario i."""
    a, rest = i % len(_W1), i // len(_W1)
    b, rest = rest % len(_W2), rest // len(_W2)
    base = f"{_W1[a].capitalize()}{_W2[b]}"
    if rest:
        c = rest % len(_W1)
        extra = rest // len(_W1)
        base = f"{base} {_W1[c].capitalize()}{_W2[(b + extra) % len(_W2)]}"
    return base


def _grid(i: int) -> tuple[float, float]:
    """Scenario anchor ≥ ~40 km from every other scenario."""
    cols = 800
    row, col = divmod(i, cols)
    layer, row = divmod(row, 330)
    lat = -59.5 + row * 0.4
    lon = -179.5 + col * 0.44 + layer * 0.11
    return lat, lon


class _Scenario:
    """Accumulator one scenario's docs and gold rows."""

    def __init__(self, index: int, rng: random.Random) -> None:
        self.index = index
        self.rng = rng
        self.lat, self.lon = _grid(index)
        self.stem = _stem(index)
        self.docs: list[tuple[str, list[dict[str, Any]]]] = []
        self.gold: list[dict[str, Any]] = []
        self._osm_seq = 0

    def qid(self, n: int = 0) -> str:
        return f"Q{1_000_000 + self.index * 8 + n}"

    def at(self, north_m: float = 0.0, east_m: float = 0.0) -> tuple[float, float]:
        return offset_latlon(self.lat, self.lon, north_m, east_m)

    def add_wd(
        self,
        names: dict[str, list[tuple[str, str | None]]],
        tags: list[str],
        n: int = 0,
        north_m: float = 0.0,
        east_m: float = 0.0,
        **extra: Any,
    ) -> str:
        qid = self.qid(n)
        lat, lon = self.at(north_m, east_m)
        item = {"qid": qid, "lat": lat, "lon": lon, "names": names, "tags": tags}
        item.update(extra)
        # denormalize the class hierarchy of the item's P31 values (the
        # reference fetches each IsA entity's P279 claims; the synth corpus
        # ships them as P279 spans so isa_facet_counts can count supers)
        if item.get("isa") and "isa_supers" not in item:
            item["isa_supers"] = {
                q: _ISA_SUPERS[q] for q in item["isa"] if q in _ISA_SUPERS
            }
        doc_id, spans = encode_wd_doc(item)
        self._interleave_noise(spans, qid)
        self.docs.append((doc_id, finalize_spans(spans)))
        return qid

    def add_osm(
        self,
        tags: dict[str, str],
        osm_type: str = "node",
        planet_table: str | None = None,
        north_m: float = 0.0,
        east_m: float = 0.0,
        src_id: int | None = None,
    ) -> str:
        self._osm_seq += 1
        osm_id = self.index * 100 + self._osm_seq
        lat, lon = self.at(north_m, east_m)
        if planet_table is None:
            planet_table = {"node": "point", "relation": "relation"}.get(osm_type, "polygon")
        obj = {
            "osm_type": osm_type,
            "osm_id": osm_id,
            "tags": tags,
            "lat": lat,
            "lon": lon,
            "planet_table": planet_table,
        }
        if src_id is not None:
            obj["src_id"] = src_id
        doc_id, spans = encode_osm_doc(obj)
        self._interleave_noise(spans, f"{osm_type}/{osm_id}")
        self.docs.append((doc_id, finalize_spans(spans)))
        return f"{osm_type}/{osm_id}"

    def _interleave_noise(self, spans: list[dict[str, Any]], ref: str) -> None:
        """Interleave text/media noise spans — must round-trip untouched."""
        r = self.rng
        for _ in range(r.randrange(3)):
            pos = r.randrange(len(spans) + 1)
            if r.random() < 0.4:
                spans.insert(
                    pos,
                    make_span(
                        "media",
                        f"photo of {self.stem} ({r.randrange(9999)})",
                        f"img://{ref}/{r.randrange(10)}.jpg",
                    ),
                )
            else:
                spans.insert(
                    pos,
                    make_span("text", f"Filler prose {r.randrange(10**6)} about {self.stem}."),
                )

    def expect(self, qid: str, osm_uid: str, label: str, kind: str) -> None:
        osm_type, _, osm_id = osm_uid.partition("/")
        self.gold.append(
            {
                "qid": qid,
                "osm_type": osm_type,
                "osm_id": int(osm_id),
                "label": label,
                "match_kind": kind,
            }
        )


# --- scenario family builders (name, builder) ---

def fam_exact(s: _Scenario) -> None:
    """Exact name match (ref tests/test_match.py:213-231).

    Carries a second (de) label so the language-count tail cut
    (place.py:1095-1101) has a sub-10% language to suppress; the OSM side
    carries a matching name:de tag so stored candidates have languages for
    languages_osm (place.py:1061-1076, model.py:1243-1244 — candidate
    languages are name:xx tag KEYS, so the value mirrors name)."""
    name = f"{s.stem} Park"
    q = s.add_wd({name: [("label", "en"), ("label", "de")]}, ["leisure=park"])
    o = s.add_osm({"name": name, "name:de": name, "leisure": "park"}, north_m=60)
    s.expect(q, o, "match", "name-good")


def fam_case(s: _Scenario) -> None:
    """Case/punctuation-only differences.  Carries an sv label (language
    stats: counted, unlike {ceb,sv}-only items, place.py:1085-1088) and a
    matching OSM name:sv tag (languages_osm material, place.py:1061-1076)."""
    q = s.add_wd(
        {f"{s.stem} Hotel": [("label", "en"), ("label", "sv")]}, ["tourism=hotel"]
    )
    o = s.add_osm(
        {"name": f"{s.stem.upper()} HOTEL", "name:sv": f"{s.stem.upper()} HOTELL",
         "tourism": "hotel"},
        east_m=40,
    )
    s.expect(q, o, "match", "name-good")


def fam_tidy(s: _Scenario) -> None:
    """tidy_name synonyms: Saint→St (match.py:103-177)."""
    q = s.add_wd(
        {f"Saint {s.stem} Church": [("label", "en")]},
        ["amenity=place_of_worship", "religion=christian"],
    )
    o = s.add_osm(
        {"name": f"St {s.stem} Church", "amenity": "place_of_worship", "religion": "christian"},
        osm_type="way",
        north_m=-35,
    )
    s.expect(q, o, "match", "name-good")


def fam_trim(s: _Scenario) -> None:
    """Ending trim: "Lake X" ↔ "X" (tests/test_match.py:238-246)."""
    q = s.add_wd({f"Lake {s.stem}": [("label", "en")]}, ["natural=water", "water=lake"])
    o = s.add_osm({"name": s.stem, "natural": "water"}, osm_type="way", east_m=120)
    s.expect(q, o, "match", "name-trim")


def fam_initials(s: _Scenario) -> None:
    """Initials: "TIAT" ↔ "This Is A Test" (tests/test_match.py:43-72)."""
    words = s.stem.split()[0]
    full = f"{words.capitalize()} Industrial Archive Trust"
    initials = "".join(w[0] for w in full.split())
    q = s.add_wd({full: [("label", "en")]}, ["amenity=library"])
    o = s.add_osm({"name": initials, "amenity": "library"}, north_m=90)
    s.expect(q, o, "match", "initials")


def fam_digit_guard(s: _Scenario) -> None:
    """Digit guard: "Board 1" ≠ "Board 11" (tests/test_match.py:151-179)."""
    q = s.add_wd({f"{s.stem} Community Board 1": [("label", "en")]}, ["office=government"])
    o = s.add_osm({"name": f"{s.stem} Community Board 11", "office": "government"}, north_m=25)
    s.expect(q, o, "nonmatch", "veto:digit-guard")


def fam_ordinal(s: _Scenario) -> None:
    """Ordinal↔word: "3rd" ↔ "Third" (tests/test_match.py:203-210)."""
    q = s.add_wd({f"Third {s.stem} Theatre": [("label", "en")]}, ["amenity=theatre"])
    o = s.add_osm({"name": f"3rd {s.stem} Theatre", "amenity": "theatre"}, east_m=-55)
    s.expect(q, o, "match", "name-good")


def fam_address(s: _Scenario) -> None:
    """Address-only match (ref tests/test_matcher.py:543-588 shape)."""
    addr_name = f"12 {s.stem} Road"
    q = s.add_wd(
        {addr_name: [("label", "en")]},
        ["building"],
        street_addresses=[addr_name],
    )
    o = s.add_osm(
        {"addr:housenumber": "12", "addr:street": f"{s.stem} Road", "building": "yes",
         "name": addr_name},
        osm_type="way",
        north_m=15,
    )
    s.expect(q, o, "match", "address")


def fam_address_veto(s: _Scenario) -> None:
    """Tri-state address veto: "17 X Lane" vs number 1 (tests/test_match.py:446-448)."""
    q = s.add_wd({f"17 {s.stem} Lane": [("label", "en")]}, ["building"])
    o = s.add_osm(
        {"addr:housenumber": "1", "addr:street": f"{s.stem} Lane", "building": "yes"},
        osm_type="way",
        north_m=20,
    )
    s.expect(q, o, "nonmatch", "veto:address")


def fam_identifier(s: _Scenario) -> None:
    """Identifier-only match: IATA code (tests/test_match.py:105-125)."""
    code = ""
    n = s.index
    for _ in range(3):
        code += chr(ord("A") + n % 26)
        n //= 26
    q = s.add_wd(
        {f"{s.stem} International Airport": [("label", "en")]},
        ["aeroway=aerodrome"],
        claims={"P238": [code]},
    )
    o = s.add_osm(
        {"name": f"{s.stem.split()[0]} Field", "aeroway": "aerodrome", "iata": code},
        osm_type="way",
        east_m=700,
    )
    s.expect(q, o, "match", "identifier")


def fam_nrhp(s: _Scenario) -> None:
    """NRHP single-candidate short-circuit (matcher.py:322-345)."""
    ref = f"{86_000_000 + s.index}"
    q = s.add_wd(
        {f"{s.stem} House": [("label", "en")]},
        ["building", "historic=yes"],
        claims={"P649": [ref]},
        nrhp=[ref],
    )
    o1 = s.add_osm(
        {"name": f"{s.stem} House", "building": "yes", "ref:nrhp": ref},
        osm_type="way",
        north_m=30,
    )
    o2 = s.add_osm({"name": f"{s.stem} House", "building": "yes"}, osm_type="way", north_m=400)
    s.expect(q, o1, "match", "identifier")
    s.expect(q, o2, "nonmatch", "veto:nrhp-short-circuit")


def fam_station_house(s: _Scenario) -> None:
    """Station shouldn't match distant house (tests/test_matcher.py:268-311)."""
    q = s.add_wd(
        {
            f"{s.stem} railway station": [("label", "en")],
            f"{s.stem} Station": [("alias", "en")],
        },
        ["railway=station", "building=train_station", "building"],
        isa=["Q55488"],
    )
    o = s.add_osm(
        {"name": f"{s.stem} House", "building": "house",
         "addr:street": "Meeting Street", "addr:city": s.stem},
        osm_type="way",
        north_m=350,
    )
    s.expect(q, o, "nonmatch", "veto:station-house")


def fam_parking(s: _Scenario) -> None:
    """Parking garage only matches parking items (tests/test_matcher.py:409-452)."""
    q = s.add_wd(
        {f"{s.stem} Square": [("label", "en")]}, ["amenity=arts_centre", "building"]
    )
    o = s.add_osm(
        {"name": f"{s.stem}Square Parking", "amenity": "parking", "building": "yes",
         "operator": f"{s.stem}Square"},
        osm_type="way",
        north_m=250,
    )
    s.expect(q, o, "nonmatch", "veto:parking")


def fam_embassy(s: _Scenario) -> None:
    """Embassy of the wrong country (tests/test_matcher.py:454-514)."""
    q = s.add_wd(
        {f"Consulate General of Israel to the {s.stem} Region": [("label", "en")]},
        ["amenity=embassy"],
        p137=["Q801"],
        street_addresses=[f"456 {s.stem} Street Suite #2100"],
    )
    o = s.add_osm(
        {
            "name": f"Consulate General of Switzerland in {s.stem} City",
            "amenity": "embassy",
            "country": "CH",
            "addr:housenumber": "456",
            "addr:street": f"{s.stem} Street",
        },
        north_m=10,
    )
    s.expect(q, o, "nonmatch", "veto:embassy")


def fam_castle_station(s: _Scenario) -> None:
    """Castle shouldn't match railway station (tests/test_matcher.py:859-891)."""
    q = s.add_wd(
        {f"Caer {s.stem}": [("label", "en")]}, ["historic=castle", "building"]
    )
    o = s.add_osm(
        {"name": s.stem, "name:cy": f"Caer{s.stem}", "building": "train_station",
         "railway": "station"},
        osm_type="way",
        east_m=80,
    )
    s.expect(q, o, "nonmatch", "veto:castle-station")


def fam_mountain_range(s: _Scenario) -> None:
    """Mountain range shouldn't match a peak >100 m away (matcher.py:817-822)."""
    q = s.add_wd(
        {f"{s.stem} Mountains": [("label", "en")]}, ["natural=peak"], isa=["Q46831"]
    )
    o = s.add_osm({"name": f"{s.stem} Mountains", "natural": "peak"}, north_m=150)
    s.expect(q, o, "nonmatch", "veto:mountain-range")


def fam_dist_gate(s: _Scenario) -> None:
    """Distance gate: library rule = 2 km (entity_types dist)."""
    name = f"{s.stem} Library"
    q = s.add_wd({name: [("label", "en")]}, ["amenity=library"])
    near = s.add_osm({"name": name, "amenity": "library"}, north_m=1_500)
    far = s.add_osm({"name": name, "amenity": "library"}, north_m=-14_000)
    s.expect(q, near, "match", "name-good")
    s.expect(q, far, "nonmatch", "veto:distance")


def fam_conflict(s: _Scenario) -> None:
    """One OSM object claimed by two items → both dropped (matcher.py:1473-1475)."""
    name = f"{s.stem} Hall"
    q1 = s.add_wd({name: [("label", "en")]}, ["amenity=community_centre"], n=0)
    q2 = s.add_wd({name: [("label", "en")]}, ["amenity=community_centre"], n=1, east_m=90)
    o = s.add_osm({"name": name, "amenity": "community_centre"}, osm_type="way", north_m=45)
    s.expect(q1, o, "nonmatch", "veto:1to1-conflict")
    s.expect(q2, o, "nonmatch", "veto:1to1-conflict")


def fam_prefer_station(s: _Scenario) -> None:
    """Tag match beats building-only match (tests/test_matcher.py:1043-1101)."""
    q = s.add_wd(
        {f"{s.stem} railway station": [("label", "en")]},
        ["building=train_station", "railway=station", "building"],
    )
    o1 = s.add_osm({"name": s.stem, "railway": "station"}, north_m=27)
    o2 = s.add_osm(
        {"name": f"{s.stem} Station", "building": "yes"}, osm_type="way", north_m=5
    )
    s.expect(q, o1, "match", "name-good")
    s.expect(q, o2, "nonmatch", "veto:prefer-tag-match")


def fam_already_tagged(s: _Scenario) -> None:
    """Candidate already tagged wikidata → reported, not written
    (matcher.py:1477-1479)."""
    name = f"{s.stem} Windmill"
    q = s.add_wd({name: [("label", "en")]}, ["man_made=windmill"])
    o = s.add_osm(
        {"name": name, "man_made": "windmill", "wikidata": q}, north_m=70
    )
    s.expect(q, o, "nonmatch", "veto:already-tagged")


def fam_hot_key(s: _Scenario) -> None:
    """Hot blocking key: 60 identically-named nodes ("San Jose" effect,
    FIXTURES.md §3.12); only the nearby one matches."""
    name = "San Jose"
    q = s.add_wd({name: [("label", "en")]}, ["place=village", "place"])
    near = s.add_osm({"name": name, "place": "village"}, north_m=150)
    s.expect(q, near, "match", "name-good")
    for k in range(59):
        far = s.add_osm(
            {"name": name, "place": "village"},
            north_m=60_000 + 7_000 * k,
            east_m=45_000 + 9_000 * (k % 7),
        )
        s.expect(q, far, "nonmatch", "veto:distance")


def fam_extract_address(s: _Scenario) -> None:
    """Address-in-extract match with no shared name (ref
    tests/test_matcher.py:543-588, Baryshnikov Arts Center shape)."""
    stem2 = s.stem.split()[0].capitalize() + "gate"
    if s.index % 2:
        extract_street, osm_street = f"{stem2} Ave.", f"{stem2} Avenue"
    else:
        extract_street, osm_street = f"{stem2} Street", f"{stem2} Street"
    extract = (
        f"<p>The <b>{s.stem} Arts Centre</b> is a foundation and arts "
        f"complex opened in 2005 at 450 {extract_street} in the old "
        f"quarter.</p>"
    )
    q = s.add_wd(
        {f"{s.stem} Arts Centre": [("label", "en")]},
        ["building"],
        extract=extract,
    )
    o = s.add_osm(
        {"addr:housenumber": "450", "addr:street": osm_street, "building": "yes",
         "height": "44"},
        osm_type="way",
        north_m=25,
    )
    s.expect(q, o, "match", "address-extract")


def fam_conflict_shadow(s: _Scenario) -> None:
    """The 1:1 gate counts every stored candidate, not just chosen ones
    (matcher.py:1430-1443): A's chosen object is also a non-chosen candidate
    of B (who has two candidates and chooses none) — A is still rejected."""
    name = f"{s.stem} Hall"
    alias = f"{s.stem} Annex"
    qa = s.add_wd({name: [("label", "en")]}, ["amenity=community_centre"], n=0)
    qb = s.add_wd(
        {name: [("label", "en")], alias: [("alias", "en")]},
        ["amenity=community_centre"],
        n=1,
        east_m=90,
    )
    o = s.add_osm(
        {"name": name, "amenity": "community_centre"}, osm_type="way", north_m=45
    )
    o2 = s.add_osm(
        {"name": alias, "amenity": "community_centre"}, osm_type="way", east_m=120
    )
    s.expect(qa, o, "nonmatch", "veto:1to1-conflict")
    s.expect(qb, o, "nonmatch", "veto:multi-candidate")
    s.expect(qb, o2, "nonmatch", "veto:multi-candidate")


def fam_line_polygon(s: _Scenario) -> None:
    """Line-vs-polygon dedup: the same source geometry loaded into both the
    line and the polygon table keeps only the polygon row (reference
    filter_candidates, matcher.py:1222-1234)."""
    name = f"{s.stem} Park"
    q = s.add_wd({name: [("label", "en")]}, ["leisure=park"])
    src = s.index * 100 + 90
    o_line = s.add_osm(
        {"name": name, "leisure": "park"},
        osm_type="way", planet_table="line", north_m=40, src_id=src,
    )
    o_poly = s.add_osm(
        {"name": name, "leisure": "park"},
        osm_type="way", planet_table="polygon", north_m=55, src_id=src,
    )
    s.expect(q, o_poly, "match", "name-good")
    s.expect(q, o_line, "nonmatch", "veto:line-vs-polygon")


def fam_tidy_only(s: _Scenario) -> None:
    """Adversarial blocking fixture: the pair matches only after tidy_name
    rewrites every word ("Mount No. 4" vs "Mt Number 4", match.py:103-177) —
    no shared raw token, no shared normalized full name.  Recalled by the
    tidied-full-name blocking key (functions/keys.py)."""
    q = s.add_wd({"Mount No. 4": [("label", "en")]}, ["natural=peak"])
    o = s.add_osm({"name": "Mt Number 4", "natural": "peak"}, north_m=45)
    s.expect(q, o, "match", "name-good")


def fam_ceb_stub(s: _Scenario) -> None:
    """cebwiki/svwiki-only stub with no OSM counterpart — exercises the
    {ceb,sv} item suppression in language counts (place.py:1085-1088) and
    provides skip_item_during_match material (model.py:972-1006)."""
    s.add_wd(
        {
            f"{s.stem} Bukid": [
                ("label", "ceb"), ("label", "sv"), ("sitelink", "cebwiki"),
                ("sitelink", "svwiki"),
            ]
        },
        ["natural=peak"],
    )


def fam_within_place(s: _Scenario) -> None:
    """Within-polygon place names (§2.4 #38, reference get_within_names
    matcher.py:582-599 + test_match.py:326-330): the WD label carries a
    leading place name that only the containing village polygon can
    explain, so the pair matches ONLY when hunt_for_more_place_names is
    on.  Default config (the flag off, like the reference): nonmatch —
    the flag-on driver query (linkage_within_place) and its serial-oracle
    dump prove the flag-on behavior."""
    import math as _math

    pn = f"{s.stem}ville"
    q = s.add_wd(
        {f"{pn} {s.stem} Mill": [("label", "en")]}, ["man_made=watermill"]
    )
    o = s.add_osm(
        {"name": f"{s.stem} Mill", "man_made": "watermill"}, north_m=40
    )
    # the containing village: equal-area disc radius 300 m covers both
    o_poly = s.add_osm(
        {"name": pn, "place": "village",
         "way_area": f"{_math.pi * 300.0**2:.1f}"},
        osm_type="way", north_m=10,
    )
    s.expect(q, o, "nonmatch", "needs-within-place-names")
    s.expect(q, o_poly, "nonmatch", "village-is-not-a-mill")


FAMILIES: list[tuple[str, Callable[[_Scenario], None]]] = [
    ("exact", fam_exact),
    ("case", fam_case),
    ("tidy", fam_tidy),
    ("trim", fam_trim),
    ("initials", fam_initials),
    ("digit_guard", fam_digit_guard),
    ("ordinal", fam_ordinal),
    ("address", fam_address),
    ("address_veto", fam_address_veto),
    ("identifier", fam_identifier),
    ("nrhp", fam_nrhp),
    ("station_house", fam_station_house),
    ("parking", fam_parking),
    ("embassy", fam_embassy),
    ("castle_station", fam_castle_station),
    ("mountain_range", fam_mountain_range),
    ("dist_gate", fam_dist_gate),
    ("conflict", fam_conflict),
    ("prefer_station", fam_prefer_station),
    ("already_tagged", fam_already_tagged),
    ("extract_address", fam_extract_address),
    ("line_polygon", fam_line_polygon),
    ("tidy_only", fam_tidy_only),
    ("ceb_stub", fam_ceb_stub),
    ("conflict_shadow", fam_conflict_shadow),
    ("within_place", fam_within_place),
]
HOT_KEY_EVERY = 97  # scenario indices divisible by this run the hot-key family


def generate_scenario(index: int, seed: int = SEED) -> _Scenario:
    rng = random.Random(f"{seed}:{index}")
    s = _Scenario(index, rng)
    if index and index % HOT_KEY_EVERY == 0:
        fam_hot_key(s)
        s.family = "hot_key"
    else:
        name, builder = FAMILIES[index % len(FAMILIES)]
        builder(s)
        s.family = name
    for g in s.gold:
        g["family"] = s.family
    return s


def iter_docs(n_docs: int, seed: int = SEED) -> Iterator[dict[str, Any]]:
    """Yield doc rows until ~n_docs docs (streaming-friendly)."""
    produced = 0
    index = 0
    while produced < n_docs:
        s = generate_scenario(index, seed)
        for doc_id, spans in s.docs:
            yield {"doc_id": doc_id, "spans": spans}
            produced += 1
        index += 1


def generate_corpus(
    n_docs: int, seed: int = SEED
) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Materialize (docs, gold) lists — test/bench scale only."""
    docs: list[dict[str, Any]] = []
    gold: list[dict[str, Any]] = []
    index = 0
    while len(docs) < n_docs:
        s = generate_scenario(index, seed)
        docs.extend({"doc_id": d, "spans": sp} for d, sp in s.docs)
        gold.extend(s.gold)
        index += 1
    return docs, gold


def write_corpus_parquet(
    docs_path: str, gold_path: str | None, n_docs: int, seed: int = SEED
) -> tuple[int, int]:
    """Write the corpus as parquet; returns (n_docs, n_gold)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs, gold = generate_corpus(n_docs, seed)
    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    table = pa.Table.from_pylist(
        docs, schema=pa.schema([("doc_id", pa.string()), ("spans", span_type)])
    )
    pq.write_table(table, docs_path)
    if gold_path:
        pq.write_table(pa.Table.from_pylist(gold), gold_path)
    return len(docs), len(gold)


def corpus_checksums(docs: list[dict[str, Any]]) -> dict[str, str]:
    return {d["doc_id"]: span_checksum(d["spans"]) for d in docs}


DOCS_PER_SCENARIO = 2.6  # empirical mean incl. the hot-key family


def synth_docs_dataset(
    n_docs: int, seed: int = SEED, parallelism: int = 64
) -> "Any":
    """Distributed deterministic corpus: scenario ids fan out as a Ray
    Dataset and each task generates its own scenarios — no driver-side
    materialization, which is what makes 10^12-doc generation feasible
    (generation is pure (seed, index))."""
    import pyarrow as pa
    import ray

    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    schema = pa.schema([("doc_id", pa.string()), ("spans", span_type)])

    def gen(batch: dict) -> pa.Table:
        rows = []
        for idx in batch["id"]:
            s = generate_scenario(int(idx), seed)
            rows.extend({"doc_id": d, "spans": sp} for d, sp in s.docs)
        return pa.Table.from_pylist(rows, schema=schema)

    n_scenarios = max(1, int(n_docs / DOCS_PER_SCENARIO))
    return ray.data.range(n_scenarios, override_num_blocks=parallelism).map_batches(
        gen, batch_format="numpy"
    )
