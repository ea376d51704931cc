"""Offline dump readers: OSM PBF and Wikidata JSON dump → span documents.

Covers the wire codec (varints, zigzag, delta, zlib blobs), element
round-trips, geometry assembly (way/relation centroids via the thin
node-coordinate joins), planet-table typing, the candidate-worthiness
gate, the Wikidata entity parse, ISA-enrichment branch parity
(broadcast vs exchange), and the full linkage pipeline running over
reader-produced docs (VERDICT round-4 task 5's done-criterion).
"""

from __future__ import annotations

import gzip
import json

import numpy as np
import pytest

from osm_wikidata_ray.functions.spans import decode_doc
from osm_wikidata_ray.sources import osm_pbf as P
from osm_wikidata_ray.sources import wikidata_dump as W


# ---------------------------------------------------------------------------
# wire primitives


def test_packed_varint_roundtrip():
    values = [0, 1, 127, 128, 300, 2**21, 2**35, 2**63 - 1]
    buf = b"".join(P._enc_varint(v) for v in values)
    out = P.decode_packed_varints(buf)
    assert out.tolist() == values


def test_zigzag_roundtrip():
    values = [0, -1, 1, -2, 2, -(2**40), 2**40, -(2**62)]
    buf = b"".join(P._enc_zigzag(v) for v in values)
    out = P._unzigzag(P.decode_packed_varints(buf))
    assert out.tolist() == values


def test_delta_sint():
    seq = [100, 101, 99, -5, 1_000_000_000]
    prev = 0
    buf = bytearray()
    for v in seq:
        buf += P._enc_zigzag(v - prev)
        prev = v
    assert P._delta_sint(bytes(buf)).tolist() == seq


# ---------------------------------------------------------------------------
# fixtures

FIXTURE_ELEMENTS = [
    {"etype": "node", "id": 101, "lat": 51.501, "lon": -0.1416,
     "tags": {"name": "The Red Lion", "amenity": "pub"}},
    {"etype": "node", "id": 102, "lat": 51.502, "lon": -0.1417, "tags": {}},
    {"etype": "node", "id": 103, "lat": 51.503, "lon": -0.1418, "tags": {}},
    {"etype": "node", "id": 104, "lat": 51.504, "lon": -0.1419, "tags": {}},
    # closed way + area tag → polygon; centroid over distinct ring nodes
    {"etype": "way", "id": 201, "tags": {"building": "yes", "name": "Town Hall"},
     "refs": [102, 103, 104, 102]},
    # open way → line
    {"etype": "way", "id": 202, "tags": {"highway": "residential", "name": "Station Road"},
     "refs": [102, 104]},
    # relation centroid from direct node members
    {"etype": "relation", "id": 301, "tags": {"amenity": "school", "name": "Hill School"},
     "member_ids": [101, 103], "member_types": [0, 0]},
]


@pytest.fixture()
def pbf_path(tmp_path):
    path = str(tmp_path / "fixture.osm.pbf")
    P.write_pbf(FIXTURE_ELEMENTS, path)
    return path


def _class_entity() -> dict:
    cls = W.item_to_entity(
        {"qid": "Q3914", "names": {"school": [("label", "en")]}, "isa": []}
    )
    cls["claims"]["P279"] = [
        {"mainsnak": {"snaktype": "value", "datavalue": {
            "value": {"entity-type": "item", "id": "Q24398318", "numeric-id": 1},
            "type": "wikibase-entityid"}}}
    ]
    return cls


def _wd_entities() -> list[dict]:
    red_lion = W.item_to_entity(
        {"qid": "Q1001", "lat": 51.5011, "lon": -0.14161,
         "names": {"The Red Lion": [("label", "en")], "Red Lion": [("alias", "en")]},
         "isa": ["Q3914"],
         "street_addresses": ["1 Station Road"],
         "p131_qids": ["Q8001"]}
    )
    admin = W.item_to_entity(
        {"qid": "Q8001", "names": {"Westminster": [("label", "en")]}, "isa": []}
    )
    no_coords = W.item_to_entity(
        {"qid": "Q7007", "names": {"Nowhere": [("label", "en")]}, "isa": ["Q3914"]}
    )
    return [red_lion, _class_entity(), admin, no_coords]


@pytest.fixture()
def dump_path(tmp_path):
    path = str(tmp_path / "entities.json")
    W.write_dump(_wd_entities(), path)
    return path


# ---------------------------------------------------------------------------
# PBF reader


def test_pbf_element_roundtrip(ray_session, pbf_path):
    got = sorted(P.read_pbf(pbf_path).take_all(), key=lambda r: (r["etype"], r["id"]))
    want = sorted(FIXTURE_ELEMENTS, key=lambda r: (r["etype"], r["id"]))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["etype"] == w["etype"] and g["id"] == w["id"]
        assert sorted(g["tags"]) == sorted(f"{k}={v}" for k, v in w.get("tags", {}).items())
        assert g["refs"] == list(w.get("refs", []))
        assert g["member_ids"] == list(w.get("member_ids", []))
        if w["etype"] == "node":
            # granularity 100 → 1e-7 degree quantization
            assert abs(g["lat"] - w["lat"]) < 2e-7
            assert abs(g["lon"] - w["lon"]) < 2e-7


def test_pbf_docs_geometry_and_typing(ray_session, pbf_path):
    docs = {d["doc_id"]: d for d in P.pbf_to_docs(pbf_path).take_all()}
    # untagged nodes fail the candidate gate; 4 objects survive
    assert sorted(docs) == [
        "osm-node-000000000101",
        "osm-relation-000000000301",
        "osm-way-000000000201",
        "osm-way-000000000202",
    ]
    objs = {
        k: decode_doc(k, d["spans"])["obj"] for k, d in docs.items()
    }
    hall = objs["osm-way-000000000201"]
    assert hall["planet_table"] == "polygon"
    # ring nodes 102/103/104, closing node not double-counted
    assert abs(hall["lat"] - 51.503) < 1e-6 and abs(hall["lon"] - -0.1418) < 1e-6
    road = objs["osm-way-000000000202"]
    assert road["planet_table"] == "line"
    assert abs(road["lat"] - 51.503) < 1e-6
    school = objs["osm-relation-000000000301"]
    assert school["planet_table"] == "relation"
    assert abs(school["lat"] - 51.502) < 1e-6 and abs(school["lon"] - -0.1417) < 1e-6
    pub = objs["osm-node-000000000101"]
    assert pub["planet_table"] == "point" and pub["name"] == "The Red Lion"


def test_pbf_candidate_filter_off(ray_session, pbf_path):
    docs = P.pbf_to_docs(pbf_path, candidate_filter=False).take_all()
    assert len(docs) == len(FIXTURE_ELEMENTS)


# ---------------------------------------------------------------------------
# Wikidata dump reader


def test_dump_line_parsing():
    assert W.parse_dump_line("[") is None
    assert W.parse_dump_line("]") is None
    assert W.parse_dump_line('{"id": "Q1"},')["id"] == "Q1"
    assert W.parse_dump_line('{"id": "Q1"}')["id"] == "Q1"


def test_wd_dump_docs(ray_session, dump_path):
    docs = {d["doc_id"]: d for d in W.read_wikidata_dump(dump_path).take_all()}
    # class/admin entities have no coords, Q7007 has no P625 → only Q1001
    assert list(docs) == ["wd-Q000001001"]
    item = decode_doc("wd-Q000001001", docs["wd-Q000001001"]["spans"])["item"]
    assert item["qid"] == "Q1001"
    assert "The Red Lion" in item["names"]
    assert item["isa"] == ["Q3914"]
    # expected tags derived offline from the P31 → tag table
    assert "amenity=college" in item["tags"]
    assert item["street_addresses"] == ["1 Station Road"]
    # enrichment: class label + superclass + P131 admin-area label
    assert item["isa_labels"] == {"Q3914": {"en": "school"}}
    assert item["place_names"] == ["Westminster"]
    texts = [s["text"] for s in docs["wd-Q000001001"]["spans"] if s["kind"] == "claim"]
    assert "P279\tQ3914\tQ24398318" in texts


def test_wd_dump_branch_parity(ray_session, dump_path):
    a = {d["doc_id"]: d["spans"] for d in W.read_wikidata_dump(dump_path).take_all()}
    b = {
        d["doc_id"]: d["spans"]
        for d in W.read_wikidata_dump(dump_path, force_exchange=True).take_all()
    }
    assert a == b


def test_wd_dump_gzip(ray_session, tmp_path, dump_path):
    gz = str(tmp_path / "entities.json.gz")
    with open(dump_path, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    docs = W.read_wikidata_dump(gz, isa_enrich=False).take_all()
    assert [d["doc_id"] for d in docs] == ["wd-Q000001001"]


def test_wd_qid_tags_override(ray_session, tmp_path):
    # an isa with no entry in the P31 table, supplied by the caller
    # (the offline stand-in for a P1282 subclass walk)
    ent = W.item_to_entity(
        {"qid": "Q2002", "lat": 1.0, "lon": 2.0,
         "names": {"Oxmoor": [("label", "en")]}, "isa": ["Q99999999"]}
    )
    path = str(tmp_path / "d.json")
    W.write_dump([ent], path)
    assert W.read_wikidata_dump(path, isa_enrich=False).take_all() == []  # no tags
    docs = W.read_wikidata_dump(
        path, qid_tags={"Q99999999": ["amenity=marketplace"]}, isa_enrich=False
    ).take_all()
    item = decode_doc(docs[0]["doc_id"], docs[0]["spans"])["item"]
    assert item["tags"] == ["amenity=marketplace"]


# ---------------------------------------------------------------------------
# the done-criterion: linkage over reader-produced docs


def test_linkage_over_dump_inputs(ray_session, tmp_path, pbf_path, dump_path):
    from osm_wikidata_ray.pipelines.linkage import read_docs, run_linkage

    # read_docs dispatches on extension: .pbf / .json are first-class inputs
    docs = read_docs(pbf_path).union(read_docs(dump_path))
    res = run_linkage(docs, with_clusters=False, scorer_concurrency=None)
    accepted = res.accepted.take_all()
    assert [(r["qid"], r["osm_type"], r["osm_id"]) for r in accepted] == [
        ("Q1001", "node", 101)
    ]
    match = json.loads(accepted[0]["name_match"])
    assert match["name"][0][1] == "The Red Lion"


def test_dump_fixture_linkage_matches_serial_oracle(ray_session, tmp_path):
    """The driver's linkage_from_dumps check in miniature: derive PBF +
    JSON-dump fixtures from the synth corpus, run the distributed engine
    over the READER-produced docs, compare to the serial oracle on the
    same docs."""
    from osm_wikidata_ray.pipelines.linkage import run_linkage
    from osm_wikidata_ray.sources.dump_fixtures import corpus_to_dump_fixtures
    from osm_wikidata_ray.sources.oracle import oracle_tables
    from osm_wikidata_ray.sources.synth import generate_corpus

    docs, _gold = generate_corpus(300)
    pbf = str(tmp_path / "fx.osm.pbf")
    jsn = str(tmp_path / "fx.wd.json")
    qid_tags = corpus_to_dump_fixtures(docs, pbf, jsn)
    reader_docs = P.pbf_to_docs(pbf).union(
        W.read_wikidata_dump(jsn, qid_tags=qid_tags)
    ).materialize()
    rows = sorted(reader_docs.take_all(), key=lambda r: r["doc_id"])
    oracle = sorted(
        (r["qid"], r["osm_type"], r["osm_id"])
        for r in oracle_tables(rows)["accepted"]
    )
    res = run_linkage(
        reader_docs, with_clusters=False, hot_key_threshold=500,
        salt_factor=8, scorer_concurrency=(1, 4),
    )
    engine = sorted(
        (r["qid"], r["osm_type"], r["osm_id"]) for r in res.accepted.take_all()
    )
    assert engine == oracle
    assert len(engine) > 20  # the fixture corpus must keep real matches
