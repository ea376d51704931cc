"""Derive offline dump fixtures (OSM PBF + Wikidata JSON dump) from a
span-document corpus.

The dump readers (sources/osm_pbf.py, sources/wikidata_dump.py) need
realistic inputs for the driver's oracle check; this module converts the
deterministic synth corpus into the two public dump formats so the
`linkage_from_dumps` query can run the FULL offline path — PBF blobs →
element decode → centroid joins → docs, JSON dump → entity parse → ISA
enrichment → docs — and compare the distributed engine's accepted pairs
against the serial oracle over the same reader-produced docs.

Representable subset (everything else is dropped SYMMETRICALLY — the
oracle consumes the reader output, so the comparison stays exact):

- OSM ways/relations carry no geometry in PBF; synthetic anchor nodes
  (untagged, filtered by the reader's candidate gate) are planted so the
  centroid joins reproduce each object's original location; polygon
  typing re-derives from closed rings + area tags, so objects whose tags
  carry no area key decode as lines.
- Wikidata entities carry no enwiki extract/categories and no osm2pgsql
  SRCID; category-derived expected tags fold into the criteria map
  (qid_tags) the same way the reference folds SPARQL criteria into item
  tags.
- ISA labels/supers and P131 admin-area names become real class/admin
  entities in the dump, exercising the reader's enrichment pass.
"""

from __future__ import annotations

import zlib
from typing import Any

from ..functions.spans import decode_doc
from ..rules.tags import categories_to_tags
from .osm_pbf import write_pbf
from .wikidata_dump import item_to_entity, write_dump

# anchor node ids live far above any synth object id
_ANCHOR_BASE = 10**13
# ~11 m offsets: big enough to be distinct coordinates after the PBF's
# 1e-7 degree quantization, small enough not to move blocking geo-cells
_ANCHOR_STEP_DEG = 1e-4


def _anchor_ring(lat: float, lon: float, k: int) -> list[tuple[float, float]]:
    """k points whose mean is exactly (lat, lon) (symmetric offsets)."""
    if k == 2:
        return [(lat - _ANCHOR_STEP_DEG, lon), (lat + _ANCHOR_STEP_DEG, lon)]
    d = _ANCHOR_STEP_DEG
    return [(lat - d, lon - d), (lat - d, lon + d), (lat + d, lon + d), (lat + d, lon - d)]


def _wd_entity_parts(
    doc_id: str, spans: list[dict[str, Any]]
) -> tuple[dict[str, Any], dict[str, dict], list[str], list[str]]:
    """One WD doc's spans → (item for item_to_entity, classes, p131 names,
    criteria tags)."""
    item: dict[str, Any] = {
        "qid": "", "lat": None, "lon": None, "names": {}, "isa": [],
        "claims": {}, "street_addresses": [], "nrhp": [], "p137": [],
    }
    classes: dict[str, dict] = {}
    p131_names: list[str] = []
    tags: list[str] = []
    cats: list[str] = []
    for s in spans:
        kind, text = s["kind"], s["text"]
        if kind == "id":
            item["qid"] = text
        elif kind == "loc":
            lat, lon = text.split()
            item["lat"], item["lon"] = float(lat), float(lon)
        elif kind == "name":
            source, lang, value = text.split("\t", 2)
            item["names"].setdefault(value, []).append((source, lang or None))
        elif kind == "tag":
            tags.append(text)
        elif kind == "cat":
            cats.append(text)
        elif kind == "claim":
            pid, _, value = text.partition("\t")
            if pid == "P31":
                item["isa"].append(value)
            elif pid == "P279":
                child, _, sup = value.partition("\t")
                classes.setdefault(child, {"labels": {}, "supers": set()})[
                    "supers"
                ].add(sup)
            elif pid == "ISALABEL":
                q, lang, label = value.split("\t", 2)
                classes.setdefault(q, {"labels": {}, "supers": set()})["labels"][
                    lang
                ] = label
            elif pid == "P131":
                p131_names.append(value)
            elif pid == "P6375":
                item["street_addresses"].append(value)
            elif pid == "P649":
                item["nrhp"].append(value)
            elif pid == "P137":
                item["p137"].append(value)
            else:
                item["claims"].setdefault(pid, []).append(value)
    # enwiki categories are not representable in an entities dump; their
    # expected-tag expansion folds into the criteria map instead
    criteria = sorted(set(tags) | set(categories_to_tags(cats)))
    return item, classes, p131_names, criteria


def _admin_qid(name: str) -> str:
    """Deterministic pseudo-QID for a P131 admin-area name."""
    return f"Q9{zlib.crc32(name.encode()) % 10**7:07d}"


def corpus_to_dump_fixtures(
    docs: list[dict[str, Any]], pbf_path: str, json_path: str
) -> dict[str, list[str]]:
    """Write the corpus's OSM side as a PBF file and its WD side as a
    Wikidata JSON dump; returns the criteria map (qid → expected tags)
    for read_wikidata_dump(qid_tags=...)."""
    elements: list[dict[str, Any]] = []
    entities: list[dict[str, Any]] = []
    classes: dict[str, dict] = {}
    admins: dict[str, str] = {}
    qid_tags: dict[str, list[str]] = {}
    anchor = _ANCHOR_BASE

    for d in docs:
        rec = decode_doc(d["doc_id"], d["spans"])
        if rec is None:
            continue
        if rec["side"] == "osm":
            obj = rec["obj"]
            tags = obj["tags"]
            if obj["osm_type"] == "node":
                elements.append(
                    {"etype": "node", "id": obj["osm_id"],
                     "lat": obj["lat"], "lon": obj["lon"], "tags": tags}
                )
                continue
            closed = obj.get("planet_table") == "polygon"
            k = 4 if closed else 2
            coords = _anchor_ring(obj["lat"], obj["lon"], k)
            ids = list(range(anchor + 1, anchor + 1 + k))
            anchor += k
            for nid, (la, lo) in zip(ids, coords):
                elements.append(
                    {"etype": "node", "id": nid, "lat": la, "lon": lo, "tags": {}}
                )
            if obj["osm_type"] == "way":
                elements.append(
                    {"etype": "way", "id": obj["osm_id"], "tags": tags,
                     "refs": ids + [ids[0]] if closed else ids}
                )
            else:
                elements.append(
                    {"etype": "relation", "id": obj["osm_id"], "tags": tags,
                     "member_ids": ids, "member_types": [0] * len(ids)}
                )
        else:
            item, item_classes, p131_names, criteria = _wd_entity_parts(
                d["doc_id"], d["spans"]
            )
            if criteria:
                qid_tags[item["qid"]] = criteria
            for q, c in item_classes.items():
                agg = classes.setdefault(q, {"labels": {}, "supers": set()})
                agg["labels"].update(c["labels"])
                agg["supers"].update(c["supers"])
            item["p131_qids"] = []
            for name in p131_names:
                q = admins.setdefault(name, _admin_qid(name))
                item["p131_qids"].append(q)
            entities.append(item_to_entity(item))

    # class entities: labels + P279 supers, no coords (readers drop them
    # from the docs but the enrichment pass consumes them)
    for q in sorted(classes):
        c = classes[q]
        names: dict[str, list] = {}
        for lang, label in sorted(c["labels"].items()):
            names.setdefault(label, []).append(("label", lang))
        ent = item_to_entity({"qid": q, "names": names})
        for sup in sorted(c["supers"]):
            ent["claims"].setdefault("P279", []).append(
                {"mainsnak": {"snaktype": "value", "datavalue": {
                    "value": {"entity-type": "item", "id": sup,
                              "numeric-id": int(sup[1:]) if sup[1:].isdigit() else 0},
                    "type": "wikibase-entityid"}}}
            )
        entities.append(ent)
    for name in sorted(admins):
        entities.append(
            item_to_entity({"qid": admins[name], "names": {name: [("label", "en")]}})
        )

    write_pbf(elements, pbf_path)
    write_dump(entities, json_path)
    return qid_tags
