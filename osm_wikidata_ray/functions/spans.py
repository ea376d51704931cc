"""Span codec for the interleaved text+media document table.

Input table shape (BASELINE.json input_hint / FIXTURES.md §1):

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string,
                        offset: int32>>

One document carries either one Wikidata-side entity or one OSM-side object
as an ordered span sequence.  Span kinds and their text payload encodings:

    side    "wd" | "osm"
    id      "Q42" | "node/123"
    loc     "<lat> <lon>"
    name    "<source>\t<lang>\t<value>"   (wd: label/sitelink/alias/...;
                                           osm: the name-ish tag key)
    tag     "amenity=school" | "building"  (osm tags / wd expected tags)
    claim   "<PID>\t<value...>"           (P31, P649, P6375, P137, P131
                                           place names, identifier claims,
                                           ISALABEL\t<qid>\t<lang>\t<label>,
                                           PLANET\t<table>, P1216\t<ref>)
    cat     enwiki category name
    extract first-paragraph HTML with <b> names
    media   caption text; media_ref = opaque image URI (never parsed)
    text    free prose filler — must round-trip untouched

The engine must preserve per-row span-sequence equality (kind, text,
media_ref, order); span_checksum() is carried through the pipeline and
re-verified at the sink.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable

from ..rules.address import is_in_range
from ..rules.tags import IDENTIFIER_PROPERTIES, identifiers_from_claims

_IDENTIFIER_PIDS = {pid for pid, _, _ in IDENTIFIER_PROPERTIES}


def span_checksum(spans: Iterable[dict[str, Any]]) -> str:
    """Deterministic checksum over (kind, text, media_ref, order)."""
    h = hashlib.sha256()
    for s in spans:
        h.update(s["kind"].encode())
        h.update(b"\x1f")
        h.update((s["text"] or "").encode())
        h.update(b"\x1f")
        h.update((s["media_ref"] or "").encode())
        h.update(b"\x1e")
    return h.hexdigest()


def make_span(kind: str, text: str, media_ref: str = "") -> dict[str, Any]:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": 0}


def docs_schema() -> "Any":
    """The canonical Arrow schema of the span-document table (the shape
    read_docs returns and every docs producer — synth, the PBF / Wikidata
    dump readers — emits)."""
    import pyarrow as pa

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
    return pa.schema([("doc_id", pa.string()), ("spans", span_type)])


def finalize_spans(spans: list[dict[str, Any]]) -> list[dict[str, Any]]:
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


def decode_doc(doc_id: str, spans: list[dict[str, Any]]) -> dict[str, Any] | None:
    """Parse one document's span sequence into a wd item / osm object record.

    Returns {"side": "wd", "item": {...}} or {"side": "osm", "obj": {...}},
    or None for documents carrying neither side marker (pure noise docs).
    """
    side = None
    for s in spans:
        if s["kind"] == "side":
            side = s["text"]
            break
    if side == "wd":
        return {"side": "wd", "item": _decode_wd(doc_id, spans)}
    if side == "osm":
        return {"side": "osm", "obj": _decode_osm(doc_id, spans)}
    return None


def _decode_wd(doc_id: str, spans: list[dict[str, Any]]) -> dict[str, Any]:
    qid = ""
    lat = lon = None
    names: dict[str, list[tuple[str, str | None]]] = {}
    tags: list[str] = []
    categories: list[str] = []
    extract = ""
    claims: dict[str, list[str]] = {}
    isa_labels: dict[str, dict[str, str]] = {}
    place_names: list[str] = []
    sitelinks: list[str] = []
    label_langs: set[str] = set()

    for s in spans:
        kind, text = s["kind"], s["text"]
        if kind == "id":
            qid = text
        elif kind == "loc":
            parts = text.split()
            lat, lon = float(parts[0]), float(parts[1])
        elif kind == "name":
            source, lang, value = text.split("\t", 2)
            names.setdefault(value, []).append((source, lang or None))
            if source == "label" and lang:
                label_langs.add(lang)
            elif source == "sitelink" and lang:
                sitelinks.append(lang)
        elif kind == "tag":
            tags.append(text)
        elif kind == "cat":
            categories.append(text)
        elif kind == "extract":
            extract = text
        elif kind == "claim":
            pid, _, value = text.partition("\t")
            if pid == "ISALABEL":
                isa_qid, lang, label = value.split("\t", 2)
                isa_labels.setdefault(isa_qid, {})[lang] = label
            elif pid == "P131":
                place_names.append(value)
            else:
                claims.setdefault(pid, []).append(value)

    # category → expected-tag expansion happens at parse (reference
    # place.add_tags_to_items, place.py:942-1001)
    if categories:
        from ..rules.tags import categories_to_tags

        tags = sorted(set(tags) | set(categories_to_tags(categories)))

    # P6375 street addresses join the name dict (model.py:720-728)
    for addr in claims.get("P6375", []):
        names.setdefault(addr, []).append(("P6375", None))

    # extract bold names (model.py:707-708)
    if extract:
        from ..rules.entity import html_names

        for n in html_names(extract):
            names.setdefault(n, []).append(("extract", "enwiki"))

    # image-name range suppression (model.py:730-751)
    def has_digit(x: str) -> bool:
        return any(c.isdigit() for c in x)

    image_names = {
        n for n, srcs in names.items()
        if len(srcs) == 1 and srcs[0][0] == "image" and has_digit(n)
    }
    if image_names:
        other = {n for n in names if n not in image_names and has_digit(n)}
        for img in image_names:
            if any(is_in_range(o, img) for o in other):
                del names[img]

    languages = sorted(
        {lang for lang in label_langs if "-" not in lang}
        | {s[:-4] for s in sitelinks if s.endswith("wiki")}
    )

    return {
        "doc_id": doc_id,
        "qid": qid,
        "lat": lat,
        "lon": lon,
        "names": names,
        "tags": sorted(set(tags)),
        "isa": claims.get("P31", []),
        "isa_labels": isa_labels,
        "languages": languages,
        "identifiers": identifiers_from_claims(claims),
        "street_addresses": claims.get("P6375", []),
        "categories": categories,
        "extract": extract,
        "place_names": place_names,
        "sitelinks": sitelinks,
        "nrhp": claims.get("P649", []),
        "p137": claims.get("P137", []),
        "p1216": "P1216" in claims,
    }


def _decode_osm(doc_id: str, spans: list[dict[str, Any]]) -> dict[str, Any]:
    osm_type, osm_id = "node", 0
    lat = lon = None
    tags: dict[str, str] = {}
    planet_table = None
    src_id: int | None = None

    for s in spans:
        kind, text = s["kind"], s["text"]
        if kind == "id":
            t, _, i = text.partition("/")
            osm_type, osm_id = t, int(i)
        elif kind == "loc":
            parts = text.split()
            lat, lon = float(parts[0]), float(parts[1])
        elif kind == "name":
            key, _lang, value = text.split("\t", 2)
            tags[key] = value
        elif kind == "tag":
            k, sep, v = text.partition("=")
            tags[k] = v if sep else ""
        elif kind == "claim":
            pid, _, value = text.partition("\t")
            if pid == "PLANET":
                planet_table = value
            elif pid == "SRCID":  # osm2pgsql source-geometry id (matcher.py:1222)
                src_id = int(value)

    if planet_table is None:
        planet_table = {"node": "point", "relation": "relation"}.get(osm_type, "line")
    if src_id is None:
        src_id = (
            -osm_id
            if (osm_type == "relation" and planet_table != "relation")
            else osm_id
        )

    return {
        "doc_id": doc_id,
        "osm_type": osm_type,
        "osm_id": osm_id,
        "name": tags.get("name"),
        "tags": tags,
        "lat": lat,
        "lon": lon,
        "planet_table": planet_table,
        "src_id": src_id,
    }


# --- encoders (used by the fixture generator) ---

def encode_wd_doc(item: dict[str, Any]) -> tuple[str, list[dict[str, Any]]]:
    """Item record → (doc_id, spans).  Inverse of _decode_wd for the fields
    the scorer consumes."""
    qid_num = int(item["qid"][1:]) if item["qid"][1:].isdigit() else 0
    doc_id = f"wd-Q{qid_num:09d}"
    spans = [make_span("side", "wd"), make_span("id", item["qid"])]
    if item.get("lat") is not None:
        spans.append(make_span("loc", f"{item['lat']:.7f} {item['lon']:.7f}"))
    for name, sources in (item.get("names") or {}).items():
        for source, lang in sources:
            if source in ("P6375", "extract"):
                continue  # re-derived from claims / extract at decode
            spans.append(make_span("name", f"{source}\t{lang or ''}\t{name}"))
    for tag in item.get("tags") or []:
        spans.append(make_span("tag", tag))
    for cat in item.get("categories") or []:
        spans.append(make_span("cat", cat))
    for isa in item.get("isa") or []:
        spans.append(make_span("claim", f"P31\t{isa}"))
    # denormalized class hierarchy: one span per (P31 class, P279 super) of
    # this item — the doc-driven stand-in for the reference's IsA.entity
    # P279 claims (isa_facets.py:17-22), consumed by isa_facet_counts
    for child, supers in (item.get("isa_supers") or {}).items():
        for sup in supers:
            spans.append(make_span("claim", f"P279\t{child}\t{sup}"))
    for isa_qid, labels in (item.get("isa_labels") or {}).items():
        for lang, label in labels.items():
            spans.append(make_span("claim", f"ISALABEL\t{isa_qid}\t{lang}\t{label}"))
    for pid, values in (item.get("claims") or {}).items():
        for v in values:
            spans.append(make_span("claim", f"{pid}\t{v}"))
    for addr in item.get("street_addresses") or []:
        spans.append(make_span("claim", f"P6375\t{addr}"))
    for pn in item.get("place_names") or []:
        spans.append(make_span("claim", f"P131\t{pn}"))
    for ref in item.get("nrhp") or []:
        spans.append(make_span("claim", f"P649\t{ref}"))
    for c in item.get("p137") or []:
        spans.append(make_span("claim", f"P137\t{c}"))
    if item.get("extract"):
        spans.append(make_span("extract", item["extract"]))
    return doc_id, spans


def encode_osm_doc(obj: dict[str, Any]) -> tuple[str, list[dict[str, Any]]]:
    doc_id = f"osm-{obj['osm_type']}-{obj['osm_id']:012d}"
    spans = [
        make_span("side", "osm"),
        make_span("id", f"{obj['osm_type']}/{obj['osm_id']}"),
    ]
    if obj.get("lat") is not None:
        spans.append(make_span("loc", f"{obj['lat']:.7f} {obj['lon']:.7f}"))
    for k, v in (obj.get("tags") or {}).items():
        spans.append(make_span("tag", f"{k}={v}" if v else k))
    if obj.get("planet_table"):
        spans.append(make_span("claim", f"PLANET\t{obj['planet_table']}"))
    if obj.get("src_id") is not None:
        spans.append(make_span("claim", f"SRCID\t{obj['src_id']}"))
    return doc_id, spans
