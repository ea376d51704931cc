"""Offline Wikidata JSON-dump reader → span documents.

The reference fetches entities live over HTTP (matcher/wikidata.py:759-843
``get_entities`` chunked api calls, plus per-item SPARQL).  The public
*offline* equivalent is the wikidata-entities JSON dump: one entity JSON
per line inside a single huge array (``[\n{...},\n{...},\n...]``), also
commonly re-sharded as plain JSONL.  This module reads that format with
``ray.data.read_text`` (line splitting and byte-range parallelism come
free), parses each entity with the same rules/entity.py code path the
engine uses for live entity JSON, and emits the span-document schema so
``run_linkage`` runs unchanged over a dump::

    docs = read_wikidata_dump("entities.json", qid_tags={"Q3914": [...]})
    result = run_linkage(docs.union(osm_docs), ...)

Expected-tag derivation is offline too: the reference learns an item's
expected OSM tags from the SPARQL criteria that found it; here they come
from the P31 → tag table (rules/tags.get_extra_tags, reference
wikidata.py:66-251) plus an optional caller-provided ``qid_tags`` map
(e.g. the output of a P1282 subclass walk, sources/wikidata_sparql.py).

ISA enrichment (labels of P31 classes for ending-stripping, P279 supers
for isa facets, P131 admin-area labels for place names) needs a second
look at the dump because those target entities are other rows of the
same file.  Per the repo invariant this is size-guarded with an exchange
fallback:

- broadcast branch (default): the distinct needed-QID set is collected
  (bounded by the ontology vocabulary, not the corpus), their
  label/P279 rows are gathered to one small map, ``ray.put`` once and
  read per worker process;
- exchange branch (over the byte cap, or ``force_exchange``): the thin
  all-entity label table joins the per-doc needed-QID pairs by a
  bucketed qid exchange, and the resulting enrichment spans join the
  encoded docs by a bucketed doc_id exchange — docs ship once, labels
  ship thin; no driver materialization anywhere.

Both branches append the same deterministically-ordered enrichment
spans, so they are parity-testable (tests/test_dump_readers.py pins it).

Compression note: ``.gz``/``.bz2`` single-stream files decompress
sequentially per file — shard the dump (the standard practice for the
~100 GB compressed planet dump) so read_text can fan out.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

import ray

from ..rules.entity import claim_ids, claim_values, names_from_entity
from ..rules.tags import IDENTIFIER_PROPERTIES, get_extra_tags

_IDENTIFIER_PIDS = {pid for pid, _, _ in IDENTIFIER_PROPERTIES}
from ..stages.blocking import add_bucket
from ..util import default_partitions
from ..functions.spans import docs_schema, encode_wd_doc, finalize_spans, make_span

# driver-side broadcast caps (same pattern as training_data's guards):
# the needed-QID vocabulary and its label map must stay driver-small for
# the broadcast branch; past either cap the exchange branch runs.
MAX_BROADCAST_QIDS = 2_000_000
MAX_BROADCAST_BYTES = 256 << 20

_READER_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", docs_schema().field("spans").type),
        ("isa_qids", pa.list_(pa.string())),
        ("p131_qids", pa.list_(pa.string())),
    ]
)


def parse_dump_line(line: str) -> dict[str, Any] | None:
    """One dump line → entity JSON dict (None for the array brackets)."""
    line = line.strip()
    if not line or line in ("[", "]"):
        return None
    if line.endswith(","):
        line = line[:-1]
    return json.loads(line)


def entity_to_item(
    entity: dict[str, Any], qid_tags: dict[str, list[str]] | None = None
) -> dict[str, Any] | None:
    """Entity JSON → the engine's item record (encode_wd_doc input shape).

    Skips non-item entities (properties, lexemes).  P6375 street
    addresses, P649 NRHP refs and identifier claims are carried as claim
    spans and re-derived at decode (functions/spans._decode_wd), exactly
    like the synthetic corpus."""
    qid = entity.get("id", "")
    if not qid.startswith("Q") or entity.get("type", "item") != "item":
        return None
    lat = lon = None
    for v in claim_values(entity, "P625"):
        if isinstance(v, dict) and "latitude" in v:
            lat, lon = v["latitude"], v["longitude"]
            break
    isa = claim_ids(entity, "P31")
    tags = set(get_extra_tags(isa))
    # the criteria map accepts P31-class keys AND per-item qid keys — the
    # offline analogue of "which search criteria found this item" (the
    # reference assigns an item the tags of the SPARQL criteria that
    # returned it, matcher.py view of place.items_from_wikidata)
    for q in (*isa, qid):
        tags.update((qid_tags or {}).get(q, ()))
    claims = entity.get("claims") or {}
    string_claims = {
        pid: [v for v in claim_values(entity, pid) if isinstance(v, str)]
        for pid in claims
    }
    return {
        "qid": qid,
        "lat": lat,
        "lon": lon,
        "names": names_from_entity(entity),
        "tags": sorted(tags),
        "isa": isa,
        # only identifier claims ride as claim spans (what check_identifier
        # consumes); P31/P649/P6375 are carried by their own fields below
        "claims": {
            pid: vals
            for pid, vals in string_claims.items()
            if vals and pid in _IDENTIFIER_PIDS and pid != "P649"
        },
        "street_addresses": [
            v["text"] for v in claim_values(entity, "P6375") if isinstance(v, dict)
        ],
        "nrhp": string_claims.get("P649", []),
        "p137": claim_ids(entity, "P137"),
        "p131_qids": claim_ids(entity, "P131"),
    }


def entity_label_row(entity: dict[str, Any], langs: frozenset[str]) -> dict[str, Any]:
    """Thin enrichment row for one entity: labels (capped to ``langs``)
    and P279 superclass ids."""
    labels = {
        lang: v["value"]
        for lang, v in (entity.get("labels") or {}).items()
        if lang in langs
    }
    return {
        "qid": entity.get("id", ""),
        "labels_json": json.dumps(labels, sort_keys=True),
        "supers": claim_ids(entity, "P279"),
    }


def _enrich_spans(
    isa_qids: list[str],
    p131_qids: list[str],
    lookup: dict[str, tuple[dict[str, str], list[str]]],
) -> list[dict[str, Any]]:
    """Deterministically-ordered enrichment spans for one doc — shared by
    the broadcast and exchange branches so both produce identical docs."""
    spans: list[dict[str, Any]] = []
    for q in sorted(set(isa_qids)):
        labels, supers = lookup.get(q, ({}, []))
        for sup in sorted(set(supers)):
            spans.append(make_span("claim", f"P279\t{q}\t{sup}"))
        for lang in sorted(labels):
            spans.append(make_span("claim", f"ISALABEL\t{q}\t{lang}\t{labels[lang]}"))
    for q in sorted(set(p131_qids)):
        labels, _supers = lookup.get(q, ({}, []))
        name = labels.get("en") or (sorted(labels.values())[0] if labels else None)
        if name:
            spans.append(make_span("claim", f"P131\t{name}"))
    return spans


class _DumpParser:
    """Per-batch dump-line parser → pre-enrichment doc rows."""

    def __init__(
        self,
        qid_tags: dict[str, list[str]] | None,
        require_coords: bool,
        require_tags: bool,
    ) -> None:
        self.qid_tags = qid_tags
        self.require_coords = require_coords
        self.require_tags = require_tags

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch.column("text").to_pylist():
            entity = parse_dump_line(line)
            if entity is None:
                continue
            item = entity_to_item(entity, self.qid_tags)
            if item is None:
                continue
            if self.require_coords and item["lat"] is None:
                continue
            if self.require_tags and not item["tags"]:
                continue
            p131 = item.pop("p131_qids")
            doc_id, spans = encode_wd_doc(item)
            rows.append(
                {
                    "doc_id": doc_id,
                    "spans": spans,  # offsets finalized after enrichment
                    "isa_qids": item["isa"],
                    "p131_qids": p131,
                }
            )
        return pa.Table.from_pylist(rows, schema=_READER_SCHEMA)


def _finalize_batch(batch: pa.Table) -> pa.Table:
    docs = batch.select(["doc_id", "spans"]).to_pylist()
    for d in docs:
        finalize_spans(d["spans"])
    return pa.Table.from_pylist(docs, schema=docs_schema())


_label_cache: dict[str, dict] = {}


def _attach_broadcast(batch: pa.Table, lookup_ref: "ray.ObjectRef") -> pa.Table:
    key = lookup_ref.hex()
    lookup = _label_cache.get(key)
    if lookup is None:
        _label_cache.clear()  # one live broadcast per stage; bound the cache
        lookup = _label_cache.setdefault(key, ray.get(lookup_ref))
    rows = batch.to_pylist()
    for row in rows:
        row["spans"] = row["spans"] + _enrich_spans(
            row["isa_qids"], row["p131_qids"], lookup
        )
        finalize_spans(row["spans"])
    return pa.Table.from_pylist(
        [{"doc_id": r["doc_id"], "spans": r["spans"]} for r in rows],
        schema=docs_schema(),
    )


def _read_lines(path: str, parallelism: int | None) -> "ray.data.Dataset":
    open_args: dict[str, Any] = {}
    if path.endswith(".gz"):
        open_args = {"compression": "gzip"}
    elif path.endswith(".bz2"):
        open_args = {"compression": "bz2"}
    kwargs: dict[str, Any] = {}
    if open_args:
        kwargs["arrow_open_stream_args"] = open_args
    if parallelism:
        kwargs["override_num_blocks"] = parallelism
    return ray.data.read_text(path, **kwargs)


def read_wikidata_dump(
    path: str,
    qid_tags: dict[str, list[str]] | None = None,
    require_coords: bool = True,
    require_tags: bool = True,
    isa_enrich: bool = True,
    isa_label_langs: frozenset[str] = frozenset({"en"}),
    parallelism: int | None = None,
    force_exchange: bool = False,
) -> "ray.data.Dataset":
    """Wikidata JSON dump → span-document Dataset ready for run_linkage."""
    lines = _read_lines(path, parallelism)
    parsed = lines.map_batches(
        _DumpParser(qid_tags, require_coords, require_tags),
        batch_format="pyarrow",
    )
    if not isa_enrich:
        return parsed.map_batches(_finalize_batch, batch_format="pyarrow")
    parsed = parsed.materialize()  # consumed twice (needed-qids scan + attach)

    # distinct QIDs whose labels/supers the docs need — ontology-sized,
    # not corpus-sized, so driver-collectable under the guard
    needed_ds = parsed.select_columns(["isa_qids", "p131_qids"]).map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "qid": pa.concat_arrays(
                    [
                        b.column("isa_qids").combine_chunks().flatten(),
                        b.column("p131_qids").combine_chunks().flatten(),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
    )
    needed = set(needed_ds.unique("qid"))

    use_exchange = force_exchange or len(needed) > MAX_BROADCAST_QIDS
    if not use_exchange:
        # gather the small label map: filter the dump lines to needed ids
        # (cheap substring pre-check before the full JSON parse)
        needed_ref = ray.put(needed)

        def label_rows(batch: pa.Table) -> pa.Table:
            want: set[str] = ray.get(needed_ref)
            rows = []
            for line in batch.column("text").to_pylist():
                entity = parse_dump_line(line)
                if entity is None or entity.get("id") not in want:
                    continue
                rows.append(entity_label_row(entity, isa_label_langs))
            return pa.Table.from_pylist(
                rows,
                schema=pa.schema(
                    [
                        ("qid", pa.string()),
                        ("labels_json", pa.string()),
                        ("supers", pa.list_(pa.string())),
                    ]
                ),
            )

        label_tbl = _read_lines(path, parallelism).map_batches(
            label_rows, batch_format="pyarrow"
        )
        lookup: dict[str, tuple[dict[str, str], list[str]]] = {}
        total_bytes = 0
        for b in label_tbl.iter_batches(batch_format="pyarrow"):
            for row in b.to_pylist():
                total_bytes += len(row["labels_json"]) + 16 * len(row["supers"])
                lookup[row["qid"]] = (json.loads(row["labels_json"]), row["supers"])
            if total_bytes > MAX_BROADCAST_BYTES:
                use_exchange = True
                break
        if not use_exchange:
            lookup_ref = ray.put(lookup)
            return parsed.map_batches(
                _attach_broadcast,
                fn_kwargs={"lookup_ref": lookup_ref},
                batch_format="pyarrow",
            )

    return _attach_exchange(parsed, path, parallelism, isa_label_langs)


def _attach_exchange(
    parsed: "ray.data.Dataset",
    path: str,
    parallelism: int | None,
    isa_label_langs: frozenset[str],
) -> "ray.data.Dataset":
    """Exchange branch: thin all-entity label table ⨝ per-doc needed QIDs
    by qid, then enrichment spans ⨝ docs by doc_id.  Docs ship once."""
    import pandas as pd

    n_parts = default_partitions()

    def all_label_rows(batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch.column("text").to_pylist():
            entity = parse_dump_line(line)
            if entity is None or not str(entity.get("id", "")).startswith("Q"):
                continue
            r = entity_label_row(entity, isa_label_langs)
            if r["labels_json"] != "{}" or r["supers"]:
                rows.append(
                    {"doc_id": None, "qid": r["qid"], "kind": None,
                     "labels_json": r["labels_json"],
                     "supers_json": json.dumps(sorted(set(r["supers"])))}
                )
        return pa.Table.from_pylist(rows, schema=_EX_SCHEMA)

    def needed_pairs(batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.select(["doc_id", "isa_qids", "p131_qids"]).to_pylist():
            for q in set(row["isa_qids"]):
                rows.append({"doc_id": row["doc_id"], "qid": q, "kind": "isa",
                             "labels_json": None, "supers_json": None})
            for q in set(row["p131_qids"]):
                rows.append({"doc_id": row["doc_id"], "qid": q, "kind": "p131",
                             "labels_json": None, "supers_json": None})
        return pa.Table.from_pylist(rows, schema=_EX_SCHEMA)

    def join_qid_bucket(bucket: pd.DataFrame) -> pa.Table:
        labels = bucket[bucket["doc_id"].isna()]
        by_qid = {
            q: (lj, sj)
            for q, lj, sj in zip(labels["qid"], labels["labels_json"],
                                 labels["supers_json"])
        }
        out = {"doc_id": [], "qid": [], "kind": [], "labels_json": [], "supers_json": []}
        pairs = bucket[bucket["doc_id"].notna()]
        for doc_id, q, kind in zip(pairs["doc_id"], pairs["qid"], pairs["kind"]):
            lj, sj = by_qid.get(q, ("{}", "[]"))
            out["doc_id"].append(doc_id)
            out["qid"].append(q)
            out["kind"].append(kind)
            out["labels_json"].append(lj)
            out["supers_json"].append(sj)
        return pa.Table.from_pydict(out, schema=_EX_SCHEMA)

    enriched_pairs = (
        parsed.map_batches(needed_pairs, batch_format="pyarrow")
        .union(
            _read_lines(path, parallelism).map_batches(
                all_label_rows, batch_format="pyarrow"
            )
        )
        .map_batches(
            lambda b: add_bucket(b, "qid", n_parts * 4), batch_format="pyarrow"
        )
        .groupby("bucket", num_partitions=n_parts)
        .map_groups(join_qid_bucket, batch_format="pandas")
    )

    def docs_for_union(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "qid": pa.nulls(len(batch), pa.string()),
                "kind": pa.nulls(len(batch), pa.string()),
                "labels_json": pa.array(
                    [json.dumps(s) for s in batch.column("spans").to_pylist()]
                ),
                "supers_json": pa.nulls(len(batch), pa.string()),
            },
            schema=_EX_SCHEMA,
        )

    def join_doc_bucket(bucket: pd.DataFrame) -> pa.Table:
        rows = []
        docs = bucket[bucket["qid"].isna()]
        pairs = bucket[bucket["qid"].notna()]
        by_doc: dict[str, dict[str, tuple[dict, list]]] = {}
        isa_by_doc: dict[str, set[str]] = {}
        p131_by_doc: dict[str, set[str]] = {}
        for doc_id, q, kind, lj, sj in zip(
            pairs["doc_id"], pairs["qid"], pairs["kind"],
            pairs["labels_json"], pairs["supers_json"],
        ):
            lookup = by_doc.setdefault(doc_id, {})
            lookup[q] = (json.loads(lj or "{}"), json.loads(sj or "[]"))
            target = isa_by_doc if kind == "isa" else p131_by_doc
            target.setdefault(doc_id, set()).add(q)
        for doc_id, spans_json in zip(docs["doc_id"], docs["labels_json"]):
            spans = json.loads(spans_json)
            lookup = by_doc.get(doc_id, {})
            spans += _enrich_spans(
                sorted(isa_by_doc.get(doc_id, set())),
                sorted(p131_by_doc.get(doc_id, set())),
                lookup,
            )
            rows.append({"doc_id": doc_id, "spans": finalize_spans(spans)})
        return pa.Table.from_pylist(rows, schema=docs_schema())

    return (
        parsed.map_batches(docs_for_union, batch_format="pyarrow")
        .union(enriched_pairs)
        .map_batches(
            lambda b: add_bucket(b, "doc_id", n_parts * 4), batch_format="pyarrow"
        )
        .groupby("bucket", num_partitions=n_parts)
        .map_groups(join_doc_bucket, batch_format="pandas")
    )


_EX_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("qid", pa.string()),
        ("kind", pa.string()),
        ("labels_json", pa.string()),
        ("supers_json", pa.string()),
    ]
)


# ---------------------------------------------------------------------------
# minimal dump writer (fixtures + small exports): the inverse mapping,
# item record → entity JSON, for the fields the reader consumes.


def item_to_entity(item: dict[str, Any]) -> dict[str, Any]:
    """Engine item record → entity JSON (the dump line payload)."""
    labels: dict[str, dict] = {}
    aliases: dict[str, list] = {}
    sitelinks: dict[str, dict] = {}
    claims: dict[str, list] = {}

    def claim(pid: str, value: Any, dtype: str = "string") -> None:
        claims.setdefault(pid, []).append(
            {"mainsnak": {"snaktype": "value", "datavalue": {"value": value, "type": dtype}}}
        )

    for name, sources in (item.get("names") or {}).items():
        for source, lang in sources:
            if source == "label":
                labels[lang or "en"] = {"language": lang or "en", "value": name}
            elif source == "alias":
                aliases.setdefault(lang or "en", []).append(
                    {"language": lang or "en", "value": name}
                )
            elif source == "sitelink":
                sitelinks[lang or "enwiki"] = {"site": lang or "enwiki", "title": name}
            elif source == "commonscat":
                claim("P373", name)
            elif source == "officialname":
                claim("P1448", {"text": name, "language": lang or "en"})
            elif source == "nativelabel":
                claim("P1705", {"text": name, "language": lang or "en"})
            elif source == "image":
                claim("P18", name + ".jpg")
    if item.get("lat") is not None:
        claim(
            "P625",
            {"latitude": item["lat"], "longitude": item["lon"],
             "globe": "http://www.wikidata.org/entity/Q2"},
            "globecoordinate",
        )
    for q in item.get("isa") or []:
        claim("P31", {"entity-type": "item", "id": q, "numeric-id": int(q[1:])},
              "wikibase-entityid")
    for q in item.get("p137") or []:
        claim("P137", {"entity-type": "item", "id": q, "numeric-id": int(q[1:])},
              "wikibase-entityid")
    for q in item.get("p131_qids") or []:
        claim("P131", {"entity-type": "item", "id": q, "numeric-id": int(q[1:])},
              "wikibase-entityid")
    for ref in item.get("nrhp") or []:
        claim("P649", ref)
    for addr in item.get("street_addresses") or []:
        claim("P6375", {"text": addr, "language": "en"})
    for pid, values in (item.get("claims") or {}).items():
        for v in values:
            claim(pid, v)
    return {
        "type": "item",
        "id": item["qid"],
        "labels": labels,
        "aliases": aliases,
        "sitelinks": sitelinks,
        "claims": claims,
    }


def write_dump(entities: list[dict[str, Any]], path: str) -> None:
    """Write entity dicts as a wikidata-style JSON-array dump file.
    Fixture/export helper — single file, driver-side; shard for scale."""
    with open(path, "w") as f:
        f.write("[\n")
        for i, e in enumerate(entities):
            # insertion order keeps "type"/"id" first, like the real dump
            f.write(json.dumps(e))
            f.write(",\n" if i + 1 < len(entities) else "\n")
        f.write("]\n")
