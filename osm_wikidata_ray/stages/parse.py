"""Doc-parse stage: span documents → unified parsed records.

`parse_docs` is a stateless map_batches UDF (batch_format="pyarrow") that
turns each document's span sequence into one record row carrying:

  side          "wd" | "osm"
  entity_id     "Q42" | "node/123"
  lat, lon      float64 (NaN when the doc has no location)
  max_dist_m    per-type candidate radius (wd; reference matcher.py:285)
  is_point      OSM object lives in the point table (nearby-node rule)
  block_keys    list<string> blocking keys (functions/keys.py)
  payload       JSON of the parsed record (consumed by the scorer)
  doc_id        source document id
  span_checksum sha256 over (kind, text, media_ref, order) — the per-row
                invariant carried to the sink (BASELINE.md)

Documents with no side marker (pure noise) are dropped here — the checksum
verification path reads them separately (pipelines/linkage.verify_spans).
"""

from __future__ import annotations

import json
import math
import zlib
from typing import Any

import pyarrow as pa

from ..functions.keys import osm_block_keys, wd_block_keys
from ..functions.spans import decode_doc, span_checksum
from ..rules.tags import DEFAULT_MAX_DIST_KM, get_max_dist_from_criteria

RECORD_SCHEMA = pa.schema(
    [
        ("side", pa.string()),
        ("entity_id", pa.string()),
        ("entity_key", pa.int64()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("max_dist_m", pa.float64()),
        ("is_point", pa.bool_()),
        ("block_keys", pa.list_(pa.string())),
        ("payload", pa.binary()),
        ("doc_id", pa.string()),
        ("span_checksum", pa.string()),
    ]
)

# int64 entity keys keep the blocking/attach shuffles numeric (string keys
# cost ~2× the bytes and hash slower).  WD: plain QID number.  OSM:
# type_code<<56 | osm_id with codes in ALPHABETICAL order so (dist, key)
# tie-breaks order node < relation < way like the oracle's
# (dist, osm_type, osm_id).  Bit 62 marks a non-numeric-qid hash fallback.
_OSM_TYPE_CODE = {"node": 1, "relation": 2, "way": 3}


def wd_entity_key(qid: str) -> int:
    num = qid[1:]
    if num.isdigit():
        return int(num)
    # non-numeric entity-id fallback: 61-bit siphash (pd.util.hash_array,
    # fixed key) under the bit-62 marker — the r2 crc32<<16 form had only
    # 32 bits of entropy, enough for birthday collisions between distinct
    # ids at scale (ADVICE r2)
    import numpy as np
    import pandas as pd

    h = int(pd.util.hash_array(np.array([qid], dtype=object))[0])
    return (1 << 62) | (h & ((1 << 61) - 1))


def osm_entity_key(osm_type: str, osm_id: int) -> int:
    return (_OSM_TYPE_CODE.get(osm_type, 0) << 56) | (int(osm_id) & ((1 << 56) - 1))


def parse_docs(batch: pa.Table) -> pa.Table:
    """Stateless per-batch parser (SURVEY.md §7.1 step 2)."""
    out: dict[str, list[Any]] = {name: [] for name in RECORD_SCHEMA.names}
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()

    for doc_id, spans in zip(doc_ids, spans_col):
        rec = decode_doc(doc_id, spans)
        if rec is None:
            continue
        checksum = span_checksum(spans)
        if rec["side"] == "wd":
            item = rec["item"]
            keys = wd_block_keys(item)
            max_dist_m = (
                get_max_dist_from_criteria(item.get("tags") or [])
                or DEFAULT_MAX_DIST_KM
            ) * 1000.0
            out["side"].append("wd")
            out["entity_id"].append(item["qid"])
            out["entity_key"].append(wd_entity_key(item["qid"]))
            out["lat"].append(item["lat"] if item["lat"] is not None else math.nan)
            out["lon"].append(item["lon"] if item["lon"] is not None else math.nan)
            out["max_dist_m"].append(max_dist_m)
            out["is_point"].append(False)
            out["block_keys"].append(keys)
            out["payload"].append(zlib.compress(json.dumps(item, ensure_ascii=False).encode(), 1))
        else:
            obj = rec["obj"]
            keys = osm_block_keys(obj["tags"], obj["lat"], obj["lon"], obj["planet_table"])
            out["side"].append("osm")
            out["entity_id"].append(f"{obj['osm_type']}/{obj['osm_id']}")
            out["entity_key"].append(osm_entity_key(obj["osm_type"], obj["osm_id"]))
            out["lat"].append(obj["lat"] if obj["lat"] is not None else math.nan)
            out["lon"].append(obj["lon"] if obj["lon"] is not None else math.nan)
            out["max_dist_m"].append(0.0)
            out["is_point"].append(obj["planet_table"] == "point")
            out["block_keys"].append(keys)
            out["payload"].append(zlib.compress(json.dumps(obj, ensure_ascii=False).encode(), 1))
        out["doc_id"].append(doc_id)
        out["span_checksum"].append(checksum)

    return pa.Table.from_pydict(out, schema=RECORD_SCHEMA)


def checksum_docs(batch: pa.Table) -> pa.Table:
    """doc_id → span checksum for ALL docs (invariant verification sink)."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    return pa.Table.from_pydict(
        {
            "doc_id": doc_ids,
            "span_checksum": [span_checksum(s) for s in spans_col],
            "n_spans": [len(s) for s in spans_col],
        }
    )
