"""Blocking stage: key explosion, hot-key salting, within-block pairing.

Replaces the reference's spatial-SQL candidate generation (ST_DWithin +
hstore GIN index, matcher/matcher.py:281-308) with an equi-join on blocking
keys (SURVEY.md §2.4): explode each parsed record to (block_key, …) rows,
hash-shuffle by key, and pair WD×OSM within each group under the geodesic
distance gate.

Skew handling ("San Jose" problem): a cheap column-pruned count pass finds
keys hotter than `hot_threshold`; OSM rows of a hot key are salted into
`salt_factor` shards and WD rows replicated across shards, so no group
exceeds ~group_size/salt_factor (reference's analogue: SPARQL quad-split on
timeout, job_queue.py:570-618; candidate cap 50/item, matcher.py:306).
"""

from __future__ import annotations

import zlib
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..geo import haversine_m
from ..rules.reduce import CANDIDATE_LIMIT

NEARBY_NODE_M = 10.0  # nearby-node radius, matcher.py:241
DEFAULT_HOT_THRESHOLD = 5_000
DEFAULT_SALT_FACTOR = 16

EXPLODED_COLUMNS = [
    "block_key", "side", "entity_id", "lat", "lon",
    "max_dist_m", "is_point", "payload", "doc_id", "span_checksum",
]


def _stable_hash(s: str) -> int:
    """Deterministic across processes (unlike hash(); PYTHONHASHSEED)."""
    return zlib.crc32(s.encode())


def explode_keys(batch: pa.Table) -> pa.Table:
    """One row per (record, block_key) — zero-copy friendly list flatten."""
    n_keys = pc.list_value_length(batch.column("block_keys"))
    flat_keys = pc.list_flatten(batch.column("block_keys"))
    idx = np.repeat(np.arange(len(batch)), n_keys.to_numpy(zero_copy_only=False))
    out = {"block_key": flat_keys}
    for col in EXPLODED_COLUMNS[1:]:
        out[col] = batch.column(col).take(pa.array(idx))
    return pa.Table.from_pydict(out)


def detect_hot_keys(
    exploded: "ray.data.Dataset", threshold: int = DEFAULT_HOT_THRESHOLD
) -> set[str]:
    """Column-pruned count pass; returns the (small) set of hot keys.

    groupby().count() does map-side partial aggregation, so only per-block
    partial counts shuffle; the final filter result is tiny and safe to
    collect on the driver for broadcast.
    """
    counts = (
        exploded.select_columns(["block_key"])
        .groupby("block_key", num_partitions=64)
        .count()
        .filter(lambda row: row["count()"] >= threshold)
    )
    return {r["block_key"] for r in counts.take_all()}


class Salter:
    """Hot-key salting map_batches actor: state = broadcast hot-key set."""

    def __init__(self, hot_keys_ref: Any, salt_factor: int = DEFAULT_SALT_FACTOR):
        self.hot = (
            ray.get(hot_keys_ref)
            if isinstance(hot_keys_ref, ray.ObjectRef)
            else set(hot_keys_ref)
        )
        self.salt_factor = salt_factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.hot:
            return batch
        keys = batch.column("block_key").to_pylist()
        hot_mask = [k in self.hot for k in keys]
        if not any(hot_mask):
            return batch
        sides = batch.column("side").to_pylist()
        ids = batch.column("entity_id").to_pylist()
        k = self.salt_factor

        keep_idx: list[int] = []
        new_keys: list[str] = []
        for i, (key, is_hot) in enumerate(zip(keys, hot_mask)):
            if not is_hot:
                keep_idx.append(i)
                new_keys.append(key)
            elif sides[i] == "osm":
                shard = _stable_hash(ids[i]) % k
                keep_idx.append(i)
                new_keys.append(f"{key}#{shard}")
            else:  # wd side: replicate across all shards
                for shard in range(k):
                    keep_idx.append(i)
                    new_keys.append(f"{key}#{shard}")

        taken = batch.take(pa.array(keep_idx))
        return taken.set_column(
            taken.schema.get_field_index("block_key"), "block_key", pa.array(new_keys)
        )


def add_bucket(batch: pa.Table, column: str, n_buckets: int) -> pa.Table:
    """Stable hash-bucket column — lets group processing run per *bucket*
    (P invocations) instead of per group (per-group map_groups overhead
    dominated the shuffle stages; see bench notes).  All rows of one key
    land in one bucket, so semantics match a per-key groupby."""
    vals = batch.column(column).to_pylist()
    buckets = pa.array([zlib.crc32(v.encode()) % n_buckets for v in vals], pa.int32())
    return batch.append_column("bucket", buckets)


def emit_pairs_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
    """One hash bucket of block keys → pair rows (pandas groupby inside)."""
    outs = [
        _emit_pairs_for_key(g)
        for _, g in bucket.groupby("block_key", sort=False)
    ]
    outs = [o for o in outs if o is not None and len(o)]
    return pd.concat(outs, ignore_index=True) if outs else _EMPTY_PAIRS.copy()


def _emit_pairs_for_key(group: pd.DataFrame) -> pd.DataFrame | None:
    """Within one block-key group: WD×OSM pairing under the distance gate.

    Vectorized haversine per WD row; per (wd, key) cap of CANDIDATE_LIMIT
    nearest (the union-then-cap at the scorer reproduces the reference's
    global `order by dist limit 50`, matcher.py:306 — see stages/scoring).
    """
    wd = group[group["side"] == "wd"]
    osm = group[group["side"] == "osm"]
    if wd.empty or osm.empty:
        return None

    osm_lat = osm["lat"].to_numpy()
    osm_lon = osm["lon"].to_numpy()
    osm_ids = osm["entity_id"].to_numpy()
    osm_payloads = osm["payload"].to_numpy()
    osm_is_point = osm["is_point"].to_numpy()
    osm_doc_ids = osm["doc_id"].to_numpy()
    osm_checksums = osm["span_checksum"].to_numpy()

    out: dict[str, list] = {c: [] for c in _PAIR_COLUMNS}
    for _, w in wd.iterrows():
        dists = haversine_m(w["lat"], w["lon"], osm_lat, osm_lon)
        mask = (dists <= w["max_dist_m"]) | (osm_is_point & (dists <= NEARBY_NODE_M))
        if not mask.any():
            continue
        idx = np.flatnonzero(mask)
        if len(idx) > CANDIDATE_LIMIT:
            order = np.argsort(dists[idx], kind="stable")[:CANDIDATE_LIMIT]
            idx = idx[order]
        for j in idx:
            out["qid"].append(w["entity_id"])
            out["osm_uid"].append(osm_ids[j])
            out["dist"].append(float(dists[j]))
            out["wd_payload"].append(w["payload"])
            out["osm_payload"].append(osm_payloads[j])
            out["wd_doc_id"].append(w["doc_id"])
            out["wd_checksum"].append(w["span_checksum"])
            out["osm_doc_id"].append(osm_doc_ids[j])
            out["osm_checksum"].append(osm_checksums[j])
    return pd.DataFrame(out)


_PAIR_COLUMNS = [
    "qid", "osm_uid", "dist", "wd_payload", "osm_payload",
    "wd_doc_id", "wd_checksum", "osm_doc_id", "osm_checksum",
]
_EMPTY_PAIRS = pd.DataFrame({c: pd.Series(dtype="float64" if c == "dist" else "object") for c in _PAIR_COLUMNS})
