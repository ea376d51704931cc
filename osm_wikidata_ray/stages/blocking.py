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

# the blocking shuffle is THIN: payloads/doc ids stay out of the key
# explosion and are attached to surviving pairs afterwards (payload ships
# once per record instead of once per (record, key) — the difference between
# ~40 MB and ~1 GB shuffled per 50k docs; see stages/scoring.attach flow)
EXPLODED_COLUMNS = [
    "block_key", "side", "entity_id", "lat", "lon", "max_dist_m", "is_point",
]


def _stable_hash(s: str) -> int:
    """Deterministic across processes (unlike hash(); PYTHONHASHSEED)."""
    return zlib.crc32(s.encode())


def _hash_column(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Vectorized deterministic uint64 hash of an Arrow column (pandas
    siphash with its fixed default key — stable across processes; ~10×
    faster than a per-row crc32 loop, VERDICT r1 hot-path fix)."""
    return pd.util.hash_array(
        col.to_numpy(zero_copy_only=False), categorize=False
    )


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
    exploded: "ray.data.Dataset",
    threshold: int = DEFAULT_HOT_THRESHOLD,
    sample_rate: int = 8,
) -> set[str]:
    """Deterministic sampled count pass; returns the (small) hot-key set.

    Salting only needs keys that are thousands of rows hot, so a 1/Nth
    deterministic row sample estimates them with negligible error while
    shuffling N× fewer rows (the result is collected to the driver and
    broadcast).  sample_rate=1 gives exact counts."""

    def sample(batch: pa.Table) -> pa.Table:
        h = _hash_column(batch.column("block_key")) ^ _hash_column(
            batch.column("entity_id")
        )
        mask = pa.array((h % sample_rate) == 0)
        return pa.table({"block_key": batch.column("block_key").filter(mask)})

    scaled = max(2, threshold // sample_rate)

    def over_threshold(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("count()"), scaled))

    counts = (
        exploded.map_batches(sample, batch_format="pyarrow")
        .groupby("block_key", num_partitions=32)
        .count()
        .map_batches(over_threshold, batch_format="pyarrow")
    )
    return {r["block_key"] for r in counts.take_all()}


def salt_hot_keys(
    batch: pa.Table, hot: set[str], salt_factor: int = DEFAULT_SALT_FACTOR
) -> pa.Table:
    """Hot-key salting (task fn; the hot set is small and ships in the
    closure).  Vectorized split: non-hot rows pass through untouched; hot
    OSM rows get a stable shard suffix; hot WD rows replicate across
    shards."""
    if not hot:
        return batch
    keys_np = batch.column("block_key").to_numpy(zero_copy_only=False)
    hot_mask = np.isin(keys_np, np.array(sorted(hot), dtype=object))
    hot_idx = np.flatnonzero(hot_mask)
    if not len(hot_idx):
        return batch
    cold = batch.take(pa.array(np.flatnonzero(~hot_mask), pa.int64()))

    # hot rows are a tiny fraction by construction — only they take the
    # per-row string path; the full-batch membership test is vectorized
    sides = batch.column("side").to_numpy(zero_copy_only=False)
    ids = batch.column("entity_id").to_numpy(zero_copy_only=False)
    k = salt_factor
    out_idx: list[int] = []
    out_keys: list[str] = []
    for i in hot_idx:
        if sides[i] == "osm":
            out_idx.append(i)
            out_keys.append(f"{keys_np[i]}#{_stable_hash(ids[i]) % k}")
        else:
            for shard in range(k):
                out_idx.append(i)
                out_keys.append(f"{keys_np[i]}#{shard}")
    hot_part = batch.take(pa.array(out_idx, pa.int64()))
    hot_part = hot_part.set_column(
        hot_part.schema.get_field_index("block_key"), "block_key",
        pa.array(out_keys),
    )
    return pa.concat_tables([cold, hot_part])


def add_bucket(batch: pa.Table, column: str, n_buckets: int) -> pa.Table:
    """Stable hash-bucket column — lets group processing run per *bucket*
    (P invocations) instead of per group (per-group map_groups overhead
    dominated the shuffle stages; see bench notes).  All rows of one key
    land in one bucket, so semantics match a per-key groupby.  Vectorized
    (one hash_array call per batch — this sits on every shuffled row of the
    flagship pipeline)."""
    buckets = pa.array(
        (_hash_column(batch.column(column)) % n_buckets).astype(np.int32)
    )
    return batch.append_column("bucket", buckets)


def add_bucket_int(batch: pa.Table, column: str, n_buckets: int) -> pa.Table:
    """add_bucket for int64 key columns (cheaper: pure numpy, no string
    hashing); appends `bucket_part` so an existing `bucket` key column is
    left untouched."""
    vals = batch.column(column).to_numpy(zero_copy_only=False).astype(np.uint64)
    # multiplicative mix so sequential ids spread across buckets
    mixed = (vals * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
    buckets = pa.array((mixed % n_buckets).astype(np.int32))
    return batch.append_column("bucket_part", buckets)


def emit_pairs_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
    """One hash bucket of block keys → thin pair rows, deduped within the
    bucket (pandas groupby inside).

    Most keys exist on only one side and can never pair — a vectorized
    semi-filter drops them before the per-key loop (typically ~90% of
    groups)."""
    is_wd = bucket["side"].to_numpy() == "wd"
    keys = bucket["block_key"]
    both = set(keys[is_wd].unique()) & set(keys[~is_wd].unique())
    if not both:
        return _EMPTY_PAIRS.copy()
    bucket = bucket[keys.isin(both)]
    outs = [
        _emit_pairs_for_key(g)
        for _, g in bucket.groupby("block_key", sort=False)
    ]
    outs = [o for o in outs if o is not None and len(o)]
    if not outs:
        return _EMPTY_PAIRS.copy()
    pairs = pd.concat(outs, ignore_index=True)
    # a pair discovered under several keys of this bucket is scored once
    return pairs.drop_duplicates(["qid", "osm_uid"], ignore_index=True)


def _emit_pairs_for_key(group: pd.DataFrame) -> pd.DataFrame | None:
    """Within one block-key group: WD×OSM pairing under the distance gate.

    Vectorized haversine per WD row; per (wd, key) cap of CANDIDATE_LIMIT
    nearest (the union-then-cap at the scorer reproduces the reference's
    global `order by dist limit 50`, matcher.py:306 — see stages/scoring).
    """
    side = group["side"].to_numpy()
    wd_mask = side == "wd"
    if not wd_mask.any() or wd_mask.all():
        return None
    lat = group["lat"].to_numpy()
    lon = group["lon"].to_numpy()
    ids = group["entity_id"].to_numpy()
    max_dist = group["max_dist_m"].to_numpy()
    is_point = group["is_point"].to_numpy()

    osm_lat, osm_lon = lat[~wd_mask], lon[~wd_mask]
    osm_ids = ids[~wd_mask]
    osm_is_point = is_point[~wd_mask]

    out: dict[str, list] = {c: [] for c in _PAIR_COLUMNS}
    for i in np.flatnonzero(wd_mask):
        dists = haversine_m(lat[i], lon[i], osm_lat, osm_lon)
        mask = (dists <= max_dist[i]) | (osm_is_point & (dists <= NEARBY_NODE_M))
        if not mask.any():
            continue
        idx = np.flatnonzero(mask)
        if len(idx) > CANDIDATE_LIMIT:
            # tie-break equal distances by osm_uid so the cap boundary is
            # shuffle-order independent (determinism invariant; matches the
            # (dist, osm_uid) ordering used in ScorerReducer.score_item)
            order = np.lexsort((osm_ids[idx], dists[idx]))[:CANDIDATE_LIMIT]
            idx = idx[order]
        for j in idx:
            out["qid"].append(ids[i])
            out["osm_uid"].append(osm_ids[j])
            out["dist"].append(float(dists[j]))
    return pd.DataFrame(out)


_PAIR_COLUMNS = ["qid", "osm_uid", "dist"]
_EMPTY_PAIRS = pd.DataFrame({c: pd.Series(dtype="float64" if c == "dist" else "object") for c in _PAIR_COLUMNS})
