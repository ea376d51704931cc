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

from ..util import table_from_pandas

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
    "block_key", "side", "entity_key", "lat", "lon", "max_dist_m", "is_point",
]


def _mix_int64(vals: np.ndarray) -> np.ndarray:
    """Deterministic multiplicative mix of int64 keys (vectorized)."""
    v = vals.astype(np.uint64, copy=False)
    v = (v ^ (v >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    return v ^ (v >> np.uint64(33))


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
    sample_rate: int = 32,
) -> set[str]:
    """Deterministic sampled count pass; returns the (small) hot-key set.

    Salting only needs keys that are thousands of rows hot, so a 1/Nth
    deterministic row sample estimates them with negligible error while
    shuffling N× fewer rows (the result is collected to the driver and
    broadcast).  sample_rate=1 gives exact counts."""

    count_schema = pa.schema([("block_key", pa.string()), ("n", pa.int64())])

    def sample_and_precount(batch: pa.Table) -> pa.Table:
        """Deterministic sample + per-batch partial counts (combiner before
        the shuffle — a hot key collapses to one row per batch)."""
        h = _hash_column(batch.column("block_key")) ^ _mix_int64(
            batch.column("entity_key").to_numpy(zero_copy_only=False)
        )
        mask = pa.array((h % sample_rate) == 0)
        keys = batch.column("block_key").filter(mask)
        partial = pa.table({"block_key": keys}).group_by("block_key").aggregate(
            [("block_key", "count")]
        )
        return pa.table(
            {"block_key": partial.column("block_key"),
             "n": pc.cast(partial.column("block_key_count"), pa.int64())},
            schema=count_schema,
        )

    scaled = max(2, threshold // sample_rate)

    def over_threshold(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("sum(n)"), scaled))

    counts = (
        exploded.map_batches(sample_and_precount, batch_format="pyarrow")
        .groupby("block_key", num_partitions=8)  # sampled partials are tiny
        .sum("n")
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
    keys_int = batch.column("entity_key").to_numpy(zero_copy_only=False)
    shards = _mix_int64(keys_int) % np.uint64(salt_factor)
    k = salt_factor
    out_idx: list[int] = []
    out_keys: list[str] = []
    for i in hot_idx:
        if sides[i] == "osm":
            out_idx.append(i)
            out_keys.append(f"{keys_np[i]}#{shards[i]}")
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


def mix_int_buckets(vals: np.ndarray, n_buckets: int) -> np.ndarray:
    """int64/uint64 keys → int32 bucket ids (multiplicative mix so
    sequential ids spread).  The ONE bucket function for int keys — stages
    that pre-compute a downstream stage's buckets (scoring stage A emits
    per-(osm, qid-bucket) payload rows) must match add_bucket_int exactly."""
    mixed = (vals.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
    return (mixed % n_buckets).astype(np.int32)


def add_bucket_int(batch: pa.Table, column: str, n_buckets: int) -> pa.Table:
    """add_bucket for int64 key columns (cheaper: pure numpy, no string
    hashing); appends `bucket_part` so an existing `bucket` key column is
    left untouched."""
    vals = batch.column(column).to_numpy(zero_copy_only=False)
    return batch.append_column(
        "bucket_part", pa.array(mix_int_buckets(vals, n_buckets))
    )


def thin_exchange_cols(batch: pa.Table, n_buckets: int) -> pa.Table:
    """Swap the string (block_key, side) columns for an int64 key hash and
    a bool side flag right before the blocking exchange: the all-to-all
    ships roughly half the bytes (the exchange is the pipeline's
    bandwidth-bound stage) and the per-bucket factorize runs on int64
    instead of Python strings.  Key identity becomes hash-based — a 64-bit
    collision merges two unrelated keys into one group, which normally only
    ADDS candidate pairs the scorer rejects like any other non-match; the
    one theoretical interaction is emit_pairs_bucket's per-(wd, key)
    nearest-CANDIDATE_LIMIT cap, where colliding rows that gate nearer
    could evict a true candidate — at ~2⁻⁶⁴ per key pair this is a
    documentation note, not a practical recall risk.

    ONE pass: the bucket id reuses the same hash (no second string hash, no
    extra map_batches operator between thinning and bucketing)."""
    kh = _hash_column(batch.column("block_key"))
    mixed = (kh * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
    return pa.table(
        {
            "key_hash": pa.array(kh.view(np.int64), pa.int64()),
            "is_wd": pc.equal(batch.column("side"), "wd"),
            "entity_key": batch.column("entity_key"),
            "lat": batch.column("lat"),
            "lon": batch.column("lon"),
            "max_dist_m": batch.column("max_dist_m"),
            "is_point": batch.column("is_point"),
            "bucket_part": pa.array((mixed % n_buckets).astype(np.int32)),
        }
    )


def emit_pairs_bucket(bucket: pd.DataFrame) -> pa.Table:
    """One hash bucket of block keys → thin pair rows, deduped within the
    bucket.  Fully vectorized: the per-key loop only slices numpy index
    arrays (a pandas frame per key was the pairgen stage's wall at 432k
    docs); ONE haversine + gate over every candidate pair of the bucket.

    Per (wd, key) cap of CANDIDATE_LIMIT nearest (deterministic
    (dist, osm_uid) tie-break); the union-then-cap at the scorer reproduces
    the reference's global `order by dist limit 50` (matcher.py:306)."""
    is_wd = bucket["is_wd"].to_numpy()
    codes, _uniques = pd.factorize(bucket["key_hash"], sort=False)
    # semi-filter: keys present on BOTH sides (vectorized bincount)
    n_keys = codes.max() + 1 if len(codes) else 0
    wd_count = np.bincount(codes[is_wd], minlength=n_keys)
    osm_count = np.bincount(codes[~is_wd], minlength=n_keys)
    live = (wd_count > 0) & (osm_count > 0)
    if not live.any():
        return _EMPTY_PAIRS
    keep = live[codes]
    codes = codes[keep]
    is_wd = is_wd[keep]
    lat = bucket["lat"].to_numpy()[keep]
    lon = bucket["lon"].to_numpy()[keep]
    ids = bucket["entity_key"].to_numpy()[keep]
    max_dist = bucket["max_dist_m"].to_numpy()[keep]
    is_point = bucket["is_point"].to_numpy()[keep]

    # per-key WD/OSM row index lists via one argsort; candidate pairs are
    # gated in bounded flushes (≤ ~4M at a time) so a salted hot key's
    # quadratic cross product never materializes whole in memory
    order = np.lexsort((is_wd, codes))
    codes_s = codes[order]
    is_wd_s = is_wd[order]
    starts = np.flatnonzero(
        np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
    )
    FLUSH = 4_000_000
    wd_chunks: list[np.ndarray] = []
    osm_chunks: list[np.ndarray] = []
    surv_w: list[np.ndarray] = []
    surv_o: list[np.ndarray] = []
    surv_d: list[np.ndarray] = []
    pending = 0

    def flush() -> None:
        nonlocal pending, wd_chunks, osm_chunks
        if not pending:
            return
        wi = np.concatenate(wd_chunks)
        oi = np.concatenate(osm_chunks)
        dists = haversine_m(lat[wi], lon[wi], lat[oi], lon[oi])
        mask = (dists <= max_dist[wi]) | (
            is_point[oi] & (dists <= NEARBY_NODE_M)
        )
        surv_w.append(wi[mask])
        surv_o.append(oi[mask])
        surv_d.append(dists[mask])
        wd_chunks, osm_chunks = [], []
        pending = 0

    LARGE = 65_536  # above this, prefilter the cross product by lat band
    M_PER_DEG = 111_194.9

    for gi, start in enumerate(starts):
        stop = starts[gi + 1] if gi + 1 < len(starts) else len(order)
        seg = order[start:stop]
        wd_split = np.searchsorted(is_wd_s[start:stop], True)
        osm_rows = seg[:wd_split]
        wd_rows = seg[wd_split:]
        w, o = len(wd_rows), len(osm_rows)
        if not w or not o:
            continue
        if w * o > LARGE:
            # hot group (salted "San Jose" shard): the cross product is
            # distance-gated to almost nothing, so prefilter each WD row to
            # the OSM rows within its latitude band — O((w+o)·log o) index
            # work instead of O(w·o) haversines
            lat_order = osm_rows[np.argsort(lat[osm_rows], kind="stable")]
            osm_lat_sorted = lat[lat_order]
            band_deg = (
                np.maximum(max_dist[wd_rows], NEARBY_NODE_M) / M_PER_DEG
            )
            lo_i = np.searchsorted(
                osm_lat_sorted, lat[wd_rows] - band_deg, side="left"
            )
            hi_i = np.searchsorted(
                osm_lat_sorted, lat[wd_rows] + band_deg, side="right"
            )
            for k in range(w):
                cand = lat_order[lo_i[k] : hi_i[k]]
                if not len(cand):
                    continue
                wd_chunks.append(np.full(len(cand), wd_rows[k], dtype=np.int64))
                osm_chunks.append(cand)
                pending += len(cand)
                if pending >= FLUSH:
                    flush()
            continue
        # a single key whose cross product exceeds the flush budget is
        # itself chunked by WD rows
        step = max(1, FLUSH // max(o, 1))
        for ws in range(0, w, step):
            wr = wd_rows[ws : ws + step]
            wd_chunks.append(np.repeat(wr, o))
            osm_chunks.append(np.tile(osm_rows, len(wr)))
            pending += len(wr) * o
            if pending >= FLUSH:
                flush()
    flush()
    if not surv_w:
        return _EMPTY_PAIRS
    wi = np.concatenate(surv_w)
    oi = np.concatenate(surv_o)
    dists = np.concatenate(surv_d)
    if not len(wi):
        return _EMPTY_PAIRS

    # per (wd row = wd entity × key) cap — binding only for hot keys
    counts = np.bincount(wi, minlength=len(codes))
    if (counts > CANDIDATE_LIMIT).any():
        keep_mask = np.ones(len(wi), dtype=bool)
        pair_order = np.argsort(wi, kind="stable")
        bounds = np.flatnonzero(
            np.concatenate([[True], wi[pair_order][1:] != wi[pair_order][:-1]])
        )
        for gi, start in enumerate(bounds):
            stop = bounds[gi + 1] if gi + 1 < len(bounds) else len(pair_order)
            seg = pair_order[start:stop]
            if len(seg) <= CANDIDATE_LIMIT:
                continue
            sub = np.lexsort((ids[oi[seg]], dists[seg]))
            keep_mask[seg[sub[CANDIDATE_LIMIT:]]] = False
        wi, oi, dists = wi[keep_mask], oi[keep_mask], dists[keep_mask]

    out = pd.DataFrame(
        {"qid_key": ids[wi].astype(np.int64), "osm_key": ids[oi].astype(np.int64),
         "dist": dists}
    ).drop_duplicates(["qid_key", "osm_key"], ignore_index=True)
    # a pair discovered under several keys of this bucket is scored once
    return table_from_pandas(out, _PAIR_SCHEMA)


_PAIR_COLUMNS = ["qid_key", "osm_key", "dist"]
_PAIR_SCHEMA = pa.schema(
    [("qid_key", pa.int64()), ("osm_key", pa.int64()), ("dist", pa.float64())]
)
_EMPTY_PAIRS = _PAIR_SCHEMA.empty_table()
