"""Scoring stage: payload attachment + per-item candidate scoring.

The blocking shuffle is thin (qid_key, osm_key, dist — int64 keys, see
stages/parse entity keys); payloads attach to the surviving pairs
afterwards so each record's payload crosses the wire once:

  stage A  union(thin pairs ⊎ OSM records) hash-bucketed by osm_key →
           per-bucket pandas merge; emits THIN pairs plus one OSM payload
           row per distinct (osm_key, target qid-bucket) — NOT per pair
  stage B  union(stage-A rows ⊎ WD records) grouped by the qid bucket →
           ScorerReducer re-joins pairs to their OSM payloads in-bucket
           and scores each item group (rule tables compiled once per
           worker process; SURVEY.md §2.3)

Stage A pre-computes stage B's bucket ids (blocking.mix_int_buckets —
the same function add_bucket_int applies to the pair/WD rows) so an OSM
payload ships once per bucket it is needed in.  Measured at 432k docs:
pairs outnumber distinct (osm, bucket) combinations 3.8×, and the
per-pair payload+checksum+doc_id columns were 206 MB of the stage-B
exchange vs 55 MB deduplicated — the sort is bandwidth-bound, so the
thin rewrite cuts the stage's all-to-all roughly 2.5×.

Both stages reuse the bucketed-groupby pattern (blocking.add_bucket_int).
"""

from __future__ import annotations

import json
import math
import zlib
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..util import table_from_pandas

from ..rules.reduce import (
    CANDIDATE_LIMIT,
    choose_single_candidate,
    score_item_candidates,
)
from ..rules.ruleset import RuleSet
from .blocking import add_bucket_int, mix_int_buckets

CANDIDATE_COLUMNS = [
    "qid", "osm_type", "osm_id", "dist",
    "identifier_match", "address_match", "name_match", "matching_tags",
    "osm_langs", "chosen", "note", "already_tagged",
    "wd_doc_id", "wd_checksum", "osm_doc_id", "osm_checksum",
]

_REC_COLUMNS = ["entity_key", "payload", "doc_id", "span_checksum"]


def collect_place_polygon_index(records: "ray.data.Dataset") -> "ray.ObjectRef":
    """Broadcastable within-polygon index for §2.4 #38 (rules/within.py;
    reference get_within_names, matcher.py:582-599).

    One streaming decode pass over the OSM records emits the place/tourism
    polygon rows; the result is the reference's per-place polygon table —
    villages, suburbs, parks — a tiny fraction of the corpus, so it is
    collected once and broadcast via ``ray.put`` (each scorer worker reads
    it from shared memory; no extra shuffle).  Only runs when the
    ``hunt_for_more_place_names`` flag is on.
    """
    from ..rules.within import collect_place_polygons

    def to_poly_rows(batch: pa.Table) -> pa.Table:
        objs = [
            json.loads(zlib.decompress(p))
            for p in batch.column("payload").to_pylist()
        ]
        polys = collect_place_polygons(objs)
        return pa.table(
            {
                "lat": pa.array([p["lat"] for p in polys], pa.float64()),
                "lon": pa.array([p["lon"] for p in polys], pa.float64()),
                "radius_m": pa.array([p["radius_m"] for p in polys], pa.float64()),
                "osm_type": pa.array([p["osm_type"] for p in polys], pa.string()),
                "osm_id": pa.array([p["osm_id"] for p in polys], pa.int64()),
                "names": pa.array(
                    [sorted(p["names"]) for p in polys], pa.list_(pa.string())
                ),
            }
        )

    rows = (
        records.filter(expr="side == 'osm'")
        .select_columns(["payload"])
        .map_batches(to_poly_rows, batch_format="pyarrow")
        .take_all()
    )
    polys = [
        {
            "lat": r["lat"],
            "lon": r["lon"],
            "radius_m": r["radius_m"],
            "osm_type": r["osm_type"],
            "osm_id": r["osm_id"],
            "names": set(r["names"]),
        }
        for r in rows
    ]
    # deterministic order (take_all block order is stable but be explicit)
    polys.sort(key=lambda p: (p["osm_type"], p["osm_id"]))
    return ray.put(polys)


def _pairs_for_osm_union(batch: pa.Table) -> pa.Table:
    n = len(batch)
    return pa.table(
        {
            "join_key": batch.column("osm_key"),
            "kind": pa.array(["p"] * n),
            "qid_key": batch.column("qid_key"),
            "dist": batch.column("dist"),
            "payload": pa.array([b""] * n, pa.binary()),
            "doc_id": pa.array([""] * n),
            "span_checksum": pa.array([""] * n),
        }
    )


def _recs_for_union(batch: pa.Table) -> pa.Table:
    n = len(batch)
    return pa.table(
        {
            "join_key": batch.column("entity_key"),
            "kind": pa.array(["r"] * n),
            "qid_key": pa.array([0] * n, pa.int64()),
            "dist": pa.array([math.nan] * n, pa.float64()),
            "payload": batch.column("payload"),
            "doc_id": batch.column("doc_id"),
            "span_checksum": batch.column("span_checksum"),
        }
    )


# stage-A output = stage-B-ready rows: "p" pairs stay THIN, "o" rows carry
# each OSM payload once per stage-B bucket that needs it, "r" rows (added
# in stage B) carry WD payloads once per record.  bucket_part is stage B's
# group key, pre-computed for "o" rows from the pair qids they serve.
_STAGE_B_SCHEMA = pa.schema(
    [
        ("bucket_part", pa.int32()),
        ("kind", pa.string()),
        ("join_key", pa.int64()),      # p: qid_key · r: entity_key · o: 0
        ("osm_key", pa.int64()),       # p/o
        ("dist", pa.float64()),
        ("osm_payload", pa.binary()),  # o only
        ("osm_doc_id", pa.string()),
        ("osm_checksum", pa.string()),
        ("payload", pa.binary()),      # r only
        ("doc_id", pa.string()),
        ("span_checksum", pa.string()),
    ]
)


def _attach_osm_bucket(bucket: pd.DataFrame, n_score_buckets: int) -> pa.Table:
    recs = bucket.loc[bucket["kind"] == "r"].drop_duplicates("join_key")
    pairs = bucket.loc[bucket["kind"] == "p"]
    pairs = pairs.loc[pairs["join_key"].isin(recs["join_key"])]
    n = len(pairs)
    score_bucket = mix_int_buckets(
        pairs["qid_key"].to_numpy(np.int64, copy=False), n_score_buckets
    )
    # one payload row per (osm_key, stage-B bucket) a pair needs it in
    need = pd.DataFrame(
        {"join_key": pairs["join_key"].to_numpy(), "bucket_part": score_bucket}
    ).drop_duplicates()
    orows = need.merge(
        recs[["join_key", "payload", "doc_id", "span_checksum"]], on="join_key"
    )
    n_o = len(orows)
    out = {
        "bucket_part": np.concatenate(
            [score_bucket, orows["bucket_part"].to_numpy(np.int32)]
        ),
        "kind": ["p"] * n + ["o"] * n_o,
        "join_key": np.concatenate(
            [pairs["qid_key"].to_numpy(np.int64), np.zeros(n_o, np.int64)]
        ),
        "osm_key": np.concatenate(
            [pairs["join_key"].to_numpy(np.int64), orows["join_key"].to_numpy(np.int64)]
        ),
        "dist": np.concatenate(
            [pairs["dist"].to_numpy(np.float64), np.full(n_o, math.nan)]
        ),
        "osm_payload": [b""] * n + list(orows["payload"]),
        "osm_doc_id": [""] * n + list(orows["doc_id"]),
        "osm_checksum": [""] * n + list(orows["span_checksum"]),
        "payload": [b""] * (n + n_o),
        "doc_id": [""] * (n + n_o),
        "span_checksum": [""] * (n + n_o),
    }
    return pa.Table.from_pydict(out, schema=_STAGE_B_SCHEMA)


def attach_osm_payloads(
    pairs: "ray.data.Dataset",
    records: "ray.data.Dataset",
    n_parts: int,
) -> "ray.data.Dataset":
    """Thin pairs + OSM records → stage-B rows (stage A): pairs stay thin,
    payloads dedup to one row per (osm record, stage-B bucket)."""
    osm_recs = records.filter(expr="side == 'osm'").select_columns(_REC_COLUMNS)
    unioned = pairs.map_batches(_pairs_for_osm_union, batch_format="pyarrow").union(
        osm_recs.map_batches(_recs_for_union, batch_format="pyarrow")
    )
    return (
        unioned.map_batches(
            lambda b: add_bucket_int(b, "join_key", n_parts * 8),
            batch_format="pyarrow",
        )
        .repartition(n_parts * 2)  # coalesce tiny union blocks before the sort
        .groupby("bucket_part", num_partitions=n_parts * 2)
        .map_groups(
            _attach_osm_bucket,
            fn_kwargs={"n_score_buckets": n_parts * 8},
            batch_format="pandas",
        )
    )


def _wd_recs_for_union(batch: pa.Table, n_score_buckets: int) -> pa.Table:
    n = len(batch)
    entity_keys = batch.column("entity_key").to_numpy(zero_copy_only=False)
    return pa.Table.from_pydict(
        {
            "bucket_part": mix_int_buckets(entity_keys, n_score_buckets),
            "kind": ["r"] * n,
            "join_key": batch.column("entity_key"),
            "osm_key": np.zeros(n, np.int64),
            "dist": np.full(n, math.nan),
            "osm_payload": [b""] * n,
            "osm_doc_id": [""] * n,
            "osm_checksum": [""] * n,
            "payload": batch.column("payload"),
            "doc_id": batch.column("doc_id"),
            "span_checksum": batch.column("span_checksum"),
        },
        schema=_STAGE_B_SCHEMA,
    )


class ScorerReducer:
    """Stage-B scorer: one hash bucket of qids per call; WD payloads arrive
    as 'r' rows of the same bucket.  Rule tables compile once per process
    (the reference loads them as per-process globals,
    matcher.py:50-63,112-116) — state is ~1 MB and 5 ms warm, so the stage
    runs as tasks with a process-cached instance (scorer_task below) rather
    than a dedicated actor pool; heavy-state stages (e.g. media decode)
    keep the actor-pool pattern."""

    def __init__(
        self,
        ruleset_kwargs: dict[str, Any] | None = None,
        keep_rejects: bool = False,
        want_isa: set[str] | frozenset[str] | None = None,
        within_polygons: list[dict[str, Any]] | None = None,
    ) -> None:
        self.ruleset = RuleSet(**(ruleset_kwargs or {}))
        self.keep_rejects = keep_rejects
        self.want_isa = set(want_isa) if want_isa else None
        # broadcast place-polygon index (§2.4 #38) — names computed once
        # per unique OSM payload (the obj_cache) below
        self.within_polygons = within_polygons

    def __call__(self, bucket: pd.DataFrame) -> pd.DataFrame:
        recs = bucket.loc[bucket["kind"] == "r"].drop_duplicates("join_key")
        pairs = bucket.loc[bucket["kind"] == "p"]
        if pairs.empty or recs.empty:
            return _empty_candidates()
        wd_lookup = {
            r.join_key: (r.payload, r.doc_id, r.span_checksum)
            for r in recs.itertuples()
        }
        # pairs arrive THIN; their OSM payloads ride as one "o" row per
        # (osm record, bucket) and re-join here by exact osm_key
        orows = bucket.loc[bucket["kind"] == "o"]
        osm_lookup = {
            r.osm_key: (r.osm_payload, r.osm_doc_id, r.osm_checksum)
            for r in orows.itertuples()
        }
        # ONE output accumulator for the whole bucket (a DataFrame per item
        # plus a concat was ~½ the stage wall at 144k docs); per-item slices
        # are plain numpy views, no per-item pandas objects
        out: dict[str, list] = {c: [] for c in CANDIDATE_COLUMNS}
        obj_cache: dict[bytes, dict] = {}  # decode each OSM payload once
        qids = pairs["join_key"].to_numpy()
        dists = pairs["dist"].to_numpy()
        uids = pairs["osm_key"].to_numpy()
        order = np.lexsort((uids, dists, qids))
        boundaries = np.flatnonzero(
            np.concatenate([[True], qids[order][1:] != qids[order][:-1]])
        )
        for gi, start in enumerate(boundaries):
            stop = (
                boundaries[gi + 1] if gi + 1 < len(boundaries) else len(order)
            )
            sel = order[start:stop]
            wd = wd_lookup.get(qids[sel[0]])
            if wd is None:
                continue
            self.score_item(
                wd, dists[sel], uids[sel], osm_lookup, out, obj_cache,
            )
        df = pd.DataFrame(out) if out["qid"] else _empty_candidates()
        if len(df):
            df["address_match"] = pd.array(
                out["address_match"], dtype="boolean"
            )
        return df

    def score_item(
        self,
        wd: tuple[Any, str, str],
        dists: np.ndarray,
        uids: np.ndarray,
        osm_lookup: dict[int, tuple[bytes, str, str]],
        out: dict[str, list],
        obj_cache: dict[bytes, dict],
    ) -> None:
        wd_payload, wd_doc_id, wd_checksum = wd
        item = json.loads(zlib.decompress(wd_payload))

        # rows arrive sorted by (dist, osm_uid); dedupe pairs found under
        # multiple keys and take the global top-50 by distance — the
        # reference's `order by dist limit 50`
        osm_rows = []
        provenance: dict[str, tuple[str, str]] = {}
        seen: set[str] = set()
        for k in range(len(dists)):
            uid = uids[k]
            if uid in seen:
                continue
            seen.add(uid)
            osm_rec = osm_lookup.get(uid)
            if osm_rec is None:  # payload row missing — record had no doc
                continue
            payload, doc_id_k, check_k = osm_rec
            obj = obj_cache.get(payload)
            if obj is None:
                obj = json.loads(zlib.decompress(payload))
                if self.within_polygons is not None:
                    from ..rules.within import within_place_names

                    obj["within_names"] = sorted(
                        within_place_names(obj, self.within_polygons)
                    )
                obj = obj_cache.setdefault(payload, obj)
            obj = dict(obj)
            obj["dist"] = float(dists[k])
            osm_rows.append(obj)
            provenance[f"{obj['osm_type']}/{obj['osm_id']}"] = (
                doc_id_k, check_k
            )
            if len(osm_rows) >= CANDIDATE_LIMIT:
                break

        reject_sink: list[dict[str, Any]] | None = [] if self.keep_rejects else None
        candidates = score_item_candidates(
            item, osm_rows, self.ruleset, rejects=reject_sink,
            want_isa=self.want_isa,
        )
        chosen, note = (None, "")
        if candidates:
            chosen, note = choose_single_candidate(item, candidates)

        for c in candidates:
            uid = f"{c['osm_type']}/{c['osm_id']}"
            osm_doc_id, osm_checksum = provenance[uid]
            is_chosen = chosen is not None and uid == (
                f"{chosen['osm_type']}/{chosen['osm_id']}"
            )
            out["qid"].append(item["qid"])
            out["osm_type"].append(c["osm_type"])
            out["osm_id"].append(int(c["osm_id"]))
            out["dist"].append(float(c["dist"]))
            out["identifier_match"].append(bool(c["identifier_match"]))
            out["address_match"].append(c["address_match"])  # tri-state
            out["name_match"].append(json.dumps(c["name_match"], ensure_ascii=False))
            out["matching_tags"].append(json.dumps(sorted(c["matching_tags"])))
            # candidate languages = name:xx tag keys (model.py:1243-1244)
            out["osm_langs"].append(json.dumps(sorted(
                k[5:] for k in c["tags"] if k.startswith("name:")
            )))
            out["chosen"].append(is_chosen)
            out["note"].append("" if is_chosen else note)
            out["already_tagged"].append("wikidata" in c["tags"])
            out["wd_doc_id"].append(wd_doc_id)
            out["wd_checksum"].append(wd_checksum)
            out["osm_doc_id"].append(osm_doc_id)
            out["osm_checksum"].append(osm_checksum)
        for r in reject_sink or []:
            uid = f"{r['osm_type']}/{r['osm_id']}"
            osm_doc_id, osm_checksum = provenance.get(uid, ("", ""))
            out["qid"].append(item["qid"])
            out["osm_type"].append(r["osm_type"])
            out["osm_id"].append(int(r["osm_id"]))
            out["dist"].append(float(r["dist"]))
            out["identifier_match"].append(False)
            out["address_match"].append(None)
            out["name_match"].append("{}")
            out["matching_tags"].append("[]")
            out["osm_langs"].append("[]")
            out["chosen"].append(False)
            out["note"].append("reject: " + r["reject"])
            out["already_tagged"].append(False)
            out["wd_doc_id"].append(wd_doc_id)
            out["wd_checksum"].append(wd_checksum)
            out["osm_doc_id"].append(osm_doc_id)
            out["osm_checksum"].append(osm_checksum)


_scorer_cache: dict[tuple, ScorerReducer] = {}


def scorer_task(
    bucket: pd.DataFrame,
    ruleset_kwargs: dict | None = None,
    keep_rejects: bool = False,
    want_isa: frozenset[str] | None = None,
    within_ref: "ray.ObjectRef | None" = None,
) -> pd.DataFrame:
    """Task-form scorer with a per-worker-process cached ScorerReducer.

    Returns a metadata-free Arrow table (not the reducer's pandas frame):
    candidate blocks feed further shuffles (clustering, caps, facets), and
    Ray's pandas→arrow block conversion would re-attach the unhashable
    pandas schema metadata ("Failed to hash the schemas" in every reduce)."""
    key = (
        tuple(sorted((ruleset_kwargs or {}).items())),
        keep_rejects, want_isa, within_ref,
    )
    scorer = _scorer_cache.get(key)
    if scorer is None:
        # ray.get on a broadcast ref is a local shared-memory read after
        # the first task on each node (standard ray.put broadcast pattern)
        within = ray.get(within_ref) if within_ref is not None else None
        scorer = _scorer_cache.setdefault(
            key,
            ScorerReducer(ruleset_kwargs, keep_rejects=keep_rejects,
                          want_isa=want_isa, within_polygons=within),
        )
    return table_from_pandas(scorer(bucket), _CANDIDATES_SCHEMA)


def score_attached_pairs(
    attached: "ray.data.Dataset",
    records: "ray.data.Dataset",
    n_parts: int,
    scorer_concurrency: int | tuple[int, int] | None,
    ruleset_kwargs: dict[str, Any] | None,
    keep_rejects: bool = False,
    want_isa: set[str] | None = None,
    within_ref: "ray.ObjectRef | None" = None,
) -> "ray.data.Dataset":
    """Stage B: attach WD payloads and score (process-cached task state).

    Stage-A rows arrive with ``bucket_part`` pre-computed (thin pairs +
    per-bucket OSM payload rows); only the WD records need bucketing here,
    with the same mix function, so the payload-carrying exchange is as
    thin as the data allows."""
    wd_recs = records.filter(expr="side == 'wd'").select_columns(_REC_COLUMNS)
    unioned = attached.union(
        wd_recs.map_batches(
            _wd_recs_for_union,
            fn_kwargs={"n_score_buckets": n_parts * 8},
            batch_format="pyarrow",
        )
    )
    return (
        unioned
        .repartition(n_parts * 2)  # coalesce tiny union blocks before the sort
        .groupby("bucket_part", num_partitions=n_parts * 2)
        .map_groups(
            scorer_task,
            fn_kwargs={
                "ruleset_kwargs": ruleset_kwargs,
                "keep_rejects": keep_rejects,
                "want_isa": frozenset(want_isa) if want_isa else None,
                "within_ref": within_ref,
            },
            batch_format="pandas",
        )
    )


def _empty_candidates() -> pd.DataFrame:
    dtypes = {
        "qid": "object", "osm_type": "object", "osm_id": "int64",
        "dist": "float64", "identifier_match": "bool", "address_match": "boolean",
        "name_match": "object", "matching_tags": "object", "osm_langs": "object",
        "chosen": "bool", "note": "object", "already_tagged": "bool",
        "wd_doc_id": "object", "wd_checksum": "object",
        "osm_doc_id": "object", "osm_checksum": "object",
    }
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in dtypes.items()})


_CANDIDATES_SCHEMA = pa.schema(
    [
        ("qid", pa.string()), ("osm_type", pa.string()), ("osm_id", pa.int64()),
        ("dist", pa.float64()), ("identifier_match", pa.bool_()),
        ("address_match", pa.bool_()), ("name_match", pa.string()),
        ("matching_tags", pa.string()), ("osm_langs", pa.string()),
        ("chosen", pa.bool_()), ("note", pa.string()),
        ("already_tagged", pa.bool_()),
        ("wd_doc_id", pa.string()), ("wd_checksum", pa.string()),
        ("osm_doc_id", pa.string()), ("osm_checksum", pa.string()),
    ]
)
