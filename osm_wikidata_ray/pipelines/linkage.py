"""The flagship record-linkage pipeline (doc table → clusters).

    docs ─ map_batches(parse_docs)            parse + blocking keys + checksums
         ─ map_batches(explode_keys)          THIN key explosion (no payloads)
         ─ [sampled count → salt_hot_keys]    skew handling ("San Jose")
         ─ bucketed groupby(block_key)        pair generation (shuffle 1)
         ─ union ⊎ OSM records → bucketed     payload attach (shuffle 2) —
           groupby(osm id)                    payloads ship once per record
         ─ union ⊎ WD records → bucketed      scoring (shuffle 3): full rule
           groupby(qid) → scorer              cascade, per-item reduction,
                                              process-cached rule tables
         ─ count + broadcast conflict set     1:1 gate (no extra shuffle)
         ─ clusters                           closed-form for 1:1 pairs;
                                              general min-label propagation
                                              (connected_components) on demand

All stages are streaming Dataset transforms; optional per-stage checkpoints
(state/lineage.Checkpoints) give per-partition lineage and resume.  Never
calls ray.init() — the caller owns the Ray session (driver contract).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import ray

from ..stages import blocking, clustering, parse, scoring
from ..util import default_partitions, read_parquet_clean
from ..state.lineage import Checkpoints


@dataclass
class LinkageResult:
    candidates: "ray.data.Dataset"
    resolved: "ray.data.Dataset"
    accepted: "ray.data.Dataset"
    clusters: "ray.data.Dataset | None" = None
    hot_keys: set[str] = field(default_factory=set)


def read_docs(path: str, **kwargs: Any) -> "ray.data.Dataset":
    """Read the doc table.  Lance when available (north-rule input), else
    Parquet — the rest of the pipeline is format-agnostic.  Offline dump
    formats are first-class inputs too: ``.osm.pbf`` routes through the
    blob-parallel PBF reader and ``.json(.gz/.bz2)`` through the Wikidata
    JSON-dump reader (sources/osm_pbf.py, sources/wikidata_dump.py), both
    ending in the same span-document schema."""
    if path.endswith(".lance"):
        try:
            return ray.data.read_lance(path, **kwargs)
        except (ImportError, AttributeError) as e:  # lance not installed here
            raise ImportError("pylance is not available in this environment") from e
    if path.endswith(".pbf"):
        from ..sources.osm_pbf import pbf_to_docs

        return pbf_to_docs(path, **kwargs)
    if path.endswith((".json", ".json.gz", ".json.bz2")):
        from ..sources.wikidata_dump import read_wikidata_dump

        return read_wikidata_dump(path, **kwargs)
    return read_parquet_clean(path, **kwargs)


def run_linkage(
    docs: "ray.data.Dataset",
    *,
    checkpoint_dir: str | None = None,
    hot_key_threshold: int = blocking.DEFAULT_HOT_THRESHOLD,
    salt_factor: int = blocking.DEFAULT_SALT_FACTOR,
    scorer_concurrency: int | tuple[int, int] = (1, 8),
    with_clusters: bool = True,
    general_clustering: bool = False,
    keep_rejects: bool = False,
    ruleset_kwargs: dict[str, Any] | None = None,
    want_isa: set[str] | None = None,
    bad_qids: set[str] | None = None,
    fuse_shuffles: bool = False,
) -> LinkageResult:
    """Assemble the full linkage pipeline over a docs Dataset.

    Large-scale mode: pass ``checkpoint_dir``.  The checkpointed path spills
    each stage to partitioned Parquet instead of pinning the parsed corpus
    in the object store (the default in-memory path materializes between
    all-to-all stages — fine up to ~memory×spill, but at 100 TB the Parquet
    spill with per-partition resume is the recommended configuration; it is
    also what the CLI uses)."""
    ckpt = Checkpoints(checkpoint_dir)

    # parsed records (with payloads) are consumed by three downstream paths
    # (key explosion, OSM payload attach, WD payload attach) — checkpoint or
    # pin once; payloads never enter the blocking shuffle
    records = ckpt.run(
        "records",
        lambda: docs.map_batches(parse.parse_docs, batch_format="pyarrow"),
    )
    if checkpoint_dir is None:
        records = records.materialize()

    exploded = records.select_columns(
        ["block_keys", *blocking.EXPLODED_COLUMNS[1:]]
    ).map_batches(blocking.explode_keys, batch_format="pyarrow")
    if checkpoint_dir is None and not fuse_shuffles:
        exploded = exploded.materialize()

    # within-polygon place names (§2.4 #38): when the flag is on, build the
    # small place-polygon index once and broadcast it to the scorer tasks
    within_ref = None
    if (ruleset_kwargs or {}).get("hunt_for_more_place_names"):
        within_ref = scoring.collect_place_polygon_index(records)

    hot = blocking.detect_hot_keys(exploded, hot_key_threshold)
    if hot:
        exploded = exploded.map_batches(
            blocking.salt_hot_keys,
            fn_kwargs={"hot": hot, "salt_factor": salt_factor},
            batch_format="pyarrow",
        )

    def build_candidates() -> "ray.data.Dataset":
        # bucketed grouping: hash keys into ~4×CPU buckets and run the
        # per-key loops inside each bucket (pandas groupby) — same shuffle
        # semantics as groupby(key), ~100× fewer group-function invocations
        n_parts = default_partitions()
        thin_pairs = (
            exploded.map_batches(
                blocking.thin_exchange_cols,
                fn_kwargs={"n_buckets": n_parts * 8},
                batch_format="pyarrow",
            )
            .groupby("bucket_part", num_partitions=n_parts * 2)
            .map_groups(blocking.emit_pairs_bucket, batch_format="pandas")
        )
        # shuffle stages are barriers; materializing between them keeps the
        # streaming executor from interleaving two all-to-all exchanges
        # (pair tables are small relative to the input).  fuse_shuffles=True
        # skips the barriers — measured SLOWER on Ray 2.49 even with polars
        # sort (12k: 9.5 s fused vs 7.3 s barriered; 144k: 15.7 vs 13.4),
        # kept as the knob to re-test on newer Ray
        if checkpoint_dir is None and not fuse_shuffles:
            thin_pairs = thin_pairs.materialize()
        attached = scoring.attach_osm_payloads(thin_pairs, records, n_parts)
        if checkpoint_dir is None and not fuse_shuffles:
            attached = attached.materialize()
        return scoring.score_attached_pairs(
            attached, records, n_parts, scorer_concurrency, ruleset_kwargs,
            keep_rejects=keep_rejects, want_isa=want_isa,
            within_ref=within_ref,
        )

    candidates = ckpt.run("candidates", build_candidates)
    if checkpoint_dir is None:
        # multiple consumers below — pin to the object store so the lazy DAG
        # doesn't re-execute per consumer (spillable; candidates ≪ input)
        candidates = candidates.materialize()

    resolved = ckpt.run(
        "resolved",
        lambda: clustering.resolve_conflicts(candidates, bad_qids=bad_qids),
    )
    if checkpoint_dir is None:
        resolved = resolved.materialize()
    accepted = clustering.accepted_pairs(resolved)

    clusters = None
    if with_clusters:
        # 1:1-gated pairs are disjoint → closed-form clusters; the iterative
        # union-find runs only when a general pair graph is requested
        builder = (
            clustering.connected_components
            if general_clustering
            else clustering.clusters_from_disjoint_pairs
        )
        clusters = ckpt.run("clusters", lambda: builder(accepted))

    return LinkageResult(
        candidates=candidates,
        resolved=resolved,
        accepted=accepted,
        clusters=clusters,
        hot_keys=hot,
    )


def verify_spans(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Span-sequence invariant table: doc_id → checksum for every doc.

    Re-computing this at the sink and comparing with the checksums carried
    through parse→pairs proves (kind, text, media_ref, order) equality
    end-to-end (BASELINE.md per-row invariant)."""
    return docs.map_batches(parse.checksum_docs, batch_format="pyarrow")


def language_counts(
    docs: "ray.data.Dataset",
    country_code: str | None = None,
    top: int = 10,
):
    """Wikidata-side language counts (reference languages_wikidata,
    place.py:1078-1115): per-item label-language sets; {ceb,sv}-only items
    skipped unless country is se/fi; per-language, hyphenated variants and
    ceb are never counted; above 10 items the sub-10% tail is cut (en always
    kept); us/gb country allowlists; top-`top` by count.

    Partial counts in the map, tiny groupby, then the cuts run driver-side
    on the (≤ a few hundred rows) language table — returns a small pandas
    DataFrame, deterministic tie-break (count desc, lang asc)."""
    import pandas as pd
    import pyarrow as pa

    count_sv = country_code in {"se", "fi"}
    schema = pa.schema([("lang", pa.string()), ("n", pa.int64())])

    def count_langs(batch: pa.Table) -> pa.Table:
        # vectorized over the flattened span structs: one list_flatten +
        # split + two pandas groupbys per batch, no per-row Python (this
        # runs over every doc)
        import numpy as np
        import pyarrow.compute as pc

        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans).to_numpy()
        flat = spans.flatten()
        kind = flat.field("kind")
        text = flat.field("text")

        side_mask = pc.equal(kind, "side").to_numpy(zero_copy_only=False)
        wd_rows = np.zeros(len(batch), dtype=bool)
        wd_rows[parent[side_mask]] = (
            pc.equal(text, "wd").to_numpy(zero_copy_only=False)[side_mask]
        )
        n_items = int(wd_rows.sum())

        name_mask = pc.equal(kind, "name").to_numpy(zero_copy_only=False)
        nm_text = text.filter(pa.array(name_mask))
        parts = pc.split_pattern(nm_text, "\t", max_splits=2)
        df = pd.DataFrame(
            {
                "row": parent[name_mask],
                "source": pc.list_element(parts, 0).to_numpy(zero_copy_only=False),
                "lang": pc.list_element(parts, 1).to_numpy(zero_copy_only=False),
            }
        )
        df = df[(df["source"] == "label") & (df["lang"] != "") & wd_rows[df["row"]]]
        df = df.drop_duplicates(["row", "lang"])  # label_langs is a SET
        if not count_sv:  # skip items whose lang set == {ceb, sv}, place.py:1085-1088
            uniq = df.groupby("row")["lang"].nunique()
            cebsv = (
                df[df["lang"].isin(["ceb", "sv"])].groupby("row")["lang"].nunique()
            )
            skip = uniq.index[(uniq == 2) & (cebsv.reindex(uniq.index, fill_value=0) == 2)]
            df = df[~df["row"].isin(skip)]
        df = df[~df["lang"].str.contains("-") & (df["lang"] != "ceb")]  # place.py:1090-1092
        counts = df.groupby("lang").size()
        return pa.table(
            {"lang": [*counts.index, "\x00items"],  # item-count sentinel
             "n": pa.array([*counts.to_numpy(), n_items], pa.int64())},
            schema=schema,
        )

    agg = (
        docs.map_batches(count_langs, batch_format="pyarrow")
        .groupby("lang", num_partitions=8)
        .sum("n")
        .to_pandas()
    )
    agg = agg.rename(columns={"sum(n)": "n"})
    item_count = int(agg.loc[agg["lang"] == "\x00items", "n"].sum())
    agg = agg[agg["lang"] != "\x00items"]
    if item_count > 10:  # tail cut, place.py:1095-1101
        agg = agg[(agg["lang"] == "en") | (agg["n"] / item_count > 0.1)]
    if country_code == "us":  # place.py:1103-1106
        agg = agg[agg["lang"].isin(["en", "es"])]
    if country_code == "gb":  # place.py:1108-1113
        agg = agg[agg["lang"].isin(["en", "fr", "de", "cy"])]
    agg = agg.sort_values(["n", "lang"], ascending=[False, True]).head(top)
    return agg.reset_index(drop=True)


def osm_language_counts(candidates: "ray.data.Dataset") -> "ray.data.Dataset":
    """OSM-side language counts over candidate rows: name:xx tag keys of
    every stored candidate (reference languages_osm place.py:1061-1076,
    ItemCandidate.languages model.py:1243-1244).  The scorer already emits
    the languages as a JSON column — no payload re-decode needed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = pa.schema([("lang", pa.string()), ("n", pa.int64())])

    def count_langs(batch: pa.Table) -> pa.Table:
        # osm_langs is json.dumps of a sorted list of OSM name:xx suffixes
        # (alnum + dashes), so a strip + split parses it vectorized — no
        # per-row json.loads
        keep = pc.invert(pc.starts_with(batch.column("note"), "reject: "))
        langs_json = pc.filter(batch.column("osm_langs"), keep)
        stripped = pc.replace_substring_regex(langs_json, r'[\[\]" ]', "")
        flat = pc.list_flatten(pc.split_pattern(stripped, ","))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table(
            {"lang": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())},
            schema=schema,
        )

    return (
        candidates.map_batches(count_langs, batch_format="pyarrow")
        .groupby("lang", num_partitions=8)
        .sum("n")
    )


def isa_facet_counts(
    docs: "ray.data.Dataset", min_count: int = 4
) -> "ray.data.Dataset":
    """ISA facet counts (reference isa_facets.py:4-44): each item's P31
    classes count once, and each class's P279 super-classes count once per
    item occurrence (the reference walks isa.entity['claims']['P279'];
    the doc corpus denormalizes those as "P279\\t<child>\\t<super>" spans,
    functions/spans.py encode_wd_doc).  Facets under ``min_count`` are cut,
    as in the reference (label/description resolution is a display concern
    left to the caller — the corpus carries item labels, not class labels).
    Vectorized flatten + prefix filters per batch, partial counts, tiny
    groupby, final threshold filter."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = pa.schema([("isa", pa.string()), ("n", pa.int64())])

    def explode_isa(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans).to_numpy()
        flat = spans.flatten()
        kind = flat.field("kind")
        text = flat.field("text")

        side_mask = pc.equal(kind, "side").to_numpy(zero_copy_only=False)
        wd_rows = np.zeros(len(batch), dtype=bool)
        wd_rows[parent[side_mask]] = (
            pc.equal(text, "wd").to_numpy(zero_copy_only=False)[side_mask]
        )
        is_claim = pc.equal(kind, "claim").to_numpy(zero_copy_only=False)
        p31_mask = (
            pc.starts_with(text, "P31\t").to_numpy(zero_copy_only=False)
            & is_claim & wd_rows[parent]
        )
        p279_mask = (
            pc.starts_with(text, "P279\t").to_numpy(zero_copy_only=False)
            & is_claim & wd_rows[parent]
        )
        p31 = pc.utf8_slice_codeunits(text.filter(pa.array(p31_mask)), 4)
        # "P279\t<child>\t<super>" → super (count once per item occurrence)
        supers = pc.replace_substring_regex(
            text.filter(pa.array(p279_mask)), r"^P279\t[^\t]*\t", ""
        )
        vc = pc.value_counts(pa.concat_arrays(
            [p31.combine_chunks() if isinstance(p31, pa.ChunkedArray) else p31,
             supers.combine_chunks() if isinstance(supers, pa.ChunkedArray)
             else supers]
        ))
        return pa.table(
            {"isa": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())},
            schema=schema,
        )

    return (
        docs.map_batches(explode_isa, batch_format="pyarrow")
        .groupby("isa", num_partitions=8)
        .sum("n")
        .map_batches(
            lambda b: b.filter(
                pc.greater_equal(b.column("sum(n)"), min_count)
            ),
            batch_format="pyarrow",
        )
    )


def match_ratio(result: LinkageResult) -> dict[str, float]:
    """candidate_count / item_count metrics (reference place.py:522-528,
    1239-1241) — small aggregates over pipeline outputs."""
    n_items = result.candidates.select_columns(["qid"]).unique("qid")
    accepted = result.accepted.count()
    candidates = result.candidates.count()
    items = len(n_items)
    return {
        "item_count": items,
        "candidate_count": candidates,
        "accepted_count": accepted,
        "match_ratio": accepted / items if items else 0.0,
    }


def export_json(
    result: LinkageResult, path: str, docs: "ray.data.Dataset | None" = None
) -> None:
    """Reference-shaped JSON export (matcher/export.py:1-103,
    view.py:976-986): ``place.json`` carries the run-level summary (the
    engine analog of the reference's place record — item/candidate/accepted
    counts, match ratio, isa facet list) and ``items/`` holds one JSON
    object PER ITEM with its candidates nested (candidate_fields
    export.py:51-62 minus the raw-OSM display fields name/tags/planet_table/
    src_id, which live in doc payloads, not the candidate view) plus the
    item's isa list when ``docs`` is passed (export.py:95-100).

    Scale shape: items/ is written with write_json — streaming, one file
    per block, never one giant file; nesting happens in a qid-bucketed
    groupby (bucket pattern), and the per-item isa rows ride the same
    exchange as thin (qid, isa) strings.  Only place.json is driver-built,
    from already-tiny aggregates."""
    import json
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    cand_fields = [
        "osm_type", "osm_id", "dist", "identifier_match", "address_match",
        "name_match", "matching_tags", "chosen", "note", "already_tagged",
    ]
    cand_struct = pa.struct(
        [("osm_type", pa.string()), ("osm_id", pa.int64()),
         ("dist", pa.float64()), ("identifier_match", pa.bool_()),
         ("address_match", pa.string()), ("name_match", pa.string()),
         ("matching_tags", pa.string()), ("chosen", pa.bool_()),
         ("note", pa.string()), ("already_tagged", pa.bool_())]
    )
    item_schema = pa.schema(
        [("qid", pa.string()), ("isa", pa.list_(pa.string())),
         ("candidates", pa.list_(cand_struct))]
    )

    union_schema = pa.schema(
        [("qid", pa.string()), ("kind", pa.string()), ("isa", pa.string()),
         *[(f"c_{f}", cand_struct.field(f).type) for f in cand_fields]]
    )

    def tag_cand(batch: pa.Table) -> pa.Table:
        cols = {
            "qid": pc.cast(batch.column("qid"), pa.string()),
            "kind": pa.array(["c"] * len(batch)),
            "isa": pa.nulls(len(batch), pa.string()),
        }
        for f in cand_fields:
            cols[f"c_{f}"] = pc.cast(batch.column(f), cand_struct.field(f).type)
        return pa.table({n: cols[n] for n in union_schema.names}, schema=union_schema)

    def tag_isa(batch: pa.Table) -> pa.Table:
        # thin (qid, isa) rows from the WD docs' P31 claim spans
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans).to_numpy()
        flat = spans.flatten()
        text = flat.field("text")
        keep = pc.and_(
            pc.equal(flat.field("kind"), "claim"), pc.starts_with(text, "P31\t")
        ).to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[parent[keep]]
        # wd doc ids are "wd-Q%09d" (functions/spans.py encode_wd_doc)
        qids = np.array(["Q" + d.split("-Q", 1)[1].lstrip("0") for d in ids],
                        dtype=object)
        isa = pc.utf8_slice_codeunits(text.filter(pa.array(keep)), 4)
        n = len(isa)
        cols = {
            "qid": pa.array(qids, pa.string()),
            "kind": pa.array(["i"] * n),
            "isa": isa,
        }
        for f in cand_fields:
            cols[f"c_{f}"] = pa.nulls(n, cand_struct.field(f).type)
        return pa.table({nm: cols[nm] for nm in union_schema.names},
                        schema=union_schema)

    def nest(bucket: pd.DataFrame) -> pa.Table:
        items = []
        # nulls from the union give c_* columns widened dtypes (int64 →
        # float64, bool → object); pin them back on the candidate subframe
        pin = {"c_osm_id": "int64", "c_dist": "float64",
               "c_identifier_match": "bool", "c_chosen": "bool",
               "c_already_tagged": "bool"}
        for qid, g in bucket.groupby("qid", sort=False):
            c = g[g["kind"] == "c"]
            if c.empty:  # isa rows for items with no stored candidates
                continue
            c = c.astype(pin).sort_values(["c_dist", "c_osm_id"])
            cands = [
                {f: row[f"c_{f}"] for f in cand_fields}
                for row in c.to_dict("records")
            ]
            isa = sorted(set(g.loc[g["kind"] == "i", "isa"].dropna()))
            items.append({"qid": qid, "isa": isa, "candidates": cands})
        if not items:
            return item_schema.empty_table()
        return pa.Table.from_pylist(items, schema=item_schema)

    unioned = result.candidates.map_batches(tag_cand, batch_format="pyarrow")
    if docs is not None:
        # only WD docs carry P31 claim spans, so no side prefilter is needed
        unioned = unioned.union(docs.map_batches(tag_isa, batch_format="pyarrow"))

    n_parts = default_partitions()
    items_ds = (
        unioned.map_batches(
            lambda b: blocking.add_bucket(b, "qid", n_parts * 4),
            batch_format="pyarrow",
        )
        .groupby("bucket", num_partitions=n_parts)
        .map_groups(nest, batch_format="pandas")
    )
    os.makedirs(path, exist_ok=True)
    items_ds.write_json(os.path.join(path, "items"))

    place = match_ratio(result)
    facets = isa_facet_counts(docs, min_count=1) if docs is not None else None
    place["isa_facets"] = (
        [{"qid": r["isa"], "count": int(r["sum(n)"])}
         for r in sorted(facets.take_all(), key=lambda r: r["isa"])]
        if facets is not None else []
    )
    with open(os.path.join(path, "place.json"), "w") as f:
        json.dump({"place": place}, f, indent=1, sort_keys=True)
