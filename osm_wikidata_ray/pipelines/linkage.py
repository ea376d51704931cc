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
    Parquet — the rest of the pipeline is format-agnostic."""
    if path.endswith(".lance"):
        try:
            return ray.data.read_lance(path, **kwargs)
        except (ImportError, AttributeError) as e:  # lance not installed here
            raise ImportError("pylance is not available in this environment") from e
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


def isa_facet_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """P31 class facet counts (reference isa_facets.py:4-44), computed
    straight from the raw docs' claim spans ("P31\\t<qid>") — vectorized
    flatten + prefix filter per batch, partial counts, tiny groupby.  The
    r2 version decompressed every record payload in per-row Python; the
    spans carry the same P31 list (functions/spans.py:255-256), so no
    payload decode is needed at all."""
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
        claim_mask = pc.and_(
            pc.equal(kind, "claim"), pc.starts_with(text, "P31\t")
        ).to_numpy(zero_copy_only=False)
        keep = claim_mask & wd_rows[parent]
        isa = pc.utf8_slice_codeunits(text.filter(pa.array(keep)), 4)
        vc = pc.value_counts(isa)
        return pa.table(
            {"isa": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())},
            schema=schema,
        )

    return (
        docs.map_batches(explode_isa, batch_format="pyarrow")
        .groupby("isa", num_partitions=8)
        .sum("n")
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


def export_json(result: LinkageResult, path: str) -> None:
    """Debug JSON sink for accepted pairs (reference matcher/export.py:1-103,
    view.py:976-986) — ds.write_json, one file per block."""
    result.accepted.write_json(path)
