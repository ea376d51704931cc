"""Command-line entry points.

The engine-side equivalents of the reference's Flask CLI
(cli.py run_matcher / place_match): run the linkage pipeline over a document
table and write partitioned outputs, generate a synthetic corpus, or verify
the span invariant on an output run.

    python -m osm_wikidata_ray.cli synth --n-docs 10000 --out /tmp/docs.parquet
    python -m osm_wikidata_ray.cli run --input /tmp/docs.parquet --output /tmp/out
    python -m osm_wikidata_ray.cli verify --input /tmp/docs.parquet --output /tmp/out

This module owns its Ray session (guarded init); library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    if hasattr(ctx, "use_polars_sort"):  # faster string-key sort shuffles
        ctx.use_polars_sort = True


def cmd_synth(args: argparse.Namespace) -> None:
    from .sources.synth import write_corpus_parquet

    gold = args.out.replace(".parquet", ".gold.parquet") if args.gold else None
    n_docs, n_gold = write_corpus_parquet(args.out, gold, args.n_docs, args.seed)
    print(json.dumps({"docs": n_docs, "gold": n_gold, "out": args.out}))


def cmd_run(args: argparse.Namespace) -> None:
    _ensure_ray()
    from .pipelines.linkage import read_docs, run_linkage

    docs = read_docs(args.input)
    res = run_linkage(
        docs,
        checkpoint_dir=args.output,
        with_clusters=not args.no_clusters,
        hot_key_threshold=args.hot_key_threshold,
        salt_factor=args.salt_factor,
    )
    summary = {
        "candidates": res.candidates.count(),
        "accepted": res.accepted.count(),
        "clusters": res.clusters.count() if res.clusters is not None else None,
        "hot_keys": len(res.hot_keys),
        "output": args.output,
    }
    print(json.dumps(summary))
    import ray

    ray.shutdown()


def verify_run(input_path: str, output_dir: str) -> tuple[int, int]:
    """Distributed span-invariant verification of a completed run: returns
    (n_source_docs, n_checksum_mismatches).

    Distributed (VERDICT r4 item 4): source checksums and the two
    candidate-carried claim streams co-partition on a doc_id hash-bucket
    exchange; each bucket anti-joins its claims against its slice of the
    source table and emits ONE count row.  The driver sums a ≤n_buckets
    table — it never materializes a checksum dict or iterates candidate
    rows (the old shape held every checksum in a driver dict, a driver
    materialization at 100× scale).  Requires an initialized Ray session
    (cmd_verify owns it; tests use the conftest session)."""
    import pandas as pd
    import pyarrow as pa

    from .pipelines.linkage import read_docs, verify_spans
    from .stages.blocking import add_bucket
    from .util import default_partitions, read_parquet_clean

    n_parts = default_partitions()
    tagged = pa.schema(
        [("doc_id", pa.string()), ("checksum", pa.string()),
         ("is_src", pa.bool_())]
    )

    def tag_src(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.string()),
             "checksum": batch.column("span_checksum").cast(pa.string()),
             "is_src": pa.array([True] * n, pa.bool_())},
            schema=tagged,
        )

    def tag_claims(batch: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [batch.column("wd_doc_id").cast(pa.string()).combine_chunks(),
             batch.column("osm_doc_id").cast(pa.string()).combine_chunks()]
        )
        cks = pa.concat_arrays(
            [batch.column("wd_checksum").cast(pa.string()).combine_chunks(),
             batch.column("osm_checksum").cast(pa.string()).combine_chunks()]
        )
        return pa.table(
            {"doc_id": ids, "checksum": cks,
             "is_src": pa.array([False] * len(ids), pa.bool_())},
            schema=tagged,
        )

    src = verify_spans(read_docs(input_path)).map_batches(
        tag_src, batch_format="pyarrow"
    )
    claims = (
        read_parquet_clean(f"{output_dir}/candidates")
        .select_columns(
            ["wd_doc_id", "wd_checksum", "osm_doc_id", "osm_checksum"]
        )
        .map_batches(tag_claims, batch_format="pyarrow")
    )

    def bucket_counts(group: pd.DataFrame) -> pd.DataFrame:
        # one frame per BUCKET (repo bucket pattern), pure pandas merge:
        # a claim mismatches when its doc is absent from the source slice
        # or carries a different checksum.
        srcs = group[group["is_src"]]
        cl = group[~group["is_src"]]
        merged = cl.merge(
            srcs[["doc_id", "checksum"]].rename(columns={"checksum": "want"}),
            on="doc_id",
            how="left",
        )
        bad = int((merged["want"] != merged["checksum"]).sum())
        return pd.DataFrame({"docs": [len(srcs)], "mismatches": [bad]})

    totals = (
        src.union(claims)
        .map_batches(
            lambda b: add_bucket(b, "doc_id", n_parts),
            batch_format="pyarrow",
        )
        .groupby("bucket", num_partitions=n_parts)
        .map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()  # ≤ n_parts rows
    )
    return int(totals["docs"].sum()), int(totals["mismatches"].sum())


def cmd_verify(args: argparse.Namespace) -> None:
    """CLI wrapper for verify_run — JSON summary + exit-code contract."""
    _ensure_ray()
    import ray

    n_docs, bad = verify_run(args.input, args.output)
    print(json.dumps({"docs": n_docs, "mismatches": bad, "ok": bad == 0}))
    ray.shutdown()
    sys.exit(0 if bad == 0 else 1)


def cmd_match_one(args: argparse.Namespace) -> None:
    """Score a single item against its blocked candidates (the reference's
    individual_match, cli.py:377-396 → matcher.run_individual_match
    matcher.py:1138-1146; also the /api/1/item/Q… single-item flow,
    api_view.py:36-106 — both run the scorer DB-free on one item, which is
    exactly the single-process oracle path here)."""
    import pyarrow.parquet as pq

    from .rules.reduce import choose_single_candidate, score_item_candidates
    from .rules.ruleset import RuleSet
    from .sources.oracle import candidate_rows_for_items, decode_corpus

    t = pq.read_table(args.input)
    docs = t.to_pylist()
    items, objs = decode_corpus(docs)
    item = next((i for i in items if i["qid"] == args.qid), None)
    if item is None:
        print(json.dumps({"qid": args.qid, "error": "item not found"}))
        sys.exit(1)
    rows = candidate_rows_for_items([item], objs)[args.qid]
    cands = score_item_candidates(item, rows, RuleSet())
    chosen, note = (None, "no candidates")
    if cands:
        chosen, note = choose_single_candidate(item, cands)
    print(
        json.dumps(
            {
                "qid": args.qid,
                "candidates": [
                    {
                        "osm_type": c["osm_type"],
                        "osm_id": c["osm_id"],
                        "dist_m": round(c["dist"], 1),
                        "identifier_match": bool(c["identifier_match"]),
                        "name_match_keys": sorted(c["name_match"].keys()),
                        "matching_tags": sorted(c["matching_tags"]),
                    }
                    for c in cands
                ],
                "chosen": (
                    f"{chosen['osm_type']}/{chosen['osm_id']}" if chosen else None
                ),
                "note": note,
            },
            ensure_ascii=False,
        )
    )


def main() -> None:
    parser = argparse.ArgumentParser(prog="osm_wikidata_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synth", help="generate a deterministic synthetic corpus")
    p.add_argument("--n-docs", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", required=True)
    p.add_argument("--gold", action="store_true", help="also write gold pairs")
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("run", help="run the linkage pipeline")
    p.add_argument("--input", required=True, help="doc table (parquet or lance)")
    p.add_argument("--output", required=True, help="checkpoint/output dir")
    p.add_argument("--no-clusters", action="store_true")
    p.add_argument("--hot-key-threshold", type=int, default=5000)
    p.add_argument("--salt-factor", type=int, default=16)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("verify", help="verify span invariant of a run")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.set_defaults(fn=cmd_verify)

    p = sub.add_parser(
        "match-one", help="score one item against its candidates (no Ray)"
    )
    p.add_argument("--input", required=True, help="doc table (parquet)")
    p.add_argument("--qid", required=True)
    p.set_defaults(fn=cmd_match_one)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
