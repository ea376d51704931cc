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


def cmd_verify(args: argparse.Namespace) -> None:
    """Re-verify the span-sequence invariant for a completed run."""
    _ensure_ray()
    import ray

    from .pipelines.linkage import read_docs, verify_spans

    source = {
        r["doc_id"]: r["span_checksum"]
        for r in verify_spans(read_docs(args.input)).iter_rows()
    }
    from .util import read_parquet_clean

    cands = read_parquet_clean(f"{args.output}/candidates")
    bad = 0
    for r in cands.select_columns(
        ["wd_doc_id", "wd_checksum", "osm_doc_id", "osm_checksum"]
    ).iter_rows():
        if source.get(r["wd_doc_id"]) != r["wd_checksum"]:
            bad += 1
        if source.get(r["osm_doc_id"]) != r["osm_checksum"]:
            bad += 1
    print(json.dumps({"docs": len(source), "mismatches": bad, "ok": bad == 0}))
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
