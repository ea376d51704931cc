"""500k-doc stress harness (the BASELINE.md round-4/5 stress runs,
reproducible): replicate each sf0.1 document 100x — replica 0-9 verbatim
(10 identical copies -> 9 true exact dups per group, 45k corpus-wide at
5k source docs), replica 10-99 with a distinct ' mkr<n>' marker token —
then time named queries() entries over the stress directory.

Usage:
    python scripts/stress.py build [--sf /root/testdata/sf0.1] [--out /tmp/stress_sf]
    python scripts/stress.py run dedup_exact dedup_minhash_clusters [--dir /tmp/stress_sf]

Deterministic by construction (replica index drives everything).  The
stress dir carries documents.parquet plus symlinks to the source tables
so sf_dir-shaped queries resolve; doc-table queries are the point here.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

REPS = 100
VERBATIM = 10  # replicas 0..9 keep the source text byte-identical


def build(sf: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    src = pq.read_table(f"{sf}/documents.parquet")
    n = len(src)
    doc_id = src.column("doc_id").to_pylist()
    text = src.column("text").to_pylist()
    lang = src.column("lang").to_pylist()
    source = src.column("source").to_pylist()

    ids, txts, langs, srcs, nchars = [], [], [], [], []
    for i in range(n):
        base = int(doc_id[i])
        for r in range(REPS):
            t = text[i] if r < VERBATIM else f"{text[i]} mkr{base * REPS + r}"
            ids.append(base * REPS + r)
            txts.append(t)
            langs.append(lang[i])
            srcs.append(source[i])
            nchars.append(len(t))
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(txts),
         "lang": pa.array(langs), "source": pa.array(srcs),
         "n_chars": pa.array(nchars, pa.int64())}
    )
    pq.write_table(tbl, f"{out}/documents.parquet")
    for name in ("region nation customer supplier part orders lineitem "
                 "events embeddings").split():
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{sf}/{name}.parquet", dst)
    print(json.dumps({"docs": len(tbl), "out": out}))


def run(names: list[str], stress_dir: str) -> None:
    import ray

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry_mod

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    queries = entry_mod.queries()
    walls = {}
    for name in names:
        t0 = time.time()
        ds = queries[name](stress_dir)
        cnt = ds.count() if hasattr(ds, "count") else len(ds)
        walls[name] = {"sec": round(time.time() - t0, 1), "rows": int(cnt)}
        print(json.dumps({name: walls[name]}), flush=True)
    print(json.dumps({"stress": walls, "dir": stress_dir}))
    ray.shutdown()


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--sf", default="/root/testdata/sf0.1")
    b.add_argument("--out", default="/tmp/stress_sf")
    r = sub.add_parser("run")
    r.add_argument("names", nargs="+")
    r.add_argument("--dir", default="/tmp/stress_sf")
    a = p.parse_args()
    if a.cmd == "build":
        build(a.sf, a.out)
    else:
        run(a.names, a.dir)


if __name__ == "__main__":
    main()
