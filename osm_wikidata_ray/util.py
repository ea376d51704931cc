"""Shared Ray-side helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def read_parquet_clean(
    path: str, columns: "list[str] | None" = None, **kwargs
) -> "ray.data.Dataset":
    """ray.data.read_parquet with the pandas schema metadata stripped at the
    source.  Driver-written parquet carries a ``pandas`` metadata dict that
    Ray's block-schema hashing cannot hash ("Failed to hash the schemas:
    unhashable type 'dict'"), which also breaks schema unification for empty
    shuffle partitions.  Passing an explicit metadata-free schema is free
    (no extra stage) and makes every downstream block schema hashable."""
    import glob
    import os

    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not files:
            return ray.data.read_parquet(path, columns=columns, **kwargs)
        probe = files[0]
    schema = pq.read_schema(probe).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return ray.data.read_parquet(path, schema=schema, columns=columns, **kwargs)


def default_partitions(lo: int = 8, hi: int = 64) -> int:
    """Shuffle partition count sized to the cluster (groupby default
    over-partitions small clusters; see bench notes)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, min(hi, cpus))


def list_column_to_matrix(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Zero-copy-ish list<float> column → (n, dim) float32 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, len(flat) // n) if n else flat.reshape(0, 0)


def table_from_pandas(df, schema: "pa.Schema") -> "pa.Table":
    """pa.Table.from_pandas with the pandas metadata stripped — Ray's block
    schema hashing chokes on the metadata dict ("Failed to hash the
    schemas"), and carrying it serves nothing in a shuffle."""
    return pa.Table.from_pandas(
        df, schema=schema, preserve_index=False
    ).replace_schema_metadata(None)
