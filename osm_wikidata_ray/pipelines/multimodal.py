"""Multimodal column handling: opaque binary media + typed metadata.

Media payloads ride through the engine as opaque references/bytes (the doc
table's `media_ref` span field is never parsed — FIXTURES.md).  This module
adds the actor-pool stages a training-data pipeline needs on top: decode,
feature-extract, resize, frame-sample.

The image/audio libraries are not available in this container, so the
*decode kernel* is stubbed: ``MediaDecoder`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder produces
stable pseudo-pixels from the media bytes.  Everything around the kernel —
schema, batch sizing, actor signature, output layout — is real and tested,
so swapping in a real decoder is a one-line change.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa

import ray

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_ref", pa.string()),
        ("payload", pa.binary()),      # opaque bytes — never interpreted here
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def media_table_from_docs(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Extract the media spans of a doc table into a typed media table.

    Binary payload = deterministic placeholder derived from the ref (the real
    system would fetch object-store bytes by media_ref)."""

    def extract(batch: pa.Table) -> pa.Table:
        out: dict[str, list[Any]] = {n: [] for n in MEDIA_SCHEMA.names}
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for s in spans:
                if s["kind"] != "media":
                    continue
                ref = s["media_ref"]
                out["media_id"].append(f"{doc_id}#{s['offset']}")
                out["media_ref"].append(ref)
                out["payload"].append(hashlib.sha256(ref.encode()).digest())
                out["media_type"].append("image")
                out["width"].append(64)
                out["height"].append(64)
        return pa.Table.from_pydict(out, schema=MEDIA_SCHEMA)

    return docs.map_batches(extract, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool decode stage: map_batches(MediaDecoder, concurrency=N,
    batch_size=small) — small batches because decoded frames are large.

    With ``fake=True`` produces deterministic pseudo-pixels (sha256-seeded);
    without it raises NotImplementedError (no image libs in this container).
    """

    def __init__(self, fake: bool = False, target_size: int = 8) -> None:
        self.fake = fake
        self.target_size = target_size
        if not fake:
            raise NotImplementedError(
                "image/audio decode libraries are not available in this "
                "environment; construct with fake=True for the deterministic "
                "stub decoder"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.target_size
        feats, ids = [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
            rng = np.random.RandomState(seed % (2**31))
            pixels = rng.randint(0, 256, size=(n, n), dtype=np.uint8)
            feats.append(pixels.astype(np.float32).mean(axis=0).tolist())
            ids.append(media_id)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            },
            schema=pa.schema(
                [("media_id", pa.string()), ("feature", pa.list_(pa.float32()))]
            ),
        )


def media_features(
    docs: "ray.data.Dataset", concurrency: tuple[int, int] = (1, 4), batch_size: int = 64
) -> "ray.data.Dataset":
    """media table → per-media feature vectors (stub decode actor pool)."""
    media = media_table_from_docs(docs)
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
