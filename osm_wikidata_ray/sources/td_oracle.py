"""Single-process oracles for the seeded-LSH training-data operators.

The distributed pipelines in pipelines/training_data.py (minhash /simhash
near-dup, minhash clusters, embedding-LSH cosine, IVF top-k) are
deterministic given their fixed seeds, but their math has no closed SQL
form — these serial implementations compute the expected outputs with
plain per-doc loops (no Ray, no shuffles, no bucketed grouping), and the
driver's DuckDB oracles read a parquet dump of the results.  The shared
spec (hash constants, permutation seeds, band/segment layout, bucket-cap
policy) is imported from the pipeline module so both sides agree on the
ALGORITHM while the ORCHESTRATION — the thing the driver check actually
exercises — is written independently.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ..pipelines.training_data import (
    BUCKET_PAIR_CAP,
    _KM_SCALE,
    _lsh_planes_for,
    _MH_A,
    _MH_B,
    _MH_P,
    _MINHASH_BANDS,
    _MINHASH_PERMS,
    _SH_C1,
    _SH_C2,
    _SH_C3,
)

_MASK64 = (1 << 64) - 1


def _read_docs(sf_dir: str) -> tuple[list[int], list[str]]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t.column("doc_id").to_pylist(), t.column("text").to_pylist()


def _read_embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    return ids, vecs


# --- per-doc text kernels (same spec, loop form) ---

def _doc_shingle_hashes(text: str | None, n: int = 3) -> np.ndarray:
    """Sorted-unique word-n-gram shingle hashes of ONE document."""
    words = (text or "").lower().split()
    if not words:
        return np.empty(0, np.uint64)
    if len(words) < n:
        joined = np.array([" ".join(words)], dtype=object)
        return pd.util.hash_array(joined, categorize=False).astype(np.uint64)
    h = pd.util.hash_array(np.array(words, dtype=object), categorize=False)
    sh = (h[:-2] * _SH_C1) ^ (h[1:-1] * _SH_C2) ^ (h[2:] * _SH_C3)
    return np.unique(sh)


def _doc_minhash(shingles: np.ndarray) -> np.ndarray:
    """64-permutation minhash signature of ONE document's shingle set."""
    if not len(shingles):
        return np.zeros(_MINHASH_PERMS, np.uint64)
    x = shingles % _MH_P
    vals = (_MH_A[:, None] * x[None, :] + _MH_B[:, None]) % _MH_P
    return vals.min(axis=1)


def _band_keys(sig: np.ndarray) -> list[tuple[int, int]]:
    """(band, hash) LSH bucket keys of one signature (16 bands × 4 rows)."""
    rows = _MINHASH_PERMS // _MINHASH_BANDS
    c1, c2 = int(_SH_C1), int(_SH_C2)
    keys = []
    for b in range(_MINHASH_BANDS):
        acc = b + 1
        for r in range(rows):
            acc = ((acc * c1) & _MASK64) ^ ((int(sig[b * rows + r]) * c2) & _MASK64)
        keys.append((b, acc))
    return keys


def _doc_simhash(text: str | None) -> int:
    """uint64 simhash of ONE document (token sign-vote per bit)."""
    words = (text or "").lower().split()
    if not words:
        return 0
    h = pd.util.hash_array(np.array(words, dtype=object), categorize=False)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int32
    )
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def _capped_bucket_pairs(ids: list[int]) -> list[tuple[int, int]]:
    """All unordered pairs of a bucket, ring-paired over the cap (the
    pipeline's connectivity-preserving bound on quadratic buckets)."""
    ids = sorted(set(ids))
    if len(ids) < 2:
        return []
    if len(ids) > BUCKET_PAIR_CAP:
        return list(zip(ids[:-1], ids[1:]))
    return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]


# --- expected outputs ---

def _minhash_pairs(sf_dir: str, threshold: float) -> pd.DataFrame:
    doc_ids, texts = _read_docs(sf_dir)
    sigs = {
        did: _doc_minhash(_doc_shingle_hashes(t))
        for did, t in zip(doc_ids, texts)
    }
    buckets: defaultdict[tuple[int, int], list[int]] = defaultdict(list)
    for did in doc_ids:
        for bk in _band_keys(sigs[did]):
            buckets[bk].append(did)
    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        cand.update(_capped_bucket_pairs(ids))
    keep = [
        (a, b)
        for a, b in sorted(cand)
        if (sigs[a] == sigs[b]).mean() >= threshold
    ]
    return pd.DataFrame(keep, columns=["doc_a", "doc_b"]).astype("int64")


def dedup_minhash_expected(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """(doc_a, doc_b) near-dup pairs: band-LSH candidates verified by
    estimated Jaccard ≥ threshold."""
    return _minhash_pairs(sf_dir, threshold)


def _canonical_from_pairs(pairs: list[tuple[int, int]]) -> pd.DataFrame:
    """Plain union-find over (a, b) edges → one row per component with the
    min member as its canonical representative."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots: defaultdict[int, int] = defaultdict(lambda: 1 << 62)
    for x in parent:
        r = find(x)
        roots[r] = min(roots[r], x)
    return pd.DataFrame(
        {"canonical_doc": sorted(roots.values())}, dtype="int64"
    )


def dedup_minhash_clusters_expected(
    sf_dir: str, threshold: float = 0.8
) -> pd.DataFrame:
    """One row per near-dup component: canonical (min) doc_id, via a plain
    union-find over the exact-dup-COLLAPSED candidate policy the cluster
    pipeline uses (per band bucket: one rep per distinct full signature,
    rep→member edges, capped pairing across reps only), every edge
    verified at estimated Jaccard ≥ threshold."""
    doc_ids, texts = _read_docs(sf_dir)
    sigs = {
        did: _doc_minhash(_doc_shingle_hashes(t))
        for did, t in zip(doc_ids, texts)
    }
    buckets: defaultdict[tuple[int, int], list[int]] = defaultdict(list)
    for did in doc_ids:
        for bk in _band_keys(sigs[did]):
            buckets[bk].append(did)
    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        if len(ids) < 2:
            continue
        by_sig: defaultdict[bytes, list[int]] = defaultdict(list)
        for d in ids:
            by_sig[sigs[d].tobytes()].append(d)
        reps = []
        for members in by_sig.values():
            rep = min(members)
            reps.append(rep)
            cand.update((rep, m) for m in members if m != rep)
        cand.update(_capped_bucket_pairs(reps))
    keep = [
        (a, b)
        for a, b in sorted(cand)
        if (sigs[a] == sigs[b]).mean() >= threshold
    ]
    return _canonical_from_pairs(keep)


def dedup_simhash_expected(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """(doc_a, doc_b) pairs within hamming ≤ max_hamming, found through the
    4-segment pigeonhole buckets with the pipeline's cap policy."""
    doc_ids, texts = _read_docs(sf_dir)
    sims = {did: _doc_simhash(t) for did, t in zip(doc_ids, texts)}
    buckets: defaultdict[tuple[int, int], list[int]] = defaultdict(list)
    for did in doc_ids:
        for seg in range(4):
            buckets[(seg, (sims[did] >> (seg * 16)) & 0xFFFF)].append(did)
    out: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        if len(ids) < 2:
            continue
        pairs = (
            list(zip(ids[:-1], ids[1:]))
            if len(ids) > BUCKET_PAIR_CAP
            else [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        )
        for a, b in pairs:
            if bin(sims[a] ^ sims[b]).count("1") <= max_hamming:
                out.add((a, b))
    return pd.DataFrame(sorted(out), columns=["doc_a", "doc_b"]).astype("int64")


def dedup_simhash_clusters_expected(
    sf_dir: str, max_hamming: int = 3
) -> pd.DataFrame:
    """Canonical doc per simhash near-dup component, mirroring the engine's
    signature-collapse policy: per segment bucket, each distinct sim value
    elects its min doc_id as representative, members attach to the rep
    (hamming 0), and cross-signature edges are verified only between the
    bucket's distinct sims (adjacent-chain over sorted sims past
    BUCKET_PAIR_CAP, all pairs below it)."""
    doc_ids, texts = _read_docs(sf_dir)
    sims = {did: _doc_simhash(t) for did, t in zip(doc_ids, texts)}
    buckets: defaultdict[tuple[int, int], list[int]] = defaultdict(list)
    for did in doc_ids:
        for seg in range(4):
            buckets[(seg, (sims[did] >> (seg * 16)) & 0xFFFF)].append(did)
    edges: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        if len(ids) < 2:
            continue
        by_sim: defaultdict[int, list[int]] = defaultdict(list)
        for d in ids:
            by_sim[sims[d]].append(d)
        reps = {s: min(ds) for s, ds in by_sim.items()}
        for d in ids:
            r = reps[sims[d]]
            if d != r:
                edges.add((r, d))
        ss = sorted(reps)
        cand = (
            list(zip(ss[:-1], ss[1:]))
            if len(ss) > BUCKET_PAIR_CAP
            else [(a, b) for i, a in enumerate(ss) for b in ss[i + 1 :]]
        )
        for u, v in cand:
            if bin(u ^ v).count("1") <= max_hamming:
                edges.add((reps[u], reps[v]))
    return _canonical_from_pairs(sorted(edges))


def dedup_embedding_cosine_expected(
    sf_dir: str, threshold: float = 0.45, n_tables: int = 4
) -> pd.DataFrame:
    """(vec_a, vec_b, max(cos)) via the same seeded random-hyperplane LSH
    buckets, exact in-bucket cosine, cap policy and per-pair max."""
    ids, vecs = _read_embeddings(sf_dir)
    p = _lsh_planes_for(len(ids))
    planes = (
        np.random.RandomState(7)
        .standard_normal((vecs.shape[1], n_tables * p))
        .astype(np.float32)
    )
    bits = (vecs.astype(np.float32) @ planes) > 0
    pow2 = np.uint64(1) << np.arange(p, dtype=np.uint64)
    by_id = {int(i): vecs[k] for k, i in enumerate(ids)}
    buckets: defaultdict[int, list[int]] = defaultdict(list)
    for k, vid in enumerate(ids):
        for t in range(n_tables):
            seg = bits[k, t * p : (t + 1) * p].astype(np.uint64)
            buckets[int(seg @ pow2) | (t << 32)].append(int(vid))
    best: dict[tuple[int, int], float] = {}
    for bucket_ids in buckets.values():
        bucket_ids = sorted(set(bucket_ids))
        k = len(bucket_ids)
        if k < 2:
            continue
        v = np.stack([by_id[i] for i in bucket_ids])
        norms = np.linalg.norm(v, axis=1) + 1e-30
        if k > BUCKET_PAIR_CAP:
            cos = np.einsum("ij,ij->i", v[:-1], v[1:]) / (norms[:-1] * norms[1:])
            pairs = zip(bucket_ids[:-1], bucket_ids[1:], np.round(cos, 4))
        else:
            sims = (v @ v.T) / np.outer(norms, norms)
            iu = np.triu_indices(k, k=1)
            pairs = zip(
                (bucket_ids[i] for i in iu[0]),
                (bucket_ids[j] for j in iu[1]),
                np.round(sims[iu], 4),
            )
        for a, b, c in pairs:
            if c >= threshold:
                key = (a, b)
                if c > best.get(key, -2.0):
                    best[key] = float(c)
    rows = [(a, b, c) for (a, b), c in sorted(best.items())]
    df = pd.DataFrame(rows, columns=["vec_a", "vec_b", "max(cos)"])
    return df.astype({"vec_a": "int64", "vec_b": "int64", "max(cos)": "float64"})


def _ivf_refined_serial(vecs: np.ndarray, n_lists: int) -> np.ndarray:
    """Serial mirror of pipelines.training_data._ivf_refined_centroids:
    seeds = first n_lists vectors, one full-corpus Lloyd step (single-pass
    accumulation — the pipeline's 1e-6 centroid rounding makes the two
    summation orders agree), re-normalized."""
    seeds = vecs[:n_lists].copy()
    seeds /= np.linalg.norm(seeds, axis=1, keepdims=True) + 1e-30
    vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-30)
    assign = np.argmax(vn @ seeds.T, axis=1)
    sums = np.zeros_like(seeds)
    np.add.at(sums, assign, vn)
    counts = np.bincount(assign, minlength=n_lists).astype(np.int64)
    refined = np.where(
        counts[:, None] > 0, sums / np.maximum(counts, 1)[:, None], seeds
    )
    refined = np.round(refined, 6)
    refined /= np.linalg.norm(refined, axis=1, keepdims=True) + 1e-30
    return refined


def ann_topk_ivf_expected(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    n_lists: int = 32,
    n_probe: int = 12,
) -> pd.DataFrame:
    """(query_id, vec_id) IVF top-k membership: same seeded coarse
    quantizer, one full-corpus Lloyd step, same probe-list selection and
    (cos desc, vec_id asc) tie-break."""
    ids, vecs = _read_embeddings(sf_dir)
    vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-30)
    refined = _ivf_refined_serial(vecs, n_lists)

    q_ids = ids[:n_queries]
    qn = vn[:n_queries]
    probe = np.argsort(-(qn @ refined.T), axis=1)[:, :n_probe]
    assign2 = np.argmax(vn @ refined.T, axis=1)
    sims = qn @ vn.T
    rows = []
    for qi, q_id in enumerate(q_ids):
        in_probe = np.flatnonzero(np.isin(assign2, probe[qi]))
        order = sorted(in_probe, key=lambda j: (-sims[qi, j], ids[j]))
        rows.extend((int(q_id), int(ids[j])) for j in order[:k])
    return pd.DataFrame(rows, columns=["query_id", "vec_id"]).astype("int64")


def knn_graph_ivf_expected(
    sf_dir: str, k: int = 5, n_lists: int = 32, n_probe: int = 20
) -> pd.DataFrame:
    """(vec_id, neighbor_id) membership mirror of
    pipelines.training_data.knn_graph_ivf: same quantizer
    (_ivf_refined_serial), same stable-argsort probe lists (col 0 = the
    row's data list), candidates = vectors whose data list is probed,
    self excluded, top-k by (cos desc, neighbor_id asc)."""
    ids, vecs = _read_embeddings(sf_dir)
    vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-30)
    refined = _ivf_refined_serial(vecs, n_lists)
    order = np.argsort(-(vn @ refined.T), axis=1, kind="stable")[:, :n_probe]
    assign = order[:, 0]
    sims = vn @ vn.T
    rows = []
    for qi in range(len(ids)):
        cand = np.flatnonzero(np.isin(assign, order[qi]))
        cand = cand[cand != qi]
        best = sorted(cand, key=lambda j: (-sims[qi, j], ids[j]))
        rows.extend((int(ids[qi]), int(ids[j])) for j in best[:k])
    return pd.DataFrame(rows, columns=["vec_id", "neighbor_id"]).astype("int64")


def doc_fingerprint_expected(
    sf_dir: str, window: int = 8, stride: int = 4, keep: int = 4
) -> pd.DataFrame:
    """Serial winnowing fingerprints: plain per-doc/per-window int loops
    implementing the shared hash spec (_FP_M1/M2/M3 in training_data.py) —
    windows are `window` UTF-8 bytes zero-padded past the doc end, read
    little-endian, murmur-mixed; fingerprint = multiply-xor fold of the
    `keep` smallest hashes ascending."""
    from ..pipelines.training_data import _FP_M1, _FP_M2, _FP_M3

    def mix(w: int) -> int:
        h = (w * _FP_M1) & _MASK64
        h ^= h >> 33
        h = (h * _FP_M2) & _MASK64
        h ^= h >> 29
        return h

    ids, texts = _read_docs(sf_dir)
    rows = []
    for doc_id, text in zip(ids, texts):
        b = (text or "").encode("utf-8")
        hashes = []
        for i in range(0, max(len(b) - window, 1), stride):
            win = b[i : i + window].ljust(window, b"\x00")
            hashes.append(mix(int.from_bytes(win, "little")))
        hashes.sort()
        f = 0
        for h in hashes[:keep]:
            f = ((f * _FP_M3) & _MASK64) ^ h
        signed = f - (1 << 64) if f >= (1 << 63) else f  # int64 bit-cast
        rows.append((int(doc_id), signed))
    return pd.DataFrame(rows, columns=["doc_id", "fingerprint"]).astype("int64")


def audio_features_expected(docs_parquet: str) -> pd.DataFrame:
    """Expected audio features for the synth corpus's media spans, decoded
    through an INDEPENDENT RIFF parser: the stdlib `wave` module reads the
    container (vs the engine's struct/numpy chunk walk in
    pipelines/multimodal.decode_wav) and plain-Python integer loops compute
    the features.  Input bytes are the shared generation spec
    (multimodal.synth_wav_for_ref)."""
    import io
    import math
    import struct
    import wave

    from ..pipelines.multimodal import synth_wav_for_ref

    t = pq.read_table(docs_parquet, columns=["doc_id", "spans"])
    rows = []
    for doc_id, spans in zip(
        t.column("doc_id").to_pylist(), t.column("spans").to_pylist()
    ):
        for s in spans:
            if s["kind"] != "media":
                continue
            payload = synth_wav_for_ref(s["media_ref"])
            with wave.open(io.BytesIO(payload)) as w:
                assert w.getnchannels() == 1 and w.getsampwidth() == 2
                rate = w.getframerate()
                nf = w.getnframes()
                vals = struct.unpack("<%dh" % nf, w.readframes(nf))
            n = len(vals)
            ssum = sum(v * v for v in vals)
            rms = round(math.sqrt(ssum / n), 4) if n else 0.0
            zc = sum(
                (vals[i] >= 0) != (vals[i + 1] >= 0) for i in range(n - 1)
            )
            peak = max(abs(v) for v in vals) if n else 0
            rows.append(
                (f"{doc_id}#{s['offset']}", n, rate, n * 1000 // rate,
                 rms, zc, peak)
            )
    df = pd.DataFrame(
        rows,
        columns=["media_id", "n_samples", "sample_rate", "duration_ms",
                 "rms", "zero_crossings", "peak"],
    )
    for c in ("n_samples", "sample_rate", "duration_ms", "zero_crossings", "peak"):
        df[c] = df[c].astype("int64")
    return df


def video_frames_expected(docs_parquet: str, stride: int = 2) -> pd.DataFrame:
    """Expected stride-sampled frame rows for the synth corpus's media
    spans, through an INDEPENDENT netpbm scanner: a regex header match +
    stdlib-only byte walk (vs the engine's incremental field parser in
    multimodal.split_netpbm_frames / decode_netpbm), with pixel sums
    computed by plain Python ints over the raw bytes."""
    import re

    from ..pipelines.multimodal import synth_video_for_ref

    header = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")

    def scan(payload: bytes) -> list[int]:
        sums = []
        i = 0
        while i < len(payload):
            m = header.match(payload[i:])
            if not m:
                break
            w, h, _maxval = (int(g) for g in m.groups())
            start = i + m.end()
            end = start + w * h * 3
            sums.append(sum(payload[start:end]))
            i = end
        return sums

    t = pq.read_table(docs_parquet, columns=["doc_id", "spans"])
    rows = []
    for doc_id, spans in zip(
        t.column("doc_id").to_pylist(), t.column("spans").to_pylist()
    ):
        for s in spans:
            if s["kind"] != "media":
                continue
            for k, psum in enumerate(scan(synth_video_for_ref(s["media_ref"]))):
                if k % stride:
                    continue
                rows.append((f"{doc_id}#{s['offset']}", k, psum))
    df = pd.DataFrame(rows, columns=["media_id", "frame_no", "pixel_sum"])
    return df.astype({"frame_no": "int64", "pixel_sum": "int64"})


def embedding_kmeans_expected(
    sf_dir: str, k: int = 8, iters: int = 4
) -> pd.DataFrame:
    """Serial Lloyd's k-means mirror of pipelines.training_data.
    embedding_kmeans: identical INTEGER algorithm (quantize at _KM_SCALE,
    int64 squared distances, argmin ties to the lowest cluster, floor-div
    centroid update, empty cluster keeps its centroid), one plain numpy
    loop — the engine's partial-sum orchestration is what the driver
    check exercises."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vec_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(vec_ids, kind="stable")
    vec_ids, vecs = vec_ids[order], vecs[order]
    q = np.rint(vecs * _KM_SCALE).astype(np.int64)
    cq = q[:k].copy()  # k lowest vec_ids

    def assign_all(cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        d2 = np.empty((len(q), len(cent)), dtype=np.int64)
        for j in range(len(cent)):
            diff = q - cent[j]
            d2[:, j] = (diff * diff).sum(axis=1)
        a = np.argmin(d2, axis=1)
        return a, d2[np.arange(len(q)), a]

    for _ in range(iters):
        a, _d = assign_all(cq)
        for j in range(k):
            members = q[a == j]
            if len(members):
                cq[j] = members.sum(axis=0) // len(members)
    a, d2 = assign_all(cq)
    dist = np.round(np.sqrt(d2.astype(np.float64)) / _KM_SCALE, 6)
    return pd.DataFrame(
        {"vec_id": vec_ids, "cluster": a.astype(np.int64), "dist": dist}
    ).sort_values("vec_id").reset_index(drop=True)


def embedding_pq_expected(
    sf_dir: str, m: int = 8, ksub: int = 16, iters: int = 2,
    n_train: int = 4096,
) -> pd.DataFrame:
    """Serial mirror of pipelines.training_data.embedding_pq: same
    training sample (the n_train lowest vec_ids), same shared integer
    codebook trainer (_pq_train_codebooks), same integer encode — the
    engine's min-k combiner + broadcast orchestration is what the driver
    check exercises."""
    from ..pipelines.training_data import (
        _KM_SCALE,
        _km_assign,
        _km_quantize,
        _pq_train_codebooks,
    )

    ids, vecs = _read_embeddings(sf_dir)
    order = np.argsort(ids, kind="stable")
    ids, vecs = ids[order], vecs[order]
    q = _km_quantize(vecs)
    books = _pq_train_codebooks(q[:n_train], m, ksub, iters)
    sd = books.shape[2]
    cols: dict = {"vec_id": ids}
    err = np.zeros(len(q), dtype=np.int64)
    for mi in range(m):
        a, d2 = _km_assign(q[:, mi * sd : (mi + 1) * sd], books[mi])
        cols[f"c{mi}"] = a.astype(np.int64)
        err += d2
    cols["err"] = np.round(np.sqrt(err.astype(np.float64)) / _KM_SCALE, 6)
    return pd.DataFrame(cols)


def knn_pagerank_expected(
    sf_dir: str, k: int = 5, iters: int = 10
) -> pd.DataFrame:
    """Serial mirror of pipelines.training_data.knn_pagerank: the same
    exact k-NN edges (float64 cosine, (cos desc, id asc) ties, self
    excluded) and the same integer loop — scaled mass, rational 17/20
    damping, floor divisions — one numpy pass per iteration."""
    from ..pipelines.training_data import _PR_DAMP_DEN, _PR_DAMP_NUM, _PR_SCALE

    ids, vecs = _read_embeddings(sf_dir)
    n = len(ids)
    vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-30)
    sims = vn @ vn.T
    np.fill_diagonal(sims, -2.0)
    src_rows, dst_rows = [], []
    top = min(k, n - 1)
    for qi in range(n):
        best = sorted(range(n), key=lambda j: (-sims[qi, j], ids[j]))[:top]
        src_rows.extend([qi] * len(best))
        dst_rows.extend(best)
    src = np.asarray(src_rows, np.int64)
    dst = np.asarray(dst_rows, np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    base = (_PR_SCALE * (_PR_DAMP_DEN - _PR_DAMP_NUM)) // (_PR_DAMP_DEN * n)
    pr = np.full(n, _PR_SCALE // n, np.int64)
    for _ in range(iters):
        c = (pr[src] * _PR_DAMP_NUM) // (_PR_DAMP_DEN * outdeg[src])
        nxt = np.full(n, base, np.int64)
        np.add.at(nxt, dst, c)
        pr = nxt
    return pd.DataFrame(
        {"vec_id": ids.astype(np.int64), "pr_mass": pr,
         "pagerank": np.round(pr / _PR_SCALE, 8)}
    ).sort_values("vec_id").reset_index(drop=True)


def bpe_encode_expected(
    sf_dir: str, n_merges: int = 40, min_count: int = 2
) -> pd.DataFrame:
    """Serial mirror of pipelines.training_data.bpe_encode: the mirror's
    own merge table (bpe_train_expected — independent word recount feeding
    the shared loop) applied back through the SHARED _bpe_apply_len
    kernel, one plain pass over the docs."""
    from ..pipelines.training_data import TRIM_PATTERN, _bpe_apply_len

    merges = bpe_train_expected(sf_dir, n_merges, min_count)
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    import pyarrow.compute as pc_

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    trimmed = pc_.replace_substring_regex(
        pc_.utf8_lower(t.column("text")), TRIM_PATTERN, ""
    )
    # the SAME Arrow RE2 tokenizer as the engine (Python str.split would
    # diverge on Unicode whitespace)
    toks = pc_.split_pattern_regex(trimmed, r"\s+")
    doc_ids = t.column("doc_id").to_pylist()
    cache: dict[str, int] = {}
    rows = []
    for did, words in zip(doc_ids, toks.to_pylist()):
        total = 0
        for w in words or []:
            if w == "":
                continue
            n = cache.get(w)
            if n is None:
                n = _bpe_apply_len(w, ranks)
                cache[w] = n
            total += n
        rows.append((int(did), total))
    out = pd.DataFrame(rows, columns=["doc_id", "n_tokens"])
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


def contamination_fuzzy_expected(
    sf_dir: str, threshold: float = 0.5,
    heldout_mod: int = 10, heldout_rem: int = 7,
) -> pd.DataFrame:
    """Serial mirror of pipelines.training_data.contamination_fuzzy: the
    same signatures and band buckets, per-side collapse to distinct full
    signatures, the heldout side capped at CONTAM_FUZZY_HELDOUT_REP_CAP
    reps in lexicographic-sig order, cross estimated-Jaccard ≥ threshold,
    max per train doc."""
    from ..pipelines.training_data import (
        _MINHASH_PERMS,
        CONTAM_FUZZY_HELDOUT_REP_CAP,
    )

    doc_ids, texts = _read_docs(sf_dir)
    sigs = {
        did: _doc_minhash(_doc_shingle_hashes(t))
        for did, t in zip(doc_ids, texts)
    }
    buckets: defaultdict[tuple[int, int], list[int]] = defaultdict(list)
    for did in doc_ids:
        for bk in _band_keys(sigs[did]):
            buckets[bk].append(did)
    best: dict[int, float] = {}
    for ids in buckets.values():
        ids = sorted(set(ids))
        t_side = [i for i in ids if i % heldout_mod != heldout_rem]
        h_side = [i for i in ids if i % heldout_mod == heldout_rem]
        if not t_side or not h_side:
            continue
        h_keys = sorted({sigs[i].tobytes() for i in h_side})[
            :CONTAM_FUZZY_HELDOUT_REP_CAP
        ]
        h_mat = np.frombuffer(b"".join(h_keys), dtype=np.uint64).reshape(
            len(h_keys), _MINHASH_PERMS
        )
        fam_best: dict[bytes, float] = {}
        for i in t_side:
            key = sigs[i].tobytes()
            e = fam_best.get(key)
            if e is None:
                tm = np.frombuffer(key, dtype=np.uint64)
                e = round(float((tm[None, :] == h_mat).mean(axis=1).max()), 6)
                fam_best[key] = e
            if e >= threshold:
                best[i] = max(best.get(i, 0.0), e)
    out = pd.DataFrame(
        {"doc_id": sorted(best), "est_jaccard": [best[i] for i in sorted(best)]}
    )
    return out.astype({"doc_id": "int64", "est_jaccard": "float64"})


def embedding_pca_expected(sf_dir: str, n_components: int = 4) -> pd.DataFrame:
    """Serial mirror of pipelines.training_data.embedding_pca: the same
    integer sufficient statistics (whole corpus in one int64 matmul) fed
    through the SAME kernels (_pca_reduce eigendecomposition + sign fix,
    _pca_project fixed-summation-order projection) — kernel identity is
    the bit-exactness contract."""
    from ..pipelines.training_data import (
        _km_quantize,
        _pca_project,
        _pca_reduce,
    )

    ids, vecs = _read_embeddings(sf_dir)
    q = _km_quantize(vecs)
    sxx = q.T @ q  # int64-exact
    mu, w = _pca_reduce(sxx, q.sum(axis=0), len(q), n_components)
    p = _pca_project(q, mu, w)
    cols = {"vec_id": ids.astype(np.int64)}
    for c in range(w.shape[1]):
        cols[f"pc{c}"] = p[:, c]
    return (
        pd.DataFrame(cols).sort_values("vec_id").reset_index(drop=True)
    )


def compression_ratio_expected(sf_dir: str, level: int = 6) -> pd.DataFrame:
    """Serial mirror of pipelines.training_data.compression_ratio — same
    zlib level over the same utf-8 bytes, one plain loop."""
    import zlib

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        raw = len(text.encode("utf-8")) if text else 0
        comp = len(zlib.compress(text.encode("utf-8"), level)) if text else 0
        rows.append((doc_id, raw, comp))
    df = pd.DataFrame(
        rows, columns=["doc_id", "n_raw_bytes", "n_zlib_bytes"]
    ).astype("int64")
    # np.round, not Python round(): the engine rounds with numpy's scaled
    # half-even, and the two can differ on decimal edge values
    df["zlib_ratio"] = np.round(
        df["n_zlib_bytes"].to_numpy(np.float64)
        / np.maximum(df["n_raw_bytes"].to_numpy(np.float64), 1.0),
        4,
    )
    return df


def bpe_train_expected(
    sf_dir: str, n_merges: int = 40, min_count: int = 2
) -> pd.DataFrame:
    """Serial mirror of pipelines.training_data.bpe_train: an independent
    word-frequency count (same Arrow lower/trim/split kernels, one serial
    pass) feeds the SHARED merge loop (_bpe_merge_loop) — the engine's
    distributed count + freq-cut + sort/limit is what the driver check
    exercises."""
    import pyarrow.compute as pc_

    from ..pipelines.training_data import TRIM_PATTERN, _bpe_merge_loop

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    trimmed = pc_.replace_substring_regex(
        pc_.utf8_lower(t.column("text")), TRIM_PATTERN, ""
    )
    words = pc_.list_flatten(pc_.split_pattern_regex(trimmed, r"\s+"))
    vc = pd.Series(
        [w for w in words.to_pylist() if w != ""]
    ).value_counts()
    vc = vc[vc >= min_count]
    vocab = vc.reset_index()
    vocab.columns = ["w", "c"]
    vocab = vocab.sort_values(
        ["c", "w"], ascending=[False, True], kind="stable"
    )
    return _bpe_merge_loop(
        vocab["w"].tolist(), vocab["c"].to_numpy(np.int64), n_merges
    )


def ann_topk_pq_expected(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    m: int = 16,
    ksub: int = 16,
    iters: int = 2,
    n_train: int = 4096,
    shortlist: int = 128,
) -> pd.DataFrame:
    """(query_id, vec_id) mirror of pipelines.training_data.ann_topk_pq:
    same normalized training sample (n_train lowest vec_ids), shared
    integer codebook trainer, same int64 ADC shortlist by (adist, vec_id)
    and float64 cosine re-rank with (cos desc, vec_id asc) ties."""
    from ..pipelines.training_data import (
        _km_assign,
        _km_quantize,
        _pq_train_codebooks,
    )

    ids, vecs = _read_embeddings(sf_dir)
    vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-30)
    by_id = np.argsort(ids, kind="stable")
    books = _pq_train_codebooks(
        _km_quantize(vn[by_id[:n_train]]), m, ksub, iters
    )
    sd = books.shape[2]
    q = _km_quantize(vn)
    codes = np.stack(
        [_km_assign(q[:, mi * sd : (mi + 1) * sd], books[mi])[0]
         for mi in range(m)],
        axis=1,
    )
    sims = vn @ vn.T
    rows = []
    for qi in range(n_queries):
        lut = np.stack(
            [((books[mi] - q[qi, mi * sd : (mi + 1) * sd]) ** 2).sum(axis=1)
             for mi in range(m)]
        )
        adist = lut[np.arange(m)[:, None], codes.T].sum(axis=0)
        adist[ids == ids[qi]] = np.iinfo(np.int64).max
        short = np.lexsort((ids, adist))[:shortlist]
        rer = sorted(short, key=lambda j: (-sims[qi, j], ids[j]))[:k]
        rows.extend((int(ids[qi]), int(ids[j])) for j in rer)
    return pd.DataFrame(rows, columns=["query_id", "vec_id"]).astype("int64")


def semdedup_expected(
    sf_dir: str, k: int = 8, iters: int = 4, threshold: float = 0.45
) -> pd.DataFrame:
    """Serial mirror of pipelines.training_data.semdedup: reuse the
    integer-exact k-means assignment, then per cluster (rows already
    vec_id-sorted) the identical float64 normalize + matmul + union-find
    prune.  Same arrays in the same order ⇒ bit-equal cosine comparisons
    with the engine's in-bucket computation."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vec_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(vec_ids, kind="stable")
    vec_ids, vecs = vec_ids[order], vecs[order]
    km = embedding_kmeans_expected(sf_dir, k=k, iters=iters)
    assign = km["cluster"].to_numpy()  # km is vec_id-sorted, same order

    # the slab-wise prune kernel is SHARED with the engine on purpose:
    # identical shapes through the BLAS ⇒ identical float64 dot products
    # ⇒ identical threshold decisions (a reimplementation with a different
    # matmul blocking could flip a borderline pair)
    from ..pipelines.training_data import _semdedup_prune_roots

    out = []
    for c in range(k):
        idx = np.flatnonzero(assign == c)
        if idx.size == 0:
            continue
        ids = vec_ids[idx]
        sub = vecs[idx]
        vn = sub / (np.linalg.norm(sub, axis=1, keepdims=True) + 1e-30)
        rep = ids[_semdedup_prune_roots(vn, threshold)]
        out.append(pd.DataFrame(
            {"vec_id": ids, "cluster": np.full(len(ids), c, dtype=np.int64),
             "rep": rep, "keep": ids == rep}
        ))
    return (
        pd.concat(out, ignore_index=True)
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
