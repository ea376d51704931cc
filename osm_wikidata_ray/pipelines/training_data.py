"""Large-scale training-data operators over the documents/embeddings tables.

The operations a 100 TB training-data pipeline needs alongside the linkage
engine: exact + near deduplication (minhash-LSH, simhash, n-gram Jaccard,
embedding cosine), similarity search, language ID, quality scoring, token
counting and document fingerprinting.  Every operator is a streaming Ray
Data pipeline: vectorized map_batches (pyarrow/numpy), partial aggregation
before any groupby, broadcast small sides via ray.put — no driver-side row
loops.

Input tables (driver testdata): documents(doc_id, text, lang, source,
n_chars), embeddings(vec_id, embedding list<float>, label).
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..util import default_partitions, list_column_to_matrix

PUNCT_RE = "[^a-zA-Z0-9 ]"  # shared with the SQL oracle — keep in sync
_STOPWORDS = (
    "the of and a an in on to is are was were for with as by at it this that "
    "from or be not have has had but they you we he she i"
).split()


def _read(sf_dir: str, name: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# --- text analysis ---

def doc_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc counts (chars/tokens/punct/digits) — vectorized pyarrow."""

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        trimmed = pc.utf8_trim_whitespace(text)
        tokens = pc.split_pattern_regex(trimmed, r"\s+")
        no_punct = pc.replace_substring_regex(text, PUNCT_RE, "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_calc": pc.utf8_length(text),
                "n_tokens": pc.list_value_length(tokens),
                "n_punct": pc.subtract(
                    pc.utf8_length(text), pc.utf8_length(no_punct)
                ),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def token_counts(sf_dir: str) -> "ray.data.Dataset":
    """Corpus token totals per source — partial agg in the map, tiny groupby."""

    def per_doc(batch: pa.Table) -> pa.Table:
        tokens = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(batch.column("text")), r"\s+")
        )
        return pa.table({"source": batch.column("source"), "n_tokens": tokens})

    ds = _read(sf_dir, "documents", ["source", "text"]).map_batches(
        per_doc, batch_format="pyarrow"
    )
    return ds.groupby("source", num_partitions=default_partitions()).sum("n_tokens")


def quality_score(sf_dir: str) -> "ray.data.Dataset":
    """Heuristic quality components (ints for oracle-exact comparison)."""

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.utf8_length(text)
        no_punct = pc.utf8_length(pc.replace_substring_regex(text, PUNCT_RE, ""))
        n_upper = pc.subtract(
            n_chars, pc.utf8_length(pc.replace_substring_regex(text, "[A-Z]", ""))
        )
        n_digit = pc.subtract(
            n_chars, pc.utf8_length(pc.replace_substring_regex(text, "[0-9]", ""))
        )
        n_tokens = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_calc": n_chars,
                "n_punct": pc.subtract(n_chars, no_punct),
                "n_upper": n_upper,
                "n_digit": n_digit,
                "n_tokens": n_tokens,
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


class LangId:
    """Stopword/character n-gram language heuristic — actor pool stage.

    Tables compiled once per actor (__init__), batched numpy scoring."""

    PROFILES = {
        "en": set(_STOPWORDS),
        "de": set("der die das und ist ein eine mit von für nicht auf im den zu".split()),
        "fr": set("le la les et est une un des du dans pour pas sur au avec".split()),
        "es": set("el la los las y es un una de en para no con por del se".split()),
    }

    def __init__(self) -> None:
        self.word_re = re.compile(r"[a-zA-Zäöüßéèàçñáíóú]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for text in batch.column("text").to_pylist():
            words = set(w.lower() for w in self.word_re.findall(text or "")[:200])
            best, best_score = "unknown", 0
            for lang, profile in self.PROFILES.items():
                score = len(words & profile)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        return pa.table({"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds)})


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    )


def doc_fingerprint(
    sf_dir: str, window: int = 8, stride: int = 4, keep: int = 4
) -> "ray.data.Dataset":
    """Winnowing-style document fingerprints: md5 every `window`-char
    substring at `stride`, keep the `keep` smallest digests, fingerprint =
    md5 of their join.  md5 keeps the function bit-reproducible in the
    DuckDB oracle (crc32 has no SQL equivalent)."""

    def fp(batch: pa.Table) -> pa.Table:
        doc_ids, fps = [], []
        md5 = hashlib.md5
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            t = text or ""
            hashes = [
                md5(t[i : i + window].encode()).hexdigest()
                for i in range(0, max(len(t) - window, 1), stride)
            ]
            hashes.sort()
            doc_ids.append(doc_id)
            fps.append(md5("|".join(hashes[:keep]).encode()).hexdigest())
        return pa.table(
            {"doc_id": doc_ids, "fingerprint": pa.array(fps, pa.string())},
            schema=pa.schema([("doc_id", pa.int64()), ("fingerprint", pa.string())]),
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )


# --- deduplication ---

def dedup_exact(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup: first doc_id per text (hash-partition groupby-min)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    survivors = ds.groupby("text", num_partitions=default_partitions()).min("doc_id")
    return survivors.map_batches(
        lambda b: pa.table({"doc_id": b.column("min(doc_id)")}), batch_format="pyarrow"
    )


def _word_shingles(text: str, n: int = 3) -> set[int]:
    words = text.lower().split()
    if len(words) < n:
        return {zlib.crc32(" ".join(words).encode())} if words else set()
    return {
        zlib.crc32(" ".join(words[i : i + n]).encode())
        for i in range(len(words) - n + 1)
    }


_MINHASH_PERMS = 64
_MINHASH_BANDS = 16  # 16 bands × 4 rows
_rng = np.random.RandomState(42)
_MH_A = _rng.randint(1, 2**31 - 1, size=_MINHASH_PERMS).astype(np.uint64)
_MH_B = _rng.randint(0, 2**31 - 1, size=_MINHASH_PERMS).astype(np.uint64)
_MH_P = np.uint64(2**31 - 1)


def _minhash_sig(shingles: set[int]) -> np.ndarray:
    if not shingles:
        return np.zeros(_MINHASH_PERMS, dtype=np.uint64)
    s = np.fromiter(shingles, dtype=np.uint64)
    # (a*x + b) mod p for all perms × shingles, then min per perm
    vals = (np.outer(_MH_A, s) + _MH_B[:, None]) % _MH_P
    return vals.min(axis=1)


def minhash_bands(sf_dir: str, n_shingle: int = 3) -> "ray.data.Dataset":
    """Stage 1 of minhash-LSH dedup: (band_key, doc_id, signature)."""

    def bands(batch: pa.Table) -> pa.Table:
        out_band, out_doc, out_sig = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = _minhash_sig(_word_shingles(text or "", n_shingle))
            rows = _MINHASH_PERMS // _MINHASH_BANDS
            sig_bytes = sig.tobytes()
            for b in range(_MINHASH_BANDS):
                band = sig[b * rows : (b + 1) * rows]
                key = f"{b}:{zlib.crc32(band.tobytes()):08x}"
                out_band.append(key)
                out_doc.append(doc_id)
                out_sig.append(sig_bytes)
        return pa.table(
            {
                "band_key": out_band,
                "doc_id": out_doc,
                "sig": pa.array(out_sig, pa.binary()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        bands, batch_format="pyarrow"
    )


def dedup_minhash(sf_dir: str, threshold: float = 0.8) -> "ray.data.Dataset":
    """MinHash-LSH near-dup pairs: band groupby → in-bucket signature
    verification (estimated Jaccard ≥ threshold).  Returns (doc_a, doc_b)."""

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        docs = group.drop_duplicates("doc_id")
        if len(docs) < 2:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        ids = docs["doc_id"].to_numpy()
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in docs["sig"]])
        out_a, out_b = [], []
        for i in range(len(ids)):
            eq = (sigs[i] == sigs[i + 1 :]).mean(axis=1)
            for j in np.flatnonzero(eq >= threshold):
                a, b = int(ids[i]), int(ids[i + 1 + j])
                out_a.append(min(a, b))
                out_b.append(max(a, b))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    pairs = minhash_bands(sf_dir).groupby("band_key", num_partitions=default_partitions()).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # dedupe pairs discovered in multiple bands
    return pairs.groupby(["doc_a", "doc_b"], num_partitions=default_partitions()).count().select_columns(["doc_a", "doc_b"])


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.8) -> "ray.data.Dataset":
    """Exact n-gram Jaccard verification of LSH candidates — the two-stage
    filter-verify pattern (LSH recall, exact precision)."""
    docs_path = f"{sf_dir}/documents.parquet"

    class Verify:
        def __init__(self) -> None:
            import pyarrow.parquet as pq

            t = pq.read_table(docs_path, columns=["doc_id", "text"])
            self.text = dict(
                zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_a, out_b, out_j = [], [], []
            for a, b in zip(
                batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()
            ):
                sa, sb = _word_shingles(self.text[a] or ""), _word_shingles(self.text[b] or "")
                union = len(sa | sb)
                j = len(sa & sb) / union if union else 0.0
                if j >= threshold:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(j)
            return pa.table(
                {"doc_a": pa.array(out_a, pa.int64()),
                 "doc_b": pa.array(out_b, pa.int64()),
                 "jaccard": pa.array(out_j, pa.float64())}
            )

    return dedup_minhash(sf_dir, threshold=0.5).map_batches(
        Verify, batch_format="pyarrow", concurrency=(1, 4)
    )


def _simhash64(text: str) -> int:
    v = np.zeros(64, dtype=np.int64)
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        v += 2 * bits - 1
    return int("".join("1" if x > 0 else "0" for x in v), 2)


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> "ray.data.Dataset":
    """SimHash near-dup pairs via 4-segment pigeonhole blocking (any pair
    within hamming ≤ 3 shares at least one exact 16-bit segment)."""

    def sigs(batch: pa.Table) -> pa.Table:
        out = {"seg_key": [], "doc_id": [], "sim": []}
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sh = _simhash64(text or "")
            for seg in range(4):
                part = (sh >> (seg * 16)) & 0xFFFF
                out["seg_key"].append(f"{seg}:{part:04x}")
                out["doc_id"].append(doc_id)
                out["sim"].append(sh)
        return pa.table(
            {"seg_key": pa.array(out["seg_key"]),
             "doc_id": pa.array(out["doc_id"], pa.int64()),
             "sim": pa.array(out["sim"], pa.uint64())}
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        docs = group.drop_duplicates("doc_id")
        if len(docs) < 2:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        ids = docs["doc_id"].to_numpy()
        sims = docs["sim"].to_numpy().astype(np.uint64)
        out_a, out_b = [], []
        for i in range(len(ids)):
            ham = np.array([bin(int(sims[i]) ^ int(s)).count("1") for s in sims[i + 1 :]])
            for j in np.flatnonzero(ham <= max_hamming):
                a, b = int(ids[i]), int(ids[i + 1 + j])
                out_a.append(min(a, b))
                out_b.append(max(a, b))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    pairs = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sigs, batch_format="pyarrow")
        .groupby("seg_key", num_partitions=default_partitions())
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"], num_partitions=default_partitions()).count().select_columns(["doc_a", "doc_b"])


# --- embeddings: similarity search + near-dup ---

def ann_topk(sf_dir: str, n_queries: int = 8, k: int = 10) -> "ray.data.Dataset":
    """Brute-force cosine top-k: broadcast query matrix (ray.put once), numpy
    matmul per batch, per-batch partial top-k, final reduce per query."""
    import pyarrow.parquet as pq

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, n_queries)
    q_ids = qt.column("vec_id").to_pylist()
    # float64 to match the DuckDB list_cosine_similarity oracle bit-for-bit
    # at 4-decimal rounding
    q = np.stack(qt.column("embedding").to_pylist()).astype(np.float64)
    q_ref = ray.put((q_ids, q))

    class Score:
        def __init__(self) -> None:
            self.q_ids, self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = list_column_to_matrix(batch.column("embedding")).astype(np.float64)
            qn = self.q / (np.linalg.norm(self.q, axis=1, keepdims=True) + 1e-30)
            vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-30)
            sims = qn @ vn.T  # (n_queries, batch)
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            out = {"query_id": [], "vec_id": [], "cos": []}
            top = min(k, sims.shape[1])
            part = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            for qi, q_id in enumerate(self.q_ids):
                for j in part[qi]:
                    out["query_id"].append(q_id)
                    out["vec_id"].append(int(ids[j]))
                    out["cos"].append(float(sims[qi, j]))
            return pa.table(
                {"query_id": pa.array(out["query_id"], pa.int64()),
                 "vec_id": pa.array(out["vec_id"], pa.int64()),
                 "cos": pa.array(out["cos"], pa.float64())}
            )

    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 4)
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["cos"] = g["cos"].round(4)
        return g

    return partials.groupby("query_id", num_partitions=8).map_groups(final_topk, batch_format="pandas")


def dedup_embedding_cosine(
    sf_dir: str, threshold: float = 0.45, n_tables: int = 4, planes_per_table: int = 6
) -> "ray.data.Dataset":
    """Embedding near-dup via multi-table random-hyperplane LSH + in-bucket
    exact cosine (the scale path: buckets bound the quadratic step; more
    tables trade shuffle volume for recall).  Deterministic planes (seed 7)."""

    def sigs_factory():
        class Sigs:
            def __init__(self) -> None:
                self.planes = None  # lazily sized to the embedding dim

            def __call__(self, batch: pa.Table) -> pa.Table:
                vecs = list_column_to_matrix(batch.column("embedding")).astype(np.float32)
                if self.planes is None:
                    self.planes = np.random.RandomState(7).standard_normal(
                        (vecs.shape[1], n_tables * planes_per_table)
                    ).astype(np.float32)
                bits = (vecs @ self.planes) > 0
                keys_per_table: list[list[str]] = []
                for t in range(n_tables):
                    seg = bits[:, t * planes_per_table : (t + 1) * planes_per_table]
                    keys_per_table.append(
                        [f"{t}:" + "".join("1" if b else "0" for b in row) for row in seg]
                    )
                n = len(vecs)
                return pa.table(
                    {
                        "bucket": pa.array(
                            [keys_per_table[t][i] for i in range(n) for t in range(n_tables)]
                        ),
                        "vec_id": pa.array(
                            [batch.column("vec_id")[i].as_py() for i in range(n) for _ in range(n_tables)],
                            pa.int64(),
                        ),
                        "embedding": pa.array(
                            [batch.column("embedding")[i].as_py() for i in range(n) for _ in range(n_tables)]
                        ),
                    }
                )

        return Sigs

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        docs = group.drop_duplicates("vec_id")
        if len(docs) < 2:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                                 "vec_b": pd.Series(dtype="int64"),
                                 "cos": pd.Series(dtype="float64")})
        ids = docs["vec_id"].to_numpy()
        vecs = np.stack(docs["embedding"].to_list()).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-30
        sims = vecs @ vecs.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= threshold
        return pd.DataFrame(
            {"vec_a": ids[iu[0][mask]], "vec_b": ids[iu[1][mask]],
             "cos": np.round(sims[iu][mask].astype(np.float64), 4)}
        )

    pairs = (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(sigs_factory(), batch_format="pyarrow", concurrency=(1, 4))
        .groupby("bucket", num_partitions=default_partitions())
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["vec_a", "vec_b"], num_partitions=default_partitions()).max("cos")


# --- relational reference queries (oracle-checked operator proofs) ---

def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-style aggregate: vectorized derived columns + groupby."""

    def derive(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "l_quantity": batch.column("l_quantity"),
                "l_extendedprice": batch.column("l_extendedprice"),
                "disc_price": disc_price,
            }
        )

    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(derive, batch_format="pyarrow")
    agg = ds.groupby(["l_returnflag", "l_linestatus"], num_partitions=8).aggregate(
        *_sum_cols(["l_quantity", "l_extendedprice", "disc_price"])
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": pc.round(batch.column("sum(l_quantity)"), 2),
                "sum_base_price": pc.round(batch.column("sum(l_extendedprice)"), 2),
                "sum_disc_price": pc.round(batch.column("sum(disc_price)"), 2),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def _sum_cols(cols: list[str]):
    from ray.data.aggregate import Sum

    return [Sum(c) for c in cols]


def top_customers(sf_dir: str, n: int = 10) -> "ray.data.Dataset":
    """Broadcast join (small customer/nation side via ray.put) + groupby +
    top-n — the broadcast-instead-of-shuffle-join pattern."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation_names = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    cust_map = {
        k: (name, nation_names.get(nk, ""))
        for k, name, nk in zip(
            cust.column("c_custkey").to_pylist(),
            cust.column("c_name").to_pylist(),
            cust.column("c_nationkey").to_pylist(),
        )
    }
    cust_ref = ray.put(cust_map)

    class Enrich:
        def __init__(self) -> None:
            self.cust = ray.get(cust_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_pylist()
            names, nations = [], []
            for k in keys:
                name, nat = self.cust.get(k, ("", ""))
                names.append(name)
                nations.append(nat)
            return pa.table(
                {
                    "c_name": pa.array(names),
                    "n_name": pa.array(nations),
                    "o_totalprice": batch.column("o_totalprice"),
                }
            )

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        Enrich, batch_format="pyarrow", concurrency=(1, 4)
    )
    agg = ds.groupby(["c_name", "n_name"], num_partitions=default_partitions()).sum("o_totalprice")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_name": batch.column("c_name"),
                "n_name": batch.column("n_name"),
                "revenue": pc.round(batch.column("sum(o_totalprice)"), 2),
            }
        )

    return (
        agg.map_batches(rename, batch_format="pyarrow")
        .sort(["revenue", "c_name"], descending=[True, False])
        .limit(n)
    )


def events_by_type(sf_dir: str) -> "ray.data.Dataset":
    """Event-stream aggregate: count + value sum per event type."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    agg = ds.groupby("event_type", num_partitions=8).aggregate(
        *(_sum_cols(["value"]))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "sum_value": pc.round(batch.column("sum(value)"), 2),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def sessionize_events(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Sessionized event aggregate: per-user sessions split on >gap idle
    (the windowed-aggregate pattern: hash-bucket by user, vectorized
    sort+diff+cumsum inside each bucket — no per-event Python loop)."""
    from ..stages.blocking import add_bucket

    n_parts = default_partitions()

    def add_user_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "user_key", pc.cast(batch.column("user_id"), pa.string())
        )
        return add_bucket(batch, "user_key", n_parts * 4)

    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessionize(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap_break = df["ts"].diff() > gap
        session_start = new_user | gap_break
        # per-user session ordinal starting at 0
        df = df.assign(_start=session_start.astype("int64"))
        df["session_no"] = df.groupby("user_id")["_start"].cumsum() - 1
        agg = (
            df.groupby(["user_id", "session_no"])
            .agg(n_events=("event_id", "count"), sum_value=("value", "sum"))
            .reset_index()
        )
        agg["sum_value"] = agg["sum_value"].round(2)
        return agg

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    return (
        ds.map_batches(add_user_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=n_parts)
        .map_groups(sessionize, batch_format="pandas")
    )


def dedup_minhash_clusters(sf_dir: str, threshold: float = 0.8) -> "ray.data.Dataset":
    """Near-duplicate clusters + canonical representative per cluster:
    minhash-LSH pairs → general min-label propagation (the same distributed
    union-find the linkage engine uses) → per-cluster min doc_id survives."""
    import pyarrow as pa

    from ..stages.clustering import connected_components

    pairs = dedup_minhash(sf_dir, threshold).map_batches(
        lambda b: pa.table(
            {
                "qid": pc.cast(b.column("doc_a"), pa.string()),
                "osm_type": pa.array(["doc"] * len(b)),
                "osm_id": b.column("doc_b"),
            }
        ),
        batch_format="pyarrow",
    )
    labels = connected_components(pairs)

    def clean(batch: pa.Table) -> pa.Table:
        import re as _re

        docs = []
        for n in batch.column("node").to_pylist():
            m = _re.match(r"^(?:doc/)?(\d+)$", n)
            docs.append(int(m.group(1)) if m else -1)
        return pa.table(
            {"doc_id": pa.array(docs, pa.int64()),
             "cluster_id": batch.column("cluster_id")}
        )

    cleaned = labels.map_batches(clean, batch_format="pyarrow")
    reps = cleaned.groupby("cluster_id", num_partitions=8).min("doc_id")
    return reps.map_batches(
        lambda b: pa.table({"canonical_doc": b.column("min(doc_id)")}),
        batch_format="pyarrow",
    )
