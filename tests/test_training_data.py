"""Training-data operator tests over the sf0.001 tables + multimodal stub."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_doc_stats_matches_python(ray_session):
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import doc_stats

    df = doc_stats(SF).to_pandas().set_index("doc_id")
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in list(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )[:50]:
        assert df.loc[doc_id, "n_chars_calc"] == len(text)
        assert df.loc[doc_id, "n_tokens"] == len(text.split())


def test_dedup_exact_survivors(ray_session):
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import dedup_exact

    out = dedup_exact(SF).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    first_by_text = {}
    for doc_id, text in sorted(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    ):
        first_by_text.setdefault(text, doc_id)
    assert sorted(out["doc_id"]) == sorted(first_by_text.values())


def test_minhash_finds_planted_duplicates(ray_session, tmp_path):
    """Plant near-duplicate docs and verify LSH + Jaccard verify find them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import (
        dedup_minhash,
        dedup_ngram_jaccard,
        dedup_simhash,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sailors watch from the harbour wall under a grey morning sky "
        "and the tide slowly turns against the old wooden pier"
    )
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": f"document {i} " + "unrelated words " * (i % 7 + 3),
                     "lang": "en", "source": "s", "n_chars": 10})
    rows.append({"doc_id": 100, "text": base, "lang": "en", "source": "s", "n_chars": 1})
    rows.append({"doc_id": 101, "text": base + " extra tail", "lang": "en", "source": "s", "n_chars": 1})
    rows.append({"doc_id": 102, "text": base.replace("grey", "gray"), "lang": "en", "source": "s", "n_chars": 1})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    mh = dedup_minhash(str(tmp_path)).to_pandas()
    found = {tuple(r) for r in mh[["doc_a", "doc_b"]].itertuples(index=False)}
    assert (100, 101) in found and (100, 102) in found

    nj = dedup_ngram_jaccard(str(tmp_path)).to_pandas()
    found_nj = {tuple(r) for r in nj[["doc_a", "doc_b"]].itertuples(index=False)}
    assert (100, 102) in found_nj

    sh = dedup_simhash(str(tmp_path)).to_pandas()
    found_sh = {tuple(r) for r in sh[["doc_a", "doc_b"]].itertuples(index=False)}
    assert (100, 101) in found_sh or (100, 102) in found_sh


def test_ann_topk_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import ann_topk

    out = ann_topk(SF, n_queries=4, k=5).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist())
    v = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    vn = v / (np.linalg.norm(v, axis=1, keepdims=True) + 1e-30)
    for qi in range(4):
        sims = vn[qi] @ vn.T
        expect = set(ids[np.argsort(-sims, kind="stable")[:5]])
        got = set(out[out.query_id == ids[qi]].vec_id)
        assert got == expect


def test_media_features_stub(ray_session):
    """Real netpbm decode end-to-end; non-netpbm formats without codec
    libraries raise a clear NotImplementedError."""
    import pyarrow as pa

    from osm_wikidata_ray.pipelines.multimodal import (
        MediaDecoder,
        decode_netpbm,
        encode_ppm,
        media_features,
    )
    from osm_wikidata_ray.sources.synth import generate_corpus
    import numpy as np

    # PPM roundtrip through the real decoder
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(decode_netpbm(encode_ppm(px)), px)
    # codec-less formats fail loudly (JPEG magic)
    with pytest.raises(NotImplementedError):
        MediaDecoder(fake=False)(
            pa.table({"media_id": ["m"], "payload": [b"\xff\xd8\xff..."]})
        )

    docs, _ = generate_corpus(60)
    ds = ray_session.data.from_items(docs).repartition(2)
    feats = media_features(ds, concurrency=(1, 2)).to_pandas()
    n_media = sum(1 for d in docs for s in d["spans"] if s["kind"] == "media")
    assert len(feats) == n_media
    if n_media:
        assert all(len(f) == 8 for f in feats.feature)


def test_dedup_minhash_clusters(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import dedup_minhash_clusters

    base = (
        "one fine morning the harbour master counted seventeen grey boats "
        "sliding past the old stone pier while gulls wheeled overhead in "
        "wide lazy circles above the shining water"
    )
    rows = [
        {"doc_id": i, "text": f"unique text {i} " + "padding words " * 5,
         "lang": "en", "source": "s", "n_chars": 1}
        for i in range(20)
    ]
    # chain of near-dups 100-101-102 → one cluster, canonical 100
    rows.append({"doc_id": 100, "text": base, "lang": "en", "source": "s", "n_chars": 1})
    rows.append({"doc_id": 101, "text": base + " tail one", "lang": "en", "source": "s", "n_chars": 1})
    rows.append({"doc_id": 102, "text": base.replace("grey", "gray") + " tail one", "lang": "en", "source": "s", "n_chars": 1})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    reps = dedup_minhash_clusters(str(tmp_path)).to_pandas()
    assert set(reps["canonical_doc"]) == {100}


def test_ann_topk_ivf_recall(ray_session):
    """IVF probe (n_probe/n_lists of the corpus per query) keeps recall@10
    ≥ 0.9 vs the exact brute-force baseline."""
    from osm_wikidata_ray.pipelines.training_data import ann_topk, ann_topk_ivf

    exact = ann_topk(SF, n_queries=4, k=10).to_pandas()
    approx = ann_topk_ivf(SF, n_queries=4, k=10).to_pandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact.loc[exact.query_id == qid, "vec_id"])
        a = set(approx.loc[approx.query_id == qid, "vec_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_token_counts_bpe(ray_session):
    """BPE-ish token totals match an in-process regex count."""
    import re

    import duckdb

    from osm_wikidata_ray.pipelines.training_data import BPE_PATTERN, token_counts_bpe

    out = token_counts_bpe(SF).to_pandas()
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    expected: dict[str, int] = {}
    pat = re.compile(BPE_PATTERN)
    for source, text in rows:
        expected[source] = expected.get(source, 0) + len(pat.findall(text or ""))
    got = dict(zip(out["source"], out["sum(n_tokens)"]))
    assert got == expected


def test_frame_sampler(ray_session):
    """Concatenated-netpbm 'video' container: frame split roundtrip + the
    actor-pool sampling stage keeps every stride-th frame."""
    import pyarrow as pa

    from osm_wikidata_ray.pipelines.multimodal import (
        FrameSampler,
        encode_ppm,
        split_netpbm_frames,
    )

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (6, 5, 3), dtype=np.uint8) for _ in range(5)]
    blob = b"".join(encode_ppm(f) for f in frames)
    out = split_netpbm_frames(blob)
    assert len(out) == 5 and all(np.array_equal(a, b) for a, b in zip(out, frames))

    media = ray_session.data.from_arrow(
        pa.table({"media_id": ["v1", "v2"], "payload": [blob, blob]})
    )
    sampled = media.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": 2},
        batch_format="pyarrow", concurrency=(1, 2),
    ).to_pandas()
    assert sorted(sampled[sampled.media_id == "v1"].frame_no) == [0, 2, 4]
    assert all(len(f) == 8 for f in sampled.feature)
