"""Training-data operator tests over the sf0.001 tables + multimodal stub."""

import numpy as np
import pandas as pd
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


def test_lsh_dedup_driver_and_exchange_paths_agree(ray_session, monkeypatch):
    """Forcing the pair/payload caps to zero must reproduce the driver
    fast-path answer through the bucketed-exchange verify, for both
    dedup_minhash and dedup_ngram_jaccard."""
    import osm_wikidata_ray.pipelines.training_data as td

    def norm(df, cols):
        return df[cols].sort_values(cols).reset_index(drop=True)

    fast_mh = norm(td.dedup_minhash(SF).to_pandas(), ["doc_a", "doc_b"])
    fast_nj = norm(
        td.dedup_ngram_jaccard(SF).to_pandas(), ["doc_a", "doc_b", "jaccard"]
    )
    assert len(fast_mh) > 0  # the fixture plants near-dups

    monkeypatch.setattr(td, "LSH_PAIR_DRIVER_CAP", -1)
    monkeypatch.setattr(td, "NGRAM_DRIVER_PAIR_CAP", -1)
    slow_mh = norm(td.dedup_minhash(SF).to_pandas(), ["doc_a", "doc_b"])
    slow_nj = norm(
        td.dedup_ngram_jaccard(SF).to_pandas(), ["doc_a", "doc_b", "jaccard"]
    )
    pd.testing.assert_frame_equal(fast_mh, slow_mh)
    pd.testing.assert_frame_equal(fast_nj, slow_nj)

    # byte-cap trip (pairs fit, payloads don't) exercises the third branch
    monkeypatch.setattr(td, "LSH_PAIR_DRIVER_CAP", 2_000_000)
    monkeypatch.setattr(td, "NGRAM_DRIVER_PAIR_CAP", 200_000)
    monkeypatch.setattr(td, "LSH_VERIFY_DRIVER_BYTES", 0)
    bytecap_mh = norm(td.dedup_minhash(SF).to_pandas(), ["doc_a", "doc_b"])
    pd.testing.assert_frame_equal(fast_mh, bytecap_mh)


def test_simhash_and_cosine_driver_vs_exchange(ray_session, monkeypatch):
    """dedup_simhash and dedup_embedding_cosine: forcing the pair cap to -1
    must reproduce the driver fast-path answer via the groupby exchange."""
    import osm_wikidata_ray.pipelines.training_data as td

    def norm(df):
        cols = list(df.columns)
        return df.sort_values(cols).reset_index(drop=True)

    fast_sh = norm(td.dedup_simhash(SF).to_pandas())
    fast_ec = norm(td.dedup_embedding_cosine(SF).to_pandas())
    monkeypatch.setattr(td, "LSH_PAIR_DRIVER_CAP", -1)
    slow_sh = norm(td.dedup_simhash(SF).to_pandas())
    slow_ec = norm(td.dedup_embedding_cosine(SF).to_pandas())
    pd.testing.assert_frame_equal(fast_sh, slow_sh)
    pd.testing.assert_frame_equal(fast_ec, slow_ec)


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
    """Real netpbm decode end-to-end; baseline JPEG decodes through the
    engine's own T.81 codec; genuinely codec-library variants
    (progressive JPEG) raise a clear NotImplementedError."""
    import pyarrow as pa

    from osm_wikidata_ray.pipelines.jpeg import encode_jpeg
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
    # baseline JPEG decodes for real (dims from the actual SOF0 parse)
    jp = encode_jpeg(px, quality=90)
    out = MediaDecoder(fake=False)(
        pa.table({"media_id": ["j"], "payload": [jp]})
    ).to_pandas()
    assert out.width[0] == 8 and out.height[0] == 8
    # progressive JPEG (SOF2) fails loudly in strict mode
    prog = bytearray(jp)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        MediaDecoder(fake=False)(
            pa.table({"media_id": ["m"], "payload": [bytes(prog)]})
        )

    docs, _ = generate_corpus(60)
    ds = ray_session.data.from_items(docs).repartition(2)
    feats = media_features(ds, concurrency=(1, 2)).to_pandas()
    n_media = sum(1 for d in docs for s in d["spans"] if s["kind"] == "media")
    assert len(feats) == n_media
    if n_media:
        assert all(len(f) == 8 for f in feats.feature)


def test_png_decode_roundtrip_and_filters():
    """decode_png is a real decoder: round-trips encoder output for every
    supported color type and unfilters all five PNG filter types."""
    import struct
    import zlib

    import numpy as np

    from osm_wikidata_ray.pipelines.multimodal import (
        _PNG_MAGIC,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for shape in [(5, 9), (6, 4, 3), (3, 7, 4)]:
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)

    # hand-build one scanline per filter type (forward-filter the raw rows
    # exactly as a PNG encoder would) and check the unfilter inverts them
    px = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, bpp = px.shape
    stride = w * bpp
    rows = px.reshape(h, stride).astype(np.int64)
    prior = np.zeros(stride, np.int64)
    raw = bytearray()
    for r, f in enumerate([0, 1, 2, 3, 4]):
        cur = rows[r]
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        pleft = np.concatenate([np.zeros(bpp, np.int64), prior[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prior
        elif f == 3:
            enc = cur - (left + prior) // 2
        else:  # Paeth
            p = left + prior - pleft
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prior), np.abs(p - pleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prior, pleft)
            )
            enc = cur - pred
        raw += bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prior = cur

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)


def test_png_media_decoder_and_small_image_resize():
    """MediaDecoder decodes PNG payloads for real; block_mean_resize clamps
    empty blocks for sub-target-size images instead of emitting zeros."""
    import numpy as np
    import pyarrow as pa

    from osm_wikidata_ray.pipelines.multimodal import (
        MediaDecoder,
        block_mean_resize,
        encode_png,
    )

    px = np.random.RandomState(3).randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    out = MediaDecoder(fake=False)(
        pa.table({"media_id": ["p"], "payload": [encode_png(px)]})
    ).to_pandas()
    assert out.width[0] == 8 and out.height[0] == 8
    expect = block_mean_resize(px.astype(np.float64).mean(axis=2), 8).mean(axis=0)
    assert np.allclose(out.feature[0], expect.astype(np.float32))

    # 2×2 image into 8×8 blocks: all features finite and nonzero-biased
    tiny = np.full((2, 2), 100.0)
    resized = block_mean_resize(tiny, 8)
    assert np.all(resized == 100.0)


def test_md5_sample_keys_buffer_walk_matches_per_row():
    """_md5_sample_keys (Arrow-cast + concatenated-buffer slicing) is
    bit-identical to the naive per-row md5(str(id)) — including on
    chunked and SLICED arrays where the offsets buffer doesn't start at
    the array's first element."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from osm_wikidata_ray.pipelines.training_data import _md5_sample_keys

    ids = np.random.RandomState(5).randint(0, 10**12, size=1000)
    naive = [hashlib.md5(str(i).encode()).hexdigest() for i in ids.tolist()]
    assert _md5_sample_keys(pa.chunked_array([ids[:400], ids[400:]])) == naive
    assert _md5_sample_keys(pa.array(ids)[137:613]) == naive[137:613]


def test_media_features_mixed_degrades_per_row(ray_session):
    """Heterogeneous-corpus posture (VERDICT r4 #8): non-strict decode
    flags unsupported/corrupt payloads per row instead of failing the
    stage — PPM/PNG/baseline-JPEG rows decode for real, progressive JPEG
    flags 'unsupported', garbage flags 'corrupt', and every input row
    survives."""
    import numpy as np
    import pyarrow as pa

    from osm_wikidata_ray.pipelines.jpeg import encode_jpeg
    from osm_wikidata_ray.pipelines.multimodal import (
        MediaDecoder,
        encode_png,
        encode_ppm,
        media_features_mixed,
    )
    from osm_wikidata_ray.sources.synth import generate_corpus

    px = np.random.RandomState(7).randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    prog = bytearray(encode_jpeg(px))
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    out = MediaDecoder(fake=False, strict=False)(
        pa.table(
            {
                "media_id": ["ppm", "png", "jpg", "prog", "junk"],
                "payload": [
                    encode_ppm(px),
                    encode_png(px),
                    encode_jpeg(px, quality=90),
                    bytes(prog),
                    b"P6 not-a-number \x00\x01\x02",
                ],
            }
        )
    ).to_pandas()
    assert list(out.status) == ["ok", "ok", "ok", "unsupported", "corrupt"]
    assert list(out.width) == [6, 6, 6, -1, -1]
    assert list(out.height) == [4, 4, 4, -1, -1]
    assert out.feature[3] is None and out.feature[4] is None

    # end-to-end: the mixed table derived from synth docs (format cycles
    # by offset % 4, undecodable slot split by offset % 8) keeps EVERY
    # media span, statuses match the cycle
    docs, _ = generate_corpus(80)
    ds = ray_session.data.from_items(docs).repartition(2)
    # select the scalar columns before to_pandas: Ray's pandas conversion
    # trips over a nullable list<float> column when some blocks are
    # all-non-null (TensorArray cast) — Arrow-side consumers are fine
    feats = (
        media_features_mixed(ds, concurrency=(1, 2))
        .select_columns(["media_id", "status", "width", "height"])
        .to_pandas()
    )
    n_media = sum(1 for d in docs for s in d["spans"] if s["kind"] == "media")
    assert len(feats) == n_media
    offs = feats.media_id.str.split("#").str[1].astype(int)
    off = offs % 4
    want = np.where(
        off < 3, "ok", np.where(offs % 8 == 3, "corrupt", "unsupported")
    )
    assert (feats.status == want).all()
    assert (feats.loc[off == 0, "width"] == 8).all()
    assert (feats.loc[off == 1, "width"] == 7).all()
    assert (feats.loc[off == 2, "width"] == 9).all()
    assert (feats.loc[off == 2, "height"] == 6).all()
    assert (feats.loc[off == 3, "width"] == -1).all()


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


def test_dedup_simhash_clusters_linear_on_verbatim_family(ray_session, tmp_path):
    """A verbatim duplicate family collapses to one component with the min
    doc_id canonical — via O(family) rep→member edges, not O(family²) pairs
    (the scale fix VERDICT r4 asked for)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import dedup_simhash_clusters

    base = (
        "the committee convened at noon to review the annual harbour "
        "budget and after a long discussion approved repairs to the "
        "north breakwater and the replacement of two mooring buoys"
    )
    # fillers must be simhash-dissimilar from each other: vary every token
    # (texts that differ only by one digit land within hamming 3 by design)
    rows = [
        {"doc_id": i,
         "text": " ".join(f"tok{i}w{j}q{(i * 7 + j) % 13}" for j in range(20)),
         "lang": "en", "source": "s", "n_chars": 1}
        for i in range(15)
    ]
    # 40-way verbatim family (identical simhash) + one near-dup variant
    for j in range(40):
        rows.append({"doc_id": 200 + j, "text": base, "lang": "en",
                     "source": "s", "n_chars": 1})
    rows.append({"doc_id": 300, "text": base.replace("noon", "one"),
                 "lang": "en", "source": "s", "n_chars": 1})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    reps = dedup_simhash_clusters(str(tmp_path)).to_pandas()
    # the family (plus the near-dup if within hamming 3) is ONE component
    # rooted at 200; no distinct-filler doc joins it
    assert 200 in set(reps["canonical_doc"])
    assert set(reps["canonical_doc"]).issubset({200})


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


def test_knn_graph_exact_vs_numpy(ray_session):
    """knn_graph (distributed block-nested self-join, forced multi-chunk)
    equals a single-process numpy brute force: per-vector neighbor
    membership AND rank order — chunking/partition order shakes out."""
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import knn_graph

    k = 5
    got = knn_graph(SF, k=k, chunk_rows=64).to_pandas()  # 8 chunks at n=500
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-30)
    sims = vn @ vn.T
    np.fill_diagonal(sims, -2.0)
    assert len(got) == len(ids) * k
    by_vec = got.sort_values("rank").groupby("vec_id")["neighbor_id"]
    for qi in range(0, len(ids), 37):  # sample every 37th vector
        order = sorted(range(len(ids)), key=lambda j: (-sims[qi, j], ids[j]))
        expect = [int(ids[j]) for j in order[:k]]
        assert list(by_vec.get_group(ids[qi])) == expect, ids[qi]


def test_knn_graph_ivf_recall_and_mirror(ray_session):
    """The IVF co-partitioned graph (a) keeps mean recall@5 ≥ 0.9 vs the
    exact baseline and (b) is row-exact vs its serial mirror — the same
    dump the driver oracle reads."""
    from osm_wikidata_ray.pipelines.training_data import knn_graph, knn_graph_ivf
    from osm_wikidata_ray.sources.td_oracle import knn_graph_ivf_expected

    exact = knn_graph(SF, k=5).to_pandas()
    approx = knn_graph_ivf(SF, k=5).to_pandas()
    recalls = []
    for vid, e in exact.groupby("vec_id")["neighbor_id"]:
        a = set(approx.loc[approx.vec_id == vid, "neighbor_id"])
        recalls.append(len(set(e) & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.9, sum(recalls) / len(recalls)

    mirror = knn_graph_ivf_expected(SF, k=5)
    got = (
        approx[["vec_id", "neighbor_id"]]
        .sort_values(["vec_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    exp = mirror.sort_values(["vec_id", "neighbor_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_embedding_pq_matches_serial_mirror(ray_session):
    """embedding_pq's sample-train + distributed encode is bit-exact vs
    the serial mirror (same dump the driver oracle reads), and the codes
    actually compress: m int codes per vector, all within [0, ksub)."""
    from osm_wikidata_ray.pipelines.training_data import embedding_pq
    from osm_wikidata_ray.sources.td_oracle import embedding_pq_expected

    got = embedding_pq(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    exp = embedding_pq_expected(SF).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    code_cols = [c for c in got.columns if c.startswith("c")]
    assert len(code_cols) == 8
    for c in code_cols:
        assert got[c].between(0, 15).all()
    # reconstruction is lossy but bounded: non-negative, finite
    assert (got["err"] >= 0).all() and np.isfinite(got["err"]).all()


def test_bpe_encode_matches_serial_mirror(ray_session):
    """Applying the induced merges back to the corpus (broadcast ranks,
    per-distinct-word cached apply) == the serial mirror exactly; merging
    can only shrink the whitespace token count's char total."""
    from osm_wikidata_ray.pipelines.training_data import bpe_encode
    from osm_wikidata_ray.sources.td_oracle import bpe_encode_expected

    got = (
        bpe_encode(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = bpe_encode_expected(SF)
    pd.testing.assert_frame_equal(got, exp)
    assert (got["n_tokens"] >= 0).all() and got["n_tokens"].sum() > 0


def test_contamination_fuzzy_matches_serial_mirror(ray_session):
    """Near-dup contamination (band exchange with in-bucket verify +
    per-side signature collapse) == the serial mirror exactly; every hit
    is a train-side doc with a sane estimate."""
    from osm_wikidata_ray.pipelines.training_data import contamination_fuzzy
    from osm_wikidata_ray.sources.td_oracle import contamination_fuzzy_expected

    got = (
        contamination_fuzzy(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = contamination_fuzzy_expected(SF)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0  # the synthetic corpus plants cross-side near-dups
    assert (got["doc_id"] % 10 != 7).all()
    assert ((got["est_jaccard"] > 0) & (got["est_jaccard"] <= 1)).all()


def test_embedding_pca_matches_serial_mirror(ray_session):
    """Distributed integer sufficient statistics + shared eigen/projection
    kernels == the serial mirror bit-for-bit; components come out in
    descending-variance order."""
    from osm_wikidata_ray.pipelines.training_data import embedding_pca
    from osm_wikidata_ray.sources.td_oracle import embedding_pca_expected

    got = (
        embedding_pca(SF, n_components=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    exp = embedding_pca_expected(SF, n_components=3)
    pd.testing.assert_frame_equal(got, exp)
    v = got[["pc0", "pc1", "pc2"]].var()
    assert v["pc0"] >= v["pc1"] >= v["pc2"]


def test_knn_pagerank_matches_serial_mirror(ray_session):
    """The distributed integer PageRank loop (union-merge contributions,
    dst-bucketed sums, per-round lineage cuts) is bit-exact vs the serial
    mirror — same scaled mass, same floor divisions — and the total mass
    stays ≈ 1 (floors only leak downward)."""
    from osm_wikidata_ray.pipelines.training_data import _PR_SCALE, knn_pagerank
    from osm_wikidata_ray.sources.td_oracle import knn_pagerank_expected

    got = knn_pagerank(SF, iters=4).to_pandas().sort_values("vec_id").reset_index(drop=True)
    exp = knn_pagerank_expected(SF, iters=4)
    pd.testing.assert_frame_equal(got, exp)
    total = got["pr_mass"].sum()
    assert 0.95 * _PR_SCALE < total <= _PR_SCALE


def test_compression_ratio_flags_repetitive_text(ray_session, tmp_path):
    """The zlib redundancy signal: verbatim-repeated text compresses far
    below natural prose; engine == serial mirror exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import compression_ratio
    from osm_wikidata_ray.sources.td_oracle import compression_ratio_expected

    rows = [
        {"doc_id": 0, "text": "spam " * 400, "lang": "en", "source": "s",
         "n_chars": 2000},
        {"doc_id": 1,
         "text": ("the quick brown fox jumps over a lazy dog while seventy "
                  "wizards vexed jackdaws quietly near the frozen quay " * 4),
         "lang": "en", "source": "s", "n_chars": 400},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    df = compression_ratio(str(tmp_path)).to_pandas().set_index("doc_id")
    assert df.loc[0, "zlib_ratio"] < 0.05 < df.loc[1, "zlib_ratio"]
    got = compression_ratio(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = compression_ratio_expected(str(tmp_path))
    pd.testing.assert_frame_equal(got, exp)


def test_bpe_train_classic_corpus(ray_session, tmp_path):
    """The Sennrich et al. example corpus: word freqs low:5 lower:2
    newest:6 widest:3 → the first merges are (e,s) then (es,t) (count 9
    each, learned in that order), and ties elsewhere break
    lexicographically.  Also pins engine == serial mirror."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import bpe_train
    from osm_wikidata_ray.sources.td_oracle import bpe_train_expected

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    rows = [{"doc_id": 0, "text": text, "lang": "en", "source": "s",
             "n_chars": len(text)}]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    got = bpe_train(str(tmp_path), n_merges=4, min_count=1).to_pandas()
    assert (got.loc[0, "left"], got.loc[0, "right"], got.loc[0, "pair_count"]) == ("e", "s", 9)
    assert (got.loc[1, "left"], got.loc[1, "right"], got.loc[1, "pair_count"]) == ("es", "t", 9)
    exp = bpe_train_expected(str(tmp_path), n_merges=4, min_count=1)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_bpe_train_matches_serial_mirror(ray_session):
    """Engine == mirror over the sf0.001 corpus (the driver-oracle dump)."""
    from osm_wikidata_ray.pipelines.training_data import bpe_train
    from osm_wikidata_ray.sources.td_oracle import bpe_train_expected

    got = bpe_train(SF).to_pandas().reset_index(drop=True)
    exp = bpe_train_expected(SF)
    pd.testing.assert_frame_equal(got, exp)


def test_dsir_select_prefers_target_like_docs(ray_session, tmp_path):
    """DSIR importance: docs written in the target domain's vocabulary
    outscore docs from a disjoint vocabulary, even when their own lang tag
    is not the target — the score measures distributional similarity, not
    the label."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import dsir_select

    rows = []
    for i in range(20):  # the target domain: English-tagged, vocab A
        rows.append({"doc_id": i, "text": "alpha beta gamma delta epsilon",
                     "lang": "en", "source": "s", "n_chars": 1})
    for i in range(20, 30):  # target-LIKE but mistagged: vocab A
        rows.append({"doc_id": i, "text": "alpha beta gamma delta epsilon",
                     "lang": "xx", "source": "s", "n_chars": 1})
    for i in range(30, 40):  # off-domain: disjoint vocab B
        rows.append({"doc_id": i, "text": "uno dos tres cuatro cinco",
                     "lang": "xx", "source": "s", "n_chars": 1})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    df = dsir_select(str(tmp_path)).to_pandas().set_index("doc_id")
    like = df.loc[range(20, 30), "dsir_score"].mean()
    off = df.loc[range(30, 40), "dsir_score"].mean()
    assert like > off, (like, off)
    # vocab-A docs all share one text, so one score; same for vocab B
    assert df.loc[range(0, 30), "dsir_score"].nunique() == 1


def test_ann_topk_pq_recall_and_mirror(ray_session):
    """PQ-ADC shortlist + exact re-rank keeps recall@10 ≥ 0.9 vs the exact
    brute force, and the membership is row-exact vs the serial mirror."""
    from osm_wikidata_ray.pipelines.training_data import ann_topk, ann_topk_pq
    from osm_wikidata_ray.sources.td_oracle import ann_topk_pq_expected

    exact = ann_topk(SF, n_queries=8, k=10).to_pandas()
    approx = ann_topk_pq(SF, n_queries=8, k=10).to_pandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact.loc[exact.query_id == qid, "vec_id"])
        a = set(approx.loc[approx.query_id == qid, "vec_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.9, recalls

    got = (
        approx[["query_id", "vec_id"]]
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    exp = (
        ann_topk_pq_expected(SF)
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_embedding_kmeans_matches_serial_mirror(ray_session):
    """embedding_kmeans' integer-arithmetic Lloyd loop is bit-exact vs the
    serial mirror regardless of batching (the distributed partial sums are
    int64, hence order independent), and clusters are non-degenerate."""
    from osm_wikidata_ray.pipelines.training_data import embedding_kmeans
    from osm_wikidata_ray.sources.td_oracle import embedding_kmeans_expected

    got = embedding_kmeans(SF).to_pandas().reset_index(drop=True)
    want = embedding_kmeans_expected(SF)
    assert got.equals(want)
    assert got["cluster"].nunique() >= 2
    assert (got["dist"] >= 0).all()


def test_heavy_hitters_both_branches(ray_session, monkeypatch):
    """heavy_hitters' sketch path (pigeonhole candidates + broadcast) and
    its cap-tripped full-vocabulary fallback return the identical exact
    answer, matching an in-process token count."""
    import duckdb

    from osm_wikidata_ray.pipelines import training_data as td

    sketch = (
        td.heavy_hitters(SF).to_pandas().sort_values("token")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(td, "HH_CANDIDATE_CAP", -1)  # force fallback
    fallback = (
        td.heavy_hitters(SF).to_pandas().sort_values("token")
        .reset_index(drop=True)
    )
    assert sketch.equals(fallback)
    want = duckdb.sql(f"""
        WITH toks AS (
          SELECT unnest(string_split_regex(
                     regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                     '\\s+')) AS token
          FROM read_parquet('{SF}/documents.parquet')
        ), tot AS (SELECT count(*) AS n FROM toks)
        SELECT token, count(*)::BIGINT AS cnt
        FROM toks GROUP BY token
        HAVING count(*) * 50 >= (SELECT n FROM tot)
        ORDER BY token
    """).df()
    assert len(sketch) > 0
    assert sketch["token"].tolist() == want["token"].tolist()
    assert sketch["cnt"].tolist() == want["cnt"].tolist()


def test_semdedup_matches_serial_mirror(ray_session):
    """semdedup (cluster-then-prune embedding dedup) is bit-exact vs the
    serial mirror: integer-exact cluster labels plus identical float64
    cosine comparisons over vec_id-sorted in-cluster rows.  Sanity: some
    rows prune (the fixture plants near-dup pairs), every rep is kept,
    and reps never exceed their members' vec_ids."""
    from osm_wikidata_ray.pipelines.training_data import semdedup
    from osm_wikidata_ray.sources.td_oracle import semdedup_expected

    got = (
        semdedup(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    want = semdedup_expected(SF)
    assert got.equals(want)
    pruned = got.loc[~got["keep"]]
    assert len(pruned) > 0
    kept_ids = set(got.loc[got["keep"], "vec_id"])
    assert set(pruned["rep"]) <= kept_ids
    assert (got["rep"] <= got["vec_id"]).all()


def test_value_band_join(ray_session):
    """Bucketed band self-join matches the DuckDB range join exactly,
    including zero-match rows (LEFT JOIN semantics) and no pair double
    counted across the 3-cell replication."""
    import duckdb

    from osm_wikidata_ray.pipelines.training_data import value_band_join

    got = (
        value_band_join(SF).to_pandas().sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        WITH c AS (
          SELECT event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM read_parquet('{SF}/events.parquet')
        )
        SELECT a.event_id, count(b.event_id)::BIGINT AS n_close
        FROM c a LEFT JOIN c b
          ON b.cents BETWEEN a.cents - 25 AND a.cents + 25
         AND b.event_id != a.event_id
        GROUP BY a.event_id ORDER BY a.event_id
    """).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["n_close"].tolist() == want["n_close"].tolist()
    assert (got["n_close"] == 0).any()  # the LEFT-JOIN edge is exercised


def test_coreset_select(ray_session):
    """coreset_select keeps exactly the m most-central vectors per
    cluster of the bit-exact kmeans labeling (dist asc, vec_id tie)."""
    from osm_wikidata_ray.pipelines.training_data import (
        coreset_select, embedding_kmeans,
    )

    m = 16
    got = (
        coreset_select(SF, m=m).to_pandas().sort_values("vec_id")
        .reset_index(drop=True)
    )
    full = embedding_kmeans(SF).to_pandas()
    want = (
        full.sort_values(["cluster", "dist", "vec_id"], kind="stable")
        .groupby("cluster", sort=False).head(m)
        .sort_values("vec_id").reset_index(drop=True)
    )
    assert got.equals(want[["vec_id", "cluster", "dist"]])
    assert (got.groupby("cluster").size() <= m).all()


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


def test_chunk_docs_matches_python(ray_session):
    """Fixed-token-window chunking: every doc yields ceil(n/stride) chunks,
    chunk i covering tokens [i*stride, i*stride+chunk) single-space joined
    (same \\s+ split as doc_stats)."""
    import re

    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import chunk_docs

    out = (
        chunk_docs(SF, chunk_tokens=32, stride=24)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    expected = []
    for doc_id, text in sorted(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    ):
        toks = re.split(r"\s+", text.strip())
        ci = 0
        while ci * 24 < len(toks):
            sl = toks[ci * 24 : ci * 24 + 32]
            expected.append((doc_id, ci, " ".join(sl), len(sl)))
            ci += 1
    assert len(out) == len(expected)
    got = list(map(tuple, out[["doc_id", "chunk_id", "chunk_text", "chunk_tokens"]].values))
    assert got == expected
    # overlap invariant: consecutive chunks share chunk-stride tokens
    full = out[out.chunk_tokens == 32]
    assert len(full) > 0  # corpus has docs longer than one window


def test_top_ngrams_matches_python(ray_session):
    """Corpus top-k bigrams with deterministic (count desc, ngram asc)
    tie-break equals a serial Counter over the same tokenization."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import top_ngrams

    out = top_ngrams(SF, n=2, k=15).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    c = Counter()
    for text in t.column("text").to_pylist():
        toks = re.split(r"\s+", text.strip())
        for a, b in zip(toks, toks[1:]):
            c[a + " " + b] += 1
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = sorted(
        map(tuple, out[["ngram", "cnt"]].values), key=lambda kv: (-kv[1], kv[0])
    )
    assert got == expected


def test_top_ngrams_no_cross_doc_grams(ray_session):
    """Bigrams never span document boundaries (the doc-start mask)."""
    import pyarrow as pa

    import osm_wikidata_ray.pipelines.training_data as td

    docs = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["alpha beta", "beta gamma", "gamma alpha"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [1, 1, 1],
        }
    )
    import pyarrow.parquet as pq

    d = "/tmp/ngram_edge"
    import os

    os.makedirs(d, exist_ok=True)
    pq.write_table(docs, f"{d}/documents.parquet")
    out = td.top_ngrams(d, n=2, k=10).to_pandas()
    got = dict(zip(out["ngram"], out["cnt"]))
    # cross-doc grams like "beta beta" / "gamma gamma" must NOT appear
    assert got == {"alpha beta": 1, "beta gamma": 1, "gamma alpha": 1}


def test_wav_roundtrip_and_stereo_downmix():
    """encode_wav → decode_wav is lossless for mono int16 PCM; stereo
    payloads downmix by truncating-mean; odd-length chunks respect RIFF
    word alignment."""
    import struct

    from osm_wikidata_ray.pipelines.multimodal import decode_wav, encode_wav

    x = np.array([0, 1, -1, 32767, -32768, 100], dtype=np.int16)
    out, rate = decode_wav(encode_wav(x, rate=16000))
    assert rate == 16000
    assert np.array_equal(out, x)

    # stereo: interleave L/R, expect truncating mean per frame
    stereo = np.array([100, 200, -100, -201, 7, 8], dtype=np.int16)
    data = np.ascontiguousarray(stereo, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav(payload)
    # int32 mean truncates toward zero on .astype(int16)
    assert out.tolist() == [150, -150, 7]

    with pytest.raises(ValueError):
        decode_wav(b"nope")


def test_audio_features_matches_stdlib_wave(ray_session, tmp_path):
    """Engine audio features (numpy RIFF walk, actor pool) == the serial
    stdlib-`wave` oracle on the same deterministic payloads."""
    from osm_wikidata_ray.pipelines.multimodal import audio_features
    from osm_wikidata_ray.sources.synth import write_corpus_parquet
    from osm_wikidata_ray.sources.td_oracle import audio_features_expected
    from osm_wikidata_ray.util import read_parquet_clean

    path = str(tmp_path / "docs.parquet")
    write_corpus_parquet(path, None, 120)
    got = (
        audio_features(read_parquet_clean(path))
        .sort(["media_id"])
        .to_pandas()
    )
    want = (
        audio_features_expected(path)
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_shipping_priority_matches_duckdb(ray_session):
    """Co-partitioned 3-way join == DuckDB on the sf0.001 tables (every
    orderkey's rows land in one bucket, so per-order sums are complete)."""
    import duckdb

    from osm_wikidata_ray.pipelines.training_data import shipping_priority

    sf = "/root/testdata/sf0.001"
    got = (
        shipping_priority(sf)
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .to_pandas()
    )
    want = duckdb.sql(f"""
        SELECT o.o_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               o.o_orderdate
        FROM read_parquet('{sf}/customer.parquet') c
        JOIN read_parquet('{sf}/orders.parquet') o ON c.c_custkey = o.o_custkey
        JOIN read_parquet('{sf}/lineitem.parquet') l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10
    """).df()
    assert len(got) == 10
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stratified_sample_deterministic(ray_session):
    """Per-stratum sample size respected; selection is md5-deterministic
    (same rows on a different partitioning)."""
    from osm_wikidata_ray.pipelines.training_data import stratified_sample

    sf = "/root/testdata/sf0.001"
    got = stratified_sample(sf, per_source=3).to_pandas()
    sizes = got.groupby("source").size()
    assert (sizes <= 3).all() and len(got) > 0
    again = stratified_sample(sf, per_source=3).to_pandas()
    a = got.sort_values(["doc_id"]).reset_index(drop=True)
    b = again.sort_values(["doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_asof_join_matches_duckdb_and_tiebreak(ray_session):
    """Bucketed merge_asof == correlated-subquery SQL on sf0.001, including
    the exact-timestamp tie-break (max event_id among equal ts)."""
    import duckdb

    from osm_wikidata_ray.pipelines.training_data import asof_join_events

    sf = "/root/testdata/sf0.001"
    got = (
        asof_join_events(sf)
        .sort(["purchase_id"])
        .to_pandas()
        .reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        WITH events AS (SELECT * FROM read_parquet('{sf}/events.parquet'))
        SELECT p.event_id AS purchase_id, p.user_id,
               coalesce(
                 (SELECT c.event_id FROM events c
                  WHERE c.user_id = p.user_id
                    AND c.event_type = 'click' AND c.ts <= p.ts
                  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1),
                 -1) AS click_id
        FROM events p WHERE p.event_type = 'purchase'
        ORDER BY purchase_id
    """).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # explicit tie-break: two clicks at the purchase's exact ts → max id
    t0 = pd.Timestamp("2025-01-01 12:00:00")
    rows = [
        {"event_id": 1, "user_id": 7, "ts": t0, "event_type": "click"},
        {"event_id": 2, "user_id": 7, "ts": t0, "event_type": "click"},
        {"event_id": 3, "user_id": 7, "ts": t0, "event_type": "purchase"},
        {"event_id": 4, "user_id": 8, "ts": t0, "event_type": "purchase"},
    ]
    import pyarrow.parquet as pq
    import tempfile, os, pyarrow as pa_mod

    d = tempfile.mkdtemp()
    pq.write_table(pa_mod.Table.from_pylist(rows), os.path.join(d, "events.parquet"))
    out = asof_join_events(d).to_pandas().set_index("purchase_id")
    assert out.loc[3, "click_id"] == 2  # max event_id among equal-ts clicks
    assert out.loc[4, "click_id"] == -1  # no click for that user


def test_group_topk_matches_duckdb(ray_session):
    import duckdb

    from osm_wikidata_ray.pipelines.training_data import group_topk

    sf = "/root/testdata/sf0.001"
    got = (
        group_topk(sf, k=3)
        .sort(["source", "doc_id"])
        .to_pandas()
        .reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        SELECT source, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM read_parquet('{sf}/documents.parquet'))
        WHERE rn <= 3 ORDER BY source, doc_id
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_video_frames_matches_independent_scanner(ray_session, tmp_path):
    """Engine frame sampling (incremental netpbm parser, actor pool) ==
    the serial regex-scanner oracle: same sampled frame set, same
    integer-exact pixel sums."""
    from osm_wikidata_ray.pipelines.multimodal import video_frames
    from osm_wikidata_ray.sources.synth import write_corpus_parquet
    from osm_wikidata_ray.sources.td_oracle import video_frames_expected
    from osm_wikidata_ray.util import read_parquet_clean

    path = str(tmp_path / "docs.parquet")
    write_corpus_parquet(path, None, 120)
    got = (
        video_frames(read_parquet_clean(path))
        .select_columns(["media_id", "frame_no", "pixel_sum"])
        .sort(["media_id", "frame_no"])
        .to_pandas()
    )
    want = (
        video_frames_expected(path)
        .sort_values(["media_id", "frame_no"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_passages_matches_duckdb(ray_session):
    """Passage-level exact dedup (hash-joined 16-token windows) == the
    text-equality SQL self-join on sf0.001, including the df>16
    boilerplate cut."""
    import duckdb

    from osm_wikidata_ray.pipelines.training_data import dedup_passages

    sf = "/root/testdata/sf0.001"
    got = (
        dedup_passages(sf)
        .sort(["doc_a", "doc_b"])
        .to_pandas()
        .reset_index(drop=True)
        .astype("int64")
    )
    want = duckdb.sql(f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS t
          FROM read_parquet('{sf}/documents.parquet')
        ), pos AS (
          SELECT doc_id, t,
                 unnest(generate_series(
                     0, CAST(floor((len(t) - 16) / 8.0) AS BIGINT))) AS p
          FROM toks WHERE len(t) >= 16
        ), w AS (
          SELECT DISTINCT doc_id,
                 array_to_string(t[p * 8 + 1 : p * 8 + 16], ' ') AS win
          FROM pos
        ), keep AS (
          SELECT win FROM w GROUP BY win HAVING count(*) BETWEEN 2 AND 16
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
        FROM w a JOIN keep USING (win) JOIN w b USING (win)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2 ORDER BY doc_a, doc_b
    """).df().astype("int64")
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_dedup_exact_planted_dups_both_branches(ray_session, tmp_path, monkeypatch):
    """Plant exact duplicates (incl. a doc repeated 3x) and verify both the
    broadcast verify path and the >cap union-merge fallback agree with the
    serial answer (min doc_id per distinct text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import osm_wikidata_ray.pipelines.training_data as td

    texts = [f"unique body number {i} with several words" for i in range(30)]
    rows = [
        {"doc_id": i, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
        for i, t in enumerate(texts)
    ]
    rows += [
        {"doc_id": 100, "text": texts[3], "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 101, "text": texts[3], "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 102, "text": texts[7], "lang": "en", "source": "s", "n_chars": 1},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    want = sorted(range(30))  # min doc_id per distinct text

    got_bcast = sorted(td.dedup_exact(str(tmp_path)).to_pandas()["doc_id"])
    assert got_bcast == want

    # broadcast branch, but texts past the driver-verify byte cap → the
    # verify re-runs as the bucketed text-rehash exchange
    monkeypatch.setattr(td, "DEDUP_EXACT_DRIVER_VERIFY_BYTES", 0)
    got_exchange_verify = sorted(td.dedup_exact(str(tmp_path)).to_pandas()["doc_id"])
    assert got_exchange_verify == want

    # adversarial branch: dup-hash count past the broadcast cap → bucketed
    # thin semi-join + union-merge text attach
    monkeypatch.setattr(td, "DEDUP_EXACT_BROADCAST_CAP", 0)
    got_attach = sorted(td.dedup_exact(str(tmp_path)).to_pandas()["doc_id"])
    assert got_attach == want


def test_top_customers_copartition_matches_broadcast(ray_session):
    """Forcing the >cap co-partitioned join must reproduce the broadcast
    join exactly (same top-10 rows, same revenue)."""
    from osm_wikidata_ray.pipelines.training_data import top_customers

    base = top_customers(SF).to_pandas().reset_index(drop=True)
    alt = top_customers(SF, broadcast_cap=0).to_pandas().reset_index(drop=True)
    assert len(base) == 10
    pd.testing.assert_frame_equal(base, alt)


def test_contamination_broadcast_vs_exchange(ray_session, monkeypatch):
    """contamination_check: the int64 hash-set broadcast tier AND the thin
    hash-exchange fallback must each reproduce the broadcast
    string-membership fast path exactly."""
    import osm_wikidata_ray.pipelines.training_data as td

    def norm(df):
        return df.sort_values(["doc_id"]).reset_index(drop=True)

    fast = norm(td.contamination_check(SF).to_pandas())
    assert len(fast) > 0  # non-vacuous on the fixture corpus
    monkeypatch.setattr(td, "CONTAM_BROADCAST_BYTES_CAP", -1)
    hash_tier = norm(td.contamination_check(SF).to_pandas())
    pd.testing.assert_frame_equal(fast, hash_tier)
    monkeypatch.setattr(td, "CONTAM_HASH_BROADCAST_CAP", -1)
    exchange = norm(td.contamination_check(SF).to_pandas())
    pd.testing.assert_frame_equal(fast, exchange)


def test_tfidf_broadcast_vs_copartition(ray_session, monkeypatch):
    """tfidf_top_terms: the co-partitioned exchange fallback must reproduce
    the df-broadcast fast path exactly."""
    import osm_wikidata_ray.pipelines.training_data as td

    def norm(df):
        return df.sort_values(["doc_id", "rank"]).reset_index(drop=True)

    fast = norm(td.tfidf_top_terms(SF).to_pandas())
    assert len(fast) > 0
    monkeypatch.setattr(td, "TFIDF_VOCAB_BROADCAST_CAP", -1)
    slow = norm(td.tfidf_top_terms(SF).to_pandas())
    pd.testing.assert_frame_equal(fast, slow)


def test_repetition_stats_planted(ray_session, tmp_path):
    """Known token/distinct/bigram counts on hand-built docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import repetition_stats

    rows = [
        {"doc_id": 0, "text": "a b a b a", "lang": "en", "source": "s", "n_chars": 9},
        {"doc_id": 1, "text": "x y z", "lang": "en", "source": "s", "n_chars": 5},
        {"doc_id": 2, "text": "  w  ", "lang": "en", "source": "s", "n_chars": 5},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = (
        repetition_stats(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 0: 5 tokens, 2 distinct, "a b" occurs twice
    assert tuple(out.loc[0]) == (5, 2, 2)
    # doc 1: all distinct, each bigram once
    assert tuple(out.loc[1]) == (3, 3, 1)
    # doc 2: edge whitespace trims to one token, no bigram
    assert tuple(out.loc[2]) == (1, 1, 0)


def test_bm25_ranks_planted_docs(ray_session, tmp_path):
    """A doc saturated with a query's terms must outrank one with a single
    occurrence; docs with no query terms must not appear."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import bm25_search

    rows = [
        {"doc_id": 0, "text": "spark join spark join spark join", "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 1, "text": "spark alpha beta gamma delta epsilon zeta eta", "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 2, "text": "nothing relevant here at all", "lang": "en", "source": "s", "n_chars": 1},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = bm25_search(str(tmp_path)).to_pandas()
    q0 = set(out[out.query_id == 0].doc_id)
    assert q0 == {0, 1}  # doc 2 matches no query-0 term
    assert 2 not in set(out.doc_id) or not (out[out.doc_id == 2].query_id == 0).any()


def test_contamination_counts_planted(ray_session, tmp_path):
    """A training doc sharing an exact 8-token window with a heldout doc
    (doc_id % 10 == 7) is flagged with the distinct-window count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import contamination_check

    shared = "one two three four five six seven eight"
    rows = [
        {"doc_id": 7, "text": f"held prefix {shared} held suffix", "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 3, "text": f"train starts {shared} train ends", "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 4, "text": "totally unrelated training document with plenty of words here", "lang": "en", "source": "s", "n_chars": 1},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = contamination_check(str(tmp_path)).to_pandas().set_index("doc_id")
    assert 3 in out.index and out.loc[3, "n_hits"] >= 1
    assert 4 not in out.index and 7 not in out.index


def test_dedup_normalized_collapses_variants(ray_session, tmp_path):
    """Case/punctuation/whitespace variants collapse to the min doc_id;
    genuinely different texts survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import (
        dedup_exact,
        dedup_normalized,
    )

    rows = [
        {"doc_id": 0, "text": "Hello, World!", "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 1, "text": "hello   world", "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 2, "text": " HELLO WORLD. ", "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 3, "text": "another doc", "lang": "en", "source": "s", "n_chars": 1},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    norm = sorted(dedup_normalized(str(tmp_path)).to_pandas()["doc_id"])
    assert norm == [0, 3]
    # exact dedup keeps all four (the raw texts differ)
    exact = sorted(dedup_exact(str(tmp_path)).to_pandas()["doc_id"])
    assert exact == [0, 1, 2, 3]


def test_c4_filter_all_gates_vs_oracle(ray_session, tmp_path):
    """Every c4_filter gate fires — including 'dup', inert on the driver
    fixture (no exact duplicates at sf0.01) — and the engine matches the
    driver's DuckDB oracle SQL run over the same injected-dup corpus."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entry_mod
    from osm_wikidata_ray.pipelines.training_data import c4_filter

    def doc(doc_id, text):
        return {"doc_id": doc_id, "text": text, "lang": "en",
                "source": "s0", "n_chars": len(text)}

    kept_text = "the fox and a dog " + "ran far " * 13  # 31 tokens, en, 3 stop
    rows = [
        doc(1, kept_text),                                # kept
        doc(2, "tiny doc only"),                          # short (3 tokens)
        doc(3, "word " * 95 + "the"),                     # long (96 tokens)
        doc(4, "der die das und ist ein nicht " * 5),     # lang (de, 35 tok)
        doc(5, "the " + "zzz " * 59),                     # 60 tok, 1 stop -> stopword
        doc(6, kept_text),                                # dup of 1
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    got = c4_filter(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert got["reason"].to_dict() == {
        1: "", 2: "short", 3: "long", 4: "lang", 5: "stopword", 6: "dup"
    }
    assert got["kept"].to_dict() == {
        1: True, 2: False, 3: False, 4: False, 5: False, 6: False
    }

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = con.sql(entry_mod.oracle_sql()["c4_filter"]).df().set_index("doc_id")
    assert odf["reason"].to_dict() == got["reason"].to_dict()
    assert odf["kept"].astype(bool).to_dict() == got["kept"].to_dict()


def test_pii_scrub_injected_vs_oracle(ray_session, tmp_path):
    """pii_scrub's active path — inert on the driver fixture (no PII in the
    synthetic text) — fires on an injected-PII corpus and matches the
    driver's own oracle SQL over it (same precedent as c4_filter's dup
    gate).  Pins scrub ORDER (emails before IPs before phones) and that
    each count is taken pre-scrub for its own category."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entry_mod
    from osm_wikidata_ray.pipelines.training_data import pii_scrub

    def doc(doc_id, text):
        return {"doc_id": doc_id, "text": text, "lang": "en",
                "source": "s0", "n_chars": len(text)}

    rows = [
        doc(1, "contact alice.smith+dev@example.co.uk or bob@x.io today"),
        doc(2, "server at 192.168.0.1 and 10.0.0.255, not 1234.5.6.7 ok"),
        doc(3, "call +1 (555) 123-4567 or 020 7946 0958 now"),
        doc(4, "mixed: eve@host.org from 8.8.8.8 dialed 555-867-5309"),
        doc(5, "no pii here at all, just words"),
        doc(6, ""),
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    got = pii_scrub(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[1, "n_email"] == 2
    assert got.loc[1, "text"] == "contact <EMAIL> or <EMAIL> today"
    assert got.loc[2, "n_ip"] == 2          # 1234.5.6.7 rejected by \b{1,3}
    assert got.loc[3, "n_phone"] == 2
    assert got.loc[4, ["n_email", "n_ip", "n_phone"]].tolist() == [1, 1, 1]
    assert got.loc[4, "text"] == "mixed: <EMAIL> from <IP> dialed <PHONE>"
    assert got.loc[5, ["n_email", "n_ip", "n_phone"]].tolist() == [0, 0, 0]
    assert got.loc[5, "text"] == "no pii here at all, just words"

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = con.sql(entry_mod.oracle_sql()["pii_scrub"]).df().set_index("doc_id")
    for col in ["n_email", "n_ip", "n_phone", "text"]:
        assert odf[col].to_dict() == got[col].to_dict(), col


def test_cohort_retention_vs_pandas(ray_session):
    """cohort_retention over the sf0.001 events table matches a serial
    pandas computation (cohort = each user's first active day; one count
    per (cohort, offset) of distinct active users)."""
    import pandas as pd

    from osm_wikidata_ray.pipelines.training_data import cohort_retention

    sf_dir = SF
    got = (
        cohort_retention(sf_dir)
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    ud = (
        pd.DataFrame({"user_id": ev["user_id"],
                      "day": ev["ts"].dt.floor("D")})
        .drop_duplicates()
    )
    cohort = ud.groupby("user_id")["day"].transform("min")
    off = ((ud["day"] - cohort) // pd.Timedelta(days=1)).astype("int64")
    want = (
        pd.DataFrame({"cohort_day": cohort, "day_offset": off})
        .groupby(["cohort_day", "day_offset"])
        .size()
        .reset_index(name="n_users")
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["cohort_day"].to_numpy() == want["cohort_day"].to_numpy()).all()
    assert got["day_offset"].tolist() == want["day_offset"].tolist()
    assert got["n_users"].tolist() == want["n_users"].tolist()
    # every user is in its own cohort at offset 0
    day0 = got[got["day_offset"] == 0]["n_users"].sum()
    assert day0 == ev["user_id"].nunique()


def test_knn_components_planted_and_numpy_mirror(ray_session, tmp_path):
    """knn_components: planted tight clusters become one component each,
    far-out loners stay singletons (mutuality severs their one-sided
    edges), and the full labeling equals a single-process numpy mirror
    (exact kNN → mutual filter → union-find)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_wikidata_ray.pipelines.training_data import knn_components

    rng = np.random.RandomState(9)
    ids, vecs = [], []
    centers = {0: rng.randn(8) * 4, 20: rng.randn(8) * 4, 40: rng.randn(8) * 4}
    for base, c in centers.items():
        for i in range(6):
            ids.append(base + i)
            vecs.append(c + rng.randn(8) * 0.01)
    # loners: ANTIPODAL directions (cosine −1 to each other, ~0 to the
    # clusters) — each may point a one-sided edge at a cluster, but no
    # cluster member reciprocates (their top-k stays in-cluster) and the
    # loners never reciprocate each other, so mutuality isolates both
    e0 = np.zeros(8)
    e0[0] = 50.0
    for lone, v in ((100, e0), (101, -e0)):
        ids.append(lone)
        vecs.append(v)
    pq.write_table(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float64()))}),
        str(tmp_path / "embeddings.parquet"),
    )
    got = knn_components(str(tmp_path)).to_pandas().sort_values("vec_id")
    lbl = dict(zip(got.vec_id, got.component))
    for base in centers:
        assert {lbl[base + i] for i in range(6)} == {base}
    assert lbl[100] == 100 and lbl[101] == 101

    # generic numpy mirror on the same table (no planted assumptions)
    k = 5
    v = np.stack(vecs)
    vn = v / (np.linalg.norm(v, axis=1, keepdims=True) + 1e-30)
    sims = vn @ vn.T
    np.fill_diagonal(sims, -2.0)
    ids_np = np.asarray(ids, np.int64)
    knn = {}
    for qi in range(len(ids)):
        order = sorted(range(len(ids)), key=lambda j: (-sims[qi, j], ids_np[j]))
        knn[ids_np[qi]] = {int(ids_np[j]) for j in order[:k]}
    parent = {int(i): int(i) for i in ids_np}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in knn:
        for b in knn[a]:
            if a in knn[b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i in parent}
    # re-canonicalize to min member per root
    comp_min: dict = {}
    for i, r in expect.items():
        comp_min[r] = min(comp_min.get(r, i), i)
    assert lbl == {i: comp_min[r] for i, r in expect.items()}


def test_knn_components_ivf_path(ray_session):
    """The IVF edge-build path labels every vector with a valid component
    (a present vec_id that is ≤ its own id — min-member convention)."""
    from osm_wikidata_ray.pipelines.training_data import knn_components

    got = knn_components(SF, use_ivf=True).to_pandas()
    allv = set(got.vec_id)
    assert len(got) == len(allv)
    assert (got.component <= got.vec_id).all()
    assert set(got.component) <= allv
