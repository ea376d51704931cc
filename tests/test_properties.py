"""Property-based robustness tests (hypothesis): the rule functions must
never crash and key invariants must hold on arbitrary unicode input."""

from hypothesis import given, settings
from hypothesis import strategies as st

from osm_wikidata_ray.functions.keys import osm_block_keys, wd_block_keys
from osm_wikidata_ray.functions.spans import (
    decode_doc,
    encode_osm_doc,
    encode_wd_doc,
    finalize_spans,
    span_checksum,
)
from osm_wikidata_ray.rules import names as m
from osm_wikidata_ray.rules.text import fold_to_ascii, number_to_words, ordinals_to_words

text_strategy = st.text(max_size=60)
name_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


@settings(max_examples=300, deadline=None)
@given(name_strategy)
def test_fold_to_ascii_returns_ascii(s):
    out = fold_to_ascii(s)
    assert all(ord(c) < 128 for c in out)


@settings(max_examples=200, deadline=None)
@given(name_strategy, name_strategy)
def test_name_match_never_crashes_and_is_reflexive(a, b):
    m.name_match(a, b)
    if a.strip():
        assert m.name_match_main(a, a) is not None  # identical always matches


@settings(max_examples=200, deadline=None)
@given(name_strategy)
def test_normalize_name_idempotent_on_ascii_fold(s):
    n1 = m.normalize_name(s)
    assert m.normalize_name(n1) == m.normalize_name(n1)
    assert " " not in n1  # fully squashed


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_number_words_total(n):
    words = number_to_words(n)
    assert words and all(c.isalpha() or c in " -" for c in words)


@settings(max_examples=100, deadline=None)
@given(name_strategy)
def test_ordinals_to_words_stable(s):
    out = ordinals_to_words(s)
    # second pass must be a no-op (no digit ordinals survive)
    assert ordinals_to_words(out) == out


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.text(min_size=1, max_size=15), st.text(max_size=20), max_size=6
    )
)
def test_osm_block_keys_no_crash(tags):
    keys = osm_block_keys(tags, 10.0, 20.0, "point")
    assert len(keys) <= 64
    assert all(isinstance(k, str) for k in keys)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["text", "name", "tag", "cat"]), st.text(max_size=30)),
        max_size=8,
    )
)
def test_span_checksum_orders_and_roundtrip(kinds_texts):
    spans = finalize_spans(
        [{"kind": k, "text": t.replace("\t", " "), "media_ref": "", "offset": 0}
         for k, t in kinds_texts]
    )
    c1 = span_checksum(spans)
    assert c1 == span_checksum(spans)
    def content(s):
        return (s["kind"], s["text"], s["media_ref"])

    if len(spans) >= 2 and content(spans[0]) != content(spans[1]):
        swapped = [spans[1], spans[0], *spans[2:]]
        assert span_checksum(swapped) != c1  # order-sensitive


def test_bbox_chunking():
    from osm_wikidata_ray.functions.chunking import (
        bbox_chunk,
        bbox_chunk_dimensions,
        calc_chunk_size,
    )

    assert calc_chunk_size(1) == 1
    assert calc_chunk_size(10000, size=22) == 5
    assert bbox_chunk_dimensions((50.0, 51.0, -1.0, 0.0), 1) == (1, 1)
    rows, cols = bbox_chunk_dimensions((50.0, 52.0, -1.0, 0.0), 2)
    assert rows >= cols  # taller than wide → more rows
    chunks = bbox_chunk((50.0, 51.0, -1.0, 0.0), 2)
    assert len(chunks) == rows * cols if (rows, cols) == (2, 2) else len(chunks) >= 1
    south = min(c[0] for c in chunks)
    north = max(c[1] for c in chunks)
    assert south == 50.0 and north == 51.0


@given(
    st.lists(
        st.integers(min_value=-(2**15), max_value=2**15 - 1),
        min_size=0, max_size=512,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_lossless(samples, rate):
    """encode_wav → decode_wav is the identity on mono int16 PCM at any
    sample rate (the engine decoder; the serial oracle uses stdlib wave)."""
    import numpy as np

    from osm_wikidata_ray.pipelines.multimodal import decode_wav, encode_wav

    x = np.asarray(samples, dtype=np.int16)
    out, r = decode_wav(encode_wav(x, rate=rate))
    assert r == rate
    assert np.array_equal(out, x)


@given(st.lists(st.text(max_size=30), min_size=1, max_size=50))
@settings(max_examples=40, deadline=None)
def test_thin_exchange_hash_identity(keys):
    """key_hash preserves block-key identity: equal keys hash equal,
    distinct keys hash distinct (for realistic key-list sizes)."""
    import pyarrow as pa

    from osm_wikidata_ray.stages.blocking import thin_exchange_cols

    n = len(keys)
    batch = pa.table(
        {
            "block_key": pa.array(keys, pa.string()),
            "side": pa.array(["wd"] * n),
            "entity_key": pa.array(list(range(n)), pa.int64()),
            "lat": pa.array([0.0] * n),
            "lon": pa.array([0.0] * n),
            "max_dist_m": pa.array([1.0] * n),
            "is_point": pa.array([False] * n),
        }
    )
    kh = thin_exchange_cols(batch, n_buckets=13).column("key_hash").to_pylist()
    for i in range(n):
        for j in range(i + 1, n):
            assert (kh[i] == kh[j]) == (keys[i] == keys[j])


def test_stride1_window_texts_matches_python_reference():
    """The position-vectorized window kernel (contamination tiers) equals a
    plain Python sliding-window over the same trim/split semantics."""
    import pyarrow as pa
    import re

    from osm_wikidata_ray.pipelines.training_data import _stride1_window_texts

    docs = [
        "a b c d e",
        "  leading and trailing  ",
        "",
        "one",
        "x " * 30,
        "tab\tsep  multi   space",
    ]
    window = 3
    batch = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string())}
    )
    texts, ids = _stride1_window_texts(batch, window)
    got = sorted(zip(ids.tolist(), texts.to_pylist()))
    expect = []
    for i, d in enumerate(docs):
        toks = re.sub(r"^\s+|\s+$", "", d).split()
        # the kernel splits on \s+ AFTER an RE2 edge trim: empty text
        # yields the single empty token, matching split_pattern_regex
        if not toks:
            toks = [""]
        for s in range(len(toks) - window + 1):
            expect.append((i, " ".join(toks[s:s + window])))
    assert got == sorted(expect)
