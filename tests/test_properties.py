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
