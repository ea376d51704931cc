"""Pins for the engine's own baseline JPEG codec (pipelines/jpeg.py).

The container has no codec library to cross-check against, so correctness
is pinned the way the PNG/WAV codecs are: encoder→decoder round trips at
known tolerances (lossy-codec contract), exactness where the math says
exact (constant blocks), structural paths (restart markers, subsampling,
odd dims, grayscale), and loud rejection of the non-baseline variants.
The decoder reads DQT/DHT from the STREAM, so a table-handling bug cannot
hide behind shared constants with the encoder.
"""

import numpy as np
import pytest

from osm_wikidata_ray.pipelines.jpeg import (
    HUFF_AC_CHROM,
    HUFF_AC_LUM,
    HUFF_DC_CHROM,
    HUFF_DC_LUM,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
)


def _err(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.abs(a.astype(np.int64) - b.astype(np.int64))


def test_huffman_tables_are_valid_prefix_codes():
    """Annex-K tables: right cardinalities and a consistent canonical code
    (no code is a prefix of another, by construction of the canon — verify
    lengths fit and codes are unique)."""
    for bits, values in (HUFF_DC_LUM, HUFF_DC_CHROM, HUFF_AC_LUM, HUFF_AC_CHROM):
        assert sum(bits) == len(values) == len(set(values))
        codes = _canonical_codes(bits, values)
        seen = set()
        for _sym, (code, length) in codes.items():
            assert code < (1 << length)
            seen.add((length, code))
        assert len(seen) == len(values)
    assert sum(HUFF_AC_LUM[0]) == 162 and sum(HUFF_AC_CHROM[0]) == 162


def test_constant_blocks_decode_exactly():
    """A constant-color image is pure DC; quantized DC error is sub-ulp, so
    the round trip is exact (grayscale) / within 1 (RGB color transform)."""
    gray = np.full((24, 16), 97, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(gray, quality=75)), gray)
    rgb = np.full((17, 23, 3), 137, np.uint8)
    assert _err(decode_jpeg(encode_jpeg(rgb, quality=75)), rgb).max() <= 1


def test_smooth_gradient_near_exact():
    x = np.linspace(0, 255, 32)
    img = (x[None, :] * 0.5 + x[:, None] * 0.5).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    assert _err(dec, img).max() <= 4


def test_noise_roundtrip_tolerance_and_odd_dims():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (15, 21, 3), np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    e = _err(dec, img)
    assert e.max() <= 48 and e.mean() <= 8  # lossy-codec contract at q95
    g = rng.randint(0, 256, (9, 13), np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=85))
    assert dg.shape == g.shape and _err(dg, g).mean() <= 12


def test_420_subsampling_roundtrip():
    r = np.linspace(0, 200, 20)[:, None] + np.linspace(0, 55, 30)[None, :]
    img = np.stack([r, 255 - r, r * 0.5], 2).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert dec.shape == img.shape
    assert _err(dec, img).mean() <= 6
    # odd dims exercise the chroma pad + upsample-crop path
    odd = img[:19, :21]
    dec = decode_jpeg(encode_jpeg(odd, quality=90, subsampling="420"))
    assert dec.shape == odd.shape


def test_restart_markers_change_nothing():
    """DRI/RSTn re-segment the entropy stream and reset DC prediction;
    the decoded pixels must be bit-identical to the unsegmented encode."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 40, 3), np.uint8)
    a = decode_jpeg(encode_jpeg(img, quality=80, restart_interval=2))
    b = decode_jpeg(encode_jpeg(img, quality=80))
    assert np.array_equal(a, b)
    g = rng.randint(0, 256, (16, 16), np.uint8)
    a = decode_jpeg(encode_jpeg(g, quality=80, restart_interval=1))
    b = decode_jpeg(encode_jpeg(g, quality=80))
    assert np.array_equal(a, b)


def test_non_baseline_variants_rejected():
    img = np.zeros((8, 8), np.uint8)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    for sof, name in ((0xC2, "progressive"), (0xC1, "extended")):
        bad = bytearray(enc)
        bad[i + 1] = sof
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(bad))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff...")  # garbage after SOI
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_decoder_honors_stream_tables_not_constants():
    """Re-quantize the DQT in the STREAM after encoding: the decoder must
    dequantize with the stream's table, so doubling it doubles the decoded
    AC contrast — proves tables are read from the file, not assumed."""
    x = np.linspace(0, 255, 16)
    img = np.tile(x, (16, 1)).astype(np.uint8)
    enc = bytearray(encode_jpeg(img, quality=90))
    base = decode_jpeg(bytes(enc)).astype(np.int64)
    i = enc.find(b"\xff\xdb")
    # halve every quant entry (min 1): decoded image shrinks toward DC-only
    tbl = np.frombuffer(bytes(enc[i + 5 : i + 69]), np.uint8)
    enc[i + 5 : i + 69] = np.maximum(tbl // 2, 1).tobytes()
    halved = decode_jpeg(bytes(enc)).astype(np.int64)
    # contrast around the mean scales with the dequant table
    assert np.abs(halved - halved.mean()).sum() < np.abs(base - base.mean()).sum()
