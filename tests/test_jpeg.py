"""Baseline JPEG codec tests (operators/jpeg.py): encoder↔decoder
round-trips across color modes, subsampling, restart markers, and odd
geometries; spec-edge rejections; and the multimodal integration (real
pixel features for decodable JPEGs, header-probe degradation for
streams the baseline decoder refuses)."""

from __future__ import annotations

import numpy as np
import pytest

from mysql2parquet_spark.operators.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    _scaled_quant,
    decode_jpeg,
    encode_jpeg,
)


def _gradient_gray(h: int, w: int) -> np.ndarray:
    gy, gx = np.mgrid[0:h, 0:w]
    return (gy * 2 + gx).clip(0, 255).astype(np.uint8)


def _gradient_rgb(h: int, w: int) -> np.ndarray:
    gy, gx = np.mgrid[0:h, 0:w]
    return (
        np.stack([gy * 2, gx * 2, gy + gx], axis=-1).clip(0, 255).astype(np.uint8)
    )


def _decode_to_array(data: bytes) -> np.ndarray:
    w, h, c, rows = decode_jpeg(data)
    flat = np.frombuffer(b"".join(rows), dtype=np.uint8)
    return flat.reshape(h, w) if c == 1 else flat.reshape(h, w, c)


def _roundtrip_err(px: np.ndarray, **kw) -> tuple[float, int]:
    out = _decode_to_array(encode_jpeg(px, **kw))
    assert out.shape == px.shape
    err = np.abs(out.astype(int) - px.astype(int))
    return float(err.mean()), int(err.max())


def test_zigzag_is_the_standard_scan():
    # spot-check the generated table against the published order
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[63] == 63
    assert sorted(ZIGZAG) == list(range(64))


def test_quality_scaling_matches_libjpeg_formula():
    assert np.array_equal(_scaled_quant(QUANT_LUMA, 50), QUANT_LUMA)
    assert _scaled_quant(QUANT_LUMA, 100).max() == 1  # all-ones at q=100
    assert (_scaled_quant(QUANT_LUMA, 10) >= QUANT_LUMA).all()
    assert _scaled_quant(QUANT_LUMA, 10).max() <= 255


def test_grayscale_roundtrip_smooth_gradient():
    mean, mx = _roundtrip_err(_gradient_gray(48, 56), quality=95)
    assert mean < 2.0 and mx <= 8


def test_rgb_444_roundtrip():
    mean, mx = _roundtrip_err(_gradient_rgb(40, 40), quality=95)
    assert mean < 2.5 and mx <= 12


def test_rgb_420_subsampled_roundtrip():
    mean, mx = _roundtrip_err(
        _gradient_rgb(40, 40), quality=95, subsample=True
    )
    assert mean < 3.5 and mx <= 16


def test_odd_dimensions_crop_exactly():
    # 45x51 and 17x9 force partial edge MCUs in both axes (and, with
    # 4:2:0, a luma grid 16-aligned while the image is not)
    for shape_px in (_gradient_gray(45, 51), _gradient_rgb(17, 9)):
        kw = {"subsample": shape_px.ndim == 3}
        out = _decode_to_array(encode_jpeg(shape_px, quality=95, **kw))
        assert out.shape == shape_px.shape


def test_restart_markers_roundtrip_and_appear_on_wire():
    px = _gradient_rgb(48, 48)
    data = encode_jpeg(px, quality=95, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    out = _decode_to_array(data)
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.mean() < 2.5


def test_noise_image_survives_within_quant_tolerance():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (32, 40), dtype=np.uint8).astype(np.uint8)
    mean, mx = _roundtrip_err(px, quality=95)
    assert mean < 4.0 and mx <= 24


def test_flat_image_is_near_exact():
    px = np.full((24, 24, 3), 137, dtype=np.uint8)
    mean, mx = _roundtrip_err(px, quality=90)
    assert mx <= 2  # DC-only blocks: quantization barely touches them


def test_decoder_rejects_progressive_and_garbage():
    px = _gradient_gray(16, 16)
    data = bytearray(encode_jpeg(px, quality=90))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive|coding process"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(px)[:40])  # truncated before the scan


def test_decoder_rejects_truncated_entropy_data():
    px = _gradient_gray(32, 32)
    data = encode_jpeg(px, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) - (len(data) - data.find(b"\xff\xda")) // 2])


def test_encoder_validates_input():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), dtype=np.float64))
    with pytest.raises(ValueError, match="channel"):
        encode_jpeg(np.zeros((8, 8, 4), dtype=np.uint8))


def test_sof_probe_and_pixel_decode_agree():
    from mysql2parquet_spark.operators.multimodal import jpeg_dimensions

    data = encode_jpeg(_gradient_rgb(30, 22), quality=85, subsample=True)
    assert jpeg_dimensions(data) == (22, 30, 3)
    w, h, c, rows = decode_jpeg(data)
    assert (w, h, c) == (22, 30, 3)
    assert len(rows) == 30 and len(rows[0]) == 22 * 3


def test_extract_features_real_jpeg_pixels(spark):
    """A decodable JPEG now yields PIXEL features ([w,h,c] + per-channel
    means), not the histogram fallback — and the means track the actual
    image brightness."""
    from mysql2parquet_spark.operators.multimodal import extract_features

    bright = np.full((24, 24, 3), 220, dtype=np.uint8)
    dark = np.full((24, 24, 3), 30, dtype=np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(bright, quality=90)), "image/jpeg"),
        (2, bytearray(encode_jpeg(dark, quality=90)), "image/jpeg"),
    ]
    df = spark.createDataFrame(
        rows, "asset_id: long, content: binary, media_type: string"
    )
    got = {r.asset_id: r.features for r in extract_features(df).collect()}
    assert got[1][:3] == [24.0, 24.0, 3.0]
    assert len(got[1]) == 3 + 3  # dims + per-channel means, not histogram
    assert all(m > 0.8 for m in got[1][3:])
    assert all(m < 0.2 for m in got[2][3:])


def test_resize_works_on_decoded_jpeg_pixels():
    from mysql2parquet_spark.operators.multimodal import resize_image_nn

    px = _gradient_rgb(32, 32)
    w, h, c, raw = resize_image_nn(
        encode_jpeg(px, quality=95), 8, 8, media_type="image/jpeg"
    )
    assert (w, h, c) == (8, 8, 3)
    assert len(raw) == 8 * 8 * 3
