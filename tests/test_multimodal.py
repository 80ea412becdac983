"""Multimodal tests (C5): binary payload columns, Arrow-batched feature
extraction via mapInPandas, and the REAL pure-stdlib codecs — PNG
(zlib inflate + scanline unfilter) and WAV (wave module PCM)."""

from __future__ import annotations

import struct
import zlib

import pytest

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.operators.multimodal import (
    byte_histogram,
    decode_audio,
    decode_image,
    extract_features,
    jpeg_dimensions,
    png_features,
    text_as_binary_assets,
    wav_features,
)


def make_jpeg(width: int, height: int, channels: int = 3, sof: int = 0xC0,
              extra_segments: bytes = b"") -> bytes:
    """Synthetic JPEG header for fixtures: valid SOI/APP0/SOF/SOS/EOI
    marker stream with the requested frame geometry. The entropy data is
    junk — the dimension probe only walks markers, and a real pixel
    decoder would (correctly) refuse it."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    comps = b"".join(bytes((i + 1, 0x11, 0)) for i in range(channels))
    sof_seg = (
        bytes((0xFF, sof))
        + (8 + 3 * channels).to_bytes(2, "big")
        + b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes((channels,))
        + comps
    )
    sos = b"\xff\xda" + (2 + 1 + 2 * channels + 3).to_bytes(2, "big") \
        + bytes((channels,)) + b"\x00" * (2 * channels + 3)
    return b"\xff\xd8" + app0 + extra_segments + sof_seg + sos \
        + b"\x12\x34entropy-junk" + b"\xff\xd9"


def make_png(pixels: list[list[tuple[int, ...]]], filters: list[int] | None = None):
    """Minimal PNG encoder for test fixtures: 8-bit RGB/RGBA/gray rows,
    with a chosen scanline filter per row (exercises the unfilter paths)."""
    height = len(pixels)
    width = len(pixels[0])
    channels = len(pixels[0][0])
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    filters = filters or [0] * height

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    raw = bytearray()
    prev = bytearray(width * channels)
    for y, ft in enumerate(filters):
        line = bytearray(v for px in pixels[y] for v in px)
        enc = bytearray(line)
        if ft == 1:  # Sub: store delta vs left neighbor
            for x in range(len(line) - 1, channels - 1, -1):
                enc[x] = (line[x] - line[x - channels]) & 0xFF
        elif ft == 2:  # Up: delta vs row above
            for x in range(len(line)):
                enc[x] = (line[x] - prev[x]) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(len(line)):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pr) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def make_wav(samples: list[float], rate: int = 8000) -> bytes:
    """16-bit mono PCM WAV from [-1,1] floats via the stdlib writer."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack("<h", max(-32768, min(32767, int(s * 32767))))
                for s in samples
            )
        )
    return buf.getvalue()


def test_asset_table_schema(spark, sf_dir):
    assets = text_as_binary_assets(load_table(spark, sf_dir, "documents"))
    got = {f.name: f.dataType.simpleString() for f in assets.schema.fields}
    assert got == {
        "asset_id": "bigint",
        "content": "binary",
        "media_type": "string",
        "meta": "struct<n_chars:bigint,lang:string>",
    }


def test_feature_extraction_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assets = text_as_binary_assets(docs)
    feats = extract_features(assets, bins=16)
    rows = feats.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r.media_type == "text/plain"
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9  # normalized histogram
    # n_bytes equals utf-8 length of the text payload
    joined = feats.join(docs, feats.asset_id == docs.doc_id).select(
        "n_bytes", F.length(F.encode("text", "utf-8")).alias("want")
    )
    assert joined.filter(F.col("n_bytes") != F.col("want")).count() == 0


def test_feature_extraction_partitioned(spark, sf_dir):
    """The mapInPandas path must produce identical results regardless of
    partitioning — no per-partition state leakage."""
    assets = text_as_binary_assets(load_table(spark, sf_dir, "documents"))
    one = extract_features(assets.coalesce(1)).collect()
    many = extract_features(assets.repartition(7)).collect()
    key = lambda r: r.asset_id  # noqa: E731
    assert sorted(one, key=key) == sorted(many, key=key)


def test_byte_histogram_deterministic_and_empty():
    assert byte_histogram(b"") == [0.0] * 16
    h = byte_histogram(bytes(range(256)))
    assert len(h) == 16 and all(abs(x - 1 / 16) < 1e-9 for x in h)
    assert byte_histogram(b"abc") == byte_histogram(b"abc")


def test_png_decode_roundtrip_all_filters():
    """Every PNG scanline filter type (None/Sub/Up/Average→via Paeth mix)
    must unfilter back to the original pixels."""
    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)],
        [(5, 5, 5), (100, 110, 120), (200, 150, 100), (0, 0, 0)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)],
        [(9, 9, 9), (18, 18, 18), (27, 27, 27), (36, 36, 36)],
    ]
    png = make_png(pixels, filters=[0, 1, 2, 4])
    w, h, ch, rows = decode_image(png)
    assert (w, h, ch) == (4, 4, 3)
    got = [
        [tuple(row[x * ch : (x + 1) * ch]) for x in range(w)] for row in rows
    ]
    assert got == pixels


def test_png_decode_grayscale_and_rgba():
    gray = make_png([[(0,), (128,)], [(255,), (64,)]])
    w, h, ch, rows = decode_image(gray)
    assert (w, h, ch) == (2, 2, 1)
    assert rows[0] == bytes([0, 128])
    rgba = make_png([[(1, 2, 3, 4), (5, 6, 7, 8)]])
    w, h, ch, rows = decode_image(rgba)
    assert (w, h, ch) == (2, 1, 4)
    assert rows[0] == bytes([1, 2, 3, 4, 5, 6, 7, 8])


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_image(b"JFIF not a png")


def test_wav_decode_roundtrip():
    samples = [0.0, 0.5, -0.5, 1.0, -1.0, 0.25]
    rate, got = decode_audio(make_wav(samples, rate=16000))
    assert rate == 16000
    assert len(got) == len(samples)
    for want, g in zip(samples, got):
        assert abs(want - g) < 2e-4  # 16-bit quantization error


def test_real_codec_features():
    feats = png_features(make_png([[(255, 0, 0), (255, 0, 0)]]))
    assert feats[:3] == [2.0, 1.0, 3.0]
    assert abs(feats[3] - 1.0) < 1e-9  # red channel mean
    assert feats[4] == 0.0 and feats[5] == 0.0
    wfeats = wav_features(make_wav([0.5, -0.5, 0.5, -0.5], rate=8000))
    assert wfeats[0] == 8000.0 and wfeats[1] == 4.0
    assert abs(wfeats[2] - 0.5) < 1e-3  # rms of a +-0.5 square wave


def test_extract_features_routes_by_media_type(spark):
    """End-to-end through mapInPandas: PNG and WAV rows run the real
    decoders, unknown types fall back to the byte histogram."""
    png = make_png([[(10, 20, 30)]])
    wav = make_wav([0.1, -0.1], rate=8000)
    rows = [
        (1, bytearray(png), "image/png"),
        (2, bytearray(wav), "audio/wav"),
        (3, bytearray(b"\x00\x01\x02"), "video/mp4"),
    ]
    df = spark.createDataFrame(
        rows, "asset_id: long, content: binary, media_type: string"
    )
    got = {r.asset_id: r for r in extract_features(df).collect()}
    assert got[1].features[:3] == [1.0, 1.0, 3.0]  # real PNG dims
    assert got[2].features[0] == 8000.0  # real WAV sample rate
    assert len(got[3].features) == 16  # histogram fallback
    assert got[3].n_bytes == 3


def test_extract_features_corrupt_payload_degrades_per_row(spark):
    """One corrupt or mislabeled payload must not abort the distributed
    job (at 100 TB a bad asset is a certainty): the failing ROW falls
    back to the byte histogram; healthy rows still decode for real."""
    good = make_png([[(10, 20, 30)]])
    truncated_png = bytes(good[: len(good) // 2])  # valid magic, cut body
    rows = [
        (1, bytearray(good), "image/png"),
        (2, bytearray(truncated_png), "image/png"),
        (3, bytearray(b"mislabeled bytes"), "audio/wav"),
    ]
    df = spark.createDataFrame(
        rows, "asset_id: long, content: binary, media_type: string"
    )
    got = {r.asset_id: r for r in extract_features(df).collect()}
    assert got[1].features[:3] == [1.0, 1.0, 3.0]  # healthy row: real decode
    assert len(got[2].features) == 16  # corrupt PNG -> histogram, no abort
    assert len(got[3].features) == 16  # mislabeled WAV -> histogram
    assert got[2].n_bytes == len(truncated_png)


# --------------------------------------------------------------------------
# JPEG: header-probe metadata (no pure-stdlib pixel decode exists)
# --------------------------------------------------------------------------

def test_jpeg_dimensions_parses_sof_variants():
    # baseline, progressive, grayscale, CMYK-ish 4-channel
    assert jpeg_dimensions(make_jpeg(640, 480)) == (640, 480, 3)
    assert jpeg_dimensions(make_jpeg(31, 17, sof=0xC2)) == (31, 17, 3)
    assert jpeg_dimensions(make_jpeg(8, 8, channels=1)) == (8, 8, 1)
    assert jpeg_dimensions(make_jpeg(100, 50, channels=4)) == (100, 50, 4)
    # a COM segment and marker fill bytes before the SOF are walked over
    com = b"\xff\xfe" + (2 + 5).to_bytes(2, "big") + b"hello"
    assert jpeg_dimensions(
        make_jpeg(12, 34, extra_segments=b"\xff" + com)
    ) == (12, 34, 3)


def test_jpeg_dimensions_rejects_garbage():
    with pytest.raises(ValueError, match="bad SOI"):
        jpeg_dimensions(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="truncated"):
        jpeg_dimensions(make_jpeg(640, 480)[:8])
    # SOS with no preceding SOF: probe must stop, not scan entropy junk
    no_sof = make_jpeg(1, 1).replace(b"\xff\xc0", b"\xff\xee", 1)
    with pytest.raises(ValueError, match="SOF marker not found"):
        jpeg_dimensions(no_sof)
    with pytest.raises(ValueError, match="corrupt JPEG"):
        jpeg_dimensions(b"\xff\xd8\x00\x00\x00\x00")


def test_extract_features_routes_jpeg(spark):
    """A header-valid JPEG whose scan the baseline decoder refuses
    (junk entropy data here; progressive in the wild) degrades to
    honest SOF dimensions + byte histogram; fully corrupt rows degrade
    to the plain histogram. Decodable JPEGs take the real pixel path —
    tests/test_jpeg.py::test_extract_features_real_jpeg_pixels."""
    good = make_jpeg(320, 200, channels=3)
    rows = [
        (1, bytearray(good), "image/jpeg"),
        (2, bytearray(b"\xff\xd8not really"), "image/jpeg"),
    ]
    df = spark.createDataFrame(
        rows, "asset_id: long, content: binary, media_type: string"
    )
    got = {r.asset_id: r for r in extract_features(df).collect()}
    assert got[1].features[:3] == [320.0, 200.0, 3.0]
    assert len(got[1].features) == 3 + 16  # dims + histogram
    assert len(got[2].features) == 16  # degraded, job not aborted


# --------------------------------------------------------------------------
# resize (nearest-neighbor on real decoded pixels) + frame sampling
# --------------------------------------------------------------------------

def test_resize_nn_exact_pixels():
    from mysql2parquet_spark.operators.multimodal import resize_image_nn

    # 2x2 RGB quadrants upscaled to 4x4: each quadrant becomes a 2x2 block
    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    w, h, c, raw = resize_image_nn(make_png(px), 4, 4)
    assert (w, h, c) == (4, 4, 3)
    assert len(raw) == 4 * 4 * 3
    def at(x, y):
        o = (y * 4 + x) * 3
        return tuple(raw[o : o + 3])
    assert at(0, 0) == at(1, 1) == (255, 0, 0)
    assert at(3, 0) == (0, 255, 0)
    assert at(0, 3) == (0, 0, 255)
    assert at(3, 3) == (255, 255, 255)

    # downscale back to 1x1 picks the top-left source pixel (NN)
    w, h, c, raw = resize_image_nn(make_png(px), 1, 1)
    assert (w, h, c, tuple(raw)) == (1, 1, 3, (255, 0, 0))

    with pytest.raises(ValueError, match="positive"):
        resize_image_nn(make_png(px), 0, 4)


def test_with_resized_degrades_per_row(spark):
    from mysql2parquet_spark.operators.multimodal import with_resized

    png = make_png([[(9, 9, 9)]])
    rows = [
        (1, png, "image/png"),
        (2, b"not a png at all", "image/png"),   # corrupt -> NULL row
        (3, b"plain bytes", "text/plain"),       # non-image -> NULL row
    ]
    df = spark.createDataFrame(
        rows, "asset_id bigint, content binary, media_type string"
    )
    got = {r.asset_id: r for r in with_resized(df, 2, 2).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (2, 2, 3)
    assert got[1].pixels == bytes([9, 9, 9] * 4)
    assert got[2].pixels is None and got[3].pixels is None


def test_sample_frames_wav_structure_and_fanout(spark):
    """1 asset -> n_frames rows; real PCM windows keep the loud/silent
    structure; non-audio payloads get per-segment byte histograms."""
    from mysql2parquet_spark.operators.multimodal import sample_frames

    loud_then_silent = [0.9] * 400 + [0.0] * 400
    rows = [
        (1, make_wav(loud_then_silent), "audio/wav"),
        (2, bytes(range(256)), "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        rows, "asset_id bigint, content binary, media_type string"
    )
    out = sample_frames(df, n_frames=2, bins=8).collect()
    assert len(out) == 4  # 2 assets x 2 frames
    byid = {(r.asset_id, r.frame_idx): r.features for r in out}
    assert byid[(1, 0)][0] > 0.8  # loud window rms
    assert byid[(1, 1)][0] < 0.01  # silent window rms
    assert len(byid[(2, 0)]) == 8 and abs(sum(byid[(2, 0)]) - 1.0) < 1e-9
    # deterministic across partitionings
    out2 = sample_frames(df.repartition(2), n_frames=2, bins=8).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))


# --------------------------------------------------------------------------
# BMP codec
# --------------------------------------------------------------------------

def make_bmp(
    pixels: list[list[tuple[int, int, int]]], *, top_down: bool = False
) -> bytes:
    """Minimal 24-bit BI_RGB BMP: BGR pixel order, 4-byte row padding,
    bottom-up rows unless top_down (negative height)."""
    import struct

    h = len(pixels)
    w = len(pixels[0])
    stride = (w * 3 + 3) & ~3
    raw = bytearray()
    row_order = pixels if top_down else list(reversed(pixels))
    for row in row_order:
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))
        line += b"\x00" * (stride - len(line))
        raw += line
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(raw), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, (-h if top_down else h), 1, 24, 0, len(raw), 2835, 2835, 0, 0,
        )
    )
    return bytes(header + raw)


def test_bmp_decode_roundtrip_both_orientations():
    from mysql2parquet_spark.operators.multimodal import decode_bmp

    px = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    for top_down in (False, True):
        w, h, c, rows = decode_bmp(make_bmp(px, top_down=top_down))
        assert (w, h, c) == (3, 2, 3)
        got = [
            [tuple(row[x * 3 : x * 3 + 3]) for x in range(w)] for row in rows
        ]
        assert got == px  # top-down RGB regardless of storage order


def test_bmp_decode_rejects_garbage_and_unsupported():
    import struct

    import pytest as _pytest

    from mysql2parquet_spark.operators.multimodal import decode_bmp

    with _pytest.raises(ValueError, match="signature"):
        decode_bmp(b"NOTABMP" + b"\x00" * 60)
    good = make_bmp([[(1, 2, 3)]])
    rle = bytearray(good)
    rle[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with _pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(rle))
    with _pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-2])


def test_extract_features_routes_bmp(spark):
    from mysql2parquet_spark.operators.multimodal import extract_features

    bmp = make_bmp([[(255, 0, 0), (255, 0, 0)], [(255, 0, 0), (255, 0, 0)]])
    assets = spark.createDataFrame(
        [(1, bytearray(bmp), "image/bmp"),
         (2, bytearray(b"garbagebmpbytes"), "image/bmp")],
        "asset_id long, content binary, media_type string",
    )
    feats = {r.asset_id: r.features for r in extract_features(assets).collect()}
    # real decode: [w, h, c, mean_r, mean_g, mean_b] — pure red
    assert feats[1][:3] == [2.0, 2.0, 3.0]
    assert feats[1][3] == 1.0 and feats[1][4] == 0.0 and feats[1][5] == 0.0
    # corrupt payload degrades to the 16-bin histogram for that row only
    assert len(feats[2]) == 16


def test_with_resized_handles_bmp(spark):
    from mysql2parquet_spark.operators.multimodal import with_resized

    px = [[(9, 9, 9), (200, 100, 50)], [(1, 2, 3), (4, 5, 6)]]
    assets = spark.createDataFrame(
        [(1, bytearray(make_bmp(px)), "image/bmp")],
        "asset_id long, content binary, media_type string",
    )
    (row,) = with_resized(assets, 1, 1).collect()
    # NN at 2x2 -> 1x1 samples the top-left pixel, RGB order
    assert (row.width, row.height, row.channels) == (1, 1, 3)
    assert bytes(row.pixels) == bytes((9, 9, 9))
